"""Pallas TPU kernel: bilinear flow warp of the Farneback coefficient
planes (`update_matrices`' r1 sampling — the pipeline's hottest op).

Why a kernel: XLA lowers the per-pixel 2D gather to ~1 element/cycle scalar
fetches (~20 ms per 720p warp on v5e) while the rest of the whole flow
pyramid costs ~4 ms. The TPU *does* have a vectorized dynamic gather, but
only within one 128-lane vector register (`tpu.dynamic_gather`, reachable
as `take_along_axis(..., axis=-1)` on a (…,128) array). This kernel
decomposes the 2D warp to fit that primitive:

  vertical   — candidate-row matching: the source row, rebased into a VMEM
               row window, is compared per pixel against each candidate
               offset (select, no gather). Candidates are spread over a
               third grid dimension (8 per step — one sublane group) so the
               program stays small and every window DMA is 8-row aligned;
               the output block is revisited across steps and accumulated.
  horizontal — the source column splits into (tile, lane): the ±1 tile
               offset becomes a static slice of a 128-lane-padded window,
               the lane part one intra-vreg gather. Corner sharing: row
               candidate o provides both the y1 rows of candidate o and
               the y1+1 rows of candidate o−1, so each candidate costs two
               gathers (x and x+1), not six.

Exactness contract: identical to the XLA gather path for every pixel with
|floor(y+dy) − y| ≤ radius and |floor(x+dx) − x| ≤ 126 (the caller treats
pixels beyond the radius like OpenCV's out-of-image samples — the
constant-motion fallback — so intermediate solver spikes never feed
clamped garbage back into the iteration). Verified against
cv2.calcOpticalFlowFarneback to <1e-5 px EPE on real frames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUB = 8  # sublane group: candidates per grid step, DMA alignment unit


def _warp_kernel(flow_ref, src_hbm, out_ref, scratch, sem,
                 *, h, hp, w, wp, c, rb, pv, n_steps):
    b = pl.program_id(0)
    i = pl.program_id(1)
    step = pl.program_id(2)
    # Window rows for this step: candidates [step*8, step*8+8), rows
    # [start, start+rb+8) in padded coordinates — 8-aligned by construction.
    start = b * hp + i * rb + step * _SUB
    copy = pltpu.make_async_copy(
        src_hbm.at[:, pl.ds(start, rb + _SUB), :], scratch, sem
    )
    copy.start()

    f32 = jnp.float32
    flow = flow_ref[0]  # [rb, w, 2]
    dx = flow[..., 0]
    dy = flow[..., 1]
    row0 = (i * rb).astype(f32)
    yloc = jax.lax.broadcasted_iota(jnp.int32, (rb, w), 0)
    xs_i = jax.lax.broadcasted_iota(jnp.int32, (rb, w), 1)
    gx = xs_i.astype(f32) + dx
    gy = yloc.astype(f32) + row0 + dy
    x1 = jnp.floor(gx)
    y1 = jnp.floor(gy)
    fx = (gx - x1)[None]  # [1, rb, w]
    fy = (gy - y1)[None]
    x1c = jnp.clip(x1.astype(jnp.int32), 0, w - 2)
    y1c = jnp.clip(y1.astype(jnp.int32), 0, h - 2)

    # candidate index of each pixel: scratch row (y1c + pv - i*rb) - y_local
    o_needed = jnp.clip(y1c + pv - i * rb - yloc, 0, 2 * pv - 1)

    # Horizontal (tile, lane) split in the 1-tile-padded coordinate frame.
    v_out = (xs_i + _LANES) >> 7
    xrel = jnp.clip(x1c - xs_i, -(_LANES - 2), _LANES - 2)
    xpad = xs_i + xrel + _LANES
    m0 = xpad & (_LANES - 1)
    s0 = jnp.clip((xpad >> 7) - v_out, -1, 1)
    xpad1 = xpad + 1
    m1 = xpad1 & (_LANES - 1)
    s1 = jnp.clip((xpad1 >> 7) - v_out, -1, 1)

    ntiles = w // _LANES
    nt_p = wp // _LANES

    def bcast(a):
        a4 = a.reshape(1, rb, ntiles, _LANES)
        return jnp.broadcast_to(a4, (c, rb, ntiles, _LANES)).reshape(
            c * rb * ntiles, _LANES
        )

    idx0 = bcast(m0)
    idx1 = bcast(m1)
    sel0 = bcast(s0)
    sel1 = bcast(s1)

    @pl.when(step == 0)
    def _init():
        out_ref[0] = jnp.zeros((c, rb, w), f32)

    copy.wait()

    def hgather(rows):
        """[c, rb, wp] rows → (gather at x, gather at x+1), each [c, rb, w]."""
        r = rows.reshape(c * rb, nt_p, _LANES)
        g0 = jnp.zeros((c * rb * ntiles, _LANES), f32)
        g1 = jnp.zeros((c * rb * ntiles, _LANES), f32)
        for s in (-1, 0, 1):
            part = r[:, 1 + s : 1 + s + ntiles, :].reshape(
                c * rb * ntiles, _LANES
            )
            t0 = jnp.take_along_axis(part, idx0, axis=1)
            t1 = jnp.take_along_axis(part, idx1, axis=1)
            g0 = jnp.where(sel0 == s, t0, g0)
            g1 = jnp.where(sel1 == s, t1, g1)
        shp = (c, rb, w)
        return g0.reshape(shp), g1.reshape(shp)

    acc = jnp.zeros((c, rb, w), f32)
    base = step * _SUB
    for j in range(_SUB):
        rows = scratch[:, j : j + rb, :]
        g0, g1 = hgather(rows)
        hx = g0 * (1 - fx) + g1 * fx
        o = base + j
        m_y0 = (o_needed == o)[None]
        m_y1 = (o_needed == o - 1)[None]
        acc = acc + jnp.where(m_y0, hx * (1 - fy), 0.0)
        acc = acc + jnp.where(m_y1, hx * fy, 0.0)
    out_ref[0] = out_ref[0] + acc


@functools.partial(
    jax.jit, static_argnames=("radius", "block_rows", "interpret")
)
def warp_bilinear_tpu(
    r1: jnp.ndarray,
    flow: jnp.ndarray,
    radius: int = 16,
    block_rows: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bilinear-warp [..., H, W, C] float32 `r1` by [..., H, W, 2] `flow`.

    Matches the exact XLA gather path within the radius contract (see
    module docstring). Arbitrary batch/H/W (padded internally to block and
    lane multiples); the batch folds into the kernel grid.
    """
    squeeze = r1.ndim == 3
    if squeeze:
        r1 = r1[None]
        flow = flow[None]
    bdims = r1.shape[:-3]
    bsz = 1
    for d in bdims:
        bsz *= d
    h, w, c = r1.shape[-3:]
    r1 = r1.reshape(bsz, h, w, c)
    flow = flow.reshape(bsz, h, w, 2)

    rb = min(block_rows, max(_SUB, h))
    pad_h = (-h) % rb
    pad_w = (-w) % _LANES
    if pad_h or pad_w:
        r1 = jnp.pad(
            r1, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge"
        )
        flow = jnp.pad(flow, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hh, ww = h + pad_h, w + pad_w

    # Vertical pad: multiple of 8 so every window start is sublane-aligned.
    pv = ((radius + 1 + _SUB - 1) // _SUB) * _SUB
    n_cand = 2 * pv + 1  # candidate rows incl. the y1+1 share
    n_steps = (n_cand + _SUB - 1) // _SUB
    n_blocks = hh // rb
    wp = ww + 2 * _LANES
    # bottom pad has one extra sublane group: the last candidate step's
    # window reaches rb + n_steps*8 > rb + 2*pv rows past the block start
    hp = hh + 2 * pv + _SUB
    src = jnp.pad(
        jnp.moveaxis(r1, -1, 1),
        ((0, 0), (0, 0), (pv, pv + _SUB), (_LANES, _LANES)),
        mode="edge",
    )
    src = jnp.moveaxis(src, 1, 0).reshape(c, bsz * hp, wp)

    kernel = functools.partial(
        _warp_kernel, h=hh, hp=hp, w=ww, wp=wp, c=c, rb=rb, pv=pv,
        n_steps=n_steps,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_blocks, n_steps),
        in_specs=[
            pl.BlockSpec(
                (1, rb, ww, 2),
                lambda b, i, o: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, c, rb, ww),
            lambda b, i, o: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, c, hh, ww), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, rb + _SUB, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(flow.astype(jnp.float32), src)
    out = jnp.moveaxis(out, 1, -1)[:, :h, :w]
    return out[0] if squeeze else out.reshape(*bdims, h, w, c)
