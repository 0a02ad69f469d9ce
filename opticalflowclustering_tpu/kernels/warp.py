"""Pallas TPU kernel: bilinear flow warp of the Farneback coefficient
planes (`update_matrices`' r1 sampling — the pipeline's hottest op).

Why a kernel: XLA lowers the per-pixel 2D gather to a scalar-unit loop
(~1 element/cycle → ~20 ms per 720p warp on v5e) while the rest of the
whole flow pyramid costs ~4 ms. The TPU *does* have a vectorized dynamic
gather, but only within one 128-lane vector register
(`tpu.dynamic_gather`, reachable as `take_along_axis(..., axis=-1)` on a
(…,128) array). This kernel decomposes the 2D warp to fit that primitive:

  vertical   — candidate-row loop: the source row index rebased into a
               VMEM row window is matched per pixel against 2·radius+2
               statically-sliced candidates (per-pixel select, no gather);
  horizontal — the source column is split into (tile, lane): the ±1 tile
               offset becomes a static slice of a 128-lane-padded window,
               the lane part one intra-vreg gather per corner.

Exactness contract: identical to the XLA gather path for every pixel with
|floor(y+dy) − y| ≤ radius and |floor(x+dx) − x| ≤ 126. Beyond that the
indices clamp (out-of-image pixels are discarded by the caller's
out-of-bounds fallback mask regardless). VMEM at 720p with block_rows=32,
radius=16: 5ch · 82 rows · 1536 lanes · 4 B ≈ 2.5 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _warp_kernel(flow_ref, src_hbm, out_ref, scratch, sem,
                 *, h, hp, w, wp, c, rb, win, pv):
    # The source is pre-padded by radius+1 rows per batch element (rows of
    # element b live at [b*hp, (b+1)*hp)), so every block's window starts at
    # exactly b*hp + i*rb — the candidate-row rebase below is uniform.
    b = pl.program_id(0)
    i = pl.program_id(1)
    start = b * hp + i * rb
    copy = pltpu.make_async_copy(
        src_hbm.at[:, pl.ds(start, win), :], scratch, sem
    )
    copy.start()

    f32 = jnp.float32
    flow = flow_ref[0]  # [rb, w, 2]
    dx = flow[..., 0]
    dy = flow[..., 1]
    row0 = (i * rb).astype(f32)
    yloc = jax.lax.broadcasted_iota(jnp.int32, (rb, w), 0).astype(f32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (rb, w), 1).astype(f32)
    gx = xs + dx
    gy = yloc + row0 + dy
    x1 = jnp.floor(gx)
    y1 = jnp.floor(gy)
    fx = (gx - x1)[None]  # [1, rb, w]
    fy = (gy - y1)[None]
    x1c = jnp.clip(x1.astype(jnp.int32), 0, w - 2)
    y1c = jnp.clip(y1.astype(jnp.int32), 0, h - 2)

    n_cand = win - rb  # 2*pv
    # scratch row of (batch-local) global row g is g + pv - i*rb
    o_needed = jnp.clip(
        y1c + pv - i * rb - yloc.astype(jnp.int32),
        0, n_cand - 1,
    )

    # Horizontal (tile, lane) split in the 1-tile-padded coordinate frame.
    xs_i = jax.lax.broadcasted_iota(jnp.int32, (rb, w), 1)
    v_out = (xs_i + _LANES) >> 7  # output lane's padded tile
    # clamp the horizontal displacement to the ±(LANES-2) exactness window
    xrel = jnp.clip(x1c - xs_i, -(_LANES - 2), _LANES - 2)
    xpad = xs_i + xrel + _LANES
    t0 = xpad >> 7
    m0 = xpad & (_LANES - 1)
    s0 = jnp.clip(t0 - v_out, -1, 1)
    xpad1 = xpad + 1
    t1 = xpad1 >> 7
    m1 = xpad1 & (_LANES - 1)
    s1 = jnp.clip(t1 - v_out, -1, 1)

    ntiles = w // _LANES  # output tiles
    nt_p = wp // _LANES  # padded tiles (= ntiles + 2)

    def bcast_idx(m):
        # [rb, w] lane indices → [c*rb, ntiles, LANES]
        m3 = m.reshape(1, rb, ntiles, _LANES)
        return jnp.broadcast_to(m3, (c, rb, ntiles, _LANES)).reshape(
            c * rb, ntiles, _LANES
        )

    def bcast_sel(s):
        s3 = s.reshape(1, rb, ntiles, _LANES)
        return jnp.broadcast_to(s3, (c, rb, ntiles, _LANES)).reshape(
            c * rb, ntiles, _LANES
        )

    idx0 = bcast_idx(m0)
    idx1 = bcast_idx(m1)
    sel0 = bcast_sel(s0)
    sel1 = bcast_sel(s1)

    copy.wait()

    def hgather_exact(rows, idx, sdiff):
        # Mosaic's dynamic_gather wants 2D operands with the gathered 128
        # lanes minor; flatten (rows, tiles) into the sublane dim.
        r = rows.reshape(c * rb, nt_p, _LANES)
        acc = jnp.zeros((c * rb * ntiles, _LANES), f32)
        idx2 = idx.reshape(c * rb * ntiles, _LANES)
        sd2 = sdiff.reshape(c * rb * ntiles, _LANES)
        for s in (-1, 0, 1):
            part = r[:, 1 + s : 1 + s + ntiles, :].reshape(
                c * rb * ntiles, _LANES
            )
            g = jnp.take_along_axis(part, idx2, axis=1)
            acc = jnp.where(sd2 == s, g, acc)
        return acc.reshape(c * rb, ntiles, _LANES)

    shape_out = (c, rb, w)
    zeros = jnp.zeros(shape_out, f32)
    p00 = p01 = p10 = p11 = zeros
    # Unrolled candidate loop (dynamic VMEM slices require 8-row alignment,
    # so offsets are static). Corner sharing: candidate row-slice o is both
    # the y1 rows of candidate o and the y1+1 rows of candidate o-1 — two
    # gathers per iteration instead of six.
    for o in range(n_cand + 1):
        rows = scratch[:, o : o + rb, :]
        g0 = hgather_exact(rows, idx0, sel0).reshape(shape_out)
        g1 = hgather_exact(rows, idx1, sel1).reshape(shape_out)
        m0 = (o_needed == o)[None]
        m1 = (o_needed == o - 1)[None]
        p00 = jnp.where(m0, g0, p00)
        p01 = jnp.where(m0, g1, p01)
        p10 = jnp.where(m1, g0, p10)
        p11 = jnp.where(m1, g1, p11)

    out = (
        p00 * (1 - fx) * (1 - fy)
        + p01 * fx * (1 - fy)
        + p10 * (1 - fx) * fy
        + p11 * fx * fy
    )
    out_ref[0] = out


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

    rb = min(block_rows, max(8, h))
    pad_h = (-h) % rb
    pad_w = (-w) % _LANES
    if pad_h or pad_w:
        r1 = jnp.pad(
            r1, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge"
        )
        flow = jnp.pad(flow, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hh, ww = h + pad_h, w + pad_w

    # DMA slices of tiled HBM memrefs must start at sublane (8-row)
    # multiples: round the vertical pad up so every window start
    # (b*hp + i*rb) is 8-aligned.
    pv = ((radius + 1 + 7) // 8) * 8
    win = rb + 2 * pv
    n_blocks = hh // rb
    wp = ww + 2 * _LANES
    hp = hh + 2 * pv
    # [c, bsz*hp, wp]: per-element vertical edge padding, batch in rows
    src = jnp.pad(
        jnp.moveaxis(r1, -1, 1),
        ((0, 0), (0, 0), (pv, pv), (_LANES, _LANES)),
        mode="edge",
    )
    src = jnp.moveaxis(src, 1, 0).reshape(c, bsz * hp, wp)

    kernel = functools.partial(
        _warp_kernel, h=hh, hp=hp, w=ww, wp=wp, c=c, rb=rb, win=win, pv=pv
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, rb, ww, 2),
                lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, c, rb, ww),
            lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, c, hh, ww), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, win, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(flow.astype(jnp.float32), src)
    out = jnp.moveaxis(out, 1, -1)[:, :h, :w]
    return out[0] if squeeze else out.reshape(*bdims, h, w, c)
