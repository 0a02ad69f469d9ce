"""Pallas TPU kernels: the Farneback inner loop (warp + M-build + solve).

The warp of the 5-channel polynomial-coefficient tensor by the current flow
is the pipeline's hottest op (the reference's cost center is
`cv2.calcOpticalFlowFarneback`, `computeOpticalFlowModule.py:20-22`; in the
TPU build ~85% of flow time went to this warp in round 1). XLA lowers the
2D per-pixel gather to ~1 element/cycle scalar fetches, and the round-1
select-warp (shifted-copy where-chains) kept all 2×radius intermediate
steps in HBM. This module instead builds the whole solver iteration from
three VMEM-resident kernels around the TPU's one vectorized gather
primitive — the intra-vreg 128-lane dynamic gather
(`jnp.take_along_axis(..., axis=-1)` on a [..., 128] tile):

  pass V — vertical sample. r1 is held TRANSPOSED ([B, 5, W, H]: y in
           lanes, prepared once per pyramid level), so `r1[y1(y,x), x]` is
           a lane gather. The y tile split (y1 lands in lane tile t-1, t,
           or t+1 of the output's tile t) becomes three statically-shifted
           block reads + a select. The result transposes back to row-major
           inside the kernel (one XLU shuffle, no HBM round-trip).
  pass H — horizontal sample of the vertically-interpolated field (x in
           lanes, same tile split), FUSED with the full M-build
           (out-of-bounds fallback, border taper, normal-equation
           products). Writes M into a halo-padded buffer.
  solve  — winsize×winsize box sum (replicate border, symmetric-pair
           accumulation like ops.filters.box_sum) + the regularized 2×2
           solve, reading its row/lane halos via one windowed DMA.

Between kernels the flow lives as two padded planes fx, fy [B, Ht, Wt]
(Ht/Wt = H/W rounded to 128) whose pad region is identically ZERO — the
solve kernel re-masks it every iteration — so no pad/slice/transpose
copies happen anywhere in the iteration loop.

Accuracy contract (warp_mode='fast'): separable sampling — the vertical
interpolation consumed at column x1 was computed with the flow at
(y, x1), not (y, x). Deviation requires floor(y+dy) to differ between the
two columns, i.e. |dx| large AND dy varying there — measured ~0 EPE vs
OpenCV on real footage (tests/test_farneback.py). Displacements beyond the
tile windows (|Δ| > 127 px per axis) take OpenCV's own out-of-image
constant-motion fallback via the `inb` mask.

`update_matrices_gather` is the pure-XLA emulation of the same sampling
semantics (same index math, same window zeroing, same M-build op order) —
it is the CPU-backend implementation of warp_mode='fast' and the oracle
the kernels are tested against (tests/test_pallas_warp.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_REACH = 127  # guaranteed per-axis displacement coverage of the 3-tile window
_HB = 64  # pass-H row block; also the M buffer's row halo pad
_SB = 128  # solve kernel row block


def _ceil_to(a: int, m: int) -> int:
    return -(-a // m) * m


def _taper_ramp(pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """OpenCV's 5-px border taper ramp, computed from integer positions.

    Bitwise-equal to the numpy table in flow.farneback._border_taper: each
    position within 5 px of either end is multiplied by the matching
    BORDER_SCALE entry (both ends when they overlap)."""
    from opticalflowclustering_tpu.flow.farneback import _BORDER_SCALE

    f32 = jnp.float32
    r = jnp.ones(pos.shape, f32)
    for i in range(5):
        sc = f32(float(_BORDER_SCALE[i]))
        r = r * jnp.where(pos == i, sc, f32(1.0))
        r = r * jnp.where(size - 1 - pos == i, sc, f32(1.0))
    return r


def _lane_gather3(blocks, idx):
    """Gather `idx` (window-relative lane-dim index, [S, 128] int32) from
    three 128-lane tiles `blocks` ([C, S, 128] each) covering absolute
    tiles t-1, t, t+1 of an output at tile `t`. Out-of-window → 0.

    Mosaic lowers only 2D gathers, so the [C, S, 128] tiles gather as
    [C*S, 128] (the intra-vreg dynamic-gather primitive)."""
    c, s, lanes = blocks[1].shape
    lane = idx & (_LANES - 1)
    lane_b = jnp.broadcast_to(lane[None], (c, s, lanes)).reshape(c * s, lanes)
    sel = idx >> 7
    out = jnp.zeros((c, s, lanes), jnp.float32)
    for k in range(3):
        g = jnp.take_along_axis(
            blocks[k].reshape(c * s, lanes), lane_b, axis=-1
        ).reshape(c, s, lanes)
        out = jnp.where((sel == k)[None], g, out)
    return out


def _pass_v_kernel(fy_ref, r1a_ref, r1b_ref, r1c_ref, out_ref, *, h):
    """av[c, y, x] = r1[y1c(y,x), x]·(1-fy) + r1[y1c+1, x]·fy.

    Works in transposed space (x sublanes, y lanes): the natural-layout dy
    block transposes in, the result transposes back out — both in VMEM."""
    t = pl.program_id(2)
    f32 = jnp.float32
    dy = jnp.swapaxes(fy_ref[0], 0, 1)  # [128 x, 128 y]
    y = jax.lax.broadcasted_iota(jnp.int32, dy.shape, 1) + t * _LANES
    gy = y.astype(f32) + dy
    y1 = jnp.floor(gy)
    fy = (gy - y1)[None]
    y1c = jnp.clip(y1.astype(jnp.int32), 0, h - 2)
    blocks = (r1a_ref[0], r1b_ref[0], r1c_ref[0])  # [5, 128, 128] each
    # Window-relative tile index: blocks cover absolute y tiles t-1, t, t+1.
    rel0 = y1c - (t - 1) * _LANES
    g0 = _lane_gather3(blocks, rel0)
    g1 = _lane_gather3(blocks, rel0 + 1)
    avt = g0 * (f32(1.0) - fy) + g1 * fy  # [5, x, y]
    out_ref[0] = jnp.swapaxes(avt, -1, -2)


def _pass_h_kernel(
    fx_ref, fy_ref, r0_ref, ava_ref, avb_ref, avc_ref, out_ref, *, h, w
):
    """M(r0, warp(av)) for one [5, HB, 128] tile: horizontal bilinear sample
    of the vertically-interpolated field + fused M-build."""
    from opticalflowclustering_tpu.flow.farneback import _m_build

    i = pl.program_id(1)
    u = pl.program_id(2)
    f32 = jnp.float32
    dx = fx_ref[0]  # [HB, 128]
    dy = fy_ref[0]
    y = jax.lax.broadcasted_iota(jnp.int32, dx.shape, 0) + i * _HB
    x = jax.lax.broadcasted_iota(jnp.int32, dx.shape, 1) + u * _LANES
    gx = x.astype(f32) + dx
    x1 = jnp.floor(gx)
    fx = (gx - x1)[None]
    x1i = x1.astype(jnp.int32)
    x1c = jnp.clip(x1i, 0, w - 2)
    y1i = jnp.floor(y.astype(f32) + dy).astype(jnp.int32)

    blocks = (ava_ref[0], avb_ref[0], avc_ref[0])  # [5, HB, 128] each
    rel0 = x1c - (u - 1) * _LANES
    g0 = _lane_gather3(blocks, rel0)
    g1 = _lane_gather3(blocks, rel0 + 1)
    r1w = g0 * (f32(1.0) - fx) + g1 * fx  # [5, HB, 128]

    inb = (
        (x1i >= 0)
        & (x1i <= w - 2)
        & (y1i >= 0)
        & (y1i <= h - 2)
        & (jnp.abs(y1i - y) <= _REACH)
        & (jnp.abs(x1i - x) <= _REACH)
    )
    taper = _taper_ramp(y, h) * _taper_ramp(x, w)
    r0c = tuple(r0_ref[0, c] for c in range(5))
    r1wc = tuple(r1w[c] for c in range(5))
    m = _m_build(r0c, r1wc, dx, dy, inb, taper)
    out_ref[0] = jnp.stack(m, axis=0)


def _solve_kernel(
    m_hbm, fx_ref, fy_ref, scratch, sem, *, h, w, lb, winsize
):
    """Flow update for one [SB, LB] tile: winsize box sum of the 5-channel
    M (replicate border, symmetric-pair order like ops.filters.box_sum)
    and the 1e-3-regularized 2×2 solve. Reads its ±7-row/±7-col halo via
    one windowed async copy from the halo-padded M buffer."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    u = pl.program_id(2)
    f32 = jnp.float32
    rad = winsize // 2
    # Window rows [i*SB - 8, i*SB + SB + 8), lanes [u*lb - 128, +lb + 128),
    # both in-bounds thanks to the (HB=64, 128) pad of the M buffer.
    copy = pltpu.make_async_copy(
        m_hbm.at[
            b,
            :,
            pl.ds(_HB + i * _SB - 8, _SB + 16),
            pl.ds(u * lb, lb + 2 * _LANES),
        ],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()
    wm = scratch[...]  # [5, SB+16, lb+256]

    # Vertical box with replicate clamping. Absolute row of window row j is
    # i*SB - 8 + j; row 0 / row h-1 live at window positions 8 - i*SB and
    # 8 + (h-1) - i*SB (clamped ds — the masks are false whenever the
    # position is actually out of window).
    yloc = jax.lax.broadcasted_iota(jnp.int32, (1, _SB, 1), 1) + i * _SB
    row0 = scratch[:, pl.ds(jnp.clip(8 - i * _SB, 0, _SB + 15), 1), :]
    rowl = scratch[:, pl.ds(jnp.clip(8 + h - 1 - i * _SB, 0, _SB + 15), 1), :]
    acc = wm[:, 8 : 8 + _SB, :]
    for d in range(1, rad + 1):
        up = wm[:, 8 - d : 8 - d + _SB, :]
        dn = wm[:, 8 + d : 8 + d + _SB, :]
        up = jnp.where(yloc - d < 0, row0, up)
        dn = jnp.where(yloc + d > h - 1, rowl, dn)
        acc = acc + (up + dn)

    # Horizontal box over lanes; center lanes are [128, 128+lb).
    xloc = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lb), 2) + u * lb
    # Mosaic has no dynamic_slice on values; extract the two replicate
    # source columns (x=0 and x=w-1) with one-hot masked reductions.
    wloc = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lb + 2 * _LANES), 2)
    p0 = jnp.clip(_LANES - u * lb, 0, lb + 2 * _LANES - 1)
    pl_ = jnp.clip(_LANES + w - 1 - u * lb, 0, lb + 2 * _LANES - 1)
    col0 = jnp.sum(
        jnp.where(wloc == p0, acc, f32(0.0)), axis=2, keepdims=True
    )
    coll = jnp.sum(
        jnp.where(wloc == pl_, acc, f32(0.0)), axis=2, keepdims=True
    )
    hacc = acc[:, :, _LANES : _LANES + lb]
    for d in range(1, rad + 1):
        lf = acc[:, :, _LANES - d : _LANES - d + lb]
        rt = acc[:, :, _LANES + d : _LANES + d + lb]
        lf = jnp.where(xloc - d < 0, col0, lf)
        rt = jnp.where(xloc + d > w - 1, coll, rt)
        hacc = hacc + (lf + rt)

    s = hacc * f32(1.0 / (winsize * winsize))
    g11, g12, g22, h1, h2 = (s[c] for c in range(5))
    idet = f32(1.0) / (g11 * g22 - g12 * g12 + f32(1e-3))
    fx = (g11 * h2 - g12 * h1) * idet
    fy = (g22 * h1 - g12 * h2) * idet
    # Keep the pad region identically zero — the invariant every other
    # kernel's masks rely on.
    valid = (yloc[0] < h) & (xloc[0] < w)
    fx_ref[0] = jnp.where(valid, fx, f32(0.0))
    fy_ref[0] = jnp.where(valid, fy, f32(0.0))


@dataclasses.dataclass(frozen=True)
class FusedLevelBuffers:
    """Per-pyramid-level constants for the fused kernels, prepared once per
    level and reused across the solver iterations (the transposes and pads
    of r0/r1 are iteration-invariant)."""

    r0p: jnp.ndarray  # [B, 5, Ht, Wt]   channel-first, zero-padded
    r1t: jnp.ndarray  # [B, 5, Wt, Ht + 256]  transposed, lane-tile padded
    lead: tuple
    h: int
    w: int

    @property
    def ht(self) -> int:
        return self.r0p.shape[2]

    @property
    def wt(self) -> int:
        return self.r0p.shape[3]


def prepare_fused_level(r0: jnp.ndarray, r1: jnp.ndarray) -> FusedLevelBuffers:
    """r0, r1: [..., H, W, 5] float32 polynomial-expansion tensors."""
    lead = r0.shape[:-3]
    h, w = r0.shape[-3], r0.shape[-2]
    b = 1
    for d in lead:
        b *= d
    wt = _ceil_to(w, _LANES)
    ht = _ceil_to(h, _LANES)

    r0f = jnp.moveaxis(r0.reshape((b, h, w, 5)), -1, 1)
    r0p = jnp.pad(r0f, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)))

    r1f = jnp.moveaxis(r1.reshape((b, h, w, 5)), -1, 1)
    r1t = jnp.swapaxes(r1f, -1, -2)  # [B, 5, W, H]
    r1t = jnp.pad(
        r1t, ((0, 0), (0, 0), (0, wt - w), (_LANES, ht - h + _LANES))
    )
    return FusedLevelBuffers(r0p, r1t, lead, h, w)


def zero_flow_planes(bufs: FusedLevelBuffers) -> tuple[jnp.ndarray, jnp.ndarray]:
    b = bufs.r0p.shape[0]
    z = jnp.zeros((b, bufs.ht, bufs.wt), jnp.float32)
    return z, z


def pad_flow_planes(
    bufs: FusedLevelBuffers, flow: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., H, W, 2] channel-last flow → padded (fx, fy) planes."""
    b = bufs.r0p.shape[0]
    f = flow.reshape((b, bufs.h, bufs.w, 2)).astype(jnp.float32)
    pads = ((0, 0), (0, bufs.ht - bufs.h), (0, bufs.wt - bufs.w))
    return jnp.pad(f[..., 0], pads), jnp.pad(f[..., 1], pads)


def planes_to_flow(
    bufs: FusedLevelBuffers, fx: jnp.ndarray, fy: jnp.ndarray
) -> jnp.ndarray:
    """Padded (fx, fy) planes → [..., H, W, 2] channel-last flow."""
    flow = jnp.stack(
        [fx[:, : bufs.h, : bufs.w], fy[:, : bufs.h, : bufs.w]], axis=-1
    )
    return flow.reshape(bufs.lead + (bufs.h, bufs.w, 2))


def fused_m_planes(
    bufs: FusedLevelBuffers,
    fx: jnp.ndarray,
    fy: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pass V + pass H: M in the halo-padded buffer
    [B, 5, Ht + 2·HB, Wt + 256] (halo blocks uninitialized; every consumer
    masks them). fx, fy: padded planes from fused_solve / pad_flow_planes."""
    h, w, ht, wt = bufs.h, bufs.w, bufs.ht, bufs.wt
    b = bufs.r0p.shape[0]

    r1spec = lambda k: pl.BlockSpec(  # noqa: E731
        (1, 5, _LANES, _LANES),
        lambda b_, i, t, k=k: (b_, 0, i, t + k),
        memory_space=pltpu.VMEM,
    )
    av = pl.pallas_call(
        functools.partial(_pass_v_kernel, h=h),
        grid=(b, wt // _LANES, ht // _LANES),
        in_specs=[
            pl.BlockSpec(
                (1, _LANES, _LANES), lambda b_, i, t: (b_, t, i),
                memory_space=pltpu.VMEM,
            ),
            r1spec(0),
            r1spec(1),
            r1spec(2),
        ],
        out_specs=pl.BlockSpec(
            (1, 5, _LANES, _LANES), lambda b_, i, t: (b_, 0, t, i + 1),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 5, ht, wt + 2 * _LANES), jnp.float32),
        interpret=interpret,
    )(fy, bufs.r1t, bufs.r1t, bufs.r1t)

    avspec = lambda k: pl.BlockSpec(  # noqa: E731
        (1, 5, _HB, _LANES),
        lambda b_, i, u, k=k: (b_, 0, i, u + k),
        memory_space=pltpu.VMEM,
    )
    fspec = pl.BlockSpec(
        (1, _HB, _LANES), lambda b_, i, u: (b_, i, u),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_pass_h_kernel, h=h, w=w),
        grid=(b, ht // _HB, wt // _LANES),
        in_specs=[
            fspec,
            fspec,
            pl.BlockSpec(
                (1, 5, _HB, _LANES), lambda b_, i, u: (b_, 0, i, u),
                memory_space=pltpu.VMEM,
            ),
            avspec(0),
            avspec(1),
            avspec(2),
        ],
        out_specs=pl.BlockSpec(
            (1, 5, _HB, _LANES), lambda b_, i, u: (b_, 0, i + 1, u + 1),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, 5, ht + 2 * _HB, wt + 2 * _LANES), jnp.float32
        ),
        interpret=interpret,
    )(fx, fy, bufs.r0p, av, av, av)


def fused_solve(
    bufs: FusedLevelBuffers,
    mpad: jnp.ndarray,
    winsize: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Box-filtered 2×2 solve of the halo-padded M → (fx, fy) padded planes
    (pad region re-zeroed). Mirrors flow.farneback._update_flow with
    gaussian=False."""
    h, w, ht, wt = bufs.h, bufs.w, bufs.ht, bufs.wt
    b = mpad.shape[0]
    lb = 2 * _LANES if wt % (2 * _LANES) == 0 else _LANES
    ospec = pl.BlockSpec(
        (1, _SB, lb), lambda b_, i, u: (b_, i, u), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_solve_kernel, h=h, w=w, lb=lb, winsize=winsize),
        grid=(b, ht // _SB, wt // lb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((b, ht, wt), jnp.float32),
            jax.ShapeDtypeStruct((b, ht, wt), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((5, _SB + 16, lb + 2 * _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(mpad)


def fused_update_matrices(
    bufs: FusedLevelBuffers, flow: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Channel-last convenience wrapper (tests / ad-hoc use): flow
    [..., H, W, 2] → M [..., H, W, 5]. The Farneback loop uses the padded
    plane API (fused_m_planes / fused_solve) to avoid all pad/slice copies."""
    fx, fy = pad_flow_planes(bufs, flow)
    mpad = fused_m_planes(bufs, fx, fy, interpret=interpret)
    m = mpad[:, :, _HB : _HB + bufs.h, _LANES : _LANES + bufs.w]
    return jnp.moveaxis(m, 1, -1).reshape(bufs.lead + (bufs.h, bufs.w, 5))


def update_matrices_gather(
    r0: jnp.ndarray, r1: jnp.ndarray, flow: jnp.ndarray
) -> jnp.ndarray:
    """Pure-XLA emulation of the fused kernels — warp_mode='fast' on
    non-TPU backends, and the oracle for the kernel tests.

    Same separable sampling, same 3-tile window zeroing, same mask, same
    M-build op order. r0, r1: [..., H, W, 5]; flow: [..., H, W, 2]."""
    from opticalflowclustering_tpu.flow.farneback import (
        _border_taper,
        _m_build,
    )

    f32 = jnp.float32
    h, w = flow.shape[-3], flow.shape[-2]
    dx = flow[..., 0]
    dy = flow[..., 1]
    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    gx = xs.astype(f32) + dx
    gy = ys.astype(f32) + dy
    x1 = jnp.floor(gx)
    y1 = jnp.floor(gy)
    fx = gx - x1
    fy = gy - y1
    x1i = x1.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    x1c = jnp.clip(x1i, 0, w - 2)
    y1c = jnp.clip(y1i, 0, h - 2)

    def vsample(idx):
        g = jnp.take_along_axis(
            r1, jnp.broadcast_to(idx[..., None], r1.shape[:-3] + (h, w, 5)),
            axis=-3,
        )
        inwin = jnp.abs((idx >> 7) - (ys >> 7)) <= 1
        return jnp.where(inwin[..., None], g, f32(0.0))

    av = vsample(y1c) * (1 - fy)[..., None] + vsample(y1c + 1) * fy[..., None]

    def hsample(idx):
        g = jnp.take_along_axis(
            av, jnp.broadcast_to(idx[..., None], av.shape[:-3] + (h, w, 5)),
            axis=-2,
        )
        inwin = jnp.abs((idx >> 7) - (xs >> 7)) <= 1
        return jnp.where(inwin[..., None], g, f32(0.0))

    r1w = hsample(x1c) * (1 - fx)[..., None] + hsample(x1c + 1) * fx[..., None]

    inb = (
        (x1i >= 0)
        & (x1i <= w - 2)
        & (y1i >= 0)
        & (y1i <= h - 2)
        & (jnp.abs(y1i - ys) <= _REACH)
        & (jnp.abs(x1i - xs) <= _REACH)
    )
    taper = jnp.asarray(_border_taper(h, w))
    r0c = tuple(r0[..., c] for c in range(5))
    r1wc = tuple(r1w[..., c] for c in range(5))
    return jnp.stack(_m_build(r0c, r1wc, dx, dy, inb, taper), axis=-1)
