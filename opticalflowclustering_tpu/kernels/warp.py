"""Pallas TPU kernels: the Farneback inner loop (warp + M-build + solve).

The bilinear warp of the 5-channel polynomial-coefficient tensor by the
current flow is the pipeline's hottest op (the reference's cost center is
`cv2.calcOpticalFlowFarneback`, `computeOpticalFlowModule.py:20-22`; ~85%
of round-1 flow time). XLA lowers the per-pixel 2D gather to ~1
element/cycle scalar fetches; separable two-pass schemes (round 1's
select-warp, and a transposed-gather variant tried early in round 2) are
fast but sample the vertical offset at the wrong column — measured 0.1–1 px
EPE vs OpenCV at motion discontinuities on the committed real footage,
failing the <0.1 px north star. This module implements the warp EXACTLY:

  warp+M — one kernel per output tile. A windowed DMA stages ±R source
           rows in VMEM; the kernel reduces the block's vertical
           displacements to [o_lo, o_hi] (two reductions) and runs a
           DYNAMIC candidate loop over only that range — flow is
           box-smoothed, so blocks typically span a handful of rows, not
           2R. Each candidate row is sampled horizontally at the pixel's
           OWN x1 via the TPU's one vectorized gather primitive (the
           intra-vreg 128-lane dynamic gather, `take_along_axis` on a
           [..., 128] tile, tile-split over the ±1 lane tiles), then
           selected into the output where floor(y+dy)-y matches. Both
           indices and both bilinear fractions therefore come from the
           output pixel itself — bit-faithful bilinear sampling, fused
           directly into the M-build (out-of-bounds fallback, border
           taper, normal-equation products).
  solve  — winsize×winsize box sum (replicate border, symmetric-pair
           accumulation like ops.filters.box_sum) + the regularized 2×2
           solve, reading its row/lane halos via one windowed DMA.

Between kernels the flow lives as two padded planes fx, fy [B, Ht, Wt]
(Ht/Wt = H/W rounded up to 128) whose pad region is identically ZERO — the
solve kernel re-masks it every iteration — so no pad/slice/transpose
copies happen anywhere in the iteration loop.

Exactness contract: identical sampling to OpenCV's warp for every pixel
with |floor(y+dy) − y| ≤ R (default 120) and |floor(x+dx) − x| ≤ 127;
beyond that, OpenCV's own out-of-image constant-motion fallback applies
(such displacements only occur at solver spikes on garbage data).
`update_matrices_gather` is the pure-XLA implementation of the same
semantics (exact gather + the same reach masks) — the CPU-backend path of
warp_mode='fast' and the oracle the kernels are tested against
(tests/test_pallas_warp.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_REACH_X = 127  # horizontal displacement coverage of the 3-tile window
_R = 119  # vertical candidate window half-size (R+1 ≡ 0 mod 8 required)
_CHUNK = 16  # rows per candidate-range chunk (tight oy ranges; swept 16/32/64 on-chip — 16 is fastest: smaller chunks bound each chunk's vertical candidate range tighter than the fixed per-chunk overhead costs)
_SB = 128  # solve kernel row block


def _super_rows(ht: int) -> int:
    """Warp-kernel row block: one window DMA serves this many output rows
    (several chunks), amortizing the ±R halo."""
    for d in (512, 384, 256, 128):
        if ht % d == 0:
            return d
    return _LANES


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


def _pack_pair(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Two f32 planes → one f32 plane whose bits hold (bf16(a) | bf16(b)<<16).

    The warp kernel's lane gathers move whole f32 vregs; packing two
    16-bit channel values per vreg halves the takes for those channels
    while keeping data/index bitwidths equal (Mosaic's dynamic_gather
    rejects bf16 data with i32 indices — this sidesteps it)."""
    ha = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    hb = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(ha | (hb << 16), jnp.float32)


def _unpack5(p: jnp.ndarray) -> jnp.ndarray:
    """[3, ...] packed planes → [5, ...] f32: planes 0/1 hold bf16 pairs
    (ch0|ch1, ch2|ch3 — widening bf16→f32 is exact: place the 16 bits in
    the top half), plane 2 is ch4 verbatim f32."""
    u01 = jax.lax.bitcast_convert_type(p[0], jnp.uint32)
    u23 = jax.lax.bitcast_convert_type(p[1], jnp.uint32)

    def bc(u):
        return jax.lax.bitcast_convert_type(u, jnp.float32)

    return jnp.stack(
        [
            bc(u01 << 16),
            bc(u01 & jnp.uint32(0xFFFF0000)),
            bc(u23 << 16),
            bc(u23 & jnp.uint32(0xFFFF0000)),
            p[2],
        ]
    )


def pack_r1_pairs(r1p: jnp.ndarray) -> jnp.ndarray:
    """[B, 5, H', W'] f32 r1 buffer → [B, 3, H', W'] packed (warp_mode=
    'fast16'): channels (0,1) and (2,3) as bf16 pairs, channel 4 exact.
    Zero padding packs to zero bits, so every masked-read contract is
    unchanged. Quantization cost end-to-end: worst mean EPE 0.0043 px vs
    cv2 over the bench's 27-pair real-footage set on chip (the canonical
    number — bench.py/BENCH_r04+; exact path 0.00001 px; target
    < 0.1 px) — the box-sum averaging of the solve washes the per-pixel
    quantization noise out."""
    return jnp.stack(
        [
            _pack_pair(r1p[:, 0], r1p[:, 1]),
            _pack_pair(r1p[:, 2], r1p[:, 3]),
            r1p[:, 4],
        ],
        axis=1,
    )


def quantize_r1_fast16(r1: jnp.ndarray) -> jnp.ndarray:
    """Channel-last [..., 5] r1 with channels 0–3 rounded through bf16 —
    the exact values the packed kernel's unpack produces; feeds the
    XLA-gather fallback/oracle for warp_mode='fast16'."""
    q = r1.astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.concatenate([q[..., :4], r1[..., 4:]], axis=-1)


def _lane_gather3(blocks, idx):
    """Gather `idx` (window-relative lane index, [S, 128] int32) from three
    128-lane tiles `blocks` ([C, S, 128] each) covering lane tiles u-1, u,
    u+1 of an output at tile `u`. Out-of-window → 0.

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


def _warp_m_kernel(
    fx_ref, fy_ref, r0_ref, r1_hbm, out_ref, scratch, acc_ref, sem,
    *, h, w, sup, nb, ni, nu, chunk, packed=False
):
    """Exact warp + M-build for one [5, SUP, 128] block.

    One windowed DMA stages rows [I·SUP − R − 1, I·SUP + SUP + R + 9) ×
    lanes [u·128 − 128, u·128 + 256) of r1 in VMEM, amortizing the ±R halo
    over SUP output rows. The block then processes _CHUNK-row chunks: each
    chunk reduces ITS vertical displacements to [o_lo, o_hi] (flow is
    box-smoothed, so a 32-row chunk spans a handful of candidate rows, not
    2R) and loops o over 8-aligned candidate slabs (Mosaic's dynamic-slice
    rule): candidate rows y+o sample horizontally at each pixel's OWN
    x1/x1+1 (lane gathers) and land in the output rows whose
    floor(y+dy) − y equals o (weight 1−fy) or o−1 (weight fy). Both
    indices and both bilinear fractions come from the output pixel itself
    — exact bilinear sampling."""
    from opticalflowclustering_tpu.flow.farneback import _m_build

    b0 = pl.program_id(0)
    i = pl.program_id(1)
    u = pl.program_id(2)
    f32 = jnp.float32
    win_rows = sup + 2 * (_R + 1) + 8

    # Double-buffered window staging across grid programs: each program
    # starts the NEXT program's window DMA before computing on its own,
    # so the ~5 MB copy streams behind the candidate loop instead of
    # stalling at every grid step (the TPU grid is sequential; scratch
    # persists across programs).
    step = (b0 * ni + i) * nu + u
    slot = jax.lax.rem(step, 2)

    def window_dma(slot_, b_, i_, u_):
        return pltpu.make_async_copy(
            r1_hbm.at[
                b_,
                :,
                pl.ds(i_ * sup, win_rows),
                pl.ds(u_ * _LANES, 3 * _LANES),
            ],
            scratch.at[slot_],
            sem.at[slot_],
        )

    @pl.when(step == 0)
    def _():
        window_dma(slot, b0, i, u).start()

    nxt = step + 1

    @pl.when(nxt < nb * ni * nu)
    def _():
        r = jax.lax.rem(nxt, ni * nu)
        window_dma(
            jax.lax.rem(nxt, 2),
            nxt // (ni * nu),
            r // nu,
            jax.lax.rem(r, nu),
        ).start()

    dx = fx_ref[0]  # [SUP, 128]
    dy = fy_ref[0]
    y = jax.lax.broadcasted_iota(jnp.int32, dx.shape, 0) + i * sup
    x = jax.lax.broadcasted_iota(jnp.int32, dx.shape, 1) + u * _LANES
    gx = x.astype(f32) + dx
    gy = y.astype(f32) + dy
    x1 = jnp.floor(gx)
    y1 = jnp.floor(gy)
    fx = (gx - x1)[None]
    fy = (gy - y1)[None]
    x1i = x1.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    x1c = jnp.clip(x1i, 0, w - 2)
    y1c = jnp.clip(y1i, 0, h - 2)
    oy = jnp.clip(y1c - y, -_R, _R)

    inb = (
        (x1i >= 0)
        & (x1i <= w - 2)
        & (y1i >= 0)
        & (y1i <= h - 2)
        & (jnp.abs(y1i - y) <= _R)
        & (jnp.abs(x1i - x) <= _REACH_X)
    )
    taper = _taper_ramp(y, h) * _taper_ramp(x, w)

    window_dma(slot, b0, i, u).wait()
    win = scratch.at[slot]

    for c in range(sup // chunk):
        rows_sl = slice(c * chunk, (c + 1) * chunk)
        oy_c = oy[rows_sl]
        x1c_c = x1c[rows_sl]
        fx_c = fx[:, rows_sl]
        fy_c = fy[:, rows_sl]
        o_lo = jnp.min(oy_c)
        o_hi = jnp.max(oy_c)

        def hgather(rows, x1c_c=x1c_c, fx_c=fx_c):
            """rows: [C, CHUNK, 384] candidate row window (C=5 plain,
            C=3 bf16-packed); horizontal bilinear sample at each pixel's
            own x1/x1+1. Packed windows gather 3 planes per take set
            (40% fewer takes) and unpack to 5 f32 channels — exact bf16
            widening, pure VPU bit ops — before the interpolation."""
            blocks = tuple(
                rows[:, :, k * _LANES : (k + 1) * _LANES] for k in range(3)
            )
            rel0 = x1c_c - (u - 1) * _LANES
            g0 = _lane_gather3(blocks, rel0)
            g1 = _lane_gather3(blocks, rel0 + 1)
            if packed:
                g0 = _unpack5(g0)
                g1 = _unpack5(g1)
            return g0 * (f32(1.0) - fx_c) + g1 * fx_c

        acc_ref[...] = jnp.zeros((5, chunk, _LANES), f32)

        def body(q, carry, c=c, oy_c=oy_c, fy_c=fy_c, hgather=hgather,
                 o_lo=o_lo, o_hi=o_hi):
            # Candidate group q covers o ∈ [8q, 8q+7]; the slab's window
            # row start 8q + (R+1) + c·CHUNK is 8-aligned. Dead candidates
            # (outside [o_lo, o_hi+1]) are branch-skipped — the 8-group
            # alignment costs no gathers.
            slab = win[
                :, pl.ds(q * 8 + _R + 1 + c * chunk, chunk + 8), :
            ]
            for s in range(8):
                o = q * 8 + s

                @pl.when((o >= o_lo) & (o <= o_hi + 1))
                def _(o=o, s=s, slab=slab):
                    hx = hgather(slab[:, s : s + chunk, :])
                    # Candidate row o lands with weight 1−fy where it is the
                    # pixel's own floor row, fy where it is the row below —
                    # the masks are mutually exclusive, so one fused weight
                    # plane replaces two full-size where+add passes.
                    w0 = jnp.where(
                        (oy_c == o)[None], f32(1.0) - fy_c, f32(0.0)
                    ) + jnp.where((oy_c == o - 1)[None], fy_c, f32(0.0))
                    acc_ref[...] = acc_ref[...] + hx * w0

            return carry

        # Candidates needed: o ∈ [o_lo, o_hi + 1] (the +1 row carries fy).
        jax.lax.fori_loop(o_lo >> 3, ((o_hi + 1) >> 3) + 1, body, 0)
        r1w = acc_ref[...]

        r0c = tuple(r0_ref[0, ch, rows_sl] for ch in range(5))
        r1wc = tuple(r1w[ch] for ch in range(5))
        m = _m_build(
            r0c,
            r1wc,
            dx[rows_sl],
            dy[rows_sl],
            inb[rows_sl],
            taper[rows_sl],
        )
        out_ref[0, :, rows_sl, :] = jnp.stack(m, axis=0)


def _solve_kernel(
    m_hbm, fx_ref, fy_ref, scratch, sem,
    *, h, w, lb, row0, lane0, winsize, nb, ni, nu
):
    """Flow update for one [SB, LB] tile: winsize box sum of the 5-channel
    M (replicate border, symmetric-pair order like ops.filters.box_sum)
    and the 1e-3-regularized 2×2 solve. Reads its ±7-row/±7-col halo via
    one windowed async copy from the halo-padded M buffer (data origin at
    row `row0`, lane `lane0`)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    u = pl.program_id(2)
    f32 = jnp.float32
    rad = winsize // 2

    # Window rows [i*SB - 8, i*SB + SB + 8), lanes [u*lb - 128, +lb + 128),
    # both in-bounds thanks to the one-block halo of the M buffer.
    # Double-buffered across grid programs (same scheme as _warp_m_kernel).
    step = (b * ni + i) * nu + u
    slot = jax.lax.rem(step, 2)

    def window_dma(slot_, b_, i_, u_):
        return pltpu.make_async_copy(
            m_hbm.at[
                b_,
                :,
                pl.ds(row0 + i_ * _SB - 8, _SB + 16),
                pl.ds(lane0 + u_ * lb - _LANES, lb + 2 * _LANES),
            ],
            scratch.at[slot_],
            sem.at[slot_],
        )

    @pl.when(step == 0)
    def _():
        window_dma(slot, b, i, u).start()

    nxt = step + 1

    @pl.when(nxt < nb * ni * nu)
    def _():
        r = jax.lax.rem(nxt, ni * nu)
        window_dma(
            jax.lax.rem(nxt, 2),
            nxt // (ni * nu),
            r // nu,
            jax.lax.rem(r, nu),
        ).start()

    window_dma(slot, b, i, u).wait()
    win = scratch.at[slot]

    yloc = jax.lax.broadcasted_iota(jnp.int32, (1, _SB, 1), 1) + i * _SB
    xloc = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lb), 2) + u * lb

    def vertical_box(wm):
        acc = wm[:, 8 : 8 + _SB, :]
        for d in range(1, rad + 1):
            acc = acc + (
                wm[:, 8 - d : 8 - d + _SB, :] + wm[:, 8 + d : 8 + d + _SB, :]
            )
        return acc

    def horizontal_box(acc):
        hacc = acc[:, :, _LANES : _LANES + lb]
        for d in range(1, rad + 1):
            hacc = hacc + (
                acc[:, :, _LANES - d : _LANES - d + lb]
                + acc[:, :, _LANES + d : _LANES + d + lb]
            )
        return hacc

    def solve_write(hacc, mask_pad):
        s = hacc * f32(1.0 / (winsize * winsize))
        g11, g12, g22, h1, h2 = (s[c] for c in range(5))
        idet = f32(1.0) / (g11 * g22 - g12 * g12 + f32(1e-3))
        fx = (g11 * h2 - g12 * h1) * idet
        fy = (g22 * h1 - g12 * h2) * idet
        if mask_pad:
            # Keep the pad region identically zero — the invariant every
            # other kernel's masks rely on.
            valid = (yloc[0] < h) & (xloc[0] < w)
            fx = jnp.where(valid, fx, f32(0.0))
            fy = jnp.where(valid, fy, f32(0.0))
        fx_ref[0] = fx
        fy_ref[0] = fy

    # Interior tiles — the common case: the ±(rad+1)-row/lane window cannot
    # touch a frame border or the zero-pad region, so the replicate
    # clamping and pad re-masking are no-ops and are skipped entirely.
    interior = (
        (i * _SB >= 8)
        & (i * _SB + _SB + 8 <= h)
        & (u * lb >= _LANES)
        & (u * lb + lb + _LANES <= w)
    )

    @pl.when(interior)
    def _():
        solve_write(horizontal_box(vertical_box(win[...])), mask_pad=False)

    @pl.when(jnp.logical_not(interior))
    def _():
        # Vertical box with replicate clamping. Absolute row of window row
        # j is i*SB - 8 + j; rows 0 and h-1 live at window positions
        # 8 - i*SB and 8 + (h-1) - i*SB (clamped ds — the masks are false
        # whenever the position is actually out of window). Replicate
        # clamping pre-clamps the WINDOW once (two wheres over SB+16 rows)
        # instead of two wheres per tap over SB rows — the taps then read
        # identical values in the identical symmetric-pair order, so
        # results are bitwise unchanged while the masking work drops ~7×.
        wm = win[...]  # [5, SB+16, lb+256]
        rowf = win[:, pl.ds(jnp.clip(8 - i * _SB, 0, _SB + 15), 1), :]
        rowl = win[
            :, pl.ds(jnp.clip(8 + h - 1 - i * _SB, 0, _SB + 15), 1), :
        ]
        wrow = (
            jax.lax.broadcasted_iota(jnp.int32, (1, _SB + 16, 1), 1)
            + i * _SB
            - 8
        )
        wm = jnp.where(wrow < 0, rowf, jnp.where(wrow > h - 1, rowl, wm))
        acc = vertical_box(wm)

        # Same pre-clamp trick on the lane axis: replace window lanes whose
        # global column is outside [0, w-1] with the replicate columns
        # (extracted with one-hot masked reductions — Mosaic has no
        # dynamic_slice on values).
        wloc = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, lb + 2 * _LANES), 2
        )
        p0 = jnp.clip(_LANES - u * lb, 0, lb + 2 * _LANES - 1)
        pl_ = jnp.clip(_LANES + w - 1 - u * lb, 0, lb + 2 * _LANES - 1)
        col0 = jnp.sum(
            jnp.where(wloc == p0, acc, f32(0.0)), axis=2, keepdims=True
        )
        coll = jnp.sum(
            jnp.where(wloc == pl_, acc, f32(0.0)), axis=2, keepdims=True
        )
        wcol = wloc + u * lb - _LANES
        acc = jnp.where(wcol < 0, col0, jnp.where(wcol > w - 1, coll, acc))
        solve_write(horizontal_box(acc), mask_pad=True)


@dataclasses.dataclass(frozen=True)
class FusedLevelBuffers:
    """Per-pyramid-level constants for the fused kernels, prepared once per
    level and reused across the solver iterations (the channel-first
    transposes and halo pads of r0/r1 are iteration-invariant)."""

    r0p: jnp.ndarray  # [B, 5, Ht, Wt]                 channel-first, zero-pad
    r1p: jnp.ndarray  # [B, 5, R+1+Ht+R+1+HB, Wt+256]  row/lane halo-padded
    lead: tuple
    h: int
    w: int

    @property
    def ht(self) -> int:
        return self.r0p.shape[2]

    @property
    def wt(self) -> int:
        return self.r0p.shape[3]


def prepare_fused_level(
    r0: jnp.ndarray, r1: jnp.ndarray, pack16: bool = False
) -> FusedLevelBuffers:
    """r0, r1: [..., H, W, 5] float32 polynomial-expansion tensors."""
    return prepare_fused_level_cf(
        jnp.moveaxis(r0, -1, -3), jnp.moveaxis(r1, -1, -3), pack16=pack16
    )


def prepare_fused_level_cf(
    r0: jnp.ndarray, r1: jnp.ndarray, pack16: bool = False
) -> FusedLevelBuffers:
    """Channel-first variant: r0, r1 [..., 5, H, W] (what
    `poly_expansion(..., channel_first=True)` emits) — the hot path pads
    straight into the kernel layout without a full-tensor transpose.

    `pack16=True` (warp_mode='fast16') stores r1 as 3 planes with
    channels (0,1)/(2,3) bf16-packed per f32 (pack_r1_pairs): 40% fewer
    candidate lane-gathers and 40% smaller window DMAs in the warp
    kernel, at a measured 0.0043 px worst EPE cost (bench.py 27-pair set, on chip). r0 stays full f32 — only
    the gathered tensor pays the packing."""
    lead = r0.shape[:-3]
    h, w = r0.shape[-2], r0.shape[-1]
    b = 1
    for d in lead:
        b *= d
    wt = _ceil_to(w, _LANES)
    ht = _ceil_to(h, _LANES)

    r0f = r0.reshape((b, 5, h, w))
    r0p = jnp.pad(r0f, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)))

    r1f = r1.reshape((b, 5, h, w))
    # Row pad: R+1 above, enough below that the last row block's window
    # (sup + 2(R+1) + 8 rows) stays in bounds; lane pad: one tile each
    # side for the ±1-tile horizontal gather window. Zero-filled — every
    # read beyond the clipped index range is select-masked.
    below = (ht - h) + (_R + 1) + 8
    r1p = jnp.pad(
        r1f,
        (
            (0, 0),
            (0, 0),
            (_R + 1, below),
            (_LANES, (wt - w) + _LANES),
        ),
    )
    if pack16:
        r1p = pack_r1_pairs(r1p)
    return FusedLevelBuffers(r0p, r1p, lead, h, w)


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
    chunk: int = _CHUNK,
) -> jnp.ndarray:
    """Exact warp + M-build: M in the halo-padded buffer
    [B, 5, Ht + 2·sup, Wt + 2·128] (one halo block per side, uninitialized;
    every consumer masks them). fx, fy: padded planes.

    `chunk` = rows per candidate-range chunk. 16 (the default) measured
    fastest at EVERY pyramid level: flow *slope*, not magnitude, sets a
    chunk's vertical candidate range, so coarse levels gain nothing from
    bigger chunks (32 at coarse levels benched 140.9 vs 148.6 fps end to
    end). The parameter exists for on-chip sweeps
    (scripts/warp_chunk_sweep.py)."""
    h, w, ht, wt = bufs.h, bufs.w, bufs.ht, bufs.wt
    b = bufs.r0p.shape[0]
    sup = _super_rows(ht)
    # The kernel's candidate loop runs `sup // chunk` times and each slab
    # start is 8-row aligned (`q*8 + _R+1 + c*chunk`): a chunk that doesn't
    # divide sup would silently drop tail rows; a non-multiple-of-8 chunk
    # would misalign every slab.
    if sup % chunk != 0 or chunk % 8 != 0:
        raise ValueError(
            f"chunk={chunk} must divide sup={sup} and be a multiple of 8"
        )

    # r1p channel count selects the plain (5) or bf16-packed (3) window.
    cq = bufs.r1p.shape[1]
    fspec = pl.BlockSpec(
        (1, sup, _LANES), lambda b_, i, u: (b_, i, u),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(
            _warp_m_kernel, h=h, w=w, sup=sup,
            nb=b, ni=ht // sup, nu=wt // _LANES, chunk=chunk,
            packed=cq == 3,
        ),
        grid=(b, ht // sup, wt // _LANES),
        in_specs=[
            fspec,
            fspec,
            pl.BlockSpec(
                (1, 5, sup, _LANES), lambda b_, i, u: (b_, 0, i, u),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 5, sup, _LANES), lambda b_, i, u: (b_, 0, i + 1, u + 1),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, 5, ht + 2 * sup, wt + 2 * _LANES), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, cq, sup + 2 * (_R + 1) + 8, 3 * _LANES), jnp.float32
            ),
            pltpu.VMEM((5, chunk, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # The unrolled candidate slabs' scheduled temporaries exceed
            # the 16MB default scoped-vmem cap; v5e VMEM is 128MB.
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fx, fy, bufs.r0p, bufs.r1p)


def fused_solve(
    bufs: FusedLevelBuffers,
    mpad: jnp.ndarray,
    winsize: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Box-filtered 2×2 solve of the halo-padded M → (fx, fy) padded planes
    (pad region re-zeroed). Mirrors flow.farneback._update_flow with
    gaussian=False. The windowed DMA stages an 8-row/±128-lane halo, so the
    box radius must fit in it (farneback_flow falls back to the XLA solve
    beyond winsize 17)."""
    if winsize // 2 > 8:
        raise ValueError(
            f"fused_solve supports winsize <= 17 (8-row DMA halo); got "
            f"{winsize}"
        )
    h, w, ht, wt = bufs.h, bufs.w, bufs.ht, bufs.wt
    b = mpad.shape[0]
    lb = 2 * _LANES if wt % (2 * _LANES) == 0 else _LANES
    row0 = _super_rows(ht)  # the M buffer's row halo (fused_m_planes' sup)
    lane0 = _LANES  # the M buffer's lane halo
    ospec = pl.BlockSpec(
        (1, _SB, lb), lambda b_, i, u: (b_, i, u), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _solve_kernel, h=h, w=w, lb=lb, row0=row0, lane0=lane0,
            winsize=winsize, nb=b, ni=ht // _SB, nu=wt // lb,
        ),
        grid=(b, ht // _SB, wt // lb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((b, ht, wt), jnp.float32),
            jax.ShapeDtypeStruct((b, ht, wt), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 5, _SB + 16, lb + 2 * _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(mpad)


def fused_update_matrices(
    bufs: FusedLevelBuffers, flow: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Channel-last convenience wrapper (tests / ad-hoc use): flow
    [..., H, W, 2] → M [..., H, W, 5]. The Farneback loop uses the padded
    plane API (fused_m_planes / fused_solve) to avoid all pad/slice
    copies."""
    fx, fy = pad_flow_planes(bufs, flow)
    mpad = fused_m_planes(bufs, fx, fy, interpret=interpret)
    row0 = _super_rows(bufs.ht)
    m = mpad[:, :, row0 : row0 + bufs.h, _LANES : _LANES + bufs.w]
    return jnp.moveaxis(m, 1, -1).reshape(bufs.lead + (bufs.h, bufs.w, 5))


def update_matrices_gather(
    r0: jnp.ndarray, r1: jnp.ndarray, flow: jnp.ndarray
) -> jnp.ndarray:
    """Pure-XLA implementation of the kernels' exact semantics —
    warp_mode='fast' on non-TPU backends, and the oracle for the kernel
    tests: exact bilinear gather plus the kernels' reach masks.
    r0, r1: [..., H, W, 5]; flow: [..., H, W, 2]."""
    from opticalflowclustering_tpu.flow.farneback import (
        _border_taper,
        _m_build,
        _warp_gather,
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

    r1w = _warp_gather(r1, y1c, x1c, fx, fy)

    inb = (
        (x1i >= 0)
        & (x1i <= w - 2)
        & (y1i >= 0)
        & (y1i <= h - 2)
        & (jnp.abs(y1i - ys) <= _R)
        & (jnp.abs(x1i - xs) <= _REACH_X)
    )
    taper = jnp.asarray(_border_taper(h, w))
    r0c = tuple(r0[..., c] for c in range(5))
    r1wc = tuple(r1w[..., c] for c in range(5))
    return jnp.stack(_m_build(r0c, r1wc, dx, dy, inb, taper), axis=-1)
