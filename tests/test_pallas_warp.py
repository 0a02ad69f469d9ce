"""Fused Pallas warp+M+solve kernels (warp_mode='fast'): interpret-mode
parity against the XLA oracle, exactness vs the exact-gather path, and
end-to-end Farneback EPE vs cv2 on real high-motion frames. The TPU path
compiles the same kernel programs the interpreter executes."""

import os

import cv2
import numpy as np
import pytest

import jax

from opticalflowclustering_tpu.flow.farneback import (
    FarnebackParams,
    farneback_flow,
    update_matrices,
)
from opticalflowclustering_tpu.kernels.warp import (
    fused_update_matrices,
    prepare_fused_level,
    update_matrices_gather,
)

pytestmark = pytest.mark.slow

RNG = np.random.default_rng(17)
REF = "/root/reference/k-means-color-clustering"


def _rand_case(shape_hw, sigma, lead=()):
    h, w = shape_hw
    r0 = RNG.normal(0, 10, lead + (h, w, 5)).astype(np.float32)
    r1 = RNG.normal(0, 10, lead + (h, w, 5)).astype(np.float32)
    flow = RNG.normal(0, sigma, lead + (h, w, 2)).astype(np.float32)
    return r0, r1, flow


def test_gather_semantics_equal_exact_within_reach():
    """'fast' is EXACT: for displacements within the kernels' reach the
    XLA oracle is bitwise the exact-gather path (only the spike masks
    differ, and they never trigger at these magnitudes)."""
    for hw, sigma in [((64, 128), 3.0), ((200, 264), 12.0)]:
        r0, r1, flow = _rand_case(hw, sigma)
        want = np.asarray(update_matrices(r0, r1, flow, "exact"))
        got = np.asarray(update_matrices_gather(r0, r1, flow))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "hw,sigma",
    [((64, 128), 3.0), ((40, 100), 2.0), ((72, 300), 60.0), ((200, 136), 8.0)],
)
def test_kernel_matches_oracle(hw, sigma):
    """The interpret-mode kernel and the XLA oracle implement the same
    sampling, masks, and M-build op order; only FMA contraction differs
    between the two compiled programs."""
    r0, r1, flow = _rand_case(hw, sigma)
    bufs = prepare_fused_level(r0, r1)
    got = np.asarray(fused_update_matrices(bufs, flow, interpret=True))
    want = np.asarray(update_matrices_gather(r0, r1, flow))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_kernel_bitwise_on_integer_exact_case():
    """With integer-valued coefficients and integer flow every operation is
    exact in f32, so kernel vs oracle must agree BITWISE — any sampling,
    window, or mask discrepancy would surface here."""
    h, w = 72, 300
    r0 = RNG.integers(-8, 8, (h, w, 5)).astype(np.float32)
    r1 = RNG.integers(-8, 8, (h, w, 5)).astype(np.float32)
    flow = RNG.integers(-150, 150, (h, w, 2)).astype(np.float32)
    bufs = prepare_fused_level(r0, r1)
    got = np.asarray(fused_update_matrices(bufs, flow, interpret=True))
    want = np.asarray(update_matrices_gather(r0, r1, flow))
    # Interior only: the 5-px border taper introduces inexact products where
    # FMA contraction may differ between the two compiled programs.
    np.testing.assert_array_equal(got[5:-5, 5:-5], want[5:-5, 5:-5])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_kernel_matches_oracle_batched():
    r0, r1, flow = _rand_case((48, 160), 4.0, lead=(2, 3))
    bufs = prepare_fused_level(r0, r1)
    got = np.asarray(fused_update_matrices(bufs, flow, interpret=True))
    want = np.asarray(update_matrices_gather(r0, r1, flow))
    assert got.shape == (2, 3, 48, 160, 5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_identity_flow_is_identity_warp():
    r0, r1, _ = _rand_case((32, 128), 0)
    zero = np.zeros((32, 128, 2), np.float32)
    want = np.asarray(update_matrices(r0, r1, zero, warp_mode="exact"))
    got = np.asarray(update_matrices_gather(r0, r1, zero))
    np.testing.assert_array_equal(got, want)
    bufs = prepare_fused_level(r0, r1)
    kern = np.asarray(fused_update_matrices(bufs, zero, interpret=True))
    # The interpret-mode kernel body is jitted (FMA contraction), the eager
    # oracle is not — identical sampling, float-noise-only differences.
    np.testing.assert_allclose(kern, want, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("hw", [(64, 128), (72, 300), (200, 136), (128, 256)])
def test_solve_kernel_matches_update_flow(hw):
    """The windowed box+solve kernel mirrors _update_flow (replicate
    border, symmetric-pair accumulation, 1e-3 regularization)."""
    from opticalflowclustering_tpu.flow.farneback import _update_flow
    from opticalflowclustering_tpu.kernels.warp import (
        fused_m_planes,
        fused_solve,
        pad_flow_planes,
        planes_to_flow,
    )

    r0, r1, flow = _rand_case(hw, 3.0, lead=(2,))
    bufs = prepare_fused_level(r0, r1)
    fx, fy = pad_flow_planes(bufs, flow)
    mpad = fused_m_planes(bufs, fx, fy, interpret=True)
    sx, sy = fused_solve(bufs, mpad, 15, interpret=True)
    got = np.asarray(planes_to_flow(bufs, sx, sy))

    m = np.asarray(update_matrices_gather(r0, r1, flow))
    want = np.asarray(_update_flow(m, 15, False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # Pad region stays identically zero (the invariant the kernels rely on).
    assert not np.any(np.asarray(sx)[:, hw[0]:, :])
    assert not np.any(np.asarray(sx)[:, :, hw[1]:])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data unavailable")
def test_fast_mode_epe_on_real_high_motion_frames():
    """End-to-end Farneback in warp_mode='fast' (XLA oracle on CPU —
    identical semantics to the TPU kernels) vs cv2 on real reference
    footage, over pairs with up to ~30 px/frame motion — the regime where
    separable warps fail (round-2 measurement: 0.1–1.0 px EPE)."""
    d = f"{REF}/images/601_3_cropped_3_OF"
    names = sorted(n for n in os.listdir(d) if n.endswith(".png"))[48:54]
    frames = [
        cv2.cvtColor(cv2.imread(os.path.join(d, n)), cv2.COLOR_BGR2GRAY)
        for n in names
    ]
    params = FarnebackParams(warp_mode="fast")
    jf = jax.jit(lambda a, b: farneback_flow(a, b, params))
    for i in range(len(frames) - 1):
        want = cv2.calcOpticalFlowFarneback(
            frames[i], frames[i + 1], None, 0.5, 3, 15, 3, 5, 1.2, 0
        )
        got = np.asarray(jf(frames[i], frames[i + 1]))
        epe = np.sqrt(((got - want) ** 2).sum(-1))
        assert epe.mean() < 1e-3, (i, epe.mean())


@pytest.mark.parametrize("hw,sigma", [((64, 128), 3.0), ((72, 300), 12.0)])
def test_packed_kernel_matches_quantized_oracle(hw, sigma):
    """warp_mode='fast16': the bf16-pair packed kernel must equal the
    quantize-then-exact-gather oracle to float-noise level — the unpack
    (bf16→f32 widening) is exact, so both paths interpolate the SAME
    values; only FMA contraction differs between the compiled programs."""
    from opticalflowclustering_tpu.kernels.warp import quantize_r1_fast16

    r0, r1, flow = _rand_case(hw, sigma)
    bufs = prepare_fused_level(r0, r1, pack16=True)
    assert bufs.r1p.shape[1] == 3  # packed layout
    got = np.asarray(fused_update_matrices(bufs, flow, interpret=True))
    want = np.asarray(
        update_matrices_gather(r0, np.asarray(quantize_r1_fast16(r1)), flow)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pack_unpack_roundtrip_exact():
    """pack_r1_pairs → _unpack5 reproduces bf16(ch0..3) exactly and ch4
    bit-for-bit (bf16→f32 widening is exact by construction)."""
    from opticalflowclustering_tpu.kernels.warp import _unpack5, pack_r1_pairs

    x = RNG.normal(0, 100, (2, 5, 16, 128)).astype(np.float32)
    packed = pack_r1_pairs(x)
    assert packed.shape == (2, 3, 16, 128)
    un = np.asarray(jax.vmap(_unpack5)(packed))
    want = np.asarray(x.astype(jax.numpy.bfloat16).astype(np.float32))
    np.testing.assert_array_equal(un[:, :4], want[:, :4])
    np.testing.assert_array_equal(un[:, 4], x[:, 4])  # ch4 exact


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data needed")
def test_fast16_epe_vs_cv2_real_footage():
    """End-to-end warp_mode='fast16' on real high-motion reference frames:
    the bf16 packing must stay ~50× under the 0.1 px EPE target. This
    3-pair CPU-backend subset measured 0.0018 px worst at implementation
    time; the CANONICAL fast16 EPE is 0.0043 px — the bench's full
    27-pair real-footage set on chip (bench.py, BENCH_r04+)."""
    import glob

    fs = sorted(glob.glob(f"{REF}/images/601_3_cropped_4_OF/*.png"))[38:42]
    gray = [cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2GRAY) for f in fs]
    params = FarnebackParams(warp_mode="fast16")
    fn = jax.jit(lambda a, b: farneback_flow(a, b, params))
    worst = 0.0
    for a, b in zip(gray, gray[1:]):
        want = cv2.calcOpticalFlowFarneback(
            a, b, None, 0.5, 3, 15, 3, 5, 1.2, 0
        )
        got = np.asarray(fn(a, b))
        worst = max(worst, float(np.sqrt(((got - want) ** 2).sum(-1)).mean()))
    assert worst < 0.01, worst
