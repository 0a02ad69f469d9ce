"""Pallas warp kernel: interpret-mode correctness vs the exact XLA gather,
and pallas-mode Farneback EPE vs cv2 on real frames (CPU runs the kernel in
interpret mode; the TPU path compiles the same program)."""

import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opticalflowclustering_tpu.flow.farneback import (
    FarnebackParams,
    _warp_gather,
    farneback_flow,
)
from opticalflowclustering_tpu.kernels.warp import warp_bilinear_tpu

RNG = np.random.default_rng(17)
REF = "/root/reference/k-means-color-clustering"


def _reference_corners(r1, flow):
    h, w = flow.shape[-3], flow.shape[-2]
    gx = np.arange(w)[None, :] + flow[..., 0]
    gy = np.arange(h)[:, None] + flow[..., 1]
    x1i = np.floor(gx).astype(np.int32)
    y1i = np.floor(gy).astype(np.int32)
    x1c = np.clip(x1i, 0, w - 2)
    y1c = np.clip(y1i, 0, h - 2)
    fx = jnp.asarray(gx - np.floor(gx), jnp.float32)
    fy = jnp.asarray(gy - np.floor(gy), jnp.float32)
    want = np.asarray(
        _warp_gather(jnp.asarray(r1), jnp.asarray(y1c), jnp.asarray(x1c), fx, fy)
    )
    inb = (
        (x1i >= 0) & (x1i <= w - 2) & (y1i >= 0) & (y1i <= h - 2)
        & (np.abs(y1i - np.arange(h)[:, None]) <= 15)
        & (np.abs(x1i - np.arange(w)[None, :]) <= 126)
    )
    return want, inb


@pytest.mark.parametrize("hw,sigma", [((64, 128), 3.0), ((40, 100), 2.0),
                                      ((72, 300), 5.0)])
def test_kernel_matches_exact_gather(hw, sigma):
    h, w = hw
    r1 = RNG.normal(0, 10, (h, w, 5)).astype(np.float32)
    flow = RNG.normal(0, sigma, (h, w, 2)).astype(np.float32)
    out = np.asarray(
        warp_bilinear_tpu(r1, flow, radius=16, block_rows=16, interpret=True)
    )
    want, inb = _reference_corners(r1, flow)
    d = np.where(inb[..., None], np.abs(out - want), 0)
    # FMA-association noise between separately compiled programs only
    assert d.max() < 1e-2
    assert np.median(d[inb]) < 1e-3


def test_kernel_batched():
    r1 = RNG.normal(0, 10, (3, 64, 128, 5)).astype(np.float32)
    flow = RNG.normal(0, 3, (3, 64, 128, 2)).astype(np.float32)
    out = np.asarray(
        warp_bilinear_tpu(r1, flow, radius=16, block_rows=16, interpret=True)
    )
    for i in range(3):
        want, inb = _reference_corners(r1[i], flow[i])
        d = np.where(inb[..., None], np.abs(out[i] - want), 0)
        assert d.max() < 1e-2


def test_kernel_identity_and_shift():
    r1 = RNG.normal(0, 10, (32, 128, 5)).astype(np.float32)
    zero = np.zeros((32, 128, 2), np.float32)
    out = np.asarray(
        warp_bilinear_tpu(r1, zero, radius=8, block_rows=16, interpret=True)
    )
    # interior is the exact identity; the last row/column clamp to the
    # penultimate ones exactly like the XLA gather path (x1c ≤ W-2)
    np.testing.assert_array_equal(out[:31, :126], r1[:31, :126])
    np.testing.assert_array_equal(out[31], out[30])
    np.testing.assert_array_equal(out[:, 127], out[:, 126])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data unavailable")
def test_pallas_mode_epe_on_real_frames():
    d = f"{REF}/images/601_3_cropped_1_OF"
    names = sorted(n for n in os.listdir(d) if n.endswith(".png"))[:3]
    frames = [
        cv2.cvtColor(cv2.imread(os.path.join(d, n)), cv2.COLOR_BGR2GRAY)
        for n in names
    ]
    params = FarnebackParams(warp_mode="pallas", warp_radius=16)
    jf = jax.jit(lambda a, b: farneback_flow(a, b, params))
    for i in range(len(frames) - 1):
        want = cv2.calcOpticalFlowFarneback(
            frames[i], frames[i + 1], None, 0.5, 3, 15, 3, 5, 1.2, 0
        )
        got = np.asarray(jf(frames[i], frames[i + 1]))
        epe = np.sqrt(((got - want) ** 2).sum(-1))
        assert epe.mean() < 1e-3, epe.mean()
