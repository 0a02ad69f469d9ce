"""Farneback flow accuracy vs cv2.calcOpticalFlowFarneback (the oracle).

BASELINE.md target: EPE < 0.1 px vs OpenCV with the reference's params
(0.5, 3, 15, 3, 5, 1.2, 0). We hold ourselves to far tighter: the
implementation tracks OpenCV to ~1e-5 px.
"""

import cv2
import jax
import numpy as np
import pytest

from opticalflowclustering_tpu.flow import (
    FarnebackParams,
    farneback_flow,
    farneback_flow_batched,
)

pytestmark = pytest.mark.slow

RNG = np.random.default_rng(7)


def _textured(h, w, sigma=4, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(128, 40, size=(h, w)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), sigma)
    return np.clip(base, 0, 255).astype(np.uint8)


def _epe(a, b):
    return np.sqrt(((a - b) ** 2).sum(-1))


@pytest.mark.parametrize(
    "h,w,shift",
    [
        (140, 200, (1.3, -0.7)),
        (240, 320, (-2.1, 0.4)),
        (64, 96, (0.5, 0.5)),  # small: pyramid truncates to fewer levels
    ],
)
def test_epe_vs_cv2_translation(h, w, shift):
    prev = _textured(h, w, seed=h + w)
    m = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
    nxt = cv2.warpAffine(prev, m, (w, h))
    want = cv2.calcOpticalFlowFarneback(prev, nxt, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    got = np.asarray(jax.jit(farneback_flow)(prev, nxt))
    assert _epe(got, want).max() < 1e-3


def test_epe_vs_cv2_rotation():
    prev = _textured(180, 240, seed=3)
    m = cv2.getRotationMatrix2D((120, 90), 2.0, 1.01)
    nxt = cv2.warpAffine(prev, m, (240, 180))
    want = cv2.calcOpticalFlowFarneback(prev, nxt, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    got = np.asarray(jax.jit(farneback_flow)(prev, nxt))
    assert _epe(got, want).mean() < 1e-4
    assert _epe(got, want).max() < 1e-2


def test_epe_on_reference_frames():
    """Real frames from the reference's committed PNG sequences."""
    import os

    d = "/root/reference/k-means-color-clustering/images/601_3_cropped_1_OF"
    if not os.path.isdir(d):
        pytest.skip("reference data unavailable")
    names = sorted(n for n in os.listdir(d) if n.endswith(".png"))[:2]
    f0 = cv2.cvtColor(cv2.imread(os.path.join(d, names[0])), cv2.COLOR_BGR2GRAY)
    f1 = cv2.cvtColor(cv2.imread(os.path.join(d, names[1])), cv2.COLOR_BGR2GRAY)
    want = cv2.calcOpticalFlowFarneback(f0, f1, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    got = np.asarray(jax.jit(farneback_flow)(f0, f1))
    assert _epe(got, want).max() < 1e-2
    assert _epe(got, want).mean() < 1e-4


def test_gaussian_window_variant():
    prev = _textured(120, 160, seed=11)
    nxt = cv2.warpAffine(prev, np.float32([[1, 0, 0.8], [0, 1, 0.3]]), (160, 120))
    want = cv2.calcOpticalFlowFarneback(
        prev, nxt, None, 0.5, 3, 15, 3, 5, 1.2, cv2.OPTFLOW_FARNEBACK_GAUSSIAN
    )
    params = FarnebackParams(gaussian_win=True)
    got = np.asarray(jax.jit(lambda a, b: farneback_flow(a, b, params))(prev, nxt))
    assert _epe(got, want).max() < 1e-2


def test_batched_matches_sequential():
    frames = np.stack([_textured(96, 128, seed=s) for s in range(4)])
    got = np.asarray(jax.jit(farneback_flow_batched)(frames))
    assert got.shape == (3, 96, 128, 2)
    for i in range(3):
        want = cv2.calcOpticalFlowFarneback(
            frames[i], frames[i + 1], None, 0.5, 3, 15, 3, 5, 1.2, 0
        )
        assert _epe(got[i], want).max() < 1e-2
