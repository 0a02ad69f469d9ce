"""Bit-exactness tests for ops.colorspace against OpenCV itself."""

import cv2
import numpy as np
import pytest

from opticalflowclustering_tpu.ops import (
    bgr2gray,
    bgr2hsv,
    bgr2rgb,
    hsv2bgr,
)

RNG = np.random.default_rng(0)


def _full_bgr_domain():
    """All 256³ BGR triples as a (4096, 4096, 3) uint8 image."""
    b, g, r = np.meshgrid(
        np.arange(256, dtype=np.uint8),
        np.arange(256, dtype=np.uint8),
        np.arange(256, dtype=np.uint8),
        indexing="ij",
    )
    return np.stack([b, g, r], axis=-1).reshape(4096, 4096, 3)


@pytest.fixture(scope="module")
def bgr_domain():
    return _full_bgr_domain()


@pytest.mark.oracle
def test_bgr2gray_exhaustive(bgr_domain):
    want = cv2.cvtColor(bgr_domain, cv2.COLOR_BGR2GRAY)
    got = np.asarray(bgr2gray(bgr_domain))
    np.testing.assert_array_equal(got, want)


@pytest.mark.oracle
def test_bgr2hsv_exhaustive(bgr_domain):
    want = cv2.cvtColor(bgr_domain, cv2.COLOR_BGR2HSV)
    got = np.asarray(bgr2hsv(bgr_domain))
    np.testing.assert_array_equal(got, want)


@pytest.mark.oracle
def test_hsv2bgr_exhaustive_vs_large_image_path():
    # Full valid HSV domain: H in [0,180), S,V in [0,256). On large images
    # cv2+IPP dispatches to an IPP kernel that truncates where OpenCV's own
    # scalar algorithm rounds, disagreeing by ±1 on ~1/3 of inputs; we
    # implement the canonical scalar path, so bound the disagreement to ±1
    # here and pin bit-exactness against the scalar path in the test below.
    h, s, v = np.meshgrid(
        np.arange(180, dtype=np.uint8),
        np.arange(256, dtype=np.uint8),
        np.arange(256, dtype=np.uint8),
        indexing="ij",
    )
    hsv = np.stack([h, s, v], axis=-1).reshape(180 * 256, 256, 3)
    want = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR).astype(np.int32)
    got = np.asarray(hsv2bgr(hsv)).astype(np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= 1


def test_hsv2bgr_exact_vs_scalar_path():
    # 1×1 images take cv2's scalar (non-IPP) code path — our ground truth.
    triples = RNG.integers(0, 256, size=(512, 3), dtype=np.uint8)
    edge = np.array(
        [[0, 0, 0], [0, 0, 255], [179, 255, 255], [0, 49, 255], [0, 51, 5],
         [0, 1, 129], [90, 128, 128], [255, 255, 255], [200, 10, 250]],
        dtype=np.uint8,
    )
    triples = np.concatenate([triples, edge])
    want = np.stack(
        [cv2.cvtColor(t.reshape(1, 1, 3), cv2.COLOR_HSV2BGR)[0, 0] for t in triples]
    )
    got = np.asarray(hsv2bgr(triples.reshape(-1, 1, 1, 3))).reshape(-1, 3)
    np.testing.assert_array_equal(got, want)


def test_bgr2rgb():
    x = RNG.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(bgr2rgb(x)), cv2.cvtColor(x, cv2.COLOR_BGR2RGB)
    )


def test_batched_shapes():
    x = RNG.integers(0, 256, size=(3, 4, 8, 6, 3), dtype=np.uint8)
    got = np.asarray(bgr2hsv(x))
    for i in range(3):
        for j in range(4):
            want = cv2.cvtColor(x[i, j], cv2.COLOR_BGR2HSV)
            np.testing.assert_array_equal(got[i, j], want)
