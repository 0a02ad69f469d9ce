"""resize/filter ops vs cv2."""

import cv2
import numpy as np

from opticalflowclustering_tpu.ops.filters import box_sum, gaussian_blur
from opticalflowclustering_tpu.ops.resize import resize_linear, resize_linear_hwc

RNG = np.random.default_rng(2)


def test_resize_linear_downscale():
    img = RNG.normal(100, 30, size=(180, 240)).astype(np.float32)
    for dst in [(90, 120), (45, 60), (63, 87), (180, 240)]:
        want = cv2.resize(img, (dst[1], dst[0]), interpolation=cv2.INTER_LINEAR)
        got = np.asarray(resize_linear(img, dst))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_resize_linear_upscale():
    img = RNG.normal(100, 30, size=(45, 61)).astype(np.float32)
    for dst in [(90, 122), (180, 244), (91, 123)]:
        want = cv2.resize(img, (dst[1], dst[0]), interpolation=cv2.INTER_LINEAR)
        got = np.asarray(resize_linear(img, dst))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_resize_multichannel():
    img = RNG.normal(0, 2, size=(64, 80, 2)).astype(np.float32)
    want = cv2.resize(img, (160, 128), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_linear_hwc(img, (128, 160)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_gaussian_blur_matches_cv2():
    img = RNG.normal(128, 50, size=(120, 150)).astype(np.float32)
    for ksize, sigma in [(3, 0.0), (9, 1.5), (19, 3.5), (13, 2.0)]:
        want = cv2.GaussianBlur(img, (ksize, ksize), sigma)
        got = np.asarray(gaussian_blur(img, ksize, sigma))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-3)


def test_box_sum_matches_cv2_blur():
    img = RNG.normal(10, 5, size=(90, 110)).astype(np.float32)
    k = 15
    want = cv2.blur(img, (k, k), borderType=cv2.BORDER_REPLICATE) * (k * k)
    got = np.asarray(box_sum(img, k, axes=(-2, -1)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-2)


def test_box_sum_channelled_axes():
    x = RNG.normal(size=(40, 50, 5)).astype(np.float32)
    got = np.asarray(box_sum(x, 7, axes=(-3, -2)))
    for c in range(5):
        want = cv2.blur(
            np.ascontiguousarray(x[..., c]), (7, 7), borderType=cv2.BORDER_REPLICATE
        ) * 49.0
        np.testing.assert_allclose(got[..., c], want, rtol=1e-4, atol=2e-2)
