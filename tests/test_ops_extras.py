"""Oracle tests vs cv2 for histogram/threshold/morphology/edges/warp ops."""

import cv2
import numpy as np
import pytest

from opticalflowclustering_tpu.ops.edges import (
    bilateral_filter,
    canny,
    laplacian,
    sobel,
)
from opticalflowclustering_tpu.ops.histogram import (
    calc_hist,
    chi2_distance,
    compare_hist,
    normalize_l2,
)
from opticalflowclustering_tpu.ops.morphology import (
    dilate,
    erode,
    morphology_ex,
    structuring_element,
)
from opticalflowclustering_tpu.ops.threshold import (
    adaptive_threshold,
    bitwise_and_mask,
    in_range,
    threshold,
    threshold_otsu,
)
from opticalflowclustering_tpu.ops.warp import (
    four_point_transform,
    get_perspective_transform,
    get_rotation_matrix_2d,
    rotate,
    translate,
    warp_affine,
    warp_perspective,
)

RNG = np.random.default_rng(9)
IMG = RNG.integers(0, 256, size=(72, 96, 3), dtype=np.uint8)
GRAY = cv2.cvtColor(IMG, cv2.COLOR_BGR2GRAY)


class TestHistogram:
    def test_1d_per_channel(self):
        for ch in range(3):
            want = cv2.calcHist([IMG], [ch], None, [256], [0, 256]).ravel()
            got = np.asarray(calc_hist(IMG, [ch], [256], [(0, 256)]))
            np.testing.assert_array_equal(got, want)

    def test_2d_joint(self):
        want = cv2.calcHist([IMG], [1, 0], None, [32, 32], [0, 256, 0, 256])
        got = np.asarray(calc_hist(IMG, [1, 0], [32, 32], [(0, 256), (0, 256)]))
        np.testing.assert_array_equal(got, want)

    def test_3d_masked(self):
        mask = np.zeros(IMG.shape[:2], np.uint8)
        mask[10:50, 20:70] = 255
        want = cv2.calcHist([IMG], [0, 1, 2], mask, [8, 8, 8], [0, 256] * 3)
        got = np.asarray(
            calc_hist(IMG, [0, 1, 2], [8, 8, 8], [(0, 256)] * 3, mask=mask)
        )
        np.testing.assert_array_equal(got, want)

    def test_compare_hist_methods(self):
        h1 = cv2.calcHist([IMG], [0], None, [64], [0, 256])
        h2 = cv2.calcHist([IMG[::-1]], [1], None, [64], [0, 256])
        for name, flag in [
            ("correl", cv2.HISTCMP_CORREL),
            ("chisqr", cv2.HISTCMP_CHISQR),
            ("intersect", cv2.HISTCMP_INTERSECT),
            ("bhattacharyya", cv2.HISTCMP_BHATTACHARYYA),
        ]:
            want = cv2.compareHist(h1, h2, flag)
            got = float(compare_hist(h1, h2, name))
            assert abs(got - want) < 1e-3 * max(1.0, abs(want)), name

    def test_chi2(self):
        a = RNG.random(512).astype(np.float32)
        b = RNG.random(512).astype(np.float32)
        want = 0.5 * np.sum((a - b) ** 2 / (a + b + 1e-10))
        assert abs(float(chi2_distance(a, b)) - want) < 1e-3

    def test_normalize_l2(self):
        h = cv2.calcHist([IMG], [0, 1, 2], None, [8, 8, 8], [0, 256] * 3)
        want = cv2.normalize(h, h).ravel()
        got = np.asarray(normalize_l2(h)).ravel()
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestThreshold:
    @pytest.mark.parametrize(
        "mode,flag",
        [
            ("binary", cv2.THRESH_BINARY),
            ("binary_inv", cv2.THRESH_BINARY_INV),
            ("trunc", cv2.THRESH_TRUNC),
            ("tozero", cv2.THRESH_TOZERO),
            ("tozero_inv", cv2.THRESH_TOZERO_INV),
        ],
    )
    def test_modes(self, mode, flag):
        _, want = cv2.threshold(GRAY, 127, 255, flag)
        got = np.asarray(threshold(GRAY, 127, 255, mode))
        np.testing.assert_array_equal(got, want)

    def test_otsu(self):
        want, _ = cv2.threshold(GRAY, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        got = float(threshold_otsu(GRAY))
        assert abs(got - want) <= 1

    @pytest.mark.parametrize("method,flag", [
        ("mean", cv2.ADAPTIVE_THRESH_MEAN_C),
        ("gaussian", cv2.ADAPTIVE_THRESH_GAUSSIAN_C),
    ])
    def test_adaptive(self, method, flag):
        want = cv2.adaptiveThreshold(
            GRAY, 255, flag, cv2.THRESH_BINARY, 11, 2
        ).astype(np.int32)
        got = np.asarray(
            adaptive_threshold(GRAY, 255, method, "binary", 11, 2)
        ).astype(np.int32)
        # rounding of the local mean can flip pixels sitting exactly on the
        # threshold; require near-total agreement
        assert (got == want).mean() > 0.995

    def test_in_range_and_mask(self):
        lower, upper = (0, 50, 100), (120, 200, 255)
        want = cv2.inRange(IMG, np.array(lower, np.uint8), np.array(upper, np.uint8))
        got = np.asarray(in_range(IMG, lower, upper))
        np.testing.assert_array_equal(got, want)
        want2 = cv2.bitwise_and(IMG, IMG, mask=want)
        got2 = np.asarray(bitwise_and_mask(IMG, got))
        np.testing.assert_array_equal(got2, want2)


class TestMorphology:
    @pytest.mark.parametrize("shape,cvshape", [
        ("rect", cv2.MORPH_RECT),
        ("cross", cv2.MORPH_CROSS),
        ("ellipse", cv2.MORPH_ELLIPSE),
    ])
    def test_structuring_element(self, shape, cvshape):
        for ks in [(3, 3), (9, 3), (21, 7), (11, 11)]:
            want = cv2.getStructuringElement(cvshape, ks)
            got = structuring_element(shape, ks)
            np.testing.assert_array_equal(got, want)

    def test_erode_dilate(self):
        k = structuring_element("ellipse", (9, 11))
        np.testing.assert_array_equal(
            np.asarray(erode(GRAY, k, 2)), cv2.erode(GRAY, k, iterations=2)
        )
        np.testing.assert_array_equal(
            np.asarray(dilate(GRAY, k, 3)), cv2.dilate(GRAY, k, iterations=3)
        )

    @pytest.mark.parametrize("op,flag", [
        ("open", cv2.MORPH_OPEN),
        ("close", cv2.MORPH_CLOSE),
        ("gradient", cv2.MORPH_GRADIENT),
        ("tophat", cv2.MORPH_TOPHAT),
        ("blackhat", cv2.MORPH_BLACKHAT),
    ])
    def test_morphology_ex(self, op, flag):
        k = structuring_element("rect", (21, 7))  # barcode kernel
        want = cv2.morphologyEx(GRAY, flag, k)
        got = np.asarray(morphology_ex(GRAY, op, k))
        np.testing.assert_array_equal(got, want)


class TestEdges:
    def test_sobel(self):
        for dx, dy, ks in [(1, 0, 3), (0, 1, 3), (1, 0, -1), (0, 1, -1), (1, 0, 5)]:
            want = cv2.Sobel(GRAY, cv2.CV_32F, dx, dy, ksize=ks)
            got = np.asarray(sobel(GRAY, dx, dy, ks))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)

    def test_laplacian(self):
        want = cv2.Laplacian(GRAY, cv2.CV_32F)
        got = np.asarray(laplacian(GRAY))
        np.testing.assert_allclose(got, want, atol=1e-2)

    def test_canny_agreement(self):
        img = cv2.GaussianBlur(GRAY, (5, 5), 0)
        want = cv2.Canny(img, 75, 200)
        got = np.asarray(canny(img, 75, 200))
        # hysteresis tie-breaks differ at isolated pixels; near-total match
        agree = (got == want).mean()
        assert agree > 0.98, agree

    def test_bilateral(self):
        want = cv2.bilateralFilter(GRAY, 11, 17, 17).astype(np.int32)
        got = np.asarray(bilateral_filter(GRAY, 11, 17, 17)).astype(np.int32)
        assert np.abs(got - want).max() <= 2
        assert (got == want).mean() > 0.95


class TestWarp:
    def test_rotation_matrix(self):
        want = cv2.getRotationMatrix2D((45.0, 30.0), 33.0, 1.2)
        got = get_rotation_matrix_2d((45.0, 30.0), 33.0, 1.2)
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_perspective_matrix(self):
        src = np.float32([[10, 10], [80, 12], [85, 60], [5, 55]])
        dst = np.float32([[0, 0], [100, 0], [100, 50], [0, 50]])
        want = cv2.getPerspectiveTransform(src, dst)
        got = get_perspective_transform(src, dst)
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_warp_affine(self):
        m = cv2.getRotationMatrix2D((48.0, 36.0), 20.0, 0.9)
        want = cv2.warpAffine(IMG, m, (96, 72)).astype(np.int32)
        got = np.asarray(warp_affine(IMG, m, (96, 72))).astype(np.int32)
        # fixed-point vs float interpolation: allow ±2 with high agreement
        assert np.abs(got - want).max() <= 2
        assert (np.abs(got - want) <= 1).mean() > 0.99

    def test_warp_perspective(self):
        src = np.float32([[10, 10], [80, 12], [85, 60], [5, 55]])
        dst = np.float32([[0, 0], [95, 0], [95, 71], [0, 71]])
        m = cv2.getPerspectiveTransform(src, dst)
        want = cv2.warpPerspective(IMG, m, (96, 72)).astype(np.int32)
        got = np.asarray(warp_perspective(IMG, m, (96, 72))).astype(np.int32)
        assert np.abs(got - want).max() <= 2
        assert (np.abs(got - want) <= 1).mean() > 0.99

    def test_four_point_transform(self):
        pts = np.array([[12, 8], [80, 15], [78, 60], [8, 55]], np.float32)
        got = np.asarray(four_point_transform(IMG, pts))
        # oracle: same steps through cv2
        from opticalflowclustering_tpu.ops.warp import order_points

        rect = order_points(pts)
        tl, tr, br, bl = rect
        mw = max(int(np.hypot(*(br - bl))), int(np.hypot(*(tr - tl))))
        mh = max(int(np.hypot(*(tr - br))), int(np.hypot(*(tl - bl))))
        dstp = np.array(
            [[0, 0], [mw - 1, 0], [mw - 1, mh - 1], [0, mh - 1]], np.float32
        )
        m = cv2.getPerspectiveTransform(rect, dstp)
        want = cv2.warpPerspective(IMG, m, (mw, mh)).astype(np.int32)
        assert got.shape == want.shape
        assert (np.abs(got.astype(np.int32) - want) <= 1).mean() > 0.99

    def test_translate_rotate_shapes(self):
        assert np.asarray(translate(GRAY, 5, -3)).shape == GRAY.shape
        assert np.asarray(rotate(GRAY, 45)).shape == GRAY.shape
