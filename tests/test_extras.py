"""Tests for lab/ssim/moments/nms/hough ops and extras workloads."""

import cv2
import numpy as np
import pytest

from opticalflowclustering_tpu.extras.contours import (
    approx_poly_dp,
    arc_length,
    bounding_rect,
    box_points,
    contour_area,
    fill_poly_mask,
    find_external_contours,
    min_area_rect,
)
from opticalflowclustering_tpu.extras.nms import (
    non_max_suppression,
    non_max_suppression_device,
)
from opticalflowclustering_tpu.ops.lab import bgr2lab, lab2bgr
from opticalflowclustering_tpu.ops.moments import hu_moments, moments, zernike_moments
from opticalflowclustering_tpu.ops.ssim import mse, ssim

RNG = np.random.default_rng(11)
IMG = RNG.integers(0, 256, size=(64, 80, 3), dtype=np.uint8)
GRAY = cv2.cvtColor(IMG, cv2.COLOR_BGR2GRAY)


class TestLab:
    def test_bgr2lab_close_to_cv2(self):
        want = cv2.cvtColor(IMG, cv2.COLOR_BGR2LAB).astype(np.int32)
        got = np.asarray(bgr2lab(IMG)).astype(np.int32)
        assert np.abs(got - want).max() <= 2
        assert (np.abs(got - want) <= 1).mean() > 0.99

    def test_lab_roundtrip(self):
        rt = np.asarray(lab2bgr(bgr2lab(IMG))).astype(np.int32)
        # both directions quantize; the roundtrip should stay close
        assert np.abs(rt - IMG.astype(np.int32)).mean() < 3.0


class TestSsim:
    def test_mse(self):
        a = GRAY
        b = np.clip(GRAY.astype(np.int32) + 5, 0, 255).astype(np.uint8)
        want = np.mean((a.astype(float) - b.astype(float)) ** 2)
        assert abs(float(mse(a, b)) - want) < 1e-3

    def test_ssim_identity(self):
        assert float(ssim(GRAY, GRAY)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_vs_numpy_oracle(self):
        """skimage structural_similarity semantics, replicated in numpy."""
        from scipy.ndimage import uniform_filter

        a = GRAY.astype(np.float64)
        b = cv2.GaussianBlur(GRAY, (5, 5), 1.2).astype(np.float64)
        win, dr = 7, 255.0
        npx = win * win
        cov_norm = npx / (npx - 1)
        ux, uy = uniform_filter(a, win), uniform_filter(b, win)
        uxx, uyy = uniform_filter(a * a, win), uniform_filter(b * b, win)
        uxy = uniform_filter(a * b, win)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        c1, c2 = (0.01 * dr) ** 2, (0.03 * dr) ** 2
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux**2 + uy**2 + c1) * (vx + vy + c2)
        )
        pad = (win - 1) // 2
        want = s[pad:-pad, pad:-pad].mean()
        got = float(ssim(GRAY, cv2.GaussianBlur(GRAY, (5, 5), 1.2)))
        assert abs(got - want) < 1e-4


class TestMoments:
    def test_moments_vs_cv2(self):
        want = cv2.moments(GRAY)
        got = {k: float(v) for k, v in moments(GRAY).items()}
        for k, v in want.items():
            denom = max(abs(v), 1e-6)
            assert abs(got[k] - v) / denom < 1e-4, k

    def test_hu_vs_cv2(self):
        want = cv2.HuMoments(cv2.moments(GRAY)).ravel()
        got = np.asarray(hu_moments(GRAY))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-12)

    def test_zernike_rotation_invariance(self):
        img = np.zeros((64, 64), np.uint8)
        cv2.rectangle(img, (20, 26), (44, 38), 255, -1)
        rot = cv2.warpAffine(
            img, cv2.getRotationMatrix2D((32, 32), 40, 1.0), (64, 64)
        )
        z1 = np.asarray(zernike_moments(img, 21))
        z2 = np.asarray(zernike_moments(rot, 21))
        assert z1.shape == (25,)  # degree 8 → 25 moments
        np.testing.assert_allclose(z1, z2, atol=0.03)

    def test_zernike_translation_invariance(self):
        img = np.zeros((64, 64), np.uint8)
        cv2.circle(img, (30, 30), 10, 255, -1)
        img2 = np.zeros((64, 64), np.uint8)
        cv2.circle(img2, (36, 28), 10, 255, -1)
        z1 = np.asarray(zernike_moments(img, 21))
        z2 = np.asarray(zernike_moments(img2, 21))
        np.testing.assert_allclose(z1, z2, atol=0.02)


class TestNms:
    BOXES = np.array(
        [
            [12, 84, 140, 212],
            [24, 84, 152, 212],
            [36, 84, 164, 212],
            [12, 96, 140, 224],
            [24, 96, 152, 224],
            [24, 108, 152, 236],
        ]
    )

    def _oracle(self, boxes, thresh):
        # literal reference algorithm (nms.py:3-33)
        if len(boxes) == 0:
            return []
        pick = []
        x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
        area = (x2 - x1 + 1) * (y2 - y1 + 1)
        idxs = np.argsort(y2)
        while len(idxs) > 0:
            last = len(idxs) - 1
            i = idxs[last]
            pick.append(i)
            suppress = [last]
            for pos in range(0, last):
                j = idxs[pos]
                xx1, yy1 = max(x1[i], x1[j]), max(y1[i], y1[j])
                xx2, yy2 = min(x2[i], x2[j]), min(y2[i], y2[j])
                w = max(0, xx2 - xx1 + 1)
                h = max(0, yy2 - yy1 + 1)
                if float(w * h) / area[j] > thresh:
                    suppress.append(pos)
            idxs = np.delete(idxs, suppress)
        return boxes[pick]

    # the other two demo box sets shipped by the reference driver
    # (non-max-suppression-slow/nms_slow.py:14-22); audrey's is BOXES above
    BKSOMELS = np.array(
        [[114, 60, 178, 124], [120, 60, 184, 124], [114, 66, 178, 130]]
    )
    GPRIPE = np.array(
        [
            [12, 30, 76, 94],
            [12, 36, 76, 100],
            [72, 36, 200, 164],
            [84, 48, 212, 176],
        ]
    )

    def test_host_matches_reference(self):
        for t in (0.3, 0.5):
            want = np.asarray(self._oracle(self.BOXES, t))
            got = np.asarray(non_max_suppression(self.BOXES, t))
            np.testing.assert_array_equal(np.sort(got, 0), np.sort(want, 0))

    def test_demo_box_sets_at_demo_threshold(self):
        """All three nms_slow.py demo inputs at its threshold 0.3
        (nms_slow.py:5-22,32): each collapses to exactly one box — the
        demo's printed 'after applying non-max, 1 bounding boxes'."""
        for boxes in (self.BOXES, self.BKSOMELS, self.GPRIPE[:2]):
            got = np.asarray(non_max_suppression(boxes, 0.3))
            want = np.asarray(self._oracle(boxes, 0.3))
            np.testing.assert_array_equal(got, want)
            assert len(got) == 1
        # gpripe's full set keeps one box per object cluster
        got = np.asarray(non_max_suppression(self.GPRIPE, 0.3))
        want = np.asarray(self._oracle(self.GPRIPE, 0.3))
        np.testing.assert_array_equal(np.sort(got, 0), np.sort(want, 0))
        assert len(got) == 2

    def test_device_matches_host(self):
        for t in (0.3, 0.5):
            keep = np.asarray(non_max_suppression_device(self.BOXES, t))
            got = self.BOXES[keep]
            want = np.asarray(non_max_suppression(self.BOXES, t))
            np.testing.assert_array_equal(np.sort(got, 0), np.sort(want, 0))

    def test_random_boxes(self):
        pts = RNG.integers(0, 200, size=(30, 2))
        wh = RNG.integers(20, 80, size=(30, 2))
        boxes = np.concatenate([pts, pts + wh], axis=1)
        want = np.asarray(self._oracle(boxes, 0.4))
        got = np.asarray(non_max_suppression(boxes, 0.4))
        np.testing.assert_array_equal(np.sort(got, 0), np.sort(want, 0))


class TestContours:
    def test_rect_contour_and_metrics(self):
        mask = np.zeros((60, 80), np.uint8)
        cv2.rectangle(mask, (10, 15), (49, 44), 255, -1)
        ours = find_external_contours(mask)
        assert len(ours) == 1
        c = ours[0]
        assert bounding_rect(c) == (10, 15, 40, 30)
        want_area = cv2.contourArea(
            max(cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)[0],
                key=cv2.contourArea)
        )
        assert abs(contour_area(c) - want_area) / want_area < 0.02
        want_len = 2 * (39 + 29)
        assert abs(arc_length(c) - want_len) / want_len < 0.1

    def test_approx_poly_rectangle(self):
        mask = np.zeros((60, 80), np.uint8)
        cv2.rectangle(mask, (10, 15), (60, 50), 255, -1)
        c = find_external_contours(mask)[0]
        approx = approx_poly_dp(c, 0.02 * arc_length(c))
        assert len(approx) == 4

    def test_min_area_rect(self):
        mask = np.zeros((80, 80), np.uint8)
        pts0 = cv2.boxPoints(((40, 40), (30, 16), 25.0)).astype(np.int32)
        cv2.fillPoly(mask, [pts0], 255)
        c = find_external_contours(mask)[0]
        (cx, cy), (w, h), ang = min_area_rect(c)
        assert abs(cx - 40) < 2 and abs(cy - 40) < 2
        assert abs(max(w, h) - 30) < 3 and abs(min(w, h) - 16) < 3
        bp = box_points(((cx, cy), (w, h), ang))
        assert bp.shape == (4, 2)

    def test_fill_poly_matches_cv2(self):
        poly = np.array([[10, 10], [60, 15], [55, 45], [12, 40]])
        want = np.zeros((60, 80), np.uint8)
        cv2.fillPoly(want, [poly], 255)
        got = np.asarray(fill_poly_mask((60, 80), [poly]))
        # boundary rasterization rules differ by <= 1px along edges
        agree = (got == want).mean()
        assert agree > 0.97, agree


class TestWorkloads:
    def test_color_transfer_runs(self):
        from opticalflowclustering_tpu.extras.color_transfer import color_transfer

        src = RNG.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        tar = RNG.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
        out = np.asarray(color_transfer(src, tar))
        assert out.shape == tar.shape and out.dtype == np.uint8

    def test_quantize_reduces_palette(self):
        from opticalflowclustering_tpu.extras.quantize import quantize_colors

        out = np.asarray(quantize_colors(IMG, 4))
        assert out.shape == IMG.shape
        n_colors = len(np.unique(out.reshape(-1, 3), axis=0))
        assert n_colors <= 12  # 4 LAB colors → ≤ that many BGR after roundtrip

    def test_search_engine_self_retrieval(self):
        from opticalflowclustering_tpu.extras.search_engine import (
            RGBHistogram,
            Searcher,
            index_images,
        )

        imgs = RNG.integers(0, 256, size=(6, 32, 32, 3), dtype=np.uint8)
        feats = index_images(imgs)
        index = {f"img{i}": feats[i] for i in range(6)}
        s = Searcher(index)
        results = s.search(RGBHistogram().describe(imgs[3]))
        assert results[0][1] == "img3"
        assert results[0][0] < 1e-6

    def test_pokedex_self_retrieval(self):
        from opticalflowclustering_tpu.extras.pokedex import (
            Searcher,
            ZernikeMoments,
            sprite_outline,
        )

        shapes = []
        for i in range(4):
            img = np.full((64, 64, 3), 255, np.uint8)
            if i % 2 == 0:
                cv2.circle(img, (32, 32), 8 + 4 * i, (0, 0, 0), -1)
            else:
                cv2.rectangle(img, (20, 20), (44 + i, 40), (0, 0, 0), -1)
            shapes.append(img)
        desc = ZernikeMoments(radius=21)
        index = {
            f"s{i}": desc.describe(255 - sprite_outline(255 - s))
            for i, s in enumerate(shapes)
        }
        q = desc.describe(255 - sprite_outline(255 - shapes[2]))
        results = Searcher(index).search(q)
        assert results[0][1] == "s2"

    def test_detect_colors_and_skin(self):
        from opticalflowclustering_tpu.extras.detectors import (
            detect_colors,
            skin_mask,
        )

        outs = detect_colors(IMG)
        assert len(outs) == 4
        sm = np.asarray(skin_mask(IMG))
        assert sm.shape == IMG.shape

    def test_brightest_spot(self):
        from opticalflowclustering_tpu.extras.detectors import brightest_spot

        img = np.zeros((50, 70, 3), np.uint8)
        img[30, 55] = 255
        (x, y), _ = brightest_spot(img)
        assert (x, y) == (55, 30)

    def test_barcode_box(self):
        from opticalflowclustering_tpu.extras.detectors import locate_barcode

        img = np.full((120, 200, 3), 255, np.uint8)
        for i in range(40, 160, 4):  # dense vertical bars
            cv2.rectangle(img, (i, 40), (i + 1, 90), (0, 0, 0), -1)
        img = cv2.GaussianBlur(img, (3, 3), 0)  # camera-like softening
        box = locate_barcode(img)
        assert box.shape == (4, 2)
        cx, cy = box.mean(0)
        assert 60 < cx < 140 and 40 < cy < 100

    def test_hough_circles(self):
        from opticalflowclustering_tpu.ops.hough import hough_circles

        img = np.full((160, 200), 40, np.uint8)
        cv2.circle(img, (60, 70), 25, 220, -1)
        cv2.circle(img, (150, 90), 32, 200, -1)
        # Small rings spread votes over ~6 accumulator cells (peak ≈ 30);
        # threshold sized to the scene (the reference-demo-image oracle in
        # test_library_oracles.py checks cv2's own default threshold).
        circles = hough_circles(
            img, min_dist=50, acc_threshold=18.0, min_radius=15, max_radius=45
        )
        assert len(circles) >= 2
        found = {tuple(np.round(c[:2] / 10).astype(int)) for c in circles[:2]}
        assert (6, 7) in found and (15, 9) in found

    def test_compare_histograms_table(self):
        from opticalflowclustering_tpu.extras.compare_histograms import (
            compare_all,
            describe,
        )

        h1 = describe(IMG)
        h2 = describe(IMG[::-1])
        table = compare_all(h1, {"a": h1, "b": h2})
        assert table["a"]["correl"] == pytest.approx(1.0, abs=1e-5)
        assert table["a"]["euclidean"] == pytest.approx(0.0, abs=1e-6)
        assert set(table["b"]) == {
            "correl", "chisqr", "intersect", "bhattacharyya",
            "euclidean", "cityblock", "chebyshev", "chi2_custom",
        }

    def test_cnn_slot(self):
        from opticalflowclustering_tpu.models.cnn import (
            ClassifierNet,
            blob_from_image,
            filter_detections,
            top_k,
        )

        blob = blob_from_image(IMG, 1.0, (224, 224), (104, 117, 123))
        assert blob.shape == (1, 3, 224, 224)
        net = ClassifierNet(num_classes=10)
        net.set_input(blob)
        preds = net.forward()
        top = top_k(preds, 3)
        assert len(top) == 3
        dets = np.zeros((1, 1, 2, 7), np.float32)
        dets[0, 0, 0] = [0, 7, 0.9, 0.1, 0.2, 0.5, 0.6]
        dets[0, 0, 1] = [0, 3, 0.1, 0, 0, 1, 1]
        out = filter_detections(dets, (100, 200), confidence=0.2)
        assert out == [(7, pytest.approx(0.9), (20, 20, 100, 60))]

    def test_scan_document(self):
        from opticalflowclustering_tpu.extras.document_scanner import scan_document

        img = np.full((240, 200, 3), 30, np.uint8)
        quad = np.array([[40, 30], [160, 40], [150, 200], [30, 190]])
        cv2.fillPoly(img, [quad], (250, 250, 250))
        cv2.putText(img, "Doc", (70, 120), cv2.FONT_HERSHEY_SIMPLEX, 1,
                    (0, 0, 0), 2)
        warped, binarized = scan_document(img, height=240)
        assert warped is not None
        assert warped.shape[0] > 100 and warped.shape[1] > 80
        assert set(np.unique(binarized)) <= {0, 255}
