"""SLIC superpixels, overlay path, vector-distance CLI, misc extras."""

import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RNG = np.random.default_rng(33)


class TestSlic:
    def _blocks(self):
        img = np.zeros((60, 90, 3), np.uint8)
        img[:, :30] = (200, 40, 40)
        img[:, 30:60] = (40, 200, 40)
        img[:, 60:] = (40, 40, 200)
        return img

    def test_segments_respect_color_blocks(self):
        from opticalflowclustering_tpu.ops.slic import slic

        img = self._blocks()
        labels = np.asarray(slic(img, n_segments=24, sigma=0.0))
        assert labels.shape == (60, 90)
        # interior pixels of each color block must not share segments
        # across block boundaries
        left = set(np.unique(labels[10:50, 5:25]))
        mid = set(np.unique(labels[10:50, 35:55]))
        right = set(np.unique(labels[10:50, 65:85]))
        assert not (left & mid) and not (mid & right) and not (left & right)

    def test_segment_count_scales(self):
        from opticalflowclustering_tpu.ops.slic import slic

        img = RNG.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        l1 = np.asarray(slic(img, n_segments=16, sigma=1.0))
        l2 = np.asarray(slic(img, n_segments=64, sigma=1.0))
        assert len(np.unique(l2)) > len(np.unique(l1))

    def test_mark_boundaries(self):
        from opticalflowclustering_tpu.ops.slic import mark_boundaries, slic

        img = self._blocks()
        labels = slic(img, n_segments=12, sigma=0.0)
        out = np.asarray(mark_boundaries(img, labels))
        assert out.shape == img.shape and out.dtype == np.float32
        assert out.max() <= 1.0


class TestOverlays:
    def test_yolo_parse_and_draw(self, tmp_path):
        from opticalflowclustering_tpu.io.overlays import (
            draw_rect_outline,
            load_yolo_boxes,
            yolo_rects_for_frame,
        )

        rows = np.zeros((3, 11))
        rows[0, 0], rows[0, 3:7] = 2, (10, 12, 20, 15)
        rows[1, 0], rows[1, 3:7] = 3, (5, 5, 8, 8)
        rows[2, 0], rows[2, 3:7] = 2, (40, 30, 10, 10)
        p = tmp_path / "yolo_labels.txt"
        np.savetxt(p, rows)
        data = load_yolo_boxes(str(p))
        assert data.shape == (3, 11)
        rects = yolo_rects_for_frame(data, 2)
        assert len(rects) == 2

        frame = np.zeros((60, 80, 3), np.uint8)
        want = frame.copy()
        draw_rect_outline(frame, 10, 12, 20, 15)
        cv2.rectangle(want, (10, 12), (30, 27), (255, 255, 255), thickness=2)
        # cv2's thick-line corner joins differ by a few pixels
        agree = (frame == want).mean()
        assert agree > 0.97, agree

    def test_contour_mask(self, tmp_path):
        from opticalflowclustering_tpu.io.overlays import (
            apply_contour_mask,
            load_contour_polys,
        )

        d = tmp_path / "Contours" / "vid.mp4"
        d.mkdir(parents=True)
        poly = [0, 10, 10, 40, 10, 40, 35, 10, 35]  # id + 4 points
        (d / "vid.mp4_2.txt").write_text(" ".join(map(str, poly)) + "\n")
        polys = load_contour_polys(str(tmp_path / "Contours"), "vid.mp4", 2)
        assert len(polys) == 1 and polys[0].shape == (4, 2)
        frame = np.full((60, 60, 3), 128, np.uint8)
        apply_contour_mask(frame, polys)
        assert (frame[20, 20] == 0).all()  # interior black
        assert (frame[50, 50] == 128).all()  # untouched outside

    def test_pipeline_with_overlays(self, tmp_path):
        from opticalflowclustering_tpu.features.grid import GridParams
        from opticalflowclustering_tpu.pipeline.bounce import (
            OverlaySpec,
            PipelineConfig,
            process_frames,
        )

        rows = np.zeros((1, 11))
        rows[0, 0], rows[0, 3:7] = 2, (5, 5, 30, 20)
        yolo = tmp_path / "yolo_labels.txt"
        np.savetxt(yolo, rows)
        frames = RNG.integers(0, 256, size=(4, 40, 64, 3), dtype=np.uint8)
        cfg = PipelineConfig(grid=GridParams(4, 6), chunk=4)
        plain = process_frames(frames, cfg)
        overlaid = process_frames(
            frames, cfg, overlays=OverlaySpec(yolo_file=str(yolo))
        )
        assert not np.array_equal(plain["flow_bgr"][0], overlaid["flow_bgr"][0])
        # frame 3 (pair index 1) has no boxes → untouched
        np.testing.assert_array_equal(
            plain["flow_bgr"][1], overlaid["flow_bgr"][1]
        )
        assert overlaid["hue_table"].shape == plain["hue_table"].shape


def test_vectordistance_cli(tmp_path):
    f1 = tmp_path / "file1.csv"
    f2 = tmp_path / "file2.csv"
    f1.write_text("a.png,10\nb.png,20\nc.png,30\n")
    f2.write_text("a.png,10\nb.png,25\nc.png,28\nd.png,4\n")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "opticalflowclustering_tpu.cli.vectordistance",
         str(f1), str(f2)],
        check=True, capture_output=True, text=True, env=env,
    )
    assert "different lengths" in r.stdout
    # oracle: per-row Euclidean over the common prefix (rows are scalars
    # here, so each row distance is |a_i - b_i|)
    a = np.array([10.0, 20, 30])
    b = np.array([10.0, 25, 28, 4])
    want_eu = sum(abs(x - y) for x, y in zip(a, b[:3]))
    got_eu = float(r.stdout.split("Euclidean distance:")[1].strip())
    assert abs(got_eu - want_eu) < 1e-6


def test_compare_images_and_cluster_viz():
    from opticalflowclustering_tpu.extras.cluster_viz import (
        centroid_histogram,
        plot_colors,
    )
    from opticalflowclustering_tpu.extras.compare_images import compare_images

    g = RNG.integers(0, 256, size=(48, 48), dtype=np.uint8)
    m, s = compare_images(g, g)
    assert m == 0 and s == pytest.approx(1.0, abs=1e-5)

    labels = np.array([0, 0, 1, 2, 2, 2])
    hist = centroid_histogram(labels)
    np.testing.assert_allclose(hist, [2 / 6, 1 / 6, 3 / 6])
    bar = plot_colors(hist, np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]]))
    assert bar.shape == (50, 300, 3)
    assert (bar[0, 10] == [255, 0, 0]).all()
    assert (bar[0, 290] == [0, 0, 255]).all()
