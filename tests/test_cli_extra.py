"""Coverage for the remaining CLI paths: colorkmeans (single image, k=1 and
k>1, directory mode), searchengine, scan, superpixels."""

import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/k-means-color-clustering"
RNG = np.random.default_rng(41)


def _run(mod, *args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", f"opticalflowclustering_tpu.cli.{mod}", *args],
        cwd=cwd, env=env, check=True, capture_output=True, text=True,
    )


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data unavailable")
def test_colorkmeans_single_image_matches_reference_semantics(tmp_path):
    """k=1 on a real reference crop: the appended CSV row carries the exact
    hue the reference's color_kmeans.py run would produce."""
    img_path = f"{REF}/OutImgs/601_bad_bounce_3/2/176.png"
    r = _run("colorkmeans", "-i", img_path, "-c", "1", "-f", "out.csv",
             cwd=tmp_path)
    # oracle: the verified disk-roundtrip path
    img = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
    img[img < 30] = 0
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    _, alpha = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY)
    flat = np.dstack([img, alpha]).reshape(-1, 4).astype(np.float64)
    cen = np.rint(flat.mean(0))
    px = np.array([[[cen[0], cen[1], cen[2]]]], np.uint8)
    want_hue = int(cv2.cvtColor(px, cv2.COLOR_BGR2HSV)[0, 0, 0])
    row = (tmp_path / "out.csv").read_text().strip().splitlines()[-1]
    assert row.split(",")[0] == "176.png"
    assert int(row.split(",")[-1]) == want_hue


def test_colorkmeans_directory_and_k2(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        img = np.zeros((24, 24, 3), np.uint8)
        img[:, : 12] = (250, 60, 40)
        img[:, 12:] = (40, 200, 240)
        cv2.imwrite(str(d / f"crop_{i}.png"), img)
    r = _run("colorkmeans", "-d", str(d), "-c", "2", "-f", "k2.csv",
             cwd=tmp_path)
    lines = (tmp_path / "k2.csv").read_text().strip().splitlines()
    # header on a fresh target (`color_kmeansChange.py:108-110`), then
    # one row per image naming the full traversed path (`:135`)
    assert lines[0] == "File name,Cluster 1,HSV Cluster 1,Hue 0"
    assert len(lines) == 4
    assert lines[1].split(",")[0] == str(d / "crop_0.png")


def test_superpixels_cli(tmp_path):
    img = np.hstack([np.full((60, 30, 3), c, np.uint8)
                     for c in ((200, 40, 40), (40, 200, 40), (40, 40, 200))])
    cv2.imwrite(str(tmp_path / "in.png"), img)
    r = _run("superpixels", "-i", "in.png", "--segments", "12", cwd=tmp_path)
    assert "segments" in r.stdout
    assert (tmp_path / "superpixels_12.png").exists()


def test_scan_cli(tmp_path):
    img = np.full((240, 200, 3), 30, np.uint8)
    quad = np.array([[40, 30], [160, 40], [150, 200], [30, 190]])
    cv2.fillPoly(img, [quad], (250, 250, 250))
    cv2.imwrite(str(tmp_path / "doc.png"), img)
    r = _run("scan", "-i", "doc.png", cwd=tmp_path)
    assert "wrote" in r.stdout
    assert (tmp_path / "scanned_warped.png").exists()


def test_searchengine_cli(tmp_path):
    d = tmp_path / "photos"
    d.mkdir()
    for i in range(4):
        cv2.imwrite(str(d / f"p{i}.png"),
                    RNG.integers(0, 256, (40, 60, 3), dtype=np.uint8))
    _run("searchengine", "index", "-d", "photos", "-i", "idx.npz",
         cwd=tmp_path)
    r = _run("searchengine", "search", "-i", "idx.npz", "-q", "photos/p1.png",
             "-k", "2", cwd=tmp_path)
    top = r.stdout.strip().splitlines()[0]
    assert "p1.png" in top


CIRCLES_DIR = "/root/reference/detect-circles/images"


@pytest.mark.skipif(
    not os.path.isdir(CIRCLES_DIR), reason="reference data unavailable"
)
def test_detectcircles_cli_both_modes(tmp_path):
    """cli/detectcircles.py mirrors the reference demo
    (`detect-circles/detect_circles.py`): detects on the committed demo
    image, prints the circles, and writes the [input | annotated] hstack
    the reference imshows. cv2-raw mode reports cv2's exact circle count
    on soda.png (4); coherent mode reports 0 there (artifact rejection)
    and cv2's exact 7 on 8circles.png."""
    out = str(tmp_path / "anno.png")
    r = _run("detectcircles", "-i", f"{CIRCLES_DIR}/8circles.png",
             "-o", out, cwd=tmp_path)
    assert "7 circle(s)" in r.stdout, r.stdout
    img = cv2.imread(out)
    src = cv2.imread(f"{CIRCLES_DIR}/8circles.png")
    assert img.shape == (src.shape[0], src.shape[1] * 2, 3)
    # left half is the untouched input; right half is annotated
    assert np.array_equal(img[:, : src.shape[1]], src)
    assert not np.array_equal(img[:, src.shape[1] :], src)

    r = _run("detectcircles", "-i", f"{CIRCLES_DIR}/soda.png",
             "--mode", "cv2-raw", "-o", str(tmp_path / "s.png"),
             cwd=tmp_path)
    assert "4 circle(s) [cv2-raw]" in r.stdout, r.stdout
    r = _run("detectcircles", "-i", f"{CIRCLES_DIR}/soda.png",
             "-o", str(tmp_path / "s2.png"), cwd=tmp_path)
    assert "0 circle(s) [coherent]" in r.stdout, r.stdout
