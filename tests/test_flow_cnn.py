"""The working CNN capability (models/flow_cnn.py): committed weights must
classify real fixture crops from both classes correctly and the batched
sliding-window detector must localize bounce-flow structure — the oracle
check VERDICT round-1 item 6 asks for."""

from __future__ import annotations

import os

import numpy as np
import pytest

from opticalflowclustering_tpu.models.flow_cnn import (
    CLASS_NAMES,
    classify_cells,
    detect_windows,
    load_params,
    top_k_labels,
)

REF = "/root/reference/k-means-color-clustering"
POS_DIR = os.path.join(REF, "images", "601_3_50x50")
NEG_DIR = os.path.join(REF, "Non-bounce", "NoBounce_2")

from opticalflowclustering_tpu.models.flow_cnn import _WEIGHTS

pytestmark = pytest.mark.skipif(
    not os.path.isdir(POS_DIR) or not os.path.exists(_WEIGHTS),
    reason="reference footage or committed weights unavailable",
)


def _load_crops(d: str, names: list[str]) -> np.ndarray:
    import cv2

    return np.stack([cv2.imread(os.path.join(d, n)) for n in names])


@pytest.fixture(scope="module")
def params():
    return load_params()


@pytest.fixture(scope="module")
def fixture_crops():
    # held-out tail crops: training caps at the first 4000 per directory
    pos_names = sorted(os.listdir(POS_DIR))[-64:]
    neg_names = sorted(os.listdir(NEG_DIR))[-64:]
    return _load_crops(POS_DIR, pos_names), _load_crops(NEG_DIR, neg_names)


def test_classifies_held_out_crops(params, fixture_crops):
    pos, neg = fixture_crops
    pos_pred = classify_cells(params, pos).argmax(-1)
    neg_pred = classify_cells(params, neg).argmax(-1)
    assert (pos_pred == 1).mean() >= 0.9, (pos_pred == 1).mean()
    assert (neg_pred == 0).mean() >= 0.9, (neg_pred == 0).mean()


def test_top_k_output_format(params, fixture_crops):
    pos, _ = fixture_crops
    probs = classify_cells(params, pos[:1])[0]
    rows = top_k_labels(probs, k=2)
    assert rows[0][1] in CLASS_NAMES
    assert rows[0][2] >= rows[1][2]
    assert abs(sum(r[2] for r in rows) - 1.0) < 1e-5  # softmax over 2


def test_detector_localizes_bounce_flow(params, fixture_crops):
    pos, neg = fixture_crops
    # composite frame: no-bounce texture everywhere, one bounce crop pasted
    frame = np.zeros((150, 200, 3), np.uint8)
    for y in range(0, 150, 50):
        for x in range(0, 200, 50):
            frame[y : y + 50, x : x + 50] = neg[(y + x) % len(neg)]
    frame[50:100, 100:150] = pos[0]
    dets = detect_windows(params, frame, stride=25, confidence=0.8)
    assert dets, "no detection on the pasted bounce crop"
    label, conf, (x1, y1, x2, y2) = dets[0]
    assert label == CLASS_NAMES[1]
    # the top box overlaps the pasted region
    ix = max(0, min(x2, 150) - max(x1, 100))
    iy = max(0, min(y2, 100) - max(y1, 50))
    assert ix * iy > 0, dets


def test_classify_cli_on_fixture(tmp_path, fixture_crops):
    import subprocess
    import sys

    pos, _ = fixture_crops
    import cv2

    p = str(tmp_path / "crop.png")
    cv2.imwrite(p, pos[0])
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    out = subprocess.run(
        [sys.executable, "-m", "opticalflowclustering_tpu.cli.classify",
         "-i", p],
        capture_output=True, text=True, env=env, check=True,
    ).stdout
    assert "classification took" in out
    assert "1. label: bounce-clip flow" in out
