"""Work queue (retry/resume) and bounce-classifier training tests."""

import os

import cv2
import numpy as np
import pytest

REF = "/root/reference/k-means-color-clustering"


def _write_clip(path, n=6, h=64, w=96):
    rng = np.random.default_rng(1)
    out = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (w, h)
    )
    base = cv2.GaussianBlur(
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8), (0, 0), 3
    )
    for i in range(n):
        f = base.copy()
        cv2.circle(f, (20 + 8 * i, 30), 9, (0, 220, 230), -1)
        out.write(f)
    out.release()


def test_queue_retry_resume(tmp_path):
    from opticalflowclustering_tpu.pipeline.bounce import PipelineConfig
    from opticalflowclustering_tpu.pipeline.queue import (
        load_features,
        process_video_queue,
    )

    good = tmp_path / "good.mp4"
    _write_clip(good)
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"not a video")

    cfg = PipelineConfig(chunk=4, grid=__import__(
        "opticalflowclustering_tpu.features", fromlist=["GridParams"]
    ).GridParams(4, 6))
    out_dir = tmp_path / "artifacts"
    results = process_video_queue(
        [str(good), str(bad)], str(out_dir), cfg, max_retries=1
    )
    assert results[0].ok and results[0].attempts == 1
    assert not results[1].ok and results[1].attempts == 2
    feats = load_features(results[0].path)
    assert feats["hue_table"].shape == (5, 24)

    # resume: completed video skipped (attempts == 0)
    results2 = process_video_queue(
        [str(good)], str(out_dir), cfg, max_retries=1
    )
    assert results2[0].ok and results2[0].attempts == 0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data unavailable")
def test_train_bounce_classifier_on_reference_data(tmp_path):
    from opticalflowclustering_tpu.cli.trainbounce import build_dataset
    from opticalflowclustering_tpu.models.bounce_classifier import (
        BounceClassifier,
        train_on_hue_windows,
    )
    import jax.numpy as jnp

    x, y = build_dataset(
        [f"{REF}/bounce.csv"],
        [f"{REF}/nobounce.csv"],
        window=9,
    )
    assert y.sum() > 0 and (1 - y).sum() > 0
    params, loss = train_on_hue_windows(x, y, steps=150, lr=3e-3)
    model = BounceClassifier()
    logits = np.asarray(model.apply(params, jnp.asarray(x)))
    acc = ((logits > 0) == (y > 0.5)).mean()
    assert acc > 0.85, acc


def test_trainbounce_cli(tmp_path):
    import subprocess
    import sys

    if not os.path.isdir(REF):
        pytest.skip("reference data unavailable")
    env = dict(
        os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(__file__))
    )
    out = tmp_path / "params.npz"
    r = subprocess.run(
        [
            sys.executable, "-m", "opticalflowclustering_tpu.cli.trainbounce",
            "--bounce", f"{REF}/bounce.csv",
            "--nobounce", f"{REF}/nobounce.csv",
            "--steps", "25", "--out", str(out),  # smoke: learning quality
            # is pinned by test_train_on_hue_windows (150 steps, acc>.85)
        ],
        # env MUST be passed: the ambient PYTHONPATH carries the host's
        # TPU-tunnel sitecustomize hook, whose boot-time registration
        # blocks for minutes when the tunnel is down (even under
        # JAX_PLATFORMS=cpu) — this exact omission made the test take
        # 751 s in one suite run and hang outright during an outage.
        env=env, check=True, capture_output=True, text=True,
    )
    assert "train accuracy" in r.stdout
    assert out.exists()
