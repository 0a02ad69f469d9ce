"""dp-mesh fan-out of the multi-video queue (pipeline/queue.py,
process_video_queue_dp): batched mesh execution must produce the same
per-video feature artifacts as the sequential queue, with resume and
decode-failure isolation intact."""

from __future__ import annotations

import os

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from opticalflowclustering_tpu.features.grid import GridParams
from opticalflowclustering_tpu.flow.farneback import FarnebackParams
from opticalflowclustering_tpu.io.video import write_video_mjpg
from opticalflowclustering_tpu.pipeline.bounce import PipelineConfig
from opticalflowclustering_tpu.pipeline.queue import (
    load_features,
    process_video_queue,
    process_video_queue_dp,
)

CFG = PipelineConfig(
    grid=GridParams(rows=4, cols=4),
    flow=FarnebackParams(levels=1),
    chunk=4,
)


@pytest.fixture()
def clips(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):  # 2 batch into dp=2; 1 leftover falls back
        frames = rng.integers(0, 256, size=(6, 64, 64, 3), dtype=np.uint8)
        p = str(tmp_path / f"clip{i}.avi")
        write_video_mjpg(p, frames, 30.0)
        paths.append(p)
    return paths


def _mesh():
    return Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "sp"))


def test_dp_queue_matches_sequential(clips, tmp_path):
    seq_dir = str(tmp_path / "seq")
    dp_dir = str(tmp_path / "dp")
    seq = process_video_queue(clips, seq_dir, CFG)
    dp = process_video_queue_dp(clips, dp_dir, _mesh(), CFG)
    assert all(r.ok for r in seq) and all(r.ok for r in dp)
    assert len(dp) == len(clips)
    for p in clips:
        stem = os.path.splitext(os.path.basename(p))[0]
        a = load_features(os.path.join(seq_dir, f"{stem}.features.npz"))
        b = load_features(os.path.join(dp_dir, f"{stem}.features.npz"))
        assert np.array_equal(a["hue_table"], b["hue_table"])
        assert np.array_equal(a["rgb_hue_table"], b["rgb_hue_table"])
        np.testing.assert_allclose(
            a["mean_magnitude"], b["mean_magnitude"], rtol=1e-6
        )


def test_dp_queue_survives_bad_video_and_resumes(clips, tmp_path):
    bad = str(tmp_path / "bad.avi")
    with open(bad, "wb") as f:
        f.write(b"not a video")
    out_dir = str(tmp_path / "out")
    res = process_video_queue_dp(clips + [bad], out_dir, _mesh(), CFG)
    by_path = {r.video: r for r in res}
    assert not by_path[bad].ok
    assert all(by_path[p].ok for p in clips)
    # resume: artifacts exist -> all good videos skipped
    res2 = process_video_queue_dp(clips, out_dir, _mesh(), CFG)
    assert all(r.attempts == 0 for r in res2)
