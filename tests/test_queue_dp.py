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
        assert np.array_equal(a["centroids"], b["centroids"])
        np.testing.assert_allclose(
            a["mean_magnitude"], b["mean_magnitude"], rtol=1e-6
        )


def test_dp_artifact_addnew_rows_byte_equal_single_video(clips, tmp_path):
    """The addnew/centroid contract (`KmeanGrids.py:320-339`) through the
    DP queue: rows written from a DP-queue artifact are BYTE-identical to
    rows written from the single-video pipeline (the kmeangrids CLI path)."""
    from opticalflowclustering_tpu.compat.writers import (
        append_cluster_centers_rows,
    )
    from opticalflowclustering_tpu.io.video import read_video_bgr
    from opticalflowclustering_tpu.pipeline.bounce import process_frames

    dp_dir = str(tmp_path / "dp")
    res = process_video_queue_dp(clips[:2], dp_dir, _mesh(), CFG)
    assert all(r.ok for r in res)

    def rows_csv(tables, path):
        hue = np.asarray(tables["hue_table"])
        names = [
            f"{f}/{c + 1}.png"
            for f in range(2, 2 + hue.shape[0])
            for c in range(hue.shape[1])
        ]
        append_cluster_centers_rows(
            path,
            names=names,
            centroids=np.asarray(tables["centroids"]).reshape(-1, 4),
            hues=hue.reshape(-1),
        )
        with open(path, "rb") as fh:
            return fh.read()

    for p in clips[:2]:
        stem = os.path.splitext(os.path.basename(p))[0]
        art = load_features(os.path.join(dp_dir, f"{stem}.features.npz"))
        single = process_frames(read_video_bgr(p), CFG)
        a = rows_csv(art, str(tmp_path / f"{stem}_dp.csv"))
        b = rows_csv(single, str(tmp_path / f"{stem}_single.csv"))
        assert a == b and len(a) > 0


def test_dp_queue_streams_with_bounded_memory(tmp_path):
    """VERDICT r3 #2: the DP queue must actually stream. 2×dp same-shape
    videos: (a) bucketed host memory never exceeds dp videos, and (b) the
    first dp-batch's artifacts land while the decoder is still working —
    the final video's decode WAITS to observe an artifact, which only a
    dispatch-as-the-bucket-fills consumer can produce (store-and-forward
    would drain the whole decode stream first and this wait would time
    out)."""
    import time

    from opticalflowclustering_tpu.io import video as iovideo
    from opticalflowclustering_tpu.pipeline import queue as q

    rng = np.random.default_rng(3)
    paths = []
    for i in range(4):  # 2 batches at dp=2
        frames = rng.integers(0, 256, size=(6, 64, 64, 3), dtype=np.uint8)
        p = str(tmp_path / f"s{i}.avi")
        write_video_mjpg(p, frames, 30.0)
        paths.append(p)
    out_dir = str(tmp_path / "out")

    real_read = iovideo.read_video_bgr
    overlap_seen = {"artifact_before_last_decode": False}

    def spying_read(path, max_frames=None):
        if path == paths[-1]:
            deadline = time.monotonic() + 90
            while time.monotonic() < deadline:
                if os.path.isdir(out_dir) and any(
                    f.endswith(".npz") for f in os.listdir(out_dir)
                ):
                    overlap_seen["artifact_before_last_decode"] = True
                    break
                time.sleep(0.05)
        return real_read(path, max_frames)

    iovideo.read_video_bgr = spying_read
    try:
        res = process_video_queue_dp(paths, out_dir, _mesh(), CFG)
    finally:
        iovideo.read_video_bgr = real_read
    assert all(r.ok for r in res) and len(res) == 4
    assert overlap_seen["artifact_before_last_decode"], (
        "first dp batch did not produce artifacts while decode was still "
        "in flight — the queue is store-and-forward, not streaming"
    )
    assert q.LAST_DP_STATS["peak_buffered_videos"] <= 2  # dp
    assert q.LAST_DP_STATS["batches"] == 2
    assert q.LAST_DP_STATS["evictions"] == 0


def test_dp_queue_evicts_odd_shapes_bounded(clips, tmp_path):
    """Odd-shape stragglers must not accumulate: with every video a
    different shape, host buffering stays ≤ 2·dp via eviction to immediate
    single-video runs, and artifacts still match the sequential queue."""
    rng = np.random.default_rng(4)
    paths = []
    for i in range(7):  # all distinct shapes; dp=2 → max_buffered=4
        frames = rng.integers(
            0, 256, size=(6, 48 + 8 * i, 64, 3), dtype=np.uint8
        )
        p = str(tmp_path / f"odd{i}.avi")
        write_video_mjpg(p, frames, 30.0)
        paths.append(p)
    from opticalflowclustering_tpu.pipeline import queue as q

    dp_dir = str(tmp_path / "dpod")
    seq_dir = str(tmp_path / "seqod")
    res = process_video_queue_dp(paths, dp_dir, _mesh(), CFG)
    assert all(r.ok for r in res) and len(res) == 7
    assert q.LAST_DP_STATS["peak_buffered_videos"] <= 4 + 1  # 2·dp (+1 transient)
    assert q.LAST_DP_STATS["evictions"] >= 1
    seq = process_video_queue(paths, seq_dir, CFG)
    assert all(r.ok for r in seq)
    for p in paths:
        stem = os.path.splitext(os.path.basename(p))[0]
        a = load_features(os.path.join(seq_dir, f"{stem}.features.npz"))
        b = load_features(os.path.join(dp_dir, f"{stem}.features.npz"))
        for k in ("hue_table", "rgb_hue_table", "centroids"):
            assert np.array_equal(a[k], b[k]), (p, k)
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


def test_processqueue_cli_sequential_and_dp(clips, tmp_path):
    """The queue CLI (cli/processqueue.py): sequential and dp modes both
    produce full-contract artifacts + addnew rows, exit 0, and resume."""
    import subprocess
    import sys

    env = dict(os.environ)
    out1 = str(tmp_path / "cliseq")
    addnew = str(tmp_path / "addnew.csv")
    r = subprocess.run(
        [sys.executable, "-m", "opticalflowclustering_tpu.cli.processqueue",
         *clips, "-o", out1, "--addnew", addnew],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert len([f for f in os.listdir(out1) if f.endswith(".npz")]) == 3
    assert os.path.getsize(addnew) > 100

    out2 = str(tmp_path / "clidp")
    r = subprocess.run(
        [sys.executable, "-m", "opticalflowclustering_tpu.cli.processqueue",
         *clips, "-o", out2, "--dp", "2", "--sp", "2"],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for p in clips:
        stem = os.path.splitext(os.path.basename(p))[0]
        a = load_features(os.path.join(out1, f"{stem}.features.npz"))
        b = load_features(os.path.join(out2, f"{stem}.features.npz"))
        for k in ("hue_table", "rgb_hue_table", "centroids"):
            assert np.array_equal(a[k], b[k]), (p, k)
