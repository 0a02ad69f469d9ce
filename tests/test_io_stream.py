"""Async decode paths (io/video.py): the prefetching chunk streamer must
reproduce exactly what the synchronous whole-video decode produces, and the
threaded VideoStream must serve frames from a file source."""

from __future__ import annotations

import time

import numpy as np
import pytest

from opticalflowclustering_tpu.io.video import (
    VideoStream,
    read_video_bgr,
    stream_video_chunks,
    write_video_mjpg,
)


@pytest.fixture()
def clip(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(13, 48, 64, 3), dtype=np.uint8)
    path = str(tmp_path / "clip.avi")
    write_video_mjpg(path, frames, 30.0)
    return path


def test_stream_chunks_match_sync_decode(clip):
    ref = read_video_bgr(clip)  # [13, H, W, 3]
    got = []
    shapes = set()
    for batch, n_valid in stream_video_chunks(clip, chunk=4, overlap=1):
        shapes.add(batch.shape)
        # batch rows [0, n_valid] are real frames; pair i = (i, i+1)
        if not got:
            got.append(batch[0])
        got.extend(batch[1 : n_valid + 1])
    assert len(shapes) == 1  # fixed shape -> one compiled program
    got = np.stack(got)
    assert np.array_equal(got, ref)


def test_stream_chunks_respects_max_frames(clip):
    total = sum(
        n for _, n in stream_video_chunks(clip, chunk=4, overlap=1,
                                          max_frames=6)
    )
    assert total == 5  # 6 frames -> 5 pairs


def test_video_stream_reads_frames(clip):
    vs = VideoStream(clip, paced=False).start()
    # read() returns None until the daemon reader produces its first
    # frame — on a loaded 1-core box that can lag start() by a while, so
    # poll with a deadline instead of breaking on the first None (the
    # old form flaked in-suite with frames == 0).
    deadline = time.monotonic() + 20.0
    frames = 0
    while frames < 5 and time.monotonic() < deadline:
        f = vs.read()
        if f is None:
            if not vs.running():
                break
            time.sleep(0.01)
            continue
        assert f.shape == (48, 64, 3)
        frames += 1
    vs.stop()
    assert frames > 0
