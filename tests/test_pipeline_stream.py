"""Decode-inclusive streaming pipeline (pipeline/bounce.py
process_video_stream): bit-identical to the batch path, for both the cv2
background-thread stream and the native C++ MJPEG decoder.

The reference pays decode inline inside its hot loop
(`k-means-color-clustering/KmeanGrids.py:156,180-185`); the streaming path
overlaps decode with device compute, so its correctness contract is that
chunking/overlap changes nothing.
"""

import os

import numpy as np
import pytest

from opticalflowclustering_tpu.flow.farneback import FarnebackParams
from opticalflowclustering_tpu.io.video import read_video_bgr, write_video_mjpg
from opticalflowclustering_tpu.pipeline.bounce import (
    PipelineConfig,
    process_frames,
    process_video_stream,
)


def _clip(tmp_path, n=12, h=70, w=100):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    # smooth + moving blob so the flow is non-trivial
    import cv2

    frames = np.stack([cv2.GaussianBlur(f, (0, 0), 2) for f in frames])
    for i in range(n):
        cv2.circle(frames[i], (10 + 5 * i, 30), 8, (30, 220, 200), -1)
    path = os.path.join(tmp_path, "clip.avi")
    write_video_mjpg(path, frames, fps=30.0)
    return path


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    return _clip(tmp_path_factory.mktemp("stream"))


def _cfg(chunk):
    from opticalflowclustering_tpu.features.grid import GridParams

    return PipelineConfig(
        grid=GridParams(rows=5, cols=5),
        flow=FarnebackParams(warp_mode="exact", levels=2),
        chunk=chunk,
        emit_flow_bgr=False,
    )


def test_stream_matches_batch(clip):
    """Streamed tables == batch tables, including a chunk size that does
    not divide the pair count (11 pairs, chunk 4 → zero-padded tail)."""
    frames = read_video_bgr(clip)
    for chunk in (4, 16):
        cfg = _cfg(chunk)
        want = process_frames(frames, cfg)
        got = process_video_stream(clip, cfg)
        assert set(got) == set(want)
        for k in want:
            assert np.array_equal(got[k], want[k]), (
                f"chunk={chunk} table {k} differs"
            )


def test_stream_native_decoder(clip):
    """The native C++ MJPEG path produces the same table SHAPES and close
    values (JPEG IDCT/chroma rounding differs from cv2 by ≤5 codes, so the
    contract is shape + telemetry proximity, not bitwise — io/video.py:42-44)."""
    from opticalflowclustering_tpu.io import fastio

    if not fastio.available():
        pytest.skip("native fastio toolchain unavailable")
    cfg = _cfg(4)
    want = process_frames(read_video_bgr(clip), cfg)
    got = process_video_stream(clip, cfg, native=True)
    for k in want:
        assert got[k].shape == want[k].shape
    # decode deltas of a couple of codes shift the per-frame mean |flow|
    # only marginally
    assert np.allclose(
        got["mean_magnitude"], want["mean_magnitude"], rtol=0.25, atol=0.05
    )


def test_stream_too_short(tmp_path):
    import cv2

    frames = np.zeros((1, 32, 32, 3), np.uint8)
    path = os.path.join(tmp_path, "one.avi")
    write_video_mjpg(path, frames, fps=30.0)
    with pytest.raises(ValueError):
        process_video_stream(path, _cfg(4))
