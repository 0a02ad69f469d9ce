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


def test_packed_u8_table_roundtrip(clip):
    """The device→host wire format is a uint8 packed table ([hue |
    rgb_hue | RGBA centroids | f32 mean-mag bitcast to 4 bytes]);
    _unpack_tables must restore exactly what chunk_step's dict path
    emits — dtypes included (the packing is advertised as lossless)."""
    import jax

    from opticalflowclustering_tpu.pipeline.bounce import (
        _stack_chunks,
        _unpack_tables,
        _video_step,
        chunk_step,
    )

    frames = read_video_bgr(clip)
    cfg = _cfg(chunk=4)
    chunks, n_pairs = _stack_chunks(frames, cfg.chunk)
    packed = np.asarray(_video_step(jax.device_put(chunks), cfg))
    assert packed.dtype == np.uint8
    got = _unpack_tables(packed, n_pairs)

    # oracle: the per-chunk dict path on the same chunk stack
    want = {k: [] for k in ("hue_table", "rgb_hue_table", "centroids",
                            "mean_magnitude")}
    for c in chunks:
        out = chunk_step(c, cfg)
        for k in want:
            want[k].append(np.asarray(out[k]))
    for k in want:
        want[k] = np.concatenate(want[k])[:n_pairs]

    assert got["hue_table"].dtype == np.uint8
    np.testing.assert_array_equal(got["hue_table"], want["hue_table"])
    np.testing.assert_array_equal(
        got["rgb_hue_table"], want["rgb_hue_table"].astype(np.float32)
    )
    np.testing.assert_array_equal(got["centroids"], want["centroids"])
    # mean_magnitude: the BITCAST is exact (round-trips the f32 the scan
    # program computed, pinned below on host bytes), but the scan-fused
    # program and the eager per-chunk oracle fuse the hypot+mean chain
    # differently — agreement is ~1 ulp, same contract as the sharding
    # tests.
    np.testing.assert_allclose(
        got["mean_magnitude"],
        want["mean_magnitude"].astype(np.float32),
        rtol=1e-6,
    )
    raw = np.ascontiguousarray(
        packed.reshape(-1, packed.shape[-1])[:n_pairs, -4:]
    )
    np.testing.assert_array_equal(
        raw.view(np.float32).ravel(), got["mean_magnitude"]
    )
