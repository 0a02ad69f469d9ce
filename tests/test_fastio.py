"""C++ host-IO runtime (native/fastio.cpp via io/fastio.py): threaded PNG
batch decode must be bit-identical to cv2.imread on the real reference
crops; the MJPEG-AVI decoder must match cv2.VideoCapture within JPEG IDCT
rounding (±3, two libjpeg builds)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from opticalflowclustering_tpu.io import fastio
from opticalflowclustering_tpu.io.video import read_video_bgr, write_video_mjpg

NEG_DIR = "/root/reference/k-means-color-clustering/Non-bounce/NoBounce_1"

pytestmark = pytest.mark.skipif(
    not fastio.available(), reason="native toolchain unavailable"
)


@pytest.mark.skipif(not os.path.isdir(NEG_DIR), reason="reference not mounted")
def test_png_batch_bitexact_vs_cv2():
    import cv2

    paths = sorted(glob.glob(os.path.join(NEG_DIR, "*.png")))[:32]
    got = fastio.decode_png_batch(paths, 50, 50)
    want = np.stack([cv2.imread(p) for p in paths])
    assert np.array_equal(got, want)


def test_png_batch_shape_mismatch_raises(tmp_path):
    import cv2

    p = str(tmp_path / "odd.png")
    cv2.imwrite(p, np.zeros((10, 12, 3), np.uint8))
    with pytest.raises(ValueError):
        fastio.decode_png_batch([p], 50, 50)


def test_mjpeg_avi_decode_matches_cv2(tmp_path):
    # video-like smooth content (noise frames over-stress JPEG quantization
    # and say nothing about the decoder)
    yy, xx = np.mgrid[0:64, 0:80].astype(np.float32)
    frames = np.stack(
        [
            np.stack(
                [
                    127.5 + 120 * np.sin(yy / 9 + i / 3),
                    127.5 + 120 * np.sin(xx / 11 + i / 2),
                    127.5 + 120 * np.sin((xx + yy) / 13 + i),
                ],
                axis=-1,
            ).astype(np.uint8)
            for i in range(9)
        ]
    )
    path = str(tmp_path / "clip.avi")
    write_video_mjpg(path, frames, 30.0)
    want = read_video_bgr(path)
    got = fastio.decode_mjpeg_avi(path)
    assert got.shape == want.shape
    d = np.abs(got.astype(int) - want.astype(int))
    # JPEG decode is not bit-specified: two libjpeg builds legitimately
    # differ by a couple of codes in chroma upsampling/IDCT rounding.
    assert d.max() <= 5 and d.mean() < 1.0, (d.max(), d.mean())
    # the opt-in route through read_video_bgr
    via = read_video_bgr(path, native=True)
    assert np.array_equal(via, got)
    # max_frames honored
    assert fastio.decode_mjpeg_avi(path, max_frames=4).shape[0] == 4


def test_mjpeg_probe_and_sniff(tmp_path):
    frames = np.zeros((3, 32, 32, 3), np.uint8)
    path = str(tmp_path / "c.avi")
    write_video_mjpg(path, frames, 30.0)
    assert fastio.is_mjpeg_avi(path)
    assert not fastio.is_mjpeg_avi(__file__)
    assert fastio.probe_mjpeg_avi(path) == (3, 32, 32)
    assert fastio.probe_mjpeg_avi(__file__) is None


def test_non_mjpeg_avi_falls_back_to_cv2(tmp_path):
    """An AVI whose codec isn't MJPEG passes the RIFF sniff but must NOT
    be routed to the native decoder: probe_mjpeg_avi rejects it, and
    process_video_stream(native=True) silently falls back to the cv2
    stream instead of raising mid-stream."""
    import cv2

    from opticalflowclustering_tpu.pipeline.bounce import (
        PipelineConfig,
        process_video_stream,
    )

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(6, 48, 64, 3), dtype=np.uint8)
    path = str(tmp_path / "x.avi")
    wr = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"XVID"), 30.0, (64, 48)
    )
    if not wr.isOpened():
        pytest.skip("XVID writer unavailable")
    for f in frames:
        wr.write(f)
    wr.release()
    assert fastio.is_mjpeg_avi(path)  # the sniff alone would mis-route
    assert fastio.probe_mjpeg_avi(path) is None
    out = process_video_stream(
        path, PipelineConfig(chunk=4, emit_flow_bgr=False), native=True
    )
    assert out["hue_table"].shape[0] == 5  # decoded fine via cv2


def test_stream_mjpeg_avi_matches_batch_decode(tmp_path):
    """Streaming done-flag decode (stream_mjpeg_avi) reassembles to exactly
    the batch decode, across chunk sizes and with a segment boundary in the
    middle (segment < total exercises the cross-segment carry)."""
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    frames = np.stack(
        [
            np.stack(
                [
                    127.5 + 110 * np.sin(yy / 7 + i / 2),
                    127.5 + 110 * np.sin(xx / 9 + i / 3),
                    127.5 + 110 * np.sin((xx + yy) / 11 + i),
                ],
                axis=-1,
            ).astype(np.uint8)
            for i in range(23)
        ]
    )
    path = str(tmp_path / "clip.avi")
    write_video_mjpg(path, frames, 30.0)
    want = fastio.decode_mjpeg_avi(path)

    for chunk, segment in ((4, 512), (4, 10), (7, 9)):
        got = []
        last = None
        for batch, n_valid in fastio.stream_mjpeg_avi(
            path, chunk, overlap=1, segment=segment
        ):
            assert batch.shape == (chunk + 1,) + want.shape[1:]
            got.append(batch[:n_valid])
            last = (batch, n_valid)
        # chunk j contributes frames [j*chunk, j*chunk+n_valid); the final
        # frame rides only in the last batch's overlap slot
        got.append(last[0][last[1] : last[1] + 1])
        out = np.concatenate(got)
        assert out.shape == want.shape, (chunk, segment, out.shape)
        assert np.array_equal(out, want), (chunk, segment)

    # max_frames honored
    chunks = list(fastio.stream_mjpeg_avi(path, 4, max_frames=6))
    assert sum(v for _, v in chunks) == 5


def _movi_payload(path):
    """Extract one AVI's `LIST....movi` box bytes (header included) by a
    minimal RIFF walk — the building block for crafting OpenDML files."""
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    pos = 12
    while pos + 12 <= len(data):
        tag, sz = data[pos : pos + 4], int.from_bytes(data[pos + 4 : pos + 8], "little")
        if tag == b"LIST" and data[pos + 8 : pos + 12] == b"movi":
            return data[pos : pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    raise AssertionError("no movi LIST")


def test_avix_extension_segments_indexed(tmp_path):
    """OpenDML long-file layout (ADVICE r3 medium): frames in appended
    `RIFF....AVIX` extension segments must be indexed too — cv2's MJPG
    writer emits them past ~1 GB, and truncating them silently breaks the
    'arbitrarily long videos' streaming contract. Crafted here by
    appending an AVIX segment that duplicates the primary movi."""
    if not fastio.available():
        pytest.skip("native fastio unavailable")
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(9, 48, 64, 3), dtype=np.uint8)
    path = str(tmp_path / "base.avi")
    write_video_mjpg(path, frames, 30.0)
    want = fastio.decode_mjpeg_avi(path)  # 9 frames

    movi = _movi_payload(path)
    avix = b"RIFF" + (4 + len(movi)).to_bytes(4, "little") + b"AVIX" + movi
    odml = str(tmp_path / "odml.avi")
    with open(odml, "wb") as f:
        f.write(open(path, "rb").read())
        f.write(avix)

    probe = fastio.probe_mjpeg_avi(odml)
    assert probe is not None and probe[0] == 2 * len(frames), probe
    got = fastio.decode_mjpeg_avi(odml)
    assert got.shape[0] == 2 * len(frames)
    assert np.array_equal(got[: len(frames)], want)
    assert np.array_equal(got[len(frames) :], want)  # duplicated segment

    # and the streaming path sees all segments' frames too
    total = sum(v for _, v in fastio.stream_mjpeg_avi(odml, 4)) + 1
    assert total == 2 * len(frames)


def test_stream_decode_failure_stalls_at_bad_frame(tmp_path):
    """A corrupt frame mid-stream (ADVICE r3 low): its done-flag is never
    published, so the stream raises AT the bad frame instead of yielding
    garbage pixels — and every frame before it is still delivered
    bit-exact."""
    if not fastio.available():
        pytest.skip("native fastio unavailable")
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 256, size=(12, 48, 64, 3), dtype=np.uint8)
    path = str(tmp_path / "bad.avi")
    write_video_mjpg(path, frames, 30.0)
    want = fastio.decode_mjpeg_avi(path)

    # kill frame 7's JPEG SOI marker so its decode hard-fails
    data = bytearray(open(path, "rb").read())
    pos, found = 12, []
    while pos + 12 <= len(data):
        tag = bytes(data[pos : pos + 4])
        sz = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if tag == b"LIST" and bytes(data[pos + 8 : pos + 12]) == b"movi":
            mp = pos + 12
            while mp + 8 <= pos + 8 + sz:
                csz = int.from_bytes(data[mp + 4 : mp + 8], "little")
                if bytes(data[mp + 2 : mp + 4]) in (b"dc", b"db"):
                    found.append((mp + 8, csz))
                mp += 8 + csz + (csz & 1)
            break
        pos += 8 + sz + (sz & 1)
    assert len(found) == 12
    off, _ = found[7]
    data[off : off + 2] = b"\x00\x00"
    with open(path, "wb") as f:
        f.write(data)

    got = []
    with pytest.raises(ValueError, match="decode failed|incomplete prefix"):
        for batch, n_valid in fastio.stream_mjpeg_avi(path, 3, overlap=1):
            got.append(np.array(batch[:n_valid]))
    delivered = np.concatenate(got) if got else np.empty((0,) + want.shape[1:])
    assert delivered.shape[0] <= 7  # nothing at/after the bad frame
    assert np.array_equal(delivered, want[: delivered.shape[0]])


def test_mjpeg_window_decode_threaded_bit_identical(tmp_path):
    """VERDICT r4 #8: window frames decode ACROSS the native thread pool
    (native/fastio.cpp parallel_for over frames — each frame writes its
    own disjoint [h,w,3] slice), and the output is BIT-IDENTICAL at any
    thread count, so the cores × decode_fps_1core roofline is realizable
    by one process on production hosts. Pinned: threads=1 vs threads=8
    byte-equal, both matching the streaming path."""
    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    frames = np.stack(
        [
            np.stack(
                [
                    127.5 + 100 * np.sin(yy / 7 + i),
                    127.5 + 100 * np.sin(xx / 9 + i / 2),
                    rng.uniform(100, 150, yy.shape),
                ],
                axis=-1,
            ).astype(np.uint8)
            for i in range(24)
        ]
    )
    path = str(tmp_path / "tclip.avi")
    write_video_mjpg(path, frames, 30.0)

    serial = fastio.decode_mjpeg_avi(path, threads=1)
    pooled = fastio.decode_mjpeg_avi(path, threads=8)
    assert serial.shape == (24, 48, 64, 3)
    assert np.array_equal(serial, pooled)

    # the streaming path (same native decode, done-flag windows) agrees
    chunks = [
        c for c, _ in fastio.stream_mjpeg_avi(path, chunk=6, overlap=0)
    ]
    assert np.array_equal(np.concatenate(chunks)[:24], serial)
