"""ctypes boundary to the C++ host-IO runtime (native/fastio.cpp): threaded
batch PNG decode and MJPEG-AVI demux/decode into one [N, H, W, 3] uint8 BGR
buffer.

The .so builds on first use with the baked-in toolchain (g++, libpng,
libjpeg-turbo) and is cached next to the source; callers use
`available()` / fall back to the cv2 paths when the toolchain or codec
libraries are missing, so the pure-Python install still works everywhere.
`read_video_bgr`/`load_cells_batch` route here automatically
(io/video.py, io/images.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "fastio.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "_fastio.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _SO, "-lpng", "-ljpeg", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        lib.ofc_decode_png_batch.restype = ctypes.c_int
        lib.ofc_decode_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        lib.ofc_mjpeg_avi_probe.restype = ctypes.c_int
        lib.ofc_mjpeg_avi_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.ofc_mjpeg_avi_decode.restype = ctypes.c_int
        lib.ofc_mjpeg_avi_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.ofc_mjpeg_avi_decode_flags.restype = ctypes.c_int
        lib.ofc_mjpeg_avi_decode_flags.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        if hasattr(lib, "ofc_acquire_fence"):
            lib.ofc_acquire_fence.restype = None
            lib.ofc_acquire_fence.argtypes = []
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _threads() -> int:
    """Decode fan-out width: every frame of a window is independently
    decodable (the RIFF seek index), so both the batch and streaming MJPEG
    paths hand the whole window to native/fastio.cpp's parallel_for over
    frames. On an M-core host one process therefore sustains
    ~M × decode_fps_1core (the bench's decode roofline projection) — on
    this 1-core dev box the pool degenerates to serial, which is a host
    property, not a code path. Override with OFC_IO_THREADS."""
    env = os.environ.get("OFC_IO_THREADS")
    if env:
        try:
            return max(int(env), 1)
        except ValueError:
            import warnings

            warnings.warn(
                f"OFC_IO_THREADS={env!r} is not an integer; falling back "
                "to os.cpu_count()",
                RuntimeWarning,
                stacklevel=2,
            )
    return max(os.cpu_count() or 1, 1)


def decode_png_batch(paths: list[str], h: int, w: int) -> np.ndarray:
    """Decode same-size PNGs → [N, h, w, 3] uint8 BGR in one native call
    (the reference pays a Python `cv2.imread` per cell PNG,
    `color_kmeansChange.py:147-159`; here N files cost one FFI hop)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native fastio unavailable")
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    errs = (ctypes.c_int * n)()
    rc = lib.ofc_decode_png_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        _threads(), errs,
    )
    if rc != 0:
        bad = [paths[i] for i in range(n) if errs[i] != 0][:3]
        raise ValueError(f"png batch decode failed (rc={rc}): {bad}")
    return out


def decode_mjpeg_avi(
    path: str, max_frames: int | None = None, threads: int | None = None
) -> np.ndarray:
    """Demux + decode an MJPG AVI (the framework's own writer format,
    io/video.py write_video_mjpg) → [N, H, W, 3] uint8 BGR.

    Frames decode ACROSS the native thread pool (each writes its own
    [h, w, 3] slice of the batch buffer — disjoint, so the fan-out is
    race-free and the output is bit-identical at any `threads`;
    tests/test_fastio.py pins 1 vs 8). `threads` defaults to
    _threads() (host cores / OFC_IO_THREADS)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native fastio unavailable")
    n = ctypes.c_int()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.ofc_mjpeg_avi_probe(path.encode(), ctypes.byref(n),
                                 ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"not an MJPEG AVI (rc={rc}): {path}")
    count = n.value if max_frames is None else min(n.value, max_frames)
    out = np.empty((count, h.value, w.value, 3), np.uint8)
    got = lib.ofc_mjpeg_avi_decode(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        count, h.value, w.value,
        _threads() if threads is None else max(threads, 1),
    )
    if got < 0:
        raise ValueError(f"mjpeg decode failed (rc={got}): {path}")
    return out[:got]


def stream_mjpeg_avi(
    path: str,
    chunk: int,
    overlap: int = 1,
    max_frames: int | None = None,
    segment: int | None = None,
    probe: tuple[int, int, int] | None = None,
):
    """Streaming native decode: yield [chunk+overlap, H, W, 3] uint8 BGR
    batches (with `n_valid`, same contract as io/video.py
    stream_video_chunks) while the C++ threaded decoder fills the buffer in
    the background.

    The decoder publishes per-frame done flags (release-ordered after the
    pixels land, native/fastio.cpp ofc_mjpeg_avi_decode_flags); the
    generator yields as soon as the contiguous done-prefix covers the next
    chunk — so on a host whose native decode rate ≈ the device rate, decode
    fully hides behind compute. Host memory is bounded by the in-flight
    `segment`-frame decode windows (up to THREE can be transiently alive:
    the one being drained — whose buffer the assembler's carry still
    views — plus the next one decoding and its successor started at the
    segment join): the container index is built with a seek-based header
    sweep (cached per path in the C++ runtime) and each window freads
    only its own byte span — the file is never loaded whole, so
    arbitrarily long videos stream in constant memory. `segment` defaults
    to ~128 MB of frames (≥ chunk+overlap, ≤ 512), so the 3-window bound
    stays a few hundred MB at any resolution instead of scaling with
    frame size.

    `probe` forwards an earlier probe_mjpeg_avi() result so gate + stream
    don't probe twice.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native fastio unavailable")
    if probe is None:
        probe = probe_mjpeg_avi(path)
    if probe is None:
        raise ValueError(f"not an MJPEG AVI: {path}")
    total, h, w = probe
    if max_frames is not None:
        total = min(total, max_frames)
    if segment is None:
        frame_bytes = h * w * 3
        segment = max(1, min(512, (128 << 20) // max(frame_bytes, 1)))
    segment = max(segment, chunk + overlap)

    class _Segment:
        """One in-flight decode window: a buffer the C++ threads fill plus
        the per-frame done flags they publish."""

        def __init__(self, start: int, count: int):
            self.count = count
            self.buf = np.empty((count, h, w, 3), np.uint8)
            self.done = np.zeros(count, np.uint8)
            self.result: list[int] = []
            self.thread = threading.Thread(
                target=self._work, args=(start,), daemon=True
            )
            self.thread.start()

        def _work(self, start: int):
            self.result.append(lib.ofc_mjpeg_avi_decode_flags(
                path.encode(),
                self.buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                start, self.count, h, w, _threads(),
                self.done.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ))

        def avail(self) -> int:
            """Contiguous done-prefix length. Follow with an acquire fence
            before touching buf rows — plain numpy loads pair with the
            decoder's release fence on x86 only."""
            nz = np.flatnonzero(self.done == 0)
            n = self.count if nz.size == 0 else int(nz[0])
            if n and hasattr(lib, "ofc_acquire_fence"):
                lib.ofc_acquire_fence()
            return n

        def check_rc(self):
            if self.result and self.result[0] < 0:
                raise ValueError(
                    f"mjpeg stream decode failed (rc={self.result[0]}): "
                    f"{path}"
                )

    def frames_iter():
        # Pipelined decode windows: segment k+1's decoder starts as soon
        # as segment k's decode THREAD exits (not when the consumer
        # finishes draining k), so the decoder never idles at a segment
        # boundary. Up to 3 segment buffers are transiently alive (the
        # drained one is pinned by the assembler's carry views until the
        # next chunk is built) — the byte-targeted default `segment`
        # keeps that bound resolution-independent.
        start = 0
        cur = _Segment(start, min(segment, total - start)) if total else None
        start = cur.count if cur else 0
        while cur is not None:
            nxt = None
            emitted = 0
            while emitted < cur.count:
                avail = cur.avail()
                if nxt is None and start < total and not cur.thread.is_alive():
                    nxt = _Segment(start, min(segment, total - start))
                    start += nxt.count
                if avail == emitted:
                    alive = cur.thread.is_alive()
                    # re-scan AFTER the liveness check: the decoder may
                    # have published the remaining flags and exited
                    # between the scan above and is_alive() (TOCTOU).
                    avail = cur.avail()
                    if avail == emitted:
                        if not alive:
                            cur.check_rc()  # negative rc raises with detail
                            raise ValueError(
                                "mjpeg stream decode ended with an "
                                f"incomplete prefix ({emitted}/{cur.count})"
                                f": {path}"
                            )
                        cur.thread.join(timeout=0.002)
                        continue
                for i in range(emitted, avail):
                    yield cur.buf[i]
                emitted = avail
            cur.thread.join()
            cur.check_rc()
            if nxt is None and start < total:
                nxt = _Segment(start, min(segment, total - start))
                start += nxt.count
            cur = nxt

    from opticalflowclustering_tpu.io.video import assemble_chunks

    yield from assemble_chunks(frames_iter(), chunk, overlap)


def probe_mjpeg_avi(path: str) -> tuple[int, int, int] | None:
    """Full native probe (container + MJPEG codec): (n_frames, h, w), or
    None if the file isn't a decodable MJPEG AVI / the runtime is absent.
    This is the gate for the native streaming path — the RIFF magic alone
    is not enough (an xvid AVI passes the sniff but fails the jpeg
    probe)."""
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_int()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.ofc_mjpeg_avi_probe(path.encode(), ctypes.byref(n),
                                 ctypes.byref(h), ctypes.byref(w))
    if rc != 0 or n.value <= 0:
        return None
    return n.value, h.value, w.value


def is_mjpeg_avi(path: str) -> bool:
    """Cheap container sniff: RIFF/AVI magic. Codec is NOT checked — use
    probe_mjpeg_avi() to gate the native decode path."""
    try:
        with open(path, "rb") as f:
            head = f.read(12)
    except OSError:
        return False
    return len(head) == 12 and head[:4] == b"RIFF" and head[8:] == b"AVI "
