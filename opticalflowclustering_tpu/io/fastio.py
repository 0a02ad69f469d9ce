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
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _threads() -> int:
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


def decode_mjpeg_avi(path: str, max_frames: int | None = None) -> np.ndarray:
    """Demux + decode an MJPG AVI (the framework's own writer format,
    io/video.py write_video_mjpg) → [N, H, W, 3] uint8 BGR."""
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
        count, h.value, w.value, _threads(),
    )
    if got < 0:
        raise ValueError(f"mjpeg decode failed (rc={got}): {path}")
    return out[:got]


def stream_mjpeg_avi(
    path: str,
    chunk: int,
    overlap: int = 1,
    max_frames: int | None = None,
    segment: int = 512,
):
    """Streaming native decode: yield [chunk+overlap, H, W, 3] uint8 BGR
    batches (with `n_valid`, same contract as io/video.py
    stream_video_chunks) while the C++ threaded decoder fills the buffer in
    the background.

    The decoder publishes per-frame done flags (release-ordered after the
    pixels land, native/fastio.cpp ofc_mjpeg_avi_decode_flags); the
    generator yields as soon as the contiguous done-prefix covers the next
    chunk — so on a host whose native decode rate ≈ the device rate, decode
    fully hides behind compute. Host memory is bounded by `segment` frames
    per in-flight decode window, so arbitrarily long videos stream in
    constant memory.
    """
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
    total = n.value if max_frames is None else min(n.value, max_frames)
    h, w = h.value, w.value
    segment = max(segment, chunk + overlap)

    def frames_iter():
        start = 0
        while start < total:
            count = min(segment, total - start)
            buf = np.empty((count, h, w, 3), np.uint8)
            done = np.zeros(count, np.uint8)
            result: list[int] = []

            def worker(buf=buf, done=done, result=result, start=start,
                       count=count):
                result.append(lib.ofc_mjpeg_avi_decode_flags(
                    path.encode(),
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    start, count, h, w, _threads(),
                    done.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ))

            t = threading.Thread(target=worker, daemon=True)
            t.start()
            emitted = 0
            while emitted < count:
                # contiguous done-prefix (x86 plain loads pair with the
                # decoder's release fence; flags flip 0→1 exactly once)
                nz = np.flatnonzero(done == 0)
                avail = count if nz.size == 0 else int(nz[0])
                if avail == emitted:
                    if not t.is_alive():
                        # finished without filling the prefix → decode error
                        raise ValueError(
                            f"mjpeg stream decode failed "
                            f"(rc={result[0] if result else '?'}): {path}"
                        )
                    t.join(timeout=0.002)
                    continue
                for i in range(emitted, avail):
                    yield buf[i]
                emitted = avail
            t.join()
            if result and result[0] < 0:
                raise ValueError(
                    f"mjpeg stream decode failed (rc={result[0]}): {path}"
                )
            start += count

    # chunk assembly: same contract as io/video.py stream_video_chunks
    it = frames_iter()
    carry: list[np.ndarray] = []
    eof = False
    while not eof:
        frames = list(carry)
        while len(frames) < chunk + overlap:
            nxt = next(it, None)
            if nxt is None:
                eof = True
                break
            frames.append(nxt)
        n_valid = max(0, len(frames) - overlap)
        if n_valid == 0:
            break
        batch = np.zeros((chunk + overlap, h, w, 3), np.uint8)
        batch[: len(frames)] = np.stack(frames)
        yield batch, n_valid
        carry = frames[chunk:]


def is_mjpeg_avi(path: str) -> bool:
    """Cheap container sniff: RIFF/AVI magic."""
    try:
        with open(path, "rb") as f:
            head = f.read(12)
    except OSError:
        return False
    return len(head) == 12 and head[:4] == b"RIFF" and head[8:] == b"AVI "
