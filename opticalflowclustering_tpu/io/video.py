"""Host media boundary: video decode/encode.

Decode happens once on the host (OpenCV's native demuxer), producing one
batched uint8 array that crosses to the device a single time — the TPU-native
replacement for the reference's frame-at-a-time `cap.read()` loop
(`KmeanGrids.py:156,180-185`). Encode mirrors `cv2.VideoWriter` with the
reference's MJPG fourcc (`computeOpticalFlow.py:27-33`).
"""

from __future__ import annotations

import numpy as np


_LFS_POINTER_MAGIC = b"version https://git-lfs.github.com/spec/v1"


def is_lfs_pointer(path: str) -> bool:
    """True if `path` is a Git-LFS pointer stub rather than real media.

    Every `.mp4` in the reference tree is such a stub
    (`k-means-color-clustering/.gitattributes:1`); callers use this to fall
    back to the committed PNG artifacts explicitly instead of guessing from
    file size."""
    try:
        with open(path, "rb") as f:
            head = f.read(len(_LFS_POINTER_MAGIC))
    except OSError:
        return False
    return head == _LFS_POINTER_MAGIC


def read_video_bgr(path: str, max_frames: int | None = None) -> np.ndarray:
    """Decode a video file → [N, H, W, 3] uint8 BGR frames."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    frames = []
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(frame)
        if max_frames is not None and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames)


def video_fps(path: str) -> float:
    import cv2

    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS)
    cap.release()
    return float(fps) if fps and fps > 0 else 30.0


def write_video_mjpg(path: str, frames: np.ndarray, fps: float) -> None:
    """Encode [N, H, W, 3] uint8 BGR frames as MJPG-in-mp4, the reference's
    writer configuration (`computeOpticalFlow.py:27-33`, `KmeanGrids.py:163`)."""
    import cv2

    h, w = frames.shape[1], frames.shape[2]
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    for f in np.asarray(frames):
        out.write(f)
    out.release()
