"""Fault-tolerant multi-video work queue with feature persistence.

SURVEY.md §5: the reference has no failure handling (loops just `break` on
a failed `cap.read()`, `KmeanGrids.py:185`) and nothing resumable. Here:
a host-side per-video queue that retries failed videos, checkpoints each
video's feature tensors (hue tables, telemetry) as .npz, and skips
already-completed work on resume — so a multi-video batch survives decode
errors and restarts without re-running flow.
"""

from __future__ import annotations

import dataclasses
import os
import traceback

import numpy as np

from opticalflowclustering_tpu.pipeline.bounce import PipelineConfig, process_frames
from opticalflowclustering_tpu.utils.logging import get_logger

log = get_logger("ofc_tpu.queue")

_SAVED_KEYS = ("hue_table", "rgb_hue_table", "mean_magnitude")


@dataclasses.dataclass
class VideoResult:
    video: str
    ok: bool
    path: str | None = None
    error: str | None = None
    attempts: int = 0


def _artifact_path(out_dir: str, video_path: str) -> str:
    stem = os.path.splitext(os.path.basename(video_path))[0]
    return os.path.join(out_dir, f"{stem}.features.npz")


def process_video_queue(
    video_paths: list[str],
    out_dir: str,
    cfg: PipelineConfig = PipelineConfig(),
    max_retries: int = 2,
    resume: bool = True,
    max_frames: int | None = None,
) -> list[VideoResult]:
    """Run the fused pipeline over many videos with retry + resume.

    Persists {hue_table, rgb_hue_table, mean_magnitude} per video; on
    resume, videos whose artifact exists are skipped. Returns one
    VideoResult per input.
    """
    from opticalflowclustering_tpu.io.video import read_video_bgr

    os.makedirs(out_dir, exist_ok=True)
    results = []
    for path in video_paths:
        artifact = _artifact_path(out_dir, path)
        if resume and os.path.exists(artifact):
            log.info("skip %s (artifact exists)", path)
            results.append(VideoResult(path, True, artifact, attempts=0))
            continue
        last_err = None
        for attempt in range(1, max_retries + 2):
            try:
                frames = read_video_bgr(path, max_frames)
                out = process_frames(frames, cfg)
                np.savez_compressed(
                    artifact, **{k: out[k] for k in _SAVED_KEYS}
                )
                log.info("done %s (%d pairs, attempt %d)",
                         path, out["hue_table"].shape[0], attempt)
                results.append(VideoResult(path, True, artifact, attempts=attempt))
                break
            except Exception as e:  # noqa: BLE001 — queue must survive any video
                last_err = f"{type(e).__name__}: {e}"
                log.warning("attempt %d failed for %s: %s", attempt, path, last_err)
                log.debug("%s", traceback.format_exc())
        else:
            results.append(
                VideoResult(path, False, None, error=last_err,
                            attempts=max_retries + 1)
            )
    return results


def load_features(artifact_path: str) -> dict[str, np.ndarray]:
    with np.load(artifact_path) as z:
        return {k: z[k] for k in z.files}
