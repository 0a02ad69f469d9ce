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


def process_video_queue_dp(
    video_paths: list[str],
    out_dir: str,
    mesh,
    cfg: PipelineConfig = PipelineConfig(),
    dp_axis: str = "dp",
    sp_axis: str = "sp",
    resume: bool = True,
    max_frames: int | None = None,
    shard_hosts: bool = True,
) -> list[VideoResult]:
    """Mesh fan-out of the queue (SURVEY §7 step 7): videos ride the dp
    axis, each video's frames the sp axis, so a dp×sp mesh crunches
    dp videos per dispatch through `sharded_hue_pipeline_videos`.

    Under `jax.distributed` (parallel/multihost.py) each host first takes
    its round-robin share of the list, so decode stays host-local and only
    device-side work is distributed. Decode of the next batch overlaps
    device compute via a prefetch thread. Same-shape videos batch
    together; odd-shaped leftovers fall back to the sequential queue.
    Retry/resume semantics match `process_video_queue` (a failed batch
    retries its videos individually)."""
    import collections
    import queue as _q
    import threading

    import jax

    from opticalflowclustering_tpu.io.video import read_video_bgr
    from opticalflowclustering_tpu.parallel.multihost import host_shard
    from opticalflowclustering_tpu.parallel.temporal import (
        sharded_hue_pipeline_videos,
    )

    os.makedirs(out_dir, exist_ok=True)
    dp = mesh.shape[dp_axis]
    sp = mesh.shape[sp_axis]
    paths = (
        host_shard(video_paths)
        if shard_hosts and jax.process_count() > 1
        else list(video_paths)
    )

    results: list[VideoResult] = []
    todo = []
    for p in paths:
        artifact = _artifact_path(out_dir, p)
        if resume and os.path.exists(artifact):
            log.info("skip %s (artifact exists)", p)
            results.append(VideoResult(p, True, artifact, attempts=0))
        else:
            todo.append(p)

    # prefetch-decode thread: (path, frames|exception) stream
    decoded: _q.Queue = _q.Queue(maxsize=2)

    def _decoder():
        for p in todo:
            try:
                decoded.put((p, read_video_bgr(p, max_frames)))
            except Exception as e:  # noqa: BLE001
                decoded.put((p, e))
        decoded.put(None)

    threading.Thread(target=_decoder, daemon=True).start()

    buckets: dict[tuple, list] = collections.defaultdict(list)
    failed_decode: list[VideoResult] = []
    stream = []
    while True:
        item = decoded.get()
        if item is None:
            break
        p, frames = item
        if isinstance(frames, Exception):
            failed_decode.append(
                VideoResult(p, False, None, error=f"{type(frames).__name__}: {frames}", attempts=1)
            )
            continue
        buckets[frames.shape].append((p, frames))
        if len(buckets[frames.shape]) == dp:
            stream.append(buckets.pop(frames.shape))
    leftovers = [pv for group in buckets.values() for pv in group]

    def _run_batch(group):
        names = [p for p, _ in group]
        vids = np.stack([f for _, f in group])  # [dp, N, H, W, 3]
        n = vids.shape[1]
        n_pad = (-n) % sp
        if n_pad:  # repeat the last frame so sp divides N (extra pairs
            vids = np.concatenate(  # are junk and sliced off below)
                [vids, np.repeat(vids[:, -1:], n_pad, axis=1)], axis=1
            )
        hue, rgb_hue, mag = sharded_hue_pipeline_videos(
            vids, mesh, dp_axis, sp_axis, grid=cfg.grid, params=cfg.flow,
            rb_swap=cfg.rb_swap,
        )
        hue = np.asarray(hue)[:, : n - 1]
        rgb_hue = np.asarray(rgb_hue)[:, : n - 1]
        mag = np.asarray(mag)[:, : n - 1]
        for i, p in enumerate(names):
            artifact = _artifact_path(out_dir, p)
            np.savez_compressed(
                artifact,
                hue_table=hue[i],
                rgb_hue_table=rgb_hue[i],
                mean_magnitude=mag[i],
            )
            results.append(VideoResult(p, True, artifact, attempts=1))
        log.info("dp batch done: %s (%d pairs each)", names, n - 1)

    retry_paths = []
    for group in stream:
        try:
            _run_batch(group)
        except Exception as e:  # noqa: BLE001 — retry individually
            log.warning("dp batch failed (%s); retrying sequentially", e)
            retry_paths.extend(p for p, _ in group)
    retry_paths.extend(p for p, _ in leftovers)
    if retry_paths:
        results.extend(
            process_video_queue(
                retry_paths, out_dir, cfg, resume=resume,
                max_frames=max_frames,
            )
        )
    results.extend(failed_decode)
    return results
