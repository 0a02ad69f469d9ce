"""End-to-end benchmark: flow→grid→cluster frames/sec on one TPU chip vs the
reference's OpenCV/sklearn CPU loop (BASELINE.md north star: ≥100×).

Prints ONE JSON line:
  {"metric": ..., "value": <tpu fps>, "unit": "frames/sec/chip",
   "vs_baseline": <tpu fps / reference cpu fps>}

The workload mirrors the canonical eval clip (49 frames of 1280×720,
`601_bad_bounce_3` — its mp4 is an LFS stub, so frames are synthesized
deterministically at the same geometry). The CPU baseline is a faithful
re-enactment of the reference's per-frame loop (`KmeanGrids.py:180-239` +
phase 2): cv2 Farneback → HSV render → 350 cell slices → per-cell
sklearn KMeans(k=1) → hue, timed over a few frames and scaled.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: the benchmark measures steady-state
    throughput, and the dev TPU tunnel's remote-compile service can be slow —
    cached executables make repeat runs start in seconds."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W, N = 720, 1280, 49
GRID_ROWS, GRID_COLS = 14, 25


def synth_frames(n=N, h=H, w=W, seed=0):
    rng = np.random.default_rng(seed)
    import cv2

    bg = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    bg = cv2.GaussianBlur(bg, (0, 0), 3)
    frames = []
    for i in range(n):
        f = bg.copy()
        cv2.circle(f, (100 + 20 * i, 300 + int(8 * np.sin(i / 3))), 25,
                   (40, 200, 220), -1)
        frames.append(f)
    return np.stack(frames)


def pipeline_config():
    from opticalflowclustering_tpu.flow.farneback import FarnebackParams
    from opticalflowclustering_tpu.pipeline.bounce import PipelineConfig

    # warp_mode='fast': the gather-free select-warp. Verified to match both
    # the exact mode and cv2 to ~0 EPE on real footage (flow estimates only
    # deviate where they are garbage on both paths); radius 32 covers
    # ≥32 px/frame motion at the finest level (scaled per pyramid level).
    return PipelineConfig(
        chunk=8,
        emit_flow_bgr=False,
        flow=FarnebackParams(warp_mode="fast", warp_radius=32),
    )


def bench_epe_vs_cv2(frames: np.ndarray, n_pairs: int = 2) -> float:
    """Mean EPE of the benchmarked configuration vs cv2 on this clip."""
    import cv2
    import jax

    from opticalflowclustering_tpu.flow.farneback import farneback_flow
    from opticalflowclustering_tpu.ops.colorspace import bgr2gray

    cfg = pipeline_config()
    gray = np.asarray(jax.jit(bgr2gray)(frames[: n_pairs + 1]))
    jf = jax.jit(lambda a, b: farneback_flow(a, b, cfg.flow))
    worst = 0.0
    for i in range(n_pairs):
        want = cv2.calcOpticalFlowFarneback(
            gray[i], gray[i + 1], None, 0.5, 3, 15, 3, 5, 1.2, 0
        )
        got = np.asarray(jf(gray[i], gray[i + 1]))
        worst = max(worst, float(np.sqrt(((got - want) ** 2).sum(-1)).mean()))
    return worst


def bench_tpu(frames: np.ndarray, repeats: int = 3) -> float:
    import jax

    from opticalflowclustering_tpu.pipeline.bounce import _chunk_step

    cfg = pipeline_config()
    n_pairs = frames.shape[0] - 1

    chunks = []
    for start in range(0, n_pairs, cfg.chunk):
        stop = min(start + cfg.chunk, n_pairs)
        chunk = frames[start : stop + 1]
        pad = (cfg.chunk + 1) - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        chunks.append(jax.device_put(chunk))

    def run_all():
        outs = [_chunk_step(c, cfg) for c in chunks]
        # A device→host fetch is the only reliable completion barrier on
        # remote/tunneled runtimes where block_until_ready can return at
        # enqueue time; pull the tiny telemetry vector from every chunk.
        return [np.asarray(o["mean_magnitude"]) for o in outs]

    run_all()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(repeats):
        run_all()
    dt = (time.perf_counter() - t0) / repeats
    return n_pairs / dt


def bench_cpu_reference(frames: np.ndarray, n_frames: int = 3) -> float:
    """The reference's per-frame loop, verbatim semantics."""
    import cv2
    from sklearn.cluster import KMeans

    ys, xs = H // GRID_ROWS, W // GRID_COLS
    prev_gray = cv2.cvtColor(frames[0], cv2.COLOR_BGR2GRAY)
    t0 = time.perf_counter()
    for i in range(1, n_frames + 1):
        gray = cv2.cvtColor(frames[i], cv2.COLOR_BGR2GRAY)
        flow = cv2.calcOpticalFlowFarneback(
            prev_gray, gray, None, 0.5, 3, 15, 3, 5, 1.2, 0
        )
        mag, ang = cv2.cartToPolar(flow[..., 0], flow[..., 1])
        mask = np.zeros_like(frames[i])
        mask[..., 0] = ang * 180 / np.pi / 2
        mask[..., 1] = 255
        mask[..., 2] = cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX)
        bgr = cv2.cvtColor(mask, cv2.COLOR_HSV2BGR)
        prev_gray = gray
        hues = []
        for r in range(GRID_ROWS):
            for c in range(GRID_COLS):
                roi = bgr[r * ys : (r + 1) * ys, c * xs : (c + 1) * xs].copy()
                roi[0, :] = 255
                roi[:, 0] = 255
                rgb = cv2.cvtColor(roi, cv2.COLOR_BGR2RGB)
                rgb[rgb < 30] = 0
                g2 = cv2.cvtColor(rgb, cv2.COLOR_BGR2GRAY)
                _, alpha = cv2.threshold(g2, 0, 255, cv2.THRESH_BINARY)
                flat = np.dstack([rgb, alpha]).reshape(-1, 4)
                clt = KMeans(n_clusters=1, n_init=1)
                clt.fit(flat)
                cen = np.rint(clt.cluster_centers_[0])
                px = np.array([[[cen[0], cen[1], cen[2]]]], np.uint8)
                hues.append(cv2.cvtColor(px, cv2.COLOR_BGR2HSV)[0, 0, 0])
    dt = time.perf_counter() - t0
    return n_frames / dt


def main():
    _enable_compile_cache()
    frames = synth_frames()
    cpu_fps = bench_cpu_reference(frames)
    print(f"cpu reference: {cpu_fps:.3f} fps", file=sys.stderr)
    tpu_fps = bench_tpu(frames)
    print(f"tpu pipeline: {tpu_fps:.1f} fps", file=sys.stderr)
    epe = bench_epe_vs_cv2(frames)
    print(f"flow mean EPE vs cv2 on this clip: {epe:.5f} px "
          f"(target < 0.1)", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "e2e flow+grid+cluster throughput (720p, 49-frame clip)",
                "value": round(tpu_fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(tpu_fps / cpu_fps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
