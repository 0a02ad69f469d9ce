"""Hough circle detection (`detect-circles/detect_circles.py:13`,
cv2.HoughCircles HOUGH_GRADIENT dp=1.2 minDist=75).

Gradient-vote formulation like OpenCV's HOUGH_GRADIENT: Canny edges vote
for centers along their Sobel gradient direction across the radius range,
the accumulator peaks (non-max within minDist) become candidate centers,
and each center's radius is the modal edge distance. Edge detection and
gradients run on device; the sparse, data-dependent accumulator vote is a
host reduction (SURVEY.md §2.3 classifies Hough as host-boundary work).
"""

from __future__ import annotations

import numpy as np

from opticalflowclustering_tpu.ops.edges import canny, sobel


def hough_circles(
    gray: jnp.ndarray,
    dp: float = 1.2,
    min_dist: float = 75.0,
    canny_high: float = 100.0,
    acc_threshold: float = 30.0,
    min_radius: int = 10,
    max_radius: int = 60,
    max_circles: int = 16,
) -> np.ndarray:
    """[H, W] uint8 → [K, 3] (x, y, r) circles (K ≤ max_circles)."""
    h, w = gray.shape
    ah, aw = int(h / dp) + 1, int(w / dp) + 1
    edges = np.asarray(canny(gray, canny_high / 2.0, canny_high)) > 0
    gx = np.asarray(sobel(gray, 1, 0, 3))
    gy = np.asarray(sobel(gray, 0, 1, 3))

    ys, xs = np.nonzero(edges)
    mag = np.hypot(gx[ys, xs], gy[ys, xs])
    ok = mag > 1e-3
    ys, xs, mag = ys[ok], xs[ok], mag[ok]
    dirx = gx[ys, xs] / mag
    diry = gy[ys, xs] / mag

    acc = np.zeros((ah, aw), np.int32)
    radii = np.arange(min_radius, max_radius + 1)
    for sign in (1, -1):
        cx = (xs[None, :] + sign * radii[:, None] * dirx[None, :]) / dp
        cy = (ys[None, :] + sign * radii[:, None] * diry[None, :]) / dp
        cxi = np.round(cx).astype(np.int64)
        cyi = np.round(cy).astype(np.int64)
        valid = (cxi >= 0) & (cxi < aw) & (cyi >= 0) & (cyi < ah)
        np.add.at(acc, (cyi[valid], cxi[valid]), 1)

    centers = []
    acc_work = acc.astype(np.float64)
    for _ in range(max_circles):
        peak = acc_work.max()
        if peak < acc_threshold:
            break
        py, px = np.unravel_index(np.argmax(acc_work), acc_work.shape)
        centers.append((px * dp, py * dp))
        y0, y1 = int(max(py - min_dist / dp, 0)), int(py + min_dist / dp + 1)
        x0, x1 = int(max(px - min_dist / dp, 0)), int(px + min_dist / dp + 1)
        acc_work[y0:y1, x0:x1] = 0

    out = []
    for cx0, cy0 in centers:
        d = np.hypot(xs - cx0, ys - cy0)
        sel = (d >= min_radius) & (d <= max_radius)
        if not sel.any():
            continue
        hist, edges_ = np.histogram(d[sel], bins=max_radius - min_radius + 1,
                                    range=(min_radius, max_radius + 1))
        r = edges_[np.argmax(hist)] + 0.5
        out.append((cx0, cy0, r))
    return np.array(out)
