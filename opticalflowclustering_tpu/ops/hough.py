"""Hough circle detection (`detect-circles/detect_circles.py:13`,
cv2.HoughCircles HOUGH_GRADIENT dp=1.2 minDist=75).

Gradient-vote formulation like OpenCV's HOUGH_GRADIENT, end-to-end on
device as ONE jitted program: Canny edges vote for centers along their
Sobel gradient direction across the radius range (dense scatter-add
accumulator, `lax.scan` over radii so peak memory stays at one [H, W]
vote plane per step), accumulator peaks are extracted with a device NMS
scan (argmax + rectangular suppression within minDist — the global max is
non-increasing under suppression, so the below-threshold cutoff is a
monotone validity flag instead of a data-dependent break), and each
center's radius is the modal edge distance (device bincount). The host
wrapper only trims the fixed-size [max_circles, 3] result to the valid
rows. SURVEY.md §2.3 called this scatter-add kernel a stretch goal; it
was the last §2.3 primitive without a device path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from opticalflowclustering_tpu.ops.edges import canny, sobel


@functools.partial(
    jax.jit,
    static_argnames=(
        "dp",
        "min_dist",
        "canny_high",
        "acc_threshold",
        "min_radius",
        "max_radius",
        "max_circles",
    ),
)
def hough_circles_device(
    gray: jnp.ndarray,
    *,
    dp: float = 1.2,
    min_dist: float = 75.0,
    canny_high: float = 100.0,
    acc_threshold: float = 30.0,
    min_radius: int = 10,
    max_radius: int = 60,
    max_circles: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[H, W] uint8 → (circles [max_circles, 3] (x, y, r), valid mask).
    Fixed-size jittable core; circles are in detection (peak) order and
    `valid` is monotone (all True rows precede all False rows)."""
    h, w = gray.shape
    ah, aw = int(h / dp) + 1, int(w / dp) + 1
    edges = canny(gray, canny_high / 2.0, canny_high) > 0
    gx = sobel(gray, 1, 0, 3).astype(jnp.float32)
    gy = sobel(gray, 0, 1, 3).astype(jnp.float32)
    mag = jnp.hypot(gx, gy)
    votable = edges & (mag > 1e-3)
    safe = jnp.where(mag > 1e-3, mag, 1.0)
    dirx = gx / safe
    diry = gy / safe

    ys_f = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs_f = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    radii = jnp.arange(min_radius, max_radius + 1, dtype=jnp.float32)

    def vote(acc, r):
        for sign in (1.0, -1.0):
            cx = (xs_f + sign * r * dirx) / dp
            cy = (ys_f + sign * r * diry) / dp
            cxi = jnp.round(cx).astype(jnp.int32)
            cyi = jnp.round(cy).astype(jnp.int32)
            ok = votable & (cxi >= 0) & (cxi < aw) & (cyi >= 0) & (cyi < ah)
            acc = acc.at[
                jnp.clip(cyi, 0, ah - 1), jnp.clip(cxi, 0, aw - 1)
            ].add(ok.astype(jnp.int32))
        return acc, None

    acc, _ = jax.lax.scan(vote, jnp.zeros((ah, aw), jnp.int32), radii)

    # Peak extraction: argmax + rectangular suppression within minDist
    # (the accumulator-space window matches the host formulation's
    # integer-truncated slice bounds; coordinates are non-negative, so
    # floor == int()).
    md = min_dist / dp
    ay = jax.lax.broadcasted_iota(jnp.float32, (ah, aw), 0)
    ax = jax.lax.broadcasted_iota(jnp.float32, (ah, aw), 1)

    def nms_step(acc_work, _):
        peak = jnp.max(acc_work)
        idx = jnp.argmax(acc_work)
        py = (idx // aw).astype(jnp.float32)
        px = (idx % aw).astype(jnp.float32)
        ok = peak.astype(jnp.float32) >= acc_threshold
        y0 = jnp.floor(jnp.maximum(py - md, 0.0))
        y1 = jnp.floor(py + md + 1.0)
        x0 = jnp.floor(jnp.maximum(px - md, 0.0))
        x1 = jnp.floor(px + md + 1.0)
        hit = (ay >= y0) & (ay < y1) & (ax >= x0) & (ax < x1)
        acc_work = jnp.where(hit, 0, acc_work)
        return acc_work, (px * dp, py * dp, ok)

    _, (cxs, cys, oks) = jax.lax.scan(
        nms_step, acc, None, length=max_circles
    )

    # Radius: modal edge distance per center, np.histogram bin semantics
    # (nbins over [min_radius, max_radius + 1)).
    nbins = max_radius - min_radius + 1
    width = (max_radius + 1 - min_radius) / nbins

    def radius_for(cx0, cy0):
        d = jnp.hypot(xs_f - cx0, ys_f - cy0)
        sel = votable & (d >= min_radius) & (d <= max_radius)
        bins = jnp.clip(
            ((d - min_radius) / width).astype(jnp.int32), 0, nbins - 1
        )
        hist = jnp.zeros((nbins,), jnp.int32).at[bins].add(
            sel.astype(jnp.int32)
        )
        r = min_radius + jnp.argmax(hist).astype(jnp.float32) * width + 0.5
        return r, jnp.sum(hist) > 0

    rs, has_r = jax.vmap(radius_for)(cxs, cys)
    circles = jnp.stack([cxs, cys, rs], axis=-1)
    valid = oks & has_r
    # `oks` is monotone (NMS zeroes peaks in descending order) but has_r
    # can be False for an earlier peak whose edge support all falls inside
    # min_radius after dp-rounding — stably compact the valid rows forward
    # so the documented all-True-then-all-False invariant holds.
    order = jnp.argsort(~valid, stable=True)
    return circles[order], valid[order]


def hough_circles(
    gray,
    dp: float = 1.2,
    min_dist: float = 75.0,
    canny_high: float = 100.0,
    acc_threshold: float = 30.0,
    min_radius: int = 10,
    max_radius: int = 60,
    max_circles: int = 16,
) -> np.ndarray:
    """[H, W] uint8 → [K, 3] (x, y, r) circles (K ≤ max_circles), peak
    order. Host wrapper over the jitted device core."""
    circles, valid = hough_circles_device(
        jnp.asarray(gray),
        dp=dp,
        min_dist=min_dist,
        canny_high=canny_high,
        acc_threshold=acc_threshold,
        min_radius=min_radius,
        max_radius=max_radius,
        max_circles=max_circles,
    )
    circles = np.asarray(circles)
    valid = np.asarray(valid)
    return circles[valid]
