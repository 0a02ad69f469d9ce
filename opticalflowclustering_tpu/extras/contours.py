"""Contour utilities — the host/device boundary for irregular geometry.

The reference leans on OpenCV contours for masking and shape workloads
(`KmeanGrids.py:34-50` fillPoly contour masking, `DocumentScanner/scan.py:
28-36`, `Pokedex/index.py:18-27`, `detect-barcodes/detect_barcode.py:27-31`,
`finding-shapes/find_shapes.py:11-17`). Contour *extraction* is
data-dependent and irregular — it stays on the host (numpy border
following, SURVEY.md §2.3) — while *rasterization* (fillPoly masks) runs on
device as a vectorized crossing-number test so masks composite into the
batched pipeline.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Moore neighborhood in clockwise order starting from W.
_NBRS = [(-1, 0), (-1, -1), (0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1)]


def find_external_contours(mask: np.ndarray) -> list[np.ndarray]:
    """External contours of a binary mask (cv2.RETR_EXTERNAL-style), as
    [K, 2] arrays of (x, y) points via Moore border following."""
    m = (np.asarray(mask) > 0).astype(np.uint8)
    h, w = m.shape
    padded = np.zeros((h + 2, w + 2), np.uint8)
    padded[1:-1, 1:-1] = m
    visited = np.zeros_like(padded, bool)
    contours = []
    # label external borders: scan for unvisited foreground with background left
    for y in range(1, h + 1):
        x = 1
        while x < w + 1:
            if padded[y, x] and not padded[y, x - 1] and not visited[y, x]:
                contour = _trace(padded, visited, y, x)
                contours.append(np.array([(p[1] - 1, p[0] - 1) for p in contour]))
                # skip the run of this blob on this row
            x += 1
    return contours


def _trace(img: np.ndarray, visited: np.ndarray, y0: int, x0: int):
    """Moore-neighbor tracing with Jacob's stopping criterion."""
    contour = [(y0, x0)]
    visited[y0, x0] = True
    # backtrack: came from the left
    prev_dir = 0  # index into _NBRS pointing W
    cy, cx = y0, x0
    for _ in range(img.size):
        found = False
        for i in range(8):
            d = (prev_dir + 1 + i) % 8
            ny, nx = cy + _NBRS[d][0], cx + _NBRS[d][1]
            if img[ny, nx]:
                if (ny, nx) == (y0, x0) and len(contour) > 2:
                    return contour
                contour.append((ny, nx))
                visited[ny, nx] = True
                # next search resumes clockwise from the backtrack direction
                # (the opposite of the direction we just moved in)
                prev_dir = (d + 4) % 8
                cy, cx = ny, nx
                found = True
                break
        if not found:
            return contour  # isolated pixel
    return contour


def contour_area(contour: np.ndarray) -> float:
    """cv2.contourArea (shoelace, absolute)."""
    c = np.asarray(contour, np.float64)
    x, y = c[:, 0], c[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)


def arc_length(contour: np.ndarray, closed: bool = True) -> float:
    """cv2.arcLength."""
    c = np.asarray(contour, np.float64)
    d = np.diff(c, axis=0)
    total = float(np.hypot(d[:, 0], d[:, 1]).sum())
    if closed and len(c) > 1:
        total += float(np.hypot(*(c[0] - c[-1])))
    return total


def approx_poly_dp(contour: np.ndarray, epsilon: float, closed: bool = True):
    """Douglas-Peucker simplification (cv2.approxPolyDP semantics)."""
    pts = np.asarray(contour, np.float64)
    if len(pts) < 3:
        return pts.copy()
    if closed:
        # split at the two farthest points, like OpenCV's closed handling
        d = np.linalg.norm(pts - pts[0], axis=1)
        far = int(np.argmax(d))
        part1 = _dp(pts[: far + 1], epsilon)
        part2 = _dp(np.vstack([pts[far:], pts[:1]]), epsilon)
        out = np.vstack([part1[:-1], part2[:-1]])
    else:
        out = _dp(pts, epsilon)
    return out


def _dp(pts: np.ndarray, eps: float) -> np.ndarray:
    if len(pts) < 3:
        return pts
    start, end = pts[0], pts[-1]
    seg = end - start
    seg_len = np.hypot(*seg)
    if seg_len == 0:
        dists = np.linalg.norm(pts - start, axis=1)
    else:
        rel = pts - start
        dists = np.abs(seg[0] * rel[:, 1] - seg[1] * rel[:, 0]) / seg_len
    i = int(np.argmax(dists))
    if dists[i] > eps:
        left = _dp(pts[: i + 1], eps)
        right = _dp(pts[i:], eps)
        return np.vstack([left[:-1], right])
    return np.vstack([start, end])


def bounding_rect(contour: np.ndarray) -> tuple[int, int, int, int]:
    """cv2.boundingRect: (x, y, w, h)."""
    c = np.asarray(contour)
    x, y = int(c[:, 0].min()), int(c[:, 1].min())
    return x, y, int(c[:, 0].max()) - x + 1, int(c[:, 1].max()) - y + 1


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain convex hull, counter-clockwise."""
    pts = np.unique(np.asarray(points, np.float64), axis=0)
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    if len(pts) <= 2:
        return pts

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2:
                a = out[-1] - out[-2]
                b = p - out[-2]
                if a[0] * b[1] - a[1] * b[0] > 0:
                    break
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect(contour: np.ndarray):
    """cv2.minAreaRect via rotating calipers over the convex hull:
    ((cx, cy), (w, h), angle_deg)."""
    hull = convex_hull(contour)
    n = len(hull)
    if n == 1:
        return (tuple(hull[0]), (0.0, 0.0), 0.0)
    best = None
    for i in range(n):
        e = hull[(i + 1) % n] - hull[i]
        norm = np.hypot(*e)
        if norm == 0:
            continue
        ux, uy = e / norm
        rot = np.array([[ux, uy], [-uy, ux]])
        proj = hull @ rot.T
        mn, mx = proj.min(0), proj.max(0)
        area = (mx[0] - mn[0]) * (mx[1] - mn[1])
        if best is None or area < best[0]:
            cx, cy = (mn + mx) / 2 @ rot
            angle = np.degrees(np.arctan2(uy, ux))
            best = (area, (float(cx), float(cy)),
                    (float(mx[0] - mn[0]), float(mx[1] - mn[1])), float(angle))
    return best[1], best[2], best[3]


def box_points(rect) -> np.ndarray:
    """cv2.boxPoints."""
    (cx, cy), (w, h), angle = rect
    a = np.deg2rad(angle)
    ux, uy = np.cos(a), np.sin(a)
    ex = np.array([ux, uy]) * (w / 2)
    ey = np.array([-uy, ux]) * (h / 2)
    c = np.array([cx, cy])
    return np.array([c - ex - ey, c + ex - ey, c + ex + ey, c - ex + ey])


def fill_poly_mask(shape_hw: tuple[int, int], polygons) -> jnp.ndarray:
    """Device fillPoly: even-odd crossing-number rasterization of polygons
    ([K,2] (x,y) vertex arrays) into a uint8 {0,255} mask — the device-side
    half of the contour masking in `KmeanGrids.py:50`."""
    h, w = shape_hw
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    mask = jnp.zeros((h, w), bool)
    for poly in polygons:
        p = np.asarray(poly, np.float32)
        crossings = jnp.zeros((h, w), jnp.int32)
        for i in range(len(p)):
            x1, y1 = p[i]
            x2, y2 = p[(i + 1) % len(p)]
            if y1 == y2:
                continue
            cond = ((ys >= min(y1, y2)) & (ys < max(y1, y2)))
            xint = x1 + (ys - y1) * (x2 - x1) / (y2 - y1)
            crossings = crossings + (cond & (xs < xint)).astype(jnp.int32)
        mask = mask | (crossings % 2 == 1)
    return jnp.where(mask, jnp.uint8(255), jnp.uint8(0))
