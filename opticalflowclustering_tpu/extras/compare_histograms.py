"""Histogram-distance survey (`compare-histograms/comphis.py`).

The reference file never ran (syntax errors at `comphis.py:16,47,72` —
SURVEY.md §2.5 #9); this is the working equivalent of what it clearly
intended: normalized 3-D RGB histograms per image, compared with the four
OpenCV methods, three scipy-style distances, and the custom chi².
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from opticalflowclustering_tpu.ops.histogram import (
    calc_hist,
    chi2_distance,
    compare_hist,
    normalize_l2,
)

OPENCV_METHODS = ("correl", "chisqr", "intersect", "bhattacharyya")
SCIPY_METHODS = ("euclidean", "cityblock", "chebyshev")


def describe(image_bgr, bins=(8, 8, 8)) -> np.ndarray:
    h = calc_hist(jnp.asarray(image_bgr), [0, 1, 2], list(bins), [(0, 256)] * 3)
    return np.asarray(normalize_l2(h)).ravel()


def scipy_distance(a, b, method: str) -> float:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if method == "euclidean":
        return float(jnp.sqrt(jnp.sum((a - b) ** 2)))
    if method == "cityblock":
        return float(jnp.sum(jnp.abs(a - b)))
    if method == "chebyshev":
        return float(jnp.max(jnp.abs(a - b)))
    raise ValueError(method)


def compare_all(query_hist, index: dict[str, np.ndarray]) -> dict[str, dict[str, float]]:
    """For each index image: every method's distance/similarity to the
    query histogram — the table comphis.py tried to display."""
    out: dict[str, dict[str, float]] = {}
    for name, h in index.items():
        row = {m: float(compare_hist(jnp.asarray(query_hist), jnp.asarray(h), m))
               for m in OPENCV_METHODS}
        row.update({m: scipy_distance(query_hist, h, m) for m in SCIPY_METHODS})
        row["chi2_custom"] = float(
            chi2_distance(jnp.asarray(query_hist), jnp.asarray(h))
        )
        out[name] = row
    return out
