"""Pokédex shape retrieval (`Pokedex/`): Zernike-moment index + Euclidean
nearest-neighbor search, plus the Game Boy screen finder.

- `ZernikeMoments.describe` (`pyimagesearch/zernikemoments.py:4-12`)
- indexing (`index.py:18-36`): threshold the sprite, keep the largest
  contour's filled outline, describe
- `Searcher` (`searcher.py:4-16`): scipy-euclidean ranking, vectorized
- `find_screen` (`find_screen.py:16-74`): bilateral → Canny → 4-pt quad →
  perspective rectify
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from opticalflowclustering_tpu.extras.contours import (
    approx_poly_dp,
    arc_length,
    contour_area,
    fill_poly_mask,
    find_external_contours,
)
from opticalflowclustering_tpu.ops.colorspace import bgr2gray
from opticalflowclustering_tpu.ops.edges import bilateral_filter, canny
from opticalflowclustering_tpu.ops.moments import zernike_moments
from opticalflowclustering_tpu.ops.warp import four_point_transform, resize_aspect


class ZernikeMoments:
    """API-compatible descriptor (`zernikemoments.py:4-12`)."""

    def __init__(self, radius: float):
        self.radius = radius

    def describe(self, image, degree: int = 8) -> np.ndarray:
        return np.asarray(
            zernike_moments(jnp.asarray(image), self.radius, degree)
        )


def sprite_outline(image_bgr: np.ndarray, pad: int = 15) -> np.ndarray:
    """`index.py:18-30`: inverted-threshold mask, largest external contour,
    filled outline raster (the shape fed to the Zernike descriptor)."""
    img = jnp.asarray(image_bgr)
    gray = np.asarray(bgr2gray(img))
    mask = (gray > 50).astype(np.uint8) * 255
    contours = find_external_contours(mask)
    if not contours:
        return np.zeros_like(gray)
    largest = max(contours, key=contour_area)
    outline = np.asarray(fill_poly_mask(gray.shape, [largest]))
    return outline


class Searcher:
    """`Pokedex/searcher.py:4-16`: Euclidean ranking, vectorized."""

    def __init__(self, index: dict[str, np.ndarray]):
        self.index = index
        self._names = list(index.keys())
        self._feats = np.stack([index[k] for k in self._names])

    def search(self, query_features) -> list[tuple[float, str]]:
        q = np.asarray(query_features, np.float64)
        d = np.sqrt(((self._feats - q) ** 2).sum(axis=1))
        return sorted(zip(d.tolist(), self._names))


def find_screen(image_bgr: np.ndarray, width: int = 300):
    """`find_screen.py:16-74`: downscale, bilateral(11,17,17), Canny(30,200),
    largest 4-point contour, rectify. Returns the warped screen or None."""
    orig = np.asarray(image_bgr)
    ratio = orig.shape[1] / float(width)
    small = np.asarray(resize_aspect(jnp.asarray(orig), width=width))
    gray = bgr2gray(jnp.asarray(small))
    gray = bilateral_filter(gray, 11, 17.0, 17.0)
    edged = canny(gray, 30, 200)
    contours = find_external_contours(np.asarray(edged))
    contours = sorted(contours, key=contour_area, reverse=True)[:10]
    quad = None
    for c in contours:
        peri = arc_length(c, closed=True)
        approx = approx_poly_dp(c, 0.015 * peri, closed=True)
        if len(approx) == 4:
            quad = approx
            break
    if quad is None:
        return None
    return np.asarray(four_point_transform(jnp.asarray(orig), quad * ratio))
