"""Document scanner (`DocumentScanner/scan.py:18-48`): edge detection →
largest 4-point contour → perspective rectification → adaptive
binarization. Device ops throughout except the contour step.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from opticalflowclustering_tpu.extras.contours import (
    approx_poly_dp,
    arc_length,
    contour_area,
    find_external_contours,
)
from opticalflowclustering_tpu.ops.colorspace import bgr2gray
from opticalflowclustering_tpu.ops.edges import canny
from opticalflowclustering_tpu.ops.filters import gaussian_blur
from opticalflowclustering_tpu.ops.threshold import adaptive_threshold
from opticalflowclustering_tpu.ops.warp import four_point_transform, resize_aspect


def find_document_contour(image_bgr: np.ndarray) -> np.ndarray | None:
    """scan.py:18-36: gray → GaussianBlur(5) → Canny(75,200) → largest
    contour with a 4-point 2% arc-length approximation."""
    img = jnp.asarray(image_bgr)
    gray = bgr2gray(img).astype(jnp.float32)
    gray = jnp.clip(jnp.round(gaussian_blur(gray, 5, 0.0)), 0, 255).astype(jnp.uint8)
    edged = canny(gray, 75, 200)
    contours = find_external_contours(np.asarray(edged))
    contours = sorted(contours, key=contour_area, reverse=True)[:5]
    for c in contours:
        peri = arc_length(c, closed=True)
        approx = approx_poly_dp(c, 0.02 * peri, closed=True)
        if len(approx) == 4:
            return approx
    return None


def scan_document(image_bgr: np.ndarray, height: int = 500):
    """Full scan.py flow: downscale for detection, rectify at original
    resolution, adaptive-threshold ('gaussian', block 251, offset 10 — the
    skimage threshold_adaptive call at scan.py:47). Returns (warped_bgr,
    binarized) or (None, None) when no document quad is found."""
    orig = np.asarray(image_bgr)
    ratio = orig.shape[0] / float(height)
    small = np.asarray(resize_aspect(jnp.asarray(orig), height=height))
    quad = find_document_contour(small)
    if quad is None:
        return None, None
    warped = four_point_transform(jnp.asarray(orig), quad * ratio)
    gray = bgr2gray(warped)
    binarized = adaptive_threshold(
        gray, 255, method="gaussian", mode="binary", block_size=251, c=10
    )
    return np.asarray(warped), np.asarray(binarized)
