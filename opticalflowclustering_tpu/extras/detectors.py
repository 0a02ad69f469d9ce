"""Detection demo workloads, batched.

Ports of: `color-detection/detect_color.py`, `skin-detection/
skindetector.py`, `finding-brightest-spot/bright.py`,
`detect-barcodes/detect_barcode.py`, `finding-shapes/find_shapes.py`.
Mask math runs on device; the irregular contour step stays host-side
(extras.contours).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from opticalflowclustering_tpu.extras.contours import (
    box_points,
    contour_area,
    find_external_contours,
    min_area_rect,
)
from opticalflowclustering_tpu.ops.colorspace import bgr2gray, bgr2hsv
from opticalflowclustering_tpu.ops.edges import sobel
from opticalflowclustering_tpu.ops.filters import gaussian_blur, sep_filter_axis
from opticalflowclustering_tpu.ops.morphology import (
    dilate,
    erode,
    morphology_ex,
    structuring_element,
)
from opticalflowclustering_tpu.ops.threshold import (
    bitwise_and_mask,
    in_range,
    threshold,
)

# The four color bands of `detect_color.py:11-16` (BGR lower/upper).
COLOR_BOUNDARIES = [
    ((17, 15, 100), (50, 56, 200)),  # red
    ((86, 31, 4), (220, 88, 50)),  # blue
    ((25, 146, 190), (62, 174, 250)),  # yellow
    ((103, 86, 65), (145, 133, 128)),  # gray
]


def detect_colors(image_bgr: jnp.ndarray, boundaries=None):
    """`detect_color.py:19-26`: per-band inRange mask + masked image."""
    boundaries = boundaries or COLOR_BOUNDARIES
    outs = []
    for lower, upper in boundaries:
        mask = in_range(image_bgr, lower, upper)
        outs.append((mask, bitwise_and_mask(image_bgr, mask)))
    return outs


def skin_mask(frame_bgr: jnp.ndarray) -> jnp.ndarray:
    """`skindetector.py:10-33`: HSV inRange([0,48,80],[20,255,255]) →
    ellipse-kernel erode×2/dilate×2 → Gaussian blur → masked frame."""
    hsv = bgr2hsv(frame_bgr)
    mask = in_range(hsv, (0, 48, 80), (20, 255, 255))
    k = structuring_element("ellipse", (11, 11))
    mask = erode(mask, k, iterations=2)
    mask = dilate(mask, k, iterations=2)
    blurred = gaussian_blur(mask.astype(jnp.float32), 3, 0.0)
    mask = jnp.clip(jnp.round(blurred), 0, 255).astype(jnp.uint8)
    return bitwise_and_mask(frame_bgr, mask)


def brightest_spot(
    image_bgr: jnp.ndarray, radius: int = 0
) -> tuple[tuple[int, int], jnp.ndarray]:
    """`bright.py:12-21`: (naive or Gaussian-smoothed) argmax location of
    the grayscale image. radius>0 applies the robust blur variant."""
    gray = bgr2gray(image_bgr).astype(jnp.float32)
    if radius > 0:
        gray = gaussian_blur(gray, radius, 0.0)
    idx = jnp.argmax(gray)
    y, x = jnp.unravel_index(idx, gray.shape)
    return (int(x), int(y)), gray


def locate_barcode(image_bgr: np.ndarray) -> np.ndarray:
    """`detect_barcode.py:12-31`: Scharr gradient difference → blur →
    threshold 225 → close(21×7) → erode×4/dilate×4 → largest contour's
    rotated box (4×2 points)."""
    img = jnp.asarray(image_bgr)
    gray = bgr2gray(img).astype(jnp.float32)
    grad_x = sobel(gray, 1, 0, ksize=-1)
    grad_y = sobel(gray, 0, 1, ksize=-1)
    gradient = jnp.clip(jnp.abs(grad_x - grad_y), 0, 255).astype(jnp.uint8)
    blurred = sep_filter_axis(
        sep_filter_axis(gradient.astype(jnp.float32), np.full(9, 1 / 9), -2,
                        "reflect101"),
        np.full(9, 1 / 9), -1, "reflect101",
    )
    blurred = jnp.clip(jnp.round(blurred), 0, 255).astype(jnp.uint8)
    thresh = threshold(blurred, 225, 255, "binary")
    k = structuring_element("rect", (21, 7))
    closed = morphology_ex(thresh, "close", k)
    k3 = structuring_element("rect", (3, 3))
    closed = erode(closed, k3, iterations=4)
    closed = dilate(closed, k3, iterations=4)

    contours = find_external_contours(np.asarray(closed))
    if not contours:
        return np.zeros((0, 2))
    largest = max(contours, key=contour_area)
    rect = min_area_rect(largest)
    return np.intp(np.round(box_points(rect)))


def find_shapes(image_bgr: np.ndarray, lower=(0, 0, 0), upper=(15, 15, 15)):
    """`find_shapes.py:11-17`: inRange shape mask → external contours."""
    mask = in_range(jnp.asarray(image_bgr), lower, upper)
    return find_external_contours(np.asarray(mask))
