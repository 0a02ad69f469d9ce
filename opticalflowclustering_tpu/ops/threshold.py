"""Thresholding / masking primitives: cv2.threshold, adaptiveThreshold,
inRange, bitwise masking.

Reference call sites: global threshold modes demo
(`ImageSegmentation/threshold.py:14-23`), binary alpha
(`color_kmeans.py:46`), adaptive document binarization
(`DocumentScanner/scan.py:47`, `Pokedex/search.py:24-25`), color/skin
detection masks (`color-detection/detect_color.py:22-23`,
`skin-detection/skindetector.py:26`). All pure elementwise jnp; adaptive
threshold is a box/Gaussian mean filter plus a compare.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from opticalflowclustering_tpu.ops.filters import gaussian_kernel, sep_filter_axis

_MODES = ("binary", "binary_inv", "trunc", "tozero", "tozero_inv")


def threshold(
    src: jnp.ndarray, thresh: float, maxval: float, mode: str = "binary"
) -> jnp.ndarray:
    """cv2.threshold (uint8 path). Returns the thresholded image (OpenCV
    also returns `thresh`; use `threshold_otsu` for the OTSU value)."""
    x = src.astype(jnp.int32)
    t = int(thresh)
    m = jnp.uint8(int(maxval))
    above = x > t
    if mode == "binary":
        out = jnp.where(above, m, jnp.uint8(0))
    elif mode == "binary_inv":
        out = jnp.where(above, jnp.uint8(0), m)
    elif mode == "trunc":
        out = jnp.where(above, jnp.uint8(t), src.astype(jnp.uint8))
    elif mode == "tozero":
        out = jnp.where(above, src.astype(jnp.uint8), jnp.uint8(0))
    elif mode == "tozero_inv":
        out = jnp.where(above, jnp.uint8(0), src.astype(jnp.uint8))
    else:
        raise ValueError(mode)
    return out


def threshold_otsu(src: jnp.ndarray) -> jnp.ndarray:
    """Otsu's threshold value for a uint8 image (cv2.THRESH_OTSU): maximize
    between-class variance over the 256-bin histogram."""
    import jax

    x = src.astype(jnp.int32).ravel()
    hist = jnp.sum(jax.nn.one_hot(x, 256, dtype=jnp.float32), axis=0)
    total = hist.sum()
    w = hist / total
    bins = jnp.arange(256, dtype=jnp.float32)
    omega = jnp.cumsum(w)
    mu = jnp.cumsum(w * bins)
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    sigma_b = jnp.where(denom > 0, (mu_t * omega - mu) ** 2 / denom, 0.0)
    return jnp.argmax(sigma_b).astype(jnp.float32)


def adaptive_threshold(
    src: jnp.ndarray,
    maxval: float = 255,
    method: str = "mean",
    mode: str = "binary",
    block_size: int = 11,
    c: float = 2.0,
) -> jnp.ndarray:
    """cv2.adaptiveThreshold semantics: the local mean is a box/Gaussian
    filter with REPLICATE border rounded to uint8, and the comparison is
    src > mean - ceil(C) for binary (floor for binary_inv), matching
    OpenCV's integer table construction."""
    import math

    x = src.astype(jnp.float32)
    if method == "mean":
        k = np.full(block_size, 1.0 / block_size)
    elif method == "gaussian":
        k = gaussian_kernel(block_size, 0.0)
    else:
        raise ValueError(method)
    local = sep_filter_axis(x, k, axis=-2, border="replicate")
    local = sep_filter_axis(local, k, axis=-1, border="replicate")
    mean_u8 = jnp.clip(jnp.round(local), 0, 255)
    m = jnp.uint8(int(maxval))
    if mode == "binary":
        above = x > mean_u8 - jnp.float32(math.ceil(c))
        return jnp.where(above, m, jnp.uint8(0))
    if mode == "binary_inv":
        above = x > mean_u8 - jnp.float32(math.floor(c))
        return jnp.where(above, jnp.uint8(0), m)
    raise ValueError(mode)


def in_range(src: jnp.ndarray, lower, upper) -> jnp.ndarray:
    """cv2.inRange: 255 where every channel is within [lower, upper]."""
    lo = jnp.asarray(lower, src.dtype)
    hi = jnp.asarray(upper, src.dtype)
    ok = jnp.all((src >= lo) & (src <= hi), axis=-1)
    return jnp.where(ok, jnp.uint8(255), jnp.uint8(0))


def bitwise_and_mask(src: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """cv2.bitwise_and(src, src, mask=mask)."""
    return jnp.where((mask > 0)[..., None], src, jnp.zeros((), src.dtype))
