"""cv2-exact bilinear resize as MXU-friendly separable matmuls.

`cv2.resize(..., INTER_LINEAR)` drives the Farneback pyramid (each level is
resampled from the full-resolution image, OpenCV optflowgf) and the coarse→
fine flow upsampling. Instead of translating OpenCV's per-row filter loops,
each axis's interpolation is materialized as a banded [dst, src] weight
matrix built at trace time (shapes are static), so a resize is two dense
matmuls that map straight onto the TPU MXU and batch over frames/channels
for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _linear_weight_matrix(dst_size: int, src_size: int) -> np.ndarray:
    """[dst, src] bilinear weights with OpenCV's coordinate convention:
    src_x = (dst_x + 0.5) * (src/dst) - 0.5, clamped at borders exactly the
    way OpenCV clamps (sx<0 → pixel 0 with weight 1; sx≥src-1 → last pixel
    with weight 1)."""
    scale = src_size / dst_size
    fx = (np.arange(dst_size, dtype=np.float64) + 0.5) * scale - 0.5
    sx = np.floor(fx).astype(np.int64)
    fx = fx - sx
    fx[sx < 0] = 0.0
    sx[sx < 0] = 0
    fx[sx >= src_size - 1] = 0.0
    sx[sx >= src_size - 1] = src_size - 1
    w = np.zeros((dst_size, src_size), dtype=np.float32)
    w[np.arange(dst_size), sx] = (1.0 - fx).astype(np.float32)
    # fx>0 ⟹ sx+1 is in range by the clamping above.
    nz = fx > 0
    w[np.arange(dst_size)[nz], sx[nz] + 1] = fx[nz].astype(np.float32)
    return w


def resize_linear(
    img: jnp.ndarray, dst_hw: tuple[int, int]
) -> jnp.ndarray:
    """cv2.resize(img, (w, h), interpolation=INTER_LINEAR) for float inputs.

    `img`: [..., H, W] (trailing spatial dims; channels go in leading batch
    dims — use `jnp.moveaxis` for HWC data or `resize_linear_hwc`).
    """
    dst_h, dst_w = dst_hw
    src_h, src_w = img.shape[-2], img.shape[-1]
    x = img.astype(jnp.float32)
    if dst_h != src_h:
        wy = jnp.asarray(_linear_weight_matrix(dst_h, src_h))
        x = jnp.einsum(
            "hs,...sw->...hw", wy, x, precision=jax.lax.Precision.HIGHEST
        )
    if dst_w != src_w:
        wx = jnp.asarray(_linear_weight_matrix(dst_w, src_w))
        x = jnp.einsum(
            "ws,...hs->...hw", wx, x, precision=jax.lax.Precision.HIGHEST
        )
    return x


def resize_linear_hwc(img: jnp.ndarray, dst_hw: tuple[int, int]) -> jnp.ndarray:
    """resize_linear for [..., H, W, C] channel-last data."""
    x = jnp.moveaxis(img, -1, -3)
    out = resize_linear(x, dst_hw)
    return jnp.moveaxis(out, -3, -1)
