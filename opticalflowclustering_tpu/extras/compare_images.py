"""Image comparison workload (`CompareTwoImages/compare.py:13-28`):
MSE + SSIM pair, returned instead of plotted."""

from __future__ import annotations

import jax.numpy as jnp

from opticalflowclustering_tpu.ops.ssim import mse, ssim


def compare_images(image_a, image_b) -> tuple[float, float]:
    """(mse, ssim) for two grayscale images — the metrics
    `compare_images` titles its figure with."""
    a = jnp.asarray(image_a)
    b = jnp.asarray(image_b)
    return float(mse(a, b)), float(ssim(a, b))
