"""Histogram demo workloads (`ColorHistograms/`, `GrayHistograms.py`,
`2D-ColorHistograms.py`): thin batched wrappers over ops.histogram that
return the arrays the reference plots."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from opticalflowclustering_tpu.ops.colorspace import bgr2gray
from opticalflowclustering_tpu.ops.histogram import calc_hist


def gray_histogram(image_bgr, bins: int = 256) -> np.ndarray:
    """`GrayHistograms.py:12-14`."""
    gray = bgr2gray(jnp.asarray(image_bgr))
    return np.asarray(calc_hist(gray[..., None], [0], [bins], [(0, 256)]))


def channel_histograms(image_bgr, bins: int = 256) -> list[np.ndarray]:
    """`ColorHistograms.py:30-36`: per-channel 256-bin histograms (B, G, R)."""
    img = jnp.asarray(image_bgr)
    return [
        np.asarray(calc_hist(img, [c], [bins], [(0, 256)])) for c in range(3)
    ]


def joint_histograms_2d(image_bgr, bins: int = 32) -> dict[str, np.ndarray]:
    """`2D-ColorHistograms.py:17-35`: G-B, G-R, B-R joint histograms."""
    img = jnp.asarray(image_bgr)
    pairs = {"gb": (1, 0), "gr": (1, 2), "br": (0, 2)}
    return {
        k: np.asarray(
            calc_hist(img, list(v), [bins, bins], [(0, 256), (0, 256)])
        )
        for k, v in pairs.items()
    }


def flattened_3d_histogram(image_bgr, bins: int = 8) -> np.ndarray:
    """`ColorHistograms.py` 3-D variant: [bins³] flattened feature."""
    img = jnp.asarray(image_bgr)
    return np.asarray(
        calc_hist(img, [0, 1, 2], [bins] * 3, [(0, 256)] * 3)
    ).ravel()
