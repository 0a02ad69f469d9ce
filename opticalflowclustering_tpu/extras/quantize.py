"""LAB color quantization (`color-quantization/quant.py:15-26`).

The reference runs sklearn MiniBatchKMeans over LAB pixels and paints each
pixel with its cluster center. Here the clustering is the batched on-device
Lloyd kernel (a minibatch subsample feeds the updates, like MiniBatchKMeans)
and the repaint is a gather of rounded centers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opticalflowclustering_tpu.cluster.kmeans import kmeans
from opticalflowclustering_tpu.ops.lab import bgr2lab, lab2bgr


def quantize_colors(
    image_bgr: jnp.ndarray,
    n_clusters: int,
    key: jax.Array | None = None,
    sample: int = 4096,
) -> jnp.ndarray:
    """[H,W,3] uint8 → quantized [H,W,3] uint8 (n_clusters LAB colors)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    h, w = image_bgr.shape[-3], image_bgr.shape[-2]
    lab = bgr2lab(image_bgr).reshape(-1, 3).astype(jnp.float32)
    k1, k2 = jax.random.split(key)
    n = lab.shape[0]
    idx = jax.random.choice(k1, n, shape=(min(sample, n),), replace=False)
    centers, _ = kmeans(lab[idx], n_clusters, k2)
    # assign every pixel to its nearest center, paint with rounded center
    d2 = (
        jnp.sum(lab * lab, -1, keepdims=True)
        - 2 * lab @ centers.T
        + jnp.sum(centers * centers, -1)
    )
    labels = jnp.argmin(d2, axis=-1)
    quant = jnp.clip(jnp.round(centers), 0, 255).astype(jnp.uint8)[labels]
    return lab2bgr(quant.reshape(h, w, 3))
