"""LAB color quantization (`color-quantization/quant.py:15-26`).

The reference runs sklearn MiniBatchKMeans over LAB pixels and paints each
pixel with its cluster center. Two on-device clusterings are offered:

* ``method='minibatch'`` — the reference's actual algorithm: sklearn's
  `_mini_batch_step` semantics (counts-weighted per-center learning-rate
  updates over uniform with-replacement minibatches,
  cluster.kmeans.minibatch_kmeans), run over ALL pixels.
* ``method='lloyd'`` (default, the original behavior) — full Lloyd over a
  uniform pixel subsample; quality-equivalent and cheaper for stills.

The repaint is a gather of rounded centers either way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opticalflowclustering_tpu.cluster.kmeans import (
    _pairwise_sqdist,
    kmeans,
    minibatch_kmeans,
)
from opticalflowclustering_tpu.ops.lab import bgr2lab, lab2bgr


def quantize_colors(
    image_bgr: jnp.ndarray,
    n_clusters: int,
    key: jax.Array | None = None,
    sample: int = 4096,
    method: str = "lloyd",
) -> jnp.ndarray:
    """[H,W,3] uint8 → quantized [H,W,3] uint8 (n_clusters LAB colors).

    `sample` bounds the clustering subsample for method='lloyd' ONLY;
    method='minibatch' is sklearn's algorithm and, like it, streams
    minibatches over ALL pixels (its cost is bounded by batch_size ×
    n_steps plus one full assignment pass, not by `sample`)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    h, w = image_bgr.shape[-3], image_bgr.shape[-2]
    lab = bgr2lab(image_bgr).reshape(-1, 3).astype(jnp.float32)
    k1, k2 = jax.random.split(key)
    n = lab.shape[0]
    if method == "minibatch":
        centers, labels = minibatch_kmeans(lab, n_clusters, k2)
    elif method == "lloyd":
        idx = jax.random.choice(k1, n, shape=(min(sample, n),), replace=False)
        centers, _ = kmeans(lab[idx], n_clusters, k2)
        # assign every pixel to its nearest center
        labels = jnp.argmin(_pairwise_sqdist(lab, centers), axis=-1)
    else:
        raise ValueError(f"unknown method {method!r}")
    quant = jnp.clip(jnp.round(centers), 0, 255).astype(jnp.uint8)[labels]
    return lab2bgr(quant.reshape(h, w, 3))
