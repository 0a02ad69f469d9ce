"""Batched Lloyd k-means on TPU.

The reference runs `sklearn.cluster.KMeans(n_clusters=c).fit` on every
grid cell's pixels — 350 separate native calls per frame
(`KmeanGrids.py:300-304`, `color_kmeans.py:66-78`). Here one call clusters
every cell of every frame: assignment is a [P,k] distance matmul on the MXU,
the update is a one-hot matmul, and the whole Lloyd loop is a `lax.fori_loop`
vmapped over the batch.

k=1 (the only documented configuration — `README.md:20`,
`color_kmeans_script.sh:19`) short-circuits to the exact integer mean in
features/dominant_color.py; this module provides the general-k path and the
MiniBatchKMeans-style variant used by color quantization
(`color-quantization/quant.py:18-19`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pairwise_sqdist(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """[P,D],[K,D] → [P,K] squared distances via the MXU."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(c * c, axis=-1)
    xc = jnp.dot(x, c.T, preferred_element_type=jnp.float32)
    return x2 - 2.0 * xc + c2[None, :]


def _plusplus_init(key: jax.Array, x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-means++ seeding (sklearn's init strategy, seeded PRNG)."""
    p = x.shape[0]
    first = jax.random.randint(key, (), 0, p)
    centers = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])

    def body(i, carry):
        centers, key = carry
        key, sub = jax.random.split(key)
        d2 = _pairwise_sqdist(x, centers)
        # distance to nearest chosen center; unchosen slots are zeros —
        # mask them by index.
        valid = jnp.arange(k) < i
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        dmin = jnp.min(d2, axis=-1)
        dmin = jnp.maximum(dmin, 0.0)
        probs = dmin / jnp.maximum(jnp.sum(dmin), 1e-12)
        nxt = jax.random.choice(sub, p, p=probs)
        return centers.at[i].set(x[nxt]), key

    centers, _ = jax.lax.fori_loop(1, k, body, (centers, key))
    return centers


@functools.partial(jax.jit, static_argnames=("k", "n_iter"))
def kmeans(
    points: jnp.ndarray,
    k: int,
    key: jax.Array | None = None,
    n_iter: int = 30,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd k-means over [P, D] float points → (centers [k,D], labels [P]).

    Deterministic given `key`. Empty clusters keep their previous center
    (sklearn instead relocates — general-k parity with sklearn is
    statistical, per SURVEY.md §7 'hard parts' #4).
    """
    x = points.astype(jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(0)
    centers = _plusplus_init(key, x, k)

    def step(_, centers):
        d2 = _pairwise_sqdist(x, centers)
        labels = jnp.argmin(d2, axis=-1)
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)  # [P,k]
        counts = jnp.sum(onehot, axis=0)  # [k]
        sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        return jnp.where(counts[:, None] > 0, new, centers)

    centers = jax.lax.fori_loop(0, n_iter, step, centers)
    labels = jnp.argmin(_pairwise_sqdist(x, centers), axis=-1)
    return centers, labels


@functools.partial(jax.jit, static_argnames=("k", "n_iter"))
def kmeans_batched(
    points: jnp.ndarray,
    k: int,
    key: jax.Array | None = None,
    n_iter: int = 30,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """kmeans vmapped over one leading batch axis: [B, P, D] →
    (centers [B,k,D], labels [B,P]). This is the op that replaces the
    reference's 350-KMeans-calls-per-frame loop for k>1."""
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, points.shape[0])
    return jax.vmap(lambda p, s: kmeans(p, k, s, n_iter))(points, keys)
