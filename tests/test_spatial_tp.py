"""Spatial tensor parallelism (parallel/spatial.py): a >HD frame's row axis
sharded over an 8-shard mesh must reproduce the unsharded exact-mode
Farneback flow bitwise (VERDICT round-1 item 5)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from opticalflowclustering_tpu.flow.farneback import (
    FarnebackParams,
    farneback_flow,
)
from opticalflowclustering_tpu.parallel.spatial import spatial_farneback_flow

pytestmark = pytest.mark.slow


def _smooth(a: np.ndarray, r: int = 8) -> np.ndarray:
    k = 2 * r + 1
    c = np.cumsum(np.pad(a, ((r + 1, r), (0, 0)), mode="edge"), axis=0)
    a = (c[k:] - c[:-k]) / k
    c = np.cumsum(np.pad(a, ((0, 0), (r + 1, r)), mode="edge"), axis=1)
    return (c[:, k:] - c[:, :-k]) / k


def _moving_pair(h: int, w: int, dy: int, dx: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    pad = 32
    base = rng.uniform(0, 255, size=(h + 2 * pad, w + 2 * pad)).astype(
        np.float32
    )
    base = _smooth(_smooth(base))
    base = (base - base.min()) / (np.ptp(base) + 1e-9) * 255.0
    prev = base[pad : pad + h, pad : pad + w].astype(np.uint8)
    nxt = base[pad + dy : pad + dy + h, pad + dx : pad + dx + w].astype(
        np.uint8
    )
    return prev, nxt


def test_spatial_tp_bitwise_1536rows():
    """1536-row (beyond-1440p-class) frame on an 8-shard row mesh."""
    prev, nxt = _moving_pair(1536, 128, dy=5, dx=3)
    params = FarnebackParams(warp_mode="exact")
    ref = np.asarray(farneback_flow(jnp.asarray(prev), jnp.asarray(nxt), params))
    mesh = Mesh(np.array(jax.devices()[:8]), ("tp",))
    out = np.asarray(
        spatial_farneback_flow(
            jnp.asarray(prev), jnp.asarray(nxt), mesh, "tp", params
        )
    )
    assert np.array_equal(out, ref), (
        f"max abs diff {np.abs(out - ref).max()}"
    )
    # sanity: the flow tracks the synthetic motion's direction
    assert float(np.median(ref[..., 0])) < -0.5
    assert float(np.median(ref[..., 1])) < -0.8


def test_spatial_tp_batched_and_indivisible():
    prev, nxt = _moving_pair(256, 96, dy=2, dx=1, seed=1)
    params = FarnebackParams(warp_mode="exact", levels=2)
    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    # batched leading dim
    pb = jnp.stack([jnp.asarray(prev)] * 2)
    nb = jnp.stack([jnp.asarray(nxt)] * 2)
    ref = np.asarray(farneback_flow(pb, nb, params))
    out = np.asarray(spatial_farneback_flow(pb, nb, mesh, "tp", params))
    assert np.array_equal(out, ref)
    # H not divisible by shards*2^levels -> explicit error
    with pytest.raises(ValueError):
        spatial_farneback_flow(
            jnp.zeros((100, 96)), jnp.zeros((100, 96)), mesh, "tp", params
        )
