"""Fused multi-chip training step: pipeline features + classifier update.

One shard_map program over a ('dp', 'sp') mesh:
  dp — shards the video batch
  sp — shards each video's frame axis (1-frame halo via ppermute, see
       temporal.py)

Each chip: decode-side frames → gray → Farneback flow → HSV render → grid
cells → dominant hue rows → classifier forward/backward. Gradients pmean
over both axes, so every chip applies the identical optimizer update —
standard data-parallel semantics with the feature extractor fused in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from opticalflowclustering_tpu.features.dominant_color import (
    dominant_hue_k1_frames,
)
from opticalflowclustering_tpu.features.grid import (
    GridParams,
)
from opticalflowclustering_tpu.flow.farneback import FarnebackParams, farneback_flow
from opticalflowclustering_tpu.flow.render import render_flow_hsv_bgr
from opticalflowclustering_tpu.ops.colorspace import bgr2gray


def _local_hue_features(
    videos_local: jnp.ndarray,
    grid: GridParams,
    params: FarnebackParams,
    sp_axis: str,
) -> jnp.ndarray:
    """[b_loc, n_loc, H, W, 3]u8 → [b_loc, n_loc, cells] hue rows, with the
    per-video frame halo exchanged over the sp axis."""
    gray = bgr2gray(videos_local)  # [b, n, H, W]
    n_dev = jax.lax.axis_size(sp_axis)
    first = gray[:, :1]
    perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    recv = jax.lax.ppermute(first, sp_axis, perm)
    gray_ext = jnp.concatenate([gray, recv], axis=1)
    prev, nxt = gray_ext[:, :-1], gray_ext[:, 1:]

    flow = farneback_flow(prev, nxt, params)
    flow_bgr = render_flow_hsv_bgr(flow)
    _, hue = dominant_hue_k1_frames(flow_bgr, grid)
    return hue.astype(jnp.float32)


def make_fused_train_step(
    mesh: Mesh,
    model,
    tx,
    grid: GridParams = GridParams(4, 6),
    flow_params: FarnebackParams = FarnebackParams(),
    dp_axis: str = "dp",
    sp_axis: str = "sp",
):
    """Build the sharded end-to-end train step:
    (params, opt_state, videos [B,N,H,W,3]u8, labels [B,N]) →
    (params, opt_state, loss). videos/labels sharded (dp, sp); params and
    optimizer state replicated."""

    def step_local(params, opt_state, videos_local, labels_local):
        feats = _local_hue_features(videos_local, grid, flow_params, sp_axis)
        b, n, d = feats.shape
        x = feats.reshape(b * n, d)
        y = labels_local.astype(jnp.float32).reshape(b * n)

        def loss_fn(p):
            logits = model.apply(p, x)
            import optax

            return optax.sigmoid_binary_cross_entropy(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(jax.lax.pmean(grads, dp_axis), sp_axis)
        loss = jax.lax.pmean(jax.lax.pmean(loss, dp_axis), sp_axis)
        import optax

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        step_local,
        mesh=mesh,
        in_specs=(P(), P(), P(dp_axis, sp_axis), P(dp_axis, sp_axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
