"""HSV flow rendering, replicating `ComputeOpticalFLow.compute`
(`k-means-color-clustering/computeOpticalFlowModule.py:24-33`):

  magnitude, angle = cartToPolar(flow_x, flow_y)        # fastAtan2 degrees→rad
  hue   = uint8(angle · 180/π / 2)                      # C-cast truncation
  sat   = 255
  value = uint8(normalize(magnitude, 0, 255, MINMAX))   # per-frame min-max
  bgr   = cvtColor(HSV2BGR)

Fully batched: the per-frame global min-max is a per-frame reduction, so a
[N, H, W, 2] flow stack renders in one fused pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from opticalflowclustering_tpu.ops.colorspace import hsv2bgr
from opticalflowclustering_tpu.ops.polar import (
    cart_to_polar,
    normalize_minmax,
    normalize_minmax_given_range,
)


def _flow_hue_u8(ang: jnp.ndarray) -> jnp.ndarray:
    """hue = angle_rad * 180/π / 2, C-cast to uint8 (truncation toward 0)."""
    return (ang * jnp.float32(180.0 / 3.141592653589793 / 2.0)).astype(
        jnp.uint8
    )


def render_flow_hsv(flow: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 2] float flow → [..., H, W, 3] uint8 HSV image."""
    mag, ang = cart_to_polar(flow[..., 0], flow[..., 1])
    hue = _flow_hue_u8(ang)
    val = normalize_minmax(mag, 0.0, 255.0, axis=(-2, -1)).astype(jnp.uint8)
    sat = jnp.full_like(hue, 255)
    return jnp.stack([hue, sat, val], axis=-1)


def render_flow_hsv_bgr(flow: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 2] float flow → [..., H, W, 3] uint8 BGR flow image,
    the exact output of `ComputeOpticalFLow.compute` for a given flow."""
    return hsv2bgr(render_flow_hsv(flow))


def render_flow_hsv_bgr_given_range(
    flow: jnp.ndarray, smin: jnp.ndarray, smax: jnp.ndarray
) -> jnp.ndarray:
    """render_flow_hsv_bgr with an externally supplied per-frame magnitude
    range (smin/smax broadcastable to [..., 1, 1]).

    The row-sharded pipeline (parallel/spatial.py spatial_hue_pipeline)
    computes the frame's global min/max with pmin/pmax collectives —
    min/max reductions are exactly associative, so the values are bitwise
    equal to the unsharded reduction — and this path shares the normalize
    chain (ops/polar.py normalize_minmax_given_range) and hue cast with
    render_flow_hsv, so the rendered bytes match bit-for-bit by
    construction, not by a hand-synchronized copy."""
    mag, ang = cart_to_polar(flow[..., 0], flow[..., 1])
    hue = _flow_hue_u8(ang)
    val = normalize_minmax_given_range(mag, smin, smax, 0.0, 255.0).astype(
        jnp.uint8
    )
    sat = jnp.full_like(hue, 255)
    return hsv2bgr(jnp.stack([hue, sat, val], axis=-1))
