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
from opticalflowclustering_tpu.ops.polar import cart_to_polar, normalize_minmax


def render_flow_hsv(flow: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 2] float flow → [..., H, W, 3] uint8 HSV image."""
    mag, ang = cart_to_polar(flow[..., 0], flow[..., 1])
    # hue = angle_rad * 180/π / 2, C-cast to uint8 (truncation toward zero).
    hue = (ang * jnp.float32(180.0 / 3.141592653589793 / 2.0)).astype(jnp.uint8)
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
    equal to the unsharded reduction — and must then apply the SAME op
    chain normalize_minmax applies (scale/shift multiply-add order
    preserved) for the rendered bytes to match bit-for-bit."""
    from opticalflowclustering_tpu.ops.polar import _DBL_EPSILON

    f32 = jnp.float32
    mag, ang = cart_to_polar(flow[..., 0], flow[..., 1])
    hue = (ang * jnp.float32(180.0 / 3.141592653589793 / 2.0)).astype(jnp.uint8)
    delta = smax - smin
    scale = jnp.where(
        delta > f32(_DBL_EPSILON), (f32(255.0) - f32(0.0)) / delta, f32(0.0)
    )
    shift = f32(0.0) - smin * scale
    val = (mag * scale + shift).astype(jnp.uint8)
    sat = jnp.full_like(hue, 255)
    return hsv2bgr(jnp.stack([hue, sat, val], axis=-1))
