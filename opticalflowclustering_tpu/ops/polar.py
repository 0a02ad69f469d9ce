"""cv2.cartToPolar / cv2.normalize equivalents.

The reference renders optical flow to HSV via
`cv2.cartToPolar(flow[...,0], flow[...,1])` and
`cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX)`
(`k-means-color-clustering/computeOpticalFlowModule.py:25,31`). OpenCV's
angle is computed with `fastAtan2`, a degree-domain polynomial approximation
(~0.3° accuracy) — we replicate that exact polynomial so downstream uint8 hue
values match the reference, rather than using a "more correct" atan2.
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenCV fastAtan2 polynomial coefficients (degrees domain).
_ATAN2_P1 = 0.9997878412794807 * (180.0 / 3.141592653589793)
_ATAN2_P3 = -0.3258083974640975 * (180.0 / 3.141592653589793)
_ATAN2_P5 = 0.1555786518463281 * (180.0 / 3.141592653589793)
_ATAN2_P7 = -0.04432655554792128 * (180.0 / 3.141592653589793)
_DBL_EPSILON = 2.220446049250313e-16


def fast_atan2_deg(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """OpenCV fastAtan2: angle of (x,y) in degrees in [0, 360).

    Exact float32 replica of OpenCV's polynomial approximation (the angles
    behind every flow-hue in the golden artifacts).
    """
    f32 = jnp.float32
    x = x.astype(f32)
    y = y.astype(f32)
    ax, ay = jnp.abs(x), jnp.abs(y)
    # c = min/|max| with epsilon guard, evaluated in float32 like OpenCV.
    lo = jnp.minimum(ax, ay)
    hi = jnp.maximum(ax, ay)
    c = lo / (hi + f32(_DBL_EPSILON))
    c2 = c * c
    poly = (
        ((f32(_ATAN2_P7) * c2 + f32(_ATAN2_P5)) * c2 + f32(_ATAN2_P3)) * c2
        + f32(_ATAN2_P1)
    ) * c
    a = jnp.where(ax >= ay, poly, f32(90.0) - poly)
    a = jnp.where(x < 0, f32(180.0) - a, a)
    a = jnp.where(y < 0, f32(360.0) - a, a)
    return a


def magnitude(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """cv2.magnitude: sqrt(x² + y²) in float32."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    return jnp.sqrt(x * x + y * y)


def cart_to_polar(
    x: jnp.ndarray, y: jnp.ndarray, angle_in_degrees: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cv2.cartToPolar: (magnitude, angle). Angle uses OpenCV's fastAtan2;
    radians mode multiplies the degree result by π/180 exactly as OpenCV does.
    """
    mag = magnitude(x, y)
    ang = fast_atan2_deg(y, x)
    if not angle_in_degrees:
        ang = ang * jnp.float32(3.141592653589793 / 180.0)
    return mag, ang


def normalize_minmax(
    x: jnp.ndarray,
    alpha: float = 0.0,
    beta: float = 255.0,
    axis=None,
) -> jnp.ndarray:
    """cv2.normalize(x, None, alpha, beta, cv2.NORM_MINMAX) in float32.

    OpenCV: scale = (dmax-dmin)/(smax-smin) if the source range exceeds
    DBL_EPSILON else 0; dst = src*scale + (dmin - smin*scale). `axis` allows
    per-frame normalization when batched (axis=(-2,-1) for [N,H,W]) — the
    reference normalizes each frame's magnitude independently
    (`computeOpticalFlowModule.py:31`).
    """
    x = x.astype(jnp.float32)
    smin = jnp.min(x, axis=axis, keepdims=axis is not None)
    smax = jnp.max(x, axis=axis, keepdims=axis is not None)
    return normalize_minmax_given_range(x, smin, smax, alpha, beta)


def normalize_minmax_given_range(
    x: jnp.ndarray,
    smin: jnp.ndarray,
    smax: jnp.ndarray,
    alpha: float = 0.0,
    beta: float = 255.0,
) -> jnp.ndarray:
    """The scale/shift chain of `normalize_minmax` with an externally
    supplied source range (smin/smax broadcastable to x). The row-sharded
    pipeline (parallel/spatial.py) computes the frame's global min/max with
    pmin/pmax collectives — exactly associative, so bitwise equal to the
    unsharded reduction — then applies THIS one shared chain shard-locally;
    sharing the implementation (not a copy) is what keeps its rendered
    bytes bit-for-bit equal to the unsharded path's."""
    f32 = jnp.float32
    x = x.astype(f32)
    dmin, dmax = f32(min(alpha, beta)), f32(max(alpha, beta))
    delta = smax - smin
    scale = jnp.where(delta > f32(_DBL_EPSILON), (dmax - dmin) / delta, f32(0.0))
    shift = dmin - smin * scale
    return x * scale + shift
