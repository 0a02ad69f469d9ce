"""Tests for ops.polar vs cv2.cartToPolar / cv2.normalize."""

import cv2
import numpy as np

from opticalflowclustering_tpu.ops import (
    cart_to_polar,
    fast_atan2_deg,
    normalize_minmax,
)

RNG = np.random.default_rng(1)


def test_cart_to_polar_matches_cv2():
    x = RNG.normal(0, 3, size=(240, 320)).astype(np.float32)
    y = RNG.normal(0, 3, size=(240, 320)).astype(np.float32)
    mag_cv, ang_cv = cv2.cartToPolar(x, y)
    mag, ang = cart_to_polar(x, y)
    np.testing.assert_allclose(np.asarray(mag), mag_cv, rtol=1e-6, atol=1e-6)
    # fastAtan2 replicated bit-for-bit modulo float32 evaluation order.
    np.testing.assert_allclose(np.asarray(ang), ang_cv, rtol=1e-5, atol=2e-5)


def test_fast_atan2_degrees_mode():
    x = RNG.normal(size=(64, 64)).astype(np.float32)
    y = RNG.normal(size=(64, 64)).astype(np.float32)
    _, ang_cv = cv2.cartToPolar(x, y, angleInDegrees=True)
    ang = np.asarray(fast_atan2_deg(y, x))
    np.testing.assert_allclose(ang, ang_cv, rtol=1e-5, atol=1e-3)


def test_atan2_axes_and_zero():
    pts = np.array(
        [[1, 0], [0, 1], [-1, 0], [0, -1], [0, 0], [1, 1], [-1, -1]],
        dtype=np.float32,
    )
    ang = np.asarray(fast_atan2_deg(pts[:, 1], pts[:, 0]))
    _, ang_cv = cv2.cartToPolar(pts[:, 0], pts[:, 1], angleInDegrees=True)
    np.testing.assert_allclose(ang, ang_cv.ravel(), atol=1e-3)


def test_normalize_minmax_matches_cv2():
    m = np.abs(RNG.normal(0, 2, size=(120, 160))).astype(np.float32)
    want = cv2.normalize(m, None, 0, 255, cv2.NORM_MINMAX)
    got = np.asarray(normalize_minmax(m))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_normalize_minmax_constant_input():
    m = np.full((8, 8), 3.5, np.float32)
    want = cv2.normalize(m, None, 0, 255, cv2.NORM_MINMAX)
    got = np.asarray(normalize_minmax(m))
    np.testing.assert_array_equal(got, want)


def test_normalize_minmax_batched_axis():
    m = np.abs(RNG.normal(0, 2, size=(5, 60, 80))).astype(np.float32)
    got = np.asarray(normalize_minmax(m, axis=(-2, -1)))
    for i in range(5):
        want = cv2.normalize(m[i], None, 0, 255, cv2.NORM_MINMAX)
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-3)


def test_normalize_given_range_is_the_shared_chain():
    """`normalize_minmax_given_range` fed the TRUE min/max must be BITWISE
    equal to `normalize_minmax` — this is the contract that lets the
    row-sharded pipeline (parallel/spatial.py) compute the range with
    pmin/pmax collectives and apply the chain shard-locally. Includes the
    delta=0 constant-input branch."""
    import jax.numpy as jnp

    from opticalflowclustering_tpu.ops.polar import (
        normalize_minmax_given_range,
    )

    m = np.abs(RNG.normal(0, 2, size=(120, 160))).astype(np.float32)
    for x in (m, np.full((8, 8), 3.5, np.float32)):
        full = np.asarray(normalize_minmax(x))
        smin, smax = jnp.float32(x.min()), jnp.float32(x.max())
        given = np.asarray(normalize_minmax_given_range(x, smin, smax))
        np.testing.assert_array_equal(given, full)


def test_render_given_range_matches_full_path_bitwise():
    """`render_flow_hsv_bgr_given_range` fed each frame's true magnitude
    range must render the SAME BYTES as hsv2bgr(render_flow_hsv(flow)) —
    by construction (shared hue cast + normalize chain), incl. a
    constant-flow frame (delta=0 normalize branch)."""
    import jax.numpy as jnp

    from opticalflowclustering_tpu.flow.render import (
        render_flow_hsv,
        render_flow_hsv_bgr_given_range,
    )
    from opticalflowclustering_tpu.ops.colorspace import hsv2bgr

    flow = RNG.normal(0, 4, size=(3, 48, 64, 2)).astype(np.float32)
    flow[2] = 1.25  # constant flow -> zero-range magnitude
    mag = np.hypot(flow[..., 0], flow[..., 1]).astype(np.float32)
    want = np.asarray(hsv2bgr(render_flow_hsv(jnp.asarray(flow))))
    for i in range(flow.shape[0]):
        got = np.asarray(
            render_flow_hsv_bgr_given_range(
                jnp.asarray(flow[i]),
                jnp.float32(mag[i].min()),
                jnp.float32(mag[i].max()),
            )
        )
        np.testing.assert_array_equal(got, want[i])
