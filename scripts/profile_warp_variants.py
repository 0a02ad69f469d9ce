"""Measure alternative XLA formulations of the bilinear flow warp.

  python scripts/profile_warp_variants.py <variant>

Variants:
  baseline   — 4 advanced-indexing corner gathers (current update_matrices)
  flat       — flattened [H*W] linear-index takes
  slicegather— one lax.gather with (2,2,5) slice windows
  rowpair    — gather [2-row, W, 5] slices by y, then horizontal corners
  select16   — static ±16 select-warp (shifted adds, no gather)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

H, W, C, B = 720, 1280, 5, 16


def corners_baseline(r1, y1c, x1c):
    p00 = r1[y1c, x1c]
    p01 = r1[y1c, x1c + 1]
    p10 = r1[y1c + 1, x1c]
    p11 = r1[y1c + 1, x1c + 1]
    return p00, p01, p10, p11


def corners_flat(r1, y1c, x1c):
    rf = r1.reshape(H * W, C)
    base = (y1c * W + x1c).reshape(-1)
    p00 = jnp.take(rf, base, axis=0)
    p01 = jnp.take(rf, base + 1, axis=0)
    p10 = jnp.take(rf, base + W, axis=0)
    p11 = jnp.take(rf, base + W + 1, axis=0)
    shp = (H, W, C)
    return (p00.reshape(shp), p01.reshape(shp), p10.reshape(shp),
            p11.reshape(shp))


def corners_slicegather(r1, y1c, x1c):
    idx = jnp.stack([y1c.reshape(-1), x1c.reshape(-1)], axis=-1)  # [HW, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    out = jax.lax.gather(
        r1, idx, dnums, slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [HW, 2, 2, C]
    out = out.reshape(H, W, 2, 2, C)
    return out[:, :, 0, 0], out[:, :, 0, 1], out[:, :, 1, 0], out[:, :, 1, 1]


def corners_rowpair(r1, y1c, x1c):
    # gather row pairs by y (per output ROW uses many y's... still per-pixel)
    # approximation of cost: gather (2, W, C) slices indexed by y1c[:, 0]
    # is only valid when y1c is constant per row — measure cost shape only.
    idx = y1c.reshape(-1, 1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0,),
    )
    rows = jax.lax.gather(
        r1, idx[: H, :], dnums, slice_sizes=(2, W, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [H, 2, W, C] — row-granular
    r0 = rows[:, 0]
    r1b = rows[:, 1]
    p00 = jnp.take_along_axis(r0, x1c[..., None], axis=1)
    p01 = jnp.take_along_axis(r0, jnp.minimum(x1c + 1, W - 1)[..., None], axis=1)
    p10 = jnp.take_along_axis(r1b, x1c[..., None], axis=1)
    p11 = jnp.take_along_axis(r1b, jnp.minimum(x1c + 1, W - 1)[..., None], axis=1)
    return p00, p01, p10, p11


def warp_with(corner_fn, r1, flow):
    dx = flow[..., 0]
    dy = flow[..., 1]
    gx = jnp.arange(W, dtype=jnp.float32)[None, :] + dx
    gy = jnp.arange(H, dtype=jnp.float32)[:, None] + dy
    x1 = jnp.floor(gx)
    y1 = jnp.floor(gy)
    fx = (gx - x1)[..., None]
    fy = (gy - y1)[..., None]
    x1c = jnp.clip(x1.astype(jnp.int32), 0, W - 2)
    y1c = jnp.clip(y1.astype(jnp.int32), 0, H - 2)
    p00, p01, p10, p11 = corner_fn(r1, y1c, x1c)
    return (p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
            + p10 * (1 - fx) * fy + p11 * fx * fy)


def corners_pack20(r1, y1c, x1c):
    # all 4 corners contiguous per index: one take of [HW, 20]
    right = jnp.concatenate([r1[:, 1:], r1[:, -1:]], axis=1)
    down = jnp.concatenate([r1[1:], r1[-1:]], axis=0)
    downright = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    packed = jnp.concatenate([r1, right, down, downright], axis=-1)  # [H,W,20]
    pf = packed.reshape(H * W, 4 * C)
    base = (y1c * W + x1c).reshape(-1)
    g = jnp.take(pf, base, axis=0).reshape(H, W, 4, C)
    return g[:, :, 0], g[:, :, 1], g[:, :, 2], g[:, :, 3]


def corners_pack10(r1, y1c, x1c):
    # two corners (x, x+1) contiguous: two takes of [HW, 10]
    right = jnp.concatenate([r1[:, 1:], r1[:, -1:]], axis=1)
    packed = jnp.concatenate([r1, right], axis=-1).reshape(H * W, 2 * C)
    base = (y1c * W + x1c).reshape(-1)
    g0 = jnp.take(packed, base, axis=0).reshape(H, W, 2, C)
    g1 = jnp.take(packed, base + W, axis=0).reshape(H, W, 2, C)
    return g0[:, :, 0], g0[:, :, 1], g1[:, :, 0], g1[:, :, 1]


def warp_select16(r1, flow, radius=16):
    dx = flow[..., 0]
    dy = flow[..., 1]
    x1 = jnp.floor(dx)
    y1 = jnp.floor(dy)
    fx = (dx - x1)[..., None]
    fy = (dy - y1)[..., None]
    oy = jnp.clip(y1.astype(jnp.int32), -radius, radius - 1)
    ox = jnp.clip(x1.astype(jnp.int32), -radius, radius - 1)
    pad = radius + 1
    rp = jnp.pad(r1, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    # vertical select of row y+oy and y+oy+1 at SAME column
    a0 = jnp.zeros_like(r1)
    a1 = jnp.zeros_like(r1)
    for o in range(-radius, radius):
        sel = (oy == o)[..., None]
        a0 = jnp.where(sel, rp[pad + o : pad + o + H, pad:pad + W], a0)
        a1 = jnp.where(sel, rp[pad + o + 1 : pad + o + 1 + H, pad:pad + W], a1)
    av = a0 * (1 - fy) + a1 * fy
    # NOTE: horizontal pass must shift av columns; av already row-warped so
    # this composition is exact for the bilinear product structure.
    avp = jnp.pad(av, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    b0 = jnp.zeros_like(r1)
    b1 = jnp.zeros_like(r1)
    for o in range(-radius, radius):
        sel = (ox == o)[..., None]
        b0 = jnp.where(sel, avp[:, pad + o : pad + o + W], b0)
        b1 = jnp.where(sel, avp[:, pad + o + 1 : pad + o + 1 + W], b1)
    return b0 * (1 - fx) + b1 * fx


def main():
    variant = sys.argv[1]
    rng = np.random.default_rng(0)
    r1 = jnp.asarray(rng.normal(0, 10, (H, W, C)).astype(np.float32))

    if variant == "select16":
        fn = lambda r, f: warp_select16(r, f)
    else:
        cf = {
            "baseline": corners_baseline,
            "flat": corners_flat,
            "slicegather": corners_slicegather,
            "rowpair": corners_rowpair,
            "pack20": corners_pack20,
            "pack10": corners_pack10,
        }[variant]
        fn = lambda r, f: warp_with(cf, r, f)

    @jax.jit
    def prog(seed):
        flows = jax.random.normal(jax.random.PRNGKey(seed), (B, H, W, 2)) * 3.0
        out = jax.vmap(lambda f: fn(r1, f))(flows)
        return jnp.mean(out, axis=(1, 2, 3))

    _ = np.asarray(prog(0))
    times = []
    for i in range(1, 4):
        t = time.perf_counter()
        _ = np.asarray(prog(i))
        times.append(time.perf_counter() - t)
    print(f"warp[{variant}] x{B}: {min(times) * 1000:.0f} ms "
          f"({min(times) / B * 1000:.1f} ms/warp)")


if __name__ == "__main__":
    main()
