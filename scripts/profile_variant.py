"""Differential profiler: run one pipeline variant per process (the dev
tunnel reloads executables when programs alternate, so stage timings are
only honest process-isolated) and print its steady-state ms.

  python scripts/profile_variant.py <variant> [chunk]

Variants: full | flow | flow_nowarp | poly | render_grid | warp_only
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from opticalflowclustering_tpu.flow.farneback import (
    FarnebackParams,
    farneback_flow,
    poly_expansion,
    update_matrices,
    _update_flow,
)
from opticalflowclustering_tpu.pipeline.bounce import PipelineConfig, chunk_step

H, W = 720, 1280


def main():
    variant = sys.argv[1]
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = PipelineConfig(chunk=chunk, emit_flow_bgr=False)

    def frames_fn(seed):
        return jax.random.randint(
            jax.random.PRNGKey(seed), (chunk + 1, H, W, 3), 0, 256, jnp.int32
        ).astype(jnp.uint8)

    def gray_fn(seed):
        return jax.random.randint(
            jax.random.PRNGKey(seed), (chunk, 2, H, W), 0, 256, jnp.int32
        ).astype(jnp.float32)

    if variant == "full":
        def prog(seed):
            return chunk_step(frames_fn(seed), cfg)["mean_magnitude"]
    elif variant == "flow":
        def prog(seed):
            g = gray_fn(seed)
            flow = jax.vmap(lambda p, n: farneback_flow(p, n))(g[:, 0], g[:, 1])
            return jnp.mean(flow, axis=(1, 2, 3))
    elif variant == "flow_nowarp":
        params = FarnebackParams()

        def one(prev, nxt):
            # full pyramid but skip the warp: M built from zero flow each
            # iteration (isolates the gather cost)
            from opticalflowclustering_tpu.flow.farneback import (
                pyramid_plan, _cvround)
            from opticalflowclustering_tpu.ops.filters import gaussian_blur
            from opticalflowclustering_tpu.ops.resize import resize_linear

            plan = pyramid_plan(H, W, params)
            pf, nf = prev.astype(jnp.float32), nxt.astype(jnp.float32)
            flow = None
            for k, h_k, w_k, sigma in plan:
                smooth_sz = max(_cvround(sigma * 5) | 1, 3)
                imgs = [
                    resize_linear(
                        gaussian_blur(im, smooth_sz, sigma), (h_k, w_k)
                    )
                    for im in (pf, nf)
                ]
                r0 = poly_expansion(imgs[0], 5, 1.2)
                r1 = poly_expansion(imgs[1], 5, 1.2)
                zero = jnp.zeros((h_k, w_k, 2), jnp.float32)
                # cheap "warp": elementwise average instead of gather
                r4 = (r0[..., 2] + r1[..., 2]) * 0.5
                r5 = (r0[..., 3] + r1[..., 3]) * 0.5
                r6 = (r0[..., 4] + r1[..., 4]) * 0.25
                r2 = (r0[..., 0] - r1[..., 0]) * 0.5
                r3 = (r0[..., 1] - r1[..., 1]) * 0.5
                m = jnp.stack([r4 * r4 + r6 * r6, (r4 + r5) * r6,
                               r5 * r5 + r6 * r6, r4 * r2 + r6 * r3,
                               r6 * r2 + r5 * r3], axis=-1)
                for i in range(params.iterations):
                    flow = _update_flow(m, params.winsize, False)
                del zero
            return flow

        def prog(seed):
            g = gray_fn(seed)
            flow = jax.vmap(one)(g[:, 0], g[:, 1])
            return jnp.mean(flow, axis=(1, 2, 3))
    elif variant == "poly":
        def prog(seed):
            g = gray_fn(seed)
            r = jax.vmap(lambda a: poly_expansion(a, 5, 1.2))(
                g.reshape(chunk * 2, H, W)
            )
            return jnp.mean(r, axis=(1, 2, 3))
    elif variant == "warp_only":
        def prog(seed):
            g = gray_fn(seed)
            r = jax.vmap(lambda a: poly_expansion(a, 5, 1.2))(g[:, 0])
            flow = jax.random.normal(jax.random.PRNGKey(seed),
                                     (chunk, H, W, 2)) * 2.0
            m = jax.vmap(update_matrices)(r, r, flow)
            return jnp.mean(m, axis=(1, 2, 3))
    elif variant == "render_grid":
        from opticalflowclustering_tpu.pipeline.bounce import grid_cluster_stage

        def prog(seed):
            flow_bgr = jax.random.randint(
                jax.random.PRNGKey(seed), (chunk, H, W, 3), 0, 256, jnp.int32
            ).astype(jnp.uint8)
            _, hue, rgb = grid_cluster_stage(flow_bgr, cfg.grid, cfg.rb_swap)
            return jnp.mean(hue.astype(jnp.float32), axis=1)
    else:
        raise SystemExit(f"unknown variant {variant}")

    jprog = jax.jit(prog)
    out = jprog(0)
    _ = np.asarray(out)
    times = []
    for i in range(1, 4):
        t = time.perf_counter()
        _ = np.asarray(jprog(i))
        times.append(time.perf_counter() - t)
    print(f"{variant} chunk={chunk}: {min(times) * 1000:.0f} ms "
          f"({min(times) / chunk * 1000:.1f} ms/pair)")


if __name__ == "__main__":
    main()
