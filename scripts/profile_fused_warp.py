"""Time the round-2 fused Pallas warp+M kernels on the real TPU chip.

  python scripts/profile_fused_warp.py [batch] [H] [W]

Per-iteration cost of the Farneback inner loop (update_matrices +
windowed solve) for each warp implementation, measured by chaining N
iterations on-device inside one jitted program and fetching ONE scalar —
the only reliable way to time through the tunnel (device→host transfer of
full tensors and enqueue-time returns would otherwise dominate).
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

from opticalflowclustering_tpu.flow.farneback import (
    FarnebackParams,
    _update_flow,
    farneback_flow,
    update_matrices,
)
from opticalflowclustering_tpu.kernels import warp as kw

N_CHAIN = 20


def timeit(name, fn, *args, reps=3, per=1):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fn(*args))
    dt = (time.perf_counter() - t0) / reps / per * 1e3
    print(f"{name:46s} {dt:9.2f} ms/iter   (compile {compile_s:.1f}s)")
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 720
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1280
    rng = np.random.default_rng(0)
    r0 = rng.normal(0, 10, (b, h, w, 5)).astype(np.float32)
    r1 = rng.normal(0, 10, (b, h, w, 5)).astype(np.float32)
    flow0 = rng.normal(0, 3, (b, h, w, 2)).astype(np.float32)
    r0, r1, flow0 = jax.device_put((r0, r1, flow0))
    print(f"batch={b} {h}x{w}  backend={jax.default_backend()}  "
          f"chain={N_CHAIN}")

    def chain(m_fn):
        def run(r0, r1, fl):
            def body(_, fl):
                return _update_flow(m_fn(r0, r1, fl), 15, False)

            return jnp.sum(jax.lax.fori_loop(0, N_CHAIN, body, fl))

        return jax.jit(run)

    def chain_fused():
        def run(r0, r1, fl):
            bufs = kw.prepare_fused_level(r0, r1)
            fx, fy = kw.pad_flow_planes(bufs, fl)

            def body(_, fxy):
                mpad = kw.fused_m_planes(bufs, fxy[0], fxy[1])
                return jnp.stack(kw.fused_solve(bufs, mpad, 15))

            fxy = jax.lax.fori_loop(0, N_CHAIN, body, jnp.stack([fx, fy]))
            return jnp.sum(fxy)

        return jax.jit(run)

    def chain_fused_m_only():
        def run(r0, r1, fl):
            bufs = kw.prepare_fused_level(r0, r1)
            fx, fy = kw.pad_flow_planes(bufs, fl)

            def body(_, fxy):
                mpad = kw.fused_m_planes(bufs, fxy[0], fxy[1])
                return fxy + jnp.sum(mpad[:, 0, 64, 128:256]) * 1e-12

            fxy = jax.lax.fori_loop(0, N_CHAIN, body, jnp.stack([fx, fy]))
            return jnp.sum(fxy)

        return jax.jit(run)

    @jax.jit
    def solve_only(r0, r1, fl):
        def body(_, fl):
            return _update_flow(
                jnp.concatenate([fl, fl, fl[..., :1]], -1), 15, False
            )

        return jnp.sum(jax.lax.fori_loop(0, N_CHAIN, body, fl))

    t_sv = timeit("xla solve only", solve_only, r0, r1, flow0, per=N_CHAIN)
    t_fm = timeit("fused pallas M only", chain_fused_m_only(), r0, r1, flow0,
                  per=N_CHAIN)
    t_f = timeit("fused pallas M + pallas solve", chain_fused(), r0, r1,
                 flow0, per=N_CHAIN)
    t_e = timeit("exact gather M + xla solve",
                 chain(lambda a, c, fl: update_matrices(a, c, fl, "exact")),
                 r0, r1, flow0, per=N_CHAIN)
    t_s = timeit("select-warp M + xla solve",
                 chain(lambda a, c, fl: update_matrices(a, c, fl, "select", 32)),
                 r0, r1, flow0, per=N_CHAIN)
    print(f"  fused M {t_fm:.2f} ms, pallas solve {t_f - t_fm:.2f} ms; "
          f"exact-M est {t_e - t_sv:.2f}, select-M est {t_s - t_sv:.2f} "
          f"(M speedup vs exact {(t_e - t_sv) / max(t_fm, 1e-9):.1f}x)")

    gray0 = jax.device_put(rng.integers(0, 256, (b, h, w)).astype(np.uint8))
    gray1 = jax.device_put(rng.integers(0, 256, (b, h, w)).astype(np.uint8))
    for mode in ("fast", "exact"):
        params = FarnebackParams(warp_mode=mode)
        fn = jax.jit(
            lambda a, c, p=params: jnp.sum(farneback_flow(a, c, p))
        )
        t = timeit(f"farneback_flow full pyramid ({mode})", fn, gray0, gray1)
        print(f"  = {t / b:.2f} ms/pair, {1000 * b / t:.1f} pairs/s")


if __name__ == "__main__":
    main()
