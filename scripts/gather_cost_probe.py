"""Microbenchmark: what does one intra-vreg lane gather (take_along_axis on
[..., 128]) cost relative to a same-shape jnp.where / multiply, inside a
Pallas kernel? Times a serialized fori_loop at two trip counts and uses the
difference, cancelling the tunnel's ~3.5 ms dispatch floor.

Informs whether skipping dead lane-blocks in the warp kernel's candidate
loop (saving takes at the price of more branches) can pay.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)

ROWS, LANES = 80, 128
N_LO, N_HI = 2000, 34000


def make(op, n):
    def kernel(x_ref, idx_ref, o_ref):
        x0 = x_ref[...]
        idx = idx_ref[...]

        def body(i, acc):
            x = x0 + i.astype(jnp.float32)
            if op == "take":
                g = jnp.take_along_axis(x, idx, axis=-1)
            elif op == "where":
                g = jnp.where(idx > 64, x, acc)
            else:  # mul
                g = x * jnp.float32(1.0001)
            return acc + g

        o_ref[...] = jax.lax.fori_loop(0, n, body, jnp.zeros_like(x0))

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    return run


def timed(fn, x, idx):
    np.asarray(fn(x, idx))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(fn(x, idx))
        ts.append(time.perf_counter() - t0)
    return min(ts)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((ROWS, LANES)), jnp.float32)
idx = jnp.asarray(rng.integers(0, LANES, (ROWS, LANES)), jnp.int32)
for op in ("mul", "where", "take"):
    hi = timed(make(op, N_HI), x, idx)
    lo = timed(make(op, N_LO), x, idx)
    per = (hi - lo) / (N_HI - N_LO)
    print(
        f"{op}: {per * 1e9:.1f} ns per op on [80,128] "
        f"(= {per * 1e9 * 940 / 1e3 / 10:.2f} cycles/vreg @940MHz, 10 vregs)"
    )
