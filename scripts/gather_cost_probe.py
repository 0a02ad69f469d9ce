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


def probe_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ROWS, LANES)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, LANES, (ROWS, LANES)), jnp.int32)
    for op in ("mul", "where", "take"):
        hi = timed(make(op, N_HI), x, idx)
        lo = timed(make(op, N_LO), x, idx)
        per = (hi - lo) / (N_HI - N_LO)
        print(
            f"{op}: {per * 1e9:.1f} ns per op on [80,128] "
            f"(= {per * 1e9 * 940 / 1e3 / 10:.2f} cycles/vreg @940MHz, "
            f"10 vregs)"
        )


# bf16 probe: does a bf16 lane gather cost half the f32 one (5 vregs vs 10
# on [80,128])? And do 8-row dynamic sublane slices of a bf16 VMEM ref
# lower at all (bf16 tile is (16,128))?
def make_bf16_take(n):
    def kernel(x_ref, idx_ref, o_ref):
        x0 = x_ref[...]
        idx = idx_ref[...]

        def body(i, acc):
            x = x0 + i.astype(jnp.bfloat16)
            g = jnp.take_along_axis(x, idx, axis=-1)
            return acc + g.astype(jnp.float32)

        o_ref[...] = jax.lax.fori_loop(
            0, n, body, jnp.zeros((ROWS, LANES), jnp.float32)
        )

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


def probe_bf16():
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((ROWS, LANES)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, LANES, (ROWS, LANES)), jnp.int32)
    hi = timed(make_bf16_take(N_HI), xb, idx)
    lo = timed(make_bf16_take(N_LO), xb, idx)
    per = (hi - lo) / (N_HI - N_LO)
    print(f"take-bf16: {per * 1e9:.1f} ns per op on [80,128]")


def probe_bf16_dynslice():
    def kernel(x_ref, off_ref, o_ref):
        off = off_ref[0]
        o_ref[...] = x_ref[
            pl.ds(jax.lax.rem(off, 8) * 8, 24), :
        ].astype(jnp.float32)

    @jax.jit
    def run(x, off):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((24, LANES), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, off)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ROWS, LANES)), jnp.bfloat16)
    want = np.asarray(x[8:32]).astype(np.float32)
    try:
        got = np.asarray(run(x, jnp.asarray([1], jnp.int32)))
        ok = np.array_equal(got, want)
        print(f"bf16 8-row dynamic sublane slice: lowers, correct={ok}")
    except Exception as e:
        print(f"bf16 8-row dynamic sublane slice: FAILS ({type(e).__name__}: "
              f"{str(e)[:140]})")


if __name__ == "__main__":
    probe_f32()
    probe_bf16()
    probe_bf16_dynslice()
