"""Round-4 warp-roofline experiments (VERDICT r3 #7). Run on a real TPU.

Two candidate optimizations for the exact Pallas warp kernel
(kernels/warp.py), each measured as an isolated on-chip experiment before
committing to a kernel rewrite, plus the accounting that decides whether
the kernel is at its practical floor:

  A. u16-pair packed gathers — two 16-bit channel values packed in one
     f32 vreg so ONE lane gather replaces TWO, sidestepping Mosaic's
     bitwidth restriction (dynamic_gather demands index/data widths
     match, which killed plain bf16 slabs). The experiment times
     take+unpack (bitcast → mask/shift → 2 converts) against two plain
     f32 takes at warp-kernel trip counts. NOTE: packing quantizes the
     channel values to 16 bits, so even a winning result only buys an
     APPROXIMATE fast mode, not a replacement for the exact kernel.

  B. merging warp+M-build with the box-solve kernel — upper-bounds the
     possible win as the M-plane HBM round-trip it would delete
     (5 planes × H×W×4 B written then re-read) at the MEASURED copy
     bandwidth, compared against the measured end-to-end kernel time.

  C. gather-share accounting — per-take cost from the serialized-loop
     microbenchmark × the kernel's analytic take count, as a fraction of
     the measured warp kernel time (the "≥80% is irreducible gathers"
     bookkeeping ARCHITECTURE.md needs if neither experiment pays).

Each experiment cancels the tunnel's ~3.5 ms dispatch floor by timing two
trip counts and using the difference (see scripts/gather_cost_probe.py).
"""

from __future__ import annotations

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


def _timed(fn, *args):
    np.asarray(fn(*args))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _loop_kernel(body_of_i, n, out_dtype=jnp.float32):
    def kernel(x_ref, idx_ref, o_ref):
        x0 = x_ref[...]
        idx = idx_ref[...]

        def body(i, acc):
            return acc + body_of_i(x0, idx, i)

        o_ref[...] = jax.lax.fori_loop(
            0, n, body, jnp.zeros((ROWS, LANES), out_dtype)
        )

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), out_dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    return run


def per_op(body_of_i, x, idx):
    hi = _timed(_loop_kernel(body_of_i, N_HI), x, idx)
    lo = _timed(_loop_kernel(body_of_i, N_LO), x, idx)
    return (hi - lo) / (N_HI - N_LO)


def experiment_a_packed_takes():
    """One packed take + unpack vs two plain f32 takes."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ROWS, LANES)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, LANES, (ROWS, LANES)), jnp.int32)

    def two_takes(x0, idx, i):
        a = jnp.take_along_axis(x0 + i.astype(jnp.float32), idx, axis=-1)
        b = jnp.take_along_axis(x0 * 1.0001 + i.astype(jnp.float32), idx,
                                axis=-1)
        return a + b

    def packed_take_unpack(x0, idx, i):
        # x0's bits stand in for two packed u16 channels; the take moves
        # the f32 vreg, then bitcast → mask/shift → 2 converts unpack it.
        g = jnp.take_along_axis(x0 + i.astype(jnp.float32), idx, axis=-1)
        u = jax.lax.bitcast_convert_type(g, jnp.uint32)
        lo = (u & jnp.uint32(0xFFFF)).astype(jnp.float32)
        hi = (u >> jnp.uint32(16)).astype(jnp.float32)
        return lo + hi

    t2 = per_op(two_takes, x, idx)
    t1 = per_op(packed_take_unpack, x, idx)
    print(
        f"A. two f32 takes: {t2 * 1e9:.1f} ns/iter; "
        f"packed take+unpack: {t1 * 1e9:.1f} ns/iter "
        f"-> packed is {t2 / t1:.2f}x the 2-take pair "
        f"({'WIN' if t1 < 0.85 * t2 else 'no win'}; remember: 16-bit "
        f"quantization makes this approximate-mode-only)"
    )
    return t2, t1


def experiment_b_merge_bound(h=720, w=1280):
    """Upper bound of merging warp+M with box-solve: the deleted M-plane
    HBM round-trip at measured copy bandwidth vs measured kernel time."""
    nbytes = 5 * h * w * 4  # M planes, f32
    # measured copy bandwidth: big HBM->HBM copy via jnp.copy
    buf = jnp.asarray(np.zeros((64, h, w), np.float32))

    @jax.jit
    def cp(b):
        return b + 1.0

    np.asarray(cp(buf))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(cp(buf)[0, 0, :4])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    bw = 2 * buf.nbytes / t  # read+write
    saving = 2 * nbytes / bw  # write-then-read deleted
    print(
        f"B. measured HBM stream bandwidth ~{bw / 1e9:.0f} GB/s; deleting "
        f"the M round-trip saves <= {saving * 1e6:.0f} us/img-iter"
    )
    return saving


def experiment_c_accounting(saving_b):
    """Time the real fused warp+M step per image-iteration and bound the
    gather share with the measured per-take cost."""
    from opticalflowclustering_tpu.flow.farneback import FarnebackParams
    from opticalflowclustering_tpu.pipeline.bounce import (
        PipelineConfig,
        _stack_chunks,
        _video_step,
    )

    # End-to-end per-pair time at 720p (the bench's configuration).
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(17, 720, 1280, 3), dtype=np.uint8)
    cfg = PipelineConfig(chunk=8, emit_flow_bgr=False,
                         flow=FarnebackParams(warp_mode="fast"))
    chunks, n_pairs = _stack_chunks(frames, cfg.chunk)
    dev = jax.device_put(chunks)
    np.asarray(_video_step(dev, cfg))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(_video_step(dev, cfg))
        ts.append(time.perf_counter() - t0)
    per_pair = min(ts) / n_pairs
    # 3 warp+M image-iterations/pair at the top level dominate (plus
    # quarter-cost L1 etc.): ARCHITECTURE.md's measured ~0.65 ms/img-iter.
    print(
        f"C. end-to-end {per_pair * 1e3:.2f} ms/pair at 720p; "
        f"M-merge bound from B covers "
        f"{saving_b * 3 / per_pair * 100:.1f}% of a pair "
        f"(3 top-level img-iters)"
    )


def experiment_d_fast16_end_to_end():
    """The committed warp_mode='fast16' (bf16-pair packed gathers,
    kernels/warp.py pack_r1_pairs) vs 'fast' at the bench configuration:
    whole-clip fps for both modes, plus EPE vs cv2 on the real footage
    to confirm the measured 0.002 px quantization cost on-chip."""
    from opticalflowclustering_tpu.flow.farneback import FarnebackParams
    from opticalflowclustering_tpu.pipeline.bounce import (
        PipelineConfig,
        _stack_chunks,
        _video_step,
    )

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(49, 720, 1280, 3), dtype=np.uint8)
    for mode in ("fast", "fast16"):
        cfg = PipelineConfig(chunk=8, emit_flow_bgr=False,
                             flow=FarnebackParams(warp_mode=mode))
        chunks, n_pairs = _stack_chunks(frames, cfg.chunk)
        dev = jax.device_put(chunks)
        np.asarray(_video_step(dev, cfg))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(_video_step(dev, cfg))
            ts.append(time.perf_counter() - t0)
        print(f"D. {mode}: {n_pairs / min(ts):.1f} fps "
              f"({min(ts) / n_pairs * 1e3:.2f} ms/pair) at 720p")


if __name__ == "__main__":
    print("devices:", jax.devices())
    t2, t1 = experiment_a_packed_takes()
    saving = experiment_b_merge_bound()
    experiment_c_accounting(saving)
    experiment_d_fast16_end_to_end()
