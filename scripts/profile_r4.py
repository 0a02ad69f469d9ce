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

Each experiment cancels the tunnel's dispatch floor (~3.5 ms in rounds
2-3, measured ~24 ms this session) by timing two trip counts / scan
lengths and using the difference (see scripts/gather_cost_probe.py).
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
# Trip counts sized so the HI-LO difference (~35 ms of loop work) clears
# the tunnel's measured dispatch floor (~24 ms this session) and its
# ~0.5 ms jitter; with the original 2k/34k counts the differencing was
# pure noise (a negative per-op time was observed).
N_LO, N_HI = 100_000, 600_000


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
        # int32 intermediate: Mosaic lowers i32->f32 but not u32->f32.
        u = jax.lax.bitcast_convert_type(g, jnp.int32)
        lo = (u & jnp.int32(0xFFFF)).astype(jnp.float32)
        hi = jax.lax.shift_right_logical(u, jnp.int32(16)).astype(jnp.float32)
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
    HBM round-trip at measured copy bandwidth vs measured kernel time.

    Bandwidth is measured as the SLOPE between two in-jit scan lengths of
    a streaming add over a 128 MB buffer, so the tunnel's ~24 ms dispatch
    floor cancels (a single-dispatch measurement reads the floor, not the
    memory system — '16 GB/s' was observed that way)."""
    nbytes = 5 * h * w * 4  # M planes, f32
    buf = jnp.asarray(np.zeros((32, h, w), np.float32))  # ~118 MB

    def scan_add(k):
        @jax.jit
        def run(b):
            def body(c, _):
                return c + 1.0, ()

            out, _ = jax.lax.scan(body, b, None, length=k)
            return out[0, 0, :4]

        return run

    K_HI, K_LO = 120, 20
    t_hi = _timed(scan_add(K_HI), buf)
    t_lo = _timed(scan_add(K_LO), buf)
    per_iter = (t_hi - t_lo) / (K_HI - K_LO)
    bw = 2 * buf.nbytes / per_iter  # read+write per scan step
    saving = 2 * nbytes / bw  # write-then-read deleted
    print(
        f"B. measured HBM stream bandwidth ~{bw / 1e9:.0f} GB/s; deleting "
        f"the M round-trip saves <= {saving * 1e6:.0f} us/img-iter"
    )
    return saving


def _bench_frames(kind, n=49):
    """smooth = the bench headline's synthetic-motion clip; noise =
    per-frame independent uniform noise (worst-case candidate ranges)."""
    import bench  # repo root already on sys.path (module import time)

    return bench.synth_frames(n) if kind == "smooth" else bench.noise_frames(n)


def experiment_d_fast16_end_to_end():
    """The committed warp_mode='fast16' (bf16-pair packed gathers,
    kernels/warp.py pack_r1_pairs) vs 'fast', on BOTH the bench headline's
    smooth-motion clip and pure-noise frames (pathological candidate
    ranges). Returns {(mode, kind): s/pair} for experiment C."""
    from opticalflowclustering_tpu.flow.farneback import FarnebackParams
    from opticalflowclustering_tpu.pipeline.bounce import (
        PipelineConfig,
        _stack_chunks,
        _video_step,
    )

    out = {}
    for kind in ("smooth", "noise"):
        frames = _bench_frames(kind)
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
            out[(mode, kind)] = min(ts) / n_pairs
            print(f"D. {mode}/{kind}: {n_pairs / min(ts):.1f} fps "
                  f"({min(ts) / n_pairs * 1e3:.2f} ms/pair) at 720p")
    return out


def experiment_c_accounting(saving_b, d_times):
    """Gather-share accounting from the fast→fast16 delta: fast16 removes
    40% of the candidate takes (5 channel planes → 3) AND 40% of the
    window-DMA bytes, so Δt/0.4 ESTIMATES the total take+DMA share of the
    pair, assuming the removed 40% costs the same per unit as the rest
    and doesn't overlap other work — an estimate, not a bound in either
    direction (ARCHITECTURE.md quotes it as '~X%'); the M-merge bound
    from B is quoted against the same pair time (3 top-level img-iters
    dominate)."""
    for kind in ("smooth", "noise"):
        per_pair = d_times[("fast", kind)]
        delta = per_pair - d_times[("fast16", kind)]
        share = delta / 0.4 / per_pair
        print(
            f"C. {kind}: {per_pair * 1e3:.2f} ms/pair; fast16 delta "
            f"{delta * 1e3:.2f} ms/pair -> candidate gathers+window DMAs "
            f"~{share * 100:.0f}% of the pair (uniform-per-take "
            f"estimate); M-merge bound from B "
            f"covers {saving_b * 3 / per_pair * 100:.1f}%"
        )


if __name__ == "__main__":
    print("devices:", jax.devices())
    t2, t1 = experiment_a_packed_takes()
    saving = experiment_b_merge_bound()
    d_times = experiment_d_fast16_end_to_end()
    experiment_c_accounting(saving, d_times)
