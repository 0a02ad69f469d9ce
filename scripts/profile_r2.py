"""Round-2 perf profiling on the real chip.

The dev-TPU tunnel has a ~3.5 ms dispatch floor per program call, so
per-call microbenchmarks are meaningless. Every measurement here runs the
op N times inside ONE jitted lax.scan (with a per-step input perturbation
so XLA cannot hoist the loop-invariant body), times n=N vs n=1, and
divides the difference — dispatch overhead cancels.

Usage: python scripts/profile_r2.py [section ...]
  sections: kernels stages chunks   (default: all)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _cache():
    d = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _time_call(fn, *args, reps=4):
    out = fn(*args)
    np.asarray(jnp.ravel(out)[:4])  # warm/compile; fetch = completion
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jnp.ravel(out)[:4])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def scan_time(body, init_args, n_hi=9, n_lo=1, reps=4):
    """Per-iteration seconds of `body(step_scalar, *args) -> array`,
    measured as (t(n_hi) - t(n_lo)) / (n_hi - n_lo) inside one program."""

    def repeat(n):
        @jax.jit
        def run(*args):
            def step(carry, x):
                out = body(x, *args)
                return carry + jnp.ravel(out)[:4].astype(jnp.float32), ()

            c, _ = jax.lax.scan(
                step, jnp.zeros((4,), jnp.float32),
                jnp.arange(n, dtype=jnp.float32),
            )
            return c

        return run

    hi = _time_call(repeat(n_hi), *init_args, reps=reps)
    lo = _time_call(repeat(n_lo), *init_args, reps=reps)
    return (hi - lo) / (n_hi - n_lo)


def section_kernels(batch=8):
    """True per-level fused kernel cost at 720p geometry (scan-repeat)."""
    from opticalflowclustering_tpu.flow.farneback import (
        FarnebackParams,
        poly_expansion,
        pyramid_plan,
    )
    from opticalflowclustering_tpu.kernels import warp as kw

    p = FarnebackParams(warp_mode="fast")
    rng = np.random.default_rng(0)
    print(f"== per-level fused kernels, batch={batch} (ms/img-iter) ==")
    for k, h_k, w_k, sigma in pyramid_plan(720, 1280, p):
        img0 = jnp.asarray(
            rng.standard_normal((batch, h_k, w_k)), jnp.float32
        )
        img1 = jnp.asarray(
            rng.standard_normal((batch, h_k, w_k)), jnp.float32
        )
        pe = jax.jit(
            functools.partial(poly_expansion, n=p.poly_n, sigma=p.poly_sigma)
        )
        r0 = jax.block_until_ready(pe(img0))
        r1 = jax.block_until_ready(pe(img1))
        t_pe = scan_time(lambda x, im: pe(im + x * 1e-6), (img0,))
        bufs0 = kw.prepare_fused_level(r0, r1)
        # Realistic smooth flow: box-filtered fields vary slowly, so a
        # 32-row chunk spans few vertical candidates. Sinusoid, ±3 px.
        fx = jnp.asarray(
            np.tile(
                3.0 * np.sin(np.arange(h_k)[None, :, None] / 40.0),
                (batch, 1, w_k),
            ),
            jnp.float32,
        )
        fxp, fyp = kw.pad_flow_planes(bufs0, jnp.stack([fx, fx * 0.5], -1))

        def rebuild(r0p, r1p):
            return kw.FusedLevelBuffers(
                r0p, r1p, bufs0.lead, bufs0.h, bufs0.w
            )

        def m_body(x, fxp, fyp, r0p, r1p):
            return kw.fused_m_planes(rebuild(r0p, r1p), fxp + x * 1e-6, fyp)

        t_m = scan_time(m_body, (fxp, fyp, bufs0.r0p, bufs0.r1p))
        mpad = jax.jit(
            lambda fxp, fyp, r0p, r1p: kw.fused_m_planes(
                rebuild(r0p, r1p), fxp, fyp
            )
        )(fxp, fyp, bufs0.r0p, bufs0.r1p)
        jax.block_until_ready(mpad)

        def s_body(x, mpad, r0p, r1p):
            return kw.fused_solve(
                rebuild(r0p, r1p), mpad + x * 1e-6, p.winsize
            )[0]

        t_s = scan_time(s_body, (mpad, bufs0.r0p, bufs0.r1p))
        f = 1e3 / batch
        print(
            f"level {k} ({h_k}x{w_k}): poly(x1img) {t_pe * f:.3f}  "
            f"warp+M {t_m * f:.3f}  solve {t_s * f:.3f}"
        )


def section_stages(chunk=8):
    """Flow vs render+grid+cluster split (scan-repeat, ms/pair)."""
    from opticalflowclustering_tpu.features.dominant_color import (
        dominant_hue_k1,
        preprocess_cells_rgba,
    )
    from opticalflowclustering_tpu.features.grid import (
        extract_cells,
        grid_mean_hue,
        whiten_grid_lines,
    )
    from opticalflowclustering_tpu.flow.farneback import (
        FarnebackParams,
        farneback_flow,
    )
    from opticalflowclustering_tpu.flow.render import render_flow_hsv_bgr
    from opticalflowclustering_tpu.ops.colorspace import bgr2gray
    from opticalflowclustering_tpu.ops.polar import magnitude

    fp = FarnebackParams(warp_mode="fast")
    from opticalflowclustering_tpu.features.grid import GridParams

    grid = GridParams()
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, (chunk + 1, 720, 1280, 3)), jnp.uint8
    )
    gray = jax.block_until_ready(jax.jit(bgr2gray)(frames))
    print(f"== stage split, chunk={chunk} (ms/pair) ==")
    t_gray = scan_time(
        lambda x, f: bgr2gray(jnp.clip(f + x.astype(jnp.uint8), 0, 255)),
        (frames,),
    )
    t_flow = scan_time(
        lambda x, g: farneback_flow(g[:-1] + x * 1e-6, g[1:], fp), (gray,)
    )
    flow = jax.block_until_ready(
        jax.jit(lambda g: farneback_flow(g[:-1], g[1:], fp))(gray)
    )

    def rest(x, flow):
        flow = flow + x * 1e-6
        mag = magnitude(flow[..., 0], flow[..., 1])
        mm = jnp.mean(mag, axis=(-2, -1))
        fb = render_flow_hsv_bgr(flow)
        cells = extract_cells(fb, grid)
        cells_own = whiten_grid_lines(cells, grid, own_rectangle=True)
        rgba = preprocess_cells_rgba(cells_own, rb_swap=True)
        _, hue = dominant_hue_k1(rgba)
        return (
            hue.astype(jnp.float32).sum()
            + grid_mean_hue(fb, grid).astype(jnp.float32).sum()
            + mm.sum()
        )[None]

    t_rest = scan_time(rest, (flow,))
    f = 1e3 / chunk
    print(
        f"gray {t_gray * f:.3f}  flow {t_flow * f:.3f}  "
        f"render+grid+cluster {t_rest * f:.3f}"
    )


def section_tail(chunk=8):
    """Pyramid-build tail (presmooth+resize+poly+prepare, no iterations)
    vs full flow — isolates the non-kernel XLA time (ms/pair)."""
    from opticalflowclustering_tpu.flow.farneback import (
        FarnebackParams,
        farneback_flow,
        poly_expansion,
        pyramid_plan,
        _cvround,
    )
    from opticalflowclustering_tpu.kernels import warp as kw
    from opticalflowclustering_tpu.ops.colorspace import bgr2gray
    from opticalflowclustering_tpu.ops.filters import gaussian_blur
    from opticalflowclustering_tpu.ops.resize import resize_linear

    import bench

    fp = FarnebackParams(warp_mode="fast")
    frames = jnp.asarray(bench.synth_frames(chunk + 1))
    gray = jax.block_until_ready(jax.jit(bgr2gray)(frames))

    def pyramid_only(x, g):
        prev_f = g[:-1].astype(jnp.float32) + x * 1e-6
        next_f = g[1:].astype(jnp.float32)
        probes = []
        for k, h_k, w_k, sigma in pyramid_plan(720, 1280, fp):
            smooth_sz = max(_cvround(sigma * 5) | 1, 3)
            rs = []
            for img in (prev_f, next_f):
                sm = gaussian_blur(img, smooth_sz, sigma, border="reflect101")
                rs.append(resize_linear(sm, (h_k, w_k)))
            r0 = poly_expansion(rs[0], fp.poly_n, fp.poly_sigma, channel_first=True)
            r1 = poly_expansion(rs[1], fp.poly_n, fp.poly_sigma, channel_first=True)
            bufs = kw.prepare_fused_level_cf(r0, r1)
            probes.append(bufs.r0p[0, 0, 0, :4] + bufs.r1p[0, 0, 0, :4])
        return sum(probes)

    t_pyr = scan_time(pyramid_only, (gray,))
    t_flow = scan_time(
        lambda x, g: farneback_flow(g[:-1] + x * 1e-6, g[1:], fp), (gray,)
    )
    f = 1e3 / chunk
    print(
        f"== tail, chunk={chunk} (ms/pair) ==\n"
        f"pyramid build (presmooth+resize+poly+prepare) {t_pyr * f:.3f}  "
        f"full flow {t_flow * f:.3f}  iterations+rest {(t_flow - t_pyr) * f:.3f}"
    )


def section_chunks():
    """Chunk sweep through the real single-dispatch video program."""
    import bench

    from opticalflowclustering_tpu.flow.farneback import FarnebackParams
    from opticalflowclustering_tpu.pipeline.bounce import (
        PipelineConfig,
        _stack_chunks,
        _video_step,
    )

    frames = bench.synth_frames()
    print("== chunk sweep, 49-frame 720p clip, single-dispatch scan ==")
    for chunk in (4, 8, 12, 16):
        cfg = PipelineConfig(
            chunk=chunk,
            emit_flow_bgr=False,
            flow=FarnebackParams(warp_mode="fast"),
        )
        chunks, n_pairs = _stack_chunks(frames, cfg.chunk)
        dev = jax.device_put(chunks)

        def run():
            return np.asarray(_video_step(dev, cfg))

        try:
            run()
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            print(f"chunk {chunk}: {n_pairs / min(ts):.1f} fps")
        except Exception as e:
            print(
                f"chunk {chunk}: FAILED {type(e).__name__}: {str(e)[:120]}"
            )


if __name__ == "__main__":
    _cache()
    sections = sys.argv[1:] or ["kernels", "stages", "chunks"]
    print("backend:", jax.default_backend(), jax.devices())
    for s in sections:
        globals()[f"section_{s}"]()
