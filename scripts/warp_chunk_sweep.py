"""Sweep kernels.warp._CHUNK (candidate-range chunk rows) for the level-0
warp+M kernel at 720p batch-8, smooth realistic flow. Monkeypatches the
module global between jits (read at trace time)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from opticalflowclustering_tpu.flow.farneback import FarnebackParams, poly_expansion
from opticalflowclustering_tpu.kernels import warp as kw
from scripts.profile_r2 import scan_time

batch, h, w = 8, 720, 1280
p = FarnebackParams()
rng = np.random.default_rng(0)
img0 = jnp.asarray(rng.standard_normal((batch, h, w)), jnp.float32)
img1 = jnp.asarray(rng.standard_normal((batch, h, w)), jnp.float32)
pe = jax.jit(lambda a: poly_expansion(a, p.poly_n, p.poly_sigma))
r0 = jax.block_until_ready(pe(img0))
r1 = jax.block_until_ready(pe(img1))
bufs0 = kw.prepare_fused_level(r0, r1)
fx = jnp.asarray(
    np.tile(3.0 * np.sin(np.arange(h)[None, :, None] / 40.0), (batch, 1, w)),
    jnp.float32,
)
fxp, fyp = kw.pad_flow_planes(bufs0, jnp.stack([fx, fx * 0.5], -1))


def rebuild(r0p, r1p):
    return kw.FusedLevelBuffers(r0p, r1p, bufs0.lead, bufs0.h, bufs0.w)


for chunk in (16, 32, 64):

    def m_body(x, fxp, fyp, r0p, r1p, chunk=chunk):
        return kw.fused_m_planes(
            rebuild(r0p, r1p), fxp + x * 1e-6, fyp, chunk=chunk
        )

    t = scan_time(m_body, (fxp, fyp, bufs0.r0p, bufs0.r1p))
    print(f"chunk={chunk}: warp+M {t / batch * 1e3:.3f} ms/img-iter")
