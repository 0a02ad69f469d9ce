"""Reinhard LAB color transfer (`color-transfer/color_transfer.py:5-42`).

Same statistics pipeline (LAB channel means/stds, scale by std ratio, clip,
back to BGR) with the reference's exact std-ratio direction
(`lStdTar / lStdSrc` — the reference scales by target/source, which is the
inverse of Reinhard's paper; output parity requires keeping it).
"""

from __future__ import annotations

import jax.numpy as jnp

from opticalflowclustering_tpu.ops.lab import bgr2lab, lab2bgr


def color_transfer(source_bgr: jnp.ndarray, target_bgr: jnp.ndarray) -> jnp.ndarray:
    """Transfer `source`'s color statistics onto `target` ([H,W,3] uint8)."""
    f32 = jnp.float32
    src = bgr2lab(source_bgr).astype(f32)
    tar = bgr2lab(target_bgr).astype(f32)

    src_mean = jnp.mean(src, axis=(-3, -2))
    src_std = jnp.std(src, axis=(-3, -2))
    tar_mean = jnp.mean(tar, axis=(-3, -2))
    tar_std = jnp.std(tar, axis=(-3, -2))

    out = (tar - tar_mean) * (tar_std / src_std) + src_mean
    out = jnp.clip(out, 0, 255).astype(jnp.uint8)
    return lab2bgr(out)
