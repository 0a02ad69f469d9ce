"""Per-cell dominant color — the reference's HOT LOOP #3, batched.

Replicates `preprocess_image` + `cluster_colors` with k=1
(`KmeanGrids.py:269-339`, `color_kmeans.py:35-133`): threshold dark pixels
to zero, derive a binary alpha from grayscale, take the 4-channel mean
(sklearn KMeans with one cluster *is* the mean), round half-to-even, and
convert the (b,g,r) centroid to HSV for its hue. All rows×cols cells of all
frames reduce in one op.

Channel-order quirk (SURVEY.md §2.5 #5, verified bit-exact against the
committed golden CSVs): the runs that produced `OutCSV/*.csv` read cells
from disk through `read_image` (`KmeanGrids.py:262-267`), which flips
BGR→RGB before `preprocess_image`'s BGR2GRAY and the final BGR2HSV. Hue is
therefore computed with R and B swapped. `rb_swap=True` (default)
reproduces those artifacts; `rb_swap=False` gives the in-memory
`image_dict` path of the current `KmeanGrids.py` (no flip).
"""

from __future__ import annotations

import jax.numpy as jnp

from opticalflowclustering_tpu.ops.colorspace import bgr2gray, bgr2hsv


def preprocess_cells_rgba(cells: jnp.ndarray, rb_swap: bool = True) -> jnp.ndarray:
    """`preprocess_image` (`KmeanGrids.py:269-286`) batched.

    [..., ys, xs, 3] uint8 BGR cells → [..., ys, xs, 4] uint8: per-channel
    threshold (<30 → 0), binary alpha = 255 where the (quirk-ordered)
    grayscale is nonzero.
    """
    if rb_swap:
        cells = cells[..., ::-1]
    x = jnp.where(cells < 30, jnp.uint8(0), cells)
    gray = bgr2gray(x)  # quirk: BGR weights applied to whatever order x is in
    alpha = jnp.where(gray > 0, jnp.uint8(255), jnp.uint8(0))
    return jnp.concatenate([x, alpha[..., None]], axis=-1)


def _rint_div(p: jnp.ndarray, q: int) -> jnp.ndarray:
    """Exact round-half-to-even of integer ratio p/q (np.rint semantics,
    `KmeanGrids.py:327` np.rint of the KMeans centroid) in int32."""
    m = p // q
    rem = p - m * q
    twice = 2 * rem
    roundup = (twice > q) | ((twice == q) & (m % 2 == 1))
    return m + roundup.astype(p.dtype)


def dominant_hue_k1_frames(
    frames_bgr: jnp.ndarray, grid, rb_swap: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """dominant_hue_k1 of every grid cell, computed frame-wise:
    whiten (own-rectangle) + RGBA preprocess are per-pixel and fuse as
    elementwise ops on [..., H, W, 3]; the per-cell sums are strided
    reductions (features.grid.grid_cell_sums) — no [.., cells, ys, xs, 4]
    tensor is ever materialized. Identical values to the cell-tensor path
    (integer sums are association-free; verified element-equal in tests).

    Returns (centroid [..., rows*cols, 4] int32, hue [..., rows*cols] u8).
    """
    from opticalflowclustering_tpu.features.grid import (
        grid_cell_sums,
        whiten_frame_lines,
    )

    h, w = frames_bgr.shape[-3], frames_bgr.shape[-2]
    ys, xs = grid.steps(h, w)
    wh = whiten_frame_lines(frames_bgr, grid, own_rectangle=True)
    rgba = preprocess_cells_rgba(wh, rb_swap=rb_swap)
    s = grid_cell_sums(rgba, grid)
    centroid = _rint_div(s, ys * xs)
    bgr = centroid[..., :3].astype(jnp.uint8)
    hue = bgr2hsv(bgr)[..., 0]
    return centroid, hue


def dominant_hue_k1(rgba_cells: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k=1 `cluster_colors` (`KmeanGrids.py:288-339`): the centroid is the
    exact pixel mean. Returns (centroid [..., 4] int32, hue [...] uint8).

    The mean is computed in exact integer arithmetic (int32 sums + rational
    round-half-even), so results match numpy/sklearn float64 bit-for-bit —
    verified against all 6300 golden cells of OutCSV/601_bad_bounce_3.csv.
    """
    s = jnp.sum(rgba_cells.astype(jnp.int32), axis=(-3, -2))
    count = rgba_cells.shape[-3] * rgba_cells.shape[-2]
    centroid = _rint_div(s, count)  # [..., 4]
    # cluster_colors: rgb0 = [[[c0, c1, c2]]] as uint8, then BGR2HSV.
    bgr = centroid[..., :3].astype(jnp.uint8)
    hue = bgr2hsv(bgr)[..., 0]
    return centroid, hue
