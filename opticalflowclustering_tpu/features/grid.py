"""Grid-cell pooling — the reference's HOT LOOP #2, batched.

The reference slices every frame into rows×cols cells one Python iteration
at a time (`KmeanGrids.py:78-113`, 14×25=350 cells/frame; 10×10 in
`drawGridsAndOutputCSV.py:168`), drawing a white 1-px rectangle around each
cell as it goes. Because the cell ROIs are numpy *views* into the frame,
those white lines leak into the stored cells and into every mean the
pipeline computes — so they are part of the output contract. Here the whole
grid is one reshape plus masked writes over [N, H, W, C], and the cell means
are one reduction.

Line semantics, replicated exactly (see SURVEY.md §2 and the verified
golden artifacts):
- OutCSV path (`KmeanGrids.py` phase 2 / `drawGridsAndOutputCSVChange.py`
  PNG dumps): each cell's ROI is consumed *after* its own rectangle was
  drawn → every cell has a white top row and left column.
- `*_rgb_values.csv` path (`drawGridsAndOutputCSV[Change].py:86`): the mean
  is taken *before* the cell's own rectangle but after its top/left
  neighbors' → white top row only for grid-row>0, white left column only
  for grid-col>0.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from opticalflowclustering_tpu.ops.colorspace import bgr2hsv


@dataclasses.dataclass(frozen=True)
class GridParams:
    """Grid geometry (`KmeanGrids.py:177`: rows=14, cols=25 for the main
    pipeline; `drawGridsAndOutputCSV.py:168`: 10×10 for the 2-video
    variant). Steps are floor(W/cols), floor(H/rows); the right/bottom
    remainder of the frame is not covered by any cell."""

    rows: int = 14
    cols: int = 25

    def steps(self, height: int, width: int) -> tuple[int, int]:
        return height // self.rows, width // self.cols


def extract_cells(frames: jnp.ndarray, grid: GridParams) -> jnp.ndarray:
    """[..., H, W, C] → [..., rows*cols, ys, xs, C] cell tensor.

    Cells are the reference's ROIs `frame[y1:y2, x1:x2]`
    (`KmeanGrids.py:85`) in the same row-major order (cell 1..rows*cols)."""
    h, w, c = frames.shape[-3], frames.shape[-2], frames.shape[-1]
    ys, xs = grid.steps(h, w)
    lead = frames.shape[:-3]
    x = frames[..., : grid.rows * ys, : grid.cols * xs, :]
    x = x.reshape(*lead, grid.rows, ys, grid.cols, xs, c)
    x = jnp.moveaxis(x, -3, -4)  # [..., rows, cols, ys, xs, c]
    return x.reshape(*lead, grid.rows * grid.cols, ys, xs, c)


def whiten_grid_lines(
    cells: jnp.ndarray, grid: GridParams, own_rectangle: bool
) -> jnp.ndarray:
    """Overlay the white 1-px grid lines onto a cell tensor.

    own_rectangle=True → OutCSV semantics (every cell gets a white top row
    and left column). own_rectangle=False → `*_rgb_values.csv` semantics
    (only edges drawn by earlier-scanned neighbors: top row for grid-row>0,
    left column for grid-col>0)."""
    cells = jnp.asarray(cells)
    white = jnp.asarray(255, dtype=cells.dtype)
    if own_rectangle:
        cells = cells.at[..., 0, :, :].set(white)
        cells = cells.at[..., :, 0, :].set(white)
        return cells
    n = grid.rows * grid.cols
    top = (np.arange(n) // grid.cols > 0)[:, None, None]
    left = (np.arange(n) % grid.cols > 0)[:, None, None]
    cells = cells.at[..., 0, :, :].set(
        jnp.where(jnp.asarray(top), white, cells[..., 0, :, :])
    )
    cells = cells.at[..., :, 0, :].set(
        jnp.where(jnp.asarray(left), white, cells[..., :, 0, :])
    )
    return cells


def whiten_frame_lines(
    frames: jnp.ndarray, grid: GridParams, own_rectangle: bool
) -> jnp.ndarray:
    """whiten_grid_lines applied directly on [..., H, W, C] frames — the
    same white pixels, expressed as an elementwise mask so XLA fuses it
    into the surrounding chain instead of materializing a cell-layout
    copy. own_rectangle semantics match whiten_grid_lines."""
    h, w = frames.shape[-3], frames.shape[-2]
    ys, xs = grid.steps(h, w)
    y = jnp.arange(h, dtype=jnp.int32)[:, None]
    x = jnp.arange(w, dtype=jnp.int32)[None, :]
    in_grid = (y < grid.rows * ys) & (x < grid.cols * xs)
    if own_rectangle:
        line = (y % ys == 0) | (x % xs == 0)
    else:
        line = ((y % ys == 0) & (y >= ys)) | ((x % xs == 0) & (x >= xs))
    white = jnp.asarray(255, frames.dtype)
    return jnp.where((in_grid & line)[..., None], white, frames)


def grid_cell_sums(frames: jnp.ndarray, grid: GridParams) -> jnp.ndarray:
    """Per-cell int32 channel sums of [..., H, W, C] frames →
    [..., rows*cols, C], without materializing the cell tensor: two strided
    reductions on reshaped views (rows first, then cols) — contiguous
    reshapes, no transpose copy. Identical values to summing
    extract_cells (integer sums are association-free)."""
    h, w, c = frames.shape[-3], frames.shape[-2], frames.shape[-1]
    ys, xs = grid.steps(h, w)
    lead = frames.shape[:-3]
    x = frames[..., : grid.rows * ys, : grid.cols * xs, :].astype(jnp.int32)
    x = x.reshape(*lead, grid.rows, ys, grid.cols * xs, c).sum(axis=-3)
    x = x.reshape(*lead, grid.rows, grid.cols, xs, c).sum(axis=-2)
    return x.reshape(*lead, grid.rows * grid.cols, c)


def grid_mean_bgr(frames: jnp.ndarray, grid: GridParams) -> jnp.ndarray:
    """Per-cell mean BGR, truncated to uint8 like the reference's
    `np.mean(grid_roi, axis=(0,1)).astype(np.uint8)`
    (`drawGridsAndOutputCSV.py:84`), with the rgb_values line semantics
    (white neighbor edges included, own rectangle not yet drawn).

    frames: [..., H, W, 3] uint8 → [..., rows*cols, 3] uint8.
    """
    h, w = frames.shape[-3], frames.shape[-2]
    ys, xs = grid.steps(h, w)
    # np.mean in float64 then .astype(uint8) truncates toward zero. Sums of
    # uint8 over a cell are exact in int32, so the truncated integer mean is
    # floor(sum/count) — computed exactly in integer arithmetic. The whiten
    # + sums run frame-wise (fused mask + strided reductions) — no cell
    # tensor is materialized.
    s = grid_cell_sums(
        whiten_frame_lines(frames, grid, own_rectangle=False), grid
    )
    return (s // (ys * xs)).astype(jnp.uint8)


def grid_mean_hue(frames: jnp.ndarray, grid: GridParams) -> jnp.ndarray:
    """Per-cell mean-BGR hue, the `*_rgb_values.csv` feature
    (`drawGridsAndOutputCSV.py:84-103`): truncated-uint8 cell mean
    (grid_mean_bgr) converted BGR→HSV as a single pixel, hue channel kept.

    frames: [..., H, W, 3] uint8 → [..., rows*cols] float32 hue.
    """
    hsv = bgr2hsv(grid_mean_bgr(frames, grid))
    return hsv[..., 0].astype(jnp.float32)
