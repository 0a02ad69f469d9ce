"""Non-maximum suppression (`non-max-suppression-slow/nms.py:3-33`).

Exact semantics of the reference's O(n²) loop — boxes sorted by bottom-right
y, overlap measured against the *candidate's* area (`overlap = inter /
area[j]`, not IoU), last-sorted picked first — plus a vectorized masked
formulation of the same algorithm that runs as a fixed-trip `fori_loop` on
device for large box sets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def non_max_suppression(boxes: np.ndarray, overlap_thresh: float) -> np.ndarray:
    """Host version — byte-faithful port of the reference algorithm."""
    boxes = np.asarray(boxes)
    if len(boxes) == 0:
        return boxes[:0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    idxs = np.argsort(y2)
    pick = []
    while len(idxs) > 0:
        i = idxs[-1]
        pick.append(i)
        xx1 = np.maximum(x1[i], x1[idxs[:-1]])
        yy1 = np.maximum(y1[i], y1[idxs[:-1]])
        xx2 = np.minimum(x2[i], x2[idxs[:-1]])
        yy2 = np.minimum(y2[i], y2[idxs[:-1]])
        w = np.maximum(0, xx2 - xx1 + 1)
        h = np.maximum(0, yy2 - yy1 + 1)
        overlap = (w * h).astype(float) / area[idxs[:-1]]
        idxs = idxs[:-1][overlap <= overlap_thresh]
    return boxes[pick]


def non_max_suppression_device(
    boxes: jnp.ndarray, overlap_thresh: float
) -> jnp.ndarray:
    """Device version: same selection rule as a masked fixed-trip loop.
    Returns a boolean keep-mask aligned with the input boxes."""
    boxes = jnp.asarray(boxes, jnp.float32)
    n = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = jnp.argsort(y2)  # ascending; reference picks from the end

    def body(step, state):
        alive, keep = state
        # highest-priority alive box = last (in y2 order) still alive
        prio = jnp.where(alive[order], jnp.arange(n), -1)
        sel_pos = jnp.argmax(prio)
        i = order[sel_pos]
        any_alive = jnp.any(alive)
        keep = keep.at[i].set(jnp.where(any_alive, True, keep[i]))
        xx1 = jnp.maximum(x1[i], x1)
        yy1 = jnp.maximum(y1[i], y1)
        xx2 = jnp.minimum(x2[i], x2)
        yy2 = jnp.minimum(y2[i], y2)
        w = jnp.maximum(0.0, xx2 - xx1 + 1)
        h = jnp.maximum(0.0, yy2 - yy1 + 1)
        overlap = (w * h) / area
        suppress = (overlap > overlap_thresh) | (jnp.arange(n) == i)
        alive = jnp.where(any_alive, alive & ~suppress, alive)
        return alive, keep

    alive0 = jnp.ones(n, bool)
    keep0 = jnp.zeros(n, bool)
    _, keep = jax.lax.fori_loop(0, n, body, (alive0, keep0))
    return keep
