"""A *working* CNN image capability for the cv2.dnn slot, trained on the
repository's real footage.

The reference demos classify/detect with pretrained Caffe binaries that are
NOT in its tree (`deep-learning-with-opencv/deep_learning_with_opencv.py:17`
loads `--model bvlc_googlenet.caffemodel` from disk; only the .py and demo
images are committed). With no weights to port, this module ships the same
observable capability the demos show — top-k class probabilities
(`deep_learning_with_opencv.py:29-33`) and confidence-filtered boxes
(`deep_learning_object_detection.py:28-38`) — from a compact flax ConvNet
*trained end-to-end on the real labeled footage committed in the reference
tree* — the 50×50 flow-rendered cells that contain motion (mean > 2; most
cells of both sources are black/static and carry no class signal):

  class "bounce-clip flow"  — `k-means-color-clustering/images/601_3_50x50/`
                              (the bounce clip's motion cells, ~800)
  class "no-bounce flow"    — `k-means-color-clustering/Non-bounce/
                              NoBounce_{1,2}/` (~590 motion cells)

Training is one jitted scan of SGD steps (deterministic: seeded PRNG,
fixed shuffle), so the committed weights are reproducible bit-for-bit with
`scripts/train_flow_cnn.py`. Detection runs the classifier over a strided
window pyramid in ONE batched forward (every window is a row of a single
device batch — no Python per-window loop) followed by the framework's NMS.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

CLASS_NAMES = ("no-bounce flow", "bounce-clip flow")
_WEIGHTS = os.path.join(os.path.dirname(__file__), "flow_cnn_weights.npz")


class FlowCellNet(nn.Module):
    """3-block ConvNet over 50×50 BGR cells → class logits.

    Small on purpose: the whole model is a few hundred KB so the trained
    weights are committed and the demo runs out of the box, the way the
    reference's demos assume a .caffemodel on disk."""

    num_classes: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, 50, 50, 3] f32
        x = x * jnp.float32(1.0 / 255.0) - jnp.float32(0.5)
        for feat in (24, 48, 96):
            x = nn.Conv(feat, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
            x = nn.Conv(feat, (3, 3))(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(128)(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes)(x)


# ---------------------------------------------------------------------------
# training (scripts/train_flow_cnn.py drives this; fully deterministic)
# ---------------------------------------------------------------------------


def train_flow_cnn(
    images: np.ndarray,
    labels: np.ndarray,
    epochs: int = 120,
    batch: int = 64,
    lr: float = 3e-3,
    seed: int = 0,
):
    """Train FlowCellNet on [N,50,50,3] uint8 BGR crops + int labels.

    Returns (params, final_train_accuracy). One jitted lax.scan per epoch
    with horizontal-flip augmentation; shuffle, flips and the cosine LR
    schedule all come from the seeded PRNG, so retraining reproduces the
    committed weights exactly."""
    model = FlowCellNet()
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((1, 50, 50, 3), jnp.float32))
    steps_per_epoch = len(images) // batch
    sched = optax.cosine_decay_schedule(lr, epochs * steps_per_epoch)
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    n = steps_per_epoch * batch
    rng = np.random.default_rng(seed)

    def loss_fn(p, xb, yb):
        logits = model.apply(p, xb)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, yb
        ).mean()
        acc = (jnp.argmax(logits, -1) == yb).mean()
        return loss, acc

    @jax.jit
    def epoch_fn(params, opt_state, xs, ys, ekey):
        def step(carry, b):
            p, s, k = carry
            k, sub = jax.random.split(k)
            xb = b[0].astype(jnp.float32)
            flip = jax.random.bernoulli(sub, 0.5, (xb.shape[0], 1, 1, 1))
            xb = jnp.where(flip, xb[:, :, ::-1], xb)
            (loss, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, xb, b[1]
            )
            updates, s = tx.update(g, s, p)
            return (optax.apply_updates(p, updates), s, k), acc

        (params, opt_state, _), accs = jax.lax.scan(
            step, (params, opt_state, ekey), (xs, ys)
        )
        return params, opt_state, accs.mean()

    acc = 0.0
    for e in range(epochs):
        order = rng.permutation(len(images))[:n]
        xs = images[order].reshape(-1, batch, 50, 50, 3)
        ys = labels[order].reshape(-1, batch)
        params, opt_state, acc = epoch_fn(
            params, opt_state, jnp.asarray(xs), jnp.asarray(ys),
            jax.random.PRNGKey(seed * 1000 + e),
        )
    return params, float(acc)


def save_params(params, path: str = _WEIGHTS) -> None:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez_compressed(path, **out)


def load_params(path: str = _WEIGHTS):
    """Rebuild the params pytree from the committed npz."""
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} missing — run scripts/train_flow_cnn.py to create it"
        )
    model = FlowCellNet()
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 50, 50, 3), jnp.float32)
    )
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [jnp.asarray(data[jax.tree_util.keystr(k)]) for k, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# inference: classification (top-k) and sliding-window detection
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _jitted_forward():
    model = FlowCellNet()
    return jax.jit(lambda p, x: jax.nn.softmax(model.apply(p, x), axis=-1))


def classify_cells(params, cells: np.ndarray) -> np.ndarray:
    """[N,50,50,3] BGR uint8 → [N, num_classes] probabilities."""
    return np.asarray(
        _jitted_forward()(params, jnp.asarray(cells, jnp.float32))
    )


def top_k_labels(probs: np.ndarray, k: int = 2):
    """The GoogLeNet demo's output rows (`deep_learning_with_opencv.py:
    29-33`): [(rank, label, prob)] sorted by probability."""
    p = np.asarray(probs).ravel()
    idxs = np.argsort(p)[::-1][:k]
    return [
        (r + 1, CLASS_NAMES[i], float(p[i])) for r, i in enumerate(idxs)
    ]


def detect_windows(
    params,
    image: np.ndarray,
    stride: int = 25,
    confidence: float = 0.9,
    iou: float = 0.3,
    positive_class: int = 1,
):
    """Confidence-filtered boxes over one BGR frame, SSD-demo style
    (`deep_learning_object_detection.py:28-38`): every 50×50 window at
    `stride` is scored in ONE batched forward, windows above `confidence`
    on `positive_class` survive the framework NMS.

    Returns [(label, confidence, (x1, y1, x2, y2))]."""
    from opticalflowclustering_tpu.extras.nms import non_max_suppression

    h, w = image.shape[:2]
    ys = list(range(0, max(h - 50, 0) + 1, stride))
    xs = list(range(0, max(w - 50, 0) + 1, stride))
    if not ys or not xs:
        return []
    windows = np.stack(
        [image[y : y + 50, x : x + 50] for y in ys for x in xs]
    )
    probs = classify_cells(params, windows)[:, positive_class]
    boxes, scores = [], []
    for i, (y, x) in enumerate((y, x) for y in ys for x in xs):
        if probs[i] > confidence:
            boxes.append((x, y, x + 50, y + 50))
            scores.append(float(probs[i]))
    if not boxes:
        return []
    kept = non_max_suppression(np.asarray(boxes, np.int32), iou)
    score_of = {b: s for b, s in zip(boxes, scores)}
    return [
        (CLASS_NAMES[positive_class], score_of[tuple(b)], tuple(int(v) for v in b))
        for b in kept
    ]
