"""CNN inference slot — the framework's replacement for the reference's
cv2.dnn Caffe pipelines (`deep-learning-with-opencv/deep_learning_with_opencv.py:
17-33` GoogLeNet classification, `object-detection-with-deep-learning-and-
opencv/deep_learning_object_detection.py:12-38` MobileNet-SSD detection).

The Caffe weights are not portable; the contract is: same preprocessing
(`blobFromImage`), a jittable flax forward, and the same postprocessing
(top-k / confidence-filtered scaled boxes). Any flax image model drops into
the slot; a compact CNN is provided as the default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from opticalflowclustering_tpu.ops.resize import resize_linear_hwc

VOC_CLASSES = [
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


def blob_from_image(
    image: jnp.ndarray,
    scalefactor: float = 1.0,
    size: tuple[int, int] = (224, 224),
    mean: tuple[float, float, float] = (0.0, 0.0, 0.0),
    swap_rb: bool = False,
) -> jnp.ndarray:
    """cv2.dnn.blobFromImage: resize (bilinear) → mean-subtract → scale →
    NCHW [1,3,H,W] float32. The classification demo uses (224,224) with
    mean (104,117,123); the SSD demo (300,300), scale 0.007843, mean 127.5."""
    img = jnp.asarray(image).astype(jnp.float32)
    w, h = size
    img = resize_linear_hwc(img, (h, w))
    if swap_rb:
        img = img[..., ::-1]
    img = (img - jnp.asarray(mean, jnp.float32)) * jnp.float32(scalefactor)
    return jnp.transpose(img, (2, 0, 1))[None]


class SmallCNN(nn.Module):
    """Compact flax ConvNet for the classification slot."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, blob_nchw: jnp.ndarray) -> jnp.ndarray:
        x = jnp.transpose(blob_nchw, (0, 2, 3, 1))  # NHWC for flax conv
        for feat in (32, 64, 128):
            x = nn.Conv(feat, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(256)(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes)(x)


class ClassifierNet:
    """The `readNetFromCaffe → setInput → forward` flow
    (`deep_learning_with_opencv.py:17-23`) with a flax model inside."""

    def __init__(self, model: nn.Module | None = None, params=None,
                 num_classes: int = 1000, seed: int = 0):
        self.model = model or SmallCNN(num_classes=num_classes)
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 3, 224, 224))
            )
        self.params = params
        self._fwd = jax.jit(lambda p, b: self.model.apply(p, b))
        self._blob = None

    def set_input(self, blob: jnp.ndarray) -> None:
        self._blob = blob

    def forward(self) -> np.ndarray:
        return np.asarray(self._fwd(self.params, self._blob))


def top_k(preds: np.ndarray, k: int = 5) -> list[tuple[int, float]]:
    """`deep_learning_with_opencv.py:29-33`: top-k (class, prob) pairs."""
    p = np.asarray(preds).ravel()
    idxs = np.argsort(p)[::-1][:k]
    return [(int(i), float(p[i])) for i in idxs]


def filter_detections(
    detections: np.ndarray,
    image_hw: tuple[int, int],
    confidence: float = 0.2,
) -> list[tuple[int, float, tuple[int, int, int, int]]]:
    """SSD postprocess (`deep_learning_object_detection.py:28-38`):
    detections [1,1,N,7] rows (_, class, conf, x1, y1, x2, y2 normalized) →
    [(class, conf, (x1,y1,x2,y2) pixels)] above the confidence floor."""
    h, w = image_hw
    out = []
    for det in np.asarray(detections).reshape(-1, 7):
        conf = float(det[2])
        if conf > confidence:
            box = det[3:7] * np.array([w, h, w, h])
            out.append((int(det[1]), conf, tuple(box.astype(int))))
    return out
