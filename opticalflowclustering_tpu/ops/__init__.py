"""cv2-exact image primitives as pure-JAX ops.

Every op here replicates the *behavior* of a native OpenCV/sklearn primitive
the reference calls into (SURVEY.md §2.3), re-designed as batched XLA
computations: channel-last arrays with arbitrary leading batch dimensions,
static shapes, integer fixed-point paths where OpenCV is fixed-point (so the
uint8 paths are bit-exact), float32 elsewhere.
"""

from opticalflowclustering_tpu.ops.colorspace import (
    bgr2gray,
    bgr2hsv,
    bgr2rgb,
    hsv2bgr,
    rgb2gray,
)
from opticalflowclustering_tpu.ops.polar import (
    cart_to_polar,
    fast_atan2_deg,
    magnitude,
    normalize_minmax,
)
