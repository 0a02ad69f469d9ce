"""Pallas TPU kernels for the hot ops the XLA autofuser can't handle.

Currently: the bilinear flow warp inside Farneback's local-system rebuild —
per-pixel dynamic addressing that XLA lowers to a slow generic gather
(~98% of pipeline runtime). The Pallas kernel keeps a sliding row window in
VMEM and uses the TPU's lane-dimension dynamic gather instead.
"""

from opticalflowclustering_tpu.kernels.warp import (
    fused_update_matrices,
    prepare_fused_level,
    update_matrices_gather,
)
