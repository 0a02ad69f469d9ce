from opticalflowclustering_tpu.flow.farneback import (
    FarnebackParams,
    farneback_flow,
    farneback_flow_batched,
)
from opticalflowclustering_tpu.flow.render import render_flow_hsv_bgr
