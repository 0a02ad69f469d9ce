from opticalflowclustering_tpu.utils.profiling import (
    StageTimer,
    ThroughputMeter,
    trace_to,
)
from opticalflowclustering_tpu.utils.logging import get_logger
