from opticalflowclustering_tpu.parallel.mesh import make_mesh
from opticalflowclustering_tpu.parallel.temporal import (
    sharded_hue_pipeline,
    temporal_shard_flow,
)
