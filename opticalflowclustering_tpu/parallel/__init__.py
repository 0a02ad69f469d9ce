from opticalflowclustering_tpu.parallel.mesh import make_mesh
from opticalflowclustering_tpu.parallel.temporal import (
    sharded_hue_pipeline,
    sharded_hue_pipeline_videos,
    temporal_shard_flow,
)
from opticalflowclustering_tpu.parallel.spatial import (
    spatial_farneback_flow,
    spatial_farneback_flow_padded,
    spatial_hue_pipeline,
)
