from opticalflowclustering_tpu.pipeline.bounce import (
    OverlaySpec,
    PipelineConfig,
    classify_bounce,
    dominant_hue_series,
    grid_cluster_stage,
    process_frames,
    process_video_file,
)
from opticalflowclustering_tpu.pipeline.queue import (
    load_features,
    process_video_queue,
)
