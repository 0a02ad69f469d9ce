from opticalflowclustering_tpu.pipeline.bounce import (
    PipelineConfig,
    classify_bounce,
    dominant_hue_series,
    process_frames,
    process_video_file,
)
