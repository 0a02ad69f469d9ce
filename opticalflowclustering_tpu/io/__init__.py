from opticalflowclustering_tpu.io.video import (
    assemble_chunks,
    read_video_bgr,
    stream_video_chunks,
    video_fps,
    write_video_mjpg,
)
from opticalflowclustering_tpu.io.images import (
    numeric_key,
    read_cell_tree,
    read_png_dir,
)
