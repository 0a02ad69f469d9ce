from opticalflowclustering_tpu.io.video import (
    read_video_bgr,
    video_fps,
    write_video_mjpg,
)
from opticalflowclustering_tpu.io.images import (
    numeric_key,
    read_cell_tree,
    read_png_dir,
)
