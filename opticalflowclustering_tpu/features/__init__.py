from opticalflowclustering_tpu.features.grid import (
    GridParams,
    extract_cells,
    grid_mean_hue,
    whiten_grid_lines,
)
from opticalflowclustering_tpu.features.dominant_color import (
    dominant_hue_k1,
    preprocess_cells_rgba,
)
