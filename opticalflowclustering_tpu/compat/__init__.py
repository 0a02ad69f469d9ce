from opticalflowclustering_tpu.compat.writers import (
    append_cluster_centers_rows,
    write_hue_table_csv,
    write_optical_flow_csv,
    write_rgb_values_csv,
)
