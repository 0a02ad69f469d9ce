"""Bounce-classification CLI, mirroring
`k-means-color-clustering/findCosineDifferentVectors.py` (same argv, same
printed lines: vector sizes, max cosine similarity, the vestigial
'Minimum sum of squared differences: 0', max frame)."""

from __future__ import annotations

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    file1_name, nobounce_name = argv[0], argv[1]

    import pandas as pd

    from opticalflowclustering_tpu.pipeline.bounce import classify_bounce

    file1_hue = pd.read_csv(file1_name, header=None).iloc[:, 1].values
    nobounce_hue = pd.read_csv(nobounce_name, header=None).iloc[:, 1].values

    print("Vector sizes are: ", len(file1_hue), len(nobounce_hue))
    sim, frame = classify_bounce(file1_hue, nobounce_hue)
    print("Maximum cosine similarity:", sim)
    # The reference declares-but-never-computes this value (:50,:65).
    print("Minimum sum of squared differences:", 0)
    print("Max frame:", frame)


if __name__ == "__main__":
    main()
