"""CLI entry points mirroring the reference scripts' flags and artifacts.

  python -m opticalflowclustering_tpu.cli.computeopticalflow -i video.mp4
  python -m opticalflowclustering_tpu.cli.kmeangrids -d OutImgs/vid -c 1 -f add.csv --noyolo --nocontour --path vid.mp4
  python -m opticalflowclustering_tpu.cli.drawgrids --path vid.mp4 [--tenbyten]
  python -m opticalflowclustering_tpu.cli.colorkmeans -i img.png -c 1 -f out.csv
  python -m opticalflowclustering_tpu.cli.findcosine bounce.csv series.csv
"""
