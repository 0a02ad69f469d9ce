"""Byte-level format parity of the compat CSV writers against the
reference's committed artifacts (stringified-numpy quirks included)."""

import os

import cv2
import numpy as np
import pytest

REF = "/root/reference/k-means-color-clustering"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data unavailable")
def test_cluster_centers_row_bytes_match_addnew(tmp_path):
    """Recompute the committed addnew.csv row for cell 50/176.png from the
    stored OutImgs cell and compare the full serialized row byte-for-byte
    (`name,[R. G. B. A.],[[[h s v]]],hue`)."""
    from opticalflowclustering_tpu.compat.writers import (
        append_cluster_centers_rows,
    )
    from opticalflowclustering_tpu.features.dominant_color import (
        dominant_hue_k1,
        preprocess_cells_rgba,
    )

    want_rows = {}
    with open(f"{REF}/addnew.csv") as f:
        for line in f:
            name = line.split(",", 1)[0]
            if name in ("50/176.png", "50/348.png"):
                want_rows[name] = line.rstrip("\n")

    out = tmp_path / "rows.csv"
    for name in want_rows:
        frame, cell = name.split("/")
        img = cv2.imread(f"{REF}/OutImgs/601_bad_bounce_3/{frame}/{cell}")
        rgba = preprocess_cells_rgba(img[None], rb_swap=True)
        centroid, hue = dominant_hue_k1(rgba)
        append_cluster_centers_rows(
            str(out), [name], np.asarray(centroid), np.asarray(hue)
        )
    got = out.read_text().strip().splitlines()
    for line in got:
        name = line.split(",", 1)[0]
        # csv.writer quotes fields containing commas; the reference's rows
        # use spaces inside the arrays, so no quoting either way
        assert line == want_rows[name], (line, want_rows[name])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data unavailable")
def test_cluster_centers_header_semantics(tmp_path):
    """header=True writes the committed cluster_centers.csv header line
    byte-for-byte on a fresh target only; header=False (the fused
    KmeanGrids path) stays headerless like the committed addnew.csv."""
    from opticalflowclustering_tpu.compat.writers import (
        append_cluster_centers_rows,
    )

    want_header = open(f"{REF}/cluster_centers.csv").readline().rstrip("\n")
    cen = np.array([[0.0, 0.0, 0.0, 0.0]])
    hue = np.array([0])

    with_h = tmp_path / "cluster_centers.csv"
    append_cluster_centers_rows(str(with_h), ["a.png"], cen, hue, header=True)
    append_cluster_centers_rows(str(with_h), ["b.png"], cen, hue, header=True)
    lines = with_h.read_text().strip().splitlines()
    assert lines[0] == want_header  # exactly once, only when fresh
    assert len(lines) == 3

    no_h = tmp_path / "addnew.csv"
    append_cluster_centers_rows(str(no_h), ["c.png"], cen, hue)
    first = no_h.read_text().splitlines()[0]
    assert first.startswith("c.png,")


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data unavailable")
def test_outcsv_serialization_bytes():
    """write_hue_table_csv output bytes match the committed OutCSV header
    and first row exactly."""
    import pandas as pd

    from opticalflowclustering_tpu.compat.writers import write_hue_table_csv

    want = open(f"{REF}/OutCSV/601_bad_bounce_3.csv").read().splitlines()
    table = pd.read_csv(f"{REF}/OutCSV/601_bad_bounce_3.csv").values
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.csv")
        write_hue_table_csv(p, table)
        got = open(p).read().splitlines()
    assert got[0] == want[0]
    assert got[1] == want[1]
    assert len(got) == len(want)
