"""Golden-artifact and oracle tests for the grid/cluster stages."""

import os

import cv2
import numpy as np
import pandas as pd
import pytest

from opticalflowclustering_tpu.cluster import (
    kmeans,
    match_signature,
    sliding_cosine_similarity,
)
from opticalflowclustering_tpu.features import (
    GridParams,
    dominant_hue_k1,
    extract_cells,
    grid_mean_hue,
    preprocess_cells_rgba,
    whiten_grid_lines,
)

REF = "/root/reference/k-means-color-clustering"
RNG = np.random.default_rng(3)


def _load_cells(frame_dir: str) -> np.ndarray:
    cells = [
        cv2.imread(os.path.join(frame_dir, f"{i}.png")) for i in range(1, 351)
    ]
    return np.stack(cells)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data unavailable")
def test_golden_outcsv_dominant_hue():
    """The cluster stage reproduces OutCSV/601_bad_bounce_3.csv bit-exactly
    from the committed grid-cell PNGs (frames 2..5 → rows 0..3)."""
    golden = pd.read_csv(f"{REF}/OutCSV/601_bad_bounce_3.csv")
    frames = [2, 3, 4, 5]
    cells = np.stack(
        [_load_cells(f"{REF}/OutImgs/601_bad_bounce_3/{f}") for f in frames]
    )  # [4, 350, 51, 51, 3] BGR
    rgba = preprocess_cells_rgba(cells, rb_swap=True)
    _, hue = dominant_hue_k1(rgba)
    got = np.asarray(hue)
    want = golden.iloc[: len(frames)].values.astype(np.int64)
    np.testing.assert_array_equal(got.astype(np.int64), want)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data unavailable")
def test_general_k_kmeans_sklearn_semantics_on_real_cells():
    """General-k parity with sklearn on real reference cell pixels
    (VERDICT r2 #9): relocate_empty + n_init=10 must land within 2% of
    sklearn's KMeans(n_clusters=3, n_init=10) inertia, with each sklearn
    center matched by one of ours within 12 RGB units. Exact label
    equality is out of reach by design (seeded PRNG streams differ);
    inertia + matched centers is the documented tolerance."""
    sklearn = pytest.importorskip("sklearn.cluster")
    import jax

    # a visually mixed frame: grid-line white + flow colors + dark bg
    cells = _load_cells(f"{REF}/OutImgs/601_bad_bounce_3/10")
    pts = cells[140:160].reshape(-1, 3).astype(np.float64)

    sk = sklearn.KMeans(n_clusters=3, n_init=10, random_state=0).fit(pts)
    centers, labels = kmeans(
        pts.astype(np.float32),
        3,
        jax.random.PRNGKey(0),
        relocate_empty=True,
        n_init=10,
    )
    centers, labels = np.asarray(centers), np.asarray(labels)
    ours = float(
        np.sum((pts - centers[labels].astype(np.float64)) ** 2)
    )
    assert ours <= sk.inertia_ * 1.02, (ours, sk.inertia_)
    for c in sk.cluster_centers_:
        d = np.linalg.norm(centers - c, axis=1)
        assert d.min() < 12.0, (c, centers)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data unavailable")
def test_minibatch_kmeans_sklearn_semantics_on_real_pixels():
    """True MiniBatchKMeans parity (VERDICT r3 #6) on real reference
    pixels in the reference's own feature space: LAB conversion of
    committed flow-rendered frames, the `color-quantization/quant.py:18-19`
    workload. cluster.kmeans.minibatch_kmeans implements sklearn's
    `_mini_batch_step` counts-weighted per-center update; both sides
    start from the SAME explicit init (sklearn ``init=<array>``) so the
    comparison isolates the update rule, and parity is statistical in
    the batch draws only (JAX vs numpy PRNG): converged inertia within
    2% of sklearn MiniBatchKMeans(reassignment_ratio=0) and every
    sklearn center matched by one of ours within 10 LAB units — the
    documented tolerance."""
    sk_cluster = pytest.importorskip("sklearn.cluster")
    import glob

    import cv2
    import jax

    from opticalflowclustering_tpu.cluster.kmeans import minibatch_kmeans
    from opticalflowclustering_tpu.ops.lab import bgr2lab

    f = sorted(glob.glob(f"{REF}/images/601_3_cropped_4_OF/*.png"))[40]
    img = cv2.imread(f)
    pts = np.asarray(bgr2lab(img)).reshape(-1, 3).astype(np.float64)

    rng = np.random.default_rng(7)
    init = pts[rng.choice(len(pts), 4, replace=False)]
    # sklearn's max_iter counts FULL-DATASET passes: total minibatch steps
    # = max_iter * ceil(n/batch). Give ours the same step budget.
    max_iter, batch = 20, 1024
    n_steps = max_iter * -(-len(pts) // batch)
    sk = sk_cluster.MiniBatchKMeans(
        n_clusters=4,
        random_state=0,
        init=init,
        n_init=1,
        batch_size=batch,
        max_iter=max_iter,
        max_no_improvement=None,
        reassignment_ratio=0.0,
    ).fit(pts)
    centers, labels = minibatch_kmeans(
        pts.astype(np.float32), 4, jax.random.PRNGKey(0),
        batch_size=batch, n_steps=n_steps, init=init.astype(np.float32),
        reassignment_ratio=0.0,  # isolate the update rule (as sklearn's)
    )
    centers, labels = np.asarray(centers), np.asarray(labels)
    ours = float(np.sum((pts - centers[labels].astype(np.float64)) ** 2))
    sk_inertia = float(
        np.sum((pts - sk.cluster_centers_[sk.labels_]) ** 2)
    )
    assert ours <= sk_inertia * 1.02, (ours, sk_inertia)
    for c in sk.cluster_centers_:
        d = np.linalg.norm(centers - c, axis=1)
        assert d.min() < 10.0, (c, centers)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_minibatch_kmeans_sklearn_DEFAULT_config_on_real_pixels():
    """VERDICT r4 #5: parity against sklearn MiniBatchKMeans DEFAULTS —
    reassignment_ratio=0.01 included — on real reference LAB pixels (the
    `color-quantization/quant.py:18-19` workload). Both sides start from
    the same explicit init; starved centers are randomly reassigned every
    10·k samples per sklearn's `_random_reassign`/`_mini_batch_step`, so
    trajectories are PRNG-divergent and parity is statistical. Tolerance
    calibration: sklearn DISAGREES WITH ITSELF under default
    reassignment — across random_state 0..3 on these exact pixels its
    converged inertia spreads 28% (1.56e7..2.01e7) and its worst
    center-to-center distance is 16.8 LAB — so the honest contract is
    (a) our inertia within 2% of sklearn's (i.e. at the GOOD end of
    sklearn's own seed spread) and (b) every sklearn center matched
    within 35 LAB (~2× sklearn's own cross-seed spread). A skewed k=8 on
    a mostly-dark flow frame exercises the starvation path."""
    sk_cluster = pytest.importorskip("sklearn.cluster")
    import glob

    import cv2
    import jax

    from opticalflowclustering_tpu.cluster.kmeans import minibatch_kmeans
    from opticalflowclustering_tpu.ops.lab import bgr2lab

    f = sorted(glob.glob(f"{REF}/images/601_3_cropped_4_OF/*.png"))[40]
    img = cv2.imread(f)
    pts = np.asarray(bgr2lab(img)).reshape(-1, 3).astype(np.float64)

    rng = np.random.default_rng(11)
    k = 8
    init = pts[rng.choice(len(pts), k, replace=False)]
    max_iter, batch = 20, 1024
    n_steps = max_iter * -(-len(pts) // batch)
    sk = sk_cluster.MiniBatchKMeans(
        n_clusters=k,
        random_state=0,
        init=init,
        n_init=1,
        batch_size=batch,
        max_iter=max_iter,
        max_no_improvement=None,
        # reassignment_ratio left at the 0.01 DEFAULT
    ).fit(pts)
    centers, labels = minibatch_kmeans(
        pts.astype(np.float32), k, jax.random.PRNGKey(0),
        batch_size=batch, n_steps=n_steps, init=init.astype(np.float32),
    )
    centers, labels = np.asarray(centers), np.asarray(labels)
    ours = float(np.sum((pts - centers[labels].astype(np.float64)) ** 2))
    sk_inertia = float(np.sum((pts - sk.cluster_centers_[sk.labels_]) ** 2))
    assert ours <= sk_inertia * 1.02, (ours, sk_inertia)
    for c in sk.cluster_centers_:
        d = np.linalg.norm(centers - c, axis=1)
        assert d.min() < 35.0, (c, centers)


def test_minibatch_reassigns_never_assigned_center_immediately():
    """sklearn's `_random_reassign` fires whenever ANY center has never
    been assigned, regardless of the every-10·k-samples counter (round-5
    review finding): with k=8 and batch_size=4, the counter alone would
    first fire at step 20 (10·k=80 samples), so a 5-step run discriminates
    the two gates. A center initialized at a far outlier that can never
    win an assignment must be reseeded onto the data within those steps."""
    import jax

    from opticalflowclustering_tpu.cluster.kmeans import minibatch_kmeans

    rng = np.random.default_rng(3)
    pts = rng.normal(0, 1.0, size=(64, 2)).astype(np.float32)
    init = pts[rng.choice(64, 8, replace=False)].copy()
    init[5] = (1e6, 1e6)  # never nearest to any point
    centers, _ = minibatch_kmeans(
        pts, 8, jax.random.PRNGKey(0),
        batch_size=4, n_steps=5, init=init,
    )
    d = np.linalg.norm(np.asarray(centers) - 1e6, axis=1)
    assert d.min() > 1e5, "outlier center was never reassigned"
    assert np.abs(np.asarray(centers)).max() < 10.0, centers


def test_greedy_plusplus_separates_blobs_every_seed():
    """sklearn-style greedy k-means++ (n_local_trials candidates per
    center, VERDICT r3 weak #5): on a 2-blob set where one blob holds 90%
    of the mass, the potential-minimizing candidate choice must seed BOTH
    blobs on every seed — plain single-draw d² sampling lands both
    centers in the dense blob a measurable fraction of the time."""
    import jax

    from opticalflowclustering_tpu.cluster.kmeans import _plusplus_init

    rng = np.random.default_rng(0)
    dense = rng.normal((0, 0), 1.0, size=(900, 2))
    sparse = rng.normal((40, 40), 1.0, size=(100, 2))
    pts = jax.numpy.asarray(
        np.concatenate([dense, sparse]).astype(np.float32)
    )
    init = jax.jit(lambda s: _plusplus_init(s, pts, 2))
    for seed in range(20):
        centers = np.asarray(init(jax.random.PRNGKey(seed)))
        near_dense = np.linalg.norm(centers, axis=1) < 20
        assert near_dense.sum() == 1, (seed, centers)


def test_quantize_minibatch_method():
    """extras/quantize.py method='minibatch' routes through the sklearn-
    semantics updater and produces exactly n_clusters output colors."""
    import jax

    from opticalflowclustering_tpu.extras.quantize import quantize_colors

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(60, 80, 3), dtype=np.uint8)
    out = np.asarray(
        quantize_colors(img, 4, jax.random.PRNGKey(1), method="minibatch")
    )
    assert out.shape == img.shape and out.dtype == np.uint8
    n_colors = len(np.unique(out.reshape(-1, 3), axis=0))
    assert n_colors <= 4


def test_relocate_empty_fills_all_clusters():
    """With k far above the number of distinct points, default Lloyd
    leaves empty clusters parked on their init; relocate_empty reseeds
    them on the farthest points so every cluster is used (or every
    distinct point is a center)."""
    import jax

    pts = np.repeat(
        np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [50.0, 50.0]]), 25, 0
    )
    centers, labels = kmeans(
        pts.astype(np.float32), 4, jax.random.PRNGKey(1), relocate_empty=True
    )
    assert len(np.unique(np.asarray(labels))) == 4
    got = np.sort(np.asarray(centers), axis=0)
    want = np.sort(np.array([[0, 0], [10, 0], [0, 10], [50, 50]], np.float32), axis=0)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data unavailable")
def test_dominant_hue_no_swap_matches_inmemory_semantics():
    """rb_swap=False must equal a direct numpy emulation of the current
    KmeanGrids in-memory path (no BGR2RGB flip)."""
    cells = _load_cells(f"{REF}/OutImgs/601_bad_bounce_3/10")[:32]
    rgba = preprocess_cells_rgba(cells, rb_swap=False)
    _, hue = dominant_hue_k1(rgba)
    for i, img in enumerate(cells):
        img = img.copy()
        img[img < 30] = 0
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        _, alpha = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY)
        flat = cv2.merge(list(cv2.split(img)) + [alpha], 4).reshape(-1, 4)
        cen = np.rint(flat.astype(np.float64).mean(axis=0))
        px = np.array([[[cen[0], cen[1], cen[2]]]], dtype=np.uint8)
        want = cv2.cvtColor(px, cv2.COLOR_BGR2HSV)[0, 0, 0]
        assert int(np.asarray(hue)[i]) == int(want), f"cell {i}"


def _reference_grid_mean_oracle(frame_bgr: np.ndarray, rows: int, cols: int):
    """Literal numpy/cv2 emulation of overlayGridAndComputeAvgColor's mean
    path (`drawGridsAndOutputCSV.py:75-106`): in-place rectangle draws
    between cell means."""
    f = frame_bgr.copy()
    h, w = f.shape[:2]
    ys, xs = h // rows, w // cols
    hues = []
    for y in range(rows):
        for x in range(cols):
            x1, y1 = x * xs, y * ys
            x2, y2 = min(x1 + xs, w), min(y1 + ys, h)
            roi = f[y1:y2, x1:x2]
            mean = np.mean(roi, axis=(0, 1)).astype(np.uint8)
            hsv = cv2.cvtColor(np.array([[mean]]), cv2.COLOR_BGR2HSV)[0, 0]
            hues.append(float(hsv[0]))
            cv2.rectangle(f, (x1, y1), (x2, y2), (255, 255, 255), 1)
    return np.array(hues, dtype=np.float32)


def test_grid_mean_hue_matches_reference_semantics():
    frame = RNG.integers(0, 256, size=(140, 250, 3), dtype=np.uint8)
    grid = GridParams(rows=14, cols=25)
    want = _reference_grid_mean_oracle(frame, 14, 25)
    got = np.asarray(grid_mean_hue(frame, grid))
    np.testing.assert_array_equal(got, want)


def test_grid_mean_hue_10x10():
    frame = RNG.integers(0, 256, size=(100, 100, 3), dtype=np.uint8)
    grid = GridParams(rows=10, cols=10)
    want = _reference_grid_mean_oracle(frame, 10, 10)
    got = np.asarray(grid_mean_hue(frame, grid))
    np.testing.assert_array_equal(got, want)


def test_extract_cells_layout():
    frame = RNG.integers(0, 256, size=(2, 28, 50, 3), dtype=np.uint8)
    grid = GridParams(rows=2, cols=2)
    cells = np.asarray(extract_cells(frame, grid))
    assert cells.shape == (2, 4, 14, 25, 3)
    np.testing.assert_array_equal(cells[1, 2], frame[1, 14:28, 0:25])


def test_whiten_own_rectangle():
    cells = np.zeros((1, 4, 5, 6, 3), np.uint8)
    out = np.asarray(whiten_grid_lines(cells, GridParams(2, 2), own_rectangle=True))
    assert (out[..., 0, :, :] == 255).all() and (out[..., :, 0, :] == 255).all()
    assert (out[..., 1:, 1:, :] == 0).all()


def test_kmeans_matches_sklearn_quality():
    from sklearn.cluster import KMeans

    pts = np.concatenate(
        [
            RNG.normal((0, 0, 0, 0), 1, size=(200, 4)),
            RNG.normal((10, 0, 5, 0), 1, size=(150, 4)),
            RNG.normal((0, 12, 0, 3), 1, size=(120, 4)),
        ]
    ).astype(np.float32)
    sk = KMeans(n_clusters=3, n_init=10, random_state=0).fit(pts)
    import jax

    centers, labels = kmeans(pts, 3, jax.random.PRNGKey(0))
    def inertia(c, l):
        return float(((pts - np.asarray(c)[np.asarray(l)]) ** 2).sum())
    assert inertia(centers, labels) <= sk.inertia_ * 1.05


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data unavailable")
def test_matcher_reproduces_reference_cli():
    """findCosineDifferentVectors.py semantics on the real labeled CSVs."""
    sig = pd.read_csv(f"{REF}/bounce.csv", header=None).iloc[:, 1].values
    ser = pd.read_csv(f"{REF}/601_3_3_cropped.csv", header=None).iloc[:, 1].values

    # literal reference loop as oracle
    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return 0 if na == 0 or nb == 0 else float(np.dot(a, b) / (na * nb))

    max_sim, max_frame = -1.0, -1
    for i in range(len(ser) - len(sig) + 1):
        s = cos(sig.astype(float), ser[i : i + len(sig)].astype(float))
        max_sim = max(max_sim, s)
        if s == max_sim:
            max_frame = i

    got_sim, got_frame = match_signature(
        np.asarray(sig, np.float32), np.asarray(ser, np.float32)
    )
    assert abs(float(got_sim) - max_sim) < 1e-5
    assert int(got_frame) == max_frame
    sims = np.asarray(sliding_cosine_similarity(
        np.asarray(sig, np.float32), np.asarray(ser, np.float32)))
    assert sims.shape[0] == len(ser) - len(sig) + 1


def test_framewise_feature_path_equals_cell_tensor_path():
    """The frame-wise fused path (whiten_frame_lines + grid_cell_sums,
    used by the video pipeline) must be element-equal to the cell-tensor
    path (extract_cells + whiten_grid_lines + per-cell reduction) for both
    line semantics and both features — integer sums are association-free,
    so any difference is a masking/geometry bug."""
    from opticalflowclustering_tpu.features.dominant_color import (
        dominant_hue_k1_frames,
    )
    from opticalflowclustering_tpu.features.grid import (
        grid_cell_sums,
        whiten_frame_lines,
    )

    # Both a divisible and a remainder geometry (720/14 leaves a remainder).
    for h, w, grid in [(72, 100, GridParams(4, 5)), (73, 103, GridParams(4, 5))]:
        frames = RNG.integers(0, 256, (3, h, w, 3), dtype=np.uint8)
        for own in (True, False):
            cells = whiten_grid_lines(
                extract_cells(frames, grid), grid, own_rectangle=own
            )
            want = np.asarray(cells).astype(np.int64).sum(axis=(-3, -2))
            got = np.asarray(
                grid_cell_sums(
                    whiten_frame_lines(frames, grid, own_rectangle=own), grid
                )
            )
            np.testing.assert_array_equal(got, want)

        for rb_swap in (True, False):
            cells = whiten_grid_lines(
                extract_cells(frames, grid), grid, own_rectangle=True
            )
            cen_want, hue_want = dominant_hue_k1(
                preprocess_cells_rgba(cells, rb_swap=rb_swap)
            )
            cen_got, hue_got = dominant_hue_k1_frames(
                frames, grid, rb_swap=rb_swap
            )
            np.testing.assert_array_equal(np.asarray(cen_got), np.asarray(cen_want))
            np.testing.assert_array_equal(np.asarray(hue_got), np.asarray(hue_want))
