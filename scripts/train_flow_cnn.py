"""Train FlowCellNet on the reference tree's real labeled footage and write
the committed weights (opticalflowclustering_tpu/models/flow_cnn_weights.npz).

Data: 50×50 flow-rendered cells that actually contain motion (mean
intensity > 2 — most grid cells of both sources are black/static and say
nothing about either class):

  label 1  k-means-color-clustering/images/601_3_50x50/   (bounce clip)
  label 0  k-means-color-clustering/Non-bounce/NoBounce_{1,2}/

Deterministic: seeded PRNG + fixed shuffle + a fixed holdout rule (every
7th motion crop per directory, by sorted order — tests/test_flow_cnn.py
evaluates on exactly that slice), so re-running reproduces the committed
npz.

Usage: python scripts/train_flow_cnn.py [--ref /root/reference]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HOLDOUT_STRIDE = 7
MOTION_MEAN = 2.0


def load_motion_crops(d: str) -> tuple[np.ndarray, np.ndarray]:
    """(train, holdout) stacks of the directory's motion crops."""
    import cv2

    train, hold = [], []
    kept = 0
    for n in sorted(os.listdir(d)):
        im = cv2.imread(os.path.join(d, n))
        if im is None or im.shape != (50, 50, 3) or im.mean() <= MOTION_MEAN:
            continue
        (hold if kept % HOLDOUT_STRIDE == 0 else train).append(im)
        kept += 1
    return np.stack(train), np.stack(hold)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    from opticalflowclustering_tpu.models.flow_cnn import (
        classify_cells,
        save_params,
        train_flow_cnn,
    )

    kdir = os.path.join(args.ref, "k-means-color-clustering")
    pos_tr, pos_ho = load_motion_crops(
        os.path.join(kdir, "images", "601_3_50x50")
    )
    neg1_tr, neg1_ho = load_motion_crops(
        os.path.join(kdir, "Non-bounce", "NoBounce_1")
    )
    neg2_tr, neg2_ho = load_motion_crops(
        os.path.join(kdir, "Non-bounce", "NoBounce_2")
    )
    tr_x = np.concatenate([pos_tr, neg1_tr, neg2_tr])
    tr_y = np.concatenate(
        [
            np.ones(len(pos_tr), np.int32),
            np.zeros(len(neg1_tr) + len(neg2_tr), np.int32),
        ]
    )
    ho_x = np.concatenate([pos_ho, neg1_ho, neg2_ho])
    ho_y = np.concatenate(
        [
            np.ones(len(pos_ho), np.int32),
            np.zeros(len(neg1_ho) + len(neg2_ho), np.int32),
        ]
    )
    print(f"train {len(tr_x)} (pos {tr_y.sum()}), holdout {len(ho_x)} "
          f"(pos {ho_y.sum()})")

    params, train_acc = train_flow_cnn(
        tr_x, tr_y, epochs=args.epochs, batch=args.batch
    )
    preds = classify_cells(params, ho_x).argmax(-1)
    ho_acc = float((preds == ho_y).mean())
    pos_acc = float((preds[ho_y == 1] == 1).mean())
    neg_acc = float((preds[ho_y == 0] == 0).mean())
    print(f"final-epoch train acc {train_acc:.4f}, holdout acc {ho_acc:.4f} "
          f"(pos {pos_acc:.4f} / neg {neg_acc:.4f})")
    save_params(params)
    print("weights written")


if __name__ == "__main__":
    main()
