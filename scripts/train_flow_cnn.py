"""Train FlowCellNet on the reference tree's real labeled footage and write
the committed weights (opticalflowclustering_tpu/models/flow_cnn_weights.npz).

Deterministic: seeded PRNG + fixed shuffle, so re-running reproduces the
committed npz. Data (all real flow-rendered 50×50 crops):

  label 1  k-means-color-clustering/images/601_3_50x50/   (bounce clip)
  label 0  k-means-color-clustering/Non-bounce/NoBounce_{1,2}/

Usage: python scripts/train_flow_cnn.py [--ref /root/reference] [--cap 4000]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_dir(d: str, cap: int) -> np.ndarray:
    import cv2

    names = sorted(os.listdir(d))[:cap]
    out = []
    for n in names:
        im = cv2.imread(os.path.join(d, n))
        if im is not None and im.shape == (50, 50, 3):
            out.append(im)
    return np.stack(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--cap", type=int, default=4000, help="max crops/class dir")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--holdout", type=int, default=512)
    args = ap.parse_args()

    from opticalflowclustering_tpu.models.flow_cnn import (
        save_params,
        train_flow_cnn,
    )

    kdir = os.path.join(args.ref, "k-means-color-clustering")
    pos = load_dir(os.path.join(kdir, "images", "601_3_50x50"), args.cap)
    neg = np.concatenate(
        [
            load_dir(os.path.join(kdir, "Non-bounce", "NoBounce_1"), args.cap),
            load_dir(os.path.join(kdir, "Non-bounce", "NoBounce_2"), args.cap),
        ]
    )
    images = np.concatenate([pos, neg])
    labels = np.concatenate(
        [np.ones(len(pos), np.int32), np.zeros(len(neg), np.int32)]
    )
    rng = np.random.default_rng(1234)
    order = rng.permutation(len(images))
    images, labels = images[order], labels[order]
    ho_x, ho_y = images[: args.holdout], labels[: args.holdout]
    tr_x, tr_y = images[args.holdout :], labels[args.holdout :]
    print(f"train {len(tr_x)} (pos {tr_y.sum()}), holdout {len(ho_x)}")

    params, train_acc = train_flow_cnn(tr_x, tr_y, epochs=args.epochs)
    from opticalflowclustering_tpu.models.flow_cnn import classify_cells

    preds = classify_cells(params, ho_x).argmax(-1)
    ho_acc = float((preds == ho_y).mean())
    print(f"final-epoch train acc {train_acc:.4f}, holdout acc {ho_acc:.4f}")
    save_params(params)
    print("weights written")


if __name__ == "__main__":
    main()
