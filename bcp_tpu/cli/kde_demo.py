"""KDE feature-distribution demo — the reference protocol
(`code/KDE_demo.py:66-191`).

Loads a trained ACDC U-Net and iterates two-stream train batches
(labeled_bs labeled slices first, then unlabeled — `KDE_demo.py:127-129`).
Per batch, one *batched* device forward yields logits and the last decoder
feature map (the reference's ``x8_up``, `KDE_demo.py:137-165`); pixels are
flattened to ``(B*H*W, f_dim)`` rows. For a class ``c`` the demo then

- selects the **correctly predicted** pixels — the intersection of
  ``pred == c`` and ``label == c`` row indices, separately for the labeled
  (first) and unlabeled (second) half (`KDE_demo.py:74-76`);
- truncates both sides to ``min(n_labeled, n_unlabeled, p_num=500)``
  (`KDE_demo.py:78`);
- takes each selected pixel's feature **mean over the feature dim**
  (`KDE_demo.py:83`);
- KDE-plots labeled (green) vs unlabeled (blue) distributions
  (seaborn ``kdeplot(bw_adjust=0.5)``; here scipy ``gaussian_kde`` with
  Scott bandwidth x 0.5 — the same estimate) into the reference's output
  tree ``KDE/ACDC/{f_dim}/labeled_{N}/class_{c}/kde_test_mean{pic}_{N}_{c}
  .png`` (`KDE_demo.py:70,103`).

TPU-native deltas: the four slices forward as ONE batch (the reference
dispatches the torch DataLoader's batch too, so this is like-for-like), and
labels are nearest-zoomed if the feature map's spatial dims differ from the
input (the reference cv2.resizes, which is an identity at its 256^2
config — `KDE_demo.py:172-175`).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from scipy import ndimage
from scipy.stats import gaussian_kde

import jax.numpy as jnp

from bcp_tpu.cli.common import load_eval_variables, snapshot_dir
from bcp_tpu.config import acdc_config
from bcp_tpu.data.datasets import ACDCDataset
from bcp_tpu.data.sampler import TwoStreamBatchSampler
from bcp_tpu.train.checkpoints import best_model_path

# `KDE_demo.py:45-47`
P_NUM = 500
BW_ADJUST = 0.5
LINE_WIDTH = 5


def build_parser():
    p = argparse.ArgumentParser(description="KDE feature demo (TPU)")
    p.add_argument("--root_path", type=str, default="./data/ACDC")
    p.add_argument("--exp", type=str, default="BCP")
    p.add_argument("--model", type=str, default="unet")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--labelnum", type=int, default=7)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--labeled_bs", type=int, default=2)
    p.add_argument("--stage_name", type=str, default="self_train")
    p.add_argument("--snapshot_root", type=str, default="./model/BCP")
    p.add_argument("--epochs", type=int, default=3,
                   help="passes over the labeled stream (KDE_demo.py:130)")
    p.add_argument("--max_pics", type=int, default=0,
                   help="stop after this many batches (0 = no cap)")
    p.add_argument("--specific_class", type=int, default=2,
                   help="class to plot (the reference hardcodes 2, "
                        "KDE_demo.py:188)")
    p.add_argument("--out_dir", type=str, default=".",
                   help="root for the KDE/ACDC/... output tree")
    p.add_argument("--seed", type=int, default=1337)
    return p


def select_correct_pixels(pred_rows: np.ndarray, label_rows: np.ndarray,
                          cls: int, labeled_pixel: int):
    """Row indices of *correctly predicted* class-``cls`` pixels, split at
    ``labeled_pixel`` (`KDE_demo.py:74-76`): the intersection of the
    prediction's and the label's class-``cls`` coordinates per half;
    unlabeled indices are shifted back into global row space."""
    l_pred = np.where(pred_rows[:labeled_pixel] == cls)[0]
    u_pred = np.where(pred_rows[labeled_pixel:] == cls)[0]
    l_lab = np.where(label_rows[:labeled_pixel] == cls)[0]
    u_lab = np.where(label_rows[labeled_pixel:] == cls)[0]
    cor_l = np.intersect1d(l_pred, l_lab)
    cor_u = np.intersect1d(u_pred, u_lab) + labeled_pixel
    return cor_l, cor_u


def plot_kde(features: np.ndarray, pred_rows: np.ndarray,
             label_rows: np.ndarray, specific_c: int, f_dim: int,
             pic_num: int, labelnum: int, out_dir: str = "."):
    """`plot_kde` (`KDE_demo.py:66-103`): features ``(P, f_dim)`` rows,
    pred/label ``(P,)`` rows with the labeled half first. Returns the
    saved path, or None when fewer than 2 correct pixels exist on either
    side (a KDE needs >= 2 points; the reference would crash)."""
    total_pixel = features.shape[0]
    labeled_pixel = int(total_pixel / 2) + 1        # `KDE_demo.py:68`
    cor_l, cor_u = select_correct_pixels(pred_rows, label_rows,
                                         specific_c, labeled_pixel)
    pixel_num = min(len(cor_l), len(cor_u), P_NUM)  # `KDE_demo.py:78`
    print(f"Total {pixel_num} pixels for class {specific_c}")
    if pixel_num < 2:
        return None
    # per-pixel feature mean over the feature dim (`KDE_demo.py:83`)
    feat_l = features[cor_l[:pixel_num]].mean(axis=1)
    feat_u = features[cor_u[:pixel_num]].mean(axis=1)

    save_dir = os.path.join(
        out_dir, "KDE", "ACDC", str(f_dim), f"labeled_{labelnum}",
        f"class_{specific_c}")
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(
        save_dir, f"kde_test_mean{pic_num}_{labelnum}_{specific_c}.png")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(29, 4))
    ax = fig.add_subplot(1, 1, 1)
    for vals, color in [(feat_l, "g"), (feat_u, "b")]:
        kde = gaussian_kde(vals)
        kde.set_bandwidth(kde.factor * BW_ADJUST)   # seaborn bw_adjust
        lo, hi = vals.min(), vals.max()
        pad = 3 * kde.factor * (vals.std() or 1.0)
        xs = np.linspace(lo - pad, hi + pad, 200)
        ax.plot(xs, kde(xs), color=color, linewidth=LINE_WIDTH)
    ax.set_ylabel(" ")
    ax.set_title("BCP")
    fig.savefig(path)
    plt.close(fig)
    print(f"Save to: {path}")
    return path


def batch_rows(model, variables, images: np.ndarray, labels: np.ndarray):
    """One batched forward; returns flattened per-pixel
    (features (P,f_dim), pred (P,), label (P,)) rows in batch order —
    `KDE_demo.py:165-184` with the per-batch device crossing batched."""
    logits, feats = model.apply(
        variables, jnp.asarray(images[..., None], jnp.float32),
        train=False)
    pred = np.asarray(jnp.argmax(logits, axis=-1))
    feats = np.asarray(feats, np.float32)
    b, x_, y_, f_dim = feats.shape
    if labels.shape[1:] != (x_, y_):
        # the reference cv2.resizes labels to the feature dims
        # (`KDE_demo.py:172-175`) — identity at its 256^2 config
        zoom = (1, x_ / labels.shape[1], y_ / labels.shape[2])
        labels = ndimage.zoom(labels, zoom, order=0)
    return (feats.reshape(-1, f_dim), pred.reshape(-1),
            labels.reshape(-1).astype(np.int32), f_dim)


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = acdc_config(labelnum=args.labelnum).replace(
        root_path=args.root_path, exp=args.exp, net_type=args.model,
        num_classes=args.num_classes, snapshot_root=args.snapshot_root,
        batch_size=args.batch_size, labeled_bs=args.labeled_bs)
    ckpt = best_model_path(snapshot_dir(cfg, args.stage_name), cfg.net_type)
    model, variables = load_eval_variables(cfg, ckpt)

    from bcp_tpu.data.feed import labeled_count
    ds = ACDCDataset(cfg.root_path, "train")
    n_lab = labeled_count(cfg, len(ds))
    print(f"Total slices is: {len(ds)}, labeled slices is:{n_lab}")
    sampler = TwoStreamBatchSampler(
        list(range(n_lab)), list(range(n_lab, len(ds))),
        args.batch_size, args.batch_size - args.labeled_bs, seed=args.seed)
    rng = np.random.default_rng(args.seed)

    pic = 0
    for _ in range(args.epochs):
        for lab_ids, unlab_ids in sampler.epoch():
            imgs, labs = [], []
            for i in list(lab_ids) + list(unlab_ids):
                im, lb = ds.sample_train(int(i), cfg.patch_size, rng)
                imgs.append(im)
                labs.append(lb)
            feats, pred, label, f_dim = batch_rows(
                model, variables, np.stack(imgs), np.stack(labs))
            plot_kde(feats, pred, label, args.specific_class, f_dim, pic,
                     args.labelnum, args.out_dir)
            pic += 1
            if args.max_pics and pic >= args.max_pics:
                return


if __name__ == "__main__":
    main()
