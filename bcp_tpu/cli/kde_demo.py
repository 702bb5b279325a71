"""KDE feature-distribution demo — mirrors `code/KDE_demo.py`.

Loads a trained ACDC U-Net, extracts the last decoder feature map
(`x_last`, the reference's `x8_up` / decoder feature at `KDE_demo.py:165`),
collects per-class feature vectors from labeled and unlabeled volumes, and
plots per-class kernel-density estimates of the feature-norm distributions
(the reference uses seaborn; matplotlib + scipy gaussian_kde here).
"""

from __future__ import annotations

import argparse

import numpy as np
from scipy import ndimage
from scipy.stats import gaussian_kde

import jax
import jax.numpy as jnp

from bcp_tpu.cli.common import load_eval_variables, snapshot_dir
from bcp_tpu.config import acdc_config
from bcp_tpu.data.datasets import ACDCDataset
from bcp_tpu.train.checkpoints import best_model_path


def build_parser():
    p = argparse.ArgumentParser(description="KDE feature demo (TPU)")
    p.add_argument("--root_path", type=str, default="./data/ACDC")
    p.add_argument("--exp", type=str, default="BCP")
    p.add_argument("--model", type=str, default="unet")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--labelnum", type=int, default=7)
    p.add_argument("--stage_name", type=str, default="self_train")
    p.add_argument("--snapshot_root", type=str, default="./model/BCP")
    p.add_argument("--max_slices", type=int, default=64)
    p.add_argument("--out", type=str, default="kde_features.png")
    return p


def extract_features(model, variables, image: np.ndarray,
                     patch=(256, 256)):
    """Per-slice decoder features + argmax prediction."""
    feats, preds = [], []
    for ind in range(image.shape[0]):
        sl = image[ind]
        x, y = sl.shape
        sl = ndimage.zoom(sl, (patch[0] / x, patch[1] / y), order=0)
        logits, f = model.apply(variables,
                                jnp.asarray(sl[None, ..., None],
                                            jnp.float32), train=False)
        feats.append(np.asarray(f[0]))
        preds.append(np.argmax(np.asarray(logits[0]), axis=-1))
    return np.stack(feats), np.stack(preds)


def plot_kde(per_class_feats, out_path, n_classes):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, n_classes - 1,
                             figsize=(4 * (n_classes - 1), 3.2))
    if n_classes - 1 == 1:
        axes = [axes]
    for c in range(1, n_classes):
        ax = axes[c - 1]
        for split, vals in per_class_feats.get(c, {}).items():
            if len(vals) < 10:
                continue
            kde = gaussian_kde(vals)
            xs = np.linspace(min(vals), max(vals), 200)
            ax.plot(xs, kde(xs), label=split)
            ax.fill_between(xs, kde(xs), alpha=0.3)
        ax.set_title(f"class {c}")
        ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print(f"saved {out_path}")


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = acdc_config(labelnum=args.labelnum).replace(
        root_path=args.root_path, exp=args.exp, net_type=args.model,
        num_classes=args.num_classes, snapshot_root=args.snapshot_root)
    ckpt = best_model_path(snapshot_dir(cfg, args.stage_name), cfg.net_type)
    model, variables = load_eval_variables(cfg, ckpt)

    from bcp_tpu.data.feed import labeled_count
    ds = ACDCDataset(cfg.root_path, "train")
    n_lab = labeled_count(cfg, len(ds))
    rng = np.random.default_rng(0)
    lab_ids = rng.permutation(n_lab)[:args.max_slices // 2]
    unlab_ids = n_lab + rng.permutation(len(ds) - n_lab)[
        :args.max_slices // 2]

    per_class = {c: {"labeled": [], "unlabeled": []}
                 for c in range(1, cfg.num_classes)}
    for split, ids in [("labeled", lab_ids), ("unlabeled", unlab_ids)]:
        for i in ids:
            image, _ = ds.load(int(i))
            feats, pred = extract_features(
                model, variables, image[None], cfg.patch_size)
            norms = np.linalg.norm(feats[0], axis=-1)
            for c in range(1, cfg.num_classes):
                sel = pred[0] == c
                if sel.any():
                    vals = norms[sel]
                    take = min(len(vals), 500)
                    per_class[c][split].extend(
                        rng.choice(vals, take, replace=False).tolist())
    plot_kde(per_class, args.out, cfg.num_classes)


if __name__ == "__main__":
    main()
