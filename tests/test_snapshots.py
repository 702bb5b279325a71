"""Reference-faithful TensorBoard image snapshots (train/snapshots.py):
grid geometry, key-exactness of the recomputed mixes, per-variant tags,
and the trainer integration incl. the ACDC ulab side-channel."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcp_tpu.config import acdc_config, la_config
from bcp_tpu.models import create_model
from bcp_tpu.ops import masks
from bcp_tpu.train import build_optimizer, init_state
from bcp_tpu.train import snapshots
from bcp_tpu.train.steps import _sample_mask, make_selftrain_step


def test_la_snapshot_grid_geometry():
    """(H,W,D) panels -> (D, 3, 3H+3w, W+w) with the reference's white
    separators and row placement (`LA_BCP_train.py:296-321`)."""
    H, W, D, w = 8, 6, 3, snapshots.INS_WIDTH
    img = np.linspace(0, 2, H * W * D).reshape(H, W, D).astype(np.float32)
    lab = np.zeros((H, W, D), np.float32)
    lab[2, 3, 1] = 1.0
    prob = np.full((H, W, D), 0.25, np.float32)
    g = snapshots.la_snapshot_grid(img, lab, prob)
    assert g.shape == (D, 3, 3 * H + 3 * w, W + w)
    # separators all-white
    assert (g[:, :, H:H + w, :] == 1).all()
    assert (g[:, :, 2 * H + w:2 * H + 2 * w, :] == 1).all()
    assert (g[:, :, 3 * H + 2 * w:3 * H + 3 * w, :] == 1).all()
    assert (g[:, :, :, W:W + w] == 1).all()
    # row 0: min-max normalised input, replicated over RGB
    expect = (img - img.min()) / (img.max() - img.min())
    np.testing.assert_allclose(g[:, 0, :H, :W], expect.transpose(2, 0, 1),
                               rtol=1e-6)
    np.testing.assert_array_equal(g[:, 0, :H, :W], g[:, 2, :H, :W])
    # row 1: target at its z-slice
    assert g[1, 0, H + w + 2, 3] == 1.0
    # row 2: probability row
    np.testing.assert_allclose(
        g[:, 1, 2 * H + 2 * w:3 * H + 2 * w, :W], 0.25)


def _tiny_la_setup():
    cfg = la_config().replace(patch_size=(16, 16, 16), batch_size=4,
                              labeled_bs=2, n_filters=4)
    model = create_model(cfg.net_type, cfg.num_classes, n_filters=4)
    tx = build_optimizer(cfg, "self")
    state = init_state(model, cfg, jax.random.PRNGKey(0), tx)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    s = cfg.labeled_sub_bs
    u = cfg.unlabeled_sub_bs
    sp = cfg.patch_size
    batch = {
        "img_a": jax.random.normal(ks[0], (s, *sp, 1)),
        "img_b": jax.random.normal(ks[1], (s, *sp, 1)),
        "lab_a": jax.random.randint(ks[2], (s, *sp), 0, 2),
        "lab_b": jax.random.randint(ks[3], (s, *sp), 0, 2),
        "uimg_a": jax.random.normal(ks[4], (u, *sp, 1)),
        "uimg_b": jax.random.normal(ks[5], (u, *sp, 1)),
    }
    return cfg, model, tx, state, batch


def test_la_snapshot_mix_matches_step_key():
    """The snapshot's mixed input is byte-identical to what the step
    builds from the same fold_in key (same mask sample)."""
    cfg, model, tx, state, batch = _tiny_la_setup()
    key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1), 201)
    snap = snapshots.make_la_snapshot_fn(model, model, cfg)
    panels = snap(state, batch, key)
    assert set(panels) == {"mixl_img", "mixl_lab", "mixl_prob",
                           "mixu_img", "mixu_lab", "mixu_prob"}
    # recompute the mask exactly as the step does
    mask_key, _, _ = jax.random.split(key, 3)
    mask = _sample_mask(cfg, mask_key)
    expect = masks.mix(batch["img_a"], batch["uimg_a"], mask)[0, ..., 0]
    np.testing.assert_array_equal(np.asarray(panels["mixl_img"]),
                                  np.asarray(expect, np.float32))
    # probs are softmax values
    p = np.asarray(panels["mixl_prob"])
    assert p.shape == cfg.patch_size and (p >= 0).all() and (p <= 1).all()
    # the label row mixes lab_a with the teacher pseudo-label: inside the
    # mask cuboid (mask==1) it equals lab_a
    lab_panel = np.asarray(panels["mixl_lab"])
    m = np.asarray(mask)
    np.testing.assert_array_equal(lab_panel[m == 1],
                                  np.asarray(batch["lab_a"][0])[m == 1])


def test_acdc_snapshot_tags_and_content():
    cfg = acdc_config().replace(patch_size=(16, 16), batch_size=8,
                                labeled_bs=4, n_filters=4)
    model = create_model(cfg.net_type, cfg.num_classes, n_filters=4)
    tx = build_optimizer(cfg, "pre")
    state = init_state(model, cfg, jax.random.PRNGKey(0), tx)
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    s = cfg.labeled_sub_bs
    u = cfg.unlabeled_sub_bs
    sp = cfg.patch_size
    batch = {
        "img_a": jax.random.normal(ks[0], (s, *sp, 1)),
        "img_b": jax.random.normal(ks[1], (s, *sp, 1)),
        "lab_a": jax.random.randint(ks[2], (s, *sp), 0, 4),
        "lab_b": jax.random.randint(ks[3], (s, *sp), 0, 4),
    }
    key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 20)
    snap = snapshots.make_acdc_snapshot_fn(model, model, cfg, "pre")
    panels = snap(state, batch, key)
    assert set(panels) == {"pre_train/Mixed_Image",
                           "pre_train/Mixed_Prediction",
                           "pre_train/Mixed_GroundTruth"}
    # GroundTruth is the mixed label x 50, sample index 1
    mask_key, _ = jax.random.split(key)
    mask = _sample_mask(cfg, mask_key)
    gt = masks.mix(batch["lab_a"], batch["lab_b"], mask)[1] * 50
    np.testing.assert_array_equal(
        np.asarray(panels["pre_train/Mixed_GroundTruth"]), np.asarray(gt))

    # self stage: six tags, true-label mixes from the ulab side channel
    batch["uimg_a"] = jax.random.normal(ks[4], (u, *sp, 1))
    batch["uimg_b"] = jax.random.normal(ks[5], (u, *sp, 1))
    ulab_a = jax.random.randint(ks[6], (u, *sp), 0, 4)
    ulab_b = jax.random.randint(ks[7], (u, *sp), 0, 4)
    key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1), 20)
    snap = snapshots.make_acdc_snapshot_fn(model, model, cfg, "self")
    panels = snap(state, batch, key, ulab_a, ulab_b)
    assert set(panels) == {"train/Un_Image", "train/Un_Prediction",
                           "train/Un_GroundTruth", "train/L_Image",
                           "train/L_Prediction", "train/L_GroundTruth"}
    mask_key, _, _ = jax.random.split(key, 3)
    mask = _sample_mask(cfg, mask_key)
    unl = masks.mix(ulab_a, batch["lab_a"], mask)[1] * 50
    np.testing.assert_array_equal(
        np.asarray(panels["train/Un_GroundTruth"]), np.asarray(unl))


def test_trainer_snapshot_cadence_and_integration(tmp_path_factory):
    """log_images=True on a tiny ACDC run writes the reference tags into
    the TB event files (every-20 cadence means iteration 20 with 20
    iterations)."""
    from bcp_tpu.config import acdc_config
    from bcp_tpu.data import feed, synthetic
    from bcp_tpu.train.trainer import BCPTrainer

    root = synthetic.make_acdc_dataset(
        str(tmp_path_factory.mktemp("acdc_snap_data")), n_train_slices=16,
        n_val=1, slice_shape=(32, 32))
    feed.ACDC_PATIENTS_TO_SLICES[1] = 8
    cfg = acdc_config(labelnum=1).replace(
        root_path=root, patch_size=(32, 32), batch_size=8, labeled_bs=4,
        n_filters=4, pre_iterations=20, self_iterations=20, eval_every=20,
        log_every=20,
        snapshot_root=str(tmp_path_factory.mktemp("acdc_snap_out")))
    trainer = BCPTrainer(cfg, log_images=True)
    assert trainer._snapshot_due(20, "pre")
    assert not trainer._snapshot_due(21, "pre")
    trainer.pretrain()
    trainer.selftrain()

    # scan event files for the expected tags
    try:
        from tensorboard.backend.event_processing import event_accumulator
    except ImportError:
        pytest.skip("tensorboard reader unavailable")
    tags = set()
    for d in ("pre_train", "self_train"):
        log_dir = os.path.join(cfg.snapshot_root,
                               "ACDC_BCP_1_labeled", d, "log")
        for sub in glob.glob(os.path.join(log_dir, "**"), recursive=True):
            if os.path.isdir(sub):
                ea = event_accumulator.EventAccumulator(sub)
                ea.Reload()
                tags.update(ea.Tags().get("images", []))
    assert any(t.startswith("pre_train/Mixed_Image") for t in tags), tags
    assert any(t.startswith("train/Un_Prediction") for t in tags), tags
