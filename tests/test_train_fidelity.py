"""One-step TRAINING fidelity against the reference's own torch trainer.

`test_convert.py` proves eval-side parity (same weights -> same logits
through the reference's own eval loops). This closes the other direction
(VERDICT r4 #4): starting from identical weights and an identical (batch,
mask) input, one full training update of the reference's torch pipeline —
forward(s), loss, backward, SGD(momentum, weight_decay), EMA — must match
our jitted step's loss values and per-tensor parameter deltas within
float32 tolerance.

Reference flows replicated verbatim on torch-cpu:
- LA pre-train  (`LA_BCP_train.py:148-170`) and self-train
  (`LA_BCP_train.py:239-270`), with `mix_loss` / `mask_DiceLoss` imported
  from the reference's own `utils/BCP_utils.py` / `utils/losses.py`;
  `get_cut_mask`/`LargestCC_pancreas` are transcribed below
  (`LA_BCP_train.py:57-77`) because that module parses argv at import.
- ACDC pre-train (`ACDC_BCP_train.py:242-255`) and self-train
  (`ACDC_BCP_train.py:358-390`), with its module-level `mix_loss`
  (`ACDC_BCP_train.py:167-180`) and `get_ACDC_masks`/2DLargestCC
  (`ACDC_BCP_train.py:88-117`) transcribed for the same reason, on the
  reference's own `losses.DiceLoss`.

The shared cuboid mask is drawn exactly as the jitted step draws it
(same key split as `train/steps.py`) and fed to the torch side, so both
trainers consume bit-identical masks; dropout is disabled on both sides
(the only stochastic element the two frameworks cannot share).

Documented divergences asserted around, not hidden:
- fuse_subbatches=False here (the reference's two sequential forwards;
  the 2-group fused-BN equivalence has its own tests);
- the torch teacher's BN *buffers* drift during its no-grad train-mode
  forwards (in-place torch semantics) while ours are discarded — never
  read by either trainer (train-mode BN uses batch stats), so teacher
  comparison is params-only;
- the whole comparison runs in float64 on BOTH sides (torch .double(),
  jax_enable_x64 via fixture): in f32 the V-Net's BN chains amplify
  reassociation noise to several % of the small deep-layer deltas,
  drowning the signal; in f64 every per-tensor delta agrees to <0.1%.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from scipy import ndimage  # noqa: E402

pytestmark = pytest.mark.slow


@pytest.fixture()
def x64():
    """Run jax in double precision for the duration of one test (the
    torch side runs .double() too) and restore f32 afterwards."""
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


def sk_label(x):
    """skimage.measure.label(x) stand-in (skimage is absent here):
    scipy.ndimage.label with FULL connectivity — skimage's default —
    and the same raster-order label numbering, so the
    argmax(bincount) tie-break matches."""
    labels, _ = ndimage.label(x, structure=np.ones((3,) * x.ndim, bool))
    return labels

_REF = "/root/reference/code"
_REF_MODULES = {}


def _ref_module(subpath: str, name: str):
    if subpath in _REF_MODULES:
        sys.modules[name] = _REF_MODULES[subpath]
        return _REF_MODULES[subpath]
    import importlib.util
    # BCP_utils.py does `from turtle import pd` (needs tkinter) and
    # imports skimage.segmentation (absent here, unused by mix_loss /
    # update_ema_variables) — stub both
    if "turtle" not in sys.modules:
        t = types.ModuleType("turtle")
        t.pd = None
        sys.modules["turtle"] = t
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        seg = types.ModuleType("skimage.segmentation")
        sk.segmentation = seg
        sys.modules["skimage"] = sk
        sys.modules["skimage.segmentation"] = seg
    if _REF not in sys.path:
        sys.path.insert(0, _REF)     # for `from utils.losses import ...`
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REF, subpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    _REF_MODULES[subpath] = mod
    return mod


def _largest_cc(binary_np):
    """`LargestCC_pancreas` body (`LA_BCP_train.py:65-77`), minus .cuda()."""
    labels = sk_label(binary_np)
    if labels.max() != 0:
        return labels == np.argmax(np.bincount(labels.flat)[1:]) + 1
    return binary_np


def _get_cut_mask_torch(out, thres=0.5):
    """`get_cut_mask(out, nms=1)` (`LA_BCP_train.py:57-63`)."""
    probs = torch.softmax(out, 1)
    masks = (probs >= thres).long()[:, 1]
    return torch.Tensor(
        np.stack([_largest_cc(masks[n].numpy())
                  for n in range(masks.shape[0])]))


def _get_acdc_masks_torch(out):
    """`get_ACDC_masks(out, nms=1)` (`ACDC_BCP_train.py:88-117`)."""
    probs = torch.argmax(torch.softmax(out, 1), dim=1)
    batch = []
    for i in range(probs.shape[0]):
        class_list = []
        for c in range(1, 4):
            temp = (probs[i] == c).long().numpy()
            labels = sk_label(temp)
            if labels.max() != 0:
                largest = labels == np.argmax(
                    np.bincount(labels.flat)[1:]) + 1
                class_list.append(largest * c)
            else:
                class_list.append(temp)
        batch.append(class_list[0] + class_list[1] + class_list[2])
    return torch.Tensor(np.stack(batch))


def _to_torch(x_np, spatial):
    """(N, *S, 1) channels-last -> torch NC*S."""
    perm = (0, x_np.ndim - 1) + tuple(range(1, 1 + spatial))
    return torch.from_numpy(np.asarray(x_np)).permute(*perm).contiguous()


def _snap_tree(tree):
    """Deep numpy copy: convert_state_dict's arrays can share memory
    with the LIVE torch tensors (zero-copy .numpy()), which the torch
    optimizer then mutates in place — snapshots must own their data."""
    return jax.tree_util.tree_map(lambda a: np.array(a, copy=True), tree)


def _state_with_torch_weights(model, cfg, tx, tmodel, net_type):
    """Build a TrainState whose student AND teacher carry tmodel's
    weights (the reference's stage hand-off loads both from one file,
    `LA_BCP_train.py:220-222`)."""
    from bcp_tpu.convert import convert_state_dict
    from bcp_tpu.train.state import init_state
    variables = convert_state_dict(tmodel.state_dict(), net_type)
    state = init_state(model, cfg, jax.random.PRNGKey(0), tx)
    params = _snap_tree(variables["params"])
    bs = _snap_tree(variables.get("batch_stats", state.batch_stats))
    return state.replace(
        params=params, batch_stats=bs,
        teacher_params=_snap_tree(params),
        teacher_batch_stats=_snap_tree(bs),
        opt_state=tx.init(params))


def _compare_deltas(params_before, params_after, conv_before, conv_after,
                    rtol=1e-3):
    """Per-tensor parameter-delta agreement: ours vs torch (converted),
    each leaf within rtol of the torch delta's own max magnitude."""
    pb = jax.tree_util.tree_leaves_with_path(params_before)
    pa = {jax.tree_util.keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(params_after)}
    cb = {jax.tree_util.keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(conv_before)}
    ca = {jax.tree_util.keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(conv_after)}
    assert set(pa) == set(ca)
    moved = 0
    biggest = 0.0
    for key, before in pb:
        k = jax.tree_util.keystr(key)
        ours = np.asarray(pa[k]) - np.asarray(before)
        ref = np.asarray(ca[k]) - np.asarray(cb[k])
        scale = float(np.abs(ref).max())
        err = float(np.abs(ours - ref).max())
        # rtol bounds the real comparison; the atol floor absorbs f64
        # rounding noise on leaves whose torch delta is (numerically)
        # zero — e.g. zero-init BN biases with ~0 gradients
        assert err <= max(rtol * scale, 1e-9), (
            f"{k}: delta mismatch {err:.3e} vs scale {scale:.3e}")
        if scale > 1e-9:
            moved += 1
            biggest = max(biggest, scale)
    # weight decay + real gradients move most tensors: guard the
    # comparison against vacuity (zero-init BN biases with ~0 gradients
    # legitimately sit still — ACDC's U-Net has 17 of 82 such leaves)
    assert moved >= 0.75 * len(pb)
    # the update itself was not a no-op (teacher EMA deltas are
    # 0.01x the student's, so the floor sits well below both)
    assert biggest > 1e-7


def _torch_sgd(tmodel, lr=0.01):
    # `LA_BCP_train.py:135` / `ACDC_BCP_train.py:223`
    return torch.optim.SGD(tmodel.parameters(), lr=lr, momentum=0.9,
                           weight_decay=1e-4)


# ---------------------------------------------------------------------------
# LA / V-Net family (3D)


def _la_setup():
    from bcp_tpu.config import la_config
    from bcp_tpu.models import create_model
    from bcp_tpu.train.state import build_optimizer
    # 48^3: the reference VNet's dead-feature maxpool (kernel 3 on x5,
    # `VNet.py:289`) needs a >=3^3 bottleneck
    cfg = la_config().replace(
        patch_size=(48, 48, 48), compute_dtype="float32",
        fuse_subbatches=False)
    ref_vnet = _ref_module("networks/VNet.py", "ref_vnet_fid")
    torch.manual_seed(7)
    tmodel = ref_vnet.VNet(n_channels=1, n_classes=2,
                           normalization="batchnorm",
                           has_dropout=False).double()
    tmodel.train()
    # mode='test' => has_dropout=False, matching the torch side; the
    # jitted steps still run it with train=True (BN batch stats + updates)
    model = create_model(cfg.net_type, cfg.num_classes, mode="test")
    tx = build_optimizer(cfg, "pre")
    return cfg, model, tx, tmodel


def _rand_batch(cfg, n_classes, with_unlabeled, seed=3):
    rng = np.random.default_rng(seed)
    S = cfg.patch_size
    sub, usub = cfg.labeled_sub_bs, cfg.unlabeled_sub_bs
    b = {"img_a": rng.normal(size=(sub, *S, 1)),
         "img_b": rng.normal(size=(sub, *S, 1)),
         "lab_a": rng.integers(0, n_classes, (sub, *S)).astype(np.uint8),
         "lab_b": rng.integers(0, n_classes, (sub, *S)).astype(np.uint8)}
    if with_unlabeled:
        b["uimg_a"] = rng.normal(size=(usub, *S, 1))
        b["uimg_b"] = rng.normal(size=(usub, *S, 1))
    return b


def test_la_pretrain_step_matches_torch(x64):
    """One LA pre-train update (`LA_BCP_train.py:148-170`): loss values
    and every parameter delta agree between the reference torch pipeline
    and the jitted step, from identical weights, batch and mask."""
    from bcp_tpu.convert import convert_state_dict
    from bcp_tpu.train.steps import _sample_mask, make_pretrain_step
    ref_losses = _ref_module("utils/losses.py", "ref_losses_fid")
    cfg, model, tx, tmodel = _la_setup()
    step = make_pretrain_step(model, tx, cfg)
    state = _state_with_torch_weights(model, cfg, tx, tmodel, "VNet")
    conv_before = _snap_tree(convert_state_dict(tmodel.state_dict(), "VNet")["params"])
    batch = _rand_batch(cfg, 2, with_unlabeled=False)

    key = jax.random.PRNGKey(11)
    state2, metrics = step(state, jax.device_put(batch), key)

    # identical mask: the step splits (mask_key, drop_key) and samples
    # in-graph (`train/steps.py`); reproduce the draw on the host
    mask_key, _ = jax.random.split(key)
    mask_np = np.asarray(_sample_mask(cfg, mask_key))

    opt = _torch_sgd(tmodel)
    DICE = ref_losses.mask_DiceLoss(nclass=2)
    m = torch.from_numpy(mask_np)                      # (X, Y, Z)
    img_a = _to_torch(batch["img_a"], 3)
    img_b = _to_torch(batch["img_b"], 3)
    lab_a = torch.from_numpy(batch["lab_a"]).long()
    lab_b = torch.from_numpy(batch["lab_b"]).long()
    volume_batch = img_a * m + img_b * (1 - m)
    label_batch = lab_a * m.long() + lab_b * (1 - m.long())
    outputs, _ = tmodel(volume_batch)
    loss_ce = torch.nn.functional.cross_entropy(outputs, label_batch)
    loss_dice = DICE(outputs, label_batch)
    loss = (loss_ce + loss_dice) / 2
    opt.zero_grad()
    loss.backward()
    opt.step()

    assert float(metrics["loss_ce"]) == pytest.approx(float(loss_ce),
                                                      rel=1e-6)
    assert float(metrics["loss_dice"]) == pytest.approx(float(loss_dice),
                                                        rel=1e-6)
    assert float(metrics["loss"]) == pytest.approx(float(loss), rel=1e-6)
    conv_after = _snap_tree(convert_state_dict(tmodel.state_dict(), "VNet")["params"])
    _compare_deltas(state.params, state2.params, conv_before, conv_after)
    # BN running stats advanced identically (momentum 0.1 torch = 0.9 flax)
    bs_after = _snap_tree(convert_state_dict(tmodel.state_dict(), "VNet")["batch_stats"])
    for (k1, ours), (k2, ref) in zip(
            jax.tree_util.tree_leaves_with_path(state2.batch_stats),
            jax.tree_util.tree_leaves_with_path(bs_after)):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-6, atol=1e-9,
                                   err_msg=jax.tree_util.keystr(k1))


def test_la_selftrain_step_matches_torch(x64):
    """One LA self-train update (`LA_BCP_train.py:239-270`): teacher
    pseudo-labelling (LCC NMS), bidirectional mixing, mix_loss, SGD and
    the post-step EMA all agree with the reference pipeline."""
    from bcp_tpu.convert import convert_state_dict
    from bcp_tpu.train.steps import _sample_mask, make_selftrain_step
    ref_bcp = _ref_module("utils/BCP_utils.py", "ref_bcp_fid")
    cfg, model, tx, tmodel = _la_setup()
    step = make_selftrain_step(model, tx, cfg)
    state = _state_with_torch_weights(model, cfg, tx, tmodel, "VNet")
    conv_before = _snap_tree(convert_state_dict(tmodel.state_dict(), "VNet")["params"])
    batch = _rand_batch(cfg, 2, with_unlabeled=True, seed=5)

    key = jax.random.PRNGKey(21)
    state2, metrics = step(state, jax.device_put(batch), key)
    mask_key, _, _ = jax.random.split(key, 3)
    mask_np = np.asarray(_sample_mask(cfg, mask_key))

    import copy
    ema_model = copy.deepcopy(tmodel)   # hand-off: same file both nets
    ema_model.train()
    opt = _torch_sgd(tmodel)
    m = torch.from_numpy(mask_np)
    img_a, img_b = (_to_torch(batch[k], 3) for k in ("img_a", "img_b"))
    uimg_a, uimg_b = (_to_torch(batch[k], 3) for k in ("uimg_a", "uimg_b"))
    lab_a = torch.from_numpy(batch["lab_a"]).long()
    lab_b = torch.from_numpy(batch["lab_b"]).long()
    with torch.no_grad():
        unoutput_a, _ = ema_model(uimg_a)
        unoutput_b, _ = ema_model(uimg_b)
        plab_a = _get_cut_mask_torch(unoutput_a)
        plab_b = _get_cut_mask_torch(unoutput_b)
    loss_mask = m.long().expand(lab_a.shape)
    mixl_img = img_a * m + uimg_a * (1 - m)
    mixu_img = uimg_b * m + img_b * (1 - m)
    outputs_l, _ = tmodel(mixl_img)
    outputs_u, _ = tmodel(mixu_img)
    loss_l = ref_bcp.mix_loss(outputs_l, lab_a, plab_a, loss_mask,
                              u_weight=cfg.u_weight)
    loss_u = ref_bcp.mix_loss(outputs_u, plab_b, lab_b, loss_mask,
                              u_weight=cfg.u_weight, unlab=True)
    loss = loss_l + loss_u
    opt.zero_grad()
    loss.backward()
    opt.step()
    ref_bcp.update_ema_variables(tmodel, ema_model, 0.99)

    assert float(metrics["loss_l"]) == pytest.approx(float(loss_l),
                                                     rel=1e-6)
    assert float(metrics["loss_u"]) == pytest.approx(float(loss_u),
                                                     rel=1e-6)
    conv_after = _snap_tree(convert_state_dict(tmodel.state_dict(), "VNet")["params"])
    _compare_deltas(state.params, state2.params, conv_before, conv_after)
    # teacher after the params-only EMA (`BCP_utils.py:79-81`)
    ema_after = _snap_tree(convert_state_dict(ema_model.state_dict(), "VNet")["params"])
    _compare_deltas(state.teacher_params, state2.teacher_params,
                    conv_before, ema_after)


# ---------------------------------------------------------------------------
# ACDC / U-Net family (2D)


def _acdc_setup():
    from bcp_tpu.config import acdc_config
    from bcp_tpu.models import create_model
    from bcp_tpu.train.state import build_optimizer
    cfg = acdc_config().replace(
        patch_size=(32, 32), compute_dtype="float32",
        fuse_subbatches=False)
    ref_unet = _ref_module("networks/unet.py", "ref_unet_fid")
    torch.manual_seed(9)
    tmodel = ref_unet.UNet_2d(in_chns=1, class_num=4).double()
    tmodel.train()
    for mod in tmodel.modules():       # dropout off on both sides
        if isinstance(mod, torch.nn.Dropout):
            mod.p = 0.0
    model = create_model(cfg.net_type, cfg.num_classes,
                         dropout=(0.0,) * 5)
    tx = build_optimizer(cfg, "pre")
    return cfg, model, tx, tmodel


def _acdc_mix_loss(dice_loss, output, img_l, patch_l, mask,
                   l_weight=1.0, u_weight=0.5, unlab=False):
    """ACDC's module-level `mix_loss` (`ACDC_BCP_train.py:167-180`),
    transcribed because that module parses argv at import; `dice_loss`
    is the reference's own losses.DiceLoss(n_classes=4)."""
    CE = torch.nn.CrossEntropyLoss(reduction="none")
    img_l, patch_l = img_l.long(), patch_l.long()
    output_soft = torch.softmax(output, dim=1)
    image_weight, patch_weight = l_weight, u_weight
    if unlab:
        image_weight, patch_weight = u_weight, l_weight
    patch_mask = 1 - mask
    loss_dice = dice_loss(output_soft, img_l.unsqueeze(1),
                          mask.unsqueeze(1)) * image_weight
    loss_dice += dice_loss(output_soft, patch_l.unsqueeze(1),
                           patch_mask.unsqueeze(1)) * patch_weight
    loss_ce = image_weight * (CE(output, img_l) * mask).sum() \
        / (mask.sum() + 1e-16)
    loss_ce += patch_weight * (CE(output, patch_l) * patch_mask).sum() \
        / (patch_mask.sum() + 1e-16)
    return loss_dice, loss_ce


def test_acdc_pretrain_step_matches_torch(x64):
    """One ACDC pre-train update (`ACDC_BCP_train.py:242-255`)."""
    from bcp_tpu.convert import convert_state_dict
    from bcp_tpu.train.steps import _sample_mask, make_pretrain_step
    ref_losses = _ref_module("utils/losses.py", "ref_losses_fid")
    cfg, model, tx, tmodel = _acdc_setup()
    step = make_pretrain_step(model, tx, cfg)
    state = _state_with_torch_weights(model, cfg, tx, tmodel, "unet")
    conv_before = _snap_tree(convert_state_dict(tmodel.state_dict(), "unet")["params"])
    batch = _rand_batch(cfg, 4, with_unlabeled=False, seed=13)

    key = jax.random.PRNGKey(31)
    state2, metrics = step(state, jax.device_put(batch), key)
    mask_key, _ = jax.random.split(key)
    mask_np = np.asarray(_sample_mask(cfg, mask_key))

    opt = _torch_sgd(tmodel)
    dice_loss = ref_losses.DiceLoss(n_classes=4)
    m = torch.from_numpy(mask_np)
    img_a, img_b = (_to_torch(batch[k], 2) for k in ("img_a", "img_b"))
    lab_a = torch.from_numpy(batch["lab_a"]).long()
    lab_b = torch.from_numpy(batch["lab_b"]).long()
    loss_mask = m.long().expand(lab_a.shape)
    net_input = img_a * m + img_b * (1 - m)
    out_mixl = tmodel(net_input)
    loss_dice, loss_ce = _acdc_mix_loss(dice_loss, out_mixl, lab_a, lab_b,
                                        loss_mask, u_weight=1.0,
                                        unlab=True)
    loss = (loss_dice + loss_ce) / 2
    opt.zero_grad()
    loss.backward()
    opt.step()

    assert float(metrics["loss_dice"]) == pytest.approx(float(loss_dice),
                                                        rel=1e-6)
    assert float(metrics["loss_ce"]) == pytest.approx(float(loss_ce),
                                                      rel=1e-6)
    conv_after = _snap_tree(convert_state_dict(tmodel.state_dict(), "unet")["params"])
    _compare_deltas(state.params, state2.params, conv_before, conv_after)


def test_acdc_selftrain_step_matches_torch(x64):
    """One ACDC self-train update (`ACDC_BCP_train.py:358-390`): argmax +
    per-class LCC pseudo-labels, mixing, mix_loss, SGD, full-state EMA
    (params compared; the torch teacher's BN buffers drift during its
    own no-grad train-mode forwards and are never read — documented
    divergence)."""
    from bcp_tpu.convert import convert_state_dict
    from bcp_tpu.train.steps import _sample_mask, make_selftrain_step
    ref_losses = _ref_module("utils/losses.py", "ref_losses_fid")
    cfg, model, tx, tmodel = _acdc_setup()
    step = make_selftrain_step(model, tx, cfg)
    state = _state_with_torch_weights(model, cfg, tx, tmodel, "unet")
    conv_before = _snap_tree(convert_state_dict(tmodel.state_dict(), "unet")["params"])
    batch = _rand_batch(cfg, 4, with_unlabeled=True, seed=17)

    key = jax.random.PRNGKey(41)
    state2, metrics = step(state, jax.device_put(batch), key)
    mask_key, _, _ = jax.random.split(key, 3)
    mask_np = np.asarray(_sample_mask(cfg, mask_key))

    import copy
    ema_model = copy.deepcopy(tmodel)
    ema_model.train()
    opt = _torch_sgd(tmodel)
    dice_loss = ref_losses.DiceLoss(n_classes=4)
    m = torch.from_numpy(mask_np)
    img_a, img_b = (_to_torch(batch[k], 2) for k in ("img_a", "img_b"))
    uimg_a, uimg_b = (_to_torch(batch[k], 2) for k in ("uimg_a", "uimg_b"))
    lab_a = torch.from_numpy(batch["lab_a"]).long()
    lab_b = torch.from_numpy(batch["lab_b"]).long()
    with torch.no_grad():
        pre_a = ema_model(uimg_a)
        pre_b = ema_model(uimg_b)
        plab_a = _get_acdc_masks_torch(pre_a)
        plab_b = _get_acdc_masks_torch(pre_b)
    loss_mask = m.long().expand(lab_a.shape)
    net_input_unl = uimg_a * m + img_a * (1 - m)
    net_input_l = img_b * m + uimg_b * (1 - m)
    out_unl = tmodel(net_input_unl)
    out_l = tmodel(net_input_l)
    unl_dice, unl_ce = _acdc_mix_loss(dice_loss, out_unl, plab_a, lab_a,
                                      loss_mask, u_weight=cfg.u_weight,
                                      unlab=True)
    l_dice, l_ce = _acdc_mix_loss(dice_loss, out_l, lab_b, plab_b,
                                  loss_mask, u_weight=cfg.u_weight)
    loss_ce = unl_ce + l_ce
    loss_dice = unl_dice + l_dice
    loss = (loss_dice + loss_ce) / 2
    opt.zero_grad()
    loss.backward()
    opt.step()
    # update_model_ema (`ACDC_BCP_train.py:123-129`), params slice
    with torch.no_grad():
        for ep, p in zip(ema_model.parameters(), tmodel.parameters()):
            ep.mul_(0.99).add_(0.01 * p)

    assert float(metrics["loss_dice"]) == pytest.approx(float(loss_dice),
                                                        rel=1e-6)
    assert float(metrics["loss_ce"]) == pytest.approx(float(loss_ce),
                                                      rel=1e-6)
    assert float(metrics["loss"]) == pytest.approx(float(loss), rel=1e-6)
    conv_after = _snap_tree(convert_state_dict(tmodel.state_dict(), "unet")["params"])
    _compare_deltas(state.params, state2.params, conv_before, conv_after)
    ema_after = _snap_tree(convert_state_dict(ema_model.state_dict(), "unet")["params"])
    _compare_deltas(state.teacher_params, state2.teacher_params,
                    conv_before, ema_after)
