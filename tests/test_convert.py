"""torch->flax checkpoint conversion: logits parity against the actual
reference torch modules (`/root/reference/code`), random weights.

This is the strongest accuracy-parity evidence available without the real
datasets: identical weights must produce identical logits (<=1e-4 f32)
through the reference's `networks/VNet.py`, `pancreas/Vnet.py` and
`networks/unet.py` vs the flax re-implementations, exercising every conv
transpose/flip, BN buffer and skip connection in the mapping.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcp_tpu.convert import convert_state_dict, load_torch_checkpoint
from bcp_tpu.models import create_model

torch = pytest.importorskip("torch")

_REF = "/root/reference/code"


_REF_MODULES = {}


def _ref_module(subpath: str, name: str):
    """Import a reference network module by path (they are plain
    single-file modules; pancreas/Vnet.py needs matplotlib). Cached per
    path — exec'ing the module once per test re-pays torch module
    construction (round-4 suite-time pass)."""
    if subpath in _REF_MODULES:
        sys.modules[name] = _REF_MODULES[subpath]
        return _REF_MODULES[subpath]
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REF, subpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    _REF_MODULES[subpath] = mod
    return mod


def _randomize_bn_stats(tmodel, seed: int = 0):
    """Give BN running stats nontrivial values so the parity check
    actually exercises the buffer mapping."""
    g = torch.Generator().manual_seed(seed)
    for m in tmodel.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                          torch.nn.BatchNorm3d)):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) + 0.5)


def _parity(tmodel, net_type: str, x_np: np.ndarray, torch_out_index=None,
            **create_kw):
    tmodel.eval()
    _randomize_bn_stats(tmodel)
    nsp = x_np.ndim - 2
    perm = (0, x_np.ndim - 1) + tuple(range(1, 1 + nsp))
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x_np).permute(*perm))
    if torch_out_index is not None:
        ty = ty[torch_out_index]
    ty = ty.permute(0, *range(2, 2 + nsp), 1).numpy()

    variables = convert_state_dict(tmodel.state_dict(), net_type)
    fmodel = create_model(net_type, ty.shape[-1], mode="test")
    out = fmodel.apply(variables, jnp.asarray(x_np), train=False)
    fy = np.asarray(out[0] if isinstance(out, tuple) else out)
    assert fy.shape == ty.shape
    np.testing.assert_allclose(fy, ty, atol=1e-4, rtol=1e-4)


def test_vnet_la_logits_parity():
    """`networks/VNet.py:145-290` (batchnorm, the LA eval model,
    `net_factory.py:8-11`) vs VNet3D."""
    ref = _ref_module("networks/VNet.py", "ref_vnet")
    torch.manual_seed(0)
    tmodel = ref.VNet(n_channels=1, n_classes=2,
                      normalization="batchnorm", has_dropout=True)
    # 48^3 so the dead-feature maxpool (kernel 3 on x5, `VNet.py:289`)
    # stays legal; VNet.forward returns (out_seg, pooled_x5)
    x = np.random.default_rng(0).normal(
        size=(1, 48, 48, 48, 1)).astype(np.float32)
    _parity(tmodel, "VNet", x, torch_out_index=0)


def test_vnet_pancreas_logits_parity():
    """`pancreas/Vnet.py:92-194` (instancenorm) vs VNet_pancreas."""
    pytest.importorskip("matplotlib")
    ref = _ref_module("pancreas/Vnet.py", "ref_vnet_pancreas")
    torch.manual_seed(1)
    tmodel = ref.VNet(n_channels=1, n_classes=2,
                      normalization="instancenorm", has_dropout=False)
    x = np.random.default_rng(1).normal(
        size=(1, 32, 32, 32, 1)).astype(np.float32)
    out_index = None
    with torch.no_grad():
        probe = tmodel(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    if isinstance(probe, (tuple, list)):
        out_index = 0
    _parity(tmodel, "VNet_pancreas", x, torch_out_index=out_index)


def test_unet2d_logits_parity():
    """`networks/unet.py:203-260` (UNet_2d, the ACDC eval model) vs
    UNet2D. UNet_2d.forward returns the logits alone
    (`unet.py:254-257`)."""
    ref = _ref_module("networks/unet.py", "ref_unet")
    torch.manual_seed(2)
    tmodel = ref.UNet_2d(in_chns=1, class_num=4)
    x = np.random.default_rng(2).normal(
        size=(1, 64, 64, 1)).astype(np.float32)
    _parity(tmodel, "unet", x)


def test_load_torch_checkpoint_formats(tmp_path):
    """All three reference on-disk formats load: raw state_dict
    (`LA_BCP_train.py:287`), {'net': ...} (`pancreas_utils.py:160-166`),
    and a DataParallel-prefixed dict."""
    ref = _ref_module("networks/VNet.py", "ref_vnet_fmt")
    torch.manual_seed(3)
    tmodel = ref.VNet(n_channels=1, n_classes=2,
                      normalization="batchnorm")
    sd = tmodel.state_dict()

    p1 = tmp_path / "raw.pth"
    torch.save(sd, p1)
    v1 = load_torch_checkpoint(str(p1), "VNet")

    p2 = tmp_path / "net.pth"
    torch.save({"net": sd, "opt": {}}, p2)
    v2 = load_torch_checkpoint(str(p2), "VNet")

    p3 = tmp_path / "dp.pth"
    torch.save({f"module.{k}": v for k, v in sd.items()}, p3)
    v3 = load_torch_checkpoint(str(p3), "VNet")

    for a, b in ((v1, v2), (v1, v3)):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(x, y), a, b)


def test_eval_cli_torch_ckpt_path(tmp_path):
    """The documented reference-`.pth` -> TPU eval path: the eval CLIs'
    ``--torch_ckpt`` flag reaches ``load_eval_variables`` and yields a
    model + variables that run."""
    ref = _ref_module("networks/VNet.py", "ref_vnet_cli")
    torch.manual_seed(4)
    tmodel = ref.VNet(n_channels=1, n_classes=2,
                      normalization="batchnorm")
    p = tmp_path / "VNet_best_model.pth"
    torch.save(tmodel.state_dict(), p)

    from bcp_tpu.cli import test_la
    from bcp_tpu.cli.common import load_eval_variables
    from bcp_tpu.config import la_config
    args = test_la.build_parser().parse_args(["--torch_ckpt", str(p)])
    assert args.torch_ckpt == str(p)
    cfg = la_config(labelnum=4).replace(compute_dtype="float32")
    model, variables = load_eval_variables(cfg, "/nonexistent",
                                           torch_ckpt=str(p))
    logits, _ = model.apply(variables, jnp.zeros((1, 32, 32, 32, 1)),
                            train=False)
    assert np.isfinite(np.asarray(logits)).all()


def test_convert_strict_rejects_wrong_model():
    """strict mode flags missing sources loudly."""
    with pytest.raises(KeyError):
        convert_state_dict({}, "VNet")
    with pytest.raises(KeyError):
        convert_state_dict({}, "no_such_model")


@pytest.mark.slow
def test_reference_eval_loop_end_to_end_parity():
    """Checkpoint-for-checkpoint output fidelity, end to end: the same
    torch checkpoint pushed through the reference's *own* sliding-window
    loop (`utils/test_3d_patch.py:82-141` ``test_single_case``, run on
    torch-cpu) and through ``SlidingWindowEvaluator`` with the converted
    weights must produce the same segmentation and averaged score map.
    This exercises the whole eval stack — window grid, batching,
    overlap-add, averaging, threshold rule — against the reference's
    actual code, not a reimplementation of it."""
    import types
    import math as _math

    # the reference module imports CUDA-era/absent deps at module level;
    # stub the ones this environment lacks (none are used by
    # test_single_case itself except torch)
    for name, attrs in (("medpy", {}), ("medpy.metric", {}),
                        ("nibabel", {}),
                        ("skimage", {}), ("skimage.measure", {})):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for a, v in attrs.items():
                setattr(mod, a, v)
            sys.modules[name] = mod
    sys.modules["skimage"].measure = sys.modules["skimage.measure"]
    sys.modules["skimage.measure"].label = None  # unused here
    sys.modules["medpy"].metric = sys.modules["medpy.metric"]

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self    # CPU shim
    if not hasattr(np, "int"):                        # np.int removal
        np.int = int
    try:
        t3p = _ref_module("utils/test_3d_patch.py", "ref_test_3d_patch")
        ref = _ref_module("networks/VNet.py", "ref_vnet_e2e")
        torch.manual_seed(7)
        tmodel = ref.VNet(n_channels=1, n_classes=2,
                          normalization="batchnorm", has_dropout=True)
        tmodel.eval()
        _randomize_bn_stats(tmodel, seed=7)

        # smallest legal VNet patch is 48^3 (the kernel-3 maxpool on x5);
        # 2x2x2 window grid keeps the torch-cpu side tractable
        patch, sxy, sz = (48, 48, 48), 16, 8
        image = np.random.default_rng(7).normal(
            size=(64, 64, 56)).astype(np.float32)
        ref_label, ref_score = t3p.test_single_case(
            tmodel, image, sxy, sz, patch, num_classes=2)

        variables = convert_state_dict(tmodel.state_dict(), "VNet")
        fmodel = create_model("VNet", 2, mode="test")
        from bcp_tpu.eval.sliding_window import SlidingWindowEvaluator
        ev = SlidingWindowEvaluator(fmodel, patch, 2, sxy, sz, batch=4)
        label, score = ev.infer(variables, image)

        assert label.shape == ref_label.shape
        # the reference accumulates only the class-1 prob (broadcast into
        # both score channels, `test_3d_patch.py:130-133`); compare it to
        # our class-1 average
        np.testing.assert_allclose(score[1], ref_score[0],
                                   atol=2e-4, rtol=2e-4)
        assert (label == ref_label).all()
    finally:
        torch.Tensor.cuda = orig_cuda


# ---------------- flax -> torch export (the reverse direction) ----------------


def test_export_roundtrips_vnet_bitexact():
    """convert -> export must reproduce the original reference
    state_dict bit-for-bit (the layout transforms are pure
    transpose/flip), including the dead contrastive heads carried over
    from the template."""
    from bcp_tpu.convert import export_state_dict

    ref = _ref_module("networks/VNet.py", "ref_vnet_rt")
    torch.manual_seed(5)
    tmodel = ref.VNet(n_channels=1, n_classes=2,
                      normalization="batchnorm", has_dropout=True)
    _randomize_bn_stats(tmodel, seed=6)
    sd0 = tmodel.state_dict()
    variables = convert_state_dict(sd0, "VNet")
    sd1 = export_state_dict(variables, "VNet", template=sd0)
    assert set(sd1) == set(sd0)
    for k in sd0:
        assert torch.equal(torch.as_tensor(sd1[k]),
                           torch.as_tensor(sd0[k])), k


def test_export_loads_strict_into_reference_vnet():
    """A flax-random-init VNet3D exports to a state_dict the reference
    module loads at load_state_dict's STRICT default (the reference eval
    scripts' exact call, `test_LA.py:37`) and produces the same logits."""
    from bcp_tpu.convert import export_state_dict

    ref = _ref_module("networks/VNet.py", "ref_vnet_exp")
    torch.manual_seed(7)
    tmodel = ref.VNet(n_channels=1, n_classes=2,
                      normalization="batchnorm", has_dropout=True)

    fmodel = create_model("VNet", 2, mode="test")
    x = np.random.default_rng(7).normal(
        size=(1, 48, 48, 48, 1)).astype(np.float32)
    variables = jax.jit(
        lambda r, y: fmodel.init(r, y, train=False))(
        {"params": jax.random.PRNGKey(7)}, jnp.asarray(x))
    fy = np.asarray(fmodel.apply(variables, jnp.asarray(x),
                                 train=False)[0])

    exported = export_state_dict(variables, "VNet",
                                 template=tmodel.state_dict())
    tmodel.load_state_dict(exported)          # strict=True default
    tmodel.eval()
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x).permute(0, 4, 1, 2, 3))[0]
    ty = ty.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(fy, ty, atol=1e-4, rtol=1e-4)


def test_export_loads_strict_into_reference_unet2d():
    from bcp_tpu.convert import export_state_dict

    ref = _ref_module("networks/unet.py", "ref_unet_exp")
    torch.manual_seed(8)
    tmodel = ref.UNet_2d(in_chns=1, class_num=4)

    fmodel = create_model("unet", 4, mode="test")
    x = np.random.default_rng(8).normal(
        size=(1, 64, 64, 1)).astype(np.float32)
    variables = jax.jit(
        lambda r, y: fmodel.init(r, y, train=False))(
        {"params": jax.random.PRNGKey(8)}, jnp.asarray(x))
    out = fmodel.apply(variables, jnp.asarray(x), train=False)
    fy = np.asarray(out[0] if isinstance(out, tuple) else out)

    exported = export_state_dict(variables, "unet",
                                 template=tmodel.state_dict())
    tmodel.load_state_dict(exported)
    tmodel.eval()
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    if isinstance(ty, (tuple, list)):
        ty = ty[0]
    ty = ty.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(fy, ty, atol=1e-4, rtol=1e-4)


def test_export_roundtrips_pancreas():
    """Pancreas (instancenorm, branchs head detected from the
    template) round-trips bit-exact."""
    from bcp_tpu.convert import export_state_dict

    pytest.importorskip("matplotlib")
    ref = _ref_module("pancreas/Vnet.py", "ref_vnet_panc_rt")
    torch.manual_seed(9)
    tmodel = ref.VNet(n_channels=1, n_classes=2,
                      normalization="instancenorm", has_dropout=False)
    sd0 = tmodel.state_dict()
    variables = convert_state_dict(sd0, "VNet_pancreas")
    sd1 = export_state_dict(variables, "VNet_pancreas", template=sd0)
    assert set(sd1) == set(sd0)
    for k in sd0:
        assert torch.equal(torch.as_tensor(sd1[k]),
                           torch.as_tensor(sd0[k])), k


@pytest.fixture(scope="module")
def trained_la_snapshot(tmp_path_factory):
    """ONE tiny reference-width (16-filter) LA pre-train shared by both
    export-CLI tests (round-4 suite-time pass: each previously trained
    its own)."""
    from bcp_tpu.config import la_config
    from bcp_tpu.data import synthetic
    from bcp_tpu.train.trainer import BCPTrainer

    base = tmp_path_factory.mktemp("export_cli")
    root = synthetic.make_la_dataset(
        str(base / "data"), n_train=6, n_test=1,
        shape=(40, 40, 32), seed=11)
    cfg = la_config(labelnum=4).replace(
        root_path=root, patch_size=(32, 32, 16), batch_size=6,
        labeled_bs=4, max_samples=6,
        pre_iterations=2, eval_every=2, stride_xy=12, stride_z=8,
        eval_batch=4, snapshot_root=str(base / "snap"))
    BCPTrainer(cfg).pretrain()
    return cfg, base


def test_export_cli_roundtrip(tmp_path, trained_la_snapshot):
    """cli.export_torch writes a .pth whose tensors convert back to the
    exact flax variables that were exported (full inverse-mapping
    coverage on a really-trained tiny checkpoint)."""
    from bcp_tpu.cli import export_torch

    cfg, base = trained_la_snapshot
    out = tmp_path / "exported.pth"
    export_torch.main([
        "--variant", "la", "--labelnum", "4",
        "--snapshot_root", str(base / "snap"),
        "--stage_name", "pre_train",
        "--out", str(out)])
    assert out.exists()

    sd = torch.load(str(out), map_location="cpu", weights_only=False)
    back = convert_state_dict(sd, "VNet")

    from bcp_tpu.cli.common import load_eval_variables, snapshot_dir
    from bcp_tpu.train.checkpoints import best_model_path
    ckpt = best_model_path(snapshot_dir(cfg, "pre_train"), cfg.net_type)
    _, orig = load_eval_variables(cfg, ckpt)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)),
        {"params": orig["params"], "batch_stats": orig["batch_stats"]},
        back)


def test_export_cli_with_template_strict_loads(tmp_path,
                                               trained_la_snapshot):
    """--template carries the reference's dead-head keys so the exported
    .pth loads at load_state_dict's strict default."""
    from bcp_tpu.cli import export_torch

    # n_filters must match the reference module's width (16) — the
    # shared fixture trains at reference width
    cfg, base = trained_la_snapshot
    ref = _ref_module("networks/VNet.py", "ref_vnet_cli_tpl")
    torch.manual_seed(14)
    tmodel = ref.VNet(n_channels=1, n_classes=2,
                      normalization="batchnorm", has_dropout=True)
    tpl = tmp_path / "fresh.pth"
    torch.save(tmodel.state_dict(), tpl)

    out = tmp_path / "exported.pth"
    export_torch.main([
        "--variant", "la", "--labelnum", "4",
        "--snapshot_root", str(base / "snap"),
        "--stage_name", "pre_train",
        "--template", str(tpl), "--out", str(out)])
    sd = torch.load(str(out), map_location="cpu", weights_only=False)
    tmodel.load_state_dict(sd)   # strict=True default must succeed


@pytest.mark.slow
def test_reference_acdc_eval_loop_end_to_end_parity(tmp_path):
    """ACDC checkpoint-for-checkpoint fidelity, end to end: the same
    torch UNet_2d pushed through the reference's *own* per-slice loop
    (`test_ACDC.py:36-80` ``test_single_volume``: nearest zoom to 256,
    forward, argmax, zoom back) and through ``Slice2DEvaluator`` with
    converted weights must produce the same prediction volume."""
    import types

    # stub the reference module's CUDA-era/absent imports; capture the
    # prediction via the unconditional sitk.GetImageFromArray calls
    captured = []

    class _FakeItk:
        def SetSpacing(self, s):
            pass

    def _fake_from_array(arr):
        captured.append(np.asarray(arr))
        return _FakeItk()

    stubs = {}
    for name in ("nibabel", "SimpleITK", "medpy", "medpy.metric",
                 "tqdm", "networks", "networks.net_factory"):
        stubs[name] = types.ModuleType(name)
    stubs["SimpleITK"].GetImageFromArray = _fake_from_array
    stubs["SimpleITK"].WriteImage = lambda *a, **k: None
    _zero = lambda p, g: 0.0
    stubs["medpy.metric"].binary = types.SimpleNamespace(
        dc=_zero, jc=_zero, asd=_zero, hd95=_zero)
    stubs["medpy"].metric = stubs["medpy.metric"]
    stubs["tqdm"].tqdm = lambda x, **k: x
    stubs["networks.net_factory"].net_factory = None
    stubs["networks"].net_factory = stubs["networks.net_factory"]
    old = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        ref_eval = _ref_module("test_ACDC.py", "ref_test_acdc")
        ref_net = _ref_module("networks/unet.py", "ref_unet_acdc_e2e")
        torch.manual_seed(21)
        tmodel = ref_net.UNet_2d(in_chns=1, class_num=4)
        tmodel.eval()
        _randomize_bn_stats(tmodel, seed=21)

        from bcp_tpu.data import synthetic
        root = synthetic.make_acdc_dataset(
            str(tmp_path / "acdc"), n_train_slices=2, n_val=1,
            slice_shape=(64, 48), vol_depth=3, seed=22)
        case = open(os.path.join(root, "val.list")).read().split()[0]

        flags = types.SimpleNamespace(root_path=root)
        ref_eval.test_single_volume(case, tmodel, str(tmp_path), flags)
        assert len(captured) == 3    # img, prediction, label
        ref_pred = captured[1]

        variables = convert_state_dict(tmodel.state_dict(), "unet")
        fmodel = create_model("unet", 4, mode="test")
        from bcp_tpu.eval.slice2d import Slice2DEvaluator
        ev = Slice2DEvaluator(fmodel, (256, 256), 4)
        import h5py
        with h5py.File(os.path.join(root, "data", f"{case}.h5")) as f:
            image = f["image"][:]
        pred = ev.predict_volume(variables, image)
        assert pred.shape == ref_pred.shape
        np.testing.assert_array_equal(np.asarray(pred, np.float32),
                                      np.asarray(ref_pred, np.float32))
    finally:
        torch.Tensor.cuda = orig_cuda
        for k, v in old.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.mark.slow
def test_reference_pancreas_eval_loop_end_to_end_parity():
    """Pancreas checkpoint-for-checkpoint fidelity, end to end: the
    reference's own sliding-window loop (`pancreas/test_util.py:88-149`
    ``test_single_case``: overlap-add softmax average, argmax) vs
    ``SlidingWindowEvaluator`` (rule='argmax') on converted weights."""
    import types

    stubs = {}
    for name in ("nibabel", "medpy", "medpy.metric", "tqdm",
                 "skimage", "skimage.measure"):
        stubs[name] = types.ModuleType(name)
    stubs["tqdm"].tqdm = lambda x, **k: x
    stubs["skimage.measure"].label = None
    stubs["skimage"].measure = stubs["skimage.measure"]
    stubs["medpy.metric"].binary = types.SimpleNamespace()
    stubs["medpy"].metric = stubs["medpy.metric"]
    old = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        pytest.importorskip("matplotlib")
        tu = _ref_module("pancreas/test_util.py", "ref_panc_test_util")
        ref = _ref_module("pancreas/Vnet.py", "ref_vnet_panc_e2e")
        torch.manual_seed(31)
        tmodel = ref.VNet(n_channels=1, n_classes=2,
                          normalization="instancenorm", has_dropout=False)
        tmodel.eval()

        patch, sxy, sz = (48, 48, 48), 16, 8
        image = np.random.default_rng(31).normal(
            size=(64, 64, 56)).astype(np.float32)
        ref_label, ref_score = tu.test_single_case(
            tmodel, image, sxy, sz, patch, num_classes=2)

        variables = convert_state_dict(tmodel.state_dict(),
                                       "VNet_pancreas")
        fmodel = create_model("VNet_pancreas", 2, mode="test")
        from bcp_tpu.eval.sliding_window import SlidingWindowEvaluator
        ev = SlidingWindowEvaluator(fmodel, patch, 2, sxy, sz, batch=4)
        label, score = ev.infer(variables, image, rule="argmax")

        assert label.shape == ref_label.shape
        np.testing.assert_allclose(np.asarray(score),
                                   np.asarray(ref_score),
                                   atol=2e-4, rtol=2e-4)
        # labels must agree wherever the reference's own class margin
        # exceeds f32 noise; exact argmax ties (measured: 1 voxel in
        # 229376 at margin 8e-7 for this seed) may flip either way
        margin = np.abs(ref_score[1] - ref_score[0])
        decided = margin > 1e-4
        assert (np.asarray(label) == ref_label)[decided].all()
        assert float(decided.mean()) > 0.99
    finally:
        torch.Tensor.cuda = orig_cuda
        for k, v in old.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.mark.slow
def test_reference_eval_loop_on_exported_weights():
    """The reverse-direction e2e: OUR weights (flax random init),
    exported via export_state_dict, strict-loaded into the reference
    VNet, and pushed through the reference's own sliding-window loop —
    must match our evaluator on the original flax variables. This is
    the 'train on TPU, evaluate with the reference's tooling' user
    story minus the training time."""
    import types
    from bcp_tpu.convert import export_state_dict

    for name, attrs in (("medpy", {}), ("medpy.metric", {}),
                        ("nibabel", {}),
                        ("skimage", {}), ("skimage.measure", {})):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["skimage"].measure = sys.modules["skimage.measure"]
    sys.modules["skimage.measure"].label = None
    sys.modules["medpy"].metric = sys.modules["medpy.metric"]
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    if not hasattr(np, "int"):
        np.int = int
    try:
        t3p = _ref_module("utils/test_3d_patch.py", "ref_t3p_export")
        ref = _ref_module("networks/VNet.py", "ref_vnet_export_e2e")
        torch.manual_seed(41)
        tmodel = ref.VNet(n_channels=1, n_classes=2,
                          normalization="batchnorm", has_dropout=True)

        # OUR weights at the reference width (16 filters)
        fmodel = create_model("VNet", 2, mode="test")
        x0 = jnp.zeros((1, 48, 48, 48, 1))
        variables = jax.jit(
            lambda r, y: fmodel.init(r, y, train=False))(
            {"params": jax.random.PRNGKey(41)}, x0)

        exported = export_state_dict(variables, "VNet",
                                     template=tmodel.state_dict())
        tmodel.load_state_dict(exported)     # strict
        tmodel.eval()

        patch, sxy, sz = (48, 48, 48), 16, 8
        image = np.random.default_rng(41).normal(
            size=(64, 64, 56)).astype(np.float32)
        ref_label, ref_score = t3p.test_single_case(
            tmodel, image, sxy, sz, patch, num_classes=2)

        from bcp_tpu.eval.sliding_window import SlidingWindowEvaluator
        ev = SlidingWindowEvaluator(fmodel, patch, 2, sxy, sz, batch=4)
        label, score = ev.infer(variables, image)
        np.testing.assert_allclose(score[1], ref_score[0],
                                   atol=2e-4, rtol=2e-4)
        assert (np.asarray(label) == ref_label).all()
    finally:
        torch.Tensor.cuda = orig_cuda
