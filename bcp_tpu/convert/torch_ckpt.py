"""torch -> flax checkpoint conversion for the reference's models.

The reference's entire eval story starts from
``model.load_state_dict(torch.load(path))`` (`code/test_LA.py:37`,
`code/test_ACDC.py:32`, `code/pancreas/pancreas_utils.py:170-184`); this
module makes those ``.pth`` files loadable into the flax re-implementations
so a reference-trained checkpoint can be evaluated (or fine-tuned) on TPU.

Weight-layout transforms:

- ``nn.Conv{2,3}d`` weight ``(Co, Ci, *k)`` -> flax ``nn.Conv`` kernel
  ``(*k, Ci, Co)``.
- ``nn.ConvTranspose3d`` weight ``(Ci, Co, *k)`` -> flax
  ``nn.ConvTranspose`` kernel ``(*k, Ci, Co)`` **with the spatial dims
  flipped**: flax lowers through ``lax.conv_transpose(transpose_kernel=
  False)`` (an un-flipped fractionally-strided correlation) while torch's
  transposed conv is the conv adjoint; the flip reconciles them (verified
  to 0 ulp in ``tests/test_convert.py``).
- ``nn.BatchNorm*`` weight/bias/running_mean/running_var ->
  ``TorchBatchNorm`` scale/bias + batch_stats mean/var.

Name maps are generated structurally from the reference architectures
(`networks/VNet.py:145-239`, `pancreas/Vnet.py:92-194`,
`networks/unet.py:203-260`); the dead projection/prediction/contrastive
heads carried by ``UNet_2d``/``VNet`` state_dicts (`networks/unet.py:214-
236`) are skipped, and a ``module.`` DataParallel prefix (pancreas,
`train_pancreas.py:36`) is stripped.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# torch state_dict suffixes for one BatchNorm module -> flax (collection,
# leaf) destinations
_BN_LEAVES = (
    ("weight", "params", "scale"),
    ("bias", "params", "bias"),
    ("running_mean", "batch_stats", "mean"),
    ("running_var", "batch_stats", "var"),
)

# reference state_dict prefixes that have no flax counterpart on purpose:
# the dead contrastive machinery (`networks/unet.py:214-236`,
# `networks/VNet.py:250-278`; SURVEY.md C24) and torch bookkeeping
_DEAD_PREFIXES = (
    "projection_head", "prediction_head", "contrastive_class_selector",
    "branchs",   # MCNet-style multi-decoder zoo heads
)


def _conv_entry(tprefix: str, fpath: Tuple[str, ...], kind: str):
    return (tprefix, fpath, kind)


def _vnet_mapping(normalization: str = "batchnorm",
                  nested: bool = False) -> List[tuple]:
    """(torch module prefix, flax path, kind) for the reference V-Net.

    ``nested=True`` matches `networks/VNet.py:145-290` (the LA model),
    whose blocks live under ``encoder.``/``decoder.`` submodules;
    ``nested=False`` matches the flat layouts of `pancreas/Vnet.py:92-194`
    and `networks/git_VNet.py:145-240`.

    Sequential indices inside each block step over [conv, norm, relu]
    (norm present-but-parameterless for instancenorm, absent for 'none').
    """
    has_bn = normalization == "batchnorm"
    step = 2 if normalization == "none" else 3
    enc = "encoder." if nested else ""
    dec = "decoder." if nested else ""
    out: List[tuple] = []
    stages = [(enc, "block_one", 1), (enc, "block_two", 2),
              (enc, "block_three", 3), (enc, "block_four", 3),
              (enc, "block_five", 3), (dec, "block_six", 3),
              (dec, "block_seven", 3), (dec, "block_eight", 2),
              (dec, "block_nine", 1)]
    for pre, blk, n in stages:
        for i in range(n):
            out.append(_conv_entry(f"{pre}{blk}.conv.{i * step}",
                                   (blk, f"conv{i}"), "conv"))
            if has_bn:
                out.append((f"{pre}{blk}.conv.{i * step + 1}",
                            (blk, f"norm{i}", "TorchBatchNorm_0"), "bn"))
    for blk in ("block_one_dw", "block_two_dw", "block_three_dw",
                "block_four_dw"):
        out.append(_conv_entry(f"{enc}{blk}.conv.0", (blk, "conv"),
                               "conv"))
        if has_bn:
            out.append((f"{enc}{blk}.conv.1",
                        (blk, "norm", "TorchBatchNorm_0"), "bn"))
    for blk in ("block_five_up", "block_six_up", "block_seven_up",
                "block_eight_up"):
        out.append(_conv_entry(f"{dec}{blk}.conv.0", (blk, "deconv"),
                               "deconv"))
        if has_bn:
            out.append((f"{dec}{blk}.conv.1",
                        (blk, "norm", "TorchBatchNorm_0"), "bn"))
    out.append(_conv_entry(f"{dec}out_conv", ("out_conv",), "conv"))
    return out


def _unet2d_mapping() -> List[tuple]:
    """(torch prefix, flax path, kind) for `UNet_2d`
    (`networks/unet.py:203-260`; blocks `unet.py:15-58`).

    ``conv_conv`` Sequential indices: 0 conv, 1 bn, (2 lrelu, 3 dropout),
    4 conv, 5 bn.
    """
    out: List[tuple] = []

    def conv_block(tprefix: str, fpath: Tuple[str, ...]):
        for i, (ci, bi) in enumerate(((0, 1), (4, 5))):
            out.append(_conv_entry(f"{tprefix}.conv_conv.{ci}",
                                   fpath + (f"conv{i}",), "conv"))
            out.append((f"{tprefix}.conv_conv.{bi}",
                        fpath + (f"bn{i}",), "bn"))

    conv_block("encoder.in_conv", ("in_conv",))
    for k in range(1, 5):
        conv_block(f"encoder.down{k}.maxpool_conv.1", (f"down{k}",))
    for k in range(1, 5):
        out.append(_conv_entry(f"decoder.up{k}.conv1x1",
                               (f"up{k}", "conv1x1"), "conv"))
        conv_block(f"decoder.up{k}.conv", (f"up{k}", "conv"))
    out.append(_conv_entry("decoder.out_conv", ("out_conv",), "conv"))
    return out


def _vnet_pancreas_mapping(sd: Dict[str, "object"]) -> List[tuple]:
    """`pancreas/Vnet.py:92-194`: flat blocks, except block_nine/out_conv
    live in the single-entry ``branchs`` ModuleList —
    ``branchs.0.0.conv.0`` is the block_nine conv and the 1^3 head sits at
    index 1 (or 2 when the branch carries a Dropout3d,
    `Vnet.py:124-135`); detected from the state_dict."""
    out = [e for e in _vnet_mapping("instancenorm")
           if e[1][0] not in ("block_nine", "out_conv")]
    out.append(_conv_entry("branchs.0.0.conv.0",
                           ("block_nine", "conv0"), "conv"))
    head = 2 if "branchs.0.2.weight" in sd else 1
    out.append(_conv_entry(f"branchs.0.{head}", ("out_conv",), "conv"))
    return out


# mapping factories take the (module.-stripped) state_dict so layouts that
# depend on construction flags (pancreas dropout) can be detected
_MAPPINGS = {
    "VNet": lambda sd: _vnet_mapping("batchnorm", nested=True),
    "VNet_pancreas": _vnet_pancreas_mapping,
    "git_VNet": lambda sd: _vnet_mapping("none"),
    "unet": lambda sd: _unet2d_mapping(),
}


def _to_np(t) -> np.ndarray:
    a = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
    # f64 passes through unrounded (the train-fidelity gates convert
    # double-precision models); everything else (f32/f16/bf16/int
    # buffers) lands on f32 as before
    return a if a.dtype == np.float64 else a.astype(np.float32)


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(state_dict: Dict[str, "object"], net_type: str,
                       strict: bool = True) -> Dict[str, dict]:
    """Reference torch ``state_dict`` -> flax ``{"params", "batch_stats"}``.

    ``strict`` verifies every non-dead torch tensor was consumed and every
    mapped destination found its source.
    """
    if net_type not in _MAPPINGS:
        raise KeyError(f"no torch mapping for net_type {net_type!r}; "
                       f"have {sorted(_MAPPINGS)}")
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):       # nn.DataParallel wrapper
            k = k[len("module."):]
        sd[k] = v
    used = set()
    out: Dict[str, dict] = {"params": {}, "batch_stats": {}}
    for tprefix, fpath, kind in _MAPPINGS[net_type](sd):
        if kind in ("conv", "deconv"):
            wk, bk = f"{tprefix}.weight", f"{tprefix}.bias"
            if strict and wk not in sd:
                raise KeyError(f"missing {wk} in torch checkpoint")
            w = _to_np(sd[wk])
            used.add(wk)
            nsp = w.ndim - 2
            if kind == "conv":
                # (Co, Ci, *k) -> (*k, Ci, Co)
                kernel = np.transpose(w, tuple(range(2, 2 + nsp)) + (1, 0))
            else:
                # (Ci, Co, *k) -> (*k, Ci, Co), spatially flipped (see
                # module docstring)
                kernel = np.flip(
                    np.transpose(w, tuple(range(2, 2 + nsp)) + (0, 1)),
                    axis=tuple(range(nsp))).copy()
            _set(out["params"], fpath + ("kernel",), kernel)
            if bk in sd:
                _set(out["params"], fpath + ("bias",), _to_np(sd[bk]))
                used.add(bk)
        elif kind == "bn":
            for suffix, col, leaf in _BN_LEAVES:
                tk = f"{tprefix}.{suffix}"
                if strict and tk not in sd:
                    raise KeyError(f"missing {tk} in torch checkpoint")
                _set(out[col], fpath + (leaf,), _to_np(sd[tk]))
                used.add(tk)
            used.add(f"{tprefix}.num_batches_tracked")
        else:
            raise ValueError(kind)
    if strict:
        leftovers = [k for k in sd if k not in used
                     and not k.endswith("num_batches_tracked")
                     and not k.startswith(_DEAD_PREFIXES)]
        if leftovers:
            raise ValueError(
                f"unconsumed torch keys (first 10): {leftovers[:10]}")
    return out


def _get(tree, path: Tuple[str, ...]):
    node = tree
    for p in path:
        if p not in node:
            return None
        node = node[p]
    return node


def export_state_dict(variables: Dict[str, dict], net_type: str,
                      template: Dict[str, "object"] = None,
                      strict: bool = True) -> Dict[str, "object"]:
    """flax ``{"params", "batch_stats"}`` -> reference torch
    ``state_dict`` (the reverse of :func:`convert_state_dict`), so a
    TPU-trained checkpoint can be evaluated with the reference's own
    scripts (`code/test_LA.py:37` et al., which call
    ``load_state_dict`` at its strict default).

    ``template``: a fresh ``state_dict()`` of the reference module. It
    supplies the keys the flax models deliberately do not carry — the
    dead contrastive heads (`networks/unet.py:214-236`) and BN
    ``num_batches_tracked`` — so the export loads strict. Without one,
    only the mapped keys are emitted (load with ``strict=False``).
    Required for ``VNet_pancreas`` (its head index is detected from the
    template, `pancreas/Vnet.py:124-135`).

    Values are torch tensors; inverse layout transforms are exact
    (transpose/flip only), so convert->export round-trips bit-identically
    (``tests/test_convert.py``).
    """
    import torch
    if net_type not in _MAPPINGS:
        raise KeyError(f"no torch mapping for net_type {net_type!r}; "
                       f"have {sorted(_MAPPINGS)}")
    if net_type == "VNet_pancreas" and not template:
        # the branchs head index is dropout-dependent (`Vnet.py:124-135`)
        # and can only be read off a real state_dict; guessing would
        # silently park the output conv under the wrong key
        raise ValueError("export for VNet_pancreas requires a template "
                         "state_dict (its branchs head index depends on "
                         "the reference module's dropout flag)")
    template = dict(template or {})
    out: Dict[str, "object"] = {
        k: (v.clone() if hasattr(v, "clone") else v)
        for k, v in template.items()}
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    for tprefix, fpath, kind in _MAPPINGS[net_type](template):
        if kind in ("conv", "deconv"):
            kernel = _get(params, fpath + ("kernel",))
            if kernel is None:
                if strict:
                    raise KeyError(f"missing flax kernel at {fpath}")
                continue
            w = np.asarray(kernel, np.float32)
            nsp = w.ndim - 2
            if kind == "conv":
                # (*k, Ci, Co) -> (Co, Ci, *k)
                w = np.transpose(w, (nsp + 1, nsp) + tuple(range(nsp)))
            else:
                # un-flip, then (*k, Ci, Co) -> (Ci, Co, *k)
                w = np.transpose(
                    np.flip(w, axis=tuple(range(nsp))),
                    (nsp, nsp + 1) + tuple(range(nsp)))
            out[f"{tprefix}.weight"] = torch.from_numpy(w.copy())
            bias = _get(params, fpath + ("bias",))
            if bias is not None:
                out[f"{tprefix}.bias"] = torch.from_numpy(
                    np.asarray(bias, np.float32).copy())
        elif kind == "bn":
            for suffix, col, leaf in _BN_LEAVES:
                src = _get(params if col == "params" else stats,
                           fpath + (leaf,))
                if src is None:
                    if strict:
                        raise KeyError(f"missing flax {col} leaf at "
                                       f"{fpath + (leaf,)}")
                    continue
                out[f"{tprefix}.{suffix}"] = torch.from_numpy(
                    np.asarray(src, np.float32).copy())
            nbt = f"{tprefix}.num_batches_tracked"
            if nbt not in out:
                out[nbt] = torch.zeros((), dtype=torch.long)
        else:
            raise ValueError(kind)
    return out


def load_torch_checkpoint(path: str, net_type: str,
                          strict: bool = True) -> Dict[str, dict]:
    """Load a reference ``.pth`` and convert. Accepts the three on-disk
    formats the reference writes: a raw ``state_dict`` (LA/ACDC,
    `LA_BCP_train.py:287`), ``{'net': state_dict, ...}`` (pancreas,
    `pancreas_utils.py:160-166`), and ``{'state_dict': ...}``."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "net" in blob and isinstance(
            blob["net"], dict):
        blob = blob["net"]
    elif isinstance(blob, dict) and "state_dict" in blob and isinstance(
            blob["state_dict"], dict):
        blob = blob["state_dict"]
    return convert_state_dict(blob, net_type, strict=strict)
