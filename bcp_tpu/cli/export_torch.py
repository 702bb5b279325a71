"""Export a TPU-trained checkpoint as a reference-loadable torch `.pth`.

The reverse of the `--torch_ckpt` eval hand-off: after training here, the
produced state_dict drops straight into the reference's own eval scripts
(`code/test_LA.py:37` / `test_ACDC.py:32` / `pancreas_utils.py:170-184`,
all of which call ``load_state_dict`` at its strict default).

Strict loading needs the dead contrastive-head keys the reference models
carry (`networks/unet.py:214-236`) but the flax models deliberately
don't. Pass ``--template fresh.pth`` — a fresh ``state_dict()`` saved
from the user's reference install, e.g. ::

    python -c "import torch; from networks.net_factory import net_factory;
               torch.save(net_factory('VNet','LA',...).state_dict(),'fresh.pth')"

— and those keys are carried over at their init values. Without a
template only the mapped weights are emitted; load with
``strict=False``. Exception: ``--variant pancreas`` REQUIRES a template
(the reference pancreas V-Net's output-head key index depends on its
dropout flag, `pancreas/Vnet.py:124-135`, and can only be read off a
real state_dict — the export raises otherwise).
"""

from __future__ import annotations

import argparse

from bcp_tpu.cli.common import load_eval_variables, snapshot_dir
from bcp_tpu.config import acdc_config, la_config, pancreas_config
from bcp_tpu.train.checkpoints import best_model_path

_CFGS = {"la": la_config, "acdc": acdc_config, "pancreas": pancreas_config}


def build_parser():
    p = argparse.ArgumentParser(
        description="Export a bcp_tpu checkpoint to a reference torch .pth")
    p.add_argument("--variant", choices=sorted(_CFGS), default="la")
    p.add_argument("--labelnum", type=int, default=None)
    p.add_argument("--snapshot_root", type=str, default="./model/BCP")
    p.add_argument("--stage_name", type=str, default="self_train")
    p.add_argument("--ckpt", type=str, default=None,
                   help="explicit checkpoint dir (overrides the "
                        "snapshot_root/stage_name naming)")
    p.add_argument("--template", type=str, default=None,
                   help="fresh reference state_dict() .pth supplying the "
                        "dead-head keys for strict loading (REQUIRED for "
                        "--variant pancreas)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--n_filters", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import torch

    kw = {} if args.labelnum is None else {"labelnum": args.labelnum}
    cfg = _CFGS[args.variant](**kw).replace(
        snapshot_root=args.snapshot_root, n_filters=args.n_filters)
    ckpt = args.ckpt or best_model_path(
        snapshot_dir(cfg, args.stage_name), cfg.net_type)
    _, variables = load_eval_variables(cfg, ckpt)

    template = None
    if args.template:
        template = torch.load(args.template, map_location="cpu",
                              weights_only=False)

    from bcp_tpu.convert import export_state_dict
    sd = export_state_dict(variables, cfg.net_type, template=template,
                           strict=True)
    torch.save(sd, args.out)
    print(f"exported {ckpt} ({cfg.net_type}) -> {args.out} "
          f"({len(sd)} tensors{', strict-loadable' if template else ''})")


if __name__ == "__main__":
    main()
