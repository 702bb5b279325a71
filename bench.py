"""Benchmark: LA BCP self-train throughput on one chip.

Measures the BASELINE.json north-star metric — 3D patches/sec/chip through
the *full* self-train update (teacher pseudo-labelling with largest-CC NMS,
cuboid mask mixing, two student forwards, masked Dice+CE backward, SGD +
EMA) at the reference's real configuration: V-Net, 112x112x80 patches,
batch 8 (4 labeled + 4 unlabeled) — `LA_BCP_train.py:36-55,234-270`.

Baseline: the reference publishes no throughput numbers (README gives only
"one RTX 3090"). vs_baseline divides by an *estimated* 10.7 patches/s
(0.75 s/iter): 16 sample-forward-equivalents x 80.2 GFLOP V-Net forward
at single-digit-to-low-double-digit cudnn MFU for these low-channel 3D
shapes, plus ~145 ms of per-iteration CPU largest-CC (measured scipy
anchor: 36 ms/mask x 4) and host overhead. Full arithmetic, the
uncertainty band (11-31 patches/s) and its anchors: BASELINE.md
"Throughput baseline derivation". The absolute patches/s/chip is the
measured quantity; the north star is >=3x the estimate.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

ASSUMED_BASELINE_PATCHES_PER_SEC = 10.7  # RTX 3090 estimate, see docstring

WARMUP = 3
ITERS = 10


def eval_bench(variant: str):
    """Offline-inference benches for the three pipelines.

    - ``la`` (BASELINE.json configs[4]): end-to-end
      ``SlidingWindowEvaluator.infer`` — upload, window gather, batched
      forward, Pallas overlap-add, normalize, label fetch — on a
      240x200x96 volume (a representative large LA case; 15 x 12 x 5 =
      900 windows at stride 18/4). Reference counterpart
      `utils/test_3d_patch.py:82-141`: one window per batch-1 forward
      with two host<->device crossings each.
    - ``pancreas``: the same engine at the final-test configuration —
      96^3 windows, stride 16/4 (`cli/test_pancreas.py` defaults,
      reference `pancreas/test_pancreas.py`), on a representative
      176x144x112 pancreas crop.
    - ``acdc``: ``Slice2DEvaluator.predict_volume`` — host zoom of every
      slice to 256x256, ONE batched device forward, zoom back — on a
      20-slice 256x216 cine volume. Reference counterpart
      `utils/val_2d.py:20-41` / `test_ACDC.py:36-79`: batch-1 forward
      per slice.

    Prints one JSON line (windows/s/chip or slices/s/chip). The
    reference publishes no inference throughput, so no ``vs_baseline``
    estimate is derived for any of these.
    """
    import numpy as np
    from bcp_tpu.config import acdc_config, la_config, pancreas_config
    from bcp_tpu.models import create_model

    cfg = {"la": la_config, "acdc": acdc_config,
           "pancreas": pancreas_config}[variant]()
    dtype = jnp.bfloat16
    model = create_model(cfg.net_type, cfg.num_classes, mode="test",
                         compute_dtype=dtype)
    x = jnp.zeros((1, *cfg.patch_size, cfg.in_channels), jnp.float32)
    variables = create_model(
        cfg.net_type, cfg.num_classes, mode="train",
        compute_dtype=dtype).init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, train=False)
    variables = {k: variables[k] for k in ("params", "batch_stats")
                 if k in variables}

    if variant == "acdc":
        from bcp_tpu.eval.slice2d import Slice2DEvaluator

        evaluator = Slice2DEvaluator(model, cfg.patch_size,
                                     cfg.num_classes)
        shape = (20, 256, 216)
        vol = np.asarray(
            jax.random.normal(jax.random.PRNGKey(2), shape), np.float32)
        evaluator.predict_volume(variables, vol)   # warmup/compile
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            evaluator.predict_volume(variables, vol)
        dt = (time.perf_counter() - t0) / reps
        # pipelined case stream with device-resident zoomed volumes —
        # exactly what validate_volumes(cache=True) runs every 200
        # iterations: dispatch volume i+1..i+3 while fetching/zooming i
        n_stream = 10
        vols = [vol] * n_stream
        toks = [("bench", i) for i in range(n_stream)]
        for _ in evaluator.predict_volumes(variables, vols,
                                           cache_tokens=toks):
            pass                                   # warmup + cache fill
        t0 = time.perf_counter()
        for _ in evaluator.predict_volumes(variables, vols,
                                           cache_tokens=toks):
            pass
        dt_pipe = (time.perf_counter() - t0) / n_stream
        print(json.dumps({
            "metric": (f"ACDC per-slice eval ({cfg.net_type} "
                       f"{'x'.join(map(str, cfg.patch_size))}, volume "
                       f"{'x'.join(map(str, shape))}, one batched "
                       f"forward per volume)"),
            "value": round(shape[0] / dt_pipe, 3),
            "unit": "slices/s/chip",
            "vs_baseline": 0.0,
            "serial_single_volume": round(shape[0] / dt, 3),
            "notes": "value = depth-3 pipelined case stream with cached "
                     "device volumes (what validate_volumes(cache=True) "
                     "runs at every eval boundary); serial_single_volume "
                     "= one blocking predict_volume per rep (the "
                     "round-3/4 methodology)",
        }))
        return

    from bcp_tpu.eval.sliding_window import (SlidingWindowEvaluator,
                                             window_starts)

    if variant == "la":
        sxy, sz = cfg.stride_xy, cfg.stride_z
        shape = (240, 200, 96)
    else:   # pancreas final-test strides (cli/test_pancreas.py)
        sxy, sz = 16, 4
        shape = (176, 144, 112)
    evaluator = SlidingWindowEvaluator(
        model, cfg.patch_size, cfg.num_classes, sxy, sz,
        batch=cfg.eval_batch)
    vol = np.asarray(jax.random.normal(jax.random.PRNGKey(2), shape),
                     np.float32)
    n_windows = len(window_starts(shape, cfg.patch_size, sxy, sz))
    evaluator.infer(variables, vol, rule=cfg.eval_rule,
                    return_score=False)          # warmup/compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        evaluator.infer(variables, vol, rule=cfg.eval_rule,
                        return_score=False)
    dt = (time.perf_counter() - t0) / reps
    # pipelined stream (what validate_dice / the test CLIs now run):
    # upload/fetch/dispatch of volume i overlap device compute of i+1
    n_stream = 6
    t0 = time.perf_counter()
    for _ in evaluator.infer_cases(variables, [vol] * n_stream,
                                   rule=cfg.eval_rule):
        pass
    dt_pipe = (time.perf_counter() - t0) / n_stream
    print(json.dumps({
        "metric": (f"{variant.upper()} sliding-window eval "
                   f"({cfg.net_type} "
                   f"{'x'.join(map(str, cfg.patch_size))} windows, "
                   f"stride {sxy}/{sz}, volume "
                   f"{'x'.join(map(str, shape))}, batch "
                   f"{cfg.eval_batch})"),
        "value": round(n_windows / dt_pipe, 3),
        "unit": "windows/s/chip",
        "vs_baseline": 0.0,
        "serial_single_volume": round(n_windows / dt, 3),
        "notes": "value = pipelined case stream (the protocol "
                 "validate_dice and the test CLIs run since round 4); "
                 "serial_single_volume = one blocking infer per volume "
                 "(the round-3 methodology)",
    }))


def main():
    # persistent XLA compile cache: the fused step's first compile is
    # minutes; subsequent bench runs hit the cache
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/bcp_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    from bcp_tpu.config import acdc_config, la_config, pancreas_config
    from bcp_tpu.models import create_model
    from bcp_tpu.train import (build_optimizer, init_state,
                               make_selftrain_step)

    # optional variant flag (driver contract: no args = LA metric);
    # argparse so a mistyped flag fails loudly instead of silently
    # benchmarking LA under the wrong label
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variant", choices=("la", "acdc", "pancreas"),
                    default="la")
    ap.add_argument("--eval", action="store_true",
                    help="benchmark sliding-window inference instead of "
                         "the train step")
    ap.add_argument("--remat", action="store_true",
                    help="per-stage rematerialisation (Config.remat): "
                         "measures the FLOPs-for-HBM trade's step cost")
    flags = ap.parse_args()
    variant = flags.variant
    if flags.remat and variant == "acdc":
        ap.error("--remat targets the 3-D V-Net pipelines")
    if flags.remat and flags.eval:
        ap.error("--remat applies to the train step, not inference")
    if flags.eval:
        return eval_bench(variant)
    cfg = {"la": la_config, "acdc": acdc_config,
           "pancreas": pancreas_config}[variant]()
    # real configuration (bf16 compute, f32 params)
    extra = {"remat": True} if flags.remat else {}
    model = create_model(cfg.net_type, cfg.num_classes,
                         compute_dtype=jnp.bfloat16, **extra)
    tx = build_optimizer(cfg, "self")
    state = init_state(model, cfg, jax.random.PRNGKey(0), tx)
    step = make_selftrain_step(model, tx, cfg)

    sub, usub = cfg.labeled_sub_bs, cfg.unlabeled_sub_bs
    S = cfg.patch_size
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    batch = {
        "img_a": jax.random.normal(ks[0], (sub, *S, 1), jnp.float32),
        "img_b": jax.random.normal(ks[1], (sub, *S, 1), jnp.float32),
        "lab_a": jax.random.randint(ks[2], (sub, *S), 0, cfg.num_classes),
        "lab_b": jax.random.randint(ks[3], (sub, *S), 0, cfg.num_classes),
        "uimg_a": jax.random.normal(ks[4], (usub, *S, 1), jnp.float32),
        "uimg_b": jax.random.normal(ks[5], (usub, *S, 1), jnp.float32),
    }
    batch = jax.device_put(batch)

    # NOTE: on the tunneled axon backend block_until_ready does not
    # actually gate on remote completion; fetching a scalar does.
    for i in range(WARMUP):
        state, metrics = step(state, batch, jax.random.PRNGKey(10 + i))
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / ITERS

    patches_per_sec = cfg.batch_size / dt
    tag = " remat" if flags.remat else ""
    if variant == "la":
        metric = ("3D patches/sec/chip (LA BCP self-train step, "
                  f"VNet 112x112x80 batch 8{tag})")
        vs = round(patches_per_sec / ASSUMED_BASELINE_PATCHES_PER_SEC, 3)
    else:
        shape = "x".join(str(s) for s in cfg.patch_size)
        metric = (f"patches/sec/chip ({variant} BCP self-train step, "
                  f"{cfg.net_type} {shape} batch {cfg.batch_size}{tag})")
        # BASELINE.md "ACDC / pancreas reference bands": central
        # self-train estimates 0.15 s/iter (ACDC, one 3090) and 0.75
        # s/iter (pancreas, 2x3090 DataParallel) at the reference batch
        central_s_per_iter = {"acdc": 0.15, "pancreas": 0.75}[variant]
        vs = round(patches_per_sec
                   / (cfg.batch_size / central_s_per_iter), 3)
    result = {
        "metric": metric,
        "value": round(patches_per_sec, 3),
        "unit": "patches/s/chip",
        "vs_baseline": vs,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
