"""Decompose the LA sliding-window eval chunk into timed components.

Round-3 verdict: 89 windows/s end-to-end vs ~124 windows/s bound from the
batch-16 forward alone — ~35 ms/chunk of non-forward work. This script
attributes it on the real chip: forward-only, gather-only, scatter-only,
full chunk, and the fused whole-volume program, each timed as its own
jitted program with block_until_ready.

Usage: python scripts/trace_eval.py [--variant la|pancreas]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, warmup=2, reps=10):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="la")
    args = ap.parse_args()

    from bcp_tpu.config import la_config, pancreas_config
    from bcp_tpu.models import create_model
    from bcp_tpu.eval.sliding_window import (SlidingWindowEvaluator,
                                             window_starts)

    cfg = {"la": la_config, "pancreas": pancreas_config}[args.variant]()
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

    if args.variant == "la":
        sxy, sz = cfg.stride_xy, cfg.stride_z
        shape = (240, 200, 96)
    else:
        sxy, sz = 16, 4
        shape = (176, 144, 112)
    ev = SlidingWindowEvaluator(model, cfg.patch_size, cfg.num_classes,
                                sxy, sz, batch=cfg.eval_batch)
    vol_np = np.asarray(jax.random.normal(jax.random.PRNGKey(2), shape),
                        np.float32)
    starts = window_starts(shape, cfg.patch_size, sxy, sz)
    n = len(starts)
    B = ev.batch
    n_chunks = -(-n // B)
    print(f"{args.variant}: {n} windows, batch {B}, {n_chunks} chunks, "
          f"bucket {ev.bucket}")

    from bcp_tpu.eval.sliding_window import bucket_shape, pad_to_patch
    img, _ = pad_to_patch(vol_np, ev.patch)
    padded = bucket_shape(img.shape, ev.bucket, ev.patch)
    img = np.pad(img, [(0, p - s) for p, s in zip(padded, img.shape)])
    volume = jnp.asarray(img)
    score0 = jnp.zeros((*padded, cfg.num_classes), jnp.float32)
    starts_dev = jnp.asarray(starts[:B].astype(np.int32))
    valid = jnp.ones((B,), jnp.float32)
    patch = ev.patch
    C = cfg.num_classes

    # 0. raw upload + fetch costs through the device link
    def upload():
        return jax.block_until_ready(jnp.asarray(img))
    t_up = timeit(upload, warmup=1, reps=5)
    lbl = jax.block_until_ready(
        jnp.zeros(padded, jnp.uint8))
    t_down = timeit(lambda: np.asarray(lbl), warmup=1, reps=5)
    mb = img.nbytes / 1e6
    print(f"upload {mb:5.1f} MB      : {t_up*1e3:8.1f} ms "
          f"({mb/t_up:6.0f} MB/s)")
    print(f"fetch  {lbl.size/1e6:5.1f} MB      : {t_down*1e3:8.1f} ms")

    # 1. full end-to-end volume
    t_full = timeit(lambda: ev.infer(variables, vol_np,
                                     rule=cfg.eval_rule,
                                     return_score=False), reps=3)
    print(f"full infer          : {t_full*1e3:8.1f} ms/vol "
          f"({n/t_full:6.1f} w/s)")

    # 1b. pipelined over 6 volumes
    vols = [vol_np] * 6
    def pipelined():
        for _ in ev.infer_cases(variables, vols, rule=cfg.eval_rule):
            pass
    t_pipe = timeit(pipelined, warmup=1, reps=2) / len(vols)
    print(f"pipelined infer     : {t_pipe*1e3:8.1f} ms/vol "
          f"({n/t_pipe:6.1f} w/s)")

    # 2. forward-only on a pre-gathered fixed batch
    patches = jax.block_until_ready(
        jax.vmap(lambda s: jax.lax.dynamic_slice(
            volume, (s[0], s[1], s[2]), patch))(starts_dev)[..., None])

    @jax.jit
    def fwd(v, p):
        out = model.apply(v, p, train=False)
        return out[0] if isinstance(out, tuple) else out
    t_fwd = timeit(fwd, variables, patches)
    print(f"forward (B={B})      : {t_fwd*1e3:8.1f} ms/chunk "
          f"(bound {B/t_fwd:6.1f} w/s, vol {n_chunks*t_fwd*1e3:6.1f} ms)")

    # 3. gather-only
    @jax.jit
    def gather(vol, s):
        return jax.vmap(lambda st: jax.lax.dynamic_slice(
            vol, (st[0], st[1], st[2]), patch))(s)[..., None]
    t_g = timeit(gather, volume, starts_dev)
    print(f"gather (B={B})       : {t_g*1e3:8.1f} ms/chunk "
          f"(vol {n_chunks*t_g*1e3:6.1f} ms)")

    # 4. softmax+mask only
    logits = jax.block_until_ready(fwd(variables, patches))

    @jax.jit
    def smax(lg, v):
        return jax.nn.softmax(lg, axis=-1) * v[:, None, None, None, None]
    t_s = timeit(smax, logits, valid)
    print(f"softmax+mask        : {t_s*1e3:8.1f} ms/chunk "
          f"(vol {n_chunks*t_s*1e3:6.1f} ms)")

    # 5. scatter-only (pallas)
    from bcp_tpu.ops.scatter import pallas_supported, scatter_add_windows
    probs = jax.block_until_ready(smax(logits, valid).astype(jnp.float32))
    if pallas_supported(probs.shape, score0.shape):
        def sc(p, s):
            return scatter_add_windows(
                jnp.zeros((*padded, C), jnp.float32), p, s)
        t_sc = timeit(jax.jit(sc), probs, starts_dev)
        print(f"pallas scatter      : {t_sc*1e3:8.1f} ms/chunk "
              f"(vol {n_chunks*t_sc*1e3:6.1f} ms)")
    else:
        print("pallas scatter      : unsupported shape")

    # 6. one full chunk (gather+fwd+softmax+scatter) as its own program
    @jax.jit
    def chunk(v, vol, s, val, sc):
        return ev._process_chunk(v, vol, s, val, sc)
    t_c = timeit(chunk, variables, volume, starts_dev, valid, score0)
    print(f"full chunk          : {t_c*1e3:8.1f} ms/chunk "
          f"(vol {n_chunks*t_c*1e3:6.1f} ms)")

    # 7. the fused whole-volume program (no host pre/post)
    pad_n = n_chunks * B - n
    all_starts = jnp.asarray(np.concatenate(
        [starts, np.zeros((pad_n, 3))]).astype(np.int32))
    all_valid = jnp.asarray(np.concatenate(
        [np.ones(n, np.float32), np.zeros(pad_n, np.float32)]))
    cnt = ev._count_map(starts, padded)
    vol_fn = ev._volume_fn(padded, n_chunks, cfg.eval_rule)
    t_v = timeit(lambda: vol_fn(variables, volume, all_starts,
                                all_valid, cnt), reps=3)
    print(f"fused volume program: {t_v*1e3:8.1f} ms/vol "
          f"({n/t_v:6.1f} w/s)")
    print(f"host pre/post+fetch : {(t_full-t_v)*1e3:8.1f} ms/vol")
    print(f"non-forward on-dev  : {(t_v-n_chunks*t_fwd)*1e3:8.1f} ms/vol "
          f"({(t_v/n_chunks-t_fwd)*1e3:.1f} ms/chunk)")


if __name__ == "__main__":
    main()
