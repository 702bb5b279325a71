"""Trace the LA self-train step and print a per-op time breakdown.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/trace_step.py
Parses the xplane proto directly (tensorboard's converter is broken against
the installed TF); see memory note 'bcp-tpu-perf-workflow'.
"""

import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp


def run_step(trace_dir: str):
    jax.config.update("jax_compilation_cache_dir", "/tmp/bcp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    from bcp_tpu.config import la_config
    from bcp_tpu.models import create_model
    from bcp_tpu.train import build_optimizer, init_state, make_selftrain_step

    cfg = la_config()
    model = create_model(cfg.net_type, cfg.num_classes,
                         compute_dtype=jnp.bfloat16)
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
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(10 + i))
    float(metrics["loss"])
    jax.profiler.start_trace(trace_dir)
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
    float(metrics["loss"])
    jax.profiler.stop_trace()


def parse(trace_dir: str, top: int = 40):
    import glob
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    assert paths, trace_dir
    xs = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name or "#" in plane.name.split(":")[-1]:
            continue
        print("== plane", plane.name)
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        stats_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = {}
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                agg.setdefault(name, [0, 0])
                agg[name][0] += ev.duration_ps / 1e9   # -> ms
                agg[name][1] += 1
            total = sum(v[0] for v in agg.values())
            print(f"total XLA-op time {total:.1f} ms over "
                  f"{sum(v[1] for v in agg.values())} events (3 steps)")
            groups = {}
            for name, (ms, n) in agg.items():
                key = name.split(".")[0].split("_")[0]
                g = groups.setdefault(key, [0, 0])
                g[0] += ms
                g[1] += n
            print("-- grouped by op family:")
            for k, (ms, n) in sorted(groups.items(), key=lambda x: -x[1][0])[:20]:
                print(f"  {ms:9.2f} ms {n:5d}x  {k}")
            print("-- top individual ops:")
            for name, (ms, n) in sorted(agg.items(), key=lambda x: -x[1][0])[:top]:
                print(f"  {ms:9.2f} ms {n:4d}x  {name[:110]}")


if __name__ == "__main__":
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bcp_trace"
    if len(sys.argv) > 2 and sys.argv[2] == "parse":
        parse(d)
    else:
        run_step(d)
        parse(d)
