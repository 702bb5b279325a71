"""Per-phase timing of the real train loop (feed wait / dispatch / fetch).

Replicates cli.train_la's self-train loop on the synthetic dataset with
the device store, timing each host-side phase to locate wall-clock
overhead vs the bench step.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/time_loop.py /tmp/v_la
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(root):
    jax.config.update("jax_compilation_cache_dir", "/tmp/bcp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    from bcp_tpu.config import la_config
    from bcp_tpu.data.feed import BCPBatchFeeder
    from bcp_tpu.models import create_model
    from bcp_tpu.train import build_optimizer, init_state, make_selftrain_step

    cfg = la_config(labelnum=4).replace(root_path=root, max_samples=10)
    model = create_model(cfg.net_type, cfg.num_classes,
                         compute_dtype=jnp.bfloat16)
    tx = build_optimizer(cfg, "self")
    state = init_state(model, cfg, jax.random.PRNGKey(0), tx)
    step = make_selftrain_step(model, tx, cfg)
    feeder = BCPBatchFeeder(cfg, "self")
    base_key = jax.random.PRNGKey(1)

    N, WARM = 50, 8
    phases = {"feed": [], "dispatch": [], "emit": [], "iter": []}
    pending = None
    for it in range(1, N + 1):
        t0 = time.perf_counter()
        batch = next(feeder)
        t1 = time.perf_counter()
        key = jax.random.fold_in(base_key, it)
        state, metrics = step(state, batch, key)
        t2 = time.perf_counter()
        if pending is not None:
            {k: float(v) for k, v in jax.device_get(pending).items()}
        pending = metrics
        t3 = time.perf_counter()
        if it > WARM:
            phases["feed"].append(t1 - t0)
            phases["dispatch"].append(t2 - t1)
            phases["emit"].append(t3 - t2)
            phases["iter"].append(t3 - t0)
    for k, v in phases.items():
        v = np.array(v) * 1000
        print(f"{k:9s} mean {v.mean():7.1f} ms  p50 {np.percentile(v, 50):7.1f}"
              f"  p90 {np.percentile(v, 90):7.1f}  max {v.max():7.1f}")
    feeder.close()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/v_la")
