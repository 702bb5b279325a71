import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/bcp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
from bcp_tpu.config import acdc_config
from bcp_tpu.data.feed import BCPBatchFeeder
from bcp_tpu.models import create_model
from bcp_tpu.train import build_optimizer, init_state, make_selftrain_step

K = 10
cfg = acdc_config().replace(root_path="/tmp/run_acdc_data", labelnum=7,
                            steps_per_dispatch=K)
model = create_model(cfg.net_type, cfg.num_classes, compute_dtype=jnp.bfloat16)
tx = build_optimizer(cfg, "self")
state = init_state(model, cfg, jax.random.PRNGKey(0), tx)
stepK = make_selftrain_step(model, tx, cfg, n_steps=K)
feeder = BCPBatchFeeder(cfg, "self", seed=1337)
it = iter(feeder)

def strip(b):
    return {k: v for k, v in b.items() if not k.startswith("ulab")}

t0 = time.time()
b = next(it)
state, metrics = stepK(state, strip(b), jax.random.PRNGKey(2), jnp.int32(0))
print("first block (compiles):", round(time.time() - t0, 1), "s", flush=True)
float(np.asarray(metrics["loss"]).sum())

feed_t, step_t = [], []
for i in range(20):
    t0 = time.time()
    b = next(it)
    float(jnp.sum(b["img_a"]))          # sync: aug + upload done
    t1 = time.time()
    state, metrics = stepK(state, strip(b), jax.random.PRNGKey(3 + i),
                           jnp.int32(10 + i * K))
    float(np.asarray(metrics["loss"]).sum())   # sync: step done
    t2 = time.time()
    feed_t.append(t1 - t0); step_t.append(t2 - t1)
print("feed p50:", round(np.median(feed_t), 4),
      "step p50:", round(np.median(step_t), 4),
      "block p50:", round(np.median(np.add(feed_t, step_t)), 4),
      "-> per iter", round(np.median(np.add(feed_t, step_t)) / K, 4))
feeder.close()
