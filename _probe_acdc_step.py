import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/bcp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
from bcp_tpu.config import acdc_config
from bcp_tpu.models import create_model
from bcp_tpu.train import build_optimizer, init_state, make_selftrain_step

K = 10
cfg = acdc_config().replace(steps_per_dispatch=K)
model = create_model(cfg.net_type, cfg.num_classes, compute_dtype=jnp.bfloat16)
tx = build_optimizer(cfg, "self")
state = init_state(model, cfg, jax.random.PRNGKey(0), tx)
stepK = make_selftrain_step(model, tx, cfg, n_steps=K)

sub, usub = cfg.labeled_sub_bs, cfg.unlabeled_sub_bs
S = cfg.patch_size
ks = jax.random.split(jax.random.PRNGKey(1), 6)
batch = {
    "img_a": jax.random.normal(ks[0], (K, sub, *S, 1), jnp.float32),
    "img_b": jax.random.normal(ks[1], (K, sub, *S, 1), jnp.float32),
    "lab_a": jax.random.randint(ks[2], (K, sub, *S), 0, cfg.num_classes),
    "lab_b": jax.random.randint(ks[3], (K, sub, *S), 0, cfg.num_classes),
    "uimg_a": jax.random.normal(ks[4], (K, usub, *S, 1), jnp.float32),
    "uimg_b": jax.random.normal(ks[5], (K, usub, *S, 1), jnp.float32),
}
batch = jax.device_put(batch)
keys = jax.random.split(jax.random.PRNGKey(2), K)

t0 = time.time()
state, metrics = stepK(state, batch, jax.random.PRNGKey(2), jnp.int32(0))
fl = jax.tree_util.tree_map(lambda x: float(np.asarray(x).sum()), metrics)
print("K=10 compile+first:", round(time.time() - t0, 2))
N = 10
t0 = time.time()
for i in range(N):
    state, metrics = stepK(state, batch, jax.random.PRNGKey(3+i), jnp.int32(i*K))
float(np.asarray(metrics["loss"]).sum())
dt = (time.time() - t0) / N
print("per K=10 dispatch:", round(dt, 4), "-> per iter:", round(dt / K, 4))
