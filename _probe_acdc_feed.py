import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/bcp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
from bcp_tpu.config import acdc_config
from bcp_tpu.data.feed import BCPBatchFeeder

cfg = acdc_config().replace(root_path="/tmp/run_acdc_data", labelnum=7,
                            steps_per_dispatch=10)
t0 = time.time()
feeder = BCPBatchFeeder(cfg, "self", seed=1337, stack=10)
it = iter(feeder)
b = next(it)
jax.block_until_ready(b["img_a"])
float(jax.numpy.sum(b["img_a"]))
print("first batch (incl compiles):", round(time.time() - t0, 2), "s")
# steady state: time 20 stacked blocks, sync via scalar fetch
t0 = time.time()
N = 20
for _ in range(N):
    b = next(it)
    float(jax.numpy.sum(b["img_a"]))   # forces the whole chain on axon
dt = (time.time() - t0) / N
print("per K=10 block feed:", round(dt, 4), "s -> per iter", round(dt/10, 4))
feeder.close()
