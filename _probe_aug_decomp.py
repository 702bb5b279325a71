import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/bcp_tpu_jax_cache")
from bcp_tpu.config import acdc_config
from bcp_tpu.data.datasets import ACDCDataset
from bcp_tpu.data import device_store as ds

cfg = acdc_config().replace(root_path="/tmp/run_acdc_data", labelnum=7)
train = ACDCDataset(cfg.root_path, "train")
idx = list(range(len(train)))
store = ds.DeviceSliceStore.from_dataset(train, idx, out_size=cfg.patch_size)
print("store:", store.images.shape, store.images.dtype)

rng = np.random.default_rng(0)
N = 240   # one K=10 block's labeled+unlabeled draws combined is 2x120
ids = rng.integers(0, len(idx), N).astype(np.int32)
p = store.draw_params(ids, rng)
idx_a, modes, ks_a, flips, angles = p
hs = jnp.asarray(store.shapes[idx_a, 0]); ws = jnp.asarray(store.shapes[idx_a, 1])
params = (store.images, store.labels, jnp.asarray(idx_a), hs, ws,
          jnp.asarray(modes), jnp.asarray(ks_a), jnp.asarray(flips), jnp.asarray(angles))

def timeit(fn, args, label, reps=10):
    out = fn(*args); jax.block_until_ready(out)
    r = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        r = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(r.astype(jnp.float32)))
    print(label, round((time.time() - t0) / reps * 1000, 1), "ms", flush=True)

# A: full aug program
timeit(store._aug_fn, params, "A full aug:", 10)

# B: copy-only (gather of slices, no per-pixel gather)
@jax.jit
def copy_only(images, labels, idx, hs, ws, modes, ks, flips, angles):
    return images[idx][:, :256, :216], labels[idx][:, :256, :216]
timeit(copy_only, params, "B slice gather only:", 10)

# C: separable take (timing shape only — not exact math)
oh, ow = cfg.patch_size
@jax.jit
def separable(images, labels, idx, hs, ws, modes, ks, flips, angles):
    img = images[idx]; lab = labels[idx]
    zi = jnp.clip((jnp.arange(oh)[None, :] * (hs[:, None] - 1)) // (oh - 1), 0, images.shape[1] - 1)
    zj = jnp.clip((jnp.arange(ow)[None, :] * (ws[:, None] - 1)) // (ow - 1), 0, images.shape[2] - 1)
    img = jnp.take_along_axis(img, zi[:, :, None], axis=1)
    img = jnp.take_along_axis(img, zj[:, None, :], axis=2)
    lab = jnp.take_along_axis(lab, zi[:, :, None], axis=1)
    lab = jnp.take_along_axis(lab, zj[:, None, :], axis=2)
    return img, lab
timeit(separable, params, "C separable takes:", 10)

# D: flat 1D gather per slice (exact same indices as A, different lowering)
hmax, wmax = store.images.shape[1:]
aug = store._aug_fn
