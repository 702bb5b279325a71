"""Component floor for the LA self-train step (DESIGN.md headroom analysis).

Times, each as its own jitted program at the real LA configuration
(VNet bf16, batch 2+2 labeled / 2+2 unlabeled, grouped BN):

  teacher   train-mode forward on the concat unlabeled batch (4)
  grad      student loss value_and_grad on the concat mixed batch (4)
  nms       pseudo-label (softmax-threshold + batched largest-CC) on
            teacher-like logits
  update    SGD update + EMA tree ops
  step      the full fused self-train step (bench.py's measurement)

The sum of the isolated pieces is the additive floor; step/sum - 1 is the
fusion overhead (layout copies at program boundaries partially *drop*
when pieces fuse, so sum can exceed step — both directions reported).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_components.py
"""

import time

import jax
import jax.numpy as jnp


def timeit(fn, sync, warmup=2, iters=5):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000  # ms


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/bcp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    from bcp_tpu.config import la_config
    from bcp_tpu.models import create_model
    from bcp_tpu.ops import cc, losses, masks
    from bcp_tpu.ops.ema import ema_update
    from bcp_tpu.train import build_optimizer, init_state, make_selftrain_step
    from bcp_tpu.train.steps import _grouped

    cfg = la_config()
    model = create_model(cfg.net_type, cfg.num_classes,
                         compute_dtype=jnp.bfloat16)
    gmodel = _grouped(model)
    tx = build_optimizer(cfg, "self")
    state = init_state(model, cfg, jax.random.PRNGKey(0), tx)
    step = make_selftrain_step(model, tx, cfg)
    S = cfg.patch_size
    sub, usub = cfg.labeled_sub_bs, cfg.unlabeled_sub_bs
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    batch = {
        "img_a": jax.random.normal(ks[0], (sub, *S, 1), jnp.float32),
        "img_b": jax.random.normal(ks[1], (sub, *S, 1), jnp.float32),
        "lab_a": jax.random.randint(ks[2], (sub, *S), 0, cfg.num_classes),
        "lab_b": jax.random.randint(ks[3], (sub, *S), 0, cfg.num_classes),
        "uimg_a": jax.random.normal(ks[4], (usub, *S, 1), jnp.float32),
        "uimg_b": jax.random.normal(ks[5], (usub, *S, 1), jnp.float32),
    }
    batch = jax.device_put(batch)
    uconcat = jnp.concatenate([batch["uimg_a"], batch["uimg_b"]])
    mixed = jnp.concatenate([batch["img_a"], batch["uimg_b"]])

    def sync_tree(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        float(jnp.asarray(leaf).ravel()[0])

    results = {}

    # teacher forward (train-mode BN + dropout, stats discarded)
    @jax.jit
    def teacher(params, bs, x, key):
        variables = {"params": params, "batch_stats": bs}
        out, _ = gmodel.apply(variables, x, train=True,
                              mutable=["batch_stats"],
                              rngs={"dropout": key})
        return out[0] if isinstance(out, tuple) else out
    key = jax.random.PRNGKey(2)
    results["teacher_fwd"] = timeit(
        lambda: teacher(state.teacher_params, state.teacher_batch_stats,
                        uconcat, key), sync_tree)
    t_logits = teacher(state.teacher_params, state.teacher_batch_stats,
                       uconcat, key)

    # NMS / pseudo-label on those logits
    @jax.jit
    def plab(logits):
        return cc.get_cut_mask(logits, nms=cfg.nms,
                               connectivity=cfg.cc_connectivity)
    results["pseudo_label_nms"] = timeit(lambda: plab(t_logits), sync_tree)
    pl = plab(t_logits)

    # student grad (concat mixed batch, grouped BN, masked mix loss)
    mask = masks.cuboid_mask(jax.random.PRNGKey(3), S, cfg.mask_ratio)

    def loss_fn(params, bs, in1, in2, pa, pb, m, dk):
        n = in1.shape[0]
        variables = {"params": params, "batch_stats": bs}
        (out, _), upd = gmodel.apply(
            variables, jnp.concatenate([in1, in2]), train=True,
            mutable=["batch_stats"], rngs={"dropout": dk})
        logits1, logits2 = out[:n], out[n:]
        lmask = jnp.broadcast_to(m[None], (n, *S))
        l1 = losses.mix_loss_volume(logits1, batch["lab_a"], pa, lmask,
                                    u_weight=cfg.u_weight)
        l2 = losses.mix_loss_volume(logits2, pb, batch["lab_b"], lmask,
                                    u_weight=cfg.u_weight, unlab=True)
        return l1 + l2

    grad_fn = jax.jit(jax.grad(loss_fn))
    in1 = masks.mix(batch["img_a"], batch["uimg_a"], mask)
    in2 = masks.mix(batch["uimg_b"], batch["img_b"], mask)
    results["student_grad"] = timeit(
        lambda: grad_fn(state.params, state.batch_stats, in1, in2,
                        pl[:usub], pl[usub:], mask,
                        jax.random.PRNGKey(4)), sync_tree)
    grads = grad_fn(state.params, state.batch_stats, in1, in2,
                    pl[:usub], pl[usub:], mask, jax.random.PRNGKey(4))

    # optimizer + EMA tree update
    @jax.jit
    def update(params, opt_state, teacher_params, g):
        import optax
        updates, new_opt = tx.update(g, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, ema_update(teacher_params, new_params,
                                               cfg.ema_alpha)
    results["sgd_ema_update"] = timeit(
        lambda: update(state.params, state.opt_state,
                       state.teacher_params, grads), sync_tree)

    # full fused step
    def full():
        new_state, metrics = step(state, batch, jax.random.PRNGKey(5))
        return metrics

    # NOTE cannot donate repeatedly with the same state; step was built
    # with donation — run through fresh copies
    import copy
    st = state

    def full_run():
        nonlocal st
        st, metrics = step(st, batch, jax.random.PRNGKey(5))
        return metrics
    results["full_step"] = timeit(full_run, sync_tree)

    floor = (results["teacher_fwd"] + results["pseudo_label_nms"]
             + results["student_grad"] + results["sgd_ema_update"])
    print("\ncomponent timings (ms):")
    for k, v in results.items():
        print(f"  {k:18s} {v:8.2f}")
    print(f"  {'sum_of_parts':18s} {floor:8.2f}")
    print(f"  fusion delta: step - sum = "
          f"{results['full_step'] - floor:+.2f} ms "
          f"({(results['full_step'] / floor - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
