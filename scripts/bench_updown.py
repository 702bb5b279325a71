"""Microbench: lowering strategies for V-Net 2^3 stride-2 down/up blocks.

Run on TPU:  python scripts/bench_updown.py

Compares, at LA train shapes (grouped batch 16 = 8 mixed + 8 mixed):
  down: direct strided conv  vs  space-to-depth + matmul
  up:   flax ConvTranspose   vs  matmul + depth-to-space
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    # axon tunnel: only a scalar fetch truly synchronises
    float(jnp.sum(out if isinstance(out, jax.Array) else out[0])[...])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out if isinstance(out, jax.Array) else out[0])[...])
    return (time.time() - t0) / n * 1e3


def down_direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def down_matmul(x, w):
    B, X, Y, Z, C = x.shape
    co = w.shape[-1]
    xs = x.reshape(B, X // 2, 2, Y // 2, 2, Z // 2, 2, C)
    xs = xs.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        B, X // 2, Y // 2, Z // 2, 8 * C)
    return xs @ w.reshape(8 * C, co)


def up_deconv(x, w):
    # flax ConvTranspose lowering: conv_transpose
    return jax.lax.conv_transpose(
        x, w, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def up_matmul(x, w):
    B, X, Y, Z, C = x.shape
    co = w.shape[-1]
    # w layout (2,2,2,Ci,Co) -> (Ci, 8*Co) with lane index (di,dj,dk,co);
    # conv_transpose writes tap w[1-d] at output offset d (kernel flip)
    wf = jnp.flip(w, axis=(0, 1, 2))
    y = x @ wf.transpose(3, 0, 1, 2, 4).reshape(C, 8 * co)
    y = y.reshape(B, X, Y, Z, 2, 2, 2, co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(B, 2 * X, 2 * Y, 2 * Z, co)


def grad_of(fn):
    def g(x, w):
        return jax.grad(
            lambda xx, ww: jnp.sum(fn(xx, ww).astype(jnp.float32)),
            argnums=(0, 1))(x, w)[0]
    return g


def main():
    key = jax.random.PRNGKey(0)
    B = 8  # LA self-train concat forward batch (4 + 4 mixed)
    shapes = [  # (X, Y, Z, Ci, Co) encoder downs
        (112, 112, 80, 16, 32),
        (56, 56, 40, 32, 64),
        (28, 28, 20, 64, 128),
        (14, 14, 10, 128, 256),
    ]
    print("== down blocks (2^3 stride-2 conv) ==")
    for X, Y, Z, ci, co in shapes:
        x = jax.random.normal(key, (B, X, Y, Z, ci), jnp.bfloat16)
        w = jax.random.normal(key, (2, 2, 2, ci, co), jnp.bfloat16)
        wm = w  # same values
        t_d = timeit(jax.jit(down_direct), x, w)
        t_m = timeit(jax.jit(down_matmul), x, wm)
        g_d = timeit(jax.jit(grad_of(down_direct)), x, w)
        g_m = timeit(jax.jit(grad_of(down_matmul)), x, wm)
        a = down_direct(x, w)
        b = down_matmul(x, w)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
        print(f"  {X}x{Y}x{Z} {ci}->{co}: fwd direct {t_d:6.2f} / "
              f"matmul {t_m:6.2f} ms | bwd {g_d:6.2f} / {g_m:6.2f} ms"
              f" | maxerr {err:.3e}")

    print("== up blocks (2^3 stride-2 deconv) ==")
    up_shapes = [  # decoder ups (input res)
        (7, 7, 5, 256, 128),
        (14, 14, 10, 128, 64),
        (28, 28, 20, 64, 32),
        (56, 56, 40, 32, 16),
    ]
    for X, Y, Z, ci, co in up_shapes:
        x = jax.random.normal(key, (B, X, Y, Z, ci), jnp.bfloat16)
        w = jax.random.normal(key, (2, 2, 2, ci, co), jnp.bfloat16)
        t_d = timeit(jax.jit(up_deconv), x, w)
        t_m = timeit(jax.jit(up_matmul), x, w)
        g_d = timeit(jax.jit(grad_of(up_deconv)), x, w)
        g_m = timeit(jax.jit(grad_of(up_matmul)), x, w)
        a = up_deconv(x, w)
        b = up_matmul(x, w)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
        print(f"  {X}x{Y}x{Z} {ci}->{co}: fwd deconv {t_d:6.2f} / "
              f"matmul {t_m:6.2f} ms | bwd {g_d:6.2f} / {g_m:6.2f} ms"
              f" | maxerr {err:.3e}")


if __name__ == "__main__":
    main()
