"""Is a 4x4/stride-2 conv faster as space-to-depth + 2x2/stride-1?

Run: python scripts/bench_conv_std.py

Times the VQ-VAE encoder's four downsample shapes (dim 128, 256px, b=32)
both ways and checks exact equivalence (weights reshaped, input padded
before the space-to-depth so borders match).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def _sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def conv4x4s2(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_std(x, w):
    b, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 2, wd + 2
    xs = xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * c)
    ws = w.reshape(2, 2, 2, 2, w.shape[2], w.shape[3])
    ws = ws.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * w.shape[2], w.shape[3])
    return jax.lax.conv_general_dilated(
        xs, ws, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def time_fn(fn, *args, iters=10, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        _sync(f(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*args)
        _sync(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    b = 32
    shapes = [  # (H, cin, cout) encoder downs at dim 128, 256px
        (256, 128, 128),
        (128, 128, 256),
        (64, 256, 512),
        (32, 512, 1024),
    ]
    for H, cin, cout in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, H, H, cin), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (4, 4, cin, cout), jnp.bfloat16)
        d = float(np.asarray(jax.jit(
            lambda x, w: jnp.max(jnp.abs(
                conv4x4s2(x, w).astype(jnp.float32)
                - conv_std(x, w).astype(jnp.float32)
            ))
        )(x, w)))
        t1 = time_fn(conv4x4s2, x, w)
        t2 = time_fn(conv_std, x, w)
        gf = 2 * (H // 2) ** 2 * 16 * cin * cout * b / 1e9
        print(
            f"H={H:3d} {cin:4d}->{cout:4d}: conv4x4s2 {t1*1e3:7.2f} ms "
            f"({gf/t1/1e3:5.1f} TF/s)  std+2x2 {t2*1e3:7.2f} ms "
            f"({gf/t2/1e3:5.1f} TF/s)  {t1/t2:4.2f}x  maxdiff {d:.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
