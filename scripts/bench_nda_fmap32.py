"""Row-blocked Pallas 3DNA at fmap 32 (256px, HW=1024) on the real chip:
compiled parity vs the chunked dense XLA path + forward/train timing.

Run: python scripts/bench_nda_fmap32.py
"""
import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from nuwa_tpu.nda import Sparse3DNA


def _sync(x):
    return float(np.asarray(x))


def main(frames=4, fmap=32, dim=512, heads=8, dim_head=64, batch=1):
    mod_xla = Sparse3DNA(
        dim=dim, video_shape=(frames, fmap, fmap), kernel_size=(5, 3, 3),
        dilation=(1, 2, 2), heads=heads, dim_head=dim_head, causal=True,
        rel_pos_bias=True, backend="dense_chunked",
    )
    mod_pl = mod_xla.replace(use_pallas=True)
    p = mod_xla.init(jax.random.PRNGKey(0))
    t = frames * fmap * fmap
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 1 + t, dim))
    w = jax.random.normal(jax.random.PRNGKey(2), (batch, 1 + t, dim))

    print(f"platform: {jax.devices()[0].platform}  tokens: {t}", flush=True)

    # parity: forward + grads (fixed cotangent)
    def loss(m, pp, xx):
        return jnp.sum(m(pp, xx).astype(jnp.float32) * w)

    f_xla = jax.jit(lambda pp, xx: jnp.sum(jnp.abs(mod_xla(pp, xx).astype(jnp.float32))))
    f_pl = jax.jit(lambda pp, xx: jnp.sum(jnp.abs(mod_pl(pp, xx).astype(jnp.float32))))
    o1, o2 = _sync(f_xla(p, x)), _sync(f_pl(p, x))
    print(json.dumps({"fwd_sum_xla": o1, "fwd_sum_pl": o2,
                      "rel": abs(o1 - o2) / abs(o1)}), flush=True)

    gfn_x = jax.jit(jax.grad(lambda pp: loss(mod_xla, pp, x)))
    gfn_p = jax.jit(jax.grad(lambda pp: loss(mod_pl, pp, x)))
    gx, gp = gfn_x(p), gfn_p(p)
    gmax = 0.0
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        gmax = max(gmax, _sync(jnp.max(jnp.abs(a - b))))
    print(json.dumps({"grad_maxdiff": gmax}), flush=True)

    # training-step comparison (fwd+bwd+AdamW, bf16 activations)
    import optax
    for name, m in (("dense_chunked", mod_xla), ("pallas_rb", mod_pl)):
        pm = jax.tree.map(lambda x: x, p)
        tx = optax.adamw(1e-4)
        opt = tx.init(pm)
        xb16 = x.astype(jnp.bfloat16)

        def loss_fn(pp, _m=m):
            return jnp.mean(_m(pp, xb16).astype(jnp.float32) ** 2)

        @jax.jit
        def tstep(pp, opt):
            l, grads = jax.value_and_grad(loss_fn)(pp)
            updates, opt = tx.update(grads, opt, pp)
            return optax.apply_updates(pp, updates), opt, l

        from nuwa_tpu.utils.timing import device_rate

        state = list(tstep(pm, opt))
        _sync(state[-1])

        def dispatch():
            state[:] = tstep(state[0], state[1])
            return state[-1]

        dt = device_rate(dispatch, k_lo=1, k_hi=5)
        print(json.dumps({"backend": name, "train_ms": round(dt * 1e3, 2)}),
              flush=True)

    # timing (bf16 activations, fwd only)
    xb = x.astype(jnp.bfloat16)
    for name, fn in (("dense_chunked", f_xla), ("pallas_rb", f_pl)):
        fnb = jax.jit(lambda pp, xx, _f=(mod_xla if name == "dense_chunked" else mod_pl):
                      jnp.sum(_f(pp, xx).astype(jnp.float32)))
        from nuwa_tpu.utils.timing import device_rate

        _sync(fnb(p, xb))
        dt = device_rate(lambda: fnb(p, xb), k_lo=1, k_hi=5)
        print(json.dumps({"backend": name, "fwd_ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
