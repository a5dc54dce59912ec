"""Sparse3DNA backend comparison on the real TPU chip: training step
(fwd+bwd+AdamW) and forward-only, at the docs/BENCHMARKS.md config
(fmap 16, kernel (5,3,3), dilations (1,2,4), dim 512, depth 6, bf16).

Run: python scripts/bench_nda_train.py [--backends dense pallas gather]
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from nuwa_tpu.utils.timing import device_rate  # noqa: E402

from nuwa_tpu.transformer import Transformer


def _sync(x):
    return float(np.asarray(x))


def build(backend, use_pallas, *, dim=512, depth=6, heads=8, dim_head=64,
          frames=8, fmap=16, row_block=None):
    return Transformer(
        dim=dim,
        depth=depth,
        causal=True,
        heads=heads,
        dim_head=dim_head,
        sparse_3dna_attn=True,
        sparse_3dna_kernel_size=(5, 3, 3),
        sparse_3dna_dilations=(1, 2, 4),
        sparse_3dna_video_shape=(frames, fmap, fmap),
        sparse_3dna_rel_pos_bias=True,
        sparse_3dna_backend=backend,
        sparse_3dna_use_pallas=use_pallas,
        sparse_3dna_row_block=row_block,
        shift_video_tokens=True,
    )


def bench_backend(name, *, batch=2, frames=8, fmap=16, steps=5, train=True,
                  row_block=None):
    use_pallas = name in ("pallas", "pallas_rb")
    backend = name if name in ("dense", "gather", "dense_chunked") else "gather"
    if name == "pallas_rb" and row_block is None:
        row_block = max(1, 128 // fmap)  # smallest block with 128-lane rows
    model = build(backend, use_pallas, frames=frames, fmap=fmap,
                  row_block=row_block if name == "pallas_rb" else None)
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    t = frames * fmap * fmap
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 1 + t, model.dim))
    x = x.astype(jnp.bfloat16)

    if not train:
        fn = jax.jit(lambda p, x: jnp.sum(model(p, x).astype(jnp.float32)))
        _sync(fn(params, x))
        return device_rate(lambda: fn(params, x)) * 1e3

    tx = optax.adamw(1e-4)
    opt = tx.init(params)

    def loss_fn(p, x):
        out = model(p, x).astype(jnp.float32)
        return jnp.mean(out**2)

    @jax.jit
    def step(p, opt, x):
        loss, grads = jax.value_and_grad(loss_fn)(p, x)
        updates, opt = tx.update(grads, opt, p)
        p = optax.apply_updates(p, updates)
        return p, opt, loss

    state = list(step(params, opt, x))
    _sync(state[-1])

    def dispatch():
        state[:] = step(state[0], state[1], x)
        return state[-1]

    return device_rate(dispatch) * 1e3


def parity_check(frames=4, fmap=16, batch=1):
    """Compiled-mode pallas vs dense forward + grads on the chip."""
    m_dense = build("dense", False, frames=frames, fmap=fmap, depth=1)
    m_pl = build("dense", True, frames=frames, fmap=fmap, depth=1)
    params = m_dense.init(jax.random.PRNGKey(0))
    t = frames * fmap * fmap
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 1 + t, m_dense.dim))

    def loss(m, p, x):
        return jnp.mean(m(p, x).astype(jnp.float32) ** 2)

    l_d, g_d = jax.jit(jax.value_and_grad(lambda p: loss(m_dense, p, x)))(params)
    l_p, g_p = jax.jit(jax.value_and_grad(lambda p: loss(m_pl, p, x)))(params)
    dl = abs(_sync(l_d) - _sync(l_p))
    gmax = 0.0
    for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_p)):
        gmax = max(gmax, _sync(jnp.max(jnp.abs(a - b))))
    return dl, gmax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backends", nargs="+", default=["dense", "pallas"])
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    if args.parity:
        dl, gmax = parity_check()
        print(json.dumps({"parity_loss_diff": dl, "parity_grad_maxdiff": gmax}), flush=True)

    results = {}
    for name in args.backends:
        ms = bench_backend(name, steps=args.steps, train=not args.fwd_only, batch=args.batch)
        results[name] = round(ms, 2)
        print(json.dumps({"backend": name, "ms_per_step": results[name],
                          "mode": "fwd" if args.fwd_only else "train"}), flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
