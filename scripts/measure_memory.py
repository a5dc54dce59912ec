"""Measure activation-memory scaling of plain vs remat vs reversible stacks.

Uses XLA's compile-time memory analysis (``compiled.memory_analysis()``,
peak device allocation) for a training step
(loss + grads) at fixed dim and growing depth — the numbers behind the
reversible O(1)-in-depth claim (reference README.md:93; SURVEY §2.4).

Run: python scripts/measure_memory.py  (TPU or CPU)
"""
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from nuwa_tpu.transformer import ReversibleTransformer, Transformer


def build(variant, depth, dim=256, heads=4, dim_head=64, frames=8, fmap=8):
    kw = dict(
        dim=dim,
        depth=depth,
        causal=True,
        heads=heads,
        dim_head=dim_head,
        sparse_3dna_attn=True,
        sparse_3dna_kernel_size=3,
        sparse_3dna_dilations=(1, 2),
        sparse_3dna_video_shape=(frames, fmap, fmap),
        sparse_3dna_backend="dense",  # same backend for all variants
        shift_video_tokens=True,
    )
    if variant == "reversible":
        return ReversibleTransformer(**kw)
    if variant == "remat":
        return Transformer(**kw, remat=True)
    return Transformer(**kw)


def temp_bytes(variant, depth, batch=2, frames=8, fmap=8, dim=256):
    model = build(variant, depth, dim=dim, frames=frames, fmap=fmap)
    params = model.init(jax.random.PRNGKey(0))
    t = frames * fmap * fmap
    x = jnp.zeros((batch, 1 + t, dim), jnp.bfloat16)

    def loss(p, x):
        return jnp.mean(model(p, x).astype(jnp.float32) ** 2)

    step = jax.jit(jax.value_and_grad(loss))
    compiled = step.lower(params, x).compile()
    ma = compiled.memory_analysis()
    # peak includes params+grads (argument/output buffers), which grow with
    # depth regardless of variant; the *activation* footprint is the peak
    # minus those. (temp_size alone misclassifies the reversible program.)
    peak = int(ma.peak_memory_in_bytes)
    fixed = int(ma.argument_size_in_bytes) + int(ma.output_size_in_bytes)
    return peak, max(peak - fixed, 0)


def main():
    depths = [4, 12, 24, 48]
    table = {}
    for variant in ("plain", "remat", "reversible"):
        row = {}
        for d in depths:
            peak, act = temp_bytes(variant, d)
            row[d] = act
            print(json.dumps({"variant": variant, "depth": d,
                              "peak_mb": round(peak / 2**20, 1),
                              "activations_mb": round(act / 2**20, 1)}), flush=True)
        table[variant] = row
    # growth factor from depth 4 -> 48 (12x depth)
    for variant, row in table.items():
        growth = row[depths[-1]] / max(row[depths[0]], 1)
        print(json.dumps({"variant": variant, "activation_growth_4_to_48": round(growth, 2)}))


if __name__ == "__main__":
    main()
