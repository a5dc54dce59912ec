"""PRNG-keyed sampling numerics.

Parity targets: ``gumbel_sample`` / ``top_k`` / ``prob_mask_like`` in the
reference (/root/reference/nuwa_pytorch/nuwa_pytorch.py:55-72,1713-1719), but
keyed explicitly — no global RNG state — so sampling loops can live inside
``jax.lax.scan`` and stay deterministic under recomputation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import log


def gumbel_noise(key, shape):
    u = jax.random.uniform(key, shape, jnp.float32, 0.0, 1.0)
    return -log(-log(u))


def gumbel_sample(key, logits, temperature=1.0, axis=-1):
    """Gumbel-max sampling over logits."""
    temperature = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-10)
    noised = logits.astype(jnp.float32) / temperature + gumbel_noise(key, logits.shape)
    return jnp.argmax(noised, axis=axis)


def top_k_filter(logits, thres=0.5):
    """Keep the top ``ceil((1-thres) * vocab)`` logits, set the rest to -inf.

    Matches reference ``top_k`` (nuwa_pytorch.py:1713-1719) with a static k so
    it jits: k = max(int((1 - thres) * num_logits), 1).
    """
    num_logits = logits.shape[-1]
    k = max(int((1.0 - thres) * num_logits), 1)
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def prob_mask_like(key, shape, prob):
    """Bernoulli(prob) boolean mask — used for per-batch condition dropout
    (classifier-free guidance training, reference :71-72)."""
    if prob == 0.0:
        return jnp.zeros(shape, dtype=bool)
    if prob == 1.0:
        return jnp.ones(shape, dtype=bool)
    return jax.random.uniform(key, shape) < prob
