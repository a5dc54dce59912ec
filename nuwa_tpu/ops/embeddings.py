"""Positional embeddings: rotary + axial.

Parity: reference ``RotaryEmbedding``/``apply_rotary_pos_emb``
(/root/reference/nuwa_pytorch/nuwa_pytorch.py:132-153) and
``AxialPositionalEmbedding`` (:1675-1709). Static shapes — the freqs tables
are computed from python ints, so everything folds into the jitted graph.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.layers import Module, normal_init


def rotary_freqs(seq_len: int, dim: int):
    """Return (seq_len, dim) rotary angle table (freqs duplicated, GPT-NeoX
    style, matching the reference's ``cat((freqs, freqs))`` layout)."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.concatenate([freqs, freqs], axis=-1)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(freqs, t):
    """Apply rotary embedding to the leading ``freqs.shape[-1]`` channels of
    ``t`` (..., seq, dim_head)."""
    rot_dim = freqs.shape[-1]
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    freqs = freqs.astype(jnp.float32)
    t_rot = t_rot * jnp.cos(freqs) + _rotate_half(t_rot) * jnp.sin(freqs)
    return jnp.concatenate([t_rot.astype(t.dtype), t_pass], axis=-1)


@dataclass(frozen=True)
class AxialPositionalEmbedding(Module):
    """Learned per-axis positions summed via broadcasting then flattened.

    Also reused (as in the reference, :416,:646) as the relative-position bias
    table over 3DNA/2DNA attention kernels, with ``dim = heads``.
    """

    dim: int
    shape: Tuple[int, ...]

    @property
    def axial_shape(self):
        return tuple(s for s in self.shape if s > 1)

    def init(self, key):
        keys = jax.random.split(key, max(len(self.axial_shape), 1))
        return {
            "axials": [
                normal_init(k, (axial_len, self.dim))
                for k, axial_len in zip(keys, self.axial_shape)
            ]
        }

    def __call__(self, p, *, flatten=True):
        shape = self.axial_shape
        if not shape:
            return jnp.zeros((1, self.dim))
        pos = None
        for axial in p["axials"]:
            if pos is None:
                pos = axial
                continue
            pos = pos[..., None, :] + axial
        if flatten:
            pos = pos.reshape(-1, self.dim)
        return pos
