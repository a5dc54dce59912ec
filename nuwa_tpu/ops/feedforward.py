"""GEGLU feed-forward with optional sequence chunking.

Parity: reference ``GEGLU``/``FeedForward``
(/root/reference/nuwa_pytorch/nuwa_pytorch.py:255-286). The chunked path runs
under ``lax.scan`` so peak memory is genuinely bounded inside jit (the
Reformer-style knob the reference implements with a python loop).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.layers import Dense, Module, dropout


def geglu(x):
    x, gate = jnp.split(x, 2, axis=-1)
    return x * jax.nn.gelu(gate)


@dataclass(frozen=True)
class FeedForward(Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0
    chunk_size: Optional[int] = None

    @property
    def inner_dim(self):
        return (self.dim * self.mult * 2) // 3

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "w_in": Dense(self.dim, self.inner_dim * 2).init(k1),
            "w_out": Dense(self.inner_dim, self.dim).init(k2),
        }

    def _net(self, p, x, key=None):
        h = Dense(self.dim, self.inner_dim * 2)(p["w_in"], x)
        h = geglu(h)
        h = dropout(h, self.dropout, key)
        return Dense(self.inner_dim, self.dim)(p["w_out"], h)

    def __call__(self, p, x, *, key=None, **_):
        if self.chunk_size is None or x.shape[1] <= self.chunk_size:
            return self._net(p, x, key)

        b, n, d = x.shape
        c = self.chunk_size
        pad = (-n) % c
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
        num_chunks = xp.shape[1] // c
        xc = xp.reshape(b, num_chunks, c, d).swapaxes(0, 1)

        if key is not None:
            keys = jax.random.split(key, num_chunks)

            def body(_, inp):
                xi, ki = inp
                return None, self._net(p, xi, ki)

            _, out = jax.lax.scan(body, None, (xc, keys))
        else:

            def body(_, xi):
                return None, self._net(p, xi, None)

            _, out = jax.lax.scan(body, None, xc)

        out = out.swapaxes(0, 1).reshape(b, num_chunks * c, d)
        return out[:, :n]
