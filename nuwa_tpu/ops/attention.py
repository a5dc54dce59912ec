"""Dense multi-head attention with null key/value, talking heads, fp32
softmax, key masking, causal masking and rotary embeddings.

Parity: reference ``Attention``
(/root/reference/nuwa_pytorch/nuwa_pytorch.py:290-379). This is the oracle
that every sparse NDA kernel is tested against, and the fallback used by the
tiny configs. TPU notes: all contractions are batched matmuls that tile onto
the MXU; the softmax runs in fp32 regardless of compute dtype.
"""
from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp

from ..core.layers import Dense, Module, dropout, kaiming_uniform, normal_init
from .embeddings import apply_rotary_pos_emb
from .utils import masked_fill, max_neg_value, stable_softmax


def split_heads(t, heads):
    b, n, _ = t.shape
    return t.reshape(b, n, heads, -1).transpose(0, 2, 1, 3)


def merge_heads(t):
    b, h, n, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def talking_heads(attn, w):
    """1x1 conv across the head dimension post-softmax (attn: b h i j)."""
    return jnp.einsum("bhij,gh->bgij", attn, w.astype(attn.dtype))


@dataclass(frozen=True)
class Attention(Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    causal: bool = False
    dropout: float = 0.0
    rotary_values: bool = True  # the reference rotates v as well (quirk, :335)

    @property
    def inner_dim(self):
        return self.heads * self.dim_head

    def init(self, key):
        ks = jax.random.split(key, 6)
        return {
            "to_q": Dense(self.dim, self.inner_dim).init(ks[0]),
            "to_kv": Dense(self.dim, self.inner_dim * 2).init(ks[1]),
            "to_out": Dense(self.inner_dim, self.dim).init(ks[2]),
            "null_k": normal_init(ks[3], (self.heads, 1, self.dim_head)),
            "null_v": normal_init(ks[4], (self.heads, 1, self.dim_head)),
            "talking_heads": kaiming_uniform(
                ks[5], (self.heads, self.heads), self.heads
            ),
        }

    def _qkv(self, p, x, context=None, rotary_pos_emb=None):
        kv_input = context if context is not None else x
        q = Dense(self.dim, self.inner_dim)(p["to_q"], x)
        kv = Dense(self.dim, self.inner_dim * 2)(p["to_kv"], kv_input)
        k, v = jnp.split(kv, 2, axis=-1)
        q, k, v = (split_heads(t, self.heads) for t in (q, k, v))

        if context is None and rotary_pos_emb is not None:
            q = apply_rotary_pos_emb(rotary_pos_emb, q)
            k = apply_rotary_pos_emb(rotary_pos_emb, k)
            if self.rotary_values:
                v = apply_rotary_pos_emb(rotary_pos_emb, v)
        return q, k, v

    def __call__(
        self,
        p,
        x,
        *,
        mask=None,
        context=None,
        context_mask=None,
        rotary_pos_emb=None,
        key=None,
        **_,
    ):
        b = x.shape[0]
        has_context = context is not None
        q, k, v = self._qkv(p, x, context, rotary_pos_emb)

        # null key/value — guarantees something to attend to under condition
        # dropout (classifier-free guidance) even with an all-False mask.
        null_k = jnp.broadcast_to(
            p["null_k"].astype(k.dtype), (b, self.heads, 1, self.dim_head)
        )
        null_v = jnp.broadcast_to(
            p["null_v"].astype(v.dtype), (b, self.heads, 1, self.dim_head)
        )
        k = jnp.concatenate([null_k, k], axis=2)
        v = jnp.concatenate([null_v, v], axis=2)

        scale = self.dim_head**-0.5
        sim = jnp.einsum("bhid,bhjd->bhij", q * scale, k)

        neg = max_neg_value(sim.dtype)
        key_mask = context_mask if has_context else mask
        if key_mask is not None:
            key_mask = jnp.pad(key_mask, ((0, 0), (1, 0)), constant_values=True)
            sim = masked_fill(sim, ~key_mask[:, None, None, :], neg)

        if self.causal:
            i, j = sim.shape[-2:]
            causal_mask = jnp.triu(jnp.ones((i, j), dtype=bool), k=j - i + 1)
            sim = masked_fill(sim, causal_mask, neg)

        attn = stable_softmax(sim, axis=-1)
        attn = talking_heads(attn, p["talking_heads"])
        attn = dropout(attn, self.dropout, key)

        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        return Dense(self.inner_dim, self.dim)(p["to_out"], merge_heads(out))
