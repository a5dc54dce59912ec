"""Chunk-aligned cross-modality (video <-> audio) cross attention.

Parity: reference ``CrossModalityCrossAttention``
(/root/reference/nuwa_pytorch/nuwa_pytorch.py:908-1067), the RETRO-style
chunked cross attention: sequence chunk i (one video frame's tokens) attends
context chunk i (the *preceding* frame's audio tokens — the context is
left-padded by chunk_size-1 so causality across modalities holds).

Deviations (intentional, documented): the zero left/right padding positions
of the context are always masked out here (the reference leaves them as
zero-valued unmasked keys when no context mask is given); the null key/value
guarantees a valid attention target either way.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.layers import Dense, LayerNorm, Module, dropout, kaiming_uniform, normal_init
from .utils import masked_fill, max_neg_value, padding_to_multiple_of, stable_softmax


@dataclass(frozen=True)
class CrossModalityCrossAttention(Module):
    dim: int
    chunk_size: int
    context_chunk_size: int
    heads: int = 8
    dim_head: int = 64
    context_dim: Optional[int] = None
    has_start_token: bool = True
    context_has_start_token: bool = True
    norm: bool = False
    norm_context: bool = False
    dropout: float = 0.0

    @property
    def inner_dim(self):
        return self.heads * self.dim_head

    @property
    def ctx_dim(self):
        return self.context_dim if self.context_dim is not None else self.dim

    def init(self, key):
        ks = jax.random.split(key, 8)
        p = {
            "to_q": Dense(self.dim, self.inner_dim).init(ks[0]),
            "to_kv": Dense(self.ctx_dim, self.inner_dim * 2).init(ks[1]),
            "to_out": Dense(self.inner_dim, self.dim).init(ks[2]),
            "null_k": normal_init(ks[3], (self.heads, self.dim_head)),
            "null_v": normal_init(ks[4], (self.heads, self.dim_head)),
            # reference talking-heads here is Conv3d with default bias (:941)
            "talking_heads": kaiming_uniform(ks[5], (self.heads, self.heads), self.heads),
            "talking_heads_b": jnp.zeros((self.heads,)),
        }
        if self.norm:
            p["norm"] = LayerNorm(self.dim).init(ks[6])
        if self.norm_context:
            p["norm_context"] = LayerNorm(self.ctx_dim).init(ks[7])
        return p

    def __call__(self, p, seq, context, *, mask=None, context_mask=None, key=None, **_):
        b, seq_total, d = seq.shape
        cs, ccs = self.chunk_size, self.context_chunk_size

        seq_len = seq_total - (1 if self.has_start_token else 0)
        context_len = context.shape[1] - (1 if self.context_has_start_token else 0)

        # --- alignment padding (reference :961-998)
        seq_right_pad = padding_to_multiple_of(seq_len, cs)
        context_left_pad = ccs - 1 if ccs else 0
        context_right_pad = padding_to_multiple_of(context_len, ccs)

        x = seq[:, 1:] if self.has_start_token else seq
        if seq_right_pad:
            x = jnp.pad(x, ((0, 0), (0, seq_right_pad), (0, 0)))

        ctx = context
        ctx_valid = jnp.ones((b, ctx.shape[1]), dtype=bool)
        if context_mask is not None:
            ctx_valid = ctx_valid & context_mask
        ctx = jnp.pad(ctx, ((0, 0), (context_left_pad, context_right_pad), (0, 0)))
        ctx_valid = jnp.pad(
            ctx_valid, ((0, 0), (context_left_pad, context_right_pad)),
            constant_values=False,
        )

        # --- chunk
        n_chunks = x.shape[1] // cs
        n_ctx_chunks = ctx.shape[1] // ccs
        x = x.reshape(b, n_chunks, cs, d)
        ctx = ctx.reshape(b, n_ctx_chunks, ccs, -1)
        ctx_valid = ctx_valid.reshape(b, n_ctx_chunks, ccs)

        # align chunk counts; excess sequence chunks get zero output (:1005-1015)
        zero_tail_chunks = 0
        if n_chunks <= n_ctx_chunks:
            ctx = ctx[:, :n_chunks]
            ctx_valid = ctx_valid[:, :n_chunks]
        else:
            zero_tail_chunks = n_chunks - n_ctx_chunks
            x = x[:, :n_ctx_chunks]

        if x.shape[1] == 0:
            return jnp.zeros_like(seq)

        if self.norm:
            x = LayerNorm(self.dim)(p["norm"], x)
        if self.norm_context:
            ctx = LayerNorm(self.ctx_dim)(p["norm_context"], ctx)

        # --- attention per aligned chunk
        h, dh = self.heads, self.dim_head
        q = Dense(self.dim, self.inner_dim)(p["to_q"], x)
        kv = Dense(self.ctx_dim, self.inner_dim * 2)(p["to_kv"], ctx)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_chunk_heads(t):
            bb, nn, cc, _ = t.shape
            return t.reshape(bb, nn, cc, h, dh).transpose(0, 3, 1, 2, 4)

        q, k, v = (split_chunk_heads(t) for t in (q, k, v))
        q = q * (dh**-0.5)

        null_k = jnp.broadcast_to(
            p["null_k"].astype(k.dtype)[None, :, None, None, :],
            (b, h, k.shape[2], 1, dh),
        )
        null_v = jnp.broadcast_to(
            p["null_v"].astype(v.dtype)[None, :, None, None, :],
            (b, h, v.shape[2], 1, dh),
        )
        k = jnp.concatenate([null_k, k], axis=-2)
        v = jnp.concatenate([null_v, v], axis=-2)

        sim = jnp.einsum("bhncd,bhnjd->bhncj", q, k)
        cvalid = jnp.pad(ctx_valid, ((0, 0), (0, 0), (1, 0)), constant_values=True)
        sim = masked_fill(sim, ~cvalid[:, None, :, None, :], max_neg_value(jnp.float32))

        attn = stable_softmax(sim, axis=-1)
        attn = dropout(attn, self.dropout, key)
        attn = jnp.einsum("bhncj,gh->bgncj", attn, p["talking_heads"].astype(attn.dtype))
        attn = attn + p["talking_heads_b"].astype(attn.dtype)[None, :, None, None, None]

        out = jnp.einsum("bhncj,bhnjd->bhncd", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, -1, self.inner_dim)
        out = Dense(self.inner_dim, self.dim)(p["to_out"], out)

        # --- shift back to the original sequence layout (:1057-1059)
        left = 1 if self.has_start_token else 0
        out = jnp.pad(
            out, ((0, 0), (left, zero_tail_chunks * cs), (0, 0))
        )
        out = out[:, :seq_total]
        if out.shape[1] < seq_total:  # context ran out: pad zeros
            out = jnp.pad(out, ((0, 0), (0, seq_total - out.shape[1]), (0, 0)))

        if mask is not None:
            out = jnp.where(mask[:, :, None], out, 0.0)
        return out
