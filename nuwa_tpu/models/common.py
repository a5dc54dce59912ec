"""Shared model-layer machinery: text encoding, AR sampling loop.

The autoregressive ``generate`` here is the TPU-native replacement for the
reference's host-side token loop (nuwa_pytorch.py:1870-1908): one jitted
``lax.scan`` over token positions with static shapes. Classifier-free
guidance runs cond+uncond as a single 2×batch forward (the reference's
second pass feeds transformer *outputs* back in — a bug noted in SURVEY §7 —
here the uncond pass correctly reuses the input embeddings).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.quantize import dequant
from ..ops.sampling import gumbel_sample, top_k_filter


class _ModelJitCache:
    """Memoized ``jax.jit`` per (model, tag, statics): models are frozen
    dataclasses (hashable), so repeated ``generate``/``generate_long`` calls
    dispatch the cached executable instead of re-tracing the whole sampling
    graph per call — the reference re-runs its Python decode loop every call
    (nuwa_pytorch.py:1870-1908); here tracing happens once per config.

    The builder closure is only *invoked* on a cache miss, so callers may
    pass a freshly created lambda every time."""

    def __init__(self, maxsize=128):
        self._cache = {}
        self._maxsize = maxsize

    def __call__(self, model, tag, build):
        # dict preserves insertion order; moving hits to the end makes the
        # oldest entry the *least recently used* one, so a hot rollout is
        # never the one evicted (re-tracing costs multi-minute compiles
        # through the relay)
        key = (model, tag)
        fn = self._cache.pop(key, None)
        if fn is None and len(self._cache) >= self._maxsize:
            self._cache.pop(next(iter(self._cache)))
        if fn is None:
            fn = jax.jit(build())
        self._cache[key] = fn
        return fn


model_jit = _ModelJitCache()


@functools.lru_cache(maxsize=64)
def long_frame_decoder(model, win, W, b, use_cfg, filter_thres, temperature,
                       cond_scale):
    """Jitted sliding-window frame decoder for ``generate_long`` (NUWA and
    NUWASketch share the single-tower shape), cached per (model, shapes) so
    repeated calls skip retracing. All traced values enter as arguments
    (params / pos-emb / context); static config rides the cache key. The
    model is a frozen dataclass, hence hashable."""
    from ..decode import TransformerDecoder

    dec = TransformerDecoder(model.video_transformer, total_in=win)
    cache_dtype = model._dtype if model._dtype is not None else jnp.float32
    eb = 2 * b if use_cfg else b
    tpf = model.tokens_per_frame

    @jax.jit
    def decode_frame(ptr, embed_table, pos_emb, bos_vec, to_logits, ctx,
                     cmask, window, key):
        """window: (b, W) prior tokens; returns the next frame (b, tpf)."""
        caches = dec.init_cache(ptr, eb, ctx, cmask, dtype=cache_dtype)
        # prefill positions 0..W-1: inputs [bos, tok_0..tok_{W-2}]
        emb = jnp.take(embed_table, window[:, : W - 1], axis=0)
        emb = emb + pos_emb[: W - 1][None]
        bos = jnp.broadcast_to(bos_vec, (b, 1, model.dim))
        x = jnp.concatenate([bos, emb], axis=1)
        if use_cfg:
            x = jnp.concatenate([x, x], axis=0)
        caches = dec.prefill(ptr, caches, x.astype(cache_dtype))
        return cached_ar_rollout(
            dec=dec, p_transformer=ptr, caches=caches,
            embed_table=embed_table, pos_emb=pos_emb,
            bos_vec=bos_vec, to_logits=to_logits,
            batch=b, total=tpf, key=key, filter_thres=filter_thres,
            temperature=temperature, cond_scale=cond_scale, dim=model.dim,
            dtype=model._dtype, start_pos=W, init_prev=window[:, -1],
        )

    return decode_frame


def cached_ar_rollout(
    *,
    dec,
    p_transformer,
    caches,
    embed_table,
    pos_emb,
    bos_vec,
    to_logits,
    batch,
    total,
    key,
    filter_thres,
    temperature,
    cond_scale,
    dim,
    dtype=None,
    start_pos=0,
    init_prev=None,
):
    """Shared cached AR rollout: one lax.scan over positions with per-layer
    caches (see nuwa_tpu.decode). CFG runs cond+uncond as a 2×batch stream
    whose caches were built with [mask; zeros].

    ``start_pos``/``init_prev`` resume mid-sequence after a ``dec.prefill``
    (sliding-window long rollouts): scanning positions
    [start_pos, start_pos + total) with ``init_prev`` as the first input
    token."""
    use_cfg = cond_scale != 1

    def step(carry, i):
        caches, prev_tok, key = carry
        key, sub = jax.random.split(key)
        tok_emb = jnp.take(embed_table, prev_tok, axis=0) + jax.lax.dynamic_index_in_dim(
            pos_emb, jnp.maximum(i - 1, 0), 0, keepdims=False
        )
        bos = jnp.broadcast_to(bos_vec, (batch, dim))
        x_i = jnp.where(i == 0, bos, tok_emb)
        if dtype is not None:
            x_i = x_i.astype(dtype)
        if use_cfg:
            x_i = jnp.concatenate([x_i, x_i], axis=0)
        y, caches = dec.step(p_transformer, caches, x_i, i)
        logits = jnp.dot(y, dequant(to_logits, y.dtype))
        if use_cfg:
            cond, uncond = logits[:batch], logits[batch:]
            logits = uncond + (cond - uncond) * cond_scale
        filtered = top_k_filter(logits, thres=filter_thres)
        sample = gumbel_sample(sub, filtered, temperature=temperature).astype(jnp.int32)
        return (caches, sample, key), sample

    init_tok = (
        init_prev if init_prev is not None else jnp.zeros((batch,), jnp.int32)
    )
    (_, _, _), samples = jax.lax.scan(
        step, (caches, init_tok, key), start_pos + jnp.arange(total)
    )
    return samples.T  # (b, total)


def ar_decode_loop(
    *,
    key,
    batch,
    total_tokens,
    step_logits_fn,
    filter_thres=0.9,
    temperature=1.0,
    cond_scale=2.0,
):
    """Generic masked-full-forward AR loop.

    ``step_logits_fn(indices, i) -> (logits_cond (b, V), logits_uncond)`` must
    compute position-i logits from the (b, total_tokens) int32 buffer; thanks
    to causal attention the garbage at positions >= i cannot influence them.
    """
    indices0 = jnp.zeros((batch, total_tokens), dtype=jnp.int32)

    def step(carry, i):
        indices, key = carry
        key, sub = jax.random.split(key)
        logits, uncond_logits = step_logits_fn(indices, i)
        if cond_scale != 1 and uncond_logits is not None:
            logits = uncond_logits + (logits - uncond_logits) * cond_scale
        filtered = top_k_filter(logits, thres=filter_thres)
        sample = gumbel_sample(sub, filtered, temperature=temperature)
        indices = indices.at[:, i].set(sample.astype(jnp.int32))
        return (indices, key), None

    (indices, _), _ = jax.lax.scan(
        step, (indices0, key), jnp.arange(total_tokens)
    )
    return indices
