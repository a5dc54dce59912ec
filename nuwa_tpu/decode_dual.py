"""Cached incremental decoding for the dual-modality (video+audio) decoders.

Each generated token belongs to one modality; its position flows through that
modality's half of every block. Couplings between the towers happen only
through *stream-value buffers*:

  * ``self``/``cross`` blocks: independent per-stream steps (Sparse3DNA /
    SparseCausal2DNA neighborhoods, dense cross-attn with precomputed text
    k/v) — reusing the step machinery from nuwa_tpu.decode;
  * ``xmod`` blocks (chunk-aligned CrossModalityCrossAttention): video chunk
    n attends the *buffered* opposite-stream values of chunk n-1 (the RETRO
    alignment, reference :961-998). The buffer stores, per xmod block, the
    stream value the training-time math exposes to the other side — the
    block *input* for the non-reversible decoder (reference :1463-1478) and
    the *updated* video half for the reversible one (:240-243).

Token order (one video frame's tokens, then one audio frame's, reference
:2198-2208) guarantees every buffered chunk is complete before it is read.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .core.layers import Dense, LayerNorm, StableLayerNorm
from .decode import (
    _CrossAttnStep,
    _FFStep,
    _SandwichStep,
    _ShiftVideoStep,
    _Sparse3DNAStep,
    _th_mix,
)
from .dual_decoder import DualModalityDecoder, SandwichX
from .nda import SparseCausal2DNA, build_nda_indices
from .ops.crossmodality import CrossModalityCrossAttention
from .ops.utils import masked_fill, max_neg_value, stable_softmax
from .transformer import Sandwich, ShiftAudio, ShiftVideo


class _SparseCausal2DNAStep:
    """Incremental step for audio 2DNA: attend all tokens of the K dilated
    past timesteps + bos."""

    def __init__(self, mod: SparseCausal2DNA, total_audio: int):
        self.mod = mod
        self.total = total_audio
        H = mod.height
        timesteps = -(-total_audio // H)
        idx, valid = build_nda_indices(
            (timesteps, H), (mod.kernel_size, H), (mod.dilation, 1),
            ("causal", "full"),
        )
        idx = idx[:total_audio]
        valid = valid[:total_audio] & (idx < total_audio)
        self.idx = jnp.asarray(idx)
        self.valid = jnp.asarray(valid)

    def init_cache(self, b, dtype):
        h, dh = self.mod.heads, self.mod.dim_head
        return {
            "k": jnp.zeros((b, h, self.total, dh), dtype),
            "v": jnp.zeros((b, h, self.total, dh), dtype),
            "k_bos": jnp.zeros((b, h, dh), dtype),
            "v_bos": jnp.zeros((b, h, dh), dtype),
        }

    def __call__(self, p, cache, x_i, pos, **_):
        mod = self.mod
        h, dh = mod.heads, mod.dim_head
        b = x_i.shape[0]
        qkv = Dense(mod.dim, mod.inner_dim * 3)(p["to_qkv"], x_i)
        q, k_i, v_i = (t.reshape(b, h, dh) for t in jnp.split(qkv, 3, axis=-1))

        is_bos = pos == 0
        apos = jnp.maximum(pos - 1, 0)

        cache = dict(cache)
        cache["k_bos"] = jnp.where(is_bos, k_i, cache["k_bos"])
        cache["v_bos"] = jnp.where(is_bos, v_i, cache["v_bos"])
        old_k = jax.lax.dynamic_index_in_dim(cache["k"], apos, 2, keepdims=False)
        old_v = jax.lax.dynamic_index_in_dim(cache["v"], apos, 2, keepdims=False)
        cache["k"] = jax.lax.dynamic_update_index_in_dim(
            cache["k"], jnp.where(is_bos, old_k, k_i)[:, :, None], apos, 2
        )
        cache["v"] = jax.lax.dynamic_update_index_in_dim(
            cache["v"], jnp.where(is_bos, old_v, v_i)[:, :, None], apos, 2
        )

        nb_idx = jnp.take(self.idx, apos, axis=0)
        nb_valid = jnp.take(self.valid, apos, axis=0)
        # same-timestep tokens ahead of the write position are not yet
        # generated: restrict to indices <= apos (matches ragged-tail
        # masking in the full path)
        nb_valid = nb_valid & (nb_idx <= apos)
        k_nb = jnp.take(cache["k"], nb_idx, axis=2)
        v_nb = jnp.take(cache["v"], nb_idx, axis=2)

        sim = jnp.einsum("bhd,bhjd->bhj", q * dh**-0.5, k_nb)
        if mod.rel_pos_bias:
            sim = sim + mod.bias_module(p["rel_pos_bias"]).T[None].astype(sim.dtype)
        sim = masked_fill(sim, ~nb_valid[None, None, :], max_neg_value(sim.dtype))
        sim_bos = jnp.einsum("bhd,bhd->bh", q * dh**-0.5, cache["k_bos"])[..., None]
        sim = jnp.concatenate([sim_bos, sim], axis=-1)

        attn = stable_softmax(sim, axis=-1)
        attn = _th_mix(attn, p["talking_heads"])
        vals = jnp.concatenate([cache["v_bos"][:, :, None], v_nb], axis=2)
        out = jnp.einsum("bhj,bhjd->bhd", attn.astype(vals.dtype), vals)
        out = jnp.where(is_bos, v_i, out)
        return Dense(mod.inner_dim, mod.dim)(p["to_out"], out.reshape(b, h * dh)), cache

    def prefill(self, p, cache, x):
        """x: (b, n, dim) audio-tower inputs, position 0 = bos. Fills bos +
        rows 0..n-2 of the k/v buffers; outputs via the module's full
        forward."""
        mod = self.mod
        b, n, _ = x.shape
        h, dh = mod.heads, mod.dim_head
        qkv = Dense(mod.dim, mod.inner_dim * 3)(p["to_qkv"], x)
        _, k, v = jnp.split(qkv, 3, axis=-1)
        k = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        cache = dict(cache)
        cache["k_bos"] = k[:, :, 0].astype(cache["k_bos"].dtype)
        cache["v_bos"] = v[:, :, 0].astype(cache["v_bos"].dtype)
        if n > 1:
            cache["k"] = cache["k"].at[:, :, : n - 1].set(
                k[:, :, 1:].astype(cache["k"].dtype)
            )
            cache["v"] = cache["v"].at[:, :, : n - 1].set(
                v[:, :, 1:].astype(cache["v"].dtype)
            )
        return mod(p, x), cache


class _ShiftAudioStep:
    """Incremental audio token-shift: first half channels read from pos-1.

    Matches ``shift_audio_tokens`` (one-token shift along the sequence,
    applied to the raw sequence including position 0)."""

    def __init__(self, wrapper: ShiftAudio, inner_step, total_in: int, dim: int):
        self.w = wrapper
        self.inner = inner_step
        self.total = total_in
        self.dim = dim

    def init_buffer(self, b, dtype):
        return jnp.zeros((b, self.total, self.dim), dtype)

    def __call__(self, p, cache, x_i, pos, **kw):
        cache = dict(cache)
        buf = jax.lax.dynamic_update_index_in_dim(cache["shift_buf"], x_i[:, None], pos, 1)
        cache["shift_buf"] = buf
        half = -(-self.dim // 2)
        prev = jax.lax.dynamic_index_in_dim(
            buf, jnp.maximum(pos - 1, 0), 1, keepdims=False
        )
        shifted_head = jnp.where(pos > 0, prev[:, :half], 0.0)
        x_i = jnp.concatenate([shifted_head, x_i[:, half:]], axis=-1)
        out, cache2 = self.inner(p, cache, x_i, pos, **kw)
        cache2 = dict(cache2)
        cache2["shift_buf"] = cache["shift_buf"]
        return out, cache2

    def prefill(self, p, cache, x):
        from .ops.shift import shift_audio_tokens

        cache = dict(cache)
        n = x.shape[1]
        cache["shift_buf"] = cache["shift_buf"].at[:, :n].set(
            x.astype(cache["shift_buf"].dtype)
        )
        xs = shift_audio_tokens(x, self.w.audio_tokens_per_timestep)
        out, cache2 = self.inner.prefill(p, cache, xs)
        cache2 = dict(cache2)
        cache2["shift_buf"] = cache["shift_buf"]
        return out, cache2


class _XmodStep:
    """Chunk-aligned cross-modality attention for a single query token.

    ``chunk_size`` tokens per query chunk, ``ccs`` per context chunk. The
    context values come from the opposite stream's buffer for this block.
    Query position 0 (start token) gets zero output (it is excised by the
    left-pad in the full path)."""

    def __init__(self, mod: CrossModalityCrossAttention, num_chunks: int):
        self.mod = mod
        self.num_chunks = num_chunks

    def __call__(self, p, x_i, pos, ctx_buf):
        """ctx_buf: (b, 1 + total_ctx, dim) opposite-stream values (with its
        start token at index 0). Returns (b, dim)."""
        mod = self.mod
        h, dh = mod.heads, mod.dim_head
        ccs = mod.context_chunk_size
        b = x_i.shape[0]

        # query chunk index n = (pos - 1) // chunk_size; context chunk n of
        # the left-padded context covers with-bos positions
        # [(n-1)*ccs + 1, n*ccs] — for n == 0 only the context bos.
        n = jnp.maximum(pos - 1, 0) // mod.chunk_size
        base = (n - 1) * ccs + 1  # may be negative for n == 0
        offs = jnp.arange(ccs)
        ctx_pos = base + offs
        valid = ctx_pos >= 0
        # context chunks beyond what exists never occur given the generation
        # order; clamp reads for safety.
        ctx_pos = jnp.clip(ctx_pos, 0, ctx_buf.shape[1] - 1)
        ctx = jnp.take(ctx_buf, ctx_pos, axis=1)  # (b, ccs, dim)

        q = Dense(mod.dim, mod.inner_dim)(p["to_q"], x_i).reshape(b, h, dh)
        kv = Dense(mod.ctx_dim, mod.inner_dim * 2)(p["to_kv"], ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(b, ccs, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, ccs, h, dh).transpose(0, 2, 1, 3)

        null_k = jnp.broadcast_to(p["null_k"].astype(q.dtype)[None], (b, h, dh))
        null_v = jnp.broadcast_to(p["null_v"].astype(q.dtype)[None], (b, h, dh))
        keys = jnp.concatenate([null_k[:, :, None], k], axis=2)
        vals = jnp.concatenate([null_v[:, :, None], v], axis=2)

        sim = jnp.einsum("bhd,bhjd->bhj", q * dh**-0.5, keys)
        kmask = jnp.concatenate([jnp.ones((1,), bool), valid])
        sim = masked_fill(sim, ~kmask[None, None, :], max_neg_value(sim.dtype))
        attn = stable_softmax(sim, axis=-1)
        attn = _th_mix(attn, p["talking_heads"])
        attn = attn + p["talking_heads_b"].astype(attn.dtype)[None, :, None]
        out = jnp.einsum("bhj,bhjd->bhd", attn.astype(vals.dtype), vals)
        out = Dense(mod.inner_dim, mod.dim)(p["to_out"], out.reshape(b, h * dh))
        return jnp.where(pos == 0, 0.0, out)


class _SandwichXStep:
    def __init__(self, sandwich: SandwichX, inner: _XmodStep):
        self.s = sandwich
        self.inner = inner

    def __call__(self, p, x_i, pos, ctx_buf):
        ln = LayerNorm(self.s.dim)
        h = ln(p["pre"], x_i)
        h = self.inner(p["inner"], h, pos, ctx_buf)
        return ln(p["post"], h)


class DualDecoderCache:
    """Cached stepper for (Reversible)DualModalityDecoder."""

    def __init__(self, decoder: DualModalityDecoder, total_v_in: int, total_a_in: int):
        self.d = decoder
        self.total_v_in = total_v_in
        self.total_a_in = total_a_in
        self.reversible = decoder.__class__.__name__.startswith("Reversible")
        self.blocks = decoder.blocks()
        self.steps = []
        for btype, mods, _ in self.blocks:
            f, g, j, k = mods  # video attn, video ff, audio attn, audio ff
            if btype == "xmod":
                # mods = (v2a SandwichX, audio_ff, a2v SandwichX, video_ff)
                v2a = _SandwichXStep(mods[0], _XmodStep(mods[0].inner, 0))
                a2v = _SandwichXStep(mods[2], _XmodStep(mods[2].inner, 0))
                aff = _SandwichStep(mods[1], _FFStep(mods[1].inner))
                vff = _SandwichStep(mods[3], _FFStep(mods[3].inner))
                self.steps.append((btype, (v2a, aff, a2v, vff)))
            else:
                self.steps.append(
                    (
                        btype,
                        (
                            self._build(f, "video"),
                            self._build(g, "video"),
                            self._build(j, "audio"),
                            self._build(k, "audio"),
                        ),
                    )
                )

    def _build(self, sandwich: Sandwich, stream: str):
        from .nda import Sparse3DNA
        from .ops.attention import Attention
        from .ops.feedforward import FeedForward

        inner = sandwich.inner
        wrapper = None
        if isinstance(inner, (ShiftVideo, ShiftAudio)):
            wrapper = inner
            inner = inner.inner
        total = self.total_v_in if stream == "video" else self.total_a_in
        if isinstance(inner, Sparse3DNA):
            step = _Sparse3DNAStep(inner, total - 1)
        elif isinstance(inner, SparseCausal2DNA):
            step = _SparseCausal2DNAStep(inner, total - 1)
        elif isinstance(inner, Attention):
            step = _CrossAttnStep(inner)
        elif isinstance(inner, FeedForward):
            step = _FFStep(inner)
        else:  # pragma: no cover
            raise TypeError(type(inner))
        if isinstance(wrapper, ShiftVideo):
            step = _ShiftVideoStep(wrapper, step, total, self.d.dim)
        elif isinstance(wrapper, ShiftAudio):
            step = _ShiftAudioStep(wrapper, step, total, self.d.dim)
        return _SandwichStep(sandwich, step)

    # ------------------------------------------------------------------

    def init_cache(self, p, b, context, context_mask, dtype=jnp.float32):
        caches = []
        n_streams = 2 if self.reversible else 1
        for (btype, steps), lp in zip(self.steps, p["layers"]):
            c = {}
            if btype == "xmod":
                c["vbuf"] = jnp.zeros((b, self.total_v_in, self.d.dim), dtype)
                c["abuf"] = jnp.zeros((b, self.total_a_in, self.d.dim), dtype)
            else:
                for name, step, pkey in (
                    ("v_attn", steps[0], "f"),
                    ("a_attn", steps[2], "j"),
                ):
                    sc = {}
                    inner = step.inner
                    if isinstance(inner, (_ShiftVideoStep, _ShiftAudioStep)):
                        sc["shift_buf"] = inner.init_buffer(b, dtype)
                        inner = inner.inner
                    if isinstance(inner, (_Sparse3DNAStep, _SparseCausal2DNAStep)):
                        sc.update(inner.init_cache(b, dtype))
                    elif isinstance(inner, _CrossAttnStep):
                        sc.update(inner.init_cache(lp[pkey]["inner"], context, context_mask))
                    c[name] = sc
                for name, step, pkey in (
                    ("v_ff", steps[1], "g"),
                    ("a_ff", steps[3], "k"),
                ):
                    sc = {}
                    inner = step.inner
                    if isinstance(inner, (_ShiftVideoStep, _ShiftAudioStep)):
                        sc["shift_buf"] = inner.init_buffer(b, dtype)
                    c[name] = sc
            caches.append(c)
        return caches

    # ------------------------------------------------------------------

    def prefill(self, p, caches, x_v, x_a):
        """Joint vectorized prefill of both towers over window inputs
        ``x_v`` (b, nv, dim) / ``x_a`` (b, na, dim), positions 0..n-1 each
        (position 0 = the stream bos). Leaves every cache exactly as the
        equivalent interleaved incremental steps would, and returns
        ``(y_v, y_a, caches)`` with the post-norm outputs (the last audio
        row seeds the rollout's ``pending`` logits).

        xmod blocks run the full CrossModalityCrossAttention module —
        chunk-aligned reads only touch completed opposite-stream chunks, so
        the ragged audio-ahead-of-video window (na = nv·atpf/vtpf + 1) is
        safe (the module zeroes ragged trailing chunks)."""
        nv, na = x_v.shape[1], x_a.shape[1]
        new_caches = list(caches)
        if self.reversible:
            v1 = v2 = x_v
            a1 = a2 = x_a
        else:
            v, a = x_v, x_a

        for i, ((btype, steps), lp) in enumerate(zip(self.steps, p["layers"])):
            c = dict(caches[i])
            if btype == "xmod":
                # full-module math; mods = (v2a, audio_ff, a2v, video_ff)
                _, mods, _ = self.blocks[i]
                v2a, aff_m, a2v, vff_m = mods
                if self.reversible:
                    # x1 += f(x2, m2); x2 += k(x1); vbuf <- updated x2;
                    # abuf <- pre-update m2; m1 += j(m2, x2); m2 += g(m1)
                    v1 = v1 + v2a(lp["f"], v2, a2)
                    v2 = v2 + vff_m(lp["k"], v1)
                    c["abuf"] = c["abuf"].at[:, :na].set(
                        a2.astype(c["abuf"].dtype)
                    )
                    a1 = a1 + a2v(lp["j"], a2, v2)
                    a2 = a2 + aff_m(lp["g"], a1)
                    c["vbuf"] = c["vbuf"].at[:, :nv].set(
                        v2.astype(c["vbuf"].dtype)
                    )
                else:
                    # both sides read pre-update opposite streams
                    c["vbuf"] = c["vbuf"].at[:, :nv].set(v.astype(c["vbuf"].dtype))
                    c["abuf"] = c["abuf"].at[:, :na].set(a.astype(c["abuf"].dtype))
                    out_v = v2a(lp["f"], v, a)
                    out_a = a2v(lp["j"], a, v)
                    v = v + out_v
                    v = v + vff_m(lp["k"], v)
                    a = a + out_a
                    a = a + aff_m(lp["g"], a)
            else:
                v_attn, v_ff, a_attn, a_ff = steps
                if self.reversible:
                    out, c["v_attn"] = v_attn.prefill(lp["f"], c["v_attn"], v2)
                    v1 = v1 + out
                    out, c["v_ff"] = v_ff.prefill(lp["g"], c["v_ff"], v1)
                    v2 = v2 + out
                    out, c["a_attn"] = a_attn.prefill(lp["j"], c["a_attn"], a2)
                    a1 = a1 + out
                    out, c["a_ff"] = a_ff.prefill(lp["k"], c["a_ff"], a1)
                    a2 = a2 + out
                else:
                    out, c["v_attn"] = v_attn.prefill(lp["f"], c["v_attn"], v)
                    v = v + out
                    out, c["v_ff"] = v_ff.prefill(lp["g"], c["v_ff"], v)
                    v = v + out
                    out, c["a_attn"] = a_attn.prefill(lp["j"], c["a_attn"], a)
                    a = a + out
                    out, c["a_ff"] = a_ff.prefill(lp["k"], c["a_ff"], a)
                    a = a + out
            new_caches[i] = c

        if self.reversible:
            yv, ya = (v1 + v2) * 0.5, (a1 + a2) * 0.5
        else:
            yv, ya = v, a
        norm = StableLayerNorm(self.d.dim)
        return (
            norm(p["video_norm"], yv),
            norm(p["audio_norm"], ya),
            new_caches,
        )

    def step_video(self, p, caches, x_i, vpos):
        return self._step(p, caches, x_i, vpos, "video")

    def step_audio(self, p, caches, x_i, apos):
        return self._step(p, caches, x_i, apos, "audio")

    def _step(self, p, caches, x_i, pos, stream):
        new_caches = list(caches)
        video = stream == "video"
        if self.reversible:
            s1 = s2 = x_i
        else:
            s = x_i

        for i, ((btype, steps), lp) in enumerate(zip(self.steps, p["layers"])):
            c = dict(caches[i])
            if btype == "xmod":
                v2a, aff, a2v, vff = steps
                if video:
                    # buffer the value the opposite stream will read
                    if self.reversible:
                        # reversible: y1 = x1 + f(x2, m2); y2 = x2 + k(y1);
                        # a2v later reads the UPDATED y2 — buffer after update
                        out = v2a(lp["f"], s2, pos, c["abuf"])
                        s1 = s1 + out
                        out, _ = vff(lp["k"], {}, s1, pos)
                        s2 = s2 + out
                        c["vbuf"] = jax.lax.dynamic_update_index_in_dim(
                            c["vbuf"], s2[:, None], pos, 1
                        )
                    else:
                        # non-reversible: both sides read pre-update inputs
                        c["vbuf"] = jax.lax.dynamic_update_index_in_dim(
                            c["vbuf"], s[:, None], pos, 1
                        )
                        out = v2a(lp["f"], s, pos, c["abuf"])
                        s = s + out
                        out, _ = vff(lp["k"], {}, s, pos)
                        s = s + out
                else:
                    if self.reversible:
                        # n1 = m1 + j(m2, y2); n2 = m2 + g(n1)
                        c["abuf"] = jax.lax.dynamic_update_index_in_dim(
                            c["abuf"], s2[:, None], pos, 1
                        )
                        out = a2v(lp["j"], s2, pos, c["vbuf"])
                        s1 = s1 + out
                        out, _ = aff(lp["g"], {}, s1, pos)
                        s2 = s2 + out
                    else:
                        c["abuf"] = jax.lax.dynamic_update_index_in_dim(
                            c["abuf"], s[:, None], pos, 1
                        )
                        out = a2v(lp["j"], s, pos, c["vbuf"])
                        s = s + out
                        out, _ = aff(lp["g"], {}, s, pos)
                        s = s + out
            else:
                if video:
                    attn_step, ff_step = steps[0], steps[1]
                    attn_p, ff_p = lp["f"], lp["g"]
                    attn_c, ff_c = "v_attn", "v_ff"
                else:
                    attn_step, ff_step = steps[2], steps[3]
                    attn_p, ff_p = lp["j"], lp["k"]
                    attn_c, ff_c = "a_attn", "a_ff"
                if self.reversible:
                    out, c[attn_c] = attn_step(attn_p, c[attn_c], s2, pos)
                    s1 = s1 + out
                    out, c[ff_c] = ff_step(ff_p, c[ff_c], s1, pos)
                    s2 = s2 + out
                else:
                    out, c[attn_c] = attn_step(attn_p, c[attn_c], s, pos)
                    s = s + out
                    out, c[ff_c] = ff_step(ff_p, c[ff_c], s, pos)
                    s = s + out
            new_caches[i] = c

        y = (s1 + s2) * 0.5 if self.reversible else s
        norm = StableLayerNorm(self.d.dim)
        norm_p = p["video_norm"] if video else p["audio_norm"]
        return norm(norm_p, y[:, None, :])[:, 0], new_caches
