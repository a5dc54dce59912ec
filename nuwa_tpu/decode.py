"""Cached autoregressive decoding — the reference's missing KV cache
(an unchecked TODO, reference README.md:434; its ``generate`` re-runs the full
transformer per token, nuwa_pytorch.py:1870-1908).

Per decoder layer the cache holds exactly what incremental decoding needs:
  * Sparse3DNA: a (b, h, T, dh) k/v ring plus the bos k/v slot — each new
    token attends its static neighbor-index row (≤ Kn entries) + bos;
  * dense causal self-attention: a standard k/v cache with a position mask;
  * dense cross-attention: the context k/v are projected ONCE per rollout;
  * SparseCross2DNA: per-spatial-position context neighborhoods gathered from
    the precomputed context k/v (bos row = full-context attention);
  * token-shift wrappers: a (b, T, dim) buffer of layer inputs so the
    h/w-shifted channels can be read from positions j-W and j-1.

The whole rollout is one jitted ``lax.scan``; per-step cost is O(depth · Kn)
instead of O(depth · n · Kn).

Every step also supports ``prefill(p, cache, x)`` over a whole (b, n, dim)
block of decoder inputs (positions 0..n-1, position 0 = bos): one
MXU-friendly full forward that leaves the caches exactly as n incremental
steps would. ``generate_long`` uses it to re-prime a fresh window per frame
at O(window) instead of O(window · tokens_per_frame) (the reference's
sliding rollout re-runs the full decoder per *token*, nuwa_pytorch.py:
1874-1908).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .core.layers import Dense, LayerNorm
from .nda import Sparse3DNA, SparseCross2DNA, build_nda_indices
from .ops.attention import Attention
from .ops.feedforward import FeedForward
from .ops.utils import masked_fill, max_neg_value, stable_softmax
from .transformer import Sandwich, ShiftVideo, Transformer


def _th_mix(attn, w):
    """Talking heads for a single query row: attn (b, h, J) -> mixed."""
    return jnp.einsum("bhj,gh->bgj", attn, w.astype(attn.dtype))


# ---------------------------------------------------------------------------
# per-block caches + steps. x_i: (b, dim) single position; pos: traced int32
# decoder-input position (0 == bos).
# ---------------------------------------------------------------------------


class _DenseSelfStep:
    def __init__(self, mod: Attention, total_in: int):
        self.mod = mod
        self.total = total_in

    def init_cache(self, b, dtype):
        h, dh = self.mod.heads, self.mod.dim_head
        return {
            "k": jnp.zeros((b, h, self.total, dh), dtype),
            "v": jnp.zeros((b, h, self.total, dh), dtype),
        }

    def __call__(self, p, cache, x_i, pos, **_):
        mod = self.mod
        h, dh = mod.heads, mod.dim_head
        b = x_i.shape[0]
        q = Dense(mod.dim, mod.inner_dim)(p["to_q"], x_i).reshape(b, h, dh)
        kv = Dense(mod.dim, mod.inner_dim * 2)(p["to_kv"], x_i)
        k_i, v_i = jnp.split(kv, 2, axis=-1)
        k_i = k_i.reshape(b, h, dh)
        v_i = v_i.reshape(b, h, dh)

        cache = dict(cache)
        cache["k"] = jax.lax.dynamic_update_index_in_dim(cache["k"], k_i[:, :, None], pos, 2)
        cache["v"] = jax.lax.dynamic_update_index_in_dim(cache["v"], v_i[:, :, None], pos, 2)

        null_k = jnp.broadcast_to(p["null_k"].astype(k_i.dtype)[None, :, 0], (b, h, dh))
        null_v = jnp.broadcast_to(p["null_v"].astype(v_i.dtype)[None, :, 0], (b, h, dh))
        keys = jnp.concatenate([null_k[:, :, None], cache["k"]], axis=2)
        vals = jnp.concatenate([null_v[:, :, None], cache["v"]], axis=2)

        sim = jnp.einsum("bhd,bhjd->bhj", q * dh**-0.5, keys)
        jpos = jnp.arange(self.total + 1)
        sim = masked_fill(sim, (jpos[None, None, :] > pos + 1), max_neg_value(sim.dtype))
        attn = stable_softmax(sim, axis=-1)
        attn = _th_mix(attn, p["talking_heads"])
        out = jnp.einsum("bhj,bhjd->bhd", attn.astype(vals.dtype), vals)
        return Dense(mod.inner_dim, mod.dim)(p["to_out"], out.reshape(b, h * dh)), cache

    def prefill(self, p, cache, x):
        mod = self.mod
        b, n, _ = x.shape
        h, dh = mod.heads, mod.dim_head
        kv = Dense(mod.dim, mod.inner_dim * 2)(p["to_kv"], x)
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        cache = dict(cache)
        cache["k"] = cache["k"].at[:, :, :n].set(k.astype(cache["k"].dtype))
        cache["v"] = cache["v"].at[:, :, :n].set(v.astype(cache["v"].dtype))
        return mod(p, x), cache


class _CrossAttnStep:
    """Dense cross-attention with context k/v precomputed once."""

    def __init__(self, mod: Attention):
        self.mod = mod

    def init_cache(self, p, context, context_mask):
        mod = self.mod
        b, L, _ = context.shape
        h, dh = mod.heads, mod.dim_head
        kv = Dense(mod.dim, mod.inner_dim * 2)(p["to_kv"], context)
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(b, L, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, L, h, dh).transpose(0, 2, 1, 3)
        if context_mask is None:
            context_mask = jnp.ones((b, L), bool)
        return {"ck": k, "cv": v, "cmask": context_mask}

    def __call__(self, p, cache, x_i, pos, **_):
        mod = self.mod
        h, dh = mod.heads, mod.dim_head
        b = x_i.shape[0]
        q = Dense(mod.dim, mod.inner_dim)(p["to_q"], x_i).reshape(b, h, dh)
        null_k = jnp.broadcast_to(p["null_k"].astype(q.dtype)[None, :, 0], (b, h, dh))
        null_v = jnp.broadcast_to(p["null_v"].astype(q.dtype)[None, :, 0], (b, h, dh))
        keys = jnp.concatenate([null_k[:, :, None], cache["ck"]], axis=2)
        vals = jnp.concatenate([null_v[:, :, None], cache["cv"]], axis=2)
        sim = jnp.einsum("bhd,bhjd->bhj", q * dh**-0.5, keys)
        kmask = jnp.pad(cache["cmask"], ((0, 0), (1, 0)), constant_values=True)
        sim = masked_fill(sim, ~kmask[:, None, :], max_neg_value(sim.dtype))
        attn = stable_softmax(sim, axis=-1)
        attn = _th_mix(attn, p["talking_heads"])
        out = jnp.einsum("bhj,bhjd->bhd", attn.astype(vals.dtype), vals)
        return Dense(mod.inner_dim, mod.dim)(p["to_out"], out.reshape(b, h * dh)), cache

    def prefill(self, p, cache, x):
        """Vectorized cross-attn over the precomputed context k/v."""
        mod = self.mod
        b, n, _ = x.shape
        h, dh = mod.heads, mod.dim_head
        q = Dense(mod.dim, mod.inner_dim)(p["to_q"], x)
        q = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        null_k = jnp.broadcast_to(p["null_k"].astype(q.dtype)[None], (b, h, 1, dh))
        null_v = jnp.broadcast_to(p["null_v"].astype(q.dtype)[None], (b, h, 1, dh))
        keys = jnp.concatenate([null_k, cache["ck"]], axis=2)
        vals = jnp.concatenate([null_v, cache["cv"]], axis=2)
        sim = jnp.einsum("bhid,bhjd->bhij", q * dh**-0.5, keys)
        kmask = jnp.pad(cache["cmask"], ((0, 0), (1, 0)), constant_values=True)
        sim = masked_fill(sim, ~kmask[:, None, None, :], max_neg_value(sim.dtype))
        attn = stable_softmax(sim, axis=-1)
        attn = jnp.einsum("bhij,gh->bgij", attn, p["talking_heads"].astype(attn.dtype))
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(vals.dtype), vals)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
        return Dense(mod.inner_dim, mod.dim)(p["to_out"], out), cache


class _Sparse3DNAStep:
    def __init__(self, mod: Sparse3DNA, total_video: int):
        self.mod = mod
        self.total = total_video
        f, fh, fw = mod.video_shape
        frames = -(-total_video // (fh * fw))
        mode = "causal" if mod.causal else "centered"
        idx, valid = build_nda_indices(
            (frames, fh, fw), mod.kernel, mod.dilations, (mode,) * 3
        )
        idx = idx[:total_video]
        valid = valid[:total_video] & (idx < total_video)
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
        q = Dense(mod.dim, mod.inner_dim)(p["to_q"], x_i).reshape(b, h, dh)
        kv = Dense(mod.dim, mod.inner_dim * 2)(p["to_kv"], x_i)
        k_i, v_i = jnp.split(kv, 2, axis=-1)
        k_i = k_i.reshape(b, h, dh)
        v_i = v_i.reshape(b, h, dh)

        is_bos = pos == 0
        vpos = jnp.maximum(pos - 1, 0)

        cache = dict(cache)
        cache["k_bos"] = jnp.where(is_bos, k_i, cache["k_bos"])
        cache["v_bos"] = jnp.where(is_bos, v_i, cache["v_bos"])
        # write into the video buffer only for non-bos positions
        old_k = jax.lax.dynamic_index_in_dim(cache["k"], vpos, 2, keepdims=False)
        old_v = jax.lax.dynamic_index_in_dim(cache["v"], vpos, 2, keepdims=False)
        wk = jnp.where(is_bos, old_k, k_i)
        wv = jnp.where(is_bos, old_v, v_i)
        cache["k"] = jax.lax.dynamic_update_index_in_dim(cache["k"], wk[:, :, None], vpos, 2)
        cache["v"] = jax.lax.dynamic_update_index_in_dim(cache["v"], wv[:, :, None], vpos, 2)

        nb_idx = jnp.take(self.idx, vpos, axis=0)     # (Kn,)
        nb_valid = jnp.take(self.valid, vpos, axis=0)  # (Kn,)
        k_nb = jnp.take(cache["k"], nb_idx, axis=2)    # (b, h, Kn, dh)
        v_nb = jnp.take(cache["v"], nb_idx, axis=2)

        sim = jnp.einsum("bhd,bhjd->bhj", q * dh**-0.5, k_nb)
        if mod.rel_pos_bias:
            table = mod.bias_module(p["rel_pos_bias"]).T  # (h, Kn)
            sim = sim + table[None].astype(sim.dtype)
        sim = masked_fill(sim, ~nb_valid[None, None, :], max_neg_value(sim.dtype))
        sim_bos = jnp.einsum("bhd,bhd->bh", q * dh**-0.5, cache["k_bos"])[..., None]
        sim = jnp.concatenate([sim_bos, sim], axis=-1)

        attn = stable_softmax(sim, axis=-1)
        attn = _th_mix(attn, p["talking_heads"])
        vals = jnp.concatenate([cache["v_bos"][:, :, None], v_nb], axis=2)
        out = jnp.einsum("bhj,bhjd->bhd", attn.astype(vals.dtype), vals)
        # bos adopts its own value (reference :499,:608)
        out = jnp.where(is_bos, v_i, out)
        return (
            Dense(mod.inner_dim, mod.dim, use_bias=True)(p["to_out"], out.reshape(b, h * dh)),
            cache,
        )

    def prefill(self, p, cache, x):
        """x: (b, n, dim) decoder inputs, position 0 = bos. Fills the bos
        slot and video k/v rows 0..n-2; outputs come from the module's own
        full forward (one MXU pass instead of n incremental steps)."""
        mod = self.mod
        b, n, _ = x.shape
        h, dh = mod.heads, mod.dim_head
        kv = Dense(mod.dim, mod.inner_dim * 2)(p["to_kv"], x)
        k, v = jnp.split(kv, 2, axis=-1)
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


class _SparseCross2DNAStep:
    def __init__(self, mod: SparseCross2DNA, total_video: int):
        self.mod = mod
        self.total = total_video
        fmap = mod.image_size
        idx, valid = build_nda_indices(
            (fmap, fmap),
            (mod.kernel_size, mod.kernel_size),
            (mod.dilation, mod.dilation),
            ("centered", "centered"),
        )
        self.sp_idx = jnp.asarray(idx)      # (HW, Kn)
        self.sp_valid = jnp.asarray(valid)  # (HW, Kn)

    def init_cache(self, p, context, context_mask):
        mod = self.mod
        b, L, _ = context.shape
        h, dh = mod.heads, mod.dim_head
        kv = Dense(mod.dim, mod.inner_dim * 2)(p["to_kv"], context)
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(b, L, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, L, h, dh).transpose(0, 2, 1, 3)
        if context_mask is None:
            context_mask = jnp.ones((b, L), bool)
        # ctx_raw rides the cache so prefill can run the module's own full
        # forward (the neighborhoods are regathered from raw context there)
        return {"ck": k, "cv": v, "cmask": context_mask, "ctx_raw": context}

    def prefill(self, p, cache, x):
        return (
            self.mod(p, x, context=cache["ctx_raw"], context_mask=cache["cmask"]),
            cache,
        )

    def __call__(self, p, cache, x_i, pos, **_):
        mod = self.mod
        h, dh = mod.heads, mod.dim_head
        fmap = mod.image_size
        tpf = fmap * fmap
        b = x_i.shape[0]
        L = cache["ck"].shape[2]
        num_frames = L // tpf
        Kn = mod.kernel_numel

        q = Dense(mod.dim, mod.inner_dim)(p["to_q"], x_i).reshape(b, h, dh)
        q = q * dh**-0.5
        null_k = jnp.broadcast_to(p["null_k"].astype(q.dtype)[None, :, 0], (b, h, dh))
        null_v = jnp.broadcast_to(p["null_v"].astype(q.dtype)[None, :, 0], (b, h, dh))

        # --- neighborhood path (non-bos)
        s = jnp.maximum(pos - 1, 0) % tpf
        nb = jnp.take(self.sp_idx, s, axis=0)      # (Kn,)
        nbv = jnp.take(self.sp_valid, s, axis=0)   # (Kn,)
        frame_off = jnp.arange(num_frames) * tpf
        flat_idx = (frame_off[:, None] + nb[None, :]).reshape(-1)  # (F*Kn,)
        k_nb = jnp.take(cache["ck"], flat_idx, axis=2)
        v_nb = jnp.take(cache["cv"], flat_idx, axis=2)
        m_nb = jnp.take(cache["cmask"], flat_idx, axis=1)  # (b, F*Kn)
        m_nb = m_nb & jnp.tile(nbv, (num_frames,))[None]

        sim = jnp.einsum("bhd,bhjd->bhj", q, k_nb)
        sim_null = jnp.einsum("bhd,bhd->bh", q, null_k)[..., None]
        sim = masked_fill(sim, ~m_nb[:, None, :], max_neg_value(sim.dtype))
        sim = jnp.concatenate([sim_null, sim], axis=-1)
        attn = stable_softmax(sim, axis=-1)
        attn = _th_mix(attn, p["talking_heads"])
        vals = jnp.concatenate([null_v[:, :, None], v_nb], axis=2)
        out_nb = jnp.einsum("bhj,bhjd->bhd", attn.astype(vals.dtype), vals)

        # --- bos path: full-context attention (no talking heads, :842-843)
        sim_f = jnp.einsum("bhd,bhjd->bhj", q, cache["ck"])
        sim_f = masked_fill(sim_f, ~cache["cmask"][:, None, :], max_neg_value(sim_f.dtype))
        sim_f = jnp.concatenate([sim_null, sim_f], axis=-1)
        attn_f = stable_softmax(sim_f, axis=-1)
        vals_f = jnp.concatenate([null_v[:, :, None], cache["cv"]], axis=2)
        out_bos = jnp.einsum("bhj,bhjd->bhd", attn_f.astype(vals_f.dtype), vals_f)

        out = jnp.where(pos == 0, out_bos, out_nb)
        return Dense(mod.inner_dim, mod.dim)(p["to_out"], out.reshape(b, h * dh)), cache


class _FFStep:
    def __init__(self, mod: FeedForward):
        self.mod = mod

    def __call__(self, p, cache, x_i, pos, **_):
        return self.mod._net(p, x_i[:, None, :], None)[:, 0], cache

    def prefill(self, p, cache, x):
        return self.mod._net(p, x, None), cache


class _ShiftVideoStep:
    """Wraps an inner step; maintains the (b, T_in, dim) input buffer needed
    for the h/w token-shift reads."""

    def __init__(self, wrapper: ShiftVideo, inner_step, total_in: int, dim: int):
        self.w = wrapper
        self.inner = inner_step
        self.total = total_in
        self.dim = dim

    def init_buffer(self, b, dtype):
        return jnp.zeros((b, self.total, self.dim), dtype)

    def __call__(self, p, cache, x_i, pos, **kw):
        cache = dict(cache)
        buf = cache["shift_buf"]
        buf = jax.lax.dynamic_update_index_in_dim(buf, x_i[:, None], pos, 1)
        cache["shift_buf"] = buf

        if self.w.shift_space or self.w.shift_time:
            W = self.w.image_size
            HW = W * W
            d = self.dim
            sizes = _chunk_sizes(d, 5 if (self.w.shift_space and self.w.shift_time) else (4 if self.w.shift_space else 3))
            v = pos - 1  # video coordinate of this input position
            y = (v % HW) // W
            x_coord = v % W
            f = v // HW

            parts = []
            offset = 0
            order = []
            if self.w.shift_time:
                order.append("f")
            if self.w.shift_space:
                order.extend(["h", "w"])
            for name, size in zip(order, sizes):
                src_pos = {"f": pos - HW, "h": pos - W, "w": pos - 1}[name]
                ok = {"f": f > 0, "h": y > 0, "w": x_coord > 0}[name]
                src = jax.lax.dynamic_index_in_dim(
                    buf, jnp.maximum(src_pos, 0), 1, keepdims=False
                )
                part = jnp.where(ok, src[:, offset : offset + size], 0.0)
                parts.append(part)
                offset += size
            parts.append(x_i[:, offset:])
            shifted = jnp.concatenate(parts, axis=-1)
            # bos (pos==0) passes through unshifted
            x_i = jnp.where(pos == 0, x_i, shifted)

        out, cache2 = self.inner(p, cache, x_i, pos, **kw)
        cache2 = dict(cache2)
        cache2["shift_buf"] = cache["shift_buf"]
        return out, cache2

    def prefill(self, p, cache, x):
        from .ops.shift import shift_video_tokens

        cache = dict(cache)
        n = x.shape[1]
        cache["shift_buf"] = cache["shift_buf"].at[:, :n].set(
            x.astype(cache["shift_buf"].dtype)
        )
        xs = shift_video_tokens(x, self.w.image_size, self.w.shift_space, self.w.shift_time)
        out, cache2 = self.inner.prefill(p, cache, xs)
        cache2 = dict(cache2)
        cache2["shift_buf"] = cache["shift_buf"]
        return out, cache2


def _chunk_sizes(dim, chunks):
    per = -(-dim // chunks)
    sizes = []
    left = dim
    while left > 0 and len(sizes) < chunks:
        take = min(per, left)
        sizes.append(take)
        left -= take
    return sizes


class _SandwichStep:
    def __init__(self, sandwich: Sandwich, inner_step):
        self.s = sandwich
        self.inner = inner_step

    def __call__(self, p, cache, x_i, pos, **kw):
        ln = LayerNorm(self.s.dim)
        h = ln(p["pre"], x_i)
        h, cache = self.inner(p["inner"], cache, h, pos, **kw)
        return ln(p["post"], h), cache

    def prefill(self, p, cache, x):
        ln = LayerNorm(self.s.dim)
        h = ln(p["pre"], x)
        h, cache = self.inner.prefill(p["inner"], cache, h)
        return ln(p["post"], h), cache


# ---------------------------------------------------------------------------
# transformer-level cached decoder
# ---------------------------------------------------------------------------


class TransformerDecoder:
    """Incremental decoder for a (Reversible)Transformer layer menu.

    ``total_in`` — decoder input length (1 + total video tokens). Reversible
    stacks run the same couples as two-stream updates (x1 += f(x2);
    x2 += g(x1)) — reversibility itself is a training-memory device and is
    irrelevant at inference.
    """

    def __init__(self, transformer: Transformer, total_in: int):
        self.t = transformer
        self.total_in = total_in
        menu = transformer.layer_menu
        self.steps = [(kind, self._build(module)) for kind, module in menu]
        self.reversible = transformer.__class__.__name__.startswith("Reversible")

        if not self.reversible:
            self.plan = [("plain", i, i) for i in range(len(menu))]
        else:
            # mirror ReversibleTransformer._couples: couple c pairs the menu's
            # self-attn with its trailing ff, and cross-attn with ff_cross
            plan = []
            c = 0
            i = 0
            while i < len(menu):
                kind = menu[i][0]
                if kind == "self":
                    ff_idx = next(
                        j for j in range(i + 1, len(menu)) if menu[j][0] == "ff"
                    )
                    plan.append(("couple", c, i, ff_idx))
                    c += 1
                    i += 1
                elif kind == "cross":
                    assert menu[i + 1][0] == "ff_cross"
                    plan.append(("couple", c, i, i + 1))
                    c += 1
                    i += 2
                else:
                    i += 1
            self.plan = plan

    def _build(self, sandwich: Sandwich):
        inner = sandwich.inner
        wrapper = None
        if isinstance(inner, ShiftVideo):
            wrapper = inner
            inner = inner.inner
        if isinstance(inner, Sparse3DNA):
            step = _Sparse3DNAStep(inner, self.total_in - 1)
        elif isinstance(inner, SparseCross2DNA):
            step = _SparseCross2DNAStep(inner, self.total_in - 1)
        elif isinstance(inner, Attention):
            step = (
                _DenseSelfStep(inner, self.total_in)
                if inner.causal
                else _CrossAttnStep(inner)
            )
        elif isinstance(inner, FeedForward):
            step = _FFStep(inner)
        else:  # pragma: no cover
            raise TypeError(f"no decode step for {type(inner)}")
        if wrapper is not None:
            step = _ShiftVideoStep(wrapper, step, self.total_in, self.t.dim)
        return _SandwichStep(sandwich, step)

    def _layer_params(self, p, menu_idx):
        """Sandwich params for menu entry ``menu_idx``."""
        if not self.reversible:
            return p["layers"][menu_idx]
        for item in self.plan:
            _, c, f_idx, g_idx = item
            if menu_idx == f_idx:
                return p["layers"][c]["f"]
            if menu_idx == g_idx:
                return p["layers"][c]["g"]
        raise KeyError(menu_idx)

    def init_cache(self, p, b, context, context_mask, dtype=jnp.float32):
        caches = []
        for idx, (kind, step) in enumerate(self.steps):
            lp = self._layer_params(p, idx)
            c = {}
            inner = step.inner
            if isinstance(inner, _ShiftVideoStep):
                c["shift_buf"] = inner.init_buffer(b, dtype)
                inner = inner.inner
            if isinstance(inner, (_DenseSelfStep, _Sparse3DNAStep)):
                c.update(inner.init_cache(b, dtype))
            elif isinstance(inner, (_CrossAttnStep, _SparseCross2DNAStep)):
                c.update(inner.init_cache(lp["inner"], context, context_mask))
            caches.append(c)
        return caches

    def prefill(self, p, caches, x):
        """Process decoder inputs ``x`` (b, n, dim), positions 0..n-1, in one
        vectorized pass, leaving caches as n incremental steps would. Used by
        ``generate_long`` to re-prime a fresh sliding window per frame.
        Outputs are discarded (the window's logits are already known)."""
        new_caches = list(caches)
        if not self.reversible:
            for idx, (kind, step) in enumerate(self.steps):
                lp = self._layer_params(p, idx)
                out, new_caches[idx] = step.prefill(lp, caches[idx], x)
                x = x + out
        else:
            x1 = x2 = x
            for _, c, f_idx, g_idx in self.plan:
                lp = p["layers"][c]
                out, new_caches[f_idx] = self.steps[f_idx][1].prefill(
                    lp["f"], new_caches[f_idx], x2
                )
                x1 = x1 + out
                out, new_caches[g_idx] = self.steps[g_idx][1].prefill(
                    lp["g"], new_caches[g_idx], x1
                )
                x2 = x2 + out
        return new_caches

    def step(self, p, caches, x_i, pos):
        """x_i: (b, dim) input at position ``pos``. Returns (y_i, caches)."""
        from .core.layers import StableLayerNorm

        new_caches = list(caches)
        if not self.reversible:
            for idx, (kind, step) in enumerate(self.steps):
                lp = self._layer_params(p, idx)
                out, new_caches[idx] = step(lp, caches[idx], x_i, pos)
                x_i = x_i + out
        else:
            x1 = x2 = x_i
            for _, c, f_idx, g_idx in self.plan:
                lp = p["layers"][c]
                out, new_caches[f_idx] = self.steps[f_idx][1](
                    lp["f"], new_caches[f_idx], x2, pos
                )
                x1 = x1 + out
                out, new_caches[g_idx] = self.steps[g_idx][1](
                    lp["g"], new_caches[g_idx], x1, pos
                )
                x2 = x2 + out
            x_i = (x1 + x2) * 0.5

        norm = StableLayerNorm(self.t.dim)
        return norm(p["norm"], x_i[:, None, :])[:, 0], new_caches
