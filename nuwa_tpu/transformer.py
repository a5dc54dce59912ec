"""Transformer composition layer: the four stack variants of the reference —
``Transformer`` / ``ReversibleTransformer``
(/root/reference/nuwa_pytorch/nuwa_pytorch.py:1071-1295) and the dual-modality
decoders (:1299-1655) — built from static layer menus.

Every block is wrapped in SandwichNorm (pre+post LN, :112-128), optionally in
a token-shift wrapper, and the stack ends in StableLayerNorm. Layer menus are
*static tuples* of (kind, module) so the whole stack folds into one jitted
graph; reversible variants reuse the couples through
``nuwa_tpu.reversible``'s custom_vjp runner.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax

from .core.layers import LayerNorm, Module, StableLayerNorm
from .nda import Sparse3DNA, SparseCross2DNA
from .ops.attention import Attention
from .ops.feedforward import FeedForward
from .ops.shift import shift_audio_tokens, shift_video_tokens
from .reversible import reversible_sequence


# ---------------------------------------------------------------------------
# combinators
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PreNorm(Module):
    """Pre-LayerNorm wrapper (reference ``PreNorm``, nuwa_pytorch.py:97-110 —
    defined there but unused; SandwichNorm is used everywhere). Kept for
    inventory parity and as a composition option."""

    dim: int
    inner: Module

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"norm": LayerNorm(self.dim).init(k1), "inner": self.inner.init(k2)}

    def __call__(self, p, x, **kw):
        x = LayerNorm(self.dim)(p["norm"], x)
        return self.inner(p["inner"], x, **kw)


@dataclass(frozen=True)
class Sandwich(Module):
    """Pre+post LayerNorm around an inner block (CogView sandwich norm)."""

    dim: int
    inner: Module

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "pre": LayerNorm(self.dim).init(k1),
            "post": LayerNorm(self.dim).init(k2),
            "inner": self.inner.init(k3),
        }

    def __call__(self, p, x, **kw):
        ln = LayerNorm(self.dim)
        x = ln(p["pre"], x)
        x = self.inner(p["inner"], x, **kw)
        return ln(p["post"], x)


@dataclass(frozen=True)
class BindCP(Module):
    """Statically bind a context-parallel mesh into a block.

    The reversible runtimes route *differentiable* ctx entries through their
    custom_vjp (reversible.py); a `jax.sharding.Mesh` is static config, so it
    rides the module closure instead — the couples are rebuilt per call, and
    `jax.vjp` differentiates through the shard_map'd halo exchange directly
    (its transpose ppermutes the halo cotangents back)."""

    inner: Module
    cp_mesh: object
    cp_axis: str = "data"

    def init(self, key):
        return self.inner.init(key)

    def __call__(self, p, x, **kw):
        return self.inner(p, x, cp_mesh=self.cp_mesh, cp_axis=self.cp_axis, **kw)


@dataclass(frozen=True)
class ShiftVideo(Module):
    inner: Module
    image_size: int
    shift_space: bool = True
    shift_time: bool = False

    def init(self, key):
        return self.inner.init(key)

    def __call__(self, p, x, **kw):
        x = shift_video_tokens(x, self.image_size, self.shift_space, self.shift_time)
        return self.inner(p, x, **kw)


@dataclass(frozen=True)
class ShiftAudio(Module):
    inner: Module
    audio_tokens_per_timestep: int = 1

    def init(self, key):
        return self.inner.init(key)

    def __call__(self, p, x, **kw):
        x = shift_audio_tokens(x, self.audio_tokens_per_timestep)
        return self.inner(p, x, **kw)


# routing tables: which call-site kwargs each block kind receives
_ROUTES = {
    "self": ("mask", "rotary_pos_emb"),
    "cross": ("context", "context_mask", "mask"),
    "ff": (),
}


# ---------------------------------------------------------------------------
# layer menu builder (shared by Transformer / ReversibleTransformer)
# ---------------------------------------------------------------------------


def _build_layer_menu(
    *,
    dim,
    depth,
    causal,
    heads,
    dim_head,
    ff_mult,
    cross_attend,
    attn_dropout,
    ff_dropout,
    ff_chunk_size,
    cross_2dna_attn,
    cross_2dna_image_size,
    cross_2dna_kernel_size,
    cross_2dna_dilations,
    cross_2dna_backend,
    sparse_3dna_attn,
    sparse_3dna_kernel_size,
    sparse_3dna_video_shape,
    sparse_3dna_query_num_frames_chunk,
    sparse_3dna_dilations,
    sparse_3dna_rel_pos_bias,
    sparse_3dna_use_pallas,
    sparse_3dna_backend,
    shift_video_tokens_flag,
    include_cross_ff,
    sparse_3dna_row_block=None,
):
    """Return a tuple of (kind, module) entries, one flat list per stack.

    ``include_cross_ff``: the reversible layout pairs each cross-attn with
    its own FF (reference :1274-1277); the plain layout shares one FF per
    depth (reference :1152,:1174-1180).
    """
    assert not (sparse_3dna_attn and sparse_3dna_video_shape is None)
    assert not (cross_2dna_attn and cross_2dna_image_size is None)

    def make_ff():
        return FeedForward(
            dim=dim, mult=ff_mult, dropout=ff_dropout, chunk_size=ff_chunk_size
        )

    entries = []
    for ind in range(depth):
        if sparse_3dna_attn:
            dilation = sparse_3dna_dilations[ind % len(sparse_3dna_dilations)]
            self_attn = Sparse3DNA(
                dim=dim,
                heads=heads,
                dim_head=dim_head,
                causal=causal,
                kernel_size=sparse_3dna_kernel_size,
                dilation=dilation,
                video_shape=sparse_3dna_video_shape,
                query_num_frames_chunk=sparse_3dna_query_num_frames_chunk,
                rel_pos_bias=sparse_3dna_rel_pos_bias,
                dropout=attn_dropout,
                use_pallas=sparse_3dna_use_pallas,
                backend=sparse_3dna_backend,
                row_block=sparse_3dna_row_block,
            )
        else:
            self_attn = Attention(
                dim=dim, heads=heads, dim_head=dim_head, causal=causal,
                dropout=attn_dropout,
            )

        ff = make_ff()
        if sparse_3dna_attn and shift_video_tokens_flag:
            fmap = sparse_3dna_video_shape[-1]
            self_attn = ShiftVideo(self_attn, image_size=fmap)
            ff = ShiftVideo(ff, image_size=fmap)

        entries.append(("self", Sandwich(dim=dim, inner=self_attn)))

        if cross_attend:
            if cross_2dna_attn:
                dilation = cross_2dna_dilations[ind % len(cross_2dna_dilations)]
                cross_attn = SparseCross2DNA(
                    dim=dim,
                    heads=heads,
                    dim_head=dim_head,
                    dropout=attn_dropout,
                    image_size=cross_2dna_image_size,
                    kernel_size=cross_2dna_kernel_size,
                    dilation=dilation,
                    backend=cross_2dna_backend,
                )
            else:
                cross_attn = Attention(
                    dim=dim, heads=heads, dim_head=dim_head, dropout=attn_dropout
                )
            entries.append(("cross", Sandwich(dim=dim, inner=cross_attn)))
            if include_cross_ff:
                ff2 = make_ff()
                if sparse_3dna_attn and shift_video_tokens_flag:
                    ff2 = ShiftVideo(ff2, image_size=sparse_3dna_video_shape[-1])
                entries.append(("ff_cross", Sandwich(dim=dim, inner=ff2)))

        entries.append(("ff", Sandwich(dim=dim, inner=ff)))

    return tuple(entries)


_COMMON_DEFAULTS = dict(
    causal=False,
    heads=8,
    dim_head=64,
    ff_mult=4,
    cross_attend=False,
    attn_dropout=0.0,
    ff_dropout=0.0,
    ff_chunk_size=None,
    cross_2dna_attn=False,
    cross_2dna_image_size=None,
    cross_2dna_kernel_size=3,
    cross_2dna_dilations=(1,),
    cross_2dna_backend="auto",
    sparse_3dna_attn=False,
    sparse_3dna_kernel_size=3,
    sparse_3dna_video_shape=None,
    sparse_3dna_query_num_frames_chunk=None,
    sparse_3dna_dilations=(1,),
    sparse_3dna_rel_pos_bias=False,
    sparse_3dna_use_pallas=False,
    shift_video_tokens=False,
)


@dataclass(frozen=True)
class Transformer(Module):
    """Non-reversible stack: depth × [self-attn, cross-attn?, ff] with
    residuals and a final StableLayerNorm (reference :1071-1182)."""

    dim: int
    depth: int
    causal: bool = False
    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 4
    cross_attend: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    ff_chunk_size: Optional[int] = None
    cross_2dna_attn: bool = False
    cross_2dna_image_size: Optional[int] = None
    cross_2dna_kernel_size: int = 3
    cross_2dna_dilations: Tuple[int, ...] = (1,)
    cross_2dna_backend: str = "auto"
    sparse_3dna_attn: bool = False
    sparse_3dna_kernel_size: int | Tuple[int, int, int] = 3
    sparse_3dna_video_shape: Optional[Tuple[int, int, int]] = None
    sparse_3dna_query_num_frames_chunk: Optional[int] = None
    sparse_3dna_dilations: Tuple[int, ...] = (1,)
    sparse_3dna_rel_pos_bias: bool = False
    sparse_3dna_use_pallas: bool = False
    sparse_3dna_backend: str = "auto"
    # force the row-blocked Pallas family with this query-row block even at
    # HW <= 256 (see Sparse3DNA.row_block). Measured on v5e at fmap 16 b=8
    # kernel (5,3,3): rb=8 LOSES to the whole-frame family both at
    # dim 512/dh64 (71.3 vs 59.5 ms/step) and dim 1024/dh128 (113.9 vs
    # 101.7) — the narrower key window doesn't repay the extra grid steps
    # and halo DMA. Kept as an experimentation knob; 'auto' never sets it.
    sparse_3dna_row_block: Optional[int] = None
    shift_video_tokens: bool = False
    rotary_pos_emb: bool = False
    remat: bool = False  # jax.checkpoint each block (activation-memory knob;
    # the lighter-weight alternative to the reversible variant, SURVEY §7.5)

    @property
    def layer_menu(self):
        return _build_layer_menu(
            dim=self.dim,
            depth=self.depth,
            causal=self.causal,
            heads=self.heads,
            dim_head=self.dim_head,
            ff_mult=self.ff_mult,
            cross_attend=self.cross_attend,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            ff_chunk_size=self.ff_chunk_size,
            cross_2dna_attn=self.cross_2dna_attn,
            cross_2dna_image_size=self.cross_2dna_image_size,
            cross_2dna_kernel_size=self.cross_2dna_kernel_size,
            cross_2dna_dilations=self.cross_2dna_dilations,
            cross_2dna_backend=self.cross_2dna_backend,
            sparse_3dna_attn=self.sparse_3dna_attn,
            sparse_3dna_kernel_size=self.sparse_3dna_kernel_size,
            sparse_3dna_video_shape=self.sparse_3dna_video_shape,
            sparse_3dna_query_num_frames_chunk=self.sparse_3dna_query_num_frames_chunk,
            sparse_3dna_dilations=self.sparse_3dna_dilations,
            sparse_3dna_rel_pos_bias=self.sparse_3dna_rel_pos_bias,
            sparse_3dna_use_pallas=self.sparse_3dna_use_pallas,
            sparse_3dna_backend=self.sparse_3dna_backend,
            sparse_3dna_row_block=self.sparse_3dna_row_block,
            shift_video_tokens_flag=self.shift_video_tokens,
            include_cross_ff=self._include_cross_ff,
        )

    @property
    def _include_cross_ff(self):
        return False

    def init(self, key):
        menu = self.layer_menu
        keys = jax.random.split(key, len(menu) + 1)
        return {
            "layers": [m.init(k) for (_, m), k in zip(menu, keys[:-1])],
            "norm": StableLayerNorm(self.dim).init(keys[-1]),
        }

    def _kwargs_for(self, kind, mask, context, context_mask, rotary_pos_emb,
                    cp_mesh=None, cp_axis="data"):
        if kind == "self":
            kw = dict(mask=mask, rotary_pos_emb=rotary_pos_emb)
            if cp_mesh is not None and self.sparse_3dna_attn:
                kw.update(cp_mesh=cp_mesh, cp_axis=cp_axis)
            return kw
        if kind == "cross":
            return dict(context=context, context_mask=context_mask, mask=mask)
        return {}

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
        cp_mesh=None,
        cp_axis="data",
        **_,
    ):
        menu = self.layer_menu
        keys = (
            jax.random.split(key, len(menu)) if key is not None else [None] * len(menu)
        )
        for (kind, module), lp, lk in zip(menu, p["layers"], keys):
            kw = self._kwargs_for(
                kind, mask, context, context_mask, rotary_pos_emb, cp_mesh, cp_axis
            )
            if self.remat:
                fn = jax.checkpoint(
                    lambda lp, x, lk, _m=module, _kw=kw: _m(lp, x, key=lk, **_kw)
                )
                x = fn(lp, x, lk) + x
            else:
                x = module(lp, x, key=lk, **kw) + x
        return StableLayerNorm(self.dim)(p["norm"], x)


@dataclass(frozen=True)
class ReversibleTransformer(Transformer):
    """Same layer menu as ``Transformer`` but run as reversible (f, g)
    couples (reference :1184-1295): per depth [self-attn, ff] and — when
    cross-attending — an extra [cross-attn, ff] couple."""

    @property
    def _include_cross_ff(self):
        return True

    def _couples(self, cp_mesh=None, cp_axis="data"):
        menu = self.layer_menu
        couples = []
        i = 0
        while i < len(menu):
            kind, module = menu[i]
            if kind == "self":
                if cp_mesh is not None and self.sparse_3dna_attn:
                    module = BindCP(module, cp_mesh=cp_mesh, cp_axis=cp_axis)
                # pair with the trailing "ff" entry of this depth
                ff_entry = next(
                    e for e in menu[i + 1 :] if e[0] == "ff"
                )
                couples.append((module, _ROUTES["self"], ff_entry[1], ()))
                i += 1
            elif kind == "cross":
                ff2 = menu[i + 1]
                assert ff2[0] == "ff_cross"
                couples.append((module, _ROUTES["cross"], ff2[1], ()))
                i += 2
            else:  # the ff consumed by the self couple
                i += 1
        return tuple(couples)

    def init(self, key):
        couples = self._couples()
        keys = jax.random.split(key, len(couples) + 1)
        return {
            "layers": [
                {"f": f.init(jax.random.fold_in(k, 0)), "g": g.init(jax.random.fold_in(k, 1))}
                for (f, _, g, _), k in zip(couples, keys[:-1])
            ],
            "norm": StableLayerNorm(self.dim).init(keys[-1]),
        }

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
        reverse=True,
        cp_mesh=None,
        cp_axis="data",
        **_,
    ):
        couples = self._couples(cp_mesh=cp_mesh, cp_axis=cp_axis)
        ctx = {
            "mask": mask,
            "context": context,
            "context_mask": context_mask,
            "rotary_pos_emb": rotary_pos_emb,
        }
        if key is not None:
            keys = jax.random.split(key, len(couples) * 2)
            for i in range(len(couples)):
                ctx[f"key{i}f"] = keys[2 * i]
                ctx[f"key{i}g"] = keys[2 * i + 1]
        x = reversible_sequence(couples, p["layers"], x, ctx, reverse=reverse)
        return StableLayerNorm(self.dim)(p["norm"], x)
