"""Twin-tower video+audio decoders.

Parity: reference ``DualModalityDecoder`` (:1299-1487) and
``ReversibleDualModalityDecoder`` (:1489-1655) in
/root/reference/nuwa_pytorch/nuwa_pytorch.py. Per depth:

  intra-modality self:  video Sparse3DNA ∥ audio SparseCausal2DNA (+FFs)
  intra-modality cross: video→text ∥ audio→text dense Attention (+FFs)
  every k-th depth:     video↔audio chunk-aligned CrossModalityCrossAttention

The reversible variant flattens this schedule into quad-stream blocks run by
``nuwa_tpu.reversible_dual``; the non-reversible variant runs the same
modules with plain residuals (note the reference's non-reversible inter-
modality step attends the *pre-update* opposite stream, :1463-1478, while
the reversible one attends the updated video half — both behaviors are kept).

Documented deviation: both variants share the reversible reference's layer
menu (per depth: [self+ff] then [cross+ff], :1561-1594), so the plain
decoder carries one extra FF per stream per depth compared to the reference's
non-reversible layout (:1330-1395, which shares a single FF across self+cross)
— a strict capability superset; the reversible variant (the default) matches
exactly.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax

from .core.layers import Module, StableLayerNorm
from .nda import Sparse3DNA, SparseCausal2DNA
from .ops.attention import Attention
from .ops.crossmodality import CrossModalityCrossAttention
from .ops.feedforward import FeedForward
from .reversible_dual import dual_reversible_sequence
from .transformer import BindCP, Sandwich, ShiftAudio, ShiftVideo


def apply_dual_block(
    btype, mods, lp, video, audio, *, context=None, context_mask=None,
    video_mask=None, audio_mask=None, keys=(None, None, None, None),
    cp_mesh=None,
):
    """One schedule entry of the non-reversible dual decoder: updates the
    (video, audio) stream pair through the block's four sandwiched modules.
    Shared by the plain forward and the pipelined runtime so a
    ``jax.checkpoint`` wrapper sees the same (lp, video, audio, keys)
    positional signature in both."""
    f, g, j, k = mods
    kf, kg, kj, kk = keys
    if btype == "self":
        # frame-axis context parallelism applies to the video tower's
        # 3DNA only (audio 2DNA and cross blocks stay replicated)
        video = f(lp["f"], video, mask=video_mask, key=kf, cp_mesh=cp_mesh) + video
        video = g(lp["g"], video, key=kg) + video
        audio = j(lp["j"], audio, mask=audio_mask, key=kj) + audio
        audio = k(lp["k"], audio, key=kk) + audio
    elif btype == "cross":
        video = (
            f(lp["f"], video, context=context, mask=video_mask,
              context_mask=context_mask, key=kf)
            + video
        )
        video = g(lp["g"], video, key=kg) + video
        audio = (
            j(lp["j"], audio, context=context, mask=audio_mask,
              context_mask=context_mask, key=kj)
            + audio
        )
        audio = k(lp["k"], audio, key=kk) + audio
    else:  # xmod — non-reversible attends the pre-update streams
        video_new = (
            f(lp["f"], video, audio, mask=video_mask,
              context_mask=audio_mask, key=kf)
            + video
        )
        audio_new = (
            j(lp["j"], audio, video, mask=audio_mask,
              context_mask=video_mask, key=kj)
            + audio
        )
        # g is the audio-stream ff, k the video-stream ff
        video = k(lp["k"], video_new, key=kk) + video_new
        audio = g(lp["g"], audio_new, key=kg) + audio_new
    return video, audio


@dataclass(frozen=True)
class DualModalityDecoder(Module):
    dim: int
    depth: int
    num_audio_tokens_per_video_frame: int
    num_video_tokens_per_frame: int
    sparse_3dna_video_shape: Tuple[int, int, int]
    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 4
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    ff_chunk_size: Optional[int] = None
    sparse_3dna_kernel_size: int | Tuple[int, int, int] = 3
    sparse_3dna_query_num_frames_chunk: Optional[int] = None
    sparse_3dna_dilations: Tuple[int, ...] = (1,)
    sparse_3dna_rel_pos_bias: bool = False
    sparse_3dna_use_pallas: bool = False
    sparse_2dna_kernel_size: int = 7
    sparse_2dna_dilation: Tuple[int, ...] = (1,)
    sparse_2dna_rel_pos_bias: bool = False
    sparse_2dna_use_pallas: bool = False
    sparse_2dna_backend: str = "auto"
    shift_video_tokens: bool = False
    shift_audio_tokens: bool = False
    audio_tokens_per_timestep: int = 1
    cross_modality_attn_every: int = 3
    remat: bool = False  # jax.checkpoint each block (activation-memory knob
    # for the non-reversible variant — the pipelined runtime honors it too;
    # the reversible subclass ignores it, its custom_vjp is already O(1))

    # ---- schedule -------------------------------------------------------

    def _ff(self):
        return FeedForward(
            dim=self.dim, mult=self.ff_mult, dropout=self.ff_dropout,
            chunk_size=self.ff_chunk_size,
        )

    def _video_ff(self):
        ff = self._ff()
        if self.shift_video_tokens:
            ff = ShiftVideo(ff, image_size=self.sparse_3dna_video_shape[-1])
        return ff

    def _audio_ff(self):
        ff = self._ff()
        if self.shift_audio_tokens:
            ff = ShiftAudio(ff, audio_tokens_per_timestep=self.audio_tokens_per_timestep)
        return ff

    def _sand(self, inner):
        return Sandwich(dim=self.dim, inner=inner)

    def blocks(self):
        """Static schedule: tuple of (type, (f, g, j, k), routes) quads, where
        f/g act on the video stream and j/k on audio (see reversible_dual)."""
        out = []
        for ind in range(self.depth):
            v_dil = self.sparse_3dna_dilations[ind % len(self.sparse_3dna_dilations)]
            a_dil = self.sparse_2dna_dilation[ind % len(self.sparse_2dna_dilation)]

            video_self = Sparse3DNA(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                causal=True,
                kernel_size=self.sparse_3dna_kernel_size,
                dilation=v_dil,
                video_shape=self.sparse_3dna_video_shape,
                query_num_frames_chunk=self.sparse_3dna_query_num_frames_chunk,
                rel_pos_bias=self.sparse_3dna_rel_pos_bias,
                dropout=self.attn_dropout,
                use_pallas=self.sparse_3dna_use_pallas,
            )
            if self.shift_video_tokens:
                video_self = ShiftVideo(
                    video_self, image_size=self.sparse_3dna_video_shape[-1]
                )
            audio_self = SparseCausal2DNA(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.attn_dropout,
                kernel_size=self.sparse_2dna_kernel_size,
                dilation=a_dil,
                rel_pos_bias=self.sparse_2dna_rel_pos_bias,
                height=self.audio_tokens_per_timestep,
                use_pallas=self.sparse_2dna_use_pallas,
                backend=self.sparse_2dna_backend,
            )
            if self.shift_audio_tokens:
                audio_self = ShiftAudio(
                    audio_self, audio_tokens_per_timestep=self.audio_tokens_per_timestep
                )

            out.append(
                (
                    "self",
                    (
                        self._sand(video_self),
                        self._sand(self._video_ff()),
                        self._sand(audio_self),
                        self._sand(self._audio_ff()),
                    ),
                    None,
                )
            )

            mk_attn = lambda: Attention(
                dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                dropout=self.attn_dropout,
            )
            out.append(
                (
                    "cross",
                    (
                        self._sand(mk_attn()),
                        self._sand(self._video_ff()),
                        self._sand(mk_attn()),
                        self._sand(self._audio_ff()),
                    ),
                    None,
                )
            )

            if (ind + 1) % self.cross_modality_attn_every == 0:
                v2a = CrossModalityCrossAttention(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    chunk_size=self.num_video_tokens_per_frame,
                    context_chunk_size=self.num_audio_tokens_per_video_frame,
                    has_start_token=True,
                    context_has_start_token=True,
                    dropout=self.attn_dropout,
                )
                a2v = CrossModalityCrossAttention(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    chunk_size=self.num_audio_tokens_per_video_frame,
                    context_chunk_size=self.num_video_tokens_per_frame,
                    has_start_token=True,
                    context_has_start_token=True,
                    dropout=self.attn_dropout,
                )
                out.append(
                    (
                        "xmod",
                        (
                            self._sand_xmod(v2a),
                            self._sand(self._ff()),  # audio-stream ff (g) —
                            self._sand_xmod(a2v),    # xmod FFs are unwrapped
                            self._sand(self._ff()),  # (reference :1408,:1607)
                        ),
                        None,
                    )
                )
        return tuple(out)

    def _sand_xmod(self, inner):
        return SandwichX(dim=self.dim, inner=inner)

    # ---- params ---------------------------------------------------------

    def init(self, key):
        blocks = self.blocks()
        keys = jax.random.split(key, len(blocks) + 2)
        params = []
        for (btype, mods, _), k in zip(blocks, keys[:-2]):
            sub = jax.random.split(k, 4)
            params.append(
                {
                    "f": mods[0].init(sub[0]),
                    "g": mods[1].init(sub[1]),
                    "j": mods[2].init(sub[2]),
                    "k": mods[3].init(sub[3]),
                }
            )
        return {
            "layers": params,
            "video_norm": StableLayerNorm(self.dim).init(keys[-2]),
            "audio_norm": StableLayerNorm(self.dim).init(keys[-1]),
        }

    # ---- forward --------------------------------------------------------

    def _ctx(self, context, audio_mask, video_mask, context_mask, key, n_blocks):
        ctx = {
            "context": context,
            "context_mask": context_mask,
            "video_mask": video_mask,
            "audio_mask": audio_mask,
        }
        if key is not None:
            keys = jax.random.split(key, n_blocks * 4)
            for i in range(n_blocks):
                for s, suffix in enumerate("fgjk"):
                    ctx[f"key{i}{suffix}"] = keys[4 * i + s]
        return ctx

    def __call__(
        self,
        p,
        video,
        audio,
        *,
        context,
        audio_mask=None,
        video_mask=None,
        context_mask=None,
        key=None,
        cp_mesh=None,
        **_,
    ):
        blocks = self.blocks()
        lkeys = (
            jax.random.split(key, len(blocks) * 4)
            if key is not None
            else [None] * (len(blocks) * 4)
        )
        for i, ((btype, mods, _), lp) in enumerate(zip(blocks, p["layers"])):
            blk = lambda lp, v, a, keys, _bt=btype, _mods=mods: apply_dual_block(
                _bt, _mods, lp, v, a, context=context,
                context_mask=context_mask, video_mask=video_mask,
                audio_mask=audio_mask, keys=keys, cp_mesh=cp_mesh,
            )
            if self.remat:
                blk = jax.checkpoint(blk)
            video, audio = blk(
                lp, video, audio, tuple(lkeys[4 * i : 4 * i + 4])
            )
        norm = StableLayerNorm(self.dim)
        return norm(p["video_norm"], video), norm(p["audio_norm"], audio)


class SandwichX(Sandwich):
    """Sandwich norm whose inner fn takes (x, context) positionally — used to
    wrap CrossModalityCrossAttention in the dual decoder."""

    def __call__(self, p, x, context=None, **kw):
        from .core.layers import LayerNorm

        ln = LayerNorm(self.dim)
        x = ln(p["pre"], x)
        x = self.inner(p["inner"], x, context, **kw)
        return ln(p["post"], x)


# make SandwichX a frozen dataclass like its parent
SandwichX = dataclass(frozen=True)(SandwichX)


def reversible_dual_blocks(blocks, cp_mesh=None, cp_axis="data"):
    """Adapt a ``DualModalityDecoder.blocks()`` schedule to
    ``reversible_dual``'s calling convention: attach the ctx-key routes each
    of the four sub-functions reads, and (optionally) statically bind a
    context-parallel mesh into the video self-attn module. Shared by the
    reversible forward and the pipelined reversible runtime."""
    rev_blocks = []
    for btype, mods, _ in blocks:
        if btype == "self":
            if cp_mesh is not None:
                f, g, j, k = mods
                mods = (BindCP(f, cp_mesh=cp_mesh, cp_axis=cp_axis), g, j, k)
            routes = {"f": (("video_mask", "mask"),), "g": (),
                      "j": (("audio_mask", "mask"),), "k": ()}
        elif btype == "cross":
            routes = {
                "f": ("context", "context_mask", ("video_mask", "mask")),
                "g": (),
                "j": ("context", "context_mask", ("audio_mask", "mask")),
                "k": (),
            }
        else:
            routes = {
                "f": (("video_mask", "mask"), ("audio_mask", "context_mask")),
                "g": (),
                "j": (("audio_mask", "mask"), ("video_mask", "context_mask")),
                "k": (),
            }
        rev_blocks.append((btype, mods, routes))
    return tuple(rev_blocks)


@dataclass(frozen=True)
class ReversibleDualModalityDecoder(DualModalityDecoder):
    """Reversible quad-stream variant (reference :1489-1655)."""

    def __call__(
        self,
        p,
        video,
        audio,
        *,
        context,
        audio_mask=None,
        video_mask=None,
        context_mask=None,
        key=None,
        reverse=True,
        cp_mesh=None,
        cp_axis="data",
        **_,
    ):
        blocks = self.blocks()
        # adapt the generic schedule to reversible_dual's calling convention:
        # routes reference ctx keys directly; a CP mesh is static config and
        # binds into the video self-attn module (see transformer.BindCP)
        rev_blocks = reversible_dual_blocks(blocks, cp_mesh=cp_mesh, cp_axis=cp_axis)

        ctx = {
            "context": context,
            "context_mask": context_mask,
            "video_mask": video_mask,
            "audio_mask": audio_mask,
        }
        if key is not None:
            keys = jax.random.split(key, len(blocks) * 4)
            for i in range(len(blocks)):
                for s, suffix in enumerate("fgjk"):
                    ctx[f"key{i}{suffix}"] = keys[4 * i + s]

        video, audio = dual_reversible_sequence(
            rev_blocks, p["layers"], video, audio, ctx, reverse=reverse
        )
        norm = StableLayerNorm(self.dim)
        return norm(p["video_norm"], video), norm(p["audio_norm"], audio)
