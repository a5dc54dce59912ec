"""NUWAVideoAudio — text → joint video + audio generation.

Parity: reference ``NUWAVideoAudio``
(/root/reference/nuwa_pytorch/nuwa_pytorch.py:1968-2293): twin
(reversible) dual-modality decoder towers with chunk-aligned cross-modality
attention; separate video/audio heads; combined loss
``video_loss + audio_loss * audio_loss_weight``. ``generate`` alternates one
video frame's tokens then one frame's worth of audio tokens (frame-boundary
modality toggling, :2198-2208) — here expressed as a single ``lax.scan`` over
a precomputed modality schedule (static total length), with CFG as a 2×batch
forward.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.layers import Embedding, Module, normal_init
from ..dual_decoder import DualModalityDecoder, ReversibleDualModalityDecoder
from ..ops.embeddings import AxialPositionalEmbedding, rotary_freqs
from ..ops.sampling import gumbel_sample, prob_mask_like, top_k_filter
from ..utils.quantize import dequant
from ..transformer import ReversibleTransformer, Transformer
from ..vqgan_vae import VQGanVAE
from .common import model_jit
from .nuwa import cross_entropy

import functools


@functools.lru_cache(maxsize=64)
def _va_long_frame_fn(model, b, use_cfg, filter_thres, temperature,
                      cond_scale):
    """Jitted sliding-window dual frame decoder, cached per (model, shapes)
    so repeated ``generate_long`` calls skip retracing (the single-tower
    analogue lives in models/common.py:long_frame_decoder). Traced values
    (params / context) enter as arguments; static config rides the key."""
    from ..decode_dual import DualDecoderCache

    maxf = model.max_video_frames
    vtpf = model.num_video_tokens_per_frame
    atpf = model.num_audio_tokens_per_video_frame
    Wv, Wa = (maxf - 1) * vtpf, (maxf - 1) * atpf
    eb = 2 * b if use_cfg else b
    dec = DualDecoderCache(
        model.video_audio_transformer,
        total_v_in=maxf * vtpf,
        total_a_in=maxf * atpf + 1,
    )

    def widen(x):
        return jnp.concatenate([x, x], axis=0) if use_cfg else x

    def cfg_mix(logits):
        if not use_cfg:
            return logits
        cond, uncond = logits[:b], logits[b:]
        return uncond + (cond - uncond) * cond_scale

    @jax.jit
    def decode_frame(p, ctx, cmask, wv, wa, key):
        """wv: (b, Wv), wa: (b, Wa) prior frames' tokens; decodes the
        window-relative frame maxf-1 of both modalities."""
        ptr = p["video_audio_transformer"]
        vpos_emb = AxialPositionalEmbedding(model.dim, shape=model.video_shape)(
            p["video_pos_emb"]
        )
        apos_emb = model._audio_pos_emb(p["audio_pos_emb"])
        caches = dec.init_cache(ptr, eb, ctx, cmask)
        # video inputs, positions 0..Wv-1: [bos, tok_0..tok_{Wv-2}]
        v_emb = jnp.take(p["image_embedding"]["table"], wv[:, : Wv - 1], axis=0)
        v_emb = v_emb + vpos_emb[: Wv - 1][None]
        v_bos = jnp.broadcast_to(p["video_bos"], (b, 1, model.dim))
        x_v = widen(jnp.concatenate([v_bos, v_emb], axis=1))
        # audio inputs, positions 0..Wa (one ahead: the rollout keeps the
        # audio tower's NEXT-position logits pending)
        a_emb = jnp.take(p["audio_embedding"]["table"], wa, axis=0)
        a_emb = a_emb + apos_emb[:Wa][None]
        a_bos = jnp.broadcast_to(p["audio_bos"], (b, 1, model.dim))
        x_a = widen(jnp.concatenate([a_bos, a_emb], axis=1))

        _, y_a, caches = dec.prefill(ptr, caches, x_v, x_a)
        pending0 = cfg_mix(
            jnp.dot(y_a[:, -1], dequant(p["to_audio_logits"], y_a.dtype))
        )
        vbuf0 = jnp.zeros((b, maxf * vtpf), jnp.int32)
        abuf0 = jnp.zeros((b, maxf * atpf), jnp.int32)
        _, vbuf, abuf = model._dual_frame_rollout(
            p, dec, ptr, caches, pending0, wv[:, -1], vbuf0, abuf0,
            jnp.arange(maxf - 1, maxf), key, b, use_cfg,
            filter_thres, temperature, cond_scale,
        )
        return vbuf[:, Wv:], abuf[:, Wa:]

    return decode_frame


@dataclass(frozen=True)
class NUWAVideoAudio(Module):
    vae: VQGanVAE
    dim: int
    image_size: int
    num_audio_tokens: int
    num_audio_tokens_per_video_frame: int
    audio_tokens_per_timestep: int = 1
    max_video_frames: int = 5
    text_num_tokens: int = 49408
    text_max_seq_len: int = 256
    text_enc_depth: int = 6
    text_enc_dim_head: int = 64
    text_enc_heads: int = 8
    text_rotary_pos_emb: bool = False
    enc_reversible: bool = False
    dec_reversible: bool = True
    dec_depth: int = 6
    dec_dim_head: int = 64
    dec_heads: int = 8
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    ff_chunk_size: Optional[int] = None
    embed_gradient_frac: float = 0.2
    shift_video_tokens: bool = True
    shift_audio_tokens: bool = True
    sparse_3dna_kernel_size: int | Tuple[int, int, int] = 3
    sparse_3dna_query_num_frames_chunk: Optional[int] = None
    sparse_3dna_dilation: int | Tuple[int, ...] = 1
    sparse_3dna_rel_pos_bias: bool = True
    sparse_3dna_use_pallas: bool = False
    sparse_2dna_kernel_size: int = 7
    sparse_2dna_dilation: int | Tuple[int, ...] = 1
    sparse_2dna_rel_pos_bias: bool = True
    sparse_2dna_use_pallas: bool = False
    sparse_2dna_backend: str = "auto"
    audio_loss_weight: float = 1.0
    cross_modality_attn_every: int = 3
    dec_remat: bool = False  # checkpoint each non-reversible decoder block
    # (a memory knob for dec_reversible=False; PP pipelines reversible too)
    compute_dtype: Optional[str] = None

    # ---- derived ----------------------------------------------------------

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype) if self.compute_dtype else None

    @property
    def video_fmap_size(self):
        return self.image_size // (2**self.vae.num_layers)

    @property
    def video_shape(self):
        fs = self.video_fmap_size
        return (self.max_video_frames, fs, fs)

    @property
    def num_video_tokens_per_frame(self):
        return self.video_fmap_size**2

    def _dils(self, d):
        return tuple(range(1, d + 1)) if not isinstance(d, (list, tuple)) else tuple(d)

    @property
    def text_transformer(self):
        klass = ReversibleTransformer if self.enc_reversible else Transformer
        return klass(
            dim=self.dim,
            depth=self.text_enc_depth,
            heads=self.text_enc_heads,
            dim_head=self.text_enc_dim_head,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
        )

    @property
    def video_audio_transformer(self):
        klass = (
            ReversibleDualModalityDecoder if self.dec_reversible else DualModalityDecoder
        )
        return klass(
            dim=self.dim,
            depth=self.dec_depth,
            heads=self.dec_heads,
            dim_head=self.dec_dim_head,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            ff_chunk_size=self.ff_chunk_size,
            audio_tokens_per_timestep=self.audio_tokens_per_timestep,
            shift_audio_tokens=self.shift_audio_tokens,
            shift_video_tokens=self.shift_video_tokens,
            sparse_3dna_video_shape=self.video_shape,
            sparse_3dna_kernel_size=self.sparse_3dna_kernel_size,
            sparse_3dna_dilations=self._dils(self.sparse_3dna_dilation),
            sparse_3dna_query_num_frames_chunk=self.sparse_3dna_query_num_frames_chunk,
            sparse_3dna_rel_pos_bias=self.sparse_3dna_rel_pos_bias,
            sparse_3dna_use_pallas=self.sparse_3dna_use_pallas,
            num_audio_tokens_per_video_frame=self.num_audio_tokens_per_video_frame,
            num_video_tokens_per_frame=self.num_video_tokens_per_frame,
            cross_modality_attn_every=self.cross_modality_attn_every,
            sparse_2dna_kernel_size=self.sparse_2dna_kernel_size,
            sparse_2dna_dilation=self._dils(self.sparse_2dna_dilation),
            sparse_2dna_rel_pos_bias=self.sparse_2dna_rel_pos_bias,
            sparse_2dna_use_pallas=self.sparse_2dna_use_pallas,
            sparse_2dna_backend=self.sparse_2dna_backend,
            remat=self.dec_remat,
        )

    @property
    def _audio_pos_emb(self):
        return AxialPositionalEmbedding(
            self.dim,
            shape=(
                self.num_audio_tokens // self.audio_tokens_per_timestep,
                self.audio_tokens_per_timestep,
            ),
        )

    # ---- init -------------------------------------------------------------

    def init(self, key, *, vae_params, vae_state):
        ks = jax.random.split(key, 12)
        te = Embedding(self.text_num_tokens, self.dim, self.embed_gradient_frac)
        ie = Embedding(self.vae.codebook_size, self.dim, self.embed_gradient_frac)
        ae = Embedding(self.num_audio_tokens, self.dim, self.embed_gradient_frac)
        p = {
            "text_embedding": te.init(ks[0]),
            "text_transformer": self.text_transformer.init(ks[1]),
            "video_bos": normal_init(ks[2], (self.dim,)),
            "image_embedding": ie.init(ks[3]),
            "video_pos_emb": AxialPositionalEmbedding(self.dim, shape=self.video_shape).init(ks[4]),
            "audio_bos": normal_init(ks[5], (self.dim,)),
            "audio_embedding": ae.init(ks[6]),
            "audio_pos_emb": self._audio_pos_emb.init(ks[7]),
            "video_audio_transformer": self.video_audio_transformer.init(ks[8]),
            "to_video_logits": normal_init(ks[9], (self.dim, self.vae.codebook_size), 0.02),
            "to_audio_logits": normal_init(ks[10], (self.dim, self.num_audio_tokens), 0.02),
            "vae": {"params": self.vae.eval_params(vae_params), "state": vae_state},
        }
        if not self.text_rotary_pos_emb:
            p["text_abs_pos_emb"] = Embedding(self.text_max_seq_len, self.dim).init(ks[11])
        return p

    # ---- text encoder -----------------------------------------------------

    def embed_text(self, p, text, mask=None, *, key=None, train=False):
        b, seq_len = text.shape
        assert seq_len <= self.text_max_seq_len
        te = Embedding(self.text_num_tokens, self.dim, self.embed_gradient_frac)
        tokens = te(p["text_embedding"], text, train=train)
        rot = None
        if self.text_rotary_pos_emb:
            rot = rotary_freqs(seq_len, min(32, self.text_enc_dim_head))
        else:
            pos = Embedding(self.text_max_seq_len, self.dim)(
                p["text_abs_pos_emb"], jnp.arange(seq_len)
            )
            tokens = tokens + pos[None]
        if self._dtype is not None:
            tokens = tokens.astype(self._dtype)
        return self.text_transformer(
            p["text_transformer"], tokens, mask=mask, rotary_pos_emb=rot, key=key
        )

    # ---- shared embed + decode --------------------------------------------

    def _embed_video_tokens(self, p, indices, train=False):
        b, n = indices.shape
        ie = Embedding(self.vae.codebook_size, self.dim, self.embed_gradient_frac)
        emb = ie(p["image_embedding"], indices, train=train)
        pos = AxialPositionalEmbedding(self.dim, shape=self.video_shape)(
            p["video_pos_emb"]
        )[:n]
        emb = emb + pos[None]
        bos = jnp.broadcast_to(p["video_bos"], (b, 1, self.dim))
        emb = jnp.concatenate([bos, emb], axis=1)
        return emb.astype(self._dtype) if self._dtype is not None else emb

    def _embed_audio_tokens(self, p, indices, train=False):
        b, n = indices.shape
        ae = Embedding(self.num_audio_tokens, self.dim, self.embed_gradient_frac)
        emb = ae(p["audio_embedding"], indices, train=train)
        pos = self._audio_pos_emb(p["audio_pos_emb"])[:n]
        emb = emb + pos[None]
        bos = jnp.broadcast_to(p["audio_bos"], (b, 1, self.dim))
        emb = jnp.concatenate([bos, emb], axis=1)
        return emb.astype(self._dtype) if self._dtype is not None else emb

    def _decode(
        self, p, video_inp, audio_inp, text_embeds, text_mask, *, key=None,
        train=False, cp_mesh=None, pp_mesh=None, pp_microbatches=1,
        pp_data_axis=None,
    ):
        v = self._embed_video_tokens(p, video_inp, train)
        a = self._embed_audio_tokens(p, audio_inp, train)
        if pp_mesh is not None:
            # GPipe both modality streams over the 'pipe' mesh axis
            # (parallel/pipeline.pipelined_dual_decoder); the reversible
            # quad-stream runtime pipelines intact — the carry becomes the
            # (v1, v2, a1, a2) quad and each stage runs its block slice
            # through the O(1)-memory custom_vjp runner
            if cp_mesh is not None:
                raise ValueError("PP does not compose with CP")
            from ..parallel.pipeline import pipelined_dual_decoder

            v, a = pipelined_dual_decoder(
                self.video_audio_transformer,
                p["video_audio_transformer"],
                v, a, pp_mesh,
                num_microbatches=pp_microbatches,
                data_axis=pp_data_axis,
                context=text_embeds, context_mask=text_mask, key=key,
            )
        else:
            v, a = self.video_audio_transformer(
                p["video_audio_transformer"], v, a,
                context=text_embeds, context_mask=text_mask, key=key,
                cp_mesh=cp_mesh,
            )
        return (
            jnp.dot(v, dequant(p["to_video_logits"], v.dtype)),
            jnp.dot(a, dequant(p["to_audio_logits"], a.dtype)),
        )

    # ---- training forward -------------------------------------------------

    def forward(
        self,
        p,
        *,
        text,
        video,
        audio,
        return_loss=False,
        cond_dropout_prob=0.2,
        key=None,
        train=False,
        cp_mesh=None,
        pp_mesh=None,
        pp_microbatches=1,
        pp_data_axis=None,
    ):
        b = text.shape[0]
        text_mask = text != 0

        tkey = dkey = ckey = None
        if key is not None:
            tkey, dkey, ckey = jax.random.split(key, 3)

        text_embeds = self.embed_text(p, text, text_mask, key=tkey, train=train)

        if jnp.issubdtype(video.dtype, jnp.integer):
            frame_indices = video.reshape(b, -1)
        else:
            assert video.shape[1] == self.max_video_frames
            frame_indices = jax.lax.stop_gradient(
                self.vae.get_video_indices(p["vae"]["params"], p["vae"]["state"], video)
            ).reshape(b, -1)

        video_inp = frame_indices[:, :-1] if return_loss else frame_indices
        audio_inp = audio[:, :-1] if return_loss else audio

        if train and cond_dropout_prob > 0 and ckey is not None:
            uncond = prob_mask_like(ckey, (b,), cond_dropout_prob)
            text_mask = text_mask & ~uncond[:, None]

        video_logits, audio_logits = self._decode(
            p, video_inp, audio_inp, text_embeds, text_mask, key=dkey,
            train=train, cp_mesh=cp_mesh, pp_mesh=pp_mesh,
            pp_microbatches=pp_microbatches, pp_data_axis=pp_data_axis,
        )
        if not return_loss:
            return video_logits, audio_logits

        video_loss = cross_entropy(video_logits, frame_indices)
        audio_loss = cross_entropy(audio_logits, audio)
        return video_loss + audio_loss * self.audio_loss_weight

    __call__ = forward

    # ---- cached sampling --------------------------------------------------

    def _generate_cached(
        self, p, text, b, num_frames, total_v, total_a, key,
        filter_thres, temperature, cond_scale,
    ):
        """Cached dual-tower rollout: one lax.scan over the modality schedule.

        The audio tower steps one input position ahead of audio sampling (its
        logits are carried as ``pending``) so video chunk n always finds the
        audio stream buffered through position n*atpf — see
        tests/test_decode_dual.interleaved_positions for the invariant.
        """
        from ..decode_dual import DualDecoderCache
        from ..ops.sampling import gumbel_sample, top_k_filter

        vtpf = self.num_video_tokens_per_frame
        atpf = self.num_audio_tokens_per_video_frame

        text_mask = text != 0
        text_embeds = self.embed_text(p, text, text_mask)

        use_cfg = cond_scale != 1
        if use_cfg:
            ctx = jnp.concatenate([text_embeds, text_embeds], axis=0)
            cmask = jnp.concatenate([text_mask, jnp.zeros_like(text_mask)], axis=0)
            eb = 2 * b
        else:
            ctx, cmask, eb = text_embeds, text_mask, b

        ptr = p["video_audio_transformer"]
        # +1 audio slot so the final peek-step lands in an unused position
        dec = DualDecoderCache(
            self.video_audio_transformer, total_v_in=total_v, total_a_in=total_a + 1
        )
        caches = dec.init_cache(ptr, eb, ctx, cmask)

        vpos_emb = AxialPositionalEmbedding(self.dim, shape=self.video_shape)(
            p["video_pos_emb"]
        )
        apos_emb = self._audio_pos_emb(p["audio_pos_emb"])
        vtable = p["image_embedding"]["table"]
        atable = p["audio_embedding"]["table"]

        def widen(x):
            return jnp.concatenate([x, x], axis=0) if use_cfg else x

        def cfg_mix(logits):
            if not use_cfg:
                return logits
            cond, uncond = logits[:b], logits[b:]
            return uncond + (cond - uncond) * cond_scale

        def audio_input(pos, prev_tok):
            """Audio-tower input at position ``pos`` (embedding of prev_tok)."""
            bos = jnp.broadcast_to(p["audio_bos"], (b, self.dim))
            emb = jnp.take(atable, prev_tok, axis=0) + jax.lax.dynamic_index_in_dim(
                apos_emb, jnp.maximum(pos - 1, 0), 0, keepdims=False
            )
            return widen(jnp.where(pos == 0, bos, emb))

        # prime the audio tower with its bos (position 0)
        y0, caches = dec.step_audio(ptr, caches, audio_input(0, jnp.zeros((b,), jnp.int32)), jnp.asarray(0))
        pending0 = cfg_mix(jnp.dot(y0, dequant(p["to_audio_logits"], y0.dtype)))

        vbuf0 = jnp.zeros((b, total_v), jnp.int32)
        abuf0 = jnp.zeros((b, total_a), jnp.int32)
        prev0 = jnp.zeros((b,), jnp.int32)
        _, vbuf, abuf = self._dual_frame_rollout(
            p, dec, ptr, caches, pending0, prev0, vbuf0, abuf0,
            jnp.arange(num_frames), key, b, use_cfg,
            filter_thres, temperature, cond_scale,
        )
        return vbuf, abuf

    def _dual_frame_rollout(
        self, p, dec, ptr, caches, pending0, prev_v0, vbuf0, abuf0,
        frame_ids, key, b, use_cfg, filter_thres, temperature, cond_scale,
    ):
        """Per-frame two-phase rollout: an outer scan over ``frame_ids`` with
        an inner video-token scan then an inner audio-token scan. The
        modality schedule is static per frame, so this compiles each tower's
        step exactly once — a per-token ``lax.cond`` between the two tower
        steps would compile both branches inside one fused scan body (~35 min
        through the remote-compile tunnel). PRNG keys split in the same
        global order as the flat schedule, so samples (and the cached-vs-full
        parity tests) stay bit-exact. Shared by ``generate`` (frames
        0..n-1) and ``generate_long`` (one window-relative frame at a time).
        """
        vtpf = self.num_video_tokens_per_frame
        atpf = self.num_audio_tokens_per_video_frame
        vpos_emb = AxialPositionalEmbedding(self.dim, shape=self.video_shape)(
            p["video_pos_emb"]
        )
        apos_emb = self._audio_pos_emb(p["audio_pos_emb"])
        vtable = p["image_embedding"]["table"]
        atable = p["audio_embedding"]["table"]

        def widen(x):
            return jnp.concatenate([x, x], axis=0) if use_cfg else x

        def cfg_mix(logits):
            if not use_cfg:
                return logits
            cond, uncond = logits[:b], logits[b:]
            return uncond + (cond - uncond) * cond_scale

        def audio_input(pos, prev_tok):
            bos = jnp.broadcast_to(p["audio_bos"], (b, self.dim))
            emb = jnp.take(atable, prev_tok, axis=0) + jax.lax.dynamic_index_in_dim(
                apos_emb, jnp.maximum(pos - 1, 0), 0, keepdims=False
            )
            return widen(jnp.where(pos == 0, bos, emb))

        def video_step(carry, i):
            caches, pending, prev_v, vbuf, abuf, key, f = carry
            key, sub = jax.random.split(key)
            vp = f * vtpf + i
            bos = jnp.broadcast_to(p["video_bos"], (b, self.dim))
            emb = jnp.take(vtable, prev_v, axis=0) + jax.lax.dynamic_index_in_dim(
                vpos_emb, jnp.maximum(vp - 1, 0), 0, keepdims=False
            )
            x_i = widen(jnp.where(vp == 0, bos, emb))
            y, caches = dec.step_video(ptr, caches, x_i, vp)
            logits = cfg_mix(jnp.dot(y, dequant(p["to_video_logits"], y.dtype)))
            filtered = top_k_filter(logits, thres=filter_thres)
            sample = gumbel_sample(sub, filtered, temperature=temperature).astype(jnp.int32)
            vbuf = vbuf.at[:, vp].set(sample)
            return (caches, pending, sample, vbuf, abuf, key, f), None

        def audio_step(carry, i):
            caches, pending, prev_v, vbuf, abuf, key, f = carry
            key, sub = jax.random.split(key)
            ap = f * atpf + i
            filtered = top_k_filter(pending, thres=filter_thres)
            sample = gumbel_sample(sub, filtered, temperature=temperature).astype(jnp.int32)
            abuf = abuf.at[:, ap].set(sample)
            # peek-step the next audio input position (embedding of `sample`)
            y, caches = dec.step_audio(ptr, caches, audio_input(ap + 1, sample), ap + 1)
            pending = cfg_mix(jnp.dot(y, dequant(p["to_audio_logits"], y.dtype)))
            return (caches, pending, prev_v, vbuf, abuf, key, f), None

        def frame_step(carry, f):
            caches, pending, prev_v, vbuf, abuf, key = carry
            inner = (caches, pending, prev_v, vbuf, abuf, key, f)
            inner, _ = jax.lax.scan(video_step, inner, jnp.arange(vtpf))
            inner, _ = jax.lax.scan(audio_step, inner, jnp.arange(atpf))
            caches, pending, prev_v, vbuf, abuf, key, _ = inner
            return (caches, pending, prev_v, vbuf, abuf, key), None

        (caches, _, _, vbuf, abuf, _), _ = jax.lax.scan(
            frame_step,
            (caches, pending0, prev_v0, vbuf0, abuf0, key),
            frame_ids,
        )
        return caches, vbuf, abuf

    # ---- sliding-window long rollout --------------------------------------

    def generate_long(
        self,
        p,
        *,
        text,
        key,
        num_frames,
        filter_thres=0.9,
        temperature=1.0,
        cond_scale=2.0,
        decode_max_batchsize=10,
        decode_video=True,
        method="cached",
    ):
        """Generate ``num_frames > max_video_frames`` of joint video+audio
        with a frame-aligned sliding window over BOTH modalities.

        The reference's dual ``generate`` nominally slides its lookback
        (nuwa_pytorch.py:2153-2154) but the guard compares against the
        *requested* total instead of ``max_video_frames`` — rolling past the
        maximum overruns the axial pos-emb table (and the audio side never
        slides at all); this implements the evident intent (the NUWA
        pattern, :1876-1877): each new frame is decoded against the previous
        ``max_video_frames - 1`` frames of video and audio tokens.

        ``method="cached"``: per frame, one joint vectorized ``prefill`` of
        both towers over the window, then vtpf+atpf cached steps.
        ``method="full"`` re-runs the dual decoder per token (oracle).
        """
        b = text.shape[0]
        maxf = self.max_video_frames
        vtpf = self.num_video_tokens_per_frame
        atpf = self.num_audio_tokens_per_video_frame
        if num_frames <= maxf:
            return self.generate(
                p, text=text, key=key, filter_thres=filter_thres,
                temperature=temperature, cond_scale=cond_scale,
                num_frames=num_frames, decode_video=decode_video,
                decode_max_batchsize=decode_max_batchsize, method=method,
            )
        # the sliding window only ever indexes audio positions below
        # maxf * atpf (window-relative), so the table bound does NOT grow
        # with the requested rollout length
        assert maxf * atpf <= self.num_audio_tokens, (
            "audio pos-emb table too small for one window"
        )

        use_cfg = cond_scale != 1
        prep = model_jit(
            self, ("long_prep", use_cfg),
            lambda: functools.partial(self._long_prep, use_cfg=use_cfg),
        )
        text_mask = text != 0
        ctx, cmask, text_embeds = prep(
            {k: v for k, v in p.items() if k != "vae"}, text
        )

        key, sub = jax.random.split(key)
        vidx, aidx = self.generate(
            p, text=text, key=sub, filter_thres=filter_thres,
            temperature=temperature, cond_scale=cond_scale,
            num_frames=maxf, decode_video=False, method=method,
        )

        Wv, Wa = (maxf - 1) * vtpf, (maxf - 1) * atpf

        if method == "cached":
            fr = _va_long_frame_fn(
                self, b, use_cfg, filter_thres, temperature, cond_scale
            )

            def decode_frame(wv, wa, key):
                return fr(p, ctx, cmask, wv, wa, key)

        else:

            @jax.jit
            def decode_frame(wv, wa, key):
                """Full re-forward oracle: per token, run the dual decoder on
                the whole window pair."""
                vwin = jnp.concatenate([wv, jnp.zeros((b, vtpf), jnp.int32)], axis=1)
                awin = jnp.concatenate([wa, jnp.zeros((b, atpf), jnp.int32)], axis=1)

                def logits_at(vwin, awin, vi, ai, want_video):
                    v_inp = vwin[:, : maxf * vtpf - 1]
                    a_inp = awin[:, : maxf * atpf - 1]
                    if use_cfg:
                        vl2, al2 = self._decode(
                            p,
                            jnp.concatenate([v_inp, v_inp], axis=0),
                            jnp.concatenate([a_inp, a_inp], axis=0),
                            ctx, cmask,
                        )
                        if want_video:
                            row = jax.lax.dynamic_index_in_dim(vl2, vi, 1, keepdims=False)
                        else:
                            row = jax.lax.dynamic_index_in_dim(al2, ai, 1, keepdims=False)
                        return row[b:] + (row[:b] - row[b:]) * cond_scale
                    vl, al = self._decode(p, v_inp, a_inp, text_embeds, text_mask)
                    if want_video:
                        return jax.lax.dynamic_index_in_dim(vl, vi, 1, keepdims=False)
                    return jax.lax.dynamic_index_in_dim(al, ai, 1, keepdims=False)

                def video_step(carry, t):
                    vwin, awin, key = carry
                    key, sub = jax.random.split(key)
                    logits = logits_at(vwin, awin, Wv + t, 0, True)
                    filtered = top_k_filter(logits, thres=filter_thres)
                    sample = gumbel_sample(sub, filtered, temperature=temperature)
                    vwin = vwin.at[:, Wv + t].set(sample.astype(jnp.int32))
                    return (vwin, awin, key), None

                def audio_step(carry, t):
                    vwin, awin, key = carry
                    key, sub = jax.random.split(key)
                    logits = logits_at(vwin, awin, 0, Wa + t, False)
                    filtered = top_k_filter(logits, thres=filter_thres)
                    sample = gumbel_sample(sub, filtered, temperature=temperature)
                    awin = awin.at[:, Wa + t].set(sample.astype(jnp.int32))
                    return (vwin, awin, key), None

                carry = (vwin, awin, key)
                carry, _ = jax.lax.scan(video_step, carry, jnp.arange(vtpf))
                carry, _ = jax.lax.scan(audio_step, carry, jnp.arange(atpf))
                vwin, awin, _ = carry
                return vwin[:, Wv:], awin[:, Wa:]

        for _ in range(num_frames - maxf):
            key, sub = jax.random.split(key)
            vfr, afr = decode_frame(vidx[:, -Wv:], aidx[:, -Wa:], sub)
            vidx = jnp.concatenate([vidx, vfr], axis=1)
            aidx = jnp.concatenate([aidx, afr], axis=1)

        if not decode_video:
            return vidx, aidx
        video = self.vae.codebook_indices_to_video(
            p["vae"]["params"], p["vae"]["state"], vidx,
            decode_chunks=decode_max_batchsize,
        )
        return video, aidx

    # ---- sampling ---------------------------------------------------------

    def generate(
        self,
        p,
        *,
        text,
        key,
        filter_thres=0.9,
        temperature=1.0,
        cond_scale=2.0,
        num_frames=None,
        decode_max_batchsize=10,
        decode_video=True,
        method="cached",
    ):
        num_frames = num_frames if num_frames is not None else self.max_video_frames
        assert num_frames <= self.max_video_frames

        run = model_jit(
            self,
            ("gen", method, num_frames, filter_thres, temperature, cond_scale),
            lambda: functools.partial(
                self._gen_indices, method=method, num_frames=num_frames,
                filter_thres=filter_thres, temperature=temperature,
                cond_scale=cond_scale,
            ),
        )
        video_indices, audio_indices = run(
            {k: v for k, v in p.items() if k != "vae"}, text, key
        )
        if not decode_video:
            return video_indices, audio_indices
        video = self.vae.codebook_indices_to_video(
            p["vae"]["params"], p["vae"]["state"], video_indices,
            decode_chunks=decode_max_batchsize,
        )
        return video, audio_indices

    def _long_prep(self, p, text, *, use_cfg):
        """Jitted prep for ``generate_long``: text context, CFG-widened."""
        text_mask = text != 0
        text_embeds = self.embed_text(p, text, text_mask)
        if use_cfg:
            ctx = jnp.concatenate([text_embeds, text_embeds], axis=0)
            cmask = jnp.concatenate(
                [text_mask, jnp.zeros_like(text_mask)], axis=0
            )
        else:
            ctx, cmask = text_embeds, text_mask
        return ctx, cmask, text_embeds

    def _gen_indices(self, p, text, key, *, method, num_frames, filter_thres,
                     temperature, cond_scale):
        """Pure joint indices rollout — the jitted body of ``generate``."""
        b = text.shape[0]
        vtpf = self.num_video_tokens_per_frame
        atpf = self.num_audio_tokens_per_video_frame
        total_v = num_frames * vtpf
        total_a = num_frames * atpf
        total = total_v + total_a

        if method == "cached":
            return self._generate_cached(
                p, text, b, num_frames, total_v, total_a, key,
                filter_thres, temperature, cond_scale,
            )

        # static modality schedule: one video frame's tokens, then one audio
        # frame's tokens, alternating (reference :2142-2208)
        sched, vpos, apos = [], [], []
        vc = ac = 0
        for _ in range(num_frames):
            for _ in range(vtpf):
                sched.append(0)
                vpos.append(vc)
                apos.append(ac)
                vc += 1
            for _ in range(atpf):
                sched.append(1)
                vpos.append(vc)
                apos.append(ac)
                ac += 1
        sched = jnp.asarray(np.array(sched), jnp.int32)
        vpos = jnp.asarray(np.array(vpos), jnp.int32)
        apos = jnp.asarray(np.array(apos), jnp.int32)

        text_mask = text != 0
        text_embeds = self.embed_text(p, text, text_mask)

        use_cfg = cond_scale != 1
        if use_cfg:
            ctx2 = jnp.concatenate([text_embeds, text_embeds], axis=0)
            cmask2 = jnp.concatenate([text_mask, jnp.zeros_like(text_mask)], axis=0)

        pad_vocab = max(self.vae.codebook_size, self.num_audio_tokens)

        def step(carry, i):
            vbuf, abuf, key = carry
            key, sub = jax.random.split(key)
            v_inp = vbuf[:, : total_v - 1] if total_v > 1 else vbuf[:, :0]
            a_inp = abuf[:, : total_a - 1] if total_a > 1 else abuf[:, :0]

            if use_cfg:
                vl2, al2 = self._decode(
                    p,
                    jnp.concatenate([v_inp, v_inp], axis=0),
                    jnp.concatenate([a_inp, a_inp], axis=0),
                    ctx2,
                    cmask2,
                )
                vi, ai = vpos[i], apos[i]
                vrow = jax.lax.dynamic_index_in_dim(vl2, vi, axis=1, keepdims=False)
                arow = jax.lax.dynamic_index_in_dim(al2, ai, axis=1, keepdims=False)
                v_logits = vrow[b:] + (vrow[:b] - vrow[b:]) * cond_scale
                a_logits = arow[b:] + (arow[:b] - arow[b:]) * cond_scale
            else:
                vl, al = self._decode(p, v_inp, a_inp, text_embeds, text_mask)
                v_logits = jax.lax.dynamic_index_in_dim(vl, vpos[i], axis=1, keepdims=False)
                a_logits = jax.lax.dynamic_index_in_dim(al, apos[i], axis=1, keepdims=False)

            def pad_to(logits, size):
                return jnp.pad(
                    logits, ((0, 0), (0, size - logits.shape[-1])),
                    constant_values=-jnp.inf,
                )

            is_video = sched[i] == 0
            # top-k must be taken over each modality's own (unpadded) vocab —
            # k is derived from the logits width, so filtering after padding
            # would keep pad_vocab/own_vocab times too many entries for the
            # smaller modality (the cached path filters per-branch too).
            filtered = jnp.where(
                is_video,
                pad_to(top_k_filter(v_logits, thres=filter_thres), pad_vocab),
                pad_to(top_k_filter(a_logits, thres=filter_thres), pad_vocab),
            )
            sample = gumbel_sample(sub, filtered, temperature=temperature).astype(jnp.int32)

            # write the sample into the active modality's buffer; the inactive
            # buffer's slot is rewritten with its own (clamped-read) value —
            # a no-op. Out-of-bounds scatters (past the final slot) are
            # dropped by JAX scatter semantics.
            vbuf = vbuf.at[:, vpos[i]].set(jnp.where(is_video, sample, vbuf[:, vpos[i]]))
            abuf = abuf.at[:, apos[i]].set(jnp.where(is_video, abuf[:, apos[i]], sample))
            return (vbuf, abuf, key), None

        vbuf0 = jnp.zeros((b, total_v), jnp.int32)
        abuf0 = jnp.zeros((b, total_a), jnp.int32)
        (video_indices, audio_indices, _), _ = jax.lax.scan(
            step, (vbuf0, abuf0, key), jnp.arange(total)
        )
        return video_indices, audio_indices
