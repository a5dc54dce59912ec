"""NUWASketch — segmentation-sketch → video.

Parity: reference ``NUWASketch``
(/root/reference/nuwa_pytorch/nuwa_pytorch.py:2297-2571): a separate sketch
VAE (e.g. channels=5) tokenizes sketch frames; a (optionally Sparse3DNA)
encoder embeds them; the causal video decoder uses Sparse3DNA self-attention
and **SparseCross2DNA** cross-attention into the sketch tokens. Frame-level
sketch masks are expanded to token level.

Fix over the reference (SURVEY §7 quirks): condition dropout operates on the
token-level mask actually passed to the decoder (the reference mutates
``sketch_mask`` after it was already expanded, :2553-2563, making cond
dropout a no-op there).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.layers import Embedding, Module, normal_init
from ..ops.embeddings import AxialPositionalEmbedding
from ..ops.sampling import prob_mask_like
from ..transformer import ReversibleTransformer, Transformer
from ..vqgan_vae import VQGanVAE
from .common import ar_decode_loop, model_jit
from .nuwa import cross_entropy

import functools


@dataclass(frozen=True)
class NUWASketch(Module):
    vae: VQGanVAE
    sketch_vae: VQGanVAE
    dim: int
    image_size: int
    max_video_frames: int = 5
    sketch_max_video_frames: int = 2
    sketch_enc_depth: int = 6
    sketch_enc_dim_head: int = 64
    sketch_enc_heads: int = 8
    sketch_enc_use_sparse_3dna: bool = False
    enc_reversible: bool = False
    dec_depth: int = 6
    dec_dim_head: int = 64
    dec_heads: int = 8
    dec_reversible: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    ff_chunk_size: Optional[int] = None
    embed_gradient_frac: float = 0.2
    shift_video_tokens: bool = True
    cross_2dna_kernel_size: int = 3
    cross_2dna_dilation: int | Tuple[int, ...] = 1
    cross_2dna_backend: str = "auto"
    sparse_3dna_kernel_size: int | Tuple[int, int, int] = 3
    sparse_3dna_dilation: int | Tuple[int, ...] = 1
    sparse_3dna_query_num_frames_chunk: Optional[int] = None
    sparse_3dna_use_pallas: bool = False
    compute_dtype: Optional[str] = None

    # ---- derived ----------------------------------------------------------

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype) if self.compute_dtype else None

    @property
    def sketch_fmap_size(self):
        return self.image_size // (2**self.sketch_vae.num_layers)

    @property
    def video_fmap_size(self):
        fs = self.image_size // (2**self.vae.num_layers)
        assert fs == self.sketch_fmap_size, (
            "VAEs must have the same number of layers (equal fmap sizes)"
        )
        return fs

    @property
    def tokens_per_frame(self):
        return self.video_fmap_size**2

    @property
    def video_shape(self):
        fs = self.video_fmap_size
        return (self.max_video_frames, fs, fs)

    @property
    def sketch_shape(self):
        fs = self.sketch_fmap_size
        return (self.sketch_max_video_frames, fs, fs)

    def _dils(self, d):
        return tuple(range(1, d + 1)) if not isinstance(d, (list, tuple)) else tuple(d)

    @property
    def sketch_transformer(self):
        klass = ReversibleTransformer if self.enc_reversible else Transformer
        return klass(
            dim=self.dim,
            depth=self.sketch_enc_depth,
            heads=self.sketch_enc_heads,
            dim_head=self.sketch_enc_dim_head,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            shift_video_tokens=self.shift_video_tokens,
            sparse_3dna_video_shape=self.sketch_shape,
            sparse_3dna_kernel_size=self.sparse_3dna_kernel_size,
            sparse_3dna_dilations=self._dils(self.sparse_3dna_dilation),
            sparse_3dna_query_num_frames_chunk=self.sparse_3dna_query_num_frames_chunk,
            sparse_3dna_attn=self.sketch_enc_use_sparse_3dna,
            sparse_3dna_use_pallas=self.sparse_3dna_use_pallas,
        )

    @property
    def video_transformer(self):
        klass = ReversibleTransformer if self.dec_reversible else Transformer
        return klass(
            dim=self.dim,
            depth=self.dec_depth,
            heads=self.dec_heads,
            dim_head=self.dec_dim_head,
            causal=True,
            cross_attend=True,
            cross_2dna_attn=True,
            cross_2dna_image_size=self.video_fmap_size,
            cross_2dna_kernel_size=self.cross_2dna_kernel_size,
            cross_2dna_dilations=self._dils(self.cross_2dna_dilation),
            cross_2dna_backend=self.cross_2dna_backend,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            ff_chunk_size=self.ff_chunk_size,
            shift_video_tokens=self.shift_video_tokens,
            sparse_3dna_video_shape=self.video_shape,
            sparse_3dna_kernel_size=self.sparse_3dna_kernel_size,
            sparse_3dna_dilations=self._dils(self.sparse_3dna_dilation),
            sparse_3dna_query_num_frames_chunk=self.sparse_3dna_query_num_frames_chunk,
            sparse_3dna_attn=True,
            sparse_3dna_use_pallas=self.sparse_3dna_use_pallas,
        )

    @property
    def _sketch_embedding(self):
        return Embedding(self.sketch_vae.codebook_size, self.dim, self.embed_gradient_frac)

    @property
    def _image_embedding(self):
        return Embedding(self.vae.codebook_size, self.dim, self.embed_gradient_frac)

    # ---- init -------------------------------------------------------------

    def init(self, key, *, vae_params, vae_state, sketch_vae_params, sketch_vae_state):
        ks = jax.random.split(key, 8)
        return {
            "sketch_embedding": self._sketch_embedding.init(ks[0]),
            "sketch_pos_emb": AxialPositionalEmbedding(self.dim, shape=self.sketch_shape).init(ks[1]),
            "sketch_transformer": self.sketch_transformer.init(ks[2]),
            "video_bos": normal_init(ks[3], (self.dim,)),
            "image_embedding": self._image_embedding.init(ks[4]),
            "video_pos_emb": AxialPositionalEmbedding(self.dim, shape=self.video_shape).init(ks[5]),
            "video_transformer": self.video_transformer.init(ks[6]),
            "to_logits": normal_init(ks[7], (self.dim, self.vae.codebook_size), 0.02),
            "vae": {"params": self.vae.eval_params(vae_params), "state": vae_state},
            "sketch_vae": {
                "params": self.sketch_vae.eval_params(sketch_vae_params),
                "state": sketch_vae_state,
            },
        }

    # ---- sketch encoder ---------------------------------------------------

    def embed_sketch(self, p, sketch, mask=None, *, key=None, train=False,
                     cp_mesh=None):
        """sketch: (b, f, c, h, w); mask: (b, f) frame-level."""
        b, frames = sketch.shape[:2]
        indices = jax.lax.stop_gradient(
            self.sketch_vae.get_video_indices(
                p["sketch_vae"]["params"], p["sketch_vae"]["state"], sketch
            )
        ).reshape(b, -1)
        tokens = self._sketch_embedding(p["sketch_embedding"], indices, train=train)
        n = tokens.shape[1]
        pos = AxialPositionalEmbedding(self.dim, shape=self.sketch_shape)(
            p["sketch_pos_emb"]
        )[:n]
        tokens = tokens + pos[None]
        if self._dtype is not None:
            tokens = tokens.astype(self._dtype)

        if mask is not None:
            token_mask = jnp.repeat(mask, n // frames, axis=1)
        else:
            token_mask = jnp.ones((b, n), dtype=bool)

        embeds = self.sketch_transformer(
            p["sketch_transformer"], tokens, mask=token_mask, key=key,
            cp_mesh=cp_mesh,
        )
        return embeds, token_mask

    # ---- decoder ----------------------------------------------------------

    def _decode_logits(self, p, inp, sketch_embeds, context_mask, *, key=None,
                       train=False, cp_mesh=None, pp_mesh=None,
                       pp_microbatches=1, pp_data_axis=None):
        b, n = inp.shape
        emb = self._image_embedding(p["image_embedding"], inp, train=train)
        pos = AxialPositionalEmbedding(self.dim, shape=self.video_shape)(
            p["video_pos_emb"]
        )[:n]
        emb = emb + pos[None]
        bos = jnp.broadcast_to(p["video_bos"], (b, 1, self.dim))
        emb = jnp.concatenate([bos, emb], axis=1)
        if self._dtype is not None:
            emb = emb.astype(self._dtype)
        if pp_mesh is not None:
            if cp_mesh is not None:
                raise ValueError("PP does not compose with CP")
            from ..parallel.pipeline import pipelined_transformer

            out = pipelined_transformer(
                self.video_transformer, p["video_transformer"], emb,
                pp_mesh, num_microbatches=pp_microbatches,
                data_axis=pp_data_axis, context=sketch_embeds,
                context_mask=context_mask, key=key,
            )
        else:
            out = self.video_transformer(
                p["video_transformer"], emb, context=sketch_embeds,
                context_mask=context_mask, key=key, cp_mesh=cp_mesh,
            )
        from ..utils.quantize import dequant

        return jnp.dot(out, dequant(p["to_logits"], out.dtype))

    # ---- training forward -------------------------------------------------

    def forward(
        self,
        p,
        *,
        sketch,
        video,
        sketch_mask=None,
        return_loss=False,
        cond_dropout_prob=0.2,
        key=None,
        train=False,
        cp_mesh=None,
        pp_mesh=None,
        pp_microbatches=1,
        pp_data_axis=None,
    ):
        if sketch.ndim == 4:  # single sketch convenience (:2525-2526)
            sketch = sketch[:, None]
        b, sketch_frames = sketch.shape[:2]
        assert sketch.shape[-1] == self.image_size
        assert sketch_frames <= self.sketch_max_video_frames
        assert video.shape[1] == self.max_video_frames, (
            "full video frames required during training"
        )

        skey = dkey = ckey = None
        if key is not None:
            skey, dkey, ckey = jax.random.split(key, 3)

        sketch_embeds, context_mask = self.embed_sketch(
            p, sketch, mask=sketch_mask, key=skey, train=train,
            cp_mesh=cp_mesh,
        )

        frame_indices = jax.lax.stop_gradient(
            self.vae.get_video_indices(p["vae"]["params"], p["vae"]["state"], video)
        ).reshape(b, -1)
        inp = frame_indices[:, :-1] if return_loss else frame_indices

        if train and cond_dropout_prob > 0 and ckey is not None:
            uncond = prob_mask_like(ckey, (b,), cond_dropout_prob)
            context_mask = context_mask & ~uncond[:, None]

        logits = self._decode_logits(
            p, inp, sketch_embeds, context_mask, key=dkey, train=train,
            cp_mesh=cp_mesh, pp_mesh=pp_mesh,
            pp_microbatches=pp_microbatches, pp_data_axis=pp_data_axis,
        )
        if not return_loss:
            return logits
        return cross_entropy(logits, frame_indices)

    __call__ = forward

    # ---- sliding-window long rollout --------------------------------------

    def generate_long(
        self,
        p,
        *,
        sketch,
        key,
        num_frames,
        sketch_mask=None,
        filter_thres=0.9,
        temperature=1.0,
        cond_scale=2.0,
        decode_max_batchsize=10,
        decode_video=True,
        method="cached",
    ):
        """Sliding frame-window rollout past max_video_frames (reference
        :2471-2474). ``method="cached"``: per frame, one vectorized cache
        ``prefill`` over the window then tpf O(depth·Kn) cached steps;
        ``method="full"`` is the reference-style per-token re-forward oracle."""
        if sketch.ndim == 4:
            sketch = sketch[:, None]
        b = sketch.shape[0]
        tpf = self.tokens_per_frame
        maxf = self.max_video_frames
        if num_frames <= maxf:
            return self.generate(
                p, sketch=sketch, key=key, sketch_mask=sketch_mask,
                filter_thres=filter_thres, temperature=temperature,
                cond_scale=cond_scale, num_frames=num_frames,
                decode_video=decode_video,
                decode_max_batchsize=decode_max_batchsize, method=method,
            )

        use_cfg = cond_scale != 1
        prep = model_jit(
            self, ("long_prep", use_cfg),
            lambda: functools.partial(self._long_prep, use_cfg=use_cfg),
        )
        pnv = {k: v for k, v in p.items() if k != "vae"}
        ctx, cmask, pos_emb, sketch_embeds, context_mask = prep(
            pnv, sketch, sketch_mask
        )

        key, sub = jax.random.split(key)
        indices = self.generate(
            p, sketch=sketch, key=sub, sketch_mask=sketch_mask,
            filter_thres=filter_thres, temperature=temperature,
            cond_scale=cond_scale, num_frames=maxf, decode_video=False,
            method=method,
        )

        win = maxf * tpf
        W = (maxf - 1) * tpf

        if method == "cached":
            from .common import long_frame_decoder

            fr = long_frame_decoder(
                self, win, W, b, use_cfg, filter_thres, temperature, cond_scale
            )

            def decode_frame(window, key):
                return fr(
                    p["video_transformer"], p["image_embedding"]["table"],
                    pos_emb, p["video_bos"], p["to_logits"], ctx, cmask,
                    window, key,
                )

        else:
            from ..ops.sampling import gumbel_sample, top_k_filter

            @jax.jit
            def decode_frame(window_prev, key):
                window = jnp.concatenate(
                    [window_prev, jnp.zeros((b, tpf), jnp.int32)], axis=1
                )

                def step(carry, t):
                    window, key = carry
                    key, sub = jax.random.split(key)
                    inp = window[:, : win - 1]
                    i = W + t
                    if use_cfg:
                        logits2 = self._decode_logits(
                            p, jnp.concatenate([inp, inp], axis=0), ctx, cmask
                        )
                        row = jax.lax.dynamic_index_in_dim(logits2, i, 1, keepdims=False)
                        logits = row[b:] + (row[:b] - row[b:]) * cond_scale
                    else:
                        lg = self._decode_logits(p, inp, sketch_embeds, context_mask)
                        logits = jax.lax.dynamic_index_in_dim(lg, i, 1, keepdims=False)
                    filtered = top_k_filter(logits, thres=filter_thres)
                    sample = gumbel_sample(sub, filtered, temperature=temperature)
                    window = window.at[:, i].set(sample.astype(jnp.int32))
                    return (window, key), sample.astype(jnp.int32)

                (window, _), frame = jax.lax.scan(step, (window, key), jnp.arange(tpf))
                return frame.T

        for _ in range(num_frames - maxf):
            key, sub = jax.random.split(key)
            frame = decode_frame(indices[:, -W:], sub)
            indices = jnp.concatenate([indices, frame], axis=1)

        if not decode_video:
            return indices
        return self.vae.codebook_indices_to_video(
            p["vae"]["params"], p["vae"]["state"], indices,
            decode_chunks=decode_max_batchsize,
        )

    # ---- sampling ---------------------------------------------------------

    def generate(
        self,
        p,
        *,
        sketch,
        key,
        sketch_mask=None,
        filter_thres=0.9,
        temperature=1.0,
        cond_scale=2.0,
        num_frames=None,
        decode_max_batchsize=10,
        decode_video=True,
        method="cached",
    ):
        if sketch.ndim == 4:
            sketch = sketch[:, None]
        num_frames = num_frames if num_frames is not None else self.max_video_frames
        assert num_frames <= self.max_video_frames
        total = num_frames * self.tokens_per_frame

        run = model_jit(
            self, ("gen", method, total, filter_thres, temperature, cond_scale),
            lambda: functools.partial(
                self._gen_indices, method=method, total=total,
                filter_thres=filter_thres, temperature=temperature,
                cond_scale=cond_scale,
            ),
        )
        indices = run(
            {k: v for k, v in p.items() if k != "vae"}, sketch, sketch_mask, key
        )
        if not decode_video:
            return indices
        return self.vae.codebook_indices_to_video(
            p["vae"]["params"], p["vae"]["state"], indices,
            decode_chunks=decode_max_batchsize,
        )

    def _long_prep(self, p, sketch, sketch_mask, *, use_cfg):
        """Jitted prep for ``generate_long``: sketch context (CFG-widened) +
        the full video positional-embedding table."""
        sketch_embeds, context_mask = self.embed_sketch(p, sketch, mask=sketch_mask)
        pos_emb = AxialPositionalEmbedding(self.dim, shape=self.video_shape)(
            p["video_pos_emb"]
        )
        if use_cfg:
            ctx = jnp.concatenate([sketch_embeds, sketch_embeds], axis=0)
            cmask = jnp.concatenate(
                [context_mask, jnp.zeros_like(context_mask)], axis=0
            )
        else:
            ctx, cmask = sketch_embeds, context_mask
        return ctx, cmask, pos_emb, sketch_embeds, context_mask

    def _gen_indices(self, p, sketch, sketch_mask, key, *, method, total,
                     filter_thres, temperature, cond_scale):
        """Pure indices rollout — the jitted body of ``generate``."""
        b = sketch.shape[0]
        sketch_embeds, context_mask = self.embed_sketch(p, sketch, mask=sketch_mask)

        if method == "cached":
            from ..decode import TransformerDecoder
            from .common import cached_ar_rollout

            use_cfg = cond_scale != 1
            if use_cfg:
                ctx = jnp.concatenate([sketch_embeds, sketch_embeds], axis=0)
                cmask = jnp.concatenate(
                    [context_mask, jnp.zeros_like(context_mask)], axis=0
                )
                eb = 2 * b
            else:
                ctx, cmask, eb = sketch_embeds, context_mask, b
            dec = TransformerDecoder(self.video_transformer, total_in=total)
            caches = dec.init_cache(p["video_transformer"], eb, ctx, cmask)
            return cached_ar_rollout(
                dec=dec,
                p_transformer=p["video_transformer"],
                caches=caches,
                embed_table=p["image_embedding"]["table"],
                pos_emb=AxialPositionalEmbedding(self.dim, shape=self.video_shape)(
                    p["video_pos_emb"]
                ),
                bos_vec=p["video_bos"],
                to_logits=p["to_logits"],
                batch=b,
                total=total,
                key=key,
                filter_thres=filter_thres,
                temperature=temperature,
                cond_scale=cond_scale,
                dim=self.dim,
            )

        use_cfg = cond_scale != 1
        if use_cfg:
            ctx2 = jnp.concatenate([sketch_embeds, sketch_embeds], axis=0)
            cmask2 = jnp.concatenate(
                [context_mask, jnp.zeros_like(context_mask)], axis=0
            )

        def step_logits(indices, i):
            inp = indices[:, : total - 1] if total > 1 else indices[:, :0]
            if use_cfg:
                logits2 = self._decode_logits(
                    p, jnp.concatenate([inp, inp], axis=0), ctx2, cmask2
                )
                row = jax.lax.dynamic_index_in_dim(logits2, i, axis=1, keepdims=False)
                return row[:b], row[b:]
            logits = self._decode_logits(p, inp, sketch_embeds, context_mask)
            row = jax.lax.dynamic_index_in_dim(logits, i, axis=1, keepdims=False)
            return row, None

        return ar_decode_loop(
            key=key,
            batch=b,
            total_tokens=total,
            step_logits_fn=step_logits,
            filter_thres=filter_thres,
            temperature=temperature,
            cond_scale=cond_scale,
        )
