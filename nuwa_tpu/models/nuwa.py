"""NUWA — text → video autoregressive model.

Parity: reference ``NUWA`` (/root/reference/nuwa_pytorch/nuwa_pytorch.py:1723-1964):
rotary/absolute text encoder, frozen-VAE video tokenization, axial positional
embeddings, learned <bos>, causal Sparse3DNA decoder with dense cross
attention to text, condition dropout for classifier-free guidance, and
``generate`` with top-k + gumbel sampling and CFG.

Functional layout: the model config is static; ``init`` returns the trainable
params; the frozen VAE's (params, state) are carried under ``params["vae"]``
(stop-gradient at use — the reference's ``vae.copy_for_eval()`` embedding,
:1757). ``generate`` runs as a jitted ``lax.scan``.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.layers import Embedding, Module, normal_init
from ..ops.embeddings import AxialPositionalEmbedding, rotary_freqs
from ..ops.sampling import prob_mask_like
from ..transformer import ReversibleTransformer, Transformer
from ..vqgan_vae import VQGanVAE
from .common import (
    ar_decode_loop, cached_ar_rollout, long_frame_decoder, model_jit,
)

import functools


@functools.lru_cache(maxsize=64)
def _long_frame_full_fn(model, win, W, b, use_cfg, filter_thres, temperature,
                        cond_scale):
    """Jitted reference-style full-re-forward frame decoder (the sliding
    window oracle), cached per (model, shapes) like ``long_frame_decoder``
    so repeated/timed calls skip retracing."""
    from ..ops.sampling import gumbel_sample, top_k_filter

    tpf = model.tokens_per_frame

    @jax.jit
    def decode_frame(p, ctx, cmask, window_prev, key):
        """window_prev: (b, W) prior tokens; re-runs the full decoder per
        token (reference nuwa_pytorch.py:1874-1908 pattern)."""
        window = jnp.concatenate(
            [window_prev, jnp.zeros((b, tpf), jnp.int32)], axis=1
        )

        def step(carry, t):
            window, key = carry
            key, sub = jax.random.split(key)
            inp = window[:, : win - 1]
            i = W + t
            if use_cfg:
                logits2 = model._decode_logits(
                    p, jnp.concatenate([inp, inp], axis=0), ctx, cmask
                )
                row = jax.lax.dynamic_index_in_dim(logits2, i, 1, keepdims=False)
                logits = row[b:] + (row[:b] - row[b:]) * cond_scale
            else:
                lg = model._decode_logits(p, inp, ctx, cmask)
                logits = jax.lax.dynamic_index_in_dim(lg, i, 1, keepdims=False)
            filtered = top_k_filter(logits, thres=filter_thres)
            sample = gumbel_sample(sub, filtered, temperature=temperature)
            window = window.at[:, i].set(sample.astype(jnp.int32))
            return (window, key), sample.astype(jnp.int32)

        (window, _), frame = jax.lax.scan(step, (window, key), jnp.arange(tpf))
        return frame.T  # (b, tpf)

    return decode_frame


def cross_entropy(logits, targets):
    """Mean token cross-entropy (fp32)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


@dataclass(frozen=True)
class NUWA(Module):
    dim: int
    vae: Optional[VQGanVAE] = None
    image_size: Optional[int] = None
    max_video_frames: int = 5
    text_num_tokens: int = 49408
    text_max_seq_len: int = 256
    text_enc_depth: int = 6
    text_enc_dim_head: int = 64
    text_enc_heads: int = 8
    text_rotary_pos_emb: bool = True
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
    sparse_3dna_kernel_size: int | Tuple[int, int, int] = 3
    sparse_3dna_query_num_frames_chunk: Optional[int] = None
    sparse_3dna_dilation: int | Tuple[int, ...] = 1
    sparse_3dna_rel_pos_bias: bool = False
    sparse_3dna_use_pallas: bool = False
    sparse_3dna_backend: str = "auto"
    num_image_tokens: Optional[int] = None  # required when vae is None
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" — activations dtype

    # ---- derived ----------------------------------------------------------

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype) if self.compute_dtype else None

    @property
    def _image_size(self):
        assert (self.vae is not None) ^ (self.image_size is not None), (
            "either VAE or image size must be specified"
        )
        return self.vae.image_size if self.vae is not None else self.image_size

    @property
    def codebook_size(self):
        if self.vae is not None:
            return self.vae.codebook_size
        assert self.num_image_tokens is not None
        return self.num_image_tokens

    @property
    def video_fmap_size(self):
        if self.vae is not None:
            return self.vae.fmap_size
        return self._image_size  # treated as the raw fmap size when no VAE

    @property
    def video_shape(self):
        fs = self.video_fmap_size
        return (self.max_video_frames, fs, fs)

    @property
    def tokens_per_frame(self):
        return self.video_fmap_size**2

    @property
    def max_video_tokens(self):
        return self.max_video_frames * self.tokens_per_frame

    @property
    def dilations(self):
        d = self.sparse_3dna_dilation
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
            rotary_pos_emb=self.text_rotary_pos_emb,
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
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            ff_chunk_size=self.ff_chunk_size,
            shift_video_tokens=self.shift_video_tokens,
            sparse_3dna_video_shape=self.video_shape,
            sparse_3dna_attn=True,
            sparse_3dna_kernel_size=self.sparse_3dna_kernel_size,
            sparse_3dna_dilations=self.dilations,
            sparse_3dna_query_num_frames_chunk=self.sparse_3dna_query_num_frames_chunk,
            sparse_3dna_rel_pos_bias=self.sparse_3dna_rel_pos_bias,
            sparse_3dna_use_pallas=self.sparse_3dna_use_pallas,
            sparse_3dna_backend=self.sparse_3dna_backend,
        )

    @property
    def _text_embedding(self):
        return Embedding(self.text_num_tokens, self.dim, self.embed_gradient_frac)

    @property
    def _image_embedding(self):
        return Embedding(self.codebook_size, self.dim, self.embed_gradient_frac)

    @property
    def _video_pos_emb(self):
        return AxialPositionalEmbedding(self.dim, shape=self.video_shape)

    # ---- init -------------------------------------------------------------

    def init(self, key, *, vae_params=None, vae_state=None):
        ks = jax.random.split(key, 8)
        p = {
            "text_embedding": self._text_embedding.init(ks[0]),
            "text_transformer": self.text_transformer.init(ks[1]),
            "video_bos": normal_init(ks[2], (self.dim,)),
            "image_embedding": self._image_embedding.init(ks[3]),
            "video_pos_emb": self._video_pos_emb.init(ks[4]),
            "video_transformer": self.video_transformer.init(ks[5]),
            "to_logits": normal_init(ks[6], (self.dim, self.codebook_size), 0.02),
        }
        if not self.text_rotary_pos_emb:
            p["text_abs_pos_emb"] = Embedding(self.text_max_seq_len, self.dim).init(ks[7])
        if self.vae is not None:
            assert vae_params is not None and vae_state is not None, (
                "pass the trained VAE params/state (frozen copy, reference :1757)"
            )
            p["vae"] = {
                "params": self.vae.eval_params(vae_params),
                "state": vae_state,
            }
        return p

    # ---- text encoder -----------------------------------------------------

    def embed_text(self, p, text, mask=None, *, key=None, train=False):
        b, seq_len = text.shape
        assert seq_len <= self.text_max_seq_len
        tokens = self._text_embedding(p["text_embedding"], text, train=train)
        if self._dtype is not None:
            tokens = tokens.astype(self._dtype)
        rot = None
        if self.text_rotary_pos_emb:
            rot = rotary_freqs(seq_len, min(32, self.text_enc_dim_head))
        else:
            pos = Embedding(self.text_max_seq_len, self.dim)(
                p["text_abs_pos_emb"], jnp.arange(seq_len)
            )
            tokens = tokens + pos[None]
        return self.text_transformer(
            p["text_transformer"], tokens, mask=mask, rotary_pos_emb=rot, key=key
        )

    # ---- decoder core -----------------------------------------------------

    def _decode_logits(
        self, p, frame_indices_input, text_embeds, text_mask, *, key=None,
        train=False, cp_mesh=None, pp_mesh=None, pp_microbatches=1,
        pp_data_axis=None,
    ):
        """frame_indices_input: (b, n) already teacher-force shifted."""
        b, n = frame_indices_input.shape
        emb = self._image_embedding(p["image_embedding"], frame_indices_input, train=train)
        pos = self._video_pos_emb(p["video_pos_emb"])[:n]
        emb = emb + pos[None]
        bos = jnp.broadcast_to(p["video_bos"], (b, 1, self.dim))
        emb = jnp.concatenate([bos, emb], axis=1)
        if self._dtype is not None:
            emb = emb.astype(self._dtype)
        if pp_mesh is not None:
            # GPipe over the 'pipe' mesh axis (parallel/pipeline.py);
            # reversible stacks pipeline with their O(1)-memory runtime
            # intact (the carry becomes the (x1, x2) stream pair)
            if cp_mesh is not None:
                raise ValueError("PP does not compose with CP")
            from ..parallel.pipeline import pipelined_transformer

            out = pipelined_transformer(
                self.video_transformer,
                p["video_transformer"],
                emb,
                pp_mesh,
                num_microbatches=pp_microbatches,
                data_axis=pp_data_axis,
                context=text_embeds,
                context_mask=text_mask,
                key=key,
            )
        else:
            out = self.video_transformer(
                p["video_transformer"],
                emb,
                context=text_embeds,
                context_mask=text_mask,
                key=key,
                cp_mesh=cp_mesh,
            )
        # logits matmul in the compute dtype (vocab dim is the big one);
        # cross_entropy upcasts to fp32 before the softmax
        from ..utils.quantize import dequant

        return jnp.dot(out, dequant(p["to_logits"], out.dtype))

    # ---- training forward -------------------------------------------------

    def forward(
        self,
        p,
        *,
        text,
        video,
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
            assert video.shape[1] == self.max_video_frames, (
                "full video frames required during training (reference :1933)"
            )
            assert self.vae is not None
            frame_indices = jax.lax.stop_gradient(
                self.vae.get_video_indices(
                    jax.tree.map(jax.lax.stop_gradient, p["vae"]["params"]),
                    p["vae"]["state"],
                    video,
                )
            ).reshape(b, -1)

        inp = frame_indices[:, :-1] if return_loss else frame_indices

        if train and cond_dropout_prob > 0 and ckey is not None:
            uncond = prob_mask_like(ckey, (b,), cond_dropout_prob)
            text_mask = text_mask & ~uncond[:, None]

        logits = self._decode_logits(
            p, inp, text_embeds, text_mask, key=dkey, train=train,
            cp_mesh=cp_mesh, pp_mesh=pp_mesh, pp_microbatches=pp_microbatches,
            pp_data_axis=pp_data_axis,
        )
        if not return_loss:
            return logits
        return cross_entropy(logits, frame_indices)

    __call__ = forward

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
        """AR sampling, fully on-device (`lax.scan`).

        ``method="cached"`` uses per-layer KV/neighborhood/shift caches —
        O(depth·Kn) per token (nuwa_tpu.decode); ``method="full"`` re-runs the
        whole decoder per token (the reference's pattern, used as the oracle).
        Supports num_frames <= max_video_frames. The whole indices rollout is
        jitted once per (method, shapes) via ``model_jit`` — repeat calls are
        a single cached dispatch, no re-trace.
        """
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
        indices = run({k: v for k, v in p.items() if k != "vae"}, text, key)

        if not decode_video or self.vae is None:
            return indices
        return self.vae.codebook_indices_to_video(
            p["vae"]["params"], p["vae"]["state"], indices,
            decode_chunks=decode_max_batchsize,
        )

    def _long_prep(self, p, text, *, use_cfg):
        """Jitted prep for ``generate_long``: text context (CFG-widened) +
        the full video positional-embedding table."""
        text_mask = text != 0
        text_embeds = self.embed_text(p, text, text_mask)
        pos_emb = self._video_pos_emb(p["video_pos_emb"])
        if use_cfg:
            ctx = jnp.concatenate([text_embeds, text_embeds], axis=0)
            cmask = jnp.concatenate(
                [text_mask, jnp.zeros_like(text_mask)], axis=0
            )
        else:
            ctx, cmask = text_embeds, text_mask
        return ctx, cmask, pos_emb

    def _gen_indices(self, p, text, key, *, method, total, filter_thres,
                     temperature, cond_scale):
        """Pure indices rollout (no VAE decode) — the jitted body of
        ``generate``."""
        b = text.shape[0]
        text_mask = text != 0
        text_embeds = self.embed_text(p, text, text_mask)

        if method == "cached":
            return self._generate_cached(
                p, text_embeds, text_mask, b, total, key,
                filter_thres, temperature, cond_scale,
            )

        use_cfg = cond_scale != 1
        if use_cfg:
            ctx2 = jnp.concatenate([text_embeds, text_embeds], axis=0)
            cmask2 = jnp.concatenate(
                [text_mask, jnp.zeros_like(text_mask)], axis=0
            )

        def step_logits(indices, i):
            inp = indices[:, : total - 1] if total > 1 else indices[:, :0]
            if use_cfg:
                logits2 = self._decode_logits(
                    p, jnp.concatenate([inp, inp], axis=0), ctx2, cmask2
                )
                row = jax.lax.dynamic_index_in_dim(logits2, i, axis=1, keepdims=False)
                return row[:b], row[b:]
            logits = self._decode_logits(p, inp, text_embeds, text_mask)
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
        """Generate ``num_frames > max_video_frames`` with the reference's
        sliding frame window (nuwa_pytorch.py:1874-1877): once the buffer is
        full, each new frame is decoded against the last max_video_frames-1
        frames.

        ``method="cached"``: per frame, one vectorized ``prefill`` re-primes
        fresh caches over the window (O(window) once), then tpf cached steps
        at O(depth·Kn) each — cached-level throughput instead of the full
        re-forward per token. ``method="full"`` re-runs the whole decoder per
        token (the reference's pattern; kept as the parity oracle).
        """
        b = text.shape[0]
        tpf = self.tokens_per_frame
        maxf = self.max_video_frames
        if num_frames <= maxf:
            return self.generate(
                p, text=text, key=key, filter_thres=filter_thres,
                temperature=temperature, cond_scale=cond_scale,
                num_frames=num_frames, decode_video=decode_video,
                decode_max_batchsize=decode_max_batchsize, method=method,
            )

        use_cfg = cond_scale != 1
        prep = model_jit(
            self, ("long_prep", use_cfg),
            lambda: functools.partial(self._long_prep, use_cfg=use_cfg),
        )
        pnv = {k: v for k, v in p.items() if k != "vae"}
        ctx, cmask, pos_emb = prep(pnv, text)

        # first maxf frames with the standard path
        key, sub = jax.random.split(key)
        indices = self.generate(
            p, text=text, key=sub, filter_thres=filter_thres,
            temperature=temperature, cond_scale=cond_scale,
            num_frames=maxf, decode_video=False, method=method,
        )

        win = maxf * tpf  # window = (maxf-1) prior frames + current frame
        W = (maxf - 1) * tpf

        if method == "cached":
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
            fr_full = _long_frame_full_fn(
                self, win, W, b, use_cfg, filter_thres, temperature, cond_scale
            )

            def decode_frame(window, key):
                return fr_full(p, ctx, cmask, window, key)

        for _ in range(num_frames - maxf):
            key, sub = jax.random.split(key)
            frame = decode_frame(indices[:, -W:], sub)
            indices = jnp.concatenate([indices, frame], axis=1)

        if not decode_video or self.vae is None:
            return indices
        return self.vae.codebook_indices_to_video(
            p["vae"]["params"], p["vae"]["state"], indices,
            decode_chunks=decode_max_batchsize,
        )

    # ---- cached incremental decoding --------------------------------------

    def _generate_cached(
        self, p, text_embeds, text_mask, b, total, key,
        filter_thres, temperature, cond_scale,
    ):
        from ..decode import TransformerDecoder

        use_cfg = cond_scale != 1
        if use_cfg:
            ctx = jnp.concatenate([text_embeds, text_embeds], axis=0)
            cmask = jnp.concatenate([text_mask, jnp.zeros_like(text_mask)], axis=0)
            eb = 2 * b
        else:
            ctx, cmask, eb = text_embeds, text_mask, b

        dec = TransformerDecoder(self.video_transformer, total_in=total)
        cache_dtype = self._dtype if self._dtype is not None else jnp.float32
        caches = dec.init_cache(p["video_transformer"], eb, ctx, cmask, dtype=cache_dtype)
        return cached_ar_rollout(
            dec=dec,
            p_transformer=p["video_transformer"],
            caches=caches,
            embed_table=p["image_embedding"]["table"],
            pos_emb=self._video_pos_emb(p["video_pos_emb"]),
            bos_vec=p["video_bos"],
            to_logits=p["to_logits"],
            batch=b,
            total=total,
            key=key,
            filter_thres=filter_thres,
            temperature=temperature,
            cond_scale=cond_scale,
            dim=self.dim,
            dtype=self._dtype,
        )
