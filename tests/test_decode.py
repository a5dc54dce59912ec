"""Cached incremental decoding vs the full-forward oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuwa_tpu.decode import TransformerDecoder
from nuwa_tpu.models import NUWA
from nuwa_tpu.vqgan_vae import VQGanVAE

KEY = jax.random.PRNGKey(0)


def tiny_nuwa(**kw):
    cfg = dict(
        dim=16,
        image_size=2,  # fmap mode, 4 tokens/frame
        num_image_tokens=16,
        max_video_frames=3,
        text_num_tokens=32,
        text_enc_depth=1,
        text_enc_dim_head=8,
        text_enc_heads=2,
        dec_depth=2,
        dec_dim_head=8,
        dec_heads=2,
        shift_video_tokens=False,
    )
    cfg.update(kw)
    return NUWA(**cfg)


def cached_teacher_forced_logits(model, p, indices, text_embeds, text_mask):
    """Feed ground-truth tokens through the cached decoder step by step."""
    b, n = indices.shape
    total_in = n  # bos + tokens[:-1]
    dec = TransformerDecoder(model.video_transformer, total_in=total_in)
    caches = dec.init_cache(p["video_transformer"], b, text_embeds, text_mask)
    pos_emb = model._video_pos_emb(p["video_pos_emb"])
    table = p["image_embedding"]["table"]

    logits_rows = []
    for i in range(total_in):
        if i == 0:
            x_i = jnp.broadcast_to(p["video_bos"], (b, model.dim))
        else:
            x_i = jnp.take(table, indices[:, i - 1], axis=0) + pos_emb[i - 1]
        y, caches = dec.step(p["video_transformer"], caches, x_i, jnp.asarray(i))
        logits_rows.append(jnp.dot(y, p["to_logits"]))
    return jnp.stack(logits_rows, axis=1)  # (b, n, V)


def _compare_model(model, seed=0, atol=1e-4):
    p = model.init(jax.random.PRNGKey(seed))
    b, n = 2, model.max_video_tokens
    text = jnp.array([[1, 2, 3, 0], [5, 6, 0, 0]])
    text_mask = text != 0
    indices = jax.random.randint(jax.random.PRNGKey(seed + 1), (b, n), 0, 16)

    text_embeds = model.embed_text(p, text, text_mask)
    full = model._decode_logits(p, indices[:, :-1], text_embeds, text_mask)
    cached = cached_teacher_forced_logits(model, p, indices, text_embeds, text_mask)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full), atol=atol, rtol=1e-3)


def test_cached_matches_full_dense():
    # dense-attention decoder: replace sparse with dense via a Transformer
    # that has sparse turned off — NUWA always uses sparse 3DNA, so exercise
    # dense self-attn through a direct TransformerDecoder comparison instead.
    from nuwa_tpu.transformer import Transformer

    t = Transformer(dim=16, depth=2, heads=2, dim_head=8, causal=True,
                    cross_attend=True)
    p = t.init(KEY)
    b, n = 2, 7
    x = jax.random.normal(KEY, (b, n, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 5, 16))
    cmask = jnp.array([[True] * 5, [True, True, True, False, False]])

    full = t(p, x, context=ctx, context_mask=cmask)

    dec = TransformerDecoder(t, total_in=n)
    caches = dec.init_cache(p, b, ctx, cmask)
    outs = []
    for i in range(n):
        y, caches = dec.step(p, caches, x[:, i], jnp.asarray(i))
        outs.append(y)
    cached = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full), atol=1e-4, rtol=1e-3)


def test_cached_matches_full_sparse3dna():
    _compare_model(tiny_nuwa())


def test_cached_matches_full_with_shift_and_bias():
    _compare_model(
        tiny_nuwa(
            shift_video_tokens=True,
            sparse_3dna_rel_pos_bias=True,
            sparse_3dna_dilation=2,
            dec_depth=2,
        )
    )


def test_cached_matches_full_reversible():
    _compare_model(tiny_nuwa(dec_reversible=True))


def test_generate_cached_equals_full():
    model = tiny_nuwa(max_video_frames=2)
    p = model.init(KEY)
    text = jnp.array([[1, 2, 3, 0]])
    kw = dict(text=text, key=KEY, decode_video=False, cond_scale=2.0,
              temperature=1e-6, filter_thres=0.95)
    i_full = model.generate(p, method="full", **kw)
    i_cached = model.generate(p, method="cached", **kw)
    np.testing.assert_array_equal(np.asarray(i_full), np.asarray(i_cached))


def test_generate_cached_with_vae():
    vae = VQGanVAE(
        dim=8, image_size=8, num_layers=2, vq_codebook_size=16, vq_codebook_dim=8,
        resnet_groups=4, use_vgg_and_gan=False, vq_kmeans_init=False,
        use_attn=False, num_resnet_blocks=0,
    )
    vp, vs = vae.init(KEY), vae.init_state(KEY)
    model = NUWA(
        dim=16, vae=vae, max_video_frames=2, text_num_tokens=32,
        text_enc_depth=1, text_enc_dim_head=8, text_enc_heads=2,
        dec_depth=1, dec_dim_head=8, dec_heads=2,
    )
    p = model.init(KEY, vae_params=vp, vae_state=vs)
    video = model.generate(p, text=jnp.array([[1, 2, 0]]), key=KEY, method="cached")
    assert video.shape == (1, 2, 3, 8, 8)
    assert np.isfinite(np.asarray(video)).all()


def test_generate_cached_bf16():
    model = tiny_nuwa(max_video_frames=2, compute_dtype="bfloat16")
    p = model.init(KEY)
    text = jnp.array([[1, 2, 3, 0]])
    idx = model.generate(p, text=text, key=KEY, decode_video=False, cond_scale=2.0)
    assert idx.shape == (1, 2 * model.tokens_per_frame)
    assert int(jnp.max(idx)) < model.codebook_size
