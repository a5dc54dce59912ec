import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuwa_tpu.dual_decoder import DualModalityDecoder, ReversibleDualModalityDecoder
from nuwa_tpu.transformer import ReversibleTransformer, Transformer

KEY = jax.random.PRNGKey(0)


def tiny_transformer(**kw):
    cfg = dict(dim=16, depth=2, heads=2, dim_head=8)
    cfg.update(kw)
    return Transformer(**cfg)


def test_transformer_runs():
    t = tiny_transformer()
    p = t.init(KEY)
    x = jax.random.normal(KEY, (2, 5, 16))
    assert t(p, x).shape == x.shape


def test_transformer_causal_property():
    t = tiny_transformer(causal=True)
    p = t.init(KEY)
    x = jax.random.normal(KEY, (1, 6, 16))
    out1 = np.asarray(t(p, x))
    x2 = x.at[:, 4].set(1.0)
    out2 = np.asarray(t(p, x2))
    np.testing.assert_allclose(out1[:, :4], out2[:, :4], atol=1e-5)


def test_transformer_cross_attend():
    t = tiny_transformer(cross_attend=True)
    p = t.init(KEY)
    x = jax.random.normal(KEY, (1, 5, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16))
    out = t(p, x, context=ctx, context_mask=jnp.ones((1, 7), bool))
    assert out.shape == x.shape
    ctx2 = ctx * 2
    assert not np.allclose(out, t(p, x, context=ctx2))


def test_transformer_sparse_3dna_stack():
    t = tiny_transformer(
        causal=True,
        cross_attend=True,
        sparse_3dna_attn=True,
        sparse_3dna_video_shape=(2, 2, 2),
        sparse_3dna_dilations=(1, 2),
        shift_video_tokens=True,
    )
    p = t.init(KEY)
    x = jax.random.normal(KEY, (1, 9, 16))
    ctx = jax.random.normal(KEY, (1, 4, 16))
    assert t(p, x, context=ctx).shape == x.shape


# ---------------------------------------------------------------------------
# reversible
# ---------------------------------------------------------------------------


def rev_pair(**kw):
    cfg = dict(dim=16, depth=2, heads=2, dim_head=8)
    cfg.update(kw)
    return ReversibleTransformer(**cfg)


def test_reversible_forward_matches_irreversible_math():
    t = rev_pair(causal=True, cross_attend=True)
    p = t.init(KEY)
    x = jax.random.normal(KEY, (1, 6, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16))
    out_rev = t(p, x, context=ctx, reverse=True)
    out_plain = t(p, x, context=ctx, reverse=False)
    np.testing.assert_allclose(np.asarray(out_rev), np.asarray(out_plain), atol=1e-5)


def test_reversible_gradients_match_plain_autodiff():
    t = rev_pair(causal=True, cross_attend=True)
    p = t.init(KEY)
    x = jax.random.normal(KEY, (1, 6, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16))
    cmask = jnp.array([[True, True, True, False]])

    def loss(p, x, ctx, reverse):
        out = t(p, x, context=ctx, context_mask=cmask, reverse=reverse)
        return jnp.sum(out**2)

    g_rev = jax.grad(loss, argnums=(0, 1, 2))(p, x, ctx, True)
    g_plain = jax.grad(loss, argnums=(0, 1, 2))(p, x, ctx, False)
    flat_rev, _ = jax.tree.flatten(g_rev)
    flat_plain, _ = jax.tree.flatten(g_plain)
    assert len(flat_rev) == len(flat_plain)
    for a, b in zip(flat_rev, flat_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_reversible_sparse3dna_grads():
    t = rev_pair(
        causal=True,
        sparse_3dna_attn=True,
        sparse_3dna_video_shape=(2, 2, 2),
        shift_video_tokens=True,
    )
    p = t.init(KEY)
    x = jax.random.normal(KEY, (1, 9, 16))

    def loss(p, reverse):
        return jnp.sum(t(p, x, reverse=reverse) ** 2)

    g_rev = jax.grad(loss)(p, True)
    g_plain = jax.grad(loss)(p, False)
    for a, b in zip(jax.tree.leaves(g_rev), jax.tree.leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# dual modality decoder
# ---------------------------------------------------------------------------


def dual_cfg(klass, **kw):
    cfg = dict(
        dim=16,
        depth=2,
        heads=2,
        dim_head=8,
        num_video_tokens_per_frame=4,
        num_audio_tokens_per_video_frame=3,
        sparse_3dna_video_shape=(2, 2, 2),
        sparse_2dna_kernel_size=3,
        cross_modality_attn_every=2,
        audio_tokens_per_timestep=1,
    )
    cfg.update(kw)
    return klass(**cfg)


def test_dual_decoder_runs():
    d = dual_cfg(DualModalityDecoder)
    p = d.init(KEY)
    video = jax.random.normal(KEY, (1, 9, 16))  # bos + 2 frames
    audio = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16))  # bos + 6
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    v, a = d(p, video, audio, context=ctx)
    assert v.shape == video.shape and a.shape == audio.shape


def test_reversible_dual_matches_plain_math_and_grads():
    d = dual_cfg(ReversibleDualModalityDecoder)
    p = d.init(KEY)
    video = jax.random.normal(KEY, (1, 9, 16))
    audio = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))

    v1, a1 = d(p, video, audio, context=ctx, reverse=True)
    v2, a2 = d(p, video, audio, context=ctx, reverse=False)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)

    def loss(p, video, audio, ctx, reverse):
        v, a = d(p, video, audio, context=ctx, reverse=reverse)
        return jnp.sum(v**2) + jnp.sum(a**2)

    g_rev = jax.grad(loss, argnums=(0, 1, 2, 3))(p, video, audio, ctx, True)
    g_plain = jax.grad(loss, argnums=(0, 1, 2, 3))(p, video, audio, ctx, False)
    for a_, b_ in zip(jax.tree.leaves(g_rev), jax.tree.leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), atol=1e-4, rtol=1e-4)


def test_dual_decoder_cross_modality_causality():
    """Video frame i's output must not depend on audio frames >= i."""
    d = dual_cfg(DualModalityDecoder, depth=2, cross_modality_attn_every=1)
    p = d.init(KEY)
    video = jax.random.normal(KEY, (1, 9, 16))  # bos + 2 frames of 4
    audio = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16))  # bos + 2 frames of 3
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    v1, _ = d(p, video, audio, context=ctx)
    # perturb audio frame 1 (tokens 4..6 incl bos offset): video frame 0's
    # tokens (positions 1..4) and bos must be unchanged; video frame 1 tokens
    # (5..8) attend audio frame 0 only, so they also must be unchanged by a
    # *frame-1* audio perturbation
    audio2 = audio.at[:, 4:].set(audio[:, 4:] * 3.0)
    v2, _ = d(p, video, audio2, context=ctx)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    # but perturbing audio frame 0 must change video frame 1
    audio3 = audio.at[:, 1:4].set(audio[:, 1:4] * 3.0)
    v3, _ = d(p, video, audio3, context=ctx)
    assert not np.allclose(np.asarray(v1)[:, 5:], np.asarray(v3)[:, 5:])


def test_remat_transformer_matches_and_grads():
    """jax.checkpoint remat knob: identical outputs and gradients."""
    t = tiny_transformer(causal=True, cross_attend=True)
    t_remat = tiny_transformer(causal=True, cross_attend=True, remat=True)
    p = t.init(KEY)
    x = jax.random.normal(KEY, (1, 6, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16))

    np.testing.assert_allclose(
        np.asarray(t(p, x, context=ctx)), np.asarray(t_remat(p, x, context=ctx)),
        atol=1e-6,
    )

    def loss(m, p):
        return jnp.sum(m(p, x, context=ctx) ** 2)

    g1 = jax.grad(loss, argnums=1)(t, p)
    g2 = jax.grad(loss, argnums=1)(t_remat, p)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dual_decoder_remat_parity():
    """remat=True (jax.checkpoint per block) is bit-compatible with the
    plain dual decoder — forward and grads, with dropout keyed identically
    (explicit keys are recomputation-stable)."""
    d = dual_cfg(DualModalityDecoder, depth=2, cross_modality_attn_every=1,
                 attn_dropout=0.1, ff_dropout=0.1)
    dr = d.replace(remat=True)
    p = d.init(KEY)
    video = jax.random.normal(KEY, (2, 9, 16))
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 16))
    k = jax.random.PRNGKey(7)

    def loss(mod, p, ctx):
        v, a = mod(p, video, audio, context=ctx, key=k)
        return jnp.sum(v**2) + jnp.sum(a**2), (v, a)

    # grads w.r.t. params AND the cross-attention context: the context is a
    # closed-over tracer inside the jax.checkpoint wrapper, and in real
    # training the text-encoder grads flow through it
    (l0, (v0, a0)), g0 = jax.value_and_grad(
        lambda p, c: loss(d, p, c), argnums=(0, 1), has_aux=True
    )(p, ctx)
    (l1, (v1, a1)), g1 = jax.value_and_grad(
        lambda p, c: loss(dr, p, c), argnums=(0, 1), has_aux=True
    )(p, ctx)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=1e-6)
    assert float(jnp.max(jnp.abs(g0[1]))) > 1e-6, "context grads vanished"
    for x, y in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5, rtol=1e-5)
