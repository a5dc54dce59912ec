import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuwa_tpu.core.layers import (
    Conv2d,
    Dense,
    Embedding,
    GroupNorm,
    LayerNorm,
    StableLayerNorm,
    dropout,
)
from nuwa_tpu.ops.embeddings import (
    AxialPositionalEmbedding,
    apply_rotary_pos_emb,
    rotary_freqs,
)
from nuwa_tpu.ops.feedforward import FeedForward, geglu
from nuwa_tpu.ops.sampling import gumbel_sample, prob_mask_like, top_k_filter
from nuwa_tpu.ops.shift import shift_audio_tokens, shift_video_tokens
from nuwa_tpu.ops.utils import calc_same_padding, padding_to_multiple_of


KEY = jax.random.PRNGKey(0)


def test_dense_shapes_and_bias():
    layer = Dense(8, 16, use_bias=True)
    p = layer.init(KEY)
    x = jax.random.normal(KEY, (2, 3, 8))
    out = layer(p, x)
    assert out.shape == (2, 3, 16)


def test_layernorm_normalizes():
    layer = LayerNorm(32)
    p = layer.init(KEY)
    x = jax.random.normal(KEY, (4, 32)) * 10 + 3
    out = layer(p, x)
    np.testing.assert_allclose(np.mean(out, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.std(out, -1), 1.0, atol=1e-2)


def test_stable_layernorm_scale_invariant():
    layer = StableLayerNorm(16)
    p = layer.init(KEY)
    x = jax.random.normal(KEY, (2, 5, 16))
    a = layer(p, x)
    b = layer(p, x * 1000.0)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_groupnorm():
    layer = GroupNorm(32, groups=8)
    p = layer.init(KEY)
    x = jax.random.normal(KEY, (2, 4, 4, 32))
    out = layer(p, x)
    # per-group mean should be ~0
    g = out.reshape(2, 4, 4, 8, 4)
    np.testing.assert_allclose(np.mean(g, axis=(1, 2, 4)), 0.0, atol=1e-5)


def test_conv2d_same_padding():
    layer = Conv2d(3, 8, (5, 5), padding="SAME")
    p = layer.init(KEY)
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    assert layer(p, x).shape == (2, 16, 16, 8)
    down = Conv2d(3, 8, (4, 4), stride=(2, 2), padding=((1, 1), (1, 1)))
    assert down(down.init(KEY), x).shape == (2, 8, 8, 8)


def test_embedding_frac_gradient():
    layer = Embedding(10, 4, frac_gradient=0.2)
    p = layer.init(KEY)
    ids = jnp.array([1, 2, 3])

    def loss(p):
        return jnp.sum(layer(p, ids, train=True))

    def loss_full(p):
        return jnp.sum(Embedding(10, 4)(p, ids, train=True))

    g = jax.grad(loss)(p)["table"]
    g_full = jax.grad(loss_full)(p)["table"]
    np.testing.assert_allclose(g, 0.2 * g_full, rtol=1e-6)
    # forward value unchanged
    np.testing.assert_allclose(
        layer(p, ids, train=True), Embedding(10, 4)(p, ids), rtol=1e-6
    )


def test_rotary_preserves_norm():
    freqs = rotary_freqs(6, 8)
    t = jax.random.normal(KEY, (2, 3, 6, 16))
    out = apply_rotary_pos_emb(freqs, t)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(t, axis=-1), rtol=1e-5
    )
    # position 0 is identity
    np.testing.assert_allclose(out[:, :, 0], t[:, :, 0], atol=1e-6)


def test_axial_pos_emb():
    ape = AxialPositionalEmbedding(8, shape=(3, 4, 4))
    p = ape.init(KEY)
    pos = ape(p)
    assert pos.shape == (3 * 4 * 4, 8)
    # broadcast sum structure: pos[f,h,w] = a1[f]+a2[h]+a3[w]
    grid = ape(p, flatten=False)
    np.testing.assert_allclose(
        grid[1, 2, 3], p["axials"][0][1] + p["axials"][1][2] + p["axials"][2][3]
    )
    # size-1 axes are dropped (reference filters shape > 1)
    ape2 = AxialPositionalEmbedding(8, shape=(1, 4, 4))
    assert ape2(ape2.init(KEY)).shape == (16, 8)


def test_geglu_ff():
    ff = FeedForward(dim=16, mult=4)
    p = ff.init(KEY)
    x = jax.random.normal(KEY, (2, 10, 16))
    out = ff(p, x)
    assert out.shape == x.shape
    # chunked execution is exact
    ff_chunked = FeedForward(dim=16, mult=4, chunk_size=3)
    out_chunked = ff_chunked(p, x)
    np.testing.assert_allclose(out, out_chunked, atol=1e-5)


def test_shift_video_tokens():
    b, f, hw, d = 1, 2, 4, 8
    n = 1 + f * hw * hw
    x = jax.random.normal(KEY, (b, n, d))
    out = shift_video_tokens(x, image_size=hw, shift_space=True)
    assert out.shape == x.shape
    # bos untouched
    np.testing.assert_allclose(out[:, 0], x[:, 0])
    # last quarter channels untouched
    np.testing.assert_allclose(out[..., d // 2 :], x[..., d // 2 :])
    vid = x[:, 1:].reshape(b, f, hw, hw, d)
    out_vid = out[:, 1:].reshape(b, f, hw, hw, d)
    # first quarter shifted down along h; first row zero
    np.testing.assert_allclose(out_vid[:, :, 1:, :, : d // 4], vid[:, :, :-1, :, : d // 4])
    np.testing.assert_allclose(out_vid[:, :, 0, :, : d // 4], 0.0)
    # second quarter shifted right along w
    np.testing.assert_allclose(
        out_vid[:, :, :, 1:, d // 4 : d // 2], vid[:, :, :, :-1, d // 4 : d // 2]
    )


def test_shift_video_tokens_partial_frame():
    # generation-time: ragged last frame must round-trip shapes
    x = jax.random.normal(KEY, (2, 1 + 7, 8))
    out = shift_video_tokens(x, image_size=2, shift_space=True)
    assert out.shape == x.shape


def test_shift_audio_tokens():
    x = jax.random.normal(KEY, (2, 6, 8))
    out = shift_audio_tokens(x, audio_tokens_per_timestep=2)
    assert out.shape == x.shape
    np.testing.assert_allclose(out[:, 1:, :4], x[:, :-1, :4])
    np.testing.assert_allclose(out[:, 0, :4], 0.0)
    np.testing.assert_allclose(out[..., 4:], x[..., 4:])


def test_top_k_filter():
    logits = jnp.array([[1.0, 5.0, 3.0, 2.0]])
    out = top_k_filter(logits, thres=0.5)
    assert np.isinf(out[0, 0]) and out[0, 0] < 0
    assert out[0, 1] == 5.0 and out[0, 2] == 3.0
    assert np.isinf(out[0, 3]) and out[0, 3] < 0


def test_gumbel_sample_distribution():
    logits = jnp.log(jnp.array([0.7, 0.2, 0.1]))
    keys = jax.random.split(KEY, 2000)
    samples = jax.vmap(lambda k: gumbel_sample(k, logits))(keys)
    freq = np.bincount(np.asarray(samples), minlength=3) / 2000
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.05)


def test_gumbel_sample_low_temperature_greedy():
    logits = jnp.array([1.0, 9.0, 3.0])
    assert gumbel_sample(KEY, logits, temperature=1e-8) == 1


def test_prob_mask_like():
    m = prob_mask_like(KEY, (10000,), 0.2)
    assert abs(float(jnp.mean(m)) - 0.2) < 0.02
    assert not prob_mask_like(KEY, (4,), 0.0).any()
    assert prob_mask_like(KEY, (4,), 1.0).all()


def test_dropout_determinism_and_identity():
    x = jnp.ones((4, 4))
    assert (dropout(x, 0.5, None) == x).all()
    k = jax.random.PRNGKey(1)
    a = dropout(x, 0.5, k)
    b = dropout(x, 0.5, k)
    np.testing.assert_allclose(a, b)  # same key -> bit-identical replay


def test_padding_helpers():
    assert calc_same_padding(3, 1) == 1
    assert calc_same_padding(5, 2) == 4
    assert padding_to_multiple_of(7, 4) == 1
    assert padding_to_multiple_of(8, 4) == 0


def test_device_rate_two_point_timing():
    """device_rate (timing through a high-latency sync path) returns a
    positive per-dispatch rate and calls dispatch the expected number of
    times (1 warm + reps*(k_lo + k_hi))."""
    from nuwa_tpu.utils.timing import device_rate

    calls = []
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones(())

    def dispatch():
        calls.append(1)
        return f(x)

    r = device_rate(dispatch, k_lo=1, k_hi=3, reps=2)
    assert r > 0
    # 1 warm + reps*(k_lo+k_hi), doubled if the jitter retry fired
    assert len(calls) in (1 + 2 * (1 + 3), 1 + 4 * (1 + 3))
