import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuwa_tpu.vq import VectorQuantizeEMA, l2norm
from nuwa_tpu.vqgan_vae import (
    Discriminator,
    VQGanVAE,
    bce_discr_loss,
    bce_gen_loss,
    gradient_penalty,
    hinge_discr_loss,
    hinge_gen_loss,
)

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# vector quantizer
# ---------------------------------------------------------------------------


def test_vq_roundtrip_and_state_update():
    vq = VectorQuantizeEMA(dim=8, codebook_size=16, codebook_dim=4, kmeans_init=False)
    p = vq.init(KEY)
    s = vq.init_state(KEY)
    x = jax.random.normal(KEY, (2, 4, 4, 8))
    q, idx, commit, s2 = vq(p, s, x, update=True)
    assert q.shape == x.shape
    assert idx.shape == (2, 4, 4)
    assert commit.shape == ()
    # EMA stats moved
    assert not np.allclose(np.asarray(s2["cluster_size"]), 0.0)
    assert not np.allclose(np.asarray(s2["embed"]), np.asarray(s["embed"]))


def test_vq_straight_through_gradient():
    vq = VectorQuantizeEMA(dim=8, codebook_size=16, kmeans_init=False)
    p = vq.init(KEY)
    s = vq.init_state(KEY)
    x = jax.random.normal(KEY, (4, 8))

    def loss(x):
        q, _, _, _ = vq(p, s, x, update=False)
        return jnp.sum(q * 3.0)

    g = jax.grad(loss)(x)
    # straight-through: dq/dx = identity
    np.testing.assert_allclose(np.asarray(g), 3.0, atol=1e-6)


def test_vq_kmeans_init_once():
    vq = VectorQuantizeEMA(dim=8, codebook_size=4, kmeans_init=True)
    p = vq.init(KEY)
    s = vq.init_state(KEY)
    assert not bool(s["initted"])
    x = jax.random.normal(KEY, (64, 8))
    _, _, _, s2 = vq(p, s, x, update=True, rng=jax.random.PRNGKey(1))
    assert bool(s2["initted"])
    # after init the codebook should be data-dependent (cosine: normalized)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(s2["embed"]), axis=-1), 1.0, atol=1e-4
    )


def test_vq_quantized_is_nearest_code():
    vq = VectorQuantizeEMA(dim=4, codebook_size=8, kmeans_init=False, cosine_sim=False)
    p = vq.init(KEY)
    s = vq.init_state(KEY)
    x = jax.random.normal(KEY, (10, 4))
    q, idx, _, _ = vq(p, s, x, update=False)
    embed = np.asarray(s["embed"])
    d = ((np.asarray(x)[:, None] - embed[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(-1))
    np.testing.assert_allclose(np.asarray(q), embed[np.asarray(idx)], atol=1e-6)


def test_vq_dead_code_expiry():
    vq = VectorQuantizeEMA(
        dim=2, codebook_size=4, kmeans_init=False, cosine_sim=False,
        decay=0.1, threshold_ema_dead_code=0.5,
    )
    p = vq.init(KEY)
    s = vq.init_state(jax.random.PRNGKey(3))
    # park two codes far away so the batch never selects them
    embed = np.asarray(s["embed"]).copy()
    embed[2:] = 1e3
    s = dict(s, embed=jnp.asarray(embed), embed_avg=jnp.asarray(embed))
    x = jnp.array([[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [-0.1, 0.9]])
    for i in range(5):
        _, _, _, s = vq(p, s, x, update=True, rng=jax.random.PRNGKey(10 + i))
    # dead codes were re-seeded from batch samples (near the data, not 1e3)
    new_embed = np.asarray(s["embed"])
    assert np.abs(new_embed).max() < 10.0, new_embed
    # and their rows coincide with actual batch vectors
    xs = np.asarray(x)
    for row in new_embed:
        assert np.min(np.linalg.norm(xs - row, axis=-1)) < 2.0


def test_vq_dead_code_expiry_off_keeps_unused_codes():
    vq = VectorQuantizeEMA(
        dim=2, codebook_size=4, kmeans_init=False, cosine_sim=False, decay=0.1
    )
    p = vq.init(KEY)
    s = vq.init_state(jax.random.PRNGKey(3))
    embed = np.asarray(s["embed"]).copy()
    embed[2:] = 1e3
    s = dict(s, embed=jnp.asarray(embed), embed_avg=jnp.asarray(embed))
    x = jnp.array([[1.0, 0.0], [0.9, 0.1]])
    for i in range(5):
        _, _, _, s = vq(p, s, x, update=True, rng=jax.random.PRNGKey(10 + i))
    # without expiry the far-away codes persist (EMA never touches them
    # beyond Laplace smoothing of near-zero counts)
    assert np.abs(np.asarray(s["embed"])[2:]).max() > 100.0
    usage = float(vq.codebook_usage(s))
    assert usage <= 0.5


def test_vq_ema_moves_codes_toward_data():
    vq = VectorQuantizeEMA(
        dim=2, codebook_size=2, kmeans_init=False, cosine_sim=False, decay=0.5
    )
    p = vq.init(KEY)
    s = vq.init_state(KEY)
    # two clear clusters
    x = jnp.array([[5.0, 5.0], [5.1, 4.9], [-5.0, -5.0], [-4.9, -5.1]])
    for _ in range(20):
        _, _, _, s = vq(p, s, x, update=True)
    embed = np.sort(np.asarray(s["embed"]), axis=0)
    np.testing.assert_allclose(embed[0], [-4.95, -5.05], atol=0.2)
    np.testing.assert_allclose(embed[1], [5.05, 4.95], atol=0.2)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def test_gan_losses_signs():
    fake = jnp.array([0.5])
    real = jnp.array([0.5])
    assert hinge_discr_loss(fake, real) == pytest.approx(2.0)
    assert hinge_gen_loss(jnp.array([2.0])) == -2.0
    assert float(bce_discr_loss(jnp.zeros(1), jnp.zeros(1))) == pytest.approx(
        2 * np.log(2), rel=1e-5
    )
    assert float(bce_gen_loss(jnp.zeros(1))) == pytest.approx(np.log(2), rel=1e-5)


def test_gradient_penalty_zero_for_constant_fn():
    imgs = jax.random.normal(KEY, (2, 4, 4, 3))
    gp = gradient_penalty(imgs, lambda x: jnp.sum(x * 0.0, axis=(1, 2, 3)))
    assert float(gp) == pytest.approx(10.0, rel=1e-4)  # (|0| - 1)^2 * 10


# ---------------------------------------------------------------------------
# VQGanVAE end-to-end
# ---------------------------------------------------------------------------


def tiny_vae(**kw):
    cfg = dict(
        dim=16,
        image_size=16,
        num_layers=2,
        vq_codebook_size=32,
        vq_codebook_dim=8,
        resnet_groups=4,
        attn_heads=2,
        attn_dim_head=8,
        use_vgg_and_gan=False,
        vq_kmeans_init=False,
    )
    cfg.update(kw)
    return VQGanVAE(**cfg)


def test_vae_recon_roundtrip():
    vae = tiny_vae()
    p = vae.init(KEY)
    s = vae.init_state(KEY)
    img = jax.random.uniform(KEY, (2, 3, 16, 16))
    recon = vae.forward(p, s, img)
    assert recon.shape == img.shape
    loss, s2 = vae.forward(p, s, img, return_loss=True)
    assert loss.shape == ()
    assert np.isfinite(float(loss))


def test_vae_encode_decode_api():
    vae = tiny_vae()
    p = vae.init(KEY)
    s = vae.init_state(KEY)
    img = jax.random.uniform(KEY, (2, 3, 16, 16))
    fmap, indices, commit, s2 = vae.encode(p, s, img)
    assert vae.fmap_size == 4
    assert fmap.shape == (2, vae.layer_dims[-1], 4, 4)
    assert indices.shape == (2, 16)
    out = vae.decode(p, fmap)
    assert out.shape == img.shape


def test_vae_video_indices_roundtrip():
    vae = tiny_vae()
    p = vae.init(KEY)
    s = vae.init_state(KEY)
    video = jax.random.uniform(KEY, (2, 3, 3, 16, 16))  # b f c h w
    idx = vae.get_video_indices(p, s, video)
    assert idx.shape == (2, 3, 16)
    assert int(jnp.max(idx)) < vae.codebook_size
    flat = idx.reshape(2, -1)
    out = vae.codebook_indices_to_video(p, s, flat)
    assert out.shape == video.shape


def test_vae_gan_losses_and_adaptive_weight():
    vae = tiny_vae(use_vgg_and_gan=True, perceptual="none")
    p = vae.init(KEY)
    s = vae.init_state(KEY)
    img = jax.random.uniform(KEY, (2, 3, 16, 16))
    loss, s2 = vae.forward(p, s, img, return_loss=True)
    assert np.isfinite(float(loss))
    dloss = vae.forward(p, s, img, return_discr_loss=True)
    assert np.isfinite(float(dloss))
    dloss_gp = vae.forward(p, s, img, return_discr_loss=True, apply_grad_penalty=True)
    assert float(dloss_gp) > float(dloss) - 1e-6


def test_vae_gan_gradients_flow():
    vae = tiny_vae(use_vgg_and_gan=True, perceptual="none")
    p = vae.init(KEY)
    s = vae.init_state(KEY)
    img = jax.random.uniform(KEY, (1, 3, 16, 16))

    def gen_loss(p):
        loss, _ = vae.forward(p, s, img, return_loss=True)
        return loss

    g = jax.grad(gen_loss)(p)
    g_enc = jax.tree.leaves(g["enc"])
    assert any(float(jnp.abs(x).sum()) > 0 for x in g_enc)

    def discr_loss(p):
        return vae.forward(p, s, img, return_discr_loss=True, apply_grad_penalty=True)

    gd = jax.grad(discr_loss)(p)
    gd_discr = jax.tree.leaves(gd["discr"])
    assert any(float(jnp.abs(x).sum()) > 0 for x in gd_discr)
    # discriminator loss must NOT update the generator (recon detached)
    g_dec = jax.tree.leaves(gd["dec"])
    assert all(float(jnp.abs(x).sum()) == 0 for x in g_dec)


def test_vae_grayscale_channels():
    vae = tiny_vae(channels=1)
    p = vae.init(KEY)
    s = vae.init_state(KEY)
    img = jax.random.uniform(KEY, (1, 1, 16, 16))
    loss, _ = vae.forward(p, s, img, return_loss=True)
    assert np.isfinite(float(loss))


def test_vae_with_attn_layers():
    vae = tiny_vae(use_attn=(False, True), num_resnet_blocks=(0, 1))
    p = vae.init(KEY)
    s = vae.init_state(KEY)
    img = jax.random.uniform(KEY, (1, 3, 16, 16))
    assert vae.forward(p, s, img).shape == img.shape


def test_vae_bf16_compute_dtype_loss_parity():
    """bf16 activations (fp32 params/VQ/losses) must track the fp32 loss."""
    kw = dict(
        dim=8, image_size=16, num_layers=2, vq_codebook_size=16,
        vq_codebook_dim=8, resnet_groups=4, use_vgg_and_gan=True,
        perceptual="none", vq_kmeans_init=False, use_attn=True,
        attn_dim_head=4, attn_heads=2, num_resnet_blocks=1,
    )
    vae32 = VQGanVAE(**kw)
    vae16 = VQGanVAE(**kw, compute_dtype="bfloat16")
    p = vae32.init(KEY)
    s = vae32.init_state(KEY)
    img = jax.random.uniform(KEY, (2, 3, 16, 16))

    loss32, _ = vae32.forward(p, s, img, return_loss=True)
    loss16, _ = vae16.forward(p, s, img, return_loss=True)
    assert loss16.dtype == jnp.float32
    np.testing.assert_allclose(float(loss16), float(loss32), rtol=5e-2)

    d32 = vae32.forward(p, s, img, return_discr_loss=True, apply_grad_penalty=True)
    d16 = vae16.forward(p, s, img, return_discr_loss=True, apply_grad_penalty=True)
    np.testing.assert_allclose(float(d16), float(d32), rtol=5e-2)

    # gradients exist and stay fp32 (mixed precision: fp32 master params)
    def gen_loss(p):
        loss, _ = vae16.forward(p, s, img, return_loss=True)
        return loss

    grads = jax.grad(gen_loss)(p)
    for leaf in jax.tree.leaves(grads):
        assert leaf.dtype == jnp.float32
    # reconstruction path returns fp32 pixels
    recon = vae16.forward(p, s, img)
    assert recon.dtype == jnp.float32


def test_random_vgg_perceptual_loss():
    """The no-pretrained-weights perceptual mode: fixed random VGG features,
    LPIPS-style multi-layer distance. Zero for identical images, positive
    and differentiable for different ones."""
    from nuwa_tpu.perceptual import VGG16Features, random_perceptual_loss

    vgg = VGG16Features(channels=3)
    p = vgg.init(jax.random.PRNGKey(0))
    a = jax.random.uniform(KEY, (2, 16, 16, 3))
    b = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    same = float(random_perceptual_loss(p, vgg, a, a))
    diff = float(random_perceptual_loss(p, vgg, a, b))
    assert same < 1e-6
    assert diff > 1e-3
    g = jax.grad(lambda b: random_perceptual_loss(p, vgg, a, b))(b)
    assert float(jnp.abs(g).max()) > 0

    # blur sensitivity: a slightly noised copy scores closer than an
    # unrelated image (sanity that the metric orders similarity)
    near = a + 0.05 * jax.random.normal(jax.random.PRNGKey(2), a.shape)
    assert float(random_perceptual_loss(p, vgg, a, near)) < diff


def test_vae_random_vgg_gan_training_mode():
    vae = VQGanVAE(
        dim=8, image_size=16, num_layers=2, vq_codebook_size=16,
        vq_codebook_dim=8, resnet_groups=4, use_vgg_and_gan=True,
        perceptual="random_vgg", vq_kmeans_init=False, use_attn=False,
        num_resnet_blocks=0,
    )
    p = vae.init(KEY)
    assert "vgg" in p
    s = vae.init_state(KEY)
    img = jax.random.uniform(KEY, (2, 3, 16, 16))
    loss, _ = vae.forward(p, s, img, return_loss=True)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: vae.forward(p, s, img, return_loss=True)[0])(p)
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads["enc"]))
    assert gmax > 0
    # checkpoint hygiene: perceptual net excluded from eval params
    assert "vgg" not in vae.eval_params(p)


def test_eval_params_strips_gan():
    vae = tiny_vae(use_vgg_and_gan=True, perceptual="none")
    p = vae.init(KEY)
    pe = vae.eval_params(p)
    assert "discr" not in pe and "enc" in pe and "dec" in pe


def test_discriminator_output_map():
    d = Discriminator(dims=(8, 16), channels=3, groups=4)
    p = d.init(KEY)
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    out = d(p, x)
    assert out.shape[0] == 2 and out.shape[-1] == 1
