"""End-to-end model tests on tiny configs (BASELINE.json configs shrunk to
single-core-CPU scale)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuwa_tpu.models import NUWA, NUWASketch, NUWAVideoAudio
from nuwa_tpu.vqgan_vae import VQGanVAE

KEY = jax.random.PRNGKey(0)


def tiny_vae(channels=3):
    return VQGanVAE(
        dim=8,
        image_size=8,
        channels=channels,
        num_layers=2,
        vq_codebook_size=16,
        vq_codebook_dim=8,
        resnet_groups=4,
        use_vgg_and_gan=False,
        vq_kmeans_init=False,
        use_attn=False,
        num_resnet_blocks=0,
    )


def make_vae(channels=3, key=KEY):
    vae = tiny_vae(channels)
    return vae, vae.init(key), vae.init_state(key)


def tiny_nuwa(vae, **kw):
    cfg = dict(
        dim=16,
        vae=vae,
        max_video_frames=2,
        text_num_tokens=32,
        text_max_seq_len=16,
        text_enc_depth=1,
        text_enc_dim_head=8,
        text_enc_heads=2,
        dec_depth=1,
        dec_dim_head=8,
        dec_heads=2,
    )
    cfg.update(kw)
    return NUWA(**cfg)


def test_nuwa_forward_loss_and_logits():
    vae, vp, vs = make_vae()
    model = tiny_nuwa(vae)
    p = model.init(KEY, vae_params=vp, vae_state=vs)
    text = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]])
    video = jax.random.uniform(KEY, (2, 2, 3, 8, 8))

    logits = model.forward(p, text=text, video=video)
    tpf = model.tokens_per_frame
    # without return_loss the input is unshifted, so logits cover bos + n
    # positions (reference :1938-1961 semantics)
    assert logits.shape == (2, 2 * tpf + 1, vae.codebook_size)

    loss = model.forward(
        p, text=text, video=video, return_loss=True, key=KEY, train=True
    )
    assert np.isfinite(float(loss))


def test_nuwa_bf16_training_loss_parity():
    """compute_dtype='bfloat16' training forward/backward must track fp32
    (fp32 master params, bf16 activations/matmuls, fp32 softmax/CE)."""
    vae, vp, vs = make_vae()
    m32 = tiny_nuwa(vae, dec_depth=2, sparse_3dna_kernel_size=3)
    m16 = tiny_nuwa(
        vae, dec_depth=2, sparse_3dna_kernel_size=3, compute_dtype="bfloat16"
    )
    p = m32.init(KEY, vae_params=vp, vae_state=vs)
    text = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]])
    idx = jax.random.randint(KEY, (2, 2 * m32.tokens_per_frame), 0, 16)

    loss32 = m32.forward(p, text=text, video=idx, return_loss=True)
    loss16 = m16.forward(p, text=text, video=idx, return_loss=True)
    assert loss16.dtype == jnp.float32
    np.testing.assert_allclose(float(loss16), float(loss32), rtol=3e-2)

    def f(p):
        return m16.forward(p, text=text, video=idx, return_loss=True)

    grads = jax.grad(f)(p)
    g_leaves = [g for g in jax.tree.leaves(grads)]
    assert all(g.dtype == jnp.float32 for g in g_leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in g_leaves)


def test_nuwa_forward_accepts_indices():
    vae, vp, vs = make_vae()
    model = tiny_nuwa(vae)
    p = model.init(KEY, vae_params=vp, vae_state=vs)
    text = jnp.array([[1, 2, 3, 0]])
    idx = jax.random.randint(KEY, (1, 2 * model.tokens_per_frame), 0, 16)
    loss = model.forward(p, text=text, video=idx, return_loss=True)
    assert np.isfinite(float(loss))


def test_nuwa_gradients_flow_but_not_into_vae():
    vae, vp, vs = make_vae()
    model = tiny_nuwa(vae)
    p = model.init(KEY, vae_params=vp, vae_state=vs)
    text = jnp.array([[1, 2, 3, 0]])
    video = jax.random.uniform(KEY, (1, 2, 3, 8, 8))

    def loss_fn(p):
        return model.forward(p, text=text, video=video, return_loss=True)

    g = jax.grad(loss_fn)(p)
    assert any(float(jnp.abs(x).sum()) > 0 for x in jax.tree.leaves(g["video_transformer"]))
    assert all(float(jnp.abs(x).sum()) == 0 for x in jax.tree.leaves(g["vae"]["params"]))


def test_nuwa_generate():
    vae, vp, vs = make_vae()
    model = tiny_nuwa(vae)
    p = model.init(KEY, vae_params=vp, vae_state=vs)
    text = jnp.array([[1, 2, 3, 0]])
    video = model.generate(p, text=text, key=KEY, num_frames=2, cond_scale=2.0)
    assert video.shape == (1, 2, 3, 8, 8)
    assert np.isfinite(np.asarray(video)).all()


def test_nuwa_generate_indices_deterministic_given_key():
    vae, vp, vs = make_vae()
    model = tiny_nuwa(vae)
    p = model.init(KEY, vae_params=vp, vae_state=vs)
    text = jnp.array([[1, 2, 3, 0]])
    i1 = model.generate(p, text=text, key=KEY, decode_video=False, cond_scale=1.0)
    i2 = model.generate(p, text=text, key=KEY, decode_video=False, cond_scale=1.0)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    assert i1.shape == (1, 2 * model.tokens_per_frame)


def test_nuwa_reversible_variants():
    vae, vp, vs = make_vae()
    model = tiny_nuwa(vae, enc_reversible=True, dec_reversible=True)
    p = model.init(KEY, vae_params=vp, vae_state=vs)
    text = jnp.array([[1, 2, 3, 0]])
    video = jax.random.uniform(KEY, (1, 2, 3, 8, 8))
    loss = model.forward(p, text=text, video=video, return_loss=True)
    g = jax.grad(
        lambda p: model.forward(p, text=text, video=video, return_loss=True)
    )(p)
    assert np.isfinite(float(loss))
    assert any(float(jnp.abs(x).sum()) > 0 for x in jax.tree.leaves(g["video_transformer"]))


def test_nuwa_sparse_config():
    vae, vp, vs = make_vae()
    model = tiny_nuwa(
        vae,
        sparse_3dna_kernel_size=3,
        sparse_3dna_dilation=2,  # cycles (1, 2)
        dec_depth=2,
        shift_video_tokens=True,
        sparse_3dna_rel_pos_bias=True,
    )
    p = model.init(KEY, vae_params=vp, vae_state=vs)
    text = jnp.array([[1, 2, 3, 0]])
    video = jax.random.uniform(KEY, (1, 2, 3, 8, 8))
    loss = model.forward(p, text=text, video=video, return_loss=True)
    assert np.isfinite(float(loss))


# ---------------------------------------------------------------------------
# NUWASketch
# ---------------------------------------------------------------------------


def test_nuwa_sketch_forward_and_generate():
    vae, vp, vs = make_vae(3)
    sketch_vae, sp, ss = make_vae(5)
    model = NUWASketch(
        vae=vae,
        sketch_vae=sketch_vae,
        dim=16,
        image_size=8,
        max_video_frames=2,
        sketch_max_video_frames=2,
        sketch_enc_depth=1,
        sketch_enc_dim_head=8,
        sketch_enc_heads=2,
        sketch_enc_use_sparse_3dna=True,
        dec_depth=1,
        dec_dim_head=8,
        dec_heads=2,
    )
    p = model.init(
        KEY, vae_params=vp, vae_state=vs, sketch_vae_params=sp, sketch_vae_state=ss
    )
    sketch = jax.random.uniform(KEY, (1, 2, 5, 8, 8))
    video = jax.random.uniform(KEY, (1, 2, 3, 8, 8))
    sketch_mask = jnp.array([[True, True]])

    loss = model.forward(
        p, sketch=sketch, video=video, sketch_mask=sketch_mask,
        return_loss=True, key=KEY, train=True,
    )
    assert np.isfinite(float(loss))

    out = model.generate(p, sketch=sketch, key=KEY, num_frames=2)
    assert out.shape == (1, 2, 3, 8, 8)


def test_nuwa_sketch_single_sketch_rank4():
    vae, vp, vs = make_vae(3)
    sketch_vae, sp, ss = make_vae(5)
    model = NUWASketch(
        vae=vae, sketch_vae=sketch_vae, dim=16, image_size=8,
        max_video_frames=2, sketch_max_video_frames=2,
        sketch_enc_depth=1, sketch_enc_dim_head=8, sketch_enc_heads=2,
        dec_depth=1, dec_dim_head=8, dec_heads=2,
    )
    p = model.init(
        KEY, vae_params=vp, vae_state=vs, sketch_vae_params=sp, sketch_vae_state=ss
    )
    sketch = jax.random.uniform(KEY, (1, 5, 8, 8))  # rank-4 convenience
    video = jax.random.uniform(KEY, (1, 2, 3, 8, 8))
    loss = model.forward(p, sketch=sketch, video=video, return_loss=True)
    assert np.isfinite(float(loss))


# ---------------------------------------------------------------------------
# NUWAVideoAudio
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("reversible", [False, True])
def test_nuwa_video_audio_forward(reversible):
    vae, vp, vs = make_vae()
    model = NUWAVideoAudio(
        vae=vae,
        dim=16,
        image_size=8,
        num_audio_tokens=12,
        num_audio_tokens_per_video_frame=3,
        max_video_frames=2,
        text_num_tokens=32,
        text_max_seq_len=16,
        text_enc_depth=1,
        text_enc_dim_head=8,
        text_enc_heads=2,
        dec_depth=2,
        dec_dim_head=8,
        dec_heads=2,
        dec_reversible=reversible,
        cross_modality_attn_every=2,
        sparse_2dna_kernel_size=3,
        sparse_3dna_rel_pos_bias=False,
        sparse_2dna_rel_pos_bias=False,
    )
    p = model.init(KEY, vae_params=vp, vae_state=vs)
    text = jnp.array([[1, 2, 3, 0]])
    video = jax.random.uniform(KEY, (1, 2, 3, 8, 8))
    audio = jax.random.randint(KEY, (1, 2 * 3), 0, 12)

    loss = model.forward(
        p, text=text, video=video, audio=audio, return_loss=True, key=KEY, train=True
    )
    assert np.isfinite(float(loss))

    vl, al = model.forward(p, text=text, video=video, audio=audio)
    assert vl.shape == (1, 2 * model.num_video_tokens_per_frame + 1, 16)
    assert al.shape == (1, 2 * 3 + 1, 12)


def test_nuwa_video_audio_generate():
    vae, vp, vs = make_vae()
    model = NUWAVideoAudio(
        vae=vae,
        dim=16,
        image_size=8,
        num_audio_tokens=12,
        num_audio_tokens_per_video_frame=3,
        max_video_frames=2,
        text_num_tokens=32,
        text_enc_depth=1,
        text_enc_dim_head=8,
        text_enc_heads=2,
        dec_depth=1,
        dec_dim_head=8,
        dec_heads=2,
        dec_reversible=False,
        cross_modality_attn_every=1,
        sparse_2dna_kernel_size=3,
        sparse_3dna_rel_pos_bias=False,
        sparse_2dna_rel_pos_bias=False,
    )
    p = model.init(KEY, vae_params=vp, vae_state=vs)
    text = jnp.array([[1, 2, 3, 0]])
    video, audio_idx = model.generate(p, text=text, key=KEY, num_frames=2)
    assert video.shape == (1, 2, 3, 8, 8)
    assert audio_idx.shape == (1, 2 * 3)
    assert int(jnp.max(audio_idx)) < 12
