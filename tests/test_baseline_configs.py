"""The five BASELINE.json parity configs, scaled to single-core-CPU size but
structurally faithful (same attention kinds, dilation cycles, reversibility,
shift wrappers, channel counts where they matter).

BASELINE.json:6-12:
  1. VQGanVAE dim=64, image 64, 2 layers, codebook 512 — recon + VQ loss
  2. NUWA tiny: full attention path, non-reversible — loss + generate
  3. NUWA sparse-3DNA: kernel (5,3,3), dilations (1,2,4), shift, reversible
  4. NUWASketch: separate sketch VAE (channels=5), sparse-3DNA encoder
  5. Dual video+audio decoder (reversible cross-modality)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuwa_tpu.models import NUWA, NUWASketch, NUWAVideoAudio
from nuwa_tpu.vqgan_vae import VQGanVAE

KEY = jax.random.PRNGKey(0)


def test_config1_vqgan_vae():
    """dim=64 image=64 layers=2 codebook=512 — full-size config; recon + VQ
    loss on random images (single forward keeps CPU time sane)."""
    vae = VQGanVAE(
        dim=64, image_size=64, num_layers=2, vq_codebook_size=512,
        use_vgg_and_gan=False, vq_kmeans_init=True, resnet_groups=16,
        use_attn=False, num_resnet_blocks=1,
    )
    p = vae.init(KEY)
    s = vae.init_state(KEY)
    img = jax.random.uniform(KEY, (1, 3, 64, 64))
    loss, s2 = vae.forward(p, s, img, return_loss=True, rng=KEY)
    assert np.isfinite(float(loss))
    assert bool(s2["vq"]["initted"])  # k-means init ran
    fmap, idx, commit, _ = vae.encode(p, s2, img)
    assert idx.shape == (1, 16 * 16)  # 64 / 2**2 = 16


def test_config2_nuwa_tiny_full_attention():
    """Full (dense) attention decoder, non-reversible — no sparse path.

    NUWA always builds Sparse3DNA; the dense-attn decoder is the reference's
    ``sparse_3dna_attn=False`` Transformer — exercised directly.
    """
    from nuwa_tpu.transformer import Transformer

    dec = Transformer(
        dim=32, depth=2, heads=2, dim_head=16, causal=True, cross_attend=True
    )
    p = dec.init(KEY)
    x = jax.random.normal(KEY, (1, 17, 32))
    ctx = jax.random.normal(KEY, (1, 8, 32))
    out = dec(p, x, context=ctx)
    assert out.shape == x.shape
    # causality end to end
    x2 = x.at[:, 10].set(3.0)
    np.testing.assert_allclose(
        np.asarray(dec(p, x2, context=ctx))[:, :10], np.asarray(out)[:, :10],
        atol=1e-5,
    )


def test_config3_nuwa_sparse_reversible():
    """kernel (5,3,3), dilation cycle (1,2,4), shift tokens, reversible
    decoder (structure of BASELINE config #3 at reduced width)."""
    model = NUWA(
        dim=32,
        image_size=4,  # fmap mode
        num_image_tokens=64,
        max_video_frames=3,
        text_num_tokens=32,
        text_enc_depth=1,
        text_enc_dim_head=8,
        text_enc_heads=2,
        dec_depth=3,
        dec_dim_head=16,
        dec_heads=2,
        dec_reversible=True,
        sparse_3dna_kernel_size=(5, 3, 3),
        sparse_3dna_dilation=(1, 2, 4),
        shift_video_tokens=True,
        sparse_3dna_rel_pos_bias=True,
    )
    p = model.init(KEY)
    text = jnp.array([[1, 5, 9, 0]])
    video = jax.random.randint(KEY, (1, model.max_video_tokens), 0, 64)
    loss = model.forward(p, text=text, video=video, return_loss=True)
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: model.forward(p, text=text, video=video, return_loss=True)
    )(p)
    assert any(float(jnp.abs(x).sum()) > 0 for x in jax.tree.leaves(g["video_transformer"]))
    idx = model.generate(p, text=text, key=KEY, decode_video=False, num_frames=2)
    assert idx.shape == (1, 2 * model.tokens_per_frame)


def test_config4_nuwa_sketch():
    vae = VQGanVAE(
        dim=8, image_size=8, channels=3, num_layers=2, vq_codebook_size=16,
        vq_codebook_dim=8, resnet_groups=4, use_vgg_and_gan=False,
        vq_kmeans_init=False, use_attn=False, num_resnet_blocks=0,
    )
    sketch_vae = vae.replace(channels=5)
    vp, vs = vae.init(KEY), vae.init_state(KEY)
    sp, ss = sketch_vae.init(KEY), sketch_vae.init_state(KEY)
    model = NUWASketch(
        vae=vae, sketch_vae=sketch_vae, dim=16, image_size=8,
        max_video_frames=2, sketch_max_video_frames=2,
        sketch_enc_depth=1, sketch_enc_dim_head=8, sketch_enc_heads=2,
        sketch_enc_use_sparse_3dna=True,
        dec_depth=1, dec_dim_head=8, dec_heads=2,
    )
    p = model.init(KEY, vae_params=vp, vae_state=vs,
                   sketch_vae_params=sp, sketch_vae_state=ss)
    sketch = jax.random.uniform(KEY, (1, 2, 5, 8, 8))
    video = jax.random.uniform(KEY, (1, 2, 3, 8, 8))
    loss = model.forward(p, sketch=sketch, video=video, return_loss=True)
    assert np.isfinite(float(loss))
    out = model.generate(p, sketch=sketch, key=KEY)
    assert out.shape == (1, 2, 3, 8, 8)


def test_config5_dual_video_audio_reversible():
    vae = VQGanVAE(
        dim=8, image_size=8, num_layers=2, vq_codebook_size=16,
        vq_codebook_dim=8, resnet_groups=4, use_vgg_and_gan=False,
        vq_kmeans_init=False, use_attn=False, num_resnet_blocks=0,
    )
    vp, vs = vae.init(KEY), vae.init_state(KEY)
    model = NUWAVideoAudio(
        vae=vae, dim=16, image_size=8, num_audio_tokens=12,
        num_audio_tokens_per_video_frame=3, max_video_frames=2,
        text_num_tokens=32, text_enc_depth=1, text_enc_dim_head=8,
        text_enc_heads=2, dec_depth=3, dec_dim_head=8, dec_heads=2,
        dec_reversible=True, cross_modality_attn_every=3,
        sparse_2dna_kernel_size=3,
        shift_video_tokens=True, shift_audio_tokens=True,
        sparse_3dna_rel_pos_bias=True, sparse_2dna_rel_pos_bias=True,
    )
    p = model.init(KEY, vae_params=vp, vae_state=vs)
    text = jnp.array([[1, 2, 3, 0]])
    video = jax.random.uniform(KEY, (1, 2, 3, 8, 8))
    audio = jax.random.randint(KEY, (1, 6), 0, 12)
    loss = model.forward(
        p, text=text, video=video, audio=audio, return_loss=True, key=KEY,
        train=True,
    )
    assert np.isfinite(float(loss))
    v, a = model.generate(p, text=text, key=KEY)
    assert v.shape == (1, 2, 3, 8, 8)
    assert a.shape == (1, 6)


def test_vgg16_state_dict_loading():
    """The perceptual VGG16 loads a torchvision-format state dict."""
    import torch

    from nuwa_tpu.perceptual import VGG16Features, load_torch_vgg16_state_dict

    # synthetic state dict with torchvision vgg16 layout
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    sd = {}
    i = 0
    cin = 3
    for spec in cfg:
        if spec == "M":
            i += 1
            continue
        sd[f"features.{i}.weight"] = torch.randn(spec, cin, 3, 3) * 0.01
        sd[f"features.{i}.bias"] = torch.zeros(spec)
        cin = spec
        i += 2  # conv + relu
    sd["classifier.0.weight"] = torch.randn(4096, 512 * 7 * 7) * 0.001
    sd["classifier.0.bias"] = torch.zeros(4096)
    sd["classifier.3.weight"] = torch.randn(4096, 4096) * 0.01
    sd["classifier.3.bias"] = torch.zeros(4096)

    params = load_torch_vgg16_state_dict(sd)
    assert len(params["convs"]) == 13
    vgg = VGG16Features()
    feats = vgg(params, jnp.ones((1, 32, 32, 3)) * 0.5)
    assert feats.shape == (1, 4096)
    assert np.isfinite(np.asarray(feats)).all()
