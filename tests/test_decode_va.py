"""Cached generation parity for NUWAVideoAudio."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuwa_tpu.models import NUWAVideoAudio
from nuwa_tpu.vqgan_vae import VQGanVAE

KEY = jax.random.PRNGKey(0)


def make_model(reversible):
    vae = VQGanVAE(
        dim=8, image_size=8, num_layers=2, vq_codebook_size=16, vq_codebook_dim=8,
        resnet_groups=4, use_vgg_and_gan=False, vq_kmeans_init=False,
        use_attn=False, num_resnet_blocks=0,
    )
    vp, vs = vae.init(KEY), vae.init_state(KEY)
    model = NUWAVideoAudio(
        vae=vae, dim=16, image_size=8, num_audio_tokens=12,
        num_audio_tokens_per_video_frame=3, max_video_frames=2,
        text_num_tokens=32, text_enc_depth=1, text_enc_dim_head=8,
        text_enc_heads=2, dec_depth=2, dec_dim_head=8, dec_heads=2,
        dec_reversible=reversible, cross_modality_attn_every=2,
        sparse_2dna_kernel_size=3, sparse_3dna_rel_pos_bias=False,
        sparse_2dna_rel_pos_bias=False,
    )
    return model, model.init(KEY, vae_params=vp, vae_state=vs)


@pytest.mark.parametrize("reversible", [False, True])
def test_va_generate_cached_equals_full(reversible):
    model, p = make_model(reversible)
    text = jnp.array([[1, 2, 3, 0]])
    kw = dict(text=text, key=KEY, decode_video=False, cond_scale=2.0,
              temperature=1e-6)
    vf, af = model.generate(p, method="full", **kw)
    vc, ac = model.generate(p, method="cached", **kw)
    np.testing.assert_array_equal(np.asarray(vf), np.asarray(vc))
    np.testing.assert_array_equal(np.asarray(af), np.asarray(ac))
