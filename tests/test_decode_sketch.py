"""Cached decode parity for NUWASketch (SparseCross2DNA context path)."""
import jax
import jax.numpy as jnp
import numpy as np

from nuwa_tpu.models import NUWASketch
from nuwa_tpu.vqgan_vae import VQGanVAE

KEY = jax.random.PRNGKey(0)


def make_vae(channels):
    vae = VQGanVAE(
        dim=8, image_size=8, channels=channels, num_layers=2, vq_codebook_size=16,
        vq_codebook_dim=8, resnet_groups=4, use_vgg_and_gan=False,
        vq_kmeans_init=False, use_attn=False, num_resnet_blocks=0,
    )
    return vae, vae.init(KEY), vae.init_state(KEY)


def test_sketch_generate_cached_equals_full():
    vae, vp, vs = make_vae(3)
    svae, sp, ss = make_vae(5)
    model = NUWASketch(
        vae=vae, sketch_vae=svae, dim=16, image_size=8,
        max_video_frames=2, sketch_max_video_frames=2,
        sketch_enc_depth=1, sketch_enc_dim_head=8, sketch_enc_heads=2,
        dec_depth=2, dec_dim_head=8, dec_heads=2,
        shift_video_tokens=True, cross_2dna_kernel_size=3,
    )
    p = model.init(KEY, vae_params=vp, vae_state=vs,
                   sketch_vae_params=sp, sketch_vae_state=ss)
    sketch = jax.random.uniform(KEY, (1, 2, 5, 8, 8))
    kw = dict(sketch=sketch, key=KEY, decode_video=False, cond_scale=2.0,
              temperature=1e-6)
    i_full = model.generate(p, method="full", **kw)
    i_cached = model.generate(p, method="cached", **kw)
    np.testing.assert_array_equal(np.asarray(i_full), np.asarray(i_cached))
