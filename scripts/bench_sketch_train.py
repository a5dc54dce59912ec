"""NUWASketch train step: cross-2DNA backend comparison on the real chip.

Run: python scripts/bench_sketch_train.py [--batch 2] [--fmap 16] [--frames 10]

The decoder's self-attention (Sparse3DNA) runs the Pallas kernel in both
variants; only the sketch cross attention switches backend, isolating the
fixed-taps cross kernel's end-to-end contribution.
"""
import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from nuwa_tpu.utils.timing import device_rate  # noqa: E402


def _sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--fmap", type=int, default=16)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--depth", type=int, default=6)
    args = ap.parse_args()

    from nuwa_tpu.models import NUWASketch
    from nuwa_tpu.vqgan_vae import VQGanVAE

    img = args.fmap * 2  # 1-layer VAE: fmap_size == args.fmap
    vae = VQGanVAE(
        dim=32, image_size=img, num_layers=1, vq_codebook_size=1024,
        use_vgg_and_gan=False, vq_kmeans_init=False, use_attn=False,
        num_resnet_blocks=0,
    )

    def model_for(backend):
        return NUWASketch(
            dim=args.dim, vae=vae, sketch_vae=vae, image_size=img,
            max_video_frames=args.frames, sketch_max_video_frames=1,
            sketch_enc_depth=2, sketch_enc_dim_head=64, sketch_enc_heads=8,
            dec_depth=args.depth, dec_dim_head=64, dec_heads=8,
            dec_reversible=True, sparse_3dna_kernel_size=(5, 3, 3),
            sparse_3dna_dilation=(1, 2, 4), shift_video_tokens=True,
            cross_2dna_backend=backend, compute_dtype="bfloat16",
        )

    b = args.batch
    video = jnp.zeros((b, args.frames, 3, img, img), jnp.float32)
    sketch = jnp.zeros((b, 1, 3, img, img), jnp.float32)
    tokens = args.frames * args.fmap * args.fmap

    vae_params = vae.init(jax.random.PRNGKey(10))
    vae_state = vae.init_state(jax.random.PRNGKey(11))

    results = {}
    for backend in ("gather", "auto"):
        model = model_for(backend)
        params = model.init(
            jax.random.PRNGKey(0), vae_params=vae_params, vae_state=vae_state,
            sketch_vae_params=vae_params, sketch_vae_state=vae_state,
        )

        def loss_fn(p, key):
            return model.forward(
                p, sketch=sketch, video=video, return_loss=True, train=True,
                key=key,
            )

        step = jax.jit(jax.grad(loss_fn))
        g = step(params, jax.random.PRNGKey(1))
        _sync(g["video_bos"])
        counter = iter(range(2, 10_000))
        dt = device_rate(
            lambda: step(params, jax.random.PRNGKey(next(counter)))["video_bos"],
            k_lo=1, k_hi=5,
        )
        results[backend] = dt
        print(
            f"cross backend {backend:6s}: {dt*1e3:8.2f} ms/step "
            f"({b * tokens / dt:,.0f} tok/s)",
            flush=True,
        )
    print(f"speedup auto(pallas) vs gather: {results['gather']/results['auto']:.3f}x",
          flush=True)


if __name__ == "__main__":
    main()
