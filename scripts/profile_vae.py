"""VQ-VAE roundtrip ablation on the real chip.

Run: python scripts/profile_vae.py [--batch 32] [--image-size 256]

Times encode-only and structural ablations (attention, resnet blocks,
first-conv kernel size, activation dtype) at the bench config (dim 128,
4 layers). Historical note: the first run of this script used per-iteration
syncs and read a 53 ms roundtrip — that launched the round-3 timing
investigation; with the relay constant cancelled the roundtrip is ~27.5 ms
for 32 frames ≈ 44% of the ~75 GFLOP/frame conv roofline, i.e. the codec
was never slow.
"""
import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def _sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def time_fn(fn, *args, iters=5, warmup=2):
    from nuwa_tpu.utils.timing import device_rate

    for _ in range(warmup):
        _sync(fn(*args))
    return device_rate(lambda: fn(*args))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()

    from nuwa_tpu.vqgan_vae import VQGanVAE

    def build(**kw):
        cfg = dict(
            dim=args.dim, image_size=args.image_size, num_layers=4,
            vq_codebook_size=512, use_vgg_and_gan=False, vq_kmeans_init=False,
            use_attn=True, num_resnet_blocks=1,
        )
        cfg.update(kw)
        return VQGanVAE(**cfg)

    img = jnp.asarray(
        np.random.default_rng(0).uniform(
            size=(args.batch, 3, args.image_size, args.image_size)
        ),
        jnp.bfloat16,
    )

    def bench(tag, vae):
        p = vae.init(jax.random.PRNGKey(0))
        s = vae.init_state(jax.random.PRNGKey(1))

        def enc(p, s, img):
            fmap, _, _, _ = vae.encode(p, s, img)
            return fmap

        def roundtrip(p, s, img):
            fmap, indices, _, _ = vae.encode(p, s, img)
            codes = jnp.take(vae.codebook(p, s), indices, axis=0)
            codes = codes.reshape(args.batch, vae.fmap_size, vae.fmap_size, -1)
            codes = codes.astype(jnp.bfloat16)
            return jnp.sum(vae.decode(p, jnp.transpose(codes, (0, 3, 1, 2))))

        dt_e = time_fn(jax.jit(enc), p, s, img)
        dt_r = time_fn(jax.jit(roundtrip), p, s, img)
        print(
            f"{tag:28s}: roundtrip {dt_r*1e3:7.2f} ms "
            f"({args.batch/dt_r:6.0f} fps)  encode {dt_e*1e3:7.2f} ms",
            flush=True,
        )
        return dt_r

    base = bench("baseline (bench config)", build())
    bench("no attention", build(use_attn=False))
    bench("no resnet blocks", build(num_resnet_blocks=0))
    bench("first conv 3x3", build(first_conv_kernel_size=3))
    bench("fp32 input", build())  # same model; input dtype changes below

    # input dtype sensitivity: fp32 img drives fp32 convs end to end
    vae = build()
    p = vae.init(jax.random.PRNGKey(0))
    s = vae.init_state(jax.random.PRNGKey(1))
    img32 = img.astype(jnp.float32)

    def roundtrip32(p, s, img):
        fmap, indices, _, _ = vae.encode(p, s, img)
        codes = jnp.take(vae.codebook(p, s), indices, axis=0)
        codes = codes.reshape(args.batch, vae.fmap_size, vae.fmap_size, -1)
        return jnp.sum(vae.decode(p, jnp.transpose(codes, (0, 3, 1, 2))))

    dt = time_fn(jax.jit(roundtrip32), p, s, img32)
    print(f"{'fp32 activations':28s}: roundtrip {dt*1e3:7.2f} ms "
          f"({args.batch/dt:6.0f} fps)", flush=True)


if __name__ == "__main__":
    main()
