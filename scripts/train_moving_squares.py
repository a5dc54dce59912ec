"""Signs-of-life demo: train the full pipeline on synthetic moving squares.

The reference's de-facto validation is "signs of life on moving MNIST"
(reference README.md:15). This script is the equivalent end-to-end exercise,
small enough for one TPU chip in a few minutes: a VQGAN codec on synthetic
frames, NUWA on (direction-word, video) pairs, then text-conditioned
generation written to docs/.

Run: python scripts/train_moving_squares.py [--steps 300] [--size 256]

``--size 256`` is the flagship-resolution demonstration (VERDICT r3 #7):
256px frames through a 4-layer VAE (fmap 16 — the production token grid),
GAN + random-VGG perceptual loss, NUWA on its indices, artifacts suffixed
``_256px`` plus loss curves, all in docs/.
"""
import argparse
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from nuwa_tpu import NUWA, VQGanVAE
from nuwa_tpu.models.nuwa import cross_entropy  # noqa: F401
from nuwa_tpu.tokenizer import tokenizer
from nuwa_tpu.utils.image import array_to_gif, save_image_grid

DIRECTIONS = {
    "right": (0, 1),
    "down": (1, 0),
    "left": (0, -1),
    "up": (-1, 0),
}


def device_batch_fn(frames=4, size=64, square=None, batch=4):
    """Synthesize (text, video) batches ON DEVICE — host->device uploads are
    prohibitively slow through the tunnel, so data generation is jitted."""
    square = square if square is not None else size // 4
    step_px = 2 * (size // 64)  # velocity scales with resolution
    names = list(DIRECTIONS)
    toks = np.zeros((4, 2), np.int64)
    for i, name in enumerate(names):
        enc = tokenizer.encode(name)[:2]
        toks[i, : len(enc)] = enc
    toks = jnp.asarray(toks)
    vels = jnp.asarray([DIRECTIONS[n] for n in names]) * step_px  # (4, 2)

    def make(key):
        kd, ky, kx, kc = jax.random.split(key, 4)
        d = jax.random.randint(kd, (batch,), 0, 4)
        y0 = jax.random.randint(ky, (batch,), square, size - 2 * square)
        x0 = jax.random.randint(kx, (batch,), square, size - 2 * square)
        # wide per-channel range: saturated colors give the codec a real
        # chroma gradient (0.5-1.0 pastels let an all-white recon score
        # within ~0.02 L1 of perfect — observed as color collapse at 256px)
        color = jax.random.uniform(kc, (batch, 3), minval=0.15, maxval=1.0)
        dy = vels[d][:, 0]
        dx = vels[d][:, 1]

        f_idx = jnp.arange(frames)
        yy = y0[:, None] + dy[:, None] * f_idx[None]  # (b, f)
        xx = x0[:, None] + dx[:, None] * f_idx[None]
        rows = jnp.arange(size)
        in_y = (rows[None, None, :] >= yy[..., None]) & (
            rows[None, None, :] < yy[..., None] + square
        )  # (b, f, size)
        in_x = (rows[None, None, :] >= xx[..., None]) & (
            rows[None, None, :] < xx[..., None] + square
        )
        m = in_y[:, :, None, :, None] & in_x[:, :, None, None, :]  # (b,f,1,h,w)
        vid = m * color[:, None, :, None, None]
        return toks[d], vid.astype(jnp.float32)

    return make


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--nuwa-steps", type=int, default=None,
                    help="NUWA training steps (default 2x --steps)")
    ap.add_argument("--out", type=str, default=str(REPO / "docs"))
    ap.add_argument("--no-gan", action="store_true",
                    help="plain recon+VQ codec (skip GAN + perceptual)")
    ap.add_argument("--size", type=int, default=64,
                    help="frame resolution (64 = signs-of-life, 256 = flagship)")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    size = args.size
    sfx = "" if size == 64 else f"_{size}px"
    frames = 4
    make_batch = device_batch_fn(frames=frames, size=size)

    # ---- 1. codec ---------------------------------------------------------
    # full GAN mode with the random-feature perceptual loss (the documented
    # no-pretrained-weights stand-in for torchvision VGG16 — see
    # nuwa_tpu/perceptual.py); --no-gan selects the plain recon+VQ path
    use_gan = not args.no_gan
    num_layers = 3 if size <= 64 else 4  # 256px -> fmap 16, the production grid
    vae = VQGanVAE(
        dim=32, image_size=size, num_layers=num_layers, vq_codebook_size=256,
        vq_codebook_dim=32, use_vgg_and_gan=use_gan, perceptual="random_vgg",
        resnet_groups=8, use_attn=False, num_resnet_blocks=1,
        vq_kmeans_init=True,
        # synthetic high-contrast frames saturate the discriminator fast;
        # the reference 1e4 cap then amplifies a vanishing generator grad
        # and collapses the codec (observed at 256px) — cap at 1
        adaptive_weight_cap=1.0,
    )
    vp = vae.init(jax.random.PRNGKey(0))
    vs = vae.init_state(jax.random.PRNGKey(1))["vq"]

    import optax

    from nuwa_tpu.train.optimizer import get_optimizer

    def split_gan(p):
        gen = {k: v for k, v in p.items() if k != "discr"}
        return gen, p.get("discr")

    gen0, discr0 = split_gan(vp)
    vtx = get_optimizer(lr=3e-4, wd=0.0, params=gen0, frozen_keys=())
    vopt = vtx.init(gen0)
    dtx = get_optimizer(lr=3e-4, wd=0.0, params=discr0, frozen_keys=()) if use_gan else None
    dopt = dtx.init(discr0) if use_gan else None

    @jax.jit
    def vae_step(p, s, opt, dopt, key):
        dkey, dkey2, rng_key = jax.random.split(key, 3)
        _, vids = make_batch(dkey)
        imgs = vids.reshape(-1, 3, size, size)
        gen, discr = split_gan(p)

        def gen_loss_fn(gen, s):
            params = dict(gen)
            if discr is not None:
                params["discr"] = jax.lax.stop_gradient(discr)
            loss, s2 = vae.forward(params, {"vq": s}, imgs, return_loss=True, rng=rng_key)
            return loss, s2["vq"]

        (loss, s), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(gen, s)
        updates, opt = vtx.update(grads, opt, gen)
        gen = optax.apply_updates(gen, updates)

        dloss = jnp.asarray(0.0)
        if discr is not None:
            _, vids2 = make_batch(dkey2)
            imgs2 = vids2.reshape(-1, 3, size, size)

            def discr_loss_fn(discr):
                params = dict(jax.lax.stop_gradient(gen))
                params["discr"] = discr
                return vae.forward(params, {"vq": s}, imgs2, return_discr_loss=True)

            dloss, dgrads = jax.value_and_grad(discr_loss_fn)(discr)
            dupdates, dopt = dtx.update(dgrads, dopt, discr)
            discr = optax.apply_updates(discr, dupdates)

        p = dict(gen)
        if discr is not None:
            p["discr"] = discr
        return p, s, opt, dopt, loss, dloss

    # recon-only warmup before the adversarial phase (classic VQGAN
    # disc_start): at 256px the discriminator saturates early (discr loss
    # -> 0) and the adaptive weight then amplifies a vanishing generator
    # signal — warming the codec up first keeps the GAN phase stable
    vae_plain = vae.replace(use_vgg_and_gan=False) if use_gan else vae
    warmup = args.steps // 2 if use_gan else 0

    @jax.jit
    def vae_step_plain(p, s, opt, key):
        dkey, rng_key = jax.random.split(key)
        _, vids = make_batch(dkey)
        imgs = vids.reshape(-1, 3, size, size)
        gen, discr = split_gan(p)

        def gen_loss_fn(gen, s):
            loss, s2 = vae_plain.forward(
                gen, {"vq": s}, imgs, return_loss=True, rng=rng_key
            )
            return loss, s2["vq"]

        (loss, s), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(gen, s)
        updates, opt = vtx.update(grads, opt, gen)
        gen = optax.apply_updates(gen, updates)
        p = dict(gen)
        if discr is not None:
            p["discr"] = discr
        return p, s, opt, loss

    # best-checkpoint tracking: on this degenerate synthetic data the
    # commit-loss <-> recon tug-of-war makes VQ training oscillate (it
    # repeatedly reaches good recon then collapses — measured across
    # cosine/euclidean, decay 0.8/0.99, clip on/off); keep the params with
    # the best probe-batch recon L1, the standard early-stopping answer
    _, probe_vids = jax.jit(make_batch)(jax.random.PRNGKey(99))
    probe = probe_vids.reshape(-1, 3, size, size)

    @jax.jit
    def probe_l1(p, s):
        recon = vae.forward(p, {"vq": s}, probe)
        return jnp.mean(jnp.abs(recon - probe))

    best = {"l1": float("inf"), "p": vp, "s": vs, "step": -1}

    def track(step, p, s):
        l1 = float(probe_l1(p, s))
        if l1 < best["l1"]:
            best.update(l1=l1, p=p, s=s, step=step)
        return l1

    key = jax.random.PRNGKey(2)
    vae_losses = []
    for step in range(warmup):
        key, sub = jax.random.split(key)
        vp, vs, vopt, loss = vae_step_plain(vp, vs, vopt, sub)
        if step % 10 == 0:
            vae_losses.append((step, float(loss)))
            track(step, vp, vs)
        if step % 100 == 0:
            print(f"vae warmup step {step}: loss {float(loss):.4f}", flush=True)
    for step in range(warmup, args.steps):
        key, sub = jax.random.split(key)
        vp, vs, vopt, dopt, loss, dloss = vae_step(vp, vs, vopt, dopt, sub)
        if step % 10 == 0:
            vae_losses.append((step, float(loss)))
            track(step, vp, vs)
        if step % 100 == 0:
            msg = f"vae step {step}: loss {float(loss):.4f}"
            if use_gan:
                msg += f" discr {float(dloss):.4f}"
            print(msg, flush=True)
    print(
        f"vae final loss {float(loss):.4f}; best probe l1 {best['l1']:.4f} "
        f"at step {best['step']} (restored)", flush=True,
    )
    vp, vs = best["p"], best["s"]

    # reconstruction artifact (render on device, fetch the small grid once)
    imgs = probe[:4]
    recon = jax.jit(lambda p, s, im: vae.forward(p, {"vq": s}, im))(vp, vs, imgs)
    # fetch as uint8: device->host through the tunnel is slow, 4x smaller
    to_u8 = jax.jit(lambda x: (jnp.clip(x, 0, 1) * 255).astype(jnp.uint8))
    pair = np.stack(
        [np.asarray(to_u8(imgs)), np.asarray(to_u8(recon))], 1
    ).reshape(-1, 3, size, size).astype(np.float32) / 255.0
    save_image_grid(pair, out / f"vae_recon{sfx}.png", nrow=2)

    # ---- 2. NUWA ----------------------------------------------------------
    model = NUWA(
        dim=192, vae=vae, max_video_frames=frames, text_num_tokens=tokenizer.vocab_size,
        text_max_seq_len=8, text_enc_depth=1, text_enc_dim_head=32, text_enc_heads=4,
        dec_depth=3, dec_dim_head=32, dec_heads=4, sparse_3dna_kernel_size=3,
        sparse_3dna_dilation=1, shift_video_tokens=True,
    )
    params = model.init(jax.random.PRNGKey(3), vae_params=vp, vae_state={"vq": vs})
    ntx = get_optimizer(lr=6e-4, wd=0.01, params=params, max_grad_norm=0.5)
    nopt = ntx.init(params)

    @jax.jit
    def nuwa_step(p, opt, key):
        dkey, k = jax.random.split(key)
        text, video = make_batch(dkey)

        def loss_fn(p):
            return model.forward(p, text=text, video=video, return_loss=True,
                                 key=k, train=True)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt = ntx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    key = jax.random.PRNGKey(4)
    nuwa_losses = []
    nuwa_steps = args.nuwa_steps if args.nuwa_steps is not None else args.steps * 2
    for step in range(nuwa_steps):
        key, sub = jax.random.split(key)
        params, nopt, loss = nuwa_step(params, nopt, sub)
        if step % 20 == 0:
            nuwa_losses.append((step, float(loss)))
        if step % 100 == 0:
            print(f"nuwa step {step}: loss {float(loss):.4f}", flush=True)
    print(f"nuwa final loss {float(loss):.4f}", flush=True)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(9, 3))
        for ax, pts, title in (
            (axes[0], vae_losses, "VQGAN-VAE loss"),
            (axes[1], nuwa_losses, "NUWA loss"),
        ):
            xs, ys = zip(*pts)
            ax.plot(xs, ys)
            ax.set_title(title)
            ax.set_xlabel("step")
        fig.tight_layout()
        fig.savefig(out / f"loss_curves{sfx}.png", dpi=100)
        print(f"wrote {out}/loss_curves{sfx}.png", flush=True)
    except ImportError:
        np.savetxt(out / f"loss_curves{sfx}.csv",
                   np.asarray([(s_, l) for s_, l in vae_losses + nuwa_losses]),
                   header="step,loss")

    # ---- 3. generate ------------------------------------------------------
    for d in ("right", "down"):
        t = np.zeros((1, 2), np.int64)
        enc = tokenizer.encode(d)[:2]
        t[0, : len(enc)] = enc
        video = model.generate(params, text=jnp.asarray(t), key=jax.random.PRNGKey(7),
                               cond_scale=1.5)
        u8 = jax.jit(lambda x: (jnp.clip(x, 0, 1) * 255).astype(jnp.uint8))(video[0])
        arr = np.asarray(u8).astype(np.float32) / 255.0
        array_to_gif(arr, out / f"sample_{d}{sfx}.gif")
        save_image_grid(arr, out / f"sample_{d}{sfx}.png", nrow=frames)
        print(f"wrote {out}/sample_{d}{sfx}.gif", flush=True)


if __name__ == "__main__":
    main()
