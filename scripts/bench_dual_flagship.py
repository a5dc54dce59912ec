"""BASELINE config #5 at flagship scale: depth-64 reversible dual decoder,
256px-class video (fmap 16 through a 4-layer VAE), one measured train step
on the real chip + activation-memory analysis.

    python scripts/bench_dual_flagship.py [--depth 64] [--fmap 16]

Reports ms/step, train tokens/sec, and compiled.memory_analysis() numbers
(activation peak = peak_memory - argument/output sizes; temp_size
misclassifies reversible buffers — see scripts/measure_memory.py).
"""
import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def _sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=64)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--fmap", type=int, default=16)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--audio-tpf", type=int, default=32)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim-head", type=int, default=64)
    ap.add_argument(
        "--remat", action="store_true",
        help="dec_reversible=False + dec_remat=True: the layout PP imposes "
             "(pipeline stages exclude the reversible runtime) — quantifies "
             "the remat-instead-of-reversible trade at flagship scale",
    )
    args = ap.parse_args()

    import optax

    from nuwa_tpu.models import NUWAVideoAudio
    from nuwa_tpu.train.optimizer import get_optimizer
    from nuwa_tpu.vqgan_vae import VQGanVAE

    # 4-layer VAE => image_size = fmap * 16 = 256px class at fmap 16
    vae = VQGanVAE(
        dim=16, image_size=args.fmap * 16, num_layers=4, vq_codebook_size=1024,
        vq_codebook_dim=64, use_vgg_and_gan=False, vq_kmeans_init=False,
        use_attn=False, num_resnet_blocks=0, resnet_groups=8,
    )
    model = NUWAVideoAudio(
        vae=vae,
        dim=args.dim,
        image_size=args.fmap * 16,
        num_audio_tokens=1024,
        num_audio_tokens_per_video_frame=args.audio_tpf,
        audio_tokens_per_timestep=4,
        max_video_frames=args.frames,
        text_num_tokens=49408,
        text_max_seq_len=32,
        text_enc_depth=2,
        text_enc_dim_head=args.dim_head,
        text_enc_heads=args.heads,
        dec_depth=args.depth,
        dec_dim_head=args.dim_head,
        dec_heads=args.heads,
        dec_reversible=not args.remat,
        dec_remat=args.remat,
        sparse_3dna_kernel_size=3,
        sparse_3dna_dilation=(1, 2),
        shift_video_tokens=True,
        shift_audio_tokens=True,
        cross_modality_attn_every=3,
        compute_dtype="bfloat16",
    )
    vkey = jax.random.PRNGKey(7)
    params = model.init(
        jax.random.PRNGKey(0),
        vae_params=vae.init(vkey),
        vae_state=vae.init_state(vkey),
    )
    n_params = sum(int(np.prod(t.shape)) for t in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f} M", flush=True)

    tx = get_optimizer(lr=3e-4, wd=0.01, params=params, max_grad_norm=0.5)
    opt = tx.init(params)
    vtok = args.frames * model.num_video_tokens_per_frame
    atok = args.frames * args.audio_tpf
    b = args.batch
    text = jnp.ones((b, 32), jnp.int32)
    video = jnp.zeros((b, vtok), jnp.int32)
    audio = jnp.zeros((b, atok), jnp.int32)

    def loss_fn(p, key):
        return model.forward(
            p, text=text, video=video, audio=audio, return_loss=True,
            key=key, train=True,
        )

    def step(p, opt, key):
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(p, sub)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, key, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    print("compiling...", flush=True)
    t0 = time.perf_counter()
    compiled = jstep.lower(params, opt, jax.random.PRNGKey(1)).compile()
    print(f"compiled in {time.perf_counter()-t0:.0f}s", flush=True)

    try:
        ma = compiled.memory_analysis()
        arg_out = ma.argument_size_in_bytes + ma.output_size_in_bytes
        act = ma.peak_memory_in_bytes - arg_out
        print(
            f"memory: peak {ma.peak_memory_in_bytes/2**30:.2f} GiB, "
            f"args+out {arg_out/2**30:.2f} GiB, "
            f"activations+temps {act/2**20:.0f} MiB", flush=True,
        )
    except Exception as e:
        print("memory_analysis unavailable:", repr(e)[:120], flush=True)

    from nuwa_tpu.utils.timing import device_rate

    state = list(compiled(params, opt, jax.random.PRNGKey(1)))
    _sync(state[-1])

    def dispatch():
        state[:] = compiled(*state[:-1])
        return state[-1]

    dt = device_rate(dispatch, k_lo=1, k_hi=5)
    print(
        f"depth-{args.depth} dual train step: {dt*1e3:.1f} ms/step, "
        f"{b*(vtok+atok)/dt:.0f} tok/s (video {vtok} + audio {atok} tokens, "
        f"batch {b})", flush=True,
    )
    # kernel-aware analytic MFU (XLA's cost model reports 0 FLOPs for the
    # Pallas custom calls, so its MFU is only a floor) — VERDICT-r4 #3
    from bench import _analytic_dual_flops

    afl = _analytic_dual_flops(model, args.frames, b, 32)
    print(
        f"analytic MFU: {afl / dt / 197e12:.3f} ({afl/1e12:.2f} TF/step, "
        f"kernel-aware matmul count)", flush=True,
    )
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl = float(ca.get("flops", 0.0))
        if fl > 0:
            # XLA-counted (reports 0 for Pallas custom calls -> a floor)
            print(
                f"XLA-counted MFU: {fl / dt / 197e12:.3f} "
                f"({fl/1e12:.2f} TF/step; excludes Pallas kernel flops)",
                flush=True,
            )
    except Exception:
        pass


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    # the axon tunnel's device teardown can hang for an hour after the
    # results are printed; results are complete at this point
    import os

    os._exit(0)
