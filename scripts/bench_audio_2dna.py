"""SparseCausal2DNA (audio) Pallas kernel: compiled-chip parity + timing.

Run on the real TPU (axon backend):
    python scripts/bench_audio_2dna.py [--height 4] [--timesteps 256]

Compares the fused per-tap Pallas path against the XLA gather path:
  * forward parity,
  * grad parity (fp32 params; bf16 score cache bounds the deviation),
  * train-style fwd+bwd step time for both backends,
  * a dual-decoder (video+audio) train step with and without the audio
    kernel (the video tower runs Pallas in both — isolates the audio win).
"""
import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def _sync(x):
    """Force completion through the tunnel: reduce in-graph, fetch scalar."""
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def time_fn(fn, *args, iters=20, warmup=3):
    from nuwa_tpu.utils.timing import device_rate

    for _ in range(warmup):
        s = _sync(fn(*args))
    return device_rate(lambda: fn(*args), k_lo=4, k_hi=20), s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=4)
    ap.add_argument("--timesteps", type=int, default=256)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim-head", type=int, default=64)
    ap.add_argument("--kernel", type=int, default=5)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--skip-dual", action="store_true")
    args = ap.parse_args()

    from nuwa_tpu.nda import SparseCausal2DNA

    key = jax.random.PRNGKey(0)
    t = args.timesteps * args.height - 1  # ragged tail
    mod_x = SparseCausal2DNA(
        dim=args.dim, height=args.height, heads=args.heads,
        dim_head=args.dim_head, kernel_size=args.kernel, dilation=1,
        rel_pos_bias=True, backend="gather",
    )
    mod_p = mod_x.replace(backend="auto", use_pallas=True)
    p = mod_x.init(key)
    x = jax.random.normal(key, (args.batch, 1 + t, args.dim))
    w = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    # ---- forward parity ---------------------------------------------------
    f_x = jax.jit(lambda p, x: mod_x(p, x))
    f_p = jax.jit(lambda p, x: mod_p(p, x))
    diff = jax.jit(lambda p, x: jnp.max(jnp.abs(f_x(p, x) - f_p(p, x))))
    print(f"forward max|diff| = {float(np.asarray(diff(p, x))):.3e}", flush=True)

    # ---- grad parity --------------------------------------------------------
    def loss(mod):
        return lambda p, x: jnp.sum(mod(p, x) * w)

    g_x = jax.jit(jax.grad(loss(mod_x), argnums=(0, 1)))
    g_p = jax.jit(jax.grad(loss(mod_p), argnums=(0, 1)))

    def gdiff(p, x):
        a = g_x(p, x)
        b = g_p(p, x)
        return jnp.max(
            jnp.stack([
                jnp.max(jnp.abs(u - v)) / (jnp.max(jnp.abs(u)) + 1e-9)
                for u, v in zip(jax.tree.leaves(a), jax.tree.leaves(b))
            ])
        )
    print(f"grad max rel diff = {float(np.asarray(jax.jit(gdiff)(p, x))):.3e}",
          flush=True)

    # ---- timing: fwd+bwd step ----------------------------------------------
    def step(mod):
        def f(p, x):
            l, g = jax.value_and_grad(lambda p: jnp.sum(mod(p, x) * w))(p)
            return l + sum(jnp.sum(t) for t in jax.tree.leaves(g))
        return jax.jit(f)

    dt_x, _ = time_fn(step(mod_x), p, x)
    dt_p, _ = time_fn(step(mod_p), p, x)
    print(f"audio 2DNA fwd+bwd: gather {dt_x*1e3:.2f} ms  pallas {dt_p*1e3:.2f} ms "
          f"({dt_x/dt_p:.2f}x)", flush=True)

    if args.skip_dual:
        return

    # ---- dual-decoder train step: audio kernel off vs on --------------------
    from nuwa_tpu.dual_decoder import ReversibleDualModalityDecoder

    fmap, frames, atps = 16, 4, args.height
    natpf = 8 * atps  # 8 audio timesteps per video frame
    dd = dict(
        dim=args.dim, depth=4, heads=args.heads, dim_head=args.dim_head,
        num_audio_tokens_per_video_frame=natpf,
        num_video_tokens_per_frame=fmap * fmap,
        sparse_3dna_video_shape=(frames, fmap, fmap),
        sparse_3dna_kernel_size=3, sparse_3dna_rel_pos_bias=True,
        sparse_3dna_use_pallas=True,
        sparse_2dna_kernel_size=args.kernel, sparse_2dna_rel_pos_bias=True,
        audio_tokens_per_timestep=atps, shift_video_tokens=True,
        shift_audio_tokens=True, cross_modality_attn_every=2,
    )
    # the video tower runs Pallas in both — only the audio backend differs
    dec_off = ReversibleDualModalityDecoder(**dd, sparse_2dna_backend="gather")
    dec_on = ReversibleDualModalityDecoder(**dd, sparse_2dna_use_pallas=True)

    pd = dec_on.init(key)
    nv = frames * fmap * fmap
    na = frames * natpf
    video = jax.random.normal(key, (args.batch, 1 + nv - 1, args.dim))
    audio = jax.random.normal(key, (args.batch, 1 + na - 1, args.dim))
    ctx = jax.random.normal(key, (args.batch, 32, args.dim))
    wv = jax.random.normal(jax.random.PRNGKey(2), video.shape)
    wa = jax.random.normal(jax.random.PRNGKey(3), audio.shape)

    def dual_step(dec):
        # audio 'gather' backend must be forced through the blocks: rebuild
        # with backend='gather' on the 2DNA modules via sparse_2dna_use_pallas
        def f(p):
            v, a = dec(p, video, audio, context=ctx)
            l = jnp.sum(v * wv) + jnp.sum(a * wa)
            return l
        def g(p):
            l, gr = jax.value_and_grad(f)(p)
            return l + sum(jnp.sum(t) for t in jax.tree.leaves(gr))
        return jax.jit(g)

    dt_off, _ = time_fn(dual_step(dec_off), pd, iters=10)
    dt_on, _ = time_fn(dual_step(dec_on), pd, iters=10)
    print(f"dual depth-4 train step: audio-gather {dt_off*1e3:.1f} ms  "
          f"audio-pallas {dt_on*1e3:.1f} ms ({dt_off/dt_on:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
