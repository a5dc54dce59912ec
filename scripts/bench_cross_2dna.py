"""SparseCross2DNA cost share: is a Pallas kernel warranted?

Run on the real TPU (axon backend):
    python scripts/bench_cross_2dna.py [--fmap 16] [--frames 10]

Unlike the self-attention NDAs, the cross op's neighborhood gather runs over
the *context* only (HW·Fc·Kn rows, amortized across all query frames), and
its score matmul already does useful-work-only FLOPs (Kn·Fc keys per query).
A dense-tile Pallas kernel would compute HW/Kn ≈ 28× more score FLOPs to
avoid a gather that is 1/fq the size of the self-attention one. This bench
puts numbers on that: fwd+bwd time of the cross op vs the Sparse3DNA self op
(Pallas) at the same query token count, sketch-decoder config
(reference SparseCross2DNA semantics: nuwa_pytorch.py:761-901).
"""
import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def _sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def time_fn(fn, *args, iters=20, warmup=3):
    from nuwa_tpu.utils.timing import device_rate

    for _ in range(warmup):
        s = _sync(fn(*args))
    return device_rate(lambda: fn(*args), k_lo=4, k_hi=20), s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fmap", type=int, default=16)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--ctx-frames", type=int, default=1)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim-head", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument(
        "--probe-recompute", action="store_true",
        help="additionally time the Pallas backward with the flash QK score "
             "recompute stubbed out (wrong numerics, timing only) to "
             "decompose the fwd+bwd time into recompute vs the rest",
    )
    args = ap.parse_args()

    from nuwa_tpu.nda import Sparse3DNA, SparseCross2DNA

    key = jax.random.PRNGKey(0)
    hw = args.fmap * args.fmap
    t = args.frames * hw  # decoder inputs incl. bos slot
    ctx_len = args.ctx_frames * hw

    cross = SparseCross2DNA(
        dim=args.dim, image_size=args.fmap, heads=args.heads,
        dim_head=args.dim_head, kernel_size=3, dilation=1, backend="gather",
    )
    cross_d = cross.replace(backend="dense")
    cross_p = cross.replace(backend="pallas", use_pallas=True)
    self3d = Sparse3DNA(
        dim=args.dim, video_shape=(args.frames, args.fmap, args.fmap),
        kernel_size=(3, 3, 3), dilation=1, heads=args.heads,
        dim_head=args.dim_head, causal=True, rel_pos_bias=True,
    )

    pc = cross.init(key)
    ps = self3d.init(jax.random.PRNGKey(1))
    x = jax.random.normal(key, (args.batch, t, args.dim))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (args.batch, ctx_len, args.dim))
    w = jax.random.normal(jax.random.PRNGKey(3), x.shape)

    f_cross = jax.jit(lambda p, x, c: cross(p, x, context=c))
    f_dense = jax.jit(lambda p, x, c: cross_d(p, x, context=c))
    f_self = jax.jit(lambda p, x: self3d(p, x, num_frames=args.frames))
    g_cross = jax.jit(jax.grad(lambda p, x, c: jnp.sum(cross(p, x, context=c) * w)))
    g_dense = jax.jit(jax.grad(lambda p, x, c: jnp.sum(cross_d(p, x, context=c) * w)))
    g_self = jax.jit(jax.grad(lambda p, x: jnp.sum(self3d(p, x, num_frames=args.frames) * w)))

    d = jax.jit(lambda p, x, c: jnp.max(jnp.abs(f_cross(p, x, c) - f_dense(p, x, c))))
    print(f"dense-vs-gather max|diff| = {float(np.asarray(d(pc, x, ctx))):.3e}", flush=True)

    dt, _ = time_fn(f_cross, pc, x, ctx)
    print(f"cross gather fwd     : {dt*1e3:8.2f} ms", flush=True)
    dt_c, _ = time_fn(lambda p, x, c: g_cross(p, x, c)["to_q"]["w"], pc, x, ctx)
    print(f"cross gather fwd+bwd : {dt_c*1e3:8.2f} ms", flush=True)
    dt, _ = time_fn(f_dense, pc, x, ctx)
    print(f"cross dense fwd      : {dt*1e3:8.2f} ms", flush=True)
    dt_d, _ = time_fn(lambda p, x, c: g_dense(p, x, c)["to_q"]["w"], pc, x, ctx)
    print(f"cross dense fwd+bwd  : {dt_d*1e3:8.2f} ms ({dt_c/dt_d:.2f}x vs gather)", flush=True)

    f_pl = jax.jit(lambda p, x, c: cross_p(p, x, context=c))
    g_pl = jax.jit(jax.grad(lambda p, x, c: jnp.sum(cross_p(p, x, context=c) * w)))
    dp = jax.jit(lambda p, x, c: jnp.max(jnp.abs(f_cross(p, x, c) - f_pl(p, x, c))))
    print(f"pallas-vs-gather max|diff| = {float(np.asarray(dp(pc, x, ctx))):.3e}", flush=True)
    dt, _ = time_fn(f_pl, pc, x, ctx)
    print(f"cross pallas fwd     : {dt*1e3:8.2f} ms", flush=True)
    dt_p, _ = time_fn(lambda p, x, c: g_pl(p, x, c)["to_q"]["w"], pc, x, ctx)
    print(f"cross pallas fwd+bwd : {dt_p*1e3:8.2f} ms ({dt_c/dt_p:.2f}x vs gather)", flush=True)
    dt, _ = time_fn(f_self, ps, x)
    print(f"self-3DNA fwd        : {dt*1e3:8.2f} ms", flush=True)
    dt_s, _ = time_fn(lambda p, x: g_self(p, x)["to_q"]["w"], ps, x)
    print(f"self-3DNA fwd+bwd    : {dt_s*1e3:8.2f} ms", flush=True)
    print(f"dense cross/self train ratio: {dt_d/dt_s:.3f}", flush=True)

    if args.probe_recompute:
        # VERDICT-r4 #4(b): make "the residual is flash recompute" a number.
        # Rebuild the jitted grad with the probe flag baked in: the backward
        # kernel skips its QK score-recompute matmuls (gradients are wrong —
        # timing only). delta = what a cached-score backward would save.
        import nuwa_tpu.kernels.nda_pallas as K

        K._PROBE_SKIP_SCORES = True
        try:
            g_probe = jax.jit(
                jax.grad(lambda p, x, c: jnp.sum(cross_p(p, x, context=c) * w))
            )
            dt_pr, _ = time_fn(
                lambda p, x, c: g_probe(p, x, c)["to_q"]["w"], pc, x, ctx
            )
        finally:
            K._PROBE_SKIP_SCORES = False
        saved = dt_p - dt_pr
        print(
            f"cross pallas fwd+bwd, no score recompute (timing probe): "
            f"{dt_pr*1e3:8.2f} ms -> recompute share {saved*1e3:.2f} ms "
            f"= {100*saved/dt_p:.1f}% of fwd+bwd "
            f"(cached-score bwd would still cost {dt_pr*1e3:.2f} ms "
            f"+ the cache traffic)", flush=True,
        )


if __name__ == "__main__":
    main()
