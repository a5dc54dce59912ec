"""Lane-packed Sparse3DNA at fmap 8 (HW=64 < 128 lanes) on the real chip:
compiled parity vs the dense-XLA fallback + op/train-step timing
(VERDICT-r4 #5 — the driver's headline config previously had NO kernel
path; kernels.nda_pallas.packed_frames packs 2 frames per 128-lane
super-frame so the whole-frame kernels apply).

    python scripts/bench_nda_fmap8.py [--frames 10] [--dim 512]
"""
import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, ".")


def _sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


_KLO, _KHI = 4, 20


def time_fn(fn, *args):
    from nuwa_tpu.utils.timing import device_rate

    s = _sync(fn(*args))
    return device_rate(lambda: fn(*args), k_lo=_KLO, k_hi=_KHI), s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--fmap", type=int, default=8)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim-head", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dilation", type=int, default=2)
    ap.add_argument("--train-step", action="store_true",
                    help="also time a NUWA train step pallas-auto vs dense")
    ap.add_argument("--klo", type=int, default=4,
                    help="two-point timing: low dispatch count")
    ap.add_argument("--khi", type=int, default=20,
                    help="two-point timing: high dispatch count (sub-ms ops "
                         "need khi-klo ~100 to clear the relay jitter floor)")
    args = ap.parse_args()
    global _KLO, _KHI
    _KLO, _KHI = args.klo, args.khi

    from nuwa_tpu.nda import Sparse3DNA

    hw = args.fmap * args.fmap
    t = args.frames * hw - 3  # ragged tail on purpose
    mod_g = Sparse3DNA(
        dim=args.dim, video_shape=(args.frames, args.fmap, args.fmap),
        kernel_size=3, dilation=args.dilation, heads=args.heads,
        dim_head=args.dim_head, causal=True, rel_pos_bias=True,
        backend="gather",
    )
    mod_d = mod_g.replace(backend="dense")
    mod_p = mod_g.replace(backend="pallas", use_pallas=True)
    p = mod_g.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (args.batch, 1 + t, args.dim))
    w = jax.random.normal(jax.random.PRNGKey(2), x.shape)

    f_d = jax.jit(lambda p, x: mod_d(p, x))
    f_p = jax.jit(lambda p, x: mod_p(p, x))
    g_d = jax.jit(jax.grad(lambda p, x: jnp.sum(mod_d(p, x) * w)))
    g_p = jax.jit(jax.grad(lambda p, x: jnp.sum(mod_p(p, x) * w)))

    diff = jax.jit(lambda p, x: jnp.max(jnp.abs(f_d(p, x) - f_p(p, x))))
    print(f"packed-vs-dense fwd max|diff| = "
          f"{float(np.asarray(diff(p, x))):.3e}", flush=True)
    gd, gp = g_d(p, x), g_p(p, x)
    rel = jax.jit(lambda: jnp.max(jnp.stack([
        jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9)
        for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gp))
    ])))
    print(f"packed-vs-dense grad max rel = "
          f"{float(np.asarray(rel())):.3e}", flush=True)

    dt, _ = time_fn(f_d, p, x)
    print(f"dense-XLA  fwd     : {dt*1e3:8.3f} ms", flush=True)
    dt_pf, _ = time_fn(f_p, p, x)
    print(f"packed     fwd     : {dt_pf*1e3:8.3f} ms ({dt/dt_pf:.2f}x)",
          flush=True)
    dt_db, _ = time_fn(lambda p, x: g_d(p, x)["to_q"]["w"], p, x)
    print(f"dense-XLA  fwd+bwd : {dt_db*1e3:8.3f} ms", flush=True)
    dt_pb, _ = time_fn(lambda p, x: g_p(p, x)["to_q"]["w"], p, x)
    print(f"packed     fwd+bwd : {dt_pb*1e3:8.3f} ms ({dt_db/dt_pb:.2f}x)",
          flush=True)

    if args.train_step:
        import optax

        from nuwa_tpu.models import NUWA
        from nuwa_tpu.train.optimizer import get_optimizer

        for name, backend in (("dense", "dense"), ("pallas", "auto")):
            model = NUWA(
                dim=args.dim, image_size=args.fmap, num_image_tokens=1024,
                max_video_frames=args.frames, text_num_tokens=49408,
                text_max_seq_len=32, text_enc_depth=2,
                text_enc_dim_head=args.dim_head, text_enc_heads=args.heads,
                dec_depth=6, dec_dim_head=args.dim_head,
                dec_heads=args.heads, dec_reversible=True,
                sparse_3dna_kernel_size=(5, 3, 3),
                sparse_3dna_dilation=(1, 2, 4), sparse_3dna_rel_pos_bias=True,
                shift_video_tokens=True, compute_dtype="bfloat16",
                sparse_3dna_backend=backend,
            )
            params = model.init(jax.random.PRNGKey(0))
            tx = get_optimizer(lr=3e-4, wd=0.01, params=params,
                               max_grad_norm=0.5)
            opt = tx.init(params)
            tokens = args.frames * model.tokens_per_frame
            text = jnp.ones((args.batch, 32), jnp.int32)
            video = jnp.zeros((args.batch, tokens), jnp.int32)

            def loss_fn(p, key):
                return model.forward(p, text=text, video=video,
                                     return_loss=True, key=key, train=True)

            def step(p, opt, key):
                key, sub = jax.random.split(key)
                loss, grads = jax.value_and_grad(loss_fn)(p, sub)
                updates, opt = tx.update(grads, opt, p)
                return optax.apply_updates(p, updates), opt, key, loss

            jstep = jax.jit(step, donate_argnums=(0, 1))
            state = list(jstep(params, opt, jax.random.PRNGKey(1)))
            _sync(state[-1])

            def dispatch():
                state[:] = jstep(*state[:-1])
                return state[-1]

            from nuwa_tpu.utils.timing import device_rate

            dt = device_rate(dispatch)
            print(
                f"train step fmap8 [{name:6s}]: {dt*1e3:7.2f} ms/step "
                f"({args.batch*tokens/dt:9.0f} tok/s)", flush=True,
            )


if __name__ == "__main__":
    main()
