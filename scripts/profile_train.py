"""MFU attribution for the NUWA train step (VERDICT r2 #5).

Times ablated variants of the BASELINE-#3 train step on the real chip to
attribute where the non-MXU time goes, and reports an analytic FLOP count
(XLA's cost model reports 0 for Pallas custom calls, so kernel FLOPs are
added from the kernel's own matmul inventory).

    python scripts/profile_train.py [--batch 8] [--depth 6] [--dim 512]
"""
import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

_V5E_BF16_PEAK = 197e12


def _sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def time_compiled(fn, args, iters=4):
    from nuwa_tpu.utils.timing import device_rate

    out = fn(*args)
    _sync(out[-1] if isinstance(out, tuple) else out)
    return device_rate(
        lambda: (lambda o: o[-1] if isinstance(o, tuple) else o)(fn(*args)),
        k_lo=1, k_hi=5,
    )


def make_model(args, **over):
    from nuwa_tpu.models import NUWA

    kw = dict(
        dim=args.dim,
        image_size=args.fmap,
        num_image_tokens=args.vocab_img,
        max_video_frames=args.frames,
        text_num_tokens=args.vocab_text,
        text_max_seq_len=args.text_len,
        text_enc_depth=2,
        text_enc_dim_head=args.dim_head,
        text_enc_heads=args.heads,
        dec_depth=args.depth,
        dec_dim_head=args.dim_head,
        dec_heads=args.heads,
        dec_reversible=True,
        sparse_3dna_kernel_size=(5, 3, 3),
        sparse_3dna_dilation=(1, 2, 4),
        sparse_3dna_rel_pos_bias=True,
        shift_video_tokens=True,
        compute_dtype="bfloat16",
    )
    kw.update(over)
    return NUWA(**kw)


def step_time(model, batch, *, grad=True, optimizer=True, loss_mode="ce"):
    import optax

    from nuwa_tpu.train.optimizer import get_optimizer

    params = model.init(jax.random.PRNGKey(0))
    tokens = model.max_video_frames * model.tokens_per_frame
    text = jnp.ones((batch, 32), jnp.int32)
    video = jnp.zeros((batch, tokens), jnp.int32)

    def loss_fn(p, key):
        if loss_mode == "logit_sum":
            # skip the CE/log-softmax: measures logits matmul alone
            lg = model.forward(
                p, text=text, video=video, return_loss=False, key=key, train=True
            )
            return jnp.sum(lg.astype(jnp.float32)) * 1e-9
        return model.forward(
            p, text=text, video=video, return_loss=True, key=key, train=True
        )

    if not grad:
        f = jax.jit(lambda p, key: loss_fn(p, key))
        return time_compiled(f, (params, jax.random.PRNGKey(1))), tokens

    tx = get_optimizer(lr=3e-4, wd=0.01, params=params, max_grad_norm=0.5)
    opt = tx.init(params)

    def step(p, opt, key):
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(p, sub)
        if not optimizer:
            g = sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(grads))
            return p, opt, key, loss + g * 0.0
        updates, opt = tx.update(grads, opt, p)
        import optax as _o

        return _o.apply_updates(p, updates), opt, key, loss

    from nuwa_tpu.utils.timing import device_rate

    jstep = jax.jit(step, donate_argnums=(0, 1))
    state = list(jstep(params, opt, jax.random.PRNGKey(1)))
    _sync(state[-1])

    def dispatch():
        state[:] = jstep(*state[:-1])
        return state[-1]

    return device_rate(dispatch, k_lo=1, k_hi=5), tokens


def analytic_flops(args, batch):
    """Analytic matmul FLOPs per train step (fwd + 2x bwd + reversible
    recompute ~= 1x fwd for the decoder stack)."""
    d = args.dim
    dh, h = args.dim_head, args.heads
    inner = h * dh
    t = args.frames * args.fmap * args.fmap
    ffi = (d * 4 * 2) // 3

    # per decoder layer forward (couple = attn + ff)
    proj = 2 * t * d * (inner * 4)          # q,kv(2x),out
    kf = 5 + 1  # taps incl bos col approx; score+PV vs padded dim_head 128
    dpad = ((dh + 127) // 128) * 128
    attn = 2 * t * h * (kf * args.fmap * args.fmap) * dpad * 2  # QK^T + PV
    ff = 2 * t * d * (2 * ffi) + 2 * t * ffi * d
    layer_fwd = proj + attn + ff

    text_layer = 2 * 32 * d * (inner * 4) + 2 * 32 * ffi * d * 3
    logits = 2 * t * d * args.vocab_img
    emb = 0  # gathers

    fwd = args.depth * layer_fwd + 2 * text_layer + logits
    # bwd = 2x fwd matmuls; reversible recompute adds ~1x of the decoder stack
    total = batch * (3 * fwd + args.depth * layer_fwd)
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--dim-head", type=int, default=64)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--fmap", type=int, default=16)
    ap.add_argument("--text-len", type=int, default=32)
    ap.add_argument("--vocab-img", type=int, default=1024)
    ap.add_argument("--vocab-text", type=int, default=49408)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    b = args.batch

    rows = []

    def row(name, dt, tokens):
        rows.append((name, dt * 1e3, b * tokens / dt))
        print(f"{name:42s} {dt*1e3:8.1f} ms   {b*tokens/dt:10.0f} tok/s", flush=True)

    m = make_model(args)
    dt_full, tok = step_time(m, b)
    row("full step (reversible, CE, adamw)", dt_full, tok)

    dt, _ = step_time(m, b, optimizer=False)
    row("- without optimizer update", dt, tok)

    dt, _ = step_time(m, b, loss_mode="logit_sum")
    row("- logit-sum loss (no CE/log-softmax)", dt, tok)

    m_nv = make_model(args, num_image_tokens=64)
    dt, _ = step_time(m_nv, b)
    row("- tiny image vocab (64)", dt, tok)

    m_nr = make_model(args, dec_reversible=False)
    dt, _ = step_time(m_nr, b)
    row("- non-reversible decoder", dt, tok)

    m_d1 = make_model(args, dec_depth=1)
    dt_d1, _ = step_time(m_d1, b)
    row("- depth 1 decoder", dt_d1, tok)

    if not args.quick:
        dt, _ = step_time(m, b, grad=False)
        row("- forward only (loss, no grads)", dt, tok)

        m_dense = make_model(args, sparse_3dna_backend="dense")
        dt, _ = step_time(m_dense, b)
        row("- dense XLA attention backend", dt, tok)

    fl = analytic_flops(args, b)
    print(f"\nanalytic matmul FLOPs/step ~= {fl/1e12:.2f} TF")
    print(f"MFU (analytic) = {fl / dt_full / _V5E_BF16_PEAK:.3f}")
    per_layer = (dt_full - dt_d1) / (args.depth - 1)
    print(f"per-decoder-layer marginal cost ~= {per_layer*1e3:.1f} ms")


if __name__ == "__main__":
    main()
