"""Benchmark: AR video-token decode throughput + VQ-VAE codec throughput on
the real TPU chip, with a PyTorch-CPU dense-decoder probe as the baseline
(BASELINE.json: ≥10× PyTorch-CPU tokens/sec AR decode; ≥500 frames/sec
256px VQ-VAE encode+decode per chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
import json
import os
import time

# run on the real chip (env pins JAX_PLATFORMS=axon); fall back to cpu locally
import jax

# persistent compile cache: repeat driver runs skip the remote-tunnel
# compiles entirely (same machine, same configs)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def _sync(x):
    """Force completion: the axon tunnel's block_until_ready does not block,
    so computations reduce to a scalar in-graph and we read that back."""
    return float(np.asarray(x))


from nuwa_tpu.utils.timing import device_rate as _rate  # noqa: E402
# two-point rate: cancels the ~29 ms relay round trip charged to every
# per-step number before round 3 (docs/BENCHMARKS.md "timing methodology")


def bench_ar_decode(frames=4, fmap=8, dim=512, depth=6, heads=8, dim_head=64,
                    text_len=32, batch=1, seed=0):
    """Tokens/sec for autoregressive video decode (jitted lax.scan loop)."""
    from nuwa_tpu.models import NUWA

    model = NUWA(
        dim=dim,
        image_size=fmap,  # raw fmap-size mode: decode tokens only
        num_image_tokens=1024,
        max_video_frames=frames,
        text_num_tokens=49408,
        text_max_seq_len=text_len,
        text_enc_depth=2,
        text_enc_dim_head=dim_head,
        text_enc_heads=heads,
        dec_depth=depth,
        dec_dim_head=dim_head,
        dec_heads=heads,
        sparse_3dna_kernel_size=3,
        sparse_3dna_dilation=2,
        shift_video_tokens=True,
        compute_dtype="bfloat16",
    )
    params = model.init(jax.random.PRNGKey(seed))
    text = jnp.ones((batch, text_len), jnp.int32)
    total_tokens = frames * model.tokens_per_frame

    def make_gen(method):
        return jax.jit(
            lambda p, text, key: jnp.sum(
                model.generate(
                    p, text=text, key=key, decode_video=False, cond_scale=2.0,
                    method=method,
                )
            )
        )

    gen = make_gen("cached")
    # compile
    _sync(gen(params, text, jax.random.PRNGKey(0)))
    # timed runs
    counter = iter(range(1, 10_000))
    dt = _rate(
        lambda: gen(params, text, jax.random.PRNGKey(next(counter))),
        k_lo=2, k_hi=10,
    )
    return {
        "tokens_per_sec": batch * total_tokens / dt,
        "total_tokens": total_tokens,
        "decode_seconds": dt,
        "config": {"frames": frames, "fmap": fmap, "dim": dim, "depth": depth},
    }


def bench_vqvae(image_size=256, dim=128, num_layers=4, batch=32, seed=0):
    """Frames/sec for VQ-VAE encode+decode at 256px."""
    from nuwa_tpu.vqgan_vae import VQGanVAE

    vae = VQGanVAE(
        dim=dim,
        image_size=image_size,
        num_layers=num_layers,
        vq_codebook_size=512,
        use_vgg_and_gan=False,
        vq_kmeans_init=False,
        use_attn=True,
        num_resnet_blocks=1,
    )
    p = vae.init(jax.random.PRNGKey(seed))
    s = vae.init_state(jax.random.PRNGKey(seed + 1))
    img = jnp.asarray(
        np.random.default_rng(0).uniform(size=(batch, 3, image_size, image_size)),
        jnp.bfloat16,  # bf16 conv compute (params cast per-op; norms stay fp32)
    )

    def roundtrip(p, s, img):
        fmap, indices, _, _ = vae.encode(p, s, img)
        codes = jnp.take(vae.codebook(p, s), indices, axis=0)
        codes = codes.reshape(batch, vae.fmap_size, vae.fmap_size, -1)
        codes = codes.astype(jnp.bfloat16)  # keep the decoder in bf16
        return jnp.sum(vae.decode(p, jnp.transpose(codes, (0, 3, 1, 2))))

    fn = jax.jit(roundtrip)
    _sync(fn(p, s, img))
    dt = _rate(lambda: fn(p, s, img))
    return {"frames_per_sec": batch / dt, "roundtrip_seconds": dt}


_V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s (for the MFU estimate)


def _flops_of(compiled):
    """XLA-reported flops of a compiled executable, or None."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _analytic_train_flops(*, frames, fmap, dim, depth, heads, dim_head,
                          batch, text_len, vocab, kf=6):
    """Per-step matmul FLOPs counting the Pallas kernels' real matmuls (XLA's
    cost model reports 0 for custom calls). bwd = 2x fwd; the reversible
    recompute adds ~1x of the decoder stack (docs/BENCHMARKS.md roofline)."""
    inner = heads * dim_head
    t = frames * fmap * fmap
    ffi = (dim * 4 * 2) // 3
    dpad = ((dim_head + 127) // 128) * 128
    proj = 2 * t * dim * (inner * 4)
    attn = 2 * t * heads * (kf * fmap * fmap) * dpad * 2
    ff = 2 * t * dim * (2 * ffi) + 2 * t * ffi * dim
    layer = proj + attn + ff
    text_layer = 2 * text_len * dim * (inner * 4) + 2 * text_len * ffi * dim * 3
    logits = 2 * t * dim * vocab
    fwd = depth * layer + 2 * text_layer + logits
    return batch * (3 * fwd + depth * layer)


def _video_attn_keys(fmap, kernel_f, dilation_f, causal=True):
    """Score-matrix columns PER QUERY that the realized Sparse3DNA kernel
    actually computes (the analytic MFU counts real kernel matmuls):
    whole-frame = Kf dense frame tiles; lane-packed small frames = nJ dense
    128-lane super-tiles (kernels.nda_pallas.packed_frames)."""
    HW = fmap * fmap
    if HW < 128 and 128 % HW == 0 and causal:
        from nuwa_tpu.kernels.nda_pallas import _packed_taps

        P = 128 // HW
        taps, _ = _packed_taps(kernel_f, dilation_f, P)
        return len(taps) * P * HW
    return kernel_f * HW


def _analytic_dual_flops(model, frames, batch, text_len):
    """Per-step matmul FLOPs of the dual video+audio train step, counting
    the Pallas kernels' real matmuls (XLA reports 0 for custom calls).
    bwd = 2x fwd; the reversible recompute adds ~1x of the decoder stack
    (same convention as _analytic_train_flops). Audio attention uses the
    nominal taps-x-height key count (its share is <2% at bench shapes)."""
    dim, heads = model.dim, model.dec_heads
    dh = model.dec_dim_head
    inner = heads * dh
    dpad = ((dh + 127) // 128) * 128
    ffi = (dim * 4 * 2) // 3
    fmap = model.video_shape[-1]
    vt = frames * model.num_video_tokens_per_frame
    at = frames * model.num_audio_tokens_per_video_frame
    ks = model.sparse_3dna_kernel_size
    kf = ks[0] if isinstance(ks, tuple) else ks
    # match the model's own dilation expansion (an int d means the cycle
    # (1, .., d), NOT a single dilation — models/nuwa_video_audio._dils)
    dils = model._dils(model.sparse_3dna_dilation)

    def proj(t):  # q + k + v + out projections
        return 2 * t * dim * (inner * 4)

    def ff(t):  # GEGLU feedforward
        return 2 * t * dim * (2 * ffi) + 2 * t * ffi * dim

    def attend(tq, keys):  # QK^T + PV, fp32-accumulated bf16 matmuls
        return 2 * tq * heads * keys * dpad * 2

    dec = 0.0
    for ind in range(model.dec_depth):
        df = dils[ind % len(dils)]
        keys_v = _video_attn_keys(fmap, kf, df)
        # "self": video 3DNA + video ff + audio 2DNA + audio ff
        keys_a = model.sparse_2dna_kernel_size * model.audio_tokens_per_timestep
        dec += proj(vt) + attend(vt, keys_v) + ff(vt)
        dec += proj(at) + attend(at, keys_a) + ff(at)
        # "cross": both streams attend the text encoding (+1 null kv)
        dec += proj(vt) + attend(vt, text_len + 1) + ff(vt)
        dec += proj(at) + attend(at, text_len + 1) + ff(at)
        if (ind + 1) % model.cross_modality_attn_every == 0:
            # xmod: frame-aligned chunked cross-modality attention
            atpf = model.num_audio_tokens_per_video_frame
            vtpf = model.num_video_tokens_per_frame
            dec += proj(vt) + attend(vt, atpf + 1) + ff(vt)
            dec += proj(at) + attend(at, vtpf + 1) + ff(at)
    text_enc = model.text_enc_depth * (
        proj(text_len) + attend(text_len, text_len) + ff(text_len)
    )
    logits = (
        2 * vt * dim * model.vae.codebook_size
        + 2 * at * dim * model.num_audio_tokens
    )
    fwd = dec + text_enc + logits
    return batch * (3 * fwd + dec)


def bench_train_step(frames=10, fmap=16, dim=512, depth=6, heads=8,
                     dim_head=64, batch=2, text_len=32, seed=0):
    """Training step at BASELINE config #3 scale: 10 frames of fmap-16
    tokens (128px through a 3-layer VAE), kernel (5,3,3), dilations
    (1,2,4), shift_video_tokens, reversible decoder, bf16 activations.
    Reports ms/step, train tokens/sec and an XLA-counted MFU."""
    import optax

    from nuwa_tpu.models import NUWA
    from nuwa_tpu.train.optimizer import get_optimizer

    model = NUWA(
        dim=dim,
        image_size=fmap,
        num_image_tokens=1024,
        max_video_frames=frames,
        text_num_tokens=49408,
        text_max_seq_len=text_len,
        text_enc_depth=2,
        text_enc_dim_head=dim_head,
        text_enc_heads=heads,
        dec_depth=depth,
        dec_dim_head=dim_head,
        dec_heads=heads,
        dec_reversible=True,
        sparse_3dna_kernel_size=(5, 3, 3),
        sparse_3dna_dilation=(1, 2, 4),
        sparse_3dna_rel_pos_bias=True,
        shift_video_tokens=True,
        compute_dtype="bfloat16",
    )
    params = model.init(jax.random.PRNGKey(seed))
    tx = get_optimizer(lr=3e-4, wd=0.01, params=params, max_grad_norm=0.5)
    opt = tx.init(params)
    tokens = frames * model.tokens_per_frame
    text = jnp.ones((batch, text_len), jnp.int32)
    video = jnp.zeros((batch, tokens), jnp.int32)
    key = jax.random.PRNGKey(1)

    def loss_fn(p, key):
        return model.forward(
            p, text=text, video=video, return_loss=True, key=key, train=True
        )

    def step(p, opt, key):
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(p, sub)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, key, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    compiled = jstep.lower(params, opt, key).compile()
    flops = _flops_of(compiled)
    state = list(compiled(params, opt, key))
    _sync(state[-1])

    def dispatch():
        state[:] = compiled(*state[:-1])
        return state[-1]

    dt = _rate(dispatch)
    out = {
        "ms_per_step": dt * 1e3,
        "train_tokens_per_sec": batch * tokens / dt,
        "tokens": tokens,
    }
    if flops:
        out["xla_flops_per_step"] = flops
        out["mfu"] = flops / dt / _V5E_BF16_PEAK
    # trusted MFU: analytic matmul count incl. the Pallas kernels' real
    # matmuls (XLA reports 0 FLOPs for custom calls)
    afl = _analytic_train_flops(
        frames=frames, fmap=fmap, dim=dim, depth=depth, heads=heads,
        dim_head=dim_head, batch=batch, text_len=text_len, vocab=1024,
    )
    out["mfu_analytic"] = afl / dt / _V5E_BF16_PEAK
    return out


def bench_dual_train_step(frames=4, fmap=8, dim=512, depth=12, heads=8,
                          dim_head=64, batch=2, text_len=32, audio_tpf=32):
    """Deeper dual video+audio reversible decoder training step."""
    import optax

    from nuwa_tpu.models import NUWAVideoAudio
    from nuwa_tpu.train.optimizer import get_optimizer
    from nuwa_tpu.vqgan_vae import VQGanVAE

    # tiny frozen codec: the dual decoder takes integer indices in the
    # bench, so the VAE only contributes embeddings/logit sizes
    vae = VQGanVAE(
        dim=16, image_size=fmap * 4, num_layers=2, vq_codebook_size=1024,
        vq_codebook_dim=64, use_vgg_and_gan=False, vq_kmeans_init=False,
        use_attn=False, num_resnet_blocks=0, resnet_groups=8,
    )
    model = NUWAVideoAudio(
        vae=vae,
        dim=dim,
        image_size=fmap * 4,
        num_audio_tokens=1024,
        num_audio_tokens_per_video_frame=audio_tpf,
        max_video_frames=frames,
        text_num_tokens=49408,
        text_max_seq_len=text_len,
        text_enc_depth=2,
        text_enc_dim_head=dim_head,
        text_enc_heads=heads,
        dec_depth=depth,
        dec_dim_head=dim_head,
        dec_heads=heads,
        dec_reversible=True,
        sparse_3dna_kernel_size=3,
        sparse_3dna_dilation=(1, 2),
        shift_video_tokens=True,
        compute_dtype="bfloat16",
    )
    vkey = jax.random.PRNGKey(7)
    params = model.init(
        jax.random.PRNGKey(0),
        vae_params=vae.init(vkey),
        vae_state=vae.init_state(vkey),
    )
    tx = get_optimizer(lr=3e-4, wd=0.01, params=params, max_grad_norm=0.5)
    opt = tx.init(params)
    vtok = frames * model.num_video_tokens_per_frame
    atok = frames * audio_tpf
    text = jnp.ones((batch, text_len), jnp.int32)
    video = jnp.zeros((batch, vtok), jnp.int32)
    audio = jnp.zeros((batch, atok), jnp.int32)

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
    key = jax.random.PRNGKey(1)
    state = list(jstep(params, opt, key))
    _sync(state[-1])

    def dispatch():
        state[:] = jstep(*state[:-1])
        return state[-1]

    dt = _rate(dispatch)
    afl = _analytic_dual_flops(model, frames, batch, text_len)
    return {
        "ms_per_step": dt * 1e3,
        "train_tokens_per_sec": batch * (vtok + atok) / dt,
        "depth": depth,
        "mfu_analytic": afl / dt / _V5E_BF16_PEAK,
    }


def bench_ar_decode_int8(frames=4, fmap=8, dim=512, depth=6, heads=8,
                         dim_head=64, text_len=32, batch=1, seed=0):
    """Cached AR decode with int8 weight-only quantized projections/heads
    (serving path: per-token decode is weight-bandwidth-bound)."""
    from nuwa_tpu.models import NUWA
    from nuwa_tpu.utils.quantize import quantize_params_int8

    model = NUWA(
        dim=dim, image_size=fmap, num_image_tokens=1024,
        max_video_frames=frames, text_num_tokens=49408,
        text_max_seq_len=text_len, text_enc_depth=2,
        text_enc_dim_head=dim_head, text_enc_heads=heads, dec_depth=depth,
        dec_dim_head=dim_head, dec_heads=heads, sparse_3dna_kernel_size=3,
        sparse_3dna_dilation=2, shift_video_tokens=True,
        compute_dtype="bfloat16",
    )
    params = quantize_params_int8(model.init(jax.random.PRNGKey(seed)))
    text = jnp.ones((batch, text_len), jnp.int32)
    total_tokens = frames * model.tokens_per_frame
    gen = jax.jit(
        lambda p, text, key: jnp.sum(
            model.generate(p, text=text, key=key, decode_video=False,
                           cond_scale=2.0, method="cached")
        )
    )
    _sync(gen(params, text, jax.random.PRNGKey(0)))
    counter = iter(range(1, 10_000))
    dt = _rate(
        lambda: gen(params, text, jax.random.PRNGKey(next(counter))),
        k_lo=2, k_hi=10,
    )
    return {"tokens_per_sec": batch * total_tokens / dt}


def bench_generate_long(frames_total=8, max_frames=4, fmap=8, dim=512,
                        depth=6, heads=8, dim_head=64, text_len=32, batch=1,
                        method="cached"):
    """Sliding-window long rollout (2x max_video_frames): cached per-frame
    prefill + incremental steps vs the reference-style full re-forward."""
    from nuwa_tpu.models import NUWA

    model = NUWA(
        dim=dim, image_size=fmap, num_image_tokens=1024,
        max_video_frames=max_frames, text_num_tokens=49408,
        text_max_seq_len=text_len, text_enc_depth=2,
        text_enc_dim_head=dim_head, text_enc_heads=heads, dec_depth=depth,
        dec_dim_head=dim_head, dec_heads=heads, sparse_3dna_kernel_size=3,
        sparse_3dna_dilation=2, shift_video_tokens=True,
        compute_dtype="bfloat16",
    )
    params = model.init(jax.random.PRNGKey(0))
    text = jnp.ones((batch, text_len), jnp.int32)
    total = frames_total * model.tokens_per_frame

    def run(key):
        return model.generate_long(
            params, text=text, key=key, num_frames=frames_total,
            decode_video=False, cond_scale=2.0, method=method,
        )

    _sync(jnp.sum(run(jax.random.PRNGKey(0))))  # compile (model_jit caches)
    # every piece is a cached jitted executable after the warm call, so a
    # rollout is a chain of async dispatches — use the two-point estimator
    # to cancel the relay sync constant (round-3 timing methodology)
    counter = iter(range(1, 10_000))
    dt = _rate(
        lambda: run(jax.random.PRNGKey(next(counter))), k_lo=1, k_hi=4,
    )
    return {"tokens_per_sec": batch * total / dt, "seconds": dt}


def bench_serve_composite(frames_total=8, max_frames=4, fmap=8, dim=2048,
                          depth=6, heads=16, dim_head=128, text_len=32,
                          batch=8):
    """Composite serving row (VERDICT-r4 #6): every serving optimization in
    ONE number — dim 2048 (the scale where int8 weight-only wins, 1.34x op-
    level), batch 8, cache-jitted sliding-window generate_long, int8 weights
    — against the same-config bf16 rollout. The reference serves with an
    uncached full re-forward per token (nuwa_pytorch.py:1841-1915)."""
    from nuwa_tpu.models import NUWA
    from nuwa_tpu.utils.quantize import quantize_params_int8

    model = NUWA(
        dim=dim, image_size=fmap, num_image_tokens=1024,
        max_video_frames=max_frames, text_num_tokens=49408,
        text_max_seq_len=text_len, text_enc_depth=2,
        text_enc_dim_head=dim_head, text_enc_heads=heads, dec_depth=depth,
        dec_dim_head=dim_head, dec_heads=heads, sparse_3dna_kernel_size=3,
        sparse_3dna_dilation=2, shift_video_tokens=True,
        compute_dtype="bfloat16",
    )
    params = model.init(jax.random.PRNGKey(0))
    text = jnp.ones((batch, text_len), jnp.int32)
    total = frames_total * model.tokens_per_frame

    def measure(p):
        def run(key):
            return model.generate_long(
                p, text=text, key=key, num_frames=frames_total,
                decode_video=False, cond_scale=2.0, method="cached",
            )

        _sync(jnp.sum(run(jax.random.PRNGKey(0))))  # compile
        counter = iter(range(1, 10_000))
        dt = _rate(
            lambda: run(jax.random.PRNGKey(next(counter))), k_lo=1, k_hi=3,
        )
        return batch * total / dt

    bf16 = measure(params)
    int8 = measure(quantize_params_int8(params))
    return {
        "bf16_tokens_per_sec": bf16,
        "int8_tokens_per_sec": int8,
        "int8_speedup": int8 / bf16,
    }


def bench_cross_op(fmap=16, frames=10, ctx_frames=1, dim=512, heads=8,
                   dim_head=64, batch=8, seed=0):
    """SparseCross2DNA op fwd+bwd: fused Pallas kernels vs the gather oracle
    (the sketch decoder's cross attention at the bench config — VERDICT r3
    #2; docs/BENCHMARKS.md round-4 cross table)."""
    from nuwa_tpu.nda import SparseCross2DNA

    key = jax.random.PRNGKey(seed)
    hw = fmap * fmap
    t = frames * hw
    gather = SparseCross2DNA(
        dim=dim, image_size=fmap, heads=heads, dim_head=dim_head,
        kernel_size=3, dilation=1, backend="gather",
    )
    pallas = gather.replace(backend="pallas", use_pallas=True)
    p = gather.init(key)
    x = jax.random.normal(key, (batch, 1 + t, dim))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (batch, ctx_frames * hw, dim))
    w = jax.random.normal(jax.random.PRNGKey(2), x.shape)

    def timed(mod):
        g = jax.jit(jax.grad(
            lambda p, x, c: jnp.sum(mod(p, x, context=c) * w)
        ))
        disp = lambda: g(p, x, ctx)["to_q"]["w"]
        _sync(jnp.sum(disp()))
        return _rate(disp)

    dt_g = timed(gather)
    dt_p = timed(pallas)
    return {
        "gather_ms": dt_g * 1e3,
        "pallas_ms": dt_p * 1e3,
        "speedup": dt_g / dt_p,
    }


def bench_torch_cpu_decode(frames=4, fmap=8, dim=512, depth=6, heads=8,
                           text_len=32, probe_steps=8):
    """PyTorch-CPU baseline probe: a dense causal transformer decoder of the
    same shape, decoding autoregressively with full recompute per token (the
    reference's decode pattern, nuwa_pytorch.py:1870-1908). Measures time per
    token at mid-sequence length and extrapolates to the full rollout.

    This is our own stand-in (the reference's deps aren't installed here);
    dense attention *underestimates* the reference's per-token cost (no
    unfold gathers), so the resulting baseline is conservative.
    """
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    total_tokens = frames * fmap * fmap

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.n1 = torch.nn.LayerNorm(dim)
            self.attn = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
            self.n2 = torch.nn.LayerNorm(dim)
            self.cross = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
            self.n3 = torch.nn.LayerNorm(dim)
            inner = dim * 4
            self.ff = torch.nn.Sequential(
                torch.nn.Linear(dim, inner), torch.nn.GELU(), torch.nn.Linear(inner, dim)
            )

        def forward(self, x, ctx, causal_mask):
            h = self.n1(x)
            x = x + self.attn(h, h, h, attn_mask=causal_mask, need_weights=False)[0]
            h = self.n2(x)
            x = x + self.cross(h, ctx, ctx, need_weights=False)[0]
            return x + self.ff(self.n3(x))

    with torch.no_grad():
        blocks = [Block() for _ in range(depth)]
        emb = torch.nn.Embedding(1024, dim)
        head = torch.nn.Linear(dim, 1024)
        ctx = torch.randn(1, text_len, dim)

        n = total_tokens // 2  # representative mid-sequence length
        ids = torch.zeros(1, n, dtype=torch.long)
        mask = torch.triu(torch.ones(n, n, dtype=torch.bool), 1)

        def step():
            x = emb(ids)
            for b in blocks:
                x = b(x, ctx, mask)
            return head(x[:, -1])

        step()  # warm
        t0 = time.perf_counter()
        for _ in range(probe_steps):
            step()
        per_token = (time.perf_counter() - t0) / probe_steps
    return {"tokens_per_sec": 1.0 / per_token, "per_token_seconds": per_token}


def main():
    results = {}
    ar = bench_ar_decode()
    results["ar"] = ar
    vq = bench_vqvae()
    results["vq"] = vq
    torch_probe = bench_torch_cpu_decode()
    results["torch_cpu"] = torch_probe

    vs_baseline = ar["tokens_per_sec"] / max(torch_probe["tokens_per_sec"], 1e-9)
    line = {
        "metric": "AR decode video tokens/sec/chip",
        "value": round(ar["tokens_per_sec"], 2),
        "unit": "tokens/sec",
        "vs_baseline": round(vs_baseline, 2),
        "vqvae_frames_per_sec_256px": round(vq["frames_per_sec"], 2),
        "torch_cpu_tokens_per_sec": round(torch_probe["tokens_per_sec"], 2),
        "ar_config": ar["config"],
        "platform": jax.devices()[0].platform,
    }

    # BASELINE-scale extras (each guarded: a failure must not kill the
    # headline metric)
    try:
        b8 = bench_ar_decode(batch=8)
        line["ar_tokens_per_sec_b8"] = round(b8["tokens_per_sec"], 2)
    except Exception as e:  # pragma: no cover
        line["ar_b8_error"] = repr(e)[:200]
    try:
        vq64 = bench_vqvae(batch=64)
        line["vqvae_frames_per_sec_256px_b64"] = round(vq64["frames_per_sec"], 2)
    except Exception as e:  # pragma: no cover
        line["vqvae_b64_error"] = repr(e)[:200]
    try:
        q8 = bench_ar_decode_int8()
        # labelled as a regression config on purpose: weight-only int8 LOSES
        # at dim 512 (launch-bound dequant); it wins 1.34x at dim 2048 —
        # docs/BENCHMARKS.md "int8 serving"
        line["ar_tokens_per_sec_int8_dim512_regression"] = round(
            q8["tokens_per_sec"], 2
        )
    except Exception as e:  # pragma: no cover
        line["ar_int8_error"] = repr(e)[:200]
    try:
        tr = bench_train_step()
        line["train_ms_per_step_10f_fmap16_reversible"] = round(tr["ms_per_step"], 2)
        line["train_tokens_per_sec"] = round(tr["train_tokens_per_sec"], 2)
        if "mfu" in tr:
            line["train_mfu"] = round(tr["mfu"], 4)
        line["train_mfu_analytic"] = round(tr["mfu_analytic"], 4)
    except Exception as e:  # pragma: no cover
        line["train_error"] = repr(e)[:200]
    try:
        tr8 = bench_train_step(batch=8)
        line["train_tokens_per_sec_b8"] = round(tr8["train_tokens_per_sec"], 2)
        line["train_mfu_analytic_b8"] = round(tr8["mfu_analytic"], 4)
    except Exception as e:  # pragma: no cover
        line["train_b8_error"] = repr(e)[:200]
    try:
        # flagship-dim row: dim_head 128 is the TPU-native head layout (no
        # d-padding in the attention kernels; measured 1.6x faster than
        # heads=16/dim_head=64 at dim 1024 — docs/BENCHMARKS.md round 4)
        tr1k = bench_train_step(dim=1024, heads=8, dim_head=128, batch=8)
        line["train_tokens_per_sec_dim1024_b8"] = round(
            tr1k["train_tokens_per_sec"], 2
        )
        line["train_mfu_analytic_dim1024_b8"] = round(tr1k["mfu_analytic"], 4)
    except Exception as e:  # pragma: no cover
        line["train_dim1024_b8_error"] = repr(e)[:200]
    try:
        gl = bench_generate_long()
        line["generate_long_tokens_per_sec"] = round(gl["tokens_per_sec"], 2)
        glf = bench_generate_long(method="full")
        line["generate_long_full_reforward_tokens_per_sec"] = round(
            glf["tokens_per_sec"], 2
        )
    except Exception as e:  # pragma: no cover
        line["generate_long_error"] = repr(e)[:200]
    try:
        du = bench_dual_train_step()
        line["dual_train_ms_per_step_depth12"] = round(du["ms_per_step"], 2)
        line["dual_train_tokens_per_sec"] = round(du["train_tokens_per_sec"], 2)
        line["dual_train_mfu_analytic"] = round(du["mfu_analytic"], 4)
    except Exception as e:  # pragma: no cover
        line["dual_train_error"] = repr(e)[:200]
    try:
        sv = bench_serve_composite()
        line["serve_tokens_per_sec_dim2048_int8"] = round(
            sv["int8_tokens_per_sec"], 2
        )
        line["serve_tokens_per_sec_dim2048_bf16"] = round(
            sv["bf16_tokens_per_sec"], 2
        )
        line["serve_int8_speedup_dim2048"] = round(sv["int8_speedup"], 3)
    except Exception as e:  # pragma: no cover
        line["serve_error"] = repr(e)[:200]
    try:
        xo = bench_cross_op()
        line["cross_op_fwdbwd_speedup_vs_gather"] = round(xo["speedup"], 3)
        line["cross_op_fwdbwd_pallas_ms"] = round(xo["pallas_ms"], 3)
    except Exception as e:  # pragma: no cover
        line["cross_op_error"] = repr(e)[:200]

    print(json.dumps(line))


if __name__ == "__main__":
    main()
