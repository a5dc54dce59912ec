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
import jax.numpy as jnp
import numpy as np


def _sync(x):
    """Force completion: the axon tunnel's block_until_ready does not block,
    so computations reduce to a scalar in-graph and we read that back."""
    return float(np.asarray(x))


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
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        _sync(gen(params, text, jax.random.PRNGKey(i + 1)))
        times.append(time.perf_counter() - t0)
    dt = min(times)
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
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(fn(p, s, img))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return {"frames_per_sec": batch / dt, "roundtrip_seconds": dt}


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
    print(json.dumps(line))


if __name__ == "__main__":
    main()
