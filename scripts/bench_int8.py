"""int8 weight-only serving at sizes where weight bandwidth matters.

VERDICT r2 #6: the round-2 number (dim 512, b=1) was launch-bound (+4%).
This measures batched cached decode at dim 1024/2048 where per-token decode
is genuinely weight-bandwidth-bound, bf16 vs int8 weights.

    python scripts/bench_int8.py [--dims 1024 2048] [--batch 8]
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


def bench(dim, batch, int8, frames=4, fmap=8, depth=6):
    from nuwa_tpu.models import NUWA
    from nuwa_tpu.utils.quantize import quantize_params_int8

    heads = max(8, dim // 64)
    model = NUWA(
        dim=dim, image_size=fmap, num_image_tokens=1024,
        max_video_frames=frames, text_num_tokens=49408, text_max_seq_len=32,
        text_enc_depth=2, text_enc_dim_head=64, text_enc_heads=heads,
        dec_depth=depth, dec_dim_head=64, dec_heads=heads,
        sparse_3dna_kernel_size=3, sparse_3dna_dilation=2,
        shift_video_tokens=True, compute_dtype="bfloat16",
    )
    params = model.init(jax.random.PRNGKey(0))
    if int8:
        params = quantize_params_int8(params)
    text = jnp.ones((batch, 32), jnp.int32)
    total = frames * model.tokens_per_frame
    gen = jax.jit(
        lambda p, text, key: jnp.sum(
            model.generate(p, text=text, key=key, decode_video=False,
                           cond_scale=2.0, method="cached")
        )
    )
    from nuwa_tpu.utils.timing import device_rate

    _sync(gen(params, text, jax.random.PRNGKey(0)))
    counter = iter(range(1, 10_000))
    dt = device_rate(
        lambda: gen(params, text, jax.random.PRNGKey(next(counter))),
        k_lo=1, k_hi=3,
    )
    return batch * total / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, nargs="+", default=[1024, 2048])
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    for dim in args.dims:
        tps_bf16 = bench(dim, args.batch, int8=False)
        print(f"dim {dim} b={args.batch} bf16: {tps_bf16:9.0f} tok/s", flush=True)
        tps_int8 = bench(dim, args.batch, int8=True)
        print(f"dim {dim} b={args.batch} int8: {tps_int8:9.0f} tok/s "
              f"({tps_int8/tps_bf16:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
