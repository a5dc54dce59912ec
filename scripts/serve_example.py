"""Serving example: batched, quantized, cached text->video generation.

Shows the production decode path end to end on one chip:
  * int8 weight-only quantized projections/logit heads (utils/quantize.py)
  * batched cached AR rollout (one jitted lax.scan, per-layer caches)
  * classifier-free guidance as a 2x-batch stream
  * bf16 activations

Run: python scripts/serve_example.py [--batch 8] [--int8] [--mesh D,M]

``--mesh D,M`` runs the same cached decode under a (data=D, model=M) device
mesh: params are laid out by the TP rules (parallel/sharding.py — column/
row-parallel projections, feature-sharded embeddings, vocab-sharded logits
head; int8 scales follow their weights), the batch is sharded over 'data',
and XLA SPMD inserts the ICI collectives. On a multi-chip slice this is the
model-parallel serving path; on one chip use D=M=1 (identity layout, same
code path). Parity vs the unsharded decoder is pinned by
tests/test_parallel.py::test_tp_serving_decode_parity (b=8, data=4, model=2).
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from nuwa_tpu.models import NUWA
from nuwa_tpu.tokenizer import tokenizer
from nuwa_tpu.utils.quantize import quantize_params_int8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--mesh", type=str, default=None, metavar="D,M",
                    help="serve under a (data=D, model=M) mesh (TP rules)")
    args = ap.parse_args()

    model = NUWA(
        dim=512, image_size=8, num_image_tokens=1024,
        max_video_frames=args.frames, text_num_tokens=tokenizer.vocab_size,
        text_max_seq_len=32, text_enc_depth=2, text_enc_dim_head=64,
        text_enc_heads=8, dec_depth=6, dec_dim_head=64, dec_heads=8,
        sparse_3dna_kernel_size=3, sparse_3dna_dilation=2,
        shift_video_tokens=True, compute_dtype="bfloat16",
    )
    params = model.init(jax.random.PRNGKey(0))
    if args.int8:
        params = quantize_params_int8(params)

    prompts = ["a red square moving right"] * args.batch
    text = jnp.asarray(tokenizer.tokenize(prompts, context_length=32))

    mesh_shape = None
    if args.mesh:
        from nuwa_tpu.parallel import data_sharding, make_mesh, shard_params

        d, m = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(data=d, model=m)
        params = shard_params(params, mesh)
        text = jax.device_put(text, data_sharding(mesh, ndim=2))
        mesh_shape = [d, m]

    gen = jax.jit(
        lambda p, text, key: model.generate(
            p, text=text, key=key, decode_video=False, cond_scale=2.0
        )
    )
    # compile + warm
    idx = gen(params, text, jax.random.PRNGKey(1))
    _ = float(np.asarray(jnp.sum(idx)))
    from nuwa_tpu.utils.timing import device_rate

    counter = iter(range(2, 10_000))
    dt = device_rate(
        lambda: gen(params, text, jax.random.PRNGKey(next(counter))),
        k_lo=1, k_hi=3,
    )
    idx = gen(params, text, jax.random.PRNGKey(0))
    total = args.batch * args.frames * model.tokens_per_frame
    print(json.dumps({
        "batch": args.batch,
        "int8": args.int8,
        "mesh": mesh_shape,
        "tokens": total,
        "tokens_per_sec": round(total / dt, 1),
        "sample_shape": list(idx.shape),
    }))


if __name__ == "__main__":
    main()
