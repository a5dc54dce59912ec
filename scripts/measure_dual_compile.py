"""Wall-clock compile time of the dual video+audio cached generate.

Round-1 structure (per-token lax.cond between the two tower steps inside one
scan) took ~35 min of remote compile; the per-frame two-phase nested scans
compile each tower's step once. Run: python scripts/measure_dual_compile.py
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from nuwa_tpu.models import NUWAVideoAudio
from nuwa_tpu.vqgan_vae import VQGanVAE


def main(frames=4, fmap=8, dim=512, depth=6, heads=8, dim_head=64, audio_tpf=32):
    vae = VQGanVAE(
        dim=16, image_size=fmap * 4, num_layers=2, vq_codebook_size=1024,
        vq_codebook_dim=64, use_vgg_and_gan=False, vq_kmeans_init=False,
        use_attn=False, num_resnet_blocks=0, resnet_groups=8,
    )
    model = NUWAVideoAudio(
        vae=vae, dim=dim, image_size=fmap * 4, num_audio_tokens=1024,
        num_audio_tokens_per_video_frame=audio_tpf, max_video_frames=frames,
        text_num_tokens=49408, text_max_seq_len=32, text_enc_depth=2,
        text_enc_dim_head=dim_head, text_enc_heads=heads, dec_depth=depth,
        dec_dim_head=dim_head, dec_heads=heads, dec_reversible=True,
        sparse_3dna_kernel_size=3, sparse_3dna_dilation=(1, 2),
        shift_video_tokens=True, compute_dtype="bfloat16",
    )
    vkey = jax.random.PRNGKey(7)
    p = model.init(jax.random.PRNGKey(0), vae_params=vae.init(vkey),
                   vae_state=vae.init_state(vkey))
    text = jnp.ones((1, 32), jnp.int32)

    gen = jax.jit(
        lambda p, text, key: jax.tree.map(
            jnp.sum,
            model.generate(p, text=text, key=key, decode_video=False,
                           cond_scale=2.0, method="cached"),
        )
    )
    t0 = time.perf_counter()
    lowered = gen.lower(p, text, jax.random.PRNGKey(1))
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(p, text, jax.random.PRNGKey(1))
    vals = [float(np.asarray(x)) for x in jax.tree.leaves(out)]
    t_run = time.perf_counter() - t0
    print(json.dumps({
        "trace_seconds": round(t_lower, 1),
        "compile_seconds": round(t_compile, 1),
        "first_run_seconds": round(t_run, 1),
        "finite": all(np.isfinite(v) for v in vals),
        "config": {"frames": frames, "fmap": fmap, "dim": dim, "depth": depth,
                   "audio_tpf": audio_tpf},
    }))


if __name__ == "__main__":
    main()
