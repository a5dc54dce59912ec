"""Dual-modality cached decoding vs the full twin-tower decoder.

Teacher-forced parity: step the cached decoder through input positions in
generation order (video frame n's tokens, then audio frame n's) and compare
every position's output against the full forward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuwa_tpu.decode_dual import DualDecoderCache
from nuwa_tpu.dual_decoder import DualModalityDecoder, ReversibleDualModalityDecoder

KEY = jax.random.PRNGKey(0)

VTPF = 4   # video tokens per frame (2x2 fmap)
ATPF = 3   # audio tokens per video frame
FRAMES = 2


def dual(klass, **kw):
    cfg = dict(
        dim=16,
        depth=2,
        heads=2,
        dim_head=8,
        num_video_tokens_per_frame=VTPF,
        num_audio_tokens_per_video_frame=ATPF,
        sparse_3dna_video_shape=(FRAMES, 2, 2),
        sparse_2dna_kernel_size=3,
        cross_modality_attn_every=2,
        audio_tokens_per_timestep=1,
    )
    cfg.update(kw)
    return klass(**cfg)


def interleaved_positions():
    """(stream, pos) pairs in generation order over input positions.

    The audio tower steps ONE position ahead of audio sampling: position 0
    (audio bos) is stepped before anything (video chunk-0 queries read it),
    and sampling audio token j immediately steps position j+1 — so video
    chunk n always finds audio stream positions up to n*ATPF buffered.
    """
    order = [("a", 0)]
    nv = FRAMES * VTPF
    na = FRAMES * ATPF
    for n in range(FRAMES):
        for v in range(n * VTPF, (n + 1) * VTPF):
            order.append(("v", v))
        for a in range(n * ATPF + 1, (n + 1) * ATPF + 1):
            if a < na:
                order.append(("a", a))
    return order


def run_parity(d, atol=1e-4):
    p = d.init(KEY)
    b = 2
    nv = FRAMES * VTPF  # decoder input length (bos + tokens[:-1])
    na = FRAMES * ATPF
    video = jax.random.normal(KEY, (b, nv, 16))
    audio = jax.random.normal(jax.random.PRNGKey(1), (b, na, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 5, 16))
    cmask = jnp.array([[True] * 5, [True, True, True, False, False]])

    vfull, afull = d(p, video, audio, context=ctx, context_mask=cmask)

    dec = DualDecoderCache(d, total_v_in=nv, total_a_in=na)
    caches = dec.init_cache(p, b, ctx, cmask)
    v_outs = [None] * nv
    a_outs = [None] * na
    for stream, pos in interleaved_positions():
        if stream == "v":
            y, caches = dec.step_video(p, caches, video[:, pos], jnp.asarray(pos))
            v_outs[pos] = y
        else:
            y, caches = dec.step_audio(p, caches, audio[:, pos], jnp.asarray(pos))
            a_outs[pos] = y
    v_cached = jnp.stack(v_outs, axis=1)
    a_cached = jnp.stack(a_outs, axis=1)

    np.testing.assert_allclose(np.asarray(v_cached), np.asarray(vfull), atol=atol, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(a_cached), np.asarray(afull), atol=atol, rtol=1e-3)


def test_dual_cached_nonreversible():
    run_parity(dual(DualModalityDecoder))


def test_dual_cached_reversible():
    run_parity(dual(ReversibleDualModalityDecoder))


def test_dual_cached_with_shifts_and_bias():
    run_parity(
        dual(
            ReversibleDualModalityDecoder,
            shift_video_tokens=True,
            shift_audio_tokens=True,
            sparse_3dna_rel_pos_bias=True,
            sparse_2dna_rel_pos_bias=True,
            cross_modality_attn_every=1,
        )
    )
