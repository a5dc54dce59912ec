"""Sliding-window long rollout + profiling utils."""
import jax
import jax.numpy as jnp
import numpy as np

from nuwa_tpu.models import NUWA

KEY = jax.random.PRNGKey(0)


def test_generate_long_sliding_window():
    model = NUWA(
        dim=16, image_size=2, num_image_tokens=16, max_video_frames=2,
        text_num_tokens=32, text_enc_depth=1, text_enc_dim_head=8,
        text_enc_heads=2, dec_depth=1, dec_dim_head=8, dec_heads=2,
        shift_video_tokens=False,
    )
    p = model.init(KEY)
    text = jnp.array([[1, 2, 3, 0]])
    idx = model.generate_long(
        p, text=text, key=KEY, num_frames=4, decode_video=False, cond_scale=1.0
    )
    assert idx.shape == (1, 4 * model.tokens_per_frame)
    assert int(jnp.max(idx)) < 16
    # <= max frames delegates to the standard path
    idx2 = model.generate_long(
        p, text=text, key=KEY, num_frames=2, decode_video=False, cond_scale=1.0
    )
    assert idx2.shape == (1, 2 * model.tokens_per_frame)


def test_generate_long_cached_matches_full_oracle():
    """Cached sliding-window rollout (prefill + incremental steps) must
    reproduce the full-reforward oracle exactly, for 2x and 2.5x
    max_video_frames, with and without CFG."""
    model = NUWA(
        dim=16, image_size=2, num_image_tokens=16, max_video_frames=2,
        text_num_tokens=32, text_enc_depth=1, text_enc_dim_head=8,
        text_enc_heads=2, dec_depth=2, dec_dim_head=8, dec_heads=2,
        shift_video_tokens=True, sparse_3dna_rel_pos_bias=True,
        sparse_3dna_dilation=(1, 2), sparse_3dna_kernel_size=3,
    )
    p = model.init(KEY)
    text = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]])
    for nf, cs in ((4, 1.0), (5, 2.0)):
        full = model.generate_long(
            p, text=text, key=KEY, num_frames=nf, decode_video=False,
            cond_scale=cs, method="full",
        )
        cached = model.generate_long(
            p, text=text, key=KEY, num_frames=nf, decode_video=False,
            cond_scale=cs, method="cached",
        )
        np.testing.assert_array_equal(np.asarray(cached), np.asarray(full))


def test_sketch_generate_long_cached_matches_full_oracle():
    from conftest import make_tiny_vae
    from nuwa_tpu.models import NUWASketch

    vae, svae = make_tiny_vae(3), make_tiny_vae(5)
    k = jax.random.PRNGKey(0)
    model = NUWASketch(
        vae=vae, sketch_vae=svae, dim=16, image_size=8,
        max_video_frames=2, sketch_max_video_frames=1,
        sketch_enc_depth=1, sketch_enc_dim_head=8, sketch_enc_heads=2,
        dec_depth=1, dec_dim_head=8, dec_heads=2,
        shift_video_tokens=True,
    )
    p = model.init(
        k, vae_params=vae.init(k), vae_state=vae.init_state(k),
        sketch_vae_params=svae.init(k), sketch_vae_state=svae.init_state(k),
    )
    sketch = jax.random.uniform(k, (1, 1, 5, 8, 8))
    full = model.generate_long(
        p, sketch=sketch, key=k, num_frames=4, decode_video=False,
        cond_scale=2.0, method="full",
    )
    cached = model.generate_long(
        p, sketch=sketch, key=k, num_frames=4, decode_video=False,
        cond_scale=2.0, method="cached",
    )
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(full))


def test_dual_generate_long_cached_matches_full_oracle():
    """NUWAVideoAudio sliding-window rollout (the reference capability its
    own dual generate crashes on past max_video_frames): cached prefill path
    vs the full-reforward oracle, 2x max frames, reversible decoder, CFG."""
    from conftest import make_tiny_vae
    from nuwa_tpu.models import NUWAVideoAudio

    vae = make_tiny_vae(3)
    k = jax.random.PRNGKey(0)
    model = NUWAVideoAudio(
        vae=vae, dim=16, image_size=8, num_audio_tokens=24,
        num_audio_tokens_per_video_frame=3, max_video_frames=2,
        text_num_tokens=32, text_max_seq_len=16, text_enc_depth=1,
        text_enc_dim_head=8, text_enc_heads=2, dec_depth=2, dec_dim_head=8,
        dec_heads=2, dec_reversible=True, cross_modality_attn_every=2,
        shift_video_tokens=True, shift_audio_tokens=True,
    )
    p = model.init(k, vae_params=vae.init(k), vae_state=vae.init_state(k))
    text = jnp.array([[1, 2, 3, 0]])
    for cs in (1.0, 2.0):
        vf, af = model.generate_long(
            p, text=text, key=k, num_frames=4, decode_video=False,
            cond_scale=cs, method="full",
        )
        vc, ac = model.generate_long(
            p, text=text, key=k, num_frames=4, decode_video=False,
            cond_scale=cs, method="cached",
        )
        assert vc.shape == (1, 4 * model.num_video_tokens_per_frame)
        assert ac.shape == (1, 4 * model.num_audio_tokens_per_video_frame)
        np.testing.assert_array_equal(np.asarray(vc), np.asarray(vf))
        np.testing.assert_array_equal(np.asarray(ac), np.asarray(af))


def test_dual_generate_long_nonreversible():
    """Same parity through the non-reversible dual decoder (different xmod
    buffer semantics: both sides read pre-update streams)."""
    from conftest import make_tiny_vae
    from nuwa_tpu.models import NUWAVideoAudio

    vae = make_tiny_vae(3)
    k = jax.random.PRNGKey(1)
    model = NUWAVideoAudio(
        vae=vae, dim=16, image_size=8, num_audio_tokens=24,
        num_audio_tokens_per_video_frame=3, max_video_frames=2,
        text_num_tokens=32, text_max_seq_len=16, text_enc_depth=1,
        text_enc_dim_head=8, text_enc_heads=2, dec_depth=2, dec_dim_head=8,
        dec_heads=2, dec_reversible=False, cross_modality_attn_every=2,
    )
    p = model.init(k, vae_params=vae.init(k), vae_state=vae.init_state(k))
    text = jnp.array([[1, 2, 3, 0]])
    vf, af = model.generate_long(
        p, text=text, key=k, num_frames=3, decode_video=False,
        cond_scale=2.0, method="full",
    )
    vc, ac = model.generate_long(
        p, text=text, key=k, num_frames=3, decode_video=False,
        cond_scale=2.0, method="cached",
    )
    np.testing.assert_array_equal(np.asarray(vc), np.asarray(vf))
    np.testing.assert_array_equal(np.asarray(ac), np.asarray(af))


def test_step_timer_and_force_completion():
    from nuwa_tpu.utils.profiling import StepTimer, force_completion

    t = StepTimer(warmup=1)
    for _ in range(3):
        with t:
            x = jnp.ones((8, 8)) * 2
            force_completion(x)
    s = t.summary()
    assert s["steps"] == 2
    assert s["mean_s"] > 0


def test_model_jit_cache_evicts_least_recently_used():
    """The memoized-jit layer must keep hot entries alive at capacity: a
    re-trace of a hot rollout costs multi-minute compiles through the
    tunnel (round-4 review finding — eviction was insertion-ordered)."""
    from nuwa_tpu.models.common import _ModelJitCache

    import jax.numpy as jnp

    calls = []

    def build(tag, val):
        def make():
            calls.append(tag)
            return lambda: jnp.asarray(val)
        return make

    cache = _ModelJitCache(maxsize=2)
    assert int(cache("m", "a", build("a", 1))()) == 1
    assert int(cache("m", "b", build("b", 2))()) == 2
    # touch 'a' so 'b' is the least recently used
    assert int(cache("m", "a", build("a!", 10))()) == 1
    assert calls == ["a", "b"]
    # inserting 'c' at capacity must evict 'b', not the hot 'a'
    assert int(cache("m", "c", build("c", 3))()) == 3
    assert int(cache("m", "a", build("a-retraced", 11))()) == 1
    assert calls == ["a", "b", "c"]
    assert int(cache("m", "b", build("b-retraced", 20))()) == 20
