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
