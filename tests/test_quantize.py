"""int8 weight-only serving path (nuwa_tpu/utils/quantize.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from nuwa_tpu.core.layers import Dense
from nuwa_tpu.models import NUWA
from nuwa_tpu.utils.quantize import dequant, quantize_params_int8

KEY = jax.random.PRNGKey(0)


def tiny_nuwa():
    return NUWA(
        dim=32,
        image_size=4,
        num_image_tokens=64,
        max_video_frames=2,
        text_num_tokens=32,
        text_max_seq_len=16,
        text_enc_depth=1,
        text_enc_dim_head=16,
        text_enc_heads=2,
        dec_depth=2,
        dec_dim_head=16,
        dec_heads=2,
        shift_video_tokens=False,
    )


def test_dense_dequant_exact():
    d = Dense(8, 16, use_bias=True)
    p = d.init(KEY)
    q = quantize_params_int8({"to_q": p})["to_q"]
    assert q["w"].dtype == jnp.int8
    x = jax.random.normal(KEY, (4, 8))
    ref = x @ (np.asarray(q["w"], np.float32) * np.asarray(q["w_scale"])) + np.asarray(p["b"])
    out = d(q, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_quantize_tree_selectivity():
    model = tiny_nuwa()
    p = model.init(KEY)
    qp = quantize_params_int8(p)
    # projection weights quantized
    layer0 = qp["video_transformer"]["layers"][0]["inner"]
    assert layer0["to_q"]["w"].dtype == jnp.int8
    assert "w_scale" in layer0["to_q"]
    # logits head quantized into a dict
    assert qp["to_logits"]["w"].dtype == jnp.int8
    # norms / embeddings / bos untouched
    assert qp["video_transformer"]["layers"][0]["pre"]["g"].dtype == jnp.float32
    assert qp["image_embedding"]["table"].dtype == jnp.float32
    assert qp["video_bos"].dtype == jnp.float32
    # int8 error bounded per channel
    w = np.asarray(p["to_logits"])
    wq = np.asarray(dequant(qp["to_logits"]))
    np.testing.assert_allclose(wq, w, atol=np.abs(w).max() / 100)


def test_quantized_forward_logits_close():
    model = tiny_nuwa()
    p = model.init(KEY)
    qp = quantize_params_int8(p)
    text = jnp.array([[1, 2, 3, 0]])
    idx = jax.random.randint(KEY, (1, 2 * model.tokens_per_frame), 0, 64)
    ref = np.asarray(model.forward(p, text=text, video=idx))
    out = np.asarray(model.forward(qp, text=text, video=idx))
    # int8 weight-only: small logits perturbation
    assert np.abs(out - ref).max() < 0.15 * np.abs(ref).max()


def test_quantized_params_keep_tp_sharding_rules():
    """int8 {w, w_scale} leaves must still match the TP partition rules
    (to_logits/w stays vocab-sharded, scales shard with the output dim)."""
    from jax.sharding import PartitionSpec as P

    from nuwa_tpu.parallel import make_param_specs

    model = tiny_nuwa()
    qp = quantize_params_int8(model.init(KEY))
    specs = make_param_specs(qp)
    assert specs["to_logits"]["w"] == P(None, "model")
    assert specs["to_logits"]["w_scale"] == P("model")
    layer0 = specs["video_transformer"]["layers"][0]["inner"]
    assert layer0["to_q"]["w"] == P(None, "model")
    assert layer0["to_q"]["w_scale"] == P("model")
    assert layer0["to_out"]["w"] == P("model", None)
    assert layer0["to_out"]["w_scale"] == P()  # row-parallel: scale replicated


def test_quantized_sketch_model_skips_vaes():
    from conftest import make_tiny_vae
    from nuwa_tpu.models import NUWASketch

    vae, svae = make_tiny_vae(3), make_tiny_vae(5)
    k = jax.random.PRNGKey(0)
    model = NUWASketch(
        vae=vae, sketch_vae=svae, dim=16, image_size=8,
        max_video_frames=2, sketch_max_video_frames=1,
        sketch_enc_depth=1, sketch_enc_dim_head=8, sketch_enc_heads=2,
        dec_depth=1, dec_dim_head=8, dec_heads=2,
    )
    p = model.init(
        k, vae_params=vae.init(k), vae_state=vae.init_state(k),
        sketch_vae_params=svae.init(k), sketch_vae_state=svae.init_state(k),
    )
    qp = quantize_params_int8(p)
    # both frozen codecs untouched (incl. their VQ projections)
    for sub in ("vae", "sketch_vae"):
        for leaf in jax.tree.leaves(qp[sub]):
            assert leaf.dtype != jnp.int8
    assert qp["to_logits"]["w"].dtype == jnp.int8
    # quantized forward runs
    sketch = jax.random.uniform(k, (1, 1, 5, 8, 8))
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 3, 8, 8))
    loss = model.forward(qp, sketch=sketch, video=video, return_loss=True)
    assert np.isfinite(float(loss))


def test_quantize_idempotent():
    """Re-quantizing already-quantized params must be a no-op, not a silent
    double-quantization that corrupts scales."""
    model = tiny_nuwa()
    qp = quantize_params_int8(model.init(KEY))
    qp2 = quantize_params_int8(qp)
    for a, b in zip(jax.tree.leaves(qp), jax.tree.leaves(qp2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantized_checkpoint_roundtrip(tmp_path):
    """int8 {w, w_scale} leaves survive the msgpack checkpoint roundtrip
    bit-exactly (serving checkpoints)."""
    from nuwa_tpu.train.checkpoint import restore_latest, save_checkpoint

    model = tiny_nuwa()
    qp = quantize_params_int8(model.init(KEY))
    save_checkpoint(tmp_path, "qparams", 0, qp)
    step, restored = restore_latest(tmp_path, "qparams", qp)
    assert step == 0
    assert restored["to_logits"]["w"].dtype == jnp.int8
    for a, b in zip(jax.tree.leaves(qp), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantized_generate_runs():
    model = tiny_nuwa()
    p = model.init(KEY)
    qp = quantize_params_int8(p)
    text = jnp.array([[1, 2, 3, 0]])
    idx = model.generate(
        qp, text=text, key=KEY, decode_video=False, cond_scale=2.0
    )
    assert idx.shape == (1, 2 * model.tokens_per_frame)
    assert int(idx.min()) >= 0 and int(idx.max()) < 64


def test_quantized_generate_long_cached_runs():
    """int8 weight-only params compose with the cached sliding-window long
    rollout (serving path: prefill + incremental caches over quantized
    projections/logits), and the cached path matches the full-re-forward
    oracle under quantization."""
    model = tiny_nuwa()
    p = model.init(KEY)
    qp = quantize_params_int8(p)
    text = jnp.array([[1, 2, 3, 0]])
    cached = model.generate_long(
        qp, text=text, key=KEY, num_frames=4, decode_video=False,
        cond_scale=2.0, method="cached",
    )
    assert cached.shape == (1, 4 * model.tokens_per_frame)
    full = model.generate_long(
        qp, text=text, key=KEY, num_frames=4, decode_video=False,
        cond_scale=2.0, method="full",
    )
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(full))
