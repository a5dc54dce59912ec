"""Multi-device tests on the 8-device virtual CPU mesh: DP/TP sharding of the
NUWA train step, VQ EMA under sharded batches, and sharding-rule sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from nuwa_tpu.models import NUWA
from nuwa_tpu.parallel import (
    data_sharding,
    make_mesh,
    make_param_specs,
    shard_params,
)
from nuwa_tpu.train.optimizer import get_optimizer

KEY = jax.random.PRNGKey(0)


def tiny_model():
    return NUWA(
        dim=16,
        image_size=2,
        num_image_tokens=16,
        max_video_frames=2,
        text_num_tokens=32,
        text_enc_depth=1,
        text_enc_dim_head=8,
        text_enc_heads=2,
        dec_depth=1,
        dec_dim_head=8,
        dec_heads=2,
        shift_video_tokens=False,
    )


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_param_specs_rules():
    model = tiny_model()
    params = model.init(KEY)
    specs = make_param_specs(params)
    # find an attention to_q spec: column parallel
    layer0 = specs["video_transformer"]["layers"][0]
    flat, _ = jax.tree_util.tree_flatten_with_path(specs)
    found_col = found_row = False
    for path, spec in flat:
        s = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if "to_q/w" in s:
            assert spec == P(None, "model"), s
            found_col = True
        if "to_out/w" in s:
            assert spec == P("model", None), s
            found_row = True
    assert found_col and found_row


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 2)])
def test_sharded_train_step_matches_single_device(mesh_shape):
    """The pjit'd DP/TP step must produce the same loss/params as one device."""
    data, model_ax = mesh_shape
    devices = jax.devices()[: data * model_ax]
    mesh = make_mesh(data=data, model=model_ax, devices=devices)

    model = tiny_model()
    params = model.init(KEY)
    tx = get_optimizer(lr=1e-3, wd=0.01, params=params)
    opt0 = tx.init(params)

    text = jax.random.randint(KEY, (8, 4), 1, 32)
    video = jax.random.randint(jax.random.PRNGKey(1), (8, 8), 0, 16)

    def loss_fn(p, text, video):
        return model.forward(p, text=text, video=video, return_loss=True)

    def step(p, opt, text, video):
        loss, grads = jax.value_and_grad(loss_fn)(p, text, video)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    # single-device reference
    p1, _, loss1 = jax.jit(step)(params, opt0, text, video)

    # sharded
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        sp = shard_params(params, mesh)
        sopt = tx.init(sp)
        stext = jax.device_put(text, data_sharding(mesh, 2))
        svideo = jax.device_put(video, data_sharding(mesh, 2))
        p2, _, loss2 = jax.jit(step)(sp, sopt, stext, svideo)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4
        )


def test_vq_ema_global_under_sharding():
    """VQ EMA statistics must be computed over the *global* batch under SPMD."""
    from nuwa_tpu.vq import VectorQuantizeEMA

    mesh = make_mesh(data=8, model=1)
    vq = VectorQuantizeEMA(dim=4, codebook_size=8, kmeans_init=False, cosine_sim=False)
    p = vq.init(KEY)
    s = vq.init_state(KEY)
    x = jax.random.normal(KEY, (16, 4))

    def run(s, x):
        _, _, _, s2 = vq(p, s, x, update=True)
        return s2

    s_single = jax.jit(run)(s, x)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    s_sharded = jax.jit(run)(s, xs)
    for a, b in zip(jax.tree.leaves(s_single), jax.tree.leaves(s_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vq_dead_code_expiry_replicated_under_shard_map():
    """Dead-code re-seeding under an explicit axis_name must broadcast the
    seed vectors from one replica — every device ends with an identical
    codebook state (ADVICE r2: local-shard seeds silently desynced it)."""
    from jax import shard_map
    from nuwa_tpu.vq import VectorQuantizeEMA

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    vq = VectorQuantizeEMA(
        dim=4, codebook_size=8, kmeans_init=False, cosine_sim=False,
        threshold_ema_dead_code=2.0,  # high: plenty of codes die
    )
    p = vq.init(KEY)
    s = vq.init_state(KEY)
    x = jax.random.normal(KEY, (16, 4))

    def local(x):
        _, _, _, s2 = vq(
            p, s, x, update=True, axis_name="data", rng=jax.random.PRNGKey(7)
        )
        return jax.tree.map(lambda t: t[None], s2)

    stacked = shard_map(
        local, mesh=mesh, in_specs=P("data", None), out_specs=P("data"),
    )(x)
    for leaf in jax.tree.leaves(stacked):
        leaf = np.asarray(leaf)
        for d in range(1, 4):
            np.testing.assert_array_equal(leaf[d], leaf[0])


def test_generate_under_mesh():
    """AR decode must run with sharded params (serving path)."""
    mesh = make_mesh(data=1, model=8)
    model = tiny_model()
    params = model.init(KEY)
    sp = shard_params(params, mesh)
    text = jnp.array([[1, 2, 3, 0]])
    idx = model.generate(sp, text=text, key=KEY, decode_video=False, cond_scale=1.0)
    assert idx.shape == (1, 8)


def test_tp_serving_decode_parity():
    """Cached batched decode under tensor parallelism (b=8, model=2, data=4):
    model-sharded params + batch-sharded text must sample the SAME tokens as
    the unsharded decoder (serving under TP, VERDICT r2 #10)."""
    mesh = make_mesh(data=4, model=2)
    model = tiny_model()
    params = model.init(KEY)
    text = jnp.tile(jnp.array([[1, 2, 3, 0]]), (8, 1)).at[3, 1].set(9)

    gen = lambda p, t: model.generate(
        p, text=t, key=KEY, decode_video=False, cond_scale=2.0, method="cached"
    )
    ref = np.asarray(gen(params, text))

    sp = shard_params(params, mesh)
    stext = jax.device_put(text, data_sharding(mesh, 2))
    out = np.asarray(gen(sp, stext))
    np.testing.assert_array_equal(out, ref)


class _ToyVideoText:
    def __init__(self, video_tokens, vocab, n=32):
        self.video_tokens, self.vocab, self.n = video_tokens, vocab, n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        text = rng.integers(1, 30, size=4).astype(np.int64)
        video = rng.integers(0, self.vocab, size=self.video_tokens).astype(np.int64)
        return text, video


def test_nuwa_trainer_with_mesh_matches_unmeshed(tmp_path):
    """End-to-end NUWA training through the public trainer on a (4,2) mesh
    must track the single-device trainer (same seed, same data order)."""
    from nuwa_tpu.train.trainer_nuwa import NUWATrainer

    model = tiny_model()
    params = model.init(KEY)
    mesh = make_mesh(data=4, model=2)

    def mk(folder, mesh_arg):
        t = NUWATrainer(
            nuwa=model, params=params,
            dataset=_ToyVideoText(video_tokens=2 * 4, vocab=16),
            num_train_steps=3, batch_size=4, grad_accum_every=2,
            results_folder=str(folder), save_results_every=10**9,
            save_model_every=10**9, seed=11, resume=False, mesh=mesh_arg,
        )
        t._sample = lambda *a, **k: None
        return t

    t_single = mk(tmp_path / "single", None)
    losses_single = []
    t_single.train(log_fn=lambda logs: losses_single.append(logs["loss"]))

    t_mesh = mk(tmp_path / "mesh", mesh)
    losses_mesh = []
    t_mesh.train(log_fn=lambda logs: losses_mesh.append(logs["loss"]))

    np.testing.assert_allclose(losses_mesh, losses_single, rtol=2e-4)
    for a, b in zip(
        jax.tree.leaves(t_single.state["params"]),
        jax.tree.leaves(t_mesh.state["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-4)


def _cp_model():
    """Sparse-3DNA decoder NUWA sized so frames (8) shard over data=4."""
    return NUWA(
        dim=16,
        image_size=2,
        num_image_tokens=16,
        max_video_frames=8,
        text_num_tokens=32,
        text_enc_depth=1,
        text_enc_dim_head=8,
        text_enc_heads=2,
        dec_depth=2,
        dec_dim_head=8,
        dec_heads=2,
        sparse_3dna_kernel_size=3,
        sparse_3dna_dilation=(1, 2),
        sparse_3dna_rel_pos_bias=True,
        shift_video_tokens=True,
    )


def test_full_model_forward_under_context_parallelism():
    """The whole NUWA decoder forward (every 3DNA layer CP-sharded over
    frames with halo exchange) must match the plain forward."""
    model = _cp_model()
    params = model.init(KEY)
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    text = jax.random.randint(KEY, (2, 4), 1, 32)
    video = jax.random.randint(jax.random.PRNGKey(1), (2, 8 * 4), 0, 16)

    ref = model.forward(params, text=text, video=video, return_loss=False)
    out = model.forward(
        params, text=text, video=video, return_loss=False, cp_mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-3)

    loss_ref = model.forward(params, text=text, video=video, return_loss=True)
    loss_cp = model.forward(
        params, text=text, video=video, return_loss=True, cp_mesh=mesh
    )
    np.testing.assert_allclose(float(loss_cp), float(loss_ref), rtol=1e-5)


def test_nuwa_trainer_context_parallel(tmp_path):
    """One train step through the public trainer with context_parallel=True
    (frame-sharded attention) must match the plain trainer."""
    from nuwa_tpu.train.trainer_nuwa import NUWATrainer

    model = _cp_model()
    params = model.init(KEY)
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])

    def mk(folder, **kw):
        t = NUWATrainer(
            nuwa=model, params=params,
            dataset=_ToyVideoText(video_tokens=8 * 4, vocab=16),
            num_train_steps=2, batch_size=2, grad_accum_every=2,
            results_folder=str(folder), save_results_every=10**9,
            save_model_every=10**9, seed=5, resume=False, **kw,
        )
        t._sample = lambda *a, **k: None
        return t

    t_plain = mk(tmp_path / "plain")
    losses_plain = []
    t_plain.train(log_fn=lambda logs: losses_plain.append(logs["loss"]))

    t_cp = mk(tmp_path / "cp", mesh=mesh, context_parallel=True)
    losses_cp = []
    t_cp.train(log_fn=lambda logs: losses_cp.append(logs["loss"]))

    np.testing.assert_allclose(losses_cp, losses_plain, rtol=2e-4)


def test_sketch_model_forward_under_context_parallelism():
    """NUWASketch's decoder (Sparse3DNA self + SparseCross2DNA cross) under
    frame-axis CP must match the plain forward."""
    from conftest import make_tiny_vae
    from nuwa_tpu.models import NUWASketch

    vae, svae = make_tiny_vae(3), make_tiny_vae(5)
    k = jax.random.PRNGKey(0)
    model = NUWASketch(
        vae=vae, sketch_vae=svae, dim=16, image_size=8,
        max_video_frames=8, sketch_max_video_frames=1,
        sketch_enc_depth=1, sketch_enc_dim_head=8, sketch_enc_heads=2,
        dec_depth=2, dec_dim_head=8, dec_heads=2,
        sparse_3dna_kernel_size=3, sparse_3dna_dilation=(1, 2),
    )
    p = model.init(
        k, vae_params=vae.init(k), vae_state=vae.init_state(k),
        sketch_vae_params=svae.init(k), sketch_vae_state=svae.init_state(k),
    )
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    sketch = jax.random.uniform(k, (2, 1, 5, 8, 8))
    video = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 3, 8, 8))

    ref = model.forward(p, sketch=sketch, video=video, return_loss=True)
    cp = model.forward(
        p, sketch=sketch, video=video, return_loss=True, cp_mesh=mesh
    )
    np.testing.assert_allclose(float(cp), float(ref), rtol=1e-5)


def test_dual_model_forward_under_context_parallelism():
    """NUWAVideoAudio (non-reversible dual decoder) under frame-axis CP:
    the video tower's 3DNA layers shard over frames; audio/cross blocks stay
    replicated. Must match the plain forward."""
    from conftest import make_tiny_vae
    from nuwa_tpu.models import NUWAVideoAudio

    vae = make_tiny_vae(3)
    k = jax.random.PRNGKey(0)
    model = NUWAVideoAudio(
        vae=vae, dim=16, image_size=8, num_audio_tokens=24,
        num_audio_tokens_per_video_frame=3, max_video_frames=8,
        text_num_tokens=32, text_max_seq_len=16, text_enc_depth=1,
        text_enc_dim_head=8, text_enc_heads=2, dec_depth=2, dec_dim_head=8,
        dec_heads=2, dec_reversible=False, cross_modality_attn_every=2,
    )
    p = model.init(k, vae_params=vae.init(k), vae_state=vae.init_state(k))
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    text = jax.random.randint(k, (2, 4), 1, 32)
    video = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 3, 8, 8))
    audio = jax.random.randint(jax.random.PRNGKey(2), (2, 8 * 3), 0, 24)

    ref = model.forward(p, text=text, video=video, audio=audio, return_loss=True)
    cp = model.forward(
        p, text=text, video=video, audio=audio, return_loss=True, cp_mesh=mesh
    )
    np.testing.assert_allclose(float(cp), float(ref), rtol=1e-5)


def _cp_rev_model():
    """Reversible sparse-3DNA decoder (BASELINE config #3 shape class)."""
    return NUWA(
        dim=16,
        image_size=2,
        num_image_tokens=16,
        max_video_frames=8,
        text_num_tokens=32,
        text_enc_depth=1,
        text_enc_dim_head=8,
        text_enc_heads=2,
        dec_depth=2,
        dec_dim_head=8,
        dec_heads=2,
        dec_reversible=True,
        sparse_3dna_kernel_size=3,
        sparse_3dna_dilation=(1, 2),
        sparse_3dna_rel_pos_bias=True,
        shift_video_tokens=True,
    )


def test_reversible_context_parallel_forward_and_grads():
    """CP must compose with the reversible runtime: the O(1)-memory
    custom_vjp recomputes through the shard_map'd halo exchange, and its
    jax.vjp ppermutes the halo cotangents back. Forward AND grads must match
    the unmeshed reversible model."""
    model = _cp_rev_model()
    params = model.init(KEY)
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    text = jax.random.randint(KEY, (2, 4), 1, 32)
    video = jax.random.randint(jax.random.PRNGKey(1), (2, 8 * 4), 0, 16)

    def loss(p, cp):
        return model.forward(p, text=text, video=video, return_loss=True, cp_mesh=cp)

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, None))(params)
    l_cp, g_cp = jax.value_and_grad(lambda p: loss(p, mesh))(params)
    np.testing.assert_allclose(float(l_cp), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_cp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )


def test_dual_reversible_context_parallel():
    """The reversible dual decoder (BASELINE flagship config #5 class) under
    frame-axis CP: loss and grads match the unmeshed reversible model."""
    from conftest import make_tiny_vae
    from nuwa_tpu.models import NUWAVideoAudio

    vae = make_tiny_vae(3)
    k = jax.random.PRNGKey(0)
    model = NUWAVideoAudio(
        vae=vae, dim=16, image_size=8, num_audio_tokens=24,
        num_audio_tokens_per_video_frame=3, max_video_frames=8,
        text_num_tokens=32, text_max_seq_len=16, text_enc_depth=1,
        text_enc_dim_head=8, text_enc_heads=2, dec_depth=2, dec_dim_head=8,
        dec_heads=2, dec_reversible=True, cross_modality_attn_every=2,
    )
    p = model.init(k, vae_params=vae.init(k), vae_state=vae.init_state(k))
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    text = jax.random.randint(k, (2, 4), 1, 32)
    video = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 3, 8, 8))
    audio = jax.random.randint(jax.random.PRNGKey(2), (2, 8 * 3), 0, 24)

    def loss(p_, cp):
        return model.forward(
            p_, text=text, video=video, audio=audio, return_loss=True, cp_mesh=cp
        )

    l_ref, g_ref = jax.value_and_grad(lambda p_: loss(p_, None))(p)
    l_cp, g_cp = jax.value_and_grad(lambda p_: loss(p_, mesh))(p)
    np.testing.assert_allclose(float(l_cp), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_cp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )


def test_context_parallel_nondivisible_frames():
    """F=10 frames on 4 devices (BASELINE config #3's literal frame count):
    phantom frames are padded per shard and masked out of neighborhoods."""
    from nuwa_tpu.nda import Sparse3DNA
    from nuwa_tpu.parallel.context_parallel import context_parallel_sparse_3dna

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    mod = Sparse3DNA(
        dim=16, video_shape=(10, 2, 2), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=True, rel_pos_bias=True,
    )
    p = mod.init(KEY)
    for t in (10 * 4, 10 * 4 - 3):  # full grid and ragged tail
        x = jax.random.normal(KEY, (2, 1 + t, 16))
        ref = np.asarray(mod(p, x))
        out = np.asarray(context_parallel_sparse_3dna(mod, p, x, mesh, axis="data"))
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_context_parallel_bos_only_input():
    """A bos-only sequence (t == 0) under cp_mesh takes the bos early-return
    instead of crashing in the halo geometry (ZeroDivision on Floc=0)."""
    from nuwa_tpu.nda import Sparse3DNA

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    mod = Sparse3DNA(
        dim=16, video_shape=(8, 2, 2), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=True,
    )
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 1, 16))
    ref = np.asarray(mod(p, x))
    out = np.asarray(mod(p, x, cp_mesh=mesh))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_context_parallel_attention_dropout_parity():
    """Attention dropout under CP: the absolute-coordinate masks make the
    realized dropout independent of the shard layout, so the CP forward
    with dropout is bit-identical (up to float error) to the unsharded
    forward given the same key — and differs across keys."""
    model = _cp_model().replace(attn_dropout=0.3)
    params = model.init(KEY)
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    text = jax.random.randint(KEY, (2, 4), 1, 32)
    video = jax.random.randint(jax.random.PRNGKey(1), (2, 8 * 4), 0, 16)

    loss_ref = model.forward(
        params, text=text, video=video, return_loss=True, key=KEY, train=True
    )
    loss_cp = model.forward(
        params, text=text, video=video, return_loss=True, cp_mesh=mesh,
        key=KEY, train=True,
    )
    np.testing.assert_allclose(float(loss_cp), float(loss_ref), rtol=1e-5)

    other = model.forward(
        params, text=text, video=video, return_loss=True, cp_mesh=mesh,
        key=jax.random.PRNGKey(9), train=True,
    )
    assert abs(float(other) - float(loss_cp)) > 1e-6  # keys matter


def test_context_parallel_centered_sketch_encoder():
    """Centered 3DNA (the sketch encoder) under CP: bidirectional halo
    exchange (lookback AND lookahead frames) must match the plain
    forward."""
    from nuwa_tpu.nda import Sparse3DNA

    mod = Sparse3DNA(
        dim=16, video_shape=(8, 2, 2), kernel_size=3, dilation=2,
        heads=2, dim_head=8, causal=False, rel_pos_bias=True,
    )
    p = mod.init(KEY)
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    x = jax.random.normal(KEY, (2, 1 + 8 * 4, 16))

    ref = np.asarray(mod(p, x))
    out = np.asarray(mod(p, x, cp_mesh=mesh))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)

    # ragged tail (phantom positions in the last frame, lookahead masked)
    x2 = jax.random.normal(jax.random.PRNGKey(2), (1, 1 + 8 * 4 - 3, 16))
    ref2 = np.asarray(mod(p, x2))
    out2 = np.asarray(mod(p, x2, cp_mesh=mesh))
    np.testing.assert_allclose(out2, ref2, atol=1e-5, rtol=1e-4)


def test_nuwa_trainer_dp_x_cp(tmp_path):
    """DPxCP on a ('data', 'model', 'context') mesh: batch sharded over
    'data', frames over 'context' — losses must match the plain trainer."""
    from nuwa_tpu.train.trainer_nuwa import NUWATrainer

    model = _cp_model()
    params = model.init(KEY)
    mesh = make_mesh(data=2, model=1, context=4)

    def mk(folder, **kw):
        t = NUWATrainer(
            nuwa=model, params=params,
            dataset=_ToyVideoText(video_tokens=8 * 4, vocab=16),
            num_train_steps=2, batch_size=2, grad_accum_every=2,
            results_folder=str(folder), save_results_every=10**9,
            save_model_every=10**9, seed=5, resume=False, **kw,
        )
        t._sample = lambda *a, **k: None
        return t

    t_plain = mk(tmp_path / "plain")
    losses_plain = []
    t_plain.train(log_fn=lambda logs: losses_plain.append(logs["loss"]))

    t_cp = mk(tmp_path / "dpcp", mesh=mesh, context_parallel=True)
    losses_cp = []
    t_cp.train(log_fn=lambda logs: losses_cp.append(logs["loss"]))

    np.testing.assert_allclose(losses_cp, losses_plain, rtol=2e-4)


def test_vqgan_trainer_with_mesh(tmp_path):
    """VQGanVAETrainer on a data mesh: runs, loss finite, matches unmeshed."""
    from nuwa_tpu.train.trainer_vqgan import VQGanVAETrainer
    from nuwa_tpu.vqgan_vae import VQGanVAE

    class Imgs:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return (
                np.random.default_rng(i).uniform(size=(3, 8, 8)).astype(np.float32)
            )

    vae = VQGanVAE(
        dim=8, image_size=8, num_layers=1, vq_codebook_size=16,
        vq_codebook_dim=8, resnet_groups=4, use_vgg_and_gan=True,
        perceptual="none", vq_kmeans_init=False, use_attn=False,
        num_resnet_blocks=0,
    )
    mesh = make_mesh(data=4, model=2)

    def mk(folder, mesh_arg):
        return VQGanVAETrainer(
            vae, num_train_steps=2, lr=1e-3, batch_size=4, grad_accum_every=2,
            dataset=Imgs(), valid_frac=0.0, results_folder=str(folder),
            resume=False, save_results_every=10**9, save_model_every=10**9,
            ema_update_after_step=0, ema_update_every=1, seed=3,
            mesh=mesh_arg,
        )

    losses_single, losses_mesh = [], []
    mk(tmp_path / "single", None).train(
        log_fn=lambda logs: losses_single.append((logs["loss"], logs["discr_loss"]))
    )
    mk(tmp_path / "mesh", mesh).train(
        log_fn=lambda logs: losses_mesh.append((logs["loss"], logs["discr_loss"]))
    )
    np.testing.assert_allclose(losses_mesh, losses_single, rtol=5e-4, atol=1e-5)


def test_context_parallel_sparse3dna_matches_single_device():
    """Frame-axis CP with halo exchange must equal the plain layer."""
    from nuwa_tpu.nda import Sparse3DNA
    from nuwa_tpu.parallel.context_parallel import context_parallel_sparse_3dna

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    mod = Sparse3DNA(
        dim=16, video_shape=(8, 2, 2), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=True, rel_pos_bias=True,
    )
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 1 + 8 * 4, 16))
    ref = np.asarray(mod(p, x))
    out = np.asarray(context_parallel_sparse_3dna(mod, p, x, mesh, axis="data"))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_context_parallel_multihop_halo():
    """Lookback larger than one shard (dilation 2 -> LB=4 frames, 1/shard)."""
    from nuwa_tpu.nda import Sparse3DNA
    from nuwa_tpu.parallel.context_parallel import context_parallel_sparse_3dna

    mesh = make_mesh(data=8, model=1)
    mod = Sparse3DNA(
        dim=16, video_shape=(8, 2, 2), kernel_size=3, dilation=2,
        heads=2, dim_head=8, causal=True,
    )
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (1, 1 + 8 * 4, 16))
    ref = np.asarray(mod(p, x))
    out = np.asarray(context_parallel_sparse_3dna(mod, p, x, mesh, axis="data"))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_dual_tp_serving_decode_parity():
    """NUWAVideoAudio cached decode under tensor parallelism (model=2,
    data=4): TP-sharded params + batch-sharded text must sample the SAME
    video and audio tokens as the unsharded dual decoder."""
    from nuwa_tpu.models import NUWAVideoAudio
    from nuwa_tpu.vqgan_vae import VQGanVAE

    k = jax.random.PRNGKey(0)
    vae = VQGanVAE(
        dim=8, image_size=16, num_layers=1, vq_codebook_size=16,
        vq_codebook_dim=8, resnet_groups=4, use_vgg_and_gan=False,
        vq_kmeans_init=False, use_attn=False, num_resnet_blocks=0,
    )
    model = NUWAVideoAudio(
        vae=vae, dim=16, image_size=16, num_audio_tokens=24,
        num_audio_tokens_per_video_frame=3, max_video_frames=2,
        text_num_tokens=32, text_max_seq_len=8, text_enc_depth=1,
        text_enc_dim_head=8, text_enc_heads=2, dec_depth=2, dec_dim_head=8,
        dec_heads=2, dec_reversible=False, cross_modality_attn_every=2,
    )
    p = model.init(k, vae_params=vae.init(k), vae_state=vae.init_state(k))
    text = jnp.tile(jnp.array([[1, 2, 3, 0, 0, 0, 0, 0]]), (4, 1)).at[1, 1].set(7)

    gen = lambda pp, t: model.generate(
        pp, text=t, key=KEY, decode_video=False, cond_scale=2.0,
        method="cached",
    )
    vref, aref = gen(p, text)

    mesh = make_mesh(data=4, model=2)
    sp = shard_params(p, mesh)
    stext = jax.device_put(text, data_sharding(mesh, 2))
    v, a = gen(sp, stext)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(vref))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(aref))


# ---------------------------------------------------------------------------
# Pipeline parallelism (GPipe over a 'pipe' mesh axis)
# ---------------------------------------------------------------------------


def _pipe_mesh(n):
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:n]), ("pipe",))


def test_pipeline_transformer_forward_and_grad_parity():
    """Pipelined stack == plain stack (forward and parameter grads), at
    S=2/M=2 and S=4/M=4."""
    from nuwa_tpu.parallel.pipeline import pipelined_transformer
    from nuwa_tpu.transformer import Transformer

    tr = Transformer(dim=32, depth=4, causal=True, heads=2, dim_head=16)
    p = tr.init(KEY)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 32))
    w = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    ref = tr(p, x)
    g_ref = jax.grad(lambda p: jnp.mean(tr(p, x) * w))(p)
    for S, M in ((2, 2), (4, 4)):
        mesh = _pipe_mesh(S)
        out = pipelined_transformer(tr, p, x, mesh, num_microbatches=M)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )
        g = jax.grad(
            lambda p: jnp.mean(
                pipelined_transformer(tr, p, x, mesh, num_microbatches=M) * w
            )
        )(p)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
            ),
            g_ref, g,
        )


def test_pipeline_transformer_nuwa_decoder_config():
    """A NUWA-decoder-shaped stack (sparse 3DNA self-attn with a dilation
    cycle + cross-attn + masked context) pipelines when the cycle divides
    the stage length."""
    from nuwa_tpu.parallel.pipeline import pipelined_transformer
    from nuwa_tpu.transformer import Transformer

    tr = Transformer(
        dim=32, depth=4, causal=True, heads=2, dim_head=16,
        cross_attend=True, sparse_3dna_attn=True, sparse_3dna_kernel_size=3,
        sparse_3dna_video_shape=(2, 2, 2), sparse_3dna_dilations=(1, 2),
        shift_video_tokens=True,
    )
    p = tr.init(KEY)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 1 + 2 * 4, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 32))
    cmask = jnp.ones((4, 6), bool).at[:, 4:].set(False)
    ref = tr(p, x, context=ctx, context_mask=cmask)
    mesh = _pipe_mesh(2)
    out = pipelined_transformer(
        tr, p, x, mesh, num_microbatches=2, context=ctx, context_mask=cmask
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_pipeline_stage_validation():
    """Non-periodic menus and bad microbatch counts are rejected loudly."""
    from nuwa_tpu.parallel.pipeline import pipelined_transformer, validate_stages
    from nuwa_tpu.transformer import Transformer

    # dilation cycle (1, 2) with S=4: stage 0 gets dilation 1, stage 1 gets 2
    tr = Transformer(
        dim=32, depth=4, causal=True, heads=2, dim_head=16,
        sparse_3dna_attn=True, sparse_3dna_video_shape=(2, 2, 2),
        sparse_3dna_dilations=(1, 2),
    )
    with pytest.raises(ValueError, match="statically identical"):
        validate_stages(tr, 4)
    with pytest.raises(ValueError, match="does not split"):
        validate_stages(tr, 3)
    ok = Transformer(dim=32, depth=4, causal=True, heads=2, dim_head=16)
    p = ok.init(KEY)
    x = jnp.zeros((4, 8, 32))
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_transformer(ok, p, x, _pipe_mesh(2), num_microbatches=3)
    # cross layers without context must fail loudly up front (not a
    # KeyError from inside the pipeline scan)
    xa = Transformer(
        dim=32, depth=4, causal=True, heads=2, dim_head=16, cross_attend=True
    )
    pxa = xa.init(KEY)
    with pytest.raises(ValueError, match="no `context="):
        pipelined_transformer(xa, pxa, x, _pipe_mesh(2), num_microbatches=2)


def test_pipeline_dropout_runs_and_is_deterministic():
    """Dropout under the pipeline: keyed runs are deterministic given the
    key, differ across keys, and remat gives the same values."""
    from nuwa_tpu.parallel.pipeline import pipelined_transformer
    from nuwa_tpu.transformer import Transformer

    tr = Transformer(
        dim=32, depth=4, causal=True, heads=2, dim_head=16,
        attn_dropout=0.3, ff_dropout=0.3,
    )
    p = tr.init(KEY)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 32))
    mesh = _pipe_mesh(2)
    run = lambda t, k: pipelined_transformer(
        t, p, x, mesh, num_microbatches=2, key=k
    )
    a = run(tr, jax.random.PRNGKey(7))
    b = run(tr, jax.random.PRNGKey(7))
    c = run(tr, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.max(jnp.abs(a - c))) > 1e-4
    r = run(tr.replace(remat=True), jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(r), np.asarray(a), atol=1e-6)


def test_pipeline_reversible_transformer_parity():
    """PP×reversible: a ReversibleTransformer pipelines with its O(1)-memory
    custom_vjp runtime intact — the (x1, x2) stream pair is the pipeline
    carry. Forward and parameter grads match the plain reversible stack, at
    S=2/M=2, with cross-attention couples in the menu."""
    from nuwa_tpu.parallel.pipeline import pipelined_transformer
    from nuwa_tpu.transformer import ReversibleTransformer

    tr = ReversibleTransformer(
        dim=32, depth=4, causal=True, heads=2, dim_head=16, cross_attend=True
    )
    p = tr.init(KEY)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 32))
    cmask = jnp.ones((4, 6), bool).at[:, 4:].set(False)
    w = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    mesh = _pipe_mesh(2)

    ref = tr(p, x, context=ctx, context_mask=cmask)
    out = pipelined_transformer(
        tr, p, x, mesh, num_microbatches=2, context=ctx, context_mask=cmask
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )

    g_ref = jax.grad(
        lambda p: jnp.mean(tr(p, x, context=ctx, context_mask=cmask) * w)
    )(p)
    g = jax.grad(
        lambda p: jnp.mean(
            pipelined_transformer(
                tr, p, x, mesh, num_microbatches=2,
                context=ctx, context_mask=cmask,
            ) * w
        )
    )(p)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        g_ref, g,
    )

    # dropout under the reversible pipeline: deterministic given the key,
    # different across keys (bit-parity with the unsharded layout is not
    # defined — keys fold with the microbatch index)
    trd = tr.replace(attn_dropout=0.3, ff_dropout=0.3)
    run = lambda k: pipelined_transformer(
        trd, p, x, mesh, num_microbatches=2,
        context=ctx, context_mask=cmask, key=k,
    )
    a = run(jax.random.PRNGKey(7))
    np.testing.assert_array_equal(
        np.asarray(a), np.asarray(run(jax.random.PRNGKey(7)))
    )
    assert float(jnp.max(jnp.abs(a - run(jax.random.PRNGKey(8))))) > 1e-4


def test_pipeline_reversible_dual_decoder_parity():
    """PP×reversible for the dual decoder: the (v1, v2, a1, a2) quad rides
    the pipeline carry through the O(1)-memory dual runtime; forward and
    grads match the plain reversible dual decoder (xmod block per stage)."""
    from nuwa_tpu.dual_decoder import ReversibleDualModalityDecoder
    from nuwa_tpu.parallel.pipeline import pipelined_dual_decoder

    d = ReversibleDualModalityDecoder(
        dim=16, depth=2, heads=2, dim_head=8,
        num_video_tokens_per_frame=4, num_audio_tokens_per_video_frame=3,
        sparse_3dna_video_shape=(2, 2, 2), sparse_2dna_kernel_size=3,
        cross_modality_attn_every=1, audio_tokens_per_timestep=1,
    )
    p = d.init(KEY)
    video = jax.random.normal(KEY, (4, 9, 16))
    audio = jax.random.normal(jax.random.PRNGKey(1), (4, 7, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 5, 16))
    cmask = jnp.ones((4, 5), bool).at[:, 4:].set(False)
    wv = jax.random.normal(jax.random.PRNGKey(3), video.shape)
    wa = jax.random.normal(jax.random.PRNGKey(4), audio.shape)
    mesh = _pipe_mesh(2)

    vref, aref = d(p, video, audio, context=ctx, context_mask=cmask)
    v, a = pipelined_dual_decoder(
        d, p, video, audio, mesh, num_microbatches=2,
        context=ctx, context_mask=cmask,
    )
    np.testing.assert_allclose(np.asarray(v), np.asarray(vref), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(aref), atol=1e-5, rtol=1e-5)

    def loss(fn):
        def go(p):
            v, a = fn(p)
            return jnp.mean(v * wv) + jnp.mean(a * wa)
        return go

    g_ref = jax.grad(
        loss(lambda p: d(p, video, audio, context=ctx, context_mask=cmask))
    )(p)
    g = jax.grad(
        loss(
            lambda p: pipelined_dual_decoder(
                d, p, video, audio, mesh, num_microbatches=2,
                context=ctx, context_mask=cmask,
            )
        )
    )(p)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        g_ref, g,
    )


def test_pipeline_x_data_parallel():
    """PP×DP on a ('data', 'pipe') mesh: microbatch rows shard over 'data',
    params replicate across it; forward and grads match the plain stack
    (shard_map's transpose supplies the DP gradient psum)."""
    from jax.sharding import Mesh

    from nuwa_tpu.parallel.pipeline import pipelined_transformer
    from nuwa_tpu.transformer import Transformer

    tr = Transformer(dim=32, depth=4, causal=True, heads=2, dim_head=16)
    p = tr.init(KEY)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 32))
    w = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "pipe"))
    run = lambda p: pipelined_transformer(
        tr, p, x, mesh, num_microbatches=2, data_axis="data"
    )
    np.testing.assert_allclose(
        np.asarray(run(p)), np.asarray(tr(p, x)), atol=1e-5, rtol=1e-5
    )
    g_ref = jax.grad(lambda p: jnp.mean(tr(p, x) * w))(p)
    g = jax.grad(lambda p: jnp.mean(run(p) * w))(p)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3
        ),
        g_ref, g,
    )
    with pytest.raises(ValueError, match="not divisible by mesh axis"):
        pipelined_transformer(
            tr, p, x[:6], mesh, num_microbatches=2, data_axis="data"
        )


def test_nuwa_forward_pipeline_parallel():
    """Model-level PP: NUWA.forward(pp_mesh=...) loss + grads == plain, for
    the plain AND the reversible decoder (the reversible stream pair rides
    the pipeline carry)."""
    from jax.sharding import Mesh

    model = NUWA(
        dim=16, image_size=2, num_image_tokens=16, max_video_frames=2,
        text_num_tokens=32, text_enc_depth=1, text_enc_dim_head=8,
        text_enc_heads=2, dec_depth=2, dec_dim_head=8, dec_heads=2,
        shift_video_tokens=False,
    )
    p = model.init(KEY)
    text = jnp.ones((4, 8), jnp.int32)
    video = jnp.zeros((4, 2 * model.tokens_per_frame), jnp.int32)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pipe",))

    loss_ref, g_ref = jax.value_and_grad(
        lambda p: model.forward(p, text=text, video=video, return_loss=True)
    )(p)
    loss_pp, g_pp = jax.value_and_grad(
        lambda p: model.forward(
            p, text=text, video=video, return_loss=True,
            pp_mesh=mesh, pp_microbatches=2,
        )
    )(p)
    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3
        ),
        g_ref, g_pp,
    )

    rev = model.replace(dec_reversible=True)
    pr = rev.init(KEY)
    loss_rr, g_rr = jax.value_and_grad(
        lambda p: rev.forward(p, text=text, video=video, return_loss=True)
    )(pr)
    loss_rp, g_rp = jax.value_and_grad(
        lambda p: rev.forward(
            p, text=text, video=video, return_loss=True,
            pp_mesh=mesh, pp_microbatches=2,
        )
    )(pr)
    np.testing.assert_allclose(float(loss_rp), float(loss_rr), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3
        ),
        g_rr, g_rp,
    )


def test_nuwa_trainer_pipeline_parallel(tmp_path):
    """PPxDP trainer on a ('data', 'pipe') mesh: losses match the plain
    trainer (dilation cycle (1, 2) over dec_depth 4 = one cycle per stage)."""
    from nuwa_tpu.train.trainer_nuwa import NUWATrainer

    model = _cp_model().replace(dec_depth=4)
    params = model.init(KEY)
    mesh = make_mesh(data=2, pipe=2, devices=jax.devices()[:4])

    def mk(folder, **kw):
        t = NUWATrainer(
            nuwa=model, params=params,
            dataset=_ToyVideoText(video_tokens=8 * 4, vocab=16),
            num_train_steps=2, batch_size=4, grad_accum_every=2,
            results_folder=str(folder), save_results_every=10**9,
            save_model_every=10**9, seed=5, resume=False, **kw,
        )
        t._sample = lambda *a, **k: None
        return t

    t_plain = mk(tmp_path / "plain")
    losses_plain = []
    t_plain.train(log_fn=lambda logs: losses_plain.append(logs["loss"]))

    t_pp = mk(
        tmp_path / "pp", mesh=mesh, pipeline_parallel=True,
        pipeline_microbatches=2,
    )
    losses_pp = []
    t_pp.train(log_fn=lambda logs: losses_pp.append(logs["loss"]))

    np.testing.assert_allclose(losses_pp, losses_plain, rtol=2e-4)

    # the decoder stack (params AND AdamW moments) is stored pre-stacked and
    # sharded over 'pipe' — 1/S of the stack per device — and the layout
    # survived the donating train steps
    S = mesh.shape["pipe"]
    stacked = t_pp.state["params"]["video_transformer"]["layers"]
    assert not isinstance(jax.tree.leaves(stacked)[0], (list, tuple))
    for leaf in jax.tree.leaves(stacked):
        assert leaf.shape[0] == S
        assert "pipe" in str(leaf.sharding.spec), leaf.sharding
        assert leaf.addressable_shards[0].data.nbytes * S == leaf.nbytes
    opt_leaves = [
        l for l in jax.tree.leaves(t_pp.state["opt"])
        if jnp.ndim(l) >= 1 and "pipe" in str(l.sharding.spec)
    ]
    assert opt_leaves, "optimizer moments lost the pipe sharding"


def test_nuwa_trainer_pipeline_parallel_reversible(tmp_path):
    """PP trainer with a REVERSIBLE decoder: couple params (not menu
    entries) stack over 'pipe' (stage_param_slots), the wd mask slices per
    couple, and losses match the plain reversible trainer."""
    from nuwa_tpu.train.trainer_nuwa import NUWATrainer

    model = _cp_model().replace(dec_depth=4, dec_reversible=True)
    params = model.init(KEY)
    mesh = make_mesh(pipe=2, devices=jax.devices()[:2])

    def mk(folder, **kw):
        t = NUWATrainer(
            nuwa=model, params=params,
            dataset=_ToyVideoText(video_tokens=8 * 4, vocab=16),
            num_train_steps=2, batch_size=4, grad_accum_every=1,
            results_folder=str(folder), save_results_every=10**9,
            save_model_every=10**9, seed=5, resume=False, **kw,
        )
        t._sample = lambda *a, **k: None
        return t

    t_plain = mk(tmp_path / "plain")
    losses_plain = []
    t_plain.train(log_fn=lambda logs: losses_plain.append(logs["loss"]))

    t_pp = mk(
        tmp_path / "pp", mesh=mesh, pipeline_parallel=True,
        pipeline_microbatches=2,
    )
    losses_pp = []
    t_pp.train(log_fn=lambda logs: losses_pp.append(logs["loss"]))

    np.testing.assert_allclose(losses_pp, losses_plain, rtol=2e-4)

    # couple params hold 1/S of the stack per device
    S = mesh.shape["pipe"]
    for leaf in jax.tree.leaves(t_pp.state["params"]["video_transformer"]["layers"]):
        assert leaf.shape[0] == S
        assert leaf.addressable_shards[0].data.nbytes * S == leaf.nbytes


def test_nuwa_trainer_pp_resumes_legacy_flat_checkpoint(tmp_path):
    """A checkpoint written with the flat (pre-round-5) decoder-stack layout
    resumes into the pre-stacked pipe-sharded trainer: layers re-stack, the
    step counter and params carry over."""
    from nuwa_tpu.train.trainer_nuwa import NUWATrainer

    model = _cp_model().replace(dec_depth=4)
    params = model.init(KEY)
    folder = tmp_path / "run"

    def mk(**kw):
        t = NUWATrainer(
            nuwa=model, params=params,
            dataset=_ToyVideoText(video_tokens=8 * 4, vocab=16),
            num_train_steps=2, batch_size=4, grad_accum_every=1,
            results_folder=str(folder), save_results_every=10**9,
            save_model_every=1, seed=5, **kw,
        )
        t._sample = lambda *a, **k: None
        return t

    t_flat = mk(resume=False)  # plain trainer: flat layer list
    t_flat.train()
    assert int(t_flat.state["step"]) == 2

    mesh = make_mesh(data=2, pipe=2, devices=jax.devices()[:4])
    t_pp = mk(
        mesh=mesh, pipeline_parallel=True, pipeline_microbatches=2,
        resume=True,
    )
    assert int(t_pp.state["step"]) == 2
    S = mesh.shape["pipe"]
    stacked = t_pp.state["params"]["video_transformer"]["layers"]
    flat = t_flat.state["params"]["video_transformer"]["layers"]
    L = len(flat) // S
    for s in range(S):
        for j in range(L):
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a[s]), np.asarray(b), atol=1e-6
                ),
                stacked[j], flat[s * L + j],
            )
    for leaf in jax.tree.leaves(stacked):
        assert "pipe" in str(leaf.sharding.spec), leaf.sharding


def test_nuwa_trainer_pipeline_parallel_zero1(tmp_path):
    """zero1=True composed with pipeline_parallel: the stacked decoder
    moments KEEP their 'pipe' sharding (ZeRO must add 'data', not replace
    the existing layout) and the losses still match the plain trainer."""
    from nuwa_tpu.train.trainer_nuwa import NUWATrainer

    model = _cp_model().replace(dec_depth=4)
    params = model.init(KEY)
    mesh = make_mesh(data=2, pipe=2, devices=jax.devices()[:4])

    def mk(folder, **kw):
        t = NUWATrainer(
            nuwa=model, params=params,
            dataset=_ToyVideoText(video_tokens=8 * 4, vocab=16),
            num_train_steps=2, batch_size=4, grad_accum_every=2,
            results_folder=str(folder), save_results_every=10**9,
            save_model_every=10**9, seed=5, resume=False, **kw,
        )
        t._sample = lambda *a, **k: None
        return t

    t_plain = mk(tmp_path / "plain")
    losses_plain = []
    t_plain.train(log_fn=lambda logs: losses_plain.append(logs["loss"]))

    t_z = mk(
        tmp_path / "ppz", mesh=mesh, pipeline_parallel=True,
        pipeline_microbatches=2, zero1=True,
    )
    losses_z = []
    t_z.train(log_fn=lambda logs: losses_z.append(logs["loss"]))
    np.testing.assert_allclose(losses_z, losses_plain, rtol=2e-4)

    # every stacked decoder moment leaf keeps 'pipe'; divisible leaves also
    # carry 'data' (both after training — the jit constraint held)
    import optax

    moments = [
        s for s in jax.tree.leaves(
            t_z.state["opt"],
            is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState),
        )
        if isinstance(s, optax.ScaleByAdamState)
    ]
    assert moments
    stacked_m = [
        l
        for st in moments
        for l in jax.tree.leaves(st.mu["video_transformer"]["layers"])
    ]
    assert stacked_m
    for leaf in stacked_m:
        assert "pipe" in str(leaf.sharding.spec), leaf.sharding
    assert any("data" in str(l.sharding.spec) for l in stacked_m), (
        "no stacked moment gained a 'data' shard"
    )


def test_sketch_model_forward_pipeline_parallel():
    """NUWASketch.forward(pp_mesh=...): the SparseCross2DNA decoder pipelines
    (dec_depth 4, dilation cycle (1, 2), 2 stages); loss matches plain."""
    from jax.sharding import Mesh

    from conftest import make_tiny_vae
    from nuwa_tpu.models import NUWASketch

    vae, svae = make_tiny_vae(3), make_tiny_vae(5)
    k = jax.random.PRNGKey(0)
    model = NUWASketch(
        vae=vae, sketch_vae=svae, dim=16, image_size=8,
        max_video_frames=8, sketch_max_video_frames=1,
        sketch_enc_depth=1, sketch_enc_dim_head=8, sketch_enc_heads=2,
        dec_depth=4, dec_dim_head=8, dec_heads=2,
        sparse_3dna_kernel_size=3, sparse_3dna_dilation=(1, 2),
    )
    p = model.init(
        k, vae_params=vae.init(k), vae_state=vae.init_state(k),
        sketch_vae_params=svae.init(k), sketch_vae_state=svae.init_state(k),
    )
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pipe",))
    sketch = jax.random.uniform(k, (2, 1, 5, 8, 8))
    video = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 3, 8, 8))

    ref = model.forward(p, sketch=sketch, video=video, return_loss=True)
    pp = model.forward(
        p, sketch=sketch, video=video, return_loss=True,
        pp_mesh=mesh, pp_microbatches=2,
    )
    np.testing.assert_allclose(float(pp), float(ref), rtol=1e-5)


def test_pipeline_dual_decoder_forward_and_grad_parity():
    """Pipelined dual decoder == plain (forward and parameter grads) at
    S=2/M=2 with an xmod block in every stage (cross_modality_attn_every=1)."""
    from nuwa_tpu.dual_decoder import DualModalityDecoder
    from nuwa_tpu.parallel.pipeline import pipelined_dual_decoder

    d = DualModalityDecoder(
        dim=16, depth=2, heads=2, dim_head=8,
        num_video_tokens_per_frame=4, num_audio_tokens_per_video_frame=3,
        sparse_3dna_video_shape=(2, 2, 2), sparse_2dna_kernel_size=3,
        cross_modality_attn_every=1, audio_tokens_per_timestep=1,
    )
    p = d.init(KEY)
    video = jax.random.normal(KEY, (4, 9, 16))  # bos + 2 frames of 4
    audio = jax.random.normal(jax.random.PRNGKey(1), (4, 7, 16))  # bos + 6
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 5, 16))
    cmask = jnp.ones((4, 5), bool).at[:, 4:].set(False)
    wv = jax.random.normal(jax.random.PRNGKey(3), video.shape)
    wa = jax.random.normal(jax.random.PRNGKey(4), audio.shape)

    vref, aref = d(p, video, audio, context=ctx, context_mask=cmask)
    mesh = _pipe_mesh(2)
    v, a = pipelined_dual_decoder(
        d, p, video, audio, mesh, num_microbatches=2,
        context=ctx, context_mask=cmask,
    )
    np.testing.assert_allclose(np.asarray(v), np.asarray(vref), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(aref), atol=1e-5, rtol=1e-5)

    def loss_plain(p):
        v, a = d(p, video, audio, context=ctx, context_mask=cmask)
        return jnp.mean(v * wv) + jnp.mean(a * wa)

    def loss_pp(p):
        v, a = pipelined_dual_decoder(
            d, p, video, audio, mesh, num_microbatches=2,
            context=ctx, context_mask=cmask,
        )
        return jnp.mean(v * wv) + jnp.mean(a * wa)

    g_ref = jax.grad(loss_plain)(p)
    g = jax.grad(loss_pp)(p)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        g_ref, g,
    )

    # remat inside the pipeline: same values, same grads (params AND the
    # cross-attention context — it is a checkpoint-closed-over tracer)
    dr = d.replace(remat=True)
    vr, ar = pipelined_dual_decoder(
        dr, p, video, audio, mesh, num_microbatches=2,
        context=ctx, context_mask=cmask,
    )
    np.testing.assert_allclose(np.asarray(vr), np.asarray(v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ar), np.asarray(a), atol=1e-6)

    def loss_ctx(mod, p, c):
        v, a = pipelined_dual_decoder(
            mod, p, video, audio, mesh, num_microbatches=2,
            context=c, context_mask=cmask,
        )
        return jnp.mean(v * wv) + jnp.mean(a * wa)

    g_c_ref = jax.grad(lambda p, c: loss_ctx(d, p, c), argnums=(0, 1))(p, ctx)
    g_c_r = jax.grad(lambda p, c: loss_ctx(dr, p, c), argnums=(0, 1))(p, ctx)
    assert float(jnp.max(jnp.abs(g_c_ref[1]))) > 1e-8, "context grads vanished"
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        g_c_ref, g_c_r,
    )


def test_pipeline_dual_decoder_stage_validation():
    """Schedules whose xmod period does not divide the stage length are
    rejected loudly (cross_modality_attn_every=2 puts the xmod block in
    stage 1 only)."""
    from nuwa_tpu.dual_decoder import DualModalityDecoder
    from nuwa_tpu.parallel.pipeline import validate_dual_stages

    d = DualModalityDecoder(
        dim=16, depth=2, heads=2, dim_head=8,
        num_video_tokens_per_frame=4, num_audio_tokens_per_video_frame=3,
        sparse_3dna_video_shape=(2, 2, 2), sparse_2dna_kernel_size=3,
        cross_modality_attn_every=2, audio_tokens_per_timestep=1,
    )
    # menu = [self, cross, self, cross, xmod] — 5 entries
    with pytest.raises(ValueError, match="does not split"):
        validate_dual_stages(d, 2)
    # dilation cycle (1, 2) with one depth per stage: kernels differ
    d2 = DualModalityDecoder(
        dim=16, depth=2, heads=2, dim_head=8,
        num_video_tokens_per_frame=4, num_audio_tokens_per_video_frame=3,
        sparse_3dna_video_shape=(2, 2, 2), sparse_2dna_kernel_size=3,
        cross_modality_attn_every=1, audio_tokens_per_timestep=1,
        sparse_3dna_dilations=(1, 2),
    )
    with pytest.raises(ValueError, match="statically identical"):
        validate_dual_stages(d2, 2)


def test_nuwa_video_audio_forward_pipeline_parallel():
    """Model-level PP on the dual model: loss + grads == plain, for the
    plain AND the reversible decoder (the (v1, v2, a1, a2) quad rides the
    pipeline carry)."""
    from jax.sharding import Mesh

    from conftest import make_tiny_vae
    from nuwa_tpu.models import NUWAVideoAudio

    vae = make_tiny_vae(3)
    k = jax.random.PRNGKey(0)
    model = NUWAVideoAudio(
        vae=vae, dim=16, image_size=8,
        num_audio_tokens=12, num_audio_tokens_per_video_frame=3,
        max_video_frames=2, text_num_tokens=32, text_max_seq_len=16,
        text_enc_depth=1, text_enc_dim_head=8, text_enc_heads=2,
        dec_depth=2, dec_dim_head=8, dec_heads=2, dec_reversible=False,
        cross_modality_attn_every=1, sparse_2dna_kernel_size=3,
    )
    p = model.init(k, vae_params=vae.init(k), vae_state=vae.init_state(k))
    text = jnp.tile(jnp.array([[1, 2, 3, 0]]), (4, 1))
    video = jax.random.uniform(k, (4, 2, 3, 8, 8))
    audio = jax.random.randint(k, (4, 2 * 3), 0, 12)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pipe",))

    loss_ref, g_ref = jax.value_and_grad(
        lambda p: model.forward(
            p, text=text, video=video, audio=audio, return_loss=True
        )
    )(p)
    loss_pp, g_pp = jax.value_and_grad(
        lambda p: model.forward(
            p, text=text, video=video, audio=audio, return_loss=True,
            pp_mesh=mesh, pp_microbatches=2,
        )
    )(p)
    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3
        ),
        g_ref, g_pp,
    )

    # dec_remat threads through to the pipelined decoder: same loss + grads
    mr = model.replace(dec_remat=True)
    loss_r, g_r = jax.value_and_grad(
        lambda p: mr.forward(
            p, text=text, video=video, audio=audio, return_loss=True,
            pp_mesh=mesh, pp_microbatches=2,
        )
    )(p)
    np.testing.assert_allclose(float(loss_r), float(loss_ref), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3
        ),
        g_ref, g_r,
    )

    rev = model.replace(dec_reversible=True)
    pr = rev.init(k, vae_params=vae.init(k), vae_state=vae.init_state(k))
    loss_rr, g_rr = jax.value_and_grad(
        lambda p: rev.forward(
            p, text=text, video=video, audio=audio, return_loss=True
        )
    )(pr)
    loss_rp, g_rp = jax.value_and_grad(
        lambda p: rev.forward(
            p, text=text, video=video, audio=audio, return_loss=True,
            pp_mesh=mesh, pp_microbatches=2,
        )
    )(pr)
    np.testing.assert_allclose(float(loss_rp), float(loss_rr), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3
        ),
        g_rr, g_rp,
    )


def test_pipeline_dual_decoder_x_data_parallel():
    """PP×DP for the dual decoder on a ('data', 'pipe') mesh."""
    from jax.sharding import Mesh

    from nuwa_tpu.dual_decoder import DualModalityDecoder
    from nuwa_tpu.parallel.pipeline import pipelined_dual_decoder

    d = DualModalityDecoder(
        dim=16, depth=2, heads=2, dim_head=8,
        num_video_tokens_per_frame=4, num_audio_tokens_per_video_frame=3,
        sparse_3dna_video_shape=(2, 2, 2), sparse_2dna_kernel_size=3,
        cross_modality_attn_every=1, audio_tokens_per_timestep=1,
    )
    p = d.init(KEY)
    video = jax.random.normal(KEY, (8, 9, 16))
    audio = jax.random.normal(jax.random.PRNGKey(1), (8, 7, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (8, 5, 16))
    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "pipe"))
    vref, aref = d(p, video, audio, context=ctx)
    v, a = pipelined_dual_decoder(
        d, p, video, audio, mesh, num_microbatches=2,
        data_axis="data", context=ctx,
    )
    np.testing.assert_allclose(np.asarray(v), np.asarray(vref), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(aref), atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# ZeRO-1 optimizer-state sharding (parallel/zero.py)
# ---------------------------------------------------------------------------


def test_zero1_opt_specs_respect_tp_and_pick_data_axis():
    """Param-shaped optimizer leaves get their TP spec plus 'data' on the
    largest free divisible axis; scalars stay replicated."""
    from nuwa_tpu.parallel import zero_opt_specs

    mesh = make_mesh(data=4, model=2)
    params = {
        "to_q": {"w": jnp.ones((8, 16))},
        "to_out": {"w": jnp.ones((16, 8)), "b": jnp.ones((8,))},
        "odd": {"w": jnp.ones((3, 5))},  # nothing divides: replicated
    }
    tx = get_optimizer(lr=1e-3, wd=0.01, params=params)
    specs = zero_opt_specs(tx.init(params), mesh)
    flat, _ = jax.tree_util.tree_flatten_with_path(specs)
    by_path = {
        "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path): s
        for path, s in flat
    }
    for path, spec in by_path.items():
        if path.endswith(".count"):
            assert spec == P(), path
        elif "to_q/w" in path:
            # TP column-parallel keeps 'model' on axis 1; axis 0 (8 % 4 == 0)
            # takes the ZeRO shards
            assert spec == P("data", "model"), (path, spec)
        elif "to_out/w" in path:
            # TP row-parallel holds axis 0; the free axis 1 is 8 % 4 == 0
            assert spec == P("model", "data"), (path, spec)
        elif "to_out/b" in path:
            assert spec == P("data"), (path, spec)
        elif "odd/w" in path:
            assert spec == P(None, None), (path, spec)


def test_zero1_trainer_matches_unmeshed(tmp_path):
    """zero1=True must not change the math: losses and final params track
    the single-device trainer, while the AdamW moments actually live
    sharded over 'data' (per-device optimizer bytes ~ 1/4)."""
    from nuwa_tpu.train.trainer_nuwa import NUWATrainer

    model = tiny_model()
    params = model.init(KEY)
    mesh = make_mesh(data=4, model=2)

    def mk(folder, mesh_arg, **kw):
        t = NUWATrainer(
            nuwa=model, params=params,
            dataset=_ToyVideoText(video_tokens=2 * 4, vocab=16),
            num_train_steps=3, batch_size=4, grad_accum_every=2,
            results_folder=str(folder), save_results_every=10**9,
            save_model_every=10**9, seed=11, resume=False, mesh=mesh_arg, **kw,
        )
        t._sample = lambda *a, **k: None
        return t

    t_single = mk(tmp_path / "single", None)
    losses_single = []
    t_single.train(log_fn=lambda logs: losses_single.append(logs["loss"]))

    t_zero = mk(tmp_path / "zero", mesh, zero1=True)
    losses_zero = []
    t_zero.train(log_fn=lambda logs: losses_zero.append(logs["loss"]))

    np.testing.assert_allclose(losses_zero, losses_single, rtol=2e-4)
    for a, b in zip(
        jax.tree.leaves(t_single.state["params"]),
        jax.tree.leaves(t_zero.state["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-4)

    # post-training state still carries the ZeRO layout (the jit constraint
    # held) and per-device bytes dropped by the data-axis factor
    sharded_bytes = replicated_bytes = 0
    for leaf in jax.tree.leaves(t_zero.state["opt"]):
        if jnp.ndim(leaf) >= 1:
            per_dev = leaf.addressable_shards[0].data.nbytes
            spec = leaf.sharding.spec
            if "data" in str(spec):
                shards = int(np.prod([
                    mesh.shape[ax] for ax in spec if ax is not None
                ]))
                assert per_dev * shards == leaf.nbytes, leaf.sharding
                sharded_bytes += leaf.nbytes
            else:
                replicated_bytes += leaf.nbytes
    assert sharded_bytes > 10 * replicated_bytes, (
        f"ZeRO-1 left too much replicated: {sharded_bytes=} {replicated_bytes=}"
    )


def test_checkpoint_roundtrip_sharded(tmp_path):
    """VERDICT-r4 item 7: a DP/TP/ZeRO-sharded train state saves per-leaf
    (streaming, no full host pytree) and restores with each leaf
    ``device_put`` straight to its NamedSharding."""
    from nuwa_tpu.parallel import shard_opt_state
    from nuwa_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    model = tiny_model()
    mesh = make_mesh(data=4, model=2)
    params = shard_params(model.init(KEY), mesh)
    tx = get_optimizer(lr=1e-3, wd=0.01, params=params)
    opt, _ = shard_opt_state(tx.init(params), mesh)
    state = {"params": params, "opt": opt, "step": jnp.asarray(3, jnp.int32)}

    path = save_checkpoint(tmp_path, "m", 3, state)
    shardings = jax.tree.map(lambda x: x.sharding, state)
    restored = load_checkpoint(path, state, shardings)

    for orig, back in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        assert back.sharding == orig.sharding, (back.sharding, orig.sharding)
        np.testing.assert_allclose(np.asarray(back), np.asarray(orig))


def test_checkpoint_legacy_msgpack_loads(tmp_path):
    """Rounds 1-4 wrote flax-msgpack checkpoints; they must keep loading
    (and place onto shardings when given)."""
    from flax import serialization

    from nuwa_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

    tree = {"a": jnp.arange(24.0).reshape(8, 3), "b": jnp.asarray(7, jnp.int32)}
    path = tmp_path / "m.5.msgpack"
    path.write_bytes(serialization.to_bytes(jax.device_get(tree)))

    step, found = latest_checkpoint(tmp_path, "m")
    assert step == 5 and found == str(path)

    mesh = make_mesh(data=4, model=2)
    shardings = {
        "a": NamedSharding(mesh, P("data", None)),
        "b": NamedSharding(mesh, P()),
    }
    restored = load_checkpoint(path, tree, shardings)
    assert restored["a"].sharding == shardings["a"]
    np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(24.0).reshape(8, 3))
    assert int(restored["b"]) == 7


def test_pipeline_x_tensor_parallel():
    """PP×TP (VERDICT-r4 item 2): a ('pipe','model') mesh where stage params
    are TP-sharded over 'model' (heads split column/row-parallel) while the
    stack pipelines over 'pipe'. _gpipe marks only pipe/data as manual, so
    GSPMD keeps partitioning the stage compute over 'model'. Forward AND
    grads must match the plain unsharded stack."""
    from jax.sharding import Mesh
    from nuwa_tpu.parallel.pipeline import pipelined_transformer
    from nuwa_tpu.transformer import Transformer

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("pipe", "model"))
    tr = Transformer(dim=32, depth=4, causal=True, heads=4, dim_head=8)
    p = tr.init(KEY)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 32))
    w = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    ref = tr(p, x)
    g_ref = jax.grad(lambda p: jnp.mean(tr(p, x) * w))(p)

    def place(leaf, spec):
        # same divisibility fallback as shard_params: replicate odd shapes
        for ax, name in enumerate(spec):
            if name is not None and leaf.shape[ax] % mesh.shape[name]:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    specs = make_param_specs(p)
    sp = jax.tree.map(place, p, specs)
    # the TP rules actually split the attention projections over 'model'
    q_shards = sp["layers"][0]["inner"]["to_q"]["w"].sharding.spec
    assert "model" in str(q_shards), q_shards

    run = jax.jit(
        lambda p, x: pipelined_transformer(tr, p, x, mesh, num_microbatches=2)
    )
    out = run(sp, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    g = jax.jit(
        jax.grad(
            lambda p: jnp.mean(
                pipelined_transformer(tr, p, x, mesh, num_microbatches=2) * w
            )
        )
    )(sp)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        g_ref, g,
    )
