"""Pallas 3DNA kernel vs the tested XLA gather path (interpret mode on CPU).

The XLA path is itself verified against brute-force oracles in test_nda.py,
so interpret-mode equality here transitively validates the kernel's math
(masking, dilation, bos column, talking heads, axial rel-pos bias, ragged
tails). Compiled-mode equality runs on real TPU via bench/verify scripts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from nuwa_tpu.nda import Sparse3DNA

KEY = jax.random.PRNGKey(0)


def _compare(mod_xla, x, atol=2e-2):
    mod_pl = mod_xla.replace(use_pallas=True)
    p = mod_xla.init(KEY)
    ref = np.asarray(mod_xla(p, x))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(mod_pl(p, x))
    # bf16 probability cache in the kernel -> slightly looser tolerance
    np.testing.assert_allclose(out, ref, atol=atol, rtol=2e-2)


@pytest.mark.parametrize("dilation", [1, 2])
def test_pallas_3dna_causal(dilation):
    mod = Sparse3DNA(
        dim=16, video_shape=(3, 2, 2), kernel_size=3, dilation=dilation,
        heads=2, dim_head=8, causal=True,
    )
    x = jax.random.normal(KEY, (2, 1 + 12, 16))
    _compare(mod, x)


def test_pallas_3dna_centered():
    mod = Sparse3DNA(
        dim=16, video_shape=(3, 2, 2), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=False,
    )
    x = jax.random.normal(KEY, (1, 13, 16))
    _compare(mod, x)


def test_pallas_3dna_rel_pos_bias():
    mod = Sparse3DNA(
        dim=16, video_shape=(2, 2, 2), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=True, rel_pos_bias=True,
    )
    x = jax.random.normal(KEY, (1, 9, 16))
    _compare(mod, x)


def test_pallas_3dna_partial_frame():
    mod = Sparse3DNA(
        dim=16, video_shape=(3, 2, 2), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=True,
    )
    x = jax.random.normal(KEY, (1, 1 + 6, 16))  # ragged tail
    _compare(mod, x)


def test_pallas_3dna_larger_grid():
    mod = Sparse3DNA(
        dim=32, video_shape=(4, 4, 4), kernel_size=(3, 3, 3), dilation=(2, 1, 1),
        heads=4, dim_head=8, causal=True,
    )
    x = jax.random.normal(KEY, (1, 1 + 64, 32))
    _compare(mod, x)


@pytest.mark.parametrize(
    "kw",
    [
        dict(video_shape=(3, 2, 2), kernel_size=3, dilation=2, causal=True),
        dict(video_shape=(3, 2, 2), kernel_size=3, dilation=1, causal=False),
        dict(video_shape=(4, 4, 4), kernel_size=(3, 3, 3), dilation=(2, 1, 1),
             causal=True, rel_pos_bias=True),
    ],
    ids=["dilated", "centered", "larger-grid-bias"],
)
def test_pallas_true_backward_matches_gather(kw):
    """The flash-style Pallas backward (dq/dk/dv/bos/bias/talking-heads) must
    match the XLA gather path's gradients for every input and parameter."""
    mod = Sparse3DNA(dim=16, heads=2, dim_head=8, **kw)
    mod_pl = mod.replace(use_pallas=True)
    p = mod.init(KEY)
    F = kw["video_shape"][0]
    HW = kw["video_shape"][1] * kw["video_shape"][2]
    t = F * HW - 2  # ragged tail exercises phantom-token masking in the bwd
    x = jax.random.normal(KEY, (2, 1 + t, 16))
    w = jax.random.normal(jax.random.PRNGKey(7), (2, 1 + t, 16))

    def loss(m, p, x):
        return jnp.sum(m(p, x) * w)

    g_ref = jax.grad(loss, argnums=(1, 2))(mod, p, x)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss, argnums=(1, 2))(mod_pl, p, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2)


def test_pallas_true_backward_exact_with_fp32_cache():
    """With the score cache widened to fp32 the backward is exact (~1e-5) —
    pins down that the only deviation is the documented bf16 cache."""
    import nuwa_tpu.kernels.nda_pallas as K

    old = K._CACHE_DTYPE
    K._CACHE_DTYPE = jnp.float32
    K._VJP_CACHE.clear()
    try:
        mod = Sparse3DNA(
            dim=16, video_shape=(3, 2, 2), kernel_size=3, dilation=1,
            heads=2, dim_head=8, causal=True, rel_pos_bias=True,
        )
        mod_pl = mod.replace(use_pallas=True)
        p = mod.init(KEY)
        x = jax.random.normal(KEY, (2, 13, 16))

        def loss(m, p, x):
            return jnp.sum(m(p, x) ** 2)

        g_ref = jax.grad(loss, argnums=(1, 2))(mod, p, x)
        with pltpu.force_tpu_interpret_mode():
            g_pl = jax.grad(loss, argnums=(1, 2))(mod_pl, p, x)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            )
    finally:
        K._CACHE_DTYPE = old
        K._VJP_CACHE.clear()


@pytest.mark.parametrize("dilation", [(1, 1, 1), (1, 2, 2)])
def test_pallas_row_blocked_large_fmap(dilation):
    """HW > 256 routes to the row-blocked kernel (R-row query blocks against
    a sliding key-row window); must match the XLA chunked dense path."""
    mod = Sparse3DNA(
        dim=16, video_shape=(2, 32, 9), kernel_size=3, dilation=dilation,
        heads=2, dim_head=8, causal=True, rel_pos_bias=True,
    )
    x = jax.random.normal(KEY, (1, 1 + 2 * 32 * 9, 16))
    _compare(mod, x, atol=3e-2)


def test_pallas_row_blocked_partial_frame_grads():
    """Row-blocked forward with ragged tail + the true row-blocked flash
    backward (_rb_bwd_q_kernel/_rb_bwd_kv_kernel)."""
    mod = Sparse3DNA(
        dim=16, video_shape=(2, 32, 9), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=True,
    )
    mod_pl = mod.replace(use_pallas=True)
    p = mod.init(KEY)
    t = 2 * 32 * 9 - 5
    x = jax.random.normal(KEY, (1, 1 + t, 16))
    w = jax.random.normal(jax.random.PRNGKey(8), (1, 1 + t, 16))

    def loss(m, p, x):
        # fixed cotangent: isolates the backward from the forward's bf16
        # score-cache deviation (sum(out**2) would fold 2*Δout into g)
        return jnp.sum(m(p, x) * w)

    ref = np.asarray(mod(p, x))
    g_ref = jax.grad(loss, argnums=(1, 2))(mod, p, x)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(mod_pl(p, x))
        g_pl = jax.grad(loss, argnums=(1, 2))(mod_pl, p, x)
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=2e-2)
    # bf16 score cache -> loose bound; exactness is pinned by the fp32-cache
    # test below
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=8e-2, rtol=8e-2)


def test_pallas_forced_row_block_small_fmap():
    """`row_block=` forces the row-blocked family at HW <= 256 (where 'auto'
    would pick whole-frame); forward and the rb flash backward must still
    match the gather oracle. (The force is an experimentation knob — it
    measured slower than whole-frame at fmap 16 on v5e, see transformer.py.)
    """
    mod = Sparse3DNA(
        dim=16, video_shape=(2, 8, 8), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=True, rel_pos_bias=True,
    )
    mod_pl = mod.replace(use_pallas=True, row_block=4)
    p = mod.init(KEY)
    t = 2 * 8 * 8
    x = jax.random.normal(KEY, (2, 1 + t, 16))
    w = jax.random.normal(jax.random.PRNGKey(8), (2, 1 + t, 16))

    def loss(m, p, x):
        return jnp.sum(m(p, x) * w)

    ref = np.asarray(mod(p, x))
    g_ref = jax.grad(loss, argnums=(1, 2))(mod, p, x)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(mod_pl(p, x))
        g_pl = jax.grad(loss, argnums=(1, 2))(mod_pl, p, x)
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=2e-2)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=8e-2, rtol=8e-2)


def test_pallas_row_blocked_backward_exact_with_fp32_cache():
    """The row-blocked flash backward (dq/dk/dv/bos/bias/talking-heads) is
    exact vs the gather oracle when the score cache is fp32."""
    import nuwa_tpu.kernels.nda_pallas as K

    old = K._CACHE_DTYPE
    K._CACHE_DTYPE = jnp.float32
    K._VJP_CACHE.clear()
    try:
        mod = Sparse3DNA(
            dim=16, video_shape=(2, 32, 9), kernel_size=3, dilation=(1, 2, 2),
            heads=2, dim_head=8, causal=True, rel_pos_bias=True,
        )
        mod_pl = mod.replace(use_pallas=True)
        p = mod.init(KEY)
        t = 2 * 32 * 9 - 5
        x = jax.random.normal(KEY, (1, 1 + t, 16))
        w = jax.random.normal(jax.random.PRNGKey(8), (1, 1 + t, 16))

        def loss(m, p, x):
            return jnp.sum(m(p, x) * w)

        g_ref = jax.grad(loss, argnums=(1, 2))(mod, p, x)
        with pltpu.force_tpu_interpret_mode():
            g_pl = jax.grad(loss, argnums=(1, 2))(mod_pl, p, x)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4
            )
    finally:
        K._CACHE_DTYPE = old
        K._VJP_CACHE.clear()


def test_pallas_row_blocked_centered():
    """Centered (non-causal) mode on the row-blocked kernel — the 256px
    sketch-encoder config class (fmap > 16, centered 3DNA). Forward parity
    vs the gather path, with frame taps reaching both directions."""
    mod = Sparse3DNA(
        dim=16, video_shape=(3, 32, 9), kernel_size=3, dilation=(1, 2, 2),
        heads=2, dim_head=8, causal=False, rel_pos_bias=True,
    )
    x = jax.random.normal(KEY, (1, 1 + 3 * 32 * 9, 16))
    _compare(mod, x, atol=3e-2)


def test_pallas_row_blocked_centered_grads_exact_fp32():
    """Centered row-blocked flash backward is exact vs the gather oracle
    with an fp32 score cache (ragged tail included)."""
    import nuwa_tpu.kernels.nda_pallas as K

    old = K._CACHE_DTYPE
    K._CACHE_DTYPE = jnp.float32
    K._VJP_CACHE.clear()
    try:
        mod = Sparse3DNA(
            dim=16, video_shape=(2, 32, 9), kernel_size=3, dilation=1,
            heads=2, dim_head=8, causal=False, rel_pos_bias=True,
        )
        mod_pl = mod.replace(use_pallas=True)
        p = mod.init(KEY)
        t = 2 * 32 * 9 - 5
        x = jax.random.normal(KEY, (1, 1 + t, 16))
        w = jax.random.normal(jax.random.PRNGKey(8), (1, 1 + t, 16))

        def loss(m, p, x):
            return jnp.sum(m(p, x) * w)

        g_ref = jax.grad(loss, argnums=(1, 2))(mod, p, x)
        with pltpu.force_tpu_interpret_mode():
            g_pl = jax.grad(loss, argnums=(1, 2))(mod_pl, p, x)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4
            )
    finally:
        K._CACHE_DTYPE = old
        K._VJP_CACHE.clear()


def test_pallas_sixteen_heads_dot_mix():
    """heads >= 16 routes the talking-heads mix through one MXU dot instead
    of unrolled AXPYs — forward + backward parity."""
    mod = Sparse3DNA(
        dim=32, video_shape=(2, 2, 2), kernel_size=3, dilation=1,
        heads=16, dim_head=2, causal=True,
    )
    mod_pl = mod.replace(use_pallas=True)
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (1, 9, 32))
    w = jax.random.normal(jax.random.PRNGKey(9), (1, 9, 32))

    def loss(m, p, x):
        return jnp.sum(m(p, x) * w)

    ref = np.asarray(mod(p, x))
    g_ref = jax.grad(loss, argnums=(1, 2))(mod, p, x)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(mod_pl(p, x))
        g_pl = jax.grad(loss, argnums=(1, 2))(mod_pl, p, x)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize(
    "H,K,dil",
    [(1, 3, 1), (3, 3, 1), (4, 5, 2), (5, 5, 1)],
    ids=["h1", "h3-lane384", "h4-dilated", "h5-rowblocked640"],
)
def test_pallas_audio_2dna_forward(H, K, dil):
    """SparseCausal2DNA on the per-tap whole-frame kernel (timesteps grouped
    into lane-aligned pseudo-frames) vs the XLA gather path."""
    from nuwa_tpu.nda import SparseCausal2DNA

    mod = SparseCausal2DNA(
        dim=16, height=H, heads=2, dim_head=8, kernel_size=K, dilation=dil,
        rel_pos_bias=True,
    )
    p = mod.init(KEY)
    t = 7 * H + (1 if H > 1 else 0)  # ragged tail when H > 1
    x = jax.random.normal(KEY, (2, 1 + t, 16))
    ref = np.asarray(mod(p, x))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(mod.replace(use_pallas=True)(p, x))
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_pallas_audio_2dna_huge_lcm_height_whole_frame_fallback():
    """Heights with lcm(H, 128) > 1024 (no row-blocked geometry) must run the
    whole-frame kernels under a forced use_pallas — historically they did;
    a round-4 regression routed them into the rb family's bare assert."""
    from nuwa_tpu.nda import SparseCausal2DNA

    mod = SparseCausal2DNA(
        dim=16, height=9, heads=2, dim_head=8, kernel_size=3, dilation=1,
        rel_pos_bias=True,
    )  # lcm(9, 128) = 1152 > 1024
    p = mod.init(KEY)
    t = 2 * 9 + 4  # ragged tail
    x = jax.random.normal(KEY, (1, 1 + t, 16))
    ref = np.asarray(mod(p, x))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(mod.replace(use_pallas=True)(p, x))
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_pallas_audio_2dna_multiframe_lookback():
    """Lookback spanning multiple pseudo-frames (t > G timesteps) plus bos."""
    from nuwa_tpu.nda import SparseCausal2DNA

    mod = SparseCausal2DNA(
        dim=16, height=1, heads=2, dim_head=8, kernel_size=5, dilation=3,
    )
    p = mod.init(KEY)
    t = 300  # > 2 pseudo-frames of 128 timesteps
    x = jax.random.normal(KEY, (1, 1 + t, 16))
    ref = np.asarray(mod(p, x))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(mod.replace(use_pallas=True)(p, x))
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_pallas_audio_2dna_backward_exact_with_fp32_cache():
    """Audio flash backward (dq/dk/dv/bos/axial-bias/talking-heads) is exact
    vs the gather oracle when the score cache is fp32."""
    import nuwa_tpu.kernels.nda_pallas as K
    from nuwa_tpu.nda import SparseCausal2DNA

    old = K._CACHE_DTYPE
    K._CACHE_DTYPE = jnp.float32
    K._VJP_CACHE.clear()
    try:
        # heads (4) != pseudo-frame tap count (2): pins the per-tap dsbias
        # head-dim plumbing (hb must come from sbias.shape[1], not [0])
        mod = SparseCausal2DNA(
            dim=16, height=3, heads=4, dim_head=8, kernel_size=3, dilation=2,
            rel_pos_bias=True,
        )
        mod_pl = mod.replace(use_pallas=True)
        p = mod.init(KEY)
        t = 9 * 3 - 2
        x = jax.random.normal(KEY, (2, 1 + t, 16))
        w = jax.random.normal(jax.random.PRNGKey(8), (2, 1 + t, 16))

        def loss(m, p, x):
            return jnp.sum(m(p, x) * w)

        g_ref = jax.grad(loss, argnums=(1, 2))(mod, p, x)
        with pltpu.force_tpu_interpret_mode():
            g_pl = jax.grad(loss, argnums=(1, 2))(mod_pl, p, x)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4
            )
    finally:
        K._CACHE_DTYPE = old
        K._VJP_CACHE.clear()


def test_pallas_dropout_in_kernel():
    """Attention dropout inside the whole-frame kernel (counter-PRNG masks,
    regenerated in the backwards): keyless calls are exactly the no-dropout
    kernel; keyed calls vary with the key, are unbiased in expectation, and
    produce finite grads through the custom backward."""
    mod0 = Sparse3DNA(
        dim=16, video_shape=(3, 2, 2), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=True, use_pallas=True,
    )
    mod = mod0.replace(dropout=0.3)
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 13, 16))

    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(mod0(p, x))
        # no key => inference => identical to the no-dropout kernel
        np.testing.assert_array_equal(np.asarray(mod(p, x)), base)

        outs = [
            np.asarray(mod(p, x, key=jax.random.PRNGKey(i))) for i in range(48)
        ]
        assert not np.allclose(outs[0], outs[1])  # keys matter
        mean = np.mean(outs, axis=0)
        # inverted dropout is unbiased on the attention weights; the output
        # mean over keys approaches the undropped output
        err = np.abs(mean - base).max() / (np.abs(base).max() + 1e-9)
        assert err < 0.25, err

        g = jax.grad(
            lambda p: jnp.sum(mod(p, x, key=jax.random.PRNGKey(3)) ** 2)
        )(p)
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()


def test_pallas_audio_dropout():
    """In-kernel dropout also covers the audio 2DNA op (keyless = identity
    to the no-dropout kernel; keyed calls vary)."""
    from nuwa_tpu.nda import SparseCausal2DNA

    mod0 = SparseCausal2DNA(
        dim=16, height=2, heads=2, dim_head=8, kernel_size=3,
        use_pallas=True,
    )
    mod = mod0.replace(dropout=0.4)
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (1, 1 + 12, 16))
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(mod0(p, x))
        np.testing.assert_array_equal(np.asarray(mod(p, x)), base)
        a = np.asarray(mod(p, x, key=jax.random.PRNGKey(0)))
        b = np.asarray(mod(p, x, key=jax.random.PRNGKey(1)))
    assert not np.allclose(a, b)
    assert not np.allclose(a, base)


def test_pallas_dropout_masks_consistent_between_passes():
    """The same key must give bit-identical outputs on repeated forwards
    (counter PRNG re-seeded per block/tap, no hidden state)."""
    mod = Sparse3DNA(
        dim=16, video_shape=(2, 2, 2), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=True, use_pallas=True, dropout=0.5,
    )
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (1, 9, 16))
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(mod(p, x, key=jax.random.PRNGKey(7)))
        b = np.asarray(mod(p, x, key=jax.random.PRNGKey(7)))
    np.testing.assert_array_equal(a, b)


def test_pallas_gradients_match_xla_path():
    """jax.grad through the pallas op (XLA-remat backward) == gather path."""
    mod = Sparse3DNA(
        dim=16, video_shape=(3, 2, 2), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=True, rel_pos_bias=True,
    )
    mod_pl = mod.replace(use_pallas=True)
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 13, 16))

    def loss(m, p, x):
        return jnp.sum(m(p, x) ** 2)

    g_ref = jax.grad(loss, argnums=(1, 2))(mod, p, x)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss, argnums=(1, 2))(mod_pl, p, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize(
    "Fc,ragged",
    [(1, False), (2, True)],
    ids=["ctx1", "ctx2-ragged"],
)
def test_pallas_cross_2dna_forward(Fc, ragged):
    """SparseCross2DNA on the whole-frame kernel in fixed-taps mode (tap j
    IS context frame j for every query frame) vs the XLA gather path."""
    from nuwa_tpu.nda import SparseCross2DNA

    mod = SparseCross2DNA(
        dim=16, image_size=4, heads=2, dim_head=8, kernel_size=3,
        backend="gather",
    )
    p = mod.init(KEY)
    t = 3 * 16 - (5 if ragged else 0)
    x = jax.random.normal(KEY, (2, 1 + t, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, Fc * 16, 16))
    ref = np.asarray(mod(p, x, context=ctx))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(mod.replace(use_pallas=True)(p, x, context=ctx))
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_pallas_cross_2dna_backward_exact_with_fp32_cache():
    """Cross flash backward (dq/dk/dv through to_kv, null-kv, talking heads)
    is exact vs the gather oracle when the score cache is fp32."""
    import nuwa_tpu.kernels.nda_pallas as K
    from nuwa_tpu.nda import SparseCross2DNA

    old = K._CACHE_DTYPE
    K._CACHE_DTYPE = jnp.float32
    K._VJP_CACHE.clear()
    try:
        mod = SparseCross2DNA(
            dim=16, image_size=4, heads=4, dim_head=8, kernel_size=3,
            dilation=2, backend="gather",
        )
        mod_pl = mod.replace(use_pallas=True)
        p = mod.init(KEY)
        t = 2 * 16 + 7  # ragged query tail
        x = jax.random.normal(KEY, (2, 1 + t, 16))
        ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 2 * 16, 16))
        w = jax.random.normal(jax.random.PRNGKey(8), (2, 1 + t, 16))

        def loss(m, p, x, c):
            return jnp.sum(m(p, x, context=c) * w)

        g_ref = jax.grad(loss, argnums=(1, 2, 3))(mod, p, x, ctx)
        with pltpu.force_tpu_interpret_mode():
            g_pl = jax.grad(loss, argnums=(1, 2, 3))(mod_pl, p, x, ctx)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4
            )
    finally:
        K._CACHE_DTYPE = old
        K._VJP_CACHE.clear()


def test_pallas_cross_2dna_runtime_context_mask():
    """The kernel honors a runtime (b, Lc) context mask — including a fully
    masked CFG-uncond row — and matches the gather path."""
    from nuwa_tpu.nda import SparseCross2DNA

    mod = SparseCross2DNA(
        dim=16, image_size=4, heads=2, dim_head=8, backend="gather",
    )
    mod_pl = mod.replace(use_pallas=True)
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 1 + 16, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16))
    cmask = jnp.array([[True] * 10 + [False] * 6, [False] * 16])
    ref = np.asarray(mod(p, x, context=ctx, context_mask=cmask))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(mod_pl(p, x, context=ctx, context_mask=cmask))
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
    # masked keys truly ignored on the kernel path
    ctx2 = ctx.at[:, 12].set(55.0)
    with pltpu.force_tpu_interpret_mode():
        out2 = np.asarray(mod_pl(p, x, context=ctx2, context_mask=cmask))
    np.testing.assert_allclose(out[:1], out2[:1], atol=1e-5)


def test_pallas_dropout_grad_matches_finite_differences():
    """fwd/bwd dropout-mask consistency: with a fixed key the forward is
    deterministic, so the custom backward must match central finite
    differences — a regenerated-mask mismatch between the forward and
    either backward kernel would show up here directly."""
    import nuwa_tpu.kernels.nda_pallas as K

    old = K._CACHE_DTYPE
    K._CACHE_DTYPE = jnp.float32
    K._VJP_CACHE.clear()
    try:
        mod = Sparse3DNA(
            dim=16, video_shape=(3, 2, 2), kernel_size=3, dilation=1,
            heads=2, dim_head=8, causal=True, use_pallas=True, dropout=0.35,
        )
        p = mod.init(KEY)
        x = jax.random.normal(KEY, (1, 13, 16))
        key = jax.random.PRNGKey(7)

        def f(w):
            p2 = dict(p)
            p2["talking_heads"] = w
            with pltpu.force_tpu_interpret_mode():
                return float(jnp.sum(mod(p2, x, key=key) ** 2))

        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(
                lambda w: jnp.sum(
                    mod({**p, "talking_heads": w}, x, key=key) ** 2
                )
            )(p["talking_heads"])

        rng = np.random.default_rng(0)
        w0 = np.asarray(p["talking_heads"], np.float64)
        eps = 1e-3
        for _ in range(2):
            d = rng.normal(size=w0.shape)
            d /= np.linalg.norm(d)
            num = (
                f(jnp.asarray(w0 + eps * d, jnp.float32))
                - f(jnp.asarray(w0 - eps * d, jnp.float32))
            ) / (2 * eps)
            ana = float(np.sum(np.asarray(g, np.float64) * d))
            np.testing.assert_allclose(num, ana, rtol=2e-3, atol=2e-4)
    finally:
        K._CACHE_DTYPE = old
        K._VJP_CACHE.clear()


def test_pallas_audio_dropout_grad_matches_finite_differences():
    """Audio-2DNA dropout: the seed wiring through sparse_2dna_pallas_vjp
    must give a deterministic forward whose custom backward matches central
    finite differences."""
    import nuwa_tpu.kernels.nda_pallas as K
    from nuwa_tpu.nda import SparseCausal2DNA

    old = K._CACHE_DTYPE
    K._CACHE_DTYPE = jnp.float32
    K._VJP_CACHE.clear()
    try:
        mod = SparseCausal2DNA(
            dim=16, height=2, heads=2, dim_head=8, kernel_size=3,
            use_pallas=True, dropout=0.3,
        )
        p = mod.init(KEY)
        x = jax.random.normal(KEY, (1, 9, 16))
        key = jax.random.PRNGKey(5)

        def f(w):
            with pltpu.force_tpu_interpret_mode():
                return float(
                    jnp.sum(mod({**p, "talking_heads": w}, x, key=key) ** 2)
                )

        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(
                lambda w: jnp.sum(
                    mod({**p, "talking_heads": w}, x, key=key) ** 2
                )
            )(p["talking_heads"])

        rng = np.random.default_rng(1)
        w0 = np.asarray(p["talking_heads"], np.float64)
        eps = 1e-3
        d = rng.normal(size=w0.shape)
        d /= np.linalg.norm(d)
        num = (
            f(jnp.asarray(w0 + eps * d, jnp.float32))
            - f(jnp.asarray(w0 - eps * d, jnp.float32))
        ) / (2 * eps)
        ana = float(np.sum(np.asarray(g, np.float64) * d))
        np.testing.assert_allclose(num, ana, rtol=2e-3, atol=2e-4)
    finally:
        K._CACHE_DTYPE = old
        K._VJP_CACHE.clear()


def test_pallas_row_blocked_dropout():
    """Dropout on the row-blocked family (absolute-coordinate masks):
    keyless calls equal the no-dropout kernel; keyed calls vary; and the
    custom flash backward matches central finite differences (the kv-side
    kernel slices sub-tiles of the forward's dropout mask — any coordinate
    mismatch fails the FD check)."""
    import nuwa_tpu.kernels.nda_pallas as K

    old = K._CACHE_DTYPE
    K._CACHE_DTYPE = jnp.float32
    K._VJP_CACHE.clear()
    try:
        mod0 = Sparse3DNA(
            dim=16, video_shape=(2, 32, 9), kernel_size=3, dilation=1,
            heads=2, dim_head=8, causal=True, use_pallas=True,
        )
        mod = mod0.replace(dropout=0.3)
        p = mod.init(KEY)
        t = 2 * 32 * 9 - 5
        x = jax.random.normal(KEY, (1, 1 + t, 16))
        key = jax.random.PRNGKey(11)

        with pltpu.force_tpu_interpret_mode():
            base = np.asarray(mod0(p, x))
            np.testing.assert_array_equal(np.asarray(mod(p, x)), base)
            o1 = np.asarray(mod(p, x, key=jax.random.PRNGKey(1)))
            o2 = np.asarray(mod(p, x, key=jax.random.PRNGKey(2)))
            assert not np.allclose(o1, o2)

        def f(w):
            with pltpu.force_tpu_interpret_mode():
                return float(
                    jnp.sum(mod({**p, "talking_heads": w}, x, key=key) ** 2)
                )

        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(
                lambda w: jnp.sum(
                    mod({**p, "talking_heads": w}, x, key=key) ** 2
                )
            )(p["talking_heads"])

        rng = np.random.default_rng(2)
        w0 = np.asarray(p["talking_heads"], np.float64)
        eps = 1e-3
        for _ in range(2):
            d = rng.normal(size=w0.shape)
            d /= np.linalg.norm(d)
            num = (
                f(jnp.asarray(w0 + eps * d, jnp.float32))
                - f(jnp.asarray(w0 - eps * d, jnp.float32))
            ) / (2 * eps)
            ana = float(np.sum(np.asarray(g, np.float64) * d))
            np.testing.assert_allclose(num, ana, rtol=2e-3, atol=2e-3)
    finally:
        K._CACHE_DTYPE = old
        K._VJP_CACHE.clear()


@pytest.mark.parametrize("Fc", [1, 2], ids=["ctx1", "ctx2"])
def test_pallas_cross_2dna_dropout(Fc):
    """In-kernel dropout on the fused cross kernels: keyless calls equal the
    no-dropout kernel; keyed calls vary; and the fused backward matches
    central finite differences (fwd/bwd regenerate the same absolute-
    coordinate masks). Fc=1 exercises the single-pass ``_xfused1_kernel``,
    Fc=2 the multi-tap ``_xfused_kernel``."""
    import nuwa_tpu.kernels.nda_pallas as K
    from nuwa_tpu.nda import SparseCross2DNA

    old = K._CACHE_DTYPE
    K._CACHE_DTYPE = jnp.float32
    K._VJP_CACHE.clear()
    try:
        mod0 = SparseCross2DNA(
            dim=16, image_size=4, heads=2, dim_head=8, kernel_size=3,
            use_pallas=True,
        )
        mod = mod0.replace(dropout=0.3)
        p = mod.init(KEY)
        t = 2 * 16 + 5
        x = jax.random.normal(KEY, (1, 1 + t, 16))
        ctx = jax.random.normal(jax.random.PRNGKey(3), (1, Fc * 16, 16))
        key = jax.random.PRNGKey(5)

        with pltpu.force_tpu_interpret_mode():
            base = np.asarray(mod0(p, x, context=ctx))
            np.testing.assert_array_equal(
                np.asarray(mod(p, x, context=ctx)), base
            )
            a = np.asarray(mod(p, x, context=ctx, key=jax.random.PRNGKey(0)))
            b = np.asarray(mod(p, x, context=ctx, key=jax.random.PRNGKey(1)))
        assert not np.allclose(a, b)
        assert not np.allclose(a, base)

        def f(w):
            with pltpu.force_tpu_interpret_mode():
                return float(
                    jnp.sum(
                        mod({**p, "talking_heads": w}, x, context=ctx,
                            key=key) ** 2
                    )
                )

        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(
                lambda w: jnp.sum(
                    mod({**p, "talking_heads": w}, x, context=ctx,
                        key=key) ** 2
                )
            )(p["talking_heads"])

        rng = np.random.default_rng(1)
        w0 = np.asarray(p["talking_heads"], np.float64)
        eps = 1e-3
        d = rng.normal(size=w0.shape)
        d /= np.linalg.norm(d)
        num = (
            f(jnp.asarray(w0 + eps * d, jnp.float32))
            - f(jnp.asarray(w0 - eps * d, jnp.float32))
        ) / (2 * eps)
        ana = float(np.sum(np.asarray(g, np.float64) * d))
        np.testing.assert_allclose(num, ana, rtol=2e-3, atol=2e-4)
    finally:
        K._CACHE_DTYPE = old
        K._VJP_CACHE.clear()


# ---------------------------------------------------------------------------
# lane-packed small frames (HW < 128, 128 % HW == 0): P frames per
# 128-lane super-frame — the driver's fmap-8 config gets a kernel path
# ---------------------------------------------------------------------------


def test_packed_taps_structure():
    """Super-tap enumeration: dense strides keep every J; strided dilations
    drop super-taps with no valid (p, p') block (Kf=5, df=4, P=2 keeps only
    the diagonal J ∈ {0, 2, 4, 6, 8})."""
    from nuwa_tpu.kernels.nda_pallas import _packed_taps

    taps, maps = _packed_taps(5, 1, 2)
    assert taps == (0, 1, 2)
    taps, maps = _packed_taps(5, 4, 2)
    assert taps == (0, 2, 4, 6, 8)
    for bm in maps:
        assert all(pq == pk for pq, pk in bm)  # diagonal blocks only
    # packed fmap-4 style: huge P, taps collapse into two super-taps
    taps, _ = _packed_taps(3, 2, 32)
    assert taps == (0, 1)


@pytest.mark.parametrize("dilation", [1, 2])
def test_pallas_packed_fmap8(dilation):
    """fmap-8 geometry (HW=64, P=2): packed kernel vs the gather oracle,
    odd frame count (tail super-frame is half phantom) + ragged tail."""
    from nuwa_tpu.kernels.nda_pallas import packed_frames

    mod = Sparse3DNA(
        dim=32, video_shape=(5, 8, 8), kernel_size=3, dilation=dilation,
        heads=2, dim_head=16, causal=True, rel_pos_bias=True,
    )
    assert packed_frames(mod) == 2
    t = 5 * 64 - 7
    x = jax.random.normal(KEY, (2, 1 + t, 32))
    _compare(mod, x)


def test_pallas_packed_fmap8_backward():
    """Packed-path gradients (dq/dk/dv/bos/axial-bias/talking-heads) match
    the gather path at fmap-8 geometry with dilation 2 (irregular taps).
    Runs with the fp32 score cache so the match is exact (~1e-6) — with the
    default bf16 cache the only deviation is the documented cache rounding."""
    import nuwa_tpu.kernels.nda_pallas as K

    old = K._CACHE_DTYPE
    K._CACHE_DTYPE = jnp.float32
    K._VJP_CACHE.clear()
    try:
        mod = Sparse3DNA(
            dim=32, video_shape=(5, 8, 8), kernel_size=3, dilation=2,
            heads=2, dim_head=16, causal=True, rel_pos_bias=True,
        )
        mod_pl = mod.replace(use_pallas=True)
        p = mod.init(KEY)
        t = 5 * 64 - 5
        x = jax.random.normal(KEY, (2, 1 + t, 32))
        w = jax.random.normal(jax.random.PRNGKey(7), (2, 1 + t, 32))

        def loss(m, p, x):
            return jnp.sum(m(p, x) * w)

        g_ref = jax.grad(loss, argnums=(1, 2))(mod, p, x)
        with pltpu.force_tpu_interpret_mode():
            g_pl = jax.grad(loss, argnums=(1, 2))(mod_pl, p, x)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-9
            np.testing.assert_array_less(np.abs(a - b).max() / scale, 1e-4)
    finally:
        K._CACHE_DTYPE = old
        K._VJP_CACHE.clear()


def test_packed_not_applied_to_centered_or_nondivisor():
    """Centered mode and HW values that don't divide 128 stay unpacked."""
    from nuwa_tpu.kernels.nda_pallas import packed_frames

    centered = Sparse3DNA(
        dim=16, video_shape=(3, 8, 8), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=False,
    )
    assert packed_frames(centered) is None
    nondiv = Sparse3DNA(
        dim=16, video_shape=(3, 2, 3), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=True,
    )
    assert packed_frames(nondiv) is None
    # ... and the non-divisor causal case still has a correct (unpacked
    # whole-frame) interpret-mode path
    x = jax.random.normal(KEY, (1, 1 + 18, 16))
    _compare(nondiv, x)
