"""NDA family tests against independent brute-force oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuwa_tpu.nda import Sparse3DNA, SparseCausal2DNA, SparseCross2DNA

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# brute-force oracles (pure numpy, written from first principles)
# ---------------------------------------------------------------------------


def brute_force_3dna(mod: Sparse3DNA, p, x):
    """Dense attention restricted to the causal/centered 3D neighborhood."""
    b, n, _ = x.shape
    h, dh = mod.heads, mod.dim_head
    F, H, W = mod.video_shape
    kf, kh, kw = mod.kernel
    df, dh_, dw = mod.dilations
    t = n - 1
    tpf = H * W
    pad = (-t) % tpf
    nf = (t + pad) // tpf

    xp = np.pad(np.asarray(x), ((0, 0), (0, pad), (0, 0)))
    q = np.asarray(x) @ np.asarray(p["to_q"]["w"])
    kvw = np.asarray(p["to_kv"]["w"])
    kv = xp @ kvw
    k, v = np.split(kv, 2, axis=-1)

    def heads(t_):
        return t_.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    q = q * dh**-0.5
    q, k_bos, v_bos = q[:, :, 1:], k[:, :, :1], v[:, :, :1]
    bos_out = v[:, :, :1]
    k, v = k[:, :, 1:], v[:, :, 1:]

    if mod.rel_pos_bias:
        # axial table over kernel shape, (Kn, heads)
        axials = [np.asarray(a) for a in p["rel_pos_bias"]["axials"]]
        dims = [a.shape[0] for a in axials]
        bias_grid = np.zeros(tuple(dims) + (h,))
        for i, a in enumerate(axials):
            shp = [1] * len(dims) + [h]
            shp[i] = dims[i]
            bias_grid = bias_grid + a.reshape(shp)
        bias_table = bias_grid.reshape(-1, h)  # (Kn, h)

    outs = np.zeros((b, h, t, dh))
    for i in range(t):
        fi, rem = divmod(i, tpf)
        yi, xi = divmod(rem, W)
        sims, vals, biases = [], [], []
        kern_idx = 0
        for a in range(kf):
            for bb in range(kh):
                for c in range(kw):
                    if mod.causal:
                        fo = fi + (a - (kf - 1)) * df
                        yo = yi + (bb - (kh - 1)) * dh_
                        xo = xi + (c - (kw - 1)) * dw
                    else:
                        fo = fi + (a - (kf - 1) // 2) * df
                        yo = yi + (bb - (kh - 1) // 2) * dh_
                        xo = xi + (c - (kw - 1) // 2) * dw
                    ok = 0 <= fo < nf and 0 <= yo < H and 0 <= xo < W
                    j = (fo * tpf + yo * W + xo) if ok else None
                    if ok and j < t:  # phantom pad tokens masked
                        sims.append(j)
                        biases.append(kern_idx)
                    kern_idx += 1
        for bi in range(b):
            for hi in range(h):
                s = [float(q[bi, hi, i] @ k_bos[bi, hi, 0])]
                bvals = [0.0]
                for j, kidx in zip(sims, biases):
                    s.append(float(q[bi, hi, i] @ k[bi, hi, j]))
                    bvals.append(
                        float(bias_table[kidx, hi]) if mod.rel_pos_bias else 0.0
                    )
                s = np.array(s) + np.array(bvals)
                a_ = np.exp(s - s.max())
                a_ = a_ / a_.sum()
                outs[bi, hi, i] = a_[0] * v_bos[bi, hi, 0]
                for w_, j in zip(a_[1:], sims):
                    outs[bi, hi, i] += w_ * v[bi, hi, j]

    # talking heads mixes *post-softmax* attention; equivalent to mixing the
    # per-head outputs only if values differ per head — so redo properly:
    # recompute with talking heads applied to attention weights.
    th = np.asarray(p["talking_heads"])
    outs2 = np.zeros((b, h, t, dh))
    for i in range(t):
        fi, rem = divmod(i, tpf)
        yi, xi = divmod(rem, W)
        sims, biases = [], []
        kern_idx = 0
        for a in range(kf):
            for bb in range(kh):
                for c in range(kw):
                    if mod.causal:
                        fo = fi + (a - (kf - 1)) * df
                        yo = yi + (bb - (kh - 1)) * dh_
                        xo = xi + (c - (kw - 1)) * dw
                    else:
                        fo = fi + (a - (kf - 1) // 2) * df
                        yo = yi + (bb - (kh - 1) // 2) * dh_
                        xo = xi + (c - (kw - 1) // 2) * dw
                    ok = 0 <= fo < nf and 0 <= yo < H and 0 <= xo < W
                    if ok and (fo * tpf + yo * W + xo) < t:
                        sims.append(fo * tpf + yo * W + xo)
                        biases.append(kern_idx)
                    kern_idx += 1
        for bi in range(b):
            attn = np.zeros((h, len(sims) + 1))
            for hi in range(h):
                s = [float(q[bi, hi, i] @ k_bos[bi, hi, 0])]
                bvals = [0.0]
                for j, kidx in zip(sims, biases):
                    s.append(float(q[bi, hi, i] @ k[bi, hi, j]))
                    bvals.append(
                        float(bias_table[kidx, hi]) if mod.rel_pos_bias else 0.0
                    )
                s = np.array(s) + np.array(bvals)
                e = np.exp(s - s.max())
                attn[hi] = e / e.sum()
            attn = th @ attn  # talking heads across the head dim
            for hi in range(h):
                outs2[bi, hi, i] = attn[hi, 0] * v_bos[bi, hi, 0]
                for w_, j in zip(attn[hi, 1:], sims):
                    outs2[bi, hi, i] += w_ * v[bi, hi, j]

    out = np.concatenate([bos_out, outs2], axis=2)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
    return out @ np.asarray(p["to_out"]["w"]) + np.asarray(p["to_out"]["b"])


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("dilation", [1, 2])
def test_sparse3dna_vs_oracle(causal, dilation):
    mod = Sparse3DNA(
        dim=16,
        video_shape=(3, 2, 2),
        kernel_size=3,
        dilation=dilation,
        heads=2,
        dim_head=8,
        causal=causal,
    )
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 1 + 3 * 4, 16))
    out = np.asarray(mod(p, x))
    oracle = brute_force_3dna(mod, p, x)
    np.testing.assert_allclose(out, oracle, atol=1e-4)


def test_sparse3dna_rel_pos_bias_vs_oracle():
    mod = Sparse3DNA(
        dim=16,
        video_shape=(2, 2, 2),
        kernel_size=3,
        dilation=1,
        heads=2,
        dim_head=8,
        causal=True,
        rel_pos_bias=True,
    )
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (1, 1 + 2 * 4, 16))
    np.testing.assert_allclose(
        np.asarray(mod(p, x)), brute_force_3dna(mod, p, x), atol=1e-4
    )


def test_sparse3dna_partial_frame():
    """Generation-time ragged sequence: shapes + causality must hold."""
    mod = Sparse3DNA(
        dim=16, video_shape=(3, 2, 2), kernel_size=3, heads=2, dim_head=8,
        causal=True,
    )
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (1, 1 + 6, 16))  # 1.5 frames
    out = np.asarray(mod(p, x))
    assert out.shape == (1, 7, 16)
    oracle = brute_force_3dna(mod, p, x)
    np.testing.assert_allclose(out, oracle, atol=1e-4)


def test_sparse3dna_causality_property():
    mod = Sparse3DNA(
        dim=16, video_shape=(3, 2, 2), kernel_size=3, heads=2, dim_head=8,
        causal=True,
    )
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (1, 13, 16))
    out1 = np.asarray(mod(p, x))
    x2 = x.at[:, 9].set(5.0)  # perturb a late token
    out2 = np.asarray(mod(p, x2))
    np.testing.assert_allclose(out1[:, :9], out2[:, :9], atol=1e-5)


def test_sparse3dna_chunked_matches():
    mod = Sparse3DNA(
        dim=16, video_shape=(4, 2, 2), kernel_size=3, heads=2, dim_head=8,
        causal=True,
    )
    mod_chunked = mod.replace(query_num_frames_chunk=2)
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (1, 17, 16))
    np.testing.assert_allclose(
        np.asarray(mod(p, x)), np.asarray(mod_chunked(p, x)), atol=1e-5
    )


def test_sparse3dna_bos_only():
    mod = Sparse3DNA(dim=16, video_shape=(2, 2, 2), heads=2, dim_head=8, causal=True)
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 1, 16))
    assert mod(p, x).shape == (2, 1, 16)


# ---------------------------------------------------------------------------
# SparseCausal2DNA
# ---------------------------------------------------------------------------


def brute_force_2dna(mod: SparseCausal2DNA, p, x):
    b, n, _ = x.shape
    h, dh = mod.heads, mod.dim_head
    H = mod.height
    K, d = mod.kernel_size, mod.dilation
    t = n - 1
    pad = (-t) % H
    xp = np.pad(np.asarray(x), ((0, 0), (0, pad), (0, 0)))
    qkv = xp @ np.asarray(p["to_qkv"]["w"])
    q, k, v = np.split(qkv, 3, axis=-1)

    def heads(t_):
        return t_.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    q = q * dh**-0.5
    bos_out = v[:, :, :1]
    q = q[:, :, 1 : t + 1]
    k_bos, k = k[:, :, :1], k[:, :, 1:]
    v_bos, v = v[:, :, :1], v[:, :, 1:]
    th = np.asarray(p["talking_heads"])

    if mod.rel_pos_bias:
        axials = [np.asarray(a) for a in p["rel_pos_bias"]["axials"]]
        dims = [a.shape[0] for a in axials]
        bias_grid = np.zeros(tuple(dims) + (h,))
        for i, a in enumerate(axials):
            shp = [1] * len(dims) + [h]
            shp[i] = dims[i]
            bias_grid = bias_grid + a.reshape(shp)
        bias_table = bias_grid.reshape(-1, h)

    outs = np.zeros((b, h, t, dh))
    for i in range(t):
        tt = i // H
        neigh, kidxs = [], []
        kern_idx = 0
        for a in range(K):
            to = tt + (a - (K - 1)) * d
            for hh in range(H):
                j = to * H + hh
                if 0 <= to and j < t:
                    neigh.append(j)
                    kidxs.append(kern_idx)
                kern_idx += 1
        for bi in range(b):
            attn = np.zeros((h, len(neigh) + 1))
            for hi in range(h):
                s = [float(q[bi, hi, i] @ k_bos[bi, hi, 0])]
                bvals = [0.0]
                for j, kidx in zip(neigh, kidxs):
                    s.append(float(q[bi, hi, i] @ k[bi, hi, j]))
                    bvals.append(
                        float(bias_table[kidx, hi]) if mod.rel_pos_bias else 0.0
                    )
                s = np.array(s) + np.array(bvals)
                e = np.exp(s - s.max())
                attn[hi] = e / e.sum()
            attn = th @ attn
            for hi in range(h):
                outs[bi, hi, i] = attn[hi, 0] * v_bos[bi, hi, 0]
                for w_, j in zip(attn[hi, 1:], neigh):
                    outs[bi, hi, i] += w_ * v[bi, hi, j]

    out = np.concatenate([bos_out, outs], axis=2)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
    return out @ np.asarray(p["to_out"]["w"])


@pytest.mark.parametrize("height,dilation", [(1, 1), (2, 1), (1, 2)])
def test_sparse_causal_2dna_vs_oracle(height, dilation):
    mod = SparseCausal2DNA(
        dim=16, height=height, heads=2, dim_head=8, kernel_size=3,
        dilation=dilation,
    )
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 1 + 8, 16))
    np.testing.assert_allclose(
        np.asarray(mod(p, x)), brute_force_2dna(mod, p, x), atol=1e-4
    )


def test_sparse_causal_2dna_rel_bias():
    mod = SparseCausal2DNA(
        dim=16, height=2, heads=2, dim_head=8, kernel_size=3, rel_pos_bias=True
    )
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (1, 7, 16))
    np.testing.assert_allclose(
        np.asarray(mod(p, x)), brute_force_2dna(mod, p, x), atol=1e-4
    )


def test_sparse_causal_2dna_causality_height1():
    mod = SparseCausal2DNA(dim=16, height=1, heads=2, dim_head=8, kernel_size=3)
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (1, 9, 16))
    out1 = np.asarray(mod(p, x))
    x2 = x.at[:, 6].set(3.0)
    out2 = np.asarray(mod(p, x2))
    np.testing.assert_allclose(out1[:, :6], out2[:, :6], atol=1e-5)


# ---------------------------------------------------------------------------
# SparseCross2DNA
# ---------------------------------------------------------------------------


def brute_force_cross2dna(mod: SparseCross2DNA, p, x, context, context_mask):
    b, n, _ = x.shape
    h, dh = mod.heads, mod.dim_head
    fmap = mod.image_size
    K, d = mod.kernel_size, mod.dilation
    tpf = fmap * fmap
    Fc = context.shape[1] // tpf

    q = np.asarray(x) @ np.asarray(p["to_q"]["w"])
    kv = np.asarray(context) @ np.asarray(p["to_kv"]["w"])
    k, v = np.split(kv, 2, axis=-1)

    def heads(t_):
        return t_.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    q = q * dh**-0.5
    null_k = np.asarray(p["null_k"])[:, 0]
    null_v = np.asarray(p["null_v"])[:, 0]
    th = np.asarray(p["talking_heads"])
    cm = np.asarray(context_mask)

    out = np.zeros((b, h, n, dh))
    # bos: full attention over [null, context]
    for bi in range(b):
        for hi in range(h):
            s = [float(q[bi, hi, 0] @ null_k[hi])]
            vs = [null_v[hi]]
            for j in range(context.shape[1]):
                if cm[bi, j]:
                    s.append(float(q[bi, hi, 0] @ k[bi, hi, j]))
                    vs.append(v[bi, hi, j])
            s = np.array(s)
            e = np.exp(s - s.max())
            a = e / e.sum()
            out[bi, hi, 0] = sum(w_ * vv for w_, vv in zip(a, vs))

    for i in range(1, n):
        pos = (i - 1) % tpf
        yi, xi = divmod(pos, fmap)
        neigh = []
        for fc in range(Fc):
            for a in range(K):
                for c in range(K):
                    yo = yi + (a - (K - 1) // 2) * d
                    xo = xi + (c - (K - 1) // 2) * d
                    if 0 <= yo < fmap and 0 <= xo < fmap:
                        neigh.append(fc * tpf + yo * fmap + xo)
        for bi in range(b):
            valid = [j for j in neigh if cm[bi, j]]
            attn = np.zeros((h, len(valid) + 1))
            for hi in range(h):
                s = [float(q[bi, hi, i] @ null_k[hi])]
                for j in valid:
                    s.append(float(q[bi, hi, i] @ k[bi, hi, j]))
                s = np.array(s)
                e = np.exp(s - s.max())
                attn[hi] = e / e.sum()
            attn = th @ attn
            for hi in range(h):
                out[bi, hi, i] = attn[hi, 0] * null_v[hi]
                for w_, j in zip(attn[hi, 1:], valid):
                    out[bi, hi, i] += w_ * v[bi, hi, j]

    out = out.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
    return out @ np.asarray(p["to_out"]["w"])


def test_sparse_cross_2dna_vs_oracle():
    mod = SparseCross2DNA(dim=16, image_size=2, heads=2, dim_head=8, kernel_size=3)
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 1 + 8, 16))  # 2 video frames + bos
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 2 * 4, 16))  # 2 sketch frames
    cmask = jnp.array([[True] * 8, [True] * 5 + [False] * 3])
    out = np.asarray(mod(p, x, context=ctx, context_mask=cmask))
    oracle = brute_force_cross2dna(mod, p, x, ctx, cmask)
    np.testing.assert_allclose(out, oracle, atol=1e-4)


def test_sparse_cross_2dna_dense_matches_gather():
    """The masked-dense cross backend must equal the gather path (fwd+grads),
    ragged tail + partially-masked context included."""
    mod_g = SparseCross2DNA(
        dim=16, image_size=4, heads=2, dim_head=8, kernel_size=3,
        backend="gather",
    )
    mod_d = mod_g.replace(backend="dense")
    p = mod_g.init(KEY)
    x = jax.random.normal(KEY, (2, 1 + 37, 16))  # ragged: 37 = 2*16 + 5
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 2 * 16, 16))
    cmask = jnp.array([[True] * 32, [True] * 20 + [False] * 12])
    out_g = mod_g(p, x, context=ctx, context_mask=cmask)
    out_d = mod_d(p, x, context=ctx, context_mask=cmask)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_g), atol=1e-5)

    w = jax.random.normal(jax.random.PRNGKey(7), x.shape)

    def loss(mod):
        return lambda p, x, c: jnp.sum(mod(p, x, context=c, context_mask=cmask) * w)

    g_g = jax.grad(loss(mod_g), argnums=(0, 1, 2))(p, x, ctx)
    g_d = jax.grad(loss(mod_d), argnums=(0, 1, 2))(p, x, ctx)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        g_d, g_g,
    )


def test_sparse_cross_2dna_masked_context_ignored():
    mod = SparseCross2DNA(dim=16, image_size=2, heads=2, dim_head=8)
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (1, 5, 16))
    ctx = jax.random.normal(KEY, (1, 4, 16))
    cmask = jnp.array([[True, True, False, False]])
    out1 = np.asarray(mod(p, x, context=ctx, context_mask=cmask))
    ctx2 = ctx.at[:, 3].set(77.0)
    out2 = np.asarray(mod(p, x, context=ctx2, context_mask=cmask))
    np.testing.assert_allclose(out1, out2, atol=1e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_dense_tap_backend_matches_gather(causal):
    """The gather-free dense frame-tap backend must equal the gather path."""
    mod = Sparse3DNA(
        dim=16, video_shape=(4, 2, 2), kernel_size=3, dilation=2,
        heads=2, dim_head=8, causal=causal, rel_pos_bias=True,
    )
    mod_dense = mod.replace(backend="dense")
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 1 + 16, 16))
    np.testing.assert_allclose(
        np.asarray(mod_dense(p, x)), np.asarray(mod(p, x)), atol=1e-4, rtol=1e-3
    )
    # ragged tail
    x2 = jax.random.normal(KEY, (1, 1 + 10, 16))
    np.testing.assert_allclose(
        np.asarray(mod_dense(p, x2)), np.asarray(mod(p, x2)), atol=1e-4, rtol=1e-3
    )


def test_dense_tap_backend_gradients():
    mod = Sparse3DNA(
        dim=16, video_shape=(3, 2, 2), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=True,
    )
    mod_dense = mod.replace(backend="dense")
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (1, 13, 16))

    def loss(m, p, x):
        return jnp.sum(m(p, x) ** 2)

    g_ref = jax.grad(loss, argnums=(1, 2))(mod, p, x)
    g_dense = jax.grad(loss, argnums=(1, 2))(mod_dense, p, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("causal", [True, False])
def test_dense_chunked_backend_matches_gather(causal):
    """Row-chunked dense path (large-fmap mode) == gather path."""
    mod = Sparse3DNA(
        dim=16, video_shape=(3, 4, 4), kernel_size=3, dilation=(2, 1, 2),
        heads=2, dim_head=8, causal=causal, rel_pos_bias=True, backend="gather",
    )
    mod_chunked = mod.replace(backend="dense_chunked")
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (2, 1 + 3 * 16, 16))
    np.testing.assert_allclose(
        np.asarray(mod_chunked(p, x)), np.asarray(mod(p, x)), atol=1e-4, rtol=1e-3
    )
    # ragged tail
    x2 = jax.random.normal(KEY, (1, 1 + 20, 16))
    np.testing.assert_allclose(
        np.asarray(mod_chunked(p, x2)), np.asarray(mod(p, x2)), atol=1e-4, rtol=1e-3
    )


def test_dense_chunked_gradients():
    mod = Sparse3DNA(
        dim=16, video_shape=(2, 4, 4), kernel_size=3, dilation=1,
        heads=2, dim_head=8, causal=True, backend="gather",
    )
    mod_c = mod.replace(backend="dense_chunked")
    p = mod.init(KEY)
    x = jax.random.normal(KEY, (1, 1 + 32, 16))

    def loss(m, p):
        return jnp.sum(m(p, x) ** 2)

    g1 = jax.grad(loss, argnums=1)(mod, p)
    g2 = jax.grad(loss, argnums=1)(mod_c, p)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)
