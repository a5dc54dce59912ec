import jax
import jax.numpy as jnp
import numpy as np

from nuwa_tpu.ops.attention import Attention

KEY = jax.random.PRNGKey(0)


def test_attention_shapes():
    attn = Attention(dim=32, heads=4, dim_head=8)
    p = attn.init(KEY)
    x = jax.random.normal(KEY, (2, 6, 32))
    out = attn(p, x)
    assert out.shape == x.shape


def test_attention_causality():
    attn = Attention(dim=32, heads=2, dim_head=8, causal=True)
    p = attn.init(KEY)
    x = jax.random.normal(KEY, (1, 8, 32))
    out1 = attn(p, x)
    x2 = x.at[:, 5].set(jax.random.normal(jax.random.PRNGKey(7), (32,)))
    out2 = attn(p, x2)
    np.testing.assert_allclose(out1[:, :5], out2[:, :5], atol=1e-5)
    assert not np.allclose(out1[:, 5:], out2[:, 5:])


def test_attention_key_masking():
    attn = Attention(dim=16, heads=2, dim_head=8)
    p = attn.init(KEY)
    x = jax.random.normal(KEY, (1, 5, 16))
    mask = jnp.array([[True, True, True, False, False]])
    out1 = attn(p, x, mask=mask)
    # changing masked-out keys must not affect the output of unmasked queries
    x2 = x.at[:, 4].set(99.0)
    out2 = attn(p, x2, mask=mask)
    np.testing.assert_allclose(out1[:, :3], out2[:, :3], atol=1e-5)


def test_attention_all_masked_falls_back_to_null_kv():
    attn = Attention(dim=16, heads=2, dim_head=8)
    p = attn.init(KEY)
    x = jax.random.normal(KEY, (1, 4, 16))
    ctx = jax.random.normal(KEY, (1, 6, 16))
    mask = jnp.zeros((1, 6), dtype=bool)
    out = attn(p, x, context=ctx, context_mask=mask)
    assert np.isfinite(np.asarray(out)).all()
    # with everything masked, every query sees only the null kv -> all value
    # rows identical per batch before to_out, hence outputs identical when
    # queries are identical
    x_same = jnp.broadcast_to(x[:, :1], x.shape)
    out_same = attn(p, x_same, context=ctx, context_mask=mask)
    np.testing.assert_allclose(out_same[:, 0], out_same[:, 1], atol=1e-5)


def test_attention_cross_uses_context():
    attn = Attention(dim=16, heads=2, dim_head=8)
    p = attn.init(KEY)
    x = jax.random.normal(KEY, (1, 4, 16))
    ctx1 = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16))
    ctx2 = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 16))
    assert not np.allclose(attn(p, x, context=ctx1), attn(p, x, context=ctx2))


def test_attention_oracle_manual():
    """Independent dense-attention recomputation (numpy) must match."""
    attn = Attention(dim=8, heads=2, dim_head=4, causal=False)
    p = attn.init(KEY)
    x = jax.random.normal(KEY, (1, 3, 8))
    out = np.asarray(attn(p, x))

    q = np.asarray(x) @ np.asarray(p["to_q"]["w"])
    kv = np.asarray(x) @ np.asarray(p["to_kv"]["w"])
    k, v = np.split(kv, 2, axis=-1)
    q = q.reshape(1, 3, 2, 4).transpose(0, 2, 1, 3) * 4**-0.5
    k = k.reshape(1, 3, 2, 4).transpose(0, 2, 1, 3)
    v = v.reshape(1, 3, 2, 4).transpose(0, 2, 1, 3)
    k = np.concatenate([np.asarray(p["null_k"])[None], k], axis=2)
    v = np.concatenate([np.asarray(p["null_v"])[None], v], axis=2)
    sim = np.einsum("bhid,bhjd->bhij", q, k)
    a = np.exp(sim - sim.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    a = np.einsum("bhij,gh->bgij", a, np.asarray(p["talking_heads"]))
    o = np.einsum("bhij,bhjd->bhid", a, v)
    o = o.transpose(0, 2, 1, 3).reshape(1, 3, 8) @ np.asarray(p["to_out"]["w"])
    np.testing.assert_allclose(out, o, atol=1e-4)
