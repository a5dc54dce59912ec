"""Pallas TPU kernel for Sparse3DNA — block-local neighborhood attention.

Replaces the XLA gather path (nuwa_tpu/nda.py) on the hot path. Instead of
gathering each query's Kf·Kh·Kw neighbors (reference: unfold + per-token
patch extraction, nuwa_pytorch.py:443-457,523-564), queries are processed one
*frame* at a time and the 3D kernel is exploited as a separable product:

  * the temporal taps are Kf whole frames at dilated offsets — streamed from
    HBM with async DMA, one (heads, HW, d) tile per tap;
  * the spatial (Kh × Kw) neighborhood becomes a static (HW, HW) mask on a
    dense frame-vs-frame score matrix — an MXU matmul instead of a gather;
  * axial rel-pos bias decomposes into a static per-head spatial bias matrix
    plus a per-tap scalar, both folded into the mask;
  * softmax runs fp32 in two passes over the taps (probabilities cached
    bf16), the talking-heads head-mix is fused between softmax and PV, and
    the <bos> column rides along as a scalar lane.

Supported: causal + centered modes, any dilation, fmap ≤ 16 (HW ≤ 256 —
score tiles stay within VMEM); larger fmaps fall back to the XLA path.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _spatial_mask_and_selector(fh, fw, kh, kw, dh, dw, causal):
    """Static (HW, HW) allowed-mask and (HW, HW, kh*kw) one-hot tap selector
    (which spatial kernel tap, if any, maps query q to key k)."""
    HW = fh * fw
    mask = np.zeros((HW, HW), dtype=bool)
    selector = np.zeros((HW, HW, kh * kw), dtype=np.float32)
    for qy in range(fh):
        for qx in range(fw):
            qi = qy * fw + qx
            for b in range(kh):
                for c in range(kw):
                    if causal:
                        ky = qy + (b - (kh - 1)) * dh
                        kx = qx + (c - (kw - 1)) * dw
                    else:
                        ky = qy + (b - (kh - 1) // 2) * dh
                        kx = qx + (c - (kw - 1) // 2) * dw
                    if 0 <= ky < fh and 0 <= kx < fw:
                        ki = ky * fw + kx
                        mask[qi, ki] = True
                        selector[qi, ki, b * kw + c] = 1.0
    return mask, selector


def _kernel(
    q_ref,        # (1, h, HW, d) VMEM
    kbos_ref,     # (1, h, 1, d) VMEM
    vbos_ref,     # (1, h, 1, d) VMEM
    mask_ref,     # (HW, HW) VMEM (float32: 0 allowed / -inf disallowed)
    sbias_ref,    # (hb, HW, HW) VMEM spatial bias (hb = heads or 1)
    fbias_ref,    # (h, Kf) SMEM per-tap temporal bias
    th_ref,       # (h, h) SMEM talking-heads weights
    k_hbm,        # (b, h, Tpad, d) ANY
    v_hbm,        # (b, h, Tpad, d) ANY
    out_ref,      # (1, h, HW, d) VMEM
    kbuf, vbuf, p_buf, m_buf, acc, sem,
    *,
    Kf: int,
    df: int,
    LB: int,
    HW: int,
    heads: int,
    dim_head: int,
    t_valid: int,
    causal_f: bool,
):
    bi = pl.program_id(0)
    fi = pl.program_id(1)

    q = q_ref[0].astype(jnp.float32)  # (h, HW, d) — pre-scaled by caller

    col = jax.lax.broadcasted_iota(jnp.int32, (1, HW), 1)  # (1, HW)

    def tap_src_frame(j):
        # original-frame index of tap j; padded slice start is (g + LB) * HW
        if causal_f:
            return fi - j * df
        return fi + (j - (Kf - 1) // 2) * df

    # ---- pass 1: scores + running max (static tap loop) ---------------
    m_buf[...] = jnp.full((heads, HW), -1e30, jnp.float32)
    for j in range(Kf):
        g = tap_src_frame(j)
        start = (g + LB) * HW
        cp_k = pltpu.make_async_copy(
            k_hbm.at[bi, :, pl.ds(start, HW), :], kbuf, sem.at[0]
        )
        cp_k.start()
        cp_k.wait()
        k = kbuf[...].astype(jnp.float32)  # (h, HW, d)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (h, HW, HW)
        s = s + mask_ref[...][None]
        s = s + sbias_ref[...]
        s = jnp.stack(
            [s[hh] + fbias_ref[hh, j] for hh in range(heads)], axis=0
        )
        # validity: tap frame exists and kv token < t_valid
        tok_ok = jnp.logical_and(g >= 0, (g * HW + col) < t_valid)  # (1, HW)
        s = jnp.where(tok_ok[None, :, :], s, -1e30)
        p_buf[j] = s.astype(jnp.bfloat16)
        m_buf[...] = jnp.maximum(m_buf[...], jnp.max(s, axis=-1))

    # bos column via VPU broadcast-reduce (avoids an N=1 matmul)
    s_bos = jnp.sum(q * kbos_ref[0].astype(jnp.float32), axis=-1)  # (h, HW)
    m = jnp.maximum(m_buf[...], s_bos)

    # ---- pass 2: exp, denom, talking-heads, PV ------------------------
    p_bos = jnp.exp(s_bos - m)  # (h, HW)
    denom = p_bos
    for j in range(Kf):
        pj = jnp.exp(p_buf[j].astype(jnp.float32) - m[..., None])
        p_buf[j] = pj.astype(jnp.bfloat16)
        denom = denom + jnp.sum(pj, axis=-1)

    inv = 1.0 / denom  # (h, HW)

    acc[...] = jnp.zeros((heads, HW, dim_head), jnp.float32)
    for j in range(Kf):
        g = tap_src_frame(j)
        start = (g + LB) * HW
        cp_v = pltpu.make_async_copy(
            v_hbm.at[bi, :, pl.ds(start, HW), :], vbuf, sem.at[1]
        )
        cp_v.start()
        cp_v.wait()
        v = vbuf[...].astype(jnp.float32)  # (h, HW, d)
        attn = p_buf[j].astype(jnp.float32) * inv[..., None]  # (h, HW, HW)
        # talking heads across the head axis: unrolled scalar AXPY mix
        # (SMEM scalars; avoids reshapes Mosaic cannot lower)
        mixed = [None] * heads
        for gh in range(heads):
            mg = th_ref[gh, 0] * attn[0]
            for hh in range(1, heads):
                mg = mg + th_ref[gh, hh] * attn[hh]
            mixed[gh] = mg
        attn = jnp.stack(mixed, axis=0)
        acc[...] += jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    # bos contribution with the same head mix
    ab = p_bos * inv  # (h, HW)
    mixed_b = [None] * heads
    for gh in range(heads):
        mg = th_ref[gh, 0] * ab[0]
        for hh in range(1, heads):
            mg = mg + th_ref[gh, hh] * ab[hh]
        mixed_b[gh] = mg
    attn_bos = jnp.stack(mixed_b, axis=0)  # (h, HW)
    out = acc[...] + attn_bos[..., None] * vbos_ref[0].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def sparse_3dna_pallas(mod, p, q, k, v, k_bos, v_bos, num_frames, t):
    """Entry used by Sparse3DNA.__call__ when ``use_pallas=True``.

    q, k, v: (b, h, F*HW, d) video tokens (bos stripped, padded to full
    frames). Returns (b, h, t, d).
    """
    b, h, t_pad, d_orig = q.shape
    assert t_pad == num_frames * mod.video_shape[1] * mod.video_shape[2]
    fdim, fh, fw = mod.video_shape
    HW = fh * fw
    kf, kh, kw = mod.kernel
    df, dh, dw = mod.dilations
    F = num_frames
    assert HW <= 256, "pallas 3DNA supports fmap <= 16; use the XLA path"

    # Mosaic DMA slices need a 128-aligned lane (minor) dim — zero-pad the
    # head dim (zeros contribute nothing to QK^T and are sliced off at PV out)
    d = ((d_orig + 127) // 128) * 128
    if d != d_orig:
        padd = ((0, 0), (0, 0), (0, 0), (0, d - d_orig))
        q = jnp.pad(q, padd)
        k = jnp.pad(k, padd)
        v = jnp.pad(v, padd)
        k_bos = jnp.pad(k_bos, padd)
        v_bos = jnp.pad(v_bos, padd)

    LB = (kf - 1) * df if mod.causal else ((kf - 1) // 2) * df
    RB = 0 if mod.causal else ((kf - 1) // 2) * df

    # pad kv with LB front frames (+ RB back frames for centered windows)
    kpad = jnp.pad(k, ((0, 0), (0, 0), (LB * HW, RB * HW), (0, 0)))
    vpad = jnp.pad(v, ((0, 0), (0, 0), (LB * HW, RB * HW), (0, 0)))

    # static mask (numpy) + traced bias matrices (params are tracers under jit)
    mask_np, selector_np = _spatial_mask_and_selector(
        fh, fw, kh, kw, dh, dw, mod.causal
    )
    maskf = jnp.asarray(np.where(mask_np, 0.0, -np.inf), jnp.float32)

    if mod.rel_pos_bias:
        axials = list(p["rel_pos_bias"]["axials"])
        comp = dict(zip(sizes_index(mod.kernel), axials))
        f_tab, h_tab, w_tab = comp.get(0), comp.get(1), comp.get(2)
        if f_tab is not None:
            fb = jnp.transpose(f_tab)  # (h, kf)
            # tap j=0 is the own frame (offset 0) == last kernel index in the
            # causal enumeration, hence the reversal
            fbias = fb[:, ::-1] if mod.causal else fb
        else:
            fbias = jnp.zeros((h, kf), jnp.float32)
        hw_tab = jnp.zeros((kh, kw, h), jnp.float32)
        if h_tab is not None:
            hw_tab = hw_tab + h_tab[:, None, :]
        if w_tab is not None:
            hw_tab = hw_tab + w_tab[None, :, :]
        hw_tab = hw_tab.reshape(kh * kw, h)
        # scatter per-tap spatial bias into the (HW, HW) layout via a static
        # one-hot selector: sbias[h,q,k] = sum_t selector[q,k,t] * hw_tab[t,h]
        sbias = jnp.einsum(
            "qkt,th->hqk", jnp.asarray(selector_np, jnp.float32), hw_tab
        )
    else:
        fbias = jnp.zeros((h, kf), jnp.float32)
        sbias = jnp.zeros((1, HW, HW), jnp.float32)

    th_w = p["talking_heads"].astype(jnp.float32)

    kernel = functools.partial(
        _kernel,
        Kf=kf,
        df=df,
        LB=LB,
        HW=HW,
        heads=h,
        dim_head=d,
        t_valid=t,
        causal_f=mod.causal,
    )

    out = pl.pallas_call(
        kernel,
        grid=(b, F),
        in_specs=[
            pl.BlockSpec((1, h, HW, d), lambda bi, fi: (bi, 0, fi, 0),
                         memory_space=pltpu.VMEM),                      # q
            pl.BlockSpec((1, h, 1, d), lambda bi, fi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),                      # k_bos
            pl.BlockSpec((1, h, 1, d), lambda bi, fi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),                      # v_bos
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # sbias
            pl.BlockSpec(memory_space=pltpu.SMEM),                      # fbias
            pl.BlockSpec(memory_space=pltpu.SMEM),                      # talking heads
            pl.BlockSpec(memory_space=pl.ANY),                       # k (HBM)
            pl.BlockSpec(memory_space=pl.ANY),                       # v (HBM)
        ],
        out_specs=pl.BlockSpec((1, h, HW, d), lambda bi, fi: (bi, 0, fi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, F * HW, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, HW, d), q.dtype),            # kbuf (matches DMA src)
            pltpu.VMEM((h, HW, d), q.dtype),            # vbuf
            pltpu.VMEM((kf, h, HW, HW), jnp.bfloat16),  # p_buf
            pltpu.VMEM((h, HW), jnp.float32),           # m_buf
            pltpu.VMEM((h, HW, d), jnp.float32),        # acc
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k_bos, v_bos, maskf, sbias, fbias, th_w, kpad, vpad)
    return out[:, :, :t, :d_orig]


def sizes_index(kernel):
    """Indices (axis ids) of kernel axes with size > 1, in order."""
    return [i for i, s in enumerate(kernel) if s > 1]


# ---------------------------------------------------------------------------
# differentiable wrapper: pallas forward, XLA-gather backward (remat-style)
# ---------------------------------------------------------------------------

_VJP_CACHE = {}


def sparse_3dna_pallas_vjp(mod, num_frames: int, t: int):
    """Return a differentiable op ``f(p_sub, q, k, v, k_bos, v_bos)``.

    Forward runs the Pallas kernel; the backward recomputes the equivalent
    XLA gather-attention (nuwa_tpu/nda) and uses its VJP — the forward stays
    on the fused kernel while gradients remain exact (rematerialization, no
    extra residuals saved).
    """
    cache_key = (mod, num_frames, t)
    if cache_key in _VJP_CACHE:
        return _VJP_CACHE[cache_key]

    from ..nda import _nda_attend, build_nda_indices, gather_neighbors

    F, fh, fw = mod.video_shape
    HW = fh * fw
    mode = "causal" if mod.causal else "centered"
    idx_np, valid_np = build_nda_indices(
        (num_frames, fh, fw), mod.kernel, mod.dilations, (mode,) * 3
    )
    idx_np, valid_np = idx_np[:t], valid_np[:t]
    if t < num_frames * HW:
        valid_np = valid_np & (idx_np < t)
    idx_c = jnp.asarray(idx_np)
    valid_c = jnp.asarray(valid_np)

    def reference(p_sub, q, k, v, k_bos, v_bos):
        rel_bias = None
        if mod.rel_pos_bias:
            rel_bias = mod.bias_module(p_sub["rel_pos_bias"]).T
        k_nb = gather_neighbors(k, idx_c)
        v_nb = gather_neighbors(v, idx_c)
        out = _nda_attend(
            q[:, :, :t], k_nb, v_nb, valid_c, k_bos, v_bos, rel_bias,
            p_sub["talking_heads"],
        )
        return out

    @jax.custom_vjp
    def op(p_sub, q, k, v, k_bos, v_bos):
        return sparse_3dna_pallas(mod, p_sub, q, k, v, k_bos, v_bos, num_frames, t)

    def op_fwd(p_sub, q, k, v, k_bos, v_bos):
        out = sparse_3dna_pallas(mod, p_sub, q, k, v, k_bos, v_bos, num_frames, t)
        return out, (p_sub, q, k, v, k_bos, v_bos)

    def op_bwd(res, g):
        p_sub, q, k, v, k_bos, v_bos = res
        _, vjp = jax.vjp(reference, p_sub, q, k, v, k_bos, v_bos)
        return vjp(g)

    op.defvjp(op_fwd, op_bwd)
    _VJP_CACHE[cache_key] = op
    return op
