"""Pallas TPU kernels for Sparse3DNA — block-local neighborhood attention.

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

Training runs flash-style: the forward saves only the per-row logsumexp
(``lse``); the backward recomputes scores tap-by-tap in two kernels — a
query-side kernel (dq, softmax-dot correction ``rho``, bias/talking-heads/bos
grads) and a key-side kernel (dk, dv) — so the (T, Kf·HW) probability tensor
is never materialized in HBM (the XLA dense path saves it as a residual).

Two kernel families share the machinery: whole-frame (HW ≤ 256 — the score
tile is one frame vs one frame) and row-blocked (HW > 256, causal — R-row
query blocks against a sliding key-row window, frames padded with
(kh-1)·dh zero rows so the relative spatial mask is block-independent).
Both have true flash backwards; both support causal and centered modes and
any dilation (centered row-blocked pads rows top+bottom and frames
front+back, so 256px-class sketch encoders get the fast path too).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# dtype of the in-kernel score/probability cache. bf16 halves VMEM; the
# backward rounds its recomputed *scores* through this dtype so P stays
# consistent with the saved lse up to the cache rounding. Two residual
# deviations remain, both O(bf16 eps) and measured ~4e-6 on chip: (a) the
# whole-frame forward additionally rounds the exp'd probabilities (p_buf)
# through the cache dtype before the PV matmul while the backward recomputes
# P in fp32 from the rounded scores, so d(softmax) pairs with a slightly
# different realized P than the forward used; (b) the lse itself is the
# rounded-score logsumexp. The row-blocked forward normalizes directly and
# matches exactly; all deviations vanish with _CACHE_DTYPE = fp32 (the
# configuration the parity tests pin).
_CACHE_DTYPE = jnp.bfloat16

# timing-probe switch (scripts/bench_cross_2dna.py --probe-recompute): bake
# a backward that SKIPS the flash QK score recompute, to measure what a
# cached-score backward would save. Never enable outside timing probes —
# the gradients it produces are wrong.
_PROBE_SKIP_SCORES = False


def _hash_u32(x):
    """splitmix32-style avalanche hash on uint32 vectors (VPU ops only)."""
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _keep_mask(shape, keep, seed, bi, fi, j):
    """Bernoulli(keep) mask from a stateless counter hash.

    Keyed by (seed, block, tap) plus the element's mixed-radix index, so the
    exact mask regenerates wherever it is needed (forward and both backward
    kernels) with no PRNG state — and identically in compiled and interpret
    modes (pltpu.prng_random_bits is a zero stub under TPU interpret)."""
    u32 = jnp.uint32
    s = jnp.asarray(seed).astype(u32)
    for v in (bi, fi, j):
        s = s * u32(0x9E3779B9) + jnp.asarray(v).astype(u32) + u32(0x85EBCA6B)
    s = _hash_u32(s)
    e = None
    for axis, n in enumerate(shape):
        it = jax.lax.broadcasted_iota(jnp.int32, shape, axis).astype(u32)
        e = it if e is None else e * u32(n) + it
    bits = _hash_u32(e * u32(0x27D4EB2F) ^ s)
    thresh = np.uint32(min(0xFFFFFFFF, int(round((1.0 - keep) * 2**32))))
    return bits >= thresh


def _keep_mask_abs(shape, keep, seed, bi, q_base, k_base):
    """Bernoulli(keep) mask keyed by ABSOLUTE (head, query-token, key-token)
    coordinates (plus seed/batch), so any sub-tile of the attention matrix
    regenerates the same bits — the row-blocked kernels' forward tiles
    (query-block × key-window) and kv-backward tiles (query-block ×
    key-block) slice the same logical mask at different offsets. q_base /
    k_base are the (possibly traced, possibly negative-for-phantom) absolute
    ids of the tile's first row/column; phantom positions are -inf-masked
    before softmax so their bits never matter."""
    u32 = jnp.uint32
    s = jnp.asarray(seed).astype(u32) * u32(0x9E3779B9)
    s = _hash_u32(s + jnp.asarray(bi).astype(u32) + u32(0x85EBCA6B))
    hh = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    qa = jnp.asarray(q_base) + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    ka = jnp.asarray(k_base) + jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    e = (
        qa.astype(u32) * u32(0x27D4EB2F)
        ^ ka.astype(u32) * u32(0x165667B1)
        ^ hh.astype(u32) * u32(0x9E3779B9)
    )
    bits = _hash_u32(e ^ s)
    thresh = np.uint32(min(0xFFFFFFFF, int(round((1.0 - keep) * 2**32))))
    return bits >= thresh


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


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


# head count at which the talking-heads mix switches from unrolled VPU
# AXPYs (faster for small h; the matmul M-dim is only h) to one MXU dot
# (O(h) work and trace size instead of O(h^2) — the 16+ heads regime)
_MIX_DOT_MIN_HEADS = 16


def _mix_dot(th_ref, mats, transpose):
    th = th_ref[...].astype(jnp.float32)
    cdim = 0 if transpose else 1
    return jax.lax.dot_general(
        th, mats, (((cdim,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mix3(th_ref, mats, heads, transpose=False):
    """Talking-heads mix of a (h, N, M) value:
    mixed[a] = sum_b th[a,b] mats[b] (th[b,a] when transpose)."""
    if heads >= _MIX_DOT_MIN_HEADS:
        return _mix_dot(th_ref, mats, transpose)
    rows = []
    for a in range(heads):
        acc = None
        for b in range(heads):
            w = th_ref[b, a] if transpose else th_ref[a, b]
            term = w * mats[b]
            acc = term if acc is None else acc + term
        rows.append(acc[None])
    return jnp.concatenate(rows, axis=0)


def _mix2(th_ref, mats, heads, transpose=False):
    """Same mix for a (h, N) value."""
    if heads >= _MIX_DOT_MIN_HEADS:
        return _mix_dot(th_ref, mats, transpose)
    rows = []
    for a in range(heads):
        acc = None
        for b in range(heads):
            w = th_ref[b, a] if transpose else th_ref[a, b]
            term = w * mats[b : b + 1, :]
            acc = term if acc is None else acc + term
        rows.append(acc)
    return jnp.concatenate(rows, axis=0)


def _th_spec(heads):
    """Talking-heads weights live in SMEM for the unrolled scalar mix and in
    VMEM when the MXU-dot mix is used (matmul operands must be vectors)."""
    space = pltpu.VMEM if heads >= _MIX_DOT_MIN_HEADS else pltpu.SMEM
    return pl.BlockSpec(memory_space=space)


def _pair_contract(a3, b3, heads):
    """(h, h) matrix C[a, b] = sum_{q,k} a3[a,q,k] * b3[b,q,k].

    Mosaic rejects the direct 2-dim contraction ((1,2)x(1,2)), but when the
    trailing dim is lane-aligned the (q, k) axes collapse into one flat axis
    and the whole thing is a single MXU dot — measured 2.008 -> 1.265 ms on
    the fused cross backward (b=8/fmap16/F=10) vs the h*h unrolled VPU
    reductions. Falls back to the unrolled loop for unaligned lanes
    (row-blocked kernels with narrow key windows)."""
    if a3.shape[2] % 128 == 0:
        n = a3.shape[1] * a3.shape[2]
        return jax.lax.dot_general(
            a3.reshape(heads, n), b3.reshape(heads, n),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    rows = []
    for a in range(heads):
        cols = [
            jnp.sum(a3[a] * b3[b]).reshape(1, 1) for b in range(heads)
        ]
        rows.append(jnp.concatenate(cols, axis=1))
    return jnp.concatenate(rows, axis=0)


def _outer_hq_hqd(a2, m3):
    """(h, d) R[h] = sum_q a2[h,q] * m3[h,q,:].

    The lhs keeps an explicit singleton non-contracting dim — Mosaic cannot
    lower a dot whose lhs is fully consumed by batch+contraction dims."""
    r = jax.lax.dot_general(
        a2[:, None, :], m3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (h, 1, d)
    return r[:, 0, :]


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _kernel(
    q_ref,        # (1, h, HW, d) VMEM
    kbos_ref,     # (1, h, 1, d) VMEM
    vbos_ref,     # (1, h, 1, d) VMEM
    cbias_ref,    # (Kf, hb, HW, HW) VMEM — combined per-tap additive bias:
                  # -inf spatial mask + axial spatial bias + per-tap temporal
                  # bias, precombined outside (one add per tap-pass)
    th_ref,       # (h, h) VMEM talking-heads weights
    seed_ref,     # (1,) SMEM — attention-dropout PRNG seed
    cmask_ref,    # (1, 1, Lc) VMEM — additive runtime key mask (cross
                  # path); a dummy when has_cmask=False
    k_hbm,        # (b, h, Tpad, d) ANY
    v_hbm,        # (b, h, Tpad, d) ANY
    out_ref,      # (1, h, HW, d) VMEM
    lse_ref,      # (1, h, HW) VMEM — per-row logsumexp (flash residual)
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
    drop_rate: float = 0.0,
    fixed_taps: bool = False,
    has_cmask: bool = False,
    tap_offsets: tuple | None = None,
):
    bi = pl.program_id(0)
    fi = pl.program_id(1)
    keep = 1.0 - drop_rate

    def drop(j, attn):
        """Attention dropout (inverted, post-talking-heads). Masks regenerate
        identically in both backward kernels from the stateless counter hash
        keyed (seed, block, tap) — j=0 is the bos column."""
        if drop_rate <= 0.0:
            return attn
        m = _keep_mask(attn.shape, keep, seed_ref[0], bi, fi, j)
        return jnp.where(m, attn * (1.0 / keep), 0.0)

    q = q_ref[0].astype(jnp.float32)  # (h, HW, d) — pre-scaled by caller

    col = jax.lax.broadcasted_iota(jnp.int32, (1, HW), 1)  # (1, HW)

    def tap_src_frame(j):
        # original-frame index of tap j; padded slice start is (g + LB) * HW
        if fixed_taps:  # cross attention: tap j IS context frame j, any fi
            return j
        if tap_offsets is not None:  # lane-packed: static irregular offsets
            return fi - tap_offsets[j]
        if causal_f:
            return fi - j * df
        return fi + (j - (Kf - 1) // 2) * df

    # prefetch every tap's K and V up front: the DMA engine runs ahead of
    # the MXU instead of serializing a start->wait round trip per tap
    k_cps, v_cps = [], []
    for j in range(Kf):
        g = tap_src_frame(j)
        start = (g + LB) * HW
        cpk = pltpu.make_async_copy(
            k_hbm.at[bi, :, pl.ds(start, HW), :], kbuf.at[j], sem.at[j]
        )
        cpk.start()
        k_cps.append(cpk)
        cpv = pltpu.make_async_copy(
            v_hbm.at[bi, :, pl.ds(start, HW), :], vbuf.at[j], sem.at[Kf + j]
        )
        cpv.start()
        v_cps.append(cpv)

    # ---- pass 1: scores + running max (static tap loop) ---------------
    m_buf[...] = jnp.full((heads, HW), -1e30, jnp.float32)
    for j in range(Kf):
        g = tap_src_frame(j)
        k_cps[j].wait()
        k = kbuf[j].astype(jnp.float32)  # (h, HW, d)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (h, HW, HW)
        s = s + cbias_ref[0 if fixed_taps else j]
        if has_cmask:  # fixed-taps only (j is static): tap j's mask columns
            s = s + cmask_ref[0, :, j * HW : (j + 1) * HW][None]
        # validity: tap frame exists and kv token < t_valid
        tok_ok = jnp.logical_and(g >= 0, (g * HW + col) < t_valid)  # (1, HW)
        s = jnp.where(tok_ok[None, :, :], s, -1e30)
        p_buf[j] = s.astype(_CACHE_DTYPE)
        m_buf[...] = jnp.maximum(m_buf[...], jnp.max(s, axis=-1))

    # bos column via VPU broadcast-reduce (avoids an N=1 matmul)
    s_bos = jnp.sum(q * kbos_ref[0].astype(jnp.float32), axis=-1)  # (h, HW)
    m = jnp.maximum(m_buf[...], s_bos)

    # ---- pass 2: exp, denom, talking-heads, PV ------------------------
    p_bos = jnp.exp(s_bos - m)  # (h, HW)
    denom = p_bos
    for j in range(Kf):
        pj = jnp.exp(p_buf[j].astype(jnp.float32) - m[..., None])
        p_buf[j] = pj.astype(_CACHE_DTYPE)
        denom = denom + jnp.sum(pj, axis=-1)

    inv = 1.0 / denom  # (h, HW)
    lse_ref[0] = m + jnp.log(denom)  # flash residual for the backward

    acc[...] = jnp.zeros((heads, HW, dim_head), jnp.float32)
    for j in range(Kf):
        v_cps[j].wait()
        v = vbuf[j].astype(jnp.float32)  # (h, HW, d)
        attn = p_buf[j].astype(jnp.float32) * inv[..., None]  # (h, HW, HW)
        attn = _mix3(th_ref, attn, heads)
        attn = drop(j + 1, attn)
        acc[...] += jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    # bos contribution with the same head mix
    ab = p_bos * inv  # (h, HW)
    attn_bos = _mix2(th_ref, ab, heads)  # (h, HW)
    attn_bos = drop(0, attn_bos)
    out = acc[...] + attn_bos[..., None] * vbos_ref[0].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# row-blocked forward (HW > 256): queries in R-row blocks, keys from a
# (R + (kh-1)*dh)-row window of each tapped frame. Frames are padded with
# prow = (kh-1)*dh zero rows at the top so the relative spatial mask is
# independent of the row-block index (phantom rows masked at runtime).
# Two-pass flash: pass 1 computes the per-row logsumexp online (scores are
# discarded), pass 2 normalizes with it directly — no probability cache.
# ---------------------------------------------------------------------------


def _rb_mask_and_selector(fw, kh, kw, dh, dw, R, W, prow, causal=True):
    """Static relative (R*fw, W*fw) mask + (.., kh*kw) tap selector for the
    row-blocked layout (query row qr sits at window row prow + qr; causal
    reaches up/left only, centered reaches both ways)."""
    Rfw, Wfw = R * fw, W * fw
    mask = np.zeros((Rfw, Wfw), dtype=bool)
    sel = np.zeros((Rfw, Wfw, kh * kw), dtype=np.float32)
    for qr in range(R):
        for qx in range(fw):
            qi = qr * fw + qx
            for b in range(kh):
                dy = (b - (kh - 1)) * dh if causal else (b - (kh - 1) // 2) * dh
                wr = prow + qr + dy
                for c in range(kw):
                    kx = (
                        qx + (c - (kw - 1)) * dw
                        if causal
                        else qx + (c - (kw - 1) // 2) * dw
                    )
                    if 0 <= kx < fw:
                        ki = wr * fw + kx
                        mask[qi, ki] = True
                        sel[qi, ki, b * kw + c] = 1.0
    return mask, sel


def _rb_kernel(
    q_ref,        # (1, h, Rfw, d) VMEM — query row-block (pre-scaled)
    kbos_ref,     # (1, h, 1, d)
    vbos_ref,     # (1, h, 1, d)
    mask_ref,     # (Rfw, Wfw) float32 additive mask
    sbias_ref,    # (hb, Rfw, Wfw)
    fbias_ref,    # (h, Kf) SMEM
    th_ref,       # (h, h) SMEM
    seed_ref,     # (1,) SMEM — attention-dropout PRNG seed
    k_hbm,        # (b, h, (LB+F)*HWp, d) ANY — row+frame padded
    v_hbm,        # ANY
    out_ref,      # (1, h, Rfw, d)
    lse_ref,      # (1, h, Rfw)
    kbuf, vbuf, acc, sem,
    *,
    Kf: int,
    df: int,
    LB: int,
    HW: int,
    HWp: int,
    R: int,
    fw: int,
    prow: int,
    Rfw: int,
    Wfw: int,
    heads: int,
    t_valid: int,
    causal_f: bool = True,
    fh: int = 0,
    num_f: int = 0,
    drop_rate: float = 0.0,
):
    bi = pl.program_id(0)
    fi = pl.program_id(1)
    rb = pl.program_id(2)
    f32 = jnp.float32
    keep = 1.0 - drop_rate
    q_abs = fi * HW + rb * Rfw  # absolute id of this block's first query

    def drop_abs(x, k_base):
        """Inverted dropout on absolute (head, q, k) coordinates — the kv
        backward regenerates the same bits from its own tile offsets."""
        if drop_rate <= 0.0:
            return x
        m = _keep_mask_abs(x.shape, keep, seed_ref[0], bi, q_abs, k_base)
        return jnp.where(m, x * (1.0 / keep), 0.0)

    q = q_ref[0].astype(f32)
    kbos = kbos_ref[0].astype(f32)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, Wfw), 1)  # window token idx

    def tap_frame(j):
        return fi - j * df if causal_f else fi + (j - (Kf - 1) // 2) * df

    def window_start(g):
        # window begins at padded row rb*R of tapped frame g
        return (g + LB) * HWp + rb * R * fw

    # prefetch all taps' K/V windows once (K reused by both passes)
    cps = []
    for j in range(Kf):
        g = tap_frame(j)
        cpk = pltpu.make_async_copy(
            k_hbm.at[bi, :, pl.ds(window_start(g), Wfw), :], kbuf.at[j],
            sem.at[j],
        )
        cpk.start()
        cpv = pltpu.make_async_copy(
            v_hbm.at[bi, :, pl.ds(window_start(g), Wfw), :], vbuf.at[j],
            sem.at[Kf + j],
        )
        cpv.start()
        cps.append((cpk, cpv))
    k_waited = [False] * Kf
    v_waited = [False] * Kf

    def fetch_k(j):
        if not k_waited[j]:
            cps[j][0].wait()
            k_waited[j] = True
        return kbuf[j].astype(f32)

    def fetch_v(j):
        if not v_waited[j]:
            cps[j][1].wait()
            v_waited[j] = True
        return vbuf[j].astype(f32)

    def tap_scores(j, kmat):
        g = tap_frame(j)
        s = jax.lax.dot_general(
            q, kmat, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )  # (h, Rfw, Wfw)
        s = s + mask_ref[...][None]
        s = s + sbias_ref[...]
        s = jnp.stack([s[hh] + fbias_ref[hh, j] for hh in range(heads)], 0)
        # runtime validity: frame exists, key row is real (not padding),
        # key token is < t_valid
        krow = rb * R + kidx // fw - prow         # global row in the frame
        tok = g * HW + krow * fw + kidx % fw      # global token index
        ok = jnp.logical_and(g >= 0, krow >= 0)
        ok = jnp.logical_and(ok, tok < t_valid)
        if not causal_f:
            # centered mode reaches forward: bottom-padding rows and
            # trailing phantom frames would alias into later tokens
            ok = jnp.logical_and(ok, krow < fh)
            ok = jnp.logical_and(ok, g < num_f)
        s = jnp.where(ok[None, :, :], s, -1e30)
        return s.astype(_CACHE_DTYPE).astype(f32)

    # ---- pass 1: online logsumexp over taps (+bos), scores discarded ----
    s_bos = jnp.sum(q * kbos, axis=-1)            # (h, Rfw)
    m = s_bos
    denom = jnp.ones_like(s_bos)
    for j in range(Kf):
        s = tap_scores(j, fetch_k(j))
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        denom = denom * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(s - m_new[..., None]), axis=-1
        )
        m = m_new
    lse = m + jnp.log(denom)
    lse_ref[0] = lse

    # ---- pass 2: normalized probabilities via lse, mix, PV --------------
    acc[...] = jnp.zeros(acc.shape, f32)
    for j in range(Kf):
        kmat = fetch_k(j)
        s = tap_scores(j, kmat)
        vmat = fetch_v(j)
        pn = jnp.exp(s - lse[..., None])
        pn = _mix3(th_ref, pn, heads)
        g = tap_frame(j)
        pn = drop_abs(pn, g * HW + rb * Rfw - prow * fw)
        acc[...] += jax.lax.dot_general(
            pn, vmat, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
        )
    pn_bos = _mix2(th_ref, jnp.exp(s_bos - lse), heads)
    pn_bos = drop_abs(pn_bos[..., None], -2)[..., 0]  # bos key sentinel
    out = acc[...] + pn_bos[..., None] * vbos_ref[0].astype(f32)
    out_ref[0] = out.astype(out_ref.dtype)


def _rb_bwd_mask_and_selector(fw, kh, kw, dh, dw, R, NB, nb_neg=0,
                              causal=True):
    """Static key-block-vs-query-block masks for the row-blocked backward.

    For key block rows [rk0, rk0+R) the contributing query blocks start at
    rk0 + (rbq - nb_neg)*R for rbq in [0, NB); relative row offset
    dy = kl - (rbq - nb_neg)*R - ql is block-index independent, so one
    (NB, R*fw, R*fw) mask covers all. Centered mode reaches both ways
    (nb_neg > 0)."""
    Rfw = R * fw
    mask = np.zeros((NB, Rfw, Rfw), dtype=bool)
    sel = np.zeros((NB, Rfw, Rfw, kh * kw), dtype=np.float32)
    for rbq in range(NB):
        for ql in range(R):
            for qx in range(fw):
                qi = ql * fw + qx
                for b in range(kh):
                    dy = (b - (kh - 1)) * dh if causal else (b - (kh - 1) // 2) * dh
                    kl = ql + (rbq - nb_neg) * R + dy
                    if kl < 0 or kl >= R:
                        continue
                    for c in range(kw):
                        kx = (
                            qx + (c - (kw - 1)) * dw
                            if causal
                            else qx + (c - (kw - 1) // 2) * dw
                        )
                        if 0 <= kx < fw:
                            ki = kl * fw + kx
                            mask[rbq, qi, ki] = True
                            sel[rbq, qi, ki, b * kw + c] = 1.0
    return mask, sel


def _rb_bwd_q_kernel(
    q_ref,        # (1, h, Rfw, d)
    g_ref,        # (1, h, Rfw, d)
    lse_ref,      # (1, h, Rfw)
    kbos_ref,     # (1, h, 1, d)
    vbos_ref,     # (1, h, 1, d)
    mask_ref,     # (Rfw, Wfw)
    sbias_ref,    # (hb, Rfw, Wfw)
    fbias_ref,    # (h, Kf) SMEM
    th_ref,       # (h, h) SMEM
    seed_ref,     # (1,) SMEM — attention-dropout PRNG seed
    k_hbm,        # row+frame padded ANY
    v_hbm,        # ANY
    dq_ref, rho_ref, dkbos_ref, dvbos_ref, dth_ref, dsb_ref, dfb_ref,
    kbuf, vbuf, sem,
    *,
    Kf: int,
    df: int,
    LB: int,
    HW: int,
    HWp: int,
    R: int,
    fw: int,
    prow: int,
    Rfw: int,
    Wfw: int,
    heads: int,
    t_valid: int,
    rel_pos: bool,
    causal_f: bool = True,
    fh: int = 0,
    num_f: int = 0,
    drop_rate: float = 0.0,
):
    bi = pl.program_id(0)
    fi = pl.program_id(1)
    rb = pl.program_id(2)
    f32 = jnp.float32
    keep = 1.0 - drop_rate
    q_abs = fi * HW + rb * Rfw

    def drop_abs(x, k_base):
        if drop_rate <= 0.0:
            return x
        m = _keep_mask_abs(x.shape, keep, seed_ref[0], bi, q_abs, k_base)
        return jnp.where(m, x * (1.0 / keep), 0.0)

    q = q_ref[0].astype(f32)
    go = g_ref[0].astype(f32)
    lse = lse_ref[0].astype(f32)
    kbos = kbos_ref[0].astype(f32)
    vbos = vbos_ref[0].astype(f32)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, Wfw), 1)

    def tap_frame(j):
        return fi - j * df if causal_f else fi + (j - (Kf - 1) // 2) * df

    def window_start(g):
        return (g + LB) * HWp + rb * R * fw

    cps = []
    for j in range(Kf):
        g = tap_frame(j)
        cpk = pltpu.make_async_copy(
            k_hbm.at[bi, :, pl.ds(window_start(g), Wfw), :], kbuf.at[j],
            sem.at[j],
        )
        cpk.start()
        cpv = pltpu.make_async_copy(
            v_hbm.at[bi, :, pl.ds(window_start(g), Wfw), :], vbuf.at[j],
            sem.at[Kf + j],
        )
        cpv.start()
        cps.append((cpk, cpv))
    waited = [False] * Kf

    def fetch(j):
        if not waited[j]:
            cps[j][0].wait()
            cps[j][1].wait()
            waited[j] = True
        return kbuf[j].astype(f32), vbuf[j].astype(f32)

    def tap_p_dp(j, kmat, vmat):
        g = tap_frame(j)
        s = jax.lax.dot_general(
            q, kmat, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )
        s = s + mask_ref[...][None]
        s = s + sbias_ref[...]
        s = jnp.stack([s[hh] + fbias_ref[hh, j] for hh in range(heads)], 0)
        krow = rb * R + kidx // fw - prow
        tok = g * HW + krow * fw + kidx % fw
        ok = jnp.logical_and(g >= 0, krow >= 0)
        ok = jnp.logical_and(ok, tok < t_valid)
        if not causal_f:
            ok = jnp.logical_and(ok, krow < fh)
            ok = jnp.logical_and(ok, g < num_f)
        s = jnp.where(ok[None, :, :], s, -1e30)
        s = s.astype(_CACHE_DTYPE).astype(f32)  # match the fwd's rounding
        pj = jnp.exp(s - lse[..., None])
        dA = jax.lax.dot_general(
            go, vmat, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )
        dA = drop_abs(dA, g * HW + rb * Rfw - prow * fw)
        dP = _mix3(th_ref, dA, heads, transpose=True)
        return pj, dA, dP

    s_bos = jnp.sum(q * kbos, axis=-1)
    p_bos = jnp.exp(s_bos - lse)
    dA_bos = jnp.sum(go * vbos, axis=-1)
    dA_bos = drop_abs(dA_bos[..., None], -2)[..., 0]
    dp_bos = _mix2(th_ref, dA_bos, heads, transpose=True)
    rho = p_bos * dp_bos
    for j in range(Kf):
        kmat, vmat = fetch(j)
        pj, _, dP = tap_p_dp(j, kmat, vmat)
        rho = rho + jnp.sum(pj * dP, axis=-1)
    rho_ref[0] = rho

    ds_bos = p_bos * (dp_bos - rho)
    dq_acc = ds_bos[..., None] * kbos
    dth_acc = _pair_contract(dA_bos[:, None, :], p_bos[:, None, :], heads)
    dsb_acc = None
    dfb_rows = []
    for j in range(Kf):
        kmat, vmat = fetch(j)
        pj, dA, dP = tap_p_dp(j, kmat, vmat)
        dS = pj * (dP - rho[..., None])
        dq_acc = dq_acc + jax.lax.dot_general(
            dS, kmat, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
        )
        if rel_pos:
            dsb_acc = dS if dsb_acc is None else dsb_acc + dS
            cols = [jnp.sum(dS[hh]).reshape(1, 1) for hh in range(heads)]
            dfb_rows.append(jnp.concatenate(cols, axis=1))
        dth_acc = dth_acc + _pair_contract(dA, pj, heads)

    dq_ref[0] = dq_acc.astype(dq_ref.dtype)

    is_first = jnp.logical_and(
        jnp.logical_and(bi == 0, fi == 0), rb == 0
    )

    @pl.when(is_first)
    def _():
        dth_ref[...] = jnp.zeros(dth_ref.shape, dth_ref.dtype)
        dsb_ref[...] = jnp.zeros(dsb_ref.shape, dsb_ref.dtype)
        dfb_ref[...] = jnp.zeros(dfb_ref.shape, dfb_ref.dtype)

    dth_ref[...] += dth_acc
    if rel_pos:
        dsb_ref[...] += dsb_acc
        dfb_ref[...] += jnp.concatenate(dfb_rows, axis=0)

    @pl.when(jnp.logical_and(fi == 0, rb == 0))
    def _():
        dkbos_ref[...] = jnp.zeros(dkbos_ref.shape, dkbos_ref.dtype)
        dvbos_ref[...] = jnp.zeros(dvbos_ref.shape, dvbos_ref.dtype)

    dkbos_ref[0, :, 0, :] += _outer_hq_hqd(ds_bos, q).astype(dkbos_ref.dtype)
    a_bos = drop_abs(_mix2(th_ref, p_bos, heads)[..., None], -2)[..., 0]
    dvbos_ref[0, :, 0, :] += _outer_hq_hqd(a_bos, go).astype(dvbos_ref.dtype)


def _rb_bwd_kv_kernel(
    k_ref,        # (1, h, Rfw, d) — key row-block, unpadded layout
    v_ref,
    maskb_ref,    # (NB, Rfw, Rfw)
    sbiasb_ref,   # (NB, hb, Rfw, Rfw)
    fbias_ref,    # (h, Kf) SMEM
    th_ref,       # (h, h) SMEM
    seed_ref,     # (1,) SMEM — attention-dropout PRNG seed
    q_hbm, g_hbm, lse_hbm, rho_hbm,  # ANY
    dk_ref, dv_ref,
    qbuf, gbuf, lsebuf, rhobuf, dk_s, dv_s, sem,
    *,
    Kf: int,
    df: int,
    HW: int,
    R: int,
    fw: int,
    Rfw: int,
    RB: int,
    NB: int,
    heads: int,
    t_valid: int,
    num_f: int,
    causal_f: bool = True,
    nb_neg: int = 0,
    drop_rate: float = 0.0,
):
    bi = pl.program_id(0)
    gk = pl.program_id(1)
    rbk = pl.program_id(2)
    f32 = jnp.float32

    kmat = k_ref[0].astype(f32)
    vmat = v_ref[0].astype(f32)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, Rfw), 1)
    tok_ok = (gk * HW + rbk * Rfw + kidx) < t_valid
    keep = 1.0 - drop_rate
    k_abs = gk * HW + rbk * Rfw  # absolute id of this block's first key

    def drop_abs(x, q_base):
        if drop_rate <= 0.0:
            return x
        m = _keep_mask_abs(x.shape, keep, seed_ref[0], bi, q_base, k_abs)
        return jnp.where(m, x * (1.0 / keep), 0.0)

    dk_s[...] = jnp.zeros(dk_s.shape, dk_s.dtype)
    dv_s[...] = jnp.zeros(dv_s.shape, dv_s.dtype)

    for j in range(Kf):
        # the query frame whose tap j reads key frame gk
        fi = gk + j * df if causal_f else gk - (j - (Kf - 1) // 2) * df
        for rbq in range(NB):
            qb = rbk + rbq - nb_neg
            cond = jnp.logical_and(fi < num_f, qb < RB)
            cond = jnp.logical_and(cond, jnp.logical_and(fi >= 0, qb >= 0))

            @pl.when(cond)
            def _(j=j, rbq=rbq, fi=fi, qb=qb):
                start = fi * HW + qb * Rfw
                cps = [
                    pltpu.make_async_copy(
                        q_hbm.at[bi, :, pl.ds(start, Rfw), :], qbuf, sem.at[0]
                    ),
                    pltpu.make_async_copy(
                        g_hbm.at[bi, :, pl.ds(start, Rfw), :], gbuf, sem.at[1]
                    ),
                    pltpu.make_async_copy(
                        lse_hbm.at[bi, :, pl.ds(start, Rfw)], lsebuf, sem.at[2]
                    ),
                    pltpu.make_async_copy(
                        rho_hbm.at[bi, :, pl.ds(start, Rfw)], rhobuf, sem.at[3]
                    ),
                ]
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
                qm = qbuf[...].astype(f32)
                gm = gbuf[...].astype(f32)
                lse = lsebuf[...].astype(f32)
                rho = rhobuf[...].astype(f32)

                s = jax.lax.dot_general(
                    qm, kmat, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )
                s = s + maskb_ref[rbq][None]
                s = s + sbiasb_ref[rbq]
                s = jnp.stack(
                    [s[hh] + fbias_ref[hh, j] for hh in range(heads)], 0
                )
                s = jnp.where(tok_ok[None, :, :], s, -1e30)
                s = s.astype(_CACHE_DTYPE).astype(f32)
                pj = jnp.exp(s - lse[..., None])
                dA = jax.lax.dot_general(
                    gm, vmat, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )
                dA = drop_abs(dA, start)
                dP = _mix3(th_ref, dA, heads, transpose=True)
                dS = pj * (dP - rho[..., None])
                dk_s[...] += jax.lax.dot_general(
                    dS, qm, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )
                a_mixed = drop_abs(_mix3(th_ref, pj, heads), start)
                dv_s[...] += jax.lax.dot_general(
                    a_mixed, gm, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )

    dk_ref[0] = dk_s[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_s[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernels (flash-style: recompute scores from the saved lse)
# ---------------------------------------------------------------------------


def _bwd_q_kernel(
    q_ref,        # (1, h, HW, d) VMEM
    g_ref,        # (1, h, HW, d) VMEM — output cotangent of this frame
    lse_ref,      # (1, h, HW) VMEM
    kbos_ref,     # (1, h, 1, d)
    vbos_ref,     # (1, h, 1, d)
    cbias_ref,    # (Kf, hb, HW, HW) combined additive bias
    th_ref,       # (h, h) talking-heads weights
    seed_ref,     # (1,) SMEM — attention-dropout PRNG seed
    cmask_ref,    # (1, 1, Lc) VMEM — additive runtime key mask (cross path)
    k_hbm,        # (b, h, Tpad+pad, d) ANY (LB/RB padded)
    v_hbm,        # ANY
    dq_ref,       # (1, h, HW, d)
    rho_ref,      # (1, h, HW) — softmax dot-correction, consumed by kv kernel
    dkbos_ref,    # (1, h, 1, d) accumulated over frames
    dvbos_ref,    # (1, h, 1, d)
    dth_ref,      # (h, h) accumulated over all cells
    dcb_ref,      # (Kf, hb, HW, HW) accumulated combined-bias cotangent
    kbuf, vbuf, pjbuf, dpbuf, sem,
    *,
    Kf: int,
    df: int,
    LB: int,
    HW: int,
    heads: int,
    t_valid: int,
    causal_f: bool,
    rel_pos: bool,
    drop_rate: float = 0.0,
    fixed_taps: bool = False,
    has_cmask: bool = False,
    tap_offsets: tuple | None = None,
):
    bi = pl.program_id(0)
    fi = pl.program_id(1)
    f32 = jnp.float32
    keep = 1.0 - drop_rate

    def drop(j, x):
        """Re-apply the forward's dropout mask (d(M/keep ⊙ mix(P))/d(mix(P)))."""
        if drop_rate <= 0.0:
            return x
        m = _keep_mask(x.shape, keep, seed_ref[0], bi, fi, j)
        return jnp.where(m, x * (1.0 / keep), 0.0)

    q = q_ref[0].astype(f32)
    go = g_ref[0].astype(f32)
    lse = lse_ref[0].astype(f32)
    kbos = kbos_ref[0].astype(f32)  # (h, 1, d)
    vbos = vbos_ref[0].astype(f32)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, HW), 1)

    def tap_src_frame(j):
        if fixed_taps:  # cross attention: tap j IS context frame j, any fi
            return j
        if tap_offsets is not None:  # lane-packed: static irregular offsets
            return fi - tap_offsets[j]
        if causal_f:
            return fi - j * df
        return fi + (j - (Kf - 1) // 2) * df

    # prefetch all taps' K/V once; the DMA engine overlaps the copies with
    # the first matmuls
    cps = []
    for j in range(Kf):
        g = tap_src_frame(j)
        start = (g + LB) * HW
        cpk = pltpu.make_async_copy(
            k_hbm.at[bi, :, pl.ds(start, HW), :], kbuf.at[j], sem.at[j]
        )
        cpk.start()
        cpv = pltpu.make_async_copy(
            v_hbm.at[bi, :, pl.ds(start, HW), :], vbuf.at[j], sem.at[Kf + j]
        )
        cpv.start()
        cps.append((cpk, cpv))
    waited = [False] * Kf

    def fetch(j):
        if not waited[j]:
            cps[j][0].wait()
            cps[j][1].wait()
            waited[j] = True
        return kbuf[j].astype(f32), vbuf[j].astype(f32)

    # ---- bos pieces -----------------------------------------------------
    s_bos = jnp.sum(q * kbos, axis=-1)          # (h, HW)
    p_bos = jnp.exp(s_bos - lse)
    dA_bos = drop(0, jnp.sum(go * vbos, axis=-1))  # (h, HW) — masked cotangent
    dp_bos = _mix2(th_ref, dA_bos, heads, transpose=True)
    rho = p_bos * dp_bos
    dth_acc = _pair_contract(dA_bos[:, None, :], p_bos[:, None, :], heads)

    # ---- pass 1: recompute P/dP per tap ONCE, cache in VMEM scratch ------
    # rho needs every tap before dS can form; caching pj/dP (instead of a
    # second full recompute) drops one QK matmul, one attend matmul, the
    # exp and the second talking-heads mix per tap. dth needs only pass-1
    # quantities (dA x pj), so it accumulates here too.
    for j in range(Kf):
        g = tap_src_frame(j)
        kmat, vmat = fetch(j)
        s = jax.lax.dot_general(
            q, kmat, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )
        s = s + cbias_ref[0 if fixed_taps else j]
        if has_cmask:
            s = s + cmask_ref[0, :, j * HW : (j + 1) * HW][None]
        tok_ok = jnp.logical_and(g >= 0, (g * HW + col) < t_valid)
        s = jnp.where(tok_ok[None, :, :], s, -1e30)
        # round through the forward's cache dtype so P is consistent with lse
        s = s.astype(_CACHE_DTYPE).astype(f32)
        pj = jnp.exp(s - lse[..., None])  # zero where invalid
        dA = jax.lax.dot_general(
            go, vmat, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )  # (h, HWq, HWk)
        dA = drop(j + 1, dA)  # fold the dropout mask into the cotangent
        dP = _mix3(th_ref, dA, heads, transpose=True)
        rho = rho + jnp.sum(pj * dP, axis=-1)
        dth_acc = dth_acc + _pair_contract(dA, pj, heads)
        pjbuf[j] = pj
        dpbuf[j] = dP
    rho_ref[0] = rho

    # ---- pass 2: dq + bias grads from the cached tensors -----------------
    ds_bos = p_bos * (dp_bos - rho)             # (h, HW)
    dq_acc = ds_bos[..., None] * kbos           # (h, HW, d)
    dcb_taps = []
    for j in range(Kf):
        kmat, _ = fetch(j)
        dS = pjbuf[j] * (dpbuf[j] - rho[..., None])  # (h, HWq, HWk)
        dq_acc = dq_acc + jax.lax.dot_general(
            dS, kmat, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
        )
        if rel_pos:
            dcb_taps.append(dS)

    dq_ref[0] = dq_acc.astype(dq_ref.dtype)

    is_first = jnp.logical_and(bi == 0, fi == 0)

    @pl.when(is_first)
    def _():
        dth_ref[...] = jnp.zeros(dth_ref.shape, dth_ref.dtype)
        dcb_ref[...] = jnp.zeros(dcb_ref.shape, dcb_ref.dtype)

    dth_ref[...] += dth_acc
    if rel_pos:
        for j in range(Kf):
            if dcb_ref.shape[1] == heads:
                dcb_ref[j] += dcb_taps[j]
            else:  # hb == 1: head-summed bias layout
                dcb_ref[j] += jnp.sum(dcb_taps[j], axis=0, keepdims=True)

    @pl.when(fi == 0)
    def _():
        dkbos_ref[...] = jnp.zeros(dkbos_ref.shape, dkbos_ref.dtype)
        dvbos_ref[...] = jnp.zeros(dvbos_ref.shape, dvbos_ref.dtype)

    dkbos_ref[0, :, 0, :] += _outer_hq_hqd(ds_bos, q).astype(dkbos_ref.dtype)
    a_bos = drop(0, _mix2(th_ref, p_bos, heads))
    dvbos_ref[0, :, 0, :] += _outer_hq_hqd(a_bos, go).astype(dvbos_ref.dtype)


def _bwd_kv_kernel(
    k_ref,        # (1, h, HW, d) VMEM — key frame resident (unpadded layout)
    v_ref,        # (1, h, HW, d)
    cbias_ref,    # (Kf, hb, HW, HW) combined additive bias
    th_ref,       # (h, h) SMEM
    seed_ref,     # (1,) SMEM — attention-dropout PRNG seed
    cmask_ref,    # (1, 1, 1, HW) VMEM — this key frame's additive runtime
                  # mask
    q_hbm,        # (b, h, Tpad, d) ANY
    g_hbm,        # (b, h, Tpad, d) ANY — output cotangent
    lse_hbm,      # (b, h, Tpad) ANY
    rho_hbm,      # (b, h, Tpad) ANY
    dk_ref,       # (1, h, HW, d)
    dv_ref,       # (1, h, HW, d)
    qbuf, gbuf, lsebuf, rhobuf, dk_s, dv_s, sem,
    *,
    Kf: int,
    df: int,
    HW: int,
    heads: int,
    t_valid: int,
    causal_f: bool,
    num_f: int,
    drop_rate: float = 0.0,
    fixed_taps: bool = False,
    has_cmask: bool = False,
    tap_offsets: tuple | None = None,
):
    bi = pl.program_id(0)
    gk = pl.program_id(1)
    f32 = jnp.float32
    keep = 1.0 - drop_rate

    def drop(fi, j, x):
        if drop_rate <= 0.0:
            return x
        m = _keep_mask(x.shape, keep, seed_ref[0], bi, fi, j)
        return jnp.where(m, x * (1.0 / keep), 0.0)

    kmat = k_ref[0].astype(f32)
    vmat = v_ref[0].astype(f32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, HW), 1)
    tok_ok = (gk * HW + col) < t_valid  # key-token validity (gk is real)

    dk_s[...] = jnp.zeros(dk_s.shape, dk_s.dtype)
    dv_s[...] = jnp.zeros(dv_s.shape, dv_s.dtype)

    # double-buffered rounds: round r lands in slot r % 2 so round r+1's
    # DMAs overlap round r's matmuls instead of a serial start->wait chain
    def round_cps(fi, slot):
        start = fi * HW
        return [
            pltpu.make_async_copy(
                q_hbm.at[bi, :, pl.ds(start, HW), :], qbuf.at[slot],
                sem.at[4 * slot + 0],
            ),
            pltpu.make_async_copy(
                g_hbm.at[bi, :, pl.ds(start, HW), :], gbuf.at[slot],
                sem.at[4 * slot + 1],
            ),
            pltpu.make_async_copy(
                lse_hbm.at[bi, :, pl.ds(start, HW)], lsebuf.at[slot],
                sem.at[4 * slot + 2],
            ),
            pltpu.make_async_copy(
                rho_hbm.at[bi, :, pl.ds(start, HW)], rhobuf.at[slot],
                sem.at[4 * slot + 3],
            ),
        ]

    def accum(fi, j, cps, slot):
            for cp in cps:
                cp.wait()
            qm = qbuf[slot].astype(f32)
            gm = gbuf[slot].astype(f32)
            lse = lsebuf[slot].astype(f32)
            rho = rhobuf[slot].astype(f32)

            s = jax.lax.dot_general(
                qm, kmat, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )
            s = s + cbias_ref[0 if fixed_taps else j]
            if has_cmask:
                s = s + cmask_ref[0, 0][None]
            s = jnp.where(tok_ok[None, :, :], s, -1e30)
            s = s.astype(_CACHE_DTYPE).astype(f32)
            pj = jnp.exp(s - lse[..., None])
            dA = jax.lax.dot_general(
                gm, vmat, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )
            # regenerate query-block (fi)'s tap-j dropout mask
            dA = drop(fi, j + 1, dA)
            dP = _mix3(th_ref, dA, heads, transpose=True)
            dS = pj * (dP - rho[..., None])
            # dK[gk] += dS^T q_fi ; dV[gk] += (M ⊙ mix(P))^T g_fi
            dk_s[...] += jax.lax.dot_general(
                dS, qm, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )
            a_mixed = drop(fi, j + 1, _mix3(th_ref, pj, heads))
            dv_s[...] += jax.lax.dot_general(
                a_mixed, gm, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )

    if fixed_taps:
        # cross attention: EVERY query frame reads this key (context) frame
        # with the one shared bias tap (dropout is gated off on this path)
        rounds = [(fi, 0, None) for fi in range(num_f)]
    else:
        rounds = []
        for j in range(Kf):
            # query frame whose tap j reads key frame gk
            if tap_offsets is not None:
                fi = gk + tap_offsets[j]
            elif causal_f:
                fi = gk + j * df
            else:
                fi = gk - (j - (Kf - 1) // 2) * df
            rounds.append((fi, j, jnp.logical_and(fi >= 0, fi < num_f)))

    cps_list = [round_cps(fi, r % 2) for r, (fi, _, _) in enumerate(rounds)]

    def guarded(cond, fn):
        if cond is None:
            fn()
        else:
            pl.when(cond)(fn)

    def start_round(r):
        def go():
            for cp in cps_list[r]:
                cp.start()

        return go

    if rounds:
        guarded(rounds[0][2], start_round(0))
    for r, (fi, j, cond) in enumerate(rounds):
        if r + 1 < len(rounds):
            guarded(rounds[r + 1][2], start_round(r + 1))

        def compute(fi=fi, j=j, r=r):
            accum(fi, j, cps_list[r], r % 2)

        guarded(cond, compute)

    dk_ref[0] = dk_s[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_s[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------


def _geometry(mod, num_frames, d_orig):
    fdim, fh, fw = mod.video_shape
    HW = fh * fw
    kf, kh, kw = mod.kernel
    df, dh, dw = mod.dilations
    # Mosaic DMA slices need a 128-aligned lane (minor) dim — zero-pad the
    # head dim (zeros contribute nothing to QK^T; sliced off at the output)
    d = ((d_orig + 127) // 128) * 128
    LB = (kf - 1) * df if mod.causal else ((kf - 1) // 2) * df
    RB = 0 if mod.causal else ((kf - 1) // 2) * df
    return dict(
        fh=fh, fw=fw, HW=HW, kf=kf, kh=kh, kw=kw, df=df, dh=dh, dw=dw,
        d=d, LB=LB, RB=RB, F=num_frames,
    )


def _pad_d(arrs, d_orig, d):
    if d == d_orig:
        return arrs
    padd = ((0, 0), (0, 0), (0, 0), (0, d - d_orig))
    return [jnp.pad(a, padd) for a in arrs]


def _axial_tables(mod, p, heads):
    """(fbias (h, Kf), hw_tab (Kh*Kw, h)) from the axial rel-pos params.

    Shared by the whole-frame and row-blocked bias builders so the causal
    tap enumeration (fbias reversal) lives in exactly one place."""
    kf, kh, kw = mod.kernel
    axials = list(p["rel_pos_bias"]["axials"])
    comp = dict(zip(sizes_index(mod.kernel), axials))
    f_tab, h_tab, w_tab = comp.get(0), comp.get(1), comp.get(2)
    if f_tab is not None:
        fb = jnp.transpose(f_tab)  # (h, kf)
        # tap j=0 is the own frame (offset 0) == last kernel index in the
        # causal enumeration, hence the reversal
        fbias = fb[:, ::-1] if mod.causal else fb
    else:
        fbias = jnp.zeros((heads, kf), jnp.float32)
    hw_tab = jnp.zeros((kh, kw, heads), jnp.float32)
    if h_tab is not None:
        hw_tab = hw_tab + h_tab[:, None, :]
    if w_tab is not None:
        hw_tab = hw_tab + w_tab[None, :, :]
    return fbias, hw_tab.reshape(kh * kw, heads)


def _combined_bias(mod, p, heads):
    """Differentiable combined (Kf, hb, HW, HW) additive bias + th_w.

    Precombines the static -inf spatial mask, the axial spatial bias and the
    per-tap temporal bias into ONE tensor so each kernel tap-pass does a
    single add (was: mask add + sbias add + per-head fbias stack). Axial
    parameter grads chain through this construction from the kernel's dcb
    cotangent."""
    fh, fw = mod.video_shape[1], mod.video_shape[2]
    kf, kh, kw = mod.kernel
    df, dh, dw = mod.dilations
    HW = fh * fw
    mask_np, selector_np = _spatial_mask_and_selector(
        fh, fw, kh, kw, dh, dw, mod.causal
    )
    maskf = jnp.asarray(np.where(mask_np, 0.0, -np.inf), jnp.float32)
    h = heads

    if mod.rel_pos_bias:
        fbias, hw_tab = _axial_tables(mod, p, h)  # (h, kf), (kh*kw, h)
        # scatter per-tap spatial bias into the (HW, HW) layout via a static
        # one-hot selector: sbias[h,q,k] = sum_t selector[q,k,t] * hw_tab[t,h]
        sbias = jnp.einsum(
            "qkt,th->hqk", jnp.asarray(selector_np, jnp.float32), hw_tab
        )
        cbias = (
            maskf[None, None]
            + sbias[None]
            + jnp.transpose(fbias)[:, :, None, None]  # (kf, h, 1, 1)
        )
    else:
        cbias = jnp.broadcast_to(maskf[None, None], (kf, 1, HW, HW))

    th_w = p["talking_heads"].astype(jnp.float32)
    return cbias, th_w


def _fwd_call(mod, geo, t, q, k_bos, v_bos, cbias, th_w, kpad, vpad,
              seed=None, drop_rate=0.0, fixed_taps=False, cmask=None,
              tap_offsets=None):
    b, h = q.shape[0], q.shape[1]
    HW, d, kf = geo["HW"], geo["d"], geo["kf"]
    F = geo["F"]
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    has_cmask = cmask is not None
    if cmask is None:
        cmask = jnp.zeros((b, 1, 128), jnp.float32)
    kernel = functools.partial(
        _kernel,
        Kf=kf, df=geo["df"], LB=geo["LB"], HW=HW, heads=h, dim_head=d,
        t_valid=t, causal_f=False if fixed_taps else mod.causal,
        drop_rate=drop_rate, fixed_taps=fixed_taps, has_cmask=has_cmask,
        tap_offsets=tap_offsets,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, F),
        in_specs=[
            pl.BlockSpec((1, h, HW, d), lambda bi, fi: (bi, 0, fi, 0),
                         memory_space=pltpu.VMEM),                      # q
            pl.BlockSpec((1, h, 1, d), lambda bi, fi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),                      # k_bos
            pl.BlockSpec((1, h, 1, d), lambda bi, fi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),                      # v_bos
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # cbias
            _th_spec(h),                      # talking heads
            pl.BlockSpec(memory_space=pltpu.SMEM),                      # seed
            pl.BlockSpec((1, 1, cmask.shape[2]), lambda bi, fi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),                      # cmask
            pl.BlockSpec(memory_space=pl.ANY),                       # k (HBM)
            pl.BlockSpec(memory_space=pl.ANY),                       # v (HBM)
        ],
        out_specs=(
            pl.BlockSpec((1, h, HW, d), lambda bi, fi: (bi, 0, fi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, HW), lambda bi, fi: (bi, 0, fi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, F * HW, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, F * HW), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((kf, h, HW, d), q.dtype),        # kbuf, one slot per tap
            pltpu.VMEM((kf, h, HW, d), q.dtype),        # vbuf
            pltpu.VMEM((kf, h, HW, HW), _CACHE_DTYPE),  # p_buf
            pltpu.VMEM((h, HW), jnp.float32),           # m_buf
            pltpu.VMEM((h, HW, d), jnp.float32),        # acc
            pltpu.SemaphoreType.DMA((2 * kf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k_bos, v_bos, cbias, th_w, seed, cmask, kpad, vpad)
    return out, lse


def _bwd_q_call(mod, geo, t, q, gout, lse, k_bos, v_bos, cbias, th_w,
                kpad, vpad, seed=None, drop_rate=0.0, fixed_taps=False,
                cmask=None, tap_offsets=None):
    b, h = q.shape[0], q.shape[1]
    HW, d, kf = geo["HW"], geo["d"], geo["kf"]
    F = geo["F"]
    hb = cbias.shape[1]
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    has_cmask = cmask is not None
    if cmask is None:
        cmask = jnp.zeros((b, 1, 128), jnp.float32)
    kernel = functools.partial(
        _bwd_q_kernel,
        Kf=kf, df=geo["df"], LB=geo["LB"], HW=HW, heads=h,
        t_valid=t, causal_f=False if fixed_taps else mod.causal,
        rel_pos=getattr(mod, "rel_pos_bias", False),
        drop_rate=drop_rate, fixed_taps=fixed_taps, has_cmask=has_cmask,
        tap_offsets=tap_offsets,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, F),
        in_specs=[
            pl.BlockSpec((1, h, HW, d), lambda bi, fi: (bi, 0, fi, 0),
                         memory_space=pltpu.VMEM),                      # q
            pl.BlockSpec((1, h, HW, d), lambda bi, fi: (bi, 0, fi, 0),
                         memory_space=pltpu.VMEM),                      # gout
            pl.BlockSpec((1, h, HW), lambda bi, fi: (bi, 0, fi),
                         memory_space=pltpu.VMEM),                      # lse
            pl.BlockSpec((1, h, 1, d), lambda bi, fi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),                      # k_bos
            pl.BlockSpec((1, h, 1, d), lambda bi, fi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),                      # v_bos
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # cbias
            _th_spec(h),                      # th
            pl.BlockSpec(memory_space=pltpu.SMEM),                      # seed
            pl.BlockSpec((1, 1, cmask.shape[2]), lambda bi, fi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),                      # cmask
            pl.BlockSpec(memory_space=pl.ANY),                       # kpad
            pl.BlockSpec(memory_space=pl.ANY),                       # vpad
        ],
        out_specs=(
            pl.BlockSpec((1, h, HW, d), lambda bi, fi: (bi, 0, fi, 0),
                         memory_space=pltpu.VMEM),                      # dq
            pl.BlockSpec((1, h, HW), lambda bi, fi: (bi, 0, fi),
                         memory_space=pltpu.VMEM),                      # rho
            pl.BlockSpec((1, h, 1, d), lambda bi, fi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),                      # dk_bos
            pl.BlockSpec((1, h, 1, d), lambda bi, fi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),                      # dv_bos
            pl.BlockSpec((h, h), lambda bi, fi: (0, 0),
                         memory_space=pltpu.VMEM),                      # dth
            pl.BlockSpec((cbias.shape[0], hb, HW, HW),
                         lambda bi, fi: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),                      # dcbias
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, F * HW, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, F * HW), jnp.float32),
            jax.ShapeDtypeStruct((b, h, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
            jax.ShapeDtypeStruct((cbias.shape[0], hb, HW, HW), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((kf, h, HW, d), q.dtype),        # kbuf, one slot per tap
            pltpu.VMEM((kf, h, HW, d), q.dtype),        # vbuf
            pltpu.VMEM((kf, h, HW, HW), jnp.float32),   # pjbuf (pass-1 cache)
            pltpu.VMEM((kf, h, HW, HW), jnp.float32),   # dpbuf
            pltpu.SemaphoreType.DMA((2 * kf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(q, gout, lse, k_bos, v_bos, cbias, th_w, seed, cmask, kpad, vpad)


def _bwd_kv_call(mod, geo, t, q, gout, lse, rho, k, v, cbias, th_w,
                 seed=None, drop_rate=0.0, fixed_taps=False, cmask=None,
                 tap_offsets=None):
    b, h = q.shape[0], q.shape[1]
    HW, d, kf = geo["HW"], geo["d"], geo["kf"]
    F = geo["F"]
    Fk = geo.get("Fk", F)  # key frames (context frames under fixed taps)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    has_cmask = cmask is not None
    if cmask is None:
        cmask = jnp.zeros((b, Fk, 1, HW), jnp.float32)
    kernel = functools.partial(
        _bwd_kv_kernel,
        Kf=kf, df=geo["df"], HW=HW, heads=h,
        t_valid=t, causal_f=False if fixed_taps else mod.causal, num_f=F,
        drop_rate=drop_rate, fixed_taps=fixed_taps, has_cmask=has_cmask,
        tap_offsets=tap_offsets,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, Fk),
        in_specs=[
            pl.BlockSpec((1, h, HW, d), lambda bi, gk: (bi, 0, gk, 0),
                         memory_space=pltpu.VMEM),                      # k
            pl.BlockSpec((1, h, HW, d), lambda bi, gk: (bi, 0, gk, 0),
                         memory_space=pltpu.VMEM),                      # v
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # cbias
            _th_spec(h),                      # th
            pl.BlockSpec(memory_space=pltpu.SMEM),                      # seed
            pl.BlockSpec((1, 1, 1, HW), lambda bi, gk: (bi, gk, 0, 0),
                         memory_space=pltpu.VMEM),                      # cmask
            pl.BlockSpec(memory_space=pl.ANY),                       # q
            pl.BlockSpec(memory_space=pl.ANY),                       # gout
            pl.BlockSpec(memory_space=pl.ANY),                       # lse
            pl.BlockSpec(memory_space=pl.ANY),                       # rho
        ],
        out_specs=(
            pl.BlockSpec((1, h, HW, d), lambda bi, gk: (bi, 0, gk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, HW, d), lambda bi, gk: (bi, 0, gk, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, Fk * HW, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, Fk * HW, d), q.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, h, HW, d), q.dtype),         # qbuf (double-buffered)
            pltpu.VMEM((2, h, HW, d), q.dtype),         # gbuf
            pltpu.VMEM((2, h, HW), jnp.float32),        # lsebuf
            pltpu.VMEM((2, h, HW), jnp.float32),        # rhobuf
            pltpu.VMEM((h, HW, d), jnp.float32),        # dk accumulator
            pltpu.VMEM((h, HW, d), jnp.float32),        # dv accumulator
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(k, v, cbias, th_w, seed, cmask, q, gout, lse, rho)


def _pad_frames(geo, k, v):
    HW, LB, RB = geo["HW"], geo["LB"], geo["RB"]
    kpad = jnp.pad(k, ((0, 0), (0, 0), (LB * HW, RB * HW), (0, 0)))
    vpad = jnp.pad(v, ((0, 0), (0, 0), (LB * HW, RB * HW), (0, 0)))
    return kpad, vpad


def rb_row_block(mod):
    """Row-block size for the row-blocked kernel: the largest divisor of the
    fmap height whose query block stays <= 256 tokens. None = unsupported.
    A ``row_block`` field on the module forces that size (validated)."""
    fh, fw = mod.video_shape[1], mod.video_shape[2]
    if fw > 256:
        return None
    forced = getattr(mod, "row_block", None)
    if forced is not None:
        assert fh % forced == 0, (
            f"row_block={forced} must divide fmap height {fh}"
        )
        return forced
    for R in range(max(1, 256 // fw), 0, -1):
        if fh % R == 0:
            return R
    return None


def _rb_geometry(mod, num_frames, d_orig):
    geo = _geometry(mod, num_frames, d_orig)
    R = rb_row_block(mod)
    assert R is not None
    kh, dh_ = geo["kh"], geo["dh"]
    reach = (kh - 1) * dh_
    # causal: all padding above; centered: split (kh odd => reach even)
    prow = reach if mod.causal else reach // 2
    brow = 0 if mod.causal else reach - reach // 2
    geo.update(
        R=R, prow=prow, brow=brow, W=R + reach, RBf=geo["RB"],
        RB=geo["fh"] // R,
        HWp=(geo["fh"] + reach) * geo["fw"],
        Rfw=R * geo["fw"], Wfw=(R + reach) * geo["fw"],
    )
    return geo


def _rb_pad_frames(geo, k, v):
    """LB front (+ RBf trailing, centered) frames; prow/brow zero rows at
    the top/bottom of every frame."""
    b, h, T, d = k.shape
    F, fh, fw = geo["F"], geo["fh"], geo["fw"]
    prow, brow = geo["prow"], geo.get("brow", 0)
    RBf = geo.get("RBf", 0)

    def pad_one(x):
        x = x.reshape(b, h, F, fh, fw, d)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (prow, brow), (0, 0), (0, 0)))
        x = x.reshape(b, h, F * geo["HWp"], d)
        return jnp.pad(
            x,
            ((0, 0), (0, 0), (geo["LB"] * geo["HWp"], RBf * geo["HWp"]), (0, 0)),
        )

    return pad_one(k), pad_one(v)


def _rb_bias_tensors(mod, p, heads, geo):
    """Relative-window mask + sbias for the row-blocked kernel."""
    kf, kh, kw = mod.kernel
    df, dh_, dw = mod.dilations
    mask_np, selector_np = _rb_mask_and_selector(
        geo["fw"], kh, kw, dh_, dw, geo["R"], geo["W"], geo["prow"],
        mod.causal,
    )
    maskf = jnp.asarray(np.where(mask_np, 0.0, -np.inf), jnp.float32)
    h = heads
    if mod.rel_pos_bias:
        fbias, hw_tab = _axial_tables(mod, p, h)
        sbias = jnp.einsum(
            "qkt,th->hqk", jnp.asarray(selector_np, jnp.float32), hw_tab
        )
    else:
        fbias = jnp.zeros((h, kf), jnp.float32)
        sbias = jnp.zeros((1, geo["Rfw"], geo["Wfw"]), jnp.float32)
    th_w = p["talking_heads"].astype(jnp.float32)
    return maskf, sbias, fbias, th_w


def _rb_fwd_call(mod, geo, t, q, k_bos, v_bos, maskf, sbias, fbias, th_w,
                 kpad, vpad, seed=None, drop_rate=0.0):
    b, h = q.shape[0], q.shape[1]
    d, kf, F = geo["d"], geo["kf"], geo["F"]
    Rfw, Wfw, RB = geo["Rfw"], geo["Wfw"], geo["RB"]
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    kernel = functools.partial(
        _rb_kernel,
        Kf=kf, df=geo["df"], LB=geo["LB"], HW=geo["HW"], HWp=geo["HWp"],
        R=geo["R"], fw=geo["fw"], prow=geo["prow"], Rfw=Rfw, Wfw=Wfw,
        heads=h, t_valid=t, causal_f=mod.causal, fh=geo["fh"], num_f=F,
        drop_rate=drop_rate,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, F, RB),
        in_specs=[
            pl.BlockSpec((1, h, Rfw, d),
                         lambda bi, fi, rb: (bi, 0, fi * RB + rb, 0),
                         memory_space=pltpu.VMEM),                      # q
            pl.BlockSpec((1, h, 1, d), lambda bi, fi, rb: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),                      # k_bos
            pl.BlockSpec((1, h, 1, d), lambda bi, fi, rb: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),                      # v_bos
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),                      # sbias
            pl.BlockSpec(memory_space=pltpu.SMEM),                      # fbias
            _th_spec(h),                      # th
            pl.BlockSpec(memory_space=pltpu.SMEM),                      # seed
            pl.BlockSpec(memory_space=pl.ANY),                       # kpad
            pl.BlockSpec(memory_space=pl.ANY),                       # vpad
        ],
        out_specs=(
            pl.BlockSpec((1, h, Rfw, d),
                         lambda bi, fi, rb: (bi, 0, fi * RB + rb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, Rfw),
                         lambda bi, fi, rb: (bi, 0, fi * RB + rb),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, F * geo["HW"], d), q.dtype),
            jax.ShapeDtypeStruct((b, h, F * geo["HW"]), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((kf, h, Wfw, d), q.dtype),       # kbuf, one slot per tap
            pltpu.VMEM((kf, h, Wfw, d), q.dtype),       # vbuf
            pltpu.VMEM((h, Rfw, d), jnp.float32),       # acc
            pltpu.SemaphoreType.DMA((2 * kf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k_bos, v_bos, maskf, sbias, fbias, th_w, seed, kpad, vpad)
    return out, lse


def sparse_3dna_pallas(mod, p, q, k, v, k_bos, v_bos, num_frames, t):
    """Forward-only entry (inference path of ``Sparse3DNA.__call__``).

    q, k, v: (b, h, F*HW, d) video tokens (bos stripped, padded to full
    frames). Returns (b, h, t, d). HW <= 256 runs the whole-frame kernel;
    larger (causal) fmaps run the row-blocked kernel.
    """
    b, h, t_pad, d_orig = q.shape
    assert t_pad == num_frames * mod.video_shape[1] * mod.video_shape[2]
    geo = _geometry(mod, num_frames, d_orig)

    if geo["HW"] <= 256 and getattr(mod, "row_block", None) is None:
        q, k, v, k_bos, v_bos = _pad_d([q, k, v, k_bos, v_bos], d_orig, geo["d"])
        kpad, vpad = _pad_frames(geo, k, v)
        cbias, th_w = _combined_bias(mod, p, h)
        out, _ = _fwd_call(
            mod, geo, t, q, k_bos, v_bos, cbias, th_w, kpad, vpad
        )
        return out[:, :, :t, :d_orig]

    assert rb_row_block(mod) is not None, (
        "row-blocked pallas 3DNA needs fmap width <= 256"
    )
    geo = _rb_geometry(mod, num_frames, d_orig)
    q, k, v, k_bos, v_bos = _pad_d([q, k, v, k_bos, v_bos], d_orig, geo["d"])
    kpad, vpad = _rb_pad_frames(geo, k, v)
    maskf, sbias, fbias, th_w = _rb_bias_tensors(mod, p, h, geo)
    out, _ = _rb_fwd_call(
        mod, geo, t, q, k_bos, v_bos, maskf, sbias, fbias, th_w, kpad, vpad
    )
    return out[:, :, :t, :d_orig]


def sizes_index(kernel):
    """Indices (axis ids) of kernel axes with size > 1, in order."""
    return [i for i, s in enumerate(kernel) if s > 1]


def _rb_bwd_q_call(mod, geo, t, q, gout, lse, k_bos, v_bos, maskf, sbias,
                   fbias, th_w, kpad, vpad, seed=None, drop_rate=0.0):
    b, h = q.shape[0], q.shape[1]
    d, kf, F = geo["d"], geo["kf"], geo["F"]
    Rfw, Wfw, RB = geo["Rfw"], geo["Wfw"], geo["RB"]
    hb = sbias.shape[0]
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    kernel = functools.partial(
        _rb_bwd_q_kernel,
        Kf=kf, df=geo["df"], LB=geo["LB"], HW=geo["HW"], HWp=geo["HWp"],
        R=geo["R"], fw=geo["fw"], prow=geo["prow"], Rfw=Rfw, Wfw=Wfw,
        heads=h, t_valid=t, rel_pos=mod.rel_pos_bias, causal_f=mod.causal,
        fh=geo["fh"], num_f=F, drop_rate=drop_rate,
    )
    qb_ix = lambda bi, fi, rb: (bi, 0, fi * RB + rb, 0)
    l_ix = lambda bi, fi, rb: (bi, 0, fi * RB + rb)
    return pl.pallas_call(
        kernel,
        grid=(b, F, RB),
        in_specs=[
            pl.BlockSpec((1, h, Rfw, d), qb_ix, memory_space=pltpu.VMEM),   # q
            pl.BlockSpec((1, h, Rfw, d), qb_ix, memory_space=pltpu.VMEM),   # gout
            pl.BlockSpec((1, h, Rfw), l_ix, memory_space=pltpu.VMEM),       # lse
            pl.BlockSpec((1, h, 1, d), lambda bi, fi, rb: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),                          # k_bos
            pl.BlockSpec((1, h, 1, d), lambda bi, fi, rb: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),                          # v_bos
            pl.BlockSpec(memory_space=pltpu.VMEM),                          # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),                          # sbias
            pl.BlockSpec(memory_space=pltpu.SMEM),                          # fbias
            _th_spec(h),                                                    # th
            pl.BlockSpec(memory_space=pltpu.SMEM),                          # seed
            pl.BlockSpec(memory_space=pl.ANY),                           # kpad
            pl.BlockSpec(memory_space=pl.ANY),                           # vpad
        ],
        out_specs=(
            pl.BlockSpec((1, h, Rfw, d), qb_ix, memory_space=pltpu.VMEM),   # dq
            pl.BlockSpec((1, h, Rfw), l_ix, memory_space=pltpu.VMEM),       # rho
            pl.BlockSpec((1, h, 1, d), lambda bi, fi, rb: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),                          # dk_bos
            pl.BlockSpec((1, h, 1, d), lambda bi, fi, rb: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),                          # dv_bos
            pl.BlockSpec((h, h), lambda bi, fi, rb: (0, 0),
                         memory_space=pltpu.VMEM),                          # dth
            pl.BlockSpec((hb, Rfw, Wfw), lambda bi, fi, rb: (0, 0, 0),
                         memory_space=pltpu.VMEM),                          # dsbias
            pl.BlockSpec((kf, h), lambda bi, fi, rb: (0, 0),
                         memory_space=pltpu.VMEM),                          # dfbias
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, F * geo["HW"], d), q.dtype),
            jax.ShapeDtypeStruct((b, h, F * geo["HW"]), jnp.float32),
            jax.ShapeDtypeStruct((b, h, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
            jax.ShapeDtypeStruct((hb, Rfw, Wfw), jnp.float32),
            jax.ShapeDtypeStruct((kf, h), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((kf, h, Wfw, d), q.dtype),
            pltpu.VMEM((kf, h, Wfw, d), q.dtype),
            pltpu.SemaphoreType.DMA((2 * kf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # 118 MiB: the audio row-blocked shape (Rfw 640, Wfw 660, H=5)
            # peaks at ~110 MiB of stack temporaries in this kernel — v5e
            # has 128 MiB of VMEM and the default 100 MiB cap is not a
            # hardware bound
            vmem_limit_bytes=118 * 1024 * 1024,
        ),
    )(q, gout, lse, k_bos, v_bos, maskf, sbias, fbias, th_w, seed, kpad, vpad)


def _rb_bwd_kv_call(mod, geo, t, q, gout, lse, rho, k, v, maskb, sbiasb,
                    fbias, th_w, seed=None, drop_rate=0.0):
    b, h = q.shape[0], q.shape[1]
    d, kf, F = geo["d"], geo["kf"], geo["F"]
    Rfw, RB, NB = geo["Rfw"], geo["RB"], geo["NB"]
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    kernel = functools.partial(
        _rb_bwd_kv_kernel,
        Kf=kf, df=geo["df"], HW=geo["HW"], R=geo["R"], fw=geo["fw"],
        Rfw=Rfw, RB=RB, NB=NB, heads=h, t_valid=t, num_f=F,
        causal_f=mod.causal, nb_neg=geo.get("nb_neg", 0),
        drop_rate=drop_rate,
    )
    kb_ix = lambda bi, gk, rbk: (bi, 0, gk * RB + rbk, 0)
    return pl.pallas_call(
        kernel,
        grid=(b, F, RB),
        in_specs=[
            pl.BlockSpec((1, h, Rfw, d), kb_ix, memory_space=pltpu.VMEM),   # k
            pl.BlockSpec((1, h, Rfw, d), kb_ix, memory_space=pltpu.VMEM),   # v
            pl.BlockSpec(memory_space=pltpu.VMEM),                          # maskb
            pl.BlockSpec(memory_space=pltpu.VMEM),                          # sbiasb
            pl.BlockSpec(memory_space=pltpu.SMEM),                          # fbias
            _th_spec(h),                                                    # th
            pl.BlockSpec(memory_space=pltpu.SMEM),                          # seed
            pl.BlockSpec(memory_space=pl.ANY),                           # q
            pl.BlockSpec(memory_space=pl.ANY),                           # gout
            pl.BlockSpec(memory_space=pl.ANY),                           # lse
            pl.BlockSpec(memory_space=pl.ANY),                           # rho
        ],
        out_specs=(
            pl.BlockSpec((1, h, Rfw, d), kb_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, Rfw, d), kb_ix, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, F * geo["HW"], d), q.dtype),
            jax.ShapeDtypeStruct((b, h, F * geo["HW"], d), q.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((h, Rfw, d), q.dtype),           # qbuf
            pltpu.VMEM((h, Rfw, d), q.dtype),           # gbuf
            pltpu.VMEM((h, Rfw), jnp.float32),          # lsebuf
            pltpu.VMEM((h, Rfw), jnp.float32),          # rhobuf
            pltpu.VMEM((h, Rfw, d), jnp.float32),       # dk accumulator
            pltpu.VMEM((h, Rfw, d), jnp.float32),       # dv accumulator
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(k, v, maskb, sbiasb, fbias, th_w, seed, q, gout, lse, rho)


def _rb_bwd_bias_tensors(mod, geo):
    """Additive key-block masks + spatial bias for the kv backward kernel."""
    kf, kh, kw = mod.kernel
    df, dh_, dw = mod.dilations
    R = geo["R"]
    brow = geo.get("brow", 0)
    nb_neg = (brow + R - 1) // R
    NB = nb_neg + (R - 1 + geo["prow"]) // R + 1
    mask_np, sel_np = _rb_bwd_mask_and_selector(
        geo["fw"], kh, kw, dh_, dw, R, NB, nb_neg, mod.causal
    )
    maskb = jnp.asarray(np.where(mask_np, 0.0, -np.inf), jnp.float32)
    return maskb, jnp.asarray(sel_np, jnp.float32), NB, nb_neg


def _rb_core_op(mod, num_frames, t, drop_rate=0.0):
    """custom_vjp core for the row-blocked (HW > 256) kernels."""

    def run_fwd(q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed):
        geo = _rb_geometry(mod, num_frames, q.shape[-1])
        maskf = _rb_static_mask(mod, geo)
        kpad, vpad = _rb_pad_frames(geo, k, v)
        return _rb_fwd_call(
            mod, geo, t, q, k_bos, v_bos, maskf, sbias, fbias, th_w, kpad,
            vpad, seed=seed, drop_rate=drop_rate,
        )

    @jax.custom_vjp
    def core(q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed):
        return run_fwd(q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed)[0]

    def core_fwd(q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed):
        out, lse = run_fwd(q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed)
        return out, (q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed, lse)

    def core_bwd(res, gout):
        q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed, lse = res
        geo = _rb_geometry(mod, num_frames, q.shape[-1])
        maskf = _rb_static_mask(mod, geo)
        kpad, vpad = _rb_pad_frames(geo, k, v)
        gout = gout.astype(q.dtype)
        dq, rho, dkbos, dvbos, dth, dsb, dfb = _rb_bwd_q_call(
            mod, geo, t, q, gout, lse, k_bos, v_bos, maskf, sbias, fbias,
            th_w, kpad, vpad, seed=seed, drop_rate=drop_rate,
        )
        maskb, sel_b, NB, nb_neg = _rb_bwd_bias_tensors(mod, geo)
        geo["NB"] = NB
        geo["nb_neg"] = nb_neg
        if mod.rel_pos_bias:
            # per-block spatial bias in key-block coordinates, from the same
            # axial tables the fwd sbias uses (non-differentiable here: the
            # parameter cotangent flows through dsb from the q-side kernel)
            hw_tab = _rb_hw_tab(mod, geo, sbias)
            sbiasb = jnp.einsum("nqkt,th->nhqk", sel_b, hw_tab)
        else:
            sbiasb = jnp.zeros(
                (NB, 1, geo["Rfw"], geo["Rfw"]), jnp.float32
            )
        dk, dv = _rb_bwd_kv_call(
            mod, geo, t, q, gout, lse, rho, k, v, maskb,
            jax.lax.stop_gradient(sbiasb), fbias, th_w,
            seed=seed, drop_rate=drop_rate,
        )
        return (
            dq,
            dk,
            dv,
            dkbos.astype(k_bos.dtype),
            dvbos.astype(v_bos.dtype),
            dsb.astype(sbias.dtype),
            jnp.transpose(dfb).astype(fbias.dtype),
            dth.astype(th_w.dtype),
            np.zeros((1,), dtype=jax.dtypes.float0),
        )

    core.defvjp(core_fwd, core_bwd)
    return core


def _rb_static_mask(mod, geo):
    kf, kh, kw = mod.kernel
    df, dh_, dw = mod.dilations
    mask_np, _ = _rb_mask_and_selector(
        geo["fw"], kh, kw, dh_, dw, geo["R"], geo["W"], geo["prow"],
        mod.causal,
    )
    return jnp.asarray(np.where(mask_np, 0.0, -np.inf), jnp.float32)


def _recover_tab(sbias, sel_np):
    """(taps, h) bias table recovered from a scattered q-side ``sbias`` via
    its one-hot forward selector (every tap's value is constant across its
    scatter positions). Used only to evaluate kv-side scores — parameter
    cotangents flow via the q-side dsb. Shared by the video and audio
    row-blocked backwards so the recovery convention stays single-sourced."""
    counts = np.maximum(sel_np.sum((0, 1)), 1.0)  # (taps,)
    tab = jnp.einsum("hqk,qkt->th", sbias, jnp.asarray(sel_np))
    return tab / jnp.asarray(counts, jnp.float32)[:, None]


def _rb_hw_tab(mod, geo, sbias):
    """(kh*kw, h) spatial bias table for the video row-blocked kv backward
    (see ``_recover_tab``)."""
    kf, kh, kw = mod.kernel
    df, dh_, dw = mod.dilations
    _, sel_np = _rb_mask_and_selector(
        geo["fw"], kh, kw, dh_, dw, geo["R"], geo["W"], geo["prow"],
        mod.causal,
    )
    return _recover_tab(sbias, sel_np)


# ---------------------------------------------------------------------------
# differentiable op: pallas forward + true pallas backward (flash-style)
# ---------------------------------------------------------------------------

_VJP_CACHE = {}


def packed_frames(mod):
    """Lane-packing factor P for small frames (HW < 128).

    TPU vector lanes come in 128s: a whole-frame kernel at HW=64 (the
    driver's fmap-8 headline config) would waste half of every lane tile and
    its (1, h, HW) lse output block violates the Mosaic lane rule outright.
    Packing P = 128 // HW consecutive frames into one 128-lane "super-frame"
    makes the packed problem *exactly* a whole-frame problem again: tap
    validity between packed positions depends only on (super-tap J, p, p'),
    so it folds into a static per-super-tap additive bias (``_packed_bias``)
    and the existing fwd/bwd kernels run unchanged apart from the static
    tap-offset list. Causal only (the centered user — the sketch encoder —
    runs at fmap >= 16). None = not applicable."""
    HW = mod.video_shape[1] * mod.video_shape[2]
    if HW >= 128 or 128 % HW != 0 or not mod.causal:
        return None
    if getattr(mod, "row_block", None) is not None:
        return None
    return 128 // HW


def _packed_taps(Kf, df, P):
    """Super-tap offsets + per-super-tap (p, p') -> j block maps.

    A query token in sub-frame p of super-frame FI and a key token in
    sub-frame p' of super-frame FI - J are (J*P + p - p') real frames apart;
    that pair is a real tap iff the distance is j*df for some j < Kf. A
    super-tap J is emitted only when at least one (p, p') block is valid —
    e.g. Kf=5, df=4, P=2 keeps J ∈ {0, 2, 4, 6, 8} (diagonal blocks only),
    not the dense range."""
    offsets, block_maps = [], []
    for J in range(((Kf - 1) * df + P - 1) // P + 1):
        bm = {}
        for pq in range(P):
            for pk in range(P):
                rel = J * P + pq - pk
                if rel >= 0 and rel % df == 0 and rel // df < Kf:
                    bm[(pq, pk)] = rel // df
        if bm:
            offsets.append(J)
            block_maps.append(bm)
    return tuple(offsets), block_maps


def _packed_bias(cbias, block_maps, P, HW):
    """Differentiable packed bias (nJ, hb, P*HW, P*HW) from the per-tap
    (Kf, hb, HW, HW) combined bias; invalid (p, p') blocks are -1e30. Axial
    rel-pos parameter grads chain through this concat/stack construction."""
    hb = cbias.shape[1]
    neg = jnp.full((hb, HW, HW), -1e30, cbias.dtype)
    packed = []
    for bm in block_maps:
        rows = []
        for pq in range(P):
            cols = [
                cbias[bm[(pq, pk)]] if (pq, pk) in bm else neg
                for pk in range(P)
            ]
            rows.append(jnp.concatenate(cols, axis=-1))
        packed.append(jnp.concatenate(rows, axis=-2))
    return jnp.stack(packed)


def _packed_core_op(mod, Fp, t, taps, HWp, drop_rate=0.0):
    """custom_vjp core over P-packed super-frames: the plain whole-frame
    kernels with super geometry (HW'=P*HW, F'=ceil(F/P)) and the static
    irregular tap offsets. Identical save/recompute structure to _core_op."""

    def geo(d_orig):
        d = ((d_orig + 127) // 128) * 128
        return dict(HW=HWp, d=d, kf=len(taps), F=Fp, df=1,
                    LB=taps[-1], RB=0)

    def run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, seed):
        g = geo(q.shape[-1])
        kpad, vpad = _pad_frames(g, k, v)
        return _fwd_call(
            mod, g, t, q, k_bos, v_bos, cbias, th_w, kpad, vpad,
            seed=seed, drop_rate=drop_rate, tap_offsets=taps,
        )

    @jax.custom_vjp
    def core(q, k, v, k_bos, v_bos, cbias, th_w, seed):
        return run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, seed)[0]

    def core_fwd(q, k, v, k_bos, v_bos, cbias, th_w, seed):
        out, lse = run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, seed)
        return out, (q, k, v, k_bos, v_bos, cbias, th_w, seed, lse)

    def core_bwd(res, gout):
        q, k, v, k_bos, v_bos, cbias, th_w, seed, lse = res
        g = geo(q.shape[-1])
        kpad, vpad = _pad_frames(g, k, v)
        gout = gout.astype(q.dtype)
        dq, rho, dkbos, dvbos, dth, dcb = _bwd_q_call(
            mod, g, t, q, gout, lse, k_bos, v_bos, cbias, th_w, kpad, vpad,
            seed=seed, drop_rate=drop_rate, tap_offsets=taps,
        )
        dk, dv = _bwd_kv_call(
            mod, g, t, q, gout, lse, rho, k, v, cbias, th_w,
            seed=seed, drop_rate=drop_rate, tap_offsets=taps,
        )
        dseed = np.zeros((1,), dtype=jax.dtypes.float0)
        return (
            dq,
            dk,
            dv,
            dkbos.astype(k_bos.dtype),
            dvbos.astype(v_bos.dtype),
            dcb.astype(cbias.dtype),
            dth.astype(th_w.dtype),
            dseed,
        )

    core.defvjp(core_fwd, core_bwd)
    return core


def _core_op(mod, num_frames, t, drop_rate=0.0):
    """custom_vjp core over tensors only (the combined bias is precomputed
    outside so autodiff chains parameter grads through ``_combined_bias``).

    ``seed`` drives in-kernel attention dropout (ignored when the static
    ``drop_rate`` is 0); its cotangent is float0."""
    def run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, seed):
        g = _geometry(mod, num_frames, q.shape[-1])
        kpad, vpad = _pad_frames(g, k, v)
        return _fwd_call(
            mod, g, t, q, k_bos, v_bos, cbias, th_w, kpad, vpad,
            seed=seed, drop_rate=drop_rate,
        )

    @jax.custom_vjp
    def core(q, k, v, k_bos, v_bos, cbias, th_w, seed):
        return run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, seed)[0]

    def core_fwd(q, k, v, k_bos, v_bos, cbias, th_w, seed):
        out, lse = run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, seed)
        return out, (q, k, v, k_bos, v_bos, cbias, th_w, seed, lse)

    def core_bwd(res, gout):
        q, k, v, k_bos, v_bos, cbias, th_w, seed, lse = res
        g = _geometry(mod, num_frames, q.shape[-1])
        kpad, vpad = _pad_frames(g, k, v)
        gout = gout.astype(q.dtype)
        dq, rho, dkbos, dvbos, dth, dcb = _bwd_q_call(
            mod, g, t, q, gout, lse, k_bos, v_bos, cbias, th_w, kpad, vpad,
            seed=seed, drop_rate=drop_rate,
        )
        dk, dv = _bwd_kv_call(
            mod, g, t, q, gout, lse, rho, k, v, cbias, th_w,
            seed=seed, drop_rate=drop_rate,
        )
        dseed = np.zeros((1,), dtype=jax.dtypes.float0)
        return (
            dq,
            dk,
            dv,
            dkbos.astype(k_bos.dtype),
            dvbos.astype(v_bos.dtype),
            dcb.astype(cbias.dtype),
            dth.astype(th_w.dtype),
            dseed,
        )

    core.defvjp(core_fwd, core_bwd)
    return core


def sparse_3dna_pallas_vjp(mod, num_frames: int, t: int):
    """Return a differentiable op ``f(p_sub, q, k, v, k_bos, v_bos)``.

    Forward runs the fused Pallas kernel (saving only the per-row logsumexp);
    the backward runs two Pallas kernels that recompute scores flash-style —
    dq/bias/talking-heads/bos grads query-side, dk/dv key-side — so the
    probability tensor never hits HBM. Parameter grads (axial rel-pos tables,
    talking-heads) chain through the differentiable bias construction.
    """
    cache_key = (mod, num_frames, t)
    if cache_key in _VJP_CACHE:
        return _VJP_CACHE[cache_key]

    HW = mod.video_shape[1] * mod.video_shape[2]
    P = packed_frames(mod)
    if P is not None:
        # lane-packed small frames (HW < 128): P frames per 128-lane
        # super-frame, same kernels, packed bias (see packed_frames)
        taps, block_maps = _packed_taps(mod.kernel[0], mod.dilations[0], P)
        Fp = -(-num_frames // P)
        HWp = P * HW
        core = _packed_core_op(mod, Fp, t, taps, HWp, drop_rate=mod.dropout)
        core_nodrop = (
            _packed_core_op(mod, Fp, t, taps, HWp, drop_rate=0.0)
            if mod.dropout
            else core
        )

        def op_packed(p_sub, q, k, v, k_bos, v_bos, seed=None):
            d_orig = q.shape[-1]
            d = ((d_orig + 127) // 128) * 128
            cbias, th_w = _combined_bias(mod, p_sub, mod.heads)
            cbias = _packed_bias(cbias, block_maps, P, HW)
            q, k, v, k_bos, v_bos = _pad_d(
                [q, k, v, k_bos, v_bos], d_orig, d
            )
            extra = Fp * HWp - q.shape[2]
            if extra:  # pad the tail to whole super-frames (t_valid masks)
                pr = ((0, 0), (0, 0), (0, extra), (0, 0))
                q, k, v = jnp.pad(q, pr), jnp.pad(k, pr), jnp.pad(v, pr)
            if seed is None:  # inference: no dropout
                out = core_nodrop(
                    q, k, v, k_bos, v_bos, cbias, th_w,
                    jnp.zeros((1,), jnp.int32),
                )
            else:
                out = core(q, k, v, k_bos, v_bos, cbias, th_w, seed)
            return out[:, :, :t, :d_orig]

        _VJP_CACHE[cache_key] = op_packed
        return op_packed

    if HW > 256 or getattr(mod, "row_block", None) is not None:
        # row-blocked kernels (causal or centered): true flash backward too;
        # dropout uses absolute-coordinate masks (see _keep_mask_abs)
        core = _rb_core_op(mod, num_frames, t, drop_rate=mod.dropout)
        core_nodrop = (
            _rb_core_op(mod, num_frames, t, drop_rate=0.0)
            if mod.dropout
            else core
        )

        def op_rb(p_sub, q, k, v, k_bos, v_bos, seed=None):
            d_orig = q.shape[-1]
            geo = _rb_geometry(mod, num_frames, d_orig)
            _, sbias, fbias, th_w = _rb_bias_tensors(mod, p_sub, mod.heads, geo)
            q, k, v, k_bos, v_bos = _pad_d(
                [q, k, v, k_bos, v_bos], d_orig, geo["d"]
            )
            if seed is None:  # inference: no dropout
                out = core_nodrop(
                    q, k, v, k_bos, v_bos, sbias, fbias, th_w,
                    jnp.zeros((1,), jnp.int32),
                )
            else:
                out = core(q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed)
            return out[:, :, :t, :d_orig]

        _VJP_CACHE[cache_key] = op_rb
        return op_rb

    core = _core_op(mod, num_frames, t, drop_rate=mod.dropout)
    core_nodrop = (
        _core_op(mod, num_frames, t, drop_rate=0.0) if mod.dropout else core
    )

    def op(p_sub, q, k, v, k_bos, v_bos, seed=None):
        d_orig = q.shape[-1]
        geo = _geometry(mod, num_frames, d_orig)
        cbias, th_w = _combined_bias(mod, p_sub, mod.heads)
        q, k, v, k_bos, v_bos = _pad_d(
            [q, k, v, k_bos, v_bos], d_orig, geo["d"]
        )
        if seed is None:  # inference: no dropout regardless of mod.dropout
            out = core_nodrop(
                q, k, v, k_bos, v_bos, cbias, th_w, jnp.zeros((1,), jnp.int32)
            )
        else:
            out = core(q, k, v, k_bos, v_bos, cbias, th_w, seed)
        return out[:, :, :t, :d_orig]

    _VJP_CACHE[cache_key] = op
    return op


# ---------------------------------------------------------------------------
# SparseCausal2DNA (audio) on the whole-frame kernel family
#
# The audio grid is (timesteps, height): a query attends every token of the
# K dilated past timesteps (full height — reference nuwa_pytorch.py:615-759).
# G consecutive timesteps are grouped into one "pseudo-frame" of HW = G·H
# tokens (G chosen so HW is lane-aligned), and the timestep-causal /
# full-within-timestep structure becomes a *per-tap* static mask: tap j
# (pseudo-frame fi-j) contributes keys whose timestep lag (j·G + qts - kts)
# lands on the dilated kernel {0, dt, …, (K-1)·dt}. The same three kernels
# (fwd, bwd-q, bwd-kv) run with the per-tap combined bias; the axial bias
# scatters through a per-tap selector so parameter grads chain through the
# differentiable bias construction exactly like 3DNA.
# ---------------------------------------------------------------------------


def _audio_geometry(mod, t: int, d_orig: int):
    import math

    H, K, dt = mod.height, mod.kernel_size, mod.dilation
    m = H // math.gcd(H, 128)
    HW = 128 * m
    G = HW // H
    kf = -(-((K - 1) * dt) // G) + 1
    T = -(-t // H)  # timesteps
    F = -(-T // G)  # pseudo-frames
    d = ((d_orig + 127) // 128) * 128
    return dict(
        HW=HW, G=G, H=H, kf=kf, df=1, d=d, LB=kf - 1, RB=0, F=F,
    )


@functools.lru_cache(maxsize=None)
def _audio_masks_np(H, G, K, dt, kf):
    """Per-tap (kf, HW, HW) allowed mask + (kf, HW, HW, K*H) bias selector.

    Selector tap index = b*H + key-col with b the kernel's time index
    (b = K-1 is the own timestep), matching the flattened
    AxialPositionalEmbedding((K, H)) table of the XLA gather path."""
    HW = G * H
    mask = np.zeros((kf, HW, HW), dtype=bool)
    sel = np.zeros((kf, HW, HW, K * H), dtype=np.float32)
    for j in range(kf):
        for qts in range(G):
            for kts in range(G):
                delta = j * G + qts - kts  # timesteps back
                if delta < 0 or delta % dt or delta // dt >= K:
                    continue
                b = K - 1 - delta // dt
                for kc in range(H):
                    q0 = qts * H
                    k0 = kts * H
                    mask[j, q0 : q0 + H, k0 + kc] = True
                    sel[j, q0 : q0 + H, k0 + kc, b * H + kc] = 1.0
    return mask, sel


def _audio_combined_bias(mod, p, heads, geo):
    """Differentiable combined (kf, hb, HW, HW) bias for the audio layout."""
    kf, HW = geo["kf"], geo["HW"]
    mask_np, sel_np = _audio_masks_np(
        geo["H"], geo["G"], mod.kernel_size, mod.dilation, kf
    )
    maskf = jnp.asarray(np.where(mask_np, 0.0, -np.inf), jnp.float32)
    if mod.rel_pos_bias:
        table = mod.bias_module(p["rel_pos_bias"])  # (K*H, heads)
        sbias = jnp.einsum(
            "jqkt,th->jhqk", jnp.asarray(sel_np, jnp.float32), table
        )
        cbias = maskf[:, None] + sbias
    else:
        cbias = maskf[:, None]
    th_w = p["talking_heads"].astype(jnp.float32)
    return cbias, th_w


def _audio_core_op(mod, t: int, drop_rate=0.0):
    def run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, seed):
        g = _audio_geometry(mod, t, q.shape[-1])
        kpad, vpad = _pad_frames(g, k, v)
        return _fwd_call(
            mod, g, t, q, k_bos, v_bos, cbias, th_w, kpad, vpad,
            seed=seed, drop_rate=drop_rate,
        )

    @jax.custom_vjp
    def core(q, k, v, k_bos, v_bos, cbias, th_w, seed):
        return run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, seed)[0]

    def core_fwd(q, k, v, k_bos, v_bos, cbias, th_w, seed):
        out, lse = run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, seed)
        return out, (q, k, v, k_bos, v_bos, cbias, th_w, seed, lse)

    def core_bwd(res, gout):
        q, k, v, k_bos, v_bos, cbias, th_w, seed, lse = res
        g = _audio_geometry(mod, t, q.shape[-1])
        kpad, vpad = _pad_frames(g, k, v)
        gout = gout.astype(q.dtype)
        dq, rho, dkbos, dvbos, dth, dcb = _bwd_q_call(
            mod, g, t, q, gout, lse, k_bos, v_bos, cbias, th_w, kpad, vpad,
            seed=seed, drop_rate=drop_rate,
        )
        dk, dv = _bwd_kv_call(
            mod, g, t, q, gout, lse, rho, k, v, cbias, th_w,
            seed=seed, drop_rate=drop_rate,
        )
        return (
            dq,
            dk,
            dv,
            dkbos.astype(k_bos.dtype),
            dvbos.astype(v_bos.dtype),
            dcb.astype(cbias.dtype),
            dth.astype(th_w.dtype),
            np.zeros((1,), dtype=jax.dtypes.float0),
        )

    core.defvjp(core_fwd, core_bwd)
    return core


def sparse_2dna_pallas_vjp(mod, t: int):
    """Differentiable audio-2DNA op ``f(p_sub, q, k, v, k_bos, v_bos)``.

    q: (b, h, t, d) pre-scaled queries; k/v may carry timestep-alignment
    padding (sliced/re-padded to whole pseudo-frames here). Heights whose
    pseudo-frame (lcm(H, 128)) fits in 256 tokens run the whole-frame
    kernels with per-tap masks; larger heights (3, 5, 6, …) run the
    row-blocked kernel family with timestep-row windows (VERDICT r3 #5 —
    these used to fall back to the 6.4x-slower gather)."""
    cache_key = ("audio", mod, t)
    if cache_key in _VJP_CACHE:
        return _VJP_CACHE[cache_key]

    # lcm(H, 128) > 1024 (audio_rb_row_block None) keeps the whole-frame
    # path below — slower, but the historical behavior for a forced
    # use_pallas rather than an assert deep in the rb geometry
    if _audio_geometry(mod, t, 1)["HW"] > 256 and audio_rb_row_block(mod):
        op = _audio_rb_make_op(mod, t)
        _VJP_CACHE[cache_key] = op
        return op

    core = _audio_core_op(mod, t, drop_rate=mod.dropout)
    core_nodrop = _audio_core_op(mod, t, drop_rate=0.0) if mod.dropout else core

    def op(p_sub, q, k, v, k_bos, v_bos, seed=None):
        d_orig = q.shape[-1]
        geo = _audio_geometry(mod, t, d_orig)
        total = geo["F"] * geo["HW"]
        cbias, th_w = _audio_combined_bias(mod, p_sub, mod.heads, geo)

        def tok_pad(a):
            n = a.shape[2]
            if n < total:
                return jnp.pad(a, ((0, 0), (0, 0), (0, total - n), (0, 0)))
            return a[:, :, :total]

        q, k, v = tok_pad(q), tok_pad(k), tok_pad(v)
        q, k, v, k_bos, v_bos = _pad_d([q, k, v, k_bos, v_bos], d_orig, geo["d"])
        if seed is None:  # inference: no dropout
            out = core_nodrop(
                q, k, v, k_bos, v_bos, cbias, th_w, jnp.zeros((1,), jnp.int32)
            )
        else:
            out = core(q, k, v, k_bos, v_bos, cbias, th_w, seed)
        return out[:, :, :t, :d_orig]

    _VJP_CACHE[cache_key] = op
    return op


# ---------------------------------------------------------------------------
# SparseCausal2DNA (audio) on the row-blocked kernel family
#
# For heights whose pseudo-frame lcm(H, 128) exceeds 256 tokens (3 -> 384,
# 5 -> 640, …) the whole-frame grouping does ~HW/(K·H) x overcompute AND
# larger VMEM score buffers. The row-blocked kernels fit naturally instead:
# a timestep IS a key row (width H), the whole audio strip is ONE frame of
# T timestep-rows, and a query block of R timesteps reads a key window of
# R + (K-1)·dilation rows — exactly the 3DNA row-blocked data movement. The
# generic _rb_* kernels are mask-agnostic; only the static masks encode the
# audio semantics (causal over timesteps on the dilated lattice, full over
# height — reference nuwa_pytorch.py:615-759).
# ---------------------------------------------------------------------------


def audio_rb_row_block(mod):
    """Minimal lane-aligned timestep block (R·H % 128 == 0), or None when
    the resulting query block would be too large for VMEM (Rfw > 1024)."""
    import math

    H = mod.height
    R = 128 // math.gcd(H, 128)
    return R if R * H <= 1024 else None


def _audio_rb_geometry(mod, t: int, d_orig: int):
    H, K, dt = mod.height, mod.kernel_size, mod.dilation
    R = audio_rb_row_block(mod)
    assert R is not None
    reach = (K - 1) * dt
    T = -(-t // H)             # timesteps
    T_pad = -(-T // R) * R     # whole row-blocks
    d = ((d_orig + 127) // 128) * 128
    W = R + reach
    return dict(
        # one "frame" = the whole audio strip of T_pad timestep-rows
        HW=T_pad * H, HWp=(T_pad + reach) * H, F=1, fh=T_pad, fw=H,
        kf=1, df=1, LB=0, RBf=0, d=d,
        R=R, prow=reach, brow=0, W=W, RB=T_pad // R,
        Rfw=R * H, Wfw=W * H, H=H,
    )


@functools.lru_cache(maxsize=None)
def _audio_rb_masks_np(H, K, dt, R, W, prow):
    """Forward-side relative (R·H, W·H) mask + (.., K·H) bias selector:
    query timestep qr (window row prow+qr) attends key timesteps at lags
    {0, dt, …, (K-1)·dt}, every height position. Selector tap index
    b·H + key-col with b = K-1 the own timestep (matches the flattened
    AxialPositionalEmbedding((K, H)) table and the gather path)."""
    Rfw, Wfw = R * H, W * H
    mask = np.zeros((Rfw, Wfw), dtype=bool)
    sel = np.zeros((Rfw, Wfw, K * H), dtype=np.float32)
    for qr in range(R):
        for j in range(K):
            wr = prow + qr - j * dt
            if wr < 0 or wr >= W:
                continue
            b = K - 1 - j
            for kc in range(H):
                ki = wr * H + kc
                mask[qr * H : (qr + 1) * H, ki] = True
                sel[qr * H : (qr + 1) * H, ki, b * H + kc] = 1.0
    return mask, sel


@functools.lru_cache(maxsize=None)
def _audio_rb_bwd_masks_np(H, K, dt, R, NB):
    """Key-block-vs-query-block masks for the kv backward: for key block
    rows [rk0, rk0+R) the contributing query blocks start at rk0 + rbq·R;
    key row kl hears query row ql of block rbq iff the timestep lag
    rbq·R + ql - kl lands on the dilated kernel."""
    Rfw = R * H
    mask = np.zeros((NB, Rfw, Rfw), dtype=bool)
    sel = np.zeros((NB, Rfw, Rfw, K * H), dtype=np.float32)
    for rbq in range(NB):
        for ql in range(R):
            for j in range(K):
                kl = rbq * R + ql - j * dt
                if kl < 0 or kl >= R:
                    continue
                b = K - 1 - j
                for kc in range(H):
                    ki = kl * H + kc
                    mask[rbq, ql * H : (ql + 1) * H, ki] = True
                    sel[rbq, ql * H : (ql + 1) * H, ki, b * H + kc] = 1.0
    return mask, sel


def _audio_rb_tensors(mod, p_sub, heads, geo):
    """Differentiable sbias (+ zero fbias, th) for the audio rb path. The
    additive maskf is NOT built here — the core op rebuilds it internally
    (``geo_and_mask``)."""
    _, sel_np = _audio_rb_masks_np(
        geo["H"], mod.kernel_size, mod.dilation, geo["R"], geo["W"],
        geo["prow"],
    )
    if mod.rel_pos_bias:
        table = mod.bias_module(p_sub["rel_pos_bias"])  # (K*H, heads)
        sbias = jnp.einsum(
            "qkt,th->hqk", jnp.asarray(sel_np, jnp.float32), table
        )
    else:
        sbias = jnp.zeros((1, geo["Rfw"], geo["Wfw"]), jnp.float32)
    fbias = jnp.zeros((heads, 1), jnp.float32)
    th_w = p_sub["talking_heads"].astype(jnp.float32)
    return sbias, fbias, th_w


def _audio_rb_core_op(mod, t: int, drop_rate=0.0):
    """custom_vjp core on the generic row-blocked kernels with audio masks.
    Signature mirrors ``_rb_core_op`` (sbias/fbias enter as differentiable
    inputs so the axial-bias parameter grad chains through the einsum)."""

    def geo_and_mask(d_orig):
        geo = _audio_rb_geometry(mod, t, d_orig)
        mask_np, _ = _audio_rb_masks_np(
            geo["H"], mod.kernel_size, mod.dilation, geo["R"], geo["W"],
            geo["prow"],
        )
        maskf = jnp.asarray(np.where(mask_np, 0.0, -np.inf), jnp.float32)
        return geo, maskf

    def run_fwd(q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed):
        geo, maskf = geo_and_mask(q.shape[-1])
        kpad, vpad = _rb_pad_frames(geo, k, v)
        return _rb_fwd_call(
            mod, geo, t, q, k_bos, v_bos, maskf, sbias, fbias, th_w, kpad,
            vpad, seed=seed, drop_rate=drop_rate,
        )

    @jax.custom_vjp
    def core(q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed):
        return run_fwd(q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed)[0]

    def core_fwd(q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed):
        out, lse = run_fwd(q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed)
        return out, (q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed, lse)

    def core_bwd(res, gout):
        q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed, lse = res
        geo, maskf = geo_and_mask(q.shape[-1])
        kpad, vpad = _rb_pad_frames(geo, k, v)
        gout = gout.astype(q.dtype)
        dq, rho, dkbos, dvbos, dth, dsb, dfb = _rb_bwd_q_call(
            mod, geo, t, q, gout, lse, k_bos, v_bos, maskf, sbias, fbias,
            th_w, kpad, vpad, seed=seed, drop_rate=drop_rate,
        )
        R, prow = geo["R"], geo["prow"]
        NB = (R - 1 + prow) // R + 1
        maskb_np, selb_np = _audio_rb_bwd_masks_np(
            geo["H"], mod.kernel_size, mod.dilation, R, NB
        )
        maskb = jnp.asarray(np.where(maskb_np, 0.0, -np.inf), jnp.float32)
        geo["NB"] = NB
        geo["nb_neg"] = 0
        if mod.rel_pos_bias:
            # recover the (K·H, heads) table from the q-side sbias
            # (see _recover_tab); parameter cotangent flows through dsb
            _, sel_np = _audio_rb_masks_np(
                geo["H"], mod.kernel_size, mod.dilation, R, geo["W"],
                prow,
            )
            tab = _recover_tab(sbias, sel_np)
            sbiasb = jnp.einsum(
                "nqkt,th->nhqk", jnp.asarray(selb_np, jnp.float32), tab
            )
        else:
            sbiasb = jnp.zeros((NB, 1, geo["Rfw"], geo["Rfw"]), jnp.float32)
        dk, dv = _rb_bwd_kv_call(
            mod, geo, t, q, gout, lse, rho, k, v, maskb,
            jax.lax.stop_gradient(sbiasb), fbias, th_w,
            seed=seed, drop_rate=drop_rate,
        )
        return (
            dq,
            dk,
            dv,
            dkbos.astype(k_bos.dtype),
            dvbos.astype(v_bos.dtype),
            dsb.astype(sbias.dtype),
            jnp.transpose(dfb).astype(fbias.dtype),
            dth.astype(th_w.dtype),
            np.zeros((1,), dtype=jax.dtypes.float0),
        )

    core.defvjp(core_fwd, core_bwd)
    return core


def _audio_rb_make_op(mod, t: int):
    """Row-blocked audio op with the same call surface as the whole-frame
    ``sparse_2dna_pallas_vjp`` op."""
    core = _audio_rb_core_op(mod, t, drop_rate=mod.dropout)
    core_nodrop = (
        _audio_rb_core_op(mod, t, drop_rate=0.0) if mod.dropout else core
    )

    def op(p_sub, q, k, v, k_bos, v_bos, seed=None):
        d_orig = q.shape[-1]
        geo = _audio_rb_geometry(mod, t, d_orig)
        total = geo["HW"]
        sbias, fbias, th_w = _audio_rb_tensors(mod, p_sub, mod.heads, geo)

        def tok_pad(a):
            n = a.shape[2]
            if n < total:
                return jnp.pad(a, ((0, 0), (0, 0), (0, total - n), (0, 0)))
            return a[:, :, :total]

        q, k, v = tok_pad(q), tok_pad(k), tok_pad(v)
        q, k, v, k_bos, v_bos = _pad_d([q, k, v, k_bos, v_bos], d_orig, geo["d"])
        if seed is None:  # inference: no dropout
            out = core_nodrop(
                q, k, v, k_bos, v_bos, sbias, fbias, th_w,
                jnp.zeros((1,), jnp.int32),
            )
        else:
            out = core(q, k, v, k_bos, v_bos, sbias, fbias, th_w, seed)
        return out[:, :, :t, :d_orig]

    return op


def sparse_3dna_pallas_vjp_remat(mod, num_frames: int, t: int):
    """Legacy differentiable wrapper: pallas forward, XLA-gather backward
    (rematerialization). Kept for A/B comparison against the true backward."""
    cache_key = ("remat", mod, num_frames, t)
    if cache_key in _VJP_CACHE:
        return _VJP_CACHE[cache_key]

    from ..nda import (
        _dense_tap_attend_chunked,
        _nda_attend,
        build_nda_indices,
        gather_neighbors,
    )

    F, fh, fw = mod.video_shape
    HW = fh * fw

    if HW > 256 and mod.causal:
        # remat via the row-chunked dense XLA path (gather materializes
        # (t, Kn, d) neighbor tensors — prohibitive at these fmaps)
        R = rb_row_block(mod)

        def reference(p_sub, q, k, v, k_bos, v_bos):
            axials = (
                p_sub["rel_pos_bias"]["axials"] if mod.rel_pos_bias else None
            )
            return _dense_tap_attend_chunked(
                mod, q, k, v, k_bos, v_bos, num_frames, t, axials,
                p_sub["talking_heads"], R,
            )
    else:
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


# ---------------------------------------------------------------------------
# SparseCross2DNA (video queries -> sketch context) on the whole-frame family
#
# Cross attention differs from the self NDAs in one structural way: every
# query frame attends the SAME per-frame context neighborhoods (reference
# nuwa_pytorch.py:761-901). The whole-frame kernels run in ``fixed_taps``
# mode — tap j IS context frame j regardless of the query-frame grid index,
# with one shared centered spatial-mask bias tap. The context is small
# enough to sit in VMEM whole, so the fused score/softmax/mix/PV pass
# replaces the XLA gather path's per-op overhead chain (measured ~3.6 ms
# fwd at b=8 fmap 16 for ~0.2 GFLOP of useful work).
# ---------------------------------------------------------------------------


def _cross_geometry(mod, t: int, Lc: int, d_orig: int):
    HW = mod.image_size * mod.image_size
    Fc = Lc // HW
    F = -(-t // HW)  # query frames (padded to whole frames)
    d = ((d_orig + 127) // 128) * 128
    return dict(HW=HW, kf=Fc, df=1, LB=0, RB=0, F=F, Fk=Fc, d=d)


@functools.lru_cache(maxsize=None)
def _cross_mask_np(fmap, kernel_size, dilation):
    mask_np, _ = _spatial_mask_and_selector(
        fmap, fmap, kernel_size, kernel_size, dilation, dilation, False
    )
    return np.where(mask_np, 0.0, -np.inf).astype(np.float32)


def _cross_core_op(mod, t: int, Lc: int):
    def run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, cmask):
        g = _cross_geometry(mod, t, Lc, q.shape[-1])
        return _fwd_call(
            mod, g, Lc, q, k_bos, v_bos, cbias, th_w, k, v,
            fixed_taps=True, cmask=cmask[:, None],
        )

    @jax.custom_vjp
    def core(q, k, v, k_bos, v_bos, cbias, th_w, cmask):
        return run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, cmask)[0]

    def core_fwd(q, k, v, k_bos, v_bos, cbias, th_w, cmask):
        out, lse = run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, cmask)
        return out, (q, k, v, k_bos, v_bos, cbias, th_w, cmask, lse)

    def core_bwd(res, gout):
        q, k, v, k_bos, v_bos, cbias, th_w, cmask, lse = res
        g = _cross_geometry(mod, t, Lc, q.shape[-1])
        gout = gout.astype(q.dtype)
        dq, rho, dkbos, dvbos, dth, dcb = _bwd_q_call(
            mod, g, Lc, q, gout, lse, k_bos, v_bos, cbias, th_w, k, v,
            fixed_taps=True, cmask=cmask[:, None],
        )
        dk, dv = _bwd_kv_call(
            mod, g, Lc, q, gout, lse, rho, k, v, cbias, th_w,
            fixed_taps=True,
            cmask=cmask.reshape(cmask.shape[0], g["Fk"], 1, g["HW"]),
        )
        return (
            dq,
            dk,
            dv,
            dkbos.astype(k_bos.dtype),
            dvbos.astype(v_bos.dtype),
            dcb.astype(cbias.dtype),
            dth.astype(th_w.dtype),
            jnp.zeros_like(cmask),  # boolean-derived, non-differentiable
        )

    core.defvjp(core_fwd, core_bwd)
    return core


# ---------------------------------------------------------------------------
# SparseCross2DNA, fused single-block kernels
#
# The per-frame cross kernels above are launch-bound: grid (b, F) blocks
# each do tiny (HW, d) x (d, HW) dots and re-DMA the same Fc context frames
# F times. But every query frame attends the SAME context, so the whole
# query sequence can ride ONE grid step per batch element: q enters as
# (1, h, F·HW, d), the context sits in VMEM whole, each tap is a single
# (F·HW, d) x (d, HW) MXU dot, and the spatial mask tiles down the query-
# frame axis. The backward fuses both halves (dq/rho and dk/dv) in one
# kernel — dk_j/dv_j are single (HW, F·HW) x (F·HW, d) dots instead of the
# old serial per-query-frame DMA loop. In-kernel dropout uses the absolute-
# coordinate stateless masks (VERDICT r3 #2).
# ---------------------------------------------------------------------------


def _xfused_kernel(
    q_ref,        # (1, h, Tq, d) VMEM — all query frames, pre-scaled
    kbos_ref,     # (1, h, 1, d)
    vbos_ref,     # (1, h, 1, d)
    cbias_ref,    # (1, 1, HW, HW) VMEM — shared centered spatial mask
    th_ref,       # talking heads
    seed_ref,     # (1,) SMEM
    cmask_ref,    # (1, 1, Lc) VMEM additive runtime key mask
    k_ref,        # (1, h, Lc, d) VMEM — whole context
    v_ref,        # (1, h, Lc, d) VMEM
    out_ref,      # (1, h, Tq, d)
    lse_ref,      # (1, h, Tq)
    p_buf, m_buf, acc,
    *,
    Fc: int,
    F: int,
    HW: int,
    heads: int,
    dim_head: int,
    drop_rate: float = 0.0,
):
    bi = pl.program_id(0)
    f32 = jnp.float32
    keep = 1.0 - drop_rate

    def drop_abs(x, k_base):
        if drop_rate <= 0.0:
            return x
        m = _keep_mask_abs(x.shape, keep, seed_ref[0], bi, 0, k_base)
        return jnp.where(m, x * (1.0 / keep), 0.0)

    q = q_ref[0].astype(f32)                       # (h, Tq, d)
    bias = cbias_ref[0, 0].astype(f32)             # (HW, HW)
    bias_t = jnp.concatenate([bias] * F, axis=0)   # (Tq, HW) — static tile

    def tap_scores(j):
        kmat = k_ref[0][:, j * HW : (j + 1) * HW, :].astype(f32)
        s = jax.lax.dot_general(
            q, kmat, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )  # (h, Tq, HW)
        s = s + bias_t[None]
        s = s + cmask_ref[0, :, j * HW : (j + 1) * HW][None]
        return s

    # pass 1: scores + running max
    m_buf[...] = jnp.full(m_buf.shape, -1e30, f32)
    for j in range(Fc):
        s = tap_scores(j)
        p_buf[j] = s.astype(_CACHE_DTYPE)
        m_buf[...] = jnp.maximum(m_buf[...], jnp.max(s, axis=-1))
    s_bos = jnp.sum(q * kbos_ref[0].astype(f32), axis=-1)  # (h, Tq)
    m = jnp.maximum(m_buf[...], s_bos)

    # pass 2: exp, denom, talking-heads, PV
    p_bos = jnp.exp(s_bos - m)
    denom = p_bos
    for j in range(Fc):
        pj = jnp.exp(p_buf[j].astype(f32) - m[..., None])
        p_buf[j] = pj.astype(_CACHE_DTYPE)
        denom = denom + jnp.sum(pj, axis=-1)
    inv = 1.0 / denom
    lse_ref[0] = m + jnp.log(denom)

    acc[...] = jnp.zeros(acc.shape, f32)
    for j in range(Fc):
        vmat = v_ref[0][:, j * HW : (j + 1) * HW, :].astype(f32)
        attn = p_buf[j].astype(f32) * inv[..., None]
        attn = _mix3(th_ref, attn, heads)
        attn = drop_abs(attn, j * HW)
        acc[...] += jax.lax.dot_general(
            attn, vmat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
    ab = _mix2(th_ref, p_bos * inv, heads)
    ab = drop_abs(ab[..., None], -2)[..., 0]
    out = acc[...] + ab[..., None] * vbos_ref[0].astype(f32)
    out_ref[0] = out.astype(out_ref.dtype)


def _xfused1_kernel(
    q_ref,        # (1, h, Tq, d) VMEM — all query frames, pre-scaled
    kbos_ref,     # (1, h, 1, d)
    vbos_ref,     # (1, h, 1, d)
    cbias_ref,    # (1, 1, HW, HW) VMEM — shared centered spatial mask
    th_ref,       # talking heads
    seed_ref,     # (1,) SMEM
    cmask_ref,    # (1, 1, Lc) VMEM additive runtime key mask
    k_ref,        # (1, h, Lc, d) VMEM — whole (single-frame) context
    v_ref,        # (1, h, Lc, d) VMEM
    out_ref,      # (1, h, Tq, d)
    lse_ref,      # (1, h, Tq)
    *,
    F: int,
    HW: int,
    heads: int,
    dim_head: int,
    drop_rate: float = 0.0,
):
    """Fc == 1 specialization of ``_xfused_kernel``: with a single context
    frame there is nothing to loop over, so the whole softmax/mix/PV chain
    runs on SSA values — no p_buf scratch roundtrips or bf16 cache
    conversions (measured 0.54 -> 0.38 ms core fwd at b=8/fmap16/F=10).
    Numerics: max over raw scores, exp over cache-rounded scores — the same
    quantities the multi-tap kernel and both backwards compute; the PV pass
    here uses f32 probabilities (the multi-tap kernel re-rounds them through
    the cache dtype), which matches the backward's recompute exactly."""
    bi = pl.program_id(0)
    f32 = jnp.float32
    keep = 1.0 - drop_rate

    def drop_abs(x, k_base):
        if drop_rate <= 0.0:
            return x
        m = _keep_mask_abs(x.shape, keep, seed_ref[0], bi, 0, k_base)
        return jnp.where(m, x * (1.0 / keep), 0.0)

    q = q_ref[0].astype(f32)                       # (h, Tq, d)
    bias = cbias_ref[0, 0].astype(f32)             # (HW, HW)
    bias_t = jnp.concatenate([bias] * F, axis=0)   # (Tq, HW) — static tile

    kmat = k_ref[0].astype(f32)                    # (h, HW, d)
    s = jax.lax.dot_general(
        q, kmat, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (h, Tq, HW)
    s = s + bias_t[None]
    s = s + cmask_ref[0][None]
    s_r = s.astype(_CACHE_DTYPE).astype(f32)       # cache-dtype rounding
    s_bos = jnp.sum(q * kbos_ref[0].astype(f32), axis=-1)  # (h, Tq)
    m = jnp.maximum(jnp.max(s, axis=-1), s_bos)

    p_bos = jnp.exp(s_bos - m)
    pj = jnp.exp(s_r - m[..., None])
    denom = p_bos + jnp.sum(pj, axis=-1)
    inv = 1.0 / denom
    lse_ref[0] = m + jnp.log(denom)

    vmat = v_ref[0].astype(f32)
    attn = _mix3(th_ref, pj * inv[..., None], heads)
    attn = drop_abs(attn, 0)
    acc = jax.lax.dot_general(
        attn, vmat, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
    )
    ab = _mix2(th_ref, p_bos * inv, heads)
    ab = drop_abs(ab[..., None], -2)[..., 0]
    out = acc + ab[..., None] * vbos_ref[0].astype(f32)
    out_ref[0] = out.astype(out_ref.dtype)


def _xfused_bwd_kernel(
    lse_ref,      # (1, h, Tq)
    kbos_ref, vbos_ref,
    cbias_ref,    # (1, 1, HW, HW)
    th_ref,
    seed_ref,
    cmask_ref,    # (1, 1, Lc)
    k_ref, v_ref,  # (1, h, Lc, d)
    q_hbm, g_hbm,  # (b, h, Tq, d) ANY — streamed per chunk (VMEM budget)
    dq_hbm, dk_ref, dv_ref, dkbos_ref, dvbos_ref, dth_ref,
    dk_s, dv_s, qbuf, gbuf, dqbuf, sem,
    *,
    Fc: int,
    F: int,
    HW: int,
    CF: int,   # query frames per in-kernel chunk (bounds VMEM temporaries)
    heads: int,
    dim_head: int,
    drop_rate: float = 0.0,
):
    bi = pl.program_id(0)
    f32 = jnp.float32
    keep = 1.0 - drop_rate

    def drop_abs(x, q_base, k_base):
        if drop_rate <= 0.0:
            return x
        m = _keep_mask_abs(x.shape, keep, seed_ref[0], bi, q_base, k_base)
        return jnp.where(m, x * (1.0 / keep), 0.0)

    kbos = kbos_ref[0].astype(f32)
    vbos = vbos_ref[0].astype(f32)
    bias = cbias_ref[0, 0].astype(f32)

    def tap_kv(j):
        return (
            k_ref[0][:, j * HW : (j + 1) * HW, :].astype(f32),
            v_ref[0][:, j * HW : (j + 1) * HW, :].astype(f32),
        )

    # static chunk grid over query frames: temporaries are (h, CF*HW, HW)
    # instead of (h, F*HW, HW); scores recompute per pass (flash-style).
    # q/gout stream from HBM per chunk (full-Tq VMEM blocks would
    # double-buffer past the 128 MiB budget at b=8 F=10); the copies are
    # ~µs against a chunk's matmul work, so they run serially.
    chunks = [(c0, min(CF, F - c0)) for c0 in range(0, F, CF)]

    def chunk_vals(ci):
        c0, cf = chunks[ci]
        r0, rn = c0 * HW, cf * HW
        cps = [
            pltpu.make_async_copy(
                q_hbm.at[bi, :, pl.ds(r0, rn), :],
                qbuf.at[:, pl.ds(0, rn), :], sem.at[0],
            ),
            pltpu.make_async_copy(
                g_hbm.at[bi, :, pl.ds(r0, rn), :],
                gbuf.at[:, pl.ds(0, rn), :], sem.at[1],
            ),
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        q_c = qbuf[:, :rn, :].astype(f32)
        go_c = gbuf[:, :rn, :].astype(f32)
        lse_c = lse_ref[0][:, r0 : r0 + rn].astype(f32)
        bias_c = jnp.concatenate([bias] * cf, axis=0)
        return q_c, go_c, lse_c, bias_c

    def tap_p(j, kmat, q_c, lse_c, bias_c):
        if _PROBE_SKIP_SCORES:
            # timing probe ONLY (wrong numerics): drop the flash-style QK
            # score recompute so its cost can be measured as the delta vs
            # the real backward — the share a cached-score backward (the
            # gather oracle's layout) would save. docs/BENCHMARKS.md
            # "cross backward decomposition".
            s = jnp.broadcast_to(
                bias_c[None], (q_c.shape[0],) + bias_c.shape
            )
        else:
            s = jax.lax.dot_general(
                q_c, kmat, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )
            s = s + bias_c[None]
        s = s + cmask_ref[0, :, j * HW : (j + 1) * HW][None]
        s = s.astype(_CACHE_DTYPE).astype(f32)  # match the fwd's rounding
        return jnp.exp(s - lse_c[..., None])

    # ---- single pass over chunks: rho needs only the chunk's OWN rows
    # (the whole key set is VMEM-resident), so each tap's p / dA / dP are
    # computed ONCE and kept live for the dS stage — half the score work of
    # a two-pass structure
    dk_s[...] = jnp.zeros(dk_s.shape, f32)
    dv_s[...] = jnp.zeros(dv_s.shape, f32)
    dth_acc = None
    dkbos_acc = None
    dvbos_acc = None
    for ci, (c0, cf) in enumerate(chunks):
        q_c, go_c, lse_c, bias_c = chunk_vals(ci)
        s_bos = jnp.sum(q_c * kbos, axis=-1)
        p_bos = jnp.exp(s_bos - lse_c)
        dA_bos = jnp.sum(go_c * vbos, axis=-1)
        dA_bos = drop_abs(dA_bos[..., None], c0 * HW, -2)[..., 0]
        dp_bos = _mix2(th_ref, dA_bos, heads, transpose=True)
        rho_c = p_bos * dp_bos
        taps = []
        for j in range(Fc):
            kmat, vmat = tap_kv(j)
            pj = tap_p(j, kmat, q_c, lse_c, bias_c)
            dA = jax.lax.dot_general(
                go_c, vmat, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )
            dA = drop_abs(dA, c0 * HW, j * HW)
            dP = _mix3(th_ref, dA, heads, transpose=True)
            rho_c = rho_c + jnp.sum(pj * dP, axis=-1)
            taps.append((kmat, pj, dA, dP))
        ds_bos = p_bos * (dp_bos - rho_c)
        dq_acc = ds_bos[..., None] * kbos
        dth_c = _pair_contract(dA_bos[:, None, :], p_bos[:, None, :], heads)
        for j in range(Fc):
            kmat, pj, dA, dP = taps[j]
            dS = pj * (dP - rho_c[..., None])
            dq_acc = dq_acc + jax.lax.dot_general(
                dS, kmat, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )
            dk_s[:, j * HW : (j + 1) * HW, :] += jax.lax.dot_general(
                dS, q_c, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )
            a_mixed = drop_abs(_mix3(th_ref, pj, heads), c0 * HW, j * HW)
            dv_s[:, j * HW : (j + 1) * HW, :] += jax.lax.dot_general(
                a_mixed, go_c, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )
            dth_c = dth_c + _pair_contract(dA, pj, heads)
        dqbuf[:, : cf * HW, :] = dq_acc.astype(dqbuf.dtype)
        cp = pltpu.make_async_copy(
            dqbuf.at[:, pl.ds(0, cf * HW), :],
            dq_hbm.at[bi, :, pl.ds(c0 * HW, cf * HW), :], sem.at[2],
        )
        cp.start()
        cp.wait()
        kb_c = _outer_hq_hqd(ds_bos, q_c)
        a_bos = drop_abs(
            _mix2(th_ref, p_bos, heads)[..., None], c0 * HW, -2
        )[..., 0]
        vb_c = _outer_hq_hqd(a_bos, go_c)
        dth_acc = dth_c if dth_acc is None else dth_acc + dth_c
        dkbos_acc = kb_c if dkbos_acc is None else dkbos_acc + kb_c
        dvbos_acc = vb_c if dvbos_acc is None else dvbos_acc + vb_c

    dk_ref[0] = dk_s[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_s[...].astype(dv_ref.dtype)

    @pl.when(bi == 0)
    def _():
        dth_ref[...] = jnp.zeros(dth_ref.shape, dth_ref.dtype)

    dth_ref[...] += dth_acc
    # bos grads stay per-batch: the (b, h, 1, d) -> param reduction is the
    # broadcast_to vjp outside the op
    dkbos_ref[0, :, 0, :] = dkbos_acc.astype(dkbos_ref.dtype)
    dvbos_ref[0, :, 0, :] = dvbos_acc.astype(dvbos_ref.dtype)


def _xfused_fwd_call(mod, geo, q, k, v, k_bos, v_bos, cbias, th_w, cmask,
                     seed=None, drop_rate=0.0):
    b, h = q.shape[0], q.shape[1]
    HW, d, Fc, F = geo["HW"], geo["d"], geo["Fk"], geo["F"]
    Tq = F * HW
    Lc = Fc * HW
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    if Fc == 1:
        kernel = functools.partial(
            _xfused1_kernel,
            F=F, HW=HW, heads=h, dim_head=d, drop_rate=drop_rate,
        )
        scratch = []
    else:
        kernel = functools.partial(
            _xfused_kernel,
            Fc=Fc, F=F, HW=HW, heads=h, dim_head=d, drop_rate=drop_rate,
        )
        scratch = [
            pltpu.VMEM((Fc, h, Tq, HW), _CACHE_DTYPE),  # p_buf
            pltpu.VMEM((h, Tq), jnp.float32),           # m_buf
            pltpu.VMEM((h, Tq, d), jnp.float32),        # acc
        ]
    full = lambda bi: (bi, 0, 0, 0)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, Tq, d), full, memory_space=pltpu.VMEM),   # q
            pl.BlockSpec((1, h, 1, d), full, memory_space=pltpu.VMEM),    # k_bos
            pl.BlockSpec((1, h, 1, d), full, memory_space=pltpu.VMEM),    # v_bos
            pl.BlockSpec(memory_space=pltpu.VMEM),                        # cbias
            _th_spec(h),                                                  # th
            pl.BlockSpec(memory_space=pltpu.SMEM),                        # seed
            pl.BlockSpec((1, 1, Lc), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),                        # cmask
            pl.BlockSpec((1, h, Lc, d), full, memory_space=pltpu.VMEM),   # k
            pl.BlockSpec((1, h, Lc, d), full, memory_space=pltpu.VMEM),   # v
        ],
        out_specs=(
            pl.BlockSpec((1, h, Tq, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, Tq), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, Tq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, Tq), jnp.float32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k_bos, v_bos, cbias, th_w, seed, cmask, k, v)
    return out, lse


def _xfused_bwd_call(mod, geo, q, gout, lse, k, v, k_bos, v_bos, cbias,
                     th_w, cmask, seed=None, drop_rate=0.0):
    b, h = q.shape[0], q.shape[1]
    HW, d, Fc, F = geo["HW"], geo["d"], geo["Fk"], geo["F"]
    Tq = F * HW
    Lc = Fc * HW
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    # ~1024-row chunks bound the f32 temporaries (kept per-tap, so scale
    # down with the context frame count)
    CF = max(1, 1024 // (HW * Fc))
    kernel = functools.partial(
        _xfused_bwd_kernel,
        Fc=Fc, F=F, HW=HW, CF=CF, heads=h, dim_head=d, drop_rate=drop_rate,
    )
    full = lambda bi: (bi, 0, 0, 0)
    CQ = CF * HW
    dq, dk, dv, dkbos, dvbos, dth = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, Tq), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),                        # lse
            pl.BlockSpec((1, h, 1, d), full, memory_space=pltpu.VMEM),    # k_bos
            pl.BlockSpec((1, h, 1, d), full, memory_space=pltpu.VMEM),    # v_bos
            pl.BlockSpec(memory_space=pltpu.VMEM),                        # cbias
            _th_spec(h),                                                  # th
            pl.BlockSpec(memory_space=pltpu.SMEM),                        # seed
            pl.BlockSpec((1, 1, Lc), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),                        # cmask
            pl.BlockSpec((1, h, Lc, d), full, memory_space=pltpu.VMEM),   # k
            pl.BlockSpec((1, h, Lc, d), full, memory_space=pltpu.VMEM),   # v
            pl.BlockSpec(memory_space=pl.ANY),                            # q
            pl.BlockSpec(memory_space=pl.ANY),                            # gout
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),                            # dq
            pl.BlockSpec((1, h, Lc, d), full, memory_space=pltpu.VMEM),   # dk
            pl.BlockSpec((1, h, Lc, d), full, memory_space=pltpu.VMEM),   # dv
            pl.BlockSpec((1, h, 1, d), full, memory_space=pltpu.VMEM),    # dkbos
            pl.BlockSpec((1, h, 1, d), full, memory_space=pltpu.VMEM),    # dvbos
            pl.BlockSpec(memory_space=pltpu.VMEM),                        # dth
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, Tq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, Lc, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, Lc, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((h, Lc, d), jnp.float32),        # dk accumulator
            pltpu.VMEM((h, Lc, d), jnp.float32),        # dv accumulator
            pltpu.VMEM((h, CQ, d), q.dtype),            # qbuf
            pltpu.VMEM((h, CQ, d), q.dtype),            # gbuf
            pltpu.VMEM((h, CQ, d), q.dtype),            # dqbuf
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(lse, k_bos, v_bos, cbias, th_w, seed, cmask, k, v, q, gout)
    return dq, dk, dv, dkbos, dvbos, dth


def xfused_ok(mod, t: int, Lc: int):
    """Whether the fused single-block cross kernels fit: the p_buf score
    cache (Fc, h, F·HW, HW) must stay comfortably inside VMEM."""
    HW = mod.image_size * mod.image_size
    if Lc % HW:
        return False
    if jax.default_backend() == "tpu" and HW % 128:
        return False  # Mosaic lane rule (interpret mode has no such limit)
    Fc = Lc // HW
    F = -(-t // HW)
    if Fc == 1:
        # value-based single-pass kernel: no p_buf scratch, but the raw
        # scores and their cache-rounded copy are live f32 simultaneously
        # (s and s_r in _xfused1_kernel) — count both
        cache_bytes = 2 * mod.heads * F * HW * HW * 4
    else:
        cache_bytes = Fc * mod.heads * F * HW * HW * (
            2 if _CACHE_DTYPE == jnp.bfloat16 else 4
        )
    return cache_bytes <= 48 * 1024 * 1024


def _xfused_core_op(mod, t: int, Lc: int, drop_rate=0.0):
    """custom_vjp core for the fused cross kernels (in-kernel dropout)."""

    def run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, cmask, seed):
        g = _cross_geometry(mod, t, Lc, q.shape[-1])
        return _xfused_fwd_call(
            mod, g, q, k, v, k_bos, v_bos, cbias, th_w, cmask,
            seed=seed, drop_rate=drop_rate,
        )

    @jax.custom_vjp
    def core(q, k, v, k_bos, v_bos, cbias, th_w, cmask, seed):
        return run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, cmask, seed)[0]

    def core_fwd(q, k, v, k_bos, v_bos, cbias, th_w, cmask, seed):
        out, lse = run_fwd(q, k, v, k_bos, v_bos, cbias, th_w, cmask, seed)
        return out, (q, k, v, k_bos, v_bos, cbias, th_w, cmask, seed, lse)

    def core_bwd(res, gout):
        q, k, v, k_bos, v_bos, cbias, th_w, cmask, seed, lse = res
        g = _cross_geometry(mod, t, Lc, q.shape[-1])
        gout = gout.astype(q.dtype)
        dq, dk, dv, dkbos, dvbos, dth = _xfused_bwd_call(
            mod, g, q, gout, lse, k, v, k_bos, v_bos, cbias, th_w,
            cmask, seed=seed, drop_rate=drop_rate,
        )
        return (
            dq,
            dk,
            dv,
            dkbos.astype(k_bos.dtype),
            dvbos.astype(v_bos.dtype),
            jnp.zeros_like(cbias),  # constant spatial mask
            dth.astype(th_w.dtype),
            jnp.zeros_like(cmask),  # boolean-derived, non-differentiable
            np.zeros((1,), dtype=jax.dtypes.float0),
        )

    core.defvjp(core_fwd, core_bwd)
    return core


def _xfused_make_op(mod, t: int, Lc: int):
    core = _xfused_core_op(mod, t, Lc, drop_rate=mod.dropout)
    core_nodrop = (
        _xfused_core_op(mod, t, Lc, drop_rate=0.0) if mod.dropout else core
    )

    def op(p_sub, q, k, v, k_bos, v_bos, cmask=None, seed=None):
        d_orig = q.shape[-1]
        geo = _cross_geometry(mod, t, Lc, d_orig)
        total = geo["F"] * geo["HW"]
        cbias = jnp.asarray(
            _cross_mask_np(mod.image_size, mod.kernel_size, mod.dilation)
        )[None, None]  # (1, 1, HW, HW)
        th_w = p_sub["talking_heads"].astype(jnp.float32)
        if cmask is None:
            cm = jnp.zeros((q.shape[0], Lc), jnp.float32)
        else:
            cm = jnp.where(cmask, 0.0, -1e30).astype(jnp.float32)
        if t < total:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, total - t), (0, 0)))
        q, k, v, k_bos, v_bos = _pad_d([q, k, v, k_bos, v_bos], d_orig, geo["d"])
        cm = cm[:, None]  # (b, 1, Lc)
        if seed is None:  # inference: no dropout
            out = core_nodrop(
                q, k, v, k_bos, v_bos, cbias, th_w, cm,
                jnp.zeros((1,), jnp.int32),
            )
        else:
            out = core(q, k, v, k_bos, v_bos, cbias, th_w, cm, seed)
        return out[:, :, :t, :d_orig]

    return op


def sparse_cross_2dna_pallas_vjp(mod, t: int, Lc: int):
    """Differentiable cross-2DNA op ``f(p_sub, q, k, v, k_bos, v_bos,
    cmask=None, seed=None)``.

    q: (b, h, t, d) pre-scaled non-bos video queries; k/v: (b, h, Lc, d)
    context; k_bos/v_bos: the broadcast null k/v (the bos *query* row stays
    on the XLA path); cmask: optional (b, Lc) bool runtime context mask
    (classifier-free-guidance cond dropout / padded sketch frames), folded
    in as an additive -1e30 tensor. Requires HW % 128 == 0 and Lc a whole
    number of context frames. When the fused single-block kernels fit in
    VMEM (the common case) they are used — with in-kernel dropout via
    ``seed``; the per-frame kernels below are the dropout-free fallback."""
    cache_key = ("cross", mod, t, Lc)
    if cache_key in _VJP_CACHE:
        return _VJP_CACHE[cache_key]

    if xfused_ok(mod, t, Lc):
        op = _xfused_make_op(mod, t, Lc)
        _VJP_CACHE[cache_key] = op
        return op

    core = _cross_core_op(mod, t, Lc)

    def op(p_sub, q, k, v, k_bos, v_bos, cmask=None, seed=None):
        del seed  # per-frame fallback kernels are dropout-free
        d_orig = q.shape[-1]
        geo = _cross_geometry(mod, t, Lc, d_orig)
        total = geo["F"] * geo["HW"]
        cbias = jnp.asarray(
            _cross_mask_np(mod.image_size, mod.kernel_size, mod.dilation)
        )[None, None]  # (1, 1, HW, HW) — one shared tap
        th_w = p_sub["talking_heads"].astype(jnp.float32)
        if cmask is None:
            cm = jnp.zeros((q.shape[0], Lc), jnp.float32)
        else:
            cm = jnp.where(cmask, 0.0, -1e30).astype(jnp.float32)
        if t < total:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, total - t), (0, 0)))
        q, k, v, k_bos, v_bos = _pad_d([q, k, v, k_bos, v_bos], d_orig, geo["d"])
        out = core(q, k, v, k_bos, v_bos, cbias, th_w, cm)
        return out[:, :, :t, :d_orig]

    _VJP_CACHE[cache_key] = op
    return op
