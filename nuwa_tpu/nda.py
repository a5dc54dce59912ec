"""NDA — the "nearby attention" family, TPU-native.

Covers the reference's sparse attention ops
(/root/reference/nuwa_pytorch/nuwa_pytorch.py):
  * ``Sparse3DNA``       (:381-613)  — causal/centered 3D video neighborhoods
  * ``SparseCausal2DNA`` (:615-759)  — causal audio (time × tokens-per-step)
  * ``SparseCross2DNA``  (:761-901)  — video→sketch per-frame 2D neighborhoods

Instead of torch ``unfold`` + per-token patch extraction, neighborhoods are
*static index tables* built once from the (static) grid shape, kernel, and
dilation. Under jit these fold into the compiled program; the XLA path is a
single gather + two batched contractions. The Pallas block-local kernel
(nuwa_tpu/kernels) replaces the gather on the training hot path.

Semantics notes (verified against the reference):
  * causal mode: the window along every axis *ends at the query* — offsets
    -(K-1)·d … 0 — matching the reference's asymmetric causal padding
    (:424-429). Combined with raster-scan AR ordering this is strictly causal.
  * the <bos> token is handled out-of-band: every query also attends a bos
    key/value column (bias 0, never masked); bos itself adopts its own value
    (:499,:608).
  * audio 2DNA attends *all* tokens within each of the K dilated past
    timesteps (kernel spans the full height axis, :642), replicating the
    reference exactly (incl. same-timestep lookahead when height > 1).
  * unlike the reference, keys in the zero-padded partial last frame are
    masked out (the reference attends them as zero-keys, :452-457 — a quirk
    that only matters at generation time).
"""
from __future__ import annotations

import functools as _functools
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .core.layers import Dense, Module, dropout, kaiming_uniform, normal_init
from .ops.attention import merge_heads, split_heads, talking_heads
from .ops.embeddings import AxialPositionalEmbedding
from .ops.utils import cast_tuple, masked_fill, max_neg_value, mult_reduce, stable_softmax


# ---------------------------------------------------------------------------
# static neighborhood index tables
# ---------------------------------------------------------------------------


_WARNED_FALLBACKS = set()


def _warn_dense_fallback(msg: str):
    """One-time (per message) warning when backend='auto' silently falls
    back from the Pallas kernel to the dense XLA path (VERDICT r3 #6: the
    cliff must be visible)."""
    if msg not in _WARNED_FALLBACKS:
        _WARNED_FALLBACKS.add(msg)
        import warnings

        warnings.warn(msg, stacklevel=3)


def _axis_neighbors(size: int, k: int, dilation: int, mode: str):
    """Per-axis neighbor coordinates (size, k̃) + validity, as numpy.

    mode: 'causal'   -> q + {-(k-1)d … 0}
          'centered' -> q + {-(k-1)/2·d … +(k-1)/2·d}
          'full'     -> all absolute positions (k ignored; k̃ = size)
    """
    q = np.arange(size)[:, None]
    if mode == "full":
        nb = np.broadcast_to(np.arange(size)[None, :], (size, size)).copy()
        valid = np.ones_like(nb, dtype=bool)
        return nb, valid
    if mode == "causal":
        offs = (np.arange(k) - (k - 1)) * dilation
    elif mode == "centered":
        offs = (np.arange(k) - (k - 1) // 2) * dilation
    else:  # pragma: no cover
        raise ValueError(mode)
    nb = q + offs[None, :]
    valid = (nb >= 0) & (nb < size)
    return np.clip(nb, 0, size - 1), valid


def build_nda_indices(
    shape: Tuple[int, ...],
    kernel: Tuple[int, ...],
    dilation: Tuple[int, ...],
    modes: Tuple[str, ...],
):
    """Build (T, Kn) flat neighbor indices and validity for a token grid.

    T = prod(shape); Kn = prod(per-axis window sizes). Enumeration of the Kn
    window positions is row-major over axes — identical to torch unfold's
    patch ordering, so per-kernel-position rel-pos-bias tables line up.
    """
    per_axis = [
        _axis_neighbors(s, k, d, m)
        for s, k, d, m in zip(shape, kernel, dilation, modes)
    ]
    # combine axes with an outer product
    ndim = len(shape)
    strides = np.cumprod((1,) + tuple(reversed(shape)))[::-1][1:]  # row-major

    idx = np.zeros((1, 1), dtype=np.int64)
    valid = np.ones((1, 1), dtype=bool)
    for axis in range(ndim):
        nb, v = per_axis[axis]  # (s_axis, k_axis)
        s_axis, k_axis = nb.shape
        # current idx: (Q, K); expand with this axis
        Q, K = idx.shape
        idx = (
            idx[:, None, :, None] + (nb * strides[axis])[None, :, None, :]
        ).reshape(Q * s_axis, K * k_axis)
        valid = (valid[:, None, :, None] & v[None, :, None, :]).reshape(
            Q * s_axis, K * k_axis
        )
    return idx.astype(np.int32), valid


def gather_neighbors(t, idx):
    """Gather neighbor vectors: t (b, h, n_kv, d), idx (n_q, Kn) -> (b, h, n_q, Kn, d)."""
    return jnp.take(t, idx, axis=2)


# ---------------------------------------------------------------------------
# shared gather-attention core
# ---------------------------------------------------------------------------


def _coord_keep_mask(seed, keep, b, h, q_ids, k_ids, b_base=0):
    """(b, h, n, Kn) Bernoulli(keep) mask keyed by absolute (batch, head,
    query-token, key-token) ids — the jnp twin of the Pallas kernels'
    ``_keep_mask_abs`` (same hash constants), so realized dropout masks are
    independent of shard layout: context-parallel shards regenerate exactly
    the bits the unsharded gather path draws. ``q_ids``: (n,) global query
    token ids; ``k_ids``: (n, Kn) global key token ids (invalid slots may be
    negative — they are -inf-masked before softmax so their bits are moot);
    ``b_base``: global index of the first local batch row (DPxCP)."""
    u32 = jnp.uint32

    def _h(x):
        x = (x ^ (x >> 16)) * u32(0x7FEB352D)
        x = (x ^ (x >> 15)) * u32(0x846CA68B)
        return x ^ (x >> 16)

    s0 = jnp.asarray(seed).reshape(()).astype(u32) * u32(0x9E3779B9)
    bi = (jnp.arange(b, dtype=jnp.int32) + b_base).astype(u32)
    s = _h(s0 + bi + u32(0x85EBCA6B))[:, None, None, None]
    hh = jnp.arange(h, dtype=jnp.int32).astype(u32)[None, :, None, None]
    qa = q_ids.astype(u32)[None, None, :, None]
    ka = k_ids.astype(u32)[None, None, :, :]
    e = qa * u32(0x27D4EB2F) ^ ka * u32(0x165667B1) ^ hh * u32(0x9E3779B9)
    bits = _h(e ^ s)
    thresh = np.uint32(min(0xFFFFFFFF, int(round((1.0 - keep) * 2**32))))
    return bits >= thresh


def _nda_attend(
    q,  # (b, h, n, d) scaled
    k_nb,  # (b, h, n, Kn, d)
    v_nb,  # (b, h, n, Kn, d)
    valid,  # (n, Kn) bool or broadcastable
    k_bos,  # (b, h, 1, d) or None
    v_bos,
    rel_pos_bias,  # (h, Kn) or None
    th_w,  # talking heads weight (h, h)
    drop_rate=0.0,
    drop_key=None,
    drop_ids=None,  # (seed, q_ids (n,), k_ids (n, Kn)): coordinate-keyed
    b_base=0,
):
    neg = max_neg_value(jnp.float32)
    sim = jnp.einsum("bhid,bhijd->bhij", q, k_nb)
    if rel_pos_bias is not None:
        sim = sim + rel_pos_bias[None, :, None, :].astype(sim.dtype)
    sim = masked_fill(sim, ~valid[None, None, :, :], neg)

    if k_bos is not None:
        sim_bos = jnp.einsum("bhid,bhd->bhi", q, k_bos[:, :, 0])[..., None]
        sim = jnp.concatenate([sim_bos, sim], axis=-1)

    attn = stable_softmax(sim, axis=-1)
    attn = talking_heads(attn, th_w)
    if drop_rate > 0.0 and drop_ids is not None:
        seed, q_ids, k_ids = drop_ids
        if k_bos is not None:  # bos column: sentinel id -2 (as the kernels)
            k_ids = jnp.concatenate(
                [jnp.full((k_ids.shape[0], 1), -2, k_ids.dtype), k_ids],
                axis=1,
            )
        keep = 1.0 - drop_rate
        m = _coord_keep_mask(
            seed, keep, attn.shape[0], attn.shape[1], q_ids, k_ids, b_base
        )
        attn = jnp.where(m, attn * (1.0 / keep), 0.0)
    else:
        attn = dropout(attn, drop_rate, drop_key)
    attn = attn.astype(v_nb.dtype)

    if v_bos is not None:
        attn_bos, attn = attn[..., :1], attn[..., 1:]
        out = jnp.einsum("bhij,bhijd->bhid", attn, v_nb)
        out = out + attn_bos * v_bos
    else:
        out = jnp.einsum("bhij,bhijd->bhid", attn, v_nb)
    return out


# ---------------------------------------------------------------------------
# dense frame-tap attention (XLA, gather-free)
# ---------------------------------------------------------------------------


def _dense_tap_attend(
    mod, q, k, v, k_bos, v_bos, num_frames, t, rel_bias_axials, th_w,
):
    """Gather-free 3DNA: for each temporal tap, the key frames are a *static
    slice* of the front-padded kv (a shifted view), and the spatial
    neighborhood is a static (HW, HW) mask over a dense frame-vs-frame MXU
    matmul. No neighbor materialization — O(Kf) slices instead of an
    (n, Kn, d) gather — and natively differentiable (the backward is also
    gather-free). Mirrors the Pallas kernel's math in pure XLA.

    q: (b, h, F*HW, d) padded to full frames (pre-scaled);
    k, v: (b, h, F*HW, d); k_bos/v_bos: (b, h, 1, d). Returns (b, h, t, d).
    """
    b, h, _, d = q.shape
    F = num_frames
    _, fh, fw = mod.video_shape[0], mod.video_shape[1], mod.video_shape[2]
    HW = fh * fw
    kf, kh, kw = mod.kernel
    df, dh_, dw = mod.dilations
    causal = mod.causal

    from .kernels.nda_pallas import _spatial_mask_and_selector

    mask_np, selector_np = _spatial_mask_and_selector(fh, fw, kh, kw, dh_, dw, causal)
    maskf = jnp.asarray(np.where(mask_np, 0.0, -1e30), jnp.float32)  # (HW, HW)

    # axial bias decomposition (see pallas wrapper)
    if rel_bias_axials is not None:
        comp = dict(
            zip([i for i, s in enumerate(mod.kernel) if s > 1], rel_bias_axials)
        )
        f_tab, h_tab, w_tab = comp.get(0), comp.get(1), comp.get(2)
        if f_tab is not None:
            fb = jnp.transpose(f_tab)
            fbias = fb[:, ::-1] if causal else fb  # (h, kf): tap j = offset -j·df
        else:
            fbias = jnp.zeros((h, kf), jnp.float32)
        hw_tab = jnp.zeros((kh, kw, h), jnp.float32)
        if h_tab is not None:
            hw_tab = hw_tab + h_tab[:, None, :]
        if w_tab is not None:
            hw_tab = hw_tab + w_tab[None, :, :]
        sbias = jnp.einsum(
            "qkt,th->hqk",
            jnp.asarray(selector_np, jnp.float32),
            hw_tab.reshape(kh * kw, h),
        )  # (h, HW, HW)
    else:
        fbias = jnp.zeros((h, kf), jnp.float32)
        sbias = jnp.zeros((1, HW, HW), jnp.float32)

    LB = (kf - 1) * df if causal else ((kf - 1) // 2) * df
    RB = 0 if causal else ((kf - 1) // 2) * df
    kf5 = k.reshape(b, h, F, HW, d)
    vf5 = v.reshape(b, h, F, HW, d)
    zpad = ((0, 0), (0, 0), (LB, RB), (0, 0), (0, 0))
    kp = jnp.pad(kf5, zpad)
    vp = jnp.pad(vf5, zpad)
    qf = q.reshape(b, h, F, HW, d)

    col_tok = np.arange(HW)[None, :]  # (1, HW)
    sims = []
    v_taps = []
    for j in range(kf):
        off = -j * df if causal else (j - (kf - 1) // 2) * df
        start = off + LB  # >= 0 by construction
        k_j = jax.lax.slice_in_dim(kp, start, start + F, axis=2)
        v_j = jax.lax.slice_in_dim(vp, start, start + F, axis=2)
        s = jnp.einsum("bhfid,bhfjd->bhfij", qf, k_j).astype(jnp.float32)
        s = s + maskf[None, None, None]
        s = s + sbias[None, :, None]
        s = s + fbias[None, :, j, None, None, None]
        # validity: tap frame in range + token index < t (numpy-static)
        src_frame = np.arange(F) + off  # (F,)
        tok_idx = src_frame[:, None] * HW + col_tok  # (F, HW)
        ok = (src_frame[:, None] >= 0) & (src_frame[:, None] < F) & (tok_idx < t)
        s = jnp.where(jnp.asarray(ok)[None, None, :, None, :], s, -1e30)
        sims.append(s)
        v_taps.append(v_j)

    sim_bos = jnp.einsum("bhfid,bhd->bhfi", qf, k_bos[:, :, 0]).astype(jnp.float32)
    sim = jnp.concatenate([sim_bos[..., None]] + sims, axis=-1)

    attn = stable_softmax(sim, axis=-1)
    attn = jnp.einsum("bhfij,gh->bgfij", attn, th_w.astype(attn.dtype))
    attn = attn.astype(v.dtype)

    out = attn[..., :1] * v_bos[:, :, None]
    for j in range(kf):
        a_j = attn[..., 1 + j * HW : 1 + (j + 1) * HW]
        out = out + jnp.einsum("bhfij,bhfjd->bhfid", a_j, v_taps[j])
    return out.reshape(b, h, F * HW, d)[:, :, :t]


def _dense_tap_attend_chunked(
    mod, q, k, v, k_bos, v_bos, num_frames, t, rel_bias_axials, th_w, row_chunk
):
    """Row-chunked variant of the gather-free dense path for large fmaps
    (HW > 256): queries are processed in blocks of ``row_chunk`` rows and the
    key window per spatial block is only the rows the kernel can reach —
    scores stay O(R·W × (R+Δ)·W) per tap instead of O(HW²).
    """
    b, h, _, d = q.shape
    F = num_frames
    fh, fw = mod.video_shape[1], mod.video_shape[2]
    HW = fh * fw
    kf, kh, kw = mod.kernel
    df, dh_, dw = mod.dilations
    causal = mod.causal
    R = row_chunk
    assert fh % R == 0, "row_chunk must divide the fmap height"
    dh_top = (kh - 1) * dh_ if causal else ((kh - 1) // 2) * dh_
    dh_bot = 0 if causal else ((kh - 1) // 2) * dh_
    Rk = R + dh_top + dh_bot  # key rows per block

    # per-head bias tables (axial decomposition, see _dense_tap_attend)
    if rel_bias_axials is not None:
        comp = dict(zip([i for i, s in enumerate(mod.kernel) if s > 1], rel_bias_axials))
        f_tab, h_tab, w_tab = comp.get(0), comp.get(1), comp.get(2)
        if f_tab is not None:
            fb = jnp.transpose(f_tab)
            fbias = fb[:, ::-1] if causal else fb
        else:
            fbias = jnp.zeros((h, kf), jnp.float32)
    else:
        h_tab = w_tab = None
        fbias = jnp.zeros((h, kf), jnp.float32)

    # static per-block spatial mask over (R*fw, Rk*fw)
    def block_mask(r0):
        mask = np.full((R * fw, Rk * fw), -1e30, np.float32)
        for rr in range(R):
            qy = r0 + rr
            for w1 in range(fw):
                qi = rr * fw + w1
                for bb in range(kh):
                    ky = qy + (bb - (kh - 1)) * dh_ if causal else qy + (bb - (kh - 1) // 2) * dh_
                    if not (0 <= ky < fh):
                        continue
                    rk = ky - (r0 - dh_top)  # row inside the key window
                    if not (0 <= rk < Rk):
                        continue
                    for cc in range(kw):
                        kx = w1 + (cc - (kw - 1)) * dw if causal else w1 + (cc - (kw - 1) // 2) * dw
                        if 0 <= kx < fw:
                            mask[qi, rk * fw + kx] = 0.0
        return mask

    # traced bias matrices need jnp; build a static tap-selector per block
    def block_selector(r0):
        sel = np.zeros((R * fw, Rk * fw, kh * kw), np.float32)
        for rr in range(R):
            qy = r0 + rr
            for w1 in range(fw):
                qi = rr * fw + w1
                for bb in range(kh):
                    ky = qy + (bb - (kh - 1)) * dh_ if causal else qy + (bb - (kh - 1) // 2) * dh_
                    if not (0 <= ky < fh):
                        continue
                    rk = ky - (r0 - dh_top)
                    if not (0 <= rk < Rk):
                        continue
                    for cc in range(kw):
                        kx = w1 + (cc - (kw - 1)) * dw if causal else w1 + (cc - (kw - 1) // 2) * dw
                        if 0 <= kx < fw:
                            sel[qi, rk * fw + kx, bb * kw + cc] = 1.0
        return sel

    if rel_bias_axials is not None:
        hw_tab = jnp.zeros((kh, kw, h), jnp.float32)
        if h_tab is not None:
            hw_tab = hw_tab + h_tab[:, None, :]
        if w_tab is not None:
            hw_tab = hw_tab + w_tab[None, :, :]
        hw_tab = hw_tab.reshape(kh * kw, h)

    LB = (kf - 1) * df if causal else ((kf - 1) // 2) * df
    RB = 0 if causal else ((kf - 1) // 2) * df
    kf6 = k.reshape(b, h, F, fh, fw, d)
    vf6 = v.reshape(b, h, F, fh, fw, d)
    zpad = ((0, 0), (0, 0), (LB, RB), (dh_top, dh_bot), (0, 0), (0, 0))
    kp = jnp.pad(kf6, zpad)
    vp = jnp.pad(vf6, zpad)
    qf = q.reshape(b, h, F, fh, fw, d)

    out_blocks = []
    for r0 in range(0, fh, R):
        q_blk = qf[:, :, :, r0 : r0 + R].reshape(b, h, F, R * fw, d)
        mask_np = block_mask(r0)
        maskj = jnp.asarray(mask_np)
        if rel_bias_axials is not None:
            sbias = jnp.einsum(
                "qkt,th->hqk", jnp.asarray(block_selector(r0), jnp.float32), hw_tab
            )
        else:
            sbias = jnp.zeros((1, R * fw, Rk * fw), jnp.float32)

        sims, v_taps = [], []
        for j in range(kf):
            off = -j * df if causal else (j - (kf - 1) // 2) * df
            fstart = off + LB
            # key rows [r0, r0+Rk) of padded-height frames
            k_j = kp[:, :, fstart : fstart + F, r0 : r0 + Rk].reshape(
                b, h, F, Rk * fw, d
            )
            v_j = vp[:, :, fstart : fstart + F, r0 : r0 + Rk].reshape(
                b, h, F, Rk * fw, d
            )
            s = jnp.einsum("bhfid,bhfjd->bhfij", q_blk, k_j).astype(jnp.float32)
            s = s + maskj[None, None, None]
            s = s + sbias[None, :, None]
            s = s + fbias[None, :, j, None, None, None]
            # frame-tap validity + ragged-tail token mask (static numpy)
            src_frame = np.arange(F) + off
            key_rows = np.arange(Rk) + (r0 - dh_top)
            tok_idx = (
                src_frame[:, None, None] * HW
                + key_rows[None, :, None] * fw
                + np.arange(fw)[None, None, :]
            ).reshape(F, Rk * fw)
            ok = (
                (src_frame[:, None] >= 0)
                & (src_frame[:, None] < F)
                & (tok_idx < t)
            )
            s = jnp.where(jnp.asarray(ok)[None, None, :, None, :], s, -1e30)
            sims.append(s)
            v_taps.append(v_j)

        sim_bos = jnp.einsum("bhfid,bhd->bhfi", q_blk, k_bos[:, :, 0]).astype(jnp.float32)
        sim = jnp.concatenate([sim_bos[..., None]] + sims, axis=-1)
        attn = stable_softmax(sim, axis=-1)
        attn = jnp.einsum("bhfij,gh->bgfij", attn, th_w.astype(attn.dtype))
        attn = attn.astype(v.dtype)

        out = attn[..., :1] * v_bos[:, :, None]
        blk = Rk * fw
        for j in range(kf):
            a_j = attn[..., 1 + j * blk : 1 + (j + 1) * blk]
            out = out + jnp.einsum("bhfij,bhfjd->bhfid", a_j, v_taps[j])
        out_blocks.append(out.reshape(b, h, F, R, fw, d))

    out = jnp.concatenate(out_blocks, axis=3)  # (b, h, F, fh, fw, d)
    return out.reshape(b, h, F * HW, d)[:, :, :t]


# ---------------------------------------------------------------------------
# Sparse3DNA
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Sparse3DNA(Module):
    """3D Nearby Attention over a (frames, height, width) token grid.

    Parity: reference ``Sparse3DNA`` (nuwa_pytorch.py:381-613). Grid shape,
    kernel and dilation are static config; the neighbor table and masks are
    numpy constants folded into the jitted graph.
    """

    dim: int
    video_shape: Tuple[int, int, int]  # (max_frames, fmap, fmap)
    kernel_size: Tuple[int, int, int] | int = 3
    dilation: Tuple[int, int, int] | int = 1
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    causal: bool = False
    query_num_frames_chunk: Optional[int] = None  # memory knob (scan chunking)
    rel_pos_bias: bool = False
    use_pallas: bool = False  # production kernel (nuwa_tpu/kernels)
    backend: str = "auto"  # 'auto' | 'gather' | 'dense' (gather-free frame taps)
    # 'dense' is ~2.2x faster for training on TPU at fmap<=16 (no neighbor
    # materialization); 'auto' picks it there and falls back to 'gather'
    # for larger grids or when attention dropout is active.
    # Force the row-blocked Pallas family with this many query rows per
    # block even when HW <= 256 (where 'auto' uses the whole-frame family):
    # smaller blocks attend a (R + (kh-1)*dh)-row key window instead of
    # whole key frames — fewer score FLOPs, more grid steps + halo DMA.
    # Requires fmap_height % row_block == 0 and row_block * fmap_width a
    # multiple of 128 on TPU. Measured a net LOSS at fmap 16 (see
    # transformer.py sparse_3dna_row_block note); experimentation knob only.
    row_block: Optional[int] = None

    @property
    def kernel(self):
        k = cast_tuple(self.kernel_size, 3)
        assert all(n % 2 == 1 for n in k), "kernel size must be odd"
        return k

    @property
    def dilations(self):
        return cast_tuple(self.dilation, 3)

    @property
    def kernel_numel(self):
        return mult_reduce(self.kernel)

    @property
    def inner_dim(self):
        return self.heads * self.dim_head

    @property
    def bias_module(self):
        return AxialPositionalEmbedding(self.heads, shape=self.kernel)

    def init(self, key):
        ks = jax.random.split(key, 5)
        p = {
            "to_q": Dense(self.dim, self.inner_dim).init(ks[0]),
            "to_kv": Dense(self.dim, self.inner_dim * 2).init(ks[1]),
            # reference to_out keeps its bias (nn.Linear default, :405)
            "to_out": Dense(self.inner_dim, self.dim, use_bias=True).init(ks[2]),
            "talking_heads": kaiming_uniform(
                ks[3], (self.heads, self.heads), self.heads
            ),
        }
        if self.rel_pos_bias:
            p["rel_pos_bias"] = self.bias_module.init(ks[4])
        return p

    def _indices(self, num_frames: int):
        """Neighbor table for the first ``num_frames`` frames (numpy)."""
        f, h, w = self.video_shape
        mode = "causal" if self.causal else "centered"
        idx, valid = build_nda_indices(
            (num_frames, h, w), self.kernel, self.dilations, (mode,) * 3
        )
        return idx, valid

    def _rel_bias(self, p):
        if not self.rel_pos_bias:
            return None
        table = self.bias_module(p["rel_pos_bias"])  # (Kn, heads)
        return table.T  # (heads, Kn)

    def __call__(self, p, x, *, key=None, cp_mesh=None, cp_axis="data", **_):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        f_max, fh, fw = self.video_shape
        tokens_per_frame = fh * fw

        t = n - 1  # video tokens (after bos)
        if t == 0:
            # bos-only: adopt own value (reference :485-486) — also covers
            # the cp_mesh case (nothing to shard)
            kv = Dense(self.dim, self.inner_dim * 2)(p["to_kv"], x)
            _, v = jnp.split(kv, 2, axis=-1)
            return Dense(self.inner_dim, self.dim, use_bias=True)(p["to_out"], v)

        if cp_mesh is not None:
            # context parallelism: frame-axis sharding with halo exchange of
            # the (Kf-1)*dilation lookback frames over ICI (SURVEY §2.8);
            # centered kernels (sketch encoder) exchange halos both ways.
            # Attention dropout rides through on absolute-coordinate masks.
            from .parallel.context_parallel import context_parallel_sparse_3dna

            if isinstance(cp_axis, tuple):
                frame_axis, data_axis = cp_axis
            elif (
                "context" in cp_mesh.axis_names
                and cp_mesh.shape["context"] > 1
            ):
                # ('data', …, 'context') mesh: frames ride 'context' and the
                # batch is sharded over 'data' (DPxCP compose)
                frame_axis = "context"
                data_axis = (
                    "data" if cp_mesh.shape.get("data", 1) > 1 else None
                )
            else:
                frame_axis, data_axis = cp_axis, None
            return context_parallel_sparse_3dna(
                self, p, x, cp_mesh, axis=frame_axis, key=key,
                data_axis=data_axis,
            )

        pad = (-t) % tokens_per_frame
        num_frames = (t + pad) // tokens_per_frame
        x_padded = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x

        q = Dense(self.dim, self.inner_dim)(p["to_q"], x)
        kv = Dense(self.dim, self.inner_dim * 2)(p["to_kv"], x_padded)
        k, v = jnp.split(kv, 2, axis=-1)
        q, k, v = (split_heads(tt, h) for tt in (q, k, v))

        q = q * (dh**-0.5)
        q, bos_v_out = q[:, :, 1:], v[:, :, :1]
        k_bos, k = k[:, :, :1], k[:, :, 1:]
        v_bos, v = v[:, :, :1], v[:, :, 1:]

        idx_np, valid_np = self._indices(num_frames)
        idx_np, valid_np = idx_np[:t], valid_np[:t]
        # mask zero-padded phantom tokens in the last partial frame
        if pad:
            valid_np = valid_np & (idx_np < t)
        idx = jnp.asarray(idx_np)
        valid = jnp.asarray(valid_np)

        rel_bias = self._rel_bias(p)

        # attention dropout runs *inside* the kernels: tile-keyed counter
        # PRNG in the whole-frame family, absolute-(q,k)-coordinate masks in
        # the row-blocked family (its kv backward slices sub-tiles of the
        # forward's windows)
        wf = tokens_per_frame <= 256 and self.row_block is None
        drop_active = self.dropout > 0.0 and key is not None
        # backend='auto' on TPU prefers the fused Pallas kernels (measured
        # faster than the dense XLA path both forward and fwd+bwd on v5e —
        # docs/BENCHMARKS.md); CPU and constrained shapes fall through to XLA.
        on_tpu = jax.default_backend() == "tpu"
        want_pallas = self.use_pallas or (self.backend == "auto" and on_tpu)
        if wf:
            # Mosaic lane rule: the (1, h, HW) lse block needs HW % 128 == 0
            # in compiled mode (interpret mode on CPU has no such limit).
            # Small causal frames whose HW divides 128 are LANE-PACKED
            # instead (P frames per 128-lane super-frame — see
            # kernels.nda_pallas.packed_frames), so fmap 8/4 get a real
            # kernel path too.
            packable = (
                self.causal
                and tokens_per_frame < 128
                and 128 % tokens_per_frame == 0
            )
            shape_ok = (
                tokens_per_frame % 128 == 0 or packable or not on_tpu
            )
            pallas_ok = want_pallas and shape_ok
        else:
            # large fmaps: row-blocked kernel (fmap width <= 256)
            from .kernels.nda_pallas import rb_row_block

            R = rb_row_block(self)
            shape_ok = R is not None and (
                (R * self.video_shape[2]) % 128 == 0 or not on_tpu
            )
            pallas_ok = want_pallas and shape_ok
        if want_pallas and not shape_ok:
            mode = "use_pallas=True" if self.use_pallas else "backend='auto'"
            if wf:
                why = (
                    f"tokens_per_frame={tokens_per_frame} fails the Mosaic "
                    f"lane rule (HW % 128 needed) and is not lane-packable "
                    f"(128 % HW == 0 + causal needed)"
                )
            elif R is None:
                why = (
                    f"fmap width {self.video_shape[2]} > 256 has no "
                    f"row-blocked kernel"
                )
            else:
                why = (
                    f"row block R={R} x fmap width {self.video_shape[2]} "
                    f"fails the Mosaic lane rule (R*fw % 128 needed)"
                )
            falls_to = "gather" if drop_active else "dense XLA"
            _warn_dense_fallback(
                f"Sparse3DNA {mode}: {why}, falling back to the {falls_to} "
                f"path — not the Pallas kernel (docs/KERNELS.md)."
            )
        if pallas_ok:
            from .kernels.nda_pallas import sparse_3dna_pallas_vjp

            q_pad = (
                jnp.pad(q, ((0, 0), (0, 0), (0, num_frames * tokens_per_frame - t), (0, 0)))
                if t < num_frames * tokens_per_frame
                else q
            )
            p_sub = {"talking_heads": p["talking_heads"]}
            if self.rel_pos_bias:
                p_sub["rel_pos_bias"] = p["rel_pos_bias"]
            op = sparse_3dna_pallas_vjp(self, num_frames, t)
            if drop_active:
                seed = jax.random.randint(
                    key, (1,), 0, 2**31 - 1, dtype=jnp.int32
                )
                out = op(p_sub, q_pad, k, v, k_bos, v_bos, seed=seed)
            else:
                out = op(p_sub, q_pad, k, v, k_bos, v_bos)
        elif (
            self.backend in ("dense", "dense_chunked")
            or (self.backend == "auto" and tokens_per_frame <= 4096)
        ) and not drop_active:  # the dense XLA path has no dropout
            q_pad = (
                jnp.pad(q, ((0, 0), (0, 0), (0, num_frames * tokens_per_frame - t), (0, 0)))
                if t < num_frames * tokens_per_frame
                else q
            )
            axials = p["rel_pos_bias"]["axials"] if self.rel_pos_bias else None
            fh = self.video_shape[1]
            if self.backend != "dense_chunked" and tokens_per_frame <= 256:
                out = _dense_tap_attend(
                    self, q_pad, k, v, k_bos, v_bos, num_frames, t, axials,
                    p["talking_heads"],
                )
            else:
                # large fmaps: row-chunked key windows keep scores bounded
                row_chunk = next(
                    (r for r in range(max(1, 256 // self.video_shape[2]), 0, -1)
                     if fh % r == 0),
                    1,
                )
                out = _dense_tap_attend_chunked(
                    self, q_pad, k, v, k_bos, v_bos, num_frames, t, axials,
                    p["talking_heads"], row_chunk,
                )
        else:
            # coordinate-keyed dropout masks (shard-layout independent —
            # exactly what context_parallel_sparse_3dna regenerates)
            drop_ids = None
            if drop_active:
                seed = jax.random.randint(
                    key, (1,), 0, 2**31 - 1, dtype=jnp.int32
                )
                drop_ids = (seed[0], jnp.arange(t), idx)
            chunk_frames = self.query_num_frames_chunk
            if chunk_frames is None or chunk_frames >= num_frames:
                k_nb = gather_neighbors(k, idx)
                v_nb = gather_neighbors(v, idx)
                out = _nda_attend(
                    q, k_nb, v_nb, valid, k_bos, v_bos, rel_bias,
                    p["talking_heads"], self.dropout, None,
                    drop_ids=drop_ids,
                )
            else:
                out = self._chunked_attend(
                    p, q, k, v, valid, idx, k_bos, v_bos, rel_bias,
                    drop_ids,
                )

        out = jnp.concatenate([bos_v_out, out], axis=2)
        return Dense(self.inner_dim, self.dim, use_bias=True)(
            p["to_out"], merge_heads(out)
        )

    def _chunked_attend(self, p, q, k, v, valid, idx, k_bos, v_bos, rel_bias,
                        drop_ids=None):
        """Frame-chunked queries bound peak memory (reference :566-604),
        expressed as a python loop over static chunks (unrolled under jit —
        each chunk's gather stays small)."""
        tokens_per_frame = self.video_shape[1] * self.video_shape[2]
        chunk = self.query_num_frames_chunk * tokens_per_frame
        t = q.shape[2]
        outs = []
        for start in range(0, t, chunk):
            size = min(chunk, t - start)
            q_c = q[:, :, start : start + size]
            idx_c = idx[start : start + size]
            valid_c = valid[start : start + size]
            ids_c = None
            if drop_ids is not None:
                seed, q_ids, k_ids = drop_ids
                ids_c = (
                    seed,
                    q_ids[start : start + size],
                    k_ids[start : start + size],
                )
            k_nb = gather_neighbors(k, idx_c)
            v_nb = gather_neighbors(v, idx_c)
            outs.append(
                _nda_attend(
                    q_c, k_nb, v_nb, valid_c, k_bos, v_bos, rel_bias,
                    p["talking_heads"], self.dropout, None,
                    drop_ids=ids_c,
                )
            )
        return jnp.concatenate(outs, axis=2)


# ---------------------------------------------------------------------------
# SparseCausal2DNA (audio)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SparseCausal2DNA(Module):
    """Causal nearby attention for audio tokens laid out (time, height).

    Parity: reference ``SparseCausal2DNA`` (nuwa_pytorch.py:615-759). Each
    query attends every token of the K dilated past timesteps (the kernel
    spans the full height axis). Single fused qkv projection, bos
    out-of-band, optional per-kernel-position axial bias.
    """

    dim: int
    height: int = 1  # tokens per timestep
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    kernel_size: int = 5
    dilation: int = 1
    rel_pos_bias: bool = False
    use_pallas: bool = False
    backend: str = "auto"  # 'auto' | 'gather'; auto = Pallas on TPU

    @property
    def causal(self):
        return True  # causal by construction (the kernel wrappers read this)

    @property
    def inner_dim(self):
        return self.heads * self.dim_head

    @property
    def kernel_numel(self):
        return self.kernel_size * self.height

    @property
    def bias_module(self):
        return AxialPositionalEmbedding(
            self.heads, shape=(self.kernel_size, self.height)
        )

    def init(self, key):
        ks = jax.random.split(key, 4)
        p = {
            "to_qkv": Dense(self.dim, self.inner_dim * 3).init(ks[0]),
            "to_out": Dense(self.inner_dim, self.dim).init(ks[1]),
            "talking_heads": kaiming_uniform(
                ks[2], (self.heads, self.heads), self.heads
            ),
        }
        if self.rel_pos_bias:
            p["rel_pos_bias"] = self.bias_module.init(ks[3])
        return p

    def __call__(self, p, x, *, key=None, **_):
        b, n, _ = x.shape
        h = self.heads

        t = n - 1
        qkv = lambda inp: jnp.split(
            Dense(self.dim, self.inner_dim * 3)(p["to_qkv"], inp), 3, axis=-1
        )
        if t == 0:
            _, _, v = qkv(x)
            return Dense(self.inner_dim, self.dim)(p["to_out"], v)

        pad = (-t) % self.height
        x_padded = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
        q, k, v = qkv(x_padded)
        q, k, v = (split_heads(tt, h) for tt in (q, k, v))
        q = q * (self.dim_head**-0.5)

        bos_v_out = v[:, :, :1]
        q = q[:, :, 1 : t + 1]
        k_bos, k = k[:, :, :1], k[:, :, 1:]
        v_bos, v = v[:, :, :1], v[:, :, 1:]

        # fused Pallas path; same auto gating as Sparse3DNA; attention
        # dropout runs in-kernel. Heights whose pseudo-frame lcm(H, 128)
        # fits in 256 tokens run the whole-frame kernels (timestep
        # pseudo-frames, per-tap masks); larger heights (3, 5, 6, …) run the
        # row-blocked kernels (timestep rows, key-row windows). Only heights
        # with lcm(H, 128) > 1024 still fall back to gather (VMEM bound).
        import math as _math

        pseudo_hw = 128 * (self.height // _math.gcd(self.height, 128))
        kernel_ok = pseudo_hw <= 1024
        if pseudo_hw > 256 and kernel_ok:
            # row-blocked territory: the query block is R timesteps; strips
            # much shorter than a block pad up to R and the overcompute eats
            # the kernel's win (measured 0.90x e2e at T=32, R=128) — gather
            # is faster there
            R = pseudo_hw // self.height
            timesteps = -(-t // self.height)
            kernel_ok = timesteps >= R // 2
        want_pallas = self.use_pallas or (
            self.backend == "auto"
            and jax.default_backend() == "tpu"
            and kernel_ok
        )
        if (
            self.backend == "auto"
            and jax.default_backend() == "tpu"
            and not kernel_ok
        ):
            if pseudo_hw > 1024:
                why = (
                    f"height={self.height} has lcm(height, 128) = "
                    f"{pseudo_hw} > 1024"
                )
            else:
                # the short-strip heuristic tripped, not a hard shape limit —
                # gather measured faster (pad-to-R overcompute, 0.90x at T=32)
                why = (
                    f"strip of {-(-t // self.height)} timesteps is shorter "
                    f"than half a row block (R={pseudo_hw // self.height}) — "
                    f"gather measured faster at this length"
                )
            _warn_dense_fallback(
                f"SparseCausal2DNA backend='auto': {why}, using the gather "
                f"path (docs/KERNELS.md)."
            )
        if want_pallas:
            from .kernels.nda_pallas import sparse_2dna_pallas_vjp

            p_sub = {"talking_heads": p["talking_heads"]}
            if self.rel_pos_bias:
                p_sub["rel_pos_bias"] = p["rel_pos_bias"]
            seed = None
            if self.dropout > 0.0 and key is not None:
                seed = jax.random.randint(
                    key, (1,), 0, 2**31 - 1, dtype=jnp.int32
                )
            out = sparse_2dna_pallas_vjp(self, t)(
                p_sub, q, k, v, k_bos, v_bos, seed=seed
            )
            out = jnp.concatenate([bos_v_out, out], axis=2)
            return Dense(self.inner_dim, self.dim)(p["to_out"], merge_heads(out))

        timesteps = (t + pad) // self.height
        idx_np, valid_np = build_nda_indices(
            (timesteps, self.height),
            (self.kernel_size, self.height),
            (self.dilation, 1),
            ("causal", "full"),
        )
        idx_np, valid_np = idx_np[:t], valid_np[:t]
        if pad:
            valid_np = valid_np & (idx_np < t)
        idx = jnp.asarray(idx_np)
        valid = jnp.asarray(valid_np)

        rel_bias = None
        if self.rel_pos_bias:
            rel_bias = self.bias_module(p["rel_pos_bias"]).T  # (heads, Kn)

        k_nb = gather_neighbors(k, idx)
        v_nb = gather_neighbors(v, idx)
        out = _nda_attend(
            q, k_nb, v_nb, valid, k_bos, v_bos, rel_bias,
            p["talking_heads"], self.dropout, key,
        )
        out = jnp.concatenate([bos_v_out, out], axis=2)
        return Dense(self.inner_dim, self.dim)(p["to_out"], merge_heads(out))


# ---------------------------------------------------------------------------
# SparseCross2DNA (video -> sketch context)
# ---------------------------------------------------------------------------


@_functools.lru_cache(maxsize=None)
def _cross_dense_mask(fmap, kernel_size, dilation, num_ctx_frames):
    """(HW, Fc·HW) bool: query i may attend context col j (centered kernel
    neighborhood around i's spatial position, replicated per context frame)."""
    hw = fmap * fmap
    idx_np, valid_np = build_nda_indices(
        (fmap, fmap),
        (kernel_size, kernel_size),
        (dilation, dilation),
        ("centered", "centered"),
    )
    frame = np.zeros((hw, hw), dtype=bool)
    rows = np.arange(hw)
    for kk in range(idx_np.shape[1]):
        sel = valid_np[:, kk]
        frame[rows[sel], idx_np[sel, kk]] = True
    return np.tile(frame, (1, num_ctx_frames))


@dataclass(frozen=True)
class SparseCross2DNA(Module):
    """Cross attention from video queries to a per-frame 2D spatial
    neighborhood of the context (sketch) tokens, plus null k/v.

    Parity: reference ``SparseCross2DNA`` (nuwa_pytorch.py:761-901). A query
    at spatial (y, x) — any frame — attends the centered kernel neighborhood
    around (y, x) in *every* context frame; <bos> attends the full context.
    """

    dim: int
    image_size: int  # fmap size of the context frames
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    kernel_size: int = 3
    dilation: int = 1
    # 'pallas': the fused whole-frame kernel in fixed-taps mode (context
    # frames in VMEM, one score/softmax/mix/PV pass — the fast path; a
    # runtime context mask rides in as an additive tensor, so CFG
    # cond-dropout / padded sketch frames stay on the kernel); 'gather'
    # builds per-query neighborhoods (useful-FLOPs-only but overhead-bound
    # on TPU); 'dense' does masked dense scores over the whole context in
    # XLA (measured ~1x vs gather on chip — kept as an oracle; see
    # scripts/bench_cross_2dna.py). 'auto' = pallas on TPU when eligible
    # (HW % 128 == 0, whole context frames, no attention dropout), else
    # gather.
    backend: str = "auto"  # 'auto' | 'pallas' | 'dense' | 'gather'
    use_pallas: bool = False  # force the kernel (tests/interpret mode)

    @property
    def inner_dim(self):
        return self.heads * self.dim_head

    @property
    def kernel_numel(self):
        return self.kernel_size * self.kernel_size

    def init(self, key):
        ks = jax.random.split(key, 6)
        return {
            "to_q": Dense(self.dim, self.inner_dim).init(ks[0]),
            "to_kv": Dense(self.dim, self.inner_dim * 2).init(ks[1]),
            "to_out": Dense(self.inner_dim, self.dim).init(ks[2]),
            "null_k": normal_init(ks[3], (self.heads, 1, self.dim_head)),
            "null_v": normal_init(ks[4], (self.heads, 1, self.dim_head)),
            "talking_heads": kaiming_uniform(
                ks[5], (self.heads, self.heads), self.heads
            ),
        }

    def __call__(self, p, x, *, context, context_mask=None, key=None, **_):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        fmap = self.image_size
        tokens_per_frame = fmap * fmap
        context_len = context.shape[1]
        num_ctx_frames = context_len // tokens_per_frame

        mask_provided = context_mask is not None
        if context_mask is None:
            context_mask = jnp.ones((b, context_len), dtype=bool)

        q = Dense(self.dim, self.inner_dim)(p["to_q"], x)
        kv = Dense(self.dim, self.inner_dim * 2)(p["to_kv"], context)
        k, v = jnp.split(kv, 2, axis=-1)
        q, k, v = (split_heads(tt, h) for tt in (q, k, v))
        q = q * (dh**-0.5)

        null_k = jnp.broadcast_to(p["null_k"].astype(k.dtype), (b, h, 1, dh))
        null_v = jnp.broadcast_to(p["null_v"].astype(v.dtype), (b, h, 1, dh))
        neg = max_neg_value(jnp.float32)

        # --- bos query: full attention over [null, context] (:828-844)
        q_bos = q[:, :, 0]
        k_full = jnp.concatenate([null_k, k], axis=2)
        v_full = jnp.concatenate([null_v, v], axis=2)
        sim_bos = jnp.einsum("bhd,bhjd->bhj", q_bos, k_full)
        bos_mask = jnp.pad(context_mask, ((0, 0), (1, 0)), constant_values=True)
        sim_bos = masked_fill(sim_bos, ~bos_mask[:, None, :], neg)
        attn_bos = stable_softmax(sim_bos, axis=-1).astype(v_full.dtype)
        out_bos = jnp.einsum("bhj,bhjd->bhd", attn_bos, v_full)[:, :, None]

        t = n - 1
        if t == 0:
            return Dense(self.inner_dim, self.dim)(p["to_out"], merge_heads(out_bos))
        q = q[:, :, 1:]

        # Mosaic lane rule: the (1, h, HW) lse block needs HW % 128 == 0 in
        # compiled mode only (interpret mode on CPU has no such limit). A
        # runtime context mask (CFG cond dropout / padded sketch frames)
        # rides into the kernel as an additive (b, Lc) tensor.
        on_tpu = jax.default_backend() == "tpu"
        from .kernels.nda_pallas import xfused_ok

        # dropout needs the fused single-block kernels (absolute-coordinate
        # in-kernel masks); the per-frame fallback kernels are dropout-free
        drop_active = self.dropout > 0.0 and key is not None
        pallas_ok = (
            (self.use_pallas or (self.backend in ("auto", "pallas") and on_tpu))
            and (tokens_per_frame % 128 == 0 or not on_tpu)
            and context_len % tokens_per_frame == 0
            and (self.dropout == 0.0 or xfused_ok(self, t, context_len))
        )
        if pallas_ok:
            from .kernels.nda_pallas import sparse_cross_2dna_pallas_vjp

            seed = None
            if drop_active:
                seed = jax.random.randint(
                    key, (1,), 0, 2**31 - 1, dtype=jnp.int32
                )
            op = sparse_cross_2dna_pallas_vjp(self, t, context_len)
            out = op(
                {"talking_heads": p["talking_heads"]}, q, k, v, null_k, null_v,
                cmask=context_mask if mask_provided else None,
                seed=seed,
            )
            out = jnp.concatenate([out_bos, out.astype(out_bos.dtype)], axis=2)
            return Dense(self.inner_dim, self.dim)(p["to_out"], merge_heads(out))

        # --- spatial neighborhood table over one frame (centered)
        idx_np, valid_np = build_nda_indices(
            (fmap, fmap),
            (self.kernel_size, self.kernel_size),
            (self.dilation, self.dilation),
            ("centered", "centered"),
        )  # (HW, Kn)

        use_dense = self.backend == "dense"
        if use_dense:
            out = self._dense_attend(
                p, q, k, v, null_k, null_v, idx_np, valid_np,
                context_mask, tokens_per_frame, num_ctx_frames, t, key,
            )
            out = jnp.concatenate([out_bos, out], axis=2)
            return Dense(self.inner_dim, self.dim)(p["to_out"], merge_heads(out))

        idx = jnp.asarray(idx_np)
        valid = jnp.asarray(valid_np)

        # gather per-frame neighborhoods: k (b,h,Fc,HW,d) -> (b,h,HW,Fc*Kn,d)
        kf = k.reshape(b, h, num_ctx_frames, tokens_per_frame, dh)
        vf = v.reshape(b, h, num_ctx_frames, tokens_per_frame, dh)
        k_nb = jnp.take(kf, idx, axis=3)  # (b,h,Fc,HW,Kn,d)
        v_nb = jnp.take(vf, idx, axis=3)
        k_nb = k_nb.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h, tokens_per_frame, num_ctx_frames * self.kernel_numel, dh
        )
        v_nb = v_nb.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h, tokens_per_frame, num_ctx_frames * self.kernel_numel, dh
        )

        # context validity: in-bounds neighborhood AND context_mask
        cm = context_mask.reshape(b, num_ctx_frames, tokens_per_frame)
        cm_nb = jnp.take(cm, idx, axis=2)  # (b,Fc,HW,Kn)
        cm_nb = cm_nb & valid[None, None]
        cm_nb = cm_nb.transpose(0, 2, 1, 3).reshape(
            b, tokens_per_frame, num_ctx_frames * self.kernel_numel
        )

        # queries padded to full frames; every frame shares the same keys
        pad = (-t) % tokens_per_frame
        if pad:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        fq = q.shape[2] // tokens_per_frame
        q = q.reshape(b, h, fq, tokens_per_frame, dh)

        sim = jnp.einsum("bhfid,bhijd->bhfij", q, k_nb)
        sim_null = jnp.einsum("bhfid,bhd->bhfi", q, null_k[:, :, 0])[..., None]
        sim = masked_fill(sim, ~cm_nb[:, None, None, :, :], neg)
        sim = jnp.concatenate([sim_null, sim], axis=-1)

        attn = stable_softmax(sim, axis=-1)
        attn = jnp.einsum("bhfij,gh->bgfij", attn, p["talking_heads"].astype(attn.dtype))
        attn = dropout(attn, self.dropout, key)
        attn = attn.astype(v_nb.dtype)

        attn_null, attn = attn[..., :1], attn[..., 1:]
        out = jnp.einsum("bhfij,bhijd->bhfid", attn, v_nb)
        out = out + attn_null * null_v[:, :, None]
        out = out.reshape(b, h, fq * tokens_per_frame, dh)[:, :, :t]

        out = jnp.concatenate([out_bos, out], axis=2)
        return Dense(self.inner_dim, self.dim)(p["to_out"], merge_heads(out))

    def _dense_attend(self, p, q, k, v, null_k, null_v, idx_np, valid_np,
                      context_mask, hw, num_ctx_frames, t, key):
        """Masked dense scores over the whole context: one (HW, Fc·HW) static
        neighborhood mask shared by every query frame — all-MXU score/PV
        matmuls, no gathers or 6-D transposes. Kept as a selectable oracle:
        on chip it measured 0.87-0.98x vs the gather path (the ~HW/Kn score
        overcompute costs more than the gathers it removes;
        scripts/bench_cross_2dna.py) — the fused Pallas fixed-taps kernel is
        the fast path."""
        b = q.shape[0]
        h, dh = self.heads, self.dim_head
        neg = max_neg_value(jnp.float32)

        allowed = _cross_dense_mask(
            self.image_size, self.kernel_size, self.dilation, num_ctx_frames
        )  # np bool (HW, Fc·HW)

        pad = (-t) % hw
        if pad:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        fq = q.shape[2] // hw
        q = q.reshape(b, h, fq, hw, dh)

        sim = jnp.einsum("bhfid,bhjd->bhfij", q, k)
        sim_null = jnp.einsum("bhfid,bhd->bhfi", q, null_k[:, :, 0])[..., None]
        ok = jnp.asarray(allowed)[None, :, :] & context_mask[:, None, :]
        sim = masked_fill(sim, ~ok[:, None, None], neg)
        sim = jnp.concatenate([sim_null, sim], axis=-1)

        attn = stable_softmax(sim, axis=-1)
        attn = jnp.einsum(
            "bhfij,gh->bgfij", attn, p["talking_heads"].astype(attn.dtype)
        )
        attn = dropout(attn, self.dropout, key)
        attn = attn.astype(v.dtype)

        attn_null, attn = attn[..., :1], attn[..., 1:]
        out = jnp.einsum("bhfij,bhjd->bhfid", attn, v)
        out = out + attn_null * null_v[:, :, None]
        return out.reshape(b, h, fq * hw, dh)[:, :, :t]
