"""Context/sequence parallelism for Sparse3DNA: shard the frame axis.

SURVEY §2.8: the 3DNA neighborhood is local along frames (lookback
(Kf-1)·dilation frames), so context parallelism is a *halo exchange* — each
shard sends its trailing lookback frames to the next device over ICI
(`lax.ppermute`) instead of ring-attention over full sequences. Cross
attention to short text context stays replicated.

``context_parallel_sparse_3dna`` runs one Sparse3DNA layer over a
frame-sharded token sequence inside ``shard_map``; multi-hop halos cover
lookbacks larger than a shard.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.layers import Dense
from ..nda import Sparse3DNA, _nda_attend, build_nda_indices
from ..ops.attention import merge_heads, split_heads


def context_parallel_sparse_3dna(
    mod: Sparse3DNA, p, x, mesh: Mesh, axis: str = "data"
):
    """x: (b, 1 + t, dim) replicated-batch input whose *video tokens* get
    sharded over ``axis`` along the frame dimension. Returns the same output
    as ``mod(p, x)`` (causal mode). Partial trailing frames (e.g. the
    teacher-forced shift, t = F*HW - 1) are zero-padded to a full frame and
    phantom positions are masked out of every neighborhood."""
    assert mod.causal, "context parallelism implemented for the causal decoder"
    nd = mesh.shape[axis]
    F, fh, fw = mod.video_shape
    HW = fh * fw
    b, n, dim = x.shape
    t = n - 1
    # pad to a whole number of frames per shard (phantom frames are masked
    # out of every neighborhood below and sliced off the output) — frame
    # counts need not divide the shard count
    F_cur = -(-t // HW)
    Floc = -(-F_cur // nd)
    F_cur = Floc * nd
    pad_t = F_cur * HW - t
    if pad_t:
        x = jnp.concatenate(
            [x, jnp.zeros((b, pad_t, dim), x.dtype)], axis=1
        )
    kf, kh, kw = mod.kernel
    df, dh_, dw = mod.dilations
    LB = (kf - 1) * df
    hops = -(-LB // Floc)

    h, dh = mod.heads, mod.dim_head

    # static neighbor table over an (LB + Floc)-frame local grid, queries at
    # local frames [LB, LB + Floc) — the kv buffer carries exactly the
    # lookback-window halo, however many ppermute hops it took to collect
    idx_np, valid_np = build_nda_indices(
        (LB + Floc, fh, fw), mod.kernel, mod.dilations, ("causal",) * 3
    )
    pad_f = LB  # frames of halo prepended to each shard
    q_rows = slice(pad_f * HW, (pad_f + Floc) * HW)
    idx_local = jnp.asarray(idx_np[q_rows])
    valid_local = jnp.asarray(valid_np[q_rows])
    # global-frame index of each neighbor, relative to the shard start
    nb_frame_rel = jnp.asarray(idx_np[q_rows] // HW - pad_f)  # may be negative
    nb_within = jnp.asarray(idx_np[q_rows] % HW)

    x_bos = x[:, :1]
    x_video = x[:, 1:]

    pspec = jax.tree.map(lambda _: P(), p)

    def local_fn(p, xv, xb):
        # xv: (b, Floc*HW, dim) local shard; xb: (b, 1, dim) replicated
        d_idx = jax.lax.axis_index(axis)
        # (h, Kn) — computed in-scope: shard_map forbids closed-over tracers
        rel_bias = mod.bias_module(p["rel_pos_bias"]).T if mod.rel_pos_bias else None

        q = Dense(mod.dim, mod.inner_dim)(p["to_q"], xv)
        kv = Dense(mod.dim, mod.inner_dim * 2)(p["to_kv"], xv)
        k, v = jnp.split(kv, 2, axis=-1)
        kv_bos = Dense(mod.dim, mod.inner_dim * 2)(p["to_kv"], xb)
        k_bos, v_bos = jnp.split(kv_bos, 2, axis=-1)

        q, k, v = (split_heads(tt, h) for tt in (q, k, v))
        k_bos, v_bos = split_heads(k_bos, h), split_heads(v_bos, h)
        q = q * (dh**-0.5)

        # multi-hop halo: hop g brings the local kv of device (i - g);
        # ppermute perm pairs are (source, destination)
        def shift_right(t_):
            return jax.lax.ppermute(
                t_, axis, [(i, (i + 1) % nd) for i in range(nd)]
            )

        if hops == 1 and LB < Floc:
            # single hop: ship only the trailing lookback frames the
            # neighbor reads, not the whole shard (ICI traffic LB/Floc)
            halo_k = [shift_right(k[:, :, (Floc - LB) * HW :])]
            halo_v = [shift_right(v[:, :, (Floc - LB) * HW :])]
        else:
            # multi-hop relay ships whole shards (intermediate shards are
            # fully inside the lookback); trim the concatenation below
            halo_k, halo_v = [], []
            kk, vv = k, v
            for g in range(hops):
                kk = shift_right(kk)
                vv = shift_right(vv)
                halo_k.insert(0, kk)
                halo_v.insert(0, vv)
        k_full = jnp.concatenate(halo_k + [k], axis=2)
        v_full = jnp.concatenate(halo_v + [v], axis=2)
        extra = k_full.shape[2] - (LB + Floc) * HW
        if extra:
            # drop halo frames beyond the lookback window
            k_full = k_full[:, :, extra:]
            v_full = v_full[:, :, extra:]

        # validity: static in-bounds AND neighbor's global frame >= 0 AND
        # the neighbor is a real (non-phantom-padded) token
        global_nb_frame = nb_frame_rel + d_idx * Floc
        valid = valid_local & (global_nb_frame >= 0)
        if pad_t:
            valid = valid & (global_nb_frame * HW + nb_within < t)

        k_nb = jnp.take(k_full, idx_local, axis=2)
        v_nb = jnp.take(v_full, idx_local, axis=2)
        out = _nda_attend(
            q, k_nb, v_nb, valid, k_bos, v_bos, rel_bias, p["talking_heads"]
        )
        return merge_heads(out)

    out_video = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(pspec, P(None, axis, None), P()),
        out_specs=P(None, axis, None),
    )(p, x_video, x_bos)

    # bos adopts its own value
    kv_bos = Dense(mod.dim, mod.inner_dim * 2)(p["to_kv"], x_bos)
    _, v_bos = jnp.split(kv_bos, 2, axis=-1)
    out = jnp.concatenate([v_bos, out_video], axis=1)
    if pad_t:
        out = out[:, : 1 + t]
    return Dense(mod.inner_dim, mod.dim, use_bias=True)(p["to_out"], out)
