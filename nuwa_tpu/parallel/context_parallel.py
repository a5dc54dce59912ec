"""Context/sequence parallelism for Sparse3DNA: shard the frame axis.

SURVEY §2.8: the 3DNA neighborhood is local along frames (lookback
(Kf-1)·dilation frames; centered kernels also look *ahead* half of that),
so context parallelism is a *halo exchange* — each shard sends its trailing
lookback frames to the next device (and, centered, its leading lookahead
frames to the previous device) over ICI (`lax.ppermute`) instead of
ring-attention over full sequences. Cross attention to short text context
stays replicated.

``context_parallel_sparse_3dna`` runs one Sparse3DNA layer over a
frame-sharded token sequence inside ``shard_map``; multi-hop halos cover
lookbacks larger than a shard. Composes with data parallelism on a
('data', …, 'context') mesh: pass ``data_axis`` and the batch dimension is
sharded too, so the layers *outside* the attention shard_map stop being
replicated (VERDICT r3 #3c). Attention dropout works under CP: masks are
keyed by absolute (batch, head, query-token, key-token) coordinates
(`nda._coord_keep_mask`), so the realized masks are independent of the
shard layout and exactly match the unsharded gather path given the same
key.
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
    mod: Sparse3DNA, p, x, mesh: Mesh, axis: str = "data", *,
    key=None, data_axis=None,
):
    """x: (b, 1 + t, dim) input whose *video tokens* get sharded over
    ``axis`` along the frame dimension (and whose batch is sharded over
    ``data_axis`` when given). Returns the same output as ``mod(p, x)``.
    Causal kernels exchange a backward (lookback) halo only; centered
    kernels (the sketch encoder) exchange halos in both directions.
    Partial trailing frames (e.g. the teacher-forced shift, t = F*HW - 1)
    are zero-padded to a full frame and phantom positions are masked out of
    every neighborhood."""
    nd = mesh.shape[axis]
    F, fh, fw = mod.video_shape
    HW = fh * fw
    b, n, dim = x.shape
    t = n - 1
    if data_axis is not None:
        assert b % mesh.shape[data_axis] == 0, (
            f"batch {b} not divisible by mesh axis "
            f"{data_axis}={mesh.shape[data_axis]}"
        )
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
    if mod.causal:
        LB = (kf - 1) * df          # lookback frames
        RBf = 0                     # lookahead frames
        modes = ("causal",) * 3
    else:
        LB = ((kf - 1) // 2) * df
        RBf = (kf - 1) * df - LB
        modes = ("centered",) * 3
    hops_b = -(-LB // Floc)
    hops_f = -(-RBf // Floc)

    h, dh = mod.heads, mod.dim_head

    # static neighbor table over an (LB + Floc + RBf)-frame local grid,
    # queries at local frames [LB, LB + Floc) — the kv buffer carries
    # exactly the lookback/lookahead-window halo, however many ppermute
    # hops it took to collect
    idx_np, valid_np = build_nda_indices(
        (LB + Floc + RBf, fh, fw), mod.kernel, mod.dilations, modes
    )
    q_rows = slice(LB * HW, (LB + Floc) * HW)
    idx_local = jnp.asarray(idx_np[q_rows])
    valid_local = jnp.asarray(valid_np[q_rows])
    # global-frame index of each neighbor, relative to the shard start
    nb_frame_rel = jnp.asarray(idx_np[q_rows] // HW - LB)  # may be negative
    nb_within = jnp.asarray(idx_np[q_rows] % HW)

    drop_active = mod.dropout > 0.0 and key is not None
    # same seed derivation as the unsharded gather path (nda.py), so
    # CP-with-dropout is bit-identical to the unsharded forward
    seed = (
        jax.random.randint(key, (1,), 0, 2**31 - 1, dtype=jnp.int32)
        if drop_active
        else jnp.zeros((1,), jnp.int32)
    )

    x_bos = x[:, :1]
    x_video = x[:, 1:]

    pspec = jax.tree.map(lambda _: P(), p)

    def local_fn(p, xv, xb, seed):
        # xv: (b_loc, Floc*HW, dim) local shard; xb: (b_loc, 1, dim)
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

        # halos: hop g of shift_right brings the local kv of device (i - g);
        # shift_left brings device (i + g). ppermute pairs are (src, dst).
        def shift_right(t_):
            return jax.lax.ppermute(
                t_, axis, [(i, (i + 1) % nd) for i in range(nd)]
            )

        def shift_left(t_):
            return jax.lax.ppermute(
                t_, axis, [(i, (i - 1) % nd) for i in range(nd)]
            )

        if hops_b == 0:
            halo_k, halo_v = [], []
        elif hops_b == 1 and LB < Floc:
            # single hop: ship only the trailing lookback frames the
            # neighbor reads, not the whole shard (ICI traffic LB/Floc)
            halo_k = [shift_right(k[:, :, (Floc - LB) * HW :])]
            halo_v = [shift_right(v[:, :, (Floc - LB) * HW :])]
        else:
            # multi-hop relay ships whole shards (intermediate shards are
            # fully inside the lookback); trim the concatenation below
            halo_k, halo_v = [], []
            kk, vv = k, v
            for g in range(hops_b):
                kk = shift_right(kk)
                vv = shift_right(vv)
                halo_k.insert(0, kk)
                halo_v.insert(0, vv)
        if hops_f == 0:
            fwd_k, fwd_v = [], []
        elif hops_f == 1 and RBf < Floc:
            # lookahead: ship only the leading frames backward
            fwd_k = [shift_left(k[:, :, : RBf * HW])]
            fwd_v = [shift_left(v[:, :, : RBf * HW])]
        else:
            fwd_k, fwd_v = [], []
            kk, vv = k, v
            for g in range(hops_f):
                kk = shift_left(kk)
                vv = shift_left(vv)
                fwd_k.append(kk)
                fwd_v.append(vv)
        k_full = jnp.concatenate(halo_k + [k] + fwd_k, axis=2)
        v_full = jnp.concatenate(halo_v + [v] + fwd_v, axis=2)
        # trim halo frames beyond the window: extra lookback from the
        # front, extra lookahead from the back
        back_len = sum(a.shape[2] for a in halo_k)
        start = back_len - LB * HW
        k_full = k_full[:, :, start : start + (LB + Floc + RBf) * HW]
        v_full = v_full[:, :, start : start + (LB + Floc + RBf) * HW]

        # validity: static in-bounds AND neighbor's global frame within the
        # real sequence (ring wrap-around and phantom padding masked)
        global_nb_frame = nb_frame_rel + d_idx * Floc
        nb_tok = global_nb_frame * HW + nb_within
        valid = valid_local & (global_nb_frame >= 0) & (nb_tok < t)

        k_nb = jnp.take(k_full, idx_local, axis=2)
        v_nb = jnp.take(v_full, idx_local, axis=2)
        drop_ids = None
        b_base = 0
        if drop_active:
            q_ids = d_idx * (Floc * HW) + jnp.arange(Floc * HW)
            drop_ids = (seed[0], q_ids, nb_tok)
            if data_axis is not None:
                b_base = jax.lax.axis_index(data_axis) * xv.shape[0]
        out = _nda_attend(
            q, k_nb, v_nb, valid, k_bos, v_bos, rel_bias, p["talking_heads"],
            mod.dropout if drop_active else 0.0, None,
            drop_ids=drop_ids, b_base=b_base,
        )
        return merge_heads(out)

    out_video = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            pspec,
            P(data_axis, axis, None),
            P(data_axis, None, None),
            P(),
        ),
        out_specs=P(data_axis, axis, None),
    )(p, x_video, x_bos, seed)

    # bos adopts its own value
    kv_bos = Dense(mod.dim, mod.inner_dim * 2)(p["to_kv"], x_bos)
    _, v_bos = jnp.split(kv_bos, 2, axis=-1)
    out = jnp.concatenate([v_bos, out_video], axis=1)
    if pad_t:
        out = out[:, : 1 + t]
    return Dense(mod.inner_dim, mod.dim, use_bias=True)(p["to_out"], out)
