"""GPipe-style pipeline parallelism for the Transformer stack.

The reference is single-device (SURVEY §2.8 — no torch.distributed
anywhere); DP/TP/CP cover its training surface, and pipeline parallelism is
the remaining axis for scaling *depth* past one chip's HBM. TPU-native
recipe (the scaling-book pipelining chapter): put the stack's stages on a
'pipe' mesh axis, run one SPMD program where every device executes its own
stage each step, and shift activations to the next stage over ICI with
``lax.ppermute`` inside a ``lax.scan`` over microbatches. XLA sees a single
compiled loop; reverse-mode autodiff transposes the ppermutes, so the
backward pipeline (cotangents flowing stage S-1 → 0) falls out of
``jax.grad`` with no hand-written schedule.

SPMD constraint: every stage must run the *same program*, so the layer menu
must be stage-periodic — stage s's (kind, module) slice must equal stage
0's. With the usual dilation cycling this holds whenever ``depth`` is a
multiple of ``n_stages * len(dilations)`` (modules are frozen dataclasses,
so equality is a static-config check at trace time).

Schedule: plain GPipe — M microbatches through S stages in M + S - 1 steps,
bubble fraction (S-1)/(M+S-1). Bubble steps compute on garbage (standard
SPMD pipelining); their results are never selected into the output buffer,
so no gradient flows from them.

Two entry points share the ``_gpipe`` scaffolding: ``pipelined_transformer``
(single activation stream) and ``pipelined_dual_decoder`` (the video+audio
pair rides the pipeline together, so the cross-modality exchange blocks
always find both streams on the same stage device).

Reversible stacks pipeline too: the GPipe carry simply becomes the
reversible stream *pair* (x1, x2) — or the quad (v1, v2, a1, a2) for the
dual decoder — duplicated at stage 0 and averaged after stage S-1, and each
stage runs its couple slice through the O(1)-memory ``custom_vjp`` runner
(``reversible.make_reversible_sequence`` /
``reversible_dual.make_dual_reversible_sequence``). The scan over
microbatch steps then stores only the per-step stream carries; within a
stage the backward reconstructs activations couple-by-couple, so PP no
longer forces the remat-instead-of-reversible trade (measured 1.44× step
tax on the flagship, docs/BENCHMARKS.md "What PP buys").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.layers import StableLayerNorm


def _validate_menu(menu, n_stages: int) -> int:
    """Check a static layer menu splits into ``n_stages`` statically
    identical stages; returns the per-stage menu length. Menu entries are
    tuples whose leading elements are (kind, module(s)) — modules are frozen
    dataclasses, so equality is a static-config comparison."""
    if len(menu) % n_stages:
        raise ValueError(
            f"menu of {len(menu)} layer entries does not split into "
            f"{n_stages} stages"
        )
    L = len(menu) // n_stages
    base = menu[:L]
    for s in range(1, n_stages):
        for j, (e0, e1) in enumerate(zip(base, menu[s * L : (s + 1) * L])):
            if e0[0] != e1[0] or e0[1] != e1[1]:
                raise ValueError(
                    f"stage {s} entry {j} ({e1[0]}: {e1[1]}) differs from "
                    f"stage 0 ({e0[0]}: {e0[1]}) — pipeline stages must be "
                    f"statically identical (depth must be a multiple of "
                    f"n_stages x the schedule cycle)"
                )
    return L


def validate_stages(transformer, n_stages: int) -> int:
    """Check the layer menu splits into ``n_stages`` statically identical
    stages; returns the per-stage menu length."""
    return _validate_menu(transformer.layer_menu, n_stages)


def stage_param_slots(transformer, n_stages: int) -> int:
    """Per-stage *param-slot* count — what ``p['layers']`` is indexed by:
    menu entries for a plain ``Transformer``, (f, g) couples for a
    ``ReversibleTransformer`` (whose params are per-couple, shorter than the
    menu). Validates stage-periodicity either way."""
    from ..transformer import ReversibleTransformer

    if isinstance(transformer, ReversibleTransformer):
        couples = transformer._couples()
        # wrap each couple whole so _validate_menu's (e[0], e[1]) compare
        # covers (f_mod, f_route, g_mod, g_route) in one shot
        return _validate_menu(tuple(("couple", c) for c in couples), n_stages)
    return validate_stages(transformer, n_stages)


def validate_dual_stages(decoder, n_stages: int) -> int:
    """Stage-periodicity check for the dual decoder's quad-stream schedule
    (self / cross / every-k xmod blocks): ``depth`` must be a multiple of
    ``n_stages * lcm(cross_modality_attn_every, dilation cycles)`` so every
    stage carries the same (kind, modules) slice."""
    return _validate_menu(decoder.blocks(), n_stages)


def stack_stage_params(layer_params, n_stages: int):
    """[depth-menu params] -> list of per-stage-slot params with a leading
    (n_stages,) axis on every leaf, ready to shard over the 'pipe' axis."""
    L = len(layer_params) // n_stages
    stages = [list(layer_params[s * L : (s + 1) * L]) for s in range(n_stages)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)


def unstack_stage_params(stacked):
    """Inverse of ``stack_stage_params``: stacked (S, ...) leaves back to the
    flat per-layer list (stage 0's slots first)."""
    S = jax.tree.leaves(stacked)[0].shape[0]
    layers = []
    for s in range(S):
        layers.extend(jax.tree.map(lambda a: a[s], stacked))
    return layers


def _resolve_stacked(layers, S: int, n_slots: int):
    """Accept layer params either as the flat per-layer list (length
    ``n_slots``, stacked here per-step) or already in the stacked layout
    (``n_slots // S`` slot-trees with leading (S,) leaves). Storing the
    train state pre-stacked and sharded over 'pipe' is what buys PP its
    memory win: params AND optimizer moments hold only 1/S of the stack per
    device (the AdamW update runs shard-local on the stage slice)."""
    L = n_slots // S
    if S > 1 and len(layers) == L:
        lead = {leaf.shape[0] for leaf in jax.tree.leaves(layers)}
        if lead != {S}:
            raise ValueError(
                f"pre-stacked stage params have leading dims {sorted(lead)}; "
                f"expected {S} (= mesh 'pipe' size)"
            )
        return layers
    if len(layers) != n_slots:
        raise ValueError(
            f"{len(layers)} layer param entries: expected {n_slots} (flat) "
            f"or {L} (pre-stacked over {S} stages)"
        )
    return stack_stage_params(layers, S)


def _check_microbatching(mesh, axis, data_axis, b, M):
    """Validate the batch/microbatch split; returns rows per microbatch."""
    if b % M:
        raise ValueError(f"batch {b} not divisible by {M} microbatches")
    mb = b // M
    if data_axis is not None and mb % mesh.shape[data_axis]:
        raise ValueError(
            f"microbatch rows {mb} not divisible by mesh axis "
            f"{data_axis}={mesh.shape[data_axis]}"
        )
    return mb


def _pick(a, i):
    return jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)


def _gpipe(mesh, axis, data_axis, num_microbatches, stacked, streams, opts,
           stage_fn):
    """Shared GPipe scaffolding.

    ``streams``: tuple of (M, mb, ...) microbatched activation arrays — the
      pipeline carry (one for the plain transformer, the (video, audio) pair
      for the dual decoder). Every stream shifts stage→stage together.
    ``opts``: ordered (name, value, PartitionSpec) triples of extra inputs;
      None values are dropped so optionals stay out of the traced signature.
    ``stage_fn(sp, xs, opt, mb_i, s_idx) -> xs``: one stage's computation on
      the stream tuple, given that stage's params ``sp``, the surviving opt
      dict, the microbatch index being processed, and the stage index.

    Returns the stream tuple, each (M, mb, ...), as emitted by stage S-1.
    """
    S = mesh.shape[axis]
    M = num_microbatches
    n = len(streams)
    row_spec = P(None, data_axis) if data_axis is not None else P()
    args = [stacked, *streams]
    specs = [jax.tree.map(lambda _: P(axis), stacked)] + [row_spec] * n
    opt_names = []
    for name, val, spec in opts:
        if val is not None:
            args.append(val)
            specs.append(spec)
            opt_names.append(name)

    def body(stacked_local, *rest):
        xs_m = rest[:n]
        opt = dict(zip(opt_names, rest[n:]))
        sp = jax.tree.map(lambda a: a[0], stacked_local)
        s_idx = jax.lax.axis_index(axis)
        T = M + S - 1

        def step(carry, i):
            acts, outs = carry
            # stage 0 ingests microbatch i; later stages take the activation
            # shifted in from the previous stage
            mb_in = jnp.clip(i, 0, M - 1)
            xs = tuple(
                jnp.where(s_idx == 0, _pick(xm, mb_in), act)
                for xm, act in zip(xs_m, acts)
            )
            my_mb = jnp.clip(i - s_idx, 0, M - 1)
            xs = stage_fn(sp, xs, opt, my_mb, s_idx)
            perm = [(d, d + 1) for d in range(S - 1)]
            acts_next = tuple(jax.lax.ppermute(x, axis, perm) for x in xs)
            out_i = jnp.clip(i - (S - 1), 0, M - 1)
            emit = jnp.logical_and(s_idx == S - 1, i >= S - 1)
            outs = tuple(
                jnp.where(
                    emit,
                    jax.lax.dynamic_update_index_in_dim(ob, x, out_i, 0),
                    ob,
                )
                for ob, x in zip(outs, xs)
            )
            return (acts_next, outs), None

        # the carries become device-varying through the stage compute; mark
        # the (replicated-zero) initial values so scan's carry types match:
        # fresh zeros are invarying everywhere -> cast over all mapped axes;
        # zeros_like(xm) inherits xm's data-varying type -> cast 'pipe' only
        vaxes = (axis,) + ((data_axis,) if data_axis is not None else ())
        acts0 = tuple(
            jax.lax.pcast(jnp.zeros(xm.shape[1:], xm.dtype), vaxes, to="varying")
            for xm in xs_m
        )
        outs0 = tuple(
            jax.lax.pcast(jnp.zeros_like(xm), (axis,), to="varying")
            for xm in xs_m
        )
        (_, outs), _ = jax.lax.scan(
            step, (acts0, outs0), jnp.arange(T), length=T
        )
        # only the last stage holds real outputs; psum broadcasts them
        return tuple(
            jax.lax.psum(
                jnp.where(s_idx == S - 1, ob, jnp.zeros_like(ob)), axis
            )
            for ob in outs
        )

    # Only the pipeline (and PP×DP data) axes are manual; any further mesh
    # axes — e.g. 'model' for PP×TP — stay under GSPMD control inside the
    # body, so tensor-parallel param shardings keep partitioning the stage
    # compute (talking-heads mixing and all) with XLA-inserted collectives.
    manual = frozenset(
        {axis} | ({data_axis} if data_axis is not None else set())
    )
    return shard_map(
        body, mesh=mesh, in_specs=tuple(specs), out_specs=(row_spec,) * n,
        axis_names=manual,
    )(*args)


def pipelined_transformer(
    transformer,
    p,
    x,
    mesh: Mesh,
    *,
    num_microbatches: int,
    axis: str = "pipe",
    data_axis: str | None = None,
    mask=None,
    context=None,
    context_mask=None,
    rotary_pos_emb=None,
    key=None,
):
    """Run ``transformer(p, x, ...)`` pipelined over ``mesh.shape[axis]``
    stages with ``num_microbatches`` microbatches over the batch dim.

    ``data_axis``: optional second mesh axis for PP×DP — each microbatch's
    rows shard over it (params stay replicated across 'data'; shard_map's
    transpose inserts the DP gradient psum, no hand-written all-reduce).

    Matches the plain forward exactly when dropout is off. With dropout,
    per-layer keys are folded with the microbatch index (the unsharded path
    draws one mask over the full batch, so bit-parity across the two
    layouts is not defined there).

    ``ReversibleTransformer`` stacks pipeline with their O(1)-memory
    runtime intact: the carry is the (x1, x2) stream pair and each stage
    runs its couple slice through ``make_reversible_sequence`` (see module
    docstring).
    """
    from ..transformer import ReversibleTransformer

    reversible = isinstance(transformer, ReversibleTransformer)
    S = mesh.shape[axis]
    if reversible:
        couples = transformer._couples()
        L = stage_param_slots(transformer, S)
        stage_couples = couples[:L]
        needs_context = any(
            "context" in c[1] or "context" in c[3] for c in stage_couples
        )
    else:
        L = validate_stages(transformer, S)
        stage_menu = transformer.layer_menu[:L]
        needs_context = any(kind == "cross" for kind, _ in stage_menu)
    if context is None and needs_context:
        raise ValueError(
            "pipelined_transformer: the transformer has cross-attention "
            "layers (cross_attend=True) but no `context=` was given"
        )
    b = x.shape[0]
    M = num_microbatches
    mb = _check_microbatching(mesh, axis, data_axis, b, M)
    if S == 1:  # degenerate: no pipeline, keep the plain path
        return transformer(
            p, x, mask=mask, context=context, context_mask=context_mask,
            rotary_pos_emb=rotary_pos_emb, key=key,
        )

    stacked = _resolve_stacked(p["layers"], S, L * S)

    def mb_split(a):
        return None if a is None else a.reshape(M, mb, *a.shape[1:])

    xm = mb_split(x)
    # (M, mb, ...) microbatched tensors shard their row dim under PP×DP
    row_spec = P(None, data_axis) if data_axis is not None else P()
    opts = [
        ("context", mb_split(context), row_spec),
        ("mask", mb_split(mask), row_spec),
        ("context_mask", mb_split(context_mask), row_spec),
        ("rotary_pos_emb", rotary_pos_emb, P()),
        ("key", key, P()),
    ]

    if reversible:
        from ..reversible import make_reversible_sequence

        run = make_reversible_sequence(stage_couples)

        def rev_stage_fn(sp, xs, opt, mb_i, s_idx):
            x1, x2 = xs
            ctx = {
                name: _pick(opt[name], mb_i)
                for name in ("context", "mask", "context_mask")
                if name in opt
            }
            if "rotary_pos_emb" in opt:
                ctx["rotary_pos_emb"] = opt["rotary_pos_emb"]
            if "key" in opt:
                for j in range(L):
                    lk = jax.random.fold_in(opt["key"], s_idx * L + j)
                    lk = jax.random.fold_in(lk, mb_i)
                    if data_axis is not None:
                        lk = jax.random.fold_in(
                            lk, jax.lax.axis_index(data_axis)
                        )
                    ctx[f"key{j}f"], ctx[f"key{j}g"] = jax.random.split(lk)
            return run(sp, x1, x2, ctx)

        # the two reversible streams ride the pipeline together, duplicated
        # from the input at stage 0 and averaged after the last stage
        # (reversible.reversible_sequence's duplicate/mean convention)
        o1, o2 = _gpipe(
            mesh, axis, data_axis, M, stacked, (xm, xm), opts, rev_stage_fn
        )
        out = ((o1 + o2) * 0.5).reshape(b, *x.shape[1:])
        return StableLayerNorm(transformer.dim)(p["norm"], out)

    def stage_fn(sp, xs, opt, mb_i, s_idx):
        (h,) = xs
        for j, (kind, module) in enumerate(stage_menu):
            if kind == "self":
                kw = dict(
                    mask=None if "mask" not in opt else _pick(opt["mask"], mb_i),
                    rotary_pos_emb=opt.get("rotary_pos_emb"),
                )
            elif kind == "cross":
                kw = dict(
                    context=_pick(opt["context"], mb_i),
                    context_mask=(
                        None
                        if "context_mask" not in opt
                        else _pick(opt["context_mask"], mb_i)
                    ),
                    mask=None if "mask" not in opt else _pick(opt["mask"], mb_i),
                )
            else:
                kw = {}
            lk = None
            if "key" in opt:
                lk = jax.random.fold_in(
                    jax.random.fold_in(opt["key"], s_idx * L + j), mb_i
                )
                if data_axis is not None:
                    # distinct masks per data shard (each shard draws
                    # over its local rows only)
                    lk = jax.random.fold_in(lk, jax.lax.axis_index(data_axis))
            blk = lambda lp, h, lk, _m=module, _kw=kw: _m(lp, h, key=lk, **_kw)
            if transformer.remat:
                blk = jax.checkpoint(blk)
            h = blk(sp[j], h, lk) + h
        return (h,)

    (out,) = _gpipe(mesh, axis, data_axis, M, stacked, (xm,), opts, stage_fn)
    out = out.reshape(b, *x.shape[1:])
    return StableLayerNorm(transformer.dim)(p["norm"], out)


def pipelined_dual_decoder(
    decoder,
    p,
    video,
    audio,
    mesh: Mesh,
    *,
    num_microbatches: int,
    axis: str = "pipe",
    data_axis: str | None = None,
    context=None,
    context_mask=None,
    video_mask=None,
    audio_mask=None,
    key=None,
):
    """GPipe the ``DualModalityDecoder`` over ``mesh.shape[axis]`` stages:
    both modality streams ride the same pipeline, shifted together
    stage→stage with one ``lax.ppermute`` each. A
    ``ReversibleDualModalityDecoder`` pipelines with its O(1)-memory quad
    runtime intact — the carry becomes (v1, v2, a1, a2) and each stage runs
    its block slice through ``make_dual_reversible_sequence`` (see module
    docstring).

    Reference semantics being pipelined:
    /root/reference/nuwa_pytorch/nuwa_pytorch.py:1299-1487 (per-depth video∥
    audio self blocks, video/audio→text cross blocks, every-k cross-modality
    exchange). The xmod blocks couple the streams *within* a stage, so both
    streams must live on the same device — which the twin-carry design
    guarantees — while stage boundaries only ever cut at whole-block seams.

    Matches the plain decoder exactly when dropout is off; with dropout,
    per-block keys are folded with (global block index, microbatch index),
    same caveat as ``pipelined_transformer``.
    """
    from ..dual_decoder import (
        ReversibleDualModalityDecoder,
        apply_dual_block,
        reversible_dual_blocks,
    )

    reversible = isinstance(decoder, ReversibleDualModalityDecoder)
    S = mesh.shape[axis]
    blocks = decoder.blocks()
    L = _validate_menu(blocks, S)
    stage_menu = blocks[:L]
    b = video.shape[0]
    M = num_microbatches
    mb = _check_microbatching(mesh, axis, data_axis, b, M)
    if S == 1:
        return decoder(
            p, video, audio, context=context, context_mask=context_mask,
            video_mask=video_mask, audio_mask=audio_mask, key=key,
        )

    stacked = _resolve_stacked(p["layers"], S, L * S)

    def mb_split(a):
        return None if a is None else a.reshape(M, mb, *a.shape[1:])

    vm, am = mb_split(video), mb_split(audio)
    row_spec = P(None, data_axis) if data_axis is not None else P()
    opts = [
        ("context", mb_split(context), row_spec),
        ("context_mask", mb_split(context_mask), row_spec),
        ("video_mask", mb_split(video_mask), row_spec),
        ("audio_mask", mb_split(audio_mask), row_spec),
        ("key", key, P()),
    ]

    if reversible:
        from ..reversible_dual import make_dual_reversible_sequence

        run = make_dual_reversible_sequence(reversible_dual_blocks(stage_menu))

        def rev_stage_fn(sp, xs, opt, mb_i, s_idx):
            v1, v2, a1, a2 = xs
            ctx = {
                name: _pick(opt[name], mb_i)
                for name in (
                    "context", "context_mask", "video_mask", "audio_mask"
                )
                if name in opt
            }
            if "key" in opt:
                for j in range(L):
                    lk = jax.random.fold_in(opt["key"], s_idx * L + j)
                    lk = jax.random.fold_in(lk, mb_i)
                    if data_axis is not None:
                        lk = jax.random.fold_in(
                            lk, jax.lax.axis_index(data_axis)
                        )
                    sub = jax.random.split(lk, 4)
                    for s, suffix in enumerate("fgjk"):
                        ctx[f"key{j}{suffix}"] = sub[s]
            return run(sp, v1, v2, a1, a2, ctx)

        # both modalities' reversible stream pairs ride the pipeline as one
        # quad carry, duplicated at stage 0 and averaged after stage S-1
        # (reversible_dual.dual_reversible_sequence's convention)
        o_v1, o_v2, o_a1, o_a2 = _gpipe(
            mesh, axis, data_axis, M, stacked, (vm, vm, am, am), opts,
            rev_stage_fn,
        )
        v_out = ((o_v1 + o_v2) * 0.5).reshape(b, *video.shape[1:])
        a_out = ((o_a1 + o_a2) * 0.5).reshape(b, *audio.shape[1:])
        norm = StableLayerNorm(decoder.dim)
        return norm(p["video_norm"], v_out), norm(p["audio_norm"], a_out)

    def stage_fn(sp, xs, opt, mb_i, s_idx):
        v, a = xs
        local = {
            name: None if name not in opt else _pick(opt[name], mb_i)
            for name in ("context", "context_mask", "video_mask", "audio_mask")
        }
        for j, (btype, mods, _) in enumerate(stage_menu):
            keys = (None, None, None, None)
            if "key" in opt:
                lk = jax.random.fold_in(opt["key"], s_idx * L + j)
                lk = jax.random.fold_in(lk, mb_i)
                if data_axis is not None:
                    lk = jax.random.fold_in(lk, jax.lax.axis_index(data_axis))
                keys = tuple(jax.random.split(lk, 4))
            blk = lambda lp, v, a, keys, _bt=btype, _mods=mods: (
                apply_dual_block(
                    _bt, _mods, lp, v, a, keys=keys,
                    context=local["context"],
                    context_mask=local["context_mask"],
                    video_mask=local["video_mask"],
                    audio_mask=local["audio_mask"],
                )
            )
            if decoder.remat:
                blk = jax.checkpoint(blk)
            v, a = blk(sp[j], v, a, keys)
        return (v, a)

    v_out, a_out = _gpipe(
        mesh, axis, data_axis, M, stacked, (vm, am), opts, stage_fn
    )
    v_out = v_out.reshape(b, *video.shape[1:])
    a_out = a_out.reshape(b, *audio.shape[1:])
    norm = StableLayerNorm(decoder.dim)
    return norm(p["video_norm"], v_out), norm(p["audio_norm"], a_out)
