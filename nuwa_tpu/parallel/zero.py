"""ZeRO-1: shard optimizer state over the 'data' mesh axis.

Under plain DP every chip holds a full replica of the AdamW m/v pytrees —
for the 973M flagship that is 7.8 GiB of the 12.8 GiB device peak
(docs/BENCHMARKS.md, flagship table), pure replicated state. ZeRO-1 (the
optimizer-state stage of ZeRO / "optimizer state sharding") removes it:
each param-shaped optimizer leaf is partitioned over 'data' along an axis
the TP rules leave free. The AdamW moment update is elementwise, so XLA
runs it shard-local (slicing the replicated gradient) and only the
transient `updates` tensors are all-gathered back into the replicated
params — per-device optimizer bytes drop ~1/|data| with no change to the
math.

Reference point being surpassed: the reference trains single-device with
fully replicated state (/root/reference/nuwa_pytorch/train_nuwa.py — no
torch.distributed anywhere; SURVEY §2.8).

TPU-native recipe (scaling-book): annotate shardings on the state, keep
the step a single jit, let XLA SPMD insert the dynamic-slice /
all-gather collectives over ICI.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .sharding import _path_str, partition_spec_for

P = PartitionSpec


def _axes_of(entry):
    if entry is None:
        return ()
    return entry if isinstance(entry, tuple) else (entry,)


def _zero_spec(path: str, leaf, mesh: Mesh, data_axis: str) -> PartitionSpec:
    """Partition spec for one optimizer-state leaf: the leaf's EXISTING spec
    when it is already placed on ``mesh`` (so pipe-stacked / TP layouts are
    preserved — ZeRO must never undo another parallelism's sharding),
    otherwise its TP spec from the rules (the param path is a suffix of the
    opt-state path, so the same rules match) — plus ``data_axis`` on the
    largest remaining divisible dimension."""
    nd = jnp.ndim(leaf)
    if nd == 0:
        return P()
    dp = mesh.shape.get(data_axis, 1)
    sh = getattr(leaf, "sharding", None)
    if isinstance(sh, NamedSharding) and sh.mesh.shape == mesh.shape:
        # already-placed leaf: its spec is ground truth (placement already
        # satisfied divisibility)
        entries = list(sh.spec) + [None] * (nd - len(sh.spec))
    else:
        base = partition_spec_for(path, leaf)
        entries = list(base) + [None] * (nd - len(base))
        # respect shard_params' divisibility fallback for the TP axis
        for ax, name in enumerate(entries):
            for a in _axes_of(name):
                if leaf.shape[ax] % mesh.shape[a] != 0:
                    entries = [None] * nd
                    break
            else:
                continue
            break
    used = {a for e in entries for a in _axes_of(e)}
    if dp > 1 and data_axis not in used:
        # largest free divisible axis gets the 'data' shards
        free = [
            ax for ax in range(nd)
            if entries[ax] is None and leaf.shape[ax] % dp == 0
        ]
        if free:
            best = max(free, key=lambda ax: leaf.shape[ax])
            entries[best] = data_axis
    return P(*entries)


def zero_opt_specs(opt_state, mesh: Mesh, data_axis: str = "data"):
    """Pytree of PartitionSpecs mirroring ``opt_state`` (ZeRO-1 layout)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(opt_state)
    specs = [
        _zero_spec(_path_str(path), leaf, mesh, data_axis)
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)


def zero_opt_shardings(opt_state, mesh: Mesh, data_axis: str = "data"):
    """Pytree of NamedShardings mirroring ``opt_state`` (ZeRO-1 layout)."""
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        zero_opt_specs(opt_state, mesh, data_axis),
        is_leaf=lambda x: isinstance(x, PartitionSpec),
    )


def shard_opt_state(opt_state, mesh: Mesh, data_axis: str = "data"):
    """Place ``opt_state`` on the mesh in the ZeRO-1 layout; returns
    (sharded_state, shardings) — keep the shardings to re-constrain the
    updated state inside the jitted train step."""
    shardings = zero_opt_shardings(opt_state, mesh, data_axis)
    return jax.tree.map(jax.device_put, opt_state, shardings), shardings
