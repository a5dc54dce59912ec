"""Device-mesh construction for SPMD training/serving.

The reference is single-device (SURVEY §2.8: no torch.distributed anywhere);
here parallelism is first-class: a ``jax.sharding.Mesh`` over ('data',
'model') axes, with XLA inserting the collectives (psum over ICI for DP
gradients, all-gather/reduce-scatter for TP) from sharding annotations.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(data: int = -1, model: int = 1, context: int = 1,
              pipe: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh — or ('data', 'model', 'context') when
    ``context > 1`` (DPxCP: batch over 'data', frame-axis context
    parallelism over 'context'), or ('data', 'pipe') when ``pipe > 1``
    (PPxDP: GPipe stages over 'pipe' — parallel/pipeline.py).
    ``data=-1`` consumes the remainder."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if pipe > 1:
        assert model == 1 and context == 1, (
            "pipe composes with 'data' only (stage params are replicated "
            "across every other axis)"
        )
        if data == -1:
            assert n % pipe == 0, f"{n} devices not divisible by pipe={pipe}"
            data = n // pipe
        assert data * pipe == n, f"mesh {data}x{pipe} != {n} devices"
        arr = np.asarray(devices).reshape(data, pipe)
        return Mesh(arr, ("data", "pipe"))
    if data == -1:
        assert n % (model * context) == 0, (
            f"{n} devices not divisible by model*context={model * context}"
        )
        data = n // (model * context)
    assert data * model * context == n, (
        f"mesh {data}x{model}x{context} != {n} devices"
    )
    if context > 1:
        arr = np.asarray(devices).reshape(data, model, context)
        return Mesh(arr, ("data", "model", "context"))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    spec = PartitionSpec("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
