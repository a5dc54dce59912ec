"""Parameter partitioning rules (tensor parallelism) and pjit helpers.

Strategy (scaling-book style): pick a mesh, annotate parameter and batch
shardings, let XLA SPMD insert the collectives over ICI.

TP layout for the transformer stacks — shard the *head/inner* dimension of
every attention/FF projection over the 'model' axis:
  * to_q / to_kv / to_qkv / w_in:   (None, 'model')   — column parallel
  * to_out / w_out:                 ('model', None)   — row parallel
  * embeddings / logits heads:      (None, 'model') over the feature/vocab dim
  * norms, biases, conv codec:      replicated
Activations stay replicated per-token (batch sharded over 'data'); XLA
all-reduces the row-parallel matmul partial sums.
"""
from __future__ import annotations

import re

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

P = PartitionSpec

# ordered (regex over '/'-joined path, spec-builder) rules; first match wins.
# specs are functions of the leaf ndim so biases fall through to replication.
_TP_RULES = (
    # column-parallel projections (shard output features)
    (r"(to_q|to_kv|to_qkv|w_in)/w$", lambda nd: P(None, "model") if nd == 2 else P()),
    # row-parallel projections (shard input features)
    (r"(to_out|w_out)/w$", lambda nd: P("model", None) if nd == 2 else P()),
    # int8-quantized leaves (utils/quantize.py): per-output-channel scales
    # shard with the output dim of their weight
    (r"(to_q|to_kv|to_qkv|w_in)/w_scale$",
     lambda nd: P("model") if nd == 1 else P()),
    (r"(to_logits|to_video_logits|to_audio_logits)/w_scale$",
     lambda nd: P("model") if nd == 1 else P()),
    # logits heads: shard the vocab (output) dim — the big matmul splits
    # column-parallel and cross-entropy reduces with XLA collectives.
    # `/w` variant covers the int8-quantized {"w","w_scale"} form.
    (r"(to_logits|to_video_logits|to_audio_logits)(/w)?$",
     lambda nd: P(None, "model") if nd == 2 else P()),
    # embedding tables: shard the *feature* axis, NOT the vocab axis — a
    # vocab-sharded table turns every jnp.take of a hot row into a
    # cross-device gather; feature-sharded lookups are local per device and
    # the activation arrives already feature-sharded for the first matmul
    (r"(text_embedding|image_embedding|audio_embedding|sketch_embedding)/table$",
     lambda nd: P(None, "model")),
    # null kv: per-head params — shard the head axis
    (r"null_[kv]$", lambda nd: P("model", None, None) if nd == 3 else P()),
)


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def partition_spec_for(path: str, leaf) -> PartitionSpec:
    nd = jnp.ndim(leaf)
    for pattern, spec_fn in _TP_RULES:
        if re.search(pattern, path):
            spec = spec_fn(nd)
            if len(spec) <= nd:
                return spec
    return P()


def make_param_specs(params):
    """Pytree of PartitionSpecs mirroring ``params``."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [partition_spec_for(_path_str(path), leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh according to the TP rules. Dimensions not
    divisible by the 'model' axis fall back to replication."""
    model_size = mesh.shape["model"]

    def place(spec, leaf):
        # divisibility guard
        for axis, name in enumerate(spec):
            if name == "model" and leaf.shape[axis] % model_size != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    specs = make_param_specs(params)
    return jax.tree.map(place, specs, params)


def sharded_train_step(mesh: Mesh, loss_fn, tx):
    """Build a pjit'd (params, opt_state, batch...) -> ... train step with
    batch sharded over 'data' and params sharded by the TP rules. Gradient
    all-reduce / TP collectives are inserted by XLA SPMD."""
    import optax

    def step(params, opt_state, *batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
