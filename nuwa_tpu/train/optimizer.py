"""Optimizer factory (parity: /root/reference/nuwa_pytorch/optimizer.py):
AdamW with weight decay masked off for params with ndim < 2, plain Adam when
wd == 0 — built on optax. Frozen subtrees (e.g. the embedded frozen VAE) are
excluded via ``optax.masked`` zeroing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def weight_decay_mask(params):
    """True for params that should receive weight decay (ndim >= 2)."""
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


def trainable_mask(params, frozen_keys=("vae", "sketch_vae")):
    """False for top-level frozen subtrees (embedded frozen VAE copies)."""

    def mark(tree, frozen):
        if isinstance(tree, dict):
            return {
                k: mark(v, frozen or k in frozen_keys) for k, v in tree.items()
            }
        if isinstance(tree, (list, tuple)):
            t = [mark(v, frozen) for v in tree]
            return type(tree)(t) if not isinstance(tree, tuple) else tuple(t)
        return not frozen

    return mark(params, False)


def get_optimizer(lr=3e-4, wd=1e-1, *, params=None, max_grad_norm=None,
                  frozen_keys=("vae", "sketch_vae"), wd_mask=None):
    """Build the optax transform. ``params`` (a template pytree) is required
    when weight decay masking or frozen-subtree masking applies.

    ``wd_mask``: optional explicit weight-decay mask pytree overriding the
    ndim-based default — needed when the param layout hides the true rank
    (pipeline-stacked stage params carry a leading (S,) axis, so a stacked
    bias is 2-D but must still skip decay)."""
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))

    if wd == 0:
        chain.append(optax.adam(lr))
    else:
        if wd_mask is None:
            assert params is not None, "params template needed for wd masking"
            wd_mask = weight_decay_mask(params)
        chain.append(optax.adamw(lr, weight_decay=wd, mask=wd_mask))

    tx = optax.chain(*chain)

    if params is not None:
        tmask = trainable_mask(params, frozen_keys)
        if not all(jax.tree.leaves(tmask)):
            # zero updates (and skip optimizer state) for frozen subtrees
            not_mask = jax.tree.map(lambda b: not b, tmask)
            tx = optax.chain(
                optax.masked(optax.set_to_zero(), not_mask),
                optax.masked(tx, tmask),
            )
    return tx
