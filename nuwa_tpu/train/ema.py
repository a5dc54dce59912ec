"""Exponential moving average of params (parity: reference ``EMA``,
/root/reference/nuwa_pytorch/train_vqgan_vae.py:118-164): warmup step gate
(``update_after_step``) and update stride (``update_every``), expressed as a
pure function over pytrees (jit/pjit-safe — branchless via ``jnp.where``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    # true copies (not aliases) so train-state donation never sees the same
    # buffer twice
    return jax.tree.map(lambda x: jnp.array(x, copy=True), params)


def ema_update(ema_params, params, step, *, beta=0.995, update_after_step=2000,
               update_every=10):
    """Returns updated EMA params. ``step`` is the 1-based step counter after
    the current optimizer update (matching the reference's ``self.step += 1``
    before the gate)."""
    step = jnp.asarray(step)
    do = (step > update_after_step) & (step % update_every == 0)

    def blend(old, new):
        upd = old * beta + (1.0 - beta) * new
        return jnp.where(do, upd, old)

    return jax.tree.map(blend, ema_params, params)
