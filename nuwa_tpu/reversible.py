"""Reversible (RevNet/Reformer-style) layer runtime on ``jax.custom_vjp``.

Parity: reference ``reversible.py`` (/root/reference/nuwa_pytorch/reversible.py)
— O(1)-in-depth activation memory: the forward keeps only the final two
streams; the backward reconstructs activations block-by-block in reverse and
re-runs each sub-function under ``jax.vjp``.

TPU-native differences:
  * no RNG state snapshotting (``Deterministic``, reversible.py:20-50) —
    explicit PRNG keys make recomputation bit-exact by construction.
  * kwargs routing (``route_args``, reversible.py:8-17) becomes a static
    per-block tuple of context names.
  * streams are summed as their mean at the end (the reference sums for the
    single-stream path and means for the dual path; both are equivalent
    under the scale-invariant StableLayerNorm that always follows).

Blocks are couples ``(f, g)``:  y1 = x1 + f(x2, ctx) ; y2 = x2 + g(y1, ctx).
Inversion:                      x2 = y2 - g(y1)      ; x1 = y1 - f(x2).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def _is_float0(x):
    return getattr(x, "dtype", None) == jax.dtypes.float0


def _add_cts(a, b):
    """Accumulate cotangent pytrees, treating float0 as zero."""
    def add(x, y):
        if _is_float0(x):
            return y
        if _is_float0(y):
            return x
        return x + y

    return jax.tree.map(add, a, b)


def zero_cotangent(x):
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact):
        return jnp.zeros_like(x)
    import numpy as np

    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def _route(ctx: dict, names: Tuple[Any, ...]):
    """Route ctx entries to kwargs. Each entry is either a name (ctx key ==
    kwarg name) or a ``(ctx_key, kwarg_name)`` pair."""
    out = {}
    for entry in names:
        if isinstance(entry, tuple):
            src, dst = entry
        else:
            src = dst = entry
        if src in ctx:
            out[dst] = ctx[src]
    return out


def make_reversible_sequence(couples: Tuple[Tuple[Any, Tuple[str, ...], Any, Tuple[str, ...]], ...]):
    """Build a reversible runner for a static tuple of couples.

    Each couple is ``(f_module, f_route, g_module, g_route)`` where modules
    follow the ``module(params, x, **kwargs)`` convention and routes name the
    ctx entries forwarded to each sub-function (per-block PRNG keys are keyed
    as ``key<i>f`` / ``key<i>g`` in ctx when present).

    Returns ``run(params, x1, x2, ctx) -> (y1, y2)`` with an O(1)-memory VJP.
    """

    def block_fns(i):
        f_mod, f_route, g_mod, g_route = couples[i]

        def f(p, x, ctx):
            kw = _route(ctx, f_route)
            if f"key{i}f" in ctx:
                kw["key"] = ctx[f"key{i}f"]
            return f_mod(p, x, **kw)

        def g(p, x, ctx):
            kw = _route(ctx, g_route)
            if f"key{i}g" in ctx:
                kw["key"] = ctx[f"key{i}g"]
            return g_mod(p, x, **kw)

        return f, g

    def forward(params, x1, x2, ctx):
        for i in range(len(couples)):
            f, g = block_fns(i)
            p = params[i]
            x1 = x1 + f(p["f"], x2, ctx)
            x2 = x2 + g(p["g"], x1, ctx)
        return x1, x2

    @jax.custom_vjp
    def run(params, x1, x2, ctx):
        return forward(params, x1, x2, ctx)

    def run_fwd(params, x1, x2, ctx):
        y1, y2 = forward(params, x1, x2, ctx)
        return (y1, y2), (params, y1, y2, ctx)

    def run_bwd(res, cts):
        params, y1, y2, ctx = res
        dy1, dy2 = cts
        dparams = [None] * len(couples)
        dctx = jax.tree.map(zero_cotangent, ctx)

        for i in reversed(range(len(couples))):
            f, g = block_fns(i)
            p = params[i]

            g_out, g_vjp = jax.vjp(lambda pg, y1_, c: g(pg, y1_, c), p["g"], y1, ctx)
            x2 = y2 - g_out
            dpg, dgy1, dctx_g = g_vjp(dy2)
            dy1 = dy1 + dgy1

            f_out, f_vjp = jax.vjp(lambda pf, x2_, c: f(pf, x2_, c), p["f"], x2, ctx)
            x1 = y1 - f_out
            dpf, dfx2, dctx_f = f_vjp(dy1)
            dx2 = dy2 + dfx2

            dparams[i] = {"f": dpf, "g": dpg}
            dctx = _add_cts(dctx, _add_cts(dctx_g, dctx_f))
            y1, y2 = x1, x2
            dy2 = dx2  # dy1 already holds the accumulated x1 cotangent

        return dparams, dy1, dy2, dctx

    run.defvjp(run_fwd, run_bwd)
    return run


def reversible_sequence(couples, params, x, ctx, *, reverse=True):
    """Run a two-stream reversible stack over a duplicated input.

    Mirrors reference ``ReversibleSequence.forward`` (reversible.py:126-142):
    the input is duplicated into both streams and the halves are averaged at
    the end. ``reverse=False`` runs the same math without the O(1)-memory
    custom VJP (plain autodiff — useful for tests/small models).
    """
    ctx = {k: v for k, v in ctx.items() if v is not None}
    if reverse:
        run = make_reversible_sequence(couples)
        y1, y2 = run(params, x, x, ctx)
    else:
        y1, y2 = x, x
        for i, (f_mod, f_route, g_mod, g_route) in enumerate(couples):
            kw_f = _route(ctx, f_route)
            if f"key{i}f" in ctx:
                kw_f["key"] = ctx[f"key{i}f"]
            kw_g = _route(ctx, g_route)
            if f"key{i}g" in ctx:
                kw_g["key"] = ctx[f"key{i}g"]
            p = params[i]
            y1 = y1 + f_mod(p["f"], y2, **kw_f)
            y2 = y2 + g_mod(p["g"], y1, **kw_g)
    return (y1 + y2) * 0.5
