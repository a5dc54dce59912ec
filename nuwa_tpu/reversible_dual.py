"""Dual-stream (video + audio) reversible runtime on ``jax.custom_vjp``.

Parity: reference ``reversible_video_audio.py``
(/root/reference/nuwa_pytorch/reversible_video_audio.py) — twin reversible
towers with three block types:

  * ``self`` / ``cross``: independent standard couples per stream
        y1 = x1 + f(x2) ; y2 = x2 + g(y1)        (video)
        n1 = m1 + j(m2) ; n2 = m2 + k(n1)        (audio)
  * ``xmod`` (inter-modality, :223-325): the audio->video attention reads the
    *updated* video stream half, keeping the whole quad invertible:
        y1 = x1 + f(x2, m2)   # video attends audio
        y2 = x2 + k(y1)       # video ff
        n1 = m1 + j(m2, y2)   # audio attends updated video
        n2 = m2 + g(n1)       # audio ff

(The reference wires the two FFs crosswise between streams — g on audio,
k on video — an arbitrary naming artifact; both are fresh FFs so this
implementation assigns each stream its own.)

The backward reconstructs (x, m) block-by-block in reverse, exactly mirroring
the inversion order of the reference's ``backward_pass`` methods.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax

from .reversible import _add_cts, _route, zero_cotangent


def _key(ctx, name):
    return {"key": ctx[name]} if name in ctx else {}


def _block_fns(i, block):
    """block = (type, (f_mod, g_mod, j_mod, k_mod), routes) with routes a dict
    name -> tuple of ctx names."""
    btype, mods, routes = block
    f_mod, g_mod, j_mod, k_mod = mods

    def f(p, x, ctx, extra=None):
        kw = _route(ctx, routes["f"])
        kw.update(_key(ctx, f"key{i}f"))
        if btype == "xmod":
            return f_mod(p, x, extra, **kw)
        return f_mod(p, x, **kw)

    def g(p, x, ctx):
        kw = _route(ctx, routes["g"])
        kw.update(_key(ctx, f"key{i}g"))
        return g_mod(p, x, **kw)

    def j(p, x, ctx, extra=None):
        kw = _route(ctx, routes["j"])
        kw.update(_key(ctx, f"key{i}j"))
        if btype == "xmod":
            return j_mod(p, x, extra, **kw)
        return j_mod(p, x, **kw)

    def k(p, x, ctx):
        kw = _route(ctx, routes["k"])
        kw.update(_key(ctx, f"key{i}k"))
        return k_mod(p, x, **kw)

    return f, g, j, k


def make_dual_reversible_sequence(blocks: Tuple[Any, ...]):
    """Build ``run(params, x1, x2, m1, m2, ctx) -> (y1, y2, n1, n2)``."""

    def forward(params, x1, x2, m1, m2, ctx):
        for i, block in enumerate(blocks):
            btype = block[0]
            f, g, j, k = _block_fns(i, block)
            p = params[i]
            if btype == "xmod":
                x1 = x1 + f(p["f"], x2, ctx, m2)
                x2 = x2 + k(p["k"], x1, ctx)
                m1 = m1 + j(p["j"], m2, ctx, x2)
                m2 = m2 + g(p["g"], m1, ctx)
            else:
                x1 = x1 + f(p["f"], x2, ctx)
                x2 = x2 + g(p["g"], x1, ctx)
                m1 = m1 + j(p["j"], m2, ctx)
                m2 = m2 + k(p["k"], m1, ctx)
        return x1, x2, m1, m2

    @jax.custom_vjp
    def run(params, x1, x2, m1, m2, ctx):
        return forward(params, x1, x2, m1, m2, ctx)

    def run_fwd(params, x1, x2, m1, m2, ctx):
        outs = forward(params, x1, x2, m1, m2, ctx)
        return outs, (params, ctx, *outs)

    def run_bwd(res, cts):
        params, ctx, y1, y2, n1, n2 = res
        dy1, dy2, dn1, dn2 = cts
        dparams = [None] * len(blocks)
        dctx = jax.tree.map(zero_cotangent, ctx)

        for i in reversed(range(len(blocks))):
            block = blocks[i]
            btype = block[0]
            f, g, j, k = _block_fns(i, block)
            p = params[i]

            if btype == "xmod":
                # invert in reverse order: g (audio ff), j (a->v attn),
                # k (video ff), f (v->a attn) — reference :247-325
                g_out, g_vjp = jax.vjp(lambda pg, a, c: g(pg, a, c), p["g"], n1, ctx)
                m2 = n2 - g_out
                dpg, dgn1, dctx_g = g_vjp(dn2)
                dn1 = dn1 + dgn1

                j_out, j_vjp = jax.vjp(
                    lambda pj, a, c, yy2: j(pj, a, c, yy2), p["j"], m2, ctx, y2
                )
                m1 = n1 - j_out
                dpj, djm2, dctx_j, djy2 = j_vjp(dn1)
                dm2 = dn2 + djm2
                dy2 = dy2 + djy2

                k_out, k_vjp = jax.vjp(lambda pk, a, c: k(pk, a, c), p["k"], y1, ctx)
                x2 = y2 - k_out
                dpk, dky1, dctx_k = k_vjp(dy2)
                dy1 = dy1 + dky1

                f_out, f_vjp = jax.vjp(
                    lambda pf, a, c, mm2: f(pf, a, c, mm2), p["f"], x2, ctx, m2
                )
                x1 = y1 - f_out
                dpf, dfx2, dctx_f, dfm2 = f_vjp(dy1)
                dx2 = dy2 + dfx2
                dm2 = dm2 + dfm2

                dparams[i] = {"f": dpf, "g": dpg, "j": dpj, "k": dpk}
                for dc in (dctx_g, dctx_j, dctx_k, dctx_f):
                    dctx = _add_cts(dctx, dc)
                y1, y2, n1, n2 = x1, x2, m1, m2
                dy2, dn2 = dx2, dm2
                # dy1 / dn1 already accumulated
            else:
                # two independent standard couples
                g_out, g_vjp = jax.vjp(lambda pg, a, c: g(pg, a, c), p["g"], y1, ctx)
                x2 = y2 - g_out
                dpg, dgy1, dctx_g = g_vjp(dy2)
                dy1 = dy1 + dgy1
                f_out, f_vjp = jax.vjp(lambda pf, a, c: f(pf, a, c), p["f"], x2, ctx)
                x1 = y1 - f_out
                dpf, dfx2, dctx_f = f_vjp(dy1)
                dx2 = dy2 + dfx2

                k_out, k_vjp = jax.vjp(lambda pk, a, c: k(pk, a, c), p["k"], n1, ctx)
                m2 = n2 - k_out
                dpk, dkn1, dctx_k = k_vjp(dn2)
                dn1 = dn1 + dkn1
                j_out, j_vjp = jax.vjp(lambda pj, a, c: j(pj, a, c), p["j"], m2, ctx)
                m1 = n1 - j_out
                dpj, djm2, dctx_j = j_vjp(dn1)
                dm2 = dn2 + djm2

                dparams[i] = {"f": dpf, "g": dpg, "j": dpj, "k": dpk}
                for dc in (dctx_g, dctx_f, dctx_k, dctx_j):
                    dctx = _add_cts(dctx, dc)
                y1, y2, n1, n2 = x1, x2, m1, m2
                dy2, dn2 = dx2, dm2

        return dparams, dy1, dy2, dn1, dn2, dctx

    run.defvjp(run_fwd, run_bwd)
    return run


def dual_reversible_sequence(blocks, params, video, audio, ctx, *, reverse=True):
    """Duplicate each stream, run the stack, average the halves (reference
    :399-407)."""
    ctx = {k: v for k, v in ctx.items() if v is not None}
    if reverse:
        run = make_dual_reversible_sequence(blocks)
        y1, y2, n1, n2 = run(params, video, video, audio, audio, ctx)
    else:
        y1, y2, n1, n2 = video, video, audio, audio
        for i, block in enumerate(blocks):
            btype = block[0]
            f, g, j, k = _block_fns(i, block)
            p = params[i]
            if btype == "xmod":
                y1 = y1 + f(p["f"], y2, ctx, n2)
                y2 = y2 + k(p["k"], y1, ctx)
                n1 = n1 + j(p["j"], n2, ctx, y2)
                n2 = n2 + g(p["g"], n1, ctx)
            else:
                y1 = y1 + f(p["f"], y2, ctx)
                y2 = y2 + g(p["g"], y1, ctx)
                n1 = n1 + j(p["j"], n2, ctx)
                n2 = n2 + k(p["k"], n1, ctx)
    return (y1 + y2) * 0.5, (n1 + n2) * 0.5
