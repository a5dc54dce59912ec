"""Measured memory payoffs for ZeRO-1 and pipeline parallelism (VERDICT-r4
items 1 & 2), on the 8-device virtual CPU mesh.

Part A — ZeRO-1 at a flagship-like config (dim 1024, dh128 h8, depth 12,
fmap 16, 10 frames, reversible, bf16 compute): AOT-compile the full DP train
step (grads + AdamW) with the optimizer moments replicated vs sharded over
'data', and report per-device optimizer bytes (from the shardings) plus the
compiled per-device argument/peak sizes from ``compiled.memory_analysis()``.
Abstract lowering (``jax.eval_shape`` + ShapeDtypeStruct shardings) — no
multi-GiB arrays are materialized.

Part B — PP stage-state scaling: a depth-8 decoder stack stored in the
pipe-stacked layout at S ∈ {1, 2, 4, 8}; REAL placement on the mesh, bytes
read back from ``leaf.addressable_shards[0]``. Params and AdamW moments both
scale ~1/S.

Part C — GPipe bubble trend: step time vs num_microbatches at S=4. All 8
virtual devices share one CPU core, so wall time ∝ total stage executions
= S·(M+S-1); per-microbatch time should track (M+S-1)/M — the same bubble
law that governs real multi-chip wall time (where S stages run in parallel
and wall = (M+S-1)·stage_time).

Usage: python scripts/measure_parallel_memory.py   (self-configures the
8-device CPU backend by re-exec, like __graft_entry__.dryrun_multichip).
"""
import json
import os
import sys
import time

_FLAG = "--xla_force_host_platform_device_count=8"
if _FLAG not in os.environ.get("XLA_FLAGS", ""):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + _FLAG).strip()
    env.pop("JAX_COMPILATION_CACHE_DIR", None)  # foreign-host AOT artifacts
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nuwa_tpu.parallel import make_mesh, zero_opt_shardings
from nuwa_tpu.train.optimizer import get_optimizer, weight_decay_mask

GiB = 1024**3


def _bytes(tree):
    return sum(
        int(np.prod(l.shape)) * l.dtype.itemsize for l in jax.tree.leaves(tree)
    )


def _per_device_bytes(shape_tree, sharding_tree, mesh):
    total = 0
    for leaf, sh in zip(
        jax.tree.leaves(shape_tree), jax.tree.leaves(sharding_tree)
    ):
        shards = 1
        for ax in sh.spec:
            if ax is not None:
                shards *= mesh.shape[ax]
        total += int(np.prod(leaf.shape)) * leaf.dtype.itemsize // shards
    return total


def _sds(shape_tree, sharding_tree):
    return jax.tree.map(
        lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s),
        shape_tree,
        sharding_tree,
    )


def part_a_zero1():
    from nuwa_tpu.models import NUWA

    print("== Part A: ZeRO-1 at the flagship-like config ==")
    model = NUWA(
        dim=1024,
        image_size=16,
        num_image_tokens=1024,
        max_video_frames=10,
        text_num_tokens=49408,
        text_max_seq_len=32,
        text_enc_depth=2,
        text_enc_dim_head=128,
        text_enc_heads=8,
        dec_depth=12,
        dec_dim_head=128,
        dec_heads=8,
        dec_reversible=True,
        sparse_3dna_kernel_size=(5, 3, 3),
        sparse_3dna_dilation=(1, 2, 4),
        sparse_3dna_rel_pos_bias=True,
        shift_video_tokens=True,
        compute_dtype="bfloat16",
    )
    mesh = make_mesh(data=8, model=1)
    params_s = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    wd_mask = jax.tree.map(lambda l: np.ndim(l) >= 2, params_s)
    tx = get_optimizer(lr=3e-4, wd=0.01, params=params_s, max_grad_norm=0.5,
                       wd_mask=wd_mask)
    opt_s = jax.eval_shape(tx.init, params_s)

    repl = jax.tree.map(lambda _: NamedSharding(mesh, P()), params_s)
    opt_repl = jax.tree.map(lambda _: NamedSharding(mesh, P()), opt_s)
    opt_zero = zero_opt_shardings(opt_s, mesh)

    batch, tlen = 8, 32
    tokens = model.max_video_frames * model.tokens_per_frame
    dsh = NamedSharding(mesh, P("data", None))
    text_s = jax.ShapeDtypeStruct((batch, tlen), jnp.int32, sharding=dsh)
    video_s = jax.ShapeDtypeStruct((batch, tokens), jnp.int32, sharding=dsh)
    key_s = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=NamedSharding(mesh, P()))

    results = {}
    for name, opt_sh in (("replicated", opt_repl), ("zero1", opt_zero)):
        def step(p, opt, text, video, key, _sh=opt_sh, _zero=(name == "zero1")):
            key, sub = jax.random.split(key)

            def loss_fn(p):
                return model.forward(
                    p, text=text, video=video, return_loss=True, key=sub,
                    train=True,
                )

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, opt = tx.update(grads, opt, p)
            if _zero:
                opt = jax.lax.with_sharding_constraint(opt, _sh)
            return optax.apply_updates(p, updates), opt, key, loss

        t0 = time.time()
        compiled = (
            jax.jit(step, donate_argnums=(0, 1))
            .lower(
                _sds(params_s, repl), _sds(opt_s, opt_sh), text_s, video_s,
                key_s,
            )
            .compile()
        )
        ma = compiled.memory_analysis()
        opt_dev = _per_device_bytes(opt_s, opt_sh, mesh)
        results[name] = dict(
            opt_bytes_per_device=opt_dev,
            argument_bytes_per_device=int(ma.argument_size_in_bytes),
            peak_bytes_per_device=int(ma.peak_memory_in_bytes),
            temp_bytes_per_device=int(ma.temp_size_in_bytes),
            compile_s=round(time.time() - t0, 1),
        )
        print(
            f"  {name:10s}: opt/device {opt_dev / GiB:.3f} GiB, "
            f"args/device {ma.argument_size_in_bytes / GiB:.3f} GiB, "
            f"peak/device {ma.peak_memory_in_bytes / GiB:.3f} GiB "
            f"(compile {results[name]['compile_s']}s)"
        )
    tot_params = _bytes(params_s)
    tot_opt = _bytes(opt_s)
    print(
        f"  totals: params {tot_params / GiB:.3f} GiB, "
        f"opt {tot_opt / GiB:.3f} GiB; data axis = {mesh.shape['data']}"
    )
    ratio = results["replicated"]["opt_bytes_per_device"] / max(
        1, results["zero1"]["opt_bytes_per_device"]
    )
    print(f"  per-device optimizer reduction: {ratio:.2f}x")
    results["totals"] = dict(params_bytes=tot_params, opt_bytes=tot_opt,
                             reduction=round(ratio, 2))
    return results


def _pp_transformer(depth):
    from nuwa_tpu.transformer import Transformer

    return Transformer(
        dim=512, depth=depth, causal=True, heads=8, dim_head=64,
        cross_attend=True,
    )


def part_b_pp_state():
    from nuwa_tpu.parallel.pipeline import stack_stage_params

    print("== Part B: PP stage-state per-device bytes (real placement) ==")
    depth = 8
    tr = _pp_transformer(depth)
    p = tr.init(jax.random.PRNGKey(0))
    flat_mask = weight_decay_mask(p)
    rows = {}
    for S in (1, 2, 4, 8):
        if S == 1:
            # single device holds everything; adamw m+v mirror params
            layers = p["layers"]
            params_dev = _bytes(layers)
            opt_dev = 2 * _bytes(layers)
        else:
            mesh = Mesh(np.asarray(jax.devices()[:S]), ("pipe",))
            stacked = jax.tree.map(
                lambda leaf: jax.device_put(
                    leaf, NamedSharding(mesh, P("pipe"))
                ),
                stack_stage_params(p["layers"], S),
            )
            mask = flat_mask["layers"][: len(p["layers"]) // S]
            tx = get_optimizer(lr=1e-3, wd=0.01, params=stacked, wd_mask=mask)
            opt = tx.init(stacked)
            params_dev = sum(
                l.addressable_shards[0].data.nbytes
                for l in jax.tree.leaves(stacked)
            )
            opt_dev = sum(
                l.addressable_shards[0].data.nbytes
                for l in jax.tree.leaves(opt)
                if jnp.ndim(l) >= 1
            )
        rows[S] = (params_dev, opt_dev)
        print(
            f"  S={S}: stage params/device {params_dev / 1e6:7.1f} MB, "
            f"opt moments/device {opt_dev / 1e6:7.1f} MB"
        )
    base_p, base_o = rows[1]
    for S in (2, 4, 8):
        pd, od = rows[S]
        print(
            f"  S={S}: params x{base_p / pd:.2f} smaller, "
            f"opt x{base_o / od:.2f} smaller (ideal {S}.00)"
        )
    return {str(s): dict(params_per_device=v[0], opt_per_device=v[1])
            for s, v in rows.items()}


def part_c_bubble():
    from nuwa_tpu.parallel.pipeline import pipelined_transformer

    print("== Part C: GPipe bubble — step time vs microbatches (S=4) ==")
    S = 4
    mesh = Mesh(np.asarray(jax.devices()[:S]), ("pipe",))
    tr = _pp_transformer(4)
    p = tr.init(jax.random.PRNGKey(0))
    B, N = 32, 128
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, 512))
    w = jax.random.normal(jax.random.PRNGKey(2), (B, N, 512))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (B, 64, 512))

    out = {}
    for M in (1, 2, 4, 8, 16, 32):
        f = jax.jit(
            jax.grad(
                lambda p: jnp.mean(
                    pipelined_transformer(
                        tr, p, x, mesh, num_microbatches=M, context=ctx
                    )
                    * w
                )
            )
        )
        g = f(p)  # compile + warm
        jax.block_until_ready(g)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            g = f(p)
            jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / reps * 1e3
        pred = (M + S - 1) / M
        out[M] = dict(ms=round(dt, 1), bubble_factor=round(pred, 3))
        print(
            f"  M={M:3d}: {dt:8.1f} ms/step   (M+S-1)/M = {pred:.3f}"
        )
    base = out[32]["ms"]  # ~bubble-free reference
    print("  normalized vs M=32 (should track the bubble factor):")
    for M, r in out.items():
        print(
            f"  M={M:3d}: measured x{r['ms'] / base:.2f}, "
            f"predicted x{r['bubble_factor'] / out[32]['bubble_factor']:.2f}"
        )
    return out


if __name__ == "__main__":
    res = {}
    res["pp_state"] = part_b_pp_state()
    res["bubble"] = part_c_bubble()
    res["zero1"] = part_a_zero1()
    out_path = os.path.join(os.path.dirname(__file__), "..", "docs",
                            "parallel_memory.json")
    with open(os.path.abspath(out_path), "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {os.path.abspath(out_path)}")
