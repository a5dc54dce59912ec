"""NUWATrainer — autoregressive text→video training.

Parity: reference ``NUWATrainer``
(/root/reference/nuwa_pytorch/train_nuwa.py:184-300): grad accumulation,
global grad-norm clipping, periodic ``generate()`` sampling saved as a
stacked-frame PNG, periodic checkpoints, metrics via a ``log_fn`` callback.

TPU-first: the whole accumulation window runs inside one jitted step
(``lax.scan`` over microbatches); full train state (params, opt, step, PRNG)
checkpoints atomically and resumes.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .checkpoint import restore_latest, save_checkpoint
from .data import DataLoader, accum_log, pad_collate, stack_microbatches
from .optimizer import get_optimizer


def noop(*a, **k):
    pass


class NUWATrainer:
    def __init__(
        self,
        *,
        nuwa,
        params,
        dataset,
        num_train_steps,
        lr=3e-4,
        wd=0.01,
        batch_size=4,
        grad_accum_every=8,
        max_grad_norm=0.5,
        save_model_every=2500,
        save_results_every=1000,
        results_folder="./results-nuwa",
        num_sampled_frames=float("inf"),
        cond_dropout_prob=0.2,
        seed=0,
        resume=True,
        tokenizer=None,
        mesh=None,
        context_parallel=False,
        pipeline_parallel=False,
        pipeline_microbatches=1,
        zero1=False,
    ):
        self.nuwa = nuwa
        self.num_train_steps = num_train_steps
        self.batch_size = batch_size
        self.grad_accum_every = grad_accum_every
        self.cond_dropout_prob = cond_dropout_prob
        self.save_model_every = save_model_every
        self.save_results_every = save_results_every
        self.num_sampled_frames = num_sampled_frames
        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.tokenizer = tokenizer

        self.ds = dataset
        self.dl = stack_microbatches(
            DataLoader(
                dataset, batch_size, collate_fn=pad_collate, shuffle=True, seed=seed
            ).cycle(),
            grad_accum_every,
        )

        # ---- SPMD: DP over 'data' (+ TP over 'model' via the param rules)
        self.mesh = mesh
        self.context_parallel = context_parallel
        self.pipeline_parallel = pipeline_parallel
        self.pipeline_microbatches = pipeline_microbatches
        if context_parallel:
            assert mesh is not None, "context_parallel requires a mesh"
        if pipeline_parallel:
            assert mesh is not None and "pipe" in getattr(
                mesh, "axis_names", ()
            ), "pipeline_parallel requires a mesh with a 'pipe' axis"
            assert not context_parallel, "PP does not compose with CP"
        if mesh is not None and (
            not context_parallel
            or "context" in getattr(mesh, "axis_names", ())
        ):
            dp = mesh.shape.get("data", 1)
            assert batch_size % dp == 0, (
                f"batch_size {batch_size} not divisible by data axis {dp}"
            )

        # copy caller-provided params: the jitted step donates the train
        # state, which would otherwise delete the caller's arrays
        params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        wd_mask = None
        if mesh is not None:
            from ..parallel import replicated, shard_params

            if pipeline_parallel and mesh.shape["pipe"] > 1:
                # store the decoder stack PRE-STACKED and sharded over
                # 'pipe': params AND AdamW moments hold only 1/S of the
                # stack per device — the pipeline's memory payoff (see
                # parallel/pipeline._resolve_stacked). Stacking hides leaf
                # rank (a bias becomes (S, d)), so the wd mask is computed
                # on the flat layout; stages are statically identical, so
                # stage 0's mask slice covers every stacked slot.
                from jax.sharding import NamedSharding, PartitionSpec
                from ..parallel.pipeline import stage_param_slots
                from .optimizer import weight_decay_mask

                S = mesh.shape["pipe"]
                # param-slot count per stage: menu entries for a plain
                # decoder, (f, g) couples for a reversible one
                L = stage_param_slots(nuwa.video_transformer, S)
                wd_mask = weight_decay_mask(params)
                wd_mask["video_transformer"] = dict(
                    wd_mask["video_transformer"],
                    layers=wd_mask["video_transformer"]["layers"][:L],
                )
                # stack + shard the decoder stack leaf-by-leaf BEFORE any
                # replication: the stack is the memory-dominant subtree and
                # must never exist fully replicated (or fully stacked on one
                # device) even transiently — that spike is exactly what PP
                # exists to avoid. Only the non-stack remainder replicates.
                pipe_sh = NamedSharding(mesh, PartitionSpec("pipe"))
                flat_layers = params["video_transformer"]["layers"]
                stages = [
                    flat_layers[s * L : (s + 1) * L] for s in range(S)
                ]
                stacked = [
                    jax.tree.map(
                        lambda *xs: jax.device_put(jnp.stack(xs), pipe_sh),
                        *(stages[s][j] for s in range(S)),
                    )
                    for j in range(L)
                ]
                rest = dict(
                    params,
                    video_transformer={
                        k: v
                        for k, v in params["video_transformer"].items()
                        if k != "layers"
                    },
                )
                rest = jax.device_put(rest, replicated(mesh))
                params = dict(
                    rest,
                    video_transformer=dict(
                        rest["video_transformer"], layers=stacked
                    ),
                )
            elif pipeline_parallel:
                params = jax.device_put(params, replicated(mesh))
            else:
                params = shard_params(params, mesh)
            key0 = jax.device_put(jax.random.PRNGKey(seed), replicated(mesh))
            step0 = jax.device_put(jnp.asarray(0, jnp.int32), replicated(mesh))
        else:
            key0 = jax.random.PRNGKey(seed)
            step0 = jnp.asarray(0, jnp.int32)
        self.tx = get_optimizer(
            lr=lr, wd=wd, params=params, max_grad_norm=max_grad_norm,
            wd_mask=wd_mask,
        )
        self.state = {
            "params": params,
            "opt": self.tx.init(params),  # zeros_like inherits param shardings
            "step": step0,
            "key": key0,
        }

        # ZeRO-1: shard the AdamW m/v pytrees over 'data' (parallel/zero.py).
        # The update runs shard-local; params stay in their DP/TP layout.
        self._opt_shardings = None
        if zero1:
            assert mesh is not None and mesh.shape.get("data", 1) > 1, (
                "zero1 requires a mesh with a 'data' axis > 1"
            )
            from ..parallel.zero import shard_opt_state

            self.state["opt"], self._opt_shardings = shard_opt_state(
                self.state["opt"], mesh
            )

        if resume:
            # mesh-aware restore: every leaf device_puts straight to the
            # sharding the live (already-placed) state carries — DP/TP/ZeRO
            # layouts come back without a full replicated host copy
            shardings = (
                jax.tree.map(lambda x: x.sharding, self.state)
                if mesh is not None
                else None
            )
            try:
                restored = restore_latest(
                    self.results_folder, "nuwa_trainstate", self.state,
                    shardings,
                )
            except Exception:
                # checkpoints written before the pre-stacked PP layout store
                # the decoder stack as a flat layer list — restore through a
                # flat template, then re-stack and re-place
                if not (pipeline_parallel and mesh is not None
                        and mesh.shape.get("pipe", 1) > 1):
                    raise
                restored = self._restore_legacy_flat_pp(mesh)
            if restored is not None:
                step, self.state = restored
                print(f"resumed from checkpoint at step {step}")

        self._train_step = jax.jit(self._make_train_step(), donate_argnums=(0,))

    @staticmethod
    def _map_stacked_layers(tree, fn):
        """Apply ``fn`` to every params-shaped 'video_transformer'/'layers'
        subtree (params, EMA, AdamW mu/nu all share the params structure).
        Rebuilds dicts/lists/namedtuples (optax states) around it."""
        m = NUWATrainer._map_stacked_layers
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if (
                    k == "video_transformer"
                    and isinstance(v, dict)
                    and "layers" in v
                ):
                    out[k] = dict(v, layers=fn(v["layers"]))
                else:
                    out[k] = m(v, fn)
            return out
        if isinstance(tree, tuple) and hasattr(tree, "_fields"):
            return type(tree)(*(m(v, fn) for v in tree))
        if isinstance(tree, (list, tuple)):
            return type(tree)(m(v, fn) for v in tree)
        return tree

    def _restore_legacy_flat_pp(self, mesh):
        """Resume a checkpoint written before the pre-stacked PP layout
        (decoder stack stored as a flat replicated layer list): restore
        through a flat template, re-stack, and place into the live
        shardings. One full host copy of the state — a migration path,
        not the steady-state restore."""
        from jax.sharding import NamedSharding, PartitionSpec

        from ..parallel.pipeline import stack_stage_params

        S = mesh.shape["pipe"]

        def unstack_tmpl(stacked):
            layers = []
            for s in range(S):
                layers.extend(
                    jax.tree.map(
                        lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype),
                        stacked,
                    )
                )
            return layers

        template = self._map_stacked_layers(self.state, unstack_tmpl)
        restored = restore_latest(
            self.results_folder, "nuwa_trainstate", template, None
        )
        if restored is None:
            return None
        step, flat_state = restored

        def restack(layers):
            return jax.tree.map(
                lambda leaf: jax.device_put(
                    leaf, NamedSharding(mesh, PartitionSpec("pipe"))
                ),
                stack_stage_params(layers, S),
            )

        state = self._map_stacked_layers(flat_state, restack)
        state = jax.tree.map(
            lambda live, new: (
                new
                if getattr(new, "sharding", None) == live.sharding
                else jax.device_put(np.asarray(new), live.sharding)
            ),
            self.state,
            state,
        )
        return step, state

    def _make_train_step(self):
        nuwa, tx, accum = self.nuwa, self.tx, self.grad_accum_every
        cdp = self.cond_dropout_prob
        opt_shardings = self._opt_shardings
        cp_mesh = self.mesh if self.context_parallel else None
        pp_mesh = self.mesh if self.pipeline_parallel else None
        pp_mb = self.pipeline_microbatches
        pp_data = (
            "data"
            if pp_mesh is not None and "data" in pp_mesh.axis_names
            else None
        )

        def loss_fn(params, text, video, key):
            return nuwa.forward(
                params, text=text, video=video, return_loss=True,
                cond_dropout_prob=cdp, key=key, train=True, cp_mesh=cp_mesh,
                pp_mesh=pp_mesh, pp_microbatches=pp_mb, pp_data_axis=pp_data,
            )

        def step(state, texts, videos):
            key, *mkeys = jax.random.split(state["key"], accum + 1)
            mkeys = jnp.stack(mkeys)

            def micro(carry, inp):
                grads_acc, loss_acc = carry
                text, video, mkey = inp
                loss, grads = jax.value_and_grad(loss_fn)(
                    state["params"], text, video, mkey
                )
                return (jax.tree.map(jnp.add, grads_acc, grads), loss_acc + loss), None

            zero = jax.tree.map(jnp.zeros_like, state["params"])
            (grads, loss_sum), _ = jax.lax.scan(
                micro, (zero, 0.0), (texts, videos, mkeys)
            )
            grads = jax.tree.map(lambda g: g / accum, grads)
            updates, opt = tx.update(grads, state["opt"], state["params"])
            if opt_shardings is not None:
                # pin the ZeRO-1 layout so the moments never re-replicate
                opt = jax.lax.with_sharding_constraint(opt, opt_shardings)
            params = optax.apply_updates(state["params"], updates)
            return {
                "params": params,
                "opt": opt,
                "step": state["step"] + 1,
                "key": key,
            }, loss_sum / accum

        return step

    def _place(self, arr):
        """(accum, batch, ...) window → device; batch axis sharded over
        'data' when a mesh is configured (single host→device transfer)."""
        arr = np.asarray(arr)
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P

        # Context parallelism: on a legacy ('data', 'model') mesh the 'data'
        # axis carries the *frame* sharding inside the attention shard_map
        # and the batch stays replicated (everything outside attention is
        # computed redundantly). On a ('data', 'model', 'context') mesh
        # (make_mesh(context=...)) frames ride 'context' and the batch IS
        # sharded over 'data' — DPxCP: the layers outside attention shard by
        # batch through normal jit propagation.
        cp_legacy = (
            self.context_parallel
            and "context" not in getattr(self.mesh, "axis_names", ())
        )
        if cp_legacy:
            spec = P()
        else:
            spec = P(None, "data", *([None] * (arr.ndim - 2)))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def train_step(self):
        steps = int(self.state["step"])
        logs = {}

        texts, videos = next(self.dl)
        texts, videos = self._place(texts), self._place(videos)
        self.state, loss = self._train_step(self.state, texts, videos)
        accum_log(logs, {"loss": float(loss)})
        print(f"{steps} loss: {logs['loss']}")

        if steps % self.save_results_every == 0:
            self._sample(steps, texts, logs)
        if steps % self.save_model_every == 0:
            save_checkpoint(self.results_folder, "nuwa_trainstate", steps, self.state)
            print(f"{steps}: saving model to {str(self.results_folder)}")

        return logs

    def _sample(self, steps, texts, logs):
        from ..utils.image import save_image_grid

        print(f"{steps} sampling")
        text = jnp.asarray(texts[0][:1])
        num_frames = int(min(self.nuwa.max_video_frames, self.num_sampled_frames))
        self.state["key"], skey = jax.random.split(self.state["key"])
        params = self.state["params"]
        if self.pipeline_parallel and self.mesh.shape["pipe"] > 1:
            # sampling runs the plain decoder: flatten the pipe-stacked stage
            # params back to the per-layer list
            from ..parallel.pipeline import unstack_stage_params

            params = dict(
                params,
                video_transformer=dict(
                    params["video_transformer"],
                    layers=unstack_stage_params(
                        params["video_transformer"]["layers"]
                    ),
                ),
            )
        video = self.nuwa.generate(
            params, text=text, key=skey, num_frames=num_frames
        )
        if video.ndim == 2:  # no VAE attached: raw codebook indices
            logs["sampled_indices"] = np.asarray(video[0])
            return
        one_video = np.asarray(video[0]).clip(0.0, 1.0)  # (f, c, h, w)

        if self.tokenizer is not None:
            logs["sampled_text"] = self.tokenizer.decode(np.asarray(text[0]))
        logs["sampled_video"] = one_video

        # stack frames vertically into one image (reference :280-281)
        save_image_grid(one_video, self.results_folder / f"{steps}.png", nrow=1)
        print(f"{steps}: saving to {str(self.results_folder)}")

    def train(self, log_fn=noop):
        while int(self.state["step"]) < self.num_train_steps:
            logs = self.train_step()
            log_fn(logs)
        print("training complete")
