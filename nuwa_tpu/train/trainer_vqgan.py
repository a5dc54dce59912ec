"""VQGanVAETrainer — alternating GAN training.

Parity: reference ``VQGanVAETrainer``
(/root/reference/nuwa_pytorch/train_vqgan_vae.py:168-363): per step,
``grad_accum_every`` generator microbatches then discriminator microbatches,
gradient penalty every ``apply_grad_penalty_every`` steps, EMA copy of the
VAE, periodic reconstruction grids + checkpoints, random train/valid split.

TPU-first: one jitted train step consumes a whole accumulation window
(grad_accum, batch, c, h, w) and ``lax.scan``s over microbatches — a single
host→device transfer and a single compiled program per step. Checkpoints are
atomic and resumable (full train state incl. optimizer/EMA/VQ/step/PRNG) —
the resume path the reference lacks.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..vqgan_vae import VQGanVAE
from .checkpoint import restore_latest, save_checkpoint
from .data import DataLoader, ImageDataset, MemmappedImageDataset, accum_log, stack_microbatches
from .ema import ema_init, ema_update
from .optimizer import get_optimizer


def noop(*a, **k):
    pass


def _split_params(params):
    gen = {k: v for k, v in params.items() if k not in ("discr",)}
    discr = params.get("discr")
    return gen, discr


class VQGanVAETrainer:
    def __init__(
        self,
        vae: VQGanVAE,
        *,
        num_train_steps,
        lr,
        batch_size,
        grad_accum_every,
        wd=0.0,
        images_memmap_path=None,
        images_memmap_shape=None,
        folder=None,
        dataset=None,
        save_results_every=100,
        save_model_every=1000,
        results_folder="./results",
        valid_frac=0.05,
        random_split_seed=42,
        ema_beta=0.995,
        ema_update_after_step=2000,
        ema_update_every=10,
        apply_grad_penalty_every=4,
        seed=0,
        resume=True,
        mesh=None,
    ):
        assert isinstance(vae, VQGanVAE)
        self.mesh = mesh
        if mesh is not None:
            dp = mesh.shape.get("data", 1)
            assert batch_size % dp == 0, (
                f"batch_size {batch_size} not divisible by data axis {dp}"
            )
        self.vae = vae
        self.num_train_steps = num_train_steps
        self.batch_size = batch_size
        self.grad_accum_every = grad_accum_every
        self.apply_grad_penalty_every = apply_grad_penalty_every
        self.ema_kw = dict(
            beta=ema_beta,
            update_after_step=ema_update_after_step,
            update_every=ema_update_every,
        )
        self.save_results_every = save_results_every
        self.save_model_every = save_model_every
        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)

        # ---- dataset (reference :211-246)
        if dataset is None:
            assert (folder is not None) ^ (images_memmap_path is not None)
            if folder is not None:
                dataset = ImageDataset(folder, vae.image_size, channels=vae.channels)
            else:
                assert images_memmap_shape is not None
                dataset = MemmappedImageDataset(
                    path=images_memmap_path, shape=images_memmap_shape
                )
        n_valid = int(len(dataset) * valid_frac) if valid_frac > 0 else 0
        # n_valid == 0 (tiny dataset x small frac) must fall through to the
        # shared-dataset branch: an empty valid split would make
        # `next(self.valid_dl)` spin forever in _save_recon_grid (cycle()
        # over a 0-length dataset never yields)
        if n_valid > 0:
            n = len(dataset)
            split_rng = np.random.default_rng(random_split_seed)
            order = split_rng.permutation(n)
            valid_idx, train_idx = order[:n_valid], order[n_valid:]
            self.ds = _Subset(dataset, train_idx)
            self.valid_ds = _Subset(dataset, valid_idx)
            print(
                f"training with dataset of {len(self.ds)} samples and validating"
                f" with randomly splitted {len(self.valid_ds)} samples"
            )
        else:
            self.ds = self.valid_ds = dataset
            print(f"training with shared training and valid dataset of {len(dataset)} samples")

        self.dl = stack_microbatches(
            DataLoader(self.ds, batch_size, shuffle=True, seed=seed).cycle(),
            grad_accum_every,
        )
        # drop_last=False: the valid split may be smaller than a batch, and
        # recon grids don't need a full one
        self.valid_dl = DataLoader(
            self.valid_ds, batch_size, shuffle=True, seed=seed + 1,
            drop_last=False,
        ).cycle()

        # ---- state
        key = jax.random.PRNGKey(seed)
        pkey, skey, self._key = jax.random.split(key, 3)
        params = vae.init(pkey)
        vq_state = vae.init_state(skey)["vq"]  # bare codebook state
        gen_params, discr_params = _split_params(params)

        self.gen_tx = get_optimizer(lr=lr, wd=wd, params=gen_params, frozen_keys=())
        self.discr_tx = (
            get_optimizer(lr=lr, wd=wd, params=discr_params, frozen_keys=())
            if discr_params is not None
            else None
        )

        if mesh is not None:
            from ..parallel import replicated, shard_params

            params = shard_params(params, mesh)
            vq_state = jax.device_put(vq_state, replicated(mesh))
            gen_params, discr_params = _split_params(params)

        self.state = {
            "params": params,
            "vq": vq_state,
            "gen_opt": self.gen_tx.init(gen_params),
            "discr_opt": self.discr_tx.init(discr_params) if discr_params is not None else None,
            "ema_params": ema_init(vae.eval_params(params)),
            "step": jnp.asarray(0, jnp.int32),
        }

        if resume:
            restored = restore_latest(self.results_folder, "vae_trainstate", self.state)
            if restored is not None:
                step, self.state = restored
                if mesh is not None:
                    from ..parallel import shard_params

                    self.state["params"] = shard_params(self.state["params"], mesh)
                print(f"resumed from checkpoint at step {step}")

        self._gen_step = jax.jit(self._make_gen_step(), donate_argnums=(0,))
        self._discr_step = (
            jax.jit(self._make_discr_step(), donate_argnums=(0,), static_argnums=(2,))
            if self.discr_tx is not None
            else None
        )

    # ------------------------------------------------------------------

    def _make_gen_step(self):
        vae, tx = self.vae, self.gen_tx
        accum = self.grad_accum_every

        def loss_fn(gen_params, discr_params, vq_state, img, rng):
            params = dict(gen_params)
            if discr_params is not None:
                params["discr"] = jax.lax.stop_gradient(discr_params)
            out = vae.forward(
                params, {"vq": vq_state}, img, return_loss=True, rng=rng
            )
            loss, new_state = out[0], out[1]
            return loss, new_state["vq"]

        def step(state, images, rng):
            gen_params, discr_params = _split_params(state["params"])

            def micro(carry, inp):
                grads_acc, vq_state, loss_acc = carry
                img, mrng = inp
                (loss, vq_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    gen_params, discr_params, vq_state, img, mrng
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, vq_state, loss_acc + loss), None

            zero = jax.tree.map(jnp.zeros_like, gen_params)
            rngs = jax.random.split(rng, accum)
            (grads, vq_state, loss_sum), _ = jax.lax.scan(
                micro, (zero, state["vq"], 0.0), (images, rngs)
            )
            grads = jax.tree.map(lambda g: g / accum, grads)

            updates, gen_opt = tx.update(grads, state["gen_opt"], gen_params)
            gen_params = optax.apply_updates(gen_params, updates)

            params = dict(gen_params)
            if discr_params is not None:
                params["discr"] = discr_params
            state = dict(state)
            state["params"] = params
            state["vq"] = vq_state
            state["gen_opt"] = gen_opt
            # codebook-health metric rides out of the jitted step (an eager
            # computation here would cost extra dispatches through the
            # remote-TPU tunnel every step)
            usage = vae.vq.codebook_usage(vq_state)
            return state, loss_sum / accum, usage

        return step

    def _make_discr_step(self):
        vae, tx = self.vae, self.discr_tx
        accum = self.grad_accum_every

        def loss_fn(discr_params, gen_params, vq_state, img, apply_gp):
            params = dict(jax.lax.stop_gradient(gen_params))
            params["discr"] = discr_params
            return vae.forward(
                params, {"vq": vq_state}, img,
                return_discr_loss=True, apply_grad_penalty=apply_gp,
            )

        def step(state, images, apply_gp):
            gen_params, discr_params = _split_params(state["params"])

            def micro(carry, img):
                grads_acc, loss_acc = carry
                loss, grads = jax.value_and_grad(loss_fn)(
                    discr_params, gen_params, state["vq"], img, apply_gp
                )
                return (jax.tree.map(jnp.add, grads_acc, grads), loss_acc + loss), None

            zero = jax.tree.map(jnp.zeros_like, discr_params)
            (grads, loss_sum), _ = jax.lax.scan(micro, (zero, 0.0), images)
            grads = jax.tree.map(lambda g: g / accum, grads)

            updates, discr_opt = tx.update(grads, state["discr_opt"], discr_params)
            discr_params = optax.apply_updates(discr_params, updates)

            params = dict(gen_params)
            params["discr"] = discr_params
            state = dict(state)
            state["params"] = params
            state["discr_opt"] = discr_opt
            return state, loss_sum / accum

        return step

    # ------------------------------------------------------------------

    def _place(self, arr):
        """(accum, batch, c, h, w) window → device; batch axis sharded over
        'data' when a mesh is configured."""
        arr = np.asarray(arr)
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(None, "data", *([None] * (arr.ndim - 2)))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def train_step(self):
        steps = int(self.state["step"])
        apply_gp = (steps % self.apply_grad_penalty_every) == 0
        logs = {}

        images = self._place(next(self.dl))
        self._key, rng = jax.random.split(self._key)
        self.state, gen_loss, usage = self._gen_step(self.state, images, rng)
        accum_log(logs, {"loss": float(gen_loss)})
        accum_log(logs, {"codebook_usage": float(usage)})

        if self._discr_step is not None:
            images = self._place(next(self.dl))
            self.state, discr_loss = self._discr_step(self.state, images, apply_gp)
            accum_log(logs, {"discr_loss": float(discr_loss)})
            print(f"{steps}: vae loss: {logs['loss']} - discr loss: {logs['discr_loss']}")
        else:
            print(f"{steps}: vae loss: {logs['loss']}")

        # EMA (reference :312-314)
        new_step = steps + 1
        self.state["ema_params"] = ema_update(
            self.state["ema_params"],
            self.vae.eval_params(self.state["params"]),
            new_step,
            **self.ema_kw,
        )

        if steps % self.save_results_every == 0:
            self._save_recon_grid(steps, logs)
        if steps % self.save_model_every == 0:
            save_checkpoint(self.results_folder, "vae_trainstate", steps, self.state)
            save_checkpoint(
                self.results_folder, "vae_ema", steps, self.state["ema_params"]
            )
            print(f"{steps}: saving model to {str(self.results_folder)}")

        self.state["step"] = jnp.asarray(new_step, jnp.int32)
        return logs

    def _save_recon_grid(self, steps, logs):
        from ..utils.image import save_image_grid

        imgs = jnp.asarray(next(self.valid_dl))
        for params, suffix in (
            (self.state["ema_params"], "ema"),
            (self.vae.eval_params(self.state["params"]), ""),
        ):
            recon = self.vae.forward(params, {"vq": self.state["vq"]}, imgs)
            pair = np.stack([np.asarray(imgs), np.asarray(recon)], axis=1)
            pair = pair.reshape(-1, *pair.shape[2:]).clip(0.0, 1.0)
            name = f"{steps}.{suffix}" if suffix else f"{steps}"
            save_image_grid(pair, self.results_folder / f"{name}.png", nrow=2)
            logs["reconstructions"] = pair
        print(f"{steps}: saving to {str(self.results_folder)}")

    def train(self, log_fn=noop):
        while int(self.state["step"]) < self.num_train_steps:
            logs = self.train_step()
            log_fn(logs)
        print("training complete")


class _Subset:
    def __init__(self, ds, indices):
        self.ds = ds
        self.indices = indices

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.ds[int(self.indices[i])]
