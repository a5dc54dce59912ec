"""EMA vector quantizer — owned by the framework (the reference delegates to
the external ``vector-quantize-pytorch`` package, /root/reference/
nuwa_pytorch/vqgan_vae.py:6,368-378; its configured feature set is
reimplemented here TPU-natively).

Features: EMA codebook updates (decay, Laplace smoothing), optional k-means
initialization from the first batch (``lax.cond`` on an ``initted`` flag —
jit-safe), cosine-sim codebooks (l2-normalized codes + inputs), a lower-dim
codebook projection (project_in/out), commitment loss, and optional
orthogonal regularization.

The codebook is *explicit state* (a pytree carried through the train step),
not a hidden buffer: under pjit/SPMD the EMA statistics are computed over the
global batch automatically; under ``shard_map``/``pmap`` pass ``axis_name``
to psum them.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from .core.layers import Dense, Module


def l2norm(t, axis=-1, eps=1e-12):
    return t * jax.lax.rsqrt(jnp.sum(t * t, axis=axis, keepdims=True) + eps)


def _kmeans(key, data, num_clusters, iters=10):
    """Tiny k-means for codebook init. data: (N, d) — N may be < clusters.

    Assignment is nearest-centroid by squared Euclidean distance: argmax of
    2·x·m − ‖m‖² (the ‖x‖² term is constant per point). For l2-normalized
    data (cosine codebooks) this coincides with argmax dot-product; for
    unnormalized data plain dot-product would skew toward large-norm
    centroids.
    """
    n = data.shape[0]
    idx = jax.random.randint(key, (num_clusters,), 0, n)
    means = data[idx]

    def step(_, means):
        sim = 2.0 * (data @ means.T) - jnp.sum(means * means, axis=-1)[None]  # (N, C)
        assign = jnp.argmax(sim, axis=-1)
        onehot = jax.nn.one_hot(assign, num_clusters, dtype=data.dtype)  # (N, C)
        counts = onehot.sum(0)
        sums = onehot.T @ data
        new = sums / jnp.maximum(counts[:, None], 1.0)
        return jnp.where(counts[:, None] > 0, new, means)

    return jax.lax.fori_loop(0, iters, step, means)


_ORTHO_WARNED = False


def _warn_orthogonal_reg_once():
    """Same quirk as the upstream package with a non-learnable codebook: the
    EMA codebook receives no gradients, so the orthogonal penalty only adds a
    constant to the loss. Warn once (module configs are frozen dataclasses
    that get re-constructed on every property access)."""
    global _ORTHO_WARNED
    if not _ORTHO_WARNED:
        import warnings

        warnings.warn(
            "orthogonal_reg_weight > 0 has no training effect with the EMA "
            "codebook (the penalty is computed from non-learnable state); "
            "it is reported in the loss for parity only.",
            stacklevel=3,
        )
        _ORTHO_WARNED = True


@dataclass(frozen=True)
class VectorQuantizeEMA(Module):
    dim: int
    codebook_size: int
    codebook_dim: Optional[int] = None
    decay: float = 0.8
    commitment_weight: float = 1.0
    kmeans_init: bool = True
    kmeans_iters: int = 10
    cosine_sim: bool = True
    eps: float = 1e-5
    orthogonal_reg_weight: float = 0.0
    # Re-initialize codes whose EMA cluster size falls below this threshold
    # from random batch samples (0 = off). Mirrors the upstream package's
    # ``threshold_ema_dead_code`` reachable through the reference's vq_*
    # kwarg routing (/root/reference/nuwa_pytorch/vqgan_vae.py:319,368-378).
    threshold_ema_dead_code: float = 0.0

    def __post_init__(self):
        if self.orthogonal_reg_weight > 0:
            _warn_orthogonal_reg_once()

    @property
    def cdim(self):
        return self.codebook_dim if self.codebook_dim is not None else self.dim

    @property
    def has_projection(self):
        return self.cdim != self.dim

    def init(self, key):
        p = {}
        if self.has_projection:
            k1, k2 = jax.random.split(key)
            p["project_in"] = Dense(self.dim, self.cdim, use_bias=True).init(k1)
            p["project_out"] = Dense(self.cdim, self.dim, use_bias=True).init(k2)
        return p

    def init_state(self, key):
        embed = jax.random.normal(key, (self.codebook_size, self.cdim))
        if self.cosine_sim:
            embed = l2norm(embed)
        return {
            "embed": embed,
            "embed_avg": embed.copy(),
            "cluster_size": jnp.zeros((self.codebook_size,)),
            # float flag (not bool) so the whole state pytree is grad-safe
            # when embedded under a model's params (frozen VAE copy)
            "initted": jnp.asarray(0.0 if self.kmeans_init else 1.0),
        }

    # -- helpers -----------------------------------------------------------

    def _project_in(self, p, x):
        if self.has_projection:
            return Dense(self.dim, self.cdim, use_bias=True)(p["project_in"], x)
        return x

    def _project_out(self, p, x):
        if self.has_projection:
            return Dense(self.cdim, self.dim, use_bias=True)(p["project_out"], x)
        return x

    def codebook_usage(self, state, threshold=None):
        """Fraction of codebook entries with EMA cluster size above
        ``threshold`` (defaults to ``threshold_ema_dead_code`` or eps) —
        a cheap codebook-health metric for trainer logs."""
        thr = threshold
        if thr is None:
            thr = self.threshold_ema_dead_code if self.threshold_ema_dead_code > 0 else self.eps
        return jnp.mean((state["cluster_size"] > thr).astype(jnp.float32))

    def codebook(self, p, state):
        """Codebook in *decoder space* (project_out applied).

        Deviation from the reference (documented): ``vae.codebook[indices]``
        feeds the decoder directly (nuwa_pytorch.py:1910), which in the
        reference silently requires codebook_dim == decoder dim; projecting
        out here makes the lookup correct for every configuration.
        """
        return self._project_out(p, state["embed"])

    # -- core --------------------------------------------------------------

    def __call__(self, p, state, x, *, update=False, rng=None, axis_name=None):
        """Quantize ``x`` (..., dim).

        Returns (quantized (..., dim), indices (...,), commit_loss, new_state).
        ``update=True`` runs k-means init (first call) + the EMA update.
        """
        in_shape = x.shape
        flat = x.reshape(-1, self.dim)
        z = self._project_in(p, flat)  # (N, cdim)
        zq_space = l2norm(z) if self.cosine_sim else z

        def maybe_init(state):
            if not self.kmeans_init or not update:
                return state

            def do_init(_):
                key = rng if rng is not None else jax.random.PRNGKey(0)
                means = _kmeans(key, zq_space, self.codebook_size, self.kmeans_iters)
                if self.cosine_sim:
                    means = l2norm(means)
                return {
                    "embed": means,
                    "embed_avg": means,
                    "cluster_size": jnp.zeros((self.codebook_size,)),
                    "initted": jnp.asarray(1.0),
                }

            return jax.lax.cond(state["initted"] > 0, lambda _: state, do_init, None)

        state = maybe_init(state)
        embed = state["embed"]

        if self.cosine_sim:
            sim = zq_space @ embed.T  # cosine similarity
            indices = jnp.argmax(sim, axis=-1)
        else:
            d = (
                jnp.sum(z * z, -1, keepdims=True)
                - 2 * z @ embed.T
                + jnp.sum(embed * embed, -1)[None]
            )
            indices = jnp.argmin(d, axis=-1)

        quant_codes = jnp.take(embed, indices, axis=0)  # (N, cdim)

        commit = self.commitment_weight * jnp.mean(
            (jax.lax.stop_gradient(quant_codes) - z) ** 2
        )
        if self.orthogonal_reg_weight > 0:
            cb = l2norm(embed)
            gram = cb @ cb.T
            commit = commit + self.orthogonal_reg_weight * (
                jnp.sum(gram**2) - jnp.sum(jnp.diag(gram) ** 2)
            ) / (self.codebook_size**2)

        # EMA update
        new_state = state
        if update:
            onehot = jax.nn.one_hot(indices, self.codebook_size, dtype=z.dtype)
            counts = onehot.sum(0)
            sums = onehot.T @ zq_space
            if axis_name is not None:
                counts = jax.lax.psum(counts, axis_name)
                sums = jax.lax.psum(sums, axis_name)
            d = self.decay
            cluster_size = state["cluster_size"] * d + counts * (1 - d)
            embed_avg = state["embed_avg"] * d + sums * (1 - d)
            n = jnp.sum(cluster_size)
            smoothed = (
                (cluster_size + self.eps) / (n + self.codebook_size * self.eps) * n
            )
            new_embed = embed_avg / jnp.maximum(smoothed[:, None], 1e-12)
            if self.cosine_sim:
                new_embed = l2norm(new_embed)
            if self.threshold_ema_dead_code > 0:
                # Dead-code expiry: codes whose EMA usage dropped below the
                # threshold are re-seeded from random batch vectors. Deadness
                # is judged on the psum'd (global) cluster sizes; under SPMD
                # pjit the batch itself is global too. Under shard_map/pmap
                # each device would otherwise re-seed from its *local* shard
                # and silently desynchronize the replicated codebook — so the
                # seed vectors are broadcast from device 0 of the axis
                # (psum of an axis_index-masked copy keeps it collective-
                # only, no host round-trip).
                key = rng if rng is not None else jax.random.PRNGKey(0)
                key = jax.random.fold_in(key, 1)
                pick = jax.random.randint(
                    key, (self.codebook_size,), 0, zq_space.shape[0]
                )
                seeds = jnp.take(zq_space, pick, axis=0)
                if axis_name is not None:
                    is_first = (jax.lax.axis_index(axis_name) == 0).astype(
                        seeds.dtype
                    )
                    seeds = jax.lax.psum(seeds * is_first, axis_name)
                dead = cluster_size < self.threshold_ema_dead_code
                thr = self.threshold_ema_dead_code
                new_embed = jnp.where(dead[:, None], seeds, new_embed)
                embed_avg = jnp.where(dead[:, None], seeds * thr, embed_avg)
                cluster_size = jnp.where(dead, thr, cluster_size)
            new_state = {
                "embed": jax.lax.stop_gradient(new_embed),
                "embed_avg": jax.lax.stop_gradient(embed_avg),
                "cluster_size": jax.lax.stop_gradient(cluster_size),
                "initted": state["initted"],
            }

        # straight-through estimator in *input* space
        quant_out = self._project_out(p, quant_codes)
        quantized = flat + jax.lax.stop_gradient(quant_out - flat)

        return (
            quantized.reshape(in_shape),
            indices.reshape(in_shape[:-1]),
            commit,
            new_state,
        )
