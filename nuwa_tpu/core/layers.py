"""Minimal functional layer library for the TPU-native NUWA rebuild.

Design: every layer is a frozen dataclass holding *static* configuration only.
``init(key) -> params`` builds a pytree of ``jnp`` arrays; ``__call__(params, ...)``
is a pure function. This keeps the whole model a pytree-in/pytree-out program —
the natural shape for ``jit`` / ``pjit`` / ``custom_vjp`` / ``lax.scan`` on TPU —
rather than mirroring the reference's stateful ``nn.Module`` graph
(/root/reference/nuwa_pytorch/nuwa_pytorch.py uses torch modules throughout).

Conventions:
  * params are nested dicts / lists of ``jnp.ndarray`` (always fp32).
  * compute dtype is controlled per-call via the ``dtype`` field on configs;
    matmuls run in that dtype, reductions/norms in fp32.
  * images / feature maps are NHWC (TPU-preferred layout). The public model API
    converts from the reference's channels-first convention at the boundary.
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------


def kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    """torch-style kaiming uniform (a=sqrt(5)) used by nn.Linear / nn.Conv2d."""
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def normal_init(key, shape, stddev=1.0, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * stddev


def zeros_init(_, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones_init(_, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


# ---------------------------------------------------------------------------
# base
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Module:
    """Base class: static config object with pure init/apply methods."""

    def init(self, key):  # pragma: no cover - interface
        raise NotImplementedError

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# leaf layers
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Dense(Module):
    din: int
    dout: int
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    def init(self, key):
        kw, kb = jax.random.split(key)
        p = {"w": kaiming_uniform(kw, (self.din, self.dout), self.din)}
        if self.use_bias:
            bound = 1.0 / math.sqrt(self.din)
            p["b"] = jax.random.uniform(kb, (self.dout,), jnp.float32, -bound, bound)
        return p

    def __call__(self, p, x):
        dtype = self.dtype or x.dtype
        w = p["w"]
        if "w_scale" in p:
            # int8 weight-only quantization (serving): dequantize per output
            # channel; XLA fuses the convert+scale into the dot's operand
            # read, so HBM weight traffic drops ~2x vs bf16 / 4x vs fp32
            w = w.astype(dtype) * p["w_scale"].astype(dtype)
        else:
            w = w.astype(dtype)
        out = jnp.dot(x.astype(dtype), w)
        if self.use_bias:
            out = out + p["b"].astype(dtype)
        return out


@dataclass(frozen=True)
class Embedding(Module):
    """Token embedding with optional fractional gradient flow.

    The fractional gradient (CogView stability trick) mirrors
    reference ``frac_gradient`` + ``Embedding``
    (/root/reference/nuwa_pytorch/nuwa_pytorch.py:83-84,1659-1671): the forward
    value is unchanged but only ``frac`` of the gradient flows to the table.
    """

    num_embeddings: int
    dim: int
    frac_gradient: float = 1.0

    def init(self, key):
        return {"table": normal_init(key, (self.num_embeddings, self.dim))}

    def __call__(self, p, ids, *, train=False):
        table = p["table"]
        if train and self.frac_gradient < 1.0:
            f = self.frac_gradient
            table = table * f + jax.lax.stop_gradient(table) * (1.0 - f)
        return jnp.take(table, ids, axis=0)


@dataclass(frozen=True)
class LayerNorm(Module):
    dim: int
    eps: float = 1e-5

    def init(self, key):
        return {"g": jnp.ones((self.dim,)), "b": jnp.zeros((self.dim,))}

    def __call__(self, p, x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        out = (x - mean) * jax.lax.rsqrt(var + self.eps)
        out = out * p["g"] + p["b"]
        return out.astype(orig_dtype)


@dataclass(frozen=True)
class StableLayerNorm(Module):
    """Divide by detached amax before LN (CogView / reference
    ``StableLayerNorm``, /root/reference/nuwa_pytorch/nuwa_pytorch.py:88-95)."""

    dim: int
    eps: float = 1e-5

    def init(self, key):
        return {"norm": LayerNorm(self.dim, self.eps).init(key)}

    def __call__(self, p, x):
        amax = jax.lax.stop_gradient(jnp.max(jnp.abs(x), axis=-1, keepdims=True))
        x = x / jnp.maximum(amax, 1e-6)
        return LayerNorm(self.dim, self.eps)(p["norm"], x)


@dataclass(frozen=True)
class GroupNorm(Module):
    """GroupNorm over NHWC feature maps (normalizes each channel group over
    H, W and the in-group channels, like torch.nn.GroupNorm)."""

    dim: int
    groups: int = 16
    eps: float = 1e-5

    def init(self, key):
        return {"g": jnp.ones((self.dim,)), "b": jnp.zeros((self.dim,))}

    def __call__(self, p, x):
        b, h, w, c = x.shape
        g = self.groups
        orig_dtype = x.dtype
        xg = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
        mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
        var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        out = xg.reshape(b, h, w, c) * p["g"] + p["b"]
        return out.astype(orig_dtype)


@dataclass(frozen=True)
class LayerNormChan(Module):
    """Channel LayerNorm for NHWC maps (reference ``LayerNormChan``,
    /root/reference/nuwa_pytorch/vqgan_vae.py:129-143 — biased variance over
    the channel dim only)."""

    dim: int
    eps: float = 1e-5

    def init(self, key):
        return {"g": jnp.ones((self.dim,)), "b": jnp.zeros((self.dim,))}

    def __call__(self, p, x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        out = (x - mean) * jax.lax.rsqrt(var + self.eps) * p["g"] + p["b"]
        return out.astype(orig_dtype)


@dataclass(frozen=True)
class Conv2d(Module):
    """2D convolution over NHWC inputs with HWIO kernels."""

    cin: int
    cout: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: str | Sequence[Tuple[int, int]] = "SAME"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    def init(self, key):
        kh, kw = self.kernel_size
        fan_in = self.cin * kh * kw
        kkey, bkey = jax.random.split(key)
        p = {"w": kaiming_uniform(kkey, (kh, kw, self.cin, self.cout), fan_in)}
        if self.use_bias:
            bound = 1.0 / math.sqrt(fan_in)
            p["b"] = jax.random.uniform(bkey, (self.cout,), jnp.float32, -bound, bound)
        return p

    def __call__(self, p, x):
        dtype = self.dtype or x.dtype
        pad = self.padding
        if not isinstance(pad, str):
            pad = tuple(pad)
        out = jax.lax.conv_general_dilated(
            x.astype(dtype),
            p["w"].astype(dtype),
            window_strides=self.stride,
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            out = out + p["b"].astype(dtype)
        return out


def leaky_relu(x, negative_slope=0.1):
    return jax.nn.leaky_relu(x, negative_slope)


def upsample_nearest_or_bilinear(x, scale=2, method="bilinear"):
    """NHWC upsample; ``bilinear`` matches torch align_corners=False."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * scale, w * scale, c), method=method)


# ---------------------------------------------------------------------------
# dropout (explicit-key, deterministic replay friendly)
# ---------------------------------------------------------------------------


def dropout(x, rate, key=None):
    """Standard inverted dropout. A ``None`` key means inference (identity).

    Explicit keys make recomputation (reversible backward, remat) bit-exact by
    construction — the reference needed RNG state snapshots for this
    (/root/reference/nuwa_pytorch/reversible.py:20-50)."""
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
