"""Generic helpers (parity with reference helpers,
/root/reference/nuwa_pytorch/nuwa_pytorch.py:24-84)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def exists(val):
    return val is not None


def default(val, d):
    return val if val is not None else d


def cast_tuple(val, size=1):
    return val if isinstance(val, tuple) else (val,) * size


def calc_same_padding(kernel_size, dilation=1):
    return dilation * (kernel_size - 1) // 2


def padding_to_multiple_of(n, mult):
    remainder = n % mult
    return 0 if remainder == 0 else mult - remainder


def mult_reduce(arr):
    return functools.reduce(lambda x, y: x * y, arr, 1)


def safe_div(numer, denom, eps=1e-6):
    return numer / (denom + eps)


def frac_gradient(t, frac=1.0):
    """Scale gradient flow through ``t`` by ``frac`` without changing its value
    (reference /root/reference/nuwa_pytorch/nuwa_pytorch.py:83-84)."""
    if frac >= 1.0:
        return t
    return t * frac + jax.lax.stop_gradient(t) * (1.0 - frac)


def batch_process(t, fn, chunks=10, axis=0):
    """Apply ``fn`` over ``t`` in chunks along ``axis`` (OOM guard used for VAE
    decode, reference :74-76). Chunk count is static so this stays jittable
    when sizes divide evenly; otherwise mirrors ``torch.chunk`` semantics."""
    n = t.shape[axis]
    per = -(-n // chunks)
    pieces = []
    for start in range(0, n, per):
        size = min(per, n - start)
        piece = jax.lax.slice_in_dim(t, start, start + size, axis=axis)
        pieces.append(fn(piece))
    return jnp.concatenate(pieces, axis=axis)


def log(t, eps=1e-20):
    return jnp.log(jnp.clip(t, eps, None))


def masked_fill(t, mask, value):
    """torch ``masked_fill`` equivalent: set positions where mask is True."""
    return jnp.where(mask, jnp.asarray(value, t.dtype), t)


def max_neg_value(dtype):
    return -jnp.finfo(dtype).max


def stable_softmax(t, axis=-1):
    """fp32 softmax with max-subtraction, returned in fp32 (the reference
    always softmaxes in fp32, e.g. nuwa_pytorch.py:371)."""
    t = t.astype(jnp.float32)
    t = t - jax.lax.stop_gradient(jnp.max(t, axis=axis, keepdims=True))
    return jax.nn.softmax(t, axis=axis)
