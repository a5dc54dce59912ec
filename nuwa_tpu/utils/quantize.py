"""int8 weight-only quantization for serving.

The reference has no quantized path (pure fp32 torch); this is a TPU-native
serving optimization: AR decode is weight-bandwidth-bound per token, so
storing the big projection matrices as int8 with per-output-channel fp32
scales cuts HBM weight traffic ~4x vs fp32 (~2x vs bf16). ``Dense`` (and the
raw ``jnp.dot`` logits heads via ``dequant``) dequantize on the fly — XLA
fuses the convert+scale into the matmul operand read.

Usage::

    from nuwa_tpu.utils.quantize import quantize_params_int8
    qparams = quantize_params_int8(params)
    video = model.generate(qparams, text=..., key=...)

Only 2-D matmul weights on known projection paths are quantized; norms,
biases, embeddings, convolutions and the frozen VAE stay in fp32.
"""
from __future__ import annotations

import re

import jax
import jax.numpy as jnp

# '/'-joined param paths whose {"w": (din, dout)} leaf gets quantized
_QUANT_W_RE = re.compile(
    r"(to_q|to_kv|to_qkv|to_out|w_in|w_out|project_in|project_out)$"
)
# bare (din, dout) logits-head leaves (used via jnp.dot, see ``dequant``)
_QUANT_HEAD_RE = re.compile(r"to_logits$|to_video_logits$|to_audio_logits$")


def _quantize_w(w):
    """(din, dout) fp array -> (int8 w, fp32 per-dout scale)."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)  # per output channel
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequant(leaf, dtype=jnp.float32):
    """Materialize a (possibly quantized) head leaf for a raw jnp.dot."""
    if isinstance(leaf, dict) and "w_scale" in leaf:
        return leaf["w"].astype(dtype) * leaf["w_scale"].astype(dtype)
    return leaf.astype(dtype)


def quantize_params_int8(
    params, *, skip=("vae", "sketch_vae"), include=None, exclude=None
):
    """Return a copy of ``params`` with projection weights quantized to int8.

    ``skip``: top-level subtrees left untouched (the frozen VAEs decode
    pixels / tokenize sketches — keep them full precision by default).

    Selection is by '/'-joined path suffix against the known projection
    names; ``include``/``exclude`` (regexes matched with ``re.search``
    against the full path) narrow or veto it for user-defined modules that
    happen to reuse names like ``project_out`` outside the transformer
    stacks: a leaf is quantized iff the suffix matches AND (``include`` is
    None or matches) AND NOT (``exclude`` matches).
    """
    inc = re.compile(include) if isinstance(include, str) else include
    exc = re.compile(exclude) if isinstance(exclude, str) else exclude

    def selected(path):
        if inc is not None and not inc.search(path):
            return False
        if exc is not None and exc.search(path):
            return False
        return True

    def walk(node, path):
        if isinstance(node, dict):
            if (
                "w" in node
                and "w_scale" not in node  # idempotent: already quantized
                and not isinstance(node["w"], dict)
                and getattr(node["w"], "ndim", 0) == 2
                and node["w"].dtype != jnp.int8
                and _QUANT_W_RE.search(path)
                and selected(path)
            ):
                q, scale = _quantize_w(node["w"])
                out = dict(node)
                out["w"] = q
                out["w_scale"] = scale
                return out
            return {
                k: (v if k in skip and not path else walk(v, f"{path}/{k}" if path else k))
                for k, v in node.items()
            }
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v, f"{path}/{i}") for i, v in enumerate(node))
        if (
            getattr(node, "ndim", 0) == 2
            and _QUANT_HEAD_RE.search(path)
            and selected(path)
        ):
            q, scale = _quantize_w(node)
            return {"w": q, "w_scale": scale}
        return node

    return walk(params, "")
