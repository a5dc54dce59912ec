"""VGG16 perceptual feature extractor in JAX.

The reference hard-depends on torchvision's *pretrained* VGG16 with the last
two classifier layers removed (/root/reference/nuwa_pytorch/vqgan_vae.py:398-399,
514-525). This environment has no network access, so the bundled VGG16 is
random-initialized by default and weights are *loadable*: use
``load_torch_vgg16_state_dict`` to convert a locally available torchvision
``vgg16`` state_dict into this module's params. The perceptual hook on
``VQGanVAE`` is pluggable either way (``perceptual="none"`` disables it, as
the reference's ``use_vgg_and_gan=False`` path does).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .core.layers import Conv2d, Dense, Module

# torchvision vgg16 conv plan: (out_channels per conv, 'M' = maxpool)
_VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M")


@dataclass(frozen=True)
class VGG16Features(Module):
    channels: int = 3
    feature_dim: int = 4096

    def init(self, key):
        p = {"convs": []}
        cin = self.channels
        keys = jax.random.split(key, 16)
        ki = 0
        for spec in _VGG16_PLAN:
            if spec == "M":
                continue
            p["convs"].append(Conv2d(cin, spec, (3, 3), use_bias=True).init(keys[ki]))
            cin = spec
            ki += 1
        k1, k2 = jax.random.split(keys[-1])
        p["fc1"] = Dense(512 * 7 * 7, self.feature_dim, use_bias=True).init(k1)
        p["fc2"] = Dense(self.feature_dim, self.feature_dim, use_bias=True).init(k2)
        return p

    def __call__(self, p, x):
        """x: (b, h, w, 3) in [0, 1]-ish range -> (b, 4096) features."""
        ci = 0
        cin = self.channels
        for spec in _VGG16_PLAN:
            if spec == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
                continue
            x = Conv2d(cin, spec, (3, 3), use_bias=True)(p["convs"][ci], x)
            x = jax.nn.relu(x)
            cin = spec
            ci += 1
        # adaptive average pool to 7x7
        b, h, w, c = x.shape
        if (h, w) != (7, 7):
            x = jax.image.resize(x, (b, 7, 7, c), method="linear")
        # torch flattens CHW order — match it so loaded fc weights line up
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)
        x = jax.nn.relu(Dense(512 * 7 * 7, self.feature_dim, use_bias=True)(p["fc1"], x))
        x = jax.nn.relu(Dense(self.feature_dim, self.feature_dim, use_bias=True)(p["fc2"], x))
        return x


    def features_multiscale(self, p, x, layers=(1, 3, 6, 9, 12)):
        """Intermediate post-relu conv activations at ``layers`` (conv
        indices), for LPIPS-style multi-layer perceptual distances."""
        feats = []
        ci = 0
        cin = self.channels
        for spec in _VGG16_PLAN:
            if spec == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
                continue
            x = Conv2d(cin, spec, (3, 3), use_bias=True)(p["convs"][ci], x)
            x = jax.nn.relu(x)
            if ci in layers:
                feats.append(x)
                if ci >= max(layers):
                    break
            cin = spec
            ci += 1
        return feats


def random_perceptual_loss(p, vgg, img, recon, layers=(1, 3, 6, 9, 12)):
    """LPIPS-style perceptual distance over multi-layer VGG16 features with
    *fixed-seed random* weights — the documented no-download stand-in for
    pretrained VGG16 (the reference hard-uses torchvision's, /root/reference/
    nuwa_pytorch/vqgan_vae.py:398-399,514-525; this box has no weights and no
    egress). Random deep features are a surprisingly strong perceptual
    metric: Zhang et al., "The Unreasonable Effectiveness of Deep Features as
    a Perceptual Metric" (CVPR 2018) report even untrained nets outperform
    pixel metrics, and Saxe et al. (ICML 2011) show random convolutions are
    frequency-selective feature extractors. Features are channel-l2
    normalized per position (as in LPIPS) and layers are equally weighted.
    Swap in real weights via ``load_torch_vgg16_state_dict`` when available.
    """
    fa = vgg.features_multiscale(p, img, layers)
    fb = vgg.features_multiscale(p, recon, layers)

    def unit(f):
        return f * jax.lax.rsqrt(jnp.sum(f * f, axis=-1, keepdims=True) + 1e-10)

    loss = 0.0
    for a, b in zip(fa, fb):
        loss = loss + jnp.mean(jnp.sum((unit(a) - unit(b)) ** 2, axis=-1))
    return loss / len(fa)


def load_torch_vgg16_state_dict(state_dict):
    """Convert a torchvision ``vgg16`` state_dict (numpy-able tensors) into
    ``VGG16Features`` params. Conv kernels OIHW -> HWIO; linears transposed."""
    import numpy as np

    def arr(t):
        return jnp.asarray(np.asarray(t))

    convs = []
    i = 0
    while f"features.{i}.weight" in state_dict or i < 31:
        wkey = f"features.{i}.weight"
        if wkey in state_dict:
            w = arr(state_dict[wkey])  # (O, I, H, W)
            b = arr(state_dict[f"features.{i}.bias"])
            convs.append({"w": w.transpose(2, 3, 1, 0), "b": b})
        i += 1
        if i > 40:
            break
    p = {
        "convs": convs,
        "fc1": {
            "w": arr(state_dict["classifier.0.weight"]).T,
            "b": arr(state_dict["classifier.0.bias"]),
        },
        "fc2": {
            "w": arr(state_dict["classifier.3.weight"]).T,
            "b": arr(state_dict["classifier.3.bias"]),
        },
    }
    return p
