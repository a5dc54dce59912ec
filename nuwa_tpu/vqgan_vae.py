"""VQGAN-VAE: the discrete visual codec.

Parity: reference ``VQGanVAE`` (/root/reference/nuwa_pytorch/vqgan_vae.py:288-548)
— conv encoder/decoder with per-layer resnet blocks and SwinV2-style cosine
attention, EMA vector quantization (nuwa_tpu.vq), PatchGAN discriminator,
hinge/BCE GAN losses, perceptual loss, gradient penalty and the adaptive
generator-loss weight.

TPU-first notes:
  * all conv compute is NHWC (TPU-preferred); the public API keeps the
    reference's channels-first convention (b, c, h, w) / (b, f, c, h, w).
  * ``fmap_size`` uses the correct ``image_size // 2**num_layers`` (the
    reference's ``num_layers ** 2`` at vqgan_vae.py:324 is a quirk that only
    coincides at 2 and 4 layers).
  * the adaptive weight (reference :527-543) is computed with two tiny
    ``jax.grad`` calls over *only the final 1×1 conv* — the pre-final
    activation is reused, so no full re-forward is paid.
  * perceptual loss is pluggable: ``perceptual="vgg"`` uses the bundled JAX
    VGG16 (random-init unless weights are loaded — no network access here);
    the reference hard-depends on torchvision's pretrained VGG16 (:398).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .core.layers import (
    Conv2d,
    Dense,
    GroupNorm,
    LayerNormChan,
    Module,
    dropout,
    leaky_relu,
    upsample_nearest_or_bilinear,
)
from .ops.utils import stable_softmax
from .vq import VectorQuantizeEMA, l2norm


# ---------------------------------------------------------------------------
# GAN losses (reference vqgan_vae.py:105-125)
# ---------------------------------------------------------------------------


def hinge_discr_loss(fake, real):
    return jnp.mean(jax.nn.relu(1 + fake) + jax.nn.relu(1 - real))


def hinge_gen_loss(fake):
    return -jnp.mean(fake)


def bce_discr_loss(fake, real):
    return jnp.mean(
        jax.nn.softplus(fake) + jax.nn.softplus(-real)
    )  # -log(1-sig(fake)) - log(sig(real))


def bce_gen_loss(fake):
    return jnp.mean(jax.nn.softplus(-fake))  # -log(sigmoid(fake))


def gradient_penalty(images, discr_fn, weight=10.0):
    """R1-style penalty: (||∂D/∂x||₂ - 1)² (reference :82-89). ``discr_fn``
    maps images -> logits; uses one extra vjp through the discriminator."""

    def scalar_out(imgs):
        return jnp.sum(discr_fn(imgs))

    grads = jax.grad(scalar_out)(images)
    grads = grads.reshape(grads.shape[0], -1)
    norms = jnp.sqrt(jnp.sum(grads**2, axis=1) + 1e-12)
    return weight * jnp.mean((norms - 1.0) ** 2)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ResBlock(Module):
    """conv3-GN-lrelu ×2 then conv1, residual (reference :228-242)."""

    chan: int
    groups: int = 16

    def init(self, key):
        ks = jax.random.split(key, 5)
        c = self.chan
        return {
            "c1": Conv2d(c, c, (3, 3)).init(ks[0]),
            "n1": GroupNorm(c, self.groups).init(ks[1]),
            "c2": Conv2d(c, c, (3, 3)).init(ks[2]),
            "n2": GroupNorm(c, self.groups).init(ks[3]),
            "c3": Conv2d(c, c, (1, 1)).init(ks[4]),
        }

    def __call__(self, p, x):
        c = self.chan
        h = Conv2d(c, c, (3, 3))(p["c1"], x)
        h = leaky_relu(GroupNorm(c, self.groups)(p["n1"], h))
        h = Conv2d(c, c, (3, 3))(p["c2"], h)
        h = leaky_relu(GroupNorm(c, self.groups)(p["n2"], h))
        return Conv2d(c, c, (1, 1))(p["c3"], h) + x


@dataclass(frozen=True)
class GLUResBlock(Module):
    """conv3-GLU-GN ×2 then conv1, residual (reference :212-226)."""

    chan: int
    groups: int = 16

    def init(self, key):
        ks = jax.random.split(key, 5)
        c = self.chan
        return {
            "c1": Conv2d(c, c * 2, (3, 3)).init(ks[0]),
            "n1": GroupNorm(c, self.groups).init(ks[1]),
            "c2": Conv2d(c, c * 2, (3, 3)).init(ks[2]),
            "n2": GroupNorm(c, self.groups).init(ks[3]),
            "c3": Conv2d(c, c, (1, 1)).init(ks[4]),
        }

    def __call__(self, p, x):
        c = self.chan
        h = Conv2d(c, c * 2, (3, 3))(p["c1"], x)
        h = jax.nn.glu(h, axis=-1)
        h = GroupNorm(c, self.groups)(p["n1"], h)
        h = Conv2d(c, c * 2, (3, 3))(p["c2"], h)
        h = jax.nn.glu(h, axis=-1)
        h = GroupNorm(c, self.groups)(p["n2"], h)
        return Conv2d(c, c, (1, 1))(p["c3"], h) + x


@dataclass(frozen=True)
class ContinuousPositionBias(Module):
    """MLP over signed-log relative coords (SwinV2; reference :178-210)."""

    dim: int
    heads: int
    layers: int = 2

    def init(self, key):
        ks = jax.random.split(key, self.layers + 1)
        p = {"in": Dense(2, self.dim, use_bias=True).init(ks[0])}
        for i in range(self.layers - 1):
            p[f"mid{i}"] = Dense(self.dim, self.dim, use_bias=True).init(ks[i + 1])
        p["out"] = Dense(self.dim, self.heads, use_bias=True).init(ks[-1])
        return p

    def __call__(self, p, fmap_size):
        import numpy as np

        pos = np.arange(fmap_size)
        grid = np.stack(np.meshgrid(pos, pos, indexing="ij"), axis=-1).reshape(-1, 2)
        rel = grid[:, None, :] - grid[None, :, :]
        rel = np.sign(rel) * np.log(np.abs(rel) + 1)
        rel = jnp.asarray(rel, jnp.float32)

        h = leaky_relu(Dense(2, self.dim, use_bias=True)(p["in"], rel))
        for i in range(self.layers - 1):
            h = leaky_relu(Dense(self.dim, self.dim, use_bias=True)(p[f"mid{i}"], h))
        bias = Dense(self.dim, self.heads, use_bias=True)(p["out"], h)
        return bias.transpose(2, 0, 1)  # (heads, i, j)


@dataclass(frozen=True)
class VQGanAttention(Module):
    """Cosine-sim attention over conv maps with learned log-scale temperature
    and continuous position bias (reference :244-286)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    dropout: float = 0.0

    @property
    def inner_dim(self):
        return self.heads * self.dim_head

    def init(self, key):
        ks = jax.random.split(key, 4)
        return {
            "scale": jnp.full((self.heads,), math.log(0.01)),
            "to_qkv": Conv2d(self.dim, self.inner_dim * 3, (1, 1), use_bias=False).init(ks[0]),
            "to_out": Conv2d(self.inner_dim, self.dim, (1, 1)).init(ks[1]),
            "cpb": ContinuousPositionBias(self.dim // 4, self.heads).init(ks[2]),
            "post_norm": LayerNormChan(self.dim).init(ks[3]),
        }

    def __call__(self, p, x, *, key=None):
        b, hh, ww, _ = x.shape
        h, dh = self.heads, self.dim_head
        qkv = Conv2d(self.dim, self.inner_dim * 3, (1, 1), use_bias=False)(p["to_qkv"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            return t.reshape(b, hh * ww, h, dh).transpose(0, 2, 1, 3)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        q, k = l2norm(q), l2norm(k)

        sim = jnp.einsum("bhid,bhjd->bhij", q, k)
        sim = sim * jnp.exp(p["scale"])[None, :, None, None]
        sim = sim + ContinuousPositionBias(self.dim // 4, self.heads)(p["cpb"], hh)[None]

        attn = stable_softmax(sim, axis=-1)
        attn = dropout(attn, self.dropout, key)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, hh, ww, self.inner_dim)
        out = Conv2d(self.inner_dim, self.dim, (1, 1))(p["to_out"], out)
        out = LayerNormChan(self.dim)(p["post_norm"], out)
        return out + x


@dataclass(frozen=True)
class Discriminator(Module):
    """PatchGAN-ish conv stack (reference :145-176)."""

    dims: Tuple[int, ...]
    channels: int = 3
    groups: int = 16
    init_kernel_size: int = 5

    def init(self, key):
        ks = jax.random.split(key, len(self.dims) + 2)
        p = {
            "first": Conv2d(
                self.channels, self.dims[0],
                (self.init_kernel_size, self.init_kernel_size),
            ).init(ks[0])
        }
        for i, (din, dout) in enumerate(zip(self.dims[:-1], self.dims[1:])):
            kk = jax.random.split(ks[i + 1], 2)
            p[f"down{i}"] = {
                "conv": Conv2d(din, dout, (4, 4), stride=(2, 2), padding=((1, 1), (1, 1))).init(kk[0]),
                "norm": GroupNorm(dout, self.groups).init(kk[1]),
            }
        d = self.dims[-1]
        kk = jax.random.split(ks[-1], 2)
        p["head1"] = Conv2d(d, d, (1, 1)).init(kk[0])
        p["head2"] = Conv2d(d, 1, (4, 4), padding="VALID").init(kk[1])
        return p

    def __call__(self, p, x):
        x = leaky_relu(
            Conv2d(self.channels, self.dims[0],
                   (self.init_kernel_size, self.init_kernel_size))(p["first"], x)
        )
        for i, (din, dout) in enumerate(zip(self.dims[:-1], self.dims[1:])):
            x = Conv2d(din, dout, (4, 4), stride=(2, 2), padding=((1, 1), (1, 1)))(
                p[f"down{i}"]["conv"], x
            )
            x = leaky_relu(GroupNorm(dout, self.groups)(p[f"down{i}"]["norm"], x))
        d = self.dims[-1]
        x = leaky_relu(Conv2d(d, d, (1, 1))(p["head1"], x))
        return Conv2d(d, 1, (4, 4), padding="VALID")(p["head2"], x)


# ---------------------------------------------------------------------------
# VQGanVAE
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VQGanVAE(Module):
    dim: int
    image_size: int
    channels: int = 3
    num_layers: int = 4
    layer_mults: Optional[Tuple[int, ...]] = None
    l2_recon_loss: bool = False
    use_hinge_loss: bool = True
    num_resnet_blocks: int | Tuple[int, ...] = 1
    vq_codebook_dim: int = 256
    vq_codebook_size: int = 512
    vq_decay: float = 0.8
    vq_commitment_weight: float = 1.0
    vq_kmeans_init: bool = True
    vq_use_cosine_sim: bool = True
    vq_orthogonal_reg_weight: float = 0.0
    vq_threshold_ema_dead_code: float = 0.0
    use_attn: bool | Tuple[bool, ...] = True
    attn_dim_head: int = 64
    attn_heads: int = 8
    resnet_groups: int = 16
    attn_dropout: float = 0.0
    first_conv_kernel_size: int = 5
    use_vgg_and_gan: bool = True
    perceptual: str = "vgg"  # "vgg" | "none"
    # upper clamp on the adaptive GAN weight (reference :543 uses 1e4). When
    # the discriminator saturates (gen grad -> 0) the ratio explodes and the
    # 1e4 amplification can collapse the generator — cap it lower (e.g. 1.0)
    # for stable high-resolution training
    adaptive_weight_cap: float = 1e4
    # mixed precision: conv/attention activations run in this dtype (params
    # and optimizer stay fp32; norms/VQ/losses stay fp32 internally)
    compute_dtype: Optional[str] = None  # e.g. "bfloat16"

    # ---- derived config ---------------------------------------------------

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype) if self.compute_dtype else None

    @property
    def mults(self):
        if self.layer_mults is not None:
            assert len(self.layer_mults) == self.num_layers
            return self.layer_mults
        return tuple(2**i for i in range(self.num_layers))

    @property
    def layer_dims(self):
        return tuple(self.dim * m for m in self.mults)

    @property
    def dims(self):
        return (self.dim, *self.layer_dims)

    @property
    def codebook_size(self):
        return self.vq_codebook_size

    @property
    def fmap_size(self):
        # reference quirk fixed: image_size // 2**num_layers (see module doc)
        return self.image_size // (2**self.num_layers)

    @property
    def resnet_blocks_per_layer(self):
        n = self.num_resnet_blocks
        if isinstance(n, tuple):
            assert len(n) == self.num_layers
            return n
        return (*((0,) * (self.num_layers - 1)), n)

    @property
    def attn_per_layer(self):
        a = self.use_attn
        if isinstance(a, tuple):
            assert len(a) == self.num_layers
            return a
        return (*((False,) * (self.num_layers - 1)), a)

    @property
    def vq(self):
        return VectorQuantizeEMA(
            dim=self.layer_dims[-1],
            codebook_size=self.vq_codebook_size,
            codebook_dim=self.vq_codebook_dim,
            decay=self.vq_decay,
            commitment_weight=self.vq_commitment_weight,
            kmeans_init=self.vq_kmeans_init,
            cosine_sim=self.vq_use_cosine_sim,
            orthogonal_reg_weight=self.vq_orthogonal_reg_weight,
            threshold_ema_dead_code=self.vq_threshold_ema_dead_code,
        )

    @property
    def discriminator(self):
        return Discriminator(
            dims=self.dims, channels=self.channels, groups=self.resnet_groups
        )

    def _attn(self, dim):
        return VQGanAttention(
            dim=dim, heads=self.attn_heads, dim_head=self.attn_dim_head,
            dropout=self.attn_dropout,
        )

    # ---- init -------------------------------------------------------------

    def init(self, key, include_gan: Optional[bool] = None):
        include_gan = self.use_vgg_and_gan if include_gan is None else include_gan
        ks = iter(jax.random.split(key, 6 + self.num_layers * 8))
        dims = self.dims

        enc = {"first": Conv2d(
            self.channels, self.dim,
            (self.first_conv_kernel_size, self.first_conv_kernel_size),
        ).init(next(ks))}
        dec = {"last": Conv2d(self.dim, self.channels, (1, 1)).init(next(ks))}

        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            enc[f"down{i}"] = Conv2d(din, dout, (4, 4), stride=(2, 2), padding=((1, 1), (1, 1))).init(next(ks))
            dec[f"up{i}"] = Conv2d(dout, din, (3, 3)).init(next(ks))
            enc[f"res{i}"] = [
                ResBlock(dout, self.resnet_groups).init(next(ks))
                for _ in range(self.resnet_blocks_per_layer[i])
            ]
            dec[f"res{i}"] = [
                GLUResBlock(dout, self.resnet_groups).init(next(ks))
                for _ in range(self.resnet_blocks_per_layer[i])
            ]
            if self.attn_per_layer[i]:
                enc[f"attn{i}"] = self._attn(dout).init(next(ks))
                dec[f"attn{i}"] = self._attn(dout).init(next(ks))

        p = {"enc": enc, "dec": dec, "vq": self.vq.init(next(ks))}
        if include_gan and self.use_vgg_and_gan:
            p["discr"] = self.discriminator.init(next(ks))
            if self.perceptual in ("vgg", "random_vgg"):
                from .perceptual import VGG16Features

                # random_vgg: fixed seed, never trained — a deterministic
                # random-feature perceptual metric (see perceptual.py)
                key_vgg = (
                    jax.random.PRNGKey(0)
                    if self.perceptual == "random_vgg"
                    else next(ks)
                )
                p["vgg"] = VGG16Features(channels=3).init(key_vgg)
        return p

    def init_state(self, key):
        return {"vq": self.vq.init_state(key)}

    def eval_params(self, p):
        """Strip discriminator + perceptual net (reference ``copy_for_eval``,
        vqgan_vae.py:408-417 / checkpoint hygiene :419-425)."""
        return {k: v for k, v in p.items() if k not in ("discr", "vgg")}

    # ---- encode / decode (NHWC internal) -----------------------------------

    def _encode_fmap(self, p, x):
        if self._dtype is not None:
            x = x.astype(self._dtype)
        x = Conv2d(self.channels, self.dim,
                   (self.first_conv_kernel_size, self.first_conv_kernel_size))(
            p["enc"]["first"], x)
        dims = self.dims
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            x = leaky_relu(
                Conv2d(din, dout, (4, 4), stride=(2, 2), padding=((1, 1), (1, 1)))(
                    p["enc"][f"down{i}"], x))
            for rp in p["enc"][f"res{i}"]:
                x = ResBlock(dout, self.resnet_groups)(rp, x)
            if self.attn_per_layer[i]:
                x = self._attn(dout)(p["enc"][f"attn{i}"], x)
        return x

    def _decode_fmap(self, p, x):
        if self._dtype is not None:
            x = x.astype(self._dtype)
        dims = self.dims
        for i in reversed(range(self.num_layers)):
            din, dout = dims[i], dims[i + 1]
            for rp in reversed(p["dec"][f"res{i}"]):
                x = GLUResBlock(dout, self.resnet_groups)(rp, x)
            if self.attn_per_layer[i]:
                x = self._attn(dout)(p["dec"][f"attn{i}"], x)
            x = upsample_nearest_or_bilinear(x, 2, "bilinear")
            x = leaky_relu(Conv2d(dout, din, (3, 3))(p["dec"][f"up{i}"], x))
        return Conv2d(self.dim, self.channels, (1, 1))(p["dec"]["last"], x)

    def _decode_head(self, p, x):
        """Final 1×1 conv separated out so the adaptive weight can grad
        against just this layer's parameters."""
        return Conv2d(self.dim, self.channels, (1, 1))(p, x)

    def _decode_trunk(self, p, x):
        dims = self.dims
        for i in reversed(range(self.num_layers)):
            din, dout = dims[i], dims[i + 1]
            for rp in reversed(p["dec"][f"res{i}"]):
                x = GLUResBlock(dout, self.resnet_groups)(rp, x)
            if self.attn_per_layer[i]:
                x = self._attn(dout)(p["dec"][f"attn{i}"], x)
            x = upsample_nearest_or_bilinear(x, 2, "bilinear")
            x = leaky_relu(Conv2d(dout, din, (3, 3))(p["dec"][f"up{i}"], x))
        return x

    # ---- public API (channels-first at the boundary) ----------------------

    @staticmethod
    def _norm_state(state):
        """Accept either the wrapped {"vq": codebook_state} form (init_state)
        or the bare codebook state dict (has an "embed" leaf) — both appear
        at trainer/model seams."""
        if "vq" in state:
            return state
        assert "embed" in state, "not a VQ state pytree"
        return {"vq": state}

    @staticmethod
    def _to_nhwc(img):
        return jnp.transpose(img, (0, 2, 3, 1))

    @staticmethod
    def _to_nchw(img):
        return jnp.transpose(img, (0, 3, 1, 2))

    def encode(self, p, state, img, *, update_vq=False, rng=None, axis_name=None):
        """img: (b, c, h, w) -> (fmap (b,c',h',w'), indices (b,h'w'), commit, state)."""
        state = self._norm_state(state)
        x = self._encode_fmap(p, self._to_nhwc(img))
        # the quantizer (EMA stats, distances) always runs fp32
        quant, indices, commit, vq_state = self.vq(
            p["vq"], state["vq"], x.astype(jnp.float32), update=update_vq,
            rng=rng, axis_name=axis_name,
        )
        b, hh, ww, _ = quant.shape
        return (
            self._to_nchw(quant),
            indices.reshape(b, hh * ww),
            commit,
            {"vq": vq_state},
        )

    def decode(self, p, fmap):
        """fmap: (b, c', h', w') -> (b, c, h, w) fp32 pixels."""
        out = self._decode_fmap(p, self._to_nhwc(fmap)).astype(jnp.float32)
        return self._to_nchw(out)

    def codebook(self, p, state):
        return self.vq.codebook(p["vq"], self._norm_state(state)["vq"])

    def get_video_indices(self, p, state, video):
        """video: (b, f, c, h, w) -> (b, f, fmap*fmap) codebook indices."""
        b, f = video.shape[:2]
        images = video.reshape(b * f, *video.shape[2:])
        _, indices, _, _ = self.encode(p, state, images)
        return indices.reshape(b, f, -1)

    def codebook_indices_to_video(self, p, state, indices, *, decode_chunks=None):
        """indices: (b, n) -> video (b, f, c, h, w)."""
        b, n = indices.shape
        tpf = self.fmap_size * self.fmap_size
        f = n // tpf
        codes = jnp.take(self.codebook(p, state), indices, axis=0)
        codes = codes.reshape(b * f, self.fmap_size, self.fmap_size, -1)
        codes = self._to_nchw(codes)
        if decode_chunks is None:
            video = self.decode(p, codes)
        else:
            from .ops.utils import batch_process

            video = batch_process(codes, lambda c: self.decode(p, c), chunks=decode_chunks)
        return video.reshape(b, f, *video.shape[1:])

    # ---- losses ------------------------------------------------------------

    def _recon_loss(self, fmap, img):
        if self.l2_recon_loss:
            return jnp.mean((fmap - img) ** 2)
        return jnp.mean(jnp.abs(fmap - img))

    def _perceptual_loss(self, p, img_nhwc, recon_nhwc):
        if self.perceptual not in ("vgg", "random_vgg") or "vgg" not in p:
            return jnp.asarray(0.0)
        from .perceptual import VGG16Features, random_perceptual_loss

        vgg = VGG16Features(channels=3)
        if self.channels == 1:  # grayscale -> repeat to rgb (reference :519-521)
            img_nhwc = jnp.repeat(img_nhwc, 3, axis=-1)
            recon_nhwc = jnp.repeat(recon_nhwc, 3, axis=-1)
        if self.perceptual == "random_vgg":
            # LPIPS-style multi-layer distance over fixed random features —
            # the documented no-pretrained-weights mode (perceptual.py)
            return random_perceptual_loss(p["vgg"], vgg, img_nhwc, recon_nhwc)
        f_img = vgg(p["vgg"], img_nhwc)
        f_rec = vgg(p["vgg"], recon_nhwc)
        return jnp.mean((f_img - f_rec) ** 2)

    def forward(
        self,
        p,
        state,
        img,
        *,
        return_loss=False,
        return_discr_loss=False,
        return_recons=False,
        apply_grad_penalty=False,
        update_vq=None,
        rng=None,
        axis_name=None,
    ):
        """Reference forward modes (vqgan_vae.py:460-548). img: (b, c, h, w).

        Returns (by mode): recon | (loss, state[, recon]) | (discr_loss[, recon]).
        """
        assert img.shape[-1] == self.image_size and img.shape[-2] == self.image_size
        assert img.shape[1] == self.channels
        update_vq = return_loss if update_vq is None else update_vq
        state = self._norm_state(state)

        x = self._to_nhwc(img)
        fmap_enc = self._encode_fmap(p, x)
        quant, indices, commit_loss, vq_state = self.vq(
            p["vq"], state["vq"], fmap_enc.astype(jnp.float32), update=update_vq,
            rng=rng, axis_name=axis_name,
        )
        new_state = {"vq": vq_state}

        if self._dtype is not None:
            quant = quant.astype(self._dtype)
        trunk = self._decode_trunk(p, quant)
        # reconstruction and every loss downstream stay fp32
        recon_nhwc = self._decode_head(p["dec"]["last"], trunk).astype(jnp.float32)
        recon = self._to_nchw(recon_nhwc)

        if not return_loss and not return_discr_loss:
            return recon

        assert return_loss ^ return_discr_loss

        def discr_logits(dp, inp):
            # discriminator convs in compute dtype, logits back to fp32
            if self._dtype is not None:
                inp = inp.astype(self._dtype)
            return self.discriminator(dp, inp).astype(jnp.float32)

        if return_discr_loss:
            assert "discr" in p, "discriminator must exist to train it"
            fake = jax.lax.stop_gradient(recon_nhwc)
            fake_logits = discr_logits(p["discr"], fake)
            real_logits = discr_logits(p["discr"], x)
            loss_fn = hinge_discr_loss if self.use_hinge_loss else bce_discr_loss
            loss = loss_fn(fake_logits, real_logits)
            if apply_grad_penalty:
                # gradient penalty stays full fp32 (double-backward precision)
                gp = gradient_penalty(x, lambda im: self.discriminator(p["discr"], im))
                loss = loss + gp
            if return_recons:
                return loss, recon
            return loss

        recon_loss = self._recon_loss(recon_nhwc, x)

        if not self.use_vgg_and_gan or "discr" not in p:
            loss = recon_loss + commit_loss
            if return_recons:
                return loss, new_state, recon
            return loss, new_state

        perceptual_loss = self._perceptual_loss(p, x, recon_nhwc)

        gen_loss_fn = hinge_gen_loss if self.use_hinge_loss else bce_gen_loss
        gen_loss = gen_loss_fn(discr_logits(p["discr"], recon_nhwc))

        # adaptive weight: ‖∂perceptual/∂w_last‖ / ‖∂gen/∂w_last‖ clamped 1e4
        # (reference :527-543) — grads w.r.t. the final conv only, reusing the
        # trunk activation (no full re-forward).
        trunk_sg = jax.lax.stop_gradient(trunk)
        x_sg = jax.lax.stop_gradient(x)

        def head_perceptual(w_last):
            r = self._decode_head(w_last, trunk_sg).astype(jnp.float32)
            return self._perceptual_loss(p, x_sg, r)

        def head_gen(w_last):
            r = self._decode_head(w_last, trunk_sg).astype(jnp.float32)
            return gen_loss_fn(discr_logits(p["discr"], r))

        w_last = jax.lax.stop_gradient(p["dec"]["last"])
        g_perc = jax.grad(head_perceptual)(w_last)["w"]
        g_gen = jax.grad(head_gen)(w_last)["w"]
        norm_perc = jnp.sqrt(jnp.sum(g_perc**2))
        norm_gen = jnp.sqrt(jnp.sum(g_gen**2))
        adaptive_weight = jnp.clip(
            norm_perc / (norm_gen + 1e-6), None, self.adaptive_weight_cap
        )
        adaptive_weight = jax.lax.stop_gradient(adaptive_weight)

        loss = recon_loss + perceptual_loss + commit_loss + adaptive_weight * gen_loss
        if return_recons:
            return loss, new_state, recon
        return loss, new_state
