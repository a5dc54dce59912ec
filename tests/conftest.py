"""Test config: run on CPU with 8 virtual devices so mesh/sharding tests work
without real multi-chip hardware (the TPU-world substitute for multi-node)."""
import os

# the machine environment pins JAX_PLATFORMS=axon (TPU tunnel) and a
# sitecustomize imports jax at interpreter start, so the env var is already
# baked into jax.config — override the config value itself below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# single-core box: persistent compilation cache makes re-runs cheap
jax.config.update("jax_compilation_cache_dir", "/root/.jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


# ---------------------------------------------------------------------------
# shared tiny-model helpers (used across test files)
# ---------------------------------------------------------------------------


def make_tiny_vae(channels=3):
    """Smallest VQGanVAE that exercises the conv/VQ stack (shared fixture)."""
    from nuwa_tpu.vqgan_vae import VQGanVAE

    return VQGanVAE(
        dim=8, image_size=8, channels=channels, num_layers=2,
        vq_codebook_size=16, vq_codebook_dim=8, resnet_groups=4,
        use_vgg_and_gan=False, vq_kmeans_init=False, use_attn=False,
        num_resnet_blocks=0,
    )
