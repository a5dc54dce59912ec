"""nuwa_tpu — a TPU-native (JAX/XLA/Pallas/pjit) text-to-video framework with
the capabilities of lucidrains/nuwa-pytorch.

Public API parity (/root/reference/nuwa_pytorch/__init__.py:1-5):
NUWA, NUWASketch, NUWAVideoAudio, Sparse3DNA, CrossModalityCrossAttention,
VQGanVAE, VQGanVAETrainer, NUWATrainer.
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy imports keep `import nuwa_tpu` light
    if name in ("Sparse3DNA", "SparseCausal2DNA", "SparseCross2DNA"):
        from . import nda as _m

        return getattr(_m, name)
    if name == "CrossModalityCrossAttention":
        from .ops.crossmodality import CrossModalityCrossAttention

        return CrossModalityCrossAttention
    if name == "Attention":
        from .ops.attention import Attention

        return Attention
    if name in ("VQGanVAE",):
        from .vqgan_vae import VQGanVAE

        return VQGanVAE
    if name in ("NUWA", "NUWASketch", "NUWAVideoAudio"):
        from . import models as _m

        return getattr(_m, name)
    if name in ("VQGanVAETrainer", "NUWATrainer"):
        from . import train as _m

        return getattr(_m, name)
    raise AttributeError(f"module 'nuwa_tpu' has no attribute {name!r}")
