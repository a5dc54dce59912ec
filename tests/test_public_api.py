"""Public API surface parity (reference nuwa_pytorch/__init__.py:1-5)."""
import nuwa_tpu


def test_public_exports():
    for name in (
        "NUWA",
        "NUWASketch",
        "NUWAVideoAudio",
        "Sparse3DNA",
        "CrossModalityCrossAttention",
        "VQGanVAE",
        "VQGanVAETrainer",
        "NUWATrainer",
    ):
        assert getattr(nuwa_tpu, name) is not None, name

    # extras beyond the reference surface
    for name in ("Attention", "SparseCausal2DNA", "SparseCross2DNA"):
        assert getattr(nuwa_tpu, name) is not None, name
