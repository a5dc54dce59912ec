"""Native (C++) runtime components, loaded via ctypes.

Currently: the memmap batch loader (gather + uint8→f32 normalize + rot90),
used by the memmap datasets when available. Pure-numpy fallbacks keep
everything working when the shared library hasn't been built.
"""
from .loader import (
    build_library,
    gather_i64,
    gather_normalize_f32,
    library_available,
    rot90_f32,
)

__all__ = [
    "build_library",
    "library_available",
    "gather_normalize_f32",
    "gather_i64",
    "rot90_f32",
]
