"""gif <-> array conversion and image-grid saving (parity:
/root/reference/nuwa_pytorch/image_utils.py and the torchvision
``make_grid``/``save_image`` calls in the trainers)."""
from __future__ import annotations

from pathlib import Path

import numpy as np


def seek_all_images(img, channels=3):
    from PIL import Image

    mode = {1: "L", 3: "RGB", 4: "RGBA"}.get(channels)
    assert mode is not None, "channels must be 1, 3, or 4"
    i = 0
    while True:
        try:
            img.seek(i)
            yield img.convert(mode)
        except EOFError:
            return
        i += 1


def gif_to_array(path, channels=3):
    """Read an animated gif -> float32 (frames, channels, h, w) in [0, 1]."""
    from PIL import Image

    img = Image.open(path)
    frames = []
    for frame in seek_all_images(img, channels=channels):
        arr = np.asarray(frame, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
        frames.append(arr.transpose(2, 0, 1))
    return np.stack(frames)


def array_to_gif(arr, path, duration=120, loop=0, optimize=True):
    """Write float32 (frames, channels, h, w) in [0, 1] -> animated gif."""
    from PIL import Image

    arr = np.clip(np.asarray(arr), 0.0, 1.0)
    frames = (arr * 255).astype(np.uint8).transpose(0, 2, 3, 1)
    images = [
        Image.fromarray(f[..., 0] if f.shape[-1] == 1 else f) for f in frames
    ]
    images[0].save(
        str(path), save_all=True, append_images=images[1:],
        duration=duration, loop=loop, optimize=optimize,
    )
    return path


# keep the reference's names as aliases
gif_to_tensor = gif_to_array
video_tensor_to_gif = array_to_gif


def make_grid(images, nrow=8, padding=2, pad_value=0.0):
    """images: (n, c, h, w) in [0,1] -> (c, H, W) grid (torchvision-like)."""
    images = np.asarray(images)
    n, c, h, w = images.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    H = nrows * (h + padding) + padding
    W = ncol * (w + padding) + padding
    grid = np.full((c, H, W), pad_value, dtype=images.dtype)
    for idx in range(n):
        r, cc = divmod(idx, ncol)
        y = r * (h + padding) + padding
        x = cc * (w + padding) + padding
        grid[:, y : y + h, x : x + w] = images[idx]
    return grid


def save_image_grid(images, path, nrow=8):
    """Save (n, c, h, w) images as one PNG grid."""
    from PIL import Image

    grid = make_grid(np.clip(np.asarray(images), 0.0, 1.0), nrow=nrow)
    arr = (grid * 255).astype(np.uint8).transpose(1, 2, 0)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(str(path))
    return path
