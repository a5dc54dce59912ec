"""Token-shift ops: cheap relative positions by rolling channel slices along
video/audio axes.

Parity: reference ``ShiftVideoTokens`` / ``ShiftAudioTokens``
(/root/reference/nuwa_pytorch/nuwa_pytorch.py:157-253). Pure pad/reshape —
these fuse to free data movement under XLA.
"""
from __future__ import annotations

import jax.numpy as jnp

from .utils import padding_to_multiple_of


def _torch_chunk_sizes(dim: int, chunks: int):
    """torch.chunk sizing: ceil(dim/chunks) per chunk, last chunk smaller."""
    per = -(-dim // chunks)
    sizes = []
    left = dim
    while left > 0:
        take = min(per, left)
        sizes.append(take)
        left -= take
    while len(sizes) < chunks:
        sizes.append(0)
    return sizes


def _split_channels(x, chunks):
    sizes = _torch_chunk_sizes(x.shape[-1], chunks)
    outs = []
    start = 0
    for s in sizes:
        outs.append(x[..., start : start + s])
        start += s
    return outs


def _shift_axis(x, axis):
    """Shift by +1 along ``axis`` (pad front with zeros, drop last)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    x = jnp.pad(x, pad)
    slicer = [slice(None)] * x.ndim
    slicer[axis] = slice(0, x.shape[axis] - 1)
    return x[tuple(slicer)]


def shift_video_tokens(x, image_size, shift_space=True, shift_time=False):
    """Shift 1/4 of channels down H and 1/4 down W within each frame (and
    optionally 1/5 chunks incl. time), preserving the leading <bos> token.

    x: (b, n, d) with n = 1 + num_video_tokens.
    """
    if not shift_space and not shift_time:
        return x

    img_seq_len = image_size * image_size
    x_bos, x_video = x[:, :1], x[:, 1:]
    b, n, d = x_video.shape

    padding = padding_to_multiple_of(n, img_seq_len)
    if padding > 0:
        x_video = jnp.pad(x_video, ((0, 0), (0, padding), (0, 0)))

    f = x_video.shape[1] // img_seq_len
    x_video = x_video.reshape(b, f, image_size, image_size, d)

    if shift_space and shift_time:
        x_frame, x_h, x_w, *rest = _split_channels(x_video, 5)
    elif shift_space:
        x_h, x_w, *rest = _split_channels(x_video, 4)
        x_frame = None
    else:
        x_frame, *rest = _split_channels(x_video, 3)
        x_h = x_w = None

    if shift_space:
        x_h = _shift_axis(x_h, axis=2)  # down the height axis within a frame
        x_w = _shift_axis(x_w, axis=3)  # right along the width axis
    if shift_time:
        x_frame = _shift_axis(x_frame, axis=1)

    parts = [t for t in (x_frame, x_h, x_w, *rest) if t is not None]
    x_video = jnp.concatenate(parts, axis=-1)
    x_video = x_video.reshape(b, f * img_seq_len, d)[:, :n]
    return jnp.concatenate([x_bos, x_video], axis=1)


def shift_audio_tokens(x, audio_tokens_per_timestep=1):
    """Shift half of channels forward one token along the audio time axis
    (b, n, d). Mirrors reference ``ShiftAudioTokens``
    (nuwa_pytorch.py:157-183): pad to the next timestep boundary, shift the
    first half of channels by one position, crop back.
    """
    n = x.shape[1]
    padding = padding_to_multiple_of(n, audio_tokens_per_timestep)
    if n % audio_tokens_per_timestep == 0:
        # reference pads `mult - (n % mult)` which yields a full extra
        # timestep when already aligned — harmless (cropped below).
        padding = audio_tokens_per_timestep
    x_pad = jnp.pad(x, ((0, 0), (0, padding), (0, 0)))

    x_shift, x_rest = _split_channels(x_pad, 2)
    x_shift = _shift_axis(x_shift, axis=1)
    out = jnp.concatenate([x_shift, x_rest], axis=-1)
    return out[:, :n]
