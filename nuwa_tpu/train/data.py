"""Host-side data pipeline (numpy), parity with the reference datasets
(/root/reference/nuwa_pytorch/train_vqgan_vae.py:49-114,
train_nuwa.py:50-180): image folders, uint8 memmaps, gif+caption folders,
moving-MNIST memmaps, pre-tokenized video-index memmaps, and the offline
"tokenize once, train many" VAE pre-encoding pass.

TPU-first: loaders emit stacked numpy arrays shaped
(grad_accum, batch, ...) so a whole accumulation window ships to the device
as one transfer and the jitted train step ``lax.scan``s over microbatches.
"""
from __future__ import annotations

import random
from pathlib import Path

import numpy as np


def cycle(iterable_fn):
    while True:
        yield from iterable_fn()


def accum_log(log, new_logs):
    for k, v in new_logs.items():
        log[k] = log.get(k, 0.0) + v
    return log


# ---------------------------------------------------------------------------
# image transforms (numpy)
# ---------------------------------------------------------------------------


def _load_image(path, image_size, channels=3, flip_p=0.5, rng=None):
    from PIL import Image

    img = Image.open(path)
    if channels == 3 and img.mode != "RGB":
        img = img.convert("RGB")
    if channels == 1 and img.mode != "L":
        img = img.convert("L")
    # resize shorter side then center crop
    w, h = img.size
    scale = image_size / min(w, h)
    img = img.resize((max(image_size, round(w * scale)), max(image_size, round(h * scale))))
    w, h = img.size
    left, top = (w - image_size) // 2, (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if rng is not None and rng.random() < flip_p:
        arr = arr[:, ::-1]
    return np.ascontiguousarray(arr.transpose(2, 0, 1))  # (c, h, w)


class ImageDataset:
    """Folder of images -> float32 (c, h, w) in [0, 1] with random h-flip."""

    def __init__(self, folder, image_size, exts=("jpg", "jpeg", "png"), channels=3,
                 seed=0):
        self.paths = sorted(
            p for ext in exts for p in Path(folder).glob(f"**/*.{ext}")
        )
        print(f"{len(self.paths)} training samples found at {folder}")
        self.image_size = image_size
        self.channels = channels
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        return _load_image(
            self.paths[index], self.image_size, self.channels, rng=self.rng
        )


class MemmappedImageDataset:
    """uint8 np.memmap of images with optional random 90° rotations."""

    def __init__(self, *, path, shape, random_rotate=True, seed=0):
        path = Path(path)
        assert path.exists(), f"path {path} must exist"
        self.memmap = np.memmap(str(path), mode="r", dtype=np.uint8, shape=shape)
        self.random_rotate = random_rotate
        self.rng = random.Random(seed)

    def __len__(self):
        return self.memmap.shape[0]

    def __getitem__(self, index):
        from ..native import gather_normalize_f32, rot90_f32

        arr = gather_normalize_f32(self.memmap, np.asarray([index]))[0]
        if arr.ndim == 2:
            arr = arr[None]
        if self.random_rotate:
            k = self.rng.choice([0, 1, 2, 3])
            arr = rot90_f32(arr, k)
        return arr  # (c, h, w)


class MnistDataset:
    """Moving-MNIST-style memmap videos + digit labels -> (text, video)."""

    def __init__(self, num_videos, videos_memmap_path, text_memmap_path,
                 num_digits=2, num_frames=10, image_size=64, channels=1,
                 random_rotate=False, tokenizer=None, seed=0):
        self.num_videos = num_videos
        self.videos = np.memmap(
            videos_memmap_path, mode="r", dtype=np.uint8,
            shape=(num_videos, num_frames, channels, image_size, image_size),
        )
        self.texts = np.memmap(
            text_memmap_path, mode="r", dtype=np.uint8, shape=(num_videos, num_digits)
        )
        self.random_rotate = random_rotate
        self.rng = random.Random(seed)
        if tokenizer is None:
            from ..tokenizer import tokenizer as default_tok

            tokenizer = default_tok
        self.tokenizer = tokenizer

    def __len__(self):
        return self.num_videos

    def __getitem__(self, idx):
        video = np.asarray(self.videos[idx], dtype=np.float32) / 255.0
        label = self.texts[idx].tolist()
        text = np.asarray(
            self.tokenizer.encode(" ".join(map(str, label))), dtype=np.int64
        )
        if self.random_rotate:
            k = self.rng.choice([0, 1, 2, 3])
            video = np.rot90(video, k, axes=(-2, -1)).copy()
        return text, video


class VideoIndicesDataset:
    """Pre-tokenized videos: int64 memmap of codebook indices + labels."""

    def __init__(self, *, videos_memmap_path, text_memmap_path, vae, num_videos,
                 num_frames, num_digits=2, tokenizer=None):
        self.num_videos = num_videos
        fmap_size = vae.fmap_size
        self.videos = np.memmap(
            videos_memmap_path, mode="r", dtype=np.int64,
            shape=(num_videos, num_frames * fmap_size * fmap_size),
        )
        self.texts = np.memmap(
            text_memmap_path, mode="r", dtype=np.uint8, shape=(num_videos, num_digits)
        )
        if tokenizer is None:
            from ..tokenizer import tokenizer as default_tok

            tokenizer = default_tok
        self.tokenizer = tokenizer

    def __len__(self):
        return self.num_videos

    def __getitem__(self, idx):
        video = np.asarray(self.videos[idx], dtype=np.int64)
        label = self.texts[idx].tolist()
        text = np.asarray(
            self.tokenizer.encode(" ".join(map(str, label))), dtype=np.int64
        )
        return text, video


class GifVideoDataset:
    """Folder of .gif/.txt caption pairs matched by stem."""

    def __init__(self, *, folder, channels=1, tokenizer=None):
        folder = Path(folder)
        gif_stems = {str(p.with_suffix("")) for p in folder.glob("**/*.gif")}
        txt_stems = {str(p.with_suffix("")) for p in folder.glob("**/*.txt")}
        self.path_stems = sorted(gif_stems & txt_stems)
        self.channels = channels
        print(f"{len(self.path_stems)} video / text pairs found")
        if tokenizer is None:
            from ..tokenizer import tokenizer as default_tok

            tokenizer = default_tok
        self.tokenizer = tokenizer

    def __len__(self):
        return len(self.path_stems)

    def __getitem__(self, idx):
        from ..utils.image import gif_to_array

        stem = self.path_stems[idx]
        text = np.asarray(
            self.tokenizer.encode(Path(f"{stem}.txt").read_text()), dtype=np.int64
        )
        video = gif_to_array(f"{stem}.gif", channels=self.channels)
        return text, video


# ---------------------------------------------------------------------------
# offline VAE pre-tokenization (reference train_nuwa.py:56-80)
# ---------------------------------------------------------------------------


def convert_video_dataset_to_indices(*, vae, vae_params, vae_state,
                                     raw_video_dataset, num_frames, path,
                                     batch_size=8):
    """Encode every video through the frozen VAE once, writing an int64
    memmap of codebook indices ("tokenize once, train many")."""
    import jax.numpy as jnp

    num_videos = len(raw_video_dataset)
    assert num_videos > 0
    fmap_size = vae.fmap_size
    shape = (num_videos, num_frames * fmap_size * fmap_size)
    out = np.memmap(path, mode="w+", dtype=np.int64, shape=shape)

    buf = []
    rows = []
    for ind in range(num_videos):
        item = raw_video_dataset[ind]
        video = item[1] if isinstance(item, tuple) else item
        buf.append(np.asarray(video))
        rows.append(ind)
        if len(buf) == batch_size or ind == num_videos - 1:
            batch = jnp.asarray(np.stack(buf))
            idx = vae.get_video_indices(vae_params, vae_state, batch)
            out[np.asarray(rows)] = np.asarray(idx).reshape(len(buf), -1)
            buf, rows = [], []
    out.flush()
    print(f"completed conversion of {num_videos} videos to indices at {path}")
    return path


# ---------------------------------------------------------------------------
# batching
# ---------------------------------------------------------------------------


def pad_collate(batch, pad_value=0):
    """Pad ragged 1-D texts, stack videos: [(text, video)] -> (texts, videos)."""
    texts, videos = zip(*batch)
    max_len = max(t.shape[0] for t in texts)
    out = np.full((len(texts), max_len), pad_value, dtype=np.int64)
    for i, t in enumerate(texts):
        out[i, : t.shape[0]] = t
    return out, np.stack(videos)


class DataLoader:
    """Minimal host-side loader: shuffles indices each epoch, yields batches
    (optionally stacked into (grad_accum, batch, ...) windows)."""

    def __init__(self, dataset, batch_size, *, collate_fn=None, shuffle=True,
                 seed=0, drop_last=True):
        self.ds = dataset
        self.batch_size = batch_size
        self.collate = collate_fn if collate_fn is not None else _default_collate
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def __iter__(self):
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        end = n - (n % bs) if self.drop_last else n
        for start in range(0, end, bs):
            idx = order[start : start + bs]
            yield self.collate([self.ds[int(i)] for i in idx])

    def cycle(self):
        while True:
            got = False
            for batch in self:
                got = True
                yield batch
            if not got:
                # empty dataset, or n < batch_size with drop_last: a bare
                # `while True: yield from ...` would spin forever on next()
                raise ValueError(
                    f"DataLoader yields no batches (dataset size {len(self.ds)}"
                    f", batch_size {self.batch_size}, drop_last {self.drop_last})"
                )


def _default_collate(items):
    if isinstance(items[0], tuple):
        return tuple(np.stack(col) for col in zip(*items))
    return np.stack(items)


def stack_microbatches(iterator, accum):
    """Group ``accum`` consecutive batches into one leading axis."""
    while True:
        group = [next(iterator) for _ in range(accum)]
        if isinstance(group[0], tuple):
            # pad ragged text dims across the window before stacking
            cols = list(zip(*group))
            stacked = []
            for col in cols:
                if col[0].ndim >= 2 and col[0].dtype == np.int64 and any(
                    c.shape[1] != col[0].shape[1] for c in col
                ):
                    width = max(c.shape[1] for c in col)
                    padded = [
                        np.pad(c, ((0, 0), (0, width - c.shape[1]))) for c in col
                    ]
                    stacked.append(np.stack(padded))
                else:
                    stacked.append(np.stack(col))
            yield tuple(stacked)
        else:
            yield np.stack(group)
