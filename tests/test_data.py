"""Data pipeline end-to-end: real image files, gif+caption folders, memmap
datasets, offline VAE pre-tokenization."""
import numpy as np
import pytest

import jax

from nuwa_tpu.train.data import (
    GifVideoDataset,
    ImageDataset,
    MemmappedImageDataset,
    MnistDataset,
    VideoIndicesDataset,
    convert_video_dataset_to_indices,
)

KEY = jax.random.PRNGKey(0)


def _write_png(path, size=12, channels=3):
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(size, size, channels), dtype=np.uint8)
    Image.fromarray(arr if channels == 3 else arr[..., 0]).save(str(path))


def test_image_dataset_folder(tmp_path):
    for i in range(4):
        _write_png(tmp_path / f"img{i}.png", size=12)
    ds = ImageDataset(tmp_path, image_size=8)
    assert len(ds) == 4
    img = ds[0]
    assert img.shape == (3, 8, 8)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_gif_video_dataset(tmp_path):
    from nuwa_tpu.utils.image import array_to_gif

    for i in range(2):
        video = np.random.default_rng(i).uniform(size=(3, 1, 8, 8)).astype(np.float32)
        array_to_gif(video, tmp_path / f"v{i}.gif")
        (tmp_path / f"v{i}.txt").write_text(f"caption {i}")
    ds = GifVideoDataset(folder=tmp_path, channels=1)
    assert len(ds) == 2
    text, video = ds[0]
    assert text.dtype == np.int64 and len(text) > 0
    assert video.shape == (3, 1, 8, 8)


def test_memmap_image_dataset(tmp_path):
    shape = (6, 1, 8, 8)
    mm = np.memmap(tmp_path / "imgs.mm", mode="w+", dtype=np.uint8, shape=shape)
    mm[:] = np.random.default_rng(0).integers(0, 255, size=shape, dtype=np.uint8)
    mm.flush()
    ds = MemmappedImageDataset(path=tmp_path / "imgs.mm", shape=shape)
    assert len(ds) == 6
    img = ds[2]
    assert img.shape[0] == 1 and img.dtype == np.float32


def test_mnist_dataset(tmp_path):
    n, f, c, s = 3, 2, 1, 8
    vids = np.memmap(tmp_path / "v.mm", mode="w+", dtype=np.uint8, shape=(n, f, c, s, s))
    vids[:] = 7
    texts = np.memmap(tmp_path / "t.mm", mode="w+", dtype=np.uint8, shape=(n, 2))
    texts[:] = [[1, 2], [3, 4], [5, 6]]
    vids.flush(); texts.flush()
    ds = MnistDataset(n, tmp_path / "v.mm", tmp_path / "t.mm", num_frames=f,
                      image_size=s, channels=c)
    text, video = ds[1]
    assert video.shape == (f, c, s, s)
    assert np.allclose(video, 7 / 255.0)
    assert len(text) > 0


def test_convert_and_video_indices_dataset(tmp_path):
    from nuwa_tpu.vqgan_vae import VQGanVAE

    vae = VQGanVAE(
        dim=8, image_size=8, num_layers=2, vq_codebook_size=16, vq_codebook_dim=8,
        resnet_groups=4, use_vgg_and_gan=False, vq_kmeans_init=False,
        use_attn=False, num_resnet_blocks=0,
    )
    vp, vs = vae.init(KEY), vae.init_state(KEY)

    class RawVids:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return (np.zeros(2), rng.uniform(size=(2, 3, 8, 8)).astype(np.float32))

    path = tmp_path / "indices.mm"
    convert_video_dataset_to_indices(
        vae=vae, vae_params=vp, vae_state=vs, raw_video_dataset=RawVids(),
        num_frames=2, path=path, batch_size=2,
    )
    mm = np.memmap(path, mode="r", dtype=np.int64, shape=(3, 2 * 4))
    assert (mm >= 0).all() and (mm < 16).all()

    texts = np.memmap(tmp_path / "t.mm", mode="w+", dtype=np.uint8, shape=(3, 2))
    texts[:] = 1
    texts.flush()
    ds = VideoIndicesDataset(
        videos_memmap_path=path, text_memmap_path=tmp_path / "t.mm", vae=vae,
        num_videos=3, num_frames=2,
    )
    text, video = ds[0]
    assert video.shape == (8,) and video.dtype == np.int64
