from .checkpoint import latest_checkpoint, load_checkpoint, restore_latest, save_checkpoint
from .data import (
    DataLoader,
    GifVideoDataset,
    ImageDataset,
    MemmappedImageDataset,
    MnistDataset,
    VideoIndicesDataset,
    convert_video_dataset_to_indices,
    pad_collate,
)
from .ema import ema_init, ema_update
from .optimizer import get_optimizer, trainable_mask, weight_decay_mask
from .trainer_nuwa import NUWATrainer
from .trainer_vqgan import VQGanVAETrainer

__all__ = [
    "DataLoader",
    "GifVideoDataset",
    "ImageDataset",
    "MemmappedImageDataset",
    "MnistDataset",
    "VideoIndicesDataset",
    "convert_video_dataset_to_indices",
    "pad_collate",
    "ema_init",
    "ema_update",
    "get_optimizer",
    "trainable_mask",
    "weight_decay_mask",
    "NUWATrainer",
    "VQGanVAETrainer",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "restore_latest",
]
