"""HuggingFace dataset ingestion -> HBM-resident banks.

Behavioral reference: /root/reference/ap_gym/envs/image/
huggingface_image_classification_dataset.py:13-80 (load_dataset + split
selection + filter_labels subsetting with label remap) and
image_classification_dataset.py:66-84 (normalization rules: uint8 stays
uint8 until after the gather, HW -> HWC, grayscale -> RGB repeat when the
env expects 3 channels).

TPU-native design: ingestion happens ONCE at environment construction —
the whole split is packed into a uint8 HBM bank (4x smaller than f32;
/255 conversion happens after the per-episode gather, dataset.py:67-74).
There is no per-step host I/O, no iterator threads.

Offline behavior: this build environment has zero network egress, so
``load_hf_image_bank`` first tries the local HF cache (HF_HUB_OFFLINE) and
otherwise falls back to a *deterministic synthetic* stand-in bank with the
real dataset's geometry (shape/classes), controlled by ``synthetic``:
  * "auto" (default): real data if cached, synthetic otherwise,
  * True: always synthetic,  * False: raise if the cache misses.
Synthetic banks are clearly marked (``bank_kind == "synthetic"``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import numpy as np

from .dataset import BankImageDataset

__all__ = ["HF_DATASET_GEOMETRY", "load_hf_image_bank", "synthetic_image_bank"]


@dataclasses.dataclass(frozen=True)
class _Geometry:
    image_hw: tuple[int, int]
    channels: int
    num_classes: int
    split_sizes: dict  # split -> count
    class_names: tuple[str, ...] | None = None


CIFAR10_CLASSES = (
    "airplane", "automobile", "bird", "cat", "deer",
    "dog", "frog", "horse", "ship", "truck",
)

HF_DATASET_GEOMETRY: dict[str, _Geometry] = {
    "mnist": _Geometry((28, 28), 1, 10, {"train": 60000, "test": 10000}),
    "cifar10": _Geometry(
        (32, 32), 3, 10, {"train": 50000, "test": 10000}, CIFAR10_CLASSES
    ),
    "zh-plus/tiny-imagenet": _Geometry(
        (64, 64), 3, 200, {"train": 100000, "valid": 10000}
    ),
}


def synthetic_image_bank(
    name: str,
    split: str = "train",
    channels: int | None = None,
    filter_labels: Sequence[str] | None = None,
    num_points: int | None = None,
    seed: int = 0,
) -> BankImageDataset:
    """Deterministic procedural stand-in with the real dataset's geometry.

    Images are class-dependent sinusoidal textures plus per-sample phase
    noise — enough signal that classification/localization envs remain
    learnable, with zero network dependency.
    """
    geo = HF_DATASET_GEOMETRY[name]
    h, w = geo.image_hw
    c = geo.channels if channels is None else channels
    k = geo.num_classes
    label_subset = None
    if filter_labels is not None:
        assert geo.class_names is not None
        label_subset = [geo.class_names.index(l) for l in filter_labels]
        k = len(label_subset)
    n = num_points or min(geo.split_sizes.get(split, 8192), 8192)

    rng = np.random.default_rng((seed, hash(name) & 0xFFFF, 0 if split == "train" else 1))
    labels = rng.integers(0, k, size=n).astype(np.int32)
    phase = rng.uniform(0, 2 * np.pi, size=(n, 1, 1, 1)).astype(np.float32)
    shift = rng.uniform(-0.5, 0.5, size=(n, 1, 1, 1)).astype(np.float32)

    yy = np.linspace(0, 1, h, dtype=np.float32)[None, :, None, None]
    xx = np.linspace(0, 1, w, dtype=np.float32)[None, None, :, None]
    cc = np.arange(c, dtype=np.float32)[None, None, None, :]
    freq = (labels[:, None, None, None] + 1).astype(np.float32)
    two_pi = np.float32(2 * np.pi)  # keep the whole pipeline f32 — a f64
    # promotion here doubles generation time for 100k-image banks
    img = 0.5 + 0.25 * np.sin(
        two_pi * (freq * (xx + shift) + (cc + 1) * yy) + phase, dtype=np.float32
    ) + 0.25 * np.cos(two_pi * freq * yy + phase, dtype=np.float32)
    img = np.clip(img, np.float32(0.0), np.float32(1.0))
    bank = BankImageDataset.from_numpy(
        (img * 255).astype(np.uint8), labels, num_classes=k
    )
    object.__setattr__(bank, "_bank_kind", "synthetic")
    return bank


def _pack_hf_split(data, image_key: str, label_key: str, channels: int):
    """Materialize an HF split into (N, H, W, C) uint8 + (N,) int32."""
    import PIL.Image

    n = len(data)
    first = np.asarray(data[0][image_key])
    imgs = None
    labels = np.empty(n, dtype=np.int32)
    for i in range(n):
        row = data[i]
        a = np.asarray(row[image_key])
        if a.dtype != np.uint8:
            a = np.clip(np.asarray(a, np.float32) * 255, 0, 255).astype(np.uint8)
        if a.ndim == 2:
            a = a[..., None]
        if a.shape[-1] == 1 and channels == 3:
            a = np.repeat(a, 3, axis=-1)
        if imgs is None:
            imgs = np.empty((n, *a.shape), dtype=np.uint8)
        imgs[i] = a
        labels[i] = int(row[label_key])
    return imgs, labels


def load_hf_image_bank(
    name: str,
    split: str = "train",
    channels: int | None = None,
    image_feature_name: str = "image",
    label_feature_name: str = "label",
    filter_labels: Sequence[str] | None = None,
    synthetic: bool | str = "auto",
    num_points: int | None = None,
) -> BankImageDataset:
    geo = HF_DATASET_GEOMETRY.get(name)
    c = channels if channels is not None else (geo.channels if geo else 3)

    if synthetic is not True:
        try:
            os.environ.setdefault("HF_HUB_OFFLINE", "1")
            os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
            from datasets import load_dataset

            data = load_dataset(name)[split]
            if filter_labels is not None:
                names = data.features[label_feature_name].names
                keep = [names.index(l) for l in filter_labels]
                remap = {v: i for i, v in enumerate(keep)}
                lab = np.asarray(data[label_feature_name])
                sel = np.where(np.isin(lab, keep))[0]
                data = data.select(sel)
                imgs, labels = _pack_hf_split(
                    data, image_feature_name, label_feature_name, c
                )
                labels = np.array([remap[int(l)] for l in labels], dtype=np.int32)
                k = len(keep)
            else:
                imgs, labels = _pack_hf_split(
                    data, image_feature_name, label_feature_name, c
                )
                k = data.features[label_feature_name].num_classes
            bank = BankImageDataset.from_numpy(imgs, labels, num_classes=k)
            object.__setattr__(bank, "_bank_kind", "huggingface")
            return bank
        except Exception:
            if synthetic is False:
                raise
    return synthetic_image_bank(
        name, split=split, channels=channels,
        filter_labels=filter_labels, num_points=num_points,
    )
