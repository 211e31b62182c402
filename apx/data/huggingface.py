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
import zlib
from typing import Sequence

import numpy as np

from .dataset import BankImageDataset

__all__ = [
    "HF_DATASET_GEOMETRY",
    "bank_from_hf",
    "load_hf_image_bank",
    "synthetic_image_bank",
]


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

    # zlib.crc32, NOT hash(): str hashing is salted per interpreter, which
    # would make the "deterministic" synthetic bank differ in every process
    # (breaking cross-process A/Bs and multi-host bank replication).
    name_tag = zlib.crc32(name.encode()) & 0xFFFF
    rng = np.random.default_rng((seed, name_tag, 0 if split == "train" else 1))
    labels = rng.integers(0, k, size=n).astype(np.int32)
    phase = rng.uniform(0, 2 * np.pi, size=(n, 1, 1, 1)).astype(np.float32)
    shift = rng.uniform(-0.5, 0.5, size=(n, 1, 1, 1)).astype(np.float32)

    yy = np.linspace(0, 1, h, dtype=np.float32)[None, :, None, None]
    xx = np.linspace(0, 1, w, dtype=np.float32)[None, None, :, None]
    cc = np.arange(c, dtype=np.float32)[None, None, None, :]
    freq = (labels[:, None, None, None] + 1).astype(np.float32)
    two_pi = np.float32(2 * np.pi)  # keep the whole pipeline f32 — a f64
    # promotion here doubles generation time for 100k-image banks
    # Chunk the (purely elementwise) image math: the full-bank form
    # materializes ~4x (n,h,w,c) f32 temporaries (~15 GB host RAM for the
    # 100k TinyImageNet bank). RNG draws above stay whole-bank, so chunking
    # is bitwise-identical to the unchunked expression.
    out = np.empty((n, h, w, c), dtype=np.uint8)
    step = max(1, (64 << 20) // (h * w * c * 4))  # ~64 MB f32 per chunk
    for i in range(0, n, step):
        sl = slice(i, min(i + step, n))
        img = 0.5 + 0.25 * np.sin(
            two_pi * (freq[sl] * (xx + shift[sl]) + (cc + 1) * yy) + phase[sl],
            dtype=np.float32,
        ) + 0.25 * np.cos(two_pi * freq[sl] * yy + phase[sl], dtype=np.float32)
        img = np.clip(img, np.float32(0.0), np.float32(1.0))
        out[sl] = (img * 255).astype(np.uint8)
    bank = BankImageDataset.from_numpy(out, labels, num_classes=k)
    object.__setattr__(bank, "_bank_kind", "synthetic")
    return bank


def _pack_hf_split(data, image_key: str, label_key: str, channels: int):
    """Materialize an HF split into (N, H, W, C) uint8-or-f32 + (N,) int32.

    Columnar (arrow -> numpy) bulk decode, O(columns) not O(rows) — the
    per-row PIL fallback only triggers for ragged image shapes, which none
    of the reference's datasets have. Conversion rules mirror
    image_classification_dataset.py:66-84: uint8 banks stay uint8 (the /255
    happens after the per-episode gather), float inputs stay float32
    verbatim (the reference does NOT rescale them), HW -> HWC, and
    grayscale -> RGB repeat when the env expects 3 channels.
    """
    cols = data.with_format("numpy", columns=[image_key, label_key])
    raw = cols[image_key]
    try:
        imgs = np.asarray(raw)
        if imgs.dtype == object:
            raise ValueError("ragged image column")
    except ValueError:
        imgs = np.stack([np.asarray(r) for r in raw])
    labels = np.asarray(cols[label_key]).astype(np.int32)
    if imgs.dtype != np.uint8 and imgs.dtype != np.float32:
        imgs = imgs.astype(np.float32)
    if imgs.ndim == 3:
        imgs = imgs[..., None]
    if channels not in (1, 3):
        raise ValueError(f"Target channels must be 1 or 3, got {channels}")
    if imgs.shape[-1] == 1 and channels == 3:
        imgs = np.repeat(imgs, 3, axis=-1)
    if imgs.shape[-1] != channels:
        raise ValueError(
            f"Expected {channels} channels but got {imgs.shape[-1]}"
        )
    return imgs, labels


def _filter_hf_split(data, label_key: str, label_names, filter_labels):
    """Subset + remap labels, mirroring __filter_dataset
    (huggingface_image_classification_dataset.py:31-49): selected classes
    are renumbered 0..k-1 in filter_labels order (label names are resolved
    against the TRAIN split's ClassLabel feature, as the reference does)."""
    keep = [label_names.index(l) for l in filter_labels]
    lab = np.asarray(data[label_key])
    sel = np.where((lab[:, None] == np.asarray(keep)).any(axis=-1))[0]
    if len(sel) == 0:
        raise ValueError(
            f"filter_labels={list(filter_labels)!r} matched no rows in this "
            "split — a bank needs at least one image"
        )
    # Size the LUT to cover the kept ids too: a split with zero rows of the
    # highest filtered class would otherwise make lut[keep] raise.
    lut = np.full(max(int(lab.max(initial=0)), max(keep)) + 1, -1, dtype=np.int32)
    lut[np.asarray(keep)] = np.arange(len(keep), dtype=np.int32)
    return data.select(sel), lut


def bank_from_hf(
    dataset_dict,
    split: str = "train",
    channels: int = 3,
    image_feature_name: str = "image",
    label_feature_name: str = "label",
    filter_labels: Sequence[str] | None = None,
) -> BankImageDataset:
    """Pack an already-loaded HF DatasetDict into an HBM bank.

    Split selection, filter_labels remap (+ effective ClassLabel recast:
    num_classes = len(filter_labels)), and packing exactly as
    huggingface_image_classification_dataset.py:31-80 — num_classes always
    derives from the TRAIN split's label feature (:64-65).
    """
    data = dataset_dict[split]
    train_features = dataset_dict["train"].features
    if filter_labels is not None:
        names = train_features[label_feature_name].names
        data, lut = _filter_hf_split(
            data, label_feature_name, names, list(filter_labels)
        )
        imgs, labels = _pack_hf_split(
            data, image_feature_name, label_feature_name, channels
        )
        labels = lut[labels]
        k = len(list(filter_labels))
    else:
        imgs, labels = _pack_hf_split(
            data, image_feature_name, label_feature_name, channels
        )
        k = train_features[label_feature_name].num_classes
    bank = BankImageDataset.from_numpy(imgs, labels, num_classes=k)
    object.__setattr__(bank, "_bank_kind", "huggingface")
    return bank


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
        saved: list[tuple] = []
        saved_env: list[str] = []
        try:
            # Track which vars WE introduced so the finally block can remove
            # them again: a leftover HF_HUB_OFFLINE=1 would be inherited by
            # every later subprocess (xdist workers, data loaders) and force
            # their legitimate downloads offline.
            for _var in ("HF_HUB_OFFLINE", "HF_DATASETS_OFFLINE"):
                if _var not in os.environ:
                    os.environ[_var] = "1"
                    saved_env.append(_var)
            from datasets import load_dataset

            if os.environ.get("HF_HUB_OFFLINE") != "0":
                # The env vars above only matter at `datasets` import time;
                # if the library was imported before us they are inert and
                # a cache miss burns ~25 s in DNS retries (5 retries with
                # backoff) before falling back. Force the runtime flags so
                # a miss fails in microseconds; cached datasets still load.
                # Saved and RESTORED below: this probe must not leave the
                # process offline (HuggingfaceImageClassificationDataset
                # .load() legitimately downloads).
                import huggingface_hub.constants as _hub_c
                from datasets import config as _ds_config

                saved.append((_ds_config, "HF_HUB_OFFLINE",
                              _ds_config.HF_HUB_OFFLINE))
                _ds_config.HF_HUB_OFFLINE = True
                if hasattr(_ds_config, "HF_DATASETS_OFFLINE"):
                    saved.append((_ds_config, "HF_DATASETS_OFFLINE",
                                  _ds_config.HF_DATASETS_OFFLINE))
                    _ds_config.HF_DATASETS_OFFLINE = True
                saved.append((_hub_c, "HF_HUB_OFFLINE", _hub_c.HF_HUB_OFFLINE))
                _hub_c.HF_HUB_OFFLINE = True

            bank = bank_from_hf(
                load_dataset(name),
                split=split,
                channels=c,
                image_feature_name=image_feature_name,
                label_feature_name=label_feature_name,
                filter_labels=filter_labels,
            )
            if num_points is not None and bank.length > num_points:
                # Honor the bank-size control on the real-cache path too
                # (bench.py --bank-points/--ab-banks compare sizes): keep
                # the first num_points rows — a deterministic prefix, like
                # the synthetic generator's.
                bank = BankImageDataset(
                    images=bank.images[:num_points],
                    labels=bank.labels[:num_points],
                    n_classes=bank.n_classes,
                    packed_shape=bank.packed_shape,
                )
                object.__setattr__(bank, "_bank_kind", "huggingface")
            return bank
        except Exception:
            if synthetic is False:
                raise
        finally:
            for obj, attr, val in saved:
                setattr(obj, attr, val)
            for _var in saved_env:
                os.environ.pop(_var, None)
    return synthetic_image_bank(
        name, split=split, channels=channels,
        filter_labels=filter_labels, num_points=num_points,
    )
