"""HBM-resident dataset abstractions.

The reference streams data points through host-side iterator threads
(/root/reference/ap_gym/envs/dataset/*.py). On TPU the entire dataset lives
in device memory (uint8 for real image corpora, float32 for small procedural
banks) and ``fetch`` is a traceable gather executed inside the jitted reset.
Sampling with replacement (dataset_iterator.py:26-32) becomes a
``jax.random.randint`` draw inside the env's reset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["ImageDataset", "BankImageDataset"]


class ImageDataset(struct.PyTreeNode):
    """Base: concrete datasets implement fetch(idx) -> (image_f32, label).

    ``fetch_raw`` returns the bank's storage dtype (uint8 for real image
    corpora) so env state can stay uint8 in HBM — 4x less traffic per
    step; the glimpse kernel converts to f32/255 on read."""

    @property
    def length(self) -> int:
        raise NotImplementedError

    @property
    def num_classes(self) -> int:
        raise NotImplementedError

    @property
    def image_shape(self) -> tuple[int, int, int]:
        """(H, W, C)."""
        raise NotImplementedError

    def fetch(self, idx: jax.Array) -> tuple[jax.Array, jax.Array]:
        raise NotImplementedError

    def fetch_raw(self, idx: jax.Array) -> tuple[jax.Array, jax.Array]:
        return self.fetch(idx)


class BankImageDataset(ImageDataset):
    """Fully materialized dataset: images (D, H, W, C) uint8 or float32 in HBM.

    uint8 banks are converted to float32/255 *after* the per-episode gather,
    so HBM traffic at reset is 4x smaller than a float bank
    (cf. image_classification_dataset.py:66-84 normalization rules).
    """

    images: jax.Array
    labels: jax.Array
    n_classes: int = struct.field(pytree_node=False)

    @property
    def length(self) -> int:
        return int(self.images.shape[0])

    @property
    def num_classes(self) -> int:
        return self.n_classes

    @property
    def image_shape(self) -> tuple[int, int, int]:
        return tuple(self.images.shape[1:])  # type: ignore[return-value]

    def fetch(self, idx: jax.Array) -> tuple[jax.Array, jax.Array]:
        img, label = self.fetch_raw(idx)
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        else:
            img = img.astype(jnp.float32)
        return img, label

    def fetch_raw(self, idx: jax.Array) -> tuple[jax.Array, jax.Array]:
        img = jnp.take(self.images, idx, axis=0)
        label = jnp.take(self.labels, idx, axis=0).astype(jnp.int32)
        return img, label

    @staticmethod
    def from_numpy(images: np.ndarray, labels: np.ndarray, num_classes: int) -> "BankImageDataset":
        """Build from host arrays, applying the reference normalization rules
        (uint8 stays uint8 for HBM economy; HW -> HWC; grayscale->RGB handled
        by the ingestion code)."""
        if images.ndim == 3:
            images = images[..., None]
        return BankImageDataset(
            images=jnp.asarray(images),
            labels=jnp.asarray(labels.astype(np.int32)),
            n_classes=int(num_classes),
        )
