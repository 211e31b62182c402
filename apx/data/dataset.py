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

__all__ = ["ImageDataset", "BankImageDataset", "unpack_rows"]


def unpack_rows(words: jax.Array, shape: tuple) -> jax.Array:
    """Unpack little-endian int32-packed byte rows ``(..., R)`` into uint8
    ``(..., *shape)`` with explicit shifts — byte-identical to
    ``lax.bitcast_convert_type(words, uint8)`` (pinned in test_hf_ingestion)
    but TPU-safe: XLA lowers the bitcast through a fully materialized
    u32-per-BYTE intermediate (4x the unpacked bytes of HBM traffic — the
    largest op in the round-4 tin_loc reset profile), while the shift form
    reads the words four times and writes the u8 bytes once. Shared by
    ``fetch_raw``/``images_unpacked``/the packed-image env state."""
    u8 = jnp.stack(
        [(words >> jnp.uint32(8 * i)) & jnp.uint32(0xFF) for i in range(4)],
        axis=-1,
    ).astype(jnp.uint8)
    return u8.reshape(words.shape[:-1] + tuple(shape))


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

    def fetch_stored(self, idx: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Rows in the dataset's STORAGE form (packed words for packed banks).
        Procedural datasets have no storage form; they synthesize the image."""
        return self.fetch_raw(idx)

    @property
    def stored_packed_shape(self) -> tuple | None:
        """Logical (H, W, C) when ``fetch_stored`` returns int32-packed rows,
        else None (storage form == image form)."""
        return None


class BankImageDataset(ImageDataset):
    """Fully materialized dataset: images (D, H, W, C) uint8 or float32 in HBM.

    uint8 banks are converted to float32/255 *after* the per-episode gather,
    so HBM traffic at reset is 4x smaller than a float bank
    (cf. image_classification_dataset.py:66-84 normalization rules).

    uint8 banks whose row size divides by 4 are stored int32-PACKED
    ((D, H*W*C/4), ``packed_shape`` holds the logical (H, W, C)): TPU
    gathers are per-ELEMENT-cost-bound, so fetching 4x fewer 4-byte words
    measured 29% faster than the same bytes as uint8 (846 -> 601 us for a
    chained 4096-row gather from a 60k-row MNIST-shaped bank, PERF.md
    round 3). ``fetch_raw`` bitcasts back after the gather — bitwise
    identical bytes, uint8 to every consumer.
    """

    images: jax.Array
    labels: jax.Array
    n_classes: int = struct.field(pytree_node=False)
    packed_shape: tuple | None = struct.field(pytree_node=False, default=None)

    @property
    def length(self) -> int:
        return int(self.images.shape[0])

    @property
    def num_classes(self) -> int:
        return self.n_classes

    @property
    def image_shape(self) -> tuple[int, int, int]:
        if self.packed_shape is not None:
            return self.packed_shape
        return tuple(self.images.shape[1:])  # type: ignore[return-value]

    @property
    def images_unpacked(self) -> jax.Array:
        """(D, H, W, C) view in the logical dtype (uint8 for packed banks)."""
        if self.packed_shape is None:
            return self.images
        return unpack_rows(self.images, self.packed_shape)

    def fetch(self, idx: jax.Array) -> tuple[jax.Array, jax.Array]:
        img, label = self.fetch_raw(idx)
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        else:
            img = img.astype(jnp.float32)
        return img, label

    def fetch_raw(self, idx: jax.Array) -> tuple[jax.Array, jax.Array]:
        img = jnp.take(self.images, idx, axis=0)
        if self.packed_shape is not None:
            img = unpack_rows(img, self.packed_shape)
        label = jnp.take(self.labels, idx, axis=0).astype(jnp.int32)
        return img, label

    def fetch_stored(self, idx: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Gather rows in the bank's STORAGE form — packed int32 words for
        packed banks (no unpack), the image array otherwise. The packed-image
        env state carries exactly this leaf: flat (R,) int32 rows tile HBM
        with zero padding and relayout through scan carries for free, where
        the unpacked 4D u8 batch paid ~5 relayout copies of itself per
        episode boundary (PERF.md round 5)."""
        img = jnp.take(self.images, idx, axis=0)
        label = jnp.take(self.labels, idx, axis=0).astype(jnp.int32)
        return img, label

    def fetch_label(self, idx: jax.Array) -> jax.Array:
        return jnp.take(self.labels, idx, axis=0).astype(jnp.int32)

    @property
    def stored_packed_shape(self) -> tuple | None:
        return self.packed_shape

    @staticmethod
    def from_numpy(images: np.ndarray, labels: np.ndarray, num_classes: int) -> "BankImageDataset":
        """Build from host arrays, applying the reference normalization rules
        (uint8 stays uint8 for HBM economy; HW -> HWC; grayscale->RGB handled
        by the ingestion code). uint8 rows divisible by 4 pack to int32."""
        if images.ndim == 3:
            images = images[..., None]
        shape = tuple(images.shape[1:])
        row = int(np.prod(shape))
        if images.dtype == np.uint8 and row % 4 == 0:
            packed = np.ascontiguousarray(images).reshape(
                images.shape[0], row
            ).view(np.int32)
            return BankImageDataset(
                images=jnp.asarray(packed),
                labels=jnp.asarray(labels.astype(np.int32)),
                n_classes=int(num_classes),
                packed_shape=shape,
            )
        return BankImageDataset(
            images=jnp.asarray(images),
            labels=jnp.asarray(labels.astype(np.int32)),
            n_classes=int(num_classes),
        )
