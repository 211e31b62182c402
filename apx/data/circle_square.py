"""Procedural CircleSquare datasets.

CircleSquare enumerates every (label, pos_x, pos_y) combination via a
mixed-radix index (reference: circle_square_dataset.py:56-71, 90-111). The
single-object variant is small (2*W*H images) and is materialized once into a
float32 HBM bank with numerics identical to the reference's numpy code.

DoubleCircleSquare enumerates (label1, label2, position-pair); with ~3e5
valid pairs the bank would be gigabytes, so images are synthesized *on
device* at reset from the packed index — a pure elementwise function, far
cheaper than an HBM gather (circle_square_dataset.py:114-178).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .dataset import BankImageDataset, ImageDataset

__all__ = [
    "make_circle_square_bank",
    "circle_square_object_position_and_label",
    "DoubleCircleSquareDataset",
    "double_circle_square_positions",
]


def _image_coords(image_shape: tuple[int, int]) -> np.ndarray:
    return np.stack(
        np.meshgrid(
            np.arange(image_shape[0]), np.arange(image_shape[1]), indexing="ij"
        ),
        axis=-1,
    )


def _draw_object_np(
    img: np.ndarray, coords: np.ndarray, position: np.ndarray, label: int, extents: int
) -> None:
    """Rasterize a square (label 0) or circle (label 1) of the given extents
    (circle_square_dataset.py:31-54)."""
    if label == 0:
        mask = (
            (position[0] - extents / 2 <= coords[:, :, 0])
            & (coords[:, :, 0] <= position[0] + extents / 2)
            & (position[1] - extents / 2 <= coords[:, :, 1])
            & (coords[:, :, 1] <= position[1] + extents / 2)
        )
    else:
        mask = np.linalg.norm(position - coords, axis=-1) <= extents / 2
    img[mask] = 1.0


def circle_square_object_position_and_label(
    idx: np.ndarray, image_shape: tuple[int, int]
) -> tuple[np.ndarray, np.ndarray]:
    """Mixed-radix unpack [2, W, H]: idx -> ((pos_y, pos_x), label)
    (circle_square_dataset.py:90-91, 107-111)."""
    idx = np.asarray(idx)
    label = idx % 2
    rem = idx // 2
    pos_x = rem % image_shape[1]
    pos_y = rem // image_shape[1]
    return np.stack([pos_y, pos_x], axis=-1), label


def make_circle_square_bank(
    image_shape: tuple[int, int] = (28, 28),
    object_extents: int = 8,
    show_gradient: bool = True,
) -> BankImageDataset:
    """Materialize all 2*W*H CircleSquare images as a float32 HBM bank.

    Pixel values are bit-identical to the reference generator: gradient
    ``1 - |pos - coords| / sqrt(H^2+W^2)`` plus rasterized object
    (circle_square_dataset.py:96-105), computed here in float64 then cast —
    the reference keeps float64, but every downstream consumer casts to f32.
    """
    h, w = image_shape
    n = 2 * w * h
    coords = _image_coords(image_shape)
    max_dist = np.sqrt(h * h + w * w)
    images = np.empty((n, h, w, 1), dtype=np.float32)
    idx = np.arange(n)
    positions, labels = circle_square_object_position_and_label(idx, image_shape)
    # Vectorized gradient for all distinct positions; one rasterize pass per image.
    for i in range(n):
        pos = positions[i]
        if show_gradient:
            img = 1.0 - np.linalg.norm(pos - coords, axis=-1) / max_dist
        else:
            img = np.zeros(image_shape)
        _draw_object_np(img, coords, pos, int(labels[i]), object_extents)
        images[i, :, :, 0] = img.astype(np.float32)
    return BankImageDataset(
        images=jnp.asarray(images), labels=jnp.asarray(labels.astype(np.int32)), n_classes=2
    )


def double_circle_square_positions(
    image_shape: tuple[int, int], object_extents: int = 8
) -> np.ndarray:
    """All valid non-overlapping ordered position pairs
    (circle_square_dataset.py:125-143)."""
    coords = _image_coords(image_shape).reshape(-1, 2)
    a = coords[:, None, :]
    b = coords[None, :, :]
    valid = (np.abs(a - b) >= object_extents + 1).any(axis=-1)
    # Deduplicate symmetric pairs: keep a <= b lexicographically.
    lex = (a[..., 0] < b[..., 0]) | ((a[..., 0] == b[..., 0]) & (a[..., 1] <= b[..., 1]))
    valid &= lex
    ai, bi = np.where(valid)
    return np.stack([coords[ai], coords[bi]], axis=1).astype(np.int32)  # (V, 2, 2)


class DoubleCircleSquareDataset(ImageDataset):
    """On-device procedural dataset: fetch(idx) synthesizes the image.

    Classes: 0 = two squares, 1 = two circles, 2 = one of each
    (circle_square_dataset.py:148-175).
    """

    positions: jax.Array  # (V, 2, 2) int32 — valid position pairs
    image_hw: tuple[int, int] = struct.field(pytree_node=False)
    object_extents: int = struct.field(pytree_node=False)
    show_gradient_a: bool = struct.field(pytree_node=False)
    show_gradient_b: bool = struct.field(pytree_node=False)

    @staticmethod
    def create(
        image_shape: tuple[int, int] = (28, 28),
        object_extents: int = 8,
        show_gradient_a: bool = True,
        show_gradient_b: bool = True,
    ) -> "DoubleCircleSquareDataset":
        return DoubleCircleSquareDataset(
            positions=jnp.asarray(
                double_circle_square_positions(image_shape, object_extents)
            ),
            image_hw=tuple(image_shape),
            object_extents=int(object_extents),
            show_gradient_a=bool(show_gradient_a),
            show_gradient_b=bool(show_gradient_b),
        )

    @property
    def length(self) -> int:
        return 4 * int(self.positions.shape[0])

    @property
    def num_classes(self) -> int:
        return 3

    @property
    def image_shape(self) -> tuple[int, int, int]:
        return (*self.image_hw, 1)

    def fetch(self, idx: jax.Array) -> tuple[jax.Array, jax.Array]:
        h, w = self.image_hw
        ext = self.object_extents
        label1 = (idx % 2).astype(jnp.int32)
        rem = idx // 2
        label2 = (rem % 2).astype(jnp.int32)
        pos_idx = rem // 2
        pair = jnp.take(self.positions, pos_idx, axis=0).astype(jnp.float32)  # (2, 2)
        p1, p2 = pair[0], pair[1]

        rr = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        cc = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        d1 = jnp.sqrt(jnp.square(rr - p1[0]) + jnp.square(cc - p1[1]))
        d2 = jnp.sqrt(jnp.square(rr - p2[0]) + jnp.square(cc - p2[1]))
        max_dist = float(np.sqrt(h * h + w * w))
        grad_a = 1.0 if self.show_gradient_a else 0.0
        grad_b = 1.0 if self.show_gradient_b else 0.0
        img = 1.0 - jnp.minimum(d1 * grad_a, d2 * grad_b) / max_dist

        def draw(img, pos, label, dist):
            sq = (
                (pos[0] - ext / 2 <= rr)
                & (rr <= pos[0] + ext / 2)
                & (pos[1] - ext / 2 <= cc)
                & (cc <= pos[1] + ext / 2)
            )
            ci = dist <= ext / 2
            return jnp.where(jnp.where(label == 0, sq, ci), 1.0, img)

        img = draw(img, p1, label1, d1)
        img = draw(img, p2, label2, d2)
        label = jnp.where(label1 == label2, label1, 2).astype(jnp.int32)
        return img[..., None].astype(jnp.float32), label
