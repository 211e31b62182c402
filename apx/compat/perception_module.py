"""Host-side ImagePerceptionModule for the ``ap_gym.envs.image`` surface.

The reference's `ImagePerceptionModule` (envs/image/image_perception_module
.py:42-477) is the shared engine behind all glimpse-on-image envs: it owns
the image batch, sensor position, time step, RNG, data loader and render
overlays. apx's execution path replaces it with the device-side
`ImagePerceptionEngine` (apx/envs/image_perception.py) + host RNG shims,
but user code may construct the module directly, so this is a drop-in host
implementation with the same ctor, methods, draw order and numerics.

Implementation differences from the reference (behavior preserved):
  * `get_glimpse` is one vectorized numpy bilinear kernel over all envs and
    sensing points (`_bilinear_batch`) instead of a per-env
    scipy.RegularGridInterpolator loop. The kernel reproduces scipy's exact
    f64 arithmetic (searchsorted cell lookup, corner accumulation order),
    so outputs are bitwise-identical — asserted by the golden tests.
  * `unique_sampling_max_grid_cell_size_rel` is a real dataclass field
    (in the reference it is an unannotated class attribute and therefore
    not constructor-settable); passing it is an apx extension.
  * Space `idoc` annotations are omitted (apx's doc generator introspects
    envs directly).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import gymnasium as gym
import numpy as np

from ..render.style import COLOR_AGENT, COLOR_BAD, COLOR_GOOD
from .dataset_classes import ImageClassificationDataset
from .gym_spaces import ImageSpace

__all__ = ["ImagePerceptionConfig", "ImagePerceptionModule"]


@dataclass(frozen=True)
class ImagePerceptionConfig:
    """(image_perception_module.py:20-34)."""

    dataset: ImageClassificationDataset
    sensor_size: tuple[int, int] = (5, 5)
    sensor_scale: float = 1.0
    max_step_length: float | Sequence[float] = 0.2
    step_limit: int = 16
    display_visitation: bool = True
    render_unvisited_opacity: float = 0.0
    render_visited_opacity: float = 0.3
    prefetch_buffer_size: int = 128
    prefetch: bool = True
    unique_sampling_max_grid_cell_size_rel: float = 0.2
    unique_sampling_top_k: int = 10
    randomly_invert_labels: bool = False


def _project_sphere(x: np.ndarray, radius: float = 1.0) -> np.ndarray:
    """Project into the unit ball (util.py:94-97)."""
    magnitude = np.linalg.norm(x, axis=-1, keepdims=True)
    direction = x / np.maximum(magnitude, radius)
    return np.where(magnitude > radius, direction * radius, x)


def _bilinear_batch(images: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Bilinear interpolation of per-env images at per-env point grids.

    images: (N, H, W, C); points: broadcastable to (N, ..., 2) in (y, x)
    center-origin pixel coordinates. Returns (N, ..., C) float64.

    Matches scipy RegularGridInterpolator(method="linear") bitwise on unit
    grids: cell lookup via searchsorted(grid, p) - 1 (so points exactly on
    a node land in the LEFT cell with weight 1 on the upper corner),
    fractional offsets measured against the actual grid values, and corner
    contributions accumulated in (y0x0, y0x1, y1x0, y1x1) order.
    """
    n, h, w, _ = images.shape
    grid_y = np.arange(h) - (h - 1) / 2
    grid_x = np.arange(w) - (w - 1) / 2
    points = np.broadcast_to(points, (n, *points.shape[1:]))
    py, px = points[..., 0], points[..., 1]
    i = np.clip(np.searchsorted(grid_y, py) - 1, 0, h - 2)
    j = np.clip(np.searchsorted(grid_x, px) - 1, 0, w - 2)
    ty = py - grid_y[i]
    tx = px - grid_x[j]
    env = np.arange(n).reshape((n,) + (1,) * (points.ndim - 2))
    out = np.zeros((*points.shape[:-1], images.shape[-1]), dtype=np.float64)
    for di, wy in ((0, 1 - ty), (1, ty)):
        for dj, wx in ((0, 1 - tx), (1, tx)):
            out += images[env, i + di, j + dj] * (wy * wx)[..., None]
    return out


def _quality_rgb(quality: np.ndarray) -> np.ndarray:
    """Array-valued red->green lerp (envs/style.py:13-19)."""
    q = np.clip(quality, 0, 1)[..., None]
    return (q * np.array(COLOR_GOOD) + (1 - q) * np.array(COLOR_BAD)).astype(np.int_)


class ImagePerceptionModule:
    """(image_perception_module.py:42-477). See module docstring for the
    intentional implementation differences."""

    def __init__(self, num_envs: int, config: ImagePerceptionConfig):
        self._config = config
        self._num_envs = num_envs
        config.dataset.load()
        *self._image_size, self._channels = config.dataset[0][0].shape
        self._single_inner_action_space = gym.spaces.Box(
            -np.ones(2, dtype=np.float32), np.ones(2, dtype=np.float32)
        )
        self._observation_space_dict = {
            "glimpse": ImageSpace(
                config.sensor_size[1],
                config.sensor_size[0],
                self._channels,
                dtype=np.float32,
            ),
            "glimpse_pos": gym.spaces.Box(-1, 1, (2,), np.float32),
            "time_step": gym.spaces.Box(-1, 1, (), np.float32),
        }
        if config.randomly_invert_labels:
            self._observation_space_dict["inverted_label"] = gym.spaces.Discrete(3)
        max_step_length = np.array(config.max_step_length)
        assert max_step_length.shape in {(2,), (1,), ()}
        self._max_step_length = np.ones(2) * max_step_length
        self._rng: np.random.Generator | None = None
        self._loader = None
        self._images = self._labels = self._data_idx = None
        self._labels_inverted = None
        self._pos_norm = None
        self._time_step = None
        self._prev_done = None
        self._render_size = self._render_scaling = None
        self._visit_counts = self._quality_map = None

    # -- lifecycle ---------------------------------------------------------

    def seed(self, seed: int | None = None):
        """RNG chain: module rng from seed; iterator rng from a second draw
        (image_perception_module.py:105-118)."""
        from ..data.stream import DataLoader, DatasetBatchIterator

        self._rng = np.random.default_rng(seed)
        if self._loader is not None:
            self._loader.close()
        self._loader = DataLoader(
            DatasetBatchIterator(
                self._config.dataset,
                batch_size=self._num_envs,
                seed=self._rng.integers(0, 2**32 - 1, endpoint=True),
            ),
            prefetch=self._config.prefetch,
            prefetch_buffer_size=self._config.prefetch_buffer_size,
        )

    def reset(self) -> tuple[dict[str, np.ndarray], dict[str, Any]]:
        """Draw order per episode: batch indices (iterator rng), label
        inversion bits, start positions (module rng)
        (image_perception_module.py:120-189)."""
        if self._rng is None:
            self.seed()
        (self._images, labels), self._data_idx = next(self._loader)
        if self._config.randomly_invert_labels:
            self._labels_inverted = (
                self._rng.integers(0, 2, size=self._num_envs) == 1
            )
            labels = np.where(
                self._labels_inverted,
                self._config.dataset.num_classes - labels - 1,
                labels,
            )
        self._labels = labels
        if np.any(np.array(self._images.shape[1:3]) < self.effective_sensor_size):
            raise ValueError(
                f"Image size {tuple(self._images.shape[1:3])} cannot be smaller "
                f"than effective sensor size {tuple(self.effective_sensor_size)}."
            )
        self._pos_norm = self._rng.uniform(-1, 1, size=(self._num_envs, 2))
        self._time_step = 0
        obs = self._get_obs()
        if self._visit_counts is None:
            render_width = max(128, obs["glimpse"].shape[2])
            self._render_scaling = render_width / self._image_size[1]
            render_height = int(round(self._render_scaling * self._image_size[0]))
            self._render_size = (render_width, render_height)
            shape = (self._num_envs, render_height, render_width)
            self._visit_counts = np.zeros(shape, dtype=np.int32)
            self._quality_map = np.zeros(shape, dtype=np.float32)
        else:
            self._visit_counts.fill(0)
            self._quality_map.fill(0)
        self._prev_done = np.zeros(self._num_envs, dtype=np.bool_)
        return obs, {"index": self._data_idx}

    def step(self, action: np.ndarray, prediction_quality: np.ndarray):
        """Lockstep autoreset (partial reset raises), movement by projected
        action * max_step_length clipped to [-1, 1], reward -1e-3*|action|,
        termination at step_limit (image_perception_module.py:191-217)."""
        if np.any(np.isnan(prediction_quality)):
            raise ValueError("NaN values detected in prediction.")
        self._paint_visitation(prediction_quality)
        if np.any(self._prev_done):
            if not np.all(self._prev_done):
                raise NotImplementedError("Partial reset is not supported.")
            obs, info = self.reset()
            terminated = False
            base_reward = np.zeros(self._num_envs)
        else:
            if np.any(np.isnan(action)):
                raise ValueError("NaN values detected in action.")
            step = self._max_step_length * _project_sphere(action)
            self._pos_norm = np.clip(self._pos_norm + step, -1, 1)
            base_reward = -np.linalg.norm(action, axis=-1) * 1e-3
            info = {"index": self._data_idx}
            self._time_step += 1
            terminated = self._time_step >= self._config.step_limit
            obs = self._get_obs()
        terminated = np.full(self._num_envs, terminated)
        truncated = np.zeros(self._num_envs, dtype=np.bool_)
        self._prev_done = terminated | truncated
        return obs, base_reward, terminated, truncated, info

    def close(self):
        if self._loader is not None:
            self._loader.close()

    # -- observation / sampling --------------------------------------------

    def _get_obs(self) -> dict[str, np.ndarray]:
        obs = {
            "glimpse": self.get_glimpse(self._pos_norm),
            "glimpse_pos": self._pos_norm.astype(np.float32),
            "time_step": np.full(
                self._num_envs,
                (self._time_step / self._config.step_limit) * 2 - 1,
                np.float32,
            ),
        }
        if self._config.randomly_invert_labels:
            # 0/1 only at t=0, constant 2 afterwards
            # (image_perception_module.py:246-251).
            obs["inverted_label"] = (
                np.full(self._num_envs, 2)
                if self._time_step > 0
                else self._labels_inverted.astype(np.int32)
            )
        return obs

    def get_glimpse(self, pos_norm: np.ndarray) -> np.ndarray:
        """G x G sensing grid around the denormalized position, bilinearly
        interpolated per env, clipped to [0, 1] f32
        (image_perception_module.py:294-331)."""
        s0, s1 = self._config.sensor_size
        scale = self._config.sensor_scale
        offsets = np.stack(
            np.meshgrid(
                (np.arange(s0) - (s0 - 1) / 2) * scale,
                (np.arange(s1) - (s1 - 1) / 2) * scale,
                indexing="ij",
            ),
            axis=-1,
        )
        points = (
            np.flip(self.denormalize_coords(pos_norm), axis=-1)[..., None, None, :]
            + offsets[None]
        )
        return _bilinear_batch(self._images, points).clip(0, 1).astype(np.float32)

    def sample_unique_glimpse_positions(self) -> np.ndarray:
        """Candidate grid -> pairwise-MSE uniqueness -> uniform pick among
        top-k -> jitter (image_perception_module.py:253-292)."""
        cfg = self._config
        max_cell = (
            self.normalize_coords(self.effective_sensor_size)
            * cfg.unique_sampling_max_grid_cell_size_rel
        )
        counts = np.ceil(2 / max_cell)
        grid = np.stack(
            np.meshgrid(
                np.linspace(-1, 1, int(counts[0])),
                np.linspace(-1, 1, int(counts[1])),
                indexing="ij",
            ),
            axis=-1,
        ).reshape(-1, 2)
        glimpses = self.get_glimpse(grid[None])
        diff = np.mean(
            (glimpses[:, None] - glimpses[:, :, None]) ** 2, axis=(-3, -2, -1)
        )
        uniqueness = np.min(diff + np.diag(np.full(len(grid), np.inf)), axis=-1)
        top_k = np.argsort(-uniqueness, axis=-1)[:, : cfg.unique_sampling_top_k]
        pick = self._rng.integers(0, cfg.unique_sampling_top_k, size=self._num_envs)
        base = grid[top_k[np.arange(self._num_envs), pick]]
        jitter = self._rng.uniform(-max_cell, max_cell, (self._num_envs, 2))
        return np.clip(base + jitter, -1, 1)

    # -- render --------------------------------------------------------------

    def _rects(self):
        pos = self.to_render_coords(self._pos_norm)
        size = self.effective_sensor_size * self._render_scaling
        return pos, size

    def _paint_visitation(self, prediction_quality: np.ndarray | None = None):
        """(image_perception_module.py:219-234). Uses numpy fancy-index +=
        like the reference, so overlapping clipped cells count once."""
        pos, size = self._rects()
        pos = np.round(pos).astype(np.int32)
        size = np.round(np.flip(size)).astype(np.int32)
        xs = pos[..., 0, None] + np.arange(size[0]) - size[0] // 2
        ys = pos[..., 1, None] + np.arange(size[1]) - size[1] // 2
        coords = (
            np.arange(self._num_envs)[:, None, None],
            np.clip(ys, 0, self._visit_counts.shape[1] - 1)[:, :, None],
            np.clip(xs, 0, self._visit_counts.shape[2] - 1)[:, None, :],
        )
        self._visit_counts[coords] += 1
        if prediction_quality is not None:
            self._quality_map[coords] = np.clip(
                prediction_quality[:, None, None], 0, 1
            )

    def render(self, return_pil_imgs: bool = False):
        """PIL compositing: nearest-upscaled image, visitation/quality
        overlay, shadowed agent rectangle
        (image_perception_module.py:333-401)."""
        from PIL import Image, ImageDraw
        from PIL.Image import Resampling

        imgs = self._images
        if self._channels == 1:
            imgs = imgs[..., 0]
        elif self._channels != 3:
            raise NotImplementedError()
        pos, size = self._rects()
        top_left = pos - size / 2
        bottom_right = pos + size / 2
        bw = self.glimpse_border_width

        visited = self._visit_counts > 0
        rgba = np.concatenate(
            [
                _quality_rgb(self._quality_map),
                np.full_like(
                    self._quality_map[..., None],
                    int(255 * self._config.render_visited_opacity),
                ),
            ],
            axis=-1,
        )
        overlay = (
            visited[..., None] * rgba
            + ~visited[..., None]
            * (0, 0, 0, int(255 * self._config.render_unvisited_opacity))
        ).round().astype(np.uint8)

        frames = []
        for img, tl, br, ol in zip(imgs, top_left, bottom_right, overlay):
            frame = (
                Image.fromarray((img * 255).astype(np.uint8))
                .resize(self._render_size, resample=Resampling.NEAREST)
                .convert("RGB")
            )
            if self._config.display_visitation:
                # Manual alpha blend: PIL's alpha_composite needs RGBA base
                # images, which break rectangle drawing (reference carries
                # the same workaround, :375-385).
                alpha = ol[..., -1:] / 255
                frame = Image.fromarray(
                    (np.array(frame) * (1 - alpha) + alpha * ol[..., :-1]).astype(
                        np.uint8
                    )
                )
            draw = ImageDraw.Draw(frame, "RGBA")
            rect = np.concatenate([tl, br])
            draw.rectangle(tuple(rect + bw), outline=(0, 0, 0, 80), width=bw)
            draw.rectangle(tuple(rect), outline=COLOR_AGENT, width=bw)
            frames.append(frame)
        return frames if return_pil_imgs else np.asarray(frames)

    # -- coordinates ----------------------------------------------------------

    def normalize_coords(self, coords: np.ndarray) -> np.ndarray:
        return coords / self.sensor_pos_lim_pixels

    def denormalize_coords(self, coords: np.ndarray) -> np.ndarray:
        return coords * self.sensor_pos_lim_pixels

    def to_render_coords(self, pos_norm: np.ndarray) -> np.ndarray:
        return self.scale_to_render_coords(pos_norm) + np.array(self._render_size) / 2

    def scale_to_render_coords(self, size_norm: np.ndarray) -> np.ndarray:
        return self.denormalize_coords(size_norm) * self._render_scaling

    # -- properties -----------------------------------------------------------

    @property
    def sensor_pos_lim_pixels(self):
        """pos +-1 keeps the glimpse fully inside the image
        (image_perception_module.py:419-423)."""
        return (np.flip(np.array(self._images.shape[1:3])) - 1) / 2 - (
            self.effective_sensor_size - 1
        ) / 2

    @property
    def sensor_size(self) -> tuple[int, int]:
        return self._config.sensor_size

    @property
    def image_size(self):
        return self._image_size

    @property
    def effective_sensor_size(self):
        return np.array(self._config.sensor_size) * self._config.sensor_scale

    @property
    def current_sensor_pos(self):
        return self.denormalize_coords(self._pos_norm)

    @property
    def observation_space_dict(self) -> dict[str, gym.spaces.Space]:
        return self._observation_space_dict

    @property
    def single_inner_action_space(self) -> gym.spaces.Box:
        return self._single_inner_action_space

    @property
    def config(self) -> ImagePerceptionConfig:
        return self._config

    @property
    def current_images(self) -> np.ndarray:
        return self._images

    @property
    def current_labels(self) -> np.ndarray:
        return self._labels

    @property
    def glimpse_border_width(self) -> int:
        return max(1, int(round(1 / 128 * self._render_size[0])))

    @property
    def render_scaling(self):
        return self._render_scaling

    @property
    def render_size(self):
        return self._render_size
