"""Host-side ImagePerceptionModule for the ``ap_gym.envs.image`` surface.

The reference's `ImagePerceptionModule` (envs/image/image_perception_module
.py:42-477) is the shared engine behind all glimpse-on-image envs: it owns
the image batch, sensor position, time step, RNG, data loader and render
overlays. apx's execution path replaces it with the device-side
`ImagePerceptionEngine` (apx/envs/image_perception.py) + host RNG shims,
but user code may construct the module directly, so this is a drop-in host
implementation: same constructor, methods, RNG draw order and numerics
(asserted bitwise against the reference module in
tests/test_perception_module.py).

Architecture (deliberately not the reference's monolith):
  * Episode data lives in an immutable `_Episode` snapshot; `step` swaps
    snapshots through the pure-ish `_advance`, mirroring apx's functional
    device envs rather than the reference's 14 mutable private attributes.
  * Observations come from a declarative channel table built once at
    construction — each entry carries its gym space and its reader — so the
    space dict and `observe()` cannot drift apart.
  * Sensing is one vectorized numpy bilinear kernel over all envs and
    sensing points (`_bilinear_batch`) instead of the reference's per-env
    scipy.RegularGridInterpolator loop. It reproduces scipy's exact f64
    arithmetic (searchsorted cell lookup, corner accumulation order), so
    outputs are bitwise-identical — asserted by
    tests/test_perception_module.py::test_bilinear_batch_matches_scipy.
  * Visitation/quality bookkeeping and frame compositing delegate to the
    shared canvas helpers in apx/render/render.py (`stamp_rect`,
    `visitation_overlay`, `blend_overlay`, `upscale_to_rgb`,
    `outlined_box`) — the same machinery behind the env-level render path.

Intentional behavior extensions (reference quirks preserved otherwise):
  * `unique_sampling_max_grid_cell_size_rel` is a real dataclass field
    (in the reference it is an unannotated class attribute and therefore
    not constructor-settable); passing it is an apx extension.
  * Space `idoc` annotations are omitted (apx's doc generator introspects
    envs directly).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Sequence

import gymnasium as gym
import numpy as np

from ..render.style import COLOR_AGENT
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


def _require_finite(name: str, values: np.ndarray) -> None:
    if np.any(np.isnan(values)):
        raise ValueError(f"NaN values detected in {name}.")


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


def _pairwise_uniqueness(glimpses: np.ndarray) -> np.ndarray:
    """(N, P, ...) candidate glimpses -> (N, P) uniqueness score: each
    candidate's minimum MSE against every OTHER candidate of the same env
    (diagonal masked with +inf). Higher = more distinctive."""
    diff = np.mean((glimpses[:, None] - glimpses[:, :, None]) ** 2, axis=(-3, -2, -1))
    return np.min(diff + np.diag(np.full(diff.shape[-1], np.inf)), axis=-1)


@dataclass(frozen=True)
class _Episode:
    """One lockstep episode's data: swapped wholesale on reset, advanced
    via dataclasses.replace on step (never mutated in place)."""

    images: np.ndarray  # (N, H, W, C) float
    labels: np.ndarray  # (N,)
    batch_idx: np.ndarray  # (N,) dataset indices
    inverted: np.ndarray | None  # (N,) bool, only with randomly_invert_labels
    pos: np.ndarray  # (N, 2) normalized sensor position
    t: int  # steps taken this episode


class _Canvas:
    """Batched visitation + prediction-quality canvas at render resolution.

    Geometry rule per the reference (module.py:167-183): render width =
    max(128, glimpse pixel width), height scaled to preserve the image
    aspect ratio. Stamping delegates to the shared
    apx.render.render.stamp_rect."""

    def __init__(self, num_envs: int, image_hw, glimpse_width: int):
        width = max(128, glimpse_width)
        self.scaling = width / image_hw[1]
        self.size = (width, int(round(self.scaling * image_hw[0])))
        shape = (num_envs, self.size[1], self.size[0])
        self.counts = np.zeros(shape, dtype=np.int32)
        self.quality = np.zeros(shape, dtype=np.float32)

    def clear(self) -> None:
        self.counts.fill(0)
        self.quality.fill(0)

    def stamp(self, centers_xy, stamp_wh, quality) -> None:
        from ..render.render import stamp_rect

        stamp_rect(self.counts, self.quality, centers_xy, stamp_wh, quality)

    def overlay(self, visited_opacity: float, unvisited_opacity: float):
        from ..render.render import visitation_overlay

        return visitation_overlay(
            self.counts, self.quality, visited_opacity, unvisited_opacity
        )


class ImagePerceptionModule:
    """(image_perception_module.py:42-477). See the module docstring for the
    architecture and the intentional differences."""

    def __init__(self, num_envs: int, config: ImagePerceptionConfig):
        self._config = config
        self._num_envs = num_envs
        config.dataset.load()
        *self._image_size, self._channels = config.dataset[0][0].shape
        self._single_inner_action_space = gym.spaces.Box(
            -np.ones(2, dtype=np.float32), np.ones(2, dtype=np.float32)
        )
        max_step_length = np.array(config.max_step_length)
        assert max_step_length.shape in {(2,), (1,), ()}
        self._max_step_length = np.ones(2) * max_step_length
        self._channel_table = self._build_channels()
        # one stable dict, like the reference's cached attribute
        # (image_perception_module.py:63, 448-449) — callers may patch it
        self._observation_space_dict = {
            name: space for name, space, _ in self._channel_table
        }
        self._rng: np.random.Generator | None = None
        self._loader = None
        self._episode: _Episode | None = None
        self._canvas: _Canvas | None = None
        self._rollover: np.ndarray | None = None

    # -- observation channels ------------------------------------------------

    def _build_channels(
        self,
    ) -> list[tuple[str, gym.spaces.Space, Callable[[_Episode], np.ndarray]]]:
        """Observation contract as data: (name, space, reader) triples, in
        the reference's key order. `observe()` and `observation_space_dict`
        both derive from this single table."""
        cfg = self._config
        n = self._num_envs

        def read_time(ep: _Episode) -> np.ndarray:
            frac = (ep.t / cfg.step_limit) * 2 - 1
            return np.full(n, frac, np.float32)

        table = [
            (
                "glimpse",
                ImageSpace(
                    cfg.sensor_size[1],
                    cfg.sensor_size[0],
                    self._channels,
                    dtype=np.float32,
                ),
                lambda ep: self.get_glimpse(ep.pos),
            ),
            (
                "glimpse_pos",
                gym.spaces.Box(-1, 1, (2,), np.float32),
                lambda ep: ep.pos.astype(np.float32),
            ),
            ("time_step", gym.spaces.Box(-1, 1, (), np.float32), read_time),
        ]
        if cfg.randomly_invert_labels:
            # Inversion bits are visible only at t=0; afterwards the channel
            # pins to the sentinel 2 (module.py:246-251).
            table.append(
                (
                    "inverted_label",
                    gym.spaces.Discrete(3),
                    lambda ep: (
                        ep.inverted.astype(np.int32) if ep.t == 0 else np.full(n, 2)
                    ),
                )
            )
        return table

    def observe(self) -> dict[str, np.ndarray]:
        return {name: read(self._episode) for name, _, read in self._channel_table}

    def _get_obs(self) -> dict[str, np.ndarray]:
        """Reference-internal name (image_perception_module.py:236). reset()
        and step() dispatch through this shim so a drop-in subclass may
        override EITHER name and be honored."""
        return self.observe()

    # -- lifecycle -------------------------------------------------------------

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

    def close(self):
        if self._loader is not None:
            self._loader.close()

    def _spawn_episode(self) -> _Episode:
        """Episode draw order (the parity-pinned chain, module.py:120-161):
        batch indices from the iterator rng, then label-inversion bits, then
        start positions from the module rng."""
        cfg = self._config
        (images, labels), batch_idx = next(self._loader)
        inverted = None
        if cfg.randomly_invert_labels:
            inverted = self._rng.integers(0, 2, size=self._num_envs) == 1
            labels = np.where(inverted, cfg.dataset.num_classes - labels - 1, labels)
        if np.any(np.array(images.shape[1:3]) < self.effective_sensor_size):
            raise ValueError(
                f"Image size {tuple(images.shape[1:3])} cannot be smaller "
                f"than effective sensor size {tuple(self.effective_sensor_size)}."
            )
        pos = self._rng.uniform(-1, 1, size=(self._num_envs, 2))
        return _Episode(
            images=images,
            labels=labels,
            batch_idx=batch_idx,
            inverted=inverted,
            pos=pos,
            t=0,
        )

    def reset(self) -> tuple[dict[str, np.ndarray], dict[str, Any]]:
        if self._rng is None:
            self.seed()
        self._episode = self._spawn_episode()
        obs = self._get_obs()
        if self._canvas is None:
            self._canvas = _Canvas(
                self._num_envs, self._image_size, obs["glimpse"].shape[2]
            )
        else:
            self._canvas.clear()
        self._rollover = np.zeros(self._num_envs, dtype=np.bool_)
        return obs, {"index": self._episode.batch_idx}

    # -- stepping ----------------------------------------------------------------

    def _rollover_due(self) -> bool:
        """True when EVERY env finished last step (lockstep contract); a
        partial rollover is unsupported, like the reference."""
        done = int(self._rollover.sum())
        if done and done != self._num_envs:
            raise NotImplementedError("Partial reset is not supported.")
        return bool(done)

    def _advance(self, action: np.ndarray) -> np.ndarray:
        """Swap in the moved episode snapshot; returns the action cost.
        Movement = clip(pos + max_step_length * project_sphere(action)),
        cost = -1e-3 * |action| (module.py:203-211)."""
        ep = self._episode
        delta = self._max_step_length * _project_sphere(action)
        self._episode = dataclasses.replace(
            ep, pos=np.clip(ep.pos + delta, -1, 1), t=ep.t + 1
        )
        return -np.linalg.norm(action, axis=-1) * 1e-3

    def step(self, action: np.ndarray, prediction_quality: np.ndarray):
        """Overlay stamp happens FIRST (at the pre-step position, with this
        step's prediction quality), then either the lockstep rollover or a
        movement step (module.py:191-217)."""
        _require_finite("prediction", prediction_quality)
        centers, stamp_wh = self._sensor_footprint()
        self._canvas.stamp(centers, stamp_wh, prediction_quality)
        if self._rollover_due():
            obs, info = self.reset()
            reward = np.zeros(self._num_envs)
            at_limit = False
        else:
            _require_finite("action", action)
            reward = self._advance(action)
            obs = self._get_obs()
            info = {"index": self._episode.batch_idx}
            at_limit = self._episode.t >= self._config.step_limit
        terminated = np.full(self._num_envs, at_limit)
        truncated = np.zeros(self._num_envs, dtype=np.bool_)
        self._rollover = terminated | truncated
        return obs, reward, terminated, truncated, info

    # -- sensing --------------------------------------------------------------

    def _sensing_points(self, pos_norm: np.ndarray) -> np.ndarray:
        """(..., s0, s1, 2) absolute (y, x) pixel coordinates of the sensing
        grid centered at each normalized position (module.py:294-311)."""
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
        centers = np.flip(self.denormalize_coords(pos_norm), axis=-1)
        return centers[..., None, None, :] + offsets[None]

    def get_glimpse(self, pos_norm: np.ndarray) -> np.ndarray:
        """s0 x s1 sensing grid, bilinearly interpolated per env, clipped to
        [0, 1] f32. One vectorized kernel call; see _bilinear_batch."""
        points = self._sensing_points(pos_norm)
        return _bilinear_batch(self._episode.images, points).clip(0, 1).astype(
            np.float32
        )

    def _candidate_grid(self) -> tuple[np.ndarray, np.ndarray]:
        """Uniform candidate lattice over normalized position space, cell
        size capped at unique_sampling_max_grid_cell_size_rel sensor sizes
        (module.py:253-267). Returns (max_cell, (P, 2) positions)."""
        cell = (
            self.normalize_coords(self.effective_sensor_size)
            * self._config.unique_sampling_max_grid_cell_size_rel
        )
        counts = np.ceil(2 / cell)
        axes = (np.linspace(-1, 1, int(c)) for c in counts)
        grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 2)
        return cell, grid

    def sample_unique_glimpse_positions(self) -> np.ndarray:
        """Rank candidate positions by glimpse distinctiveness, draw one of
        the top-k per env, jitter within a grid cell (module.py:253-292).
        Draw order: selection indices, then jitter, both from the module
        rng. A pick index < top_k means ranking the full argsort and
        indexing it directly equals the reference's explicit top-k slice."""
        cfg = self._config
        cell, grid = self._candidate_grid()
        ranking = np.argsort(-_pairwise_uniqueness(self.get_glimpse(grid[None])))
        pick = self._rng.integers(0, cfg.unique_sampling_top_k, size=self._num_envs)
        anchors = grid[ranking[np.arange(self._num_envs), pick]]
        jitter = self._rng.uniform(-cell, cell, (self._num_envs, 2))
        return np.clip(anchors + jitter, -1, 1)

    # -- render --------------------------------------------------------------

    def _sensor_footprint(self) -> tuple[np.ndarray, np.ndarray]:
        """Current sensor rectangles in render coordinates: (N, 2) centers
        and the (2,) stamp (width, height)."""
        centers = self.to_render_coords(self._episode.pos)
        stamp_wh = np.flip(self.effective_sensor_size * self._canvas.scaling)
        return centers, stamp_wh

    def _render_base_images(self) -> np.ndarray:
        imgs = self._episode.images
        if self._channels == 1:
            return imgs[..., 0]
        if self._channels != 3:
            raise NotImplementedError()
        return imgs

    def render(self, return_pil_imgs: bool = False):
        """Per-env frame = nearest-upscaled image, optional visitation /
        quality overlay, shadowed agent rectangle — all via the shared
        compositing helpers in apx.render.render."""
        import PIL.Image
        import PIL.ImageDraw

        from ..render.render import blend_overlay, outlined_box, upscale_to_rgb

        cfg = self._config
        bases = self._render_base_images()
        overlays = (
            self._canvas.overlay(
                cfg.render_visited_opacity, cfg.render_unvisited_opacity
            )
            if cfg.display_visitation
            else None
        )
        # The box half-size intentionally repeats the reference's unflipped
        # (s0, s1) order here (module.py:342-344 draws with the same
        # y/x-swapped extent it stamps flipped; visible only for non-square
        # sensors, preserved for drop-in parity).
        half = self.effective_sensor_size * self._canvas.scaling / 2
        bw = self.glimpse_border_width
        frames = []
        for i, center in enumerate(self.to_render_coords(self._episode.pos)):
            frame = upscale_to_rgb(bases[i], self._render_size)
            if overlays is not None:
                frame = PIL.Image.fromarray(
                    blend_overlay(np.asarray(frame, dtype=np.float64), overlays[i])
                )
            draw = PIL.ImageDraw.Draw(frame, "RGBA")
            outlined_box(
                draw,
                np.concatenate([center - half, center + half]),
                COLOR_AGENT,
                bw,
                shadow=True,
            )
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
        return self.denormalize_coords(size_norm) * self._canvas.scaling

    # -- properties -----------------------------------------------------------

    @property
    def sensor_pos_lim_pixels(self):
        """pos +-1 keeps the glimpse fully inside the image
        (image_perception_module.py:419-423)."""
        return (np.flip(np.array(self._episode.images.shape[1:3])) - 1) / 2 - (
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
        return self.denormalize_coords(self._episode.pos)

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
        return self._episode.images

    @property
    def current_labels(self) -> np.ndarray:
        return self._episode.labels

    @property
    def glimpse_border_width(self) -> int:
        return max(1, int(round(1 / 128 * self._render_size[0])))

    @property
    def render_scaling(self):
        return None if self._canvas is None else self._canvas.scaling

    @property
    def render_size(self):
        return None if self._canvas is None else self._canvas.size

    # internal alias: properties above are the public surface; a couple of
    # private spots (and tests) want the tuple directly
    @property
    def _render_size(self):
        return self._canvas.size
