"""Space specifications for apx environments.

These are lightweight, hashable, pytree-free descriptions of observation /
action / prediction spaces. Unlike gymnasium spaces they carry no RNG state;
sampling is a pure function of an explicit JAX PRNG key, which is what lets
entire environments live under ``jax.jit`` / ``vmap`` / ``shard_map``.

Behavioral reference (for parity, not translation):
  /root/reference/ap_gym/image_space.py:9-62 (ImageSpace conventions)
  /root/reference/ap_gym/logit_space.py:4-23 (LogitSpace tag)
  /root/reference/ap_gym/active_perception_env.py:27-68
    (ActivePerceptionActionSpace = {"action", "prediction"} dict)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Space",
    "Box",
    "Discrete",
    "MultiDiscrete",
    "TupleSpace",
    "DictSpace",
    "Image",
    "Logit",
    "ActivePerceptionActionSpace",
    "batch_space",
    "zeros_like_space",
    "sample_space",
    "contains",
]


class Space:
    """Base class for space specs."""

    def sample(self, key: jax.Array):
        raise NotImplementedError

    def zeros(self):
        raise NotImplementedError

    def contains(self, x) -> bool:
        raise NotImplementedError


def _shape_tuple(shape) -> tuple[int, ...]:
    if shape is None:
        return ()
    if isinstance(shape, int):
        return (shape,)
    return tuple(int(s) for s in shape)


@dataclasses.dataclass(frozen=True)
class Box(Space):
    """Continuous box. ``low``/``high`` are scalars (broadcast) for hashability;
    array bounds are stored as nested tuples."""

    low: Any = -np.inf
    high: Any = np.inf
    shape: tuple[int, ...] = ()
    dtype: Any = np.float32

    def __post_init__(self):
        object.__setattr__(self, "shape", _shape_tuple(self.shape))
        low, high = self.low, self.high
        if isinstance(low, (np.ndarray, list)):
            object.__setattr__(self, "low", _to_nested_tuple(np.asarray(low)))
        if isinstance(high, (np.ndarray, list)):
            object.__setattr__(self, "high", _to_nested_tuple(np.asarray(high)))

    @property
    def low_arr(self) -> np.ndarray:
        return np.broadcast_to(np.asarray(self.low, dtype=self.dtype), self.shape)

    @property
    def high_arr(self) -> np.ndarray:
        return np.broadcast_to(np.asarray(self.high, dtype=self.dtype), self.shape)

    def sample(self, key: jax.Array):
        """Gymnasium's sampling convention per element: uniform on bounded
        intervals, standard normal on unbounded ones, exponential tails on
        half-bounded ones (gymnasium.spaces.Box.sample)."""
        low = self.low_arr.astype(np.float32)
        high = self.high_arr.astype(np.float32)
        lo_fin = np.isfinite(low)
        hi_fin = np.isfinite(high)
        ku, kn, ke1, ke2 = jax.random.split(key, 4)
        dt = jnp.dtype(self.dtype)
        uni = jax.random.uniform(
            ku, self.shape,
            minval=np.where(lo_fin, low, 0.0),
            maxval=np.where(hi_fin, high, 1.0),
            dtype=dt,
        )
        normal = jax.random.normal(kn, self.shape, dtype=dt)
        upper = jax.random.exponential(ke1, self.shape, dtype=dt) + jnp.asarray(
            np.where(lo_fin, low, 0.0)
        )
        lower = -jax.random.exponential(ke2, self.shape, dtype=dt) + jnp.asarray(
            np.where(hi_fin, high, 0.0)
        )
        both = np.asarray(lo_fin & hi_fin)
        return jnp.where(
            both, uni,
            jnp.where(~lo_fin & ~hi_fin, normal, jnp.where(lo_fin, upper, lower)),
        )

    def zeros(self):
        z = jnp.zeros(self.shape, dtype=self.dtype)
        return jnp.clip(z, self.low_arr, self.high_arr)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return x.shape == self.shape and bool(
            np.all(x >= self.low_arr - 1e-6) and np.all(x <= self.high_arr + 1e-6)
        )


def _to_nested_tuple(a: np.ndarray):
    if a.ndim == 0:
        return a.item()
    return tuple(_to_nested_tuple(x) for x in a)


@dataclasses.dataclass(frozen=True)
class Discrete(Space):
    n: int
    dtype: Any = np.int32

    def sample(self, key: jax.Array):
        return jax.random.randint(key, (), 0, self.n, dtype=jnp.dtype(self.dtype))

    def zeros(self):
        return jnp.zeros((), dtype=self.dtype)

    def contains(self, x) -> bool:
        x = int(np.asarray(x))
        return 0 <= x < self.n

    @property
    def shape(self) -> tuple[int, ...]:
        return ()


@dataclasses.dataclass(frozen=True)
class MultiDiscrete(Space):
    nvec: tuple[int, ...]
    dtype: Any = np.int32

    def __post_init__(self):
        object.__setattr__(self, "nvec", tuple(int(n) for n in self.nvec))

    @property
    def shape(self) -> tuple[int, ...]:
        return (len(self.nvec),)

    def sample(self, key: jax.Array):
        return jax.random.randint(
            key, (len(self.nvec),), 0, jnp.asarray(self.nvec), dtype=jnp.dtype(self.dtype)
        )

    def zeros(self):
        return jnp.zeros((len(self.nvec),), dtype=self.dtype)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return x.shape == self.shape and bool(
            np.all(x >= 0) and np.all(x < np.asarray(self.nvec))
        )


@dataclasses.dataclass(frozen=True)
class TupleSpace(Space):
    spaces: tuple[Space, ...] = ()

    def __post_init__(self):
        object.__setattr__(self, "spaces", tuple(self.spaces))

    def sample(self, key: jax.Array):
        if not self.spaces:
            return ()
        keys = jax.random.split(key, len(self.spaces))
        return tuple(s.sample(k) for s, k in zip(self.spaces, keys))

    def zeros(self):
        return tuple(s.zeros() for s in self.spaces)

    def contains(self, x) -> bool:
        return (
            isinstance(x, (tuple, list))
            and len(x) == len(self.spaces)
            and all(s.contains(v) for s, v in zip(self.spaces, x))
        )


class _FrozenDict(dict):
    def __hash__(self):  # type: ignore[override]
        return hash(tuple(sorted(self.items(), key=lambda kv: kv[0])))


@dataclasses.dataclass(frozen=True)
class DictSpace(Space):
    spaces: Mapping[str, Space] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        object.__setattr__(self, "spaces", _FrozenDict(self.spaces))

    def __getitem__(self, key: str) -> Space:
        return self.spaces[key]

    def keys(self):
        return self.spaces.keys()

    def items(self):
        return self.spaces.items()

    def sample(self, key: jax.Array):
        names = list(self.spaces.keys())
        keys = jax.random.split(key, max(1, len(names)))
        return {n: self.spaces[n].sample(k) for n, k in zip(names, keys)}

    def zeros(self):
        return {n: s.zeros() for n, s in self.spaces.items()}

    def contains(self, x) -> bool:
        return isinstance(x, Mapping) and set(x.keys()) == set(self.spaces.keys()) and all(
            self.spaces[k].contains(v) for k, v in x.items()
        )


@dataclasses.dataclass(frozen=True)
class Image(Box):
    """(…, H, W, C) float image box, mirrors ap_gym.ImageSpace conventions."""

    @staticmethod
    def create(
        width: int,
        height: int,
        channels: int,
        batch_shape: tuple[int, ...] = (),
        dtype: Any = np.float32,
        low: float = 0.0,
        high: float = 1.0,
    ) -> "Image":
        return Image(low=low, high=high, shape=(*batch_shape, height, width, channels), dtype=dtype)

    @property
    def height(self) -> int:
        return self.shape[-3]

    @property
    def width(self) -> int:
        return self.shape[-2]

    @property
    def channels(self) -> int:
        return self.shape[-1]

    @property
    def batch_shape(self) -> tuple[int, ...]:
        return self.shape[:-3]


@dataclasses.dataclass(frozen=True)
class Logit(Box):
    """Box tagged as holding unnormalized logits (ap_gym.LogitSpace)."""


@dataclasses.dataclass(frozen=True)
class ActivePerceptionActionSpace(DictSpace):
    """Dict space {"action": inner, "prediction": pred}.

    Mirrors ap_gym.ActivePerceptionActionSpace
    (/root/reference/ap_gym/active_perception_env.py:27-68).
    """

    @staticmethod
    def create(inner_action_space: Space, prediction_space: Space) -> "ActivePerceptionActionSpace":
        return ActivePerceptionActionSpace(
            spaces={"action": inner_action_space, "prediction": prediction_space}
        )

    @property
    def inner_action_space(self) -> Space:
        return self.spaces["action"]

    @property
    def prediction_space(self) -> Space:
        return self.spaces["prediction"]


def batch_space(space: Space, n: int) -> Space:
    """Prepend a batch dimension of size n (ap_gym uses gym.vector.utils.batch_space)."""
    if isinstance(space, ActivePerceptionActionSpace):
        return ActivePerceptionActionSpace(
            spaces={k: batch_space(v, n) for k, v in space.spaces.items()}
        )
    if isinstance(space, (Image, Logit, Box)):
        cls = type(space)
        low = space.low if np.isscalar(space.low) else _to_nested_tuple(
            np.broadcast_to(np.asarray(space.low), (n, *space.shape))
        )
        high = space.high if np.isscalar(space.high) else _to_nested_tuple(
            np.broadcast_to(np.asarray(space.high), (n, *space.shape))
        )
        return cls(low=low, high=high, shape=(n, *space.shape), dtype=space.dtype)
    if isinstance(space, Discrete):
        return MultiDiscrete(nvec=(space.n,) * n, dtype=space.dtype)
    if isinstance(space, MultiDiscrete):
        return Box(low=0, high=max(space.nvec) - 1, shape=(n, *space.shape), dtype=space.dtype)
    if isinstance(space, TupleSpace):
        return TupleSpace(spaces=tuple(batch_space(s, n) for s in space.spaces))
    if isinstance(space, DictSpace):
        return DictSpace(spaces={k: batch_space(v, n) for k, v in space.spaces.items()})
    raise TypeError(f"Cannot batch space {space!r}")


def sample_space(space: Space, key: jax.Array):
    return space.sample(key)


def zeros_like_space(space: Space):
    return space.zeros()


def contains(space: Space, x) -> bool:
    return space.contains(x)
