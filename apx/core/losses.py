"""Differentiable prediction-loss functions.

Each loss is a frozen dataclass (hashable, usable as a static jit argument)
exposing:

  * ``__call__(prediction, target)``            — pure JAX, batch-shaped output
  * ``numpy(prediction, target)``               — host NumPy path producing the
    same numerics as the reference (used by the gymnasium compat layer for
    bitwise seed-matched parity)
  * ``lower_bound`` / ``blind_guessing_expected_value`` / ``.normalized``

Behavioral reference: /root/reference/ap_gym/loss_fn.py:25-349.
The ``.normalized`` transform maps [lower_bound, blind-guess EV] -> [0, 1]
via an affine transform (loss_fn.py:69-83).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "LossFn",
    "AffineLossFn",
    "LambdaLossFn",
    "ZeroLossFn",
    "CrossEntropyLossFn",
    "MSELossFn",
    "WeightedLossFn",
]


@dataclasses.dataclass(frozen=True)
class LossFn:
    """Base loss. Signature: loss(prediction, target) -> array with the
    broadcast batch shape (the trailing feature axes are reduced).

    ``__call__`` is the jax implementation; ``numpy`` mirrors the
    reference numerics for the compat layer; ``torch`` is differentiable
    like the reference's (loss_fn.py:25-51) so torch learners can train
    through the loss."""

    def __call__(self, prediction, target):
        raise NotImplementedError

    def numpy(self, prediction, target):
        raise NotImplementedError

    def torch(self, prediction, target):
        raise NotImplementedError(
            f"{type(self).__name__} has no torch implementation"
        )

    @property
    def lower_bound(self) -> float:
        return -np.inf

    @property
    def blind_guessing_expected_value(self) -> float | None:
        return None

    @property
    def normalized(self) -> "AffineLossFn":
        upper = self.blind_guessing_expected_value
        if upper is None:
            raise ValueError(
                "Cannot normalize loss function without blind guessing expected value."
            )
        lower = self.lower_bound
        if upper <= lower:
            raise ValueError(
                "Cannot normalize loss function when blind guessing expected value "
                "is not greater than lower bound."
            )
        scale = 1.0 / (upper - lower)
        return AffineLossFn(inner=self, scale=scale, offset=-lower * scale)


@dataclasses.dataclass(frozen=True)
class AffineLossFn(LossFn):
    """inner * scale + offset (loss_fn.py:86-137)."""

    inner: LossFn = None  # type: ignore[assignment]
    scale: float = 1.0
    offset: float = 0.0

    def __call__(self, prediction, target):
        return self.inner(prediction, target) * self.scale + self.offset

    def numpy(self, prediction, target):
        return self.inner.numpy(prediction, target) * self.scale + self.offset

    def torch(self, prediction, target):
        return self.inner.torch(prediction, target) * self.scale + self.offset

    @property
    def lower_bound(self) -> float:
        return self.inner.lower_bound * self.scale + self.offset

    @property
    def blind_guessing_expected_value(self) -> float | None:
        v = self.inner.blind_guessing_expected_value
        return None if v is None else v * self.scale + self.offset


@dataclasses.dataclass(frozen=True)
class LambdaLossFn(LossFn):
    """Wraps user callables (loss_fn.py:140-181)."""

    jax_fn: Callable[[Any, Any], jax.Array] = None  # type: ignore[assignment]
    numpy_fn: Callable[[Any, Any], np.ndarray] | None = None
    torch_fn: Callable[[Any, Any], Any] | None = None
    lower_bound_value: float = -np.inf
    blind_guess_value: float | None = None

    def __call__(self, prediction, target):
        return self.jax_fn(prediction, target)

    def numpy(self, prediction, target):
        if self.numpy_fn is None:
            raise NotImplementedError("Loss function is not implemented for numpy.")
        return self.numpy_fn(prediction, target)

    def torch(self, prediction, target):
        if self.torch_fn is None:
            raise NotImplementedError("Loss function is not implemented for torch.")
        return self.torch_fn(prediction, target)

    @property
    def lower_bound(self) -> float:
        return self.lower_bound_value

    @property
    def blind_guessing_expected_value(self) -> float | None:
        return self.blind_guess_value

    def __hash__(self):
        return hash((id(self.jax_fn), id(self.numpy_fn), id(self.torch_fn), self.lower_bound_value, self.blind_guess_value))


@dataclasses.dataclass(frozen=True)
class ZeroLossFn(LossFn):
    """Constant zero (loss_fn.py:184-204). Targets/predictions may be empty
    tuples; pass ``batch_shape`` explicitly when a batched output is needed
    (matching the reference's LossFn signature)."""

    def __call__(self, prediction, target, batch_shape: tuple[int, ...] = ()):
        return jnp.zeros(batch_shape, dtype=jnp.float32)

    def numpy(self, prediction, target, batch_shape: tuple[int, ...] = ()):
        return np.zeros(batch_shape, dtype=np.float32)

    def torch(self, prediction, target, batch_shape: tuple[int, ...] = ()):
        import torch

        return torch.zeros(batch_shape, dtype=torch.float32)

    @property
    def lower_bound(self) -> float:
        return 0.0

    @property
    def blind_guessing_expected_value(self) -> float:
        return 0.0


def _batch_shape_of(prediction, target) -> tuple[int, ...]:
    for x in (target, prediction):
        leaves = jax.tree_util.tree_leaves(x)
        if leaves:
            a = leaves[0]
            return tuple(np.shape(a))
    return ()


@dataclasses.dataclass(frozen=True)
class CrossEntropyLossFn(LossFn):
    """-log_softmax(prediction)[target] (loss_fn.py:207-250)."""

    num_classes: int | None = None

    def __call__(self, prediction, target):
        logp = jax.nn.log_softmax(prediction, axis=-1)
        # Gather-free label pick: a one-hot select-reduce over the class
        # axis instead of take_along_axis. The gather form lowered to a
        # per-env kCustom gather that was the SINGLE LARGEST op in every
        # classification env's step (~39 us/step at N=4096 — more than the
        # glimpse einsum it sat next to; round-5 profile + A/B in PERF.md),
        # the same in-scan serialization as every other measured gather.
        # The select-reduce adds exact zeros around the picked value, so
        # results are bit-identical (up to IEEE -0.0 -> +0.0 when the
        # target's log-prob is exactly -0.0); gradients flow through the
        # same selected element. Valid labels (0 <= t < C) are the loss
        # contract, as in the reference (loss_fn.py:207-250).
        t = target[..., None].astype(jnp.int32)
        onehot = jnp.arange(logp.shape[-1], dtype=jnp.int32) == t
        return -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)

    def numpy(self, prediction, target):
        import scipy.special

        logp = scipy.special.log_softmax(prediction, axis=-1)
        return -np.take_along_axis(logp, np.asarray(target)[..., None], axis=-1)[..., 0]

    def torch(self, prediction, target):
        import torch

        logp = torch.log_softmax(torch.as_tensor(prediction), dim=-1)
        idx = torch.as_tensor(target).long()[..., None]
        return -torch.gather(logp, -1, idx)[..., 0]

    @property
    def lower_bound(self) -> float:
        return 0.0

    @property
    def blind_guessing_expected_value(self) -> float | None:
        if self.num_classes is None:
            return None
        # Deliberately a np.float64 scalar (not a python float): under NEP 50
        # it promotes the normalized numpy loss to float64, matching the
        # reference's observable numerics (loss_fn.py:247-250).
        return np.log(self.num_classes)


@dataclasses.dataclass(frozen=True)
class MSELossFn(LossFn):
    """mean((prediction - target)^2, axis=-1) (loss_fn.py:253-289)."""

    target_std: float | tuple[float, ...] | None = None

    def __call__(self, prediction, target):
        return jnp.mean(jnp.square(prediction - target), axis=-1)

    def numpy(self, prediction, target):
        return np.mean((np.asarray(prediction) - np.asarray(target)) ** 2, axis=-1)

    def torch(self, prediction, target):
        import torch

        p = torch.as_tensor(prediction)
        t = torch.as_tensor(target)
        return torch.mean((p - t) ** 2, dim=-1)

    @property
    def lower_bound(self) -> float:
        return 0.0

    @property
    def blind_guessing_expected_value(self) -> float | None:
        if self.target_std is None:
            return None
        return float(np.mean(np.asarray(self.target_std) ** 2))


@dataclasses.dataclass(frozen=True)
class WeightedLossFn(LossFn):
    """Target becomes {"target", "weight"}; loss is scaled by weight.

    Used by the Sparsify wrappers where weight = terminated
    (loss_fn.py:292-349, sparsify_wrapper.py:23-164).
    """

    inner: LossFn = None  # type: ignore[assignment]
    min_weight: float = 0.0
    average_weight: float | None = None

    def __call__(self, prediction, target):
        return self.inner(prediction, target["target"]) * target["weight"]

    def numpy(self, prediction, target):
        return self.inner.numpy(prediction, target["target"]) * target["weight"]

    def torch(self, prediction, target):
        import torch

        return self.inner.torch(prediction, target["target"]) * torch.as_tensor(
            target["weight"]
        )

    @property
    def lower_bound(self) -> float:
        return self.min_weight * self.inner.lower_bound

    @property
    def blind_guessing_expected_value(self) -> float | None:
        v = self.inner.blind_guessing_expected_value
        if v is None or self.average_weight is None:
            return None
        return self.average_weight * v
