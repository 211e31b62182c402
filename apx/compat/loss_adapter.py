"""Reference-shaped LossFn facade.

The reference exposes loss functions with ``numpy``/``torch``/``jax``
methods of signature ``fn(prediction, target, batch_shape=()) -> array``
plus ``lower_bound`` / ``blind_guessing_expected_value`` / ``.normalized``
(loss_fn.py:25-83). apx losses are leaner (``__call__`` = jax, ``numpy``);
this facade restores the reference surface for drop-in users.
"""

from __future__ import annotations

from ..core.losses import LossFn, ZeroLossFn

__all__ = ["CompatLossFn"]


class CompatLossFn:
    def __init__(self, loss: LossFn):
        self._loss = loss

    def __call__(self, prediction, target, batch_shape=()):
        return self.numpy(prediction, target, batch_shape)

    def numpy(self, prediction, target, batch_shape=()):
        if isinstance(self._loss, ZeroLossFn):
            return self._loss.numpy(prediction, target, batch_shape)
        return self._loss.numpy(prediction, target)

    def jax(self, prediction, target, batch_shape=()):
        if isinstance(self._loss, ZeroLossFn):
            return self._loss(prediction, target, batch_shape)
        return self._loss(prediction, target)

    def torch(self, prediction, target, batch_shape=()):
        if isinstance(self._loss, ZeroLossFn):
            return self._loss.torch(prediction, target, batch_shape)
        return self._loss.torch(prediction, target)

    @property
    def lower_bound(self):
        return self._loss.lower_bound

    @property
    def blind_guessing_expected_value(self):
        return self._loss.blind_guessing_expected_value

    @property
    def normalized(self):
        return CompatLossFn(self._loss.normalized)

    @property
    def inner(self):
        return self._loss
