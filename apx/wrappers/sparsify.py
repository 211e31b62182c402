"""Sparsify wrapper: prediction loss only counts on the terminal step.

Behavioral reference: /root/reference/ap_gym/sparsify_wrapper.py:23-164.
  * prediction target becomes {"target": t, "weight": float(terminated)},
  * loss_fn becomes WeightedLossFn(inner),
  * reward = base_reward - weighted loss (so the dense per-step loss no
    longer shapes the reward),
  * quirk preserved: info["prediction"]["loss"] still reports the *dense*
    inner loss (the reference recomputes the reward but leaves the inner
    step's info untouched, :74-88), while the target in info is the
    weight-wrapped dict.
Registered for every env ID as ``<Name>-sparse-v0`` (registration.py:115-142).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.env import APStepResult
from ..core.losses import LossFn, WeightedLossFn
from ..core.spaces import Box, DictSpace, Space
from .base import APWrapper

__all__ = ["Sparsify"]


class Sparsify(APWrapper):
    def prediction_target_space(self, params) -> Space:
        return DictSpace(
            {
                "target": self.env.prediction_target_space(params),
                "weight": Box(low=0.0, high=1.0, shape=()),
            }
        )

    def loss_fn(self, params) -> LossFn:
        return WeightedLossFn(inner=self.env.loss_fn(params))

    def step_env(self, key, state, action, prediction, params) -> APStepResult:
        r = self.env.step_env(key, state, action, prediction, params)
        return r.replace(
            prediction_target={
                "target": r.prediction_target,
                "weight": r.terminated.astype(jnp.float32),
            }
        )

    def prediction_target_on_reset(self, old_state, new_state, params):
        # Lockstep reset steps report terminated=False -> weight 0.
        inner = self.env.prediction_target_on_reset(old_state, new_state, params)
        return {"target": inner, "weight": jnp.zeros((), dtype=jnp.float32)}

    def compose_info(self, info, base_reward, pred_target, loss, prediction, params):
        dense = self.env.loss_fn(params)(prediction, pred_target["target"])
        return {
            **info,
            "base_reward": base_reward,
            "prediction": {"target": pred_target, "loss": dense},
        }
