"""Pseudo active-perception adapter for plain (prediction-free) envs.

Behavioral reference: PseudoActivePerceptionWrapper
(/root/reference/ap_gym/active_perception_env.py:213-248) and its vector
mirror (:173-212): a plain env becomes an AP env with ZeroLossFn, empty
Tuple prediction/target spaces, and injected ``base_reward`` /
``prediction`` info keys, so AP-generic agent code can drive it.

The functional equivalent wraps any "plain env" object exposing
``default_params`` / ``reset_env(key, params) -> (obs, state, info)`` /
``plain_step(key, state, action, params) -> (obs, state, reward, term,
trunc, info)``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..core.env import APEnv, APStepResult
from ..core.losses import LossFn, ZeroLossFn
from ..core.spaces import Space, TupleSpace

__all__ = ["PseudoActivePerceptionEnv"]


class PseudoActivePerceptionEnv(APEnv):
    def __init__(self, plain_env: Any):
        self.plain = plain_env

    def default_params(self, **overrides):
        return self.plain.default_params(**overrides)

    def observation_space(self, params) -> Space:
        return self.plain.observation_space(params)

    def inner_action_space(self, params) -> Space:
        return self.plain.action_space(params)

    def prediction_space(self, params) -> Space:
        return TupleSpace(())

    def prediction_target_space(self, params) -> Space:
        return TupleSpace(())

    def loss_fn(self, params) -> LossFn:
        return ZeroLossFn()

    def reset_env(self, key, params):
        return self.plain.reset_env(key, params)

    def step_env(self, key, state, action, prediction, params) -> APStepResult:
        obs, state2, reward, term, trunc, info = self.plain.plain_step(
            key, state, action, params
        )
        return APStepResult(
            obs=obs,
            state=state2,
            base_reward=jnp.asarray(reward, jnp.float32),
            terminated=term,
            truncated=trunc,
            info=info,
            prediction_target=(),
        )

    def prediction_target_on_reset(self, old_state, new_state, params):
        return ()
