"""Functional TimeLimit wrapper.

Behavioral reference: /root/reference/ap_gym/time_limit.py:17-166.
  * after max_episode_steps steps, sets ``terminated`` (issue_termination)
    or ``truncated``,
  * observe_time_steps (default = issue_termination) appends the normalized
    time ``2 t / T - 1`` to the observation: new "time_step" key for Dict
    obs, concatenated scalar for float Box obs, {"observation","time_step"}
    otherwise (:65-111). The reset obs carries t = 0 -> -1.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..core.env import APEnv, APStepResult
from ..core.spaces import Box, DictSpace, Space
from .base import APWrapper

__all__ = ["TimeLimit", "TimeLimitState"]


class TimeLimitState(struct.PyTreeNode):
    inner: Any
    t: jax.Array  # () int32, steps elapsed


class TimeLimit(APWrapper):
    def __init__(
        self,
        env: APEnv,
        max_episode_steps: int,
        issue_termination: bool = False,
        observe_time_steps: bool | None = None,
    ):
        super().__init__(env)
        self.max_episode_steps = int(max_episode_steps)
        self.issue_termination = bool(issue_termination)
        self.observe_time_steps = (
            issue_termination if observe_time_steps is None else bool(observe_time_steps)
        )

    # ---- spaces -------------------------------------------------------------
    def observation_space(self, params) -> Space:
        inner = self.env.observation_space(params)
        if not self.observe_time_steps:
            return inner
        time_space = Box(low=-1.0, high=1.0, shape=())
        if isinstance(inner, DictSpace):
            return DictSpace({**inner.spaces, "time_step": time_space})
        from ..core.spaces import TupleSpace

        if isinstance(inner, TupleSpace):
            return TupleSpace((*inner.spaces, time_space))
        if isinstance(inner, Box) and len(inner.shape) == 1:
            return Box(
                low=jnp.concatenate([jnp.broadcast_to(inner.low, inner.shape), jnp.array([-1.0])]),
                high=jnp.concatenate([jnp.broadcast_to(inner.high, inner.shape), jnp.array([1.0])]),
                shape=(inner.shape[0] + 1,),
            )
        return DictSpace({"observation": inner, "time_step": time_space})

    def _time_obs(self, t: jax.Array) -> jax.Array:
        return (2.0 * t / self.max_episode_steps - 1.0).astype(jnp.float32)

    def _wrap_obs(self, obs, t: jax.Array):
        if not self.observe_time_steps:
            return obs
        time_obs = self._time_obs(t)
        if isinstance(obs, dict):
            return {**obs, "time_step": time_obs}
        if isinstance(obs, tuple):
            return (*obs, time_obs)
        if isinstance(obs, jax.Array) and obs.ndim == 1:
            return jnp.concatenate([obs, time_obs[None]])
        return {"observation": obs, "time_step": time_obs}

    # ---- dynamics -----------------------------------------------------------
    def wrap_reset(self, obs, state, info, params):
        t = jnp.zeros((), dtype=jnp.int32)
        return self._wrap_obs(obs, t), TimeLimitState(inner=state, t=t), info

    def reset_env(self, key, params):
        obs, state, info = self.env.reset_env(key, params)
        return self.wrap_reset(obs, state, info, params)

    def autoreset_env(self, key, old_state, params):
        obs, state, info = self.env.autoreset_env(key, old_state.inner, params)
        t = jnp.zeros((), dtype=jnp.int32)
        return self._wrap_obs(obs, t), TimeLimitState(inner=state, t=t), info

    def step_env(self, key, state, action, prediction, params) -> APStepResult:
        r = self.env.step_env(key, state.inner, action, prediction, params)
        t = state.t + 1
        out_of_time = t >= self.max_episode_steps
        terminated = r.terminated | out_of_time if self.issue_termination else r.terminated
        truncated = r.truncated if self.issue_termination else r.truncated | out_of_time
        return r.replace(
            obs=self._wrap_obs(r.obs, t),
            state=TimeLimitState(inner=r.state, t=t),
            terminated=terminated,
            truncated=truncated,
        )

    def prediction_target_on_reset(self, old_state, new_state, params):
        return self.env.prediction_target_on_reset(
            old_state.inner, new_state.inner, params
        )

    def obs_derived_from_state(self, state, params):
        return self.env.obs_derived_from_state(state.inner, params)
