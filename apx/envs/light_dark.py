"""LightDark: noisy-observation position regression.

Behavioral reference: /root/reference/ap_gym/envs/light_dark.py:14-150.
  * brightness(p) = h^2 / (|p - light|^2 + h^2), light = (0, -0.7), h = 0.2
  * obs = pos + N(0, I) * (1 - brightness) * 0.3, clipped to [-2, 2]
  * base_reward = 1.0 - 1e-3 * sum(action^2)  (the docstring says 0.1; the
    code says 1.0 — we follow the code, light_dark.py:134)
  * move: action normalized into unit ball, scaled by 0.15
  * terminate when any |pos| >= 1 (after the move, before clipping)
  * prediction target = position *before* the move
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.env import APEnv, APStepResult
from ..core.losses import LossFn
from ..core.spaces import Box, DictSpace, Space
from ..ops.geometry import normalize_into_unit_ball
from .common import make_regression_loss_and_target_space

__all__ = ["LightDarkEnv", "LightDarkParams", "LightDarkState"]


class LightDarkParams(struct.PyTreeNode):
    light_pos: tuple[float, float] = struct.field(pytree_node=False, default=(0.0, -0.7))
    light_height: float = struct.field(pytree_node=False, default=0.2)
    move_scale: float = struct.field(pytree_node=False, default=0.15)
    noise_scale: float = struct.field(pytree_node=False, default=0.3)


class LightDarkState(struct.PyTreeNode):
    pos: jax.Array  # (2,) f32


def brightness(pos: jax.Array, params: LightDarkParams) -> jax.Array:
    light = jnp.asarray(params.light_pos, dtype=jnp.float32)
    h2 = params.light_height**2
    dist_sq = jnp.sum(jnp.square(pos - light), axis=-1) + h2
    return h2 / dist_sq


def obs_std(pos: jax.Array, params: LightDarkParams) -> jax.Array:
    return (1.0 - brightness(pos, params)) * params.noise_scale


class LightDarkEnv(APEnv[LightDarkParams, LightDarkState]):
    # reset_env only draws the start position and target — no dataset/map
    # gathers — so the NEXT_STEP vector layer's unconditional masked merge
    # beats the lax.cond gate here (+28%, 134 -> 172M env-steps/s at
    # N=4096; the cond's pass-through plumbing was ~42% of this tiny
    # step). See APEnv.reset_prefers_merge / PERF.md round 5.
    reset_prefers_merge: bool = True

    def default_params(self, **overrides) -> LightDarkParams:
        return LightDarkParams(**overrides)

    def observation_space(self, params) -> Space:
        return DictSpace({"noisy_position": Box(low=-2.0, high=2.0, shape=(2,))})

    def inner_action_space(self, params) -> Space:
        return Box(low=-1.0, high=1.0, shape=(2,))

    def prediction_space(self, params) -> Space:
        return Box(low=-1.0, high=1.0, shape=(2,))

    def prediction_target_space(self, params) -> Space:
        _, space = make_regression_loss_and_target_space(2, -1.0, 1.0)
        return space

    def loss_fn(self, params) -> LossFn:
        loss, _ = make_regression_loss_and_target_space(2, -1.0, 1.0)
        return loss

    def _observe(self, key, pos, params):
        noise = jax.random.normal(key, (2,), dtype=jnp.float32)
        noisy = pos + noise * obs_std(pos, params)
        return {"noisy_position": jnp.clip(noisy, -2.0, 2.0).astype(jnp.float32)}

    def reset_env(self, key, params):
        k_pos, k_obs = jax.random.split(key)
        pos = jax.random.uniform(k_pos, (2,), minval=-1.0, maxval=1.0).astype(
            jnp.float32
        )
        state = LightDarkState(pos=pos)
        return self._observe(k_obs, pos, params), state, {}

    def step_env(self, key, state, action, prediction, params) -> APStepResult:
        last_pos = state.pos
        base_reward = 1.0 - 1e-3 * jnp.sum(jnp.square(action), axis=-1)
        move = normalize_into_unit_ball(action) * params.move_scale
        pos = state.pos + move
        terminated = jnp.any(jnp.abs(pos) >= 1.0)
        pos = jnp.clip(pos, -1.0, 1.0)
        obs = self._observe(key, pos, params)
        return APStepResult(
            obs=obs,
            state=LightDarkState(pos=pos),
            base_reward=base_reward,
            terminated=terminated,
            truncated=jnp.zeros((), dtype=jnp.bool_),
            info={},
            prediction_target=last_pos,
        )

    def prediction_target_on_reset(self, old_state, new_state, params):
        return old_state.pos
