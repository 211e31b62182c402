"""Functional wrapper base for APEnv.

Mirrors the role of ActivePerceptionWrapper
(/root/reference/ap_gym/active_perception_env.py:124-166): re-expose the
inner env's spaces/loss, let subclasses override any piece. Wrapper state
nests the inner state in a pytree, so vmap/jit/scan compose transparently.
"""

from __future__ import annotations

import jax

from ..core.env import APEnv, APStepResult
from ..core.losses import LossFn
from ..core.spaces import Space

__all__ = ["APWrapper", "unwrapped"]


class APWrapper(APEnv):
    def __init__(self, env: APEnv):
        self.env = env

    # ---- metadata delegation ------------------------------------------------
    @property
    def step_uses_rng(self) -> bool:
        """Delegate to the inner env: a wrapper whose step_env only forwards
        the key must not re-enable the per-step (N,)-key threefry split the
        vector layer skips for deterministic steps (TimeLimit over LIDAR
        was paying it for nothing — round-5 profile). Wrappers that DO
        consume step randomness override this back to True."""
        return self.env.step_uses_rng

    @property
    def reset_prefers_merge(self) -> bool:
        """Delegate to the inner env (see APEnv.reset_prefers_merge): the
        standard wrappers add no dataset/map gathers to reset_env, so a
        gather-free inner reset stays merge-preferring through them
        (TimeLimit over LightDark keeps the +28% unconditional-merge win).
        A wrapper that DOES gather on reset overrides this back to
        False."""
        return self.env.reset_prefers_merge

    def default_params(self, **overrides):
        return self.env.default_params(**overrides)

    def observation_space(self, params) -> Space:
        return self.env.observation_space(params)

    def inner_action_space(self, params) -> Space:
        return self.env.inner_action_space(params)

    def prediction_space(self, params) -> Space:
        return self.env.prediction_space(params)

    def prediction_target_space(self, params) -> Space:
        return self.env.prediction_target_space(params)

    def loss_fn(self, params) -> LossFn:
        return self.env.loss_fn(params)

    # ---- dynamics delegation ------------------------------------------------
    def reset_env(self, key: jax.Array, params):
        return self.env.reset_env(key, params)

    def step_env(self, key, state, action, prediction, params) -> APStepResult:
        return self.env.step_env(key, state, action, prediction, params)

    def autoreset_env(self, key, old_state, params):
        return self.env.autoreset_env(key, old_state, params)

    def wrap_reset(self, obs, state, info, params):
        """Lift an inner reset result through this wrapper (used by the
        compat layer to rebuild wrapped states from host-drawn resets)."""
        return obs, state, info

    def obs_derived_from_state(self, state, params):
        """Delegate derived obs entries to the inner env. The default passes
        the state through unchanged (most wrappers keep the inner state
        bare); wrappers that nest it (TimeLimit) override and unwrap ONE
        level — a blanket getattr(state, "inner") here would double-unwrap
        when a bare-state wrapper sits above a nesting one."""
        return self.env.obs_derived_from_state(state, params)

    def prediction_target_on_reset(self, old_state, new_state, params):
        return self.env.prediction_target_on_reset(old_state, new_state, params)


def unwrapped(env: APEnv) -> APEnv:
    """Innermost env (cf. ActivePerceptionRestoreWrapper's dig,
    active_perception_env.py:169-180)."""
    while isinstance(env, APWrapper):
        env = env.env
    return env
