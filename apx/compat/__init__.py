"""Gymnasium drop-in layer.

``apx.compat.make(env_id)`` / ``make_vec(env_id, num_envs)`` mirror
``ap_gym.make`` / ``ap_gym.make_vec`` (registration.py:731-767): numpy
in/out, the reference's info contract, log wrappers attached per task
family, and (default) the reference's exact host RNG draw chains for
seed-matched episodes.
"""

from __future__ import annotations

from ..core.env import AutoResetMode
from ..registry import registry
from .gym_env import GymAPEnv, GymVectorAPEnv
from .log import (
    ClassificationLogWrapper,
    RegressionLogWrapper,
    VectorClassificationLogWrapper,
    VectorRegressionLogWrapper,
)
from .loss_adapter import CompatLossFn
from .spaces import to_gym_space

__all__ = [
    "make",
    "make_vec",
    "GymAPEnv",
    "GymVectorAPEnv",
    "CompatLossFn",
    "to_gym_space",
]

# Image-env families autoreset in lockstep inside step() (the reference's
# native vector envs); LightDark/LIDAR are plain envs as singles and
# NEXT_STEP under vectorization (SURVEY §3.5).
_LOCKSTEP_FAMILIES = (AutoResetMode.LOCKSTEP,)


def _entry(env_id: str):
    reg = registry()
    if env_id not in reg:
        raise KeyError(f"Unknown env id: {env_id!r}")
    return reg[env_id]


def _mk_spec(env_id: str, entry):
    """EnvSpec with the effective episode horizon. The reference reports
    step_limit through spec for every family — image envs via a spec setter
    (image_classification.py:151-159), LIDAR/LightDark via TimeLimit's spec
    patching (time_limit.py:154-166)."""
    from gymnasium.envs.registration import EnvSpec

    return EnvSpec(
        id=env_id,
        entry_point="apx.compat:make",
        max_episode_steps=entry.step_limit,
    )


def make(
    env_id: str,
    rng: str = "reference",
    log_wrapper: bool = True,
    key_impl: str | None = None,
    **overrides,
):
    if overrides.pop("render_mode", "rgb_array") != "rgb_array":
        raise ValueError("only render_mode='rgb_array' is supported")
    entry = _entry(env_id)
    env = entry.build()
    params = env.default_params(**overrides)
    lockstep = entry.autoreset in _LOCKSTEP_FAMILIES
    if entry.vector_wrapper is not None:
        # Hide-and-seek: single env = squeezed 1-env vector pipeline, like
        # the reference (registration.py:482-489).
        vec = make_vec(
            env_id, num_envs=1, rng=rng, log_wrapper=False,
            key_impl=key_impl, **overrides,
        )
        gym_env = GymAPEnv(vec=vec)
    else:
        gym_env = GymAPEnv(
            env,
            params,
            autoreset="lockstep" if lockstep else "none",
            rng=rng,
            sparse=entry.sparse,
            key_impl=key_impl,
        )
    gym_env.spec = _mk_spec(env_id, entry)
    if log_wrapper and entry.metrics == "classification":
        gym_env = ClassificationLogWrapper(gym_env)
    elif log_wrapper and entry.metrics == "regression":
        gym_env = RegressionLogWrapper(gym_env)
    return gym_env


def make_vec(
    env_id: str,
    num_envs: int = 1,
    rng: str = "reference",
    log_wrapper: bool = True,
    key_impl: str | None = None,
    **overrides,
):
    if overrides.pop("render_mode", "rgb_array") != "rgb_array":
        raise ValueError("only render_mode='rgb_array' is supported")
    entry = _entry(env_id)
    env = entry.build()
    params = env.default_params(**overrides)
    lockstep = entry.autoreset in _LOCKSTEP_FAMILIES
    gym_env = GymVectorAPEnv(
        env,
        params,
        num_envs=num_envs,
        autoreset="lockstep" if lockstep else "next_step",
        rng=rng,  # next_step families use per-sub-env np_random chains
        # matching the reference's SyncVectorEnv (seed+i per sub-env).
        sparse=entry.sparse,
        key_impl=key_impl,  # rng="native" only: "rbg" = TPU hardware RNG
    )
    if entry.vector_wrapper is not None:
        from .hide_and_seek import GymHideAndSeekWrapper
        from ..envs.circle_square_hide_and_seek import CircleSquareHideAndSeek

        functional = entry.vector_wrapper(None)
        mask = (
            functional.mask_prediction
            if isinstance(functional, CircleSquareHideAndSeek)
            else False
        )
        gym_env = GymHideAndSeekWrapper(gym_env, mask_prediction=mask)
    gym_env.spec = _mk_spec(env_id, entry)
    if log_wrapper and entry.metrics == "classification":
        gym_env = VectorClassificationLogWrapper(gym_env)
    elif log_wrapper and entry.metrics == "regression":
        gym_env = VectorRegressionLogWrapper(gym_env)
    return gym_env


# Full reference dispatch (passthrough -> RestoreWrapper -> PseudoWrapper,
# active_perception_env.py:251-258): anything produced by apx.compat.make
# passes through unchanged (duck-typed AP surface); foreign gym wrapper
# stacks are dug through; plain gymnasium envs are pseudo-wrapped with
# ZeroLossFn and empty prediction spaces.
from .gym_classes import (  # noqa: E402
    ensure_active_perception_env,
    ensure_active_perception_vector_env,
)
