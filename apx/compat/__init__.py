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


def make(env_id: str, rng: str = "reference", log_wrapper: bool = True, **overrides):
    entry = _entry(env_id)
    env = entry.build()
    params = env.default_params(**overrides)
    lockstep = entry.autoreset in _LOCKSTEP_FAMILIES
    if entry.vector_wrapper is not None:
        raise NotImplementedError(
            f"{env_id}: hide-and-seek compat is vector-level; use make_vec"
        )
    gym_env = GymAPEnv(
        env,
        params,
        autoreset="lockstep" if lockstep else "none",
        rng=rng,
        sparse=entry.sparse,
    )
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
    **overrides,
):
    entry = _entry(env_id)
    env = entry.build()
    params = env.default_params(**overrides)
    lockstep = entry.autoreset in _LOCKSTEP_FAMILIES
    if entry.vector_wrapper is not None:
        raise NotImplementedError(
            f"{env_id}: hide-and-seek compat wrapper not yet wired"
        )
    gym_env = GymVectorAPEnv(
        env,
        params,
        num_envs=num_envs,
        autoreset="lockstep" if lockstep else "next_step",
        rng=rng if lockstep else "native",  # per-env rng chains only exist
        # for the reference's native (lockstep) vector envs; SyncVectorEnv
        # parity would need one np_random per sub-env.
        sparse=entry.sparse,
    )
    if log_wrapper and entry.metrics == "classification":
        gym_env = VectorClassificationLogWrapper(gym_env)
    elif log_wrapper and entry.metrics == "regression":
        gym_env = VectorRegressionLogWrapper(gym_env)
    return gym_env
