"""Host-side gymnasium class layer: the reference's public class API.

The reference's L1/L2 surface is a pure-Python gymnasium class hierarchy
(active_perception_env.py, active_perception_vector_env.py,
active_classification_env.py, active_regression_env.py, time_limit.py,
sparsify_wrapper.py, vector_to_single_wrapper.py, image_space.py,
logit_space.py). User code written against the reference subclasses and
constructs these directly, so the drop-in alias (`apx.compat.ap_gym_alias`)
needs real classes with the same names, ctor signatures and step/reset
semantics — not just `make`/`make_vec`.

These classes are deliberately plain host Python (like the reference's):
they exist for interop with user gym code. The TPU execution path is the
functional `apx` API + `apx.compat.gym_env` adapters; envs produced by
`apx.compat.make(_vec)` pass through `ensure_active_perception_env`
untouched because they duck-type the active-perception surface.

Behavioral citations are to /root/reference/ap_gym/<file>:<lines>.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

import gymnasium as gym
import numpy as np

from ..core import losses as L
from .loss_adapter import CompatLossFn

__all__ = [
    "ActivePerceptionActionSpace",
    "NoActivePerceptionEnvError",
    "BaseActivePerceptionEnv",
    "ActivePerceptionEnv",
    "ActivePerceptionWrapper",
    "ActivePerceptionRestoreWrapper",
    "PseudoActivePerceptionWrapper",
    "ensure_active_perception_env",
    "BaseActivePerceptionVectorEnv",
    "ActivePerceptionVectorEnv",
    "ActivePerceptionVectorWrapper",
    "ActivePerceptionVectorRestoreWrapper",
    "PseudoActivePerceptionVectorWrapper",
    "ensure_active_perception_vector_env",
    "ActiveClassificationEnv",
    "ActiveClassificationVectorEnv",
    "ActiveRegressionEnv",
    "ActiveRegressionVectorEnv",
    "ImageSpace",
    "LogitSpace",
    "TimeLimit",
    "SparsifyWrapper",
    "SparsifyVectorWrapper",
    "VectorToSingleWrapper",
    "ActivePerceptionVectorToSingleWrapper",
    "find_loss_and_pred_space",
    "find_loss_and_pred_space_vec",
    "zero_loss_fn",
    "cross_entropy_loss_fn",
    "mse_loss_fn",
    "weighted_loss_fn",
]


# ---------------------------------------------------------------------------
# Loss facades (reference ctor surface over apx losses)


def zero_loss_fn() -> CompatLossFn:
    return CompatLossFn(L.ZeroLossFn())


def cross_entropy_loss_fn(num_classes: int) -> CompatLossFn:
    """CrossEntropyLossFn(num_classes=K) (loss_fn.py:207-250)."""
    return CompatLossFn(L.CrossEntropyLossFn(num_classes=num_classes))


def mse_loss_fn(target_std=None) -> CompatLossFn:
    return CompatLossFn(L.MSELossFn(target_std=target_std))


def weighted_loss_fn(inner) -> CompatLossFn:
    if isinstance(inner, CompatLossFn):
        inner = inner.inner
    return CompatLossFn(L.WeightedLossFn(inner=inner))


def _as_compat_loss(loss) -> CompatLossFn:
    return loss if isinstance(loss, CompatLossFn) else CompatLossFn(loss)


# ---------------------------------------------------------------------------
# Spaces


class ActivePerceptionActionSpace(gym.spaces.Dict):
    """gym.spaces.Dict of {"action", "prediction"} with accessors; its own
    batch_space registration keeps the subclass under vectorization
    (active_perception_env.py:27-68)."""

    def __init__(self, inner_action_space, prediction_space, seed=None):
        super().__init__(
            {"action": inner_action_space, "prediction": prediction_space},
            seed=seed,
        )

    @property
    def inner_action_space(self):
        return self["action"]

    @property
    def prediction_space(self):
        return self["prediction"]

    @property
    def as_dict(self) -> gym.spaces.Dict:
        return gym.spaces.Dict(
            {"action": self["action"], "prediction": self["prediction"]},
            seed=self._np_random,
        )

    @staticmethod
    def from_dict(d: gym.spaces.Dict) -> "ActivePerceptionActionSpace":
        return ActivePerceptionActionSpace(
            d["action"], d["prediction"], seed=d._np_random
        )


@gym.vector.utils.batch_space.register(ActivePerceptionActionSpace)
def _batch_ap_action_space(space: ActivePerceptionActionSpace, n: int = 1):
    return ActivePerceptionActionSpace.from_dict(
        gym.vector.utils.batch_space(space.as_dict, n)
    )


class ImageSpace(gym.spaces.Box):
    """Box with (..., H, W, C) image convention and the reference's ctor
    signature ImageSpace(width, height, channels, batch_shape=(), ...)
    (image_space.py:9-62)."""

    def __init__(
        self,
        width: int,
        height: int,
        channels: int,
        batch_shape: tuple = (),
        dtype=np.float32,
        seed=None,
        low=0.0,
        high=1.0,
    ):
        super().__init__(
            low, high, (*batch_shape, height, width, channels), dtype, seed
        )

    @classmethod
    def from_box(cls, box: gym.spaces.Box):
        return cls(
            box.shape[-2], box.shape[-3], box.shape[-1], box.shape[:-3],
            box.dtype, box.np_random, box.low, box.high,
        )

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


@gym.vector.utils.batch_space.register(ImageSpace)
def _batch_image_space(space: ImageSpace, n: int = 1):
    return ImageSpace.from_box(
        gym.spaces.Box(
            low=np.broadcast_to(space.low, (n, *space.shape)).copy(),
            high=np.broadcast_to(space.high, (n, *space.shape)).copy(),
            dtype=space.dtype,
        )
    )


class LogitSpace(gym.spaces.Box):
    """Box tagging unbounded logit vectors (logit_space.py:4-23)."""


@gym.vector.utils.batch_space.register(LogitSpace)
def _batch_logit_space(space: LogitSpace, n: int = 1):
    return LogitSpace(
        low=np.broadcast_to(space.low, (n, *space.shape)).copy(),
        high=np.broadcast_to(space.high, (n, *space.shape)).copy(),
        shape=(n, *space.shape),
        dtype=space.dtype,
    )


# ---------------------------------------------------------------------------
# Single-env base classes


class NoActivePerceptionEnvError(ValueError):
    pass


def _is_ap(obj) -> bool:
    """Duck-typed active-perception check: covers both these classes and
    the device-backed adapters in apx.compat.gym_env."""
    return hasattr(obj, "loss_fn") and hasattr(obj, "prediction_target_space")


class BaseActivePerceptionEnv(gym.Env, ABC):
    """gym.Env + loss_fn/prediction spaces (active_perception_env.py:71-88).
    Subclasses set ``action_space`` (an ActivePerceptionActionSpace),
    ``prediction_target_space`` and ``loss_fn``."""

    prediction_target_space: gym.Space
    loss_fn: Any

    @property
    def prediction_space(self):
        return self.action_space["prediction"]

    @property
    def inner_action_space(self):
        return self.action_space["action"]


class ActivePerceptionEnv(BaseActivePerceptionEnv, ABC):
    """Template-method step(): reward = base_reward - loss, info REBUILT as
    {"base_reward", "prediction": {"target", "loss"}}
    (active_perception_env.py:90-121)."""

    @abstractmethod
    def _step(self, action, prediction):
        """-> (obs, base_reward, terminated, truncated, info, pred_target)"""

    def step(self, action):
        obs, base_reward, terminated, truncated, info, target = self._step(
            action["action"], action["prediction"]
        )
        loss = self.loss_fn(action["prediction"], target, ())
        info = {
            "base_reward": base_reward,
            "prediction": {"target": target, "loss": loss},
        }
        return obs, base_reward - loss, terminated, truncated, info


class ActivePerceptionWrapper(gym.Wrapper, BaseActivePerceptionEnv):
    """Re-exposes loss_fn / prediction_target_space, overridable via the
    ``_loss_fn`` / ``_prediction_target_space`` slots
    (active_perception_env.py:124-166)."""

    def __init__(self, env):
        env = ensure_active_perception_env(env)
        self._prediction_target_space = None
        self._loss_fn = None
        super().__init__(env)

    @property
    def loss_fn(self):
        return self._loss_fn if self._loss_fn is not None else self.env.loss_fn

    @property
    def prediction_target_space(self):
        if self._prediction_target_space is not None:
            return self._prediction_target_space
        return self.env.prediction_target_space


def find_loss_and_pred_space(env):
    """Dig through gym wrappers to the AP env
    (active_perception_env.py:169-180)."""
    if _is_ap(env):
        return env.loss_fn, env.prediction_target_space
    if isinstance(env, gym.Wrapper):
        return find_loss_and_pred_space(env.env)
    raise NoActivePerceptionEnvError(
        "The environment does not contain an ActivePerceptionEnv"
    )


class ActivePerceptionRestoreWrapper(gym.Wrapper, BaseActivePerceptionEnv):
    """Re-surfaces loss_fn/pred space found deeper in a foreign wrapper
    stack (active_perception_env.py:183-210). Like the reference, the
    action space resolves to the inner env's via attribute fallback (its
    ``action_space`` property reads a never-assigned private attr, :199-200,
    so the __getattr__ fallback is what actually runs)."""

    def __init__(self, env):
        super().__init__(env)
        self.__loss_fn, self.__pred_target_space = find_loss_and_pred_space(env)

    @property
    def loss_fn(self):
        return self.__loss_fn

    @property
    def prediction_target_space(self):
        return self.__pred_target_space

    def __getattr__(self, item):
        try:
            return super().__getattribute__(item)
        except AttributeError:
            return getattr(self.env, item)


class PseudoActivePerceptionWrapper(gym.Wrapper, BaseActivePerceptionEnv):
    """Converts a plain gym env: ZeroLossFn, empty Tuple prediction spaces,
    base_reward/prediction info injection (active_perception_env.py:213-248)."""

    def __init__(self, env):
        super().__init__(env)
        self.action_space = ActivePerceptionActionSpace(
            self.env.action_space, gym.spaces.Tuple(())
        )
        self.prediction_target_space = gym.spaces.Tuple(())
        self.loss_fn = zero_loss_fn()

    def reset(self, *, seed=None, options=None):
        obs, info = self.env.reset(seed=seed, options=options)
        info["prediction"] = {"target": ()}
        return obs, info

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action["action"])
        info.update(
            {
                "base_reward": reward,
                "prediction": {
                    "target": (),
                    "loss": np.zeros((), dtype=np.float32),
                },
            }
        )
        return obs, float(reward), terminated, truncated, info


def ensure_active_perception_env(env):
    """Dispatch: passthrough -> RestoreWrapper -> PseudoWrapper
    (active_perception_env.py:251-258)."""
    if _is_ap(env):
        return env
    try:
        return ActivePerceptionRestoreWrapper(env)
    except NoActivePerceptionEnvError:
        pass
    return PseudoActivePerceptionWrapper(env)


# ---------------------------------------------------------------------------
# Vector mirrors (active_perception_vector_env.py)


class BaseActivePerceptionVectorEnv(gym.vector.VectorEnv, ABC):
    prediction_target_space: gym.Space
    single_prediction_target_space: gym.Space
    loss_fn: Any

    @property
    def prediction_space(self):
        return self.action_space["prediction"]

    @property
    def inner_action_space(self):
        return self.action_space["action"]

    @property
    def single_prediction_space(self):
        return self.single_action_space["prediction"]

    @property
    def single_inner_action_space(self):
        return self.single_action_space["action"]


class ActivePerceptionVectorEnv(BaseActivePerceptionVectorEnv, ABC):
    """Vector step template: same reward composition but info.UPDATE — the
    env's own info keys survive (active_perception_vector_env.py:84-111;
    the single-env template replaces instead, an observable asymmetry)."""

    @abstractmethod
    def _step(self, action, prediction):
        """-> (obs, base_reward, terminated, truncated, info, pred_target)"""

    def step(self, action):
        obs, base_reward, terminated, truncated, info, target = self._step(
            action["action"], action["prediction"]
        )
        loss = self.loss_fn(action["prediction"], target, (self.num_envs,))
        info.update(
            {
                "base_reward": base_reward,
                "prediction": {"target": target, "loss": loss},
            }
        )
        return obs, base_reward - loss, terminated, truncated, info


class ActivePerceptionVectorWrapper(
    gym.vector.VectorWrapper, BaseActivePerceptionVectorEnv
):
    def __init__(self, env):
        env = ensure_active_perception_vector_env(env)
        self._prediction_target_space = None
        self._single_prediction_target_space = None
        self._loss_fn = None
        super().__init__(env)

    @property
    def loss_fn(self):
        return self._loss_fn if self._loss_fn is not None else self.env.loss_fn

    @property
    def prediction_target_space(self):
        if self._prediction_target_space is not None:
            return self._prediction_target_space
        return self.env.prediction_target_space

    @property
    def single_prediction_target_space(self):
        if self._single_prediction_target_space is not None:
            return self._single_prediction_target_space
        return self.env.single_prediction_target_space


def find_loss_and_pred_space_vec(env):
    """Vector variant; understands SyncVectorEnv (inspects envs[0]) and
    AsyncVectorEnv (instantiates a throwaway env from env_fns[0])
    (active_perception_vector_env.py:216-250)."""
    if _is_ap(env) and hasattr(env, "single_prediction_target_space"):
        return (
            env.loss_fn,
            env.single_prediction_target_space,
            env.prediction_target_space,
        )
    if isinstance(env, gym.vector.VectorWrapper):
        return find_loss_and_pred_space_vec(env.env)
    if isinstance(env, gym.vector.SyncVectorEnv):
        loss_fn, single = find_loss_and_pred_space(env.envs[0])
        return loss_fn, single, gym.vector.utils.batch_space(single, env.num_envs)
    if isinstance(env, gym.vector.AsyncVectorEnv):
        dummy = env.env_fns[0]()
        try:
            loss_fn, single = find_loss_and_pred_space(dummy)
        finally:
            dummy.close()
        return loss_fn, single, gym.vector.utils.batch_space(single, env.num_envs)
    raise NoActivePerceptionEnvError(
        "The environment does not contain an ActivePerceptionEnv"
    )


class ActivePerceptionVectorRestoreWrapper(
    gym.vector.VectorWrapper, BaseActivePerceptionVectorEnv
):
    """Rebuilds ActivePerceptionActionSpace from the batched Dict and
    re-surfaces loss/pred spaces (active_perception_vector_env.py:254-308)."""

    def __init__(self, env):
        super().__init__(env)
        (
            self.__loss_fn,
            self.__single_pred_target_space,
            self.__pred_target_space,
        ) = find_loss_and_pred_space_vec(env)
        act = self.env.action_space
        self.__action_space = ActivePerceptionActionSpace(
            act["action"], act["prediction"], seed=act._np_random
        )
        single = self.env.single_action_space
        self.__single_action_space = ActivePerceptionActionSpace(
            single["action"], single["prediction"], seed=single._np_random
        )

    @property
    def loss_fn(self):
        return self.__loss_fn

    @property
    def action_space(self):
        return self.__action_space

    @action_space.setter
    def action_space(self, _):  # gym.vector.VectorWrapper assigns in init
        pass

    @property
    def single_action_space(self):
        return self.__single_action_space

    @single_action_space.setter
    def single_action_space(self, _):
        pass

    @property
    def prediction_target_space(self):
        return self.__pred_target_space

    @property
    def single_prediction_target_space(self):
        return self.__single_pred_target_space

    def __getattr__(self, item):
        try:
            return super().__getattribute__(item)
        except AttributeError:
            return getattr(self.env, item)

    def __del__(self):
        # Mirrors the reference's guard against gymnasium's GC bug
        # (active_perception_vector_env.py:305-308).
        pass


class PseudoActivePerceptionVectorWrapper(
    gym.vector.VectorWrapper, BaseActivePerceptionVectorEnv
):
    """(active_perception_vector_env.py:173-212)."""

    def __init__(self, env):
        super().__init__(env)
        self.single_action_space = ActivePerceptionActionSpace(
            self.env.single_action_space, gym.spaces.Tuple(())
        )
        self.action_space = ActivePerceptionActionSpace(
            self.env.action_space, gym.spaces.Tuple(())
        )
        self.single_prediction_target_space = gym.spaces.Tuple(())
        self.prediction_target_space = gym.spaces.Tuple(())
        self.loss_fn = zero_loss_fn()

    def reset(self, *, seed=None, options=None):
        obs, info = self.env.reset(seed=seed, options=options)
        info["prediction"] = {"target": ()}
        return obs, info

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action["action"])
        info.update(
            {
                "base_reward": reward,
                "prediction": {
                    "target": (),
                    "loss": np.zeros(self.num_envs, dtype=np.float32),
                },
            }
        )
        return obs, reward, terminated, truncated, info


def ensure_active_perception_vector_env(env):
    if _is_ap(env) and hasattr(env, "single_prediction_target_space"):
        return env
    try:
        return ActivePerceptionVectorRestoreWrapper(env)
    except NoActivePerceptionEnvError:
        pass
    return PseudoActivePerceptionVectorWrapper(env)


# ---------------------------------------------------------------------------
# Task-family bases (active_classification_env.py:28-65,
# active_regression_env.py:29-110)


class ActiveClassificationEnv(ActivePerceptionEnv, ABC):
    def __init__(self, num_classes: int, inner_action_space: gym.Space):
        self.action_space = ActivePerceptionActionSpace(
            inner_action_space,
            LogitSpace(-np.inf, np.inf, shape=(num_classes,)),
        )
        self.prediction_target_space = gym.spaces.Discrete(num_classes)
        self.loss_fn = cross_entropy_loss_fn(num_classes).normalized


class ActiveClassificationVectorEnv(ActivePerceptionVectorEnv, ABC):
    def __init__(self, num_envs, num_classes, single_inner_action_space):
        self.num_envs = num_envs
        self.single_action_space = ActivePerceptionActionSpace(
            single_inner_action_space,
            LogitSpace(-np.inf, np.inf, shape=(num_classes,)),
        )
        self.action_space = gym.vector.utils.batch_space(
            self.single_action_space, num_envs
        )
        self.single_prediction_target_space = gym.spaces.Discrete(num_classes)
        self.prediction_target_space = gym.spaces.MultiDiscrete(
            [num_classes] * num_envs
        )
        self.loss_fn = cross_entropy_loss_fn(num_classes).normalized


def _regression_loss_and_space(target_dim, low, high, target_std=None):
    """(high - low)/sqrt(12) uniform-assumption normalization, with the
    reference's warning for unbounded spaces (active_regression_env.py:29-52)."""
    space = gym.spaces.Box(low=low, high=high, shape=(target_dim,))
    if target_std is None and np.all(np.isfinite(space.low)) and np.all(
        np.isfinite(space.high)
    ):
        target_std = (high - low) / np.sqrt(12)
    loss = mse_loss_fn(target_std=target_std)
    if target_std is not None:
        loss = loss.normalized
    else:
        import logging

        logging.getLogger(__name__).warning(
            "Prediction target space is unbounded, and target_std is not "
            "provided. MSE loss will not be normalized."
        )
    return loss, space


class ActiveRegressionEnv(ActivePerceptionEnv, ABC):
    def __init__(
        self,
        target_dim: int,
        inner_action_space: gym.Space,
        prediction_low=-1.0,
        prediction_high=1.0,
        target_std=None,
    ):
        loss, space = _regression_loss_and_space(
            target_dim, prediction_low, prediction_high, target_std
        )
        self.action_space = ActivePerceptionActionSpace(inner_action_space, space)
        self.prediction_target_space = space
        self.loss_fn = loss


class ActiveRegressionVectorEnv(ActivePerceptionVectorEnv, ABC):
    def __init__(
        self,
        num_envs: int,
        target_dim: int,
        single_inner_action_space: gym.Space,
        prediction_low=-1.0,
        prediction_high=1.0,
        target_std=None,
    ):
        self.num_envs = num_envs
        loss, space = _regression_loss_and_space(
            target_dim, prediction_low, prediction_high, target_std
        )
        self.single_action_space = ActivePerceptionActionSpace(
            single_inner_action_space, space
        )
        self.action_space = gym.vector.utils.batch_space(
            self.single_action_space, num_envs
        )
        self.single_prediction_target_space = space
        self.prediction_target_space = gym.vector.utils.batch_space(space, num_envs)
        self.loss_fn = loss


# ---------------------------------------------------------------------------
# TimeLimit (time_limit.py:17-166)


class TimeLimit(gym.Wrapper):
    def __init__(
        self,
        env: gym.Env,
        max_episode_steps: int,
        issue_termination: bool = False,
        observe_time_steps: bool | None = None,
    ):
        super().__init__(env)
        self._max_episode_steps = int(max_episode_steps)
        self._issue_termination = bool(issue_termination)
        self._observe_time_steps = (
            issue_termination if observe_time_steps is None else bool(observe_time_steps)
        )
        self._elapsed_steps = None
        if self._observe_time_steps:
            self.observation_space = self._augmented_space(env.observation_space)

    def _augmented_space(self, space):
        time_space = gym.spaces.Box(low=-1.0, high=1.0, shape=(), dtype=np.float32)
        if isinstance(space, gym.spaces.Dict):
            return gym.spaces.Dict({**space.spaces, "time_step": time_space})
        if isinstance(space, gym.spaces.Tuple):
            return gym.spaces.Tuple((*space.spaces, time_space))
        if isinstance(space, gym.spaces.Box) and np.issubdtype(
            space.dtype, np.floating
        ) and len(space.shape) == 1:
            return gym.spaces.Box(
                low=np.concatenate([space.low, [-1.0]]).astype(space.dtype),
                high=np.concatenate([space.high, [1.0]]).astype(space.dtype),
                dtype=space.dtype,
            )
        return gym.spaces.Dict({"observation": space, "time_step": time_space})

    def _time_obs(self):
        return np.array(
            2.0 * self._elapsed_steps / self._max_episode_steps - 1.0,
            dtype=np.float32,
        )

    def _wrap_obs(self, obs):
        if not self._observe_time_steps:
            return obs
        if isinstance(obs, dict):
            return {**obs, "time_step": self._time_obs()}
        if isinstance(obs, tuple):
            return (*obs, self._time_obs())
        if isinstance(obs, np.ndarray) and obs.ndim == 1:
            return np.concatenate([obs, [self._time_obs().astype(obs.dtype)]])
        return {"observation": obs, "time_step": self._time_obs()}

    def reset(self, *, seed=None, options=None):
        self._elapsed_steps = 0
        obs, info = self.env.reset(seed=seed, options=options)
        return self._wrap_obs(obs), info

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        self._elapsed_steps += 1
        if self._elapsed_steps >= self._max_episode_steps:
            if self._issue_termination:
                terminated = True
            else:
                truncated = True
        return self._wrap_obs(obs), reward, terminated, truncated, info


# ---------------------------------------------------------------------------
# Sparsify (sparsify_wrapper.py:23-164)


def _weightify(info, terminated):
    info = dict(info)
    pred = dict(info.get("prediction", {}))
    if "target" in pred:
        pred["target"] = {
            "target": pred["target"],
            "weight": np.asarray(terminated, dtype=np.float32),
        }
    info["prediction"] = pred
    return info


class SparsifyWrapper(ActivePerceptionWrapper):
    """Loss counts only on the final step: target becomes
    {"target", "weight"} with weight = terminated, reward recomputed as
    base_reward - weighted loss (sparsify_wrapper.py:109-160). NOTE: the
    reference's reset crashes (KeyError on the missing info["prediction"],
    :153-160 — documented in tests/test_compat_parity.py); here reset
    degrades gracefully by only weight-wrapping when the key exists."""

    def __init__(self, env):
        super().__init__(env)
        self._prediction_target_space = gym.spaces.Dict(
            {
                "target": self.env.prediction_target_space,
                "weight": gym.spaces.Box(0, 1, shape=(), dtype=np.float32),
            }
        )
        self._loss_fn = weighted_loss_fn(self.env.loss_fn)

    def reset(self, *, seed=None, options=None):
        obs, info = self.env.reset(seed=seed, options=options)
        return obs, _weightify(info, 0.0)

    def step(self, action):
        obs, _, terminated, truncated, info = self.env.step(action)
        info = _weightify(info, 1.0 if terminated else 0.0)
        reward = info["base_reward"] - self.loss_fn(
            action["prediction"], info["prediction"]["target"], ()
        )
        return obs, reward, terminated, truncated, info


class SparsifyVectorWrapper(ActivePerceptionVectorWrapper):
    """(sparsify_wrapper.py:23-97)."""

    def __init__(self, env):
        super().__init__(env)
        self._single_prediction_target_space = gym.spaces.Dict(
            {
                "target": self.env.single_prediction_target_space,
                "weight": gym.spaces.Box(0, 1, shape=(), dtype=np.float32),
            }
        )
        self._prediction_target_space = gym.vector.utils.batch_space(
            self._single_prediction_target_space, self.num_envs
        )
        self._loss_fn = weighted_loss_fn(self.env.loss_fn)

    def reset(self, *, seed=None, options=None):
        obs, info = self.env.reset(seed=seed, options=options)
        return obs, _weightify(info, np.zeros(self.num_envs, np.float32))

    def step(self, action):
        obs, _, terminated, truncated, info = self.env.step(action)
        info = _weightify(info, np.asarray(terminated, np.float32))
        reward = info["base_reward"] - self.loss_fn(
            action["prediction"], info["prediction"]["target"], (self.num_envs,)
        )
        return obs, reward, terminated, truncated, info


# ---------------------------------------------------------------------------
# VectorToSingle (vector_to_single_wrapper.py:18-129)


def _tree_expand(x):
    if isinstance(x, dict):
        return {k: _tree_expand(v) for k, v in x.items()}
    if isinstance(x, tuple):
        return tuple(_tree_expand(v) for v in x)
    return np.asarray(x)[None]


def _tree_squeeze(x):
    if isinstance(x, dict):
        return {k: _tree_squeeze(v) for k, v in x.items()}
    if isinstance(x, tuple):
        return tuple(_tree_squeeze(v) for v in x)
    a = np.asarray(x)
    return a[0] if a.ndim else a


class VectorToSingleWrapper(gym.Env):
    """Runs a 1-env VectorEnv as a single env: x -> x[None] on the way in,
    x -> x[0] on the way out (vector_to_single_wrapper.py:18-103)."""

    def __init__(self, env):
        assert env.num_envs == 1, "VectorToSingleWrapper requires num_envs == 1"
        self.env = env
        self.observation_space = env.single_observation_space
        self.action_space = env.single_action_space
        self.metadata = env.metadata
        self.render_mode = getattr(env, "render_mode", None)
        self.spec = getattr(env, "spec", None)

    def reset(self, *, seed=None, options=None):
        obs, info = self.env.reset(seed=seed, options=options)
        return _tree_squeeze(obs), _tree_squeeze(info)

    def step(self, action):
        obs, reward, term, trunc, info = self.env.step(_tree_expand(action))
        return (
            _tree_squeeze(obs),
            float(np.asarray(reward)[0]),
            bool(np.asarray(term)[0]),
            bool(np.asarray(trunc)[0]),
            _tree_squeeze(info),
        )

    def render(self):
        out = self.env.render()
        return out[0] if isinstance(out, (list, tuple)) else out

    def close(self):
        self.env.close()

    @property
    def np_random(self):
        return self.env.np_random

    @np_random.setter
    def np_random(self, value):
        self.env.np_random = value


class ActivePerceptionVectorToSingleWrapper(VectorToSingleWrapper):
    """Adds loss_fn / prediction spaces passthrough from the single_*
    variants (vector_to_single_wrapper.py:106-129)."""

    @property
    def loss_fn(self):
        return self.env.loss_fn

    @property
    def prediction_target_space(self):
        return self.env.single_prediction_target_space

    @property
    def prediction_space(self):
        return self.env.single_prediction_space

    @property
    def inner_action_space(self):
        return self.env.single_inner_action_space
