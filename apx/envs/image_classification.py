"""Glimpse-based image classification environment (functional, TPU-native).

Behavioral reference: /root/reference/ap_gym/envs/image_classification.py and
ap_gym/active_classification_env.py:28-65 (LogitSpace prediction,
Discrete target, normalized cross-entropy loss).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.env import APEnv, APStepResult
from ..core.losses import CrossEntropyLossFn, LossFn
from ..core.spaces import Discrete, Logit, Space
from ..data.dataset import ImageDataset
from .image_perception import (
    ImagePerceptionEngine,
    ImagePerceptionParams,
    ImagePerceptionState,
)

__all__ = ["ImageClassificationEnv"]


class ImageClassificationEnv(APEnv[ImagePerceptionParams, ImagePerceptionState]):
    step_uses_rng = False  # step_env is deterministic given state/action
    """Native lockstep-autoreset semantics are provided by the vector wrapper
    with AutoResetMode.LOCKSTEP (image_classification.py:57-61 declares
    NEXT_STEP at the Gymnasium level, but the module itself only supports
    all-done lockstep reset, module.py:197-202)."""

    def __init__(self, dataset: ImageDataset | None = None, **config):
        self._dataset = dataset
        self._config = config

    def default_params(self, **overrides) -> ImagePerceptionParams:
        cfg = {**self._config, **overrides}
        dataset = cfg.pop("dataset", self._dataset)
        if dataset is None:
            raise ValueError("ImageClassificationEnv requires a dataset")
        if "max_step_length" in cfg and not isinstance(
            cfg["max_step_length"], (tuple, list)
        ):
            cfg["max_step_length"] = (cfg["max_step_length"], cfg["max_step_length"])
        return ImagePerceptionParams(dataset=dataset, **cfg)

    # ---- spaces / loss ----------------------------------------------------
    def observation_space(self, params) -> Space:
        return ImagePerceptionEngine.observation_space(params)

    def inner_action_space(self, params) -> Space:
        return ImagePerceptionEngine.inner_action_space(params)

    def prediction_space(self, params) -> Space:
        return Logit(low=-jnp.inf, high=jnp.inf, shape=(params.dataset.num_classes,))

    def prediction_target_space(self, params) -> Space:
        return Discrete(params.dataset.num_classes)

    def loss_fn(self, params) -> LossFn:
        return CrossEntropyLossFn(num_classes=params.dataset.num_classes).normalized

    # ---- dynamics ----------------------------------------------------------
    def reset_env(self, key, params):
        state = ImagePerceptionEngine.reset(key, params)
        obs = ImagePerceptionEngine.observe(state, params)
        return obs, state, ImagePerceptionEngine.info(state)

    def step_env(self, key, state, action, prediction, params) -> APStepResult:
        new_state, base_reward, terminated = ImagePerceptionEngine.move(
            state, action, params
        )
        obs = ImagePerceptionEngine.observe(new_state, params)
        return APStepResult(
            obs=obs,
            state=new_state,
            base_reward=base_reward,
            terminated=terminated,
            truncated=jnp.zeros((), dtype=jnp.bool_),
            info=ImagePerceptionEngine.info(new_state),
            prediction_target=new_state.label,
        )

    def prediction_target_on_reset(self, old_state, new_state, params):
        """On the lockstep reset step, the loss target is the *new* episode's
        label (image_classification.py:113-127)."""
        return new_state.label
