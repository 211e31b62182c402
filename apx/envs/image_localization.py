"""Glimpse-based image localization environment.

Behavioral reference: /root/reference/ap_gym/envs/image_localization.py.
  * regression task: predict the normalized (x, y) of a target glimpse
  * at explicit reset, the target comes from the unique-glimpse sampler
    (image_localization.py:135-139); on autoreset it is resampled
    *uniformly* in [-1, 1]^2 (:152-156)
  * obs adds "target_glimpse", extracted at the current target position
  * the loss target returned on an autoreset step is the *previous*
    episode's target (:151-152, :180)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.env import APEnv, APStepResult
from ..core.losses import LossFn
from ..core.spaces import DictSpace, Image, Space
from ..data.dataset import ImageDataset
from .common import make_regression_loss_and_target_space
from .image_perception import (
    ImagePerceptionEngine,
    ImagePerceptionParams,
    ImagePerceptionState,
)

__all__ = ["ImageLocalizationEnv", "ImageLocalizationState"]


class ImageLocalizationState(struct.PyTreeNode):
    perception: ImagePerceptionState
    target: jax.Array  # (2,) f32 normalized target position
    # The target is CONSTANT within an episode, so its glimpse is computed
    # once at (auto)reset and carried in state — bitwise-identical to the
    # reference's per-step recomputation (image_localization.py:169-175)
    # and half the per-step glimpse GEMM work.
    target_glimpse: jax.Array  # (s0, s1, C) f32


class ImageLocalizationEnv(APEnv[ImagePerceptionParams, ImageLocalizationState]):
    step_uses_rng = False  # step_env is deterministic given state/action
    def __init__(self, dataset: ImageDataset | None = None, **config):
        self._dataset = dataset
        self._config = config

    def default_params(self, **overrides) -> ImagePerceptionParams:
        cfg = {**self._config, **overrides}
        dataset = cfg.pop("dataset", self._dataset)
        if dataset is None:
            raise ValueError("ImageLocalizationEnv requires a dataset")
        if "max_step_length" in cfg and not isinstance(
            cfg["max_step_length"], (tuple, list)
        ):
            cfg["max_step_length"] = (cfg["max_step_length"], cfg["max_step_length"])
        return ImagePerceptionParams(dataset=dataset, **cfg)

    # ---- spaces / loss ----------------------------------------------------
    def observation_space(self, params) -> Space:
        s0, s1 = params.sensor_size
        _, _, c = params.dataset.image_shape
        d = ImagePerceptionEngine.observation_space_dict(params)
        d["target_glimpse"] = Image.create(width=s1, height=s0, channels=c)
        return DictSpace(d)

    def inner_action_space(self, params) -> Space:
        return ImagePerceptionEngine.inner_action_space(params)

    def prediction_space(self, params) -> Space:
        _, space = make_regression_loss_and_target_space(2, -1.0, 1.0)
        return space

    def prediction_target_space(self, params) -> Space:
        _, space = make_regression_loss_and_target_space(2, -1.0, 1.0)
        return space

    def loss_fn(self, params) -> LossFn:
        loss, _ = make_regression_loss_and_target_space(2, -1.0, 1.0)
        return loss

    # ---- dynamics ----------------------------------------------------------
    @staticmethod
    def _make_state(perception, target, params) -> "ImageLocalizationState":
        return ImageLocalizationState(
            perception=perception,
            target=target,
            target_glimpse=ImagePerceptionEngine.get_glimpse(
                perception, target, params
            ),
        )

    def _observe(self, state: ImageLocalizationState, params):
        obs = ImagePerceptionEngine.observe(state.perception, params)
        obs["target_glimpse"] = state.target_glimpse
        return obs

    def reset_env(self, key, params):
        k_reset, k_target = jax.random.split(key)
        perception = ImagePerceptionEngine.reset(k_reset, params)
        target = ImagePerceptionEngine.sample_unique_glimpse_position(
            k_target, perception, params
        )
        state = self._make_state(perception, target, params)
        return self._observe(state, params), state, ImagePerceptionEngine.info(perception)

    def autoreset_env(self, key, old_state, params):
        """Mid-run reset: uniform target instead of the unique sampler."""
        k_reset, k_target = jax.random.split(key)
        perception = ImagePerceptionEngine.reset(k_reset, params)
        target = jax.random.uniform(k_target, (2,), minval=-1.0, maxval=1.0).astype(
            jnp.float32
        )
        state = self._make_state(perception, target, params)
        return self._observe(state, params), state, ImagePerceptionEngine.info(perception)

    def step_env(self, key, state, action, prediction, params) -> APStepResult:
        perception, base_reward, terminated = ImagePerceptionEngine.move(
            state.perception, action, params
        )
        new_state = state.replace(perception=perception)
        return APStepResult(
            obs=self._observe(new_state, params),
            state=new_state,
            base_reward=base_reward,
            terminated=terminated,
            truncated=jnp.zeros((), dtype=jnp.bool_),
            info=ImagePerceptionEngine.info(perception),
            prediction_target=state.target,
        )

    def prediction_target_on_reset(self, old_state, new_state, params):
        """The loss on the autoreset step is against the previous episode's
        target (image_localization.py:151-152)."""
        return old_state.target
