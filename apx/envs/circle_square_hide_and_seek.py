"""CircleSquare hide-and-seek reward wrapper.

Behavioral reference: /root/reference/ap_gym/envs/circle_square_catch_or_flee.py:19-107.
  * additional reward = sign * ||glimpse_pos - object_pos_norm||, with
    sign = label*2 - 1 (square=0 -> -1 "seek": stay close; circle=1 -> +1
    "flee": stay away),
  * object_pos_norm replicates the reference's quirky mapping
    ``normalize_coords(flip(pos)) - 1`` = (x, y)/sensor_pos_lim - 1
    (:81-86) — NOT the centered glimpse-coordinate transform,
  * the wrapper sits ABOVE the autoreset layer, so on lockstep reset steps
    the additional reward is computed from the NEW episode's object and
    glimpse position and added to the (zero) reset-step reward (:76-94),
  * mask_prediction=True: prediction/target spaces become empty tuples,
    the inner env is stepped with zero logits, the reward is just the
    (augmented) base reward, and — reference quirk — info["prediction"]
    ["loss"] still carries the CE loss of those zero logits (:71-92).

This is a vector-level wrapper over VectorAPEnv, duck-typing its
reset/step so rollout()/jit/vmap pipelines compose unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core.env import VectorAPEnv, VectorState
from ..core.losses import ZeroLossFn
from ..core.spaces import TupleSpace
from ..ops.glimpse import sensor_pos_lim_pixels

__all__ = ["CircleSquareHideAndSeek"]


@dataclasses.dataclass(frozen=True)
class CircleSquareHideAndSeek:
    """Wraps a VectorAPEnv whose inner env is ImageClassificationEnv over a
    single-object CircleSquare bank (index enumeration = mixed radix
    [2, W, H], circle_square_dataset.py:56-71)."""

    venv: VectorAPEnv
    mask_prediction: bool = False

    @property
    def num_envs(self) -> int:
        return self.venv.num_envs

    @property
    def env(self):
        return self.venv.env

    @property
    def autoreset(self):
        """Delegated so the episodic LOCKSTEP rollout (rollout_episodic /
        bench) recognizes the wrapped env; core.env.with_autoreset builds
        the DISABLED inner form by replacing the held venv."""
        return self.venv.autoreset

    def inner_action_space(self, params):
        return self.venv.env.inner_action_space(params)

    def prediction_space(self, params):
        if self.mask_prediction:
            return TupleSpace(())
        return self.venv.env.prediction_space(params)

    def prediction_target_space(self, params):
        if self.mask_prediction:
            return TupleSpace(())
        return self.venv.env.prediction_target_space(params)

    def loss_fn(self, params):
        if self.mask_prediction:
            return ZeroLossFn()
        return self.venv.env.loss_fn(params)

    # ------------------------------------------------------------------
    def _object_pos_norm_and_sign(self, params, indices: jax.Array):
        h, w, _ = params.dataset.image_shape
        label = indices % 2
        rem = indices // 2
        pos_x = (rem % w).astype(jnp.float32)
        pos_y = (rem // w).astype(jnp.float32)
        lim = sensor_pos_lim_pixels((h, w), params.sensor_size, params.sensor_scale)
        # flip((y, x)) / lim - 1 (reference :81-86).
        pos_norm = jnp.stack([pos_x, pos_y], axis=-1) / lim - 1.0
        sign = (label * 2 - 1).astype(jnp.float32)
        return pos_norm, sign

    def _augment(self, params, obs, reward, info):
        pos_norm, sign = self._object_pos_norm_and_sign(params, info["index"])
        distances = jnp.linalg.norm(obs["glimpse_pos"] - pos_norm, axis=-1)
        additional = sign * distances
        base = info["base_reward"] + additional
        if self.mask_prediction:
            new_reward = base
            t = info["prediction"]["target"]
            # Under an inner Sparsify the target is {"target", "weight"}; the
            # reference's sparse HideAndSeek nests the empty tuple inside the
            # weight dict (Sparsify applies outside HideAndSeek there).
            empty = {**t, "target": ()} if isinstance(t, dict) else ()
            prediction_info = {**info["prediction"], "target": empty}
        else:
            new_reward = reward + additional
            prediction_info = info["prediction"]
        return new_reward, {**info, "base_reward": base, "prediction": prediction_info}

    # ------------------------------------------------------------------
    def reset(self, key: jax.Array, params):
        obs, state, info = self.venv.reset(key, params)
        if self.mask_prediction:
            info = {**info, "prediction": {**info.get("prediction", {}), "target": ()}}
        return obs, state, info

    def _inner_action(self, full_action, params):
        if not self.mask_prediction:
            return full_action
        k = self.venv.env.prediction_space(params).shape[-1]
        return {
            "action": full_action["action"],
            "prediction": jnp.zeros((self.num_envs, k), dtype=jnp.float32),
        }

    def step(
        self, key: jax.Array, state: VectorState, full_action: dict[str, Any], params
    ):
        full_action = self._inner_action(full_action, params)
        obs, state2, reward, term, trunc, info = self.venv.step(
            key, state, full_action, params
        )
        reward, info = self._augment(params, obs, reward, info)
        return obs, state2, reward, term, trunc, info

    def boundary_reset_step(
        self, key: jax.Array, state: VectorState, full_action: dict[str, Any], params
    ):
        """LOCKSTEP boundary step (see VectorAPEnv.boundary_reset_step):
        delegate, then apply the same augmentation as step() — the
        reference computes the additional reward from the NEW episode's
        object and glimpse position on reset steps too (module docstring),
        which is exactly what augmenting the post-reset obs/info does.
        Bitwise-pinned vs scanning step() in tests/test_registry.py."""
        full_action = self._inner_action(full_action, params)
        obs, state2, reward, term, trunc, info = self.venv.boundary_reset_step(
            key, state, full_action, params
        )
        reward, info = self._augment(params, obs, reward, info)
        return obs, state2, reward, term, trunc, info
