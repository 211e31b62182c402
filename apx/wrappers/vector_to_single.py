"""Run a 1-env vector pipeline as a single env.

Behavioral reference: /root/reference/ap_gym/vector_to_single_wrapper.py:18-129
(tree-map x -> x[None] on inputs, x -> x[0] on outputs). Needed for
vector-level wrappers like CircleSquareHideAndSeek whose semantics live
above the autoreset layer (the reference builds its single HideAndSeek env
exactly this way, registration.py:482-489).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["VectorToSingle"]


def _squeeze0(tree):
    return jax.tree_util.tree_map(lambda x: x[0], tree)


def _unsqueeze0(tree):
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], tree)


@dataclasses.dataclass(frozen=True)
class VectorToSingle:
    """Wraps any VectorAPEnv-like object with num_envs == 1."""

    vec: Any

    def __post_init__(self):
        assert self.vec.num_envs == 1, "VectorToSingle requires num_envs == 1"

    @property
    def env(self):
        return self.vec.env

    def inner_action_space(self, params):
        return self.vec.inner_action_space(params) if hasattr(
            self.vec, "inner_action_space"
        ) else self.vec.env.inner_action_space(params)

    def prediction_space(self, params):
        src = self.vec if hasattr(self.vec, "prediction_space") else self.vec.env
        return src.prediction_space(params)

    def loss_fn(self, params):
        src = self.vec if hasattr(self.vec, "loss_fn") else self.vec.env
        return src.loss_fn(params)

    def reset(self, key: jax.Array, params):
        obs, state, info = self.vec.reset(key, params)
        return _squeeze0(obs), state, _squeeze0(info)

    def step(self, key: jax.Array, state, full_action: dict[str, Any], params):
        obs, state2, reward, term, trunc, info = self.vec.step(
            key, state, _unsqueeze0(full_action), params
        )
        return (
            _squeeze0(obs),
            state2,
            reward[0],
            term[0],
            trunc[0],
            _squeeze0(info),
        )
