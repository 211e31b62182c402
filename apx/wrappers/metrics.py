"""Episode-metric log wrappers (vector-level, fixed-shape).

Behavioral reference:
  * classification: /root/reference/ap_gym/active_classification_env.py:116-197
    — per-step ``correct_label_prob`` = softmax(prediction)[target]; on done,
    ``accuracy`` = prob > 1/K per step, ``first_correct``/``last_incorrect``
    step indices with validity flags.
  * regression: /root/reference/ap_gym/active_regression_env.py:160-227
    — per-step ``euclidean_distance`` and ``mse`` vs the loss target.
  * aggregation: util.py:40-83 — ``info["stats"]["scalar"]`` carries
    ``avg_*``/``final_*`` (NaN for not-done envs) plus Gymnasium-style
    ``_key`` validity masks equal to the done vector.

TPU-native design: the reference's variable-length per-env Python deques
become (num_envs, buffer_len) ring buffers with a per-env step count; all
aggregates are masked reductions computed every step and gated by the done
mask, so the wrapper is jit/scan-compatible with zero host sync. The ragged
``stats.vector`` lists are exposed as the raw buffer + ``vector_lengths``
(the gymnasium compat layer re-slices them into per-episode lists).

Metrics are recorded for the step that *completes* an episode and the
buffer is cleared on the following (autoreset) step without recording,
matching the reference's clear-then-skip behavior (:153-161).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..core.env import VectorAPEnv

__all__ = [
    "ClassificationMetrics",
    "RegressionMetrics",
    "MetricsState",
]


class MetricsState(struct.PyTreeNode):
    inner: Any
    buf: dict[str, jax.Array]  # name -> (N, L) f32
    count: jax.Array  # (N,) int32 — valid entries per env
    prev_done: jax.Array  # (N,) bool


@dataclasses.dataclass(frozen=True)
class _MetricsWrapper:
    """Shared machinery; subclasses define the per-step metric dict."""

    venv: VectorAPEnv
    buffer_len: int

    @property
    def num_envs(self) -> int:
        return self.venv.num_envs

    @property
    def env(self):
        return self.venv.env

    @property
    def autoreset(self):
        """Delegated so the episodic LOCKSTEP rollout recognizes
        metrics-wrapped envs (core.env.with_autoreset recurses the
        DISABLED-inner replace through the `venv` field)."""
        return self.venv.autoreset

    def _metric_names(self) -> tuple[str, ...]:
        raise NotImplementedError

    def _step_metrics(self, full_action, info, params) -> dict[str, jax.Array]:
        raise NotImplementedError

    def _extra_stats(self, buf, valid, count, done, params) -> dict[str, jax.Array]:
        return {}

    # ------------------------------------------------------------------
    def reset(self, key: jax.Array, params):
        obs, inner, info = self.venv.reset(key, params)
        n, L = self.venv.num_envs, self.buffer_len
        state = MetricsState(
            inner=inner,
            buf={m: jnp.zeros((n, L), jnp.float32) for m in self._metric_names()},
            count=jnp.zeros((n,), jnp.int32),
            prev_done=jnp.zeros((n,), jnp.bool_),
        )
        return obs, state, info

    def step(self, key: jax.Array, state: MetricsState, full_action, params):
        out = self.venv.step(key, state.inner, full_action, params)
        return self._book(state, out, full_action, params)

    def boundary_reset_step(
        self, key: jax.Array, state: MetricsState, full_action, params
    ):
        """LOCKSTEP boundary step (see VectorAPEnv.boundary_reset_step):
        the bookkeeping is already mask-based — at a boundary prev_done is
        all True, so _book clears the ring without recording, exactly the
        reference's clear-then-skip autoreset behavior (module docstring).
        Lets metrics-wrapped envs ride the episodic rollout; pinned
        episodic-vs-scan in test_registry."""
        out = self.venv.boundary_reset_step(key, state.inner, full_action, params)
        return self._book(state, out, full_action, params)

    def _book(self, state: MetricsState, out, full_action, params):
        obs, inner2, reward, term, trunc, info = out
        n, L = self.venv.num_envs, self.buffer_len
        vals = self._step_metrics(full_action, info, params)

        # Clear on autoreset step (no record); otherwise append at `count`.
        count0 = jnp.where(state.prev_done, 0, state.count)
        record = ~state.prev_done
        slot = jnp.clip(count0, 0, L - 1)
        onehot = jax.nn.one_hot(slot, L, dtype=jnp.float32) * record[:, None]
        buf = {
            m: state.buf[m] * (1.0 - onehot) + onehot * vals[m][:, None]
            for m in self._metric_names()
        }
        count = count0 + record.astype(jnp.int32)

        done = term | trunc
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (n, L), 1) < count[:, None]
        )
        stats = self._aggregate(buf, valid, count, done, params)
        info = {**info, "stats": stats}

        new_state = MetricsState(inner=inner2, buf=buf, count=count, prev_done=done)
        return obs, new_state, reward, term, trunc, info

    @staticmethod
    def _pick(buf_m, idx):
        """Gather-free per-row pick: one-hot select-reduce over the ring
        axis instead of take_along_axis — per-env gathers serialize inside
        the step scan on TPU (the same measured verdict as the CE loss's
        label pick, PERF.md round 5); the select-reduce fuses."""
        L = buf_m.shape[-1]
        onehot = jnp.arange(L, dtype=jnp.int32) == idx[:, None]
        return jnp.sum(jnp.where(onehot, buf_m, 0.0), axis=-1)

    def _aggregate(self, buf, valid, count, done, params):
        nanv = jnp.float32(jnp.nan)
        denom = jnp.maximum(count, 1).astype(jnp.float32)
        scalar: dict[str, jax.Array] = {}
        for m in buf:
            v = buf[m] * valid
            avg = v.sum(axis=-1) / denom
            final = self._pick(buf[m], jnp.maximum(count - 1, 0))
            scalar[f"avg_{m}"] = jnp.where(done, avg, nanv)
            scalar[f"_avg_{m}"] = done
            scalar[f"final_{m}"] = jnp.where(done, final, nanv)
            scalar[f"_final_{m}"] = done
        scalar.update(self._extra_stats(buf, valid, count, done, params))
        vector = {m: buf[m] for m in buf}
        vector.update({f"_{m}": done for m in buf})
        return {
            "scalar": scalar,
            "_scalar": done,
            "vector": vector,
            "_vector": done,
            "vector_lengths": count,
        }


@dataclasses.dataclass(frozen=True)
class RegressionMetrics(_MetricsWrapper):
    def _metric_names(self):
        return ("euclidean_distance", "mse")

    def _step_metrics(self, full_action, info, params):
        target = info["prediction"]["target"]
        if isinstance(target, dict):  # sparsified: {"target", "weight"}
            target = target["target"]
        pred = full_action["prediction"]
        diff = target - pred
        return {
            "euclidean_distance": jnp.linalg.norm(diff, axis=-1),
            "mse": jnp.mean(jnp.square(diff), axis=-1),
        }


@dataclasses.dataclass(frozen=True)
class ClassificationMetrics(_MetricsWrapper):
    def _metric_names(self):
        return ("correct_label_prob",)

    def _num_classes(self, params) -> int:
        return self.venv.env.prediction_space(params).shape[-1]

    def _step_metrics(self, full_action, info, params):
        target = info["prediction"]["target"]
        if isinstance(target, dict):
            target = target["target"]
        p = jax.nn.softmax(full_action["prediction"], axis=-1)
        onehot = (
            jnp.arange(p.shape[-1], dtype=jnp.int32)
            == target[:, None].astype(jnp.int32)
        )
        prob = jnp.sum(jnp.where(onehot, p, 0.0), axis=-1)
        return {"correct_label_prob": prob}

    def _extra_stats(self, buf, valid, count, done, params):
        k = self._num_classes(params)
        n, L = buf["correct_label_prob"].shape
        nanv = jnp.float32(jnp.nan)
        is_correct = (buf["correct_label_prob"] > 1.0 / k) & valid
        acc = is_correct.sum(axis=-1) / jnp.maximum(count, 1)
        final_correct = (
            self._pick(buf["correct_label_prob"], jnp.maximum(count - 1, 0))
            > 1.0 / k
        )
        steps = jax.lax.broadcasted_iota(jnp.int32, (n, L), 1)
        first_correct = jnp.min(
            jnp.where(is_correct, steps, jnp.int32(2**30)), axis=-1
        )
        any_correct = is_correct.any(axis=-1)
        incorrect = valid & ~is_correct
        last_incorrect = jnp.max(jnp.where(incorrect, steps, -1), axis=-1)
        any_incorrect = incorrect.any(axis=-1)
        return {
            "avg_accuracy": jnp.where(done, acc.astype(jnp.float32), nanv),
            "_avg_accuracy": done,
            "final_accuracy": jnp.where(done, final_correct.astype(jnp.float32), nanv),
            "_final_accuracy": done,
            "first_correct": jnp.where(any_correct, first_correct, -1).astype(
                jnp.int32
            ),
            "_first_correct": done & any_correct,
            "last_incorrect": last_incorrect.astype(jnp.int32),
            "_last_incorrect": done & any_incorrect,
        }
