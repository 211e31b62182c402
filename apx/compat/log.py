"""Host-side episode-metric log wrappers for the compat layer.

Output-compatible with the reference wrappers:
  * ActiveClassificationLogWrapper / ...VectorLogWrapper
    (active_classification_env.py:68-197): per-step correct_label_prob,
    episode-end accuracy/first_correct/last_incorrect,
  * ActiveRegressionLogWrapper / ...VectorLogWrapper
    (active_regression_env.py:113-227): per-step euclidean_distance/mse,
  * aggregation contract of util.py:18-83 (info["stats"]["scalar"/"vector"]
    with avg_*/final_* and Gymnasium ``_key`` validity masks).

This is deliberate host glue (it mirrors the reference's own host-side
bookkeeping); the TPU-native path uses apx.wrappers.metrics instead.
"""

from __future__ import annotations

import gymnasium as gym
import numpy as np
import scipy.special

__all__ = [
    "ClassificationLogWrapper",
    "RegressionLogWrapper",
    "VectorClassificationLogWrapper",
    "VectorRegressionLogWrapper",
]


def _merge_stats(info, metrics):
    """Single-env merge (util.py:18-37)."""
    scalar = {}
    vector = {}
    for name, series in metrics.items():
        scalar[f"avg_{name}"] = float(np.mean(series))
        scalar[f"final_{name}"] = float(series[-1])
        vector[name] = list(series)
    stats = dict(info.get("stats", {}))
    stats.setdefault("scalar", {}).update(scalar)
    stats.setdefault("vector", {}).update(vector)
    return {**info, "stats": stats}


def _merge_stats_vec(info, metrics, done):
    """Vector merge with _key validity masks (util.py:40-83)."""
    scalar, vector = {}, {}
    for name, series in metrics.items():
        scalar[f"final_{name}"] = np.array(
            [e[-1] if t and len(e) else np.nan for t, e in zip(done, series)],
            dtype=np.float32,
        )
        scalar[f"_final_{name}"] = done
        scalar[f"avg_{name}"] = np.array(
            [np.mean(e) if t and len(e) else np.nan for t, e in zip(done, series)],
            dtype=np.float32,
        )
        scalar[f"_avg_{name}"] = done
        arr = np.array(
            [(list(e) if t else []) for e, t in zip(series, done)] + [None],
            dtype=object,
        )[:-1]
        vector[name] = arr
        vector[f"_{name}"] = done
    stats = dict(info.get("stats", {}))
    stats.setdefault("scalar", {}).update(scalar)
    stats["_scalar"] = done
    stats.setdefault("vector", {}).update(vector)
    stats["_vector"] = done
    return {**info, "stats": stats}


class _Delegate(gym.Env):
    """Delegating wrapper base. A real gym.Env subclass so foreign gym
    wrappers accept log-wrapped compat envs; attributes gym.Env defines on
    the class (metadata/render_mode/spec) are delegated explicitly since
    __getattr__ only fires for missing names."""

    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    @property
    def metadata(self):
        return self.env.metadata

    @metadata.setter
    def metadata(self, value):
        self.env.metadata = value

    @property
    def render_mode(self):
        return getattr(self.env, "render_mode", None)

    @property
    def spec(self):
        return getattr(self.env, "spec", None)

    @property
    def unwrapped(self):
        return self.env.unwrapped if hasattr(self.env, "unwrapped") else self.env

    def render(self):
        return self.env.render()

    def close(self):
        return self.env.close()


class ClassificationLogWrapper(_Delegate):
    def reset(self, **kwargs):
        self._probs: list[float] = []
        return self.env.reset(**kwargs)

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        target = info["prediction"]["target"]
        if isinstance(target, dict):
            target = target["target"]
        self._probs.append(
            float(scipy.special.softmax(np.asarray(action["prediction"]))[int(target)])
        )
        if terminated or truncated:
            k = self.env.prediction_space.shape[-1]
            probs = np.array(self._probs, dtype=np.float32)
            is_correct = probs > 1 / k
            metrics = {
                "correct_label_prob": probs,
                "accuracy": is_correct.astype(np.float32),
            }
            info = _merge_stats(info, metrics)
            where_c = np.where(is_correct)[0]
            if len(where_c):
                info["stats"]["scalar"]["first_correct"] = where_c[0]
            where_i = np.where(~is_correct)[0]
            if len(where_i):
                info["stats"]["scalar"]["last_incorrect"] = where_i[-1]
        return obs, reward, terminated, truncated, info


class RegressionLogWrapper(_Delegate):
    def reset(self, **kwargs):
        self._dist: list[float] = []
        self._mse: list[float] = []
        return self.env.reset(**kwargs)

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        target = info["prediction"]["target"]
        if isinstance(target, dict):
            target = target["target"]
        pred = np.asarray(action["prediction"])
        t = np.asarray(target)
        self._dist.append(float(np.linalg.norm(t - pred)))
        self._mse.append(float(np.mean((t - pred) ** 2)))
        if terminated or truncated:
            info = _merge_stats(
                info, {"euclidean_distance": self._dist, "mse": self._mse}
            )
        return obs, reward, terminated, truncated, info


class _VectorLogBase(_Delegate):
    _names: tuple[str, ...] = ()

    def reset(self, **kwargs):
        n = self.env.num_envs
        self._series = {m: [[] for _ in range(n)] for m in self._names}
        self._prev_done = np.zeros(n, dtype=bool)
        return self.env.reset(**kwargs)

    def _values(self, action, info):
        raise NotImplementedError

    def _extra(self, info, done):
        return info

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        # On an all-reset step no sub-env produced step info (gymnasium
        # emits only the reset infos — no "prediction" key), and every
        # series is cleared below, so there is nothing to evaluate.
        vals = None if self._prev_done.all() else self._values(action, info)
        for i in range(self.env.num_envs):
            for m in self._names:
                if self._prev_done[i]:
                    self._series[m][i].clear()
                else:
                    self._series[m][i].append(vals[m][i])
        self._prev_done = np.asarray(terminated) | np.asarray(truncated)
        if self._prev_done.any():
            info = self._emit(info, self._prev_done)
        return obs, reward, terminated, truncated, info

    def _emit(self, info, done):
        return _merge_stats_vec(info, self._series, done)


class VectorRegressionLogWrapper(_VectorLogBase):
    _names = ("euclidean_distance", "mse")

    def _values(self, action, info):
        target = info["prediction"]["target"]
        if isinstance(target, dict):
            target = target["target"]
        pred = np.asarray(action["prediction"])
        t = np.asarray(target)
        return {
            "euclidean_distance": np.linalg.norm(t - pred, axis=-1),
            "mse": np.mean((t - pred) ** 2, axis=-1),
        }


class VectorClassificationLogWrapper(_VectorLogBase):
    _names = ("correct_label_prob",)

    def _values(self, action, info):
        target = info["prediction"]["target"]
        if isinstance(target, dict):
            target = target["target"]
        p = scipy.special.softmax(np.asarray(action["prediction"]), axis=-1)
        idx = np.asarray(target).astype(int)
        return {
            "correct_label_prob": np.take_along_axis(p, idx[:, None], axis=-1)[:, 0]
        }

    def _emit(self, info, done):
        n = self.env.num_envs
        k = self.env.single_prediction_space.shape[-1]
        probs = [
            np.array(e, dtype=np.float32)
            for e in self._series["correct_label_prob"]
        ]
        is_correct = [e > 1 / k for e in probs]
        series = {
            **self._series,
            "accuracy": [c.astype(np.float32) for c in is_correct],
        }
        info = _merge_stats_vec(info, series, done)
        first_correct = np.full(n, -1, dtype=np.int32)
        first_valid = np.zeros(n, dtype=bool)
        last_incorrect = np.full(n, -1, dtype=np.int32)
        last_valid = np.zeros(n, dtype=bool)
        for i in range(n):
            wc = np.where(is_correct[i])[0]
            if len(wc):
                first_correct[i], first_valid[i] = wc[0], True
            wi = np.where(~is_correct[i])[0]
            if len(wi):
                last_incorrect[i], last_valid[i] = wi[-1], True
        info["stats"]["scalar"].update(
            {
                "first_correct": first_correct,
                "_first_correct": first_valid,
                "last_incorrect": last_incorrect,
                "_last_incorrect": last_valid,
            }
        )
        return info
