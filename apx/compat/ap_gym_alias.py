"""Make ``import ap_gym`` resolve to the apx compat layer.

Lets scripts written against the reference (e.g. its example/*.py) run
unmodified on apx:

    import apx.compat.ap_gym_alias  # installs the alias
    import ap_gym
    env = ap_gym.make("CircleSquare-v0")

The alias exposes the reference's FULL ``__init__`` export list
(/root/reference/ap_gym/__init__.py:1-47): make/make_vec/register, the
env base classes (subclassable, with the reference's step templates), the
ensure/restore/pseudo machinery, wrapper classes (TimeLimit, Sparsify,
VectorToSingle, log wrappers), ImageSpace/LogitSpace, and the loss-class
hierarchy — all backed by apx implementations.
"""

from __future__ import annotations

import sys
import types

__all__ = ["install"]


def _build_loss_classes():
    from ..core import losses as L
    from .loss_adapter import CompatLossFn

    class LossFn(CompatLossFn):
        """Reference-shaped base (loss_fn.py:25-83); constructible from an
        apx loss for subclass-style use."""

    class CrossEntropyLossFn(CompatLossFn):
        def __init__(self, num_classes: int | None = None):
            super().__init__(L.CrossEntropyLossFn(num_classes=num_classes))

    class MSELossFn(CompatLossFn):
        def __init__(self, target_std=None):
            super().__init__(L.MSELossFn(target_std=target_std))

    class ZeroLossFn(CompatLossFn):
        def __init__(self):
            super().__init__(L.ZeroLossFn())

    class WeightedLossFn(CompatLossFn):
        def __init__(self, inner):
            if isinstance(inner, CompatLossFn):
                inner = inner.inner
            super().__init__(L.WeightedLossFn(inner=inner))

    class LambdaLossFn(CompatLossFn):
        """User callables with the reference signature
        fn(prediction, target, batch_shape) (loss_fn.py:140-181)."""

        def __init__(
            self,
            np=None,
            torch=None,
            jax=None,
            lower_bound=float("-inf"),
            blind_guessing_expected_value=None,
        ):
            self._np_fn, self._torch_fn, self._jax_fn = np, torch, jax
            super().__init__(
                L.LambdaLossFn(
                    jax_fn=(lambda p, t: jax(p, t, ())) if jax else None,
                    numpy_fn=(lambda p, t: np(p, t, ())) if np else None,
                    torch_fn=(lambda p, t: torch(p, t, ())) if torch else None,
                    lower_bound_value=lower_bound,
                    blind_guess_value=blind_guessing_expected_value,
                )
            )

        def numpy(self, prediction, target, batch_shape=()):
            if self._np_fn is None:
                raise NotImplementedError
            return self._np_fn(prediction, target, batch_shape)

        def jax(self, prediction, target, batch_shape=()):
            if self._jax_fn is None:
                raise NotImplementedError
            return self._jax_fn(prediction, target, batch_shape)

        def torch(self, prediction, target, batch_shape=()):
            if self._torch_fn is None:
                raise NotImplementedError
            return self._torch_fn(prediction, target, batch_shape)

    class LossFnAffineTransformation(CompatLossFn):
        def __init__(self, inner, scale=1.0, offset=0.0):
            if isinstance(inner, CompatLossFn):
                inner = inner.inner
            super().__init__(L.AffineLossFn(inner=inner, scale=scale, offset=offset))

    return {
        "LossFn": LossFn,
        "CrossEntropyLossFn": CrossEntropyLossFn,
        "MSELossFn": MSELossFn,
        "ZeroLossFn": ZeroLossFn,
        "WeightedLossFn": WeightedLossFn,
        "LambdaLossFn": LambdaLossFn,
        "LossFnAffineTransformation": LossFnAffineTransformation,
    }


def _make_user_registry(apc, gym_classes):
    """Minimal user-facing register/make machinery mirroring
    registration.py:87-142: custom entry points become AP envs via
    ensure_*, and every id gets a '<name minus -v*>-sparse-v*' twin."""
    user_registry: dict[str, dict] = {}

    def register(id: str, entry_point=None, kwargs=None, additional_wrappers=(), **_):
        user_registry[id] = {
            "entry_point": entry_point,
            "kwargs": dict(kwargs or {}),
            "wrappers": tuple(additional_wrappers),
        }

    def _build_user(spec, extra_kwargs):
        env = spec["entry_point"](**{**spec["kwargs"], **extra_kwargs})
        for w in spec["wrappers"]:
            # gymnasium WrapperSpec-alikes: resolve by terminal class name
            # against the alias surface (TimeLimit etc.).
            name = getattr(w, "name", None)
            wkw = dict(getattr(w, "kwargs", {}) or {})
            cls = getattr(sys.modules.get("ap_gym"), name, None) if name else None
            if cls is None:
                raise ValueError(f"Cannot resolve wrapper spec {w!r}")
            env = cls(env, **wkw)
        return env

    def make(env_id: str, **kwargs):
        if env_id in user_registry:
            env = _build_user(user_registry[env_id], kwargs)
            return gym_classes.ensure_active_perception_env(env)
        if env_id.endswith("-sparse-v0") and (
            env_id.replace("-sparse", "") in user_registry
        ):
            env = _build_user(user_registry[env_id.replace("-sparse", "")], kwargs)
            return gym_classes.SparsifyWrapper(env)
        return apc.make(env_id, **kwargs)

    def make_vec(env_id: str, num_envs: int = 1, **kwargs):
        if env_id in user_registry:
            import gymnasium as gym

            spec = user_registry[env_id]
            env = gym.vector.SyncVectorEnv(
                [lambda: _build_user(spec, kwargs) for _ in range(num_envs)]
            )
            return gym_classes.ensure_active_perception_vector_env(env)
        return apc.make_vec(env_id, num_envs=num_envs, **kwargs)

    return register, make, make_vec


def install(name: str = "ap_gym") -> types.ModuleType:
    import apx.compat as apc
    from . import gym_classes as G
    from .log import (
        ClassificationLogWrapper,
        RegressionLogWrapper,
        VectorClassificationLogWrapper,
        VectorRegressionLogWrapper,
    )

    mod = types.ModuleType(name)
    register, make, make_vec = _make_user_registry(apc, G)
    mod.make = make
    mod.make_vec = make_vec
    mod.register = register
    mod.register_envs = lambda: None  # the apx registry is always loaded

    # Core API classes (active_perception_env.py / ..._vector_env.py).
    for cls_name in (
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
    ):
        setattr(mod, cls_name, getattr(G, cls_name))

    # Log wrappers under the reference names.
    mod.ActiveClassificationLogWrapper = ClassificationLogWrapper
    mod.ActiveRegressionLogWrapper = RegressionLogWrapper
    mod.ActiveClassificationVectorLogWrapper = VectorClassificationLogWrapper
    mod.ActiveRegressionVectorLogWrapper = VectorRegressionLogWrapper

    for k, v in _build_loss_classes().items():
        setattr(mod, k, v)

    def idoc(obj, doc):  # util.py:89-91
        try:
            obj.__idoc__ = doc
        except AttributeError:
            pass
        return obj

    mod.idoc = idoc
    mod.__apx_alias__ = True  # lets tooling tell the alias from the real thing
    sys.modules[name] = mod
    return mod


if "ap_gym" not in sys.modules:
    install()
