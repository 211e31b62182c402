"""Gymnasium-API adapter over the functional apx envs.

Drop-in equivalents of the reference's env objects
(active_perception_env.py:90-121, active_perception_vector_env.py:69-111,
vector_to_single_wrapper.py:18-129): numpy in/out, the same step info
contract, and — in ``rng="reference"`` mode — the reference's exact NumPy
PCG64 draw chains (see shims.py), so seeded episodes match the reference
bitwise in all integer/boolean channels and to f32 tolerance in float ones.

Loss composition happens on host with ``loss_fn.numpy`` exactly like the
reference's step() template; device code produces observations, dynamics
and the prediction target.
"""

from __future__ import annotations

from typing import Any

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from ..core.env import APEnv
from ..core.losses import WeightedLossFn
from ..wrappers.base import APWrapper
from .builders import apply_step_draws, reset_from_draws
from .shims import make_shim
from .spaces import to_gym_action_space, to_gym_space

__all__ = ["GymVectorAPEnv", "GymAPEnv"]


def _np_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _cast_env_info(info: dict) -> dict:
    """Device env infos use uint32 for dataset indices (x64 is off on
    device); the reference emits NumPy int64 — cast on the way out."""
    out = {}
    for k, v in info.items():
        if isinstance(v, np.ndarray) and v.dtype == np.uint32:
            v = v.astype(np.int64)
        out[k] = v
    return out


def _squeeze_tree(tree):
    return jax.tree_util.tree_map(lambda x: x[0], tree)


class GymVectorAPEnv(gym.vector.VectorEnv):
    """Vectorized gymnasium-style adapter: a real gym.vector.VectorEnv
    subclass (foreign wrappers isinstance-check it) exposing the
    reference's loss_fn/prediction spaces."""

    metadata = {
        "autoreset_mode": "NextStep",
        "render_modes": ["rgb_array"],
        "render_fps": 4,
    }
    render_mode = "rgb_array"

    def __init__(
        self,
        env: APEnv,
        params,
        num_envs: int,
        autoreset: str = "lockstep",  # "lockstep" | "next_step" | "none"
        rng: str = "reference",  # "reference" | "native"
        sparse: bool = False,
        info_mode: str | None = None,  # "update" | "replace" | None (auto)
        key_impl: str | None = None,  # None (threefry) | "rbg" | "unsafe_rbg"
    ):
        assert autoreset in ("lockstep", "next_step", "none")
        assert rng in ("reference", "native")
        if key_impl is not None and rng == "reference":
            # Parity mode's episode randomness is the reference's host NumPy
            # PCG64 chain, and its golden pins assume threefry for the few
            # internal jax keys — a hardware-RNG key impl has no meaning
            # there. rng="native" is the opt-in surface (docs/
            # advanced_usage.md: rbg measured +5% lidar/circle_square, +23%
            # light_dark on v5e; trajectories differ from threefry's).
            raise ValueError(
                "key_impl requires rng='native': rng='reference' parity mode "
                "pins the reference draw chain (threefry internals)"
            )
        self.key_impl = key_impl
        # Reference info asymmetry: the native vector step template UPDATES
        # the env's info dict (active_perception_vector_env.py:84-111) while
        # the single-env template REPLACES it with a fresh
        # {base_reward, prediction} dict (active_perception_env.py:101-121).
        # Lockstep families are native vector envs (update); LightDark/LIDAR
        # run as singles or SyncVectorEnv-over-singles (replace) — their
        # custom info keys (e.g. map_idx) appear only in reset info.
        self.info_mode = (
            info_mode
            if info_mode is not None
            else ("update" if autoreset == "lockstep" else "replace")
        )
        assert self.info_mode in ("update", "replace")
        self.env = env
        self.params = params
        self.num_envs = num_envs
        self.autoreset = autoreset
        self.rng = rng
        self.sparse = sparse

        base = env
        while isinstance(base, APWrapper):
            base = base.env
        self.base = base
        self.shim = make_shim(base, params, num_envs) if rng == "reference" else None
        if self.shim is None:
            self.rng = "native"
        if self.rng == "reference" and getattr(params, "use_beam_tables", False):
            # Parity mode injects host-generated episode maps that are NOT
            # in the bank, so bank-indexed beam tables must not be used.
            params = params.replace(use_beam_tables=False)
            self.params = params
        if (
            self.rng == "reference"
            and getattr(params, "glimpse_precision", "highest") != "highest"
        ):
            # Parity mode pins exact-f32 glimpses: the fast default (one
            # bf16 MXU pass, PERF.md round 3) would put ~5e-3 on TPU
            # observations vs the reference. No-op on CPU either way.
            params = params.replace(glimpse_precision="highest")
            self.params = params

        self._dense_loss = env.loss_fn(params)
        self._loss = WeightedLossFn(inner=self._dense_loss) if sparse else self._dense_loss

        self._np_random: np.random.Generator | None = None
        self._key: jax.Array | None = None
        self._state = None
        self._prev_done = np.zeros(num_envs, dtype=bool)
        from ..render import RenderTracker

        self._tracker = RenderTracker()

        # Spaces (reference naming: single_* and batched).
        self.single_observation_space = to_gym_space(env.observation_space(params))
        self.single_action_space = to_gym_action_space(env, params)
        self.single_inner_action_space = to_gym_space(env.inner_action_space(params))
        self.single_prediction_space = to_gym_space(env.prediction_space(params))
        self.single_prediction_target_space = to_gym_space(
            env.prediction_target_space(params)
        )
        self.observation_space = gym.vector.utils.batch_space(
            self.single_observation_space, num_envs
        )
        self.action_space = gym.vector.utils.batch_space(
            self.single_action_space, num_envs
        )
        # Batched accessors, like BaseActivePerceptionVectorEnv's properties
        # (active_perception_vector_env.py:52-66).
        self.inner_action_space = self.action_space["action"]
        self.prediction_space = self.action_space["prediction"]
        self.prediction_target_space = gym.vector.utils.batch_space(
            self.single_prediction_target_space, num_envs
        )

        # ---- jitted device functions ----------------------------------
        # params is threaded through jit as an ARGUMENT (bound by the
        # lambdas below), never a closure constant: closed-over arrays are
        # baked into the compile payload, which duplicates GB-scale dataset
        # banks into executables (and overflows the axon relay's
        # remote-compile transport).
        n = num_envs
        params = jax.device_put(params)

        # Wire codec: loss-free re-encoding of obs leaves for the
        # device->host transfer (apx/compat/wire.py — e.g. the LIDAR map
        # channel crosses as packed bits, 32x smaller). encode runs inside
        # every jit below; _wire_decode inverts it bitwise on the host side
        # of step()/reset().
        from .wire import wire_codec_for

        _codec = wire_codec_for(self.base, self.params)
        _enc = _codec[0] if _codec else (lambda o: o)
        self._wire_decode = _codec[1] if _codec else None

        def merge_derived(obs, state, params):
            # Derived obs entries (APEnv.obs_derived_from_state — e.g.
            # LIDAR's map channel) are omitted from raw step/reset obs;
            # every obs leaving a jit boundary here must be complete.
            d = jax.vmap(
                lambda s: env.obs_derived_from_state(s, params)
            )(state)
            return {**obs, **d} if d else obs

        def jit_reset_native(key, params):
            keys = jax.random.split(key, n)
            obs, state, info = jax.vmap(env.reset_env, in_axes=(0, None))(
                keys, params
            )
            return _enc(merge_derived(obs, state, params)), state, info

        def jit_reset_draws(draws, params):
            obs, state, info = reset_from_draws(env, draws, params)
            return _enc(obs), state, info

        def jit_raw_step(key, state, action, prediction, step_draws, params):
            keys = jax.random.split(key, n)
            r = jax.vmap(env.step_env, in_axes=(0, 0, 0, 0, None))(
                keys, state, action, prediction, params
            )
            r = apply_step_draws(env, r, step_draws, params)
            return r.replace(obs=_enc(merge_derived(r.obs, r.state, params)))

        def jit_target_on_reset(old_state, new_state, params):
            return jax.vmap(
                lambda o, s: env.prediction_target_on_reset(o, s, params)
            )(old_state, new_state)

        def jit_autoreset_native(key, old_state, params):
            keys = jax.random.split(key, n)
            obs, state, info = jax.vmap(env.autoreset_env, in_axes=(0, 0, None))(
                keys, old_state, params
            )
            return _enc(merge_derived(obs, state, params)), state, info

        jit_reset_native = jax.jit(jit_reset_native)
        jit_reset_draws = jax.jit(jit_reset_draws)
        jit_raw_step = jax.jit(jit_raw_step)
        jit_target_on_reset = jax.jit(jit_target_on_reset)
        jit_autoreset_native = jax.jit(jit_autoreset_native)

        @jax.jit
        def jit_merge(mask, reset_triple, raw):
            def sel(a, b):
                return jax.tree_util.tree_map(
                    lambda x, y: jnp.where(
                        mask.reshape(mask.shape + (1,) * (x.ndim - 1)), x, y
                    ),
                    a,
                    b,
                )

            robs, rstate, rinfo = reset_triple
            obs = sel(robs, raw.obs)
            state = sel(rstate, raw.state)
            if set(rinfo) != set(raw.info):
                # Key sets are static at trace time, so an env-author bug
                # fails loudly here instead of silently dropping reset info.
                raise ValueError(
                    "autoreset info keys differ from step info keys: "
                    f"{sorted(rinfo)} vs {sorted(raw.info)}"
                )
            info = sel(rinfo, raw.info)
            base_reward = jnp.where(mask, 0.0, raw.base_reward)
            term = jnp.where(mask, False, raw.terminated)
            trunc = jnp.where(mask, False, raw.truncated)
            return obs, state, base_reward, term, trunc, info

        self._jit_reset_native = lambda key: jit_reset_native(key, params)
        self._jit_reset_draws = lambda draws: jit_reset_draws(draws, params)
        self._jit_raw_step = lambda *a: jit_raw_step(*a, params)
        self._jit_target_on_reset = lambda o, s: jit_target_on_reset(o, s, params)
        self._jit_autoreset_native = lambda k, s: jit_autoreset_native(k, s, params)
        self._jit_merge = jit_merge

    # ------------------------------------------------------------------
    @property
    def loss_fn(self):
        # Cached: the reference stores loss_fn as an attribute, so repeated
        # accesses are identity-stable (user code compares/holds it).
        if getattr(self, "_compat_loss", None) is None:
            from .loss_adapter import CompatLossFn

            self._compat_loss = CompatLossFn(self._loss)
        return self._compat_loss

    def _ensure_rng(self, seed):
        if seed is not None or (self._np_random is None and self._key is None):
            if self.rng == "reference":
                from gymnasium.utils import seeding

                if self.autoreset == "next_step" and hasattr(
                    self.shim, "seed_vector"
                ):
                    # SyncVectorEnv semantics: sub-env i is seeded seed+i
                    # and draws from its own stream (SURVEY §3.5).
                    rngs = [
                        seeding.np_random(None if seed is None else seed + i)[0]
                        for i in range(self.num_envs)
                    ]
                    self._np_random = rngs[0]
                    self.shim.seed_vector(rngs)
                else:
                    self._np_random, _ = seeding.np_random(seed)
                    self.shim.seed(self._np_random)
            else:
                seed_val = 0 if seed is None else seed
                self._key = (
                    jax.random.key(seed_val, impl=self.key_impl)
                    if self.key_impl
                    else jax.random.PRNGKey(seed_val)
                )

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def reset(self, *, seed: int | None = None, options: dict | None = None):
        self._ensure_rng(seed)
        if self.rng == "reference":
            draws = self.shim.reset_draws()
            obs, state, info = self._jit_reset_draws(draws)
        else:
            obs, state, info = self._jit_reset_native(self._next_key())
        self._state = state
        self._prev_done = np.zeros(self.num_envs, dtype=bool)
        obs_np = _np_tree(obs)
        if self._wire_decode is not None:
            obs_np = self._wire_decode(obs_np)
        from .builders import unwrap_state
        from .render_hooks import update_tracker_reset

        update_tracker_reset(
            self._tracker, self.base, self.params, obs_np, unwrap_state(state)
        )
        return obs_np, _cast_env_info(_np_tree(info))

    # ------------------------------------------------------------------
    def _compose(self, pred, base_reward, term, trunc, info, target, reset_mask):
        """Host loss composition mirroring active_perception_vector_env.py:
        84-111 (+ Sparsify's recomputation, sparsify_wrapper.py:74-88)."""
        base_reward = np.asarray(base_reward, dtype=np.float64)
        target_np = _np_tree(target)
        dense = self._dense_loss.numpy(np.asarray(pred), target_np)
        if self.sparse:
            weight = np.asarray(term, dtype=np.float32)
            wrapped_target = {"target": target_np, "weight": weight}
            loss_for_reward = dense * weight
            info_target = wrapped_target
        else:
            loss_for_reward = dense
            info_target = target_np
        if reset_mask is not None and self.autoreset == "next_step":
            loss_for_reward = np.where(reset_mask, 0.0, loss_for_reward)
            dense = np.where(reset_mask, 0.0, dense)
            base_reward = np.where(reset_mask, 0.0, base_reward)
        reward = base_reward - loss_for_reward
        env_info = _cast_env_info(_np_tree(info))
        if self.info_mode == "replace":
            # Single-env template semantics: _step's info keys are dropped
            # from step infos; under NEXT_STEP vectorization they re-enter
            # only as the resetting sub-envs' reset info (SyncVectorEnv
            # masked aggregation: zero fill + `_key` validity mask).
            extra = {}
            if reset_mask is not None and reset_mask.any():
                for k, v in env_info.items():
                    m = reset_mask.reshape((-1,) + (1,) * (np.ndim(v) - 1))
                    extra[k] = np.where(m, v, np.zeros_like(v))
                    extra["_" + k] = reset_mask
        else:
            extra = env_info
        if (
            self.info_mode == "replace"
            and reset_mask is not None
            and reset_mask.all()
        ):
            # Every sub-env reset this step: gymnasium's aggregation emits
            # ONLY the reset infos (no sub-env contributed step keys).
            return reward, extra
        info = {
            **extra,
            "base_reward": base_reward,
            "prediction": {"target": info_target, "loss": dense},
        }
        if self.autoreset == "next_step":
            # Gymnasium SyncVectorEnv info convention: `_key` validity
            # masks, with reset sub-envs' entries zero-filled (they
            # contributed only the reset info).
            provided = (
                ~reset_mask if reset_mask is not None
                else np.ones(self.num_envs, dtype=bool)
            )
            info["prediction"] = {
                "target": jax.tree_util.tree_map(
                    lambda x: np.where(
                        provided.reshape((-1,) + (1,) * (np.ndim(x) - 1)), x, 0
                    ),
                    info["prediction"]["target"],
                ),
                "_target": provided,
                "loss": info["prediction"]["loss"],
                "_loss": provided,
            }
            info["_base_reward"] = provided
            info["_prediction"] = provided
        return reward, info

    def step(self, actions: dict[str, Any]):
        action = np.asarray(actions["action"], dtype=np.float32)
        pred = actions["prediction"]

        if self.autoreset == "lockstep" and self._prev_done.all():
            # Lockstep reset step (image_perception_module.py:197-202 +
            # active_perception_vector_env.py:84-111): base 0, not done,
            # loss vs the env-specific reset target.
            old_state = self._state
            if self.rng == "reference":
                draws = self.shim.autoreset_draws()
                obs, state, info = self._jit_reset_draws(draws)
            else:
                obs, state, info = self._jit_autoreset_native(
                    self._next_key(), old_state
                )
            target = self._jit_target_on_reset(old_state, state)
            self._state = state
            self._prev_done = np.zeros(self.num_envs, dtype=bool)
            zeros = np.zeros(self.num_envs, dtype=np.float64)
            falses = np.zeros(self.num_envs, dtype=bool)
            # One device->host transfer for everything the host consumes
            # (each separate fetch pays a full round trip on relay-attached
            # chips; PERF.md round-5 compat decomposition).
            obs, info, target = jax.device_get((obs, info, target))
            reward, info = self._compose(
                pred, zeros, falses, falses, info, target, None
            )
            obs_np = _np_tree(obs)
            if self._wire_decode is not None:
                obs_np = self._wire_decode(obs_np)
            from .builders import unwrap_state
            from .render_hooks import update_tracker_step

            update_tracker_step(
                self._tracker, self.base, self.params, actions, obs_np, info,
                state, None, was_reset=True,
            )
            return obs_np, reward, falses, falses, info

        reset_draws_host = None
        if self.rng == "reference":
            if (
                self.autoreset == "next_step"
                and self._prev_done.any()
                and hasattr(self.shim, "vector_draws")
            ):
                # Per-env conditional draws: each sub-env's stream advances
                # only along its own (step vs reset) branch.
                step_draws, reset_draws_host = self.shim.vector_draws(
                    self._prev_done
                )
            else:
                step_draws = self.shim.step_draws()
        else:
            step_draws = None
        key = jax.random.PRNGKey(0) if self.rng == "reference" else self._next_key()
        raw = self._jit_raw_step(
            key, self._state, jnp.asarray(action), jnp.asarray(np.asarray(pred)),
            step_draws,
        )

        reset_mask = None
        if self.autoreset == "next_step" and self._prev_done.any():
            mask = jnp.asarray(self._prev_done)
            if self.rng == "reference":
                draws = (
                    reset_draws_host
                    if reset_draws_host is not None
                    else self.shim.autoreset_draws()
                )
                reset_triple = self._jit_reset_draws(draws)
            else:
                reset_triple = self._jit_autoreset_native(
                    self._next_key(), self._state
                )
            obs, state, base_reward, term, trunc, info = self._jit_merge(
                mask, reset_triple, raw
            )
            reset_mask = self._prev_done
            target = raw.prediction_target
        else:
            obs, state = raw.obs, raw.state
            base_reward, term, trunc = raw.base_reward, raw.terminated, raw.truncated
            info = raw.info
            target = raw.prediction_target

        from .builders import unwrap_state

        prev_pos = None
        if hasattr(unwrap_state(self._state), "pos"):
            p = unwrap_state(self._state).pos
            # Device-side env-0 slice: the tracker needs one env, not the
            # (N, 2) batch (relay transfers are round-trip-priced).
            prev_pos = np.asarray(p[0]) if isinstance(p, jax.Array) else (
                np.asarray(p)[0]
            )
        self._state = state
        # ONE device->host transfer for the whole host-visible step output:
        # obs (the big payload), flags, base reward, loss target and info
        # cross together instead of as ~6 individually round-trip-priced
        # fetches (PERF.md round-5 compat decomposition: the separate
        # fetches were ~10% of the step on a relay-attached chip).
        obs, base_reward, term_np, trunc_np, info, target = jax.device_get(
            (obs, base_reward, term, trunc, info, target)
        )
        self._prev_done = term_np | trunc_np
        reward, info = self._compose(
            pred, base_reward, term_np, trunc_np, info, target, reset_mask
        )
        obs_np = _np_tree(obs)
        if self._wire_decode is not None:
            obs_np = self._wire_decode(obs_np)
        from .render_hooks import update_tracker_step

        update_tracker_step(
            self._tracker, self.base, self.params, actions, obs_np, info,
            unwrap_state(state), prev_pos,
        )
        return obs_np, reward, term_np, trunc_np, info

    def render(self):
        from ..render import render_env

        return render_env(self.base, self._state, self.params, self._tracker)

    def close(self):
        pass


class GymAPEnv(gym.Env):
    """Single-env gymnasium-style adapter: a squeezed 1-env GymVectorAPEnv,
    mirroring the reference's VectorToSingleWrapper construction for image
    envs and plain envs for the rest."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 4}
    render_mode = "rgb_array"
    spec = None

    def __init__(self, env=None, params=None, autoreset="lockstep",
                 rng="reference", sparse=False, vec=None, key_impl=None):
        self._vec = vec if vec is not None else GymVectorAPEnv(
            env, params, num_envs=1, autoreset=autoreset, rng=rng,
            sparse=sparse, key_impl=key_impl,
        )
        assert self._vec.num_envs == 1
        self.observation_space = self._vec.single_observation_space
        self.action_space = self._vec.single_action_space
        self.inner_action_space = self._vec.single_inner_action_space
        self.prediction_space = self._vec.single_prediction_space
        self.prediction_target_space = self._vec.single_prediction_target_space

    @property
    def loss_fn(self):
        return self._vec.loss_fn

    @property
    def env(self):
        return self._vec.env

    @property
    def params(self):
        return self._vec.params

    def reset(self, *, seed: int | None = None, options: dict | None = None):
        obs, info = self._vec.reset(seed=seed, options=options)
        return _squeeze_tree(obs), _squeeze_tree(info)

    def step(self, action: dict[str, Any]):
        def lift(x):
            # Values are array-likes (incl. plain Python lists, which
            # tree_map would wrongly recurse into); () is the masked-
            # prediction sentinel and stays empty.
            if isinstance(x, tuple) and len(x) == 0:
                return x
            if isinstance(x, dict):
                return {k: lift(v) for k, v in x.items()}
            return np.asarray(x)[None]

        batched = {k: lift(v) for k, v in action.items()}
        obs, reward, term, trunc, info = self._vec.step(batched)
        return (
            _squeeze_tree(obs),
            float(reward[0]),
            bool(term[0]),
            bool(trunc[0]),
            _squeeze_tree(info),
        )

    def render(self):
        return self._vec.render()

    def close(self):
        pass
