"""Functional active-perception environment API.

The reference (ap_gym) models active perception as a Gymnasium extension:
``step({"action": a, "prediction": y})`` returns
``base_reward - loss_fn(y, y*)`` and surfaces the loss/target through info
(/root/reference/ap_gym/active_perception_env.py:90-121,
 active_perception_vector_env.py:69-111).

Here the same contract is a *pure function* suitable for jit/vmap/scan/
shard_map on TPU:

    obs, state, info               = env.reset(key, params)
    obs, state, reward, term, trunc, info = env.step(key, state, full_action, params)

* ``params`` is a ``flax.struct`` pytree: static config in non-pytree fields,
  device-resident data (datasets, map banks) in array fields.
* ``state`` is a pytree carrying everything episode-specific.
* Batching is ``vmap`` over state/keys; autoreset is mask-based and comes in
  two modes matching the reference's two observable behaviors:
    - NEXT_STEP: per-env reset the step after done, reward 0 (Gymnasium
      SyncVectorEnv semantics used by LIDAR/LightDark).
    - LOCKSTEP: reset only when *all* envs are done; on the reset step
      base_reward = 0, terminated = False, and the loss is evaluated against
      the *new* episode's target (image_perception_module.py:197-202 +
      active_perception_vector_env.py:84-111).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable, Generic, TypeVar

import jax
import jax.numpy as jnp
from flax import struct

from .losses import LossFn
from .spaces import ActivePerceptionActionSpace, Space

__all__ = [
    "APEnv",
    "APStepResult",
    "AutoResetMode",
    "VectorAPEnv",
    "vmap_vector_env",
    "rollout",
    "rollout_episodic",
    "with_autoreset",
]

P = TypeVar("P")  # params pytree
S = TypeVar("S")  # state pytree


class APStepResult(struct.PyTreeNode):
    """Raw result of an env's ``_step`` before loss composition."""

    obs: Any
    state: Any
    base_reward: jax.Array
    terminated: jax.Array
    truncated: jax.Array
    info: dict[str, Any]
    prediction_target: Any


class AutoResetMode(enum.Enum):
    NEXT_STEP = "next_step"
    LOCKSTEP = "lockstep"
    DISABLED = "disabled"


class APEnv(Generic[P, S]):
    """Single-env functional active-perception environment.

    Subclasses implement ``default_params``, ``reset_env``, ``step_env`` and
    the space/loss accessors. All dynamics functions must be traceable.
    """

    # Envs whose step_env ignores its key (image, LIDAR) set this False so
    # the vector layer skips n per-step key splits.
    step_uses_rng: bool = True

    # Envs whose reset_env performs NO dataset/map gathers (LightDark) set
    # this True: the NEXT_STEP vector layer then resolves
    # reset_merge="auto" to the UNCONDITIONAL masked merge, which is
    # bitwise-identical to the lax.cond gate and skips its pass-through
    # buffer plumbing. Measured +28% on LightDark (134 -> 172M
    # env-steps/s). Envs whose reset gathers from banks keep the cond —
    # inlining those gathers into the while body serializes them against
    # step compute, measured 7.2x WORSE on LIDAR (PERF.md round 5).
    reset_prefers_merge: bool = False

    # ---- static metadata -------------------------------------------------
    def default_params(self, **overrides) -> P:
        raise NotImplementedError

    def observation_space(self, params: P) -> Space:
        raise NotImplementedError

    def inner_action_space(self, params: P) -> Space:
        raise NotImplementedError

    def prediction_space(self, params: P) -> Space:
        raise NotImplementedError

    def prediction_target_space(self, params: P) -> Space:
        raise NotImplementedError

    def action_space(self, params: P) -> ActivePerceptionActionSpace:
        return ActivePerceptionActionSpace.create(
            self.inner_action_space(params), self.prediction_space(params)
        )

    def loss_fn(self, params: P) -> LossFn:
        raise NotImplementedError

    # ---- dynamics --------------------------------------------------------
    def reset_env(self, key: jax.Array, params: P) -> tuple[Any, S, dict[str, Any]]:
        """Returns (obs, state, info)."""
        raise NotImplementedError

    def step_env(
        self, key: jax.Array, state: S, action: Any, prediction: Any, params: P
    ) -> APStepResult:
        raise NotImplementedError

    def autoreset_env(
        self, key: jax.Array, old_state: S, params: P
    ) -> tuple[Any, S, dict[str, Any]]:
        """Reset used on an *autoreset* step. Defaults to reset_env; envs
        whose mid-run reset differs from the explicit reset override this
        (e.g. image localization resamples its target uniformly instead of
        running the unique-glimpse sampler, image_localization.py:152-156)."""
        return self.reset_env(key, params)

    def prediction_target_on_reset(self, old_state: S, new_state: S, params: P):
        """Loss target used on a LOCKSTEP autoreset step. Classification envs
        return the new episode's label (image_classification.py:113-127);
        localization envs return the previous episode's target
        (image_localization.py:151-152)."""
        raise NotImplementedError

    def obs_derived_from_state(self, state: S, params: P) -> dict[str, Any]:
        """Observation entries that are pure elementwise functions of the
        POST-step state (e.g. LIDAR's dynamic-map channel, occ -> f32/255).

        Envs that override this must omit these keys from the obs returned
        by step_env/reset_env/autoreset_env; the step/reset templates and
        the vector layer merge them back in. Why: inside the vector
        autoreset ``lax.cond`` every obs leaf is computed in BOTH branches
        and mask-selected — for LIDAR's (N, 32, 32, 1) f32 map that tripled
        its HBM traffic (~52 us of a ~123 us step, 2.5x the channel's pure
        write roofline; round-5 profile). Since where(m, f(a), f(b)) ==
        f(where(m, a, b)) for elementwise f, computing these entries ONCE
        from the merged state is bitwise-identical and pays the write once.
        Only valid for dict observations."""
        return {}

    def _merge_derived_obs(self, obs, state: S, params: P):
        d = self.obs_derived_from_state(state, params)
        return {**obs, **d} if d else obs

    def compose_info(
        self, info, base_reward, pred_target, loss, prediction, params: P
    ) -> dict[str, Any]:
        """info contract of active_perception_env.py:113-119. Overridable:
        the Sparsify wrapper reports the *dense* inner loss here while the
        reward uses the weighted one (sparsify_wrapper.py:74-88 leaves the
        inner step's info['prediction']['loss'] untouched)."""
        return {
            **info,
            "base_reward": base_reward,
            "prediction": {"target": pred_target, "loss": loss},
        }

    # ---- template methods (mirror ActivePerceptionEnv.step) --------------
    def reset(self, key: jax.Array, params: P) -> tuple[Any, S, dict[str, Any]]:
        obs, state, info = self.reset_env(key, params)
        return self._merge_derived_obs(obs, state, params), state, info

    def step(
        self, key: jax.Array, state: S, full_action: dict[str, Any], params: P
    ) -> tuple[Any, S, jax.Array, jax.Array, jax.Array, dict[str, Any]]:
        """Composite step: reward = base_reward - loss_fn(prediction, target).

        Mirrors active_perception_env.py:101-121 (single) /
        active_perception_vector_env.py:84-111 (vector): info carries
        base_reward and prediction.{target, loss}.
        """
        r = self.step_env(
            key, state, full_action["action"], full_action["prediction"], params
        )
        loss = self.loss_fn(params)(full_action["prediction"], r.prediction_target)
        reward = r.base_reward - loss
        info = self.compose_info(
            r.info, r.base_reward, r.prediction_target, loss,
            full_action["prediction"], params,
        )
        obs = self._merge_derived_obs(r.obs, r.state, params)
        return obs, r.state, reward, r.terminated, r.truncated, info


# ---------------------------------------------------------------------------
# Vectorization
# ---------------------------------------------------------------------------


class VectorState(struct.PyTreeNode):
    inner: Any
    prev_done: jax.Array  # (N,) bool


@dataclasses.dataclass(frozen=True)
class VectorAPEnv:
    """vmap-based vector wrapper with mask autoreset.

    ``reset(key, params)`` and ``step(key, state, actions, params)`` operate on
    batches of ``num_envs``; both branches (step & reset) are computed and
    mask-selected, which is the XLA-friendly equivalent of Gymnasium's
    per-env autoreset.
    """

    env: APEnv
    num_envs: int
    autoreset: AutoResetMode = AutoResetMode.NEXT_STEP
    # NEXT_STEP reset-and-merge placement. "cond" gates the whole reset
    # computation + state-wide mask-selects behind lax.cond; "always" runs
    # the masked merge unconditionally — bitwise-identical (an all-False
    # mask selects the step results everywhere). Which wins is set by what
    # the reset DOES (round-5 A/Bs in PERF.md): LIDAR's bank/map gathers
    # inlined into the while body serialize against step compute (7.2x
    # WORSE merged), while LightDark's gather-free reset pays only the
    # cond's pass-through buffer plumbing (~42% of its step; +28% merged,
    # 134 -> 172M env-steps/s). "auto" (default) resolves via the env's
    # reset_prefers_merge declaration.
    reset_merge: str = struct.field(pytree_node=False, default="auto")

    def reset(self, key: jax.Array, params) -> tuple[Any, VectorState, dict[str, Any]]:
        keys = jax.random.split(key, self.num_envs)
        obs, state, info = jax.vmap(self.env.reset, in_axes=(0, None))(keys, params)
        vstate = VectorState(
            inner=state, prev_done=jnp.zeros(self.num_envs, dtype=jnp.bool_)
        )
        return obs, vstate, info

    def _merge_derived_vec(self, obs, inner_state, params):
        d = jax.vmap(
            lambda s: self.env.obs_derived_from_state(s, params)
        )(inner_state)
        return {**obs, **d} if d else obs

    def step(
        self, key: jax.Array, state: VectorState, full_action: dict[str, Any], params
    ) -> tuple[Any, VectorState, jax.Array, jax.Array, jax.Array, dict[str, Any]]:
        n = self.num_envs
        step_key, reset_key = jax.random.split(key)

        loss_fn = self.env.loss_fn(params)

        def raw_step(k, s, a, p):
            return self.env.step_env(k, s, a, p, params)

        if self.env.step_uses_rng:
            step_keys = jax.random.split(step_key, n)
            r = jax.vmap(raw_step)(
                step_keys, state.inner, full_action["action"],
                full_action["prediction"],
            )
        else:
            r = jax.vmap(raw_step, in_axes=(None, 0, 0, 0))(
                step_key, state.inner, full_action["action"],
                full_action["prediction"],
            )

        if self.autoreset is AutoResetMode.DISABLED:
            loss = loss_fn(full_action["prediction"], r.prediction_target)
            reward = r.base_reward - loss
            info = self.env.compose_info(
                r.info, r.base_reward, r.prediction_target, loss,
                full_action["prediction"], params,
            )
            obs = self._merge_derived_vec(r.obs, r.state, params)
            vstate = VectorState(inner=r.state, prev_done=r.terminated | r.truncated)
            return obs, vstate, reward, r.terminated, r.truncated, info

        if self.autoreset is AutoResetMode.LOCKSTEP:
            # Reset only when every env is done; loss evaluated against the
            # NEW target on the reset step (image env semantics, see module
            # docstring). base_reward = 0, terminated = truncated = False.
            do_reset = jnp.all(state.prev_done)
            reset_mask = jnp.broadcast_to(do_reset, (n,))
            any_reset = do_reset
        else:  # NEXT_STEP: per-env
            do_reset = state.prev_done
            reset_mask = do_reset
            any_reset = jnp.any(do_reset)

        def mask_select(mask, a, b):
            return jax.tree_util.tree_map(
                lambda x, y: jnp.where(
                    mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)), x, y
                ),
                a,
                b,
            )

        # The whole reset-and-merge lives under lax.cond (not select): on the
        # common no-reset step, neither the autoreset computation — dataset
        # gathers, map fetches, target samplers — nor the state-wide
        # mask-select copies execute; the step results pass through.
        def reset_branch():
            # Key split happens inside the cond: free on no-reset steps.
            reset_keys = jax.random.split(reset_key, n)
            reset_obs, reset_state, reset_info = jax.vmap(
                self.env.autoreset_env, in_axes=(0, 0, None)
            )(reset_keys, state.inner, params)
            obs = mask_select(reset_mask, reset_obs, r.obs)
            new_inner = mask_select(reset_mask, reset_state, r.state)
            base_reward = jnp.where(reset_mask, 0.0, r.base_reward)
            terminated = jnp.where(reset_mask, False, r.terminated)
            truncated = jnp.where(reset_mask, False, r.truncated)
            if self.autoreset is AutoResetMode.LOCKSTEP:
                # Loss target on the reset step is env-specific (see
                # APEnv.prediction_target_on_reset).
                new_target = jax.vmap(
                    lambda so, sn: self.env.prediction_target_on_reset(
                        so, sn, params
                    )
                )(state.inner, reset_state)
                pred_target = mask_select(
                    reset_mask, new_target, r.prediction_target
                )
            else:
                pred_target = r.prediction_target
            if set(reset_info) != set(r.info):
                # Key sets are static at trace time, so an env-author bug
                # fails loudly here instead of silently dropping reset info
                # (mirrors apx/compat/gym_env.py's autoreset guard).
                raise ValueError(
                    "autoreset info keys differ from step info keys: "
                    f"{sorted(reset_info)} vs {sorted(r.info)}"
                )
            info = mask_select(
                reset_mask,
                {
                    **reset_info,
                    **{k: v for k, v in r.info.items() if k not in reset_info},
                },
                r.info,
            )
            return obs, new_inner, base_reward, terminated, truncated, pred_target, info

        def no_reset_branch():
            return (
                r.obs,
                r.state,
                r.base_reward.astype(jnp.float32),
                r.terminated,
                r.truncated,
                r.prediction_target,
                r.info,
            )

        merge_always = self.reset_merge == "always" or (
            self.reset_merge == "auto" and self.env.reset_prefers_merge
        )
        if merge_always and self.autoreset is AutoResetMode.NEXT_STEP:
            # Unconditional masked merge (see reset_merge field docs):
            # identical outputs — an all-False reset_mask selects the
            # step results in every leaf — without the cond's buffer
            # plumbing.
            outs = reset_branch()
        else:
            outs = jax.lax.cond(any_reset, reset_branch, no_reset_branch)
        obs, new_inner, base_reward, terminated, truncated, pred_target, info = outs
        # Derived obs entries are computed ONCE from the merged state, not
        # inside both cond branches (see APEnv.obs_derived_from_state).
        obs = self._merge_derived_vec(obs, new_inner, params)

        loss = loss_fn(full_action["prediction"], pred_target)
        if self.autoreset is AutoResetMode.LOCKSTEP:
            reward = base_reward - loss
        else:
            loss = jnp.where(reset_mask, 0.0, loss)
            reward = jnp.where(reset_mask, 0.0, base_reward - loss)

        info = self.env.compose_info(
            info, base_reward, pred_target, loss, full_action["prediction"], params
        )

        vstate = VectorState(inner=new_inner, prev_done=terminated | truncated)
        return obs, vstate, reward, terminated, truncated, info

    def boundary_reset_step(
        self, key: jax.Array, state: VectorState, full_action: dict[str, Any], params
    ) -> tuple[Any, VectorState, jax.Array, jax.Array, jax.Array, dict[str, Any]]:
        """The LOCKSTEP all-done reset step as a standalone, cond-free
        function: bitwise-identical outputs to ``step()`` entered with
        ``prev_done`` all True (the masked-out step_env result there is
        never observable, so it is simply not computed here). Building
        block of ``rollout_episodic`` — see its docstring for why hoisting
        this out of the scan matters on TPU."""
        n = self.num_envs
        step_key, reset_key = jax.random.split(key)  # mirror step()'s split
        del step_key
        reset_keys = jax.random.split(reset_key, n)
        reset_obs, reset_state, reset_info = jax.vmap(
            self.env.autoreset_env, in_axes=(0, 0, None)
        )(reset_keys, state.inner, params)
        new_target = jax.vmap(
            lambda so, sn: self.env.prediction_target_on_reset(so, sn, params)
        )(state.inner, reset_state)
        loss = self.env.loss_fn(params)(full_action["prediction"], new_target)
        base_reward = jnp.zeros(n, jnp.float32)
        reward = base_reward - loss
        terminated = jnp.zeros(n, dtype=jnp.bool_)
        truncated = jnp.zeros(n, dtype=jnp.bool_)
        info = self.env.compose_info(
            reset_info, base_reward, new_target, loss,
            full_action["prediction"], params,
        )
        reset_obs = self._merge_derived_vec(reset_obs, reset_state, params)
        vstate = VectorState(inner=reset_state, prev_done=terminated)
        return reset_obs, vstate, reward, terminated, truncated, info


def vmap_vector_env(
    env: APEnv,
    num_envs: int,
    autoreset: AutoResetMode = AutoResetMode.NEXT_STEP,
    reset_merge: str = "auto",
) -> VectorAPEnv:
    return VectorAPEnv(
        env=env, num_envs=num_envs, autoreset=autoreset, reset_merge=reset_merge
    )


def rollout(
    venv: VectorAPEnv,
    params,
    policy_fn: Callable[[jax.Array, Any], dict[str, Any]],
    key: jax.Array,
    num_steps: int,
):
    """lax.scan rollout: policy_fn(key, obs) -> full_action."""
    reset_key, scan_key = jax.random.split(key)
    obs0, state0, _ = venv.reset(reset_key, params)

    def body(carry, k):
        obs, state = carry
        pk, sk = jax.random.split(k)
        act = policy_fn(pk, obs)
        obs2, state2, reward, term, trunc, info = venv.step(sk, state, act, params)
        return (obs2, state2), (reward, term, trunc)

    keys = jax.random.split(scan_key, num_steps)
    (obs_f, state_f), traj = jax.lax.scan(body, (obs0, state0), keys)
    return obs_f, state_f, traj


def segmented_scan(inner_body, boundary_body, carry, keys, period, inner_unroll=1):
    """Scan ``inner_body`` over ``keys``, splicing ``boundary_body`` in at
    every ``(period + 1)``-th key — the shared scaffolding of
    ``rollout_episodic``, ``apx.distrib.sharded_rollout`` and ``bench.py``
    (one tested implementation instead of three drifting copies).

    Both bodies are ``(carry, key) -> (carry, out)`` with the same ``out``
    structure. A trailing partial segment runs without its boundary.
    Returns ``(carry, outs)`` with outs stacked over all ``len(keys)``
    steps in order. ``keys`` may be any pytree of per-step arrays (all
    leaves leading dim = num_steps) — e.g. bench.py passes
    ``(step_keys, pre-drawn actions, pre-drawn predictions)``.

    ``inner_unroll`` is passed to the inner per-segment scan. Fully
    unrolling it (``inner_unroll=True``) removes the inner while loop, so
    episode-constant state leaves flow through the segment as pure SSA
    values instead of crossing two nested while-loop carries at every
    episode boundary — the crossings cost ~1.55 ms of relayout copies of
    the (4096, 64, 64, 3) u8 image batch per TinyImageNetLoc boundary
    (round-5 profile; the A/B is in PERF.md)."""
    tmap = jax.tree_util.tree_map
    cycle = period + 1
    num_steps = jax.tree_util.tree_leaves(keys)[0].shape[0]
    segments = num_steps // cycle
    leftover = num_steps - segments * cycle

    def segment(carry, seg_keys):
        carry, outs = jax.lax.scan(
            inner_body,
            carry,
            tmap(lambda a: a[:period], seg_keys),
            unroll=inner_unroll,
        )
        carry, bout = boundary_body(carry, tmap(lambda a: a[period], seg_keys))
        outs = tmap(lambda a, b: jnp.concatenate([a, b[None]]), outs, bout)
        return carry, outs

    outs = None
    if segments:
        carry, outs = jax.lax.scan(
            segment,
            carry,
            tmap(
                lambda a: a[: segments * cycle].reshape(
                    (segments, cycle) + a.shape[1:]
                ),
                keys,
            ),
        )
        outs = tmap(lambda x: x.reshape((segments * cycle,) + x.shape[2:]), outs)
    if leftover:
        carry, tail = jax.lax.scan(
            inner_body,
            carry,
            tmap(lambda a: a[segments * cycle :], keys),
            unroll=inner_unroll,
        )
        outs = (
            tail
            if outs is None
            else jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b]), outs, tail
            )
        )
    return carry, outs


def with_autoreset(venv, mode: AutoResetMode):
    """``dataclasses.replace(venv, autoreset=mode)``, duck-typed through
    vector-LEVEL wrappers (e.g. CircleSquareHideAndSeek) that hold the
    VectorAPEnv in a ``venv`` field and delegate ``autoreset`` as a
    property — those cannot take the field directly, so the replace
    recurses into the held vector env instead. Lets the episodic LOCKSTEP
    rollout (and bench) build their DISABLED inner form for wrapped
    vector envs too."""
    if any(f.name == "autoreset" for f in dataclasses.fields(venv)):
        return dataclasses.replace(venv, autoreset=mode)
    if hasattr(venv, "venv"):
        return dataclasses.replace(venv, venv=with_autoreset(venv.venv, mode))
    raise TypeError(
        f"cannot set autoreset on {type(venv).__name__}: no autoreset "
        "field and no inner 'venv' to recurse into"
    )


def rollout_episodic(
    venv: VectorAPEnv,
    params,
    policy_fn: Callable[[jax.Array, Any], dict[str, Any]],
    key: jax.Array,
    num_steps: int,
    period: int,
):
    """LOCKSTEP rollout with the episode boundary hoisted OUT of the scan.

    Valid whenever every episode lasts exactly ``period`` steps — true for
    every registered image env (they terminate unconditionally at
    ``params.step_limit``), so the all-done reset lands deterministically
    every ``period + 1``-th step. The inner scan then runs cond-free
    DISABLED-mode steps and the reset runs as an unrolled
    ``boundary_reset_step`` between segments.

    Why: inside a scan, the LOCKSTEP autoreset ``lax.cond`` forces XLA to
    copy every pass-through state leaf into the cond's output buffers and
    again into the while carry — for banked image envs that is the whole
    (N, H, W, C) image state, measured at ~45% of TinyImageNetLoc's step
    and ~2/3 of its LOCKSTEP-vs-DISABLED gap (PERF.md round 3; the
    zero-fill+where and OOB-scatter merge structures both measured WORSE).
    Hoisting the boundary makes the common step branch-free, which is the
    TPU-idiomatic fix. Trajectories are BITWISE identical to scanning
    ``venv.step`` in states, observations and done flags; rewards admit
    1 ulp of XLA fusion-reassociation drift (the key split, step
    semantics and reset-step outputs are shared code paths — pinned in
    tests/test_env_core.py).

    Returns ``(obs_f, state_f, (rewards, terms, truncs))`` like
    ``rollout``, with exactly ``num_steps`` steps (a trailing partial
    segment runs without its boundary step).
    """
    assert venv.autoreset is AutoResetMode.LOCKSTEP
    inner_venv = with_autoreset(venv, AutoResetMode.DISABLED)
    reset_key, scan_key = jax.random.split(key)
    obs0, state0, _ = venv.reset(reset_key, params)
    keys = jax.random.split(scan_key, num_steps)

    def inner_body(carry, k):
        obs, state = carry
        pk, sk = jax.random.split(k)
        act = policy_fn(pk, obs)
        obs2, state2, reward, term, trunc, _ = inner_venv.step(
            sk, state, act, params
        )
        return (obs2, state2), (reward, term, trunc)

    def boundary_body(carry, k):
        obs, state = carry
        pk, sk = jax.random.split(k)
        act = policy_fn(pk, obs)
        obs2, state2, reward, term, trunc, _ = venv.boundary_reset_step(
            sk, state, act, params
        )
        return (obs2, state2), (reward, term, trunc)

    (obs_f, state_f), traj = segmented_scan(
        inner_body, boundary_body, (obs0, state0), keys, period
    )
    return obs_f, state_f, traj
