"""Core env contract: jit/vmap stepping, autoreset modes, reward composition."""

import jax
import jax.numpy as jnp
import numpy as np

from apx.core import AutoResetMode, vmap_vector_env
from apx.data import make_circle_square_bank
from apx.envs import ImageClassificationEnv


def make_env(n=4, step_limit=4, autoreset=AutoResetMode.LOCKSTEP):
    ds = make_circle_square_bank((15, 15))
    env = ImageClassificationEnv(dataset=ds, step_limit=step_limit)
    params = env.default_params()
    venv = vmap_vector_env(env, n, autoreset)
    return env, params, venv


def test_reward_composition():
    env, params, venv = make_env()
    key = jax.random.PRNGKey(0)
    obs, state, info = jax.jit(venv.reset)(key, params)
    act = {"action": jnp.zeros((4, 2)), "prediction": jnp.zeros((4, 2))}
    obs, state, reward, term, trunc, info = jax.jit(venv.step)(key, state, act, params)
    # zero action => base_reward 0; uniform logits => normalized CE loss == 1
    np.testing.assert_allclose(np.asarray(info["base_reward"]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(info["prediction"]["loss"]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(reward), -1.0, rtol=1e-6)


def test_action_movement_and_termination():
    env, params, venv = make_env(n=2, step_limit=3)
    key = jax.random.PRNGKey(1)
    obs, state, _ = venv.reset(key, params)
    p0 = np.asarray(obs["glimpse_pos"])
    act = {"action": jnp.ones((2, 2)) * 2.0, "prediction": jnp.zeros((2, 2))}
    obs, state, reward, term, trunc, info = venv.step(key, state, act, params)
    p1 = np.asarray(obs["glimpse_pos"])
    # action (2,2) is projected onto the unit circle -> step 0.2/sqrt(2) per axis
    expected = np.clip(p0 + 0.2 / np.sqrt(2), -1, 1)
    np.testing.assert_allclose(p1, expected, atol=1e-6)
    # base reward uses the raw action norm
    np.testing.assert_allclose(
        np.asarray(info["base_reward"]), -np.linalg.norm([2.0, 2.0]) * 1e-3, rtol=1e-5
    )
    assert not np.any(np.asarray(term))
    for _ in range(2):
        obs, state, reward, term, trunc, info = venv.step(key, state, act, params)
    assert np.all(np.asarray(term))


def test_lockstep_autoreset():
    env, params, venv = make_env(n=2, step_limit=2)
    key = jax.random.PRNGKey(2)
    obs, state, _ = venv.reset(key, params)
    act = {"action": jnp.zeros((2, 2)), "prediction": jnp.zeros((2, 2))}
    ks = jax.random.split(key, 4)
    obs, state, r1, term1, _, _ = venv.step(ks[0], state, act, params)
    obs, state, r2, term2, _, _ = venv.step(ks[1], state, act, params)
    assert np.all(np.asarray(term2))
    # next step is the lockstep reset: terminated False, base_reward 0,
    # loss evaluated against the new episode's label
    obs, state, r3, term3, _, info3 = venv.step(ks[2], state, act, params)
    assert not np.any(np.asarray(term3))
    np.testing.assert_allclose(np.asarray(info3["base_reward"]), 0.0)
    np.testing.assert_allclose(np.asarray(r3), -1.0, rtol=1e-6)
    t = np.asarray(obs["time_step"])
    np.testing.assert_allclose(t, -1.0)  # time reset to 0 -> normalized -1


def test_scan_rollout_jit():
    from apx.core import rollout

    env, params, venv = make_env(n=8, step_limit=4)

    def policy(key, obs):
        return {
            "action": jax.random.uniform(key, (8, 2), minval=-1, maxval=1),
            "prediction": jnp.zeros((8, 2)),
        }

    fn = jax.jit(lambda key: rollout(venv, params, policy, key, 16))
    obs_f, state_f, (reward, term, trunc) = fn(jax.random.PRNGKey(3))
    assert reward.shape == (16, 8)
    # each env terminates every 4 steps in lockstep
    assert int(np.asarray(term).sum()) == 16 / 4 * 8 - 8  # last reset step pending


def test_vmap_invariance():
    """Env i of an N-batch must evolve identically regardless of N."""
    ds = make_circle_square_bank((15, 15))
    env = ImageClassificationEnv(dataset=ds, step_limit=4)
    params = env.default_params()
    key = jax.random.PRNGKey(42)
    keys = jax.random.split(key, 8)

    obs1, st1, _ = jax.vmap(env.reset, in_axes=(0, None))(keys[:2], params)
    obs2, st2, _ = jax.vmap(env.reset, in_axes=(0, None))(keys, params)
    np.testing.assert_array_equal(
        np.asarray(obs1["glimpse"]), np.asarray(obs2["glimpse"])[:2]
    )
    np.testing.assert_array_equal(np.asarray(st1.label), np.asarray(st2.label)[:2])


def test_time_limit_box_obs_concat():
    """TimeLimit appends the time scalar to 1-D float Box observations
    (reference time_limit.py:86-100)."""
    from flax import struct

    from apx.core.env import APEnv, APStepResult
    from apx.core.losses import MSELossFn
    from apx.core.spaces import Box
    from apx.wrappers import TimeLimit

    class BoxState(struct.PyTreeNode):
        x: jax.Array

    class BoxEnv(APEnv):
        def default_params(self, **kw):
            return ()

        def observation_space(self, params):
            return Box(low=-1.0, high=1.0, shape=(3,))

        def inner_action_space(self, params):
            return Box(low=-1.0, high=1.0, shape=(1,))

        def prediction_space(self, params):
            return Box(low=-1.0, high=1.0, shape=(1,))

        def prediction_target_space(self, params):
            return Box(low=-1.0, high=1.0, shape=(1,))

        def loss_fn(self, params):
            return MSELossFn()

        def reset_env(self, key, params):
            s = BoxState(x=jnp.zeros(3))
            return s.x, s, {}

        def step_env(self, key, state, action, prediction, params):
            s = BoxState(x=state.x + 0.1)
            return APStepResult(
                obs=s.x, state=s, base_reward=jnp.float32(0),
                terminated=jnp.zeros((), bool), truncated=jnp.zeros((), bool),
                info={}, prediction_target=jnp.zeros(1),
            )

    env = TimeLimit(BoxEnv(), max_episode_steps=4, issue_termination=True)
    params = env.default_params()
    space = env.observation_space(params)
    assert space.shape == (4,)
    obs, state, _ = env.reset_env(jax.random.PRNGKey(0), params)
    assert obs.shape == (4,) and float(obs[-1]) == -1.0
    act = {"action": jnp.zeros(1), "prediction": jnp.zeros(1)}
    for t in range(4):
        obs, state, r, te, tr, _ = env.step(jax.random.PRNGKey(0), state, act, params)
    assert bool(te) and float(obs[-1]) == 1.0


def test_box_sample_gymnasium_conventions():
    """Box.sample follows gymnasium's per-element convention: uniform on
    bounded intervals, standard normal on unbounded, exponential tails on
    half-bounded (round-1 divergence: +-1e3 substitution; now matched)."""
    import numpy as np
    import jax

    from apx.core.spaces import Box

    s = np.asarray(Box(low=-1.0, high=1.0, shape=(64,)).sample(jax.random.PRNGKey(0)))
    assert ((s >= -1) & (s <= 1)).all()
    s2 = np.asarray(
        Box(low=-np.inf, high=np.inf, shape=(2000,)).sample(jax.random.PRNGKey(1))
    )
    assert abs(s2.mean()) < 0.2 and 0.8 < s2.std() < 1.2
    s3 = np.asarray(
        Box(low=0.0, high=np.inf, shape=(2000,)).sample(jax.random.PRNGKey(2))
    )
    assert (s3 >= 0).all() and 0.8 < s3.mean() < 1.2
    s4 = np.asarray(
        Box(low=-np.inf, high=2.0, shape=(2000,)).sample(jax.random.PRNGKey(3))
    )
    assert (s4 <= 2).all() and 0.8 < (2 - s4).mean() < 1.2


def test_vector_autoreset_info_key_mismatch_raises():
    """The vmap vector path fails loudly when an env's reset info and step
    info carry different key sets (round-2 verdict: the silent fallback at
    apx/core/env.py turned an env-author bug into dropped reset info).
    Key sets are static at trace time, so the error surfaces on the first
    step call (lax.cond traces both branches)."""
    import pytest
    from flax import struct

    from apx.core.env import APEnv, APStepResult
    from apx.core.losses import MSELossFn
    from apx.core.spaces import Box

    class MismatchState(struct.PyTreeNode):
        x: jax.Array

    class MismatchEnv(APEnv):
        def default_params(self, **kw):
            return ()

        def observation_space(self, params):
            return Box(low=-1.0, high=1.0, shape=(1,))

        def inner_action_space(self, params):
            return Box(low=-1.0, high=1.0, shape=(1,))

        def prediction_space(self, params):
            return Box(low=-1.0, high=1.0, shape=(1,))

        def prediction_target_space(self, params):
            return Box(low=-1.0, high=1.0, shape=(1,))

        def loss_fn(self, params):
            return MSELossFn()

        def reset_env(self, key, params):
            s = MismatchState(x=jnp.zeros(1))
            return s.x, s, {"reset_only_key": jnp.zeros(())}

        def step_env(self, key, state, action, prediction, params):
            s = MismatchState(x=state.x)
            return APStepResult(
                obs=s.x, state=s, base_reward=jnp.float32(0),
                terminated=jnp.ones((), bool), truncated=jnp.zeros((), bool),
                info={"step_only_key": jnp.zeros(())},
                prediction_target=jnp.zeros(1),
            )

    venv = vmap_vector_env(MismatchEnv(), 2)
    params = venv.env.default_params()
    _, state, _ = venv.reset(jax.random.PRNGKey(0), params)
    act = {"action": jnp.zeros((2, 1)), "prediction": jnp.zeros((2, 1))}
    with pytest.raises(ValueError, match="autoreset info keys differ"):
        venv.step(jax.random.PRNGKey(1), state, act, params)


def test_rollout_episodic_bitwise_matches_lockstep_scan():
    """rollout_episodic (boundary hoisted out of the scan — the TPU-side
    fix for the LOCKSTEP cond's pass-through copies) must be BITWISE
    identical to scanning venv.step in state/obs/dones — rewards admit
    1 ulp of XLA fusion-reassociation drift — across multiple full
    episodes plus a partial trailing segment, for classification AND
    localization semantics."""
    import jax

    from apx.core.env import (
        AutoResetMode,
        rollout,
        rollout_episodic,
        vmap_vector_env,
    )
    from apx.data import make_circle_square_bank
    from apx.envs import ImageClassificationEnv, ImageLocalizationEnv

    for ctor, pred_dim in ((ImageClassificationEnv, 2), (ImageLocalizationEnv, 2)):
        env = ctor(dataset=make_circle_square_bank((16, 16)), step_limit=4)
        params = env.default_params()
        n = 8
        venv = vmap_vector_env(env, n, AutoResetMode.LOCKSTEP)

        def policy(pk, obs):
            ka, kp = jax.random.split(pk)
            return {
                "action": jax.random.uniform(ka, (n, 2), minval=-1, maxval=1),
                "prediction": jax.random.normal(kp, (n, pred_dim)),
            }

        key = jax.random.PRNGKey(17)
        num_steps = 13  # 2 full (4+1)-cycles + 3 leftover steps
        # segments=0 edge: fewer steps than one cycle -> pure inner scan
        _, _, (r_s, *_rest) = jax.jit(
            lambda k: rollout(venv, params, policy, k, 3)
        )(key)
        _, _, (r_e, *_rest) = jax.jit(
            lambda k: rollout_episodic(venv, params, policy, k, 3, 4)
        )(key)
        np.testing.assert_allclose(
            np.asarray(r_s), np.asarray(r_e), rtol=3e-7, atol=1e-8
        )

        # reference: plain scan of venv.step (shares rollout's key layout)
        obs_a, state_a, (r_a, te_a, tr_a) = jax.jit(
            lambda k: rollout(venv, params, policy, k, num_steps)
        )(key)
        obs_b, state_b, (r_b, te_b, tr_b) = jax.jit(
            lambda k: rollout_episodic(venv, params, policy, k, num_steps, 4)
        )(key)

        np.testing.assert_allclose(
            np.asarray(r_a), np.asarray(r_b), rtol=3e-7, atol=1e-8
        )
        np.testing.assert_array_equal(np.asarray(te_a), np.asarray(te_b))
        np.testing.assert_array_equal(np.asarray(tr_a), np.asarray(tr_b))
        for la, lb in zip(
            jax.tree_util.tree_leaves((obs_a, state_a.inner)),
            jax.tree_util.tree_leaves((obs_b, state_b.inner)),
        ):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_segmented_scan_splice_pattern():
    """segmented_scan runs inner_body on every key except each
    (period+1)-th, where boundary_body runs instead; outputs stack in
    step order; a trailing partial segment gets no boundary."""
    import jax

    from apx.core.env import segmented_scan

    def inner(carry, k):
        return carry + 1, (jnp.float32(0), carry)

    def boundary(carry, k):
        return carry * 10, (jnp.float32(1), carry)

    keys = jnp.arange(8)  # period=2 -> cycles of 3: [i i B][i i B][i i]
    carry_f, (kinds, carries) = jax.jit(
        lambda c: segmented_scan(inner, boundary, c, keys, 2)
    )(jnp.int32(0))
    np.testing.assert_array_equal(
        np.asarray(kinds), [0, 0, 1, 0, 0, 1, 0, 0]
    )
    # carry trace: 0,1 -> B(2)=20; 20,21 -> B(22)=220; 220,221 -> 222
    np.testing.assert_array_equal(
        np.asarray(carries), [0, 1, 2, 20, 21, 22, 220, 221]
    )
    assert int(carry_f) == 222


def test_image_storage_modes_bitwise_equal():
    """All image_storage layouts are bitwise-equivalent views of the same
    episode (round-5 A/B: "array" is 3.5-4.8x faster than packed/flat/
    gather on TPU — those pay a per-step relayout/gather; the carry of the
    4D u8 batch is the measured optimum). The modes stay selectable and
    must stay trajectory-identical."""
    from apx.core.env import rollout_episodic
    from apx.data.huggingface import load_hf_image_bank
    from apx.envs import ImageLocalizationEnv
    from apx.envs.image_perception import ImagePerceptionEngine

    env = ImageLocalizationEnv(
        dataset=load_hf_image_bank("mnist", channels=1, num_points=64)
    )
    key = jax.random.key(0)

    def pol(k, obs):
        return {
            "action": jax.random.uniform(k, (8, 2), minval=-1, maxval=1),
            "prediction": jnp.zeros((8, 2)),
        }

    outs = {}
    for mode in ("array", "packed", "flat", "gather"):
        params = env.default_params(image_storage=mode, step_limit=4)
        assert ImagePerceptionEngine.storage(params) == mode
        venv = vmap_vector_env(env, 8, AutoResetMode.LOCKSTEP)
        obs_f, state_f, traj = jax.jit(
            lambda key, p: rollout_episodic(venv, p, pol, key, 11, 4)
        )(key, params)
        img = ImagePerceptionEngine.image_raw(state_f.inner.perception, params)
        assert img.shape == (8, 28, 28, 1) and img.dtype == jnp.uint8
        outs[mode] = (obs_f, traj)
    ref = jax.tree_util.tree_leaves(outs["array"])
    for mode in ("packed", "flat", "gather"):
        for a, b in zip(ref, jax.tree_util.tree_leaves(outs[mode])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_derived_obs_merged_outside_cond():
    """LIDAR's map channel is a derived obs entry (computed once from the
    post-merge state, outside the autoreset cond). It must appear in every
    obs surface — reset, step, boundary — with the reference's {0, 1/255}
    values, and static_map envs must derive nothing."""
    from apx.data.floor_map import make_rooms_bank
    from apx.envs.lidar_localization import LIDARLocalizationEnv
    from apx.wrappers import TimeLimit

    env = TimeLimit(
        LIDARLocalizationEnv(map_bank=make_rooms_bank(num_maps=4)),
        max_episode_steps=5,
        issue_termination=True,
    )
    params = env.default_params()
    venv = vmap_vector_env(env, 8, AutoResetMode.NEXT_STEP)
    key = jax.random.key(1)
    obs, state, _ = jax.jit(venv.reset)(key, params)
    assert obs["map"].shape == (8, 32, 32, 1)
    occ = np.asarray(state.inner.inner.occ)
    np.testing.assert_array_equal(
        np.asarray(obs["map"])[..., 0], occ.astype(np.float32) / 255.0
    )
    act = {"action": jnp.zeros((8, 2)), "prediction": jnp.zeros((8, 2))}
    step = jax.jit(lambda k, s: venv.step(k, s, act, params))
    for i in range(7):  # crosses the TimeLimit reset at t=5
        key, k = jax.random.split(key)
        obs, state, *_ = step(k, state)
        occ = np.asarray(state.inner.inner.occ)
        np.testing.assert_array_equal(
            np.asarray(obs["map"])[..., 0], occ.astype(np.float32) / 255.0
        )
    # static_map: no derived entries, no map key anywhere.
    sp = env.default_params(static_map=True)
    assert env.obs_derived_from_state(state.inner, sp) == {}
    obs_s, _, _ = jax.jit(lambda k: venv.reset(k, sp))(key)
    assert "map" not in obs_s


def test_reset_merge_always_bitwise():
    """reset_merge='always' (unconditional masked merge, round 5) must be
    bit-identical to the default cond-gated merge across episode
    boundaries: an all-False reset mask selects the step results in every
    leaf, so only the cond's buffer plumbing differs. Covers short
    TimeLimit episodes so both no-reset and reset steps are exercised."""
    import dataclasses

    from apx.core.env import AutoResetMode, vmap_vector_env
    from apx.data.floor_map import make_rooms_bank
    from apx.envs.lidar_localization import LIDARLocalizationEnv
    from apx.wrappers import TimeLimit

    env = TimeLimit(
        LIDARLocalizationEnv(map_bank=make_rooms_bank(num_maps=4)),
        max_episode_steps=4,
        issue_termination=True,
    )
    params = env.default_params()
    venv_c = vmap_vector_env(env, 8, AutoResetMode.NEXT_STEP)
    venv_a = dataclasses.replace(venv_c, reset_merge="always")
    key = jax.random.key(9)
    obs_c, st_c, _ = jax.jit(venv_c.reset)(key, params)
    obs_a, st_a, _ = jax.jit(venv_a.reset)(key, params)
    step_c = jax.jit(lambda k, s, a: venv_c.step(k, s, a, params))
    step_a = jax.jit(lambda k, s, a: venv_a.step(k, s, a, params))
    for t in range(11):  # crosses reset boundaries at t=4, 8
        key, k, ka = jax.random.split(key, 3)
        act = {
            "action": jax.random.uniform(ka, (8, 2), minval=-1.0, maxval=1.0),
            "prediction": jax.random.normal(jax.random.fold_in(ka, 1), (8, 2)),
        }
        out_c = step_c(k, st_c, act)
        out_a = step_a(k, st_a, act)
        obs_c, st_c, *rest_c = out_c
        obs_a, st_a, *rest_a = out_a
        for x, y in zip(
            jax.tree_util.tree_leaves(out_c), jax.tree_util.tree_leaves(out_a)
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_reset_merge_auto_resolves_by_env_preference():
    """reset_merge='auto' (the default) resolves per the env's
    reset_prefers_merge declaration: LightDark (gather-free reset) takes
    the unconditional masked merge, LIDAR (bank/map gathers on reset)
    keeps the lax.cond — and on LightDark the merged form must be
    bit-identical to a forced cond across episode boundaries."""
    import dataclasses

    from apx.core.env import AutoResetMode, vmap_vector_env
    from apx.envs.light_dark import LightDarkEnv
    from apx.wrappers import TimeLimit

    env = TimeLimit(LightDarkEnv(), max_episode_steps=4, issue_termination=True)
    assert env.reset_prefers_merge  # delegated through the wrapper
    params = env.default_params()
    venv_auto = vmap_vector_env(env, 8, AutoResetMode.NEXT_STEP)
    assert venv_auto.reset_merge == "auto"
    venv_cond = dataclasses.replace(venv_auto, reset_merge="cond")
    key = jax.random.key(13)
    obs_a, st_a, _ = jax.jit(venv_auto.reset)(key, params)
    obs_c, st_c, _ = jax.jit(venv_cond.reset)(key, params)
    step_a = jax.jit(lambda k, s, a: venv_auto.step(k, s, a, params))
    step_c = jax.jit(lambda k, s, a: venv_cond.step(k, s, a, params))
    for t in range(11):  # crosses boundaries at t=4, 8
        key, k, ka = jax.random.split(key, 3)
        act = {
            "action": jax.random.uniform(ka, (8, 2), minval=-1.0, maxval=1.0),
            "prediction": jax.random.normal(jax.random.fold_in(ka, 1), (8, 2)),
        }
        out_a = step_a(k, st_a, act)
        out_c = step_c(k, st_c, act)
        st_a, st_c = out_a[1], out_c[1]
        for x, y in zip(
            jax.tree_util.tree_leaves(out_a), jax.tree_util.tree_leaves(out_c)
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # LIDAR: gathers on reset -> auto keeps the cond (the structural check
    # is the declaration itself; the throughput verdict is in PERF.md).
    from apx.envs.lidar_localization import LIDARLocalizationEnv

    assert not LIDARLocalizationEnv.reset_prefers_merge
