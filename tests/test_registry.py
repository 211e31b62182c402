"""Registry catalog, metrics wrappers, hide-and-seek."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import load_reference_ap_gym

import apx
from apx.core.env import AutoResetMode
from apx.ops.glimpse import sensor_pos_lim_pixels


def test_id_catalog_matches_reference():
    ref = load_reference_ap_gym()
    if ref is None:
        pytest.skip("reference not importable")
    import gymnasium as gym

    ap_ids = set()
    for k, spec in gym.registry.items():
        ep = spec.entry_point if spec.entry_point is not None else spec.vector_entry_point
        mod = getattr(ep, "__module__", str(ep))
        if "ap_gym" in str(mod) or (isinstance(ep, str) and "ap_gym" in ep):
            ap_ids.add(k)
    assert set(apx.env_ids()) == ap_ids
    assert len(apx.env_ids()) == 158


def test_unknown_id_raises():
    with pytest.raises(KeyError):
        apx.make("Nonexistent-v0")


@pytest.mark.parametrize(
    "env_id",
    ["CircleSquare-s15-v0", "LightDark-v0", "LIDARLocMazeStatic-v0"],
)
def test_make_vec_runs(env_id):
    venv, params = apx.make_vec(env_id, num_envs=8)
    key = jax.random.PRNGKey(0)
    obs, state, _ = venv.reset(key, params)
    space = venv.env.inner_action_space(params)
    pred = venv.env.prediction_space(params)
    act = {
        "action": jnp.zeros((8, *space.shape)),
        "prediction": jnp.zeros((8, *pred.shape)),
    }
    step = jax.jit(lambda k, s: venv.step(k, s, act, params))
    for _ in range(3):
        obs, state, r, te, tr, info = step(key, state)
    assert r.shape == (8,)


def test_metrics_classification():
    venv, params = apx.make_vec("CircleSquare-s15-v0", num_envs=4, metrics=True)
    key = jax.random.PRNGKey(0)
    obs, state, _ = venv.reset(key, params)
    k = 2
    act = {"action": jnp.zeros((4, 2)), "prediction": jnp.zeros((4, k))}
    step = jax.jit(lambda key, s: venv.step(key, s, act, params))
    done_seen = False
    for i in range(20):
        obs, state, r, te, tr, info = step(jax.random.fold_in(key, i), state)
        stats = info["stats"]["scalar"]
        done = np.asarray(te | tr)
        if done.any():
            done_seen = True
            # Zero logits -> correct_label_prob = 0.5 exactly; accuracy 0
            # (prob must be > 1/K to count).
            v = np.asarray(stats["avg_correct_label_prob"])[done]
            np.testing.assert_allclose(v, 0.5, atol=1e-6)
            assert np.all(np.asarray(stats["avg_accuracy"])[done] == 0.0)
            assert np.all(np.asarray(stats["_final_correct_label_prob"]) == done)
            assert np.all(np.asarray(stats["first_correct"])[done] == -1)
            assert not np.asarray(stats["_first_correct"])[done].any()
            assert np.asarray(stats["_last_incorrect"])[done].all()
            # Per the step-limit, episodes end after exactly 16 recorded steps.
            np.testing.assert_array_equal(
                np.asarray(info["stats"]["vector_lengths"])[done], 16
            )
    assert done_seen


def test_metrics_regression():
    venv, params = apx.make_vec("LightDark-v0", num_envs=4, metrics=True)
    key = jax.random.PRNGKey(0)
    obs, state, _ = venv.reset(key, params)
    act = {"action": jnp.zeros((4, 2)), "prediction": jnp.zeros((4, 2))}
    step = jax.jit(lambda key, s: venv.step(key, s, act, params))
    for i in range(60):
        obs, state, r, te, tr, info = step(jax.random.fold_in(key, i), state)
        done = np.asarray(te | tr)
        if done.any():
            s = info["stats"]["scalar"]
            assert np.isfinite(np.asarray(s["avg_mse"])[done]).all()
            assert np.isfinite(np.asarray(s["final_euclidean_distance"])[done]).all()
            assert np.isnan(np.asarray(s["avg_mse"])[~done]).all()
            return
    pytest.fail("no episode finished in 60 steps")


def test_hide_and_seek_reward():
    venv, params = apx.make_vec("CircleSquareHideAndSeek-v0", num_envs=4)
    key = jax.random.PRNGKey(0)
    obs, state, _ = venv.reset(key, params)
    act = {"action": jnp.zeros((4, 2)), "prediction": jnp.zeros((4, 2))}
    obs, state, r, te, tr, info = jax.jit(
        lambda k, s: venv.step(k, s, act, params)
    )(key, state)

    # Recompute the expected additional reward from the object positions.
    idx = np.asarray(info["index"])
    label = idx % 2
    rem = idx // 2
    px, py = rem % 28, rem // 28
    lim = np.asarray(sensor_pos_lim_pixels((28, 28), (5, 5), 1.0))
    pos_norm = np.stack([px, py], -1) / lim - 1
    dist = np.linalg.norm(np.asarray(obs["glimpse_pos"]) - pos_norm, axis=-1)
    sign = label * 2 - 1
    additional = sign * dist
    # base_reward in info includes the additional term.
    np.testing.assert_allclose(
        np.asarray(info["base_reward"]), additional, atol=1e-5
    )
    # reward = base + additional - loss(zero logits) = additional - 1.
    np.testing.assert_allclose(np.asarray(r), additional - 1.0, atol=1e-5)


def test_hide_and_seek_no_prediction():
    venv, params = apx.make_vec("CircleSquareHideAndSeekNoPrediction-v0", num_envs=4)
    key = jax.random.PRNGKey(0)
    obs, state, _ = venv.reset(key, params)
    act = {"action": jnp.zeros((4, 2)), "prediction": ()}
    obs, state, r, te, tr, info = venv.step(key, state, act, params)
    assert info["prediction"]["target"] == ()
    # reward is exactly the augmented base reward (no loss term).
    np.testing.assert_allclose(np.asarray(r), np.asarray(info["base_reward"]))
    # quirk: info still carries the CE loss of the injected zero logits.
    np.testing.assert_allclose(np.asarray(info["prediction"]["loss"]), 1.0, atol=1e-6)


def test_single_hide_and_seek_via_vector_to_single():
    env, params = apx.make("CircleSquareHideAndSeek-v0")
    key = jax.random.PRNGKey(0)
    obs, state, _ = env.reset(key, params)
    assert obs["glimpse"].shape == (5, 5, 1)
    act = {"action": jnp.zeros(2), "prediction": jnp.zeros(2)}
    obs, state, r, te, tr, info = env.step(key, state, act, params)
    assert np.ndim(r) == 0


def test_sparse_variant_reward_gating():
    venv, params = apx.make_vec("CircleSquare-s15-sparse-v0", num_envs=4)
    key = jax.random.PRNGKey(0)
    obs, state, _ = venv.reset(key, params)
    act = {"action": jnp.zeros((4, 2)), "prediction": jnp.zeros((4, 2))}
    step = jax.jit(lambda k, s: venv.step(k, s, act, params))
    for i in range(16):
        obs, state, r, te, tr, info = step(jax.random.fold_in(key, i), state)
        done = np.asarray(te | tr)
        w = np.asarray(info["prediction"]["target"]["weight"])
        np.testing.assert_array_equal(w, done.astype(np.float32))
        if not done.any():
            np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)
    assert done.all()  # step_limit 16, zero actions -> lockstep done
    # Terminal step: zero-logit CE loss (normalized = 1) now counts.
    np.testing.assert_allclose(np.asarray(r), -1.0, atol=1e-5)


def test_hide_and_seek_episodic_rollout_matches_scan():
    """The HideAndSeek wrapper now exposes autoreset/boundary_reset_step so
    the episodic LOCKSTEP rollout (the fast bench path) runs through it:
    states/obs/dones must be bitwise equal to scanning wrapper.step, and
    rewards equal to the same 1-ulp fusion tolerance the inner-env pin
    uses (test_env_core). Covers both prediction modes."""
    import numpy as np

    from apx.core.env import rollout, rollout_episodic

    for env_id in ("CircleSquareHideAndSeek-v0", "CircleSquareHideAndSeekNoPrediction-v0"):
        venv, params = apx.make_vec(env_id, num_envs=6)
        n = 6
        k_inner = venv.env.prediction_space(params).shape[-1]

        def policy(pk, obs):
            ka, kp = jax.random.split(pk)
            return {
                "action": jax.random.uniform(ka, (n, 2), minval=-1, maxval=1),
                "prediction": jax.random.normal(kp, (n, k_inner)),
            }

        key = jax.random.PRNGKey(31)
        period = int(params.step_limit)
        num_steps = 2 * (period + 1) + 3
        obs_a, st_a, (r_a, te_a, tr_a) = jax.jit(
            lambda k: rollout(venv, params, policy, k, num_steps)
        )(key)
        obs_b, st_b, (r_b, te_b, tr_b) = jax.jit(
            lambda k: rollout_episodic(venv, params, policy, k, num_steps, period)
        )(key)
        # Rewards: the wrapper ADDS sign*||glimpse_pos - obj||, so the two
        # forms' fusion reassociation drift compounds loss + distance — a
        # couple of ulps at ~1-magnitude (measured max 1.2e-7 abs), vs the
        # inner pin's 1 ulp. States/obs/dones below stay BITWISE.
        np.testing.assert_allclose(
            np.asarray(r_a), np.asarray(r_b), rtol=5e-6, atol=3e-7
        )
        np.testing.assert_array_equal(np.asarray(te_a), np.asarray(te_b))
        np.testing.assert_array_equal(np.asarray(tr_a), np.asarray(tr_b))
        for la, lb in zip(
            jax.tree_util.tree_leaves((obs_a, st_a)),
            jax.tree_util.tree_leaves((obs_b, st_b)),
        ):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_metrics_wrapper_episodic_rollout_matches_scan():
    """Metrics-wrapped LOCKSTEP envs must ride the episodic rollout with
    identical results to scanning wrapper.step: the ring-buffer
    bookkeeping is mask-based, so the boundary step (prev_done all True)
    clears without recording exactly like the cond-ful step's autoreset
    branch. States/obs/dones/stats bitwise; rewards to the documented
    ulp tolerance."""
    import numpy as np

    from apx.core.env import rollout, rollout_episodic

    venv, params = apx.make_vec("CircleSquare-s15-v0", num_envs=6, metrics=True)
    n = 6

    def policy(pk, obs):
        ka, kp = jax.random.split(pk)
        return {
            "action": jax.random.uniform(ka, (n, 2), minval=-1, maxval=1),
            "prediction": jax.random.normal(kp, (n, 2)),
        }

    key = jax.random.PRNGKey(37)
    period = int(params.step_limit)
    num_steps = 2 * (period + 1) + 2
    obs_a, st_a, (r_a, te_a, tr_a) = jax.jit(
        lambda k: rollout(venv, params, policy, k, num_steps)
    )(key)
    obs_b, st_b, (r_b, te_b, tr_b) = jax.jit(
        lambda k: rollout_episodic(venv, params, policy, k, num_steps, period)
    )(key)
    np.testing.assert_allclose(
        np.asarray(r_a), np.asarray(r_b), rtol=3e-7, atol=1e-8
    )
    np.testing.assert_array_equal(np.asarray(te_a), np.asarray(te_b))
    np.testing.assert_array_equal(np.asarray(tr_a), np.asarray(tr_b))
    for la, lb in zip(
        jax.tree_util.tree_leaves((obs_a, st_a)),
        jax.tree_util.tree_leaves((obs_b, st_b)),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
