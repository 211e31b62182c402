"""LightDark semantics vs the reference implementation (golden parity on the
deterministic parts; statistical on the noise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apx.core import AutoResetMode, vmap_vector_env
from apx.envs import LightDarkEnv
from apx.envs.light_dark import brightness, obs_std


def test_brightness_formula():
    env = LightDarkEnv()
    params = env.default_params()
    # At the light's position, brightness = h^2/h^2 = 1 -> std 0.
    at_light = jnp.array([0.0, -0.7])
    np.testing.assert_allclose(float(brightness(at_light, params)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(obs_std(at_light, params)), 0.0, atol=1e-7)
    far = jnp.array([1.0, 1.0])
    d2 = 1.0 + 1.7**2 + 0.04
    np.testing.assert_allclose(float(brightness(far, params)), 0.04 / d2, rtol=1e-6)


def test_step_semantics():
    env = LightDarkEnv()
    params = env.default_params()
    key = jax.random.PRNGKey(0)
    obs, state, _ = env.reset(key, params)
    assert np.all(np.abs(np.asarray(state.pos)) <= 1)
    # big action normalized to unit, scaled 0.15; reward uses raw action
    action = jnp.array([3.0, 4.0])
    r = env.step_env(key, state, action, jnp.zeros(2), params)
    np.testing.assert_allclose(
        float(r.base_reward), 1.0 - 1e-3 * 25.0, rtol=1e-6
    )
    expected = np.asarray(state.pos) + np.array([0.6, 0.8]) * 0.15
    np.testing.assert_allclose(np.asarray(r.state.pos), np.clip(expected, -1, 1), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(r.prediction_target), np.asarray(state.pos))


def test_termination_out_of_bounds():
    env = LightDarkEnv()
    params = env.default_params()
    key = jax.random.PRNGKey(0)
    state = __import__("apx.envs.light_dark", fromlist=["LightDarkState"]).LightDarkState(
        pos=jnp.array([0.95, 0.0], dtype=jnp.float32)
    )
    r = env.step_env(key, state, jnp.array([1.0, 0.0]), jnp.zeros(2), params)
    assert bool(r.terminated)
    np.testing.assert_allclose(np.asarray(r.state.pos), [1.0, 0.0], atol=1e-6)


def test_reference_parity_deterministic_path():
    """Drive the reference LightDarkEnv and our env through identical
    positions/actions; compare rewards, terminations, targets, and the
    observation *given the same noise draw*."""
    from conftest import load_reference_ap_gym

    ap_gym = load_reference_ap_gym()
    if ap_gym is None:
        pytest.skip("reference unavailable")
    from ap_gym.envs.light_dark import LightDarkEnv as RefEnv

    ref = RefEnv()
    ref.reset(seed=123)
    env = LightDarkEnv()
    params = env.default_params()

    rng = np.random.default_rng(7)
    for _ in range(20):
        ref_pos = ref._LightDarkEnv__pos.copy()
        action = rng.uniform(-1.5, 1.5, 2).astype(np.float32)
        pred = rng.uniform(-1, 1, 2).astype(np.float32)
        robs, rrew, rterm, rtrunc, rinfo = ref.step(
            {"action": action, "prediction": pred}
        )
        state = __import__(
            "apx.envs.light_dark", fromlist=["LightDarkState"]
        ).LightDarkState(pos=jnp.asarray(ref_pos))
        r = env.step_env(jax.random.PRNGKey(0), state, jnp.asarray(action), jnp.asarray(pred), params)
        loss = env.loss_fn(params)(jnp.asarray(pred), r.prediction_target)
        np.testing.assert_allclose(
            float(r.base_reward - loss), float(rrew), rtol=1e-5
        )
        assert bool(r.terminated) == bool(rterm)
        np.testing.assert_allclose(
            np.asarray(r.state.pos), ref._LightDarkEnv__pos, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(r.prediction_target), rinfo["prediction"]["target"], atol=1e-6
        )
        if rterm:
            ref.reset(seed=int(rng.integers(0, 1000)))


def test_vectorized_rollout():
    env = LightDarkEnv()
    params = env.default_params()
    venv = vmap_vector_env(env, 64, AutoResetMode.NEXT_STEP)
    key = jax.random.PRNGKey(1)
    obs, state, _ = jax.jit(venv.reset)(key, params)
    step = jax.jit(venv.step)
    act = {
        "action": jnp.ones((64, 2)) * 0.5,
        "prediction": jnp.zeros((64, 2)),
    }
    terms = 0
    for i in range(40):
        key, k = jax.random.split(key)
        obs, state, reward, term, trunc, info = step(k, state, act, params)
        terms += int(np.asarray(term).sum())
    assert terms > 0  # envs walk out of bounds and reset per-env
    assert np.all(np.abs(np.asarray(obs["noisy_position"])) <= 2.0)
