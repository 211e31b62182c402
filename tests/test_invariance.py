"""jit/vmap invariance (SURVEY §4(c)) and checkpoint round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import apx
from apx.core.env import AutoResetMode, vmap_vector_env


@pytest.mark.parametrize("env_id", ["CircleSquare-s15-v0", "LightDark-v0",
                                    "LIDARLocMazeStatic-v0"])
def test_vmap_slice_invariance(env_id):
    """Env k of an N-env batch must produce exactly what a 1-env batch
    started from the same per-env key produces."""
    entry = apx.registry()[env_id]
    env = entry.build()
    params = env.default_params()
    n = 5
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, n)
    obs_n, state_n, _ = jax.vmap(env.reset, in_axes=(0, None))(keys, params)

    step_keys = jax.random.split(jax.random.PRNGKey(1), n)
    act = jnp.linspace(-0.5, 0.5, n * 2).reshape(n, 2)
    pred = jnp.zeros((n, 2))
    r_n = jax.vmap(lambda k, s, a, p: env.step_env(k, s, a, p, params))(
        step_keys, state_n, act, pred
    )

    for i in [0, n - 1]:
        obs_1, state_1, _ = env.reset(keys[i], params)
        r_1 = env.step_env(step_keys[i], state_1, act[i], pred[i], params)
        np.testing.assert_array_equal(
            np.asarray(r_1.base_reward), np.asarray(r_n.base_reward[i])
        )
        for leaf_n, leaf_1 in zip(
            jax.tree_util.tree_leaves(r_n.obs), jax.tree_util.tree_leaves(r_1.obs)
        ):
            np.testing.assert_array_equal(np.asarray(leaf_n[i]), np.asarray(leaf_1))


def test_jit_nojit_equivalence():
    env, params = apx.make("LightDark-v0")
    key = jax.random.PRNGKey(3)
    obs_a, state_a, _ = env.reset(key, params)
    obs_b, state_b, _ = jax.jit(env.reset)(key, params)
    np.testing.assert_allclose(
        np.asarray(obs_a["noisy_position"]),
        np.asarray(obs_b["noisy_position"]),
        rtol=1e-6,
    )
    act = {"action": jnp.array([0.2, -0.1]), "prediction": jnp.zeros(2)}
    out_a = env.step(key, state_a, act, params)
    out_b = jax.jit(env.step)(key, state_b, act, params)
    np.testing.assert_allclose(float(out_a[2]), float(out_b[2]), rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from apx.utils import restore_state, save_state

    venv, params = apx.make_vec("CircleSquare-s15-v0", num_envs=4)
    key = jax.random.PRNGKey(0)
    obs, state, _ = venv.reset(key, params)
    act = {"action": jnp.zeros((4, 2)), "prediction": jnp.zeros((4, 2))}
    obs, state, *_ = venv.step(key, state, act, params)

    save_state(str(tmp_path / "ck"), state)
    restored = restore_state(str(tmp_path / "ck"), state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Continuing from the restored state is bit-identical.
    o1, s1, r1, *_ = venv.step(key, state, act, params)
    o2, s2, r2, *_ = venv.step(key, restored, act, params)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_learner_checkpoint_resume_bit_identical(tmp_path):
    """Mid-TRAINING checkpoint/resume: the full PPO train state (net +
    optimizer moments + env state + obs + key) orbax-round-trips and the
    continued training run is bit-identical to the uninterrupted one."""
    pytest.importorskip("orbax.checkpoint")
    import optax

    from apx.utils import restore_state, save_state
    from examples.train_ppo_lidar import init_net, make_train_iter

    n, rollout = 8, 4
    venv, params = apx.make_vec("LIDARLocRooms-v0", num_envs=n)
    key = jax.random.PRNGKey(11)
    obs, env_state, _ = venv.reset(key, params)
    net = init_net(jax.random.PRNGKey(12), params.map_bank.map_hw)
    opt = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4))
    opt_state = opt.init(net)
    train_iter = jax.jit(
        make_train_iter(venv, opt, n, rollout, num_minibatches=2)
    )

    def run(steps, carry):
        net, opt_state, env_state, obs, key = carry
        for _ in range(steps):
            key, k = jax.random.split(key)
            net, opt_state, env_state, obs, _ = train_iter(
                net, opt_state, env_state, obs, k, params
            )
        return net, opt_state, env_state, obs, key

    carry = run(2, (net, opt_state, env_state, obs, key))
    save_state(str(tmp_path / "train_ck"), carry)
    final_a = run(2, carry)

    restored = restore_state(str(tmp_path / "train_ck"), carry)
    final_b = run(2, restored)
    for a, b in zip(
        jax.tree_util.tree_leaves(final_a[0]),
        jax.tree_util.tree_leaves(final_b[0]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
