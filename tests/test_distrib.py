"""Mesh-sharding tests on the 8-device virtual CPU mesh (SURVEY §4(d))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import apx
from apx.distrib import (
    EnvSharding,
    episode_stats_psum,
    make_env_mesh,
    shard_env_batch,
    shard_params,
    sharded_rollout,
    sharded_vector_env_step,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_env_mesh(8)


def _policy(n, act_dim, pred_dim):
    def policy(key, obs):
        ka, kp = jax.random.split(key)
        return {
            "action": jax.random.uniform(ka, (n, act_dim), minval=-1, maxval=1),
            "prediction": jax.random.normal(kp, (n, pred_dim)),
        }

    return policy


@pytest.mark.parametrize("env_id", ["CircleSquare-s15-v0", "LIDARLocRooms-v0"])
def test_sharded_rollout_runs_and_shards(mesh, env_id):
    n = 32
    venv, params = apx.make_vec(env_id, num_envs=n)
    sharding = EnvSharding(mesh)
    params = shard_params(sharding, params)
    pred_dim = venv.env.prediction_space(params).shape[-1]
    run = sharded_rollout(venv, sharding, params, _policy(n, 2, pred_dim), 12)
    state_f, mean_r, dones = jax.block_until_ready(run(jax.random.PRNGKey(0)))
    assert np.isfinite(float(mean_r))
    # The final state is genuinely sharded over the env axis.
    leaf = jax.tree_util.tree_leaves(state_f)[0]
    assert len(leaf.sharding.device_set) == 8


def test_sharded_step_matches_unsharded(mesh):
    """Sharding must not change numerics: one step on the mesh == one step
    replicated on a single device."""
    n = 16
    venv, params = apx.make_vec("CircleSquare-s15-v0", num_envs=n)
    key = jax.random.PRNGKey(0)
    obs, state, _ = venv.reset(key, params)
    act = {
        "action": jnp.full((n, 2), 0.3),
        "prediction": jnp.zeros((n, 2)),
    }
    ref_obs, ref_state, ref_r, *_ = jax.jit(venv.step)(key, state, act, params)

    sharding = EnvSharding(mesh)
    sp = shard_params(sharding, params)
    sstate = shard_env_batch(sharding, state)
    step = sharded_vector_env_step(venv, sharding)
    s_obs, s_state, s_r, *_ = step(key, sstate, act, sp)
    np.testing.assert_allclose(np.asarray(ref_r), np.asarray(s_r), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ref_obs["glimpse"]), np.asarray(s_obs["glimpse"]), rtol=1e-6
    )
    assert len(s_r.sharding.device_set) == 8


def test_episode_stats_psum(mesh):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = 16
    stats = {
        "avg_mse": jnp.arange(n, dtype=jnp.float32),
        "_avg_mse": jnp.ones(n, dtype=bool),
    }
    done = jnp.array([True, False] * (n // 2))

    f = shard_map(
        lambda s, d: episode_stats_psum(s, d),
        mesh=mesh,
        in_specs=(P("env"), P("env")),
        out_specs=P(),
    )
    out = f(stats, done)
    expect = np.arange(n)[::2].sum() / (n // 2)
    np.testing.assert_allclose(float(out["avg_mse"]), expect, rtol=1e-6)
    assert float(out["episodes"]) == n // 2
