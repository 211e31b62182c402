"""Catalog-wide smoke: every registered env id constructs, resets, steps.

The cheap families (CircleSquare*, LightDark, LIDAR*) are exercised for
every id; HF-backed ids (shared cached banks) through one id per dataset
family. Set APX_FULL_CATALOG=1 to sweep all 158 ids.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import apx


def _smoke_ids():
    ids = apx.env_ids()
    if os.environ.get("APX_FULL_CATALOG"):
        return ids
    cheap = [
        i for i in ids
        if i.startswith(("CircleSquare", "DoubleCircleSquare", "LightDark", "LIDAR"))
    ]
    hf_rep = [
        "MNIST-v0", "MNIST-test-v0", "MNISTLoc-v0", "CIFAR10-v0",
        "CIFAR10-c3-v0", "CIFAR10Loc-sparse-v0",
    ]
    return cheap + hf_rep


@pytest.mark.parametrize("env_id", _smoke_ids())
def test_env_id_smoke(env_id):
    venv, params = apx.make_vec(env_id, num_envs=2)
    key = jax.random.PRNGKey(0)
    obs, state, info = venv.reset(key, params)
    act_shape = venv.env.inner_action_space(params).shape
    pred_space = venv.env.prediction_space(params)
    pred = (
        ()
        if not getattr(pred_space, "shape", None)
        else jnp.zeros((2, *pred_space.shape))
    )
    act = {"action": jnp.full((2, *act_shape), 0.3), "prediction": pred}
    for i in range(2):
        obs, state, r, te, tr, info = venv.step(
            jax.random.fold_in(key, i), state, act, params
        )
    assert np.isfinite(np.asarray(r, dtype=np.float64)).all()
    assert "base_reward" in info and "prediction" in info
    # Every env's observations must lie in its declared observation space
    # (checked per env after two steps — catches drifting normalizations
    # and out-of-range time/odometry channels catalog-wide).
    space = venv.env.observation_space(params)
    for i in range(2):
        single = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], obs)
        assert space.contains(single), env_id
