"""End-to-end training example: PPO-style actor-critic + predictor on
LIDARLocRooms, everything (env rollout + learner) inside one jitted step.

Demonstrates the point of the active-perception reward contract: the
prediction head is trained through the differentiable env loss, while the
policy is trained on the composite reward. Runs on a single chip or,
sharded over the env axis, on a full mesh (see apx.distrib).

Run: python examples/train_ppo_lidar.py [num_envs] [iterations]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import apx


def mlp_init(key, sizes):
    params = []
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, k = jax.random.split(key)
        params.append(
            {
                "w": jax.random.normal(k, (a, b)) * jnp.sqrt(2.0 / a),
                "b": jnp.zeros(b),
            }
        )
    return params


def mlp_apply(params, x):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            x = jnp.tanh(x)
    return x


def flatten_obs(obs):
    parts = [obs["lidar"], obs["odometry"], obs["time_step"][..., None]]
    if "map" in obs:
        parts.append(obs["map"].reshape(obs["map"].shape[0], -1))
    return jnp.concatenate(parts, axis=-1)


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rollout_len = 32

    venv, params = apx.make_vec("LIDARLocRooms-v0", num_envs=num_envs)
    key = jax.random.PRNGKey(0)
    obs0, state0, _ = venv.reset(key, params)
    obs_dim = flatten_obs(obs0).shape[-1]

    key, k1, k2 = jax.random.split(key, 3)
    net = {
        "policy": mlp_init(k1, [obs_dim, 256, 256, 4]),  # mean(2) + logstd(2)
        "value": mlp_init(k2, [obs_dim, 256, 1]),
        "pred": mlp_init(jax.random.fold_in(key, 7), [obs_dim, 256, 2]),
    }
    opt = optax.adam(3e-4)
    opt_state = opt.init(net)

    def act(net, obs_flat, k):
        out = mlp_apply(net["policy"], obs_flat)
        mean, logstd = out[..., :2], jnp.clip(out[..., 2:], -3, 0)
        a = mean + jnp.exp(logstd) * jax.random.normal(k, mean.shape)
        logp = -0.5 * jnp.sum(
            ((a - mean) / jnp.exp(logstd)) ** 2 + 2 * logstd, axis=-1
        )
        return jnp.tanh(a), logp

    @jax.jit
    def train_iter(net, opt_state, env_state, obs, key):
        def loss_fn(net):
            def body(carry, k):
                obs, st = carry
                flat = flatten_obs(obs)
                ka, ks = jax.random.split(k)
                a, logp = act(net, flat, ka)
                pred = jnp.tanh(mlp_apply(net["pred"], flat))
                # Policy grads flow via the score function (logp); the
                # prediction head trains directly through the env's
                # differentiable loss term in the reward.
                obs2, st2, r, te, tr, info = venv.step(
                    ks, st,
                    {"action": jax.lax.stop_gradient(a), "prediction": pred},
                    params,
                )
                v = mlp_apply(net["value"], flat)[..., 0]
                return (obs2, st2), (r, logp, v, flat)

            keys = jax.random.split(key, rollout_len)
            (obs_f, st_f), (rs, logps, vs, flats) = jax.lax.scan(
                body, (obs, env_state), keys
            )
            returns = jnp.cumsum(rs[::-1], axis=0)[::-1]  # undiscounted-ish
            adv = jax.lax.stop_gradient(returns) - vs
            pg = -(jax.lax.stop_gradient(adv) * logps).mean()
            vloss = jnp.square(adv).mean()
            return pg + 0.5 * vloss - rs.mean(), (obs_f, st_f, rs.mean())

        (loss, (obs_f, st_f, mean_r)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(net)
        updates, opt_state2 = opt.update(grads, opt_state)
        net2 = optax.apply_updates(net, updates)
        return net2, opt_state2, st_f, obs_f, mean_r

    t0 = time.perf_counter()
    env_state, obs = state0, obs0
    for i in range(iters):
        key, k = jax.random.split(key)
        net, opt_state, env_state, obs, mean_r = train_iter(
            net, opt_state, env_state, obs, k
        )
        if i % 5 == 0 or i == iters - 1:
            print(f"iter {i}: mean step reward {float(mean_r):+.4f}")
    jax.block_until_ready(obs)
    sps = num_envs * rollout_len * iters / (time.perf_counter() - t0)
    print(f"{sps:,.0f} env-steps/s including learner update and compile")


if __name__ == "__main__":
    main()
