"""Functional-API example: jitted random-policy rollout on any env.

Counterpart of the reference's example scripts (example/*.py), which drive
random policies through the gymnasium API one step at a time; here the
whole rollout is one lax.scan on device.

Run: python examples/rollout_functional.py [env_id] [num_envs] [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

import apx


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "LIDARLocRooms-v0"
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    venv, params = apx.make_vec(env_id, num_envs=num_envs, metrics=True)
    act_space = venv.env.inner_action_space(params)
    pred_space = venv.env.prediction_space(params)

    def policy(key, obs):
        ka, kp = jax.random.split(key)
        return {
            "action": jax.random.uniform(
                ka, (num_envs, *act_space.shape), minval=-1.0, maxval=1.0
            ),
            "prediction": jax.random.normal(kp, (num_envs, *pred_space.shape)),
        }

    @jax.jit
    def run(key):
        rk, sk = jax.random.split(key)
        obs, state, _ = venv.reset(rk, params)

        def body(carry, k):
            obs, state = carry
            pk, s = jax.random.split(k)
            act = policy(pk, obs)
            obs2, state2, reward, term, trunc, info = venv.step(s, state, act, params)
            done = term | trunc
            stats = info["stats"]["scalar"]
            metric = next(
                stats[k] for k in stats if k.startswith("avg_") and not k.startswith("_")
            )
            return (obs2, state2), (reward.mean(), done.sum(), jnp.nanmean(metric))

        keys = jax.random.split(sk, steps)
        _, (rewards, dones, metric) = jax.lax.scan(body, (obs, state), keys)
        return rewards.mean(), dones.sum(), metric

    t0 = time.perf_counter()
    mean_r, episodes, metric = jax.block_until_ready(run(jax.random.PRNGKey(0)))
    dt = time.perf_counter() - t0
    print(f"{env_id}: {num_envs * steps / dt:,.0f} env-steps/s "
          f"(incl. compile), mean reward {float(mean_r):+.3f}, "
          f"{int(episodes)} episodes finished")


if __name__ == "__main__":
    main()
