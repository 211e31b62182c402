"""Two-process jax.distributed smoke worker (driven by test_distrib.py).

Each process owns 2 virtual CPU devices (4 global); process 0 also runs the
solo (unsharded, local-device) rollout with the same key and prints both
results as one JSON line, so the parent test can assert sharded == solo —
the same numerics pin the in-process virtual-mesh tests make, but across a
REAL process boundary: init_distributed, the global mesh, cross-process
device_put of host-sharded map banks, and GSPMD partitioning of the rollout
all execute for real.

Usage: _distrib_worker.py <coordinator_address> <process_id> <num_processes>
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main() -> None:
    coord, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from apx.distrib import (
        EnvSharding,
        init_distributed,
        make_env_mesh,
        shard_params,
        sharded_rollout,
    )

    init_distributed(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    ndev = jax.device_count()
    assert ndev == 2 * nproc, ndev

    from apx.core.env import AutoResetMode, rollout, vmap_vector_env
    from apx.data.floor_map import make_rooms_bank
    from apx.envs.lidar_localization import LIDARLocalizationEnv
    from apx.wrappers import TimeLimit

    n = 8
    env = TimeLimit(
        LIDARLocalizationEnv(map_bank=make_rooms_bank(num_maps=8)),
        max_episode_steps=6,
        issue_termination=True,
    )
    params = env.default_params()
    venv = vmap_vector_env(env, n, AutoResetMode.NEXT_STEP)

    def policy(k, obs):
        ka, kp = jax.random.split(k)
        return {
            "action": jax.random.uniform(ka, (n, 2), minval=-1.0, maxval=1.0),
            "prediction": jax.random.uniform(kp, (n, 2), minval=-1.0, maxval=1.0),
        }

    mesh = make_env_mesh()
    sharding = EnvSharding(mesh)
    # Host-sharded bank: every MapBank leaf leads with num_maps, split over
    # the global env axis — resets then gather maps ACROSS processes.
    sparams = shard_params(sharding, params, shard_leading=True)
    run = sharded_rollout(venv, sharding, sparams, policy, 13)
    key = jax.random.key(7)
    _, rmean, dones = run(key)
    out = {"rmean": float(rmean), "dones": int(dones)}

    if pid == 0:
        # Solo reference on local devices: same key, same policy, plain scan.
        _, _, (rewards, terms, truncs) = jax.jit(
            lambda k: rollout(venv, params, policy, k, 13)
        )(key)
        out["solo_rmean"] = float(jnp.mean(rewards))
        out["solo_dones"] = int(jnp.sum(terms | truncs))
        print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
