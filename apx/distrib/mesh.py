"""Device-mesh scaling for the env engine.

The reference's only parallelism is an env batch stepped in one Python
call (SURVEY §2.7); there is no distributed machinery to port. The
TPU-native scaling axis is the same env batch, sharded over a
``jax.sharding.Mesh``:

  * axis "env": the env-batch data-parallel axis — states, obs, rewards,
    dones are all sharded along it; every env's dynamics are independent,
    so stepping inserts ZERO collectives (XLA partitions the vmapped step
    trivially). This axis spans hosts x chips; within a slice the (rare)
    collectives ride ICI.
  * params (datasets, map banks) are replicated per device by default —
    they are read-only and modest (uint8 banks); `shard_params` can
    instead shard a bank along its leading axis for corpora that exceed
    per-device HBM, at the cost of cross-device gathers at reset.

Metric reductions (mean reward, episode stats) are `psum`s over "env"
(see metrics.py). Multi-host entry: call `jax.distributed.initialize()`
before `make_env_mesh()`; everything below is process-count agnostic
because GSPMD addresses the global mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.env import VectorAPEnv

__all__ = [
    "EnvSharding",
    "make_env_mesh",
    "shard_env_batch",
    "shard_params",
    "sharded_vector_env_step",
    "sharded_rollout",
]


def init_distributed(**kwargs) -> None:
    """Multi-host entry: jax.distributed.initialize (idempotent). Call on
    every host before make_env_mesh(); afterwards jax.devices() is the
    global device list and GSPMD addresses the whole slice."""
    already = getattr(jax.distributed, "is_initialized", None)
    if already is not None and already():
        return  # idempotent: a second call is a no-op
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        # A raced double-initialize (another thread won between the check
        # and the call) is still idempotent; anything else — in particular
        # "must be called before any JAX calls" (someone touched
        # jax.devices() first) — must propagate, or each host silently
        # proceeds as its own single-process run with local-only devices.
        # State is queried rather than matching the error text, which is
        # not API and varies across JAX releases.
        if already is not None and already():
            return
        raise


def make_env_mesh(num_devices: int | None = None, axis_name: str = "env") -> Mesh:
    """1-D mesh over all (or the first N) global devices."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), axis_names=(axis_name,))


@dataclasses.dataclass(frozen=True)
class EnvSharding:
    """Sharding bundle for a vectorized env on a mesh."""

    mesh: Mesh
    axis_name: str = "env"

    @property
    def batch(self) -> NamedSharding:
        """Leading-axis sharding for anything with an env-batch dimension."""
        return NamedSharding(self.mesh, P(self.axis_name))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def num_devices(self) -> int:
        return int(np.prod(self.mesh.devices.shape))


def shard_env_batch(sharding: EnvSharding, tree: Any) -> Any:
    """Place every leaf with its leading axis split over the env axis."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding.batch), tree
    )


def shard_params(sharding: EnvSharding, params: Any, shard_leading: bool = False):
    """Replicate params across the mesh (default), or shard dataset banks
    along their leading axis when they exceed per-device HBM."""
    target = sharding.batch if shard_leading else sharding.replicated
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, target), params)


def sharded_vector_env_step(
    venv: VectorAPEnv, sharding: EnvSharding
) -> Callable:
    """jitted step with explicit env-axis output shardings — states stay
    resident and sharded across steps; no host round-trips."""
    bs = sharding.batch

    @jax.jit
    def step(key, state, full_action, params):
        obs, st, reward, term, trunc, info = venv.step(
            key, state, full_action, params
        )
        return (
            jax.lax.with_sharding_constraint(obs, bs),
            jax.lax.with_sharding_constraint(st, bs),
            jax.lax.with_sharding_constraint(reward, bs),
            term,
            trunc,
            info,
        )

    return step


def sharded_rollout(
    venv: VectorAPEnv,
    sharding: EnvSharding,
    params,
    policy_fn: Callable[[jax.Array, Any], dict[str, Any]],
    num_steps: int,
    episodic_period: int | None = None,
):
    """jitted lax.scan rollout over a sharded env batch. Returns
    (rollout_fn(key) -> (final_state, mean_reward, done_count)); the
    reductions are psums over the env axis inserted by GSPMD.

    ``episodic_period``: for LOCKSTEP envs with fixed ``period``-step
    episodes, hoist the reset boundary out of the scan exactly like
    ``apx.core.env.rollout_episodic`` (cond-free inner steps; 1.3-3.6x
    single-chip, same trajectories)."""
    import dataclasses as _dc

    from ..core.env import AutoResetMode

    bs = sharding.batch
    inner_venv = venv
    if episodic_period is not None:
        assert venv.autoreset is AutoResetMode.LOCKSTEP
        inner_venv = _dc.replace(venv, autoreset=AutoResetMode.DISABLED)

    # params enters jit as an ARGUMENT, not a closure constant: closed-over
    # arrays are baked into the compile payload, which duplicates GB-scale
    # dataset banks into the executable (and overflows the axon relay's
    # remote-compile transport). The public signature run(key) is preserved
    # by the partial application below.
    @jax.jit
    def run(key, params):
        rkey, skey = jax.random.split(key)
        obs0, state0, _ = venv.reset(rkey, params)
        obs0 = jax.lax.with_sharding_constraint(obs0, bs)
        state0 = jax.lax.with_sharding_constraint(state0, bs)

        def body(carry, k):
            obs, state = carry
            pk, sk = jax.random.split(k)
            act = policy_fn(pk, obs)
            obs2, state2, reward, term, trunc, _ = inner_venv.step(
                sk, state, act, params
            )
            obs2 = jax.lax.with_sharding_constraint(obs2, bs)
            state2 = jax.lax.with_sharding_constraint(state2, bs)
            return (obs2, state2), (reward.mean(), (term | trunc).sum())

        keys = jax.random.split(skey, num_steps)
        if episodic_period is None:
            (obs_f, state_f), (rmeans, dones) = jax.lax.scan(
                body, (obs0, state0), keys
            )
            return state_f, rmeans.mean(), dones.sum()

        from ..core.env import segmented_scan

        def boundary_body(carry, k):
            obs, state = carry
            pk, sk = jax.random.split(k)
            act = policy_fn(pk, obs)
            obs2, state2, reward, term, trunc, _ = venv.boundary_reset_step(
                sk, state, act, params
            )
            obs2 = jax.lax.with_sharding_constraint(obs2, bs)
            state2 = jax.lax.with_sharding_constraint(state2, bs)
            return (obs2, state2), (reward.mean(), (term | trunc).sum())

        (obs_f, state_f), (rmeans, dones) = segmented_scan(
            body, boundary_body, (obs0, state0), keys, episodic_period
        )
        return state_f, rmeans.mean(), dones.sum()

    return lambda key: run(key, params)
