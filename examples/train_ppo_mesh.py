"""Mesh-sharded PPO: data-parallel env axis x tensor-parallel learner.

The scaling recipe promised by ROADMAP item 4, on the same real PPO as
train_ppo_lidar.py (CNN encoder, GAE, clipping, minibatch epochs — the
training math is literally the same function, `make_train_iter`; this
file only adds shardings). Axes of the 2-D `jax.sharding.Mesh`:

  * ``data`` — the env batch. Env states, observations and every rollout
    tensor shard on their env dimension; each device steps only its own
    envs, with ZERO collectives (env dynamics are independent, so GSPMD
    partitions the vmapped step trivially — cf. apx/distrib/mesh.py).
    Network and optimizer state are REPLICATED over ``data``, so the
    minibatch gradient reduction becomes the classic data-parallel
    all-reduce, inserted by GSPMD where the loss mean crosses the axis.
  * ``model`` — the learner's hidden dimension, Megatron-style 1-D
    tensor parallelism: the encoder projections (`prop`, `map_proj`) are
    column-parallel (weight columns + bias sharded, activations carry a
    sharded hidden dim), the `trunk` is row-parallel (weight rows
    sharded, its matmul contracts over the sharded dim and GSPMD psums
    the partial products over ``model``). Heads and the small convs stay
    replicated — at 256 hidden they are latency-, not FLOPs-bound.

No pmap, no manual collectives: placement of the *inputs* (device_put
with NamedShardings) plus GSPMD propagation through the jitted
`train_iter` yields the dp x tp program. `optax.adam`'s moments inherit
the net's shardings because `opt.init` runs on the already-placed net.

Run: python examples/train_ppo_mesh.py [num_envs] [iterations]
On a real multi-device slice it uses all devices (e.g. 4 data x 2 model
on 8 chips). With fewer than 2 devices it re-execs itself onto a virtual
8-device CPU mesh (announced on stderr) so the recipe stays runnable
anywhere; pass --virtual to force that mode directly. Validated on the
virtual mesh by tests/test_distrib.py.
"""

import os
import sys

_FORCE_VIRTUAL = __name__ == "__main__" and "--virtual" in sys.argv
if _FORCE_VIRTUAL:
    # Append (not setdefault): a pre-existing XLA_FLAGS must not silently
    # swallow the device-count flag and degrade this to a 1x1 mesh.
    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax

if _FORCE_VIRTUAL:
    jax.config.update("jax_platforms", "cpu")

if __name__ == "__main__" and not _FORCE_VIRTUAL and jax.device_count() < 2:
    print(
        "train_ppo_mesh: only 1 device visible — re-exec'ing onto a "
        "virtual 8-device CPU mesh (pass --virtual to silence this)",
        file=sys.stderr,
        flush=True,
    )
    os.execv(sys.executable, [sys.executable, *sys.argv, "--virtual"])

import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import apx
from examples.train_ppo_lidar import init_net, make_train_iter


def make_dp_tp_mesh(devices=None):
    """(data, model) mesh over the given (default: all) devices — the
    widest even split donates a factor of 2 to ``model``."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    model = 2 if n % 2 == 0 and n >= 2 else 1
    data = n // model
    return Mesh(
        np.array(devices[: data * model]).reshape(data, model),
        axis_names=("data", "model"),
    )


def net_shardings(mesh):
    """NamedSharding tree for the PPO net (see module docstring):
    column-parallel encoder projections, row-parallel trunk, everything
    else replicated (over ``model``; everything is replicated over
    ``data``)."""
    col = {"w": NamedSharding(mesh, P(None, "model")),
           "b": NamedSharding(mesh, P("model"))}
    row = {"w": NamedSharding(mesh, P("model", None)),
           "b": NamedSharding(mesh, P())}
    rep2 = {"w": NamedSharding(mesh, P()), "b": NamedSharding(mesh, P())}
    return {
        "conv1": rep2, "conv2": rep2,
        "map_proj": col, "prop": col,
        "trunk": row,
        "policy": rep2, "value": rep2, "pred": rep2,
    }


def shard_net(net, mesh):
    return jax.tree_util.tree_map(jax.device_put, net, net_shardings(mesh))


def main(num_envs=None, iters=None, quiet=False):
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    num_envs = num_envs or (int(argv[0]) if len(argv) > 0 else 256)
    iters = iters or (int(argv[1]) if len(argv) > 1 else 10)
    rollout_len = 16

    mesh = make_dp_tp_mesh()
    data_dim = mesh.devices.shape[0]
    assert num_envs % data_dim == 0, (num_envs, data_dim)
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    venv, params = apx.make_vec("LIDARLocRooms-v0", num_envs=num_envs)
    key = jax.random.PRNGKey(0)
    obs0, state0, _ = venv.reset(key, params)
    # Placement IS the parallelism: env batch over `data`, banks
    # replicated, net per the tp spec. GSPMD propagates from here.
    state0 = jax.device_put(state0, dp)
    obs0 = jax.device_put(obs0, dp)
    params = jax.device_put(params, rep)

    key, knet = jax.random.split(key)
    net = shard_net(init_net(knet, params.map_bank.map_hw), mesh)
    opt = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4))
    opt_state = opt.init(net)  # moments inherit the net's shardings

    train_iter = jax.jit(make_train_iter(venv, opt, num_envs, rollout_len))

    t0 = time.perf_counter()
    env_state, obs, mean_r = state0, obs0, None
    for i in range(iters):
        key, k = jax.random.split(key)
        net, opt_state, env_state, obs, mean_r = train_iter(
            net, opt_state, env_state, obs, k, params
        )
        if not quiet and (i % 5 == 0 or i == iters - 1):
            print(f"iter {i}: mean step reward {float(mean_r):+.4f}")
    jax.block_until_ready(obs)
    sps = num_envs * rollout_len * iters / (time.perf_counter() - t0)

    # The program really ran dp x tp: trained trunk rows stay sharded
    # over `model`, env state stays sharded over `data`.
    ndev = mesh.devices.size
    assert len(net["trunk"]["w"].sharding.device_set) == ndev
    assert not net["trunk"]["w"].sharding.is_fully_replicated or ndev == 1
    leaf = jax.tree_util.tree_leaves(env_state)[0]
    assert len(leaf.sharding.device_set) == ndev
    if not quiet:
        print(
            f"{sps:,.0f} env-steps/s incl. learner update + compile on a "
            f"{mesh.devices.shape[0]}x{mesh.devices.shape[1]} (data, model) mesh"
        )
    return float(mean_r)


if __name__ == "__main__":
    main()
