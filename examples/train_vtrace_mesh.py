"""IMPALA-style V-trace actor-critic on the (data, model) mesh.

Completes the learner-side recipe set (ROADMAP item 4): where
train_ppo_lidar.py is the on-policy recipe, this is the OFF-policy one —
the single-program JAX form of IMPALA's actor/learner decoupling:

  * a lagged BEHAVIOR copy of the network collects the rollout (synced
    to the learner weights every ``sync_every`` iterations inside the
    jitted update via a where-select on the iteration counter — the
    staleness that a distributed actor fleet would have);
  * the learner corrects the off-policy gap with V-trace
    (rho/c-clipped importance weights, reverse-scan recursion over the
    rollout) and trains policy (V-trace policy gradient), value
    (vs-target MSE), entropy, and the prediction head THROUGH the env's
    differentiable loss term, exactly like the PPO recipe;
  * everything runs as ONE jitted function per iteration; the same
    device_put placement as train_ppo_mesh.py makes it dp x tp (env
    batch data-parallel over "data", Megatron-style tensor-parallel
    trunk over "model") with GSPMD inserting every collective.

Run: python examples/train_vtrace_mesh.py [num_envs] [iterations]
(re-execs onto a virtual 8-device CPU mesh when <2 devices are visible,
like train_ppo_mesh.py). Validated on the virtual mesh by
tests/test_distrib.py::test_mesh_vtrace_trains.
"""

import os
import sys

_FORCE_VIRTUAL = __name__ == "__main__" and "--virtual" in sys.argv
if _FORCE_VIRTUAL:
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
        "train_vtrace_mesh: only 1 device visible — re-exec'ing onto a "
        "virtual 8-device CPU mesh (pass --virtual to silence this)",
        file=sys.stderr,
        flush=True,
    )
    os.execv(sys.executable, [sys.executable, *sys.argv, "--virtual"])

import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

import apx
from examples.train_ppo_lidar import (
    apply_dense,
    encode,
    init_net,
    logp_gauss,
    policy_dist,
)
from examples.train_ppo_mesh import make_dp_tp_mesh, shard_net


def vtrace(rewards, values, value_last, log_rhos, dones, gamma=0.99,
           rho_bar=1.0, c_bar=1.0):
    """V-trace targets and policy-gradient advantages (IMPALA eq. 1).

    rewards/values/log_rhos/dones: (T, N); value_last: (N,).
    Returns (vs (T, N), pg_adv (T, N))."""
    rho = jnp.minimum(jnp.exp(log_rhos), rho_bar)
    c = jnp.minimum(jnp.exp(log_rhos), c_bar)
    nonterm = 1.0 - dones.astype(jnp.float32)
    v_next = jnp.concatenate([values[1:], value_last[None]], axis=0)
    deltas = rho * (rewards + gamma * nonterm * v_next - values)

    def body(acc, x):
        delta_t, c_t, nt_t = x
        acc = delta_t + gamma * nt_t * c_t * acc
        return acc, acc

    _, dv = jax.lax.scan(
        body, jnp.zeros_like(value_last), (deltas, c, nonterm), reverse=True
    )
    vs = values + dv
    vs_next = jnp.concatenate([vs[1:], value_last[None]], axis=0)
    pg_adv = rho * (rewards + gamma * nonterm * vs_next - values)
    return jax.lax.stop_gradient(vs), jax.lax.stop_gradient(pg_adv)


def make_train_iter(
    venv,
    opt,
    num_envs,
    rollout_len=16,
    gamma=0.99,
    ent_coef=1e-3,
    vf_coef=0.5,
    pred_coef=1.0,
    sync_every=4,
):
    """One V-trace iteration as a jittable pure function.

    carry: (net, behavior_net, opt_state, env_state, obs, it). The
    behavior net collects; the learner corrects with V-trace. ``params``
    is a jit ARGUMENT (GB-scale banks must never be closure constants,
    PERF.md round 3)."""

    def train_iter(net, beh_net, opt_state, env_state, obs, it, key, params):
        # ---- collect with the BEHAVIOR policy (prediction head of the
        # learner net trains through the differentiable -loss term) ------
        def rollout_loss(net):
            def body(carry, k):
                obs, st = carry
                zb = encode(beh_net, obs)
                mean_b, logstd_b = policy_dist(beh_net, zb)
                ka, ks = jax.random.split(k)
                a_raw = mean_b + jnp.exp(logstd_b) * jax.random.normal(
                    ka, mean_b.shape
                )
                a = jnp.tanh(a_raw)
                # prediction comes from the LEARNER net: its gradient
                # flows through the composite reward's -loss term.
                pred = apply_dense(net["pred"], encode(net, obs), jnp.tanh)
                obs2, st2, r, te, tr, _ = venv.step(
                    ks, st,
                    {"action": jax.lax.stop_gradient(a), "prediction": pred},
                    params,
                )
                logp_b = logp_gauss(a_raw, mean_b, logstd_b)
                out = (
                    jax.lax.stop_gradient(obs),
                    jax.lax.stop_gradient(a_raw),
                    r,
                    jax.lax.stop_gradient(te | tr),
                    jax.lax.stop_gradient(logp_b),
                )
                return (obs2, st2), out

            keys = jax.random.split(key, rollout_len)
            (obs_f, st_f), (obs_t, araw_t, r_t, done_t, logp_b_t) = jax.lax.scan(
                body, (obs, env_state), keys
            )
            return -pred_coef * r_t.mean(), (
                obs_f, st_f, obs_t, araw_t, r_t, done_t, logp_b_t
            )

        (_, (obs_f, st_f, obs_t, araw_t, r_t, done_t, logp_b_t)), pred_grads = (
            jax.value_and_grad(rollout_loss, has_aux=True)(net)
        )
        r_t = jax.lax.stop_gradient(r_t)

        # ---- V-trace learner update -------------------------------------
        def learner_loss(net):
            flat_obs = jax.tree_util.tree_map(
                lambda x: x.reshape((-1,) + x.shape[2:]), obs_t
            )
            z = encode(net, flat_obs)
            v = apply_dense(net["value"], z)[..., 0].reshape(
                rollout_len, num_envs
            )
            mean, logstd = policy_dist(
                net, z.reshape(rollout_len, num_envs, -1)
            )
            logp = logp_gauss(araw_t, mean, logstd)
            v_last = apply_dense(net["value"], encode(net, obs_f))[..., 0]
            vs, pg_adv = vtrace(
                r_t, jax.lax.stop_gradient(v), jax.lax.stop_gradient(v_last),
                jax.lax.stop_gradient(logp) - logp_b_t, done_t, gamma,
            )
            pg = -(pg_adv * logp).mean()
            vloss = 0.5 * jnp.square(v - vs).mean()
            ent = jnp.sum(
                logstd + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1
            ).mean()
            return pg + vf_coef * vloss - ent_coef * ent

        grads = jax.grad(learner_loss)(net)
        grads = jax.tree_util.tree_map(jnp.add, grads, pred_grads)
        updates, opt_state = opt.update(grads, opt_state, net)
        net = optax.apply_updates(net, updates)

        # ---- behavior sync every sync_every iterations ------------------
        do_sync = (it + 1) % sync_every == 0
        beh_net = jax.tree_util.tree_map(
            lambda b, n: jnp.where(do_sync, n, b), beh_net, net
        )
        return net, beh_net, opt_state, st_f, obs_f, it + 1, r_t.mean()

    return train_iter


def main(num_envs=None, iters=None, quiet=False):
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    num_envs = num_envs or (int(argv[0]) if len(argv) > 0 else 256)
    iters = iters or (int(argv[1]) if len(argv) > 1 else 12)
    rollout_len = 16

    mesh = make_dp_tp_mesh()
    data_dim = mesh.devices.shape[0]
    assert num_envs % data_dim == 0, (num_envs, data_dim)
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    venv, params = apx.make_vec("LIDARLocRooms-v0", num_envs=num_envs)
    key = jax.random.PRNGKey(0)
    obs0, state0, _ = venv.reset(key, params)
    state0 = jax.device_put(state0, dp)
    obs0 = jax.device_put(obs0, dp)
    params = jax.device_put(params, rep)

    key, knet = jax.random.split(key)
    net = shard_net(init_net(knet, params.map_bank.map_hw), mesh)
    beh_net = jax.tree_util.tree_map(jnp.copy, net)
    opt = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4))
    opt_state = opt.init(net)

    train_iter = jax.jit(make_train_iter(venv, opt, num_envs, rollout_len))

    t0 = time.perf_counter()
    env_state, obs, it, mean_r = state0, obs0, jnp.int32(0), None
    for i in range(iters):
        key, k = jax.random.split(key)
        net, beh_net, opt_state, env_state, obs, it, mean_r = train_iter(
            net, beh_net, opt_state, env_state, obs, it, k, params
        )
        if not quiet and (i % 4 == 0 or i == iters - 1):
            print(f"iter {i}: mean step reward {float(mean_r):+.4f}")
    jax.block_until_ready(obs)
    sps = num_envs * rollout_len * iters / (time.perf_counter() - t0)

    ndev = mesh.devices.size
    assert len(net["trunk"]["w"].sharding.device_set) == ndev
    leaf = jax.tree_util.tree_leaves(env_state)[0]
    assert len(leaf.sharding.device_set) == ndev
    if not quiet:
        print(
            f"{sps:,.0f} env-steps/s incl. V-trace learner + compile on a "
            f"{mesh.devices.shape[0]}x{mesh.devices.shape[1]} (data, model) mesh"
        )
    return float(mean_r)


if __name__ == "__main__":
    main()
