"""End-to-end training: PPO + prediction head on LIDARLocRooms.

A credible TPU recipe, not a demo stub:
  * CNN map encoder (the 32x32 occupancy bitmap goes through two strided
    convolutions on the MXU) fused with an MLP over lidar/odometry/time,
  * proper PPO: GAE(lambda), clipped surrogate, entropy bonus, value
    clipping, K epochs x minibatches per rollout — the entire
    rollout-collect + update loop is ONE jitted function (lax.scan over
    steps, lax.scan over epochs/minibatches),
  * the prediction head trains THROUGH the env's differentiable loss term
    (the active-perception contract): the composite reward's -loss term
    backpropagates into the prediction MLP, while the policy trains on the
    score function with actions stop-gradiented.

Run: python examples/train_ppo_lidar.py [num_envs] [iterations]
Scale-out: shard the env axis with apx.distrib (see bench.py --multihost);
the update's gradient all-reduce is the only collective.
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

# ---------------------------------------------------------------------------
# Network: CNN map encoder + proprioceptive MLP trunk


def init_net(key, map_hw):
    k = iter(jax.random.split(key, 16))

    def dense(a, b):
        return {
            "w": jax.random.normal(next(k), (a, b)) * jnp.sqrt(2.0 / a),
            "b": jnp.zeros(b),
        }

    def conv(cin, cout, ksize):
        fan_in = cin * ksize * ksize
        return {
            "w": jax.random.normal(next(k), (ksize, ksize, cin, cout))
            * jnp.sqrt(2.0 / fan_in),
            "b": jnp.zeros(cout),
        }

    h, w = map_hw
    flat = (h // 4) * (w // 4) * 32
    return {
        "conv1": conv(1, 16, 3),
        "conv2": conv(16, 32, 3),
        "map_proj": dense(flat, 128),
        "prop": dense(11, 128),  # lidar(8) + odometry(2) + time(1)
        "trunk": dense(256, 256),
        "policy": dense(256, 4),  # mean(2) + logstd(2)
        "value": dense(256, 1),
        "pred": dense(256, 2),
    }


def apply_dense(p, x, act=None):
    y = x @ p["w"] + p["b"]
    return act(y) if act is not None else y


def encode(net, obs):
    parts = [obs["lidar"], obs["odometry"], obs["time_step"][..., None]]
    prop = apply_dense(net["prop"], jnp.concatenate(parts, axis=-1), jnp.tanh)
    if "map" in obs:
        x = obs["map"] * 255.0  # {0, 1/255} bitmap -> {0, 1}
        for name in ("conv1", "conv2"):
            x = jax.lax.conv_general_dilated(
                x,
                net[name]["w"],
                window_strides=(2, 2),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jnp.tanh(x + net[name]["b"])
        m = apply_dense(net["map_proj"], x.reshape(x.shape[0], -1), jnp.tanh)
    else:
        m = jnp.zeros_like(prop)
    z = jnp.concatenate([prop, m], axis=-1)
    return apply_dense(net["trunk"], z, jnp.tanh)


def policy_dist(net, z):
    out = apply_dense(net["policy"], z)
    mean, logstd = out[..., :2], jnp.clip(out[..., 2:], -3.0, 0.0)
    return mean, logstd


def logp_gauss(a, mean, logstd):
    return -0.5 * jnp.sum(
        ((a - mean) / jnp.exp(logstd)) ** 2 + 2 * logstd + jnp.log(2 * jnp.pi),
        axis=-1,
    )


# ---------------------------------------------------------------------------


def make_train_iter(
    venv,
    opt,
    num_envs,
    rollout_len=32,
    gamma=0.99,
    lam=0.95,
    clip_eps=0.2,
    ent_coef=1e-3,
    vf_coef=0.5,
    pred_coef=1.0,
    epochs=2,
    num_minibatches=4,
):
    """One full PPO iteration (rollout + GAE + K epochs of minibatch
    updates) as a single jittable pure function.

    ``params`` (the env's dataset/map banks) enters as an ARGUMENT, not a
    closure constant — closed-over arrays are serialized into the compile
    payload, which is fatal for GB-scale banks (PERF.md round 3). The mesh
    recipe (train_ppo_mesh.py) jits this same function with shardings.
    """

    def train_iter(net, opt_state, env_state, obs, key, params):
        # ---- collect one rollout (prediction head trains through the
        # differentiable -loss term inside the composite reward) ----------
        def pred_reward_fn(net):
            def body(carry, k):
                obs, st = carry
                z = encode(net, obs)
                ka, ks = jax.random.split(k)
                mean, logstd = policy_dist(net, z)
                a_raw = mean + jnp.exp(logstd) * jax.random.normal(ka, mean.shape)
                a = jnp.tanh(a_raw)
                pred = jnp.tanh(apply_dense(net["pred"], z))
                obs2, st2, r, te, tr, info = venv.step(
                    ks, st,
                    {"action": jax.lax.stop_gradient(a), "prediction": pred},
                    params,
                )
                done = te | tr
                out = (
                    jax.lax.stop_gradient(obs),
                    jax.lax.stop_gradient(a_raw),
                    r,
                    jax.lax.stop_gradient(done),
                )
                return (obs2, st2), out

            keys = jax.random.split(key, rollout_len)
            (obs_f, st_f), (obs_t, araw_t, r_t, done_t) = jax.lax.scan(
                body, (obs, env_state), keys
            )
            # Mean composite reward: its -loss term is differentiable in
            # the prediction head's parameters.
            return -pred_coef * r_t.mean(), (obs_f, st_f, obs_t, araw_t, r_t, done_t)

        (_, (obs_f, st_f, obs_t, araw_t, r_t, done_t)), pred_grads = (
            jax.value_and_grad(pred_reward_fn, has_aux=True)(net)
        )
        r_t = jax.lax.stop_gradient(r_t)

        # ---- GAE over the collected rollout ------------------------------
        z_t = encode(net, jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), obs_t
        ))
        v_t = apply_dense(net["value"], z_t)[..., 0].reshape(rollout_len, num_envs)
        v_last = apply_dense(net["value"], encode(net, obs_f))[..., 0]
        mean_t, logstd_t = policy_dist(
            net, z_t.reshape(rollout_len, num_envs, -1)
        )
        logp_t = logp_gauss(araw_t, mean_t, logstd_t)

        def gae_step(carry, x):
            adv_next, v_next = carry
            r, v, done = x
            nonterm = 1.0 - done.astype(jnp.float32)
            delta = r + gamma * v_next * nonterm - v
            adv = delta + gamma * lam * nonterm * adv_next
            return (adv, v), adv

        _, adv_t = jax.lax.scan(
            gae_step,
            (jnp.zeros(num_envs), v_last),
            (r_t, v_t, done_t),
            reverse=True,
        )
        ret_t = adv_t + v_t
        adv_t = (adv_t - adv_t.mean()) / (adv_t.std() + 1e-8)

        # ---- PPO epochs x minibatches ------------------------------------
        batch = jax.tree_util.tree_map(
            lambda x: x.reshape((rollout_len * num_envs,) + x.shape[2:]),
            (obs_t, araw_t, jax.lax.stop_gradient(logp_t), adv_t, ret_t,
             jax.lax.stop_gradient(v_t)),
        )
        n = rollout_len * num_envs
        mb = n // num_minibatches

        def ppo_loss(net, mb_data):
            o, a_raw, logp_old, adv, ret, v_old = mb_data
            z = encode(net, o)
            mean, logstd = policy_dist(net, z)
            logp = logp_gauss(a_raw, mean, logstd)
            ratio = jnp.exp(logp - logp_old)
            pg = -jnp.minimum(
                ratio * adv,
                jnp.clip(ratio, 1 - clip_eps, 1 + clip_eps) * adv,
            ).mean()
            v = apply_dense(net["value"], z)[..., 0]
            v_clip = v_old + jnp.clip(v - v_old, -clip_eps, clip_eps)
            vloss = 0.5 * jnp.maximum(
                jnp.square(v - ret), jnp.square(v_clip - ret)
            ).mean()
            ent = jnp.sum(logstd + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1).mean()
            return pg + vf_coef * vloss - ent_coef * ent

        def mb_update(carry, idx):
            net, opt_state = carry
            mb_data = jax.tree_util.tree_map(lambda x: x[idx], batch)
            grads = jax.grad(ppo_loss)(net, mb_data)
            updates, opt_state = opt.update(grads, opt_state, net)
            return (optax.apply_updates(net, updates), opt_state), None

        perm_key = jax.random.fold_in(key, 1)
        idxs = jnp.stack([
            jax.random.permutation(jax.random.fold_in(perm_key, e), n).reshape(
                num_minibatches, mb
            )
            for e in range(epochs)
        ]).reshape(epochs * num_minibatches, mb)

        # Apply the prediction-head gradients once per iteration.
        updates, opt_state = opt.update(pred_grads, opt_state, net)
        net = optax.apply_updates(net, updates)
        (net, opt_state), _ = jax.lax.scan(mb_update, (net, opt_state), idxs)
        return net, opt_state, st_f, obs_f, r_t.mean()

    return train_iter


def main(num_envs=None, iters=None, quiet=False):
    num_envs = num_envs or (int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
    iters = iters or (int(sys.argv[2]) if len(sys.argv) > 2 else 40)

    venv, params = apx.make_vec("LIDARLocRooms-v0", num_envs=num_envs)
    key = jax.random.PRNGKey(0)
    obs0, state0, _ = venv.reset(key, params)
    map_hw = params.map_bank.map_hw

    key, knet = jax.random.split(key)
    net = init_net(knet, map_hw)
    opt = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4))
    opt_state = opt.init(net)

    rollout_len = 32
    train_iter = jax.jit(make_train_iter(venv, opt, num_envs, rollout_len))

    t0 = time.perf_counter()
    env_state, obs = state0, obs0
    mean_r = None
    for i in range(iters):
        key, k = jax.random.split(key)
        net, opt_state, env_state, obs, mean_r = train_iter(
            net, opt_state, env_state, obs, k, params
        )
        if not quiet and (i % 5 == 0 or i == iters - 1):
            print(f"iter {i}: mean step reward {float(mean_r):+.4f}")
    jax.block_until_ready(obs)
    sps = num_envs * rollout_len * iters / (time.perf_counter() - t0)
    if not quiet:
        print(f"{sps:,.0f} env-steps/s including learner update and compile")
    return float(mean_r)


if __name__ == "__main__":
    main()
