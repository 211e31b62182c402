"""R2D2-style recurrent replay learner on the (data, model) mesh.

Completes the learner-recipe triad (PPO on-policy, V-trace off-policy,
and this: recurrent value learning from a DEVICE-RESIDENT replay ring).
The R2D2 signature pieces (Kapturowski et al. 2019), in single-program
JAX form:

  * LSTM agent state over the shared CNN/MLP encoder
    (train_ppo_lidar's), with STORED initial recurrent state per
    sequence and a burn-in prefix replayed to warm it up before the
    learning window;
  * device-resident replay: a ring buffer of fixed-length sequences
    living entirely in the train-state pytree (no host round-trips) —
    writes are dynamic-update-slices at the ring pointer, sampling is a
    uniform gather;
  * n-step double-Q targets with the R2D2 value rescaling
    h(x) = sign(x)(sqrt(|x|+1)-1) + eps*x and a periodically synced
    target network;
  * continuous env actions via a fixed 9-point codebook (8 compass
    directions + stay) — apx envs are continuous-action, so the
    Q-learner acts on the discretized set while the PREDICTION head
    (trained through the env's differentiable loss term, as in the
    other recipes) stays continuous;
  * the same dp x tp placement recipe as train_ppo_mesh.py: env batch
    and replay ring data-parallel over "data", encoder/trunk
    tensor-parallel over "model", GSPMD inserts every collective.

Run: python examples/train_r2d2_mesh.py [num_envs] [iterations]
(re-execs onto a virtual 8-device CPU mesh when <2 devices are visible;
pass --virtual to force). Validated on the virtual mesh by
tests/test_distrib.py::test_mesh_r2d2_trains.
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
        "train_r2d2_mesh: only 1 device visible — re-exec'ing onto a "
        "virtual 8-device CPU mesh (pass --virtual to silence this)",
        file=sys.stderr,
        flush=True,
    )
    os.execv(sys.executable, [sys.executable, *sys.argv, "--virtual"])

import numpy as np
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

import apx
from examples.train_ppo_lidar import apply_dense, encode, init_net
from examples.train_ppo_mesh import make_dp_tp_mesh, net_shardings

N_ACTIONS = 9
_DIRS = np.zeros((N_ACTIONS, 2), np.float32)
_DIRS[1:] = [
    (np.cos(a), np.sin(a)) for a in np.linspace(0, 2 * np.pi, 8, endpoint=False)
]
ACTION_CODEBOOK = jnp.asarray(_DIRS)  # (9, 2): stay + 8 compass moves


def value_rescale(x, eps=1e-3):
    """R2D2 h(x) = sign(x)(sqrt(|x|+1)-1) + eps*x."""
    return jnp.sign(x) * (jnp.sqrt(jnp.abs(x) + 1.0) - 1.0) + eps * x


def value_rescale_inv(x, eps=1e-3):
    """Closed-form h^-1 (Kapturowski et al. 2019, appendix)."""
    a = (jnp.sqrt(1.0 + 4.0 * eps * (jnp.abs(x) + 1.0 + eps)) - 1.0) / (2.0 * eps)
    return jnp.sign(x) * (jnp.square(a) - 1.0)


def init_r2d2_net(key, map_hw, hidden=128):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    net = init_net(k1, map_hw)
    for name in ("policy", "value"):
        net.pop(name)
    d = 256  # trunk output
    s = 1.0 / jnp.sqrt(d + hidden)
    net["lstm"] = {
        "wx": jax.random.normal(k2, (d, 4 * hidden)) * s,
        "wh": jax.random.normal(k3, (hidden, 4 * hidden)) * s,
        "b": jnp.zeros(4 * hidden),
    }
    net["q"] = {
        "w": jax.random.normal(k4, (hidden, N_ACTIONS)) * 0.01,
        "b": jnp.zeros(N_ACTIONS),
    }
    net["pred"] = {
        "w": jax.random.normal(k5, (hidden, 2)) * 0.01,
        "b": jnp.zeros(2),
    }
    return net


def lstm_step(net, carry, z):
    h, c = carry
    gates = z @ net["lstm"]["wx"] + h @ net["lstm"]["wh"] + net["lstm"]["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return (h, c), h


def agent_apply(net, obs, carry):
    """One recurrent step: obs -> (new_carry, q (.., A), pred (.., 2))."""
    z = encode(net, obs)
    carry, h = lstm_step(net, carry, z)
    q = apply_dense(net["q"], h)
    pred = jnp.tanh(apply_dense(net["pred"], h))
    return carry, q, pred


def make_train_iter(
    venv,
    opt,
    num_envs,
    seq_len=16,
    burn_in=4,
    capacity=64,
    batch_seqs=None,
    gamma=0.99,
    nstep=3,
    eps_greedy=0.1,
    pred_coef=1.0,
    target_sync_every=4,
    hidden=128,
):
    """One R2D2 iteration: collect a seq_len segment into the ring, then
    one double-Q learning step on a sampled batch of sequences. The ring
    stores (obs, action ids, rewards, dones, initial lstm state) as a
    pytree of (capacity, seq_len, ...) arrays in the train state."""
    batch_seqs = batch_seqs or max(2, capacity // 8)

    def empty_ring(obs_example):
        seq_of = lambda x: jnp.zeros((capacity, seq_len) + x.shape, x.dtype)
        return {
            "obs": jax.tree_util.tree_map(seq_of, obs_example),
            "act": jnp.zeros((capacity, seq_len, num_envs), jnp.int32),
            "rew": jnp.zeros((capacity, seq_len, num_envs), jnp.float32),
            "done": jnp.zeros((capacity, seq_len, num_envs), jnp.bool_),
            "h0": jnp.zeros((capacity, num_envs, hidden), jnp.float32),
            "c0": jnp.zeros((capacity, num_envs, hidden), jnp.float32),
            "ptr": jnp.zeros((), jnp.int32),
            "filled": jnp.zeros((), jnp.int32),
        }

    def train_iter(net, target_net, opt_state, ring, env_state, obs, carry,
                   it, key, params):
        kc, ks = jax.random.split(key)
        h0, c0 = carry

        # ---- collect one segment with the ONLINE net (eps-greedy on the
        # codebook; prediction head trains through the composite reward) --
        def pred_reward_fn(net):
            def body(scan_carry, k):
                obs, st, carry = scan_carry
                carry, q, pred = agent_apply(net, obs, carry)
                ka, kexp, kstep = jax.random.split(k, 3)
                greedy = jnp.argmax(q, axis=-1)
                rand = jax.random.randint(ka, (num_envs,), 0, N_ACTIONS)
                act_id = jnp.where(
                    jax.random.uniform(kexp, (num_envs,)) < eps_greedy,
                    rand,
                    greedy,
                )
                a = ACTION_CODEBOOK[act_id]
                obs2, st2, r, te, tr, _ = venv.step(
                    kstep, st, {"action": a, "prediction": pred}, params
                )
                done = te | tr
                # R2D2's stored-state scheme assumes fresh recurrent state
                # at episode starts: zero the carry of envs that just
                # finished (they autoreset on the next step).
                carry = jax.tree_util.tree_map(
                    lambda x: jnp.where(done[:, None], 0.0, x), carry
                )
                out = (
                    jax.lax.stop_gradient(obs),
                    jax.lax.stop_gradient(act_id),
                    r,
                    jax.lax.stop_gradient(done),
                )
                return (obs2, st2, jax.lax.stop_gradient(carry)), out

            keys = jax.random.split(kc, seq_len)
            (obs_f, st_f, carry_f), (obs_t, act_t, r_t, done_t) = jax.lax.scan(
                body, (obs, env_state, (h0, c0)), keys
            )
            return -pred_coef * r_t.mean(), (
                obs_f, st_f, carry_f, obs_t, act_t, r_t, done_t
            )

        (_, (obs_f, st_f, carry_f, obs_t, act_t, r_t, done_t)), pred_grads = (
            jax.value_and_grad(pred_reward_fn, has_aux=True)(net)
        )
        r_t = jax.lax.stop_gradient(r_t)

        # ---- write the segment at the ring pointer ----------------------
        seq_first = lambda x: x[None]  # scan output is (L, N, ...) already
        ring = {
            **ring,
            "obs": jax.tree_util.tree_map(
                lambda buf, x: jax.lax.dynamic_update_slice_in_dim(
                    buf, seq_first(x).astype(buf.dtype), ring["ptr"], 0
                ),
                ring["obs"],
                obs_t,
            ),
            "act": jax.lax.dynamic_update_slice_in_dim(
                ring["act"], seq_first(act_t), ring["ptr"], 0
            ),
            "rew": jax.lax.dynamic_update_slice_in_dim(
                ring["rew"], seq_first(r_t), ring["ptr"], 0
            ),
            "done": jax.lax.dynamic_update_slice_in_dim(
                ring["done"], seq_first(done_t), ring["ptr"], 0
            ),
            "h0": jax.lax.dynamic_update_slice_in_dim(
                ring["h0"], h0[None], ring["ptr"], 0
            ),
            "c0": jax.lax.dynamic_update_slice_in_dim(
                ring["c0"], c0[None], ring["ptr"], 0
            ),
            "ptr": (ring["ptr"] + 1) % capacity,
            "filled": jnp.minimum(ring["filled"] + 1, capacity),
        }

        # ---- sample sequences, burn in, n-step double-Q -----------------
        idx = jax.random.randint(
            ks, (batch_seqs,), 0, jnp.maximum(ring["filled"], 1)
        )
        take = lambda buf: jnp.take(buf, idx, axis=0)
        seq_obs = jax.tree_util.tree_map(take, ring["obs"])
        seq_act = take(ring["act"])
        seq_rew = take(ring["rew"])
        seq_done = take(ring["done"])
        bh0, bc0 = take(ring["h0"]), take(ring["c0"])

        def unroll(net, carry, obs_seq, done_seq):
            """obs_seq: (B, L, N, ...) -> qs (L, B, N, A); carries are
            zeroed after done steps, mirroring collection exactly."""

            def body(carry, x):
                obs, done = x
                carry, q, _ = jax.vmap(
                    lambda o, c: agent_apply(net, o, c), in_axes=(0, 0)
                )(obs, carry)
                carry = jax.tree_util.tree_map(
                    lambda h: jnp.where(done[..., None], 0.0, h), carry
                )
                return carry, q

            obs_lf = jax.tree_util.tree_map(
                lambda x: jnp.swapaxes(x, 0, 1), obs_seq
            )  # (L, B, N, ...)
            done_lf = jnp.swapaxes(done_seq, 0, 1)
            return jax.lax.scan(body, carry, (obs_lf, done_lf))

        def td_loss(net):
            carry0 = (bh0, bc0)
            # burn-in with stop-gradient to warm the recurrent state
            burn_obs = jax.tree_util.tree_map(
                lambda x: x[:, :burn_in], seq_obs
            )
            burn_done = seq_done[:, :burn_in]
            main_done = seq_done[:, burn_in:]
            carry_b, _ = unroll(net, carry0, burn_obs, burn_done)
            carry_b = jax.lax.stop_gradient(carry_b)
            main_obs = jax.tree_util.tree_map(
                lambda x: x[:, burn_in:], seq_obs
            )
            _, qs = unroll(net, carry_b, main_obs, main_done)  # (L', B, N, A)
            carry_bt, _ = unroll(target_net, carry0, burn_obs, burn_done)
            _, qs_t = unroll(target_net, carry_bt, main_obs, main_done)

            act = jnp.swapaxes(seq_act[:, burn_in:], 0, 1)  # (L', B, N)
            rew = jnp.swapaxes(seq_rew[:, burn_in:], 0, 1)
            done = jnp.swapaxes(seq_done[:, burn_in:], 0, 1).astype(jnp.float32)
            q_sa = jnp.take_along_axis(qs, act[..., None], axis=-1)[..., 0]

            # n-step return in the RESCALED domain (R2D2): unrescale
            # bootstrap, accumulate, rescale back.
            lp = qs.shape[0]
            a_star = jnp.argmax(qs, axis=-1)  # online argmax (double-Q)
            q_boot = value_rescale_inv(
                jnp.take_along_axis(qs_t, a_star[..., None], axis=-1)[..., 0]
            )

            def target_at(t):
                g = jnp.zeros_like(rew[0])
                alive = jnp.ones_like(rew[0])
                for k in range(nstep):
                    tk = jnp.minimum(t + k, lp - 1)
                    valid = jnp.float32(t + k < lp)
                    g = g + alive * valid * (gamma ** k) * rew[tk]
                    alive = alive * (1.0 - done[tk]) * valid
                tb = jnp.minimum(t + nstep, lp - 1)
                bootstrap = jnp.where(
                    t + nstep < lp, q_boot[tb], q_boot[lp - 1]
                )
                g = g + alive * (gamma ** nstep) * bootstrap
                return value_rescale(g)

            targets = jnp.stack([target_at(t) for t in range(lp)])
            td = q_sa - jax.lax.stop_gradient(targets)
            # Positions within nstep of the sequence end have truncated
            # windows (no valid bootstrap) — mask them out of the loss.
            t_mask = (
                jnp.arange(lp) < lp - nstep
            ).astype(jnp.float32)[:, None, None]
            return 0.5 * (jnp.square(td) * t_mask).sum() / (
                t_mask.sum() * td.shape[1] * td.shape[2]
            )

        grads = jax.grad(td_loss)(net)
        grads = jax.tree_util.tree_map(jnp.add, grads, pred_grads)
        updates, opt_state = opt.update(grads, opt_state, net)
        net = optax.apply_updates(net, updates)

        do_sync = (it + 1) % target_sync_every == 0
        target_net = jax.tree_util.tree_map(
            lambda tgt, n_: jnp.where(do_sync, n_, tgt), target_net, net
        )
        return (net, target_net, opt_state, ring, st_f, obs_f, carry_f,
                it + 1, r_t.mean())

    return train_iter, empty_ring


# Env axis per ring field, by NAME: obs/act/rew/done are (C, L, N, ...),
# h0/c0 are (C, N, H), ptr/filled replicated scalars. Matching on shape
# instead would misfire whenever hidden == num_envs (true at main()'s
# defaults) and silently shard the LSTM hidden axis over "data".
RING_ENV_AXIS = {"obs": 2, "act": 2, "rew": 2, "done": 2, "h0": 1, "c0": 1}


def ring_shardings(ring, mesh, data_axis: str = "data"):
    """Per-leaf NamedShardings placing each ring field's env axis on the
    mesh's data axis (replicating the ptr/filled scalars)."""
    rep = NamedSharding(mesh, P())
    return {
        k: jax.tree_util.tree_map(
            lambda x, ax=RING_ENV_AXIS.get(k): (
                rep
                if ax is None
                else NamedSharding(mesh, P(*([None] * ax), data_axis))
            ),
            v,
        )
        for k, v in ring.items()
    }


def main(num_envs=None, iters=None, quiet=False):
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    num_envs = num_envs or (int(argv[0]) if len(argv) > 0 else 128)
    iters = iters or (int(argv[1]) if len(argv) > 1 else 10)
    hidden = 128

    mesh = make_dp_tp_mesh()
    data_dim = mesh.devices.shape[0]
    assert num_envs % data_dim == 0
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    venv, params = apx.make_vec("LIDARLocRooms-v0", num_envs=num_envs)
    key = jax.random.PRNGKey(0)
    obs0, state0, _ = venv.reset(key, params)
    state0 = jax.device_put(state0, dp)
    obs0 = jax.device_put(obs0, dp)
    params = jax.device_put(params, rep)

    key, knet = jax.random.split(key)
    net = init_r2d2_net(knet, params.map_bank.map_hw, hidden)
    base_shardings = net_shardings(mesh)
    shardings = {k: base_shardings.get(k, {}) for k in net}
    shardings["lstm"] = {k: rep for k in net["lstm"]}
    shardings["q"] = {k: rep for k in net["q"]}
    net = jax.tree_util.tree_map(jax.device_put, net, shardings)
    target_net = jax.tree_util.tree_map(jnp.copy, net)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt_state = opt.init(net)

    train_iter, empty_ring = make_train_iter(
        venv, opt, num_envs, hidden=hidden
    )
    ring0 = empty_ring(obs0)

    ring = jax.tree_util.tree_map(
        jax.device_put, ring0, ring_shardings(ring0, mesh)
    )
    carry = (
        jax.device_put(jnp.zeros((num_envs, hidden)), dp),
        jax.device_put(jnp.zeros((num_envs, hidden)), dp),
    )
    jit_iter = jax.jit(train_iter)

    t0 = time.perf_counter()
    env_state, obs, it, mean_r = state0, obs0, jnp.int32(0), None
    for i in range(iters):
        key, k = jax.random.split(key)
        (net, target_net, opt_state, ring, env_state, obs, carry, it,
         mean_r) = jit_iter(
            net, target_net, opt_state, ring, env_state, obs, carry, it, k,
            params,
        )
        if not quiet and (i % 4 == 0 or i == iters - 1):
            print(f"iter {i}: mean step reward {float(mean_r):+.4f}")
    jax.block_until_ready(obs)
    sps = num_envs * 16 * iters / (time.perf_counter() - t0)
    ndev = mesh.devices.size
    assert len(net["trunk"]["w"].sharding.device_set) == ndev
    if not quiet:
        print(
            f"{sps:,.0f} env-steps/s incl. replay + recurrent learner on a "
            f"{mesh.devices.shape[0]}x{mesh.devices.shape[1]} (data, model) mesh"
        )
    return float(mean_r)


if __name__ == "__main__":
    main()
