#!/usr/bin/env python
"""apx benchmark harness.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: env-steps/s of the jitted vectorized CircleSquare
classification env (the reference's CPU-runnable flagship; see BASELINE.md).
vs_baseline is relative to the reference's best measured throughput on this
container's CPU (2,200 env-steps/s at N=256 — its *best* N; the reference
scales negatively beyond that, image_perception_module.py:294-331).

Run: python bench.py [--num-envs 4096] [--steps 256] [--env circle_square]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp

# Bound on TPU backend initialization. Under the axon relay an outage makes
# jax.devices() hang indefinitely (round 3: a 240 s run printed nothing),
# so the driver's BENCH record carried a bare rc=1 traceback or no output
# at all. The guard runs the first backend touch on a watchdog thread and,
# on timeout or error, emits ONE parseable JSON line that names the failed
# phase — outage rounds stay distinguishable from perf regressions in the
# BENCH history. Override with APX_BENCH_INIT_TIMEOUT (seconds).
_INIT_TIMEOUT_S = float(os.environ.get("APX_BENCH_INIT_TIMEOUT", "180"))

# Assumed peak HBM bandwidth for the %-of-roofline fields (GB/s). 819 is the
# published TPU v5e figure; override for other chips. The roofline fields
# exist so cross-round records can be judged against HARDWARE limits, not
# only against the reference baseline (beaten ~4 orders of magnitude ago).
HBM_GBPS = float(os.environ.get("APX_HBM_GBPS", "819"))


def _backend_failure_record(phase: str, error: str) -> dict:
    return {
        "metric": "backend_unavailable",
        "value": 0.0,
        "unit": "env-steps/s",
        "vs_baseline": 0.0,
        "error": error,
        "phase": phase,
        "fingerprint": None,
    }


def init_backend_guarded(
    timeout_s: float = _INIT_TIMEOUT_S, probe=None, pre=None
) -> dict | None:
    """Touch the JAX backend with a deadline.

    Returns None on success; on timeout or init error returns a structured
    failure record (the caller prints it as the bench output). `probe` is
    injectable for tests; the default lists devices and runs one tiny op so
    both the handshake and the execute path are covered. `pre` (e.g.
    jax.distributed initialization) runs INSIDE the default probe before the
    first backend touch: multi-process init must happen before anything
    queries jax.devices(), and it must share the watchdog deadline.
    """

    if probe is None:

        def probe():
            if os.environ.get("APX_BENCH_FAKE_INIT_HANG"):
                time.sleep(3600)  # outage simulation hook (tests/CI drills)
            if pre is not None:
                pre()
            d = jax.devices()
            jnp.zeros((), jnp.float32).block_until_ready()
            return d

    result: dict = {}

    def target():
        try:
            result["devices"] = probe()
        except Exception as e:  # noqa: BLE001 — report, don't crash
            result["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return _backend_failure_record(
            "backend_init",
            f"backend initialization exceeded {timeout_s:.0f}s "
            "(relay outage: jax.devices() hung)",
        )
    if "error" in result:
        return _backend_failure_record("backend_init", result["error"])
    return None


# Per-buffer cap for hoisting policy draws out of the scan (bytes). A
# (num_steps, N, ...) pre-drawn buffer above this stays in-loop for that
# LEAF only (each draw has its own key, so per-leaf hoisting is still
# bit-identical): tin_loc at N=16384 would otherwise pre-draw a
# (1024, 16384, 200) f32 prediction buffer — 13 GB.
HOIST_BUDGET_BYTES = int(
    os.environ.get("APX_BENCH_HOIST_BUDGET", 256 * 1024 * 1024)
)


def bench_rollout_fn(
    venv, params, num_steps: int, hoist_budget=None, obs_probe: str = "step"
):
    """(run, num_steps): the jitted bench rollout
    ``run(key, state0, obs0, params) -> (obs_f, state_f, reward_sum)``.

    LOCKSTEP envs with a fixed episode length run the EPISODIC rollout
    (apx.core.env.rollout_episodic semantics: reset boundary hoisted out
    of the scan, cond-free inner steps) — trajectories are bitwise-equal
    in state/obs/dones to the plain scan (pinned in test_env_core), and
    the plain scan's lax.cond pays ~2 pass-through copies of the image
    state EVERY step (PERF.md round 3).

    The random-policy draws are HOISTED out of the scan: each step's
    action/prediction tensors are tiny (N x 2-ish), so drawing them
    in-loop pays threefry's fixed per-op cost every step serially —
    measured at ~20% of the whole LIDAR step (PERF.md round 5). One
    batched draw over (num_steps, N, ...) outside the loop uses the SAME
    per-step keys and shapes, so the trajectories are bit-identical
    (pinned in test_aux); the scan reads back 64 KB/step of pre-drawn
    randoms instead. Buffers above ``hoist_budget`` bytes keep that leaf's
    draw in-loop (still bit-identical — each leaf has its own key)."""
    from apx.core.env import AutoResetMode, with_autoreset

    if hoist_budget is None:
        hoist_budget = HOIST_BUDGET_BYTES
    n = venv.num_envs
    act_space = venv.env.inner_action_space(params)
    pred_space = venv.env.prediction_space(params)
    period = (
        int(params.step_limit)
        if (
            venv.autoreset is AutoResetMode.LOCKSTEP
            and hasattr(params, "step_limit")
        )
        else None
    )

    inner_venv = (
        with_autoreset(venv, AutoResetMode.DISABLED) if period else venv
    )
    if period is not None:
        # Each timed run chains the previous run's final state, so every
        # run must END on an episode boundary or the next one starts
        # mid-episode (DISABLED inner steps would then run terminated envs
        # past step_limit — no longer the claimed LOCKSTEP semantics).
        # Round the step count to whole (period + 1)-cycles.
        cycle = period + 1
        num_steps = max(cycle, (num_steps // cycle) * cycle)

    def draw_act(ka):
        return jax.random.uniform(
            ka, (n, *act_space.shape), minval=-1.0, maxval=1.0,
            dtype=jnp.float32,
        )

    def draw_pred(kp):
        return jax.random.normal(kp, (n, *pred_space.shape), dtype=jnp.float32)

    def buf_bytes(space):
        sz = 1
        for d in space.shape:
            sz *= d
        return num_steps * n * max(sz, 1) * 4

    hoist_act = buf_bytes(act_space) <= hoist_budget
    hoist_pred = buf_bytes(pred_space) <= hoist_budget

    def act_of(obs, act_x, pred_x):
        act = act_x if hoist_act else draw_act(act_x)
        pred = pred_x if hoist_pred else draw_pred(pred_x)
        if obs_probe in ("step", "leaf1"):
            # Per-step liveness probe: one element per obs leaf (or the
            # first leaf only, "leaf1") folded into the action. The probe's
            # [0]-slices show as ~1.8 us/leaf ops in the profile table, but
            # that cost is NOT additive wall time: removing the probe
            # entirely ("none") measured 51.0M vs 70.0M env-steps/s, and
            # "leaf1" (which keeps a probe but drops the map-channel
            # dependence) measured the same 50.7M — the action's data
            # dependence on the CURRENT step's 16 MB map write is
            # load-bearing for XLA's while-body schedule (PERF.md round 5
            # final A/B). "step" is the default and the recorded form.
            leaves = jax.tree_util.tree_leaves(obs)
            if obs_probe == "leaf1":
                leaves = leaves[:1]
            probe = sum(
                jnp.reshape(leaf, (-1,))[0].astype(jnp.float32)
                for leaf in leaves
            ) * 1e-12
            act = act + probe
        return {"action": jnp.clip(act, -1.0, 1.0), "prediction": pred}

    @jax.jit
    def run(key, state0, obs0, params):
        # params MUST be a jit argument, not a closure: closed-over arrays
        # become compile-time constants, and under the axon relay the whole
        # constant (e.g. a 1.17 GB dataset bank) is serialized into the
        # remote-compile payload — 30+ min of host CPU, then a broken pipe.
        keys = jax.random.split(key, num_steps)
        # Identical key derivation to the in-loop form: per step,
        # k -> (pk, sk); pk -> (ka, kp). vmap(split) produces the same
        # bits as split inside the loop.
        pk_sk = jax.vmap(jax.random.split)(keys)
        ka_kp = jax.vmap(jax.random.split)(pk_sk[:, 0])
        sks = pk_sk[:, 1]
        act_xs = jax.vmap(draw_act)(ka_kp[:, 0]) if hoist_act else ka_kp[:, 0]
        pred_xs = (
            jax.vmap(draw_pred)(ka_kp[:, 1]) if hoist_pred else ka_kp[:, 1]
        )
        xs = (sks, act_xs, pred_xs)

        def body(carry, x):
            obs, state = carry
            sk, act_x, pred_x = x
            act = act_of(obs, act_x, pred_x)
            obs2, state2, reward, term, trunc, _ = inner_venv.step(
                sk, state, act, params
            )
            return (obs2, state2), reward.sum()

        if period is None:
            (obs_f, state_f), rsum = jax.lax.scan(body, (obs0, state0), xs)
            return obs_f, state_f, rsum.sum()

        from apx.core.env import segmented_scan

        def boundary_body(carry, x):
            obs, state = carry
            sk, act_x, pred_x = x
            act = act_of(obs, act_x, pred_x)
            obs2, state2, reward, *_ = venv.boundary_reset_step(
                sk, state, act, params
            )
            return (obs2, state2), reward.sum()

        (obs_f, state_f), rs = segmented_scan(
            body, boundary_body, (obs0, state0), xs, period
        )
        return obs_f, state_f, rs.sum()

    return run, num_steps


def bench_env(
    venv,
    params,
    num_steps: int,
    key,
    stats: dict | None = None,
    obs_probe: str = "step",
) -> float:
    """Returns env-steps/s of a jitted scan rollout with on-device random
    actions (no host transfers in the timed region). See bench_rollout_fn
    for the rollout's structure."""
    run, num_steps = bench_rollout_fn(venv, params, num_steps, obs_probe=obs_probe)

    n = venv.num_envs
    rk, bk, wk, sk = jax.random.split(key, 4)
    params = jax.device_put(params)
    obs0, state0, _ = jax.jit(venv.reset)(rk, params)
    # The timed run consumes the previous run's final obs/state (true data
    # dependence) and the timed region ends with a VALUE fetch of the
    # reward scalar: under the axon relay, block_until_ready on an output
    # of an arg-passing jit call is NOT a completion barrier (it measured
    # dispatch only — "4.4e9 env-steps/s"); fetching a scalar is. A settle
    # segment between warmup and the timed segment absorbs the one-time
    # post-compile overhead observed on the first real execution.
    obs_w, state_w, _ = run(wk, state0, obs0, params)
    jax.block_until_ready(state_w)  # warmup/compile
    obs_w, state_w, rs = run(sk, state_w, obs_w, params)
    float(rs)  # settle + barrier
    t0 = time.perf_counter()
    obs_f, state_f, rsum = run(bk, state_w, obs_w, params)
    float(rsum)  # completion barrier (see above)
    dt = time.perf_counter() - t0
    if stats is not None:
        # Roofline-grade fields (VERDICT r4 #2): obs bytes per vector step
        # (the env contract's irreducible HBM write) and device-busy time
        # from a profiled re-run of the SAME compiled function — so the
        # recorded number separates the env's device cost from relay
        # dispatch/fetch overhead, and hardware headroom is machine-readable
        # next to env-steps/s.
        stats["obs_bytes_per_step"] = int(
            sum(
                l.size * l.dtype.itemsize
                for l in jax.tree_util.tree_leaves(obs_f)
            )
        )
        try:
            import tempfile

            from apx.tools.parse_trace import device_busy_us, load_trace

            pk = jax.random.fold_in(bk, 1)
            with tempfile.TemporaryDirectory() as td:
                with jax.profiler.trace(td):
                    _, _, rp = run(pk, state_f, obs_f, params)
                    float(rp)
                busy = device_busy_us(load_trace(td))
            stats["device_busy_us_per_step"] = round(busy / num_steps, 2)
            roofline_us = stats["obs_bytes_per_step"] / (HBM_GBPS * 1e3)
            stats["obs_hbm_roofline_us_per_step"] = round(roofline_us, 2)
            stats["pct_of_obs_hbm_roofline"] = round(
                100.0 * roofline_us / (busy / num_steps), 1
            )
            stats["assumed_hbm_gbps"] = HBM_GBPS
        except Exception as e:  # noqa: BLE001 — fields are best-effort
            stats["roofline_error"] = str(e)[:200]
    return n * num_steps / dt


def make_circle_square(num_envs: int):
    from apx.core.env import AutoResetMode, vmap_vector_env
    from apx.data.circle_square import make_circle_square_bank
    from apx.envs.image_classification import ImageClassificationEnv

    env = ImageClassificationEnv(dataset=make_circle_square_bank())
    params = env.default_params()
    venv = vmap_vector_env(env, num_envs, AutoResetMode.LOCKSTEP)
    return venv, params, 2200.0  # reference best: N=256 on container CPU


def make_light_dark(num_envs: int):
    from apx.core.env import AutoResetMode, vmap_vector_env
    from apx.envs.light_dark import LightDarkEnv

    env = LightDarkEnv()
    params = env.default_params()
    venv = vmap_vector_env(env, num_envs, AutoResetMode.NEXT_STEP)
    return venv, params, 4642.0  # reference SyncVectorEnv N=64 on container CPU


def make_lidar_rooms(num_envs: int):
    from apx.core.env import AutoResetMode, vmap_vector_env
    from apx.data.floor_map import make_rooms_bank
    from apx.envs.lidar_localization import LIDARLocalizationEnv
    from apx.wrappers import TimeLimit

    env = TimeLimit(
        LIDARLocalizationEnv(map_bank=make_rooms_bank(num_maps=256)),
        max_episode_steps=100,
        issue_termination=True,
    )
    params = env.default_params()
    venv = vmap_vector_env(env, num_envs, AutoResetMode.NEXT_STEP)
    # No reference number exists (shapely absent in container; the reference
    # runs 8 GEOS segment queries per step in a Python loop). Use the driver
    # north-star denominator: 1M aggregate env-steps/s (BASELINE.json).
    return venv, params, 1_000_000.0


def _make_lidar(kind: str, static: bool, num_envs: int):
    from apx.core.env import AutoResetMode, vmap_vector_env
    from apx.data.floor_map import make_maze_bank, make_rooms_bank
    from apx.envs.lidar_localization import LIDARLocalizationEnv
    from apx.wrappers import TimeLimit

    mk = make_maze_bank if kind == "maze" else make_rooms_bank
    bank = mk(num_maps=1, indices=[0]) if static else mk(num_maps=256)
    env = TimeLimit(
        LIDARLocalizationEnv(map_bank=bank, static_map=static),
        max_episode_steps=100,
        issue_termination=True,
    )
    return vmap_vector_env(env, num_envs, AutoResetMode.NEXT_STEP), env.default_params()


def make_lidar_rooms_static(num_envs: int):
    venv, params = _make_lidar("rooms", True, num_envs)
    return venv, params, 1_000_000.0


def make_lidar_maze(num_envs: int):
    venv, params = _make_lidar("maze", False, num_envs)
    return venv, params, 1_000_000.0


def make_hide_and_seek(num_envs: int):
    """CircleSquareHideAndSeek: the classification engine plus the
    vector-level distance-reward wrapper (the one env family the sweep
    previously lacked). Baseline stand-in: the reference's best
    CircleSquare CPU rate (2,200 env-steps/s) — HideAndSeek wraps that
    same reference env with extra per-step host math, so its true CPU
    rate is at most that (favorable-to-reference denominator)."""
    import apx

    venv, params = apx.make_vec("CircleSquareHideAndSeek-v0", num_envs=num_envs)
    return venv, params, 2200.0


def make_mnist(num_envs: int, bank_points: int | None = None):
    """MNIST 5x5-glimpse classification (synthetic bank when the HF cache
    is absent; identical shapes/compute either way). bank_points=60000
    reproduces the real train-split bank size (HF_DATASET_GEOMETRY)."""
    from apx.core.env import AutoResetMode, vmap_vector_env
    from apx.data.huggingface import load_hf_image_bank
    from apx.envs.image_classification import ImageClassificationEnv

    env = ImageClassificationEnv(
        dataset=load_hf_image_bank("mnist", channels=1, num_points=bank_points)
    )
    params = env.default_params()
    venv = vmap_vector_env(env, num_envs, AutoResetMode.LOCKSTEP)
    return venv, params, 2200.0


def make_tin_loc(num_envs: int, bank_points: int | None = None):
    """TinyImageNetLoc: 64x64x3 images, 10x10 glimpse localization.
    bank_points=100000 reproduces the real train split (~1.17 GiB uint8)."""
    from apx.core.env import AutoResetMode, vmap_vector_env
    from apx.data.huggingface import load_hf_image_bank
    from apx.envs.image_localization import ImageLocalizationEnv

    env = ImageLocalizationEnv(
        dataset=load_hf_image_bank("zh-plus/tiny-imagenet", num_points=bank_points),
        sensor_size=(10, 10),
    )
    # Above N=8192 the (P, d) candidate-glimpse buffer of the explicit-reset
    # uniqueness sweep (875 KB/env) exceeds HBM; the streamed backend
    # recomputes column blocks instead of materializing it (scores equal to
    # ~5e-7, ~3x the sweep MACs — explicit reset only).
    params = env.default_params(
        unique_sampling_backend="streamed" if num_envs > 8192 else "auto"
    )
    venv = vmap_vector_env(env, num_envs, AutoResetMode.LOCKSTEP)
    return venv, params, 2200.0


def make_cifar10(num_envs: int, bank_points: int | None = None):
    """CIFAR10 5x5-glimpse classification. bank_points=50000 = real train split."""
    from apx.core.env import AutoResetMode, vmap_vector_env
    from apx.data.huggingface import load_hf_image_bank
    from apx.envs.image_classification import ImageClassificationEnv

    env = ImageClassificationEnv(
        dataset=load_hf_image_bank("cifar10", num_points=bank_points)
    )
    params = env.default_params()
    venv = vmap_vector_env(env, num_envs, AutoResetMode.LOCKSTEP)
    return venv, params, 2200.0


# Registry ids for --compat: the SAME envs measured through the gymnasium
# drop-in adapter (numpy in/out, host loss composition) — the path a
# reference user lands on first, and the apples-to-apples comparison with
# the reference's own SyncVectorEnv numbers.
COMPAT_IDS = {
    "circle_square": "CircleSquare-v0",
    "hide_and_seek": "CircleSquareHideAndSeek-v0",
    "light_dark": "LightDark-v0",
    "mnist": "MNIST-v0",
    "cifar10": "CIFAR10-v0",
    "tin_loc": "TinyImageNetLoc-v0",
    "lidar_rooms": "LIDARLocRooms-v0",
    "lidar_rooms_static": "LIDARLocRoomsStatic-v0",
    "lidar_maze": "LIDARLocMaze-v0",
}

# Denominators = the reference's OWN measured in-container throughput on
# the same env (BASELINE.md) — the honest comparison for this host-loop
# adapter path. (The device-loop records divide the LIDAR family by the
# BASELINE.json 1M-aggregate north-star instead; using that here made the
# compat rows read as ~0.003 "vs baseline" when the adapter is actually
# several times FASTER than the reference — a category error, fixed.)
# LIDAR reference numbers are single-env via the pure-NumPy geometry shim
# (SyncVectorEnv scales negatively, so single-env flatters the reference):
# rooms 765/s (measured 2026-08-17), maze 274/s + static 979/s (measured
# 2026-08-19, same harness).
COMPAT_BASELINES = {
    "circle_square": 2200.0,
    "light_dark": 4642.0,
    "mnist": 2200.0,
    "cifar10": 2200.0,
    "tin_loc": 2200.0,
    "lidar_rooms": 765.0,
    "lidar_rooms_static": 979.0,
    "lidar_maze": 274.0,
}


# vs_baseline has two denominator semantics (ADVICE r4 finding): the LIDAR
# family's device rows divide by the BASELINE.json 1M-aggregate north-star
# (no reference CPU number exists — shapely is absent in-container); every
# other device row and all compat rows divide by the reference's own
# measured container-CPU throughput. baseline_kind makes the denominator
# machine-readable per record so downstream tooling never compares the two.
BASELINE_KINDS = {
    "lidar_rooms": "north_star_1m_aggregate",
    "lidar_rooms_static": "north_star_1m_aggregate",
    "lidar_maze": "north_star_1m_aggregate",
}


def baseline_kind(name: str) -> str:
    return BASELINE_KINDS.get(name, "reference_cpu_measured")


def bench_compat(env_id: str, num_envs: int, num_steps: int) -> float:
    """env-steps/s through the gymnasium drop-in (apx.compat.make_vec,
    rng='native'): includes the host->device action upload, device step,
    device->host observation fetch and host loss composition every step —
    the end-user cost of the drop-in API, unlike bench_env's resident
    device loop. Actions rotate through 8 pre-drawn batches so the axon
    relay's identical-call memoization cannot shortcut repeated steps."""
    import numpy as np

    import apx.compat as apc

    env = apc.make_vec(env_id, num_envs=num_envs, rng="native", log_wrapper=False)
    rng = np.random.default_rng(0)
    acts = [
        {
            "action": rng.uniform(
                -1, 1, (num_envs, *env.single_action_space["action"].shape)
            ).astype(np.float32),
            "prediction": rng.normal(
                size=(num_envs, *env.single_action_space["prediction"].shape)
            ).astype(np.float32),
        }
        for _ in range(8)
    ]
    env.reset(seed=0)
    # Warmup must cross an episode boundary: the boundary/autoreset step is
    # a SEPARATE jit from the plain step (apx/compat/gym_env.py), and for
    # next_step-mode envs the reset-merge runs on the step AFTER the done —
    # so step until one done has been seen and then once more, or those
    # compiles land inside the timed region and understate the steady state.
    done_seen = False
    for i in range(512):
        *_, term, trunc, _ = env.step(acts[i % 8])
        if done_seen:
            break  # this step consumed the post-done reset-merge path
        done_seen = bool(np.any(np.asarray(term) | np.asarray(trunc)))
    env.reset(seed=0)  # time from a clean episode phase
    t0 = time.perf_counter()
    for i in range(num_steps):
        env.step(acts[i % 8])
    dt = time.perf_counter() - t0
    env.close()
    return num_envs * num_steps / dt


BENCHES = {
    "circle_square": make_circle_square,
    "hide_and_seek": make_hide_and_seek,
    "light_dark": make_light_dark,
    "mnist": make_mnist,
    "cifar10": make_cifar10,
    "tin_loc": make_tin_loc,
    "lidar_rooms": make_lidar_rooms,
    "lidar_rooms_static": make_lidar_rooms_static,
    "lidar_maze": make_lidar_maze,
}

# Makers whose dataset bank size is configurable (--bank-points), with the
# real split size they should be measured at per BASELINE.md's north-star
# configs (HF_DATASET_GEOMETRY in apx/data/huggingface.py).
BANKED = {"mnist": 60000, "cifar10": 50000, "tin_loc": 100000}


def _make(name: str, num_envs: int, bank_points: int | None):
    mk = BENCHES[name]
    if name in BANKED:
        return mk(num_envs, bank_points=bank_points)
    return mk(num_envs)


def device_fingerprint() -> dict:
    """Identity of the chip this process was handed, so cross-round bench
    JSONs can separate chip luck from real regressions (PERF.md documents a
    2.4x same-binary throughput spread between relay sessions)."""
    d = jax.devices()[0]
    return {
        "platform": d.platform,
        "device_kind": getattr(d, "device_kind", "unknown"),
        "num_devices": jax.device_count(),
    }


def calibration_number(num_envs: int = 4096, steps: int = 200) -> float:
    """Fixed-config lidar_rooms throughput: the per-chip speed reference.

    Every emitted PERF file carries this so two rounds' numbers can be
    normalized chip-to-chip (ratio-to-calibration comparisons survive the
    relay's chip variance; absolute numbers do not)."""
    venv, params, _ = make_lidar_rooms(num_envs)
    return bench_env(venv, params, steps, jax.random.key(7))


def bench_env_multihost(venv, params, num_steps: int, key, num_envs_per_device):
    """Mesh-sharded rollout over ALL global devices (per BASELINE.json's
    host-scaling-efficiency metric). Runnable as-is on a real v5e-8+ slice:
    each host calls this after jax.distributed.initialize(); GSPMD shards
    the env batch over the global mesh and the timed region contains no
    host round-trips. Also runs on the virtual CPU mesh
    (XLA_FLAGS=--xla_force_host_platform_device_count=8)."""
    from apx.distrib import (
        EnvSharding,
        make_env_mesh,
        shard_params,
        sharded_rollout,
    )

    mesh = make_env_mesh()
    sharding = EnvSharding(mesh)
    ndev = sharding.num_devices()
    n = venv.num_envs
    assert n == num_envs_per_device * ndev
    params = shard_params(sharding, params)
    act_space = venv.env.inner_action_space(params)
    pred_space = venv.env.prediction_space(params)

    def policy(k, obs):
        ka, kp = jax.random.split(k)
        return {
            "action": jax.random.uniform(
                ka, (n, *act_space.shape), minval=-1.0, maxval=1.0
            ),
            "prediction": jax.random.normal(kp, (n, *pred_space.shape)),
        }

    from apx.core.env import AutoResetMode

    period = (
        int(params.step_limit)
        if (
            venv.autoreset is AutoResetMode.LOCKSTEP
            and hasattr(params, "step_limit")
        )
        else None
    )
    run = sharded_rollout(
        venv, sharding, params, policy, num_steps, episodic_period=period
    )
    wk, bk = jax.random.split(key)
    out = run(wk)  # warmup/compile
    float(out[1])  # value fetch: the only reliable barrier on the relay
    t0 = time.perf_counter()
    out = run(bk)
    float(out[1])
    dt = time.perf_counter() - t0
    return n * num_steps / dt, ndev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="lidar_rooms", choices=sorted(BENCHES))
    ap.add_argument("--num-envs", type=int, default=4096)
    # 8192 (1024 through most of round 5, 256 through round 4): the axon
    # relay charges a FIXED ~25 ms per jit call (dispatch + completion +
    # the scalar-fetch barrier). Round 4 sized the run at 1024 steps when
    # the LIDAR step was ~173 us (fixed charge <8%); round 5 cut the step
    # to ~54 us, so the same 1024-step run was paying the charge at ~31%
    # again — the steps={1024,4096,8192} same-process re-sweep (PERF.md
    # round 5) measured 49.8M/66.3M/70.0M env-steps/s. 8192 amortizes the
    # charge to ~3% (93% of the device-busy rate) while keeping every
    # timed run under a second AND keeping the (steps, N, 2) f32
    # policy-draw buffers within the 256 MB hoist budget at N=4096.
    # The calibration run stays at its fixed 4096x200 anchor.
    ap.add_argument("--steps", type=int, default=8192)
    ap.add_argument("--all", action="store_true", help="print one line per env")
    ap.add_argument(
        "--profile", metavar="DIR", default=None,
        help="capture a jax.profiler trace of the timed region into DIR "
        "(summarize with python -m apx.tools.parse_trace DIR)",
    )
    ap.add_argument(
        "--compat", action="store_true",
        help="measure through the gymnasium drop-in adapter (numpy in/out "
        "+ host loss composition) instead of the resident device loop",
    )
    ap.add_argument(
        "--multihost", action="store_true",
        help="shard --num-envs PER DEVICE over the global mesh "
        "(call jax.distributed via --distributed on multi-host slices)",
    )
    ap.add_argument(
        "--distributed", action="store_true",
        help="call jax.distributed.initialize() before anything else",
    )
    ap.add_argument(
        "--bank-points", type=int, default=None,
        help="dataset-bank size for mnist/cifar10/tin_loc (default: capped "
        "synthetic bank; use --real-banks for true split sizes)",
    )
    ap.add_argument(
        "--real-banks", action="store_true",
        help="size each dataset bank at its REAL split size "
        "(mnist=60k, cifar10=50k, tin_loc=100k)",
    )
    ap.add_argument(
        "--emit", metavar="FILE", default=None,
        help="also write a single JSON document with all results, a device "
        "fingerprint and a calibration number (for PERF_rN.json)",
    )
    ap.add_argument(
        "--glimpse-precision", default=None,
        choices=["default", "high", "highest"],
        help="override the image envs' glimpse_precision param (A/B the "
        "MXU pass-count ladder, PERF.md round 3)",
    )
    ap.add_argument(
        "--key-impl", default=None, choices=["threefry2x32", "rbg", "unsafe_rbg"],
        help="PRNG implementation for the root key (propagates through every "
        "split into policy and env randomness). 'rbg' uses the TPU hardware "
        "RNG instead of threefry hashing — same-process A/B candidate for "
        "RNG-heavy steps; trajectories differ, throughput comparison only",
    )
    ap.add_argument(
        "--obs-probe", default="step", choices=["step", "leaf1", "none"],
        help="liveness probe form in the bench policy. 'step' (default) "
        "folds one element per obs leaf into every step's action; its "
        "[0]-slices look like ~1.8 us/leaf of apparatus in the profile "
        "table but are LOAD-BEARING for the while-body schedule: 'none' "
        "and 'leaf1' (first leaf only — drops the map-channel dependence) "
        "both measured ~51M vs 70M env-steps/s on LIDARLocRooms (PERF.md "
        "round 5 final A/B); kept as reproducible A/B surfaces",
    )
    ap.add_argument(
        "--deep", action="store_true",
        help="one-process round capture: standard sweep, batch-scaling rows "
        "(N=16384), threefry-vs-rbg A/B, compat-adapter rows — all on the "
        "same chip so every comparison is same-session valid; combine with "
        "--emit",
    )
    ap.add_argument(
        "--ab-banks", action="store_true",
        help="same-process A/B: each banked env at the capped-synthetic size "
        "AND its real split size (the only comparison that survives the "
        "relay's chip variance, PERF.md)",
    )
    args = ap.parse_args()

    if args.deep:
        # --deep is the fixed one-process round capture; silently absorbing
        # config flags (or letting an earlier mode branch hijack the run, as
        # --multihost/--profile would) would mislabel the PERF history, so
        # refuse them.
        for flag, bad in (
            ("--env", args.env != ap.get_default("env")),
            ("--all", args.all),
            ("--compat", args.compat),
            ("--ab-banks", args.ab_banks),
            ("--key-impl", args.key_impl is not None),
            ("--multihost", args.multihost),
            ("--distributed", args.distributed),
            ("--profile", args.profile is not None),
        ):
            if bad:
                ap.error(f"{flag} conflicts with --deep (fixed capture plan)")

    if args.compat:
        # The adapter path draws host numpy actions and builds envs with
        # their default config — none of these flags reach it, and a record
        # that silently measured the defaults would be misread against
        # device-loop rows captured with them.
        for flag, bad in (
            ("--real-banks", args.real_banks),
            ("--bank-points", args.bank_points is not None),
            ("--glimpse-precision", args.glimpse_precision is not None),
            ("--key-impl", args.key_impl is not None),
            ("--ab-banks", args.ab_banks),
            ("--multihost", args.multihost),
            ("--profile", args.profile is not None),
        ):
            if bad:
                ap.error(f"{flag} conflicts with --compat (not plumbed "
                         "through the adapter bench)")

    pre = None
    if args.distributed:
        from apx.distrib import init_distributed

        # Must run before the watchdog probe touches jax.devices():
        # initializing the local backend first makes jax.distributed
        # refuse, which apx.distrib treats as "already initialized" and
        # every host would silently proceed single-process.
        pre = init_distributed

    failure = init_backend_guarded(pre=pre)
    if failure is not None:
        print(json.dumps(failure), flush=True)
        if args.emit:
            with open(args.emit, "w") as f:
                json.dump(failure, f, indent=1)
                f.write("\n")
        # The JSON line above IS the artifact; exit 0 so the driver's
        # parser records it (the "error"/"phase" fields mark the outage).
        # A stuck watchdog thread would block normal interpreter teardown,
        # so leave via os._exit.
        sys.stdout.flush()
        os._exit(0)

    if args.multihost:
        ndev = len(jax.devices())
        total = args.num_envs * ndev
        venv, params, baseline = BENCHES[args.env](total)
        mh_key = (
            jax.random.key(0, impl=args.key_impl)
            if args.key_impl
            else jax.random.key(0)
        )
        sps, ndev = bench_env_multihost(
            venv, params, args.steps, mh_key, args.num_envs
        )
        if jax.process_index() == 0:
            print(
                json.dumps(
                    {
                        "metric": f"{args.env}_env_steps_per_s_multichip",
                        "value": round(sps, 1),
                        "unit": "env-steps/s",
                        "vs_baseline": round(sps / baseline, 3),
                        "baseline_kind": baseline_kind(args.env),
                        "devices": ndev,
                        "processes": jax.process_count(),
                        "per_device": round(sps / ndev, 1),
                        "device_kind": device_fingerprint()["device_kind"],
                        **({"key_impl": args.key_impl} if args.key_impl else {}),
                    }
                )
            )
        return

    key = (
        jax.random.key(0, impl=args.key_impl) if args.key_impl else jax.random.key(0)
    )
    fp = device_fingerprint()

    def _apply_overrides(params):
        if args.glimpse_precision and hasattr(params, "glimpse_precision"):
            params = params.replace(glimpse_precision=args.glimpse_precision)
        return params

    if args.ab_banks:
        ab_records = []
        for name, real in sorted(BANKED.items()):
            for pts in (8192, real):
                venv, params, baseline = _make(name, args.num_envs, pts)
                params = _apply_overrides(params)
                rec = {
                    "metric": f"{name}_env_steps_per_s",
                    "value": round(bench_env(venv, params, args.steps, key), 1),
                    "unit": "env-steps/s",
                    "num_envs": args.num_envs,
                    "bank_points": pts,
                    "device_kind": fp["device_kind"],
                }
                rec["vs_baseline"] = round(rec["value"] / baseline, 3)
                rec["baseline_kind"] = baseline_kind(name)
                if args.glimpse_precision:
                    rec["glimpse_precision"] = args.glimpse_precision
                ab_records.append(rec)
                print(json.dumps(rec), flush=True)
        if args.emit:
            doc = {
                "fingerprint": fp,
                "num_envs": args.num_envs,
                "steps": args.steps,
                "ab_banks": True,
                "results": ab_records,
            }
            with open(args.emit, "w") as f:
                json.dump(doc, f, indent=1)
                f.write("\n")
        return

    if args.deep:
        records = []

        def run_one(name, num_envs, steps, bank_points=None, key_impl=None, **extra):
            k = (
                jax.random.key(0, impl=key_impl) if key_impl else jax.random.key(0)
            )
            if bank_points is None:
                # honor the bank-size flags in every segment (a capture that
                # silently measured the default sizes would be misread as an
                # A/B result in the PERF history)
                if args.real_banks and name in BANKED:
                    bank_points = BANKED[name]
                else:
                    bank_points = args.bank_points
            stats: dict = {}
            try:
                venv, params, baseline = _make(name, num_envs, bank_points)
                params = _apply_overrides(params)
                sps = bench_env(venv, params, steps, k, stats=stats)
            except Exception as e:  # noqa: BLE001 — keep the capture going
                rec = {"metric": f"{name}_env_steps_per_s", "error": str(e)[:300],
                       "num_envs": num_envs, **extra}
                records.append(rec)
                print(json.dumps(rec), flush=True)
                return
            rec = {
                "metric": f"{name}_env_steps_per_s",
                "value": round(sps, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(sps / baseline, 3),
                "baseline_kind": baseline_kind(name),
                **stats,
                "num_envs": num_envs,
                "device_kind": fp["device_kind"],
                **({"key_impl": key_impl} if key_impl else {}),
                **({"bank_points": bank_points} if bank_points else {}),
                **(
                    {"glimpse_precision": args.glimpse_precision}
                    if args.glimpse_precision and hasattr(params, "glimpse_precision")
                    else {}
                ),
                **extra,
            }
            records.append(rec)
            print(json.dumps(rec), flush=True)

        # 1. standard sweep (the cross-round comparable configuration)
        for name in sorted(BENCHES):
            run_one(name, args.num_envs, args.steps, segment="sweep")
        # 2. batch scaling: the envs with documented N-scaling behavior.
        # Steps scale inversely with N so each timed run does the same
        # total env-step work (constant fixed-charge amortization, and the
        # slow tin_loc row stays ~4 s instead of ~16 s per run).
        scaled = max(1024, args.steps * args.num_envs // 16384)
        for name in ("lidar_rooms", "mnist", "tin_loc"):
            run_one(name, 16384, scaled, segment="scaling")
        # 3. PRNG A/B: hardware RNG vs threefry on RNG-sensitive steps
        for name in ("circle_square", "light_dark", "lidar_rooms"):
            run_one(name, args.num_envs, args.steps, key_impl="rbg", segment="prng_ab")
        # 4. drop-in adapter rows
        for name in ("circle_square", "lidar_rooms"):
            try:
                sps = bench_compat(COMPAT_IDS[name], args.num_envs, min(args.steps, 64))
                rec = {
                    "metric": f"{name}_compat_env_steps_per_s",
                    "value": round(sps, 1),
                    "unit": "env-steps/s",
                    "vs_baseline": round(sps / COMPAT_BASELINES[name], 3),
                    "baseline_kind": "reference_cpu_measured",
                    "num_envs": args.num_envs,
                    "device_kind": fp["device_kind"],
                    "segment": "compat",
                }
            except Exception as e:  # noqa: BLE001
                rec = {"metric": f"{name}_compat_env_steps_per_s",
                       "error": str(e)[:300], "segment": "compat"}
            records.append(rec)
            print(json.dumps(rec), flush=True)

        if args.emit:
            doc = {
                "fingerprint": fp,
                "calibration_lidar_rooms_4096x200": round(calibration_number(), 1),
                "num_envs": args.num_envs,
                "steps": args.steps,
                "deep": True,
                "results": records,
            }
            with open(args.emit, "w") as f:
                json.dump(doc, f, indent=1)
                f.write("\n")
        return

    names = sorted(BENCHES) if args.all else [args.env]
    records = []
    if args.compat:
        for name in names:
            try:
                # The adapter's host loop runs ~6 vector-steps/s through the
                # relay; cap its step count so a default --steps sweep stays
                # minutes, not hours (per-step cost is flat after ~10 steps).
                sps = bench_compat(
                    COMPAT_IDS[name], args.num_envs, min(args.steps, 256)
                )
            except Exception as e:  # noqa: BLE001 — sweep over optional ids
                if not args.all:
                    raise
                print(f"# compat {name} skipped: {e}", flush=True)
                continue
            baseline = COMPAT_BASELINES[name]
            rec = {
                "metric": f"{name}_compat_env_steps_per_s",
                "value": round(sps, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(sps / baseline, 3),
                "baseline_kind": "reference_cpu_measured",
                "num_envs": args.num_envs,
                "device_kind": fp["device_kind"],
            }
            records.append(rec)
            print(json.dumps(rec), flush=True)
        if args.emit:
            doc = {
                "fingerprint": fp,
                "num_envs": args.num_envs,
                "steps": args.steps,
                "compat": True,
                "results": records,
            }
            with open(args.emit, "w") as f:
                json.dump(doc, f, indent=1)
                f.write("\n")
        return

    for name in names:
        bank_points = args.bank_points
        if args.real_banks and name in BANKED:
            bank_points = BANKED[name]
        try:
            venv, params, baseline = _make(name, args.num_envs, bank_points)
        except (ImportError, AttributeError):
            if args.all:
                continue  # env family not built yet
            name = "circle_square"
            venv, params, baseline = _make(name, args.num_envs, None)
        params = _apply_overrides(params)
        stats: dict = {}
        if args.profile:
            with jax.profiler.trace(args.profile):
                sps = bench_env(
                    venv, params, args.steps, key, obs_probe=args.obs_probe
                )
        else:
            sps = bench_env(
                venv, params, args.steps, key, stats=stats,
                obs_probe=args.obs_probe,
            )
        rec = {
            "metric": f"{name}_env_steps_per_s",
            "value": round(sps, 1),
            "unit": "env-steps/s",
            "vs_baseline": round(sps / baseline, 3),
            "baseline_kind": baseline_kind(name),
            "num_envs": args.num_envs,
            "device_kind": fp["device_kind"],
            **stats,
        }
        if name in BANKED:
            rec["bank_points"] = bank_points or "default"
        if args.glimpse_precision and hasattr(params, "glimpse_precision"):
            rec["glimpse_precision"] = args.glimpse_precision
        if args.key_impl:
            rec["key_impl"] = args.key_impl
        if args.obs_probe != "none":
            rec["obs_probe"] = args.obs_probe
        records.append(rec)
        print(json.dumps(rec), flush=True)

    if args.emit:
        doc = {
            "fingerprint": fp,
            "calibration_lidar_rooms_4096x200": round(calibration_number(), 1),
            "num_envs": args.num_envs,
            "steps": args.steps,
            "real_banks": bool(args.real_banks),
            "results": records,
        }
        with open(args.emit, "w") as f:
            json.dump(doc, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
