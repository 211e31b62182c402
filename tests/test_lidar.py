"""LIDAR localization: floor maps, raycast, env behavior.

The reference LIDAR env needs shapely (absent here), so raycast correctness
is checked against an independent edge-intersection oracle instead of
golden trajectories; floor-map generation is checked bitwise against the
reference's generators, which are importable.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import load_reference_ap_gym

from apx.core.env import AutoResetMode, vmap_vector_env
from apx.data.floor_map import (
    generate_maze_map,
    generate_rooms_map,
    make_maze_bank,
    make_rooms_bank,
)
from apx.envs.lidar_localization import LIDARLocalizationEnv
from apx.ops.raycast import lidar_directions, raycast_grid
from apx.wrappers import Sparsify, TimeLimit


# ---------------------------------------------------------------------------
# Floor maps
# ---------------------------------------------------------------------------


def test_maze_matches_reference_bitwise():
    ref = load_reference_ap_gym()
    if ref is None:
        pytest.skip("reference not importable")
    from ap_gym.envs.floor_map.floor_map_dataset_maze import FloorMapDatasetMaze

    ds = FloorMapDatasetMaze()
    for idx in [0, 1, 7, 12345, 2**31 + 7]:
        np.testing.assert_array_equal(ds.get_data_point(idx), generate_maze_map(idx))


def test_rooms_matches_reference_bitwise():
    ref = load_reference_ap_gym()
    if ref is None:
        pytest.skip("reference not importable")
    from ap_gym.envs.floor_map.floor_map_dataset_rooms import FloorMapDatasetRooms

    ds = FloorMapDatasetRooms()
    for idx in [0, 1, 7, 999999, 2**31 + 7]:
        np.testing.assert_array_equal(ds.get_data_point(idx), generate_rooms_map(idx))


def test_map_banks():
    bank = make_maze_bank(num_maps=4)
    assert bank.maps.shape == (4, 21, 21)
    assert bank.map_hw == (21, 21)
    # Border is wall, free counts consistent.
    m = np.asarray(bank.maps)
    assert m[:, 0, :].all() and m[:, -1, :].all()
    np.testing.assert_array_equal(
        np.asarray(bank.free_counts), (~m).reshape(4, -1).sum(-1)
    )
    rbank = make_rooms_bank(num_maps=2)
    assert rbank.maps.shape == (2, 32, 32)


# ---------------------------------------------------------------------------
# Raycast vs an independent edge-intersection oracle
# ---------------------------------------------------------------------------


def _oracle_raycast(occ, origin, target, eps=1e-3):
    """Nearest intersection of segment origin->target with the union of wall
    cells, via explicit segment-vs-edge intersections + inside tests (a
    different algorithm than the slab method under test)."""
    o = np.asarray(origin, float)
    t = np.asarray(target, float)
    d = t - o
    seg_len = np.linalg.norm(d)
    best = np.inf
    ys, xs = np.where(np.asarray(occ))
    for y, x in zip(ys, xs):
        # Inside (boundary-inclusive) at s=0?
        if x <= o[0] <= x + 1 and y <= o[1] <= y + 1:
            best = min(best, 0.0)
            continue
        for axis, c in ((0, x), (0, x + 1), (1, y), (1, y + 1)):
            if d[axis] == 0:
                continue
            s = (c - o[axis]) / d[axis]
            if 0 <= s <= 1:
                other = o[1 - axis] + s * d[1 - axis]
                lo = y if axis == 0 else x
                if lo <= other <= lo + 1:
                    best = min(best, s)
    if np.isinf(best):
        return seg_len
    return max(best * seg_len - eps, 0.0)


def test_raycast_matches_oracle():
    rng = np.random.default_rng(0)
    occ = generate_rooms_map(3)
    h, w = occ.shape
    free_y, free_x = np.where(~occ)
    for trial in range(50):
        i = rng.integers(len(free_y))
        origin = np.array([free_x[i], free_y[i]], float) + rng.uniform(0.05, 0.95, 2)
        ang = rng.uniform(-np.pi, np.pi)
        rang = rng.uniform(0.1, 6.0)
        target = origin + np.array([np.cos(ang), np.sin(ang)]) * rang
        dist, _ = raycast_grid(
            jnp.asarray(occ), jnp.asarray(origin, dtype=jnp.float32),
            jnp.asarray(target, dtype=jnp.float32)[None],
        )
        expect = _oracle_raycast(occ, origin, target)
        assert abs(float(dist[0]) - expect) < 1e-4, (trial, origin, target)


def test_raycast_miss_returns_full_length():
    occ = np.zeros((8, 8), bool)
    occ[0, :] = occ[-1, :] = occ[:, 0] = occ[:, -1] = True
    d, t = raycast_grid(
        jnp.asarray(occ), jnp.array([4.0, 4.0]), jnp.array([[4.5, 4.5]])
    )
    np.testing.assert_allclose(float(d[0]), np.sqrt(0.5), rtol=1e-6)
    assert np.isinf(float(t[0]))


def test_lidar_directions_match_reference_convention():
    dirs = np.asarray(lidar_directions(8))
    ang = np.linspace(-np.pi, np.pi, 8, dtype=np.float32, endpoint=False)
    np.testing.assert_allclose(dirs, np.stack([np.cos(ang), np.sin(ang)], -1))


# ---------------------------------------------------------------------------
# Env behavior
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rooms_env():
    env = LIDARLocalizationEnv(map_bank=make_rooms_bank(num_maps=8))
    return env, env.default_params()


def test_lidar_env_reset(rooms_env):
    env, params = rooms_env
    obs, state, info = jax.jit(env.reset, static_argnums=())(
        jax.random.PRNGKey(0), params
    )
    assert obs["lidar"].shape == (8,)
    assert obs["odometry"].shape == (2,)
    assert obs["map"].shape == (32, 32, 1)
    # Start cell is free and centered.
    x, y = np.asarray(state.pos)
    assert (x % 1, y % 1) == (0.5, 0.5)
    assert not bool(state.occ[int(y), int(x)])
    # Map obs carries the reference's bool/255 quirk: values in {0, 1/255}.
    vals = np.unique(np.asarray(obs["map"]))
    assert set(np.round(vals * 255).astype(int)).issubset({0, 1})
    np.testing.assert_allclose(np.asarray(obs["odometry"]), 0.0)


def test_lidar_env_step_semantics(rooms_env):
    env, params = rooms_env
    key = jax.random.PRNGKey(1)
    obs, state, _ = env.reset(key, params)

    act = jnp.array([0.3, -0.2])
    pred = jnp.array([0.1, 0.1])
    step = jax.jit(lambda k, s, a, p: env.step(k, s, {"action": a, "prediction": p}, params))
    obs2, state2, reward, term, trunc, info = step(key, state, act, pred)

    # base_reward = 0.1 - 1e-3 * sum(a^2); loss = normalized MSE vs previous pos.
    base = 0.1 - 1e-3 * float(jnp.sum(act**2))
    size = np.array([32.0, 32.0])
    target = np.asarray(state.pos) / size * 2 - 1
    mse = np.mean((np.asarray(pred) - target) ** 2)
    norm = mse / ((2.0 / np.sqrt(12)) ** 2)
    np.testing.assert_allclose(float(info["base_reward"]), base, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(info["prediction"]["target"]), target, rtol=1e-6)
    np.testing.assert_allclose(float(reward), base - norm, rtol=1e-5)

    # Movement magnitude <= |action| and the agent never ends inside a wall.
    moved = np.linalg.norm(np.asarray(state2.pos) - np.asarray(state.pos))
    assert moved <= np.linalg.norm(np.asarray(act)) + 1e-6
    x, y = np.asarray(state2.pos)
    assert not bool(state.occ[min(int(y), 31), min(int(x), 31)])


def test_lidar_env_never_crosses_walls(rooms_env):
    env, params = rooms_env
    venv = vmap_vector_env(env, 64, AutoResetMode.NEXT_STEP)
    key = jax.random.PRNGKey(2)
    obs, vstate, _ = jax.jit(venv.reset)(key, params)

    @jax.jit
    def run(key, vstate):
        def body(carry, k):
            vs = carry
            ka, kp, ks = jax.random.split(k, 3)
            act = {
                "action": jax.random.uniform(ka, (64, 2), minval=-1, maxval=1) * 3.0,
                "prediction": jax.random.uniform(kp, (64, 2), minval=-1, maxval=1),
            }
            obs, vs2, r, te, tr, info = venv.step(ks, vs, act, params)
            return vs2, (vs2.inner.pos, vs2.inner.occ)
        keys = jax.random.split(key, 40)
        return jax.lax.scan(body, vstate, keys)

    vstate_f, (poss, occs) = run(key, vstate)
    poss = np.asarray(poss)  # (T, N, 2)
    occs = np.asarray(occs)  # (T, N, H, W)
    xi = np.clip(poss[..., 0].astype(int), 0, 31)
    yi = np.clip(poss[..., 1].astype(int), 0, 31)
    in_wall = occs[
        np.arange(40)[:, None], np.arange(64)[None, :], yi, xi
    ]
    # Positions exactly on upper cell boundaries floor into the wall cell;
    # exclude those (agent is on the boundary, not inside).
    on_boundary = ((poss[..., 0] % 1) == 0) | ((poss[..., 1] % 1) == 0)
    assert not np.any(in_wall & ~on_boundary)


def test_lidar_static_map_mode():
    env = LIDARLocalizationEnv(map_bank=make_maze_bank(num_maps=2))
    params = env.default_params(static_map=True, static_map_pos=1)
    obs, state, info = env.reset(jax.random.PRNGKey(5), params)
    assert "map" not in obs
    assert int(state.bank_pos) == 1
    np.testing.assert_array_equal(
        np.asarray(state.occ), np.asarray(params.map_bank.maps[1])
    )


def test_lidar_with_time_limit_and_sparsify():
    env = LIDARLocalizationEnv(map_bank=make_rooms_bank(num_maps=4))
    wrapped = Sparsify(TimeLimit(env, max_episode_steps=10, issue_termination=True))
    params = wrapped.default_params()
    key = jax.random.PRNGKey(3)
    obs, state, _ = wrapped.reset(key, params)
    assert float(obs["time_step"]) == -1.0

    act = {"action": jnp.zeros(2), "prediction": jnp.zeros(2)}
    term = False
    for i in range(10):
        obs, state, reward, term, trunc, info = wrapped.step(key, state, act, params)
        # Sparse: reward carries no loss until the terminal step.
        if i < 9:
            assert not bool(term)
            np.testing.assert_allclose(float(reward), 0.1, rtol=1e-6)
        # info reports the dense loss even in sparse mode (reference quirk).
        assert float(info["prediction"]["loss"]) > 0 or i == 0
    assert bool(term)
    assert float(obs["time_step"]) == 1.0
    # Terminal step: weight 1 -> reward includes the loss.
    assert float(reward) < 0.1


def test_windowed_raycast_matches_brute():
    from apx.ops.raycast import pad_occupancy, raycast_grid_windowed

    rng = np.random.default_rng(7)
    occ = generate_rooms_map(11)
    padded = jnp.asarray(pad_occupancy(jnp.asarray(occ), 6))
    free_y, free_x = np.where(~occ)
    dirs = np.asarray(lidar_directions(8)) * 5.0
    for _ in range(20):
        i = rng.integers(len(free_y))
        origin = np.array([free_x[i], free_y[i]], np.float32) + rng.uniform(
            0.05, 0.95, 2
        ).astype(np.float32)
        targets = (origin + dirs).astype(np.float32)
        d_brute, _ = raycast_grid(jnp.asarray(occ), jnp.asarray(origin), jnp.asarray(targets))
        d_win, _ = raycast_grid_windowed(
            padded, 6, jnp.asarray(origin), jnp.asarray(targets), 6
        )
        np.testing.assert_allclose(np.asarray(d_brute), np.asarray(d_win), atol=1e-5)


def test_native_map_generators():
    from apx.data.native import native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    from apx.data.floor_map import make_maze_bank, make_rooms_bank

    bank = make_maze_bank(num_maps=16, backend="native")
    m = np.asarray(bank.maps)
    assert m.shape == (16, 21, 21)
    assert m[:, 0, :].all() and m[:, -1, :].all()
    assert not m[:, 1, 1].any()  # start cell carved
    # Deterministic by index.
    bank2 = make_maze_bank(num_maps=16, backend="native")
    np.testing.assert_array_equal(m, np.asarray(bank2.maps))
    r = np.asarray(make_rooms_bank(num_maps=8, backend="native").maps)
    assert r.shape == (8, 32, 32) and r[:, 0, :].all()
    # Free space is connected (valid floor plan).
    from collections import deque

    for grid in (m[0], r[0]):
        free = ~grid
        ys, xs = np.where(free)
        seen = np.zeros_like(free)
        q = deque([(ys[0], xs[0])])
        seen[ys[0], xs[0]] = True
        while q:
            y, x = q.popleft()
            for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                ny, nx = y + dy, x + dx
                if (
                    0 <= ny < grid.shape[0]
                    and 0 <= nx < grid.shape[1]
                    and free[ny, nx]
                    and not seen[ny, nx]
                ):
                    seen[ny, nx] = True
                    q.append((ny, nx))
        assert (seen == free).all()


def test_map_bank_kind_dispatch():
    """Parity-mode map regeneration dispatches on the bank's generator
    KIND, not its shape: a non-default-sized maze bank still regenerates
    maze maps, and a custom bank refuses instead of silently guessing
    (round-1 footgun: shims.py used `(h, w) == (21, 21)` shape sniffing)."""
    import jax.numpy as jnp

    from apx.data.floor_map import (
        MapBank,
        generate_maze_map,
        make_maze_bank,
        make_rooms_bank,
    )
    from apx.envs.lidar_localization import LIDARLocalizationEnv
    from apx.compat.shims import LIDARShim

    assert make_maze_bank(num_maps=2).kind == "maze"
    assert make_rooms_bank(num_maps=2).kind == "rooms"

    # 11x11 maze bank (NOT the default 21x21): must regenerate MAZE maps.
    bank = make_maze_bank(num_maps=2, width=11, height=11)
    env = LIDARLocalizationEnv(map_bank=bank)
    shim = LIDARShim(env, env.default_params(), num_envs=1)
    occ = shim._generate_map(1234)
    np.testing.assert_array_equal(occ, generate_maze_map(1234, 11, 11))

    custom = MapBank(
        maps=jnp.zeros((1, 5, 5), bool),
        indices=jnp.zeros((1,), jnp.uint32),
        free_counts=jnp.full((1,), 25, jnp.int32),
    )
    env2 = LIDARLocalizationEnv(map_bank=custom)
    shim2 = LIDARShim(env2, env2.default_params(), num_envs=1)
    with pytest.raises(ValueError, match="custom"):
        shim2._generate_map(0)


def test_mxu_window_matches_dense():
    """The MXU one-hot-window raycast backend (default) matches the dense
    slab backend to float rounding across random trajectories (integer
    window translation is exact in f32; residual 1-ulp differences come
    from XLA's layout-dependent FMA contraction)."""
    import jax
    import jax.numpy as jnp

    import apx

    venv, p_mxu = apx.make_vec(
        "LIDARLocMaze-v0", num_envs=16, raycast_backend="mxu_window"
    )
    _, p_dense = apx.make_vec("LIDARLocMaze-v0", num_envs=16)
    assert p_mxu.use_mxu_window and not p_dense.use_mxu_window
    key = jax.random.PRNGKey(0)
    o1, s1, _ = venv.reset(key, p_mxu)
    o2, s2, _ = venv.reset(key, p_dense)
    np.testing.assert_array_equal(np.asarray(o1["lidar"]), np.asarray(o2["lidar"]))
    step = jax.jit(venv.step)
    # Horizon kept short of chaos: 1-ulp FMA differences eventually flip a
    # discrete wall-slide branch and trajectories separate (~step 35 here).
    for t in range(25):
        k = jax.random.fold_in(key, t)
        act = {
            "action": jax.random.uniform(k, (16, 2), minval=-1, maxval=1),
            "prediction": jnp.zeros((16, 2)),
        }
        o1, s1, r1, te1, *_ = step(k, s1, act, p_mxu)
        o2, s2, r2, te2, *_ = step(k, s2, act, p_dense)
        np.testing.assert_allclose(
            np.asarray(o1["lidar"]), np.asarray(o2["lidar"]), atol=3e-7,
            err_msg=f"step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(s1.inner.inner.pos), np.asarray(s2.inner.inner.pos), atol=3e-6
        )
        np.testing.assert_array_equal(np.asarray(te1), np.asarray(te2))


def test_pallas_window_matches_dense():
    """The Pallas window-extraction backend (interpret mode on CPU; real
    kernel on TPU) matches the dense backend to float rounding."""
    import jax
    import jax.numpy as jnp

    import apx

    venv, p_pw = apx.make_vec(
        "LIDARLocRooms-v0", num_envs=16, raycast_backend="pallas_window"
    )
    _, p_dense = apx.make_vec("LIDARLocRooms-v0", num_envs=16)
    assert p_pw.use_pallas_window
    key = jax.random.PRNGKey(2)
    o1, s1, _ = venv.reset(key, p_pw)
    o2, s2, _ = venv.reset(key, p_dense)
    np.testing.assert_array_equal(np.asarray(o1["lidar"]), np.asarray(o2["lidar"]))
    step = jax.jit(venv.step)
    for t in range(20):
        k = jax.random.fold_in(key, t)
        act = {
            "action": jax.random.uniform(k, (16, 2), minval=-1, maxval=1),
            "prediction": jnp.zeros((16, 2)),
        }
        o1, s1, r1, te1, *_ = step(k, s1, act, p_pw)
        o2, s2, r2, te2, *_ = step(k, s2, act, p_dense)
        np.testing.assert_allclose(
            np.asarray(o1["lidar"]), np.asarray(o2["lidar"]), atol=1.5e-6,
            err_msg=f"step {t}",
        )
        np.testing.assert_array_equal(np.asarray(te1), np.asarray(te2))


def test_fetch_halves_matches_pack_row_halves():
    """MapBank.fetch_halves (the reset-time packing the bitslab backends
    window from, carried in state.row_halves) is bitwise equal to packing
    the fetched bool map — on both the packed-row_words fast path and the
    bool-maps fallback."""
    import dataclasses

    import jax.numpy as jnp

    from apx.data.floor_map import make_maze_bank, make_rooms_bank
    from apx.ops.raycast import pack_row_halves

    for bank in (
        make_rooms_bank(num_maps=5, seed=11),
        make_maze_bank(num_maps=5, seed=12),
    ):
        assert bank.row_words is not None
        fallback = dataclasses.replace(bank, row_words=None)
        for i in range(5):
            idx = jnp.int32(i)
            expect = np.asarray(pack_row_halves(bank.fetch(idx)))
            np.testing.assert_array_equal(np.asarray(bank.fetch_halves(idx)), expect)
            np.testing.assert_array_equal(
                np.asarray(fallback.fetch_halves(idx)), expect
            )
        batched = np.asarray(bank.fetch_halves(jnp.arange(5)))
        for i in range(5):
            np.testing.assert_array_equal(
                batched[i], np.asarray(bank.fetch_halves(jnp.int32(i)))
            )


def test_bitslab_raycast_matches_dense_bitwise():
    """The bit-packed 16-column window raycast is BITWISE equal to the
    dense fast path: the window lattice keeps global coordinates, so every
    per-cell f32 expression is identical and the min-reduce runs over a
    superset of the contributing cells (raycast_grid_bitslab docstring)."""
    import jax.numpy as jnp

    from apx.ops.raycast import (
        bitslab_window,
        pack_row_halves,
        raycast_grid,
        raycast_grid_bitslab,
    )

    from apx.ops.raycast import bitslab_window_2d, raycast_grid_bitslab2d

    rng = np.random.default_rng(3)
    for mk, reps in ((generate_rooms_map, 40), (generate_maze_map, 40)):
        occ = mk(7)
        h, w = occ.shape
        halves = pack_row_halves(jnp.asarray(occ))
        # Packed halves reproduce the map exactly.
        occ_rt = np.asarray(bitslab_window(halves, jnp.int32(0), w))[:, :16]
        np.testing.assert_array_equal(occ_rt, occ[:, : min(16, w)])
        occ_rt2 = np.asarray(
            bitslab_window_2d(halves, jnp.int32(0), jnp.int32(0), w)
        )
        np.testing.assert_array_equal(
            occ_rt2, occ[: min(16, h), : min(16, w)]
        )
        free_y, free_x = np.where(~occ)
        for _ in range(reps):
            i = rng.integers(len(free_y))
            origin = np.array(
                [free_x[i], free_y[i]], np.float32
            ) + rng.uniform(0.0, 1.0, 2).astype(np.float32)
            ang = rng.uniform(-np.pi, np.pi, size=11)
            rad = rng.uniform(0.0, 5.0, size=11)
            targets = origin[None] + np.stack(
                [np.cos(ang) * rad, np.sin(ang) * rad], axis=-1
            ).astype(np.float32)
            base_x = np.float32(np.floor(origin[0]) - 7)
            base_y = np.float32(np.floor(origin[1]) - 7)
            occ_win = bitslab_window(halves, jnp.int32(base_x), w)
            d1, t1 = raycast_grid_bitslab(
                occ_win, jnp.float32(base_x), jnp.asarray(origin),
                jnp.asarray(targets),
            )
            d2, t2 = raycast_grid(
                jnp.asarray(occ), jnp.asarray(origin), jnp.asarray(targets),
                geos_typing=False,
            )
            np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
            np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
            occ_win2 = bitslab_window_2d(
                halves, jnp.int32(base_x), jnp.int32(base_y), w
            )
            d3, t3 = raycast_grid_bitslab2d(
                occ_win2, jnp.float32(base_x), jnp.float32(base_y),
                jnp.asarray(origin), jnp.asarray(targets),
            )
            np.testing.assert_array_equal(np.asarray(d3), np.asarray(d2))
            np.testing.assert_array_equal(np.asarray(t3), np.asarray(t2))


def test_bitslab2d_rho_slice_matches_full_window():
    """The static rho-sub-slice of the shared bitslab2d window (round-5:
    movement casts 256 -> 36 lattice cells, beams 256 -> 196) is bitwise
    equal to the full-window cast: every excluded cell fails a <= b.
    Adversarial geometry included — exact-integer origins and exact
    full-length axis-aligned rays, the face-touch cases the derivation in
    LIDARLocalizationEnv._raycast bounds."""
    import jax.numpy as jnp

    from apx.ops.raycast import (
        bitslab_window_2d,
        pack_row_halves,
        raycast_grid_bitslab2d,
    )

    rng = np.random.default_rng(17)
    occ = generate_rooms_map(5)
    h, w = occ.shape
    halves = pack_row_halves(jnp.asarray(occ))
    free_y, free_x = np.where(~occ)

    def compare(origin, targets, anchor, rho):
        base_x = np.float32(np.floor(anchor[0]) - 7)
        base_y = np.float32(np.floor(anchor[1]) - 7)
        win = bitslab_window_2d(halves, jnp.int32(base_x), jnp.int32(base_y), w)
        d_full, t_full = raycast_grid_bitslab2d(
            win, jnp.float32(base_x), jnp.float32(base_y),
            jnp.asarray(origin), jnp.asarray(targets),
        )
        lo, hi = max(6 - rho, 0), min(8 + rho, 16)
        d_sub, t_sub = raycast_grid_bitslab2d(
            win[lo:hi, lo:hi], jnp.float32(base_x + lo),
            jnp.float32(base_y + lo), jnp.asarray(origin),
            jnp.asarray(targets),
        )
        np.testing.assert_array_equal(np.asarray(d_sub), np.asarray(d_full))
        np.testing.assert_array_equal(np.asarray(t_sub), np.asarray(t_full))

    for _ in range(60):
        i = rng.integers(len(free_y))
        frac = rng.uniform(0.0, 1.0, 2).astype(np.float32)
        if rng.random() < 0.3:
            frac[:] = 0.0  # exact-integer position (reachable: 0.5 + 0.5)
        anchor = np.array([free_x[i], free_y[i]], np.float32) + frac
        # Movement-style cast: origin = anchor, |segment| <= 1, rho=2.
        ang = rng.uniform(-np.pi, np.pi, size=3)
        rad = rng.uniform(0.0, 1.0, size=3)
        if rng.random() < 0.3:
            ang[0], rad[0] = 0.0, 1.0  # exact unit axis-aligned move
            ang[1], rad[1] = np.pi, 1.0
        mv = np.stack([np.cos(ang) * rad, np.sin(ang) * rad], -1).astype(
            np.float32
        )
        compare(anchor, anchor[None] + mv, anchor, rho=2)
        # Beam-style cast: origin displaced <= 1 from the anchor,
        # range-5 beams (incl. exact axis-aligned full reach), rho=6.
        disp = rng.uniform(-1.0, 1.0, 2).astype(np.float32)
        if rng.random() < 0.3:
            disp[:] = np.float32([-1.0, 0.0])
        origin = anchor + disp
        beams = np.array(
            [[5.0, 0.0], [-5.0, 0.0], [0.0, 5.0], [0.0, -5.0],
             [3.53553391, 3.53553391], [-3.53553391, -3.53553391]],
            np.float32,
        )
        compare(origin, origin[None] + beams, anchor, rho=6)


def test_bitslab_env_matches_dense_bitwise():
    """Full-trajectory bitwise equality of backend='bitslab' vs the dense
    default: observations, positions and terminations never diverge (the
    windowed scan is exact, not approximately equal — unlike mxu_window's
    1-ulp translation differences)."""
    import jax
    import jax.numpy as jnp

    import apx

    for env_id in ("LIDARLocRooms-v0", "LIDARLocMazeStatic-v0"):
        venv, p_bs = apx.make_vec(env_id, num_envs=16, raycast_backend="bitslab")
        _, p_dense = apx.make_vec(env_id, num_envs=16, raycast_backend="xla")
        _, p_2d = apx.make_vec(env_id, num_envs=16, raycast_backend="bitslab2d")
        assert p_bs.use_bitslab and not p_dense.use_bitslab
        assert p_2d.use_bitslab2d
        # The default ("auto") resolves to bitslab2d on every registered map.
        _, p_auto = apx.make_vec(env_id, num_envs=16)
        assert p_auto.use_bitslab2d and not p_auto.use_bitslab
        key = jax.random.PRNGKey(11)
        o1, s1, _ = venv.reset(key, p_bs)
        o2, s2, _ = venv.reset(key, p_dense)
        o3, s3, _ = venv.reset(key, p_2d)
        np.testing.assert_array_equal(
            np.asarray(o1["lidar"]), np.asarray(o2["lidar"])
        )
        np.testing.assert_array_equal(
            np.asarray(o3["lidar"]), np.asarray(o2["lidar"])
        )
        step = jax.jit(venv.step)
        for t in range(60):
            k = jax.random.fold_in(key, t)
            act = {
                "action": jax.random.uniform(k, (16, 2), minval=-1, maxval=1),
                "prediction": jnp.zeros((16, 2)),
            }
            o1, s1, r1, te1, *_ = step(k, s1, act, p_bs)
            o2, s2, r2, te2, *_ = step(k, s2, act, p_dense)
            o3, s3, r3, te3, *_ = step(k, s3, act, p_2d)
            np.testing.assert_array_equal(
                np.asarray(o1["lidar"]), np.asarray(o2["lidar"]), err_msg=f"step {t}"
            )
            np.testing.assert_array_equal(
                np.asarray(o3["lidar"]), np.asarray(o2["lidar"]), err_msg=f"2d step {t}"
            )
            np.testing.assert_array_equal(
                np.asarray(s1.inner.inner.pos), np.asarray(s2.inner.inner.pos)
            )
            np.testing.assert_array_equal(
                np.asarray(s3.inner.inner.pos), np.asarray(s2.inner.inner.pos)
            )
            np.testing.assert_array_equal(np.asarray(te1), np.asarray(te2))
            np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
            np.testing.assert_array_equal(np.asarray(te3), np.asarray(te2))
            np.testing.assert_array_equal(np.asarray(r3), np.asarray(r2))


def test_beam_tables_match_slab_bitwise():
    """The beam face-table observation scan (a measured-slower alternative
    kept selectable, PERF.md) is BITWISE equal to the dense slab scan at
    generic positions:
    the hit parameter is the same f32 expression (face - p) * inv for the
    entry face the slab would select."""
    import jax
    import jax.numpy as jnp

    import apx

    from apx.data.floor_map import make_maze_bank

    bank = make_maze_bank(num_maps=8).with_beam_tables()
    venv, p_t = apx.make_vec(
        "LIDARLocMaze-v0", num_envs=16, map_bank=bank, use_beam_tables=True
    )
    _, p_s = apx.make_vec("LIDARLocMaze-v0", num_envs=16, map_bank=bank)
    assert p_t.beam_tables_active and not p_s.beam_tables_active
    key = jax.random.PRNGKey(9)
    o1, s1, _ = venv.reset(key, p_t)
    o2, s2, _ = venv.reset(key, p_s)
    np.testing.assert_array_equal(np.asarray(o1["lidar"]), np.asarray(o2["lidar"]))
    step = jax.jit(venv.step)
    for t in range(40):
        k = jax.random.fold_in(key, t)
        act = {
            "action": jax.random.uniform(k, (16, 2), minval=-1, maxval=1),
            "prediction": jnp.zeros((16, 2)),
        }
        o1, s1, *_ = step(k, s1, act, p_t)
        o2, s2, *_ = step(k, s2, act, p_s)
        np.testing.assert_array_equal(
            np.asarray(o1["lidar"]), np.asarray(o2["lidar"]), err_msg=f"step {t}"
        )


def test_issue_rate_study_kernels():
    """Both layouts of the issue-rate study kernel compute the identical
    loop-carried chain as the pure-jnp reference (interpret mode — the TPU
    timing run reuses exactly this code path)."""
    import jax
    import jax.numpy as jnp

    from apx.ops.issue_rate_study import _chain_body, _inputs, chain_pallas

    key = jax.random.key(7)
    for lanes in (128, 16):
        args = _inputs(key, 512, lanes)
        got = chain_pallas(*args, iters=5, block_rows=256, interpret=True)
        want = _chain_body(*args, 5)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=0
        )


def test_map_bank_packed_fetch_bitwise():
    """fetch() via the uint32 row_words (the +15% NEXT_STEP autoreset fix)
    returns bitwise the bool rows, scalar and batched."""
    for bank in (make_rooms_bank(num_maps=6), make_maze_bank(num_maps=4)):
        assert bank.row_words is not None
        idx = jnp.asarray([3, 0, 2], jnp.int32)
        got = bank.fetch(idx)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(bank.maps)[np.asarray(idx)]
        )
        got1 = bank.fetch(jnp.int32(1))
        np.testing.assert_array_equal(np.asarray(got1), np.asarray(bank.maps)[1])


def test_rooms_bank_rejects_non_square():
    """The rooms generator's final coin-flip transpose (mirroring the
    reference) is only shape-preserving for square maps; non-square
    requests must be rejected loudly in BOTH backends (the native C++
    transpose additionally assumes square strides)."""
    with pytest.raises(ValueError, match="square"):
        generate_rooms_map(0, width=40, height=20)
    for backend in ("python", "auto"):
        with pytest.raises(ValueError, match="square"):
            make_rooms_bank(num_maps=2, width=40, height=20, backend=backend)


def test_beam_rects_matches_shared_window_bitwise():
    """raycast_grid_bitslab2d_per_ray (static per-beam cell rectangles,
    round 5) must be BITWISE equal to the shared-window bitslab2d reduce:
    the excluded cells provably fail a <= b (beam_cell_rects' derivation),
    and the surviving cells' slab values are produced by slicing per-axis
    arrays computed on the FULL window lattice (identical base+iota f32
    sums). Adversarial cases: exact-integer positions (wall slides land on
    cell faces), half-integer cell centers, map-edge anchors."""
    from apx.ops.raycast import (
        beam_cell_rects,
        bitslab_window_2d,
        lidar_directions_np,
        pack_row_halves,
        raycast_grid_bitslab2d,
        raycast_grid_bitslab2d_per_ray,
    )

    rng = np.random.default_rng(3)
    dirs = lidar_directions_np(8) * np.float32(5.0)
    rects = beam_cell_rects(dirs, 16, 6.0, 9.0)
    # Every beam's rect must be a strict subset of the shared lattice.
    assert max((x1 - x0) * (y1 - y0) for x0, x1, y0, y1 in rects) < 196
    half = 7
    for trial in range(400):
        occ = rng.random((32, 32)) < 0.3
        halves = pack_row_halves(jnp.asarray(occ))
        if trial % 4 == 0:
            pos = rng.integers(1, 30, 2).astype(np.float32)  # exact faces
        elif trial % 4 == 1:
            pos = rng.integers(1, 30, 2).astype(np.float32) + np.float32(0.5)
        else:
            pos = rng.uniform(1, 30, 2).astype(np.float32)
        # anchor = floor(pre-move pos): pos is within 1.0 of it per axis
        anchor = np.floor(pos) - rng.integers(-1, 2, 2)
        bx = np.float32(anchor[0] - half)
        by = np.float32(anchor[1] - half)
        win = bitslab_window_2d(halves, jnp.int32(bx), jnp.int32(by), 32)
        o = jnp.asarray(pos)
        t = o + jnp.asarray(dirs)
        d0, t0 = raycast_grid_bitslab2d(
            win, jnp.float32(bx), jnp.float32(by), o, t
        )
        d1, t1 = raycast_grid_bitslab2d_per_ray(
            win, jnp.float32(bx), jnp.float32(by), o, t, rects
        )
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def test_beam_rects_env_bitwise():
    """beam_rects='on' (the per-ray A/B surface — it measured SLOWER
    in-env, see the params field docs) vs the default shared window must
    produce bit-identical vectorized trajectories across episode
    boundaries — the whole step pipeline, not just the raycast op."""
    import dataclasses

    env = LIDARLocalizationEnv(map_bank=make_rooms_bank(num_maps=4))
    p_off = env.default_params()
    assert p_off.beam_rects == "auto" and p_off.use_bitslab2d
    params = dataclasses.replace(p_off, beam_rects="on")
    venv = vmap_vector_env(env, 16, AutoResetMode.NEXT_STEP)
    key = jax.random.key(21)
    obs_a, st_a, _ = jax.jit(venv.reset)(key, params)
    obs_o, st_o, _ = jax.jit(venv.reset)(key, p_off)
    step_a = jax.jit(lambda k, s, a: venv.step(k, s, a, params))
    step_o = jax.jit(lambda k, s, a: venv.step(k, s, a, p_off))
    for t in range(40):
        key, k, ka = jax.random.split(key, 3)
        act = {
            "action": jax.random.uniform(ka, (16, 2), minval=-1.0, maxval=1.0),
            "prediction": jax.random.normal(jax.random.fold_in(ka, 1), (16, 2)),
        }
        out_a = step_a(k, st_a, act)
        out_o = step_o(k, st_o, act)
        st_a, st_o = out_a[1], out_o[1]
        for x, y in zip(
            jax.tree_util.tree_leaves(out_a), jax.tree_util.tree_leaves(out_o)
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
