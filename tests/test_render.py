"""Render smoke tests: each family produces an RGB frame with the right
shape and the overlay/markers actually change the pixels."""

import numpy as np
import pytest

import jax  # noqa: F401 (conftest pins cpu)
import apx.compat as apc


@pytest.mark.parametrize(
    "env_id,expect_hw",
    [
        ("CircleSquare-v0", (128, 128)),
        ("LightDark-v0", (500, 500)),
        ("LIDARLocRoomsStatic-v0", (500, 500)),
    ],
)
def test_render_shapes(env_id, expect_hw):
    env = apc.make(env_id)
    env.reset(seed=0)
    frames = []
    rng = np.random.default_rng(0)
    for _ in range(3):
        a = {
            "action": rng.uniform(-1, 1, 2).astype(np.float32),
            "prediction": rng.normal(size=env.prediction_space.shape).astype(
                np.float32
            ),
        }
        env.step(a)
        frames.append(env.render())
    f = frames[-1]
    assert f.dtype == np.uint8 and f.shape == (*expect_hw, 3)
    # Agent moves / overlay accumulates -> consecutive frames differ.
    assert not np.array_equal(frames[0], frames[-1])


def test_render_localization_target_box():
    env = apc.make("CircleSquare-v0")  # classification: no target box
    env.reset(seed=1)
    a = {"action": np.zeros(2, np.float32), "prediction": np.zeros(2, np.float32)}
    env.step(a)
    frame = env.render()
    # The agent box color must be present.
    from apx.render import COLOR_AGENT

    assert (frame == np.array(COLOR_AGENT, np.uint8)).all(-1).any()


def test_lidar_fog_of_war_grows():
    env = apc.make("LIDARLocMazeStatic-v0")
    env.reset(seed=0)
    t = env._vec._tracker
    seen0 = t.observation_map.sum()
    rng = np.random.default_rng(0)
    for _ in range(5):
        env.step(
            {
                "action": rng.uniform(-1, 1, 2).astype(np.float32),
                "prediction": np.zeros(2, np.float32),
            }
        )
    assert t.observation_map.sum() >= seen0
    assert t.observation_map.any()


# ---------------------------------------------------------------------------
# Golden-frame parity: the reference's render() runs in-container for the
# image envs, LightDark and (through the shapely shim) LIDAR, so compat
# frames are diffed against actual reference frames — not just shape-checked.


def _frame_diff(ref_env, mine_env, seed, steps, rng_seed=0):
    import numpy as np

    rng = np.random.default_rng(rng_seed)
    ref_env.reset(seed=seed)
    mine_env.reset(seed=seed)
    pred_shape = ref_env.prediction_space.shape
    frames = []
    rf = np.asarray(ref_env.render()).astype(np.int32)
    mf = np.asarray(mine_env.render()).astype(np.int32)
    frames.append((rf, mf))
    for _ in range(steps):
        a = {
            "action": rng.uniform(-1, 1, 2).astype(np.float32),
            "prediction": rng.normal(size=pred_shape).astype(np.float32),
        }
        ref_env.step(a)
        mine_env.step(a)
        frames.append(
            (
                np.asarray(ref_env.render()).astype(np.int32),
                np.asarray(mine_env.render()).astype(np.int32),
            )
        )
    return frames


@pytest.mark.parametrize(
    "env_id,steps,reset_exact,frac_tol",
    [
        # CircleSquare: bit-exact through 20 steps incl. a lockstep reset
        # (overlay compositing, border widths and visitation semantics all
        # mirror the reference's integer math).
        ("CircleSquare-v0", 20, True, 0.0),
        ("CircleSquare-s15-v0", 17, True, 0.0),
        # LightDark: the brightness field is computed in f32 on device vs
        # the reference's f64 — every pixel stays within the +-8
        # quantization band (frac of >8 diffs pinned at exactly 0).
        ("LightDark-v0", 10, False, 0.0),
        # LIDAR: reset frames are exact; after movement the reference keeps
        # f64 positions (np.linalg.norm promotions) while apx is f32, so
        # PIL line rasterization can flip boundary pixels on beam/trail
        # slivers. Budgets are pinned to ~1.7x the measured drift (max
        # 0.114% on ONE frame of the trajectory, 0 elsewhere) so growth
        # within the old 0.5% ceiling fails loudly.
        ("LIDARLocRooms-v0", 8, True, 0.002),
        ("LIDARLocMaze-v0", 8, True, 0.002),
    ],
)
def test_render_golden_frames(env_id, steps, reset_exact, frac_tol):
    import numpy as np

    from conftest import load_reference_ap_gym

    ap = load_reference_ap_gym()
    if ap is None:
        pytest.skip("reference not importable")
    import apx.compat as apc

    frames = _frame_diff(ap.make(env_id), apc.make(env_id), seed=3, steps=steps)
    rf0, mf0 = frames[0]
    assert rf0.shape == mf0.shape
    if reset_exact:
        np.testing.assert_array_equal(rf0, mf0, err_msg=f"{env_id} reset frame")
    fracs = []
    for t, (rf, mf) in enumerate(frames[1:]):
        d = np.abs(rf - mf)
        frac = float((d > 8).mean())
        fracs.append(frac)
        assert frac <= frac_tol, (env_id, t, frac, int(d.max()))
    # Drift-direction pin: flips are isolated events, not a per-frame tax —
    # the trajectory MEAN must stay well under the per-frame ceiling.
    if frac_tol:
        assert float(np.mean(fracs)) <= frac_tol / 4.0, (env_id, fracs)
