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
