"""Gymnasium-compat example: drive apx exactly like the reference's
example scripts drive ap_gym (cf. /root/reference/example/circle_square.py).

Run: python examples/gym_compat.py [env_id]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import apx.compat as apc


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "CircleSquare-v0"
    env = apc.make(env_id)
    rng = np.random.default_rng(0)
    obs, info = env.reset(seed=0)
    total = 0.0
    for t in range(64):
        action = {
            "action": rng.uniform(-1, 1, env.action_space["action"].shape).astype(
                np.float32
            ),
            "prediction": rng.normal(size=env.prediction_space.shape).astype(
                np.float32
            ),
        }
        obs, reward, terminated, truncated, info = env.step(action)
        total += float(reward)
        if "stats" in info:
            scalars = {
                k: round(float(v), 3)
                for k, v in info["stats"]["scalar"].items()
                if not k.startswith("_") and np.ndim(v) == 0
            }
            print(f"episode done at t={t}: {scalars}")
    print(f"return over 64 steps: {total:+.2f}")


if __name__ == "__main__":
    main()
