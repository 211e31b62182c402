"""Batch-render GIFs for the visual envs (counterpart of the reference's
tools/create_gifs.bash driving ap-gym-create-env-vid over 34 envs).

Usage: python -m apx.tools.create_gifs [--out doc/img] [--steps 48]
"""

from __future__ import annotations

import argparse
import os

VISUAL_ENVS = [
    "CircleSquare-v0",
    "CircleSquareInverted-v0",
    "DoubleCircleSquare-v0",
    "CircleSquareHideAndSeek-v0",
    "MNIST-v0",
    "CIFAR10-v0",
    "TinyImageNet-v0",
    "MNISTLoc-v0",
    "CIFAR10Loc-v0",
    "TinyImageNetLoc-v0",
    "LightDark-v0",
    "LIDARLocMazeStatic-v0",
    "LIDARLocMaze-v0",
    "LIDARLocRoomsStatic-v0",
    "LIDARLocRooms-v0",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="doc/img")
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--ids", nargs="*", default=None)
    args = ap.parse_args()

    from .create_env_vid import create_env_vid

    os.makedirs(args.out, exist_ok=True)
    for env_id in args.ids or VISUAL_ENVS:
        path = os.path.join(args.out, f"{env_id}.gif")
        try:
            n = create_env_vid(env_id, path, steps=args.steps)
            print(f"{env_id}: {n} frames -> {path}")
        except NotImplementedError as e:
            print(f"{env_id}: skipped ({e})")


if __name__ == "__main__":
    main()
