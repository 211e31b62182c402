"""Generate markdown documentation for every registered env.

Behavioral counterpart of /root/reference/tools/mk_env_doc.py (785 lines
of idoc-annotation plumbing): emits one page per base env ID with its
spaces, loss, episode bounds and description, plus an index page.

Usage: python -m apx.tools.mk_env_doc [--out docs/envs]
"""

from __future__ import annotations

import argparse
import os


def _space_md(space) -> str:
    from apx.core import spaces as S

    if isinstance(space, S.DictSpace):
        rows = "".join(
            f"\n  - `{k}`: {_space_md(v)}" for k, v in sorted(space.spaces.items())
        )
        return f"Dict:{rows}"
    if isinstance(space, S.TupleSpace):
        return "Tuple(" + ", ".join(_space_md(s) for s in space.spaces) + ")"
    if isinstance(space, S.Discrete):
        return f"Discrete({space.n})"
    if isinstance(space, S.MultiDiscrete):
        return f"MultiDiscrete({list(space.nvec)})"
    if isinstance(space, S.Image):
        h, w, c = space.shape[-3:]
        return f"Image {w}x{h}x{c}, float32 in [0, 1]"
    if isinstance(space, S.Logit):
        return f"Logits({space.shape[-1]})"
    if isinstance(space, S.Box):
        import numpy as np

        lo = np.asarray(space.low).reshape(-1)[0]
        hi = np.asarray(space.high).reshape(-1)[0]
        return f"Box{space.shape} in [{lo:g}, {hi:g}]"
    return type(space).__name__


def make_env_page(env_id: str) -> str:
    import apx

    entry = apx.registry()[env_id]
    env = entry.build()
    params = env.default_params()
    loss = env.loss_fn(params)
    lines = [
        f"# {env_id}",
        "",
        entry.description,
        "",
        "| Property | Value |",
        "|---|---|",
        f"| Observation space | {_space_md(env.observation_space(params))} |",
        f"| Action space | {_space_md(env.inner_action_space(params))} |",
        f"| Prediction space | {_space_md(env.prediction_space(params))} |",
        f"| Prediction target | {_space_md(env.prediction_target_space(params))} |",
        f"| Loss | {type(loss).__name__} |",
        f"| Episode length | <= {entry.step_limit} steps |",
        f"| Task family | {entry.metrics or 'reward-only'} |",
        f"| Sparse variant | `{env_id.replace('-v0', '-sparse-v0')}` |",
        "",
        "Reward: `base_reward - loss(prediction, target)` per step"
        + (
            " (sparse variant: loss only on the terminal step)."
            if not entry.sparse
            else " with loss weighted by episode termination."
        ),
        "",
    ]
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/envs")
    ap.add_argument("--ids", nargs="*", default=None)
    args = ap.parse_args()

    import apx

    os.makedirs(args.out, exist_ok=True)
    ids = args.ids or [i for i in apx.env_ids() if "-sparse-" not in i]
    index = ["# Environment catalog", ""]
    for env_id in ids:
        page = make_env_page(env_id)
        fname = env_id.replace("-v0", "") + ".md"
        with open(os.path.join(args.out, fname), "w") as f:
            f.write(page)
        index.append(f"- [{env_id}]({fname})")
    with open(os.path.join(args.out, "README.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(ids)} env pages to {args.out}")


if __name__ == "__main__":
    main()
