"""Checkpoint / resume for env state.

The reference has no checkpointing (SURVEY §5) — episodes are short and
state is not serializable. Here env state is a pytree by construction, so
checkpointing is orbax round-tripping; useful when a learner checkpoints
mid-rollout and wants bit-identical env resumption.
"""

from __future__ import annotations

import os
from typing import Any

import jax

__all__ = ["save_state", "restore_state"]


def save_state(path: str, state: Any) -> None:
    """Write an env-state pytree (or any pytree of arrays) to ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)


def restore_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_state; ``like`` supplies structure,
    shapes and shardings (pass the live state you are replacing)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    target = jax.tree_util.tree_map(
        lambda x: ocp.utils.to_shape_dtype_struct(x) if hasattr(x, "shape") else x,
        like,
    )
    restored = ckptr.restore(path, item=target)
    return jax.tree_util.tree_map(
        lambda r, l: r if not hasattr(l, "sharding") else jax.device_put(r, l.sharding),
        restored,
        like,
    )
