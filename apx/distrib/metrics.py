"""Cross-device metric reductions.

The reference aggregates episode metrics on host per process (util.py:
40-83). On a mesh, the same aggregates are psums over the env axis —
either implicitly via jnp reductions under jit/GSPMD (sharded_rollout) or
explicitly via these helpers inside shard_map'd code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["all_sum", "all_mean", "episode_stats_psum"]


def all_sum(x, axis_name: str = "env"):
    return jax.lax.psum(x, axis_name)


def all_mean(x, axis_name: str = "env"):
    return jax.lax.pmean(x, axis_name)


def episode_stats_psum(stats: dict, done, axis_name: str = "env") -> dict:
    """Reduce per-env episode stats (from apx.wrappers.metrics) into global
    scalars: done-weighted means of every ``avg_*``/``final_*`` entry plus
    the global completed-episode count. NaNs (not-done envs) are masked.
    Call inside shard_map over the env axis."""
    done_f = done.astype(jnp.float32)
    n_done = jax.lax.psum(done_f.sum(), axis_name)
    out = {"episodes": n_done}
    denom = jnp.maximum(n_done, 1.0)
    for k, v in stats.items():
        if k.startswith("_") or v.dtype not in (jnp.float32, jnp.float64):
            continue
        masked = jnp.where(done, jnp.nan_to_num(v), 0.0).sum()
        out[k] = jax.lax.psum(masked, axis_name) / denom
    return out
