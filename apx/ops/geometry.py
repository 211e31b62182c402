"""Small geometric ops shared by all environments."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["project_sphere", "normalize_into_unit_ball"]


def project_sphere(x: jnp.ndarray, radius: float = 1.0) -> jnp.ndarray:
    """Project x into the ball of the given radius (ap_gym.util.project_sphere,
    /root/reference/ap_gym/util.py:94-97): points outside are scaled onto the
    sphere, points inside pass through."""
    magnitude = jnp.linalg.norm(x, axis=-1, keepdims=True)
    direction = x / jnp.maximum(magnitude, radius)
    return jnp.where(magnitude > radius, direction * radius, x)


def normalize_into_unit_ball(x: jnp.ndarray) -> jnp.ndarray:
    """If |x| > 1, divide by |x| (light_dark.py:136-139, lidar_localization2d.py:332-334)."""
    magnitude = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.where(magnitude > 1.0, x / magnitude, x)
