"""Optional NaN guards (checkify) for action/prediction inputs.

The reference raises ValueError on NaN actions/predictions inside step
(image_perception_module.py:194-205, lidar_localization2d.py:318-321,
light_dark.py:124-127). Inside jit that control flow is impossible;
``checked_step`` wraps any env step with jax.experimental.checkify so the
same conditions surface as host-side errors after the step — the
functional equivalent of the reference's guards, opt-in because the
always-on check costs a reduction per input.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify

__all__ = ["check_finite_action", "checked_step"]


def check_finite_action(full_action) -> None:
    """Call inside a checkify'd function to assert no NaNs in the action
    dict (both the movement action and the prediction)."""
    for name in ("action", "prediction"):
        leaves = jax.tree_util.tree_leaves(full_action.get(name, ()))
        for leaf in leaves:
            checkify.check(
                jnp.logical_not(jnp.any(jnp.isnan(leaf))),
                f"NaN values detected in {name}.",
            )


def checked_step(step_fn: Callable) -> Callable:
    """Wrap a ``step(key, state, full_action, params)`` callable so NaN
    actions/predictions raise on the host (after dispatch), mirroring the
    reference's ValueError behavior.

    Returns a function with the same signature; call ``.throw()`` is done
    internally, so downstream code is unchanged.
    """

    def guarded(key, state, full_action, params):
        check_finite_action(full_action)
        return step_fn(key, state, full_action, params)

    checked = checkify.checkify(guarded)

    def wrapper(key, state, full_action, params):
        err, out = checked(key, state, full_action, params)
        checkify.check_error(err)
        return out

    return wrapper
