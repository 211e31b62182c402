"""Device-side reset builders for host-drawn randomness (parity mode).

Each builder turns a batch of host draws (see shims.py) into a batched
(obs, state, info) identical in structure to the functional env's own
reset, then lifts the result through the wrapper stack via wrap_reset.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..envs.image_classification import ImageClassificationEnv
from ..envs.image_localization import ImageLocalizationEnv, ImageLocalizationState
from ..envs.image_perception import ImagePerceptionEngine
from ..envs.lidar_localization import LIDARLocalizationEnv, LIDARLocalizationState
from ..envs.light_dark import LightDarkEnv, LightDarkState, obs_std
from ..wrappers.base import APWrapper

__all__ = ["reset_from_draws", "apply_step_draws", "unwrap_state"]


def _wrapper_stack(env) -> list[APWrapper]:
    stack = []
    while isinstance(env, APWrapper):
        stack.append(env)
        env = env.env
    return stack  # outermost first


def unwrap_state(state):
    """Dig to the base env's state through wrapper state pytrees."""
    while hasattr(state, "inner"):
        state = state.inner
    return state


def _perception_state(base, draws, params):
    def one(idx, inverted, pos):
        # State-form image leaf (packed row for packed banks) so compat
        # states are pytree- and bitwise-identical to native resets given
        # the same draws; glimpses of u8/255 and host-f32 images are
        # bitwise equal either way (extract_glimpse converts on read).
        image, label = ImagePerceptionEngine.fetch_state_image(idx, params)
        if params.randomly_invert_labels:
            label = jnp.where(
                inverted, params.dataset.num_classes - label - 1, label
            ).astype(jnp.int32)
        return ImagePerceptionEngine.from_external_draws(
            image=image, label=label, data_index=idx, pos=pos, label_inverted=inverted
        )

    return jax.vmap(one)(
        jnp.asarray(draws["index"], jnp.int32),
        jnp.asarray(draws["inverted"]),
        jnp.asarray(draws["pos"], jnp.float32),
    )


def _base_reset_from_draws(base, draws: dict[str, Any], params):
    if isinstance(base, ImageClassificationEnv):
        state = _perception_state(base, draws, params)
        obs = jax.vmap(lambda s: ImagePerceptionEngine.observe(s, params))(state)
        return obs, state, jax.vmap(ImagePerceptionEngine.info)(state)

    if isinstance(base, ImageLocalizationEnv):
        perception = _perception_state(base, draws, params)
        # Parity mode resolves the target host-side (shims.py) for both the
        # unique-sampler reset and the uniform autoreset resample.
        target = jnp.asarray(draws["target"], jnp.float32)
        state = jax.vmap(lambda p, t: base._make_state(p, t, params))(
            perception, target
        )
        obs = jax.vmap(lambda s: base._observe(s, params))(state)
        return obs, state, jax.vmap(ImagePerceptionEngine.info)(perception)

    if isinstance(base, LightDarkEnv):
        pos = jnp.asarray(draws["pos"], jnp.float32)
        noise = jnp.asarray(draws["noise"], jnp.float32)
        state = LightDarkState(pos=pos)
        noisy = jnp.clip(pos + noise * obs_std(pos, params)[..., None], -2.0, 2.0)
        return {"noisy_position": noisy.astype(jnp.float32)}, state, {}

    if isinstance(base, LIDARLocalizationEnv):
        from ..ops.raycast import pack_row_halves, pad_occupancy

        occ = jnp.asarray(draws["occ"])
        pos = jnp.asarray(draws["pos"], jnp.float32)
        n = occ.shape[0]
        state = LIDARLocalizationState(
            occ=occ,
            # Same contract as reset_env: only window-extraction backends
            # read the padded map; None keeps the pytree structure aligned
            # with natively-built states (lidar_localization.py).
            occ_padded=(
                jax.vmap(lambda o: pad_occupancy(o, params.ray_pad))(occ)
                if params.needs_padded_occ
                else None
            ),
            row_halves=(
                jax.vmap(pack_row_halves)(occ)
                if params.needs_row_halves
                else None
            ),
            bank_pos=jnp.zeros((n,), jnp.int32),
            map_idx=jnp.asarray(draws["map_idx"], jnp.uint32),
            pos=pos,
            initial_pos=pos,
            odo_pending=jnp.ones((n,), jnp.bool_),
        )
        obs = jax.vmap(
            lambda s: {
                **base._observe(s, params, typed=True),
                **base.obs_derived_from_state(s, params),
            }
        )(state)
        info = jax.vmap(lambda s: base._info(s, params))(state)
        return obs, state, info

    raise TypeError(f"No reset builder for {type(base).__name__}")


def reset_from_draws(env, draws: dict[str, Any], params):
    """Batched (obs, state, info) from host draws, wrapper stack applied."""
    stack = _wrapper_stack(env)
    base = stack[-1].env if stack else env
    obs, state, info = _base_reset_from_draws(base, draws, params)
    for w in reversed(stack):  # innermost wrapper first
        obs, state, info = jax.vmap(
            lambda o, s, i: w.wrap_reset(o, s, i, params)
        )(obs, state, info)
    return obs, state, info


def apply_step_draws(env, result, draws: dict[str, Any] | None, params):
    """Overwrite the stochastic parts of a raw batched step result with
    host-drawn values (only LightDark's obs noise, light_dark.py:102-110)."""
    if draws is None:
        return result
    base = env
    while isinstance(base, APWrapper):
        base = base.env
    if isinstance(base, LightDarkEnv) and "noise" in draws:
        pos = unwrap_state(result.state).pos
        noise = jnp.asarray(draws["noise"], jnp.float32)
        noisy = jnp.clip(pos + noise * obs_std(pos, params)[..., None], -2.0, 2.0)
        obs = {**result.obs, "noisy_position": noisy.astype(jnp.float32)}
        return result.replace(obs=obs)
    return result
