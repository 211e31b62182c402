"""Wire codecs: lossless device-side re-encodings of observation leaves
for the drop-in adapter's device->host transfer.

The gymnasium adapter returns numpy observations every step, so the obs
payload crosses the wire each step; on relay-attached chips the transfer
is round-trip- and bandwidth-priced (PERF.md round-5 compat
decomposition: the (N, 32, 32, 1) f32 LIDAR map alone was ~16 MB/step,
~60% of the adapter's step time). The LIDAR dynamic-map channel is f32
valued in {0, 1/255} — the reference casts the boolean occupancy and
divides by 255 (lidar_localization2d.py:299) — i.e. 32 wire bits per 1
information bit. The codec packs it to bits inside the step's jit (where
XLA fuses it into the program for ~free) and reconstructs the EXACT f32
array on host: bit -> f32 cast -> /255 is the same op sequence the device
runs, so reconstruction is bitwise-identical (pinned in
tests/test_compat_parity.py).

Codecs change only the transfer representation; every value a user sees
(obs dicts from reset()/step()) is unchanged.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from ..envs.lidar_localization import LIDARLocalizationEnv

__all__ = ["wire_codec_for"]

EncodeFn = Callable[[dict[str, Any]], dict[str, Any]]
DecodeFn = Callable[[dict[str, Any]], dict[str, Any]]


def wire_codec_for(
    base_env, params
) -> tuple[EncodeFn, DecodeFn] | None:
    """(device_encode, host_decode) for this env's obs dict, or None.

    device_encode runs inside the adapter's jitted step/reset functions
    (batched obs in, batched obs out); host_decode runs on the fetched
    numpy tree and must invert it bitwise.
    """
    if isinstance(base_env, LIDARLocalizationEnv) and not params.static_map:
        h, w, _ = base_env.observation_space(params)["map"].shape
        return _lidar_map_codec(h, w)
    return None


def _lidar_map_codec(h: int, w: int) -> tuple[EncodeFn, DecodeFn]:
    w_pad = (-w) % 8
    wb = (w + w_pad) // 8

    def encode(obs: dict[str, Any]) -> dict[str, Any]:
        m = obs["map"]  # (N, h, w, 1) f32 in {0, 1/255}
        bits = m[..., 0] != 0
        if w_pad:
            bits = jnp.pad(bits, ((0, 0), (0, 0), (0, w_pad)))
        groups = bits.reshape(bits.shape[0], h, wb, 8).astype(jnp.uint8)
        weights = jnp.left_shift(
            jnp.uint8(1), jnp.arange(8, dtype=jnp.uint8)
        )
        packed = jnp.sum(groups * weights, axis=-1, dtype=jnp.uint8)
        return {**obs, "map": packed}  # (N, h, wb) u8

    def decode(obs: dict[str, Any]) -> dict[str, Any]:
        p = np.asarray(obs["map"])  # (N, h, wb) u8
        bits = (p[..., None] >> np.arange(8, dtype=np.uint8)) & np.uint8(1)
        occ = bits.reshape(p.shape[0], h, wb * 8)[:, :, :w]
        # Same op sequence as the device obs (bool -> f32 -> /255), so the
        # nonzero value rounds to the identical f32 (1/255).
        m = occ.astype(np.float32) / np.float32(255.0)
        return {**obs, "map": m[..., None]}

    return encode, decode
