"""Batched glimpse extraction — the hot kernel of every image env.

The reference builds one scipy ``RegularGridInterpolator`` per image per
episode and evaluates it in a per-env Python loop
(/root/reference/ap_gym/envs/image/image_perception_module.py:154-157,
294-331). That loop is why the reference scales *negatively* with env count.

TPU-native design: the sensing grid is axis-aligned, so bilinear
interpolation is **separable** — a glimpse is two small dense matmuls:

    glimpse = W_rows @ image @ W_cols        (per env, batched via vmap)

where ``W_rows[i, h] = relu(1 - |row_coord_i - h|)`` is exactly the linear
interpolation hat. This turns the entire operation into MXU-friendly batched
GEMMs with zero gathers and no data-dependent shapes.

Coordinate conventions replicate image_perception_module.py:294-331 and
:419-423 exactly:
  * positions are normalized (x, y) in [-1, 1]^2,
  * sensor_pos_lim_pixels = ([W, H] - 1)/2 - (effective_sensor - 1)/2,
  * sample row i / col j offsets are (i - (s-1)/2) * sensor_scale,
  * output clipped to [0, 1], float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "interp_weights",
    "glimpse_coords",
    "extract_glimpse",
    "extract_glimpse_batch",
    "sensor_pos_lim_pixels",
]


def sensor_pos_lim_pixels(
    image_hw: tuple[int, int], sensor_size: tuple[int, int], sensor_scale: float
) -> jnp.ndarray:
    """(2,) array: position limit in pixels for (x, y), such that pos_norm = ±1
    keeps the effective sensor fully inside the image
    (image_perception_module.py:419-423)."""
    h, w = image_hw
    eff = jnp.array(
        [sensor_size[0] * sensor_scale, sensor_size[1] * sensor_scale],
        dtype=jnp.float32,
    )
    return (jnp.array([w, h], dtype=jnp.float32) - 1.0) / 2.0 - (eff - 1.0) / 2.0


def interp_weights(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """(s, size) linear-interpolation weight matrix for sample coordinates
    ``coords`` (in array-index units) on a unit-spaced grid of ``size`` points.

    Each row has at most two non-zeros: the bilinear hat
    ``max(0, 1 - |c - k|)``. Coordinates are clipped to [0, size-1]."""
    c = jnp.clip(coords.astype(jnp.float32), 0.0, float(size - 1))
    grid = jax.lax.broadcasted_iota(jnp.float32, (coords.shape[0], size), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(c[:, None] - grid))


def glimpse_coords(
    pos_norm: jnp.ndarray,
    image_hw: tuple[int, int],
    sensor_size: tuple[int, int],
    sensor_scale: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Row / col sample coordinates (in array-index units) of the sensing grid
    centered at normalized position ``pos_norm`` = (x, y)."""
    h, w = image_hw
    s0, s1 = sensor_size
    lim = sensor_pos_lim_pixels(image_hw, sensor_size, sensor_scale)
    x_pix = pos_norm[0] * lim[0] + (w - 1) / 2.0
    y_pix = pos_norm[1] * lim[1] + (h - 1) / 2.0
    off0 = (jnp.arange(s0, dtype=jnp.float32) - (s0 - 1) / 2.0) * sensor_scale
    off1 = (jnp.arange(s1, dtype=jnp.float32) - (s1 - 1) / 2.0) * sensor_scale
    rows = y_pix + off0  # sensing grid axis 0 is the y/row axis (module.py:294-311)
    cols = x_pix + off1
    return rows, cols


#: Measured max |error| vs a float64 oracle on TinyImageNet geometry
#: (uint8/255 inputs, 10x10 sensor; apx.ops.glimpse_study, PERF.md
#: round 3): "highest" 1.7e-7, "high" 3.9e-5, "default" 5.5e-3.
PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


@functools.partial(
    jax.jit,
    static_argnames=("sensor_size", "sensor_scale", "precision", "window"),
)
def extract_glimpse(
    image: jnp.ndarray,
    pos_norm: jnp.ndarray,
    sensor_size: tuple[int, int],
    sensor_scale: float = 1.0,
    precision: str = "highest",
    window: str = "off",
) -> jnp.ndarray:
    """Extract one (s0, s1, C) glimpse from an (H, W, C) image at normalized
    position (x, y). Pure function of its inputs; differentiable.

    ``precision`` sets the MXU pass count of the two einsums ("highest" =
    6 bf16 passes ~ exact f32, "high" = 3, "default" = 1, the platform
    default). The op-level default stays "highest" (parity work calls this
    directly); the env engine threads its own ``glimpse_precision`` param,
    whose default is "default" — the batched glimpse is ISSUE-bound, not
    FLOP-bound (tiny per-env matmuls), and dropping to one pass measured
    +42% end-to-end on TinyImageNetLoc with 5.5e-3 max observation error
    (rewards never flow through glimpses — losses compare predictions to
    targets — so only the agent's input carries the noise). On CPU the
    setting is a no-op (true f32 math everywhere).

    ``window="rows"`` dynamic-slices the ((s0-1)*scale + 2)-row band the
    sensor touches before the row einsum. The excluded rows all carry hat
    weight exactly 0.0 and f32 accumulation of exact zeros is exact, so
    the output is BITWISE identical (pinned in test_glimpse, incl. edge
    positions). Measured round 5 (PERF.md): +33-76% on the ISOLATED op
    across MNIST/CIFAR10/TinyImageNet geometries, but 2.4x SLOWER
    end-to-end inside the env scan on every one of them — the per-env
    vmap(dynamic_slice) gather on the scan-carried image batch serializes
    where the full-image einsum fuses, the usual in-pipeline-gather
    verdict. Kept as an A/B surface; the env default resolves to "off".
    A column window was also measured and loses even isolated (strided
    gather)."""
    h, w, c = image.shape
    rows, cols = glimpse_coords(pos_norm, (h, w), sensor_size, sensor_scale)
    rows = jnp.clip(rows, 0.0, float(h - 1))
    prec = PRECISIONS[precision]
    if window == "rows":
        rwin = min(h, int(np.ceil((sensor_size[0] - 1) * sensor_scale)) + 2)
        r0 = jnp.clip(jnp.floor(jnp.min(rows)).astype(jnp.int32), 0, h - rwin)
        image = jax.lax.dynamic_slice(image, (r0, 0, 0), (rwin, w, c))
        w_rows = interp_weights(rows - r0.astype(jnp.float32), rwin)
    else:
        assert window == "off", window
        w_rows = interp_weights(rows, h)  # (s0, H)
    w_cols = interp_weights(cols, w)  # (s1, W)
    # (s0, H) @ (H, W*C) -> (s0, W*C); then per-channel (s0, W) @ (W, s1).
    # uint8 banks stay uint8 in env state/HBM; the /255 conversion happens
    # here on the freshly-read tile (uint8 reads + convert measured FASTER
    # than reading a pre-converted f32 bank: 1.69 vs 1.97 ms/batch).
    img_f = image.astype(jnp.float32)
    if image.dtype == jnp.uint8:
        img_f = img_f / 255.0
    tmp = jnp.einsum("sh,hwc->swc", w_rows, img_f, precision=prec)
    out = jnp.einsum("swc,tw->stc", tmp, w_cols, precision=prec)
    return jnp.clip(out, 0.0, 1.0)


def extract_glimpse_batch(
    images: jnp.ndarray,
    pos_norm: jnp.ndarray,
    sensor_size: tuple[int, int],
    sensor_scale: float = 1.0,
    precision: str = "highest",
    window: str = "off",
) -> jnp.ndarray:
    """(N, H, W, C) x (N, 2) -> (N, s0, s1, C), batched GEMMs on the MXU."""
    fn = lambda img, pos: extract_glimpse(
        img, pos, sensor_size, sensor_scale, precision=precision, window=window
    )
    return jax.vmap(fn)(images, pos_norm)
