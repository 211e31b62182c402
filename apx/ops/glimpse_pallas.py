"""Lane-major Pallas glimpse kernel — the measured END of the glimpse
design space (STUDY: compiles, is exactly correct, and does NOT beat
XLA; the production path stays `apx.ops.glimpse.extract_glimpse_batch`).

Hypothesis: the production glimpse is 4096 independent (s0, H) @
(H, W*C) matmuls — ISSUE-bound on tiny per-env MXU ops at 20-30x off
the HBM roofline (apx.ops.glimpse_study) — so a hand-written kernel
with the 128-env block in the VECTOR LANES of every VPU op (full
vector width, zero per-env data movement) should win.

Shape story (per 128-env grid step):
  images  (N, H, W, C) u8  --XLA transpose-->  (H, C*W, N)
  kernel block: img (H, C*W, 128) u8 in VMEM (~1.6 MB at TIN geometry)
    stage 1 (rows):  statically unrolled h-loop; one u8->f32 convert of
      the (C*W, 128) row slab per h, then s0 hat-weighted FMAs into a
      (s0, C*W, 128) f32 accumulator — weights computed in-register,
      max(0, 1 - |row_s - h|), the exact interp_weights hat.
    stage 2 (cols):  per (t, c): hat weights over the W sublanes times
      the accumulator's aligned (W, 128) slice, sublane-reduce -> lanes.
  out     (s0, s1, C, N) f32  --XLA transpose-->  (N, s0, s1, C)

MEASURED VERDICT (same-session, TPU v5 lite, N=4096; PERF.md round 3):
TIN geometry (64x64x3, 10x10): XLA gemm[default] 1193 us vs kernel
1311 us end-to-end / 1270 us with the input transpose held resident
(the best case a transposed state layout could ever reach). MNIST
geometry (28x28x1, 5x5): 895 vs 866/877 us — parity within noise.
The lane-major form must reduce DENSELY over all H rows (the 2-tap hat
sparsity cannot be exploited when every lane has a different row
window), and that 64x/26x work inflation cancels the full-lane
advantage exactly. Conclusion: with gathers (4x slower), XLA-level
layouts (no effect), the MXU pass ladder (the one real lever, +42%)
and this kernel all measured, XLA's batched GEMM at one pass IS the
speed of light for this op on this hardware.

Numerics: true f32 FMAs — within 1.8e-7 of the "highest" (6-pass) XLA
form on device; semantic equality is pinned on CPU via interpret mode
in tests/test_glimpse.py.

Mosaic notes (hard-won): no unsigned->float casts (route u8->i32->f32);
tpu.iota is integer-only; (H, C*W, LANES) blocks tile cleanly with the
lane dim = env block and need no in-kernel transposes.

Reference behavior mirrored: image_perception_module.py:294-331
coordinate conventions via apx.ops.glimpse.glimpse_coords.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .glimpse import glimpse_coords

LANES = 128

__all__ = ["glimpse_batch_lane_major", "lane_major_eligible"]


def lane_major_eligible(images: jnp.ndarray) -> bool:
    """images (N, H, W, C): kernel preconditions (see module docstring)."""
    return (
        images.ndim == 4
        and images.dtype == jnp.uint8
        and images.shape[0] % LANES == 0
        and jax.default_backend() == "tpu"
    )


def _kernel(img_ref, rows_ref, cols_ref, out_ref, acc_ref, wc_ref, *, h, w, c, s0, s1):
    cw = c * w

    # ---- stage 1: hat-weighted row reduction over h ----------------------
    for s in range(s0):
        acc_ref[s] = jnp.zeros((cw, LANES), jnp.float32)
    # Static h unroll: Mosaic schedules the FMA chain better than a
    # fori_loop, and hat weights become constant-folded per h.
    for hi in range(h):
        # Mosaic has no unsigned->float cast; u8 -> i32 -> f32 is supported.
        slab = img_ref[hi].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
        for s in range(s0):
            wr = jnp.maximum(0.0, 1.0 - jnp.abs(rows_ref[s : s + 1, :] - float(hi)))
            acc_ref[s] += wr * slab  # (1,128) bcast over CW sublanes

    # ---- stage 2: hat-weighted column reduction over w -------------------
    # tpu.iota is integer-only; cast afterwards.
    iw = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 0).astype(jnp.float32)
    for t in range(s1):
        wc_ref[t] = jnp.maximum(0.0, 1.0 - jnp.abs(cols_ref[t : t + 1, :] - iw))
    for s in range(s0):
        for ci in range(c):
            block = acc_ref[s, ci * w : (ci + 1) * w, :]  # (W, 128) aligned
            for t in range(s1):
                out_ref[s, t, ci, :] = jnp.clip(
                    jnp.sum(block * wc_ref[t], axis=0), 0.0, 1.0
                )


@functools.partial(
    jax.jit, static_argnames=("sensor_size", "sensor_scale", "interpret")
)
def glimpse_batch_lane_major(
    images: jnp.ndarray,
    pos_norm: jnp.ndarray,
    sensor_size: tuple[int, int],
    sensor_scale: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, H, W, C) u8 x (N, 2) -> (N, s0, s1, C) f32 glimpses.

    Drop-in for extract_glimpse_batch under the eligibility gate; the
    coordinate/clip conventions are shared via glimpse_coords."""
    n, h, w, c = images.shape
    s0, s1 = sensor_size
    assert n % LANES == 0 and images.dtype == jnp.uint8

    rows, cols = jax.vmap(
        lambda p: glimpse_coords(p, (h, w), sensor_size, sensor_scale)
    )(pos_norm)  # (N, s0), (N, s1)
    # interp_weights clips coords into [0, size-1]; mirror it here.
    rows = jnp.clip(rows, 0.0, float(h - 1)).T  # (s0, N)
    cols = jnp.clip(cols, 0.0, float(w - 1)).T  # (s1, N)

    img_t = jnp.transpose(images, (1, 3, 2, 0)).reshape(h, c * w, n)

    grid = (n // LANES,)
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, c=c, s0=s0, s1=s1),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (h, c * w, LANES),
                lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((s0, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (s0, s1, c, LANES), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((s0, s1, c, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((s0, c * w, LANES), jnp.float32),
            pltpu.VMEM((s1, w, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(img_t, rows, cols)
    return jnp.transpose(out, (3, 0, 1, 2))
