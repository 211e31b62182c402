"""Per-env occupancy-window extraction as a Pallas kernel.

The LIDAR raycast only ever needs the 16x16 cells around each agent, but
every XLA-level way of extracting per-env windows measured slower than
brute force over the full map (PERF.md round-2 study):

  * vmapped dynamic_slice lowers to per-env gather loops (8-20x slower),
  * one-hot matmul extraction wastes >95% of each MXU tile on the tiny
    batched (16,48)x(48,48) contractions.

This kernel was the remaining idea — and it is blocked by the hardware
tiling, which completes the ceiling argument (PERF.md round-2 study):

  * vector loads/stores need statically 8-aligned SUBLANE starts — fixed
    here with pl.multiple_of hints and 8-aligned 24-row windows;
  * but DMA LANE slices must span a full 128-lane tile ("Slice shape
    along dimension 2 must be aligned to tiling (128), but is 16"), so a
    16-cell-wide window cannot be extracted by the DMA engines either,
    and a row-only window (24 x full width) already exceeds the dense
    1024-cell lattice.

The kernel therefore runs only under `interpret=True` (CPU tests confirm
the exact semantics it WOULD have); on TPU the dense separable slab form
remains the measured speed of light for this op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["extract_windows_pallas", "pallas_available"]

_ENVS_PER_PROGRAM = 8


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except Exception:  # pragma: no cover
        return False
    return True


WIN_ROWS = 24  # 8-aligned row start + 16 needed rows fits any y0 % 8


@functools.partial(jax.jit, static_argnames=("win", "interpret"))
def extract_windows_pallas(
    occ_padded: jnp.ndarray,  # (N, Hp, Wp) uint8/bool
    starts: jnp.ndarray,  # (N, 2) int32 — (x0, y0a) in padded coords;
    # y0a MUST be a multiple of 8 (the caller aligns and compensates via
    # the window base): Mosaic only proves DMA sublane-tile divisibility
    # through pl.multiple_of hints.
    win: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, WIN_ROWS, win) uint8: occ_padded[n, y0a:y0a+24, x0:x0+win]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, hp, wp = occ_padded.shape
    occ_u8 = occ_padded.astype(jnp.uint8)
    b = _ENVS_PER_PROGRAM
    assert n % b == 0, f"num_envs must be a multiple of {b}"

    def kernel(starts_ref, occ_ref, out_ref, sems):
        # Vector loads need statically 8-aligned sublane starts; DMA
        # engines copy arbitrary lane offsets, and the row start carries a
        # multiple_of(8) hint. Issue all B copies, then wait, so the
        # transfers overlap.
        base = pl.program_id(0) * b
        copies = []
        for e in range(b):  # static unroll
            x0 = starts_ref[base + e, 0]
            y0 = pl.multiple_of(starts_ref[base + e, 1], 8)
            dma = pltpu.make_async_copy(
                occ_ref.at[e, pl.ds(y0, WIN_ROWS), pl.ds(x0, win)],
                out_ref.at[e],
                sems.at[e],
            )
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // b,),
        in_specs=[
            pl.BlockSpec((b, hp, wp), lambda i, s: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, WIN_ROWS, win), lambda i, s: (i, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((b,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, WIN_ROWS, win), jnp.uint8),
        interpret=interpret,
    )(starts.astype(jnp.int32), occ_u8)


def make_window_extractor(win: int = 16, interpret: bool = False):
    """Per-env window extractor usable INSIDE vmapped env code.

    Returns f(occ_padded (Hp, Wp), start_xy (2,) i32) -> (24, win) uint8
    (start_xy[1] must be 8-aligned; the extra rows carry the alignment
    slack and the caller's window base absorbs the offset).
    Unbatched calls are a plain dynamic_slice; under vmap the whole batch
    routes through the Pallas kernel (one grid launch, scalar-prefetched
    starts). Batch sizes not divisible by the per-program env count fall
    back to vmapped dynamic_slice.
    """

    @jax.custom_batching.custom_vmap
    def extract(occ_padded, start_xy):
        return jax.lax.dynamic_slice(
            occ_padded.astype(jnp.uint8),
            (start_xy[1], start_xy[0]),
            (WIN_ROWS, win),
        )

    @extract.def_vmap
    def _batch_rule(axis_size, in_batched, occ_padded, starts):
        occ_b, starts_b = in_batched
        if not starts_b:
            starts = jnp.broadcast_to(starts, (axis_size, 2))
        if not occ_b:
            occ_padded = jnp.broadcast_to(
                occ_padded, (axis_size, *occ_padded.shape)
            )
        if axis_size % _ENVS_PER_PROGRAM == 0 and pallas_available():
            out = extract_windows_pallas(
                occ_padded, starts, win=win, interpret=interpret
            )
        else:
            out = jax.vmap(
                lambda o, s: jax.lax.dynamic_slice(
                    o.astype(jnp.uint8), (s[1], s[0]), (WIN_ROWS, win)
                )
            )(occ_padded, starts)
        return out, True

    return extract
