"""Pallas TPU kernel for the batched slab raycast.

Same math as apx.ops.raycast.raycast_grid (segment vs union-of-unit-wall-
cells via per-cell slab tests + min-reduce), hand-scheduled for TPU:

  * grid over env blocks; each block holds its occupancy rows in VMEM once
    and reuses them for all R rays (the XLA version re-streams the
    broadcasted cell grid per ray),
  * cells live on the lane dimension ((8, 128) f32 tiles for 32x32 maps =
    1024 cells), envs on the sublane dimension,
  * rays iterate in an unrolled loop writing one (BN, R) distance tile.

Numerics are identical to raycast_grid (f32 slab parameters, eps pullback)
except that +/-inf bookkeeping is replaced by a large-finite sentinel,
which cannot change any comparison outcome for maps < 1e6 cells across.

Use ``raycast_pallas_available()`` to gate (requires a TPU backend);
``bench.py --env lidar_rooms`` picks whichever backend measures faster.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["raycast_grid_pallas_batch", "raycast_pallas_available"]

_BIG = 3.0e38  # large-finite sentinel in place of +/-inf


def raycast_pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _kernel(occ_ref, o_ref, d_ref, len_ref, out_ref, *, n_rays, h, w, eps):
    """One env block: occ (BN, C) f32, o/d (BN, R, 2) f32 in SMEM-friendly
    VMEM, out (BN, R) f32."""
    import jax.numpy as jnp

    occf = occ_ref[:, :]  # (BN, C) f32, 1.0 = wall
    bn, c = occf.shape
    cell = jax.lax.broadcasted_iota(jnp.int32, (bn, c), 1)
    cy_i, cx_i = cell // w, cell % w
    cy = cy_i.astype(jnp.float32)
    cx = cx_i.astype(jnp.float32)

    def slab_axis(o, d, lo):
        # o, d: (BN, 1); lo: (BN, C) cell lower corner; hi = lo + 1.
        d_is0 = d == 0.0
        inv = 1.0 / jnp.where(d_is0, 1.0, d)
        t1 = (lo - o) * inv
        t2 = (lo + 1.0 - o) * inv
        near = jnp.minimum(t1, t2)
        far = jnp.maximum(t1, t2)
        inside = (lo <= o) & (o <= lo + 1.0)
        near = jnp.where(d_is0, jnp.where(inside, -_BIG, _BIG), near)
        far = jnp.where(d_is0, jnp.where(inside, _BIG, -_BIG), far)
        return near, far

    for r in range(n_rays):
        ox = o_ref[:, r, 0][:, None]
        oy = o_ref[:, r, 1][:, None]
        dx = d_ref[:, r, 0][:, None]
        dy = d_ref[:, r, 1][:, None]
        seg = len_ref[:, r]

        nx, fx = slab_axis(ox, dx, cx)
        ny, fy = slab_axis(oy, dy, cy)
        t_enter = jnp.maximum(nx, ny)
        t_exit = jnp.minimum(fx, fy)
        valid = (
            (occf > 0.0)
            & (t_enter <= t_exit)
            & (t_exit >= 0.0)
            & (t_enter <= 1.0)
        )
        t_hit = jnp.min(
            jnp.where(valid, jnp.maximum(t_enter, 0.0), _BIG), axis=-1
        )  # (BN,)
        hit = t_hit < _BIG
        out_ref[:, r] = jnp.where(
            hit, jnp.maximum(t_hit * seg - eps, 0.0), seg
        )


def raycast_grid_pallas(
    occ: jnp.ndarray,  # (H, W) bool/uint8
    origin: jnp.ndarray,  # (2,) f32
    targets: jnp.ndarray,  # (R, 2) f32
    eps: float = 1e-3,
) -> jnp.ndarray:
    """Single-env wrapper; under jax.vmap the pallas_call lifts the batch
    axis into the kernel grid, so vmapped env steps use one fused kernel."""
    from jax.experimental import pallas as pl

    h, w = occ.shape
    r = targets.shape[0]
    occf = occ.reshape(1, h * w).astype(jnp.float32)
    o = jnp.broadcast_to(origin.astype(jnp.float32), (r, 2)).reshape(1, r, 2)
    d = (targets.astype(jnp.float32) - origin.astype(jnp.float32)).reshape(1, r, 2)
    seg = jnp.linalg.norm(d, axis=-1)

    kernel = functools.partial(_kernel, n_rays=r, h=h, w=w, eps=eps)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, r), jnp.float32),
    )(occf, o, d, seg)
    return out[0]


@functools.partial(jax.jit, static_argnames=("block_envs", "eps"))
def raycast_grid_pallas_batch(
    occ: jnp.ndarray,  # (N, H, W) bool/uint8
    origins: jnp.ndarray,  # (N, R, 2) f32
    targets: jnp.ndarray,  # (N, R, 2) f32
    block_envs: int = 8,
    eps: float = 1e-3,
) -> jnp.ndarray:
    """(N, R) distances with raycast_grid semantics, batched over envs."""
    from jax.experimental import pallas as pl

    n, h, w = occ.shape
    r = origins.shape[1]
    occf = occ.reshape(n, h * w).astype(jnp.float32)
    d = (targets - origins).astype(jnp.float32)
    seg = jnp.linalg.norm(d, axis=-1)

    if n % block_envs != 0:
        pad = block_envs - n % block_envs
        occf = jnp.pad(occf, ((0, pad), (0, 0)))
        origins = jnp.pad(origins, ((0, pad), (0, 0), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0), (0, 0)))
        seg = jnp.pad(seg, ((0, pad), (0, 0)), constant_values=1.0)
    npad = occf.shape[0]

    kernel = functools.partial(_kernel, n_rays=r, h=h, w=w, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid=(npad // block_envs,),
        in_specs=[
            pl.BlockSpec((block_envs, h * w), lambda i: (i, 0)),
            pl.BlockSpec((block_envs, r, 2), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_envs, r, 2), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_envs, r), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_envs, r), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, r), jnp.float32),
    )(occf, origins.astype(jnp.float32), d, seg)
    return out[:n]
