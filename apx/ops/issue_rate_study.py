"""Measured issue-rate study: does a per-env-tile Pallas LIDAR kernel
have any headroom over the dense XLA slab?

Round 2 ended with an *estimate* (PERF.md): a hypothetical whole-step
Pallas kernel operating on per-env ``(24, 16)`` occupancy windows would
be instruction-issue-bound at or below dense throughput, because f32
vregs are (8 sublanes x 128 lanes) and a 16-cell-wide tile leaves 112 of
128 lanes idle in EVERY elementwise op. This module turns that estimate
into a measurement.

Method: the identical slab combine chain (the ~16-op max/min/compare/
select sequence of ``apx.ops.raycast.raycast_grid``'s fast path, made
loop-carried so Mosaic cannot hoist any of it) runs for ``iters``
repetitions inside two Pallas kernels that differ ONLY in lane
occupancy:

- ``wide``:   (sub, 128) blocks — full vector registers, the layout the
  dense XLA slab enjoys after fusion;
- ``narrow``: (sub, 16) blocks — the lane occupancy of per-env window
  tiles (Mosaic pads the minor dim to the 128-lane vreg, 16/128 useful).

``useful ops/s(wide) / useful ops/s(narrow)`` is the issue-rate penalty
of the per-env-tile layout. The dense slab does W/16 = 2x more USEFUL
work per env than a 16-wide window (32-wide maps), so the hypothetical
kernel only wins if the penalty is < 2x; the VPU's 8x lane padding
predicts ~8x. ``wide`` ops/s vs the 8x128 x ~0.94 GHz VPU roofline
(~962 G elementwise f32 ops/s on v5e) sanity-checks the methodology.

Run on TPU: ``python -m apx.ops.issue_rate_study``; results recorded in
PERF.md (round 3). Correctness of both kernels is pinned against a pure
jnp reference in ``tests/test_lidar.py::test_issue_rate_study_kernels``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Ops per element per iteration of _chain_body (counted: 2 mul, 2 sub,
# 1 add at the tail + 3 max, 3 min, 2 cmp, 1 and, 1 select, 1 mul+1 add
# of the x update = 16 VPU ops). Every op consumes the loop-carried x,
# so none is hoistable.
CHAIN_OPS_PER_ELEM = 16


def _chain_body(nx, ny, fx, fy, occ, iters):
    """The loop-carried slab combine chain; returns the final accumulator
    (shape of nx). Pure jnp so it runs identically inside a Pallas kernel
    and as the interpret-mode/correctness reference."""

    def body(_, carry):
        acc, x = carry
        a = jnp.maximum(jnp.maximum(x, nx), jnp.maximum(x * 0.5, ny))
        b = jnp.minimum(jnp.minimum(fx - x, 1.0), jnp.minimum(fy, 1.0 - x))
        valid = (occ > x) & (a <= b)
        t = jnp.where(valid, a, b)
        return acc + t, t * 0.25 + 0.125

    acc, x = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros_like(nx), jnp.full_like(nx, 0.25))
    )
    # acc + x stays O(iters): t is bounded by the input-derived a/b, so the
    # result can be fed back as an input across timing reps (see measure).
    return acc + x


def _chain_kernel(nx_ref, ny_ref, fx_ref, fy_ref, occ_ref, out_ref, *, iters):
    out_ref[...] = _chain_body(
        nx_ref[...], ny_ref[...], fx_ref[...], fy_ref[...], occ_ref[...], iters
    )


def chain_pallas(nx, ny, fx, fy, occ, *, iters: int, block_rows: int = 256,
                 interpret: bool = False):
    """Run the chain over (rows, lanes) inputs in row blocks; lane count is
    whatever the inputs carry (128 = full vregs, 16 = per-env-tile layout)."""
    rows, lanes = nx.shape
    assert rows % block_rows == 0
    spec = pl.BlockSpec((block_rows, lanes), lambda i: (i, 0))
    return pl.pallas_call(
        functools.partial(_chain_kernel, iters=iters),
        grid=(rows // block_rows,),
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        interpret=interpret,
    )(nx, ny, fx, fy, occ)


def _inputs(key, rows: int, lanes: int):
    ks = jax.random.split(key, 5)
    mk = lambda k: jax.random.uniform(k, (rows, lanes), jnp.float32)
    return tuple(mk(k) for k in ks)


def measure(rows: int = 4096, iters: int = 512, reps: int = 20):
    """Time both layouts on the current backend; returns a result dict.
    Useful-ops/s normalizes by the elements actually carried (rows*lanes),
    so the narrow figure already charges the 112 idle lanes to the layout.
    """
    import time

    key = jax.random.key(0)
    out = {}
    for name, lanes in (("wide", 128), ("narrow", 16)):
        args = list(_inputs(key, rows, lanes))
        fn = jax.jit(functools.partial(chain_pallas, iters=iters))
        r = fn(*args)
        jax.block_until_ready(r)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            # Chain each rep's output into the next rep's first input: reps
            # form a true data-dependent sequence, so neither async dispatch
            # overlap nor any execution cache (the axon relay memoizes
            # identical (executable, args) calls) can shortcut the timing.
            args[0] = r
            r = fn(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        ops = rows * lanes * iters * CHAIN_OPS_PER_ELEM
        out[name] = {
            "lanes": lanes,
            "time_us": dt * 1e6,
            "useful_gops_per_s": ops / dt / 1e9,
        }
    out["issue_penalty"] = (
        out["wide"]["useful_gops_per_s"] / out["narrow"]["useful_gops_per_s"]
    )
    out["wide_roofline_frac"] = out["wide"]["useful_gops_per_s"] / 962.0
    return out


if __name__ == "__main__":
    import json

    res = measure()
    res["device_kind"] = jax.devices()[0].device_kind
    print(json.dumps(res, indent=2))
