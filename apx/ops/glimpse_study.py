"""Measured study: why the batched glimpse GEMM is the right structure,
and what its real lever is (MXU pass count, not data movement).

The batched glimpse (``apx.ops.glimpse.extract_glimpse_batch``) runs
4096 independent (s0, H) @ (H, W*C) matmuls per vector step. On
TinyImageNet geometry (64x64x3, 10x10 sensor) it measures ~1.3-1.9 ms
per batch against a ~63 us HBM roofline (50 MB of uint8 image reads at
~800 GB/s) — the op is ISSUE-bound on tiny per-env matmuls, 20-30x off
the bandwidth ceiling. This module packages the three A/Bs that mapped
the design space (all numbers same-session, TPU v5 lite, REPS-chained
with value-fetch barriers — see PERF.md "relay timing" methodology):

1. ``tap2``: bilinear has <= 2 non-zero hat weights per output row/col,
   so a 2-row + 2-col tap gather reads ~50x less HBM than the dense
   GEMM. Measured 4x SLOWER (6.78 vs 1.69 ms/batch): in-pipeline
   gathers serialize on TPU — the same verdict as every LIDAR
   window-extraction attempt (PERF.md round 2).
2. Layout: moving the env batch to the minormost dim (lane-major,
   'shn,hdn->sdn') neither helps the MXU (1.34 vs 1.29 ms) nor the VPU
   (explicit broadcast-reduce: 2.82 ms). XLA's batched-matmul lowering
   is already near-optimal for this shape; there is no layout trick.
3. Precision ladder: HIGHEST = 6 bf16 MXU passes per matmul, HIGH = 3,
   DEFAULT = 1. Since the op is issue-bound, passes are nearly pure
   overhead: 1.92 / 1.56 / 1.33 ms per batch at max |error| vs a
   float64 oracle of 1.7e-7 / 3.9e-5 / 5.5e-3. End-to-end:
   TinyImageNetLoc 2.52M (HIGHEST) -> 3.58M env-steps/s (DEFAULT).
   This is why ``ImagePerceptionParams.glimpse_precision`` defaults to
   "default" (the TPU platform idiom) with "highest" available for
   cross-backend parity work.

Also measured here: uint8 banks beat pre-converted f32 banks (1.69 vs
1.97 ms/batch — on-read /255 conversion is cheaper than 4x bank
traffic), and uint8 ROW GATHERS are per-element-cost-bound (4096 rows
from a 60k-row MNIST bank: 846 us as uint8[784], 601 us as the same
bytes int32[196] — why ``BankImageDataset`` stores uint8 banks
int32-packed).

Run on TPU: ``python -m apx.ops.glimpse_study`` (takes a few minutes;
numbers recorded in PERF.md round 3). Correctness of the tap2 variant
vs the GEMM is asserted at run time.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from .glimpse import PRECISIONS, extract_glimpse, glimpse_coords, interp_weights

N, H, W, C = 4096, 64, 64, 3
S = (10, 10)
D = W * C
REPS = 32


def _timeit(jfn, *args):
    out = jfn(*args)
    jax.block_until_ready(out)  # warmup/compile
    float(jfn(*args))  # settle + true barrier (value fetch)
    t0 = time.perf_counter()
    float(jfn(*args))
    return (time.perf_counter() - t0) / REPS


def tap2_glimpse(image, pos_norm):
    """Bilinear glimpse via 2-row + 2-col tap gathers (the measured-slower
    alternative); hat weights computed with interp_weights' expression."""
    h, w, c = image.shape
    rows, cols = glimpse_coords(pos_norm, (h, w), S, 1.0)
    rc = jnp.clip(rows, 0.0, float(h - 1))
    cc = jnp.clip(cols, 0.0, float(w - 1))
    r0 = jnp.clip(jnp.floor(rc), 0, h - 1).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, h - 1)
    c0 = jnp.clip(jnp.floor(cc), 0, w - 1).astype(jnp.int32)
    c1 = jnp.minimum(c0 + 1, w - 1)
    wr0 = jnp.maximum(0.0, 1.0 - jnp.abs(rc - r0.astype(jnp.float32)))
    wr1 = jnp.where(r1 == r0, 0.0,
                    jnp.maximum(0.0, 1.0 - jnp.abs(rc - r1.astype(jnp.float32))))
    wc0 = jnp.maximum(0.0, 1.0 - jnp.abs(cc - c0.astype(jnp.float32)))
    wc1 = jnp.where(c1 == c0, 0.0,
                    jnp.maximum(0.0, 1.0 - jnp.abs(cc - c1.astype(jnp.float32))))
    rowf = image[jnp.stack([r0, r1])].astype(jnp.float32)
    if image.dtype == jnp.uint8:
        rowf = rowf / 255.0
    rblend = rowf[0] * wr0[:, None, None] + rowf[1] * wr1[:, None, None]
    colsel = rblend[:, jnp.stack([c0, c1])]  # (s0, 2, s1, C)
    out = colsel[:, 0] * wc0[None, :, None] + colsel[:, 1] * wc1[None, :, None]
    return jnp.clip(out, 0.0, 1.0)


def _bench_extract(fn, images):
    @jax.jit
    def run(images, pos0):
        def body(pos, _):
            g = jax.vmap(fn)(images, pos)
            nxt = jnp.clip(pos + g.reshape(N, -1)[:, :2] * 1e-3 - 5e-4, -1, 1)
            return nxt, g[0, 0, 0, 0]

        pos_f, s = jax.lax.scan(body, pos0, None, length=REPS)
        return s.sum() + pos_f.sum()

    pos0 = jax.random.uniform(jax.random.PRNGKey(1), (N, 2), minval=-1, maxval=1)
    return _timeit(run, images, pos0)


def _bench_gather(bank2d):
    d = bank2d.shape[0]

    @jax.jit
    def run(bank, idx0):
        def body(idx, _):
            r = jnp.take(bank, idx, axis=0)
            nxt = (idx + r[:, 0].astype(jnp.int32) + 1) % d
            return nxt, r[0, 0].astype(jnp.float32)

        idx_f, s = jax.lax.scan(body, idx0, None, length=REPS)
        return s.sum() + idx_f.sum().astype(jnp.float32)

    idx0 = jax.random.randint(jax.random.PRNGKey(0), (4096,), 0, d)
    return _timeit(run, bank2d, idx0)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    img_u8 = jnp.asarray(rng.integers(0, 255, (N, H, W, C), dtype=np.uint8))
    pos = jax.random.uniform(jax.random.PRNGKey(2), (128, 2), minval=-1, maxval=1)

    g_ref = jax.jit(jax.vmap(lambda i, p: extract_glimpse(i, p, S, 1.0)))(
        img_u8[:128], pos
    )
    g_tap = jax.jit(jax.vmap(tap2_glimpse))(img_u8[:128], pos)
    err = float(jnp.max(jnp.abs(g_ref - g_tap)))
    assert err < 1e-5, err
    print(f"tap2 correctness vs GEMM: max|diff| = {err:.2e}", flush=True)

    for name in ("highest", "high", "default"):
        t = _bench_extract(
            lambda i, p, _n=name: extract_glimpse(i, p, S, 1.0, precision=_n),
            img_u8,
        )
        print(f"gemm[{name}]: {t*1e6:.1f} us/batch", flush=True)
    t = _bench_extract(
        lambda i, p: extract_glimpse(i, p, S, 1.0), img_u8.astype(jnp.float32) / 255.0
    )
    print(f"gemm[highest, f32 bank]: {t*1e6:.1f} us/batch", flush=True)
    t = _bench_extract(tap2_glimpse, img_u8)
    print(f"tap2[u8]: {t*1e6:.1f} us/batch", flush=True)

    base = rng.integers(0, 255, (60000, 784), dtype=np.uint8)
    t_u8 = _bench_gather(jnp.asarray(base))
    t_i32 = _bench_gather(
        jax.lax.bitcast_convert_type(jnp.asarray(base).reshape(60000, 196, 4),
                                     jnp.int32)
    )
    print(f"row gather 60k-bank: u8[784] {t_u8*1e6:.1f} us, "
          f"i32[196] {t_i32*1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()
