"""Batched segment raycasting against unit-cell occupancy grids.

The reference casts each LIDAR beam / movement ray as an exact shapely
``LineString ∩ union-of-wall-boxes`` query in a per-beam Python loop
(/root/reference/ap_gym/envs/lidar_localization2d.py:496-536). For
axis-aligned unit cells that geometric query is equivalent to a slab test
per (ray, cell): the nearest hit parameter is the minimum cell-entry
parameter over occupied cells.

TPU-native design: a dense, gather-free (rays x cells) slab test that maps
onto the VPU as pure elementwise math + a min-reduction. XLA fuses the
broadcasted intermediates into the reduce, so nothing of size R x H*W is
materialized in HBM. Maps here are 21x21 / 32x32, so brute force over all
cells beats a serial DDA march under vmap (no dynamic gathers, no
sequential dependencies).

Semantics preserved exactly (lidar_localization2d.py:496-536), including
the GEOS result-*typing* quirks of the reference's isinstance dispatch:
  * plain hit (LineString/MultiLineString result): distance =
    max(||entry - origin|| - eps, 0), eps = 1e-3,
  * miss (empty result): distance = ||target - origin|| (no eps),
  * a single isolated corner graze (Point result): distance = 0 no matter
    where along the ray the graze happens (:512-514),
  * several isolated grazes (MultiPoint): nearest graze - eps (:515-525),
  * isolated graze(s) PLUS a real crossing (mixed 0-D/1-D result -> GEOS
    GeometryCollection): falls through the reference's isinstance chain to
    the miss branch (:526-528) — the beam reports FULL range even though it
    crosses a wall. This matters in practice: at reset the agent sits at a
    cell center and the four diagonal beams pass exactly through lattice
    corners, so corner pinches between diagonally-adjacent walls are
    systematically grazed.

A graze is an intersection interval of zero width, detected here by exact
f32 equality: cell-center origins have exactly-representable half-integer
coordinates and the f32 diagonal beam directions have bitwise-equal |dx|,
|dy|, so systematic grazes compute entry == exit bitwise (the host-side
f64 shim uses a 1e-9 width threshold for the same events; see
tests/shapely_shim.py). A graze is *isolated* (not absorbed into an
adjacent wall's crossing interval) iff the cells the ray traverses
immediately before and after the grazed lattice corner are both free —
a pure 4-neighbourhood occupancy test, no gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "raycast_grid",
    "lidar_directions",
    "contact_cells",
    "pack_row_halves",
    "bitslab_window",
    "bitslab_window_2d",
    "raycast_grid_bitslab",
    "raycast_grid_bitslab2d",
]

_EPS = 1e-3


def lidar_directions_np(beam_count: int):
    """Numpy twin of lidar_directions — the HOST-side constant the static
    beam_cell_rects derivation reads (inside jit the jnp product
    ``lidar_directions(B) * range`` is a tracer; the rect bounds must come
    from the concrete f32 values)."""
    import numpy as np

    ang = np.linspace(-np.pi, np.pi, beam_count, dtype=np.float32, endpoint=False)
    return np.stack([np.cos(ang), np.sin(ang)], axis=-1)


def lidar_directions(beam_count: int) -> jnp.ndarray:
    """(B, 2) unit beam directions at angles linspace(-pi, pi, B, endpoint
    =False), matching lidar_localization2d.py:181-187."""
    return jnp.asarray(lidar_directions_np(beam_count))


def _slab_axis(o, d, lo, hi):
    """Per-axis slab entry/exit parameters; handles d == 0 exactly."""
    inv = jnp.where(d == 0.0, jnp.inf, 1.0 / jnp.where(d == 0.0, 1.0, d))
    t1 = (lo - o) * inv
    t2 = (hi - o) * inv
    near = jnp.minimum(t1, t2)
    far = jnp.maximum(t1, t2)
    inside = (lo <= o) & (o <= hi)
    near = jnp.where(d == 0.0, jnp.where(inside, -jnp.inf, jnp.inf), near)
    far = jnp.where(d == 0.0, jnp.where(inside, jnp.inf, -jnp.inf), far)
    return near, far


def raycast_grid(
    occ: jnp.ndarray,
    origin: jnp.ndarray,
    targets: jnp.ndarray,
    eps: float = _EPS,
    geos_typing: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cast segments origin -> targets[r] against wall cells of ``occ``.

    Args:
      occ: (H, W) bool/numeric occupancy, True/nonzero = wall; wall cell
        (row y, col x) spans [x, x+1] x [y, y+1] in continuous coordinates.
      origin: (2,) f32 (x, y).
      targets: (R, 2) f32.
    Returns:
      distances: (R,) f32 per the semantics above.
      hit_t: (R,) f32 — hit parameter in [0, 1], or +inf on miss (used by
        callers needing contact points; distance already encodes the miss).

    ``geos_typing=False`` skips the graze classification and reports the
    plain nearest crossing. Whenever NO zero-width graze exists the two
    modes are bitwise identical, and grazes occur systematically only for
    scans cast from exact cell centers (the reset scan): after the first
    movement, positions are generic f32 values and an exact corner hit has
    ~2^-24 probability per corner crossing. The envs therefore use the
    typed mode for reset scans and the fast mode on the hot per-step path
    (~2.4x cheaper end-to-end on v5e; measured in PERF.md).
    """
    h, w = occ.shape
    occb = occ.astype(jnp.bool_)

    o = origin.astype(jnp.float32)
    d = targets.astype(jnp.float32) - o  # (R, 2)
    seg_len = jnp.linalg.norm(d, axis=-1)  # (R,)

    if geos_typing:
        # 4-neighbour occupancy (False outside the grid) for the
        # isolated-graze test; tiny (H, W) bool maps, shifted once per call.
        pad = jnp.pad(occb, 1, constant_values=False)
        occ_xm = pad[1:-1, :-2]  # cell (x-1, y)
        occ_xp = pad[1:-1, 2:]   # cell (x+1, y)
        occ_ym = pad[:-2, 1:-1]  # cell (x, y-1)
        occ_yp = pad[2:, 1:-1]   # cell (x, y+1)

        # Per-ray axis signs select which neighbours flank a grazed corner.
        sx_pos = d[:, 0] >= 0.0  # (R,)
        sy_pos = d[:, 1] >= 0.0

    # The slab test is separable: per-ray interval endpoints depend only on
    # the cell's column (x axis) or row (y axis), so the multiply/divide
    # work is O(R*(H+W)); the per-cell combination is pure
    # min/max/compare. The combination runs on a FLAT (R, H*W) lattice
    # (built by tiling/repeating the per-axis arrays — cheap relayouts):
    # the minor-most dim of the (R, H, W) form is only 21-32 wide, wasting
    # 3/4 of the 128-wide VPU lanes, while H*W packs them fully.
    col = jnp.arange(w, dtype=jnp.float32)
    row = jnp.arange(h, dtype=jnp.float32)
    nx1, fx1 = _slab_axis(o[0], d[:, 0:1], col[None, :], col[None, :] + 1.0)
    ny1, fy1 = _slab_axis(o[1], d[:, 1:2], row[None, :], row[None, :] + 1.0)

    if not geos_typing:
        # Hot path: hoist the [0, 1] clips into the SEPARABLE per-axis
        # arrays (max/min distribute exactly over each other in floats —
        # bitwise-identical results), so the per-cell lattice work is just
        # max, min, cmp, and, select feeding the min-reduce.
        nx0 = jnp.tile(jnp.maximum(nx1, 0.0), (1, h))
        ny0 = jnp.repeat(jnp.maximum(ny1, 0.0), w, axis=-1)
        fxc = jnp.tile(jnp.minimum(fx1, 1.0), (1, h))
        fyc = jnp.repeat(jnp.minimum(fy1, 1.0), w, axis=-1)
        a = jnp.maximum(nx0, ny0)
        b = jnp.minimum(fxc, fyc)
        valid = occb.reshape(-1)[None] & (a <= b)
        t_hit = jnp.min(jnp.where(valid, a, jnp.inf), axis=-1)  # (R,)
        hit = jnp.isfinite(t_hit)
        dist = jnp.where(
            hit, jnp.maximum(t_hit * seg_len - eps, 0.0), seg_len
        ).astype(jnp.float32)
        return dist, t_hit

    nx = jnp.tile(nx1, (1, h))  # (R, H*W): cell (cy, cx) -> index cy*W + cx
    fx = jnp.tile(fx1, (1, h))
    ny = jnp.repeat(ny1, w, axis=-1)
    fy = jnp.repeat(fy1, w, axis=-1)
    occ_r = occb.reshape(-1)[None]

    def bcast(m):  # (H, W) -> (1, H*W)
        return m.reshape(-1)[None]

    sgn = (slice(None), None)
    axes = (-1,)

    a = jnp.maximum(jnp.maximum(nx, ny), 0.0)  # clipped entry
    b = jnp.minimum(jnp.minimum(fx, fy), 1.0)  # clipped exit
    valid = occ_r & (a <= b)

    nd = valid & (a < b)  # real crossing interval
    dg = valid & (a == b)  # zero-width graze

    # Flanking cells of the grazed corner: entry-from-x == exit-from-y
    # (case A) grazes corner (cx + [dx<0], cy + [dy>0]); the ray passes
    # from cell (cx - sx, cy) into (cx, cy + sy). Case B (entry-from-y ==
    # exit-from-x) is the mirror. Occupied flank => the graze point lies on
    # an adjacent wall's crossing interval and merges into it.
    case_a = nx >= ny
    flank_a = jnp.where(sy_pos[sgn], bcast(occ_yp), bcast(occ_ym)) | jnp.where(
        sx_pos[sgn], bcast(occ_xm), bcast(occ_xp)
    )
    flank_b = jnp.where(sx_pos[sgn], bcast(occ_xp), bcast(occ_xm)) | jnp.where(
        sy_pos[sgn], bcast(occ_ym), bcast(occ_yp)
    )
    iso = dg & ~jnp.where(case_a, flank_a, flank_b)

    any_nd = jnp.any(nd, axis=axes)  # (R,)
    t_nd = jnp.min(jnp.where(nd, a, jnp.inf), axis=axes)
    any_iso = jnp.any(iso, axis=axes)
    t_iso_min = jnp.min(jnp.where(iso, a, jnp.inf), axis=axes)
    t_iso_max = jnp.max(jnp.where(iso, a, -jnp.inf), axis=axes)

    # GEOS result typing (see module docstring): line-only -> nearest entry;
    # points-only -> Point (dist 0) or MultiPoint (nearest graze); mixed ->
    # GeometryCollection -> treated as a miss by the reference.
    hit_line = any_nd & ~any_iso
    multi_pt = ~any_nd & any_iso & (t_iso_min < t_iso_max)
    single_pt = ~any_nd & any_iso & (t_iso_min == t_iso_max)
    t_hit = jnp.where(
        hit_line, t_nd, jnp.where(multi_pt | single_pt, t_iso_min, jnp.inf)
    )

    hit = jnp.isfinite(t_hit)
    dist = jnp.where(
        single_pt,
        0.0,
        jnp.where(hit, jnp.maximum(t_hit * seg_len - eps, 0.0), seg_len),
    ).astype(jnp.float32)
    return dist, t_hit


def pack_row_halves(occ: jnp.ndarray) -> jnp.ndarray:
    """(H, 2) int32: each map row's occupancy bits packed little-endian into
    two 16-bit half-words (bit x of half x//16 = cell (row, x)).

    16-bit halves (not full 32-bit words) because downstream consumers keep
    everything in types the VPU handles exactly: values < 2**16 survive any
    f32 round trip and int32 shift/mask ops are single VPU instructions.
    Maps wider than 32 cells would need ceil(W/16) halves; all reference
    floor maps are 21x21 or 32x32 (floor_map.py geometry).
    """
    h, w = occ.shape
    assert w <= 32, f"pack_row_halves supports W<=32, got {w}"
    bits = jnp.pad(occ.astype(jnp.int32), ((0, 0), (0, 32 - w)))
    weights = jnp.left_shift(1, jnp.arange(16, dtype=jnp.int32))
    return jnp.sum(bits.reshape(h, 2, 16) * weights, axis=-1)


def bitslab_window(
    halves: jnp.ndarray, base_x: jnp.ndarray, w: int
) -> jnp.ndarray:
    """(H, 16) bool occupancy of global columns [base_x, base_x + 16).

    This is the gather-free window extraction: a 2-way half-word select, a
    variable right-shift and a mask — all elementwise VPU ops — replace the
    per-env dynamic_slice / one-hot-matmul / DMA extractions that all
    measured slower or were rejected by the hardware (PERF.md round-2
    study). Out-of-map columns read as free.
    """
    x = base_x.astype(jnp.int32) + jnp.arange(16, dtype=jnp.int32)[None, :]
    valid = (x >= 0) & (x < w)
    xc = jnp.clip(x, 0, w - 1)
    half = jnp.where(xc < 16, halves[:, 0:1], halves[:, 1:2])  # (H, 16)
    bit = jnp.right_shift(half, jnp.bitwise_and(xc, 15)) & 1
    return valid & (bit == 1)


def bitslab_window_2d(
    halves: jnp.ndarray, base_x: jnp.ndarray, base_y: jnp.ndarray, w: int
) -> jnp.ndarray:
    """(16, 16) bool occupancy of global cells rows [base_y, base_y + 16)
    x cols [base_x, base_x + 16), still gather-free.

    Two bit-domain passes: the x-window select/shift of
    ``bitslab_window`` produces a (H, 16) 0/1 matrix; its columns are
    then re-packed into one uint32 row-word each (bit y = row y — a sum
    of disjoint powers of two, so uint32 wraparound is exact) and the
    y-window is a second variable right-shift. ~1.5k extra VPU ops per
    env buys a further 2x cut of the slab lattice (512 -> 256 cells).
    Out-of-map cells read as free, exactly like the 1-D window.
    """
    h = halves.shape[0]
    assert h <= 32, f"bitslab_window_2d supports H<=32, got {h}"
    bit = bitslab_window(halves, base_x, w).astype(jnp.uint32)  # (H, 16)
    colw = jnp.sum(
        bit << jnp.arange(h, dtype=jnp.uint32)[:, None], axis=0
    )  # (16,) uint32; bit y of colw[wx] = cell (y, base_x + wx)
    y = base_y.astype(jnp.int32) + jnp.arange(16, dtype=jnp.int32)[:, None]
    validy = (y >= 0) & (y < h)
    yc = jnp.clip(y, 0, h - 1).astype(jnp.uint32)
    out = (colw[None, :] >> yc) & jnp.uint32(1)  # (16, 16)
    return (out == 1) & validy


def raycast_grid_bitslab2d(
    occ_win: jnp.ndarray,
    base_x: jnp.ndarray,
    base_y: jnp.ndarray,
    origin: jnp.ndarray,
    targets: jnp.ndarray,
    eps: float = _EPS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fast-path slab raycast against the (Hw, Ww) 2-D window
    ``occ_win`` (from bitslab_window_2d, possibly statically sliced)
    covering global rows [base_y, base_y + Hw) x cols
    [base_x, base_x + Ww).

    Identical global-coordinate construction as raycast_grid_bitslab —
    per-cell f32 expressions match the dense fast path exactly, and the
    min-reduce runs over a subset of the dense lattice containing every
    contributing cell, so results are BITWISE equal with Hw*Ww/(H*W) of
    the work. Callers with a geometric bound tighter than the full
    window pass a STATIC sub-slice: a cast whose segments stay within
    rho cells of the window anchor can only produce valid (a <= b)
    candidates in window indices [half-rho-1, half+rho] — exact-touch
    boundary cases included (LIDARLocalizationEnv._raycast derivation);
    all excluded cells fail a <= b identically, so the min is unchanged.
    """
    hw, ww = occ_win.shape
    o = origin.astype(jnp.float32)
    d = targets.astype(jnp.float32) - o  # (R, 2)
    seg_len = jnp.linalg.norm(d, axis=-1)  # (R,)

    col = base_x.astype(jnp.float32) + jnp.arange(ww, dtype=jnp.float32)
    row = base_y.astype(jnp.float32) + jnp.arange(hw, dtype=jnp.float32)
    nx1, fx1 = _slab_axis(o[0], d[:, 0:1], col[None, :], col[None, :] + 1.0)
    ny1, fy1 = _slab_axis(o[1], d[:, 1:2], row[None, :], row[None, :] + 1.0)

    nx0 = jnp.tile(jnp.maximum(nx1, 0.0), (1, hw))
    ny0 = jnp.repeat(jnp.maximum(ny1, 0.0), ww, axis=-1)
    fxc = jnp.tile(jnp.minimum(fx1, 1.0), (1, hw))
    fyc = jnp.repeat(jnp.minimum(fy1, 1.0), ww, axis=-1)
    a = jnp.maximum(nx0, ny0)
    b = jnp.minimum(fxc, fyc)
    valid = occ_win.reshape(-1)[None] & (a <= b)
    t_hit = jnp.min(jnp.where(valid, a, jnp.inf), axis=-1)  # (R,)
    hit = jnp.isfinite(t_hit)
    dist = jnp.where(
        hit, jnp.maximum(t_hit * seg_len - eps, 0.0), seg_len
    ).astype(jnp.float32)
    return dist, t_hit


def raycast_grid_bitslab(
    occ_win: jnp.ndarray,
    base_x: jnp.ndarray,
    origin: jnp.ndarray,
    targets: jnp.ndarray,
    eps: float = _EPS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fast-path slab raycast against the 16-column window ``occ_win``
    (H, 16 — from bitslab_window) covering global columns
    [base_x, base_x + 16).

    The lattice stays in GLOBAL coordinates: window columns enter the slab
    arrays as ``base_x + iota`` (integer-valued f32, exact), so every
    per-cell quantity is computed by the identical f32 expressions as
    raycast_grid's fast path and the min-reduce runs over a subset of the
    dense lattice. Whenever all contributing cells (per-axis extent from
    origin <= 7 at any sub-cell offset) lie inside the window the result is
    therefore BITWISE equal to raycast_grid(occ, origin, targets,
    geos_typing=False) — with 16/W of the per-cell work. The flat (R, H*16)
    layout packs VPU lanes fully, unlike a (R, H, 16) form whose minor dim
    would occupy 16 of 128 lanes.
    """
    h = occ_win.shape[0]
    o = origin.astype(jnp.float32)
    d = targets.astype(jnp.float32) - o  # (R, 2)
    seg_len = jnp.linalg.norm(d, axis=-1)  # (R,)

    col = base_x.astype(jnp.float32) + jnp.arange(16, dtype=jnp.float32)
    row = jnp.arange(h, dtype=jnp.float32)
    nx1, fx1 = _slab_axis(o[0], d[:, 0:1], col[None, :], col[None, :] + 1.0)
    ny1, fy1 = _slab_axis(o[1], d[:, 1:2], row[None, :], row[None, :] + 1.0)

    nx0 = jnp.tile(jnp.maximum(nx1, 0.0), (1, h))
    ny0 = jnp.repeat(jnp.maximum(ny1, 0.0), 16, axis=-1)
    fxc = jnp.tile(jnp.minimum(fx1, 1.0), (1, h))
    fyc = jnp.repeat(jnp.minimum(fy1, 1.0), 16, axis=-1)
    a = jnp.maximum(nx0, ny0)
    b = jnp.minimum(fxc, fyc)
    valid = occ_win.reshape(-1)[None] & (a <= b)
    t_hit = jnp.min(jnp.where(valid, a, jnp.inf), axis=-1)  # (R,)
    hit = jnp.isfinite(t_hit)
    dist = jnp.where(
        hit, jnp.maximum(t_hit * seg_len - eps, 0.0), seg_len
    ).astype(jnp.float32)
    return dist, t_hit


def beam_cell_rects(
    offsets, win_size: int, o_lo: float, o_hi: float
) -> tuple[tuple[int, int, int, int], ...]:
    """Static per-ray window rectangles ((x0, x1, y0, y1), ...) — in
    window-lattice indices [0, win_size) — containing every cell a cast
    from any origin in window coords [o_lo, o_hi]^2 (CLOSED interval;
    wall-slides can land exactly on cell faces) along the STATIC f32
    displacement ``offsets[r]`` can validly intersect.

    Derivation (per axis, x shown): segment points span
    [o_lo + min(0, rx), o_hi + max(0, rx)] inclusive. A cell [wx, wx+1]
    admits a valid slab interval (a <= b) only if it intersects that span
    CLOSED — i.e. wx <= span_max and wx + 1 >= span_min. An endpoint
    exactly ON a cell face touches both adjacent cells, so:
    x0 = floor(span_min) - 1 (the -1 covers an integer span_min touching
    the cell to its left) and x1 = floor(span_max) + 1 (for integer
    span_max this includes the cell to the touch point's right; for
    non-integer it is exact). Every excluded cell's x-slab interval is
    strictly disjoint from the segment's x-extent, which forces
    a > b EXACTLY in _slab_axis arithmetic (same argument as the rho
    slice in LIDARLocalizationEnv._raycast) — so a min-reduce over only
    these cells is BITWISE equal to the full-window reduce."""
    import math

    import numpy as np

    rects = []
    for rx, ry in np.asarray(offsets, dtype=np.float32):
        x0 = math.floor(o_lo + min(0.0, float(rx))) - 1
        x1 = math.floor(o_hi + max(0.0, float(rx))) + 1
        y0 = math.floor(o_lo + min(0.0, float(ry))) - 1
        y1 = math.floor(o_hi + max(0.0, float(ry))) + 1
        rects.append(
            (max(x0, 0), min(x1, win_size), max(y0, 0), min(y1, win_size))
        )
    return tuple(rects)


def raycast_grid_bitslab2d_per_ray(
    occ_win: jnp.ndarray,
    base_x: jnp.ndarray,
    base_y: jnp.ndarray,
    origin: jnp.ndarray,
    targets: jnp.ndarray,
    rects: tuple[tuple[int, int, int, int], ...],
    eps: float = _EPS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """raycast_grid_bitslab2d with a STATIC per-ray cell rectangle (from
    beam_cell_rects — only meaningful when each ray's displacement is a
    compile-time constant, e.g. the fixed-angle lidar beams).

    The shared-window form pays every ray the UNION of all rays' reaches
    (a range-5 cast sweeps 14x14 = 196 cells after the rho slice); per-ray
    rectangles cut that to ~50-90 cells each (~2.4x fewer lattice slots
    after padding to the largest rect). All slab values are produced by
    slicing per-axis arrays computed on the FULL window lattice — the
    same ``base + iota`` f32 sums as the shared form, so every surviving
    cell's (a, b) is bit-identical and the min is unchanged
    (beam_cell_rects' exclusion proof; pinned in test_lidar). Padded
    slots carry a = +inf / occ = False and never contribute.
    """
    hw, ww = occ_win.shape
    o = origin.astype(jnp.float32)
    d = targets.astype(jnp.float32) - o  # (R, 2)
    seg_len = jnp.linalg.norm(d, axis=-1)  # (R,)

    col = base_x.astype(jnp.float32) + jnp.arange(ww, dtype=jnp.float32)
    row = base_y.astype(jnp.float32) + jnp.arange(hw, dtype=jnp.float32)
    nx1, fx1 = _slab_axis(o[0], d[:, 0:1], col[None, :], col[None, :] + 1.0)
    ny1, fy1 = _slab_axis(o[1], d[:, 1:2], row[None, :], row[None, :] + 1.0)

    m = max((x1 - x0) * (y1 - y0) for x0, x1, y0, y1 in rects)
    a_rows, b_rows, occ_rows = [], [], []
    for r, (x0, x1, y0, y1) in enumerate(rects):
        nxr = jnp.maximum(nx1[r, x0:x1], 0.0)  # (wb,)
        fxr = jnp.minimum(fx1[r, x0:x1], 1.0)
        nyr = jnp.maximum(ny1[r, y0:y1], 0.0)  # (hb,)
        fyr = jnp.minimum(fy1[r, y0:y1], 1.0)
        ar = jnp.maximum(nxr[None, :], nyr[:, None]).reshape(-1)
        br = jnp.minimum(fxr[None, :], fyr[:, None]).reshape(-1)
        occr = occ_win[y0:y1, x0:x1].reshape(-1)
        pad = m - ar.shape[0]
        if pad:
            ar = jnp.pad(ar, (0, pad), constant_values=jnp.inf)
            br = jnp.pad(br, (0, pad), constant_values=-jnp.inf)
            occr = jnp.pad(occr, (0, pad), constant_values=False)
        a_rows.append(ar)
        b_rows.append(br)
        occ_rows.append(occr)
    a = jnp.stack(a_rows)  # (R, m)
    b = jnp.stack(b_rows)
    occv = jnp.stack(occ_rows)
    valid = occv & (a <= b)
    t_hit = jnp.min(jnp.where(valid, a, jnp.inf), axis=-1)  # (R,)
    hit = jnp.isfinite(t_hit)
    dist = jnp.where(
        hit, jnp.maximum(t_hit * seg_len - eps, 0.0), seg_len
    ).astype(jnp.float32)
    return dist, t_hit


def pad_occupancy(occ: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Pad with non-wall cells so windowed slicing never clamps."""
    return jnp.pad(occ, ((pad, pad), (pad, pad)), constant_values=False)


def raycast_grid_windowed(
    occ_padded: jnp.ndarray,
    pad: int,
    origin: jnp.ndarray,
    targets: jnp.ndarray,
    radius: int,
    eps: float = _EPS,
    geos_typing: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed variant of raycast_grid: only the (2*radius+2)^2 cells
    around the origin's cell are slab-tested — valid whenever every
    segment's per-axis extent is <= radius - 1 (beam range R -> radius
    ceil(R)+1). Cuts the per-ray work ~8x for 32x32 maps at lidar range 5.

    ``occ_padded`` is pad_occupancy(occ, pad) with pad >= radius + 1;
    ``origin``/``targets`` remain in UNPADDED map coordinates.
    """
    win = 2 * radius + 2
    o = origin.astype(jnp.float32)
    # Window top-left cell in unpadded coords: floor(o) - radius.
    base = jnp.floor(o) - radius  # (2,) float, may be negative
    start = (base + pad).astype(jnp.int32)  # index into padded map, >= 0
    window = jax.lax.dynamic_slice(occ_padded, (start[1], start[0]), (win, win))

    # Shift into window-local coordinates (translation invariance).
    o_local = o - base
    t_local = targets.astype(jnp.float32) - base
    return raycast_grid(window, o_local, t_local, eps=eps, geos_typing=geos_typing)


def contact_cells(
    origin: jnp.ndarray,
    targets: jnp.ndarray,
    distances: jnp.ndarray,
    tol: float = 1e-5,
) -> jnp.ndarray:
    """(R, 2) int32 cell coords of each beam's contact point, or -1 on miss.
    Mirrors the contact-cell bookkeeping (corner pullback for coordinates
    landing exactly on a boundary while travelling negative) of
    lidar_localization2d.py:529-535. Render/fog-of-war helper."""
    o = origin.astype(jnp.float32)
    d = targets.astype(jnp.float32) - o
    seg_len = jnp.linalg.norm(d, axis=-1, keepdims=True)
    unit = d / jnp.where(seg_len == 0.0, 1.0, seg_len)
    contact = o + unit * distances[:, None]
    coords = jnp.floor(contact)
    exact = jnp.abs(coords - contact) < tol
    coords = jnp.where(exact & (targets < o), coords - 1.0, coords)
    miss = distances[:, None] >= seg_len
    return jnp.where(miss, -1, coords.astype(jnp.int32))


def extract_window_mxu(
    occ_padded: jnp.ndarray, pad: int, origin: jnp.ndarray, win: int = 16
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(win, win) bool occupancy window around ``origin`` via one-hot
    matmuls — the TPU-idiomatic gather replacement.

    Per-env dynamic_slice windows measured 8-20x slower than dense on TPU
    (round-1 PERF.md: per-env gathers don't tile). One-hot row/column
    selection matrices contracted on the MXU tile perfectly and cost <1%
    of MXU peak at N=4096, leaving the VPU to do 4x less slab work
    (win^2=256 cells vs the full 1024-cell map).

    The returned ``base`` (window top-left in unpadded map coordinates) is
    an integer-valued float; translating ray origins/targets by it is
    EXACT in f32 at these magnitudes, so windowed slab results match the
    dense form's to within 1 ulp (the only residual difference is XLA
    choosing different FMA contractions for the two lattice layouts).

    Requires pad >= win//2 and covers every scan whose per-axis extent
    from ``origin`` is <= win//2 - 2 (beams of range 5 from a point up to
    1.0 away from ``origin`` fit in win=16).
    """
    hp, wp = occ_padded.shape
    o = origin.astype(jnp.float32)
    base = jnp.floor(o) - (win // 2 - 1)  # (2,) float (x, y), integer-valued
    start = (base + pad).astype(jnp.int32)  # top-left in padded coords
    i = jnp.arange(win, dtype=jnp.int32)
    rsel = (i[:, None] + start[1]) == jnp.arange(hp, dtype=jnp.int32)[None, :]
    csel = (i[:, None] + start[0]) == jnp.arange(wp, dtype=jnp.int32)[None, :]
    w = jnp.einsum(
        "rh,hw,cw->rc",
        rsel.astype(jnp.bfloat16),
        occ_padded.astype(jnp.bfloat16),
        csel.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return w > 0.5, base


def lidar_table_scan(
    face: jnp.ndarray,  # (M, 8, 2, H, W) f32 — first-wall face coordinate
    axis_x: jnp.ndarray,  # (M, 8, 2, H, W) bool — face is x = const
    bank_pos: jnp.ndarray,  # () int32
    pos: jnp.ndarray,  # (2,) f32
    dirs_scaled: jnp.ndarray,  # (8, 2) f32 = unit beam dirs * range
    eps: float = _EPS,
) -> jnp.ndarray:
    """The 8-beam observation scan as one table lookup per beam.

    The tables (apx.data.floor_map.build_beam_tables) store, per map cell
    and per beam direction (with the 45-degree staircase split into its
    two fractional variants), the coordinate of the first wall FACE the
    beam crosses. The hit parameter t = (face - p[axis]) * inv[axis] is
    the exact expression the dense slab computes for that entry face, so
    distances are bitwise-equal to raycast_grid's fast path away from the
    measure-zero set of exact lattice-corner events (where the fast slab
    registers zero-width corner touches the staircase never visits).
    """
    from ..data.floor_map import BEAM_SIGNS

    m, nb, _, h, w = face.shape
    p = pos.astype(jnp.float32)
    # The slab path computes d = (pos + dirs) - pos; replicate the f32
    # round trip exactly so t/seg match the dense form bitwise.
    d = (p[None, :] + dirs_scaled.astype(jnp.float32)) - p[None, :]
    seg = jnp.linalg.norm(d, axis=-1)  # (8,)
    inv = jnp.where(d == 0.0, jnp.inf, 1.0 / jnp.where(d == 0.0, 1.0, d))
    cx = jnp.clip(jnp.floor(p[0]).astype(jnp.int32), 0, w - 1)
    cy = jnp.clip(jnp.floor(p[1]).astype(jnp.int32), 0, h - 1)
    fx = p[0] - jnp.floor(p[0])
    fy = p[1] - jnp.floor(p[1])

    signs = jnp.asarray(BEAM_SIGNS)  # (8, 2) int32
    sx, sy = signs[:, 0], signs[:, 1]
    # Which grid crossing comes first decides the staircase variant
    # (|dx| == |dy| bitwise for the diagonal beams, so the comparison is a
    # pure fraction comparison). Axis beams read variant 0.
    tx = jnp.where(sx > 0, 1.0 - fx, fx)
    ty = jnp.where(sy > 0, 1.0 - fy, fy)
    v = jnp.where((sx != 0) & (sy != 0), (tx >= ty).astype(jnp.int32), 0)

    b = jnp.arange(nb, dtype=jnp.int32)
    flat = (((bank_pos * nb + b) * 2 + v) * h + cy) * w + cx
    face_v = jnp.take(face.reshape(-1), flat)
    ax_v = jnp.take(axis_x.reshape(-1), flat)

    t = jnp.where(
        ax_v, (face_v - p[0]) * inv[:, 0], (face_v - p[1]) * inv[:, 1]
    )
    hit = t <= 1.0
    return jnp.where(
        hit, jnp.maximum(t * seg - eps, 0.0), seg
    ).astype(jnp.float32)
