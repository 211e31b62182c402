"""Procedural floor-map generation (maze / rooms) and HBM map banks.

Behavioral reference: /root/reference/ap_gym/envs/floor_map/
  * floor_map_dataset_maze.py:24-55 — 21x21 recursive-backtracker maze,
    seeded by data index via ``np.random.default_rng(int(idx))``.
  * floor_map_dataset_rooms.py:25-89 — 32x32 recursive room splitting with
    3-wide doors, random final transpose, seeded the same way.
Both datasets have virtual length 2**32 (maps are pure functions of the
index). Generation is host-side NumPy exactly like the reference (it is a
per-episode *reset* cost there); here maps are pre-generated once into an
HBM-resident bank and episodes gather from it, so generation is off the
hot path entirely. The draw sequences below match the reference
draw-for-draw so that bank[i] is bitwise identical to ``dataset[i]``.

Maps are boolean occupancy grids, True = wall; walls are the unit cells
``[x, x+1] x [y, y+1]`` in the continuous coordinate frame used by the
LIDAR env.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "generate_maze_map",
    "generate_rooms_map",
    "MapBank",
    "make_maze_bank",
    "make_rooms_bank",
]


def generate_maze_map(
    idx: int, width: int = 21, height: int = 21, branching_prob: float = 1.0
) -> np.ndarray:
    """(H, W) bool maze, True = wall. Draw-sequence-identical to
    floor_map_dataset_maze.py:24-55 (one ``permutation`` per carve visit, one
    ``random()`` per eligible non-first branch)."""
    if width % 2 == 0 or height % 2 == 0:
        raise ValueError("maze width/height must be odd")
    rng = np.random.default_rng(int(idx))
    occ = np.ones((height, width), dtype=np.bool_)
    dirs = np.array([[2, 0], [-2, 0], [0, 2], [0, -2]])

    # The reference recurses ~one frame per free cell; do the same but guard
    # the interpreter's recursion limit for large maps.
    limit_needed = width * height + 100
    if sys.getrecursionlimit() < limit_needed:
        sys.setrecursionlimit(limit_needed)

    def visit(x: int, y: int, first_done: bool = False) -> None:
        carved_here = False
        for dx, dy in rng.permutation(dirs):
            nx, ny = x + dx, y + dy
            if 0 < nx < width - 1 and 0 < ny < height - 1 and occ[ny, nx]:
                if not carved_here or rng.random() < branching_prob:
                    occ[y + dy // 2, x + dx // 2] = False
                    occ[ny, nx] = False
                    visit(nx, ny)
                    carved_here = True

    occ[1, 1] = False
    visit(1, 1)
    return occ


def _partition_sizes(total: int, parts: int, rng: np.random.Generator) -> np.ndarray:
    """Split ``total`` into ``parts`` non-negative integers summing to it,
    via sorted distinct cut points (floor_map_dataset_rooms.py:36-40)."""
    candidates = np.arange(1, total)
    candidates = np.concatenate(
        [np.zeros(max(0, parts - total), dtype=np.int_), candidates]
    )
    cuts = np.sort(rng.choice(candidates, parts - 1, replace=False))
    return np.diff(np.concatenate(([0], cuts, [total])))


def generate_rooms_map(
    idx: int,
    width: int = 32,
    height: int = 32,
    max_rooms: int = 10,
    door_width: int = 3,
) -> np.ndarray:
    """(H, W) bool rooms map, True = wall. Draw-sequence-identical to
    floor_map_dataset_rooms.py:25-89. Uses int8 working values: 1 = wall,
    -1 = door (protected from later wall passes), 0 = free."""
    if width != height:
        # The final coin-flip transpose (mirroring the reference,
        # floor_map_dataset_rooms.py:86-87) is only shape-preserving for
        # square maps; a non-square grid would come back (W, H) on half of
        # all indices and the bank stacker would crash. Every registered
        # config is square; reject the rest loudly.
        raise ValueError("rooms maps must be square (width == height); "
                         f"got {width}x{height}")
    rng = np.random.default_rng(int(idx))
    min_room = door_width + 2
    grid = np.zeros((height, width), dtype=np.int8)
    grid[0, :] = grid[-1, :] = 1
    grid[:, 0] = grid[:, -1] = 1

    def split(region: np.ndarray, budget: int) -> None:
        # region is a (possibly transposed) view into grid; splits happen
        # along its first axis, then recurse transposed (alternating cuts).
        cap = min(budget, (region.shape[0] - min_room) // (min_room + 1) + 1)
        if cap <= 1:
            return
        n_sub = rng.binomial(cap - 2, 0.3) + 2
        sub_budget = _partition_sizes(cap, n_sub, rng)
        sizes = (
            _partition_sizes(region.shape[0] - n_sub * (1 + min_room) + 1, n_sub, rng)
            + min_room
        )
        ends = np.cumsum(sizes + 1) - 1
        starts = np.concatenate(([0], ends[:-1] + 2))
        walls = starts[1:] - 1
        doors = rng.integers(0, region.shape[1] - door_width, size=n_sub - 1)
        span = np.arange(door_width)

        region[walls] = np.where(region[walls] != -1, 1, -1)
        rows_fwd = walls[:, None, None] + span[None, :, None]
        rows_bwd = walls[:, None, None] - span[None, :, None]
        cols = doors[:, None, None] + span[None, None, :]
        region[rows_fwd, cols] = -1
        region[rows_bwd, cols] = -1

        for s, e, b in zip(starts, ends, sub_budget):
            split(region[s : e + 1].T, b)

    split(grid[1:-1, 1:-1], max_rooms)
    grid[grid == -1] = 0
    if rng.integers(0, 2) == 0:
        grid = grid.T
    return grid.astype(np.bool_)


class MapBank(struct.PyTreeNode):
    """HBM-resident bank of occupancy maps: (M, H, W) bool.

    For W <= 32 the bank also carries a bit-PACKED copy (``row_words``:
    (M, H) uint32, bit x of word y = maps[m, y, x]) and ``fetch`` gathers
    THAT: TPU gathers are per-element-cost-bound (PERF.md round 3), and
    the NEXT_STEP masked autoreset re-fetches every env's map every step
    — packing the fetch measured +15% on LIDARLocRooms end-to-end. The
    unpack (shift+mask broadcast) is bitwise-identical to the bool rows.
    """

    maps: jax.Array
    indices: jax.Array  # (M,) int64-as-int32-pair not needed; we keep uint32
    free_counts: jax.Array  # (M,) int32 — number of free cells per map
    row_words: jax.Array | None = None  # (M, H) uint32 when W <= 32
    # (M, max_free) int32: row-major flat indices of each map's free cells
    # (0-padded past free_counts[m]). Turns the spawn draw — "k-th free
    # cell" — into one scalar gather instead of a per-env 1024-cell
    # cumsum + searchsorted inside the every-step masked autoreset.
    free_cells: jax.Array | None = None
    # Which procedural family generated the bank ("maze" | "rooms" |
    # "custom"): parity-mode map regeneration dispatches on THIS, never on
    # the map shape (a non-default-sized bank must not silently switch
    # generator families).
    kind: str = struct.field(pytree_node=False, default="custom")
    # Optional beam face tables (build_beam_tables): one gather replaces
    # the whole 8-beam observation slab scan. (M, 8, 2, H, W) f32 / bool.
    beam_face: jax.Array | None = None
    beam_axis: jax.Array | None = None

    def with_beam_tables(self) -> "MapBank":
        """Bank + precomputed first-wall face tables for the default 8-beam
        LIDAR directions (see build_beam_tables)."""
        face, axis_x = build_beam_tables(np.asarray(self.maps))
        return self.replace(
            beam_face=jnp.asarray(face), beam_axis=jnp.asarray(axis_x)
        )

    @property
    def num_maps(self) -> int:
        return int(self.maps.shape[0])

    @property
    def map_hw(self) -> tuple[int, int]:
        return (int(self.maps.shape[1]), int(self.maps.shape[2]))

    def fetch(self, bank_idx: jax.Array) -> jax.Array:
        if self.row_words is not None:
            _, w = self.map_hw
            words = jnp.take(self.row_words, bank_idx, axis=0)  # (..., H)
            bits = jnp.right_shift(
                words[..., None], jnp.arange(w, dtype=jnp.uint32)
            )
            return (bits & jnp.uint32(1)) == 1  # (..., H, W) bool, bitwise
        return jnp.take(self.maps, bank_idx, axis=0)

    def fetch_halves(self, bank_idx: jax.Array) -> jax.Array:
        """(..., H, 2) int32: each fetched row's occupancy bits packed
        little-endian into two 16-bit half-words — bit-identical to
        ``raycast.pack_row_halves(self.fetch(bank_idx))`` (asserted in
        tests/test_lidar.py), but two shift/masks on the already-packed
        row_words instead of a 16-term multiply-reduce on unpacked bools.
        The bitslab raycast backends window from these halves; packing once
        here (episode-constant) instead of every step was worth ~24 us/step
        at N=4096 (PERF.md round 4)."""
        if self.row_words is not None:
            words = jnp.take(self.row_words, bank_idx, axis=0)  # (..., H)
            return jnp.stack(
                [words & jnp.uint32(0xFFFF), words >> jnp.uint32(16)], axis=-1
            ).astype(jnp.int32)
        from ..ops.raycast import pack_row_halves

        occ = jnp.take(self.maps, bank_idx, axis=0)
        for _ in range(occ.ndim - 2):
            pack_row_halves = jax.vmap(pack_row_halves)
        return pack_row_halves(occ)


def _make_bank(
    gen, num_maps: int, seed: int | None, explicit_indices, native_gen=None,
    backend: str = "auto", kind: str = "custom",
) -> MapBank:
    if explicit_indices is not None:
        indices = np.asarray(explicit_indices, dtype=np.uint64)
    elif seed is None:
        indices = np.arange(num_maps, dtype=np.uint64)
    else:
        # Mirrors DatasetIterator's i.i.d. index draws
        # (dataset_iterator.py:26-32) with a dedicated bank seed.
        indices = np.random.default_rng(seed).integers(
            0, 2**32, size=num_maps, endpoint=True, dtype=np.uint64
        )
    if backend not in ("auto", "native", "python"):
        raise ValueError(f"unknown backend {backend!r}")
    use_native = False
    if native_gen is not None and backend in ("auto", "native"):
        from .native import native_available

        use_native = native_available()
        if backend == "native" and not use_native:
            raise RuntimeError("native map generator unavailable")
    if use_native:
        # C++ bank generation (~700x the Python generator; own pcg32
        # streams — use backend="python" for NumPy-draw reference parity).
        maps = native_gen(indices)
    else:
        maps = np.stack([gen(int(i)) for i in indices])
    free = (~maps).reshape(maps.shape[0], -1).sum(axis=-1).astype(np.int32)
    row_words = None
    if maps.shape[2] <= 32:
        row_words = jnp.asarray(
            (maps.astype(np.uint64) << np.arange(maps.shape[2], dtype=np.uint64))
            .sum(axis=-1)
            .astype(np.uint32)
        )
    max_free = int(free.max()) if len(free) else 0
    free_cells = np.zeros((maps.shape[0], max_free), np.int32)
    for m in range(maps.shape[0]):
        idxs = np.flatnonzero(~maps[m].reshape(-1))
        free_cells[m, : len(idxs)] = idxs
    return MapBank(
        maps=jnp.asarray(maps),
        # uint32 narrowing: the seeded draw mirrors the reference's
        # integers(0, 2**32, endpoint=True) (lidar_localization2d.py:552),
        # whose top value equals the virtual dataset LENGTH — already out
        # of range in the reference itself. On that 2**-32 edge the map is
        # generated from the full 64-bit value but the recorded identity
        # wraps to 0; device-side info stays uint32 (x64 is off).
        indices=jnp.asarray(indices.astype(np.uint32)),
        free_counts=jnp.asarray(free),
        row_words=row_words,
        free_cells=jnp.asarray(free_cells),
        kind=kind,
    )


def make_maze_bank(
    num_maps: int = 256,
    width: int = 21,
    height: int = 21,
    branching_prob: float = 1.0,
    seed: int | None = 0,
    indices=None,
    backend: str = "python",
) -> MapBank:
    """backend="python" (default) matches the reference's NumPy draws
    bitwise; backend="native"/"auto" uses the C++ generator (~700x faster,
    same map family, different per-index maps)."""

    def native_gen(idx):
        from .native import generate_maze_bank_native

        return generate_maze_bank_native(idx, width, height, branching_prob)

    return _make_bank(
        lambda i: generate_maze_map(i, width, height, branching_prob),
        num_maps,
        seed,
        indices,
        native_gen=native_gen,
        backend=backend,
        kind="maze",
    )


def make_rooms_bank(
    num_maps: int = 256,
    width: int = 32,
    height: int = 32,
    max_rooms: int = 10,
    door_width: int = 3,
    seed: int | None = 0,
    indices=None,
    backend: str = "python",
) -> MapBank:
    """See make_maze_bank for backend semantics."""
    if width != height:
        # Checked here as well as in generate_rooms_map so the NATIVE
        # backend (whose C++ transpose assumes square strides) can never
        # be reached with a non-square request.
        raise ValueError("rooms maps must be square (width == height); "
                         f"got {width}x{height}")

    def native_gen(idx):
        from .native import generate_rooms_bank_native

        return generate_rooms_bank_native(idx, width, height, max_rooms, door_width)

    return _make_bank(
        lambda i: generate_rooms_map(i, width, height, max_rooms, door_width),
        num_maps,
        seed,
        indices,
        native_gen=native_gen,
        backend=backend,
        kind="rooms",
    )


# ---------------------------------------------------------------------------
# Beam face tables: per-cell first-wall FACE coordinates for the 8 default
# LIDAR beam directions. The runtime observation scan becomes one gather +
# two flops per (env, beam) instead of a slab test against every map cell,
# and the hit parameter t = (face - p[axis]) * inv[axis] is the exact
# expression the slab computes for that entry face, so distances stay
# bitwise-equal to the dense raycast away from the measure-zero set of
# exact corner events (see apx/ops/raycast.py).

# Integer direction (sx, sy) of beams at angles linspace(-pi, pi, 8,
# endpoint=False): 0:-x, 1:(-x,-y), 2:-y, 3:(+x,-y), 4:+x, 5:(+x,+y),
# 6:+y, 7:(-x,+y).
BEAM_SIGNS = np.array(
    [(-1, 0), (-1, -1), (0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1)],
    dtype=np.int32,
)
_MISS = 1.0e6  # face sentinel: t becomes huge positive -> miss


def _axis_face_tables(occ: np.ndarray) -> dict:
    """(M, H, W) first-wall face coordinate along each axis direction."""
    m, h, w = occ.shape
    col = np.arange(w)[None, None, :]
    row = np.arange(h)[None, :, None]
    big = np.full_like(occ, _MISS, dtype=np.float64)

    # +x: nearest wall column > cx; near face = that column.
    wall_col = np.where(occ, col, _MISS).astype(np.float64)
    px = np.flip(np.minimum.accumulate(np.flip(wall_col, -1), -1), -1)
    face_px = np.concatenate([px[..., 1:], big[..., :1]], axis=-1)
    # -x: nearest wall column < cx; near face = column + 1.
    wall_col_n = np.where(occ, col, -_MISS).astype(np.float64)
    nx_ = np.maximum.accumulate(wall_col_n, -1)
    face_nx = np.concatenate([-big[..., :1], nx_[..., :-1] + 1.0], axis=-1)
    face_nx = np.where(face_nx < -_MISS / 2, -_MISS, face_nx)
    # +y / -y over rows.
    wall_row = np.where(occ, row, _MISS).astype(np.float64)
    py = np.flip(np.minimum.accumulate(np.flip(wall_row, -2), -2), -2)
    face_py = np.concatenate([py[..., 1:, :], big[..., :1, :]], axis=-2)
    wall_row_n = np.where(occ, row, -_MISS).astype(np.float64)
    ny_ = np.maximum.accumulate(wall_row_n, -2)
    face_ny = np.concatenate([-big[..., :1, :], ny_[..., :-1, :] + 1.0], axis=-2)
    face_ny = np.where(face_ny < -_MISS / 2, -_MISS, face_ny)
    return {(1, 0): face_px, (-1, 0): face_nx, (0, 1): face_py, (0, -1): face_ny}


def _diag_face_tables(occ: np.ndarray, sx: int, sy: int):
    """Walk the exact 45-degree staircase from every cell: returns, per
    variant (0 = x-crossing first, 1 = y-crossing first), the first-wall
    face coordinate and which axis it is on (True = x face).

    For |dx| == |dy| the x and y grid crossings strictly alternate, so the
    visited-cell sequence from a start cell depends only on which crossing
    comes first — two walks cover every fractional start position."""
    m, h, w = occ.shape
    faces = np.empty((2, m, h, w), dtype=np.float64)
    axes_x = np.empty((2, m, h, w), dtype=bool)
    for v in range(2):
        cx = np.broadcast_to(np.arange(w)[None, None, :], (m, h, w)).copy()
        cy = np.broadcast_to(np.arange(h)[None, :, None], (m, h, w)).copy()
        face = np.full((m, h, w), _MISS * (sx if sx else 1), dtype=np.float64)
        ax_x = np.ones((m, h, w), dtype=bool)
        done = np.zeros((m, h, w), dtype=bool)
        midx = np.arange(m)[:, None, None]
        for k in range(2 * (h + w)):
            step_x = (k % 2 == 0) if v == 0 else (k % 2 == 1)
            if step_x:
                nxt = cx + sx
                oob = (nxt < 0) | (nxt >= w)
                hit = np.zeros_like(done)
                safe = np.clip(nxt, 0, w - 1)
                hit[~done & ~oob] = occ[midx, cy, safe][~done & ~oob]
                newly = ~done & hit
                face[newly] = (nxt + (0 if sx > 0 else 1))[newly]
                ax_x[newly] = True
                done |= newly | (~done & oob)
                cx = np.where(done, cx, nxt)
            else:
                nyt = cy + sy
                oob = (nyt < 0) | (nyt >= h)
                hit = np.zeros_like(done)
                safe = np.clip(nyt, 0, h - 1)
                hit[~done & ~oob] = occ[midx, safe, cx][~done & ~oob]
                newly = ~done & hit
                face[newly] = (nyt + (0 if sy > 0 else 1))[newly]
                ax_x[newly] = False
                done |= newly | (~done & oob)
                cy = np.where(done, cy, nyt)
            if done.all():
                break
        # Misses keep the sentinel; give it the sign of the x direction so
        # t = (face - p) * inv comes out huge POSITIVE.
        miss = ~done | (np.abs(face) >= _MISS / 2)
        face[miss] = _MISS * (1 if sx > 0 else -1)
        ax_x[miss] = True
        faces[v] = face
        axes_x[v] = ax_x
    return faces, axes_x


def build_beam_tables(maps: np.ndarray):
    """(face, axis_x) arrays of shape (M, 8, 2, H, W):
    face = first-wall face coordinate for beam b from cell (cy, cx) under
    staircase variant v (axis beams ignore v), axis_x = whether that face
    is an x = const face."""
    occ = np.asarray(maps, dtype=bool)
    m, h, w = occ.shape
    axis_tables = _axis_face_tables(occ)
    face = np.empty((m, 8, 2, h, w), dtype=np.float32)
    axis_x = np.empty((m, 8, 2, h, w), dtype=bool)
    for b, (sx, sy) in enumerate(BEAM_SIGNS):
        if sx == 0 or sy == 0:
            t = axis_tables[(sx, sy)]
            face[:, b, 0] = face[:, b, 1] = t.astype(np.float32)
            axis_x[:, b, :] = sy == 0  # x face for x-axis beams
        else:
            f, ax = _diag_face_tables(occ, int(sx), int(sy))
            face[:, b, 0] = f[0].astype(np.float32)
            face[:, b, 1] = f[1].astype(np.float32)
            axis_x[:, b, 0] = ax[0]
            axis_x[:, b, 1] = ax[1]
    return face, axis_x
