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
    """HBM-resident bank of occupancy maps: (M, H, W) bool."""

    maps: jax.Array
    indices: jax.Array  # (M,) int64-as-int32-pair not needed; we keep uint32
    free_counts: jax.Array  # (M,) int32 — number of free cells per map
    # Which procedural family generated the bank ("maze" | "rooms" |
    # "custom"): parity-mode map regeneration dispatches on THIS, never on
    # the map shape (a non-default-sized bank must not silently switch
    # generator families).
    kind: str = struct.field(pytree_node=False, default="custom")

    @property
    def num_maps(self) -> int:
        return int(self.maps.shape[0])

    @property
    def map_hw(self) -> tuple[int, int]:
        return (int(self.maps.shape[1]), int(self.maps.shape[2]))

    def fetch(self, bank_idx: jax.Array) -> jax.Array:
        return jnp.take(self.maps, bank_idx, axis=0)


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
    return MapBank(
        maps=jnp.asarray(maps),
        indices=jnp.asarray(indices.astype(np.uint32)),
        free_counts=jnp.asarray(free),
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
