"""2D LIDAR localization environment (functional, TPU-native).

Behavioral reference: /root/reference/ap_gym/envs/lidar_localization2d.py.
Semantics preserved exactly:
  * map = boolean occupancy grid; wall cell (y, x) spans [x,x+1] x [y,y+1],
  * 8 LIDAR beams at angles linspace(-pi, pi, 8, endpoint=False), range 5;
    lidar obs = clip(dist / range, -1, 1) (:180-191, :272),
  * odometry obs = (pos - initial_pos) / [W, H] (:263-270),
  * dynamic-map variants add obs["map"] = occ.astype(f32)/255 — note the
    reference divides the *boolean* cast by 255, so values are {0, 1/255}
    (:299); replicated verbatim,
  * base_reward = 0.1 - 1e-3 * sum(action^2) (:330),
  * action normalized into the unit circle only when |a| > 1 (:332-335),
  * movement: raycast to first wall (eps=1e-3 pullback), then the
    reference's axis-aligned wall slide — including its quirks: only
    *positive* remaining components survive the `> 1e-5` filter, and when
    exactly one survives, `np.eye(2) * v` broadcasts it onto BOTH axes
    (:346-364); replicated decision-for-decision,
  * terminate when the agent leaves [0,W) x [0,H); pos then clipped to
    [0, map_size] (:366-375),
  * prediction target = *previous* position, normalized pos/size*2-1 (:377),
  * start: uniform over free cells (row-major order), +0.5 center (:303-311),
  * dynamic maps: a fresh map per episode (:297-299) — drawn here from an
    HBM-resident MapBank instead of a host prefetch thread,
  * NaN actions/predictions raise in the reference (:318-321); in jitted
    code they propagate instead — use apx.core.checks.assert_no_nan_actions
    (checkify) when that guard is needed.

The per-step hot path (8 beams + <=3 movement rays, all slab raycasts) is
pure VPU math with no host round trips; registered variants wrap this env
in TimeLimit(100, issue_termination=True) like registration.py:649-690.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..core.env import APEnv, APStepResult
from ..core.losses import LossFn
from ..core.spaces import Box, DictSpace, Image, Space
from ..data.floor_map import MapBank
from ..ops.raycast import (
    beam_cell_rects,
    bitslab_window,
    bitslab_window_2d,
    extract_window_mxu,
    lidar_directions,
    lidar_directions_np,
    lidar_table_scan,
    pad_occupancy,
    raycast_grid,
    raycast_grid_bitslab,
    raycast_grid_bitslab2d,
    raycast_grid_bitslab2d_per_ray,
    raycast_grid_windowed,
)
from .common import make_regression_loss_and_target_space

__all__ = ["LIDARLocalizationEnv", "LIDARLocalizationParams", "LIDARLocalizationState"]


class LIDARLocalizationParams(struct.PyTreeNode):
    map_bank: MapBank
    static_map: bool = struct.field(pytree_node=False, default=False)
    static_map_pos: int = struct.field(pytree_node=False, default=0)
    lidar_beam_count: int = struct.field(pytree_node=False, default=8)
    lidar_range: float = struct.field(pytree_node=False, default=5.0)
    # Raycast backend (all same-session A/B'd on v5e, PERF.md round-2 study):
    #   "xla" (default): dense separable slab over the full map, fused into
    #     a VPU min-reduce — measured at ~88% of the VPU roofline; every
    #     work-cutting alternative below measured slower end-to-end.
    #   "mxu_window": one 16x16 occupancy window per step via one-hot
    #     matmuls (6.25M vs 7.23M: tiny batched matmuls use <5% of an MXU
    #     tile each). Results match dense to 1 ulp; kept selectable and
    #     equivalence-tested.
    #   "pallas_window": per-env DMA window extraction — Mosaic REJECTS
    #     sub-lane-tile (128) DMA slices on TPU, so this runs only under
    #     interpret mode (CPU tests); kept as the documented dead end that
    #     completes the ceiling argument (PERF.md).
    #   "windowed"/"hybrid": dynamic_slice windows — 8-20x slower on TPU
    #     (per-env gathers don't tile), faster on CPU.
    #   "pallas": hand-scheduled VMEM kernel (dense math; loses XLA fusion).
    #   "bitslab": 16-column window via BIT-PACKED map rows — each row is
    #     two 16-bit half-words; window occupancy is a 2-way select +
    #     variable shift + mask, all elementwise VPU ops (no gathers, no
    #     tiny matmuls — the two mechanisms that made every round-2
    #     windowed variant slower). The window lattice stays in global
    #     coordinates so results are BITWISE equal to "xla"'s fast path
    #     with 16/W of the per-cell slab work (apx.ops.raycast
    #     .raycast_grid_bitslab). Reset scans (GEOS-typed) stay dense.
    #     Same-session A/B (round 3): 6.08M vs 5.61M/5.63M dense xla
    #     (+8.4%) — the first windowed variant to beat the dense form.
    #   "bitslab2d": second bit-domain pass cuts rows too — the (H, 16)
    #     x-window's columns re-pack into one uint32 row-word each and a
    #     second variable shift yields a (16, 16) window: 256/(H*W) of the
    #     dense combine work, still zero gathers, still bitwise-equal
    #     (apx.ops.raycast.bitslab_window_2d).
    #   "auto" (default): "bitslab2d" whenever eligible (lidar_range fits
    #     the 16-cell window and the map is <= 32 cells in both axes —
    #     true for every registered env), else "bitslab" (W <= 32), else
    #     the dense "xla" path.
    raycast_backend: str = struct.field(pytree_node=False, default="auto")
    # Observation-scan beam tables (apx.ops.raycast.lidar_table_scan): one
    # gather per beam instead of the full slab scan. Measured SLOWER in
    # context (same-process A/B on v5e: 3.05M vs 4.80M env-steps/s) even
    # though an isolated (4096, 8) gather microbenches at 31.5us — in the
    # step pipeline the state-dependent gather serializes against the VPU
    # work it replaces, while the dense slab fuses into it. Kept as a
    # selectable, bitwise-equivalence-tested alternative; requires a bank
    # built with MapBank.with_beam_tables().
    use_beam_tables: bool = struct.field(pytree_node=False, default=False)
    # Per-beam static cell rectangles for the observation scan (bitslab2d
    # only): the 8 beam directions are compile-time constants, so each
    # beam's reachable cells form a STATIC sub-rectangle of the window
    # (~50-90 cells vs the 196-cell shared rho slice a range-5 cast
    # sweeps — 2.4x fewer lattice slots, bitwise identical;
    # raycast.beam_cell_rects' exclusion proof, pinned in test_lidar).
    # Measured SLOWER in-env despite the work cut: 54.0M vs 70.0M
    # env-steps/s same-process on v5e (PERF.md round 5) — the per-ray
    # pad/stack of 8 ragged slab chains breaks the shared form's single
    # fused lattice reduce, the same isolated-win/in-env-loss reversal as
    # the windowed glimpse and every gather A/B. "auto" (default)
    # therefore resolves to OFF; "on" forces the per-ray path (the
    # reproducible A/B surface).
    beam_rects: str = struct.field(pytree_node=False, default="auto")

    @property
    def windowed(self) -> bool:
        return self.raycast_backend == "windowed"

    @property
    def ray_pad(self) -> int:
        import math

        # mxu_window needs pad >= win//2 so window indices stay in range;
        # pallas_window additionally needs room for the 8-aligned 24-row
        # DMA windows (see apx.ops.window_pallas).
        base = max(int(math.ceil(self.lidar_range)) + 1, self.win_size // 2)
        if self.raycast_backend == "pallas_window":
            return max(base, 16)
        return base

    @property
    def win_size(self) -> int:
        return 16

    @property
    def use_mxu_window(self) -> bool:
        return self.raycast_backend == "mxu_window" and self.lidar_range <= (
            self.win_size // 2 - 2
        )

    @property
    def needs_padded_occ(self) -> bool:
        """Only the window-extraction backends read state.occ_padded; under
        the bitslab/dense defaults it is not materialized at all — 60%
        less LIDAR state HBM (matters at N=16384). Throughput is unchanged
        (same-session A/B 6.20 vs 6.19M steps/s: XLA already avoided
        copying the untouched buffer through the scan; the per-step copy
        fusions in the profile are the mutated leaves)."""
        return self.raycast_backend in (
            "windowed", "hybrid", "mxu_window", "pallas_window"
        )

    @property
    def needs_row_halves(self) -> bool:
        """The bitslab backends window from the 16-bit-half-packed rows;
        the halves are episode-constant, so they are packed once at reset
        (from the bank's already-packed row_words, two shift/masks) and
        carried in state instead of re-packed from the bool map every
        step (a 16-term multiply-reduce, ~24 us/step at N=4096)."""
        return self.use_bitslab or self.use_bitslab2d

    @property
    def beam_tables_active(self) -> bool:
        return (
            self.use_beam_tables
            and self.map_bank.beam_face is not None
            and self.lidar_beam_count == 8
        )

    @property
    def use_pallas_window(self) -> bool:
        return self.raycast_backend == "pallas_window" and self.lidar_range <= (
            self.win_size // 2 - 2
        )

    @property
    def use_bitslab2d(self) -> bool:
        return (
            self.raycast_backend in ("bitslab2d", "auto")
            and self.lidar_range <= (self.win_size // 2 - 2)
            and self.map_bank.map_hw[0] <= 32
            and self.map_bank.map_hw[1] <= 32
        )

    @property
    def use_bitslab(self) -> bool:
        if self.raycast_backend == "auto":
            # auto ladder: bitslab2d > bitslab > dense xla (same-session
            # A/B: 6.10M / 5.94M / 5.44M env-steps/s, PERF.md round 3).
            return not self.use_bitslab2d and (
                self.lidar_range <= (self.win_size // 2 - 2)
                and self.map_bank.map_hw[1] <= 32
            )
        return self.raycast_backend == "bitslab" and self.lidar_range <= (
            self.win_size // 2 - 2
        ) and self.map_bank.map_hw[1] <= 32


class LIDARLocalizationState(struct.PyTreeNode):
    occ: jax.Array  # (H, W) bool — current map
    # (H+2p, W+2p) bool ray_pad'ded copy — present ONLY for the
    # window-extraction backends (params.needs_padded_occ); None otherwise
    # so the scan doesn't carry (and copy, ~45 us/step at N=4096) a dead
    # buffer.
    occ_padded: jax.Array | None
    # (H, 2) int32 16-bit-half-packed rows (raycast.pack_row_halves
    # semantics) — present ONLY for the bitslab backends
    # (params.needs_row_halves); episode-constant, packed at reset.
    row_halves: jax.Array | None
    bank_pos: jax.Array  # () int32 — position in the bank
    map_idx: jax.Array  # () uint32 — dataset index of the current map
    pos: jax.Array  # (2,) f32 (x, y)
    initial_pos: jax.Array  # (2,) f32 — odometry origin (see odo_pending)
    # The reference aliases __initial_pos to __pos at reset
    # (lidar_localization2d.py:305-311), and movement mutates __pos
    # IN-PLACE (:343, :360) while the end-of-step clip (:371-375) rebinds
    # it. Net effect: the odometry origin is the agent's position after the
    # FIRST step's movement (pre-clip), not the reset position. odo_pending
    # is True until that first step locks the origin in.
    odo_pending: jax.Array  # () bool


class LIDARLocalizationEnv(APEnv[LIDARLocalizationParams, LIDARLocalizationState]):
    step_uses_rng = False  # step_env is deterministic given state/action
    def __init__(self, map_bank: MapBank | None = None, **config):
        self._map_bank = map_bank
        self._config = config

    def default_params(self, **overrides) -> LIDARLocalizationParams:
        cfg = {**self._config, **overrides}
        bank = cfg.pop("map_bank", self._map_bank)
        if bank is None:
            raise ValueError("LIDARLocalizationEnv requires a map bank")
        return LIDARLocalizationParams(map_bank=bank, **cfg)

    # ---- spaces / loss ------------------------------------------------------
    def observation_space(self, params) -> Space:
        h, w = params.map_bank.map_hw
        d: dict[str, Any] = {
            "lidar": Box(low=0.0, high=1.0, shape=(params.lidar_beam_count,)),
            "odometry": Box(low=-1.0, high=1.0, shape=(2,)),
        }
        if not params.static_map:
            d["map"] = Image.create(width=w, height=h, channels=1)
        return DictSpace(d)

    def inner_action_space(self, params) -> Space:
        return Box(low=-1.0, high=1.0, shape=(2,))

    def prediction_space(self, params) -> Space:
        return Box(low=-1.0, high=1.0, shape=(2,))

    def prediction_target_space(self, params) -> Space:
        _, space = make_regression_loss_and_target_space(2, -1.0, 1.0)
        return space

    def loss_fn(self, params) -> LossFn:
        loss, _ = make_regression_loss_and_target_space(2, -1.0, 1.0)
        return loss

    # ---- helpers ------------------------------------------------------------
    @staticmethod
    def _map_size(params) -> jnp.ndarray:
        h, w = params.map_bank.map_hw
        return jnp.array([w, h], dtype=jnp.float32)

    def _make_window(self, state, params):
        """One occupancy window shared by all of a step's scans (beams of
        range <= 6 from any point within 1.0 of state.pos fit). Returns a
        tagged tuple: ("local", (win, win) occ, base) for the translated
        backends, ("bitslab", (H, 16) occ, base_x) for the global-coordinate
        bit-packed window, or None when the dense path is active."""
        if params.use_bitslab2d:
            _, w = params.map_bank.map_hw
            half = params.win_size // 2 - 1
            base_x = jnp.floor(state.pos[0]) - half
            base_y = jnp.floor(state.pos[1]) - half
            occ_win = bitslab_window_2d(
                state.row_halves,
                base_x.astype(jnp.int32),
                base_y.astype(jnp.int32),
                w,
            )
            return ("bitslab2d", occ_win, (base_x, base_y))
        if params.use_bitslab:
            _, w = params.map_bank.map_hw
            base_x = jnp.floor(state.pos[0]) - (params.win_size // 2 - 1)
            occ_win = bitslab_window(
                state.row_halves, base_x.astype(jnp.int32), w
            )
            return ("bitslab", occ_win, base_x)
        if params.use_pallas_window:
            from ..ops.window_pallas import make_window_extractor

            win = params.win_size
            pos = state.pos.astype(jnp.float32)
            bx = jnp.floor(pos[0]) - (win // 2 - 1)
            # Row start 8-aligned for the DMA sublane tiling; the base
            # absorbs the alignment offset and the 24-row window carries
            # the slack (window_pallas.WIN_ROWS).
            y0 = (jnp.floor(pos[1]) - (win // 2 - 1) + params.ray_pad).astype(
                jnp.int32
            )
            y0a = (y0 // 8) * 8
            by = (y0a - params.ray_pad).astype(jnp.float32)
            x0 = (bx + params.ray_pad).astype(jnp.int32)
            if jax.default_backend() == "tpu":
                raise ValueError(
                    "raycast_backend='pallas_window' cannot run on TPU: the "
                    "DMA engines reject sub-lane-tile (128) slices, so "
                    "16-wide windows cannot be extracted (see PERF.md and "
                    "apx.ops.window_pallas). Use the default 'xla' backend."
                )
            extractor = make_window_extractor(win=win, interpret=True)
            window = extractor(state.occ_padded, jnp.stack([x0, y0a]))
            return ("local", window, jnp.stack([bx, by]))
        if not params.use_mxu_window:
            return None
        win, base = extract_window_mxu(
            state.occ_padded, params.ray_pad, state.pos, win=params.win_size
        )
        return ("local", win, base)

    def _raycast(self, state, origin, targets, params, radius, typed=False,
                 window=None, rho=None, ray_rects=None):
        if window is not None:
            kind, win_occ, base = window
            if kind in ("bitslab", "bitslab2d"):
                if typed:
                    # GEOS-typed scans (resets only) stay on the dense path:
                    # graze classification needs flank cells the fast window
                    # doesn't carry, and resets are cond-gated cold code.
                    return raycast_grid(
                        state.occ, origin, targets, geos_typing=True
                    )
                if kind == "bitslab2d":
                    occ2, bx, by = win_occ, base[0], base[1]
                    if ray_rects is not None:
                        # STATIC per-ray rectangles (beams only — their
                        # directions are compile-time constants). Slices
                        # the FULL window so the per-axis base+iota sums
                        # are identical to the shared form's.
                        return raycast_grid_bitslab2d_per_ray(
                            occ2, bx, by, origin, targets, ray_rects
                        )
                    if rho is not None:
                        # STATIC sub-slice of the shared window: the cast's
                        # segments stay within rho cells of the window
                        # anchor (floor(old pos)), so valid candidates can
                        # only appear at window indices
                        # [half - rho - 1, half + rho] per axis — including
                        # the exact face-touch cases (a == b == 1 requires
                        # the segment endpoint exactly ON the excluded
                        # cell's face, which the rho bound forbids: the
                        # endpoint is <= anchor_pos + rho < the face of cell
                        # anchor + rho + 1, and >= anchor_pos - rho > the
                        # face of cell anchor - rho - 2). Every excluded
                        # cell fails a <= b identically, so the min — and
                        # the bitwise result — is unchanged; the movement
                        # casts drop from 256 to 36 lattice cells, the beam
                        # scan from 256 to 196 (round-5 profile A/B in
                        # PERF.md).
                        half = params.win_size // 2 - 1
                        lo = max(half - rho - 1, 0)
                        hi = min(half + rho + 1, params.win_size)
                        occ2 = win_occ[lo:hi, lo:hi]
                        bx = bx + lo
                        by = by + lo
                    return raycast_grid_bitslab2d(
                        occ2, bx, by, origin, targets
                    )
                return raycast_grid_bitslab(win_occ, base, origin, targets)
            return raycast_grid(
                win_occ, origin - base, targets - base, geos_typing=typed
            )
        # typed=True enables the GEOS result-typing classification (corner
        # grazes); used for reset scans, where the agent sits at an exact
        # cell center and diagonal beams systematically graze lattice
        # corners. Step-time scans start from generic f32 positions, where
        # a graze is measure-zero and the fast path is bitwise identical
        # (see raycast_grid's docstring).
        if params.raycast_backend == "windowed" or (
            params.raycast_backend == "hybrid" and radius <= 2
        ):
            # hybrid: the short movement rays (length <= 1) touch at most a
            # 6x6 window; only the long lidar beams go dense.
            return raycast_grid_windowed(
                state.occ_padded, params.ray_pad, origin, targets, radius,
                geos_typing=typed,
            )
        if params.raycast_backend == "pallas":
            from ..ops.raycast_pallas import raycast_grid_pallas

            return raycast_grid_pallas(state.occ, origin, targets), None
        return raycast_grid(state.occ, origin, targets, geos_typing=typed)

    def _observe(
        self, state: LIDARLocalizationState, params, typed: bool = False,
        window=None,
    ) -> dict[str, jax.Array]:
        dirs = lidar_directions(params.lidar_beam_count) * params.lidar_range
        if not typed and params.beam_tables_active:
            dist = lidar_table_scan(
                params.map_bank.beam_face,
                params.map_bank.beam_axis,
                state.bank_pos,
                state.pos,
                dirs,
            )
        else:
            if window is None and not (
                typed and (params.use_bitslab or params.use_bitslab2d)
            ):
                # typed bitslab scans fall through to dense anyway — don't
                # build an unused window inside the (cond-gated) reset path.
                window = self._make_window(state, params)
            # The window anchor is floor(pos) of the PRE-move state (the
            # scan position is within 1.0 of it) and beams reach
            # lidar_range, so the cast's slack around the anchor is
            # range + 1 cells.
            ray_rects = None
            if (
                not typed
                and params.beam_rects == "on"
                and params.use_bitslab2d
                and window is not None
                and window[0] == "bitslab2d"
            ):
                # Origin window-coords span [half-1, half+2] CLOSED: the
                # anchor is floor(pre-move pos) at index half, the scan
                # position is within 1.0 of the pre-move pos per axis,
                # and wall-slides can land exactly on cell faces.
                import numpy as np

                half = params.win_size // 2 - 1
                offs = lidar_directions_np(
                    params.lidar_beam_count
                ) * np.float32(params.lidar_range)
                ray_rects = beam_cell_rects(
                    offs, params.win_size, half - 1.0, half + 2.0
                )
            dist, _ = self._raycast(
                state, state.pos, state.pos + dirs, params, params.ray_pad,
                typed=typed, window=window,
                rho=int(math.ceil(params.lidar_range)) + 1,
                ray_rects=ray_rects,
            )
        # The dynamic-map channel is a DERIVED obs entry (see
        # obs_derived_from_state): the vector layer appends it once per
        # step from the post-merge state, outside the autoreset cond.
        return {
            "lidar": jnp.clip(dist / params.lidar_range, -1.0, 1.0),
            "odometry": (state.pos - state.initial_pos) / self._map_size(params),
        }

    def obs_derived_from_state(self, state, params) -> dict[str, jax.Array]:
        """obs["map"] = occ.astype(f32)/255 — the reference divides the
        *boolean* cast by 255, so values are {0, 1/255}
        (lidar_localization2d.py:299). Pure elementwise in state.occ, so
        computing it from the merged state is bitwise-identical to the
        per-branch form while paying the (N, H, W, 1) f32 write once
        instead of twice-plus-a-select (~52 us -> ~21 us of a ~123 us step
        at N=4096; round-5 profile + A/B in PERF.md)."""
        if params.static_map:
            return {}
        return {"map": state.occ[..., None].astype(jnp.float32) / 255.0}

    def _info(self, state, params) -> dict[str, jax.Array]:
        # The reference reports this only from reset()/its vector-env info
        # update path (:315, :387); the single-env step template rebuilds
        # info and drops it (active_perception_env.py:101-121) — that
        # replace-vs-update asymmetry is handled in the compat layer.
        return {"map_idx": state.map_idx}

    # ---- dynamics -----------------------------------------------------------
    def reset_env(self, key, params):
        k_map, k_cell = jax.random.split(key)
        if params.static_map:
            bank_pos = jnp.full((), params.static_map_pos, dtype=jnp.int32)
        else:
            bank_pos = jax.random.randint(
                k_map, (), 0, params.map_bank.num_maps, dtype=jnp.int32
            )
        occ = params.map_bank.fetch(bank_pos)
        h, w = params.map_bank.map_hw
        n_free = jnp.take(params.map_bank.free_counts, bank_pos)
        k = jax.random.randint(k_cell, (), 0, n_free, dtype=jnp.int32)
        # k-th free cell in row-major order == np.where order (:303-311).
        if params.map_bank.free_cells is not None:
            # Precomputed per-map table: one scalar gather instead of a
            # 1024-cell cumsum + searchsorted — this runs for every env on
            # nearly every step inside the masked autoreset (PERF.md).
            flat_idx = params.map_bank.free_cells[bank_pos, k]
        else:
            free = ~occ.reshape(-1)
            flat_idx = jnp.searchsorted(
                jnp.cumsum(free.astype(jnp.int32)), k + 1, side="left"
            ).astype(jnp.int32)
        cy, cx = jnp.divmod(flat_idx, w)
        pos = jnp.array([cx, cy], dtype=jnp.float32) + 0.5
        state = LIDARLocalizationState(
            occ=occ,
            occ_padded=(
                pad_occupancy(occ, params.ray_pad)
                if params.needs_padded_occ
                else None
            ),
            row_halves=(
                params.map_bank.fetch_halves(bank_pos)
                if params.needs_row_halves
                else None
            ),
            bank_pos=bank_pos,
            map_idx=jnp.take(params.map_bank.indices, bank_pos).astype(jnp.uint32),
            pos=pos,
            initial_pos=pos,
            odo_pending=jnp.ones((), dtype=jnp.bool_),
        )
        return self._observe(state, params, typed=True), state, self._info(state, params)

    def step_env(self, key, state, action, prediction, params) -> APStepResult:
        last_pos = state.pos
        base_reward = 0.1 - 1e-3 * jnp.sum(jnp.square(action), axis=-1)

        mag = jnp.linalg.norm(action)
        a = jnp.where(mag > 1.0, action / jnp.where(mag == 0.0, 1.0, mag), action)
        total = jnp.linalg.norm(a)
        safe_total = jnp.where(total == 0.0, 1.0, total)
        direction = a / safe_total

        # One shared occupancy window per step (see _make_window); the
        # post-movement position stays within 1.0 of state.pos, so the
        # final observation scan reuses it too.
        window = self._make_window(state, params)

        # First leg: move up to the nearest wall (:336-343). Movement
        # segments have length <= 1, so radius 2 windows suffice.
        d2w, _ = self._raycast(
            state, state.pos, (state.pos + a)[None, :], params, 2,
            window=window, rho=2,
        )
        d2w = d2w[0]
        pos1 = state.pos + direction * d2w

        # Wall slide (:346-364), reference quirks included: filter keeps only
        # components > 1e-5 (positive!), and a single survivor v becomes
        # np.eye(2) * [v] == diag([v, v]) — candidates on BOTH axes.
        rem = total - d2w
        rem_vec = direction * rem
        keep = rem_vec > 1e-5
        n_keep = keep.sum()
        # masked fill 0 (not -inf): unused when n_keep == 0, and avoids
        # -inf * 0 NaNs in the candidate construction below.
        v_single = jnp.max(jnp.where(keep, rem_vec, 0.0))
        cand_diag = jnp.where(n_keep == 2, rem_vec, jnp.full((2,), v_single))
        cand = jnp.eye(2, dtype=jnp.float32) * cand_diag  # (2, 2) candidate moves
        cand_dist, _ = self._raycast(
            state, pos1, pos1 + cand, params, 2, window=window, rho=2
        )
        # Pick the surviving slide candidate. The reference indexes with a
        # data-dependent 0/1 idx; under vmap that lowers to three per-env
        # gathers, which serialize on TPU (~87 us/step at N=4096 — the
        # profiled ops formerly at :473-474). The index is binary, so a
        # predicated select over the two statically-sliced rows is
        # bitwise-identical and stays elementwise.
        use0 = cand_dist[0] > 0.0
        sel_cand = jnp.where(use0, cand[0], cand[1])  # (2,)
        sel_diag = jnp.where(use0, cand_diag[0], cand_diag[1])
        sel_dist = jnp.where(use0, cand_dist[0], cand_dist[1])
        slide = (
            sel_cand / jnp.where(sel_diag == 0.0, 1.0, sel_diag)
        ) * sel_dist
        do_slide = (total > 0.0) & (rem > 1e-5) & (n_keep > 0)
        pos2 = jnp.where(do_slide, pos1 + slide, pos1)
        pos2 = jnp.where(total > 0.0, pos2, state.pos)

        size = self._map_size(params)
        terminated = jnp.any(pos2 < 0.0) | jnp.any(pos2 >= size)
        # On the first step after reset the odometry origin locks to the
        # PRE-clip moved position (reference aliasing, see state docstring).
        new_initial = jnp.where(state.odo_pending, pos2, state.initial_pos)
        pos2 = jnp.clip(pos2, 0.0, size)

        new_state = state.replace(
            pos=pos2,
            initial_pos=new_initial,
            odo_pending=jnp.zeros((), dtype=jnp.bool_),
        )
        target = (last_pos / size * 2.0 - 1.0).astype(jnp.float32)
        return APStepResult(
            obs=self._observe(new_state, params, window=window),
            state=new_state,
            base_reward=base_reward.astype(jnp.float32),
            terminated=terminated,
            truncated=jnp.zeros((), dtype=jnp.bool_),
            info=self._info(new_state, params),
            prediction_target=target,
        )

    def prediction_target_on_reset(self, old_state, new_state, params):
        size = self._map_size(params)
        return (old_state.pos / size * 2.0 - 1.0).astype(jnp.float32)
