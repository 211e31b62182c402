"""Shared glimpse-on-image engine (functional core of all image envs).

Behavioral reference: /root/reference/ap_gym/envs/image/image_perception_module.py.
Key semantics preserved exactly:
  * action is projected into the unit circle, scaled by max_step_length, added
    to the normalized position, clipped to [-1, 1]^2 (module.py:206-208),
  * base_reward = -1e-3 * ||action||_2 of the *raw* action (module.py:209),
  * episodes terminate when time_step reaches step_limit (module.py:211-212),
  * obs = {glimpse, glimpse_pos, time_step[, inverted_label]} with
    time_step = 2 t / step_limit - 1 (module.py:236-251); inverted_label is
    0/1 at t=0 and the constant 2 afterwards,
  * start position uniform in [-1, 1]^2, one dataset draw per episode
    (module.py:120-161).

TPU-first differences: the per-image scipy interpolator loop is replaced by
the separable-bilinear GEMM kernel in apx.ops.glimpse; the dataset is an
HBM-resident bank; the current image is carried in env state — in the bank's
PACKED storage form for packed banks (see ImagePerceptionParams.image_storage)
— so the per-step path is pure compute with no gathers.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..core.spaces import Box, DictSpace, Discrete, Image
from ..data.dataset import ImageDataset
from ..ops.geometry import project_sphere
from ..ops.glimpse import extract_glimpse

__all__ = ["ImagePerceptionParams", "ImagePerceptionState", "ImagePerceptionEngine"]


class ImagePerceptionParams(struct.PyTreeNode):
    """Mirrors ImagePerceptionConfig (module.py:20-34)."""

    dataset: ImageDataset
    sensor_size: tuple[int, int] = struct.field(pytree_node=False, default=(5, 5))
    sensor_scale: float = struct.field(pytree_node=False, default=1.0)
    max_step_length: tuple[float, float] = struct.field(
        pytree_node=False, default=(0.2, 0.2)
    )
    step_limit: int = struct.field(pytree_node=False, default=16)
    randomly_invert_labels: bool = struct.field(pytree_node=False, default=False)
    unique_sampling_max_grid_cell_size_rel: float = struct.field(
        pytree_node=False, default=0.2
    )
    unique_sampling_top_k: int = struct.field(pytree_node=False, default=10)
    # Candidate-glimpse sweep backend for the unique-target sampler:
    #   "cartesian" (chosen by "auto", the default): the candidate grid is a
    #     cartesian product of x- and y-lines, so the separable-GEMM glimpse
    #     factorizes over the grid axes — the row GEMM runs once per unique y
    #     (not once per candidate) and its (c1, s0, W, C) intermediate is
    #     reused across all x-columns: ~6x fewer MACs than per-candidate
    #     extraction on TinyImageNet geometry and no chunking needed (the
    #     intermediate is c1*s0 rows, not P*s0).
    #   "chunked": per-candidate extraction in sequential lax.map chunks
    #     (the round-1 OOM fix); kept for A/B and as the memory-proportional
    #     fallback.
    unique_sampling_backend: str = struct.field(pytree_node=False, default="auto")
    # MXU pass count for the glimpse einsums: "default" (1 bf16 pass — the
    # TPU platform default; +42% measured on TinyImageNetLoc), "high"
    # (3 passes, ~4e-5 obs error), "highest" (6 passes, exact-f32 — use for
    # cross-backend parity work). No-op on CPU. See apx.ops.glimpse.
    glimpse_precision: str = struct.field(pytree_node=False, default="default")
    # Row-band windowing of the per-step glimpse read ("off" | "rows" |
    # "auto"): "rows" dynamic-slices the ((s0-1)*scale + 2)-row band before
    # the row einsum — bitwise identical (only exact-0-weight terms are
    # excluded; pinned in test_glimpse) and +33-76% on the ISOLATED op,
    # but 2.4x SLOWER end-to-end in the env scan on every image geometry
    # (tin_loc 9.53 -> 4.05M, mnist 30.6 -> 19.7M, cifar10 17.7 -> 10.6M
    # env-steps/s; same process, interleaved): the per-env dynamic-slice
    # gather on the scan-carried image batch serializes where the
    # full-image einsum fuses. "auto" therefore resolves to "off"; "rows"
    # stays as the committed A/B surface. PERF.md round 5.
    glimpse_window: str = struct.field(pytree_node=False, default="auto")
    # How the current episode's image lives in env state. All three modes
    # are bitwise-equivalent (same trajectories); "auto" resolves to
    # "array", the measured winner of the round-5 state-layout A/B
    # (TinyImageNetLoc N=4096, same process, interleaved:
    # array 7.35/7.35M, packed 1.98/1.98M, gather 1.97/1.97M env-steps/s):
    #   "array": the unpacked (H, W, C) image in the bank's logical dtype.
    #     The episode boundary pays the carry copies of the 4D u8 batch,
    #     but the steady-state glimpse reads it with zero per-step work.
    #   "packed": the bank's packed (R,) int32 row verbatim, unpacked at
    #     glimpse time. Kills the boundary unpack, but the per-step
    #     shift/mask + reshape runs every step and measured 3.7x slower
    #     end-to-end — episode-amortized work moved into the hot loop.
    #   "gather": state carries NO image; every glimpse re-gathers the row
    #     from the HBM bank via state.data_index (the VERDICT-r4 "bank
    #     indices in state" layout). Same 3.7x loss: per-step gathers
    #     serialize against the glimpse GEMM — the same verdict as every
    #     in-pipeline gather in PERF.md.
    image_storage: str = struct.field(pytree_node=False, default="auto")
    # Render-only knobs (ImagePerceptionConfig defaults, module.py:27-29).
    display_visitation: bool = struct.field(pytree_node=False, default=True)
    render_unvisited_opacity: float = struct.field(pytree_node=False, default=0.0)
    render_visited_opacity: float = struct.field(pytree_node=False, default=0.3)


class ImagePerceptionState(struct.PyTreeNode):
    # Current episode's image in the form selected by params.image_storage:
    # (R,) int32 packed row ("packed"), (H, W, C) u8/f32 ("array"), or a
    # (0,) placeholder ("gather" — read through data_index instead). Use
    # ImagePerceptionEngine.image_raw to get the logical (H, W, C) image.
    image: jax.Array
    label: jax.Array  # () int32
    data_index: jax.Array  # () int32
    pos: jax.Array  # (2,) f32, normalized (x, y)
    time: jax.Array  # () int32
    label_inverted: jax.Array  # () bool


class ImagePerceptionEngine:
    """Stateless helper implementing the shared mechanics."""

    @staticmethod
    def observation_space_dict(params: ImagePerceptionParams) -> dict[str, Any]:
        s0, s1 = params.sensor_size
        h, w, c = params.dataset.image_shape
        d = {
            "glimpse": Image.create(width=s1, height=s0, channels=c),
            "glimpse_pos": Box(low=-1.0, high=1.0, shape=(2,)),
            "time_step": Box(low=-1.0, high=1.0, shape=()),
        }
        if params.randomly_invert_labels:
            d["inverted_label"] = Discrete(3)
        return d

    @staticmethod
    def observation_space(params: ImagePerceptionParams) -> DictSpace:
        return DictSpace(ImagePerceptionEngine.observation_space_dict(params))

    @staticmethod
    def inner_action_space(params: ImagePerceptionParams) -> Box:
        return Box(low=-1.0, high=1.0, shape=(2,))

    @staticmethod
    def storage(params: ImagePerceptionParams) -> str:
        """Resolved image_storage mode ("packed" / "array" / "gather")."""
        s = params.image_storage
        if s == "auto":
            return "array"  # the measured A/B winner (see the param docs)
        if s not in ("packed", "array", "gather", "flat"):
            raise ValueError(
                f"unknown image_storage {s!r}; "
                "expected 'auto', 'packed', 'array', 'flat' or 'gather'"
            )
        if s == "packed" and getattr(params.dataset, "stored_packed_shape", None) is None:
            raise ValueError("image_storage='packed' requires an int32-packed bank")
        return s

    @staticmethod
    def fetch_state_image(
        idx: jax.Array, params: ImagePerceptionParams
    ) -> tuple[jax.Array, jax.Array]:
        """(image-state leaf, label) for a dataset index, in the form the
        resolved storage mode carries."""
        mode = ImagePerceptionEngine.storage(params)
        if mode == "gather":
            return jnp.zeros((0,), jnp.uint8), params.dataset.fetch_label(idx)
        if mode == "packed":
            return params.dataset.fetch_stored(idx)
        img, label = params.dataset.fetch_raw(idx)
        if mode == "flat":
            img = img.reshape(img.shape[: img.ndim - 3] + (-1,))
        return img, label

    @staticmethod
    def image_raw(
        state: ImagePerceptionState, params: ImagePerceptionParams
    ) -> jax.Array:
        """The logical (..., H, W, C) image in the bank's logical dtype,
        whatever the storage mode (leading dims pass through, so batched
        states work too — used by render and tests)."""
        from ..data.dataset import unpack_rows

        mode = ImagePerceptionEngine.storage(params)
        if mode == "gather":
            img, _ = params.dataset.fetch_raw(state.data_index)
            return img
        if mode == "packed":
            return unpack_rows(state.image, params.dataset.stored_packed_shape)
        if mode == "flat":
            shape = tuple(params.dataset.image_shape)
            return state.image.reshape(state.image.shape[:-1] + shape)
        return state.image

    @staticmethod
    def reset(key: jax.Array, params: ImagePerceptionParams) -> ImagePerceptionState:
        k_idx, k_inv, k_pos = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (), 0, params.dataset.length, dtype=jnp.int32)
        image, label = ImagePerceptionEngine.fetch_state_image(idx, params)
        if params.randomly_invert_labels:
            inverted = jax.random.randint(k_inv, (), 0, 2) == 1
            label = jnp.where(
                inverted, params.dataset.num_classes - label - 1, label
            ).astype(jnp.int32)
        else:
            inverted = jnp.zeros((), dtype=jnp.bool_)
        pos = jax.random.uniform(k_pos, (2,), minval=-1.0, maxval=1.0)
        return ImagePerceptionState(
            image=image,
            label=label,
            data_index=idx,
            pos=pos.astype(jnp.float32),
            time=jnp.zeros((), dtype=jnp.int32),
            label_inverted=inverted,
        )

    @staticmethod
    def from_external_draws(
        image: jax.Array,
        label: jax.Array,
        data_index: jax.Array,
        pos: jax.Array,
        label_inverted: jax.Array,
    ) -> ImagePerceptionState:
        """Build a reset state from host-provided RNG draws (compat/parity
        mode reproduces the reference's NumPy PCG64 draw sequence). ``image``
        must already be the state-form leaf for the caller's storage mode
        (use fetch_state_image)."""
        return ImagePerceptionState(
            image=image,
            label=label.astype(jnp.int32),
            data_index=data_index.astype(jnp.int32),
            pos=pos.astype(jnp.float32),
            time=jnp.zeros((), dtype=jnp.int32),
            label_inverted=label_inverted.astype(jnp.bool_),
        )

    @staticmethod
    def move(
        state: ImagePerceptionState, action: jax.Array, params: ImagePerceptionParams
    ) -> tuple[ImagePerceptionState, jax.Array, jax.Array]:
        """Returns (new_state, base_reward, terminated). module.py:203-212."""
        step = jnp.asarray(params.max_step_length, dtype=jnp.float32) * project_sphere(
            action
        )
        pos = jnp.clip(state.pos + step, -1.0, 1.0)
        base_reward = -jnp.linalg.norm(action, axis=-1) * 1e-3
        time = state.time + 1
        terminated = time >= params.step_limit
        return state.replace(pos=pos, time=time), base_reward, terminated

    @staticmethod
    def resolved_glimpse_window(params: ImagePerceptionParams) -> str:
        """params.glimpse_window with "auto" resolved to the measured
        winner: "off" on every geometry tested (the isolated-op win
        reverses end-to-end; see the field comment / PERF.md round 5)."""
        if params.glimpse_window != "auto":
            return params.glimpse_window
        return "off"

    @staticmethod
    def get_glimpse(
        state: ImagePerceptionState, pos: jax.Array, params: ImagePerceptionParams
    ) -> jax.Array:
        return extract_glimpse(
            ImagePerceptionEngine.image_raw(state, params),
            pos,
            params.sensor_size,
            params.sensor_scale,
            precision=params.glimpse_precision,
            window=ImagePerceptionEngine.resolved_glimpse_window(params),
        )

    @staticmethod
    def observe(
        state: ImagePerceptionState, params: ImagePerceptionParams
    ) -> dict[str, jax.Array]:
        obs = {
            "glimpse": ImagePerceptionEngine.get_glimpse(state, state.pos, params),
            "glimpse_pos": state.pos.astype(jnp.float32),
            "time_step": (
                state.time.astype(jnp.float32) / params.step_limit * 2.0 - 1.0
            ),
        }
        if params.randomly_invert_labels:
            obs["inverted_label"] = jnp.where(
                state.time > 0, 2, state.label_inverted.astype(jnp.int32)
            )
        return obs

    @staticmethod
    def info(state: ImagePerceptionState) -> dict[str, jax.Array]:
        return {"index": state.data_index}

    # ------------------------------------------------------------------
    # Unique-target sampling (image_localization reset targets,
    # module.py:253-292): a grid of candidate positions, pairwise-MSE
    # uniqueness score over their glimpses, uniform pick among top-k, jitter.
    # ------------------------------------------------------------------
    @staticmethod
    def _candidate_axes_np(params: ImagePerceptionParams):
        """Host-side generating axes of the candidate grid (xs (c0,),
        ys (c1,), max_cell (2,)) — the single source of the grid geometry
        (module.py:253-270 cell-size rules); candidate_grid() and
        candidate_axes() are both derived from it."""
        import numpy as np

        h, w, _ = params.dataset.image_shape
        s0, s1 = params.sensor_size
        eff = np.array([s0, s1]) * params.sensor_scale
        lim = np.array(
            [(w - 1) / 2 - (eff[0] - 1) / 2, (h - 1) / 2 - (eff[1] - 1) / 2]
        )
        sensor_size_norm = eff / lim
        max_cell = sensor_size_norm * params.unique_sampling_max_grid_cell_size_rel
        counts = np.ceil(2.0 / max_cell).astype(int)
        return (
            np.linspace(-1, 1, counts[0]),
            np.linspace(-1, 1, counts[1]),
            max_cell,
        )

    @staticmethod
    def candidate_grid(params: ImagePerceptionParams) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Static (P, 2) candidate positions and (2,) max cell size;
        position k = i*c1 + j is (xs[i], ys[j]) of candidate_axes."""
        import numpy as np

        xs, ys, max_cell = ImagePerceptionEngine._candidate_axes_np(params)
        grid = np.stack(np.meshgrid(xs, ys, indexing="ij"), axis=-1).reshape(-1, 2)
        return jnp.asarray(grid, dtype=jnp.float32), jnp.asarray(
            max_cell, dtype=jnp.float32
        )

    @staticmethod
    def candidate_axes(params: ImagePerceptionParams) -> tuple[jnp.ndarray, jnp.ndarray]:
        """The candidate grid's generating axes: (xs (c0,), ys (c1,)) f32,
        such that candidate_grid()[0][i*c1 + j] == (xs[i], ys[j]) exactly
        (both derive from _candidate_axes_np, same f32 cast)."""
        xs, ys, _ = ImagePerceptionEngine._candidate_axes_np(params)
        return jnp.asarray(xs, dtype=jnp.float32), jnp.asarray(ys, dtype=jnp.float32)

    @staticmethod
    def _candidate_flat_chunked(
        state: ImagePerceptionState, params: ImagePerceptionParams
    ) -> jnp.ndarray:
        """(P, s0*s1*C) candidate glimpses by per-candidate extraction in
        sequential lax.map chunks: the per-candidate intermediate is
        (P, s0, W, C) per env — 23 GB at 4096 envs on TinyImageNet — while
        the flat result is small; chunks bound live memory."""
        candidates, _ = ImagePerceptionEngine.candidate_grid(params)
        p = candidates.shape[0]
        chunk = 27
        pad = (-p) % chunk
        cands = jnp.concatenate(
            [candidates, jnp.zeros((pad, 2), candidates.dtype)]
        ).reshape(-1, chunk, 2)

        def chunk_glimpses(c):
            g = jax.vmap(
                lambda pos: ImagePerceptionEngine.get_glimpse(state, pos, params)
            )(c)
            return g.reshape(chunk, -1)

        return jax.lax.map(chunk_glimpses, cands).reshape(p + pad, -1)[:p]

    @staticmethod
    def _cartesian_factors(
        state: ImagePerceptionState, params: ImagePerceptionParams
    ):
        """Shared factorization behind the cartesian candidate sweeps:
        glimpse rows depend only on the candidate's y, columns only on its
        x (apx.ops.glimpse coordinate conventions), so the row GEMM runs
        once per unique y and is reused across every x-column. Returns
        (tmp (c1, s0, W, C) row-contracted intermediate, w_cols
        (c0, s1, W) column weights, prec). Coordinate/weight math mirrors
        glimpse_coords/extract_glimpse op-for-op (module.py:294-331
        conventions)."""
        from ..ops.glimpse import PRECISIONS, interp_weights, sensor_pos_lim_pixels

        image = ImagePerceptionEngine.image_raw(state, params)
        h, w, ch = image.shape
        s0, s1 = params.sensor_size
        xs, ys = ImagePerceptionEngine.candidate_axes(params)
        lim = sensor_pos_lim_pixels((h, w), params.sensor_size, params.sensor_scale)
        x_pix = xs * lim[0] + (w - 1) / 2.0  # (c0,)
        y_pix = ys * lim[1] + (h - 1) / 2.0  # (c1,)
        off0 = (
            jnp.arange(s0, dtype=jnp.float32) - (s0 - 1) / 2.0
        ) * params.sensor_scale
        off1 = (
            jnp.arange(s1, dtype=jnp.float32) - (s1 - 1) / 2.0
        ) * params.sensor_scale
        rows = y_pix[:, None] + off0[None, :]  # (c1, s0)
        cols = x_pix[:, None] + off1[None, :]  # (c0, s1)
        w_rows = jax.vmap(lambda r: interp_weights(r, h))(rows)  # (c1, s0, H)
        w_cols = jax.vmap(lambda c: interp_weights(c, w))(cols)  # (c0, s1, W)
        img_f = image.astype(jnp.float32)
        if image.dtype == jnp.uint8:
            img_f = img_f / 255.0
        prec = PRECISIONS[params.glimpse_precision]
        tmp = jax.vmap(
            lambda wr: jnp.einsum("sh,hwc->swc", wr, img_f, precision=prec)
        )(w_rows)  # (c1, s0, W, C)
        return tmp, w_cols, prec

    @staticmethod
    def _column_block(tmp, wc, prec) -> jnp.ndarray:
        """One x-column of candidate glimpses from the cartesian factors:
        (c1, s0*s1*C) flat block for column weights wc (s1, W)."""
        g = jax.vmap(
            lambda t: jnp.einsum("swc,tw->stc", t, wc, precision=prec)
        )(tmp)  # (c1, s0, s1, C)
        return jnp.clip(g, 0.0, 1.0).reshape(g.shape[0], -1)

    @staticmethod
    def _candidate_flat_cartesian(
        state: ImagePerceptionState, params: ImagePerceptionParams
    ) -> jnp.ndarray:
        """(P, s0*s1*C) candidate glimpses via _cartesian_factors.
        Work: c1*s0*H*W*C + P*s0*s1*W*C MACs vs P*s0*(H+s1)*W*C for
        per-candidate extraction (~6x less on TinyImageNet geometry), with
        a (c1, s0, W, C) intermediate — small enough to skip chunking."""
        tmp, w_cols, prec = ImagePerceptionEngine._cartesian_factors(state, params)
        out = jax.vmap(
            lambda wc: ImagePerceptionEngine._column_block(tmp, wc, prec)
        )(w_cols)  # (c0, c1, d)
        # candidate_grid ordering: index k = i*c1 + j.
        return out.reshape(-1, out.shape[-1])

    @staticmethod
    def unique_target_top_k(
        state: ImagePerceptionState, params: ImagePerceptionParams
    ) -> jnp.ndarray:
        """(top_k,) candidate indices ranked by uniqueness. The pairwise MSE
        score is a Gram-matrix computation that runs on the MXU:
        mse(a,b) = (|a|^2 + |b|^2 - 2 a.b) / d. Ranking mirrors the
        reference's argsort(-uniqueness) (module.py:276-278)."""
        backend = params.unique_sampling_backend
        if backend in ("auto", "cartesian"):
            flat = ImagePerceptionEngine._candidate_flat_cartesian(state, params)
            uniqueness = ImagePerceptionEngine._min_pairwise_mse(flat)
        elif backend == "chunked":
            flat = ImagePerceptionEngine._candidate_flat_chunked(state, params)
            uniqueness = ImagePerceptionEngine._min_pairwise_mse(flat)
        elif backend == "streamed":
            uniqueness = ImagePerceptionEngine._unique_scores_streamed(state, params)
        else:
            raise ValueError(
                f"unknown unique_sampling_backend {backend!r}; "
                "expected 'auto', 'cartesian', 'chunked' or 'streamed'"
            )
        return jnp.argsort(-uniqueness)[: params.unique_sampling_top_k]

    @staticmethod
    def _unique_scores_streamed(
        state: ImagePerceptionState, params: ImagePerceptionParams
    ) -> jnp.ndarray:
        """(P,) uniqueness WITHOUT materializing the (P, d) candidate
        buffer: x-column glimpse blocks are recomputed on the fly from the
        cartesian factors, so peak memory is the (c1, s0, W, C) row
        intermediate + two (c1, d) blocks (~3x smaller than the flat
        buffer on TinyImageNet geometry — the buffer was the 875 KB/env
        floor that kept TinyImageNetLoc from constructing at N=16384,
        PERF.md batch-scaling). Cost: each block's column GEMM is
        recomputed c0 times (~3x the sweep MACs — explicit reset only;
        autoresets sample targets uniformly and never run the sweep).
        min/mask/scale math matches _min_pairwise_mse; scores agree to
        matmul-tiling rounding (measured <=5e-7 absolute on CircleSquare
        geometry, both backends within 5e-7 of a float64 oracle —
        test_streamed_backend_matches_cartesian)."""
        tmp, w_cols, prec = ImagePerceptionEngine._cartesian_factors(state, params)
        c0 = w_cols.shape[0]
        c1 = tmp.shape[0]

        def block(wc):
            return ImagePerceptionEngine._column_block(tmp, wc, prec)

        # d = s0*s1*C, known statically from the factor shapes — computing a
        # real column block just to read its width would run a full einsum
        # in the eager path.
        d = tmp.shape[1] * w_cols.shape[1] * tmp.shape[-1]
        sq = jax.lax.map(lambda wc: jnp.sum(block(wc) ** 2, axis=-1), w_cols)
        eye = jnp.eye(c1, dtype=bool)

        def outer(args):
            i, wc = args
            fb = block(wc)  # (c1, d)

            def inner(run_min, inner_args):
                j, wc2 = inner_args
                g = fb @ block(wc2).T  # (c1, c1)
                mse = (sq[i][:, None] + sq[j][None, :] - 2.0 * g) / d
                mse = jnp.where((i == j) & eye, jnp.inf, mse)
                return jnp.minimum(run_min, jnp.min(mse, axis=-1)), None

            m, _ = jax.lax.scan(
                inner,
                jnp.full((c1,), jnp.inf, sq.dtype),
                (jnp.arange(c0), w_cols),
            )
            return m

        u = jax.lax.map(outer, (jnp.arange(c0), w_cols))  # (c0, c1)
        return u.reshape(-1)  # candidate_grid ordering k = i*c1 + j

    @staticmethod
    def _min_pairwise_mse(flat: jnp.ndarray) -> jnp.ndarray:
        """(P,) min over j != i of mse(flat_i, flat_j), Gram rows computed
        in sequential row BLOCKS with a running min: the full (P, P) Gram is
        2.1 MB/env on TinyImageNet geometry and was the OOM cliff that
        capped the env batch at 4096 (an explicit reset at N=8192 needed
        ~26 GB); blockwise, peak is P_BLOCK*P + the (P, d) glimpses.
        min is exact, so the result equals the dense form's."""
        p, d = flat.shape
        pb = min(p, 128)
        pad = (-p) % pb
        flat_p = jnp.concatenate([flat, jnp.zeros((pad, d), flat.dtype)])
        sq = jnp.sum(flat * flat, axis=-1)
        sq_p = jnp.concatenate([sq, jnp.zeros((pad,), sq.dtype)])
        idx_p = jnp.arange(p + pad)
        col = jnp.arange(p)

        def block_min(args):
            fb, sqb, ib = args  # (pb, d), (pb,), (pb,)
            g = fb @ flat.T  # (pb, P)
            diff = (sqb[:, None] + sq[None, :] - 2.0 * g) / d
            diff = jnp.where(ib[:, None] == col[None, :], jnp.inf, diff)
            return jnp.min(diff, axis=-1)

        u = jax.lax.map(
            block_min,
            (
                flat_p.reshape(-1, pb, d),
                sq_p.reshape(-1, pb),
                idx_p.reshape(-1, pb),
            ),
        )
        return u.reshape(p + pad)[:p]

    @staticmethod
    def unique_target_from_draws(
        state: ImagePerceptionState,
        sel: jax.Array,
        jitter: jax.Array,
        params: ImagePerceptionParams,
    ) -> jax.Array:
        """Resolve a unique-target draw (selection index + jitter) into a
        position — the device half of module.py:278-292; the rng half lives
        with the caller (jax key or host shim)."""
        candidates, _ = ImagePerceptionEngine.candidate_grid(params)
        top_idx = ImagePerceptionEngine.unique_target_top_k(state, params)
        base = candidates[top_idx[sel]]
        return jnp.clip(base + jitter, -1.0, 1.0).astype(jnp.float32)

    @staticmethod
    def sample_unique_glimpse_position(
        key: jax.Array, state: ImagePerceptionState, params: ImagePerceptionParams
    ) -> jax.Array:
        _, max_cell = ImagePerceptionEngine.candidate_grid(params)
        k_sel, k_jit = jax.random.split(key)
        sel = jax.random.randint(k_sel, (), 0, params.unique_sampling_top_k)
        jitter = jax.random.uniform(k_jit, (2,), minval=-max_cell, maxval=max_cell)
        return ImagePerceptionEngine.unique_target_from_draws(
            state, sel, jitter, params
        )
