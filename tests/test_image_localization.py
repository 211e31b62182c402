"""Image localization env semantics (target glimpse, autoreset target rules,
unique-target sampler)."""

import jax
import jax.numpy as jnp
import numpy as np

from apx.core import AutoResetMode, vmap_vector_env
from apx.data import make_circle_square_bank
from apx.envs import ImageLocalizationEnv
from apx.envs.image_perception import ImagePerceptionEngine
from apx.ops.glimpse import extract_glimpse


def make(n=4, step_limit=4):
    ds = make_circle_square_bank((28, 28))
    env = ImageLocalizationEnv(dataset=ds, step_limit=step_limit)
    params = env.default_params()
    venv = vmap_vector_env(env, n, AutoResetMode.LOCKSTEP)
    return env, params, venv


def test_obs_contains_target_glimpse():
    env, params, venv = make()
    key = jax.random.PRNGKey(0)
    obs, state, info = venv.reset(key, params)
    assert obs["target_glimpse"].shape == (4, 5, 5, 1)
    # target_glimpse must equal a direct extraction at the stored target
    for i in range(4):
        expected = extract_glimpse(
            state.inner.perception.image[i],
            state.inner.target[i],
            (5, 5),
            1.0,
        )
        np.testing.assert_allclose(
            np.asarray(obs["target_glimpse"])[i], np.asarray(expected), atol=1e-6
        )


def test_loss_is_mse_to_target():
    env, params, venv = make()
    key = jax.random.PRNGKey(1)
    obs, state, _ = venv.reset(key, params)
    target = np.asarray(state.inner.target)
    pred = jnp.asarray(target + 0.1)
    act = {"action": jnp.zeros((4, 2)), "prediction": pred}
    obs, state2, reward, term, trunc, info = venv.step(key, state, act, params)
    # normalized MSE: mean(0.1^2) * 3
    np.testing.assert_allclose(
        np.asarray(info["prediction"]["loss"]), 0.01 * 3.0, rtol=1e-4
    )
    # target unchanged during the episode
    np.testing.assert_array_equal(np.asarray(state2.inner.target), target)


def test_autoreset_uses_old_target_for_loss_and_resamples_uniform():
    env, params, venv = make(n=2, step_limit=1)
    key = jax.random.PRNGKey(2)
    obs, state, _ = venv.reset(key, params)
    old_target = np.asarray(state.inner.target)
    act = {"action": jnp.zeros((2, 2)), "prediction": jnp.zeros((2, 2))}
    ks = jax.random.split(key, 3)
    obs, state, r1, term1, _, _ = venv.step(ks[0], state, act, params)
    assert np.all(np.asarray(term1))
    # reset step: loss target is the OLD episode's target
    obs, state, r2, term2, _, info2 = venv.step(ks[1], state, act, params)
    np.testing.assert_allclose(
        np.asarray(info2["prediction"]["target"]), old_target, atol=1e-6
    )
    assert not np.any(np.asarray(term2))
    # and the new target was drawn (with overwhelming probability differs)
    assert not np.allclose(np.asarray(state.inner.target), old_target)


def test_candidate_sweep_backends_agree():
    """The cartesian-factorized candidate sweep (the "auto" default) must
    reproduce the chunked per-candidate extraction: same glimpses up to
    einsum reduction-order drift (~1e-6), same top-k ranking."""
    env, params, venv = make(n=3)
    assert params.unique_sampling_backend == "auto"
    key = jax.random.PRNGKey(9)
    _, state, _ = venv.reset(key, params)
    for i in range(3):
        perc = jax.tree_util.tree_map(lambda x: x[i], state.inner.perception)
        a = ImagePerceptionEngine._candidate_flat_chunked(perc, params)
        b = ImagePerceptionEngine._candidate_flat_cartesian(perc, params)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        ka = ImagePerceptionEngine.unique_target_top_k(perc, params)
        kb = ImagePerceptionEngine.unique_target_top_k(
            perc, params.replace(unique_sampling_backend="chunked")
        )
        np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))


def test_streamed_backend_matches_cartesian():
    """The streamed sweep (no (P, d) buffer — the N=16384 TinyImageNetLoc
    enabler) must reproduce the cartesian backend's uniqueness scores up to
    matmul-tiling rounding, the full ranking on tie-free images, and drive
    a jitted vectorized reset."""
    env, params, venv = make(n=3)
    key = jax.random.PRNGKey(21)
    _, state, _ = venv.reset(key, params)
    for i in range(3):
        perc = jax.tree_util.tree_map(lambda x: x[i], state.inner.perception)
        dense = ImagePerceptionEngine._min_pairwise_mse(
            ImagePerceptionEngine._candidate_flat_cartesian(perc, params)
        )
        streamed = ImagePerceptionEngine._unique_scores_streamed(perc, params)
        assert dense.shape == streamed.shape
        # CircleSquare backgrounds are flat, so near-duplicate candidates
        # sit at MSE ~1e-5 where f32 cancellation noise (~5e-7, equal
        # distance from the f64 oracle for BOTH backends) is relative-large.
        np.testing.assert_allclose(
            np.asarray(streamed), np.asarray(dense), atol=2e-6
        )
        # Tie-free image: score gaps dwarf the rounding, so the ranking and
        # therefore the top-k selection must match exactly.
        rich = perc.replace(
            image=jax.random.uniform(jax.random.PRNGKey(100 + i), perc.image.shape)
        )
        np.testing.assert_array_equal(
            np.asarray(ImagePerceptionEngine.unique_target_top_k(rich, params)),
            np.asarray(
                ImagePerceptionEngine.unique_target_top_k(
                    rich, params.replace(unique_sampling_backend="streamed")
                )
            ),
        )
    # End-to-end: jitted vectorized reset under the streamed backend.
    sp = params.replace(unique_sampling_backend="streamed")
    obs_s, state_s, _ = jax.jit(venv.reset)(key, sp)
    t = np.asarray(state_s.inner.target)
    assert t.shape == (3, 2) and (np.abs(t) <= 1).all()
    assert np.isfinite(np.asarray(obs_s["target_glimpse"])).all()


def test_unique_sampler_prefers_distinct_glimpses():
    """The sampler must replicate the reference scoring: pairwise MSE over
    candidate glimpses, pick among the top-k most unique
    (image_perception_module.py:253-292). We verify the score computation
    against a direct numpy transliteration."""
    env, params, venv = make(n=1)
    key = jax.random.PRNGKey(3)
    obs, state, _ = venv.reset(key, params)
    perc = jax.tree_util.tree_map(lambda x: x[0], state.inner.perception)

    candidates, max_cell = ImagePerceptionEngine.candidate_grid(params)
    cand = np.asarray(candidates)
    img = np.asarray(perc.image)
    gl = np.stack(
        [np.asarray(extract_glimpse(img, c, (5, 5), 1.0)) for c in cand]
    ).reshape(len(cand), -1)
    diff = np.mean((gl[:, None] - gl[None, :]) ** 2, axis=-1)
    np.fill_diagonal(diff, np.inf)
    uniq_ref = diff.min(axis=-1)
    top_ref = set(np.argsort(-uniq_ref)[:10])

    # Run the device sampler many times; every draw must land near a top-k
    # candidate (within the jitter radius).
    for s in range(5):
        pos = ImagePerceptionEngine.sample_unique_glimpse_position(
            jax.random.PRNGKey(s), perc, params
        )
        pos = np.asarray(pos)
        d = np.abs(cand[list(top_ref)] - pos)
        ok = (d <= np.asarray(max_cell) + 1e-5).all(axis=-1).any()
        # jitter can push past clip boundary; allow clipped coords
        assert ok or np.any(np.abs(pos) >= 1.0 - 1e-6)


def test_blockwise_uniqueness_matches_dense():
    """The blockwise Gram-min (the OOM-cliff fix for large env batches)
    equals the dense pairwise-MSE min."""
    rng = np.random.default_rng(7)
    for p, d in ((729, 300), (5, 8), (130, 16)):
        flat = jnp.asarray(rng.random((p, d)).astype(np.float32))
        u = ImagePerceptionEngine._min_pairwise_mse(flat)
        f = np.asarray(flat)
        diff = np.mean((f[:, None] - f[None, :]) ** 2, axis=-1)
        np.fill_diagonal(diff, np.inf)
        np.testing.assert_allclose(
            np.asarray(u), diff.min(axis=-1), rtol=1e-5, atol=1e-7
        )
