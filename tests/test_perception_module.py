"""Golden parity: apx's host ImagePerceptionModule vs the reference module.

Drives apx.compat.perception_module.ImagePerceptionModule DIRECTLY against
the reference's ImagePerceptionModule (image_perception_module.py:42-477)
under shared seeds and identical action streams, asserting:
  * glimpse pixels bitwise (_bilinear_batch vs the per-env scipy
    RegularGridInterpolator loop),
  * all other observation channels, rewards, terminations and infos,
  * the visitation counts and prediction-quality canvases,
  * a composited render frame,
  * sample_unique_glimpse_positions and the NaN / partial-reset guards.
"""

from __future__ import annotations

import numpy as np
import pytest
from conftest import load_reference_ap_gym

import jax  # noqa: F401  (conftest pins the cpu backend)


def _make_pair(num_envs=3, seed=1234, **cfg_kwargs):
    ref = load_reference_ap_gym()
    if ref is None:
        pytest.skip("reference ap_gym unavailable")
    from ap_gym.envs.image.circle_square_dataset import (
        CircleSquareDataset as RefDataset,
    )
    from ap_gym.envs.image.image_perception_module import (
        ImagePerceptionConfig as RefConfig,
        ImagePerceptionModule as RefModule,
    )

    from apx.compat.dataset_classes import CircleSquareDataset
    from apx.compat.perception_module import (
        ImagePerceptionConfig,
        ImagePerceptionModule,
    )

    base = dict(prefetch=False, **cfg_kwargs)
    ours = ImagePerceptionModule(
        num_envs, ImagePerceptionConfig(dataset=CircleSquareDataset(), **base)
    )
    theirs = RefModule(num_envs, RefConfig(dataset=RefDataset(), **base))
    ours.seed(seed)
    theirs.seed(seed)
    return ours, theirs


def _ref_canvases(ref_module):
    cls = "_ImagePerceptionModule"
    return (
        getattr(ref_module, f"{cls}__visitation_counts"),
        getattr(ref_module, f"{cls}__prediction_quality_map"),
    )


def _assert_obs_equal(a, b):
    assert list(a) == list(b)  # same channels, same order
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=f"channel {k}")
        assert np.asarray(a[k]).dtype == np.asarray(b[k]).dtype, k


def test_episode_stream_matches_reference_bitwise():
    """Reset + three full episodes (including the lockstep rollover steps):
    every channel, reward, termination and info index bitwise."""
    ours, theirs = _make_pair()
    obs_a, info_a = ours.reset()
    obs_b, info_b = theirs.reset()
    _assert_obs_equal(obs_a, obs_b)
    np.testing.assert_array_equal(info_a["index"], info_b["index"])
    np.testing.assert_array_equal(ours.current_labels, theirs.current_labels)

    rng = np.random.default_rng(7)
    for t in range(3 * 16 + 5):
        action = rng.uniform(-1.8, 1.8, size=(3, 2))  # exercises project_sphere
        quality = rng.uniform(-0.2, 1.2, size=3)  # exercises the [0, 1] clip
        ra = ours.step(action, quality)
        rb = theirs.step(action, quality)
        _assert_obs_equal(ra[0], rb[0])
        for ours_part, theirs_part, what in zip(ra[1:4], rb[1:4], "r/term/trunc"):
            np.testing.assert_array_equal(ours_part, theirs_part, err_msg=what)
        np.testing.assert_array_equal(ra[4]["index"], rb[4]["index"])
        va, qa = ours._canvas.counts, ours._canvas.quality
        vb, qb = _ref_canvases(theirs)
        np.testing.assert_array_equal(va, vb, err_msg=f"visitation t={t}")
        np.testing.assert_array_equal(qa, qb, err_msg=f"quality map t={t}")
    ours.close()
    theirs.close()


def test_render_frames_match_reference():
    ours, theirs = _make_pair(num_envs=2)
    ours.reset()
    theirs.reset()
    rng = np.random.default_rng(3)
    for _ in range(4):
        action = rng.uniform(-1, 1, size=(2, 2))
        quality = rng.uniform(0, 1, size=2)
        ours.step(action, quality)
        theirs.step(action, quality)
    np.testing.assert_array_equal(np.asarray(ours.render()), theirs.render())
    # PIL mode too
    fa = ours.render(return_pil_imgs=True)
    fb = theirs.render(return_pil_imgs=True)
    assert [f.size for f in fa] == [f.size for f in fb]
    np.testing.assert_array_equal(np.asarray(fa[0]), np.asarray(fb[0]))
    # Geometry properties the render path exposes.
    assert tuple(ours.render_size) == tuple(theirs.render_size)
    assert ours.render_scaling == theirs.render_scaling
    assert ours.glimpse_border_width == theirs.glimpse_border_width
    ours.close()
    theirs.close()


def test_unique_positions_and_coords_match_reference():
    ours, theirs = _make_pair(num_envs=2, seed=99)
    ours.reset()
    theirs.reset()
    np.testing.assert_array_equal(
        ours.sample_unique_glimpse_positions(),
        theirs.sample_unique_glimpse_positions(),
    )
    pts = np.random.default_rng(0).uniform(-1, 1, (2, 2))
    np.testing.assert_array_equal(
        ours.denormalize_coords(pts), theirs.denormalize_coords(pts)
    )
    np.testing.assert_array_equal(
        ours.to_render_coords(pts), theirs.to_render_coords(pts)
    )
    np.testing.assert_array_equal(
        ours.sensor_pos_lim_pixels, theirs.sensor_pos_lim_pixels
    )
    np.testing.assert_array_equal(ours.current_sensor_pos, theirs.current_sensor_pos)
    ours.close()
    theirs.close()


def test_inverted_labels_match_reference():
    ours, theirs = _make_pair(num_envs=4, seed=5, randomly_invert_labels=True)
    obs_a, _ = ours.reset()
    obs_b, _ = theirs.reset()
    assert "inverted_label" in obs_a
    _assert_obs_equal(obs_a, obs_b)
    np.testing.assert_array_equal(ours.current_labels, theirs.current_labels)
    ra = ours.step(np.zeros((4, 2)), np.zeros(4))
    rb = theirs.step(np.zeros((4, 2)), np.zeros(4))
    _assert_obs_equal(ra[0], rb[0])
    assert (ra[0]["inverted_label"] == 2).all()  # sentinel after t=0
    ours.close()
    theirs.close()


def test_nonsquare_scaled_sensor_matches_reference():
    """Non-square sensor + sensor_scale != 1: exercises the flipped stamp
    vs unflipped box-extent quirk the reference carries (module.py:342-344
    vs :219-234) and the scaled sensing grid."""
    ours, theirs = _make_pair(
        num_envs=2, seed=77, sensor_size=(3, 5), sensor_scale=2.0
    )
    obs_a, _ = ours.reset()
    obs_b, _ = theirs.reset()
    _assert_obs_equal(obs_a, obs_b)
    assert obs_a["glimpse"].shape == (2, 3, 5, 1)
    rng = np.random.default_rng(1)
    for _ in range(6):
        action = rng.uniform(-1, 1, size=(2, 2))
        quality = rng.uniform(0, 1, size=2)
        ra = ours.step(action, quality)
        rb = theirs.step(action, quality)
        _assert_obs_equal(ra[0], rb[0])
        np.testing.assert_array_equal(ra[1], rb[1])
    va, qa = ours._canvas.counts, ours._canvas.quality
    vb, qb = _ref_canvases(theirs)
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_array_equal(qa, qb)
    np.testing.assert_array_equal(np.asarray(ours.render()), theirs.render())
    ours.close()
    theirs.close()


def test_guards_match_reference():
    ours, theirs = _make_pair(num_envs=2, seed=11)
    for mod in (ours, theirs):
        mod.reset()
        with pytest.raises(ValueError, match="prediction"):
            mod.step(np.zeros((2, 2)), np.array([np.nan, 0.0]))
        with pytest.raises(ValueError, match="action"):
            mod.step(np.full((2, 2), np.nan), np.zeros(2))
    # Partial reset unsupported (lockstep contract).
    from apx.compat.perception_module import ImagePerceptionModule

    assert isinstance(ours, ImagePerceptionModule)
    ours._rollover = np.array([True, False])
    with pytest.raises(NotImplementedError):
        ours.step(np.zeros((2, 2)), np.zeros(2))
    ours.close()
    theirs.close()


def test_bilinear_batch_matches_scipy():
    """The kernel claim at perception_module.py docstring: _bilinear_batch is
    bitwise-identical to scipy RegularGridInterpolator(method='linear') on
    unit grids — including points exactly on grid nodes and cell edges."""
    from scipy.interpolate import RegularGridInterpolator

    from apx.compat.perception_module import _bilinear_batch

    rng = np.random.default_rng(42)
    n, h, w, c = 4, 13, 9, 3
    images = rng.uniform(0, 1, size=(n, h, w, c)).astype(np.float32)
    grid_y = np.arange(h) - (h - 1) / 2
    grid_x = np.arange(w) - (w - 1) / 2

    pts = rng.uniform(
        [grid_y[0], grid_x[0]], [grid_y[-1], grid_x[-1]], size=(n, 6, 5, 2)
    )
    # Force exact node and half-cell hits into the batch (searchsorted edge
    # cases: on-node points take the LEFT cell with full weight on its
    # upper corner).
    pts[:, 0, 0] = (grid_y[3], grid_x[2])
    pts[:, 0, 1] = (grid_y[0], grid_x[0])
    pts[:, 0, 2] = (grid_y[-1], grid_x[-1])
    pts[:, 0, 3] = (grid_y[4] + 0.5, grid_x[5] + 0.5)

    ours = _bilinear_batch(images, pts)
    assert ours.dtype == np.float64
    for i in range(n):
        rgi = RegularGridInterpolator((grid_y, grid_x), images[i], method="linear")
        np.testing.assert_array_equal(ours[i], rgi(pts[i]), err_msg=f"env {i}")


def test_subclass_may_override_either_obs_name():
    """The reference's reset/step call the internal `_get_obs`; apx's call
    the same shim, so a drop-in subclass overriding EITHER `_get_obs` (the
    reference name) or `observe` (the apx name) is honored."""
    from apx.compat.dataset_classes import CircleSquareDataset
    from apx.compat.perception_module import (
        ImagePerceptionConfig,
        ImagePerceptionModule,
    )

    class ViaRefName(ImagePerceptionModule):
        def _get_obs(self):
            obs = super()._get_obs()
            obs["extra"] = np.ones(3)
            return obs

    class ViaApxName(ImagePerceptionModule):
        def observe(self):
            obs = super().observe()
            obs["extra"] = np.full(3, 2.0)
            return obs

    cfg = ImagePerceptionConfig(dataset=CircleSquareDataset(), prefetch=False)
    for cls, val in ((ViaRefName, 1.0), (ViaApxName, 2.0)):
        m = cls(3, cfg)
        m.seed(0)
        obs, _ = m.reset()
        assert np.all(obs["extra"] == val)
        act = np.zeros((3, 2), np.float32)
        obs, *_ = m.step(act, np.zeros(3))
        assert np.all(obs["extra"] == val)


def test_observation_space_dict_is_stable_object():
    """The reference caches one dict (image_perception_module.py:63,448-449)
    so callers may patch it before building an agent; property access must
    return that same object every time."""
    import gymnasium as gym

    from apx.compat.dataset_classes import CircleSquareDataset
    from apx.compat.perception_module import (
        ImagePerceptionConfig,
        ImagePerceptionModule,
    )

    m = ImagePerceptionModule(
        2, ImagePerceptionConfig(dataset=CircleSquareDataset(), prefetch=False)
    )
    d = m.observation_space_dict
    assert m.observation_space_dict is d
    d["patched"] = gym.spaces.Discrete(7)
    assert "patched" in m.observation_space_dict
