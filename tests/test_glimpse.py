"""Glimpse kernel parity vs scipy RegularGridInterpolator (the reference's
interpolation backend, image_perception_module.py:154-157, 294-331)."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.interpolate import RegularGridInterpolator

from apx.ops.glimpse import extract_glimpse, extract_glimpse_batch


def reference_glimpse(img, pos_norm, sensor_size, sensor_scale):
    """Direct transliteration of the reference math for testing only."""
    h, w, _ = img.shape
    coords_y = np.arange(h) - (h - 1) / 2
    coords_x = np.arange(w) - (w - 1) / 2
    interp = RegularGridInterpolator((coords_y, coords_x), img, method="linear")
    eff = np.array(sensor_size) * sensor_scale
    lim = (np.array([w, h]) - 1) / 2 - (eff - 1) / 2
    offsets = np.meshgrid(
        (np.arange(sensor_size[0]) - (sensor_size[0] - 1) / 2) * sensor_scale,
        (np.arange(sensor_size[1]) - (sensor_size[1] - 1) / 2) * sensor_scale,
        indexing="ij",
    )
    pts = np.flip(pos_norm * lim, axis=-1)[None, None, :] + np.stack(offsets, axis=-1)
    return interp(pts).clip(0, 1).astype(np.float32)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize(
    "shape,sensor,scale",
    [((28, 28, 1), (5, 5), 1.0), ((32, 32, 3), (5, 5), 1.0), ((64, 64, 3), (10, 10), 1.0), ((28, 28, 1), (5, 5), 2.0)],
)
def test_glimpse_matches_scipy(seed, shape, sensor, scale):
    rng = np.random.default_rng(seed)
    img = rng.random(shape).astype(np.float32)
    pos = rng.uniform(-1, 1, 2)
    ref = reference_glimpse(img.astype(np.float64), pos, sensor, scale)
    ours = np.asarray(extract_glimpse(img, pos.astype(np.float32), sensor, scale))
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_glimpse_corners_exact():
    """pos = ±1 must keep the effective sensor fully inside the image and
    sample exact pixels when scale=1 (module.py:419-423)."""
    rng = np.random.default_rng(0)
    img = rng.random((28, 28, 1)).astype(np.float32)
    for pos in [(-1.0, -1.0), (1.0, 1.0), (-1.0, 1.0), (1.0, -1.0)]:
        ours = np.asarray(extract_glimpse(img, np.array(pos, np.float32), (5, 5), 1.0))
        x0 = 0 if pos[0] < 0 else 23
        y0 = 0 if pos[1] < 0 else 23
        np.testing.assert_allclose(
            ours[..., 0], img[y0 : y0 + 5, x0 : x0 + 5, 0], atol=1e-6
        )


def test_glimpse_batch():
    rng = np.random.default_rng(1)
    imgs = rng.random((16, 28, 28, 1)).astype(np.float32)
    pos = rng.uniform(-1, 1, (16, 2)).astype(np.float32)
    out = np.asarray(extract_glimpse_batch(imgs, pos, (5, 5), 1.0))
    assert out.shape == (16, 5, 5, 1)
    for i in range(16):
        ref = reference_glimpse(imgs[i].astype(np.float64), pos[i], (5, 5), 1.0)
        np.testing.assert_allclose(out[i], ref, atol=2e-6)


def test_bank_matches_reference_dataset():
    from conftest import load_reference_ap_gym

    ap_gym = load_reference_ap_gym()
    if ap_gym is None:
        pytest.skip("reference unavailable")
    from ap_gym.envs.image import CircleSquareDataset

    from apx.data import make_circle_square_bank

    ref_ds = CircleSquareDataset(image_shape=(15, 15))
    bank = make_circle_square_bank((15, 15))
    assert bank.length == len(ref_ds)
    idx = np.random.default_rng(0).integers(0, len(ref_ds), 32)
    ref_imgs, ref_labels = ref_ds.get_data_point_batch(idx)
    np.testing.assert_array_equal(np.asarray(bank.labels)[idx], ref_labels)
    np.testing.assert_allclose(
        np.asarray(bank.images)[idx], ref_imgs.astype(np.float32), atol=1e-7
    )


def test_double_circle_square_matches_reference():
    from conftest import load_reference_ap_gym

    ap_gym = load_reference_ap_gym()
    if ap_gym is None:
        pytest.skip("reference unavailable")
    from ap_gym.envs.image import DoubleCircleSquareDataset as RefDS

    from apx.data import DoubleCircleSquareDataset

    ref = RefDS(image_shape=(15, 15))
    ours = DoubleCircleSquareDataset.create(image_shape=(15, 15))
    assert ours.length == len(ref)
    idx = np.random.default_rng(0).integers(0, len(ref), 16)
    ref_imgs, ref_labels = ref.get_data_point_batch(idx)
    import jax

    imgs, labels = jax.vmap(ours.fetch)(np.asarray(idx))
    np.testing.assert_array_equal(np.asarray(labels), ref_labels)
    np.testing.assert_allclose(np.asarray(imgs), ref_imgs.astype(np.float32), atol=1e-6)


def test_uint8_bank_glimpse_matches_f32():
    """uint8 HBM banks with /255-on-read must produce exactly the glimpses
    of the eager f32/255 conversion (the reference's ingestion rule)."""
    rng = np.random.default_rng(0)
    img_u8 = rng.integers(0, 256, size=(12, 14, 3), dtype=np.uint8)
    img_f32 = img_u8.astype(np.float32) / 255.0
    pos = jnp.array([0.3, -0.4])
    g_u8 = extract_glimpse(jnp.asarray(img_u8), pos, (5, 5), 1.0)
    g_f32 = extract_glimpse(jnp.asarray(img_f32), pos, (5, 5), 1.0)
    # XLA may fold the /255 into the matmul (sum(w*x)/255 vs sum(w*x/255)),
    # which reorders one f32 rounding -> up to 1 ulp.
    np.testing.assert_allclose(
        np.asarray(g_u8), np.asarray(g_f32), atol=1.2e-7, rtol=0
    )


def test_glimpse_study_tap2_matches_gemm():
    """The glimpse_study's measured-slower tap2 variant is semantically the
    same bilinear (<= 1e-5 of the GEMM on random + boundary positions) —
    pins the study's correctness claim on CPU."""
    import jax

    from apx.ops.glimpse_study import tap2_glimpse

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8))
    pos = jnp.concatenate(
        [
            jax.random.uniform(jax.random.PRNGKey(4), (4, 2), minval=-1, maxval=1),
            jnp.array([[1.0, 1.0], [-1.0, -1.0], [0.0, 1.0], [1.0, -1.0]]),
        ]
    )
    ref = jax.vmap(lambda i, p: extract_glimpse(i, p, (10, 10), 1.0))(img, pos)
    tap = jax.vmap(tap2_glimpse)(img, pos)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(tap), atol=1e-5)


def test_lane_major_pallas_kernel_matches_gemm():
    """The lane-major Pallas study kernel (glimpse_pallas — measured at
    parity-or-worse vs XLA, kept as the end of the design space) is
    semantically exact: interpret mode vs the GEMM on random + boundary
    positions."""
    import jax

    from apx.ops.glimpse_pallas import glimpse_batch_lane_major

    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.integers(0, 256, (128, 32, 32, 3), dtype=np.uint8))
    pos = jnp.concatenate(
        [
            jax.random.uniform(jax.random.PRNGKey(6), (124, 2), minval=-1, maxval=1),
            jnp.array([[1.0, 1.0], [-1.0, -1.0], [0.0, 1.0], [1.0, -1.0]]),
        ]
    )
    from apx.ops.glimpse import extract_glimpse_batch

    ref = extract_glimpse_batch(imgs, pos, (5, 5), 1.0)
    got = glimpse_batch_lane_major(imgs, pos, (5, 5), 1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)


def test_row_window_bitwise_identical():
    """window="rows" excludes only exact-0-weight hat terms, so it must be
    BITWISE equal to the full einsum — random + edge positions, square and
    non-square scaled sensors, both image dtypes. (The committed A/B: it
    wins isolated but loses 2.4x end-to-end in the env scan; the env
    default resolves to "off" — PERF.md round 5.)"""
    import jax

    rng = np.random.default_rng(11)
    for shape, sensor, scale in (
        ((64, 64, 3), (10, 10), 1.0),
        ((28, 28, 1), (5, 5), 1.0),
        ((33, 47, 3), (4, 7), 2.5),
    ):
        imgs = jnp.asarray(rng.integers(0, 256, (64, *shape), dtype=np.uint8))
        pos = jnp.concatenate(
            [
                jax.random.uniform(
                    jax.random.PRNGKey(12), (60, 2), minval=-1, maxval=1
                ),
                jnp.array([[1.0, 1.0], [-1.0, -1.0], [-1.0, 1.0], [0.0, 0.0]]),
            ]
        )
        full = extract_glimpse_batch(imgs, pos, sensor, scale, window="off")
        rows = extract_glimpse_batch(imgs, pos, sensor, scale, window="rows")
        np.testing.assert_array_equal(np.asarray(full), np.asarray(rows))
        f32 = imgs.astype(jnp.float32) / 255.0
        full = extract_glimpse_batch(f32, pos, sensor, scale, window="off")
        rows = extract_glimpse_batch(f32, pos, sensor, scale, window="rows")
        np.testing.assert_array_equal(np.asarray(full), np.asarray(rows))
