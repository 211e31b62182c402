"""Golden-trajectory parity: apx.compat vs the reference under fixed seeds.

Covers the SURVEY §4(b) strategy: run the reference (importable here —
image envs and LightDark have no shapely dependency) and assert the compat
layer reproduces (obs, reward, terminated, truncated, info) sequences.
Integer/boolean channels must match exactly; float channels to f32
tolerance (the reference interpolates in float64, SURVEY §7 hard-part 2).
"""

import numpy as np
import pytest

from conftest import load_reference_ap_gym

import jax  # noqa: F401  (conftest pins the cpu backend)
import apx.compat as apc


def _cmp(a, b, path, step, env_id):
    if isinstance(a, dict):
        assert set(a) == set(b), (env_id, step, path, set(a), set(b))
        for k in a:
            _cmp(a[k], b[k], f"{path}/{k}", step, env_id)
    elif (isinstance(a, (list, tuple)) and not isinstance(a, np.ndarray)) or (
        isinstance(a, np.ndarray) and a.dtype == object
    ):
        assert len(a) == len(b), (env_id, step, path)
        for j, (x, y) in enumerate(zip(a, b)):
            _cmp(x, y, f"{path}[{j}]", step, env_id)
    else:
        aa = np.asarray(a, np.float64)
        bb = np.asarray(b, np.float64)
        assert aa.shape == bb.shape, (env_id, step, path, aa.shape, bb.shape)
        np.testing.assert_allclose(
            aa, bb, atol=2e-5, rtol=1e-4, equal_nan=True,
            err_msg=f"{env_id} step {step} at {path}",
        )


def _rollout_compare(ref, mine, env_id, steps=40, seed=123, reseed_on_done=False):
    rng = np.random.default_rng(42)
    ro, ri = ref.reset(seed=seed)
    mo, mi = mine.reset(seed=seed)
    _cmp(ro, mo, "obs", -1, env_id)
    _cmp(ri, mi, "info", -1, env_id)
    pred_shape = ref.prediction_space.shape
    for t in range(steps):
        a = {
            "action": rng.uniform(-1, 1, 2).astype(np.float32),
            "prediction": rng.normal(size=pred_shape).astype(np.float32),
        }
        r_obs, r_rew, r_term, r_trunc, r_info = ref.step(a)
        m_obs, m_rew, m_term, m_trunc, m_info = mine.step(a)
        _cmp(r_obs, m_obs, "obs", t, env_id)
        _cmp(np.float64(r_rew), np.float64(m_rew), "reward", t, env_id)
        assert bool(r_term) == bool(m_term), (env_id, t, "terminated")
        assert bool(r_trunc) == bool(m_trunc), (env_id, t, "truncated")
        _cmp(r_info, m_info, "info", t, env_id)
        if reseed_on_done and (r_term or r_trunc):
            ro, _ = ref.reset()
            mo, _ = mine.reset()
            _cmp(ro, mo, "reset-obs", t, env_id)


@pytest.fixture(scope="module")
def ref_ap():
    ap = load_reference_ap_gym()
    if ap is None:
        pytest.skip("reference not importable")
    return ap


@pytest.mark.parametrize(
    "env_id,steps",
    [
        ("CircleSquare-v0", 40),       # spans 2 lockstep autoresets
        ("CircleSquare-s15-v0", 20),
        ("CircleSquare-s20-v0", 20),
        ("CircleSquare-nograd-v0", 20),
        ("CircleSquareInverted-v0", 40),  # inversion draw chain
        ("CircleSquareInverted-s15-nograd-v0", 20),
        ("DoubleCircleSquare-s15-v0", 20),  # on-device image synthesis
        ("DoubleCircleSquare-s20-nograd-v0", 20),
        ("CircleSquare-t32-v0", 36),
        ("CircleSquare-t64-v0", 20),
    ],
    ids=lambda x: x if isinstance(x, str) else "",
)
def test_image_classification_parity(ref_ap, env_id, steps):
    _rollout_compare(ref_ap.make(env_id), apc.make(env_id), env_id, steps=steps)


def test_sparse_parity_vector(ref_ap):
    """Single-env sparse envs are broken in the reference itself
    (SparsifyWrapper.reset KeyErrors on the missing info["prediction"],
    sparsify_wrapper.py:125-132), so sparse parity is checked through the
    vector path, which the reference supports."""
    env_id = "CircleSquare-sparse-v0"
    ref = ref_ap.make_vec(env_id, num_envs=2)
    mine = apc.make_vec(env_id, num_envs=2)
    rng = np.random.default_rng(42)
    ro, ri = ref.reset(seed=123)
    mo, mi = mine.reset(seed=123)
    _cmp(ro, mo, "obs", -1, env_id)
    for t in range(40):
        a = {
            "action": rng.uniform(-1, 1, (2, 2)).astype(np.float32),
            "prediction": rng.normal(size=(2, 2)).astype(np.float32),
        }
        r_obs, r_rew, r_term, r_trunc, r_info = ref.step(a)
        m_obs, m_rew, m_term, m_trunc, m_info = mine.step(a)
        _cmp(r_obs, m_obs, "obs", t, env_id)
        _cmp(r_rew, m_rew, "reward", t, env_id)
        np.testing.assert_array_equal(np.asarray(r_term), np.asarray(m_term))
        _cmp(r_info, m_info, "info", t, env_id)


def test_light_dark_parity(ref_ap):
    _rollout_compare(
        ref_ap.make("LightDark-v0"), apc.make("LightDark-v0"),
        "LightDark-v0", steps=60, reseed_on_done=True,
    )


def test_image_localization_parity(ref_ap):
    """No registered localization env is runnable offline (all HF-backed),
    so build both sides directly on the procedural CircleSquare dataset —
    this exercises the unique-target sampler, the target_glimpse obs, and
    the uniform-resample-on-autoreset path."""
    import ap_gym
    from ap_gym.envs.image import CircleSquareDataset, ImagePerceptionConfig
    from ap_gym.envs.image_localization import ImageLocalizationVectorEnv

    ref_vec = ImageLocalizationVectorEnv(
        1, ImagePerceptionConfig(dataset=CircleSquareDataset((28, 28)), step_limit=16)
    )
    ref = ap_gym.ActiveRegressionLogWrapper(
        ap_gym.ActivePerceptionVectorToSingleWrapper(ref_vec)
    )

    from apx.compat.gym_env import GymAPEnv
    from apx.compat.log import RegressionLogWrapper
    from apx.data.circle_square import make_circle_square_bank
    from apx.envs.image_localization import ImageLocalizationEnv

    env = ImageLocalizationEnv(dataset=make_circle_square_bank((28, 28)))
    mine = RegressionLogWrapper(
        GymAPEnv(env, env.default_params(), autoreset="lockstep", rng="reference")
    )
    _rollout_compare(ref, mine, "CircleSquareLoc(custom)", steps=40)


def test_hide_and_seek_parity_vector(ref_ap):
    env_id = "CircleSquareHideAndSeek-v0"
    ref = ref_ap.make_vec(env_id, num_envs=2)
    mine = apc.make_vec(env_id, num_envs=2)
    rng = np.random.default_rng(42)
    ro, ri = ref.reset(seed=123)
    mo, mi = mine.reset(seed=123)
    _cmp(ro, mo, "obs", -1, env_id)
    for t in range(40):
        a = {
            "action": rng.uniform(-1, 1, (2, 2)).astype(np.float32),
            "prediction": rng.normal(size=(2, 2)).astype(np.float32),
        }
        r_obs, r_rew, r_term, r_trunc, r_info = ref.step(a)
        m_obs, m_rew, m_term, m_trunc, m_info = mine.step(a)
        _cmp(r_obs, m_obs, "obs", t, env_id)
        _cmp(r_rew, m_rew, "reward", t, env_id)
        np.testing.assert_array_equal(np.asarray(r_term), np.asarray(m_term))
        _cmp(r_info, m_info, "info", t, env_id)


def test_hide_and_seek_masked_reference_reset_is_broken(ref_ap):
    """The reference's masked variant crashes at reset (KeyError on the
    missing info["prediction"], circle_square_catch_or_flee.py:60-61), so
    end-to-end parity cannot be tested against it; apx's variant works
    (behavior covered in test_registry.py) and this test documents the
    reference bug so the divergence is auditable."""
    ref = ref_ap.make_vec("CircleSquareHideAndSeekNoPrediction-v0", num_envs=2)
    with pytest.raises(KeyError, match="prediction"):
        ref.reset(seed=123)
    mine = apc.make_vec("CircleSquareHideAndSeekNoPrediction-v0", num_envs=2)
    mine.reset(seed=123)  # apx reset works
    obs, rew, term, trunc, info = mine.step(
        {"action": np.zeros((2, 2), np.float32), "prediction": ()}
    )
    assert info["prediction"]["target"] == ()


def test_light_dark_vector_sync_parity(ref_ap):
    """Vector LightDark under the reference's SyncVectorEnv (per-sub-env
    np_random chains, NEXT_STEP autoreset) vs the apx vector adapter,
    including the gymnasium masked-info convention (`_key` masks +
    zero-filled reset entries)."""
    env_id = "LightDark-v0"
    n = 3
    ref = ref_ap.make_vec(env_id, num_envs=n)
    mine = apc.make_vec(env_id, num_envs=n)
    rng = np.random.default_rng(42)
    ro, _ = ref.reset(seed=123)
    mo, _ = mine.reset(seed=123)
    _cmp(ro, mo, "obs", -1, env_id)
    for t in range(80):
        a = {
            "action": rng.uniform(-1, 1, (n, 2)).astype(np.float32),
            "prediction": rng.normal(size=(n, 2)).astype(np.float32),
        }
        r_obs, r_rew, r_term, r_trunc, r_info = ref.step(a)
        m_obs, m_rew, m_term, m_trunc, m_info = mine.step(a)
        _cmp(r_obs, m_obs, "obs", t, env_id)
        _cmp(r_rew, m_rew, "reward", t, env_id)
        np.testing.assert_array_equal(np.asarray(r_term), np.asarray(m_term))
        np.testing.assert_array_equal(np.asarray(r_trunc), np.asarray(m_trunc))
        for k in ("base_reward", "_base_reward", "_prediction"):
            if k in r_info:
                _cmp(r_info[k], m_info[k], f"info/{k}", t, env_id)
        if "prediction" in r_info:
            _cmp(r_info["prediction"], m_info["prediction"], "info/prediction", t, env_id)


def test_image_classification_vector_parity(ref_ap):
    """Native vector env at N=3 through multiple lockstep autoresets."""
    env_id = "CircleSquare-s15-v0"
    ref = ref_ap.make_vec(env_id, num_envs=3)
    mine = apc.make_vec(env_id, num_envs=3)
    rng = np.random.default_rng(1)
    ro, ri = ref.reset(seed=77)
    mo, mi = mine.reset(seed=77)
    _cmp(ro, mo, "obs", -1, env_id)
    for t in range(40):
        a = {
            "action": rng.uniform(-1, 1, (3, 2)).astype(np.float32),
            "prediction": rng.normal(size=(3, 2)).astype(np.float32),
        }
        r_obs, r_rew, r_term, r_trunc, r_info = ref.step(a)
        m_obs, m_rew, m_term, m_trunc, m_info = mine.step(a)
        _cmp(r_obs, m_obs, "obs", t, env_id)
        _cmp(r_rew, m_rew, "reward", t, env_id)
        np.testing.assert_array_equal(np.asarray(r_term), np.asarray(m_term))
        _cmp(r_info, m_info, "info", t, env_id)


# ---------------------------------------------------------------------------
# LIDAR golden parity. The reference LIDAR env runs in-container through the
# pure-NumPy geometry shim (tests/shapely_shim.py, installed as
# sys.modules["shapely"] by conftest), so these are true golden-trajectory
# diffs against /root/reference/ap_gym/envs/lidar_localization2d.py — wall
# hits, slides, corner grazes, TimeLimit terminations and post-termination
# resets included.


@pytest.mark.parametrize(
    "env_id",
    [
        "LIDARLocMaze-v0",
        "LIDARLocMazeStatic-v0",
        "LIDARLocRooms-v0",
        "LIDARLocRoomsStatic-v0",
    ],
)
def test_lidar_parity_single(ref_ap, env_id):
    # 220 steps spans two TimeLimit terminations (step_limit=100) and the
    # explicit reseeds after each; wall slides happen constantly under
    # random actions.
    _rollout_compare(
        ref_ap.make(env_id), apc.make(env_id), env_id, steps=220,
        reseed_on_done=True,
    )


def test_lidar_parity_vector_sync(ref_ap):
    """Vector LIDAR under the reference's SyncVectorEnv (per-sub-env
    np_random chains, per-env map streams, NEXT_STEP autoreset) vs the apx
    vector adapter, including the masked map_idx reset-info convention."""
    env_id = "LIDARLocMaze-v0"
    n = 3
    ref = ref_ap.make_vec(env_id, num_envs=n)
    mine = apc.make_vec(env_id, num_envs=n)
    rng = np.random.default_rng(3)
    ro, _ = ref.reset(seed=11)
    mo, _ = mine.reset(seed=11)
    _cmp(ro, mo, "obs", -1, env_id)
    for t in range(120):
        a = {
            "action": rng.uniform(-1, 1, (n, 2)).astype(np.float32),
            "prediction": rng.normal(size=(n, 2)).astype(np.float32),
        }
        r_obs, r_rew, r_term, r_trunc, r_info = ref.step(a)
        m_obs, m_rew, m_term, m_trunc, m_info = mine.step(a)
        _cmp(r_obs, m_obs, "obs", t, env_id)
        _cmp(r_rew, m_rew, "reward", t, env_id)
        np.testing.assert_array_equal(np.asarray(r_term), np.asarray(m_term))
        np.testing.assert_array_equal(np.asarray(r_trunc), np.asarray(m_trunc))
        for k in ("base_reward", "_base_reward", "_prediction", "map_idx",
                  "_map_idx"):
            assert (k in r_info) == (k in m_info), (t, k, sorted(r_info),
                                                    sorted(m_info))
            if k in r_info:
                _cmp(r_info[k], m_info[k], f"info/{k}", t, env_id)
        if "prediction" in r_info:
            _cmp(r_info["prediction"], m_info["prediction"],
                 "info/prediction", t, env_id)


def test_lidar_sparse_reference_reset_is_broken(ref_ap):
    """LIDAR sparse ids are registered as SINGLE-env SparsifyWrapper stacks
    (vectorization goes through SyncVectorEnv over them), and
    SparsifyWrapper.reset KeyErrors on the missing info["prediction"]
    (sparsify_wrapper.py:127-135, :153-160) — the same reference bug as the
    single-env image sparse case. Golden parity is therefore impossible;
    this documents the bug and checks apx's sparse LIDAR self-consistency:
    reward == base_reward - loss * terminated against the dense twin."""
    with pytest.raises(KeyError, match="prediction"):
        ref_ap.make_vec("LIDARLocRooms-sparse-v0", num_envs=2).reset(seed=21)

    n = 2
    sparse = apc.make_vec("LIDARLocRooms-sparse-v0", num_envs=n)
    dense = apc.make_vec("LIDARLocRooms-v0", num_envs=n)
    rng = np.random.default_rng(5)
    so, _ = sparse.reset(seed=21)
    do, _ = dense.reset(seed=21)
    _cmp(so, do, "obs", -1, "sparse-vs-dense")
    for t in range(110):
        a = {
            "action": rng.uniform(-1, 1, (n, 2)).astype(np.float32),
            "prediction": rng.normal(size=(n, 2)).astype(np.float32),
        }
        s_obs, s_rew, s_term, s_trunc, s_info = sparse.step(a)
        d_obs, d_rew, d_term, d_trunc, d_info = dense.step(a)
        _cmp(s_obs, d_obs, "obs", t, "sparse-vs-dense")
        np.testing.assert_array_equal(s_term, d_term)
        if "base_reward" in s_info:
            w = np.asarray(s_term, np.float32)
            expect = s_info["base_reward"] - s_info["prediction"]["loss"] * w
            prov = s_info.get("_base_reward", np.ones(n, bool))
            np.testing.assert_allclose(
                np.where(prov, s_rew, 0), np.where(prov, expect, 0),
                atol=1e-5, rtol=1e-5,
            )


def test_lidar_parity_oob_termination(ref_ap):
    """Out-of-bounds termination (+ position clip) golden parity on a
    custom border-free map — the registered maps are wall-enclosed, so OOB
    (lidar_localization2d.py:366-375) is unreachable there. Drives the
    agent across the open border and checks the terminated flag, clipped
    position obs, and post-termination reset on both sides."""
    import jax.numpy as jnp
    from ap_gym.envs.floor_map import FloorMapDataset
    from ap_gym.envs.lidar_localization2d import LIDARLocalization2DEnv

    occ = np.zeros((5, 5), dtype=np.bool_)
    occ[2, 2] = True  # one interior wall so lidar still sees something

    class OpenMapDataset(FloorMapDataset):
        def __init__(self):
            super().__init__(5, 5)

        def _get_length(self):
            return 1

        def get_data_point(self, idx):
            return occ

        def get_data_point_batch(self, idx):
            return np.stack([occ for _ in idx])

    ref = ref_ap.ensure_active_perception_env(
        LIDARLocalization2DEnv(OpenMapDataset(), static_map=True)
    )

    from apx.compat.gym_env import GymAPEnv
    from apx.data.floor_map import MapBank
    from apx.envs.lidar_localization import LIDARLocalizationEnv

    bank = MapBank(
        maps=jnp.asarray(occ[None]),
        indices=jnp.zeros((1,), jnp.uint32),
        free_counts=jnp.asarray([int((~occ).sum())], jnp.int32),
    )
    env = LIDARLocalizationEnv(map_bank=bank, static_map=True)
    mine = GymAPEnv(env, env.default_params(), autoreset="none", rng="reference")

    n_terms = 0
    for seed in range(6):
        ro, ri = ref.reset(seed=seed)
        mo, mi = mine.reset(seed=seed)
        _cmp(ro, mo, "obs", -1, "OOB")
        _cmp(ri, mi, "info", -1, "OOB")
        # March off the map toward the nearest open border.
        a = {
            "action": np.array([0.9, 0.7], np.float32),
            "prediction": np.zeros(2, np.float32),
        }
        for t in range(12):
            r_obs, r_rew, r_term, _, r_info = ref.step(a)
            m_obs, m_rew, m_term, _, m_info = mine.step(a)
            _cmp(r_obs, m_obs, "obs", t, "OOB")
            _cmp(np.float64(r_rew), np.float64(m_rew), "reward", t, "OOB")
            assert bool(r_term) == bool(m_term), (seed, t)
            _cmp(r_info, m_info, "info", t, "OOB")
            if r_term:
                n_terms += 1
                break
    assert n_terms >= 4  # the march actually exercises the OOB branch


# ---------------------------------------------------------------------------
# HF-backed env ids: golden parity with BOTH sides fed the same in-memory
# dataset (load_dataset monkeypatched on the reference module and on
# `datasets`), so the registered MNIST/CIFAR10 entry points run their REAL
# ingestion chains — split selection, filter_labels, channel handling —
# end-to-end through seeded episodes, fully offline.


def _hf_fixture(
    channels, hw, names, n_train=48, n_test=16, seed=7, image_key=None,
    eval_split="test",
):
    datasets = pytest.importorskip("datasets")
    import PIL.Image

    rng = np.random.default_rng(seed)
    if image_key is None:
        image_key = "image" if channels == 1 else "img"
    feats = datasets.Features(
        {
            image_key: datasets.Image(),
            "label": datasets.ClassLabel(names=list(names)),
        }
    )

    def split(count, off):
        arrs = [
            rng.integers(0, 256, (*hw, channels), dtype=np.uint8)
            for _ in range(count)
        ]
        if channels == 1:
            arrs = [a[..., 0] for a in arrs]
        return datasets.Dataset.from_dict(
            {
                image_key: [PIL.Image.fromarray(a) for a in arrs],
                "label": [(i + off) % len(names) for i in range(count)],
            },
            features=feats,
        )

    return datasets.DatasetDict(
        {"train": split(n_train, 0), eval_split: split(n_test, 3)}
    )


@pytest.fixture()
def hf_patched(ref_ap, monkeypatch):
    """Patch both loaders to in-memory fixtures and clear apx's bank cache
    around the test."""
    import sys

    import datasets as ds_mod

    import apx.registry  # noqa: F401  (apx.registry the ATTRIBUTE is a function)
    from ap_gym.envs.image import huggingface_image_classification_dataset as ref_hf

    R = sys.modules["apx.registry"]

    mnist = _hf_fixture(1, (28, 28), [str(i) for i in range(10)])
    cifar_names = [
        "airplane", "automobile", "bird", "cat", "deer",
        "dog", "frog", "horse", "ship", "truck",
    ]
    cifar = _hf_fixture(3, (32, 32), cifar_names, seed=11)
    # TinyImageNet geometry: 200 classes, 64x64 RGB, eval split named
    # "valid" (the registration maps split="test" -> "valid",
    # reference registration.py:576-631).
    tin = _hf_fixture(
        3, (64, 64), [f"n{i:08d}" for i in range(200)], seed=13,
        image_key="image", eval_split="valid",
    )
    table = {"mnist": mnist, "cifar10": cifar, "zh-plus/tiny-imagenet": tin}

    def fake_load(name, *a, **k):
        return table[name]

    monkeypatch.setattr(ref_hf, "load_dataset", fake_load)
    monkeypatch.setattr(ds_mod, "load_dataset", fake_load)
    R._BANK_CACHE.clear()
    yield table
    R._BANK_CACHE.clear()


@pytest.mark.parametrize(
    "env_id,steps",
    [
        ("MNIST-v0", 40),          # grayscale, real ingestion, autoreset
        ("MNIST-test-v0", 20),     # -test split wiring
        ("CIFAR10-v0", 20),        # RGB, 'img' feature name
        ("CIFAR10-c3-v0", 20),     # filter_labels remap chain
        ("MNISTLoc-v0", 40),       # localization: unique-target sampler on
                                   # real ingested images + target_glimpse
        ("TinyImageNet-v0", 20),   # 200 classes, 64x64, 10x10 sensor
        ("TinyImageNet-test-v0", 20),  # split="test" -> "valid" mapping
        ("TinyImageNetLoc-v0", 40),    # localization chain at TIN geometry
    ],
)
def test_hf_env_golden_parity(ref_ap, hf_patched, env_id, steps):
    import apx.compat as apc2

    _rollout_compare(
        ref_ap.make(env_id), apc2.make(env_id), f"{env_id}(fixture)", steps=steps
    )


def test_seed_determinism_across_instances():
    """Two independently constructed compat envs with the same seed produce
    identical trajectories (no hidden global state)."""
    a = apc.make("LightDark-v0")
    b = apc.make("LightDark-v0")
    oa, _ = a.reset(seed=5)
    ob, _ = b.reset(seed=5)
    np.testing.assert_array_equal(oa["noisy_position"], ob["noisy_position"])
    act = {"action": np.array([0.3, -0.2], np.float32),
           "prediction": np.zeros(2, np.float32)}
    for _ in range(10):
        ra = a.step(act)
        rb = b.step(act)
        np.testing.assert_array_equal(
            ra[0]["noisy_position"], rb[0]["noisy_position"]
        )
        assert ra[1] == rb[1]


def test_parity_mode_pins_exact_glimpse_precision():
    """rng="reference" (the drop-in parity mode) forces exact-f32 glimpses
    even where the native default is the fast one-MXU-pass setting
    (gym_env.py parity overrides; no-op on CPU, matters on TPU)."""
    import apx.compat as apc

    e_ref = apc.make("MNIST-v0")
    assert e_ref.params.glimpse_precision == "highest"
    e_nat = apc.make("MNIST-v0", rng="native")
    assert e_nat.params.glimpse_precision == "default"


def test_wire_codec_bitwise_roundtrip():
    """The LIDAR map wire codec (apx/compat/wire.py) must invert bitwise:
    decode(device_get(encode(obs))) == obs for the {0, 1/255} f32 contract
    (lidar_localization2d.py:299), including a width that is not a
    multiple of 8 (the padded lane must slice away exactly)."""
    import jax.numpy as jnp

    from apx.compat.wire import _lidar_map_codec

    rng = np.random.default_rng(3)
    for h, w in ((32, 32), (13, 11)):
        enc, dec = _lidar_map_codec(h, w)
        occ = rng.integers(0, 2, size=(5, h, w), dtype=np.uint8).astype(bool)
        m = jnp.asarray(occ)[..., None].astype(jnp.float32) / 255.0
        obs = {"map": m, "lidar": jnp.zeros((5, 8), jnp.float32)}
        wire = enc(obs)
        assert wire["map"].dtype == jnp.uint8
        assert wire["map"].shape == (5, h, -(-w // 8))
        out = dec({k: np.asarray(v) for k, v in wire.items()})
        np.testing.assert_array_equal(out["map"], np.asarray(m))
        assert out["map"].dtype == np.float32
        np.testing.assert_array_equal(out["lidar"], np.zeros((5, 8)))
