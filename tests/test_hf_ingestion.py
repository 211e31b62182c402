"""Real HuggingFace ingestion path, exercised offline.

The container has zero egress, so every registered MNIST/CIFAR10/
TinyImageNet id runs on the synthetic fallback bank — but the REAL
ingestion branch (apx/data/huggingface.py:bank_from_hf) is tested here
against in-memory ``datasets.Dataset.from_dict`` fixtures, including
golden parity against the reference's own
HuggingfaceImageClassificationDataset with its loader monkeypatched to
return the same fixture (so split selection, filter_labels remap +
recast, grayscale->RGB and uint8 packing are diffed, not just asserted).
"""

import numpy as np
import pytest

from conftest import load_reference_ap_gym

import jax  # noqa: F401  (conftest pins the cpu backend)

datasets = pytest.importorskip("datasets")
PIL = pytest.importorskip("PIL")
import PIL.Image  # noqa: E402

from apx.data.huggingface import bank_from_hf  # noqa: E402


def _fixture(channels=1, n=10, num_classes=4, hw=(9, 7), seed=0):
    """DatasetDict with train/test splits of tiny deterministic images."""
    rng = np.random.default_rng(seed)
    names = [f"cls{i}" for i in range(num_classes)]
    feats = datasets.Features(
        {
            "image": datasets.Image(),
            "label": datasets.ClassLabel(names=names),
        }
    )

    def split(count, off):
        arrs = [
            rng.integers(0, 256, (*hw, channels), dtype=np.uint8)
            for _ in range(count)
        ]
        if channels == 1:
            arrs = [a[..., 0] for a in arrs]
        imgs = [PIL.Image.fromarray(a) for a in arrs]
        labels = [(i + off) % num_classes for i in range(count)]
        return datasets.Dataset.from_dict(
            {"image": imgs, "label": labels}, features=feats
        )

    return datasets.DatasetDict({"train": split(n, 0), "test": split(4, 1)})


@pytest.fixture(scope="module")
def ref_hf_cls(request):
    ap = load_reference_ap_gym()
    if ap is None:
        pytest.skip("reference not importable")
    from ap_gym.envs.image import huggingface_image_classification_dataset as m

    return m


def _ref_dataset(ref_mod, dd, monkeypatch, **kwargs):
    """Reference HuggingfaceImageClassificationDataset over an in-memory
    DatasetDict (its load_dataset monkeypatched; reference :52-62)."""
    monkeypatch.setattr(ref_mod, "load_dataset", lambda *a, **k: dd)
    ds = ref_mod.HuggingfaceImageClassificationDataset("fixture", **kwargs)
    ds.load()
    return ds


@pytest.mark.parametrize("split", ["train", "test"])
@pytest.mark.parametrize("channels", [1, 3])
def test_bank_matches_reference_packing(ref_hf_cls, monkeypatch, split, channels):
    dd = _fixture(channels=1)  # grayscale source exercises the RGB repeat
    ref = _ref_dataset(ref_hf_cls, dd, monkeypatch, channels=channels, split=split)
    bank = bank_from_hf(dd, split=split, channels=channels)
    assert bank.length == len(ref)
    assert bank.num_classes == ref.num_classes
    idx = np.arange(len(ref))
    ref_imgs, ref_labels = ref[idx]
    got_imgs, got_labels = jax.vmap(bank.fetch)(idx)
    np.testing.assert_array_equal(np.asarray(got_labels), ref_labels)
    # uint8/255 then repeat == repeat then /255: bitwise equal.
    np.testing.assert_array_equal(np.asarray(got_imgs), ref_imgs)
    assert np.asarray(bank.images).dtype == np.uint8  # stays uint8 in HBM


def test_filter_labels_matches_reference(ref_hf_cls, monkeypatch):
    dd = _fixture(channels=3, n=12, num_classes=4)
    filt = ["cls2", "cls0"]  # out-of-order on purpose: remap is filter-order
    ref = _ref_dataset(
        ref_hf_cls, dd, monkeypatch, channels=3, filter_labels=filt
    )
    bank = bank_from_hf(dd, channels=3, filter_labels=filt)
    assert bank.length == len(ref)
    assert bank.num_classes == ref.num_classes == 2
    idx = np.arange(len(ref))
    ref_imgs, ref_labels = ref[idx]
    got_imgs, got_labels = jax.vmap(bank.fetch)(idx)
    np.testing.assert_array_equal(np.asarray(got_labels), ref_labels)
    np.testing.assert_array_equal(np.asarray(got_imgs), ref_imgs)


def test_float_images_not_rescaled():
    """Non-uint8 image features stay float32 verbatim — the reference's
    _process_imgs_np (image_classification_dataset.py:66-70) does NOT
    divide floats by 255."""
    rng = np.random.default_rng(3)
    imgs = [rng.uniform(0, 1, (5, 5, 3)).astype(np.float32) for _ in range(4)]
    feats = datasets.Features(
        {
            "image": datasets.Array3D((5, 5, 3), "float32"),
            "label": datasets.ClassLabel(names=["x", "y"]),
        }
    )
    ds = datasets.Dataset.from_dict(
        {"image": [i.tolist() for i in imgs], "label": [0, 1, 0, 1]},
        features=feats,
    )
    dd = datasets.DatasetDict({"train": ds})
    bank = bank_from_hf(dd, channels=3)
    assert np.asarray(bank.images).dtype == np.float32
    got, _ = bank.fetch(np.int32(2))
    np.testing.assert_allclose(np.asarray(got), imgs[2], rtol=1e-6)


def test_uint8_banks_pack_to_int32():
    """uint8 banks with 4-divisible rows store int32-packed (faster TPU
    gathers, PERF.md round 3); fetch_raw bitcasts back bitwise."""
    from apx.data.dataset import BankImageDataset

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (7, 4, 4, 1), dtype=np.uint8)
    bank = BankImageDataset.from_numpy(imgs, np.arange(7) % 2, num_classes=2)
    assert np.asarray(bank.images).dtype == np.int32
    assert bank.packed_shape == (4, 4, 1)
    assert bank.image_shape == (4, 4, 1)
    got, lbl = bank.fetch_raw(np.array([3, 0, 6], np.int32))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(got), imgs[[3, 0, 6]])
    np.testing.assert_array_equal(np.asarray(bank.images_unpacked), imgs)
    # scalar fetch (the vmapped per-env reset form)
    got1, _ = bank.fetch_raw(np.int32(5))
    np.testing.assert_array_equal(np.asarray(got1), imgs[5])
    # non-divisible rows stay unpacked uint8
    imgs2 = rng.integers(0, 256, (3, 3, 3, 1), dtype=np.uint8)
    bank2 = BankImageDataset.from_numpy(imgs2, np.zeros(3), num_classes=1)
    assert np.asarray(bank2.images).dtype == np.uint8
    assert bank2.packed_shape is None


def test_channel_mismatch_raises():
    dd = _fixture(channels=3)
    with pytest.raises(ValueError, match="channels"):
        bank_from_hf(dd, channels=1)


def test_synthetic_fallback_marked():
    from apx.data.huggingface import load_hf_image_bank

    bank = load_hf_image_bank("mnist", split="train", num_points=16)
    assert getattr(bank, "_bank_kind", None) == "synthetic"


def test_load_hf_image_bank_truncates_real_path(monkeypatch):
    """num_points is honored on the REAL-cache path (not only the
    synthetic fallback): the loaded bank truncates to a deterministic
    prefix, and the offline-probe flags are restored afterwards."""
    import huggingface_hub.constants as hub_c

    import apx.data.huggingface as hf_mod

    dd = _fixture(channels=1, n=12)
    monkeypatch.setattr("datasets.load_dataset", lambda *a, **k: dd)
    before = hub_c.HF_HUB_OFFLINE
    full = hf_mod.load_hf_image_bank("whatever", channels=1, synthetic=False)
    bank = hf_mod.load_hf_image_bank(
        "whatever", channels=1, num_points=5, synthetic=False
    )
    assert full.length == 12 and bank.length == 5
    np.testing.assert_array_equal(
        np.asarray(bank.images_unpacked), np.asarray(full.images_unpacked)[:5]
    )
    np.testing.assert_array_equal(
        np.asarray(bank.labels), np.asarray(full.labels)[:5]
    )
    assert getattr(bank, "_bank_kind", None) == "huggingface"
    assert hub_c.HF_HUB_OFFLINE == before


def test_synthetic_bank_is_process_stable():
    """The synthetic fallback bank must be identical across interpreter
    processes (hash() is salted per process; the generator seeds with a
    stable digest instead): a child process computes the same bank bytes."""
    import hashlib
    import os
    import subprocess
    import sys

    from apx.data.huggingface import synthetic_image_bank

    def digest(bank):
        h = hashlib.sha256()
        h.update(np.asarray(bank.images).tobytes())
        h.update(np.asarray(bank.labels).tobytes())
        return h.hexdigest()

    here = digest(synthetic_image_bank("mnist", num_points=32))
    child = subprocess.run(
        [
            sys.executable,
            "-c",
            "import hashlib, numpy as np\n"
            "from apx.data.huggingface import synthetic_image_bank\n"
            "b = synthetic_image_bank('mnist', num_points=32)\n"
            "h = hashlib.sha256()\n"
            "h.update(np.asarray(b.images).tobytes())\n"
            "h.update(np.asarray(b.labels).tobytes())\n"
            "print(h.hexdigest())\n",
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS=""),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert child.returncode == 0, child.stderr[-500:]
    assert child.stdout.strip() == here


def test_offline_probe_restores_os_environ(monkeypatch):
    """The offline-probe env vars are removed again when the probe
    introduced them — a leftover HF_HUB_OFFLINE=1 would force every later
    subprocess (xdist workers, data loaders) offline."""
    import os

    import apx.data.huggingface as hf_mod

    monkeypatch.delenv("HF_HUB_OFFLINE", raising=False)
    monkeypatch.delenv("HF_DATASETS_OFFLINE", raising=False)
    dd = _fixture(channels=1, n=6)
    monkeypatch.setattr("datasets.load_dataset", lambda *a, **k: dd)
    bank = hf_mod.load_hf_image_bank("whatever", channels=1, synthetic=False)
    assert bank.length == 6
    assert "HF_HUB_OFFLINE" not in os.environ
    assert "HF_DATASETS_OFFLINE" not in os.environ


def test_filter_labels_survive_split_missing_top_class(monkeypatch):
    """filter_labels resolves against the TRAIN split's ClassLabel; a
    split with zero rows of the highest filtered class must fail with a
    clear zero-rows ValueError, not an IndexError from an undersized remap
    LUT (and a PARTIALLY missing class must still remap correctly)."""
    names = [f"cls{i}" for i in range(4)]
    feats = datasets.Features(
        {"image": datasets.Image(), "label": datasets.ClassLabel(names=names)}
    )
    rng = np.random.default_rng(0)

    def split(labels):
        imgs = [
            PIL.Image.fromarray(rng.integers(0, 256, (9, 7), dtype=np.uint8))
            for _ in labels
        ]
        return datasets.Dataset.from_dict(
            {"image": imgs, "label": list(labels)}, features=feats
        )

    dd = datasets.DatasetDict(
        {"train": split([0, 1, 2, 3]), "test": split([0, 0, 1])}
    )
    with pytest.raises(ValueError, match="matched no rows"):
        bank_from_hf(dd, split="test", channels=1, filter_labels=["cls3"])
    # cls3 absent from the split but cls1 present: LUT must cover id 3
    bank = bank_from_hf(
        dd, split="test", channels=1, filter_labels=["cls3", "cls1"]
    )
    assert bank.length == 1
    np.testing.assert_array_equal(np.asarray(bank.labels), [1])
