"""Loss-function parity: jax vs numpy paths vs the reference formulation.

Extends the reference's only unit test
(/root/reference/test/test_active_classification_env.py:17-50) to all losses.
"""

import numpy as np
import pytest
import scipy.special

from apx.core import (
    AffineLossFn,
    CrossEntropyLossFn,
    MSELossFn,
    WeightedLossFn,
    ZeroLossFn,
)


@pytest.mark.parametrize("seed", range(10))
def test_cross_entropy_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    batch_shape = tuple(rng.integers(1, 5, size=rng.integers(0, 3)))
    k = int(rng.integers(2, 12))
    pred = rng.standard_normal((*batch_shape, k)).astype(np.float32)
    target = rng.integers(0, k, size=batch_shape)

    expected = -np.take_along_axis(
        scipy.special.log_softmax(pred, axis=-1), target[..., None], axis=-1
    )[..., 0]

    loss = CrossEntropyLossFn(num_classes=k)
    np.testing.assert_allclose(np.asarray(loss(pred, target)), expected, rtol=1e-4)
    np.testing.assert_allclose(loss.numpy(pred, target), expected, rtol=1e-6)


def test_cross_entropy_normalized_bounds():
    k = 10
    loss = CrossEntropyLossFn(num_classes=k)
    assert loss.lower_bound == 0.0
    assert np.isclose(loss.blind_guessing_expected_value, np.log(k))
    norm = loss.normalized
    pred = np.zeros((3, k), dtype=np.float32)
    target = np.array([0, 1, 2])
    # Blind guess (uniform logits) should give exactly 1 after normalization.
    np.testing.assert_allclose(np.asarray(norm(pred, target)), 1.0, rtol=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_mse(seed):
    rng = np.random.default_rng(seed)
    pred = rng.standard_normal((4, 3)).astype(np.float32)
    target = rng.standard_normal((4, 3)).astype(np.float32)
    expected = np.mean((pred - target) ** 2, axis=-1)
    loss = MSELossFn()
    np.testing.assert_allclose(np.asarray(loss(pred, target)), expected, rtol=1e-5)
    np.testing.assert_allclose(loss.numpy(pred, target), expected, rtol=1e-6)


def test_mse_normalized_matches_reference_convention():
    # ActiveRegression envs with bounds [-1, 1]: std = (high-low)/sqrt(12),
    # blind EV = mean(std^2) = 1/3 (active_regression_env.py:29-52).
    std = (1.0 - (-1.0)) / np.sqrt(12)
    loss = MSELossFn(target_std=std)
    assert np.isclose(loss.blind_guessing_expected_value, 1.0 / 3.0)
    norm = loss.normalized
    assert isinstance(norm, AffineLossFn)
    pred = np.array([[1.0, 1.0]], dtype=np.float32)
    target = np.array([[0.0, 0.0]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(norm(pred, target)), 3.0, rtol=1e-6)


def test_weighted_loss():
    inner = MSELossFn()
    w = WeightedLossFn(inner=inner)
    pred = np.ones((2, 3), dtype=np.float32)
    target = {
        "target": np.zeros((2, 3), dtype=np.float32),
        "weight": np.array([0.0, 1.0], dtype=np.float32),
    }
    np.testing.assert_allclose(np.asarray(w(pred, target)), [0.0, 1.0], rtol=1e-6)
    np.testing.assert_allclose(w.numpy(pred, target), [0.0, 1.0], rtol=1e-6)


def test_zero_loss_batch_shape():
    z = ZeroLossFn()
    assert np.asarray(z((), ())).shape == ()
    out = z((), (), batch_shape=(5,))
    assert out.shape == (5,)
    assert np.all(np.asarray(out) == 0)


def test_reference_loss_parity():
    from conftest import load_reference_ap_gym

    ap_gym = load_reference_ap_gym()
    if ap_gym is None:
        pytest.skip("reference unavailable")
    rng = np.random.default_rng(0)
    for _ in range(5):
        k = int(rng.integers(2, 8))
        pred = rng.standard_normal((6, k)).astype(np.float32)
        target = rng.integers(0, k, size=(6,))
        ref = ap_gym.CrossEntropyLossFn(num_classes=k).normalized
        ours = CrossEntropyLossFn(num_classes=k).normalized
        np.testing.assert_array_equal(
            ours.numpy(pred, target), ref.numpy(pred, target)
        )
        np.testing.assert_allclose(
            np.asarray(ours(pred, target)), ref.numpy(pred, target), rtol=1e-5
        )


def test_torch_losses_match_and_differentiate():
    torch = pytest.importorskip("torch")
    import numpy as np

    from apx.core.losses import CrossEntropyLossFn, MSELossFn, WeightedLossFn

    rng = np.random.default_rng(0)
    pred = rng.normal(size=(5, 4)).astype(np.float32)
    target = rng.integers(0, 4, size=5)

    ce = CrossEntropyLossFn(num_classes=4).normalized
    t_pred = torch.tensor(pred, requires_grad=True)
    out = ce.torch(t_pred, torch.tensor(target))
    np.testing.assert_allclose(
        out.detach().numpy(), ce.numpy(pred, target), rtol=1e-5
    )
    out.sum().backward()
    assert t_pred.grad is not None and torch.isfinite(t_pred.grad).all()

    mse = MSELossFn(target_std=0.5).normalized
    p2 = rng.normal(size=(5, 2)).astype(np.float32)
    t2 = rng.normal(size=(5, 2)).astype(np.float32)
    tp = torch.tensor(p2, requires_grad=True)
    out2 = mse.torch(tp, torch.tensor(t2))
    np.testing.assert_allclose(out2.detach().numpy(), mse.numpy(p2, t2), rtol=1e-5)
    out2.sum().backward()
    assert torch.isfinite(tp.grad).all()

    w = WeightedLossFn(inner=MSELossFn())
    wt = {"target": torch.tensor(t2), "weight": torch.tensor([0.0, 1, 0, 1, 0.5])}
    out3 = w.torch(torch.tensor(p2), wt)
    assert float(out3[0]) == 0.0
