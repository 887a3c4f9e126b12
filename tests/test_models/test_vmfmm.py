"""vMF / vMF-MM tests: log_ive vs scipy, trainer recovery
(mirrors /root/reference/tests/test_distribution/test_vmfmm.py and
test_von_mises_fisher.py).
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models import VMFMMTrainer, VonMisesFisherTrainer
from pb_bss_tpu.models.von_mises_fisher import log_ive


def test_log_ive_matches_scipy():
    from scipy.special import ive
    for nu in [0.0, 0.5, 1.0, 2.0, 9.5, 19.0]:
        kappa = np.array([1e-10, 1e-3, 0.5, 1.0, 10.0, 100.0, 500.0])
        got = np.asarray(log_ive(nu, kappa))
        expected = np.log(ive(nu, kappa))
        assert_allclose(got, expected, rtol=1e-6, atol=1e-12)


def _sample_vmf(mean, concentration, size, rng):
    """Rejection-free approximate sampler adequate for recovery tests:
    Gaussian perturbation around the mean direction, renormalized.
    For moderate concentrations this matches vMF closely enough for
    atol-0.1 parameter recovery."""
    # Wood (1994) exact sampler
    d = mean.shape[-1]
    # sample angle w via rejection sampling
    b = (-2 * concentration + np.sqrt(
        4 * concentration ** 2 + (d - 1) ** 2)) / (d - 1)
    x0 = (1 - b) / (1 + b)
    c = concentration * x0 + (d - 1) * np.log(1 - x0 ** 2)
    ws = []
    while len(ws) < size:
        z = rng.beta((d - 1) / 2, (d - 1) / 2, size=size)
        w = (1 - (1 + b) * z) / (1 - (1 - b) * z)
        u = rng.uniform(size=size)
        accept = concentration * w + (d - 1) * np.log(
            1 - x0 * w) - c >= np.log(u)
        ws.extend(w[accept].tolist())
    w = np.array(ws[:size])
    # sample direction orthogonal to mean
    v = rng.randn(size, d)
    v -= (v @ mean)[:, None] * mean[None, :]
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return w[:, None] * mean[None, :] + np.sqrt(1 - w ** 2)[:, None] * v


def test_vmf_trainer_recovery():
    rng = np.random.RandomState(0)
    mean = np.array([1.0, 2.0, 3.0])
    mean /= np.linalg.norm(mean)
    concentration = 20.0
    x = _sample_vmf(mean, concentration, 5000, rng)
    model = VonMisesFisherTrainer().fit(x)
    got_mean = np.asarray(model.mean)
    if got_mean @ mean < 0:
        got_mean = -got_mean
    assert_allclose(got_mean, mean, atol=0.05)
    assert_allclose(
        float(model.concentration), concentration, rtol=0.15)


def test_vmf_log_pdf_normalizes():
    """exp(log_pdf) integrates to ~1 over the circle (D=2)."""
    from pb_bss_tpu.models import VonMisesFisher
    theta = np.linspace(0, 2 * np.pi, 20001)[:-1]
    y = np.stack([np.cos(theta), np.sin(theta)], axis=-1)
    model = VonMisesFisher(
        mean=np.array([1.0, 0.0]), concentration=np.array(5.0))
    pdf = np.exp(np.asarray(model.log_pdf(y)))
    integral = pdf.mean() * 2 * np.pi
    assert_allclose(integral, 1.0, rtol=1e-3)


def test_vmfmm_recovery():
    rng = np.random.RandomState(1)
    means = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    concentration = 30.0
    x = np.concatenate([
        _sample_vmf(means[0], concentration, 1500, rng),
        _sample_vmf(means[1], concentration, 1500, rng),
    ])
    model = VMFMMTrainer().fit(x, num_classes=2, iterations=30)
    est = np.asarray(model.vmf.mean)
    # permutation + sign invariant match
    scores = np.abs(est @ means.T)  # (K_est, K_true)
    if scores[0, 0] + scores[1, 1] >= scores[0, 1] + scores[1, 0]:
        perm = [0, 1]
    else:
        perm = [1, 0]
    for k_est, k_true in zip(perm, range(2)):
        m = est[k_est]
        if m @ means[k_true] < 0:
            m = -m
        assert_allclose(m, means[k_true], atol=0.1)
    assert_allclose(np.asarray(model.weight).sum(), 1.0, rtol=1e-5)


def test_vmfmm_shapes():
    rng = np.random.RandomState(2)
    x = rng.randn(500, 3)
    model = VMFMMTrainer().fit(x, num_classes=2, iterations=5)
    assert model.weight.shape == (2, 1)
    assert model.vmf.mean.shape == (2, 3)
    assert model.vmf.concentration.shape == (2,)
    affiliation = np.asarray(model.predict(x))
    assert affiliation.shape == (2, 500)
    assert_allclose(affiliation.sum(0), 1.0, rtol=1e-5)
