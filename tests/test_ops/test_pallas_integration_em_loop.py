"""Whole-fit single-launch integration-model EM kernel
(ops/pallas_integration_em_loop.py): trainer-level parity against the
per-iteration fused path ('step') in interpret mode on CPU, plus the
vMF log-normalizer table accuracy. The compiled kernel is exercised on
real TPU hardware by bench/dev runs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models.gcacgmm import GCACGMMTrainer
from pb_bss_tpu.models.vmfcacgmm import VMFCACGMMTrainer
from pb_bss_tpu.ops.pallas_integration_em_loop import (
    vmf_log_norm_table,
)


def _problem(F=13, T=24, D=3, E=6, K=2, seed=0, batch=()):
    rng = np.random.default_rng(seed)
    shape = (*batch, F)
    atf = rng.standard_normal((*shape, D, K)) + 1j * rng.standard_normal(
        (*shape, D, K))
    s = rng.standard_normal((*shape, K, T)) + 1j * rng.standard_normal(
        (*shape, K, T))
    y = np.einsum('...dk,...kt->...dt', atf, s) + 0.2 * (
        rng.standard_normal((*shape, D, T))
        + 1j * rng.standard_normal((*shape, D, T)))
    obs = np.swapaxes(y, -1, -2).astype(np.complex64)  # (..., T, D)
    obs /= np.linalg.norm(obs, axis=-1, keepdims=True)
    emb = rng.standard_normal((*shape, T, E)).astype(np.float32)
    return jnp.asarray(obs), jnp.asarray(emb)


@pytest.mark.parametrize('dim', [2, 6, 20])
def test_vmf_log_norm_table_accuracy(dim):
    """PWL interpolation of the sqrt-spaced table vs the exact value
    over the whole clipped concentration range."""
    from scipy.special import ive
    s0, ds, values = vmf_log_norm_table(dim, 1e-10, 500.0)
    nu = dim / 2 - 1
    kappa = np.concatenate([
        np.logspace(-10, np.log10(500), 2001),
        np.linspace(1e-6, 500, 2001),
    ])
    exact = ((dim / 2) * np.log(2 * np.pi)
             + np.log(ive(nu, kappa)) + kappa - nu * np.log(kappa))
    idx = np.clip((np.sqrt(kappa) - s0) / ds, 0, len(values) - 1)
    lo = np.clip(np.floor(idx).astype(int), 0, len(values) - 2)
    w = idx - lo
    interp = values[lo] * (1 - w) + values[lo + 1] * w
    assert np.abs(interp - exact).max() < 2e-4


def _assert_model_close(m_loop, m_step, atol):
    for name, a, b in [
        ('weight', m_loop.weight, m_step.weight),
        ('eigenvalues', m_loop.cacg.covariance_eigenvalues,
         m_step.cacg.covariance_eigenvalues),
    ]:
        assert_allclose(np.asarray(a, np.float64),
                        np.asarray(b, np.float64), atol=atol,
                        err_msg=name)


@pytest.mark.parametrize('weights', [(1., 1.), (0.5, 2.)])
@pytest.mark.slow
def test_vmf_whole_fit_matches_per_iteration(weights):
    spatial_weight, spectral_weight = weights
    obs, emb = _problem()
    kw = dict(num_classes=2, iterations=3,
              spatial_weight=spatial_weight,
              spectral_weight=spectral_weight)
    tr = VMFCACGMMTrainer()
    m_l = tr.fit(obs, emb, use_fused_em='loop', **kw)
    m_s = tr.fit(obs, emb, use_fused_em='step', **kw)
    _assert_model_close(m_l, m_s, atol=5e-4)
    assert_allclose(np.asarray(m_l.vmf.mean, np.float64),
                    np.asarray(m_s.vmf.mean, np.float64), atol=5e-4)
    assert_allclose(
        np.asarray(m_l.vmf.concentration, np.float64),
        np.asarray(m_s.vmf.concentration, np.float64),
        atol=5e-3)
    # posterior quality equivalence on the final models
    a_l = np.asarray(m_l.predict(obs, emb), np.float64)
    a_s = np.asarray(m_s.predict(obs, emb), np.float64)
    assert np.abs(a_l - a_s).mean() < 1e-3


@pytest.mark.parametrize('covariance_type', ['spherical', 'diagonal'])
@pytest.mark.slow
def test_gaussian_whole_fit_matches_per_iteration(covariance_type):
    obs, emb = _problem(seed=3)
    kw = dict(num_classes=2, iterations=3,
              covariance_type=covariance_type)
    tr = GCACGMMTrainer()
    m_l = tr.fit(obs, emb, use_fused_em='loop', **kw)
    m_s = tr.fit(obs, emb, use_fused_em='step', **kw)
    _assert_model_close(m_l, m_s, atol=5e-4)
    assert_allclose(np.asarray(m_l.gaussian.mean, np.float64),
                    np.asarray(m_s.gaussian.mean, np.float64),
                    atol=1e-3)
    assert_allclose(
        np.asarray(m_l.gaussian.covariance, np.float64),
        np.asarray(m_s.gaussian.covariance, np.float64),
        rtol=2e-3, atol=1e-5)


@pytest.mark.slow
def test_vmf_whole_fit_batched_fold():
    """(B, F, T, D) fits: each utterance carries its own global
    spectral state through the in-kernel one-hot-mask matmuls."""
    obs, emb = _problem(batch=(2,), seed=5)
    rng = np.random.default_rng(7)
    init = rng.uniform(size=(2, 13, 2, 24)).astype(np.float32)
    init /= init.sum(-2, keepdims=True)
    init = jnp.asarray(init)
    kw = dict(iterations=3)
    tr = VMFCACGMMTrainer()
    m_l = tr.fit(obs, emb, initialization=init,
                 use_fused_em='loop', **kw)
    m_s = tr.fit(obs, emb, initialization=init,
                 use_fused_em='step', **kw)
    _assert_model_close(m_l, m_s, atol=5e-4)
    assert m_l.vmf.mean.shape == (2, 2, 6)
    assert_allclose(np.asarray(m_l.vmf.mean, np.float64),
                    np.asarray(m_s.vmf.mean, np.float64), atol=5e-4)
    # batched fit == independent single fit of utterance 0 (same
    # initialization; f32 reduction orders differ across layouts)
    m_0 = tr.fit(obs[0], emb[0], initialization=init[0],
                 use_fused_em='loop', **kw)
    assert_allclose(np.asarray(m_l.vmf.mean[0], np.float64),
                    np.asarray(m_0.vmf.mean, np.float64), atol=2e-3)
