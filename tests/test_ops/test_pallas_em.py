"""Pallas fused E-step kernel: parity with the XLA path (interpret
mode on CPU; the compiled kernel is exercised on real TPU hardware by
bench/dev runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.ops.pallas_em import (
    cacgmm_e_step,
    cacgmm_e_step_reference,
)


def _data(F=7, D=6, T=32, K=3, seed=0):
    rng = np.random.default_rng(seed)
    y_re = rng.standard_normal((F, D, T)).astype(np.float32)
    y_im = rng.standard_normal((F, D, T)).astype(np.float32)
    a = rng.standard_normal((F, K, D, D)) \
        + 1j * rng.standard_normal((F, K, D, D))
    q, _ = np.linalg.qr(a)
    v_re = q.real.astype(np.float32)
    v_im = q.imag.astype(np.float32)
    ev = rng.uniform(0.1, 1.0, (F, K, D)).astype(np.float32)
    inv_ev = (1 / ev).astype(np.float32)
    logdet = np.log(ev).sum(-1).astype(np.float32)
    weight = np.full((F, K), 1 / K, np.float32)
    return y_re, y_im, v_re, v_im, inv_ev, logdet, weight


def test_kernel_matches_xla_reference():
    args = _data()
    aff_p, qf_p = cacgmm_e_step(*args, interpret=True)
    aff_r, qf_r = cacgmm_e_step_reference(*args)
    assert_allclose(np.asarray(aff_p), np.asarray(aff_r), atol=1e-5)
    assert_allclose(
        np.asarray(qf_p), np.asarray(qf_r), rtol=1e-5)


def test_kernel_matches_model_e_step():
    """The kernel computes the same posterior as the production
    CACGMM._predict path."""
    from pb_bss_tpu.models import CACGMM, ComplexAngularCentralGaussian
    args = _data(seed=1)
    y_re, y_im, v_re, v_im, inv_ev, logdet, weight = args
    aff_p, qf_p = cacgmm_e_step(*args, interpret=True)

    cacg = ComplexAngularCentralGaussian(
        covariance_eigenvectors=jnp.asarray(v_re + 1j * v_im),
        covariance_eigenvalues=jnp.asarray(1.0 / inv_ev),
    )
    model = CACGMM(weight=jnp.asarray(weight)[..., None], cacg=cacg)
    y = jnp.asarray(y_re + 1j * y_im)  # (F, D, T) time-last
    aff_m, qf_m, _ = model._predict(y)
    assert_allclose(
        np.asarray(aff_p), np.asarray(aff_m), atol=2e-4)
    assert_allclose(
        np.asarray(qf_p), np.asarray(qf_m), rtol=2e-4)


def test_posterior_normalized():
    args = _data(seed=2)
    aff, _ = cacgmm_e_step(*args, interpret=True)
    assert_allclose(
        np.asarray(aff).sum(axis=1), 1.0, rtol=1e-5)


def test_em_scatter_kernel_matches_reference():
    from pb_bss_tpu.ops.pallas_em import (
        cacgmm_em_scatter, cacgmm_em_scatter_reference)
    args = _data(seed=3)
    sr_p, si_p, asum_p = cacgmm_em_scatter(*args, interpret=True)
    sr_r, si_r, asum_r = cacgmm_em_scatter_reference(*args)
    assert_allclose(np.asarray(sr_p), np.asarray(sr_r), atol=1e-4)
    assert_allclose(np.asarray(si_p), np.asarray(si_r), atol=1e-4)
    assert_allclose(np.asarray(asum_p), np.asarray(asum_r), atol=1e-5)


def test_trainer_use_pallas_em_matches_xla():
    """CACGMMTrainer(use_pallas_em=True) reproduces the XLA EM
    trajectory (interpret mode via CPU pallas lowering)."""
    from pb_bss_tpu.models.cacgmm import CACGMMTrainer
    rng = np.random.default_rng(4)
    F, T, D, K = 5, 40, 3, 2
    y = (rng.standard_normal((F, T, D))
         + 1j * rng.standard_normal((F, T, D))).astype(np.complex64)
    trainer = CACGMMTrainer()
    m_xla = trainer.fit(
        y, num_classes=K, iterations=4, affiliation_eps=0,
        key=jax.random.key(0))
    m_pl = trainer.fit(
        y, num_classes=K, iterations=4, affiliation_eps=0,
        key=jax.random.key(0), use_pallas_em=True)
    assert_allclose(
        np.asarray(m_pl.cacg.covariance_eigenvalues),
        np.asarray(m_xla.cacg.covariance_eigenvalues),
        rtol=1e-3, atol=1e-5)
    assert_allclose(
        np.asarray(m_pl.weight), np.asarray(m_xla.weight),
        rtol=1e-3, atol=1e-5)
