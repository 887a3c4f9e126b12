"""Single-kernel CWMM EM loop: parity with the scan path (interpret
mode on CPU; compiled on TPU by bench/dev runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models.cwmm import CWMMTrainer
from pb_bss_tpu.ops.pallas_cwmm_loop import (
    concentration_table,
    cwmm_em_full,
)


def _mixture(F=15, D=4, T=48, K=2, seed=0, dtype=None):
    """Observations clustered around K random modes. Under x64 the
    scan path wants the default (c128) dtype — mixed c64 inputs would
    change carry dtypes mid-scan."""
    rng = np.random.default_rng(seed)
    modes = rng.standard_normal((F, K, D)) + 1j * rng.standard_normal(
        (F, K, D))
    modes /= np.linalg.norm(modes, axis=-1, keepdims=True)
    y = np.repeat(modes, T // K, axis=1) + 0.3 * (
        rng.standard_normal((F, T, D))
        + 1j * rng.standard_normal((F, T, D)))
    return jnp.asarray(y if dtype is None else y.astype(dtype))


def test_concentration_table_inverts_forward_map():
    from scipy.special import hyp1f1
    D = 6
    r0, dr, table = concentration_table(D)
    # forward-map the table back: ratio(kappa(g)) == grid point
    grid = r0 + dr * np.arange(table.shape[0])
    # forward hyp1f1 overflows float64 above kappa ~ 300; check the
    # invertible range (ends are clamped by construction)
    sel = (table > 1e-3) & (table < 100)
    k = table[sel]
    ratio = hyp1f1(2, D + 1, k) / (D * hyp1f1(1, D, k))
    assert_allclose(ratio, grid[sel], atol=2e-3)


@pytest.mark.slow
def test_parity_with_scan_path():
    y = _mixture()
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    F, T, D = y.shape[0], y.shape[1], y.shape[2]
    K = 2
    rng = np.random.default_rng(1)
    aff0 = rng.uniform(size=(F, K, T))
    aff0 /= aff0.sum(1, keepdims=True)

    trainer = CWMMTrainer()
    m_scan = trainer.fit(
        y, initialization=jnp.asarray(aff0), iterations=4,
        use_fused_em=False)

    y_dt = jnp.swapaxes(
        jnp.asarray(y, jnp.complex64), -2, -1)  # (F, D, T)
    weight, mode, kappa, aff = cwmm_em_full(
        y_dt.real, y_dt.imag, jnp.asarray(aff0, jnp.float32),
        iterations=4, interpret=True)

    assert_allclose(
        np.asarray(weight), np.asarray(m_scan.weight[..., 0]), atol=2e-3)
    assert_allclose(
        np.asarray(kappa),
        np.asarray(m_scan.complex_watson.concentration),
        rtol=2e-2, atol=0.3)
    # modes up to phase
    overlap = np.abs(np.einsum(
        'fkd,fkd->fk', np.asarray(mode).conj(),
        np.asarray(m_scan.complex_watson.mode)))
    assert overlap.min() > 1 - 1e-3


@pytest.mark.slow
def test_trainer_fused_saliency_matches_scan():
    """Saliency-weighted Watson statistics and the L1-normalized
    mixture weight must match the scan path."""
    y = _mixture(seed=6)
    F, T, _ = y.shape
    rng = np.random.default_rng(6)
    saliency = jnp.asarray(
        rng.uniform(0.3, 1.0, size=(F, T)))
    trainer = CWMMTrainer()
    m_fused = trainer.fit(
        y, num_classes=2, iterations=3, saliency=saliency,
        use_fused_em=True)
    m_scan = trainer.fit(
        y, num_classes=2, iterations=3, saliency=saliency,
        use_fused_em=False)
    assert_allclose(
        np.asarray(m_fused.weight), np.asarray(m_scan.weight),
        atol=5e-3)
    assert_allclose(
        np.asarray(m_fused.complex_watson.concentration),
        np.asarray(m_scan.complex_watson.concentration),
        rtol=2e-2, atol=0.3)
    overlap = np.abs(np.einsum(
        'fkd,fkd->fk',
        np.asarray(m_fused.complex_watson.mode).conj(),
        np.asarray(m_scan.complex_watson.mode)))
    assert overlap.min() > 1 - 1e-3


@pytest.mark.slow
def test_trainer_fused_matches_scan_and_predict():
    y = _mixture(seed=3)
    trainer = CWMMTrainer()
    m_fused, aff = trainer.fit(
        y, num_classes=2, iterations=3, use_fused_em=True,
        _return_affiliation=True)
    m_scan = trainer.fit(
        y, num_classes=2, iterations=3, use_fused_em=False)
    assert_allclose(
        np.asarray(m_fused.weight), np.asarray(m_scan.weight), atol=5e-3)
    # the kernel's final-E affiliations equal predict() on its model
    aff_sep = m_fused.predict(y)
    assert_allclose(np.asarray(aff), np.asarray(aff_sep), atol=1e-4)
    # fit_predict plumbing
    aff_fp = trainer.fit_predict(
        y, num_classes=2, iterations=3, use_fused_em=True)
    assert_allclose(np.asarray(aff_fp), np.asarray(aff), atol=1e-6)


def test_auto_gate_off_on_cpu():
    y = _mixture(seed=4)
    trainer = CWMMTrainer()
    m_auto = trainer.fit(y, num_classes=2, iterations=2)
    m_scan = trainer.fit(
        y, num_classes=2, iterations=2, use_fused_em=False)
    assert_allclose(
        np.asarray(m_auto.complex_watson.concentration),
        np.asarray(m_scan.complex_watson.concentration))
