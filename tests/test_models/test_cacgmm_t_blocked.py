"""Time-blocked cACGMM EM (long-utterance path, SURVEY §5 long-context
row): trajectory parity with the scan path and a long-T run.

The blocked path folds each block's posterior straight into the M-step
accumulators, so the (F, K, T) posterior and the (F, K, D, T)
projection never materialize at full length — only the reduction
order differs from the scan path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pb_bss_tpu.models import CACGMM, CACGMMTrainer
from pb_bss_tpu.models.cacgmm import (
    T_BLOCK_AUTO_THRESHOLD,
    _fit_em_t_blocked,
)


def _data(F=8, T=300, D=4, seed=0):
    rng = np.random.default_rng(seed)
    atf = rng.standard_normal((F, D, 2)) \
        + 1j * rng.standard_normal((F, D, 2))
    s = rng.standard_normal((F, 2, T)) \
        + 1j * rng.standard_normal((F, 2, T))
    n = 0.3 * (rng.standard_normal((F, D, T))
               + 1j * rng.standard_normal((F, D, T)))
    y = np.einsum('fdk,fkt->fdt', atf, s) + n
    return np.swapaxes(y, -2, -1)  # (F, T, D)


def _init(F, K, T, seed=1):
    rng = np.random.default_rng(seed)
    init = rng.uniform(size=(F, K, T))
    return init / init.sum(-2, keepdims=True)


@pytest.mark.parametrize('t_block', [64, 128])
@pytest.mark.slow
def test_matches_scan_path(t_block):
    """Same init -> same model as the scan path; t_block=64 exercises
    an uneven tail block (300 = 4*64 + 44)."""
    F, T, D, K = 8, 300, 4, 3
    y = _data(F, T, D)
    init = _init(F, K, T)

    m_scan = CACGMMTrainer().fit(
        y, initialization=init, iterations=8,
        use_fused_em=False, t_block=None)
    m_blocked = CACGMMTrainer().fit(
        y, initialization=init, iterations=8,
        use_fused_em=False, t_block=t_block)

    np.testing.assert_allclose(
        np.asarray(m_blocked.weight), np.asarray(m_scan.weight),
        rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(m_blocked.cacg.covariance_eigenvalues),
        np.asarray(m_scan.cacg.covariance_eigenvalues),
        rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(m_blocked.predict(y)),
        np.asarray(m_scan.predict(y)),
        atol=1e-6)


@pytest.mark.slow
def test_model_init_and_fit_predict():
    """Model-init path (first E-step inside the blocked loop) and the
    blocked fit_predict affiliations."""
    F, T, D, K = 6, 200, 3, 2
    y = _data(F, T, D, seed=3)
    init = _init(F, K, T, seed=4)

    base = CACGMMTrainer().fit(
        y, initialization=init, iterations=2, use_fused_em=False,
        t_block=None)

    m_scan = CACGMMTrainer().fit(
        y, initialization=base, iterations=3, use_fused_em=False,
        t_block=None)
    m_blocked = CACGMMTrainer().fit(
        y, initialization=base, iterations=3, use_fused_em=False,
        t_block=64)
    np.testing.assert_allclose(
        np.asarray(m_blocked.cacg.covariance_eigenvalues),
        np.asarray(m_scan.cacg.covariance_eigenvalues),
        rtol=1e-6, atol=1e-8)

    aff_blocked = CACGMMTrainer().fit_predict(
        y, initialization=init, iterations=3, use_fused_em=False,
        t_block=64)
    aff_scan = CACGMMTrainer().fit_predict(
        y, initialization=init, iterations=3, use_fused_em=False,
        t_block=None)
    np.testing.assert_allclose(
        np.asarray(aff_blocked), np.asarray(aff_scan), atol=1e-6)


@pytest.mark.slow
def test_long_signal_auto_blocks():
    """T=30k (beyond the fused kernel's VMEM ceiling and the scan
    path's comfortable z-projection size) fits via the auto-enabled
    blocked path and matches a T-folded computation of the same
    statistics."""
    F, D, K = 4, 3, 2
    T = 30_000
    assert T > T_BLOCK_AUTO_THRESHOLD
    rng = np.random.default_rng(9)
    atf = rng.standard_normal((F, D, K)) \
        + 1j * rng.standard_normal((F, D, K))
    s = rng.standard_normal((F, K, T)) \
        + 1j * rng.standard_normal((F, K, T))
    y = np.swapaxes(np.einsum('fdk,fkt->fdt', atf, s), -2, -1)
    init = _init(F, K, T, seed=5)

    model = CACGMMTrainer().fit(y, initialization=init, iterations=3)
    evs = np.asarray(model.cacg.covariance_eigenvalues)
    assert np.all(np.isfinite(evs))

    # cross-check against the explicit scan path on the same data
    m_scan = CACGMMTrainer().fit(
        y, initialization=init, iterations=3, use_fused_em=False,
        t_block=None)
    np.testing.assert_allclose(
        evs, np.asarray(m_scan.cacg.covariance_eigenvalues),
        rtol=1e-6, atol=1e-8)
