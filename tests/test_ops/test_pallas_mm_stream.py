"""Streamed long-T EM kernels for the Watson and Bingham mixtures
(ops/pallas_mm_stream.py): parity with the scan paths (interpret mode
on CPU; compiled numbers from dev runs on chip).

Kernel-level tests use a small ``tile_t`` so several time blocks hit
the accumulator without paying for a long interpret-mode trace;
trainer-level tests use T=1600 (beyond every whole-fit ceiling at
D=3/K=2 — see choose_tile_f_cwmm/cbmm) to prove the auto-routing.
"""
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models.cbmm import CBMMTrainer
from pb_bss_tpu.models.cwmm import CWMMTrainer
from pb_bss_tpu.ops.pallas_mm_stream import (
    cbmm_em_long,
    choose_tiles_mm,
    cwmm_em_long,
)

F, D, K = 9, 3, 2


def _mixture(seed=0, T=100):
    rng = np.random.default_rng(seed)
    atf = rng.standard_normal((F, D, 2)) + 1j * rng.standard_normal(
        (F, D, 2))
    s = rng.standard_normal((F, 2, T)) + 1j * rng.standard_normal(
        (F, 2, T))
    y = np.einsum('fdk,fkt->fdt', atf, s) + 0.3 * (
        rng.standard_normal((F, D, T))
        + 1j * rng.standard_normal((F, D, T)))
    y = np.swapaxes(y, -2, -1)                       # (F, T, D)
    y /= np.linalg.norm(y, axis=-1, keepdims=True)
    return jnp.asarray(y.astype(np.complex64))


def _aff0(seed, T=100, shape=(F, K)):
    rng = np.random.default_rng(seed)
    aff = rng.uniform(size=shape + (T,)).astype(np.float32)
    aff /= aff.sum(-2, keepdims=True)
    return jnp.asarray(aff)


def _assert_modes_aligned(m_a, m_b, atol=1e-3):
    """Watson modes match up to the global phase of each vector."""
    overlap = np.abs(np.einsum(
        '...d,...d->...', np.asarray(m_a), np.asarray(m_b).conj()))
    assert_allclose(overlap, 1.0, atol=atol)


# ---------------------------------------------------------------------------
# CWMM
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize('T', [100, 128])  # 128: exact tile multiple
def test_cwmm_stream_matches_scan(T):
    y = _mixture(seed=0, T=T)
    aff0 = _aff0(10, T=T)
    m_scan = CWMMTrainer().fit(
        y, initialization=aff0, iterations=3, use_fused_em=False)
    y_dt = jnp.swapaxes(y, -2, -1)
    weight, mode, kappa = cwmm_em_long(
        y_dt.real, y_dt.imag, aff0, iterations=3,
        tile_t=64, tile_f=128, interpret=True)
    assert_allclose(np.asarray(weight),
                    np.asarray(m_scan.weight[..., 0]), atol=1e-4)
    assert_allclose(np.asarray(kappa),
                    np.asarray(m_scan.complex_watson.concentration),
                    rtol=5e-3, atol=1e-2)
    _assert_modes_aligned(mode, m_scan.complex_watson.mode)


@pytest.mark.slow
def test_cwmm_stream_saliency_matches_scan():
    T = 100
    y = _mixture(seed=1, T=T)
    aff0 = _aff0(11, T=T)
    rng = np.random.default_rng(12)
    saliency = jnp.asarray(
        rng.uniform(0.2, 1.0, size=(F, T)).astype(np.float32))
    m_scan = CWMMTrainer().fit(
        y, initialization=aff0, iterations=3, saliency=saliency,
        use_fused_em=False)
    y_dt = jnp.swapaxes(y, -2, -1)
    weight, mode, kappa = cwmm_em_long(
        y_dt.real, y_dt.imag, aff0, iterations=3,
        tile_t=64, tile_f=128, interpret=True, saliency=saliency)
    assert_allclose(np.asarray(weight),
                    np.asarray(m_scan.weight[..., 0]), atol=1e-4)
    assert_allclose(np.asarray(kappa),
                    np.asarray(m_scan.complex_watson.concentration),
                    rtol=5e-3, atol=1e-2)
    _assert_modes_aligned(mode, m_scan.complex_watson.mode)


@pytest.mark.slow
def test_cwmm_stream_batched_matches_per_example():
    T = 100
    ys = [np.asarray(_mixture(seed=s, T=T)) for s in (2, 3)]
    yb = jnp.asarray(np.stack(ys))
    aff0 = _aff0(13, T=T, shape=(2, F, K))
    yb_dt = jnp.swapaxes(yb, -2, -1)
    wb, mb, kb = cwmm_em_long(
        yb_dt.real, yb_dt.imag, aff0, iterations=2,
        tile_t=64, tile_f=128, interpret=True)
    for b in range(2):
        y_dt = jnp.swapaxes(jnp.asarray(ys[b]), -2, -1)
        w1, m1, k1 = cwmm_em_long(
            y_dt.real, y_dt.imag, aff0[b], iterations=2,
            tile_t=64, tile_f=128, interpret=True)
        assert_allclose(np.asarray(wb[b]), np.asarray(w1), atol=1e-6)
        assert_allclose(np.asarray(kb[b]), np.asarray(k1), atol=1e-4)


@pytest.mark.slow
def test_cwmm_trainer_routes_long_signal():
    """T=1600 exceeds the whole-fit ceiling (choose_tile_f_cwmm is
    empty), so use_fused_em=True must route to the streamed kernel
    and still match the scan path."""
    T = 1600
    y = _mixture(seed=4, T=T)
    aff0 = _aff0(14, T=T)
    trainer = CWMMTrainer()
    m_stream = trainer.fit(y, initialization=aff0, iterations=2,
                           use_fused_em=True)
    m_scan = CWMMTrainer().fit(y, initialization=aff0, iterations=2,
                               use_fused_em=False)
    assert_allclose(np.asarray(m_stream.weight),
                    np.asarray(m_scan.weight), atol=1e-4)
    assert_allclose(
        np.asarray(m_stream.complex_watson.concentration),
        np.asarray(m_scan.complex_watson.concentration),
        rtol=5e-3, atol=1e-2)
    _assert_modes_aligned(m_stream.complex_watson.mode,
                          m_scan.complex_watson.mode)


# ---------------------------------------------------------------------------
# CBMM
# ---------------------------------------------------------------------------

def _bingham_cov(lam, vec):
    return np.einsum('...wx,...x,...zx->...wz', np.asarray(vec),
                     np.asarray(lam), np.asarray(vec).conj())


@pytest.mark.slow
@pytest.mark.parametrize('T', [100, 128])
def test_cbmm_stream_matches_scan(T):
    y = _mixture(seed=5, T=T)
    aff0 = _aff0(15, T=T)
    m_scan = CBMMTrainer().fit(
        y, initialization=aff0, iterations=3, use_fused_em=False)
    y_dt = jnp.swapaxes(y, -2, -1)
    weight, lam, vec = cbmm_em_long(
        y_dt.real, y_dt.imag, aff0, iterations=3,
        tile_t=64, tile_f=128, interpret=True)
    # the exponentially sharp Bingham posterior amplifies f32
    # scatter-rounding differences more than Watson's
    assert_allclose(np.asarray(weight),
                    np.asarray(m_scan.weight[..., 0]), atol=2e-3)
    # the Bingham parameter matrix is the gauge-free comparison
    # (eigenvector phases / near-duplicate eigenvalue bases differ)
    assert_allclose(
        _bingham_cov(lam, vec),
        _bingham_cov(m_scan.complex_bingham.covariance_eigenvalues,
                     m_scan.complex_bingham.covariance_eigenvectors),
        rtol=2e-2, atol=0.5)


@pytest.mark.slow
def test_cbmm_stream_affiliation_eps_matches_scan():
    T = 100
    y = _mixture(seed=6, T=T)
    aff0 = _aff0(16, T=T)
    m_scan = CBMMTrainer().fit(
        y, initialization=aff0, iterations=3, affiliation_eps=1e-3,
        use_fused_em=False)
    y_dt = jnp.swapaxes(y, -2, -1)
    weight, lam, vec = cbmm_em_long(
        y_dt.real, y_dt.imag, aff0, iterations=3,
        affiliation_eps=1e-3, tile_t=64, tile_f=128, interpret=True)
    assert_allclose(np.asarray(weight),
                    np.asarray(m_scan.weight[..., 0]), atol=2e-3)
    assert_allclose(
        _bingham_cov(lam, vec),
        _bingham_cov(m_scan.complex_bingham.covariance_eigenvalues,
                     m_scan.complex_bingham.covariance_eigenvectors),
        rtol=2e-2, atol=0.5)


@pytest.mark.slow
def test_cbmm_trainer_routes_long_signal():
    T = 1600
    y = _mixture(seed=7, T=T)
    aff0 = _aff0(17, T=T)
    m_stream = CBMMTrainer().fit(y, initialization=aff0, iterations=2,
                                 use_fused_em=True)
    m_scan = CBMMTrainer().fit(y, initialization=aff0, iterations=2,
                               use_fused_em=False)
    assert_allclose(np.asarray(m_stream.weight),
                    np.asarray(m_scan.weight), atol=2e-3)
    assert_allclose(
        _bingham_cov(m_stream.complex_bingham.covariance_eigenvalues,
                     m_stream.complex_bingham.covariance_eigenvectors),
        _bingham_cov(m_scan.complex_bingham.covariance_eigenvalues,
                     m_scan.complex_bingham.covariance_eigenvectors),
        rtol=2e-2, atol=0.5)


@pytest.mark.slow
def test_cwmm_stream_fc_matches_scan():
    """Frequency-constant weights (``weight_constant_axis=(-3, -1)``,
    the cross-shard psum mode) through the streamed kernel."""
    T = 100
    y = _mixture(seed=8, T=T)
    aff0 = _aff0(18, T=T)
    m_scan = CWMMTrainer().fit(
        y, initialization=aff0, iterations=3,
        weight_constant_axis=(-3, -1), use_fused_em=False)
    y_dt = jnp.swapaxes(y, -2, -1)
    weight, mode, kappa = cwmm_em_long(
        y_dt.real, y_dt.imag, aff0, iterations=3, weight_mode='fc',
        tile_t=64, tile_f=128, interpret=True)
    assert weight.shape == (K,)
    assert m_scan.weight.shape == (1, K, 1)
    assert_allclose(np.asarray(weight),
                    np.asarray(m_scan.weight[0, :, 0]), atol=1e-4)
    assert_allclose(np.asarray(kappa),
                    np.asarray(m_scan.complex_watson.concentration),
                    rtol=5e-3, atol=1e-2)
    _assert_modes_aligned(mode, m_scan.complex_watson.mode)


@pytest.mark.slow
def test_cbmm_stream_fc_matches_scan():
    T = 100
    y = _mixture(seed=9, T=T)
    aff0 = _aff0(19, T=T)
    m_scan = CBMMTrainer().fit(
        y, initialization=aff0, iterations=3,
        weight_constant_axis=(-3, -1), use_fused_em=False)
    y_dt = jnp.swapaxes(y, -2, -1)
    weight, lam, vec = cbmm_em_long(
        y_dt.real, y_dt.imag, aff0, iterations=3, weight_mode='fc',
        tile_t=64, tile_f=128, interpret=True)
    assert weight.shape == (K,)
    assert_allclose(np.asarray(weight),
                    np.asarray(m_scan.weight[0, :, 0]), atol=2e-3)
    assert_allclose(
        _bingham_cov(lam, vec),
        _bingham_cov(m_scan.complex_bingham.covariance_eigenvalues,
                     m_scan.complex_bingham.covariance_eigenvectors),
        rtol=2e-2, atol=0.5)


def test_choose_tiles_mm_bounds():
    assert choose_tiles_mm(6, 3, family='watson')[1]
    assert choose_tiles_mm(6, 3, family='bingham')[1]
    with pytest.raises(AssertionError):
        choose_tiles_mm(6, 3, family='cacg')


def test_choose_tiles_mm_both_layouts_fit_budget():
    """Regression (r5): sizing the lane tile against the worst-case
    launch made D>=7 infeasible; the from-init launch now shrinks its
    own time block instead. Both layouts must honor the budget."""
    from pb_bss_tpu.ops.pallas_mm_stream import (
        _per_lane_floats_mm, choose_init_tile_t_mm,
    )
    budget = 10 * 2 ** 20
    for family in ('watson', 'bingham'):
        for d, k in ((3, 2), (6, 3), (8, 3)):
            tt, tfs = choose_tiles_mm(d, k, family=family)
            assert tfs, (family, d, k)
            tti = choose_init_tile_t_mm(
                d, k, family=family, tile_f=tfs[-1], tile_t=tt)
            assert tti is not None and tt % tti == 0
            assert tfs[-1] * 4 * _per_lane_floats_mm(
                d, k, tt, family=family, has_sal=False,
                init=False) <= budget
            assert tfs[-1] * 4 * _per_lane_floats_mm(
                d, k, tti, family=family, has_sal=False,
                init=True) <= budget
