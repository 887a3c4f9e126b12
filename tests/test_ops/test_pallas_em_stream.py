"""Streamed long-T EM kernels (ops/pallas_em_stream.py): parity with
the scan path for signals beyond the whole-fit kernel's VMEM ceiling
(interpret mode on CPU; compiled numbers from dev runs on chip).

At D=3/K=2 the whole-fit kernel is feasible up to T ~1050, so T=1200
forces the trainer's fused routing onto the streamed path.
"""
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models.cacgmm import CACGMMTrainer

F, D, T, K = 9, 3, 1200, 2


def _mixture(seed=0, T=T):
    rng = np.random.default_rng(seed)
    atf = rng.standard_normal((F, D, 2)) + 1j * rng.standard_normal(
        (F, D, 2))
    s = rng.standard_normal((F, 2, T)) + 1j * rng.standard_normal(
        (F, 2, T))
    y = np.einsum('fdk,fkt->fdt', atf, s) + 0.3 * (
        rng.standard_normal((F, D, T))
        + 1j * rng.standard_normal((F, D, T)))
    return jnp.asarray(
        np.swapaxes(y, -2, -1).astype(np.complex64))  # (F, T, D)


def _fit_pair(y, **kwargs):
    trainer = CACGMMTrainer()
    common = dict(num_classes=K, iterations=3, t_block=None, **kwargs)
    m_stream = trainer.fit(y, use_fused_em=True, **common)
    m_scan = trainer.fit(y, use_fused_em=False, **common)
    return m_stream, m_scan


def _assert_close(m_a, m_b, atol=2e-4):
    assert m_a.weight.shape == m_b.weight.shape, (
        m_a.weight.shape, m_b.weight.shape)
    assert_allclose(np.asarray(m_a.weight, np.float64),
                    np.asarray(m_b.weight, np.float64), atol=atol)
    assert_allclose(
        np.asarray(m_a.cacg.covariance_eigenvalues, np.float64),
        np.asarray(m_b.cacg.covariance_eigenvalues, np.float64),
        atol=atol)

    def cov(m):
        v = np.asarray(m.cacg.covariance_eigenvectors)
        lam = np.asarray(m.cacg.covariance_eigenvalues)
        return np.einsum('...de,...e,...ge->...dg', v, lam, v.conj())
    assert_allclose(cov(m_a), cov(m_b), atol=10 * atol)


@pytest.mark.slow
def test_stream_per_bin_matches_scan():
    m_stream, m_scan = _fit_pair(_mixture())
    assert m_stream.weight.shape == (F, K, 1)
    _assert_close(m_stream, m_scan)


@pytest.mark.slow
def test_stream_exact_tile_multiple():
    """T an exact multiple of the 512-frame time block: no time
    padding, the t-mask degenerates to all-ones."""
    m_stream, m_scan = _fit_pair(_mixture(seed=5, T=1536))
    _assert_close(m_stream, m_scan)


@pytest.mark.slow
def test_stream_fc_matches_scan():
    m_stream, m_scan = _fit_pair(
        _mixture(seed=1), weight_constant_axis=(-3, -1))
    assert m_stream.weight.shape == (1, K, 1)
    _assert_close(m_stream, m_scan)


@pytest.mark.slow
def test_stream_saliency_and_mask():
    rng = np.random.default_rng(2)
    y = _mixture(seed=2)
    saliency = jnp.asarray(
        rng.uniform(0.2, 1.0, size=(F, T)).astype(np.float32))
    sam = rng.uniform(size=(F, K, T)) > 0.2
    sam[..., 0, :] |= ~sam.any(-2)
    m_stream, m_scan = _fit_pair(
        y, saliency=saliency, source_activity_mask=jnp.asarray(sam))
    _assert_close(m_stream, m_scan)


@pytest.mark.slow
def test_stream_resume_from_model():
    y = _mixture(seed=3)
    trainer = CACGMMTrainer()
    m0 = trainer.fit(y, num_classes=K, iterations=2,
                     use_fused_em=False, t_block=None)
    m_stream = trainer.fit(y, initialization=m0, iterations=2,
                           use_fused_em=True, t_block=None)
    m_scan = trainer.fit(y, initialization=m0, iterations=2,
                         use_fused_em=False, t_block=None)
    _assert_close(m_stream, m_scan)


@pytest.mark.slow
def test_stream_fc_batched_resume_from_broadcast_weight():
    """Regression (mirrors test_pallas_em_step): batched fc resume
    from a batch-broadcast (1, K) weight must widen the scan carry."""
    from pb_bss_tpu.models.cacgmm import CACGMM

    ys = [np.asarray(_mixture(seed=s)) for s in (6, 7)]
    yb = jnp.asarray(np.stack(ys))
    rng = np.random.default_rng(42)
    aff0 = rng.uniform(size=(2, F, K, T)).astype(np.float32)
    aff0 /= aff0.sum(-2, keepdims=True)
    trainer = CACGMMTrainer()
    m0 = trainer.fit(yb, initialization=jnp.asarray(aff0),
                     iterations=2, weight_constant_axis=(-3, -1),
                     use_fused_em=False, t_block=None)
    m_shared = CACGMM(weight=jnp.mean(m0.weight, axis=0),
                      cacg=m0.cacg)
    assert m_shared.weight.shape == (1, K, 1)
    m_stream = trainer.fit(yb, initialization=m_shared, iterations=2,
                           weight_constant_axis=(-3, -1),
                           use_fused_em=True, t_block=None)
    m_scan = trainer.fit(yb, initialization=m_shared, iterations=2,
                         weight_constant_axis=(-3, -1),
                         use_fused_em=False, t_block=None)
    _assert_close(m_stream, m_scan)


@pytest.mark.slow
def test_stream_fit_predict():
    y = _mixture(seed=4)
    trainer = CACGMMTrainer()
    aff = trainer.fit_predict(y, num_classes=K, iterations=2,
                              use_fused_em=True, t_block=None)
    model = trainer.fit(y, num_classes=K, iterations=2,
                        use_fused_em=True, t_block=None)
    assert_allclose(np.asarray(aff),
                    np.asarray(model.predict(y)), atol=1e-5)


def test_choose_tiles_production_shapes_feasible():
    """Regression: sizing the lane tile against the worst-case launch
    layout (the r5 ADVICE fix) silently removed the streamed kernel
    at the bench shape (D=6, K=3) — no tile fit the budget and long
    signals dropped to the scan path. The per-iteration layout now
    picks the lane tile and the one-shot from_init launch shrinks its
    own time block instead."""
    from pb_bss_tpu.ops.pallas_em_stream import (
        _per_lane_floats, choose_init_tile_t, choose_tiles,
    )
    # (6, 4)+saliency+mask and (8, 3) are over budget in the
    # PER-ITERATION layout itself — legitimate scan fallbacks (true
    # before and after the fix), not part of this pin
    cases = [((3, 2), dict()), ((6, 2), dict()), ((6, 3), dict()),
             ((6, 4), dict()),
             ((3, 2), dict(has_sal=True, has_mask=True)),
             ((6, 2), dict(has_sal=True, has_mask=True)),
             ((6, 3), dict(has_sal=True, has_mask=True))]
    for (d, k), knobs in cases:
            tt, tfs = choose_tiles(d, k, **knobs)
            assert tfs, (d, k, knobs)
            tti = choose_init_tile_t(d, k, tile_f=tfs[-1], **knobs)
            assert tti is not None and tt % tti == 0, (d, k, tti)
            # both launch layouts honor the budget at the chosen tiles
            budget = 10 * 2 ** 20
            assert tfs[-1] * 4 * _per_lane_floats(
                d, k, tt, init=False,
                has_sal=knobs.get('has_sal', False),
                has_mask=knobs.get('has_mask', False)) <= budget
            assert tfs[-1] * 4 * _per_lane_floats(
                d, k, tti, init=True,
                has_sal=knobs.get('has_sal', False),
                has_mask=knobs.get('has_mask', False)) <= budget


@pytest.mark.slow
def test_stream_bench_shape_parity():
    """D=6, K=3 (the bench shape) exercises the smaller from_init
    time block (tile_t_init=256 < tile_t=512)."""
    rng = np.random.default_rng(11)
    F6, D6, K6, T6 = 4, 6, 3, 700
    atf = rng.standard_normal((F6, D6, K6)) + 1j * rng.standard_normal(
        (F6, D6, K6))
    s = rng.standard_normal((F6, K6, T6)) + 1j * rng.standard_normal(
        (F6, K6, T6))
    y = np.einsum('fdk,fkt->fdt', atf, s) + 0.3 * (
        rng.standard_normal((F6, D6, T6))
        + 1j * rng.standard_normal((F6, D6, T6)))
    y = jnp.asarray(np.swapaxes(y, -2, -1).astype(np.complex64))
    trainer = CACGMMTrainer()
    common = dict(num_classes=K6, iterations=2, t_block=None)
    m_stream = trainer.fit(y, use_fused_em=True, **common)
    m_scan = trainer.fit(y, use_fused_em=False, **common)
    _assert_close(m_stream, m_scan, atol=5e-4)
