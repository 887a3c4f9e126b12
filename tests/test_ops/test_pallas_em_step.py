"""Per-iteration fused EM for frequency-constant weights
(ops/pallas_em_step.py): parity with the scan path under
``weight_constant_axis=(-3, -1)`` (interpret mode on CPU; the compiled
kernels are exercised on real TPU hardware by bench/dev runs)."""
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models.cacgmm import CACGMMTrainer
from pb_bss_tpu.ops.pallas_em_step import choose_tile_f

WCA = (-3, -1)


def _mixture(F=17, D=4, T=40, K=3, seed=0):
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
    common = dict(num_classes=3, iterations=3,
                  weight_constant_axis=WCA, **kwargs)
    m_fc = trainer.fit(y, use_fused_em=True, **common)
    m_scan = trainer.fit(y, use_fused_em=False, **common)
    return m_fc, m_scan


def _assert_models_close(m_fc, m_scan, atol=1e-4):
    assert m_fc.weight.shape == m_scan.weight.shape, (
        m_fc.weight.shape, m_scan.weight.shape)
    assert_allclose(
        np.asarray(m_fc.weight, np.float64),
        np.asarray(m_scan.weight, np.float64), atol=atol)
    assert_allclose(
        np.asarray(m_fc.cacg.covariance_eigenvalues, np.float64),
        np.asarray(m_scan.cacg.covariance_eigenvalues, np.float64),
        atol=atol)
    # Eigenvectors are compared through the reassembled covariance
    # (the basis itself is non-unique in near-degenerate eigenspaces,
    # where the warm-started and cold Jacobi legitimately differ).
    def cov(m):
        v = np.asarray(m.cacg.covariance_eigenvectors)
        lam = np.asarray(m.cacg.covariance_eigenvalues)
        return np.einsum('...de,...e,...ge->...dg', v, lam, v.conj())
    assert_allclose(cov(m_fc), cov(m_scan), atol=10 * atol)


@pytest.mark.parametrize('T', [40, 37])  # 37: time padding + masking
@pytest.mark.slow
def test_fc_parity_with_scan(T):
    y = _mixture(T=T)
    m_fc, m_scan = _fit_pair(y)
    assert m_fc.weight.shape == (1, 3, 1)
    _assert_models_close(m_fc, m_scan)


@pytest.mark.slow
def test_fc_parity_saliency():
    y = _mixture(seed=1)
    rng = np.random.default_rng(11)
    saliency = jnp.asarray(rng.uniform(
        0.2, 1.0, size=(y.shape[0], y.shape[1])).astype(np.float32))
    m_fc, m_scan = _fit_pair(y, saliency=saliency)
    _assert_models_close(m_fc, m_scan)


@pytest.mark.slow
def test_fc_parity_source_activity_mask():
    y = _mixture(seed=2)
    rng = np.random.default_rng(12)
    F, T, _ = y.shape
    sam = rng.uniform(size=(F, 3, T)) > 0.2
    sam[..., 0, :] |= ~sam.any(-2)
    m_fc, m_scan = _fit_pair(
        y, source_activity_mask=jnp.asarray(sam))
    # gated classes sharpen posteriors -> a little more warm-vs-cold
    # Jacobi sensitivity than the unmasked cases
    _assert_models_close(m_fc, m_scan, atol=2e-3)


@pytest.mark.slow
def test_fc_resume_from_model():
    y = _mixture(seed=3)
    trainer = CACGMMTrainer()
    m0 = trainer.fit(y, num_classes=3, iterations=2,
                     weight_constant_axis=WCA, use_fused_em=False)
    assert m0.weight.shape == (1, 3, 1)
    m_fc = trainer.fit(y, initialization=m0, iterations=2,
                       weight_constant_axis=WCA, use_fused_em=True)
    m_scan = trainer.fit(y, initialization=m0, iterations=2,
                         weight_constant_axis=WCA, use_fused_em=False)
    _assert_models_close(m_fc, m_scan)


@pytest.mark.slow
def test_fc_batched_matches_per_example():
    """(B, F, T, D) input: kernels fold the batch into bins but the
    weight reduction stays per-utterance."""
    ys = [np.asarray(_mixture(seed=s, F=11, T=32)) for s in (4, 5)]
    yb = jnp.asarray(np.stack(ys))
    # shared explicit init: the random init draws differently for
    # (B, F, K, T) and (F, K, T) shapes
    rng = np.random.default_rng(40)
    aff0 = rng.uniform(size=(2, 11, 3, 32)).astype(np.float32)
    aff0 /= aff0.sum(-2, keepdims=True)
    trainer = CACGMMTrainer()
    mb = trainer.fit(yb, initialization=jnp.asarray(aff0),
                     iterations=3,
                     weight_constant_axis=WCA, use_fused_em=True)
    assert mb.weight.shape == (2, 1, 3, 1)
    for b, y in enumerate(ys):
        m1 = trainer.fit(jnp.asarray(y),
                         initialization=jnp.asarray(aff0[b]),
                         iterations=3,
                         weight_constant_axis=WCA, use_fused_em=True)
        assert_allclose(
            np.asarray(mb.weight[b]), np.asarray(m1.weight),
            atol=1e-6)
        assert_allclose(
            np.asarray(mb.cacg.covariance_eigenvalues[b]),
            np.asarray(m1.cacg.covariance_eigenvalues), atol=1e-6)


@pytest.mark.slow
def test_fc_batched_resume_from_broadcast_weight():
    """Regression: a batched resume from a model whose weight is
    broadcast over the batch ((1, K) out of ``_fc_init_weight``) used
    to start the scan carry as (1, K) against the (B, K) carry output
    (TypeError in lax.scan)."""
    from pb_bss_tpu.models.cacgmm import CACGMM

    ys = [np.asarray(_mixture(seed=s, F=11, T=32)) for s in (7, 8)]
    yb = jnp.asarray(np.stack(ys))
    rng = np.random.default_rng(41)
    aff0 = rng.uniform(size=(2, 11, 3, 32)).astype(np.float32)
    aff0 /= aff0.sum(-2, keepdims=True)
    trainer = CACGMMTrainer()
    m0 = trainer.fit(yb, initialization=jnp.asarray(aff0),
                     iterations=2, weight_constant_axis=WCA,
                     use_fused_em=False)
    assert m0.weight.shape == (2, 1, 3, 1)
    # shared global weight, still batched eigenpairs: the weight
    # broadcasts over B (reference cacgmm.py:186-200 broadcast rules)
    m_shared = CACGMM(weight=jnp.mean(m0.weight, axis=0),
                      cacg=m0.cacg)
    assert m_shared.weight.shape == (1, 3, 1)
    m_fc = trainer.fit(yb, initialization=m_shared, iterations=2,
                       weight_constant_axis=WCA, use_fused_em=True)
    m_scan = trainer.fit(yb, initialization=m_shared, iterations=2,
                         weight_constant_axis=WCA, use_fused_em=False)
    _assert_models_close(m_fc, m_scan)


@pytest.mark.slow
def test_fc_inline_aligner_matches_scan():
    """The inline permutation aligner runs between fused kernel calls
    (the kernel emits the posterior; the mapping permutes the
    per-class state), replicating the scan path's align-then-M
    (reference cacgmm.py:260-267)."""
    from pb_bss_tpu.permutation_alignment import (
        GreedyPermutationAlignment,
    )
    y = _mixture(seed=20)  # F=17 (odd, as the aligner expects)
    aligner = GreedyPermutationAlignment()
    common = dict(num_classes=3, iterations=3,
                  weight_constant_axis=WCA,
                  inline_permutation_aligner=aligner)
    trainer = CACGMMTrainer()
    m_fc = trainer.fit(y, use_fused_em=True, **common)
    m_scan = trainer.fit(y, use_fused_em=False, **common)
    _assert_models_close(m_fc, m_scan, atol=2e-3)


@pytest.mark.slow
def test_fc_inline_aligner_resume_from_model():
    from pb_bss_tpu.permutation_alignment import (
        GreedyPermutationAlignment,
    )
    y = _mixture(seed=21)
    aligner = GreedyPermutationAlignment()
    trainer = CACGMMTrainer()
    m0 = trainer.fit(y, num_classes=3, iterations=2,
                     weight_constant_axis=WCA, use_fused_em=False)
    common = dict(initialization=m0, iterations=2,
                  weight_constant_axis=WCA,
                  inline_permutation_aligner=aligner)
    m_fc = trainer.fit(y, use_fused_em=True, **common)
    m_scan = trainer.fit(y, use_fused_em=False, **common)
    _assert_models_close(m_fc, m_scan, atol=2e-3)


@pytest.mark.slow
def test_fc_fit_predict():
    y = _mixture(seed=6)
    trainer = CACGMMTrainer()
    aff = trainer.fit_predict(
        y, num_classes=3, iterations=3, weight_constant_axis=WCA,
        use_fused_em=True)
    model = trainer.fit(
        y, num_classes=3, iterations=3, weight_constant_axis=WCA,
        use_fused_em=True)
    assert_allclose(
        np.asarray(aff), np.asarray(model.predict(y)), atol=1e-6)
    assert_allclose(np.asarray(aff.sum(-2)), 1.0, atol=1e-5)


def test_fc_auto_gate_off_on_cpu():
    y = _mixture(F=7, T=24)
    trainer = CACGMMTrainer()
    m_auto = trainer.fit(y, num_classes=3, iterations=2,
                         weight_constant_axis=WCA)
    m_scan = trainer.fit(y, num_classes=3, iterations=2,
                         weight_constant_axis=WCA, use_fused_em=False)
    assert_allclose(
        np.asarray(m_auto.cacg.covariance_eigenvalues),
        np.asarray(m_scan.cacg.covariance_eigenvalues))


def test_choose_tile_f_bounds():
    assert 128 in choose_tile_f(6, 3, 304)
    assert choose_tile_f(6, 3, 100000) == []
