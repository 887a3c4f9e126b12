"""Single-kernel full-EM-loop Pallas kernel: parity with the scan-EM
path (interpret mode on CPU; the compiled kernel is exercised on real
TPU hardware by bench/dev runs, where it measured quality-equivalent
to the scan path at 3x the speed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models.cacgmm import CACGMM, CACGMMTrainer
from pb_bss_tpu.ops.pallas_em_loop import (
    cacgmm_em_full,
    cacgmm_em_full_reference,
    choose_tile_f,
)


def _mixture(F=19, D=4, T=48, K=3, seed=0):
    rng = np.random.default_rng(seed)
    atf = rng.standard_normal((F, D, 2)) + 1j * rng.standard_normal(
        (F, D, 2))
    s = rng.standard_normal((F, 2, T)) + 1j * rng.standard_normal(
        (F, 2, T))
    y = np.einsum('fdk,fkt->fdt', atf, s) + 0.3 * (
        rng.standard_normal((F, D, T))
        + 1j * rng.standard_normal((F, D, T)))
    y = y / np.linalg.norm(y, axis=1, keepdims=True)
    aff0 = rng.uniform(size=(F, K, T)).astype(np.float32)
    aff0 /= aff0.sum(1, keepdims=True)
    qf0 = np.ones((F, K, T), np.float32)
    return (jnp.asarray(y.real, jnp.float32),
            jnp.asarray(y.imag, jnp.float32),
            jnp.asarray(aff0), jnp.asarray(qf0))


@pytest.mark.parametrize('T', [48, 37])  # 37: time padding + masking
@pytest.mark.slow
def test_parity_with_scan_path(T):
    args = _mixture(T=T)
    out_p = cacgmm_em_full(*args, iterations=5, sweeps=6, interpret=True)
    out_r = cacgmm_em_full_reference(*args, iterations=5, sweeps=6)
    w_p, eig_p, v_p, aff_p = [np.asarray(x, np.float64) if i != 2
                              else np.asarray(x) for i, x in enumerate(out_p)]
    w_r, eig_r, v_r, aff_r = [np.asarray(x, np.float64) if i != 2
                              else np.asarray(x) for i, x in enumerate(out_r)]
    assert_allclose(w_p, w_r, atol=5e-5)
    assert_allclose(eig_p, eig_r, atol=5e-5)
    # affiliations are exponentially sensitive to eigenvalue rounding;
    # a loose tolerance still catches structural bugs
    assert_allclose(aff_p, aff_r, atol=5e-3)
    # eigenvectors up to per-vector phase
    overlap = np.abs(np.einsum('fkde,fkde->fkd', v_p.conj(), v_r))
    assert overlap.min() > 1 - 1e-4


@pytest.mark.parametrize('T', [48, 37])
@pytest.mark.slow
def test_parity_with_scan_path_saliency(T):
    """Saliency-weighted M-step statistics and the L1-normalized
    mixture weight must match the scan path."""
    args = _mixture(T=T)
    rng = np.random.default_rng(11)
    F = args[0].shape[0]
    saliency = jnp.asarray(
        rng.uniform(0.2, 1.0, size=(F, T)).astype(np.float32))
    out_p = cacgmm_em_full(
        *args, iterations=4, sweeps=6, interpret=True,
        saliency=saliency)
    out_r = cacgmm_em_full_reference(
        *args, iterations=4, sweeps=6, saliency=saliency)
    assert_allclose(
        np.asarray(out_p[0], np.float64),
        np.asarray(out_r[0], np.float64), atol=5e-5)  # weight
    assert_allclose(
        np.asarray(out_p[1], np.float64),
        np.asarray(out_r[1], np.float64), atol=5e-5)  # eigenvalues
    assert_allclose(
        np.asarray(out_p[3], np.float64),
        np.asarray(out_r[3], np.float64), atol=5e-3)  # affiliations


@pytest.mark.slow
def test_parity_with_scan_path_source_activity_mask():
    """The E-step's boolean class gating must match the scan path,
    including the gated classes' zero posteriors."""
    args = _mixture(T=40)
    rng = np.random.default_rng(12)
    F, K, T = args[2].shape
    sam_bool = rng.uniform(size=(F, K, T)) > 0.2
    sam_bool[..., 0, :] |= ~sam_bool.any(-2)  # no all-off frames
    sam = jnp.asarray(sam_bool.astype(np.float32))
    out_p = cacgmm_em_full(
        *args, iterations=4, sweeps=6, interpret=True,
        source_activity_mask=sam)
    out_r = cacgmm_em_full_reference(
        *args, iterations=4, sweeps=6,
        source_activity_mask=jnp.asarray(sam_bool))
    assert_allclose(
        np.asarray(out_p[0], np.float64),
        np.asarray(out_r[0], np.float64), atol=5e-5)
    assert_allclose(
        np.asarray(out_p[1], np.float64),
        np.asarray(out_r[1], np.float64), atol=5e-5)
    aff_p = np.asarray(out_p[3], np.float64)
    assert_allclose(aff_p, np.asarray(out_r[3], np.float64), atol=5e-3)
    # gated (class, frame) slots must be exactly zero in the final
    # (unclipped) E-step
    assert np.all(aff_p[~sam_bool] == 0)


@pytest.mark.slow
def test_trainer_fused_saliency_and_mask_match_scan():
    """The trainer's fused path with saliency + mask matches the scan
    path end to end (same init, same knobs)."""
    rng = np.random.default_rng(13)
    F, T, D, K = 11, 36, 3, 2
    y = (rng.standard_normal((F, T, D))
         + 1j * rng.standard_normal((F, T, D))).astype(np.complex64)
    saliency = jnp.asarray(
        rng.uniform(0.5, 1.0, size=(F, T)).astype(np.float32))
    sam = rng.uniform(size=(F, K, T)) > 0.1
    sam[..., 0, :] |= ~sam.any(-2)
    trainer = CACGMMTrainer()
    kwargs = dict(
        num_classes=K, iterations=3, saliency=saliency,
        source_activity_mask=jnp.asarray(sam))
    m_fused = trainer.fit(
        jnp.asarray(y), use_fused_em=True, **kwargs)
    m_scan = trainer.fit(
        jnp.asarray(y), use_fused_em=False, **kwargs)
    assert_allclose(
        np.asarray(m_fused.weight), np.asarray(m_scan.weight),
        atol=1e-4)
    assert_allclose(
        np.asarray(m_fused.cacg.covariance_eigenvalues),
        np.asarray(m_scan.cacg.covariance_eigenvalues), atol=1e-4)


@pytest.mark.slow
def test_trainer_fused_matches_scan():
    rng = np.random.default_rng(1)
    F, T, D, K = 13, 40, 3, 2
    y = (rng.standard_normal((F, T, D))
         + 1j * rng.standard_normal((F, T, D))).astype(np.complex64)
    trainer = CACGMMTrainer()
    m_fused = trainer.fit(
        jnp.asarray(y), num_classes=K, iterations=3, use_fused_em=True)
    m_scan = trainer.fit(
        jnp.asarray(y), num_classes=K, iterations=3, use_fused_em=False)
    assert_allclose(
        np.asarray(m_fused.weight), np.asarray(m_scan.weight), atol=1e-4)
    assert_allclose(
        np.asarray(m_fused.cacg.covariance_eigenvalues),
        np.asarray(m_scan.cacg.covariance_eigenvalues), atol=1e-4)
    # fused model must be usable downstream
    aff = m_fused.predict(jnp.asarray(y))
    assert aff.shape == (F, K, T)
    assert_allclose(np.asarray(aff.sum(-2)), 1.0, atol=1e-5)


@pytest.mark.slow
def test_trainer_fused_resume_from_model():
    rng = np.random.default_rng(2)
    F, T, D, K = 9, 32, 3, 2
    y = (rng.standard_normal((F, T, D))
         + 1j * rng.standard_normal((F, T, D))).astype(np.complex64)
    trainer = CACGMMTrainer()
    m0 = trainer.fit(
        jnp.asarray(y), num_classes=K, iterations=2, use_fused_em=False)
    m_fused = trainer.fit(
        jnp.asarray(y), initialization=m0, iterations=2, use_fused_em=True)
    m_scan = trainer.fit(
        jnp.asarray(y), initialization=m0, iterations=2, use_fused_em=False)
    assert_allclose(
        np.asarray(m_fused.cacg.covariance_eigenvalues),
        np.asarray(m_scan.cacg.covariance_eigenvalues), atol=1e-4)


@pytest.mark.slow
def test_fit_predict_matches_fit_then_predict():
    """The kernel's final (unclipped) E-step must equal
    model.predict() on the returned model exactly."""
    rng = np.random.default_rng(4)
    F, T, D, K = 11, 40, 3, 2
    y = (rng.standard_normal((F, T, D))
         + 1j * rng.standard_normal((F, T, D))).astype(np.complex64)
    trainer = CACGMMTrainer()
    aff_joint = trainer.fit_predict(
        jnp.asarray(y), num_classes=K, iterations=3, use_fused_em=True)
    model = trainer.fit(
        jnp.asarray(y), num_classes=K, iterations=3, use_fused_em=True)
    aff_sep = model.predict(jnp.asarray(y))
    assert_allclose(
        np.asarray(aff_joint), np.asarray(aff_sep), atol=1e-5)
    # and the scan path of fit_predict still works
    aff_scan = trainer.fit_predict(
        jnp.asarray(y), num_classes=K, iterations=3, use_fused_em=False)
    assert aff_scan.shape == aff_joint.shape


def test_auto_gate_is_off_on_cpu():
    rng = np.random.default_rng(3)
    F, T, D, K = 7, 24, 3, 2
    y = (rng.standard_normal((F, T, D))
         + 1j * rng.standard_normal((F, T, D))).astype(np.complex64)
    trainer = CACGMMTrainer()
    m_auto = trainer.fit(jnp.asarray(y), num_classes=K, iterations=2)
    m_scan = trainer.fit(
        jnp.asarray(y), num_classes=K, iterations=2, use_fused_em=False)
    assert_allclose(
        np.asarray(m_auto.cacg.covariance_eigenvalues),
        np.asarray(m_scan.cacg.covariance_eigenvalues))


@pytest.mark.slow
def test_batch_folding_is_bit_exact():
    """(B, F, ...) inputs fold the batch into the bin axis — bins are
    independent, so per-example results are bit-identical to the 3D
    call (and lane tiles fill with far less padding than vmap)."""
    rng = np.random.default_rng(7)
    B, F, D, T, K = 3, 17, 4, 40, 2
    y = rng.standard_normal((B, F, D, T)) + 1j * rng.standard_normal(
        (B, F, D, T))
    y /= np.linalg.norm(y, axis=2, keepdims=True)
    aff0 = rng.uniform(size=(B, F, K, T)).astype(np.float32)
    aff0 /= aff0.sum(2, keepdims=True)
    qf0 = np.ones((B, F, K, T), np.float32)
    args4 = (jnp.asarray(y.real, jnp.float32),
             jnp.asarray(y.imag, jnp.float32),
             jnp.asarray(aff0), jnp.asarray(qf0))
    out4 = cacgmm_em_full(*args4, iterations=3, interpret=True)
    out3 = cacgmm_em_full(
        *(a[1] for a in args4), iterations=3, interpret=True)
    assert out4[1].shape == (B, F, K, D)
    assert_allclose(np.asarray(out4[1][1]), np.asarray(out3[1]), rtol=0)
    assert_allclose(np.asarray(out4[3][1]), np.asarray(out3[3]), rtol=0)


@pytest.mark.slow
def test_vmap_batching():
    args = _mixture(F=9, D=3, T=24)
    batched = [jnp.stack([a, a * 0.9 + 0.05]) for a in args]
    # re-normalize the perturbed affiliations
    batched[2] = batched[2] / batched[2].sum(-2, keepdims=True)
    out = jax.vmap(
        lambda yr, yi, a, q: cacgmm_em_full(
            yr, yi, a, q, iterations=2, interpret=True)
    )(*batched)
    assert out[0].shape == (2, 9, 3)
    single = cacgmm_em_full(*args, iterations=2, interpret=True)
    assert_allclose(
        np.asarray(out[1][0]), np.asarray(single[1]), atol=1e-5)


def test_choose_tile_f_respects_vmem():
    # benchmark shape: 128 feasible, 256 measured to exceed the 16 MB
    # scoped VMEM limit on v5e (double-buffered blocks)
    bench = choose_tile_f(6, 3, 304)
    assert 128 in bench and 256 not in bench
    # short signals allow wider tiles
    assert choose_tile_f(6, 3, 64)[0] >= 256
    # very long signals are infeasible -> empty (caller falls back to
    # the scan path)
    assert choose_tile_f(6, 3, 100000) == []
