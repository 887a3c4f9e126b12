"""Fused E-step + M-statistics kernel for the vMF x cACG integration
model (ops/pallas_integration_em.py): statistic parity against an XLA
reference computation and trainer-level parity with the pure-XLA scan
path (interpret mode on CPU; the compiled kernel is exercised on real
TPU hardware by bench/dev runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models.vmfcacgmm import VMFCACGMM, VMFCACGMMTrainer
from pb_bss_tpu.ops.pallas_integration_em import (
    choose_tile_f,
    vmfcacgmm_e_stats,
)


def _problem(F=17, T=40, D=4, E=8, K=3, seed=0):
    rng = np.random.default_rng(seed)
    atf = rng.standard_normal((F, D, K)) + 1j * rng.standard_normal(
        (F, D, K))
    s = rng.standard_normal((F, K, T)) + 1j * rng.standard_normal(
        (F, K, T))
    y = np.einsum('fdk,fkt->fdt', atf, s) + 0.2 * (
        rng.standard_normal((F, D, T))
        + 1j * rng.standard_normal((F, D, T)))
    obs = np.swapaxes(y, 1, 2).astype(np.complex64)  # (F, T, D)
    obs /= np.linalg.norm(obs, axis=-1, keepdims=True)
    emb = rng.standard_normal((F, T, E)).astype(np.float32)
    return jnp.asarray(obs), jnp.asarray(emb)


def _random_model(F, D, E, K, seed=1):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((F, K, D, D)) + 1j * rng.standard_normal(
        (F, K, D, D))
    cov = np.einsum('fkde,fkce->fkdc', a, a.conj()) / D
    cov += 2 * np.eye(D)  # well-conditioned: tight parity expected
    eigval, eigvec = np.linalg.eigh(cov)
    eigval /= eigval.max(-1, keepdims=True)
    mu = rng.standard_normal((K, E))
    mu /= np.linalg.norm(mu, axis=-1, keepdims=True)
    from pb_bss_tpu.models.complex_angular_central_gaussian import (
        ComplexAngularCentralGaussian,
    )
    from pb_bss_tpu.models.von_mises_fisher import VonMisesFisher
    weight = rng.uniform(0.5, 1.0, (F, K))
    weight /= weight.sum(-1, keepdims=True)
    return VMFCACGMM(
        weight=jnp.asarray(weight, jnp.float32),
        vmf=VonMisesFisher(
            mean=jnp.asarray(mu, jnp.float32),
            concentration=jnp.asarray(
                rng.uniform(1.0, 20.0, K), jnp.float32)),
        cacg=ComplexAngularCentralGaussian(
            covariance_eigenvalues=jnp.asarray(eigval, jnp.float32),
            covariance_eigenvectors=jnp.asarray(eigvec, jnp.complex64)),
    )


@pytest.mark.parametrize('T', [40, 37])  # 37: time padding + masking
@pytest.mark.slow
def test_e_stats_parity_with_xla(T):
    """One kernel pass == XLA E-step + the three M-statistic
    reductions, on identical params."""
    F, D, E, K = 17, 4, 8, 3
    obs, emb = _problem(F=F, T=T, D=D, E=E, K=K)
    model = _random_model(F, D, E, K)
    eps = 1e-10

    # XLA reference (the scan path's per-iteration computation)
    aff, qf = model._predict(obs, emb, affiliation_eps=eps)
    qf = jnp.maximum(qf, 10 * jnp.finfo(jnp.float32).tiny)
    y_tl = jnp.swapaxes(obs, -1, -2)  # (F, D, T)
    w = aff / qf
    scatter_r = jnp.einsum(
        'fkt,fdt,fet->fkde', w, y_tl, y_tl.conj(),
        precision=jax.lax.Precision.HIGHEST)
    asum_r = jnp.sum(aff, axis=-1)  # (F, K)
    res_r = jnp.einsum('fkt,fte->ke', aff, emb)

    lam = model.cacg.covariance_eigenvalues
    scatter, asum, res = vmfcacgmm_e_stats(
        y_tl.real.astype(jnp.float32), y_tl.imag.astype(jnp.float32),
        jnp.swapaxes(emb, -1, -2),
        model.cacg.covariance_eigenvectors.real,
        model.cacg.covariance_eigenvectors.imag,
        1. / lam, jnp.sum(jnp.log(lam), axis=-1),
        model.weight, model.vmf.mean, model.vmf.concentration,
        model.vmf.log_norm(), affiliation_eps=eps, interpret=True)

    assert_allclose(np.asarray(asum, np.float64),
                    np.asarray(asum_r, np.float64),
                    rtol=0, atol=T * 2e-5)
    assert_allclose(np.asarray(res, np.float64),
                    np.asarray(res_r, np.float64),
                    rtol=0, atol=F * T * 2e-5)
    assert_allclose(np.asarray(scatter, np.complex128),
                    np.asarray(scatter_r, np.complex128),
                    rtol=0, atol=T * 2e-5)
    # hermitian by construction
    s = np.asarray(scatter)
    assert_allclose(s, np.conj(np.swapaxes(s, -1, -2)), atol=0)


@pytest.mark.parametrize('weights', [(1., 1.), (0.5, 2.)])
@pytest.mark.slow
def test_trainer_fused_matches_scan(weights):
    spatial_weight, spectral_weight = weights
    obs, emb = _problem()
    kw = dict(num_classes=3, iterations=4,
              spatial_weight=spatial_weight,
              spectral_weight=spectral_weight)
    tr = VMFCACGMMTrainer()
    m_f = tr.fit(obs, emb, use_fused_em=True, **kw)
    m_s = tr.fit(obs, emb, use_fused_em=False, **kw)
    assert_allclose(np.asarray(m_f.weight, np.float64),
                    np.asarray(m_s.weight, np.float64), atol=1e-4)
    assert_allclose(
        np.asarray(m_f.cacg.covariance_eigenvalues, np.float64),
        np.asarray(m_s.cacg.covariance_eigenvalues, np.float64),
        atol=1e-3)
    assert_allclose(np.asarray(m_f.vmf.mean, np.float64),
                    np.asarray(m_s.vmf.mean, np.float64), atol=1e-3)
    assert_allclose(
        np.asarray(m_f.vmf.concentration, np.float64),
        np.asarray(m_s.vmf.concentration, np.float64),
        rtol=1e-3, atol=1e-3)
    # the fused model must be usable downstream
    aff = m_f.predict(obs, emb)
    aff_s = m_s.predict(obs, emb)
    assert_allclose(np.asarray(aff.sum(-2)), 1.0, atol=1e-5)
    # affiliations are exponentially sensitive to parameter rounding;
    # a loose tolerance still catches structural bugs
    assert_allclose(np.asarray(aff, np.float64),
                    np.asarray(aff_s, np.float64), atol=2e-2)


@pytest.mark.parametrize('covariance_type', ['spherical', 'diagonal'])
@pytest.mark.slow
def test_gcacgmm_trainer_fused_matches_scan(covariance_type):
    from pb_bss_tpu.models.gcacgmm import GCACGMMTrainer
    obs, emb = _problem()
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    kw = dict(num_classes=3, iterations=4,
              covariance_type=covariance_type)
    tr = GCACGMMTrainer()
    m_f = tr.fit(obs, emb, use_fused_em=True, **kw)
    m_s = tr.fit(obs, emb, use_fused_em=False, **kw)
    assert_allclose(np.asarray(m_f.weight, np.float64),
                    np.asarray(m_s.weight, np.float64), atol=1e-4)
    assert_allclose(
        np.asarray(m_f.cacg.covariance_eigenvalues, np.float64),
        np.asarray(m_s.cacg.covariance_eigenvalues, np.float64),
        atol=1e-3)
    assert_allclose(np.asarray(m_f.gaussian.mean, np.float64),
                    np.asarray(m_s.gaussian.mean, np.float64),
                    atol=1e-4)
    assert_allclose(
        np.asarray(m_f.gaussian.covariance, np.float64),
        np.asarray(m_s.gaussian.covariance, np.float64),
        rtol=1e-3, atol=1e-6)
    aff = m_f.predict(obs, emb)
    aff_s = m_s.predict(obs, emb)
    assert_allclose(np.asarray(aff, np.float64),
                    np.asarray(aff_s, np.float64), atol=2e-2)


@pytest.mark.slow
def test_gcacgmm_fused_fixed_covariance():
    from pb_bss_tpu.models.gcacgmm import GCACGMMTrainer
    obs, emb = _problem(F=9, T=32)
    fixed = jnp.asarray(np.full(3, 0.7), jnp.float32)
    tr = GCACGMMTrainer()
    m_f = tr.fit(obs, emb, num_classes=3, iterations=3,
                 covariance_type='spherical', fixed_covariance=fixed,
                 use_fused_em=True)
    m_s = tr.fit(obs, emb, num_classes=3, iterations=3,
                 covariance_type='spherical', fixed_covariance=fixed,
                 use_fused_em=False)
    assert_allclose(np.asarray(m_f.gaussian.covariance), 0.7, atol=0)
    assert_allclose(np.asarray(m_f.gaussian.mean, np.float64),
                    np.asarray(m_s.gaussian.mean, np.float64),
                    atol=1e-4)


@pytest.mark.parametrize('model', ['vmf', 'gcacg'])
@pytest.mark.slow
def test_batched_fit_folds_into_bins(model):
    """(B, F, T, D) fits: the fused 4D path must equal per-utterance
    3D fused fits exactly (same folding semantics), and the scan path
    must broadcast correctly."""
    from pb_bss_tpu.models.gcacgmm import GCACGMMTrainer
    rng = np.random.default_rng(5)
    B, F, T, D, E, K = 2, 9, 32, 3, 6, 2
    obs = (rng.standard_normal((B, F, T, D))
           + 1j * rng.standard_normal((B, F, T, D))
           ).astype(np.complex64)
    obs /= np.linalg.norm(obs, axis=-1, keepdims=True)
    emb = rng.standard_normal((B, F, T, E)).astype(np.float32)
    init = rng.uniform(size=(B, F, K, T)).astype(np.float32)
    init /= init.sum(-2, keepdims=True)

    if model == 'vmf':
        tr = VMFCACGMMTrainer()
        kw = {}
    else:
        tr = GCACGMMTrainer()
        kw = {'covariance_type': 'spherical'}
    m4 = tr.fit(jnp.asarray(obs), jnp.asarray(emb),
                initialization=jnp.asarray(init), iterations=3,
                use_fused_em=True, **kw)
    ms = tr.fit(jnp.asarray(obs), jnp.asarray(emb),
                initialization=jnp.asarray(init), iterations=3,
                use_fused_em=False, **kw)
    assert m4.weight.shape == (B, F, K)
    assert_allclose(np.asarray(m4.weight, np.float64),
                    np.asarray(ms.weight, np.float64), atol=1e-4)
    for b in range(B):
        m3 = tr.fit(jnp.asarray(obs[b]), jnp.asarray(emb[b]),
                    initialization=jnp.asarray(init[b]), iterations=3,
                    use_fused_em=True, **kw)
        assert_allclose(np.asarray(m4.weight[b]),
                        np.asarray(m3.weight), atol=0)
        assert_allclose(np.asarray(m4.cacg.covariance_eigenvalues[b]),
                        np.asarray(m3.cacg.covariance_eigenvalues),
                        atol=0)
    aff = m4.predict(jnp.asarray(obs), jnp.asarray(emb))
    assert aff.shape == (B, F, K, T)
    assert_allclose(np.asarray(aff.sum(-2)), 1.0, atol=1e-5)


@pytest.mark.parametrize('model', ['vmf', 'gcacg'])
@pytest.mark.slow
def test_trainer_fused_saliency_matches_scan(model):
    """Saliency weights every in-kernel M-statistic (a*s) and the
    L1-normalized weight, matching the scan path's
    masked_affiliation semantics."""
    from pb_bss_tpu.models.gcacgmm import GCACGMMTrainer
    obs, emb = _problem(F=9, T=32)
    rng = np.random.default_rng(8)
    saliency = jnp.asarray(
        rng.uniform(0.3, 1.0, size=obs.shape[:2]), jnp.float32)
    if model == 'vmf':
        tr = VMFCACGMMTrainer()
        kw = {}
    else:
        tr = GCACGMMTrainer()
        kw = {'covariance_type': 'diagonal'}
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    m_f = tr.fit(obs, emb, num_classes=3, iterations=3,
                 saliency=saliency, use_fused_em=True, **kw)
    m_s = tr.fit(obs, emb, num_classes=3, iterations=3,
                 saliency=saliency, use_fused_em=False, **kw)
    assert_allclose(np.asarray(m_f.weight, np.float64),
                    np.asarray(m_s.weight, np.float64), atol=1e-4)
    assert_allclose(
        np.asarray(m_f.cacg.covariance_eigenvalues, np.float64),
        np.asarray(m_s.cacg.covariance_eigenvalues, np.float64),
        atol=1e-3)
    if model == 'vmf':
        assert_allclose(np.asarray(m_f.vmf.mean, np.float64),
                        np.asarray(m_s.vmf.mean, np.float64),
                        atol=1e-3)
        assert_allclose(
            np.asarray(m_f.vmf.concentration, np.float64),
            np.asarray(m_s.vmf.concentration, np.float64),
            rtol=1e-3, atol=1e-3)
    else:
        assert_allclose(np.asarray(m_f.gaussian.mean, np.float64),
                        np.asarray(m_s.gaussian.mean, np.float64),
                        atol=1e-4)
        assert_allclose(
            np.asarray(m_f.gaussian.covariance, np.float64),
            np.asarray(m_s.gaussian.covariance, np.float64),
            rtol=1e-3, atol=1e-6)


def test_fused_ineligible_on_cpu_auto():
    """'auto' must not route to the (interpret, slow) kernel on CPU."""
    from pb_bss_tpu.models.vmfcacgmm import _fused_integration_eligible
    obs, emb = _problem(F=5, T=16)
    assert not _fused_integration_eligible(
        obs, emb, 3, None, (-1,), False)


def test_choose_tile_f_rejects_oversized():
    assert choose_tile_f(6, 8, 3, 304) is not None
    assert choose_tile_f(6, 8, 3, 100_000) is None


def test_integration_routing_matrix(monkeypatch):
    """Dispatch pins for the integration trainers (the companion of
    tests/test_models/test_cacgmm_routing.py): with the backend
    reporting TPU, 'auto' picks the per-iteration kernel exactly for
    the supported knob set, GCACGMM's 'full' covariance stays on the
    scan (the measured negative decision in DESIGN's kernel table),
    and 'loop' remains an explicit opt-in."""
    import jax
    import numpy as np
    from pb_bss_tpu.models.vmfcacgmm import (
        _fused_integration_eligible,
        _resolve_fused_mode,
    )

    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    rng = np.random.default_rng(0)
    F, T, D, E, K = 9, 60, 4, 5, 2
    y = jnp.asarray(
        (rng.standard_normal((F, T, D))
         + 1j * rng.standard_normal((F, T, D))).astype(np.complex64))
    emb = jnp.asarray(rng.standard_normal((F, T, E)).astype(np.float32))

    def eligible(y=y, emb=emb, sal=None, wca=(-1,), inline_pa=False):
        return _fused_integration_eligible(y, emb, K, sal, wca,
                                           inline_pa)

    assert eligible()
    assert eligible(sal=jnp.ones((F, T)))
    assert not eligible(wca=(-3, -1))     # global-weight mode: scan
    assert not eligible(inline_pa=True)   # inline K!-PA: scan
    assert not eligible(y=y.astype(jnp.complex128))

    # 'auto' -> per-iteration kernel when eligible, never the
    # whole-fit 'loop' (measured ~13x slower; docstring)
    assert _resolve_fused_mode('auto', True, True) == 'step'
    assert _resolve_fused_mode('auto', False, True) == 'off'
    assert _resolve_fused_mode('loop', False, True) == 'loop'
    assert _resolve_fused_mode(True, False, False) == 'step'
    assert _resolve_fused_mode(False, True, True) == 'off'

    # GCACGMM: vector covariances ride the kernel, 'full' does not
    from pb_bss_tpu.models.gcacgmm import GCACGMMTrainer  # noqa: F401
    import pb_bss_tpu.models.gcacgmm as mg
    src = open(mg.__file__).read()
    assert "covariance_type in ('spherical', 'diagonal')" in src
