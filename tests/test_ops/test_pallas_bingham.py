"""Fused Pallas Bingham warm chord solver: parity with the XLA warm
chord path (interpret mode on CPU; the compiled kernel runs on TPU
where one launch replaces ~500 HLO ops per EM iteration).

The chord fixed point is ``grad log Z(lambda) = s`` independent of
the (finite-difference vs autodiff) Jacobian, so the RESIDUAL of the
returned solution is the parity criterion; trajectories may differ in
noise-dominated saturated directions (moments <~ 1e-4, where the
eigenvalues are ill-determined — see models/complex_bingham.py
find_eigenvalues' domain-cap comment).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pb_bss_tpu.models.complex_bingham import (
    _default_spacing_eps,
    _grad_log_norm,
    _remove_duplicate_eigenvalues,
    find_eigenvalues,
)
from pb_bss_tpu.ops.pallas_bingham import bingham_chord_solve

pytestmark = pytest.mark.slow  # interpret-mode chord cascade: minutes per trace



def _moments_and_warm(B=300, D=6, seed=3, perturb=0.05):
    rng = np.random.default_rng(seed)
    s = rng.dirichlet(np.full(D, 0.7), size=B).astype(np.float32)
    s.sort(axis=-1)
    _, s_reg = _remove_duplicate_eigenvalues(jnp.asarray(s))
    s_reg = np.asarray(s_reg, np.float32)
    lam = np.array(find_eigenvalues(jnp.asarray(s_reg), iterations=50),
                   np.float32)
    lam.sort(axis=-1)
    x0 = lam * (1 + perturb * rng.standard_normal((B, 1)).astype(
        np.float32))
    x0[:, -1] = 0.0
    x0.sort(axis=-1)
    return s_reg, x0


def _residual(lam, s):
    g = np.asarray(jax.vmap(_grad_log_norm)(
        jnp.asarray(lam, jnp.float32)))
    return np.abs(g - s).max(-1)


def test_matches_xla_chord_quality():
    s_reg, x0 = _moments_and_warm()
    upper = float(-_default_spacing_eps(np.float32))
    lower = -32768.0 / 5

    lam_kernel = np.asarray(bingham_chord_solve(
        jnp.asarray(s_reg), jnp.asarray(x0), iterations=16,
        lower=lower, upper=upper, interpret=True))
    lam_xla = np.array(find_eigenvalues(
        jnp.asarray(s_reg), iterations=16,
        warm_start=jnp.asarray(x0), use_pallas=False))
    lam_xla.sort(axis=-1)

    r_k = _residual(lam_kernel, s_reg)
    r_x = _residual(lam_xla, s_reg)
    # converges at least as well as the XLA chord (same fixed point)
    assert np.median(r_k) < 2 * max(np.median(r_x), 1e-5)
    assert r_k.max() < 3 * max(r_x.max(), 1e-3)
    # identical solutions outside the saturated noise-dominated tail
    well = np.abs(lam_xla).max(-1) < 300
    diff = (np.abs(lam_kernel - lam_xla)
            / (1 + np.abs(lam_xla))).max(-1)
    assert np.median(diff[well]) < 1e-3
    # structure: ascending, max pinned to 0
    assert np.all(np.diff(lam_kernel, axis=-1) >= 0)
    np.testing.assert_allclose(lam_kernel[:, -1], 0.0, atol=1e-6)


def test_find_eigenvalues_pallas_path():
    """use_pallas=True end-to-end: unsorted inputs, inverse
    permutation, user max_concentration bound."""
    rng = np.random.default_rng(11)
    B, D = 64, 6
    s = rng.dirichlet(np.full(D, 0.8), size=B).astype(np.float32)
    perm = rng.permuted(
        np.broadcast_to(np.arange(D), (B, D)), axis=-1)
    s_unsorted = np.take_along_axis(s, perm, axis=-1)

    lam_sorted_ref = np.array(find_eigenvalues(
        jnp.asarray(np.sort(s_unsorted, -1)), iterations=50))
    lam_sorted_ref.sort(axis=-1)
    warm = np.take_along_axis(
        lam_sorted_ref, np.argsort(np.argsort(s_unsorted, -1), -1),
        axis=-1)

    out = np.asarray(find_eigenvalues(
        jnp.asarray(s_unsorted), iterations=16,
        warm_start=jnp.asarray(warm), use_pallas=True))
    # element order follows the input moments: larger moment ->
    # larger (less negative) eigenvalue
    order_in = np.argsort(s_unsorted, axis=-1)
    order_out = np.argsort(out, axis=-1)
    np.testing.assert_array_equal(order_in, order_out)
    r = _residual(np.sort(out, -1), np.sort(s_unsorted, -1))
    assert np.median(r) < 1e-3

    # user bound clamps the spread
    out_b = np.asarray(find_eigenvalues(
        jnp.asarray(s_unsorted), iterations=16,
        warm_start=jnp.asarray(warm), use_pallas=True,
        max_concentration=50.0))
    assert out_b.min() >= -50.0 - 1e-4


@pytest.mark.parametrize('D', [3, 4, 6])
def test_dimensions_and_padding(D):
    """Non-tile batch sizes and other D values."""
    s_reg, x0 = _moments_and_warm(B=37, D=D, seed=D)
    upper = float(-_default_spacing_eps(np.float32))
    lam = np.asarray(bingham_chord_solve(
        jnp.asarray(s_reg), jnp.asarray(x0), iterations=16,
        lower=-32768.0 / (D - 1), upper=upper, interpret=True))
    assert lam.shape == (37, D)
    r = _residual(lam, s_reg)
    assert np.median(r) < 1e-3
    assert np.isfinite(lam).all()
