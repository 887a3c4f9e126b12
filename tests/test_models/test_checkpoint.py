"""Checkpoint save/load round trips (orbax + npz) and resume."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models import CACGMM, CACGMMTrainer
from pb_bss_tpu.utils.checkpoint import (
    load_model,
    load_model_npz,
    save_model,
    save_model_npz,
)


@pytest.fixture(scope='module')
def model_and_data():
    rng = np.random.RandomState(0)
    y = rng.randn(4, 50, 3) + 1j * rng.randn(4, 50, 3)
    model = CACGMMTrainer().fit(y, num_classes=2, iterations=3)
    return model, y


def _assert_models_equal(a, b):
    assert_allclose(np.asarray(a.weight), np.asarray(b.weight))
    assert_allclose(
        np.asarray(a.cacg.covariance_eigenvalues),
        np.asarray(b.cacg.covariance_eigenvalues))
    assert_allclose(
        np.asarray(a.cacg.covariance_eigenvectors),
        np.asarray(b.cacg.covariance_eigenvectors))


def test_npz_round_trip(model_and_data, tmp_path):
    model, y = model_and_data
    path = save_model_npz(tmp_path / 'model.npz', model)
    restored = load_model_npz(path, CACGMM)
    _assert_models_equal(model, restored)


def test_npz_restore_by_name(model_and_data, tmp_path):
    model, y = model_and_data
    path = save_model_npz(tmp_path / 'model.npz', model)
    restored = load_model_npz(path, 'CACGMM')
    assert isinstance(restored, CACGMM)


def test_orbax_round_trip(model_and_data, tmp_path):
    pytest.importorskip('orbax.checkpoint')
    model, y = model_and_data
    path = save_model(tmp_path / 'ckpt', model)
    restored = load_model(path, CACGMM)
    _assert_models_equal(model, restored)


def test_resume_from_checkpoint(model_and_data, tmp_path):
    model, y = model_and_data
    path = save_model_npz(tmp_path / 'model.npz', model)
    restored = load_model_npz(path, CACGMM)
    resumed = CACGMMTrainer().fit(
        y, initialization=restored, iterations=2)
    affiliation = np.asarray(resumed.predict(y))
    assert_allclose(affiliation.sum(-2), 1.0, rtol=1e-5)


def test_npz_round_trip_integration_model(tmp_path):
    """Integration-model checkpoint: nested vmf + cacg submodels and
    the restored model must predict identically."""
    import jax.numpy as jnp
    from pb_bss_tpu.models import VMFCACGMMTrainer

    rng = np.random.RandomState(2)
    obs = jnp.asarray(
        (rng.randn(5, 40, 3) + 1j * rng.randn(5, 40, 3)
         ).astype(np.complex64))
    emb = jnp.asarray(rng.randn(5, 40, 4).astype(np.float32))
    model = VMFCACGMMTrainer().fit(
        obs, emb, num_classes=2, iterations=3)

    path = save_model_npz(tmp_path / 'integration.npz', model)
    restored = load_model_npz(path, 'VMFCACGMM')
    assert type(restored) is type(model)
    assert type(restored.vmf) is type(model.vmf)
    assert_allclose(
        np.asarray(restored.predict(obs, emb)),
        np.asarray(model.predict(obs, emb)))
