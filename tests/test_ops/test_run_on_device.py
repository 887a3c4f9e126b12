"""Tests for the transfer-safe device calling convention
(pb_bss_tpu.utils.run_on_device) and to_numpy."""
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.utils import run_on_device, to_numpy


def test_to_numpy_complex():
    z = jnp.asarray(np.array([1 + 2j, 3 - 4j], np.complex64))
    h = to_numpy(z)
    assert isinstance(h, np.ndarray)
    assert_allclose(h, [1 + 2j, 3 - 4j])


def test_run_on_device_complex_in_out():
    y = (np.random.randn(5, 3) + 1j * np.random.randn(5, 3)).astype(
        np.complex64)

    def fn(y):
        return y * 2, jnp.abs(y)

    doubled, mags = run_on_device(fn, y)
    assert isinstance(doubled, np.ndarray)
    assert doubled.dtype.kind == 'c'
    assert_allclose(doubled, y * 2, rtol=1e-6)
    assert_allclose(mags, np.abs(y), rtol=1e-6)


def test_run_on_device_real_only():
    x = np.random.randn(4).astype(np.float32)
    out = run_on_device(lambda a: a + 1, x)
    assert_allclose(out, x + 1, rtol=1e-6)


def test_run_on_device_caching():
    from pb_bss_tpu.utils import _DEVICE_RUN_CACHE

    def fn(a):
        return a * 3

    x = np.random.randn(4).astype(np.float32)
    before = len(_DEVICE_RUN_CACHE)
    run_on_device(fn, x)
    run_on_device(fn, x)
    after = len(_DEVICE_RUN_CACHE)
    assert after == before + 1  # compiled once


def test_run_on_device_pipeline_stage():
    """The example's EM stage pattern works under the convention."""
    import jax
    from pb_bss_tpu.distribution import CACGMMTrainer
    from pb_bss_tpu.transform import stft

    obs = np.random.randn(3, 4000).astype(np.float32)

    def em_stage(observation):
        Observation = stft(observation, 512, 128)
        Y = jnp.einsum('dtf->ftd', Observation)
        model = CACGMMTrainer().fit(
            Y, num_classes=2, iterations=3, key=jax.random.key(0))
        return Observation, model.predict(Y)

    Observation, affiliation = run_on_device(em_stage, obs)
    assert Observation.dtype.kind == 'c'
    assert affiliation.shape[1] == 2
    assert_allclose(affiliation.sum(1), 1.0, rtol=1e-4)


def test_rejects_device_resident_complex_input():
    """A device complex array handed to run_on_device would itself be
    the forbidden boundary transfer (and poisons the process on
    tunneled backends) — it must fail fast with the remedy."""
    import jax.numpy as jnp
    y = jnp.asarray(np.ones((3, 2), np.complex64))
    with pytest.raises(TypeError, match='host'):
        run_on_device(lambda a: a + 1, y)
