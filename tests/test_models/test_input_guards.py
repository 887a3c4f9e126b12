"""The directional-statistics trainers fail fast on an implausible
channel count (reference guard: cacgmm.py:249-250). The usual cause is
passing time-last ``(F, D, T)`` data where the API takes ``(F, T, D)``
— without the guard that compiles an enormous per-bin program (the
Bingham log-norm cascade is O(D^2) per bin) instead of erroring.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pb_bss_tpu.models.cacgmm import CACGMMTrainer
from pb_bss_tpu.models.cbmm import CBMMTrainer
from pb_bss_tpu.models.cwmm import CWMMTrainer
from pb_bss_tpu.models.gcacgmm import GCACGMMTrainer
from pb_bss_tpu.models.vmfcacgmm import VMFCACGMMTrainer


def _time_last_mistake(f=5, d=4, t=50, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.standard_normal((f, d, t)) + 1j * rng.standard_normal((f, d, t))
    return jnp.asarray(y, jnp.complex64)


@pytest.mark.parametrize('trainer_cls', [
    CACGMMTrainer, CBMMTrainer, CWMMTrainer])
def test_spatial_trainers_reject_implausible_channels(trainer_cls):
    y = _time_last_mistake()
    with pytest.raises(AssertionError, match='sure'):
        trainer_cls().fit(y, num_classes=2, iterations=1)


@pytest.mark.parametrize('trainer_cls', [
    GCACGMMTrainer, VMFCACGMMTrainer])
def test_integration_trainers_reject_implausible_channels(trainer_cls):
    y = _time_last_mistake()
    embedding = jnp.ones((*y.shape[:2], 3), jnp.float32)
    with pytest.raises(AssertionError, match='sure'):
        trainer_cls().fit(y, embedding, num_classes=2, iterations=1)
