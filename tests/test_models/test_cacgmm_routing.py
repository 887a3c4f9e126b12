"""Auto-routing contract of CACGMMTrainer.fit (models/cacgmm.py):
which execution path each (shape, knobs) combination selects when the
backend reports TPU. The kernels themselves are parity-tested
elsewhere; this pins the DISPATCH decision end to end (the r5
feasibility regression silently rerouted long signals to the scan
path — a test like this would have caught it).

The backend and the five path entry points are monkeypatched, so the
real trainer code runs right up to the dispatch and no kernel
compiles.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pb_bss_tpu.models.cacgmm as mc
from pb_bss_tpu.models.cacgmm import CACGMMTrainer
from pb_bss_tpu.permutation_alignment import DHTVPermutationAlignment

F, D, K = 9, 6, 3


class _Route(Exception):
    def __init__(self, name):
        super().__init__(name)
        self.name = name


def _sentinel(name):
    def fn(*args, **kwargs):
        raise _Route(name)
    return fn


@pytest.fixture
def route_of(monkeypatch):
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    for attr, name in (('_fit_fused', 'whole'),
                       ('_fit_fused_fc', 'fc'),
                       ('_fit_fused_stream', 'stream'),
                       ('_fit_em_t_blocked', 't_blocked'),
                       ('_fit_em', 'scan')):
        monkeypatch.setattr(mc, attr, _sentinel(name))

    def run(y, **kwargs):
        kwargs.setdefault('num_classes', K)
        kwargs.setdefault('iterations', 3)
        kwargs.setdefault('key', jax.random.key(0))
        with pytest.raises(_Route) as e:
            CACGMMTrainer().fit(y, **kwargs)
        return e.value.name

    return run


def _y(T, dtype=np.complex64, batch=None):
    rng = np.random.default_rng(0)
    shape = (F, T, D) if batch is None else (batch, F, T, D)
    y = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    return jnp.asarray(y.astype(dtype))


def test_short_per_bin_routes_whole_fit(route_of):
    assert route_of(_y(300)) == 'whole'


def test_short_fc_routes_step_kernel(route_of):
    assert route_of(_y(300),
                    weight_constant_axis=(-3, -1)) == 'fc'


def test_long_per_bin_routes_stream(route_of):
    assert route_of(_y(2000), t_block=None) == 'stream'


def test_long_fc_routes_stream(route_of):
    assert route_of(_y(2000), weight_constant_axis=(-3, -1),
                    t_block=None) == 'stream'


def test_fc_inline_aligner_routes_step_kernel(route_of):
    aligner = DHTVPermutationAlignment.from_stft_size(512)
    assert route_of(_y(300), weight_constant_axis=(-3, -1),
                    inline_permutation_aligner=aligner) == 'fc'


def test_per_bin_inline_aligner_falls_back_to_scan(route_of):
    aligner = DHTVPermutationAlignment.from_stft_size(512)
    assert route_of(_y(300), inline_permutation_aligner=aligner,
                    t_block=None) == 'scan'


def test_batched_fc_aligner_falls_back_to_scan(route_of):
    # the fused fc path hosts the aligner only for unbatched input
    aligner = DHTVPermutationAlignment.from_stft_size(512)
    assert route_of(_y(300, batch=2),
                    weight_constant_axis=(-3, -1),
                    inline_permutation_aligner=aligner,
                    t_block=None) == 'scan'


def test_c128_falls_back_to_scan(route_of):
    assert route_of(_y(300, dtype=np.complex128),
                    t_block=None) == 'scan'


def test_c128_long_signal_routes_t_blocked(route_of):
    # fused-ineligible signals beyond T_BLOCK_AUTO_THRESHOLD keep the
    # t-blocked scan memory optimization under the default
    # t_block='auto'
    assert route_of(
        _y(mc.T_BLOCK_AUTO_THRESHOLD + 8,
           dtype=np.complex128)) == 't_blocked'


def test_use_fused_em_false_routes_scan(route_of):
    assert route_of(_y(300), use_fused_em=False,
                    t_block=None) == 'scan'


def test_batched_short_routes_whole_fit(route_of):
    assert route_of(_y(300, batch=2)) == 'whole'


def test_per_bin_inline_aligner_rejected_like_reference():
    """The reference restricts inline PA to frequency-constant weight
    axes (mixture_model_utils.py:264-306): with per-bin weights the
    model is invariant under per-bin class relabeling, so inline
    alignment would be statistically meaningless. Executing the
    combination (not just routing it) must raise with that
    explanation."""
    rng = np.random.default_rng(0)
    y = jnp.asarray(
        (rng.standard_normal((F, 40, 3))
         + 1j * rng.standard_normal((F, 40, 3))).astype(np.complex64))
    aligner = DHTVPermutationAlignment.from_stft_size(512)
    with pytest.raises(AssertionError,
                       match='frequency-constant weight_constant'):
        CACGMMTrainer().fit(
            y, num_classes=2, iterations=2,
            inline_permutation_aligner=aligner, t_block=None)
