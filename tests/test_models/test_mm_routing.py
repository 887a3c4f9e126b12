"""Auto-routing contract of the Watson / Bingham mixture trainers
(models/cwmm.py, models/cbmm.py): which execution path each
(shape, knobs) combination selects when the backend reports TPU —
the companion of tests/test_models/test_cacgmm_routing.py for the
other two spatial families.

The backend and the kernel/scan entry points are monkeypatched, so
the real routing logic runs and nothing compiles.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pb_bss_tpu.models.cbmm as m_cbmm
import pb_bss_tpu.models.cwmm as m_cwmm
import pb_bss_tpu.ops.pallas_cbmm_loop as k_cbmm
import pb_bss_tpu.ops.pallas_cwmm_loop as k_cwmm
import pb_bss_tpu.ops.pallas_mm_stream as k_stream
from pb_bss_tpu.models.cbmm import CBMMTrainer
from pb_bss_tpu.models.cwmm import CWMMTrainer
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


def _y(T, dtype=np.complex64):
    rng = np.random.default_rng(0)
    y = rng.standard_normal((F, T, D)) + 1j * rng.standard_normal(
        (F, T, D))
    y /= np.linalg.norm(y, axis=-1, keepdims=True)
    return jnp.asarray(y.astype(dtype))


def _aff(T):
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(F, K, T)).astype(np.float32)
    return jnp.asarray(a / a.sum(-2, keepdims=True))


@pytest.fixture
def cwmm_route(monkeypatch):
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    monkeypatch.setattr(k_cwmm, 'cwmm_em_full', _sentinel('whole'))
    monkeypatch.setattr(k_stream, 'cwmm_em_long', _sentinel('stream'))
    monkeypatch.setattr(m_cwmm, 'run_em', _sentinel('scan'))

    def run(y, **kwargs):
        kwargs.setdefault('initialization', _aff(y.shape[-2]))
        kwargs.setdefault('iterations', 3)
        with pytest.raises(_Route) as e:
            CWMMTrainer().fit(y, **kwargs)
        return e.value.name

    return run


@pytest.fixture
def cbmm_route(monkeypatch):
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    monkeypatch.setattr(m_cbmm, '_fit_fused_cbmm', _sentinel('whole'))
    monkeypatch.setattr(k_stream, 'cbmm_em_long', _sentinel('stream'))
    monkeypatch.setattr(m_cbmm, 'run_em', _sentinel('scan'))

    def run(y, **kwargs):
        kwargs.setdefault('initialization', _aff(y.shape[-2]))
        kwargs.setdefault('iterations', 3)
        with pytest.raises(_Route) as e:
            CBMMTrainer().fit(y, **kwargs)
        return e.value.name

    return run


# ---- CWMM ------------------------------------------------------------

def test_cwmm_short_per_bin_routes_whole_fit(cwmm_route):
    assert cwmm_route(_y(300)) == 'whole'


def test_cwmm_short_fc_routes_stream(cwmm_route):
    # frequency-constant weights have no whole-fit variant — the
    # streamed kernel carries the fc weight mode
    assert cwmm_route(_y(300),
                      weight_constant_axis=(-3, -1)) == 'stream'


def test_cwmm_long_routes_stream(cwmm_route):
    assert cwmm_route(_y(2000)) == 'stream'


def test_cwmm_aligner_falls_back_to_scan(cwmm_route):
    aligner = DHTVPermutationAlignment.from_stft_size(512)
    assert cwmm_route(
        _y(300), inline_permutation_aligner=aligner) == 'scan'


def test_cwmm_c128_falls_back_to_scan(cwmm_route):
    assert cwmm_route(_y(300, dtype=np.complex128)) == 'scan'


def test_cwmm_use_fused_em_false_routes_scan(cwmm_route):
    assert cwmm_route(_y(300), use_fused_em=False) == 'scan'


# ---- CBMM ------------------------------------------------------------

def test_cbmm_short_per_bin_routes_whole_fit(cbmm_route):
    assert cbmm_route(_y(300)) == 'whole'


def test_cbmm_short_fc_routes_stream(cbmm_route):
    assert cbmm_route(_y(300),
                      weight_constant_axis=(-3, -1)) == 'stream'


def test_cbmm_long_routes_stream(cbmm_route):
    assert cbmm_route(_y(2000)) == 'stream'


def test_cbmm_aligner_falls_back_to_scan(cbmm_route):
    aligner = DHTVPermutationAlignment.from_stft_size(512)
    assert cbmm_route(
        _y(300), inline_permutation_aligner=aligner) == 'scan'


def test_cbmm_c128_falls_back_to_scan(cbmm_route):
    assert cbmm_route(_y(300, dtype=np.complex128)) == 'scan'


def test_cbmm_d_gt_8_falls_back_to_scan(cbmm_route):
    # the Bingham kernels support 2 <= D <= 8
    rng = np.random.default_rng(2)
    y = rng.standard_normal((F, 300, 9)) + 1j * rng.standard_normal(
        (F, 300, 9))
    y /= np.linalg.norm(y, axis=-1, keepdims=True)
    assert cbmm_route(jnp.asarray(y.astype(np.complex64))) == 'scan'
