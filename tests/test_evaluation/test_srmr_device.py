"""Device SRMR vs the host oracle (which itself matches SRMRpy
goldens to <=1.3e-2 — tests/test_evaluation/test_reference_goldens).

The one intentional deviation is the Hilbert transform length (bucket
instead of exact spliced length); these tests bound its effect well
inside the host implementation's own tolerance. On CPU the device
program runs in float32 like on the TPU (inputs are staged as f32), so
the f32-critical modulation-filter path is what is tested here.
"""
import numpy as np
import pytest

from pb_bss_tpu.evaluation.module_srmr import srmr
from pb_bss_tpu.evaluation.module_srmr_device import (
    srmr_batch,
    srmr_device,
)


def _speechlike(seed, n, sr, gap=None):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / sr
    mod = 0.5 + 0.5 * np.sin(2 * np.pi * 4.1 * t + rng.rand() * 6)
    x = mod * rng.randn(n)
    if gap is not None:
        x[gap[0]:gap[1]] *= 1e-6  # silent region -> VAD splice
    return x


@pytest.mark.parametrize('sr', [8000, 16000])
@pytest.mark.slow
def test_matches_host(sr):
    xs = np.stack([_speechlike(s, 3 * sr, sr) for s in range(3)])
    host = np.array([srmr(x, sr) for x in xs])
    dev = srmr_batch(xs, sr)
    np.testing.assert_allclose(dev, host, rtol=1e-3)


@pytest.mark.slow
def test_vad_splice_and_ragged_lengths():
    """Signals whose VAD removes different amounts share one bucketed
    program; each must still match its host value."""
    sr = 8000
    xs = np.stack([
        _speechlike(0, 3 * sr, sr),
        _speechlike(1, 3 * sr, sr, gap=(4000, 9000)),
        _speechlike(2, 3 * sr, sr, gap=(1000, 11000)),
    ])
    host = np.array([srmr(x, sr) for x in xs])
    dev = srmr_batch(xs, sr)
    np.testing.assert_allclose(dev, host, rtol=2e-3)


@pytest.mark.slow
def test_batch_shapes_and_chunking():
    """More signals than one device chunk, with leading batch dims."""
    sr = 8000
    xs = np.stack([_speechlike(s, 2 * sr, sr)
                   for s in range(10)]).reshape(5, 2, -1)
    out = srmr_batch(xs, sr)
    assert out.shape == (5, 2)
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(
        out[2, 1], srmr(xs[2, 1], sr), rtol=2e-3)


def test_single_signal_entry():
    sr = 8000
    x = _speechlike(3, 2 * sr, sr)
    assert abs(srmr_device(x, sr) - srmr(x, sr)) < 2e-3 * srmr(x, sr)


@pytest.mark.slow
def test_long_bucket_shrinks_chunk():
    """Long signals shrink the device chunk (memory guard) without
    changing results."""
    sr = 8000
    xs = np.stack([_speechlike(s, 12 * sr, sr) for s in range(3)])
    out = srmr_batch(xs, sr)
    assert out.shape == (3,)
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[0], srmr(xs[0], sr), rtol=2e-3)


def test_too_short_yields_nan():
    """The host warns and yields NaN when the spliced signal is
    shorter than one analysis frame; the device path matches."""
    sr = 8000
    x = np.random.RandomState(0).randn(1000)  # < frame (2048 @ 8 kHz)
    out = srmr_batch(x[None], sr)
    assert np.isnan(out[0])
