"""CLI entry (`python -m pb_bss_tpu`): WAV in, separated WAVs out."""
import numpy as np
import pytest
from scipy.io import wavfile

from pb_bss_tpu.cli import main


@pytest.mark.slow
def test_separates_wav(tmp_path):
    rng = np.random.default_rng(0)
    sr, n, d = 8000, 8000, 3
    mix = (0.3 * rng.standard_normal((n, d))).astype(np.float32)
    wav = tmp_path / 'mix.wav'
    wavfile.write(wav, sr, (mix * 32767).astype(np.int16))

    out = tmp_path / 'out'
    paths = main([str(wav), '-k', '2', '-i', '3', '-o', str(out)])
    assert len(paths) == 2
    for p in paths:
        rate, data = wavfile.read(p)
        assert rate == sr
        assert data.shape == (n,)
        assert np.any(data != 0)


def test_rejects_mono(tmp_path):
    wav = tmp_path / 'mono.wav'
    wavfile.write(wav, 8000,
                  np.zeros(4000, np.int16))
    with pytest.raises(SystemExit, match='multichannel'):
        main([str(wav)])
