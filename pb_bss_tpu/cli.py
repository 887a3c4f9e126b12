"""Command-line separation entry: ``python -m pb_bss_tpu``.

The reference is a pure library; this thin CLI is a serving
convenience over :func:`pb_bss_tpu.pipeline.separate`: read a
multichannel WAV, run the blind-separation pipeline (STFT -> cACGMM
EM -> DHTV permutation alignment -> mask or beamformer extraction ->
iSTFT) on the default backend, and write one WAV per separated
stream.

    python -m pb_bss_tpu mixture.wav --num-classes 3 \
        --beamformer gev+ban --output-dir separated/

Audio IO uses ``soundfile`` when installed and falls back to
``scipy.io.wavfile`` (16-bit PCM output) otherwise.
"""
from __future__ import annotations

import argparse
import pathlib

import numpy as np

__all__ = ['main']


def _read_wav(path):
    try:
        import soundfile
        data, sample_rate = soundfile.read(str(path), always_2d=True)
        return data.T.astype(np.float32), sample_rate   # (D, N)
    except ImportError:
        from scipy.io import wavfile
        sample_rate, data = wavfile.read(str(path))
        if data.ndim == 1:
            data = data[:, None]
        if np.issubdtype(data.dtype, np.integer):
            data = data / float(np.iinfo(data.dtype).max)
        return np.ascontiguousarray(data.T, np.float32), sample_rate


def _write_wav(path, signal, sample_rate):
    signal = np.asarray(signal, np.float32)
    try:
        import soundfile
        soundfile.write(str(path), signal, sample_rate)
    except ImportError:
        from scipy.io import wavfile
        peak = np.max(np.abs(signal))
        if peak > 1.0:
            signal = signal / peak
        wavfile.write(str(path), sample_rate,
                      (signal * 32767).astype(np.int16))


def build_parser():
    parser = argparse.ArgumentParser(
        prog='python -m pb_bss_tpu',
        description='Blind source separation of a multichannel WAV '
                    '(cACGMM EM + DHTV alignment + mask/beamformer '
                    'extraction).')
    parser.add_argument('input', type=pathlib.Path,
                        help='multichannel WAV file (channels = mics)')
    parser.add_argument('--num-classes', '-k', type=int, default=3,
                        help='mixture components incl. a noise class '
                             '(default 3 = 2 speakers + noise)')
    parser.add_argument('--iterations', '-i', type=int, default=20,
                        help='EM iterations (default 20)')
    parser.add_argument('--beamformer', '-b', default=None,
                        help="extraction beamformer DSL, e.g. "
                             "'gev+ban' or 'mvdr_souden' "
                             "(default: mask the reference channel)")
    parser.add_argument('--stft-size', type=int, default=512)
    parser.add_argument('--stft-shift', type=int, default=128)
    parser.add_argument('--output-dir', '-o', type=pathlib.Path,
                        default=None,
                        help='output directory (default: alongside '
                             'the input)')
    parser.add_argument('--seed', type=int, default=0,
                        help='PRNG seed for the EM initialization')
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    observation, sample_rate = _read_wav(args.input)
    if observation.shape[0] < 2:
        raise SystemExit(
            f'{args.input}: need a multichannel recording, got '
            f'{observation.shape[0]} channel(s) x '
            f'{observation.shape[-1]} samples — blind SPATIAL '
            f'separation has nothing to work with on mono audio.')

    import jax

    from .pipeline import separate

    key = jax.random.key(args.seed)
    out = np.asarray(separate(
        observation,
        num_classes=args.num_classes,
        iterations=args.iterations,
        beamformer=args.beamformer,
        stft_size=args.stft_size,
        stft_shift=args.stft_shift,
        key=key,
    ))

    out_dir = args.output_dir or args.input.parent
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = args.input.stem
    paths = []
    for k in range(out.shape[0]):
        path = out_dir / f'{stem}_stream{k}.wav'
        _write_wav(path, out[k], sample_rate)
        paths.append(path)
    print('\n'.join(str(p) for p in paths))
    return paths


if __name__ == '__main__':  # pragma: no cover
    main()
