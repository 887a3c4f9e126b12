"""Metric facades: ``InputMetrics`` / ``OutputMetrics``.

Capability parity with ``pb_bss/evaluation/wrapper.py``: lazily
evaluated cached metrics, shape contracts with verbose error messages
(:333-409), the mir_eval permutation ``selection`` reused to align all
other metrics (:411-427), K_target in {K, K+1} (:347), and dict access
with difflib suggestions (:29-51).

Deviation: PESQ requires the optional ``pesq`` C library (same as the
reference); when it is not installed, ``as_dict`` skips 'pesq' and
lists it under the disabled metrics instead of raising.
"""
from __future__ import annotations

from functools import cached_property

import numpy as np

import pb_bss_tpu


def _get_err_msg(msg, metrics: 'OutputMetrics'):
    msg = f'{msg}'
    msg += f'\nShapes: (is shape) (symbolic shape)'
    msg += (f'\n\tspeech_prediction: '
            f'{metrics.speech_prediction.shape} (K_target, N)')
    msg += f'\n\tspeech_source: {metrics.speech_source.shape} (K_source, N)'
    if metrics.speech_contribution is not None:
        msg += (f'\n\tspeech_contribution: '
                f'{metrics.speech_contribution.shape} (K_source, K_target, N)')
    if metrics.noise_contribution is not None:
        msg += (f'\n\tnoise_contribution: '
                f'{metrics.noise_contribution.shape} (K_target, N)')
    return msg


class VerboseKeyError(KeyError):
    def __str__(self):
        import difflib
        if len(self.args) == 2:
            item, keys = self.args
            suggestions = difflib.get_close_matches(
                item, keys, cutoff=0, n=100)
            return f'{item!r}.\nClose matches: {suggestions!r}'
        elif len(self.args) == 3:
            item, keys, msg = self.args
            suggestions = difflib.get_close_matches(
                item, keys, cutoff=0, n=100)
            return (f'{item!r}.\nClose matches: '
                    f'{suggestions!r}\n{msg}')
        return super().__str__()


def _pesq_available():
    try:
        import pesq  # noqa: F401
        return True
    except ImportError:
        return False


def _stack(arrays):
    return np.stack(arrays)


class InputMetrics:
    """Metrics of the unprocessed observation vs the clean sources
    (broadcast channels x speakers; reference wrapper.py:54-239)."""

    def __init__(
            self,
            observation: 'Shape(D, N)',
            speech_source: 'Shape(K_source, N)',
            speech_image: 'Shape(K_source, D, N)' = None,
            noise_image: 'Shape(D, N)' = None,
            sample_rate: int = None,
            enable_si_sdr: bool = False,
    ):
        """
        Args:
            observation: D channels yield D metric values per speaker;
                slice to a singleton channel dim to pick a reference.
            enable_si_sdr: SI-SDR is only well defined for non-reverb
                single-channel data, so it is disabled by default.
        """
        self.observation = np.asarray(observation)
        self.speech_source = np.asarray(speech_source)
        self.speech_image = None if speech_image is None \
            else np.asarray(speech_image)
        self.noise_image = None if noise_image is None \
            else np.asarray(noise_image)
        self.sample_rate = sample_rate

        self._has_image_signals = (
            speech_image is not None and noise_image is not None)

        self.samples = self.observation.shape[-1]
        self.channels = self.observation.shape[-2]
        self.K_source = self.speech_source.shape[0]

        self.enable_si_sdr = enable_si_sdr
        self.check_inputs()

    def check_inputs(self):
        assert self.observation.ndim == 2, self.observation.shape
        assert self.speech_source.ndim == 2, self.speech_source.shape

    @cached_property
    def mir_eval(self):
        return pb_bss_tpu.evaluation.mir_eval_sources(
            reference=np.broadcast_to(
                self.speech_source[:, None, :],
                (self.K_source, self.channels, self.samples)),
            estimation=np.broadcast_to(
                self.observation[None, :, :],
                (self.K_source, self.channels, self.samples)),
            return_dict=True,
            compute_permutation=False,
        )

    @cached_property
    def mir_eval_sdr(self):
        return self.mir_eval['sdr']

    @cached_property
    def mir_eval_sir(self):
        return self.mir_eval['sir']

    @cached_property
    def mir_eval_sar(self):
        return self.mir_eval['sar']

    @cached_property
    def pesq(self):
        return pb_bss_tpu.evaluation.pesq(
            np.broadcast_to(
                self.speech_source[:, None, :],
                (self.K_source, self.channels, self.samples)),
            np.broadcast_to(
                self.observation[None, :, :],
                (self.K_source, self.channels, self.samples)),
            sample_rate=self.sample_rate,
        )

    @cached_property
    def invasive_sxr(self):
        from pb_bss_tpu.evaluation.sxr_module import input_sxr
        return input_sxr(
            self.speech_image,
            self.noise_image,
            average_sources=False,
            average_channels=False,
            return_dict=True,
        )

    @cached_property
    def invasive_sdr(self):
        return self.invasive_sxr['sdr']

    @cached_property
    def invasive_sir(self):
        return self.invasive_sxr['sir']

    @cached_property
    def invasive_snr(self):
        return self.invasive_sxr['snr']

    @cached_property
    def stoi(self):
        return pb_bss_tpu.evaluation.stoi(
            reference=np.broadcast_to(
                self.speech_source[:, None, :],
                (self.K_source, self.channels, self.samples)),
            estimation=np.broadcast_to(
                self.observation[None, :, :],
                (self.K_source, self.channels, self.samples)),
            sample_rate=self.sample_rate,
        )

    @cached_property
    def si_sdr(self):
        if self.enable_si_sdr:
            return np.asarray(pb_bss_tpu.evaluation.si_sdr(
                reference=self.speech_source[:, None, :],
                estimation=self.observation[None, :, :],
            ))
        raise ValueError(
            'SI-SDR is disabled by default since it is only well-defined '
            'for non-reverberant single-channel data. Enable it with '
            '`enable_si_sdr=True`.'
        )

    @cached_property
    def srmr(self):
        return pb_bss_tpu.evaluation.srmr(
            self.observation, self.sample_rate)

    def _available_metric_names(self):
        metric_names = [
            'stoi',
            'mir_eval_sdr',
            'mir_eval_sir',
            'mir_eval_sar',
            'srmr',
        ]
        if _pesq_available():
            metric_names.insert(0, 'pesq')
        if self.enable_si_sdr:
            metric_names.append('si_sdr')
        if self._has_image_signals:
            metric_names.append('invasive_sdr')
            metric_names.append('invasive_snr')
            metric_names.append('invasive_sir')
        return tuple(metric_names)

    def _disabled_metric_names(self):
        disabled = []
        if not _pesq_available():
            disabled.append('pesq')
        if not self.enable_si_sdr:
            disabled.append('si_sdr')
        if not self._has_image_signals:
            disabled.append('invasive_sdr')
            disabled.append('invasive_snr')
            disabled.append('invasive_sir')
        return disabled

    def as_dict(self):
        return {name: self[name]
                for name in self._available_metric_names()}

    def __getitem__(self, item):
        assert isinstance(item, str), (type(item), item)
        try:
            return getattr(self, item)
        except AttributeError:
            pass
        raise VerboseKeyError(
            item,
            self._available_metric_names(),
            f'Disabled: {self._disabled_metric_names()}',
        )


class OutputMetrics:
    """Metrics of the separated estimates vs the clean sources
    (reference wrapper.py:242-554)."""

    def __init__(
            self,
            speech_prediction: 'Shape(K_target, N)',
            speech_source: 'Shape(K_source, N)',
            speech_contribution: 'Shape(K_source, K_target, N)' = None,
            noise_contribution: 'Shape(K_target, N)' = None,
            sample_rate: int = None,
            enable_si_sdr: bool = False,
            compute_permutation: bool = True,
    ):
        """
        Args:
            speech_prediction: (K_target, N) separated estimates;
                K_target may be K_source + 1 (extra noise estimate).
            speech_source: (K_source, N) true sources (pre-reverb).
            speech_contribution / noise_contribution: per-source /
                noise outputs of the (linear) system with fixed
                parameters; enable the invasive SXR metrics.
            compute_permutation: use the mir_eval SIR permutation to
                align all other metrics.
        """
        self.speech_prediction = np.asarray(speech_prediction)
        self.speech_source = np.asarray(speech_source)
        self.speech_contribution = None if speech_contribution is None \
            else np.asarray(speech_contribution)
        self.noise_contribution = None if noise_contribution is None \
            else np.asarray(noise_contribution)
        self.sample_rate = sample_rate

        self._has_contribution_signals = (
            speech_contribution is not None
            and noise_contribution is not None)

        self.samples = self.speech_prediction.shape[-1]
        self.K_source = self.speech_source.shape[0]
        self.K_target = self.speech_prediction.shape[0]

        self.enable_si_sdr = enable_si_sdr
        self.compute_permutation = compute_permutation
        self.check_inputs()

    def check_inputs(self):
        assert self.speech_prediction.ndim == 2, \
            self.speech_prediction.shape
        assert self.speech_source.ndim == 2, self.speech_source.shape

        assert self.K_source <= 8, _get_err_msg(
            f'Number of source speakers (K_source) of speech_source is '
            f'{self.K_source}. Expect a reasonable value of 5 or less.',
            self)
        assert self.K_target <= 8, _get_err_msg(
            f'Number of target speakers (K_target) of speech_prediction '
            f'is {self.K_target}. Expect a reasonable value of 5 or less.',
            self)
        assert self.K_target in [self.K_source, self.K_source + 1], \
            _get_err_msg(
                'Number of target speakers (K_target) should be equal to '
                'number of source speakers (K_source) or K_target + 1',
                self)
        assert self.speech_source.shape[1] == self.samples, _get_err_msg(
            'Num samples (N) of speech_source does not fit to the'
            'shape from speech_prediction', self)

        if (self.speech_contribution is not None
                and self.noise_contribution is not None):
            K_source_, K_target_, samples_ = \
                self.speech_contribution.shape
            assert self.samples == samples_, _get_err_msg(
                'Num samples (N) of speech_contribution does not fit to '
                'the shape from speech_prediction', self)
            assert self.K_target == K_target_, _get_err_msg(
                'Num target speakers (K_target) of speech_contribution '
                'does not fit to the shape from speech_prediction', self)
            assert self.K_source < 5, _get_err_msg(
                'Num source speakers (K_source) of speech_contribution '
                'does not fit to the shape from speech_source', self)
            K_target_, samples_ = self.noise_contribution.shape
            assert self.samples == samples_, _get_err_msg(
                'Num samples (N) of noise_contribution does not fit to '
                'the shape from speech_prediction', self)
            assert self.K_target == K_target_, _get_err_msg(
                'Num target speakers (K_target) of noise_contribution '
                'does not fit to the shape from speech_prediction', self)
            deviation = np.std(np.abs(
                self.speech_prediction
                - np.sum(self.speech_contribution, axis=0)
                - self.noise_contribution
            ))
            assert deviation < 1e-3, (
                'The deviation of speech prediction and the sum of '
                f'individual contributions is expected to be low: '
                f'{deviation}')
        else:
            assert (self.speech_contribution is None
                    and self.noise_contribution is None), (
                'Expect that speech_contribution and noise_contribution '
                'are both None or given.\n'
                'Got:\n'
                f'speech_contribution: {self.speech_contribution}\n'
                f'noise_contribution: {self.noise_contribution}')

    @cached_property
    def mir_eval_selection(self):
        if self.compute_permutation:
            return self.mir_eval['selection']
        assert self.K_target == self.K_source, (
            self.K_target, self.K_source, self.compute_permutation)
        return np.arange(self.K_source)

    @cached_property
    def speech_prediction_selection(self):
        assert self.speech_prediction.ndim == 2, \
            self.speech_prediction.shape
        assert self.speech_prediction.shape[0] < 10, \
            self.speech_prediction.shape
        assert (
            self.speech_prediction.shape[0]
            in (len(self.mir_eval_selection),
                len(self.mir_eval_selection) + 1)
        ), self.speech_prediction.shape
        return self.speech_prediction[self.mir_eval_selection]

    @cached_property
    def mir_eval(self):
        return pb_bss_tpu.evaluation.mir_eval_sources(
            reference=self.speech_source,
            estimation=self.speech_prediction,
            return_dict=True,
            compute_permutation=self.compute_permutation,
        )

    @cached_property
    def mir_eval_sdr(self):
        return self.mir_eval['sdr']

    @cached_property
    def mir_eval_sir(self):
        return self.mir_eval['sir']

    @cached_property
    def mir_eval_sar(self):
        return self.mir_eval['sar']

    @cached_property
    def pesq(self):
        return pb_bss_tpu.evaluation.pesq(
            reference=self.speech_source,
            estimation=self.speech_prediction_selection,
            sample_rate=self.sample_rate,
        )

    @cached_property
    def invasive_sxr(self):
        from pb_bss_tpu.evaluation.sxr_module import output_sxr
        return output_sxr(
            self.speech_contribution[:, self.mir_eval_selection, :],
            self.noise_contribution[self.mir_eval_selection, :],
            average_sources=False,
            return_dict=True,
        )

    @cached_property
    def invasive_sdr(self):
        return self.invasive_sxr['sdr']

    @cached_property
    def invasive_sir(self):
        return self.invasive_sxr['sir']

    @cached_property
    def invasive_snr(self):
        return self.invasive_sxr['snr']

    @cached_property
    def stoi(self):
        return pb_bss_tpu.evaluation.stoi(
            reference=self.speech_source,
            estimation=self.speech_prediction_selection,
            sample_rate=self.sample_rate,
        )

    @cached_property
    def srmr(self):
        return pb_bss_tpu.evaluation.srmr(
            self.speech_prediction_selection, self.sample_rate)

    @cached_property
    def si_sdr(self):
        if self.enable_si_sdr:
            return np.asarray(pb_bss_tpu.evaluation.si_sdr(
                reference=self.speech_source,
                estimation=self.speech_prediction_selection,
            ))
        raise ValueError(
            'SI-SDR is disabled by default since it is only well-defined '
            'for non-reverberant single-channel data. Enable it with '
            '`enable_si_sdr=True`.'
        )

    def _available_metric_names(self):
        metric_names = [
            'stoi',
            'mir_eval_sdr',
            'mir_eval_sir',
            'mir_eval_sar',
            'mir_eval_selection',
            'srmr',
        ]
        if _pesq_available():
            metric_names.insert(0, 'pesq')
        if self.enable_si_sdr:
            metric_names.append('si_sdr')
        if self._has_contribution_signals:
            metric_names.append('invasive_sdr')
            metric_names.append('invasive_snr')
            metric_names.append('invasive_sir')
        return tuple(metric_names)

    def _disabled_metric_names(self):
        disabled = []
        if not _pesq_available():
            disabled.append('pesq')
        if not self.enable_si_sdr:
            disabled.append('si_sdr')
        if not self._has_contribution_signals:
            disabled.append('invasive_sdr')
            disabled.append('invasive_snr')
            disabled.append('invasive_sir')
        return disabled

    def as_dict(self):
        return {name: self[name]
                for name in self._available_metric_names()}

    def __getitem__(self, item):
        assert isinstance(item, str), (type(item), item)
        try:
            return getattr(self, item)
        except AttributeError:
            pass
        raise VerboseKeyError(
            item,
            self._available_metric_names(),
            f'Disabled: {self._disabled_metric_names()}',
        )
