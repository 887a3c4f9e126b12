"""Evaluation metric tests: doctest-parity for si_sdr, analytic
sanity for the native BSS-Eval / STOI / SRMR, sxr semantics, and the
wrapper facades (shape contracts like
/root/reference/tests/test_evaluation/test_wrapper.py).
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.evaluation import (
    bss_eval_sources,
    input_sxr,
    mir_eval_sources,
    output_sxr,
    si_sdr,
    stoi,
    srmr,
    get_snr,
    InputMetrics,
    OutputMetrics,
)


class TestSiSdr:
    """Reference doctest values (module_si_sdr.py:18-35)."""

    def setup_method(self):
        rng = np.random.RandomState(0)
        self.reference = rng.randn(100)

    def test_perfect(self):
        assert float(si_sdr(self.reference, self.reference)) == np.inf
        assert float(si_sdr(self.reference, self.reference * 2)) == np.inf

    def test_reference_values(self):
        r = self.reference
        assert_allclose(float(si_sdr(r, np.flip(r))),
                        -25.127672346460717, rtol=1e-10)
        assert_allclose(float(si_sdr(r, r + np.flip(r))),
                        0.481070445785553, rtol=1e-10)
        assert_allclose(float(si_sdr(r, r + 0.5)),
                        6.3704606032577304, rtol=1e-10)
        assert_allclose(float(si_sdr(r, r * 2 + 1)),
                        6.3704606032577304, rtol=1e-10)

    def test_broadcast(self):
        r = self.reference
        out = np.asarray(si_sdr(
            np.stack([r, r]), np.stack([r * 2 + 1, r + 0.5])))
        assert_allclose(out, [6.3704606, 6.3704606], rtol=1e-6)


class TestBssEval:
    def _mixture(self, seed=0, T=8000):
        rng = np.random.RandomState(seed)
        s = rng.randn(2, T)
        return s

    def test_shared_factorization_matches_pairwise(self):
        """The shared-Gram fast path must reproduce the per-pair
        mir_eval-style decomposition exactly (float64 rounding)."""
        from pb_bss_tpu.evaluation.module_bss_eval import (
            _bss_decomp_mtifilt,
            _bss_source_crit,
            _criteria_matrix,
        )
        rng = np.random.RandomState(11)
        K, T = 3, 4000
        s = rng.randn(K, T)
        est = s + 0.3 * rng.randn(K, T) + 0.2 * np.roll(s, 1, axis=0)
        sdr_n, sir_n, sar_n = _criteria_matrix(s, est, 128)
        for m in range(K):
            for j in range(K):
                parts = _bss_decomp_mtifilt(s, est[m], j, 128)
                sdr, sir, sar = _bss_source_crit(*parts)
                np.testing.assert_allclose(sdr_n[m, j], sdr, atol=1e-9)
                np.testing.assert_allclose(sir_n[m, j], sir, atol=1e-9)
                np.testing.assert_allclose(sar_n[m, j], sar, atol=1e-9)

    def test_identity_recovers_high_sdr(self):
        s = self._mixture()
        sdr, sir, sar, perm = bss_eval_sources(s, s)
        assert np.all(sdr > 100), sdr
        np.testing.assert_array_equal(perm, [0, 1])

    def test_permutation_detected(self):
        s = self._mixture(1)
        sdr, sir, sar, perm = bss_eval_sources(s, s[::-1])
        assert np.all(sdr > 100), sdr
        np.testing.assert_array_equal(perm, [1, 0])

    def test_filtered_reference_is_not_distortion(self):
        """A short FIR of the reference projects fully onto the
        512-tap subspace -> very high SDR."""
        s = self._mixture(2)
        h = np.array([0.7, 0.0, -0.2, 0.1])
        est = np.stack([
            np.convolve(s[0], h)[:s.shape[1]],
            np.convolve(s[1], h)[:s.shape[1]],
        ])
        sdr, sir, sar, perm = bss_eval_sources(s, est)
        assert np.all(sdr > 40), sdr

    def test_interference_lowers_sir(self):
        s = self._mixture(3)
        est = np.stack([
            s[0] + 0.5 * s[1],
            s[1],
        ])
        sdr, sir, sar, perm = bss_eval_sources(s, est)
        # 0.5 amplitude interference -> SIR ~ 10*log10(1/0.25) ~ 6 dB
        assert 4 < sir[0] < 8, sir
        assert sir[1] > 100, sir

    def test_additive_noise_sets_sar(self):
        s = self._mixture(4)
        rng = np.random.RandomState(99)
        noise = rng.randn(*s.shape) * 0.1
        est = s + noise
        sdr, sir, sar, perm = bss_eval_sources(s, est)
        # noise at -20 dB -> SDR/SAR ~ 20 dB
        assert np.all(np.abs(sdr - 20) < 2), sdr
        assert np.all(np.abs(sar - 20) < 2), sar

    def test_k_plus_1_selection(self):
        s = self._mixture(5)
        rng = np.random.RandomState(7)
        noise_est = rng.randn(s.shape[1]) * 0.5
        est = np.stack([s[1], noise_est, s[0]])  # permuted + noise
        sdr, sir, sar, selection = mir_eval_sources(s, est)
        np.testing.assert_array_equal(selection, [2, 0])
        assert np.all(sdr > 100), sdr


class TestSxr:
    def test_get_snr(self):
        assert float(get_snr([1, 2, 3], [1, 2, 3])) == 0.0
        assert_allclose(
            float(get_snr([2., 4., 6.], [1., 2., 3.])),
            10 * np.log10(4), rtol=1e-10)

    def test_input_sxr_known_powers(self):
        T = 1000
        rng = np.random.RandomState(0)
        # speaker 0 twice the power of speaker 1; noise unit power
        images = np.stack([
            np.sqrt(2) * rng.randn(1, T),
            rng.randn(1, T),
        ])
        noise = rng.randn(1, T)
        res = input_sxr(images, noise, average_sources=False)
        # SIR[0] = 10log10(P0/P1) ~ 3 dB
        assert_allclose(res.sir[0], 3.0, atol=0.5)
        assert_allclose(res.sir[1], -3.0, atol=0.5)

    def test_output_sxr_selection(self):
        T = 1000
        rng = np.random.RandomState(1)
        a = rng.randn(T)
        b = rng.randn(T)
        # source 0 mostly in target 1, source 1 in target 0
        image_contribution = np.stack([
            np.stack([0.1 * a, a]),
            np.stack([b, 0.1 * b]),
        ])  # (K_source=2, K_target=2, T)
        noise_contribution = 0.01 * rng.randn(2, T)
        res = output_sxr(image_contribution, noise_contribution,
                         average_sources=False)
        # cross selection resolves; SIR = 10log10(1/0.01) = 20 dB
        assert_allclose(res.sir, [20, 20], atol=1.0)


class TestStoi:
    def _speechlike(self, T=30000, seed=0):
        """Amplitude-modulated noise, non-silent."""
        rng = np.random.RandomState(seed)
        env = 0.5 + 0.5 * np.sin(
            2 * np.pi * 4 * np.arange(T) / 10000)
        return env * rng.randn(T)

    def test_identity_is_one(self):
        x = self._speechlike()
        assert float(stoi(x, x, 10000)) > 0.99

    def test_monotonic_in_snr(self):
        x = self._speechlike()
        rng = np.random.RandomState(1)
        noise = rng.randn(len(x))
        values = []
        for snr_db in [20, 5, -5]:
            scale = 10 ** (-snr_db / 20) * np.std(x) / np.std(noise)
            values.append(float(stoi(x, x + scale * noise, 10000)))
        assert values[0] > values[1] > values[2], values

    def test_resampling_path(self):
        x = self._speechlike(T=48000)
        v = float(stoi(x, x, 16000))
        assert v > 0.99

    def test_batched(self):
        x = self._speechlike()
        out = np.asarray(stoi(np.stack([x, x]), np.stack([x, x]), 10000))
        assert out.shape == (2,)


class TestSrmr:
    def test_modulated_speechlike_vs_stationary(self):
        """Slow modulations (speech-like) score higher than white
        noise (reverberation-like)."""
        rng = np.random.RandomState(0)
        T = 32000
        env = np.clip(np.sin(2 * np.pi * 3 * np.arange(T) / 16000), 0, None)
        speechlike = env * rng.randn(T)
        stationary = rng.randn(T)
        v_speech = float(srmr(speechlike, 16000))
        v_noise = float(srmr(stationary, 16000))
        assert v_speech > v_noise, (v_speech, v_noise)

    def test_batched(self):
        rng = np.random.RandomState(1)
        x = rng.randn(2, 16000)
        out = np.asarray(srmr(x, 16000))
        assert out.shape == (2,)


class TestWrappers:
    def _setup(self):
        rng = np.random.RandomState(0)
        T = 16000
        source = rng.randn(2, T)
        h = rng.randn(2, 3, 16) * 0.2  # (K, D, taps)
        image = np.stack([
            np.stack([np.convolve(source[k], h[k, d])[:T]
                      for d in range(3)])
            for k in range(2)
        ])  # (K, D, T)
        noise = 0.05 * rng.randn(3, T)
        observation = image.sum(0) + noise
        return source, image, noise, observation

    def test_input_metrics_shapes(self):
        source, image, noise, observation = self._setup()
        metrics = InputMetrics(
            observation=observation,
            speech_source=source,
            speech_image=image,
            noise_image=noise,
            sample_rate=8000,
        )
        d = metrics.as_dict()
        K, D = 2, 3
        assert d['mir_eval_sdr'].shape == (K, D)
        assert d['stoi'].shape == (K, D)
        assert d['srmr'].shape == (D,)
        assert d['invasive_sdr'].shape == (K, D)
        assert 'pesq' in metrics._disabled_metric_names()

    def test_output_metrics_selection_and_shapes(self):
        source, image, noise, observation = self._setup()
        # fake "separation": permuted sources + small leak
        prediction = np.stack([
            source[1] + 0.05 * source[0],
            source[0] + 0.05 * source[1],
        ])
        contribution = np.stack([
            np.stack([0.05 * source[0], source[0]]),
            np.stack([source[1], 0.05 * source[1]]),
        ])  # (K_source, K_target, T)
        noise_contribution = prediction \
            - contribution.sum(0)  # ~0 here
        metrics = OutputMetrics(
            speech_prediction=prediction,
            speech_source=source,
            speech_contribution=contribution,
            noise_contribution=noise_contribution,
            sample_rate=8000,
            enable_si_sdr=True,
        )
        d = metrics.as_dict()
        np.testing.assert_array_equal(d['mir_eval_selection'], [1, 0])
        assert d['mir_eval_sdr'].shape == (2,)
        assert d['si_sdr'].shape == (2,)
        assert d['invasive_sdr'].shape == (2,)
        assert np.all(d['si_sdr'] > 20)

    @pytest.mark.slow
    def test_output_device_routing_parity(self):
        """device_metrics=True routes BSS-Eval/STOI through the device
        implementations; values match the host oracles (on CPU-x64
        both run in f64, so the agreement is tight)."""
        source, image, noise, observation = self._setup()
        # leak + noise keep every metric in a finite regime (a clean
        # permutation gives ~300 dB SIR, where f64 round-off dominates)
        prediction = np.stack([
            source[1] + 0.05 * source[0],
            source[0] + 0.05 * source[1],
        ]) + 0.1 * np.random.RandomState(1).randn(2, source.shape[1])
        kwargs = dict(speech_prediction=prediction,
                      speech_source=source, sample_rate=8000)
        host = OutputMetrics(device_metrics=False, **kwargs)
        dev = OutputMetrics(device_metrics=True, **kwargs)
        assert not host._use_device_metrics
        assert dev._use_device_metrics
        np.testing.assert_array_equal(
            dev['mir_eval_selection'], host['mir_eval_selection'])
        for key in ('mir_eval_sdr', 'mir_eval_sir', 'mir_eval_sar'):
            np.testing.assert_allclose(
                dev[key], host[key], atol=1e-7, err_msg=key)
        np.testing.assert_allclose(dev['stoi'], host['stoi'],
                                   atol=1e-9)

    @pytest.mark.slow
    def test_input_device_routing_parity(self):
        source, image, noise, observation = self._setup()
        kwargs = dict(observation=observation, speech_source=source,
                      sample_rate=8000)
        host = InputMetrics(device_metrics=False, **kwargs)
        dev = InputMetrics(device_metrics=True, **kwargs)
        for key in ('mir_eval_sdr', 'mir_eval_sir', 'mir_eval_sar'):
            np.testing.assert_allclose(
                dev[key], host[key], atol=1e-7, err_msg=key)
        np.testing.assert_allclose(dev['stoi'], host['stoi'],
                                   atol=1e-9)

    def test_verbose_key_error(self):
        source, image, noise, observation = self._setup()
        metrics = InputMetrics(
            observation=observation,
            speech_source=source,
            sample_rate=8000,
        )
        with pytest.raises(KeyError, match='Close matches'):
            metrics['stoii']

    def test_contribution_deviation_check(self):
        source, *_ = self._setup()
        with pytest.raises(AssertionError, match='deviation'):
            OutputMetrics(
                speech_prediction=source,
                speech_source=source,
                speech_contribution=np.zeros(
                    (2, 2, source.shape[1])),
                noise_contribution=np.zeros((2, source.shape[1])),
                sample_rate=8000,
            )


def test_si_sdr_dtype_contract_checked_on_inputs():
    """Regression: the f64 assert ran AFTER jnp.asarray, which under
    x64-disabled JAX (any production process) silently downcasts
    f64 -> f32 — so a caller honoring the f64 input contract was
    rejected anyway. The contract is now checked on the inputs."""
    import pytest
    from pb_bss_tpu.evaluation import si_sdr

    ref = np.random.RandomState(0).randn(2, 200)
    est = ref + 0.1 * np.random.RandomState(1).randn(2, 200)

    # f64 inputs satisfy the contract regardless of runtime precision
    out = np.asarray(si_sdr(ref, est))
    assert out.shape == (2,) and np.isfinite(out).all()

    # f32 inputs are rejected without the explicit opt-in
    with pytest.raises(AssertionError, match='float64'):
        si_sdr(ref.astype(np.float32), est.astype(np.float32))
    out32 = np.asarray(si_sdr(ref.astype(np.float32),
                              est.astype(np.float32),
                              allow_float32=True))
    assert np.isfinite(out32).all()


def test_output_metrics_si_sdr_f32_device_inputs():
    """The facades mirror OutputMetricsBatch: f32 inputs (the
    device-first evaluation mode) opt into allow_float32
    automatically instead of tripping the reference's f64 assert."""
    from pb_bss_tpu.evaluation.wrapper import OutputMetrics

    rng = np.random.RandomState(3)
    ref = rng.randn(2, 2000)
    est = ref + 0.2 * rng.randn(2, 2000)
    m = OutputMetrics(
        speech_prediction=est.astype(np.float32),
        speech_source=ref.astype(np.float32),
        sample_rate=8000, enable_si_sdr=True)
    assert np.isfinite(np.asarray(m.si_sdr)).all()


def test_si_sdr_facade_gate_rejects_integers_and_allows_mixed():
    """Review findings (r5): the auto-opt-in gate must (a) keep
    rejecting integer inputs — int16 PCM through allow_float32 would
    silently compute garbage (integer energy sums overflow), and
    (b) accept the very case it exists for: an f64 reference with an
    f32 device-produced estimation."""
    import pytest
    from pb_bss_tpu.evaluation.wrapper import OutputMetrics

    rng = np.random.RandomState(7)
    ref = rng.randn(2, 2000)
    est = ref + 0.2 * rng.randn(2, 2000)

    pcm = (np.clip(ref, -1, 1) * 32767).astype(np.int16)
    m_int = OutputMetrics(
        speech_prediction=pcm, speech_source=pcm,
        sample_rate=8000, enable_si_sdr=True)
    with pytest.raises(AssertionError, match='float64'):
        m_int.si_sdr

    m_mixed = OutputMetrics(
        speech_prediction=est.astype(np.float32),
        speech_source=ref,            # f64 reference, f32 estimate
        sample_rate=8000, enable_si_sdr=True)
    assert np.isfinite(np.asarray(m_mixed.si_sdr)).all()
