"""Benchmark: cACGMM EM throughput (+ GEV beamforming) vs NumPy-CPU.

Config matches the driver BASELINE.json anchor: 6-channel 2-speaker(+1
noise class) mixture, 512-pt STFT (F=513 bins), 20-iteration EM, GEV
beamforming — the reference pipeline of
/root/reference/tests/test_distribution/test_spatial_mm.py.

The baseline is a faithful single-thread NumPy implementation of the
same EM math (quadratic-form einsum, weighted scatter, per-(F,K)
``np.linalg.eigh``) measured in-process on this machine's CPU, i.e. the
reference's compute pattern without the library overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

F, T, D, K = 513, 300, 6, 3
EM_ITERS = 20


def _make_data(seed=0):
    rng = np.random.default_rng(seed)
    # Two directional sources + diffuse noise, mixed per frequency.
    atf = rng.standard_normal((F, D, 2)) + 1j * rng.standard_normal((F, D, 2))
    s = rng.standard_normal((F, 2, T)) + 1j * rng.standard_normal((F, 2, T))
    noise = 0.3 * (
        rng.standard_normal((F, D, T)) + 1j * rng.standard_normal((F, D, T)))
    y = np.einsum('fdk,fkt->fdt', atf, s) + noise  # (F, D, T)
    return np.swapaxes(y, -2, -1)  # (F, T, D)


# --------------------------------------------------------------------------
# NumPy-CPU baseline: reference compute pattern (single thread, per-bin eigh)
# --------------------------------------------------------------------------

def _numpy_em(y, iterations, seed=0):
    rng = np.random.RandomState(seed)
    yt = y / np.maximum(
        np.linalg.norm(y, axis=-1, keepdims=True), 1e-30)
    yt = np.swapaxes(yt, -2, -1)  # (F, D, T)
    f, d, t = yt.shape
    affiliation = rng.uniform(size=(f, K, t))
    affiliation /= affiliation.sum(axis=-2, keepdims=True)
    quadratic_form = np.ones_like(affiliation)
    eigvals = None
    eigvecs = None
    for it in range(iterations):
        # M-step
        weight = np.mean(affiliation, axis=-1, keepdims=True)
        weights = affiliation / np.maximum(quadratic_form, 1e-30)
        scatter = d * np.einsum(
            'fkt,fdt,fet->fkde', weights, yt, yt.conj())
        scatter /= np.maximum(
            affiliation.sum(-1), 1e-30)[..., None, None]
        scatter = (scatter + np.swapaxes(scatter.conj(), -1, -2)) / 2
        eigvals, eigvecs = np.linalg.eigh(scatter)
        eigvals = eigvals / np.maximum(
            eigvals.max(-1, keepdims=True), 1e-30)
        eigvals = np.maximum(eigvals, 1e-10)
        # E-step
        z = np.einsum('fkde,fdt->fket', eigvecs.conj(), yt)
        quadratic_form = np.maximum(np.einsum(
            'fket,fke->fkt', z.real ** 2 + z.imag ** 2, 1.0 / eigvals),
            1e-30)
        log_pdf = -d * np.log(quadratic_form) \
            - np.log(eigvals).sum(-1)[..., None]
        affiliation = np.exp(
            log_pdf - log_pdf.max(axis=-2, keepdims=True)) * weight
        affiliation /= np.maximum(
            affiliation.sum(axis=-2, keepdims=True), 1e-30)
    return affiliation


def _numpy_gev(phi_xx, phi_nn):
    import scipy.linalg
    out = np.empty(phi_xx.shape[:-1], complex)
    for f in range(phi_xx.shape[0]):
        w, v = scipy.linalg.eigh(phi_xx[f], phi_nn[f])
        out[f] = v[:, -1]
    return out


def bench_numpy(y):
    _numpy_em(y, 1)  # warm up BLAS threads / allocators
    start = time.perf_counter()
    affiliation = _numpy_em(y, 3)
    em_time = (time.perf_counter() - start) / 3  # sec / EM iter

    yt = np.swapaxes(y, -2, -1)
    psd = np.einsum('fkt,fdt,fet->fkde',
                    affiliation / affiliation.sum(-1, keepdims=True),
                    yt, yt.conj())
    start = time.perf_counter()
    _numpy_gev(psd[:, 0], psd[:, -1] + 1e-6 * np.eye(D))
    gev_time = time.perf_counter() - start
    return em_time, gev_time


# --------------------------------------------------------------------------
# TPU path
# --------------------------------------------------------------------------

def bench_jax(y):
    import jax
    import jax.numpy as jnp
    from pb_bss_tpu.models.cacgmm import CACGMMTrainer
    from pb_bss_tpu.extraction.beamformer import (
        get_power_spectral_density_matrix, get_gev_vector,
    )

    # Timing protocol for the tunneled TPU backend:
    # (a) complex data must not cross the host boundary (combine
    #     real/imag parts on device),
    # (b) repeat executions with identical inputs are memoized, so
    #     every rep gets a distinct pre-staged input,
    # (c) ``block_until_ready`` does not actually synchronize on this
    #     backend — completion is forced by FETCHING a derived scalar
    #     to the host inside the timed window.
    fetch = jax.jit(lambda v: v + 0.0)
    rng = np.random.default_rng(123)
    reps = 20
    # real-pair inputs (complex must not cross the boundary), fully
    # materialized on device before the timed window
    inputs = [
        (jnp.asarray(
             np.ascontiguousarray(y.real, np.float32)
             + 1e-3 * rng.standard_normal(y.shape).astype(np.float32)),
         jnp.asarray(np.ascontiguousarray(y.imag, np.float32)))
        for _ in range(reps)
    ]
    _ = np.asarray(fetch(sum(a.sum() + b.sum() for a, b in inputs)))
    trainer = CACGMMTrainer()

    @jax.jit
    def fit(y_re, y_im):
        model = trainer.fit(
            y_re + 1j * y_im, num_classes=K, iterations=EM_ITERS)
        return jnp.sum(model.cacg.covariance_eigenvalues)

    _ = np.asarray(fetch(fit(*inputs[0])))  # compile + warm
    start = time.perf_counter()
    acc = sum(fit(a, b) for a, b in inputs)
    _ = np.asarray(fetch(acc))
    em_time = (time.perf_counter() - start) / (reps * EM_ITERS)

    # Device-amortized throughput: B fits in ONE program. The
    # sequential loop above is bounded by the ~1-3.5 ms host/tunnel
    # dispatch per call, not by the chip; batching B utterances into
    # one call (standard serving practice) amortizes it away and
    # measures the device.
    B, reps_b = 8, 6
    rng_b = np.random.default_rng(321)
    inputs_b = [
        (jnp.asarray(
             np.broadcast_to(y.real, (B,) + y.shape)
             + 1e-3 * rng_b.standard_normal(
                 (B,) + y.shape).astype(np.float32), jnp.float32),
         jnp.asarray(
             np.broadcast_to(y.imag, (B,) + y.shape).copy(),
             jnp.float32))
        for _ in range(reps_b)
    ]
    _ = np.asarray(fetch(sum(a.sum() + b.sum() for a, b in inputs_b)))

    @jax.jit
    def fit_batched(y_re, y_im):
        # 4D input: the fused kernel folds the batch into the bin
        # axis (independent bins), filling lane tiles with ~6x less
        # padding than vmap's extra grid dimension
        model = trainer.fit(
            y_re + 1j * y_im, num_classes=K, iterations=EM_ITERS)
        return jnp.sum(model.cacg.covariance_eigenvalues)

    _ = np.asarray(fetch(fit_batched(*inputs_b[0])))
    start = time.perf_counter()
    acc = sum(fit_batched(a, b) for a, b in inputs_b)
    _ = np.asarray(fetch(acc))
    em_batched = (time.perf_counter() - start) / (reps_b * B * EM_ITERS)
    bench_jax.em_batched = em_batched

    # production recipe: reduced Jacobi sweeps inside the
    # self-correcting EM (quality-equivalent, see
    # tests/test_models/test_cacgmm.py::test_eigh_sweeps_quality_equivalent)
    @jax.jit
    def fit_fast(y_re, y_im):
        model = trainer.fit(
            y_re + 1j * y_im, num_classes=K, iterations=EM_ITERS,
            eigh_sweeps=4)
        return jnp.sum(model.cacg.covariance_eigenvalues)

    _ = np.asarray(fetch(fit_fast(*inputs[0])))
    start = time.perf_counter()
    acc = sum(fit_fast(a, b) for a, b in inputs)
    _ = np.asarray(fetch(acc))
    em_fast_time = (time.perf_counter() - start) / (reps * EM_ITERS)
    bench_jax.em_fast_time = em_fast_time

    y0 = jax.jit(lambda re, im: re + 1j * im)(*inputs[0])
    model = trainer.fit(y0, num_classes=K, iterations=EM_ITERS)
    affiliation = model.predict(y0)

    @jax.jit
    def gev(affiliation, y_re, y_im):
        yt = jnp.swapaxes(y_re + 1j * y_im, -2, -1)
        psd = get_power_spectral_density_matrix(
            yt, jnp.asarray(affiliation), source_dim=-2)
        w = get_gev_vector(psd[:, 0], psd[:, -1])
        return jnp.sum(jnp.abs(w))

    _ = np.asarray(fetch(gev(affiliation, *inputs[0])))  # compile
    start = time.perf_counter()
    acc = sum(gev(affiliation, a, b) for a, b in inputs)
    _ = np.asarray(fetch(acc))
    gev_time = (time.perf_counter() - start) / reps
    return em_time, gev_time


def bench_end_to_end():
    """Full separation throughput via the shipped ``separate()`` API:
    STFT -> 20-iter cACGMM -> DHTV permutation alignment -> GEV+BAN
    beamforming -> iSTFT, ONE fused device program per utterance.

    Returns (e2e sec/utt incl. fetching the separated waveforms to the
    host, compute-only sec/utt with a scalar fetch). Inputs are
    pre-staged on device (standard throughput protocol; on the tunneled
    dev backend host<->device moves are ~15 MB/s and would otherwise
    swamp the measurement — a real deployment streams/batches I/O)."""
    import jax
    import jax.numpy as jnp
    from pb_bss_tpu.pipeline import separate

    rng = np.random.default_rng(1)
    num_samples = 38520  # ~4.8 s at 8 kHz
    reps = 5
    observations = [
        jnp.asarray(
            rng.standard_normal((D, num_samples)).astype(np.float32))
        for _ in range(reps + 1)
    ]
    fetch = jax.jit(lambda v: v + 0.0)
    _ = np.asarray(fetch(sum(o.sum() for o in observations)))

    def run(o):
        return separate(
            o, num_classes=K, iterations=EM_ITERS, beamformer='gev+ban')

    out = np.asarray(run(observations[0]))  # compile + warm
    assert out.shape == (K, num_samples), out.shape
    start = time.perf_counter()
    for observation in observations[1:]:
        _ = np.asarray(run(observation))
    e2e = (time.perf_counter() - start) / reps

    g = jax.jit(lambda o: jnp.sum(jnp.abs(run(o))))
    _ = np.asarray(fetch(g(observations[0])))
    start = time.perf_counter()
    acc = sum(g(o) for o in observations[1:])
    _ = np.asarray(fetch(acc))
    compute = (time.perf_counter() - start) / reps
    return e2e, compute


def bench_extras():
    """BASELINE.md north-star configs 2-5, reported on stderr.

    Each config is one fused device program timed with the honest
    protocol (distinct pre-staged inputs, derived-scalar fetch).
    Failures are reported but never break the headline metric.
    """
    import sys
    import jax
    import jax.numpy as jnp

    fetch = jax.jit(lambda v: v + 0.0)
    rng = np.random.default_rng(7)
    lines = []

    def timed(fn, inputs):
        _ = np.asarray(fetch(fn(*inputs[0])))  # compile + warm
        start = time.perf_counter()
        acc = sum(fn(*i) for i in inputs)
        _ = np.asarray(fetch(acc))
        return (time.perf_counter() - start) / len(inputs)

    # config 2: CWMM 20-iter EM + MVDR-Souden + BAN
    try:
        from pb_bss_tpu.models.cwmm import CWMMTrainer
        from pb_bss_tpu.extraction.beamformer import (
            get_power_spectral_density_matrix, get_mvdr_vector_souden,
            blind_analytic_normalization,
        )
        y = _make_data(seed=11)
        inputs = [
            (jnp.asarray(y.real + 1e-3 * rng.standard_normal(y.shape),
                         np.float32),
             jnp.asarray(y.imag, np.float32))
            for _ in range(5)
        ]
        _ = np.asarray(fetch(sum(a.sum() + b.sum() for a, b in inputs)))

        @jax.jit
        def cwmm_mvdr(y_re, y_im):
            yc = y_re + 1j * y_im
            trainer = CWMMTrainer()
            affiliation = trainer.fit_predict(
                yc, num_classes=K, iterations=EM_ITERS)
            yt = jnp.swapaxes(yc, -2, -1)
            psd = get_power_spectral_density_matrix(
                yt, affiliation, source_dim=-2)
            w = get_mvdr_vector_souden(psd[:, 0], psd[:, -1])
            w = blind_analytic_normalization(w, psd[:, -1])
            return jnp.sum(jnp.abs(w))
        dt = timed(cwmm_mvdr, inputs)
        lines.append(f'cwmm20+mvdr_souden_ban {dt * 1e3:.1f} ms')
    except Exception as e:  # pragma: no cover - reporting only
        lines.append(f'cwmm config failed: {type(e).__name__}: {e}')

    # config 3: vMF x cACG integration model (DC-embedding joint fit)
    try:
        from pb_bss_tpu.models.vmfcacgmm import VMFCACGMMTrainer
        y = _make_data(seed=12)
        E = 20
        emb = rng.standard_normal((F, T, E)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        inputs = [
            (jnp.asarray(y.real + 1e-3 * rng.standard_normal(y.shape),
                         np.float32),
             jnp.asarray(y.imag, np.float32),
             jnp.asarray(emb))
            for _ in range(5)
        ]
        _ = np.asarray(fetch(sum(a.sum() + b.sum() + c.sum()
                                 for a, b, c in inputs)))

        @jax.jit
        def vmfcacg(y_re, y_im, emb):
            model = VMFCACGMMTrainer().fit(
                y_re + 1j * y_im, emb, num_classes=K,
                iterations=EM_ITERS)
            return jnp.sum(model.cacg.covariance_eigenvalues)
        dt = timed(vmfcacg, inputs)
        lines.append(f'vmfcacgmm20 {dt * 1e3:.1f} ms')
    except Exception as e:  # pragma: no cover
        lines.append(f'vmfcacgmm config failed: {type(e).__name__}: {e}')

    # config 3b: complex Bingham MM (warm-started chord-Newton M-step)
    try:
        from pb_bss_tpu.models.cbmm import CBMMTrainer
        y = _make_data(seed=13)
        inputs = [
            (jnp.asarray(y.real + 1e-3 * rng.standard_normal(y.shape),
                         np.float32),
             jnp.asarray(y.imag, np.float32))
            for _ in range(3)
        ]
        _ = np.asarray(fetch(sum(a.sum() + b.sum() for a, b in inputs)))

        @jax.jit
        def cbmm(y_re, y_im):
            m = CBMMTrainer().fit(
                y_re + 1j * y_im, num_classes=K, iterations=EM_ITERS)
            return jnp.sum(m.complex_bingham.covariance_eigenvalues)
        dt = timed(cbmm, inputs)
        lines.append(f'cbmm20 {dt * 1e3:.1f} ms')
    except Exception as e:  # pragma: no cover
        lines.append(f'cbmm config failed: {type(e).__name__}: {e}')

    # config 3c: frequency-constant mixture weights (the cross-shard
    # psum mode) — per-iteration-fused kernels (r4) vs the scan path
    try:
        from pb_bss_tpu.models.cacgmm import CACGMMTrainer
        y = _make_data(seed=14)
        B = 8
        inputs = [
            (jnp.asarray(
                 np.broadcast_to(y.real, (B,) + y.shape)
                 + 1e-3 * rng.standard_normal(
                     (B,) + y.shape).astype(np.float32), jnp.float32),
             jnp.asarray(np.broadcast_to(y.imag, (B,) + y.shape).copy(),
                         jnp.float32))
            for _ in range(3)
        ]
        _ = np.asarray(fetch(sum(a.sum() + b.sum() for a, b in inputs)))

        def fc_fit(fused):
            @jax.jit
            def f(y_re, y_im):
                m = CACGMMTrainer().fit(
                    y_re + 1j * y_im, num_classes=K,
                    iterations=EM_ITERS,
                    weight_constant_axis=(-3, -1), use_fused_em=fused)
                return jnp.sum(m.cacg.covariance_eigenvalues)
            return f
        dt_fused = timed(fc_fit(True), inputs) / (B * EM_ITERS)
        dt_scan = timed(fc_fit(False), inputs) / (B * EM_ITERS)
        lines.append(
            f'fc-weight EM (psum mode): fused {dt_fused * 1e3:.3f} '
            f'ms/iter vs scan {dt_scan * 1e3:.3f} ms/iter '
            f'({dt_scan / dt_fused:.1f}x)')
    except Exception as e:  # pragma: no cover
        lines.append(f'fc config failed: {type(e).__name__}: {e}')

    # config 3d: LONG-signal EM (r4) — streamed per-iteration kernel
    # vs the scan path at T=4000 (beyond the whole-fit VMEM ceiling)
    try:
        from pb_bss_tpu.models.cacgmm import CACGMMTrainer
        Tlong, iters_long = 4000, 10
        rngl = np.random.default_rng(15)
        yl = (rngl.standard_normal((F, Tlong, D))
              + 1j * rngl.standard_normal((F, Tlong, D)))
        yl /= np.linalg.norm(yl, axis=-1, keepdims=True)
        inputs = [
            (jnp.asarray(yl.real + 1e-3 * rngl.standard_normal(
                yl.shape), jnp.float32),
             jnp.asarray(yl.imag, jnp.float32))
            for _ in range(2)
        ]
        _ = np.asarray(fetch(sum(a.sum() + b.sum() for a, b in inputs)))

        def long_fit(fused):
            @jax.jit
            def f(y_re, y_im):
                m = CACGMMTrainer().fit(
                    y_re + 1j * y_im, num_classes=K,
                    iterations=iters_long, use_fused_em=fused,
                    t_block=None)
                return jnp.sum(m.cacg.covariance_eigenvalues)
            return f
        dt_stream = timed(long_fit(True), inputs) / iters_long
        dt_scan = timed(long_fit(False), inputs) / iters_long
        lines.append(
            f'long-T EM (T={Tlong}): streamed {dt_stream * 1e3:.2f} '
            f'ms/iter vs scan {dt_scan * 1e3:.2f} ms/iter '
            f'({dt_scan / dt_stream:.1f}x)')
    except Exception as e:  # pragma: no cover
        lines.append(f'long-T config failed: {type(e).__name__}: {e}')

    # config 3e: LONG-signal CWMM / CBMM (r5) — streamed kernels
    # (ops/pallas_mm_stream.py) vs the scan paths at T=4000
    try:
        from pb_bss_tpu.models.cwmm import CWMMTrainer
        from pb_bss_tpu.models.cbmm import CBMMTrainer
        Tlong = 4000
        rngl = np.random.default_rng(16)
        yl = (rngl.standard_normal((F, Tlong, D))
              + 1j * rngl.standard_normal((F, Tlong, D)))
        yl /= np.linalg.norm(yl, axis=-1, keepdims=True)
        aff0 = rngl.uniform(size=(F, K, Tlong)).astype(np.float32)
        aff0 /= aff0.sum(-2, keepdims=True)
        aff0 = jnp.asarray(aff0)
        inputs = [
            (jnp.asarray(yl.real + 1e-3 * rngl.standard_normal(
                yl.shape), jnp.float32),
             jnp.asarray(yl.imag, jnp.float32))
            for _ in range(2)
        ]
        _ = np.asarray(fetch(sum(a.sum() + b.sum() for a, b in inputs)))

        for name, Trainer, iters in (('cwmm', CWMMTrainer, 10),
                                     ('cbmm', CBMMTrainer, 5)):
            def long_mm(fused, Trainer=Trainer, iters=iters):
                @jax.jit
                def f(y_re, y_im):
                    m = Trainer().fit(
                        y_re + 1j * y_im, initialization=aff0,
                        iterations=iters, use_fused_em=fused)
                    leaf = jax.tree_util.tree_leaves(m)[0]
                    return jnp.sum(jnp.abs(leaf))
                return f
            dt_stream = timed(long_mm(True), inputs) / iters
            dt_scan = timed(long_mm(False), inputs) / iters
            lines.append(
                f'long-T {name} (T={Tlong}): streamed '
                f'{dt_stream * 1e3:.2f} ms/iter vs scan '
                f'{dt_scan * 1e3:.2f} ms/iter '
                f'({dt_scan / dt_stream:.1f}x)')
    except Exception as e:  # pragma: no cover
        lines.append(f'long-T mm config failed: {type(e).__name__}: {e}')

    # config 4: batched 3-speaker separation incl. 513-bin PA
    try:
        from pb_bss_tpu.pipeline import separate_batch
        B, N = 8, 38520
        obs = [jnp.asarray(
            rng.standard_normal((B, 6, N)).astype(np.float32))
            for _ in range(3)]
        _ = np.asarray(fetch(sum(o.sum() for o in obs)))
        g = jax.jit(lambda o: jnp.sum(jnp.abs(separate_batch(
            o, num_classes=4, iterations=EM_ITERS))))
        dt = timed(g, [(o,) for o in obs]) / B
        lines.append(
            f'3spk-batch separation {dt * 1e3:.1f} ms/utt '
            f'({4.815 / dt:.0f}x realtime)')
    except Exception as e:  # pragma: no cover
        lines.append(f'3spk batch config failed: {type(e).__name__}: {e}')

    # config 5: on-device eval sweep (SI-SDR + STOI + BSS-eval)
    try:
        from pb_bss_tpu.evaluation.module_si_sdr import si_sdr
        from pb_bss_tpu.evaluation.module_stoi import stoi
        from pb_bss_tpu.evaluation.module_bss_eval import (
            bss_eval_sources,
        )
        Kq, N = 2, 16000
        refs = rng.standard_normal((Kq, N)).astype(np.float32)
        inputs = [
            (jnp.asarray(refs),
             jnp.asarray(refs + 0.1 * rng.standard_normal(
                 (Kq, N)).astype(np.float32)))
            for _ in range(5)
        ]
        _ = np.asarray(fetch(sum(a.sum() + b.sum() for a, b in inputs)))

        # si_sdr runs on device; the default OutputMetrics facade now
        # routes BSS-Eval and STOI through the device implementations
        # on non-CPU backends (host f64 oracles timed for comparison)
        @jax.jit
        def evals(ref, est):
            return jnp.sum(si_sdr(ref, est, allow_float32=True))
        dt = timed(evals, inputs)
        est_h = refs + 0.1 * rng.standard_normal(
            (Kq, N)).astype(np.float32)

        from pb_bss_tpu.evaluation import OutputMetrics

        def facade_device(ref, est):
            om = OutputMetrics(speech_prediction=est, speech_source=ref,
                               sample_rate=8000)
            return float(np.sum(om.mir_eval['sdr'])
                         + np.sum(om.stoi))
        _ = facade_device(refs, est_h)  # compile + warm
        start = time.perf_counter()
        for _i in range(3):
            _ = facade_device(refs, est_h)
        dt_facade = (time.perf_counter() - start) / 3
        start = time.perf_counter()
        _ = stoi(refs, est_h, 8000)
        dt_stoi = time.perf_counter() - start
        start = time.perf_counter()
        _ = bss_eval_sources(refs, est_h)
        dt_bss = time.perf_counter() - start
        lines.append(
            f'eval sweep 2x2s: device si_sdr {dt * 1e3:.1f} ms, '
            f'OutputMetrics facade (device bss_eval+stoi) '
            f'{dt_facade * 1e3:.0f} ms vs host stoi {dt_stoi * 1e3:.0f}'
            f' ms + host bss_eval {dt_bss * 1e3:.0f} ms')

        # config 5b: device-resident BATCHED eval (batch 8) vs the
        # host path run 8 times — one fused program + ONE packed
        # fetch for BSS-Eval + aligned STOI (what the
        # OutputMetricsBatch facade runs)
        from pb_bss_tpu.evaluation._fused_eval_device import (
            bss_eval_stoi_fused_batch,
        )
        Beval = 8
        batch_inputs = [
            (np.stack([refs] * Beval)
             + 0.001 * rng.standard_normal(
                 (Beval, Kq, N)).astype(np.float32),
             np.stack([refs] * Beval)
             + 0.1 * rng.standard_normal(
                 (Beval, Kq, N)).astype(np.float32))
            for _ in range(3)
        ]
        # warm the compile
        _ = bss_eval_stoi_fused_batch(*batch_inputs[0],
                                      sample_rate=8000)
        start = time.perf_counter()
        acc = 0.0
        for r, e in batch_inputs:
            out = bss_eval_stoi_fused_batch(r, e, sample_rate=8000)
            acc += float(np.sum(out['sdr']) + np.sum(out['stoi']))
        dt_dev = (time.perf_counter() - start) / len(batch_inputs)
        # same measurement with inputs pre-staged on device (the
        # ~30 ms/array host->device tunnel transport excluded; a real
        # deployment evaluates device-resident separator output)
        staged = [(jnp.asarray(r), jnp.asarray(e))
                  for r, e in batch_inputs]
        _ = np.asarray(fetch(sum(r.sum() + e.sum() for r, e in staged)))
        start = time.perf_counter()
        for r, e in staged:
            out = bss_eval_stoi_fused_batch(r, e, sample_rate=8000)
            acc += float(np.sum(out['sdr']) + np.sum(out['stoi']))
        dt_staged = (time.perf_counter() - start) / len(staged)
        start = time.perf_counter()
        for b in range(Beval):
            _ = bss_eval_sources(batch_inputs[0][0][b],
                                 batch_inputs[0][1][b])
            _ = stoi(batch_inputs[0][0][b], batch_inputs[0][1][b], 8000)
        dt_host = time.perf_counter() - start
        lines.append(
            f'batched eval (B=8, bss_eval+stoi): device '
            f'{dt_dev * 1e3:.0f} ms incl. host->device transport '
            f'({dt_host / dt_dev:.1f}x) / {dt_staged * 1e3:.0f} ms '
            f'pre-staged ({dt_host / dt_staged:.1f}x) vs host '
            f'{dt_host * 1e3:.0f} ms')

        # config 5c: device SRMR (r4) — one program per 8-signal chunk
        from pb_bss_tpu.evaluation import srmr as srmr_host
        from pb_bss_tpu.evaluation import srmr_batch
        sig8 = batch_inputs[0][1][:, 0, :]          # (8, N) signals
        _ = srmr_batch(sig8, 8000)                  # compile + warm
        start = time.perf_counter()
        _ = srmr_batch(sig8, 8000)
        dt_dev_srmr = time.perf_counter() - start
        start = time.perf_counter()
        for b in range(sig8.shape[0]):
            _ = srmr_host(sig8[b], 8000)
        dt_host_srmr = time.perf_counter() - start
        lines.append(
            f'srmr (8x2s): device {dt_dev_srmr * 1e3:.0f} ms vs host '
            f'{dt_host_srmr * 1e3:.0f} ms '
            f'({dt_host_srmr / dt_dev_srmr:.1f}x)')
    except Exception as e:  # pragma: no cover
        lines.append(f'eval config failed: {type(e).__name__}: {e}')

    print('# extras: ' + '; '.join(lines), file=sys.stderr)


def em_flops_per_iteration(f=F, k=K, t=T, d=D, eigh_sweeps=2.2):
    """Analytic FLOP count of one cACGMM EM iteration (real FLOPs;
    one complex multiply-add = 8).

    ``eigh_sweeps`` is the PER-ITERATION average of the path actually
    measured (the fused EM kernel, models/cacgmm.py:_fit_fused): the
    first iteration runs 6 cold Jacobi sweeps, the remaining ones 2
    warm-started sweeps — (6 + 19*2)/20 = 2.2 at EM_ITERS=20.

    Terms (see docs/DESIGN.md "FLOP model and MFU"):
      E-step projection  z = V^H y        : 8 f k d^2 t
      quadratic form     sum |z|^2 / ev   : 4 f k d t
      posterior softmax  exp/log/normalize: ~12 f k t
      M-step scatter     (hermitian upper): 4 f k d (d+1) t
      batched Jacobi eigh (per sweep: d(d-1)/2 rotations, each
      updating two rows + two columns of length d plus the 2x2
      Schur solve)                        : sweeps f k d(d-1)/2 * 48 d
    """
    e_proj = 8 * f * k * d * d * t
    quad = 4 * f * k * d * t
    softmax = 12 * f * k * t
    m_scatter = 4 * f * k * d * (d + 1) * t
    jacobi = eigh_sweeps * f * k * (d * (d - 1) // 2) * 48 * d
    return int(e_proj + quad + softmax + m_scatter + jacobi)


# Peak FLOP/s used as the MFU denominator. The fused EM kernel does
# f32 arithmetic (precision=HIGHEST einsums); 4.6e13 is the f32 MXU
# peak of a TPU v5e-class chip (bf16 peak 1.97e14). Override with
# BENCH_PEAK_FLOPS when the chip is known.
PEAK_FLOPS_F32 = 4.6e13
# Measured VPU ceiling for the fused EM kernel's instruction blend
# (scripts/vpu_roofline.py, round 5): the kernel does ~520 FMA-FLOPs
# per posterior element per one exp/log/recip set, so its ceiling is
# the REGISTER-RESIDENT FMA rate (1.49 TFLOP/s) — not the
# transcendental-heavy 24:1 'mix' rate (1.60).
VPU_CEILING_FLOPS = 1.49e12


def _setup_compile_cache():
    """Persistent XLA compilation cache: the bench is compile-bound on
    a cold process (a dozen distinct programs at ~20-60 s each over
    a tunneled backend); warm reruns skip the compiles. Same
    opt-out/keying as tests/conftest.py."""
    import os
    if os.environ.get('PB_BSS_TPU_BENCH_COMPILE_CACHE', '1') != '0':
        import jax
        jax.config.update(
            'jax_compilation_cache_dir',
            os.environ.get(
                'JAX_COMPILATION_CACHE_DIR',
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             '.jax_compile_cache')))
        jax.config.update(
            'jax_persistent_cache_min_compile_time_secs', 0.5)


_CHILD_MARKER = '##BENCH_TPU_RESULT## '


def _tpu_child():
    """Run ALL device work in this (sub)process and emit one marker
    line with the raw timings. Runs as ``bench.py --tpu-child`` so a
    degraded-tunnel episode can only kill this process, never the
    orchestrating parent (CLAUDE.md gotcha 4c)."""
    import sys

    _setup_compile_cache()
    y = _make_data()
    em_jax, gev_jax = bench_jax(y)
    e2e_time, e2e_compute = bench_end_to_end()
    try:
        bench_extras()
    except Exception as e:
        print(f'# extras failed: {type(e).__name__}: {e}',
              file=sys.stderr)
    print(_CHILD_MARKER + json.dumps({
        'em_jax': em_jax,
        'gev_jax': gev_jax,
        'em_batched': getattr(bench_jax, 'em_batched', em_jax),
        'em_fast': getattr(bench_jax, 'em_fast_time', em_jax),
        'e2e': e2e_time,
        'e2e_compute': e2e_compute,
    }), flush=True)


def _probe_healthy(timeout):
    """One trivial-jit probe in a throwaway subprocess.

    A degraded-episode process can sleep forever in a connect-retry
    loop (gotcha 4d), so the probe must be externally killable —
    hence a subprocess with a hard timeout, never an in-process try.
    """
    import subprocess
    import sys
    code = (
        'import numpy as np, jax, jax.numpy as jnp;'
        'np.asarray(jax.jit(lambda v: v + 0.0)(jnp.float32(1.0)))'
    )
    try:
        r = subprocess.run(
            [sys.executable, '-c', code], timeout=timeout,
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE)
    except subprocess.TimeoutExpired:
        return False, f'probe timed out after {timeout:.0f}s'
    if r.returncode != 0:
        tail = r.stderr.decode(errors='replace').strip().splitlines()
        return False, tail[-1] if tail else f'probe rc={r.returncode}'
    return True, 'ok'


def _run_tpu_measurement(deadline):
    """Launch the TPU child; gate every attempt on a health probe and
    retry across degraded-tunnel episodes until ``deadline``.

    Returns the child's timing dict, or None if the backend never
    came back inside the budget."""
    import os
    import subprocess
    import sys
    import time as _time

    probe_timeout = float(os.environ.get(
        'PB_BSS_TPU_BENCH_PROBE_TIMEOUT_S', '180'))
    probe_sleep = float(os.environ.get(
        'PB_BSS_TPU_BENCH_PROBE_SLEEP_S', '60'))
    child_timeout = float(os.environ.get(
        'PB_BSS_TPU_BENCH_CHILD_TIMEOUT_S', '2700'))
    attempt = 0
    while True:
        remaining = deadline - _time.monotonic()
        if remaining <= 0:
            print('# bench: budget exhausted before a healthy '
                  'measurement', file=sys.stderr)
            return None
        t0 = _time.monotonic()
        healthy, why = _probe_healthy(min(probe_timeout, remaining))
        print(f'# bench: probe {"ok" if healthy else "UNHEALTHY"} in '
              f'{_time.monotonic() - t0:.0f}s ({why})',
              file=sys.stderr, flush=True)
        if not healthy:
            # Degraded episodes last ~an hour; poll on a bounded
            # schedule instead of dying (gotcha 4c).
            _time.sleep(min(probe_sleep,
                            max(1.0, deadline - _time.monotonic())))
            continue
        attempt += 1
        remaining = deadline - _time.monotonic()
        if remaining <= 0:
            return None
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 '--tpu-child'],
                timeout=min(child_timeout, remaining),
                stdout=subprocess.PIPE, stderr=None,
                cwd=os.path.dirname(os.path.abspath(__file__)))
        except subprocess.TimeoutExpired:
            print(f'# bench: attempt {attempt} timed out; re-probing',
                  file=sys.stderr, flush=True)
            continue
        out = r.stdout.decode(errors='replace')
        for line in out.splitlines():
            if line.startswith(_CHILD_MARKER):
                return json.loads(line[len(_CHILD_MARKER):])
        tail = '\n'.join(out.strip().splitlines()[-5:])
        print(f'# bench: attempt {attempt} failed rc={r.returncode}; '
              f'stdout tail:\n{tail}', file=sys.stderr, flush=True)
        _time.sleep(min(probe_sleep,
                        max(1.0, deadline - _time.monotonic())))


def main():
    import os
    import sys
    import time as _time

    deadline = _time.monotonic() + float(os.environ.get(
        'PB_BSS_TPU_BENCH_BUDGET_S', '5400'))

    # NumPy baseline first: pure CPU, immune to tunnel episodes — a
    # hard TPU failure below still reports it on stderr.
    y = _make_data()
    em_np, gev_np = bench_numpy(y)
    print(f'# numpy baseline: em {em_np * 1e3:.2f} ms/iter, gev '
          f'{gev_np * 1e3:.2f} ms', file=sys.stderr, flush=True)

    res = _run_tpu_measurement(deadline)
    if res is None:
        print(json.dumps({
            'metric': 'cACGMM EM iters/sec (F=513, D=6, K=3, T=300, '
                      'device-amortized batch-8)',
            'value': 0.0,
            'unit': 'iters/sec',
            'vs_baseline': 0.0,
            'error': 'TPU backend unavailable for the whole bench '
                     'budget (degraded-tunnel episode); numpy '
                     'baseline on stderr',
        }))
        sys.exit(1)

    em_jax, gev_jax = res['em_jax'], res['gev_jax']
    em_best = res['em_batched']
    e2e_time, e2e_compute = res['e2e'], res['e2e_compute']

    iters_per_sec = 1.0 / em_best
    baseline_iters_per_sec = 1.0 / em_np
    # end-to-end style weighting: 20 EM iters + one GEV solve
    pipeline = EM_ITERS * em_jax + gev_jax
    pipeline_np = EM_ITERS * em_np + gev_np

    flops = em_flops_per_iteration()
    peak = float(os.environ.get('BENCH_PEAK_FLOPS', PEAK_FLOPS_F32))
    achieved = flops / em_best
    vpu_ceiling = float(os.environ.get(
        'BENCH_VPU_CEILING_FLOPS', VPU_CEILING_FLOPS))
    print(
        f'# mfu: {flops / 1e6:.0f} MFLOP/iter (analytic, see '
        f'docs/DESIGN.md), achieved {achieved / 1e12:.2f} TFLOP/s '
        f'device-amortized, mfu_pct {100 * achieved / peak:.1f} '
        f'(vs f32 MXU peak {peak / 1e12:.0f} TFLOP/s), '
        f'{100 * achieved / vpu_ceiling:.0f}% of the MEASURED '
        f'{vpu_ceiling / 1e12:.2f} TFLOP/s VPU ceiling '
        f'(scripts/vpu_roofline.py register-resident FMA rate — the '
        f'EM blend is ~520 FMA-FLOPs per transcendental set; the '
        f'kernel is at/above the pure-VPU roofline via '
        f'Hermitian-symmetry savings, so the MXU-relative MFU is '
        f'this op mix\'s measured speed of light, see docs/DESIGN.md '
        f'"Measured roofline")',
        file=sys.stderr,
    )

    print(json.dumps({
        'metric': 'cACGMM EM iters/sec (F=513, D=6, K=3, T=300, '
                  'device-amortized batch-8)',
        'value': round(iters_per_sec, 3),
        'unit': 'iters/sec',
        'vs_baseline': round(iters_per_sec / baseline_iters_per_sec, 2),
    }))
    # Secondary detail for humans:
    print(
        f'# em: jax {em_jax * 1e3:.2f} ms/iter single-call '
        f'({res["em_fast"] * 1e3:.2f} '
        f'ms/iter with eigh_sweeps=4, '
        f'{em_best * 1e3:.3f} ms/iter device-amortized) vs numpy '
        f'{em_np * 1e3:.2f} ms/iter; gev(513x6): jax '
        f'{gev_jax * 1e3:.2f} ms vs numpy {gev_np * 1e3:.2f} ms; '
        f'pipeline speedup {pipeline_np / pipeline:.1f}x; '
        f'e2e separate() (stft+em{EM_ITERS}+DHTV+gev_ban+istft, 4.8s '
        f'utterance): {e2e_time * 1e3:.0f} ms/utt '
        f'({4.815 / e2e_time:.0f}x realtime) incl. waveform fetch, '
        f'{e2e_compute * 1e3:.1f} ms/utt compute-only '
        f'({4.815 / e2e_compute:.0f}x realtime)',
        file=sys.stderr,
    )


if __name__ == '__main__':
    import sys as _sys
    if '--tpu-child' in _sys.argv[1:]:
        _tpu_child()
    else:
        main()
