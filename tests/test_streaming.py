"""Sample-level streaming separation: reconstruction identity,
chunk-size independence, and separation quality on the synthetic
2-speaker scenario."""
import numpy as np
import pytest

from pb_bss_tpu.streaming import StreamingSeparator
from pb_bss_tpu.testing.dummy_data import low_reverberation_data


def _run_stream(sep, x, chunk=1000):
    outs = [sep.process(x[:, i:i + chunk])
            for i in range(0, x.shape[-1], chunk)]
    outs.append(sep.flush())
    return np.concatenate(outs, axis=-1)


def _sdr(references, estimates):
    """Per-source best-permutation BSS-Eval SDR (native)."""
    from pb_bss_tpu.evaluation.module_bss_eval import bss_eval_sources
    K = references.shape[0]
    if estimates.shape[0] > K:
        from pb_bss_tpu.evaluation import OutputMetrics
        om = OutputMetrics(speech_prediction=estimates,
                           speech_source=references, sample_rate=8000)
        return np.asarray(om.mir_eval_sdr)
    return bss_eval_sources(references, estimates)[0]


def test_masks_sum_to_reference_channel():
    """The K posteriors sum to one per T-F bin, so the summed outputs
    reconstruct the (delayed) reference channel exactly — the whole
    analysis/OLA chain is validated sample-by-sample."""
    rng = np.random.default_rng(0)
    D, n = 3, 128 * 16 * 6
    x = rng.standard_normal((D, n)).astype(np.float32)
    sep = StreamingSeparator(num_classes=2, block_frames=16,
                             init_iterations=3)
    out = _run_stream(sep, x, chunk=997)  # deliberately odd chunks
    delay = sep.size - sep.shift
    assert out.shape == (2, n + delay), out.shape
    recon = out.sum(axis=0)
    # The final `delay` samples are edge-partial (their completing
    # frames would need input beyond the stream end — the offline
    # transform with fading=False has the same edge).
    np.testing.assert_allclose(
        recon[delay:n], x[0, :n - delay], atol=2e-4)


def test_chunk_size_independence():
    """Feeding the same stream in different chunkings produces
    identical output (buffering is transparent)."""
    rng = np.random.default_rng(1)
    D, n = 2, 128 * 16 * 4
    x = rng.standard_normal((D, n)).astype(np.float32)
    outs = []
    for chunk in (512, 2048, n):
        sep = StreamingSeparator(num_classes=2, block_frames=16,
                                 init_iterations=3)
        outs.append(_run_stream(sep, x, chunk=chunk))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-5)


def test_snapshot_resume_continues_exactly():
    """state_dict()/load_state_dict(): a stream snapshotted mid-way
    and resumed on a FRESH separator must produce bit-identical output
    to the uninterrupted stream (serving failover)."""
    rng = np.random.default_rng(3)
    D, n = 3, 128 * 16 * 8
    x = rng.standard_normal((D, n)).astype(np.float32)
    kwargs = dict(num_classes=2, block_frames=16, init_iterations=3,
                  init_frames=32)

    sep_a = StreamingSeparator(**kwargs)
    out_a1 = sep_a.process(x[:, :n // 2])
    state = sep_a.state_dict()
    out_a2 = np.concatenate(
        [sep_a.process(x[:, n // 2:]), sep_a.flush()], axis=-1)

    sep_b = StreamingSeparator(**kwargs).load_state_dict(state)
    out_b2 = np.concatenate(
        [sep_b.process(x[:, n // 2:]), sep_b.flush()], axis=-1)

    np.testing.assert_allclose(out_b2, out_a2, atol=1e-6)
    assert out_a1.shape[-1] + out_a2.shape[-1] > n  # sanity

    with pytest.raises(AssertionError, match='mismatch'):
        StreamingSeparator(num_classes=3,
                           block_frames=16).load_state_dict(state)
    # regression: inner_iterations / aligner are config too — a
    # resume with different values used to pass the check and
    # silently diverge from the bit-identical promise
    with pytest.raises(AssertionError, match='mismatch'):
        StreamingSeparator(
            inner_iterations=2, **kwargs).load_state_dict(state)
    with pytest.raises(AssertionError, match='mismatch'):
        StreamingSeparator(align=False, **kwargs).load_state_dict(state)


def test_snapshot_resume_beamformed():
    """The beamformer state (decayed PSDs, phase-continuous weights)
    survives the snapshot too."""
    rng = np.random.default_rng(4)
    D, n = 3, 128 * 16 * 6
    x = rng.standard_normal((D, n)).astype(np.float32)
    kwargs = dict(num_classes=2, block_frames=16, init_iterations=3,
                  init_frames=32, beamformer='mvdr_souden')
    sep_a = StreamingSeparator(**kwargs)
    _ = sep_a.process(x[:, :n // 2])
    state = sep_a.state_dict()
    out_a = sep_a.process(x[:, n // 2:])
    sep_b = StreamingSeparator(**kwargs).load_state_dict(state)
    out_b = sep_b.process(x[:, n // 2:])
    np.testing.assert_allclose(out_b, out_a, atol=1e-6)


def test_flush_ends_the_stream():
    """flush() emits the overlap-add tail exactly once: a second
    flush is empty and further process() calls raise instead of
    silently double-adding the already-emitted tail."""
    rng = np.random.default_rng(2)
    D, n = 2, 128 * 16 * 3
    x = rng.standard_normal((D, n)).astype(np.float32)
    sep = StreamingSeparator(num_classes=2, block_frames=16,
                             init_iterations=2)
    sep.process(x)
    sep.flush()
    assert sep.flush().shape == (2, 0)
    with pytest.raises(RuntimeError, match='flushed'):
        sep.process(x[:, :100])


@pytest.mark.slow
def test_separates_two_speakers():
    """Mask-based streaming on the synthetic reverberant 2-speaker
    scene: BSS-Eval SDR of every source improves over the mixture
    (measured baseline: mixture [-7.3, 7.7] dB, mask stream
    [1.9, 11.1] dB)."""
    example = low_reverberation_data(seed=0)
    obs = example['observation'].astype(np.float64)
    sources = example['speech_source']
    sep = StreamingSeparator(num_classes=3, block_frames=32,
                             forgetting=1.0, inner_iterations=2,
                             init_iterations=20)
    out = _run_stream(sep, obs.astype(np.float32), chunk=4096)
    delay = sep.size - sep.shift
    out = np.float64(out[:, delay:delay + obs.shape[-1]])

    sdr_mix = _sdr(sources, np.broadcast_to(obs[0], sources.shape))
    sdr_out = _sdr(sources, out)
    assert np.all(sdr_out > sdr_mix + 1.0), (sdr_out, sdr_mix)


def _moving_scene(duration_s, sr=8000, d=4, seed=0):
    """2 sources whose mixing vectors rotate to new random directions
    over the stream (the drift case the periodic realignment exists
    for); returns (observation (D, N) f32, sources (2, N))."""
    rng = np.random.default_rng(seed)
    n = int(duration_s * sr)
    t = np.arange(n)
    src = np.stack([
        (0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t / sr))
        * rng.standard_normal(n),
        (0.6 + 0.4 * np.sin(2 * np.pi * 4.7 * t / sr + 1.0))
        * rng.standard_normal(n),
    ])
    alpha = (t / n)[None, :]
    obs = np.zeros((d, n))
    for k in range(2):
        a = rng.standard_normal(d)
        b = rng.standard_normal(d)
        a /= np.linalg.norm(a)
        b /= np.linalg.norm(b)
        mix = (1 - alpha) * a[:, None] + alpha * b[:, None]
        mix /= np.linalg.norm(mix, axis=0, keepdims=True)
        obs += mix * src[k][None, :]
    obs += 0.05 * rng.standard_normal((d, n))
    return obs.astype(np.float32), src


def _quarter_sdr(out, src):
    """(mean SDR per quarter, best assignment per quarter)."""
    import itertools
    n = src.shape[-1]
    rows = []
    for q in range(4):
        sl = slice(q * n // 4, (q + 1) * n // 4)
        o, s = out[:, sl], src[:, sl]
        best = None
        for perm in itertools.permutations(range(o.shape[0]),
                                           s.shape[0]):
            sdrs = []
            for i, j in enumerate(perm):
                proj = (np.dot(o[j], s[i]) / np.dot(s[i], s[i])) * s[i]
                e = o[j] - proj
                num = np.dot(proj, proj)
                sdrs.append(10 * np.log10(
                    num / np.maximum(np.dot(e, e), 1e-12)))
            mean = np.mean(sdrs)
            if best is None or mean > best[0]:
                best = (mean, perm)
        rows.append(best)
    return [r[0] for r in rows], [r[1] for r in rows]


@pytest.mark.slow
def test_moving_sources_drift_correction():
    """On a slowly moving scene the default periodic realignment must
    (a) keep class identity stable across the stream and (b) hold
    late-stream quality where the warm-up-only policy collapses
    (measured: Q3 mean SDR -6.0 dB without realignment vs +0.6 dB
    with interval 8). The scene must move SLOWLY relative to the
    model's forgetting horizon and the aligner's 4 s affiliation
    window — at half this duration (twice the rotation rate) even the
    realigned stream collapses, so the full 60 s scene is the test."""
    obs, src = _moving_scene(60.0)

    def run(realign_interval):
        sep = StreamingSeparator(
            num_classes=3, block_frames=32, forgetting=0.995,
            inner_iterations=2, init_iterations=20,
            realign_interval=realign_interval)
        outs = [sep.process(obs[:, i:i + 4096])
                for i in range(0, obs.shape[-1], 4096)]
        outs.append(sep.flush())
        out = np.concatenate(outs, axis=-1)
        delay = sep.size - sep.shift
        return np.float64(out[:, delay:delay + obs.shape[-1]])

    sdr_default, perms_default = _quarter_sdr(run(8), src)
    sdr_off, _ = _quarter_sdr(run(None), src)

    # identity never swaps mid-stream under the majority-anchored
    # periodic realignment
    assert len(set(perms_default)) == 1, perms_default
    # the realigned stream must beat the warm-up-only policy in the
    # second half of the moving scene
    assert np.mean(sdr_default[2:]) > np.mean(sdr_off[2:]) + 1.0, (
        sdr_default, sdr_off)


@pytest.mark.slow
def test_beamformed_streaming():
    """GEV-beamformed streaming on decayed class PSDs: finite output,
    mean SDR above the mixture, and no block-boundary energy bursts
    (phase-continuous weights, warm PSD catch-up)."""
    example = low_reverberation_data(seed=0)
    obs = example['observation'].astype(np.float64)
    sources = example['speech_source']
    sep = StreamingSeparator(num_classes=3, block_frames=32,
                             forgetting=1.0, inner_iterations=2,
                             init_iterations=20, beamformer='gev+ban')
    out = _run_stream(sep, obs.astype(np.float32), chunk=4096)
    assert np.isfinite(out).all()
    delay = sep.size - sep.shift
    out = np.float64(out[:, delay:delay + obs.shape[-1]])

    sdr_mix = _sdr(sources, np.broadcast_to(obs[0], sources.shape))
    sdr_out = _sdr(sources, out)
    assert np.mean(sdr_out) > np.mean(sdr_mix) + 1.0, (
        sdr_out, sdr_mix)

    # Block-boundary continuity: the jump across block boundaries is
    # no larger than the typical within-signal sample step.
    block = sep.block_frames * sep.shift
    bounds = np.arange(block, out.shape[-1] - 1, block)
    jumps = np.abs(out[:, bounds] - out[:, bounds - 1])
    typical = np.mean(np.abs(np.diff(out, axis=-1))) + 1e-9
    assert np.mean(jumps) < 20 * typical, (
        np.mean(jumps), typical)
