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


@pytest.mark.slow
def test_separates_two_speakers():
    """On the synthetic reverberant 2-speaker scene each source is
    better explained by its best-matching stream output than by the
    mixture (mask-based streaming separation actually separates)."""
    example = low_reverberation_data(seed=0)
    obs = example['observation'].astype(np.float32)
    sources = example['speech_source']
    sep = StreamingSeparator(num_classes=3, block_frames=32,
                             forgetting=1.0, inner_iterations=2,
                             init_iterations=15)
    out = _run_stream(sep, obs, chunk=4096)
    delay = sep.size - sep.shift
    out = out[:, delay:delay + obs.shape[-1]]

    def ncorr(a, b):
        a = a - a.mean()
        b = b - b.mean()
        return abs(np.dot(a, b)) / np.maximum(
            np.linalg.norm(a) * np.linalg.norm(b), 1e-30)

    improved = 0
    for k in range(sources.shape[0]):
        c_mix = ncorr(obs[0], sources[k])
        c_best = max(ncorr(out[j], sources[k])
                     for j in range(out.shape[0]))
        if c_best > c_mix + 0.02:
            improved += 1
    assert improved == sources.shape[0], (improved, sources.shape[0])
