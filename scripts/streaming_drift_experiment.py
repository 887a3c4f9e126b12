"""Long-stream drift measurement for the StreamingSeparator.

Scene: a ~minute-long 2-speaker mixture whose mixing vectors ROTATE
slowly over the stream (each source's direction interpolates to a new
random direction over the full duration) — the failure mode the
warm-up-only alignment policy is exposed to: per-frequency class
identity locked at warm-up can drift arbitrarily once the spatial
scene moves.

Measured per ``realign_interval`` in {off, 8, 32} blocks:

* per-quarter SDR of the best time-invariant channel->source
  assignment (does separation quality survive into the late stream?)
* identity stability: the per-quarter best assignments, compared
  across quarters (a swap mid-stream is a hard serving failure even
  when SDR looks fine).

Run on CPU (x64 irrelevant — the separator is f32):
    python scripts/streaming_drift_experiment.py [duration_s]
"""
import itertools
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402

from pb_bss_tpu.streaming import StreamingSeparator  # noqa: E402

SR = 8000


def moving_scene(duration_s, d=4, seed=0):
    """(observation (D, N), sources (2, N)): mixing vectors rotate
    from one random direction to another over the stream."""
    rng = np.random.default_rng(seed)
    n = int(duration_s * SR)
    t = np.arange(n)
    # speech-like: amplitude-modulated noise, different rates
    src = np.stack([
        (0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t / SR))
        * rng.standard_normal(n),
        (0.6 + 0.4 * np.sin(2 * np.pi * 4.7 * t / SR + 1.0))
        * rng.standard_normal(n),
    ])
    def directions():
        a = rng.standard_normal(d)
        b = rng.standard_normal(d)
        a /= np.linalg.norm(a)
        b /= np.linalg.norm(b)
        return a, b
    alpha = (t / n)[None, :]                     # (1, N)
    obs = np.zeros((d, n))
    for k in range(2):
        a, b = directions()
        mix = (1 - alpha) * a[:, None] + alpha * b[:, None]  # (D, N)
        mix /= np.linalg.norm(mix, axis=0, keepdims=True)
        obs += mix * src[k][None, :]
    obs += 0.05 * rng.standard_normal((d, n))
    return obs.astype(np.float32), src


def quarter_metrics(out, src):
    """Per-quarter SDR (best fixed assignment per quarter) and the
    assignment itself."""
    n = src.shape[-1]
    K = out.shape[0]
    rows = []
    for q in range(4):
        sl = slice(q * n // 4, (q + 1) * n // 4)
        o, s = out[:, sl], src[:, sl]
        best = None
        for perm in itertools.permutations(range(K), s.shape[0]):
            sdrs = []
            for i, j in enumerate(perm):
                e = o[j] - (np.dot(o[j], s[i]) / np.dot(s[i], s[i])) \
                    * s[i]
                num = np.dot(o[j], s[i]) ** 2 / np.dot(s[i], s[i])
                sdrs.append(10 * np.log10(
                    num / np.maximum(np.dot(e, e), 1e-12)))
            mean = np.mean(sdrs)
            if best is None or mean > best[0]:
                best = (mean, perm, sdrs)
        rows.append(best)
    return rows


def run(duration_s, realign_interval):
    obs, src = moving_scene(duration_s)
    sep = StreamingSeparator(
        num_classes=3, block_frames=32, forgetting=0.995,
        inner_iterations=2, init_iterations=20,
        realign_interval=realign_interval)
    outs = []
    chunk = 4096
    for i in range(0, obs.shape[-1], chunk):
        outs.append(sep.process(obs[:, i:i + chunk]))
    outs.append(sep.flush())
    out = np.concatenate(outs, axis=-1)
    delay = sep.size - sep.shift
    out = np.float64(out[:, delay:delay + obs.shape[-1]])
    rows = quarter_metrics(out, src)
    perms = [r[1] for r in rows]
    stable = len(set(perms)) == 1
    return rows, stable


def main():
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    for interval in (None, 32, 8):
        rows, stable = run(duration, interval)
        sdr = ', '.join(f'{r[0]:5.2f}' for r in rows)
        perms = [r[1] for r in rows]
        print(f'realign_interval={str(interval):>4}: per-quarter mean '
              f'SDR [{sdr}] dB, assignments {perms}, '
              f'identity-stable={stable}', flush=True)


if __name__ == '__main__':
    main()
