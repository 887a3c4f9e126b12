"""Spatial+spectral integration-model example [Drude2019 Integration].

The integration models couple the per-frequency spatial cACG mixture
with a GLOBAL spectral model on a Deep-Clustering-style embedding:
``VMFCACGMM`` (von Mises-Fisher spectral model, reference
pb_bss/distribution/vmfcacgmm.py) and ``GCACGMM`` (Gaussian spectral
model, reference gcacgmm.py). The spectral model ties the per-frequency
mixtures together, so no permutation alignment pass is needed — the
embedding resolves the frequency permutation.

This example builds a synthetic 2-speaker mixture plus a surrogate
embedding (an oracle-leaky one-hot per T-F bin, standing in for a DC
network's output), fits both integration models, and compares their
masks to the oracle. On TPU the fit automatically uses the fused
per-iteration Pallas kernel (ops/pallas_integration_em.py); leading
batch axes, e.g. (B, F, T, D), fold into the kernel's bin axis.

Run: python examples/integration_model_example.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pb_bss_tpu.utils import run_on_device


def make_scene(seed=0, F=129, T=200, D=6, K=2):
    """Per-frequency directional mixture with TF-sparse sources."""
    rng = np.random.default_rng(seed)
    atf = rng.standard_normal((F, D, K)) + 1j * rng.standard_normal(
        (F, D, K))
    # TF-sparse speech-like sources: log-normal envelopes
    env = np.exp(1.5 * rng.standard_normal((F, K, T)))
    s = env * (rng.standard_normal((F, K, T))
               + 1j * rng.standard_normal((F, K, T)))
    y = np.einsum('fdk,fkt->fdt', atf, s) + 0.1 * (
        rng.standard_normal((F, D, T))
        + 1j * rng.standard_normal((F, D, T)))
    dominant = np.argmax(np.abs(s), axis=1)  # (F, T)
    return np.swapaxes(y, -1, -2).astype(np.complex64), dominant


def make_embedding(dominant, K, E=20, leak=0.3, seed=1):
    """Surrogate DC embedding: class prototypes + leak + noise."""
    rng = np.random.default_rng(seed)
    protos = rng.standard_normal((K, E))
    protos /= np.linalg.norm(protos, axis=-1, keepdims=True)
    emb = protos[dominant]  # (F, T, E)
    emb = (1 - leak) * emb + leak * rng.standard_normal(emb.shape)
    return (emb / np.linalg.norm(emb, axis=-1, keepdims=True)
            ).astype(np.float32)


def main():
    F, T, D, K = 129, 200, 6, 2
    observation, dominant = make_scene(F=F, T=T, D=D, K=K)
    embedding = make_embedding(dominant, K)

    from pb_bss_tpu.models.vmfcacgmm import VMFCACGMMTrainer
    from pb_bss_tpu.models.gcacgmm import GCACGMMTrainer

    def fit_predict(trainer_cls, **kw):
        def run(obs, emb):
            trainer = trainer_cls()
            return trainer.fit_predict(
                obs, emb, num_classes=K, iterations=40, **kw)
        # run_on_device keeps complex data off the host boundary —
        # pass HOST arrays: it splits complex leaves into real pairs
        # itself (a jnp.asarray here would already be the forbidden
        # complex transfer)
        return np.asarray(run_on_device(
            run, observation, jnp.asarray(embedding)))

    oracle = np.eye(K)[dominant]  # (F, T, K)
    oracle = np.moveaxis(oracle, -1, 1)  # (F, K, T)

    for name, aff in [
        ('VMFCACGMM', fit_predict(VMFCACGMMTrainer)),
        ('GCACGMM (spherical)', fit_predict(GCACGMMTrainer)),
    ]:
        # best class permutation against the oracle dominance mask
        accs = []
        for perm in ([0, 1], [1, 0]):
            acc = np.mean(
                (aff[:, perm].argmax(1) == dominant).astype(float))
            accs.append(acc)
        print(f'{name}: dominant-bin accuracy {max(accs):.3f} '
              f'(chance 0.5)')


if __name__ == '__main__':
    main()
