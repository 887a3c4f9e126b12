"""Smoke test: the shipped example pipeline runs end to end."""
import pathlib
import sys

import pytest


@pytest.mark.slow
def test_mixture_model_example_runs(capsys):
    examples = pathlib.Path(__file__).parent.parent / 'examples'
    sys.path.insert(0, str(examples))
    try:
        import mixture_model_example
        mixture_model_example.main(reverb=False, iterations=3)
    finally:
        sys.path.remove(str(examples))
    out = capsys.readouterr().out
    assert 'mask-based extraction' in out
    assert 'GEV+BAN beamforming' in out


@pytest.mark.slow
def test_separate_pipeline_api():
    """High-level separate(): mask-based and beamformed variants."""
    import numpy as np
    from pb_bss_tpu.pipeline import separate
    from pb_bss_tpu.testing.dummy_data import low_reverberation_data
    from pb_bss_tpu.evaluation import bss_eval_sources

    ex = low_reverberation_data()
    observation = ex['observation'].astype(np.float32)
    sources = ex['speech_source']
    n = observation.shape[-1]

    estimates = np.asarray(separate(
        observation, num_classes=3, iterations=40))
    assert estimates.shape == (3, n)

    bf = np.asarray(separate(
        observation, num_classes=3, iterations=40,
        beamformer='gev+ban'))
    assert bf.shape == (3, n)

    # at least one estimate matches each source reasonably
    for target in [estimates, bf]:
        for k in range(2):
            sdrs = [
                bss_eval_sources(
                    sources, np.stack([e, e]),
                    compute_permutation=False)[0][k]
                for e in target
            ]
            assert max(sdrs) > 3, (k, sdrs)


@pytest.mark.slow
def test_separate_fca_refinement():
    """refine='fca': the full-rank Wiener refinement stage must not
    lose quality vs plain mask-based extraction (measured it *gains*
    ~+3/+1.3 dB BSS-eval SDR on this scenario)."""
    import numpy as np
    from pb_bss_tpu.pipeline import separate
    from pb_bss_tpu.testing.dummy_data import low_reverberation_data
    from pb_bss_tpu.evaluation import bss_eval_sources

    ex = low_reverberation_data()
    observation = ex['observation'].astype(np.float32)
    sources = ex['speech_source']
    n = observation.shape[-1]

    masked = np.asarray(separate(
        observation, num_classes=3, iterations=40))
    refined = np.asarray(separate(
        observation, num_classes=3, iterations=40, refine='fca'))
    assert refined.shape == (3, n)
    assert np.isfinite(refined).all()

    def best_sdrs(target):
        return [
            max(
                bss_eval_sources(
                    sources, np.stack([e, e]),
                    compute_permutation=False)[0][k]
                for e in target
            )
            for k in range(2)
        ]

    masked_sdr = best_sdrs(masked)
    refined_sdr = best_sdrs(refined)
    for k in range(2):
        assert refined_sdr[k] > masked_sdr[k] - 0.5, (
            k, refined_sdr, masked_sdr)


def test_separate_model_families():
    """separate(model=...) runs the CWMM and CBMM spatial models
    (reference test_spatial_mm.py covers the same three families)."""
    import numpy as np
    from pb_bss_tpu.pipeline import separate
    from pb_bss_tpu.testing.dummy_data import low_reverberation_data

    ex = low_reverberation_data()
    observation = ex['observation'].astype(np.float32)
    n = observation.shape[-1]
    for model, iters in (('cwmm', 10), ('cbmm', 2)):
        out = np.asarray(separate(
            observation, num_classes=3, iterations=iters, model=model))
        assert out.shape == (3, n), (model, out.shape)
        assert np.isfinite(out).all(), model


@pytest.mark.slow
def test_separate_batch_sharded():
    """Batched separation, data-parallel over the mesh 'b' axis; must
    match the per-utterance path exactly (same per-utterance PRNG
    keys, utterances independent => sharding cannot change values)."""
    import jax
    import numpy as np
    from numpy.testing import assert_allclose
    from pb_bss_tpu.parallel import make_mesh
    from pb_bss_tpu.pipeline import separate, separate_batch
    from pb_bss_tpu.testing.dummy_data import low_reverberation_data

    ex = low_reverberation_data()
    observation = ex['observation'].astype(np.float32)
    rng = np.random.default_rng(0)
    batch = np.stack([
        observation,
        observation + 0.01 * rng.standard_normal(
            observation.shape).astype(np.float32),
        observation[:, ::-1],
        0.5 * observation,
    ])

    key = jax.random.key(7)
    mesh = make_mesh((4,), ('b',))
    out = np.asarray(separate_batch(
        batch, num_classes=3, iterations=5, key=key, mesh=mesh))
    assert out.shape == (4, 3, observation.shape[-1])
    assert np.isfinite(out).all()

    keys = jax.random.split(key, 4)
    single = np.asarray(separate(
        batch[1], num_classes=3, iterations=5, key=keys[1]))
    assert_allclose(out[1], single, atol=1e-4)

    bf = np.asarray(separate_batch(
        batch[:2], num_classes=3, iterations=5, beamformer='gev+ban'))
    assert bf.shape == (2, 3, observation.shape[-1])
    assert np.isfinite(bf).all()


def test_integration_model_example_runs(capsys):
    examples = pathlib.Path(__file__).parent.parent / 'examples'
    sys.path.insert(0, str(examples))
    try:
        import integration_model_example
        integration_model_example.main()
    finally:
        sys.path.remove(str(examples))
    out = capsys.readouterr().out
    # both integration models must clearly beat chance
    for line in out.strip().splitlines():
        acc = float(line.split('accuracy')[1].split('(')[0])
        assert acc > 0.8, line


@pytest.mark.slow
def test_evaluation_example_runs(capsys):
    examples = pathlib.Path(__file__).parent.parent / 'examples'
    sys.path.insert(0, str(examples))
    try:
        import evaluation_example
        evaluation_example.main(iterations=3, batch=2)
    finally:
        sys.path.remove(str(examples))
    out = capsys.readouterr().out
    assert 'SDR gain' in out
    assert 'STOI' in out
