"""Model serialization / checkpoint-resume tests
(reference: pb_bss/distribution/utils.py:83-315 dict schema,
cacgmm.py:229-234 resume-from-model).
"""
import jax
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pb_bss_tpu.models import (
    CACGMM,
    CACGMMTrainer,
    ComplexAngularCentralGaussian,
    Gaussian,
    GaussianTrainer,
    get_trainer_class_from_model,
    parameter_from_dict,
    stack_parameters,
)


def _fitted_cacgmm(F=4, T=60, D=3, K=2):
    rng = np.random.RandomState(0)
    y = rng.randn(F, T, D) + 1j * rng.randn(F, T, D)
    return CACGMMTrainer().fit(y, num_classes=K, iterations=3), y


class TestDictRoundTrip:
    def test_nested_to_from_dict(self):
        model, _ = _fitted_cacgmm()
        d = model.to_dict()
        assert set(d.keys()) == {'weight', 'cacg'}
        assert set(d['cacg'].keys()) == {
            'covariance_eigenvectors', 'covariance_eigenvalues'}
        restored = CACGMM.from_dict(d)
        assert_allclose(
            np.asarray(restored.weight), np.asarray(model.weight))
        assert_allclose(
            np.asarray(restored.cacg.covariance_eigenvalues),
            np.asarray(model.cacg.covariance_eigenvalues))

    def test_parameter_from_dict_by_name(self):
        model, _ = _fitted_cacgmm()
        restored = parameter_from_dict('CACGMM', model.to_dict())
        assert isinstance(restored, CACGMM)

    def test_json_compatible(self):
        """dict of numpy-convertible leaves -> round-trip via plain
        lists (the reference's jsonpickle compatibility)."""
        import json
        model, _ = _fitted_cacgmm()

        def tolists(d):
            return {
                k: tolists(v) if isinstance(v, dict) else {
                    're': np.asarray(v).real.tolist(),
                    'im': np.asarray(v).imag.tolist(),
                }
                for k, v in d.items()
            }

        s = json.dumps(tolists(model.to_dict()))
        assert len(s) > 100


class TestTrainerLookup:
    def test_by_instance_and_class(self):
        model, _ = _fitted_cacgmm()
        assert get_trainer_class_from_model(model) is CACGMMTrainer
        assert get_trainer_class_from_model(CACGMM) is CACGMMTrainer

    def test_gaussian(self):
        from pb_bss_tpu.models import GaussianTrainer as GT
        assert get_trainer_class_from_model(Gaussian) is GT


class TestStackParameters:
    def test_stack_models(self):
        models = []
        for seed in range(3):
            rng = np.random.RandomState(seed)
            y = rng.randn(50, 3) + 1j * rng.randn(50, 3)
            models.append(CACGMMTrainer().fit(
                y, num_classes=2, iterations=2))
        stacked = stack_parameters(models)
        assert stacked.weight.shape == (3,) + models[0].weight.shape
        assert stacked.cacg.covariance_eigenvalues.shape \
            == (3,) + models[0].cacg.covariance_eigenvalues.shape


class TestResume:
    def test_fit_from_model_initialization(self):
        """Passing a fitted model as `initialization` resumes EM."""
        model, y = _fitted_cacgmm()
        resumed = CACGMMTrainer().fit(
            y, initialization=model, iterations=2)
        assert isinstance(resumed, CACGMM)
        affiliation = np.asarray(resumed.predict(y))
        assert_allclose(affiliation.sum(-2), 1.0, rtol=1e-5)

    def test_resume_improves_or_keeps_likelihood(self):
        model, y = _fitted_cacgmm()
        ll_before = float(model.log_likelihood(y))
        resumed = CACGMMTrainer().fit(
            y, initialization=model, iterations=10)
        ll_after = float(resumed.log_likelihood(y))
        assert ll_after >= ll_before - 1e-3, (ll_before, ll_after)


class TestPytreeBehaviour:
    def test_model_is_jittable_argument(self):
        model, y = _fitted_cacgmm()

        @jax.jit
        def forward(model, y):
            return model.predict(y)

        affiliation = forward(model, y)
        assert affiliation.shape[1] == 2

    def test_tree_map(self):
        model, _ = _fitted_cacgmm()
        doubled = jax.tree_util.tree_map(lambda x: x * 2, model)
        assert_allclose(
            np.asarray(doubled.weight),
            2 * np.asarray(model.weight))

    def test_getattr_suggestions(self):
        model, _ = _fitted_cacgmm()
        with pytest.raises(AttributeError, match='Close matches'):
            model.weigth  # typo on purpose


class TestAllFamiliesRoundTrip:
    """to_dict/from_dict + predict equivalence for every mixture
    family (the reference's dict schema must cover them all,
    reference distribution/utils.py:83-190)."""

    @pytest.mark.parametrize('family', [
        'cacgmm', 'cwmm', 'cbmm', 'vmfmm', 'gmm',
        'gcacgmm', 'vmfcacgmm',
    ])
    def test_round_trip_predict(self, family):
        rng = np.random.RandomState(1)
        F, T, D, E, K = 5, 40, 3, 4, 2
        yc = (rng.randn(F, T, D) + 1j * rng.randn(F, T, D)
              ).astype(np.complex64)
        emb = rng.randn(F, T, E).astype(np.float32)
        yr = rng.randn(K * 30, E).astype(np.float32)

        if family == 'cacgmm':
            model = CACGMMTrainer().fit(yc, num_classes=K, iterations=2)
            predict = lambda m: m.predict(yc)
        elif family == 'cwmm':
            from pb_bss_tpu.models import CWMMTrainer
            model = CWMMTrainer().fit(yc, num_classes=K, iterations=2)
            predict = lambda m: m.predict(yc)
        elif family == 'cbmm':
            from pb_bss_tpu.models import CBMMTrainer
            model = CBMMTrainer(max_concentration=500).fit(
                yc, num_classes=K, iterations=2)
            predict = lambda m: m.predict(yc)
        elif family == 'vmfmm':
            from pb_bss_tpu.models import VMFMMTrainer
            model = VMFMMTrainer().fit(yr, num_classes=K, iterations=2)
            predict = lambda m: m.predict(yr)
        elif family == 'gmm':
            from pb_bss_tpu.models import GMMTrainer
            model = GMMTrainer().fit(yr, num_classes=K, iterations=2)
            predict = lambda m: m.predict(yr)
        elif family == 'gcacgmm':
            from pb_bss_tpu.models import GCACGMMTrainer
            model = GCACGMMTrainer().fit(
                yc, emb, num_classes=K, iterations=2)
            predict = lambda m: m.predict(yc, emb)
        else:
            from pb_bss_tpu.models import VMFCACGMMTrainer
            model = VMFCACGMMTrainer().fit(
                yc, emb, num_classes=K, iterations=2)
            predict = lambda m: m.predict(yc, emb)

        d = model.to_dict()
        restored = parameter_from_dict(type(model).__name__, d)
        assert type(restored) is type(model)
        assert_allclose(
            np.asarray(predict(restored)), np.asarray(predict(model)),
            atol=1e-6)
