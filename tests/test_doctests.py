"""Doctest tier.

The reference runs ``--doctest-modules`` as a first-class test tier
(reference pytest.ini:1-6); here the doc-bearing modules are collected
explicitly so doctests execute under the suite's controlled platform
(CPU pin + x64, tests/conftest.py) instead of whatever backend module
collection would initialize.
"""
import doctest
import importlib

import numpy as np
import pytest

DOCTESTED_MODULES = [
    'pb_bss_tpu.utils',
    'pb_bss_tpu.utils.profiling',
    'pb_bss_tpu.ops.linalg',
    'pb_bss_tpu.math.solve',
    'pb_bss_tpu.models.base',
    pytest.param('pb_bss_tpu.models.cacgmm',
                 marks=pytest.mark.slow),  # EM-fit doctest: heavy jit
    'pb_bss_tpu.models.mixture_model_utils',
    'pb_bss_tpu.extraction.mask_module',
    pytest.param('pb_bss_tpu.extraction.beamformer_wrapper',
                 marks=pytest.mark.slow),  # whole-DSL doctest sweep
    'pb_bss_tpu.transform.stft_module',
    'pb_bss_tpu.initializer.iid',
    'pb_bss_tpu.permutation_alignment',
    'pb_bss_tpu.evaluation.module_si_sdr',
    'pb_bss_tpu.evaluation.sxr_module',
]


@pytest.mark.parametrize('module_name', DOCTESTED_MODULES)
def test_module_doctests(module_name):
    module = importlib.import_module(module_name)
    # Doctest outputs are written against the default printoptions.
    with np.printoptions(legacy=False):
        result = doctest.testmod(
            module, verbose=False, raise_on_error=False)
    assert result.failed == 0, (module_name, result)
    if module_name not in ('pb_bss_tpu.math.solve',):
        assert result.attempted > 0, (
            module_name, 'expected at least one doctest')
