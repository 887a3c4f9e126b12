"""Doctest tier (SURVEY §4: doctests are first-class in the reference
via --doctest-modules). Runs under the test conftest (CPU, x64) so
exact-value doctests are meaningful.
"""
import doctest

import pytest

import pb_bss_tpu.evaluation.module_si_sdr
import pb_bss_tpu.evaluation.sxr_module
import pb_bss_tpu.ops.linalg
import pb_bss_tpu.permutation_alignment
import pb_bss_tpu.utils
import pb_bss_tpu.utils.profiling


@pytest.mark.parametrize('module', [
    pb_bss_tpu.utils,
    pb_bss_tpu.ops.linalg,
    pb_bss_tpu.permutation_alignment,
    pb_bss_tpu.evaluation.module_si_sdr,
    pb_bss_tpu.evaluation.sxr_module,
    pb_bss_tpu.utils.profiling,
], ids=lambda m: m.__name__)
def test_doctests(module):
    results = doctest.testmod(
        module, optionflags=doctest.NORMALIZE_WHITESPACE, verbose=False)
    assert results.failed == 0, (module.__name__, results)
    assert results.attempted > 0, (
        module.__name__, 'expected at least one doctest')
