"""Smoke test: the shipped example pipeline runs end to end."""
import pathlib
import sys

import pytest


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
