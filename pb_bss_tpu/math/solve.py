"""Reference-compatible alias for the stable solver.

The reference exposes ``pb_bss.math.solve.stable_solve``
(/root/reference/pb_bss/math/solve.py:20). The TPU-native implementation
lives in :mod:`pb_bss_tpu.ops.linalg`; this module mirrors the namespace.
"""
from ..ops.linalg import stable_solve, solve_pinv  # noqa: F401

__all__ = ['stable_solve', 'solve_pinv']
