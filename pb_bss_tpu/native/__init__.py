"""Native CPU kernels (C++ / LAPACK), built on demand.

Where the reference ships Cython LAPACK kernels
(pb_bss/extraction/cythonized/), this framework's hot path is the
batched XLA program; these C++ kernels are the CPU-native counterpart
(multi-threaded ``zhegvd``/``zggev`` over the frequency batch), loaded
via ctypes. The library compiles lazily against the system
``liblapack.so.3`` on first use; when no toolchain/LAPACK is available
the import degrades gracefully (``available() == False``), like the
reference's Cython import fallback (beamformer.py:38-56).
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import warnings

import numpy as np

__all__ = ['available', 'c_get_gev_vector', 'c_eig', 'build']

_HERE = pathlib.Path(__file__).parent
_SOURCE = _HERE / 'gev_kernel.cpp'
_LIB_PATH = _HERE / 'libpbbss_gev.so'
_lib = None
_build_error = None


def build(force=False):
    """Compile the shared library (g++ -O3, links liblapack.so.3)."""
    global _build_error
    if _LIB_PATH.exists() and not force:
        if _LIB_PATH.stat().st_mtime >= _SOURCE.stat().st_mtime:
            return _LIB_PATH
    cmd = [
        'g++', '-O3', '-shared', '-fPIC', str(_SOURCE),
        '-o', str(_LIB_PATH), '-l:liblapack.so.3', '-lpthread',
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        _build_error = getattr(e, 'stderr', str(e))
        raise RuntimeError(
            f'Failed to build native GEV kernel: {_build_error}') from e
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    c_complex_p = np.ctypeslib.ndpointer(
        np.complex128, flags='C_CONTIGUOUS')
    lib.pb_bss_gev.restype = ctypes.c_int
    lib.pb_bss_gev.argtypes = [
        ctypes.c_int, ctypes.c_int, c_complex_p, c_complex_p,
        c_complex_p, ctypes.c_int,
    ]
    lib.pb_bss_eig.restype = ctypes.c_int
    lib.pb_bss_eig.argtypes = [
        ctypes.c_int, ctypes.c_int, c_complex_p, c_complex_p,
        c_complex_p, c_complex_p, ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    """True when the native kernel can be built/loaded."""
    try:
        _load()
        return True
    except Exception:
        return False


def c_get_gev_vector(target_psd_matrix, noise_psd_matrix, n_threads=0):
    """Batched dominant generalized eigenvectors via native ``zhegvd``
    (reference: cythonized/get_gev_vector.pyx:42).

    Args:
        target_psd_matrix: (..., D, D) complex Hermitian.
        noise_psd_matrix: (..., D, D) complex Hermitian pos. def.
    Returns:
        (..., D) complex128 beamforming vectors (B-normalized).
    """
    lib = _load()
    phi_xx = np.ascontiguousarray(target_psd_matrix, np.complex128)
    phi_nn = np.ascontiguousarray(noise_psd_matrix, np.complex128)
    assert phi_xx.shape == phi_nn.shape, (phi_xx.shape, phi_nn.shape)
    d = phi_xx.shape[-1]
    assert phi_xx.shape[-2] == d, phi_xx.shape
    batch_shape = phi_xx.shape[:-2]
    batch = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape \
        else 1
    out = np.empty((batch, d), np.complex128)
    info = lib.pb_bss_gev(
        batch, d, phi_xx.reshape(batch, d, d),
        phi_nn.reshape(batch, d, d), out, int(n_threads))
    if info != 0:
        raise np.linalg.LinAlgError(
            f'zhegvd failed with INFO={info}: '
            + ('illegal argument' if info < 0 else
               'eigensolve did not converge or B not positive definite'))
    return out.reshape(*batch_shape, d)


def c_eig(a, b, n_threads=0):
    """Batched general eigendecomposition of the pencil (a, b) via
    native ``zggev`` (reference: cythonized/c_eig.pyx:14).

    Returns:
        (eigenvalues (..., D), eigenvectors (..., D, D) with
        eigenvectors in columns).
    """
    lib = _load()
    a = np.ascontiguousarray(a, np.complex128)
    b = np.ascontiguousarray(b, np.complex128)
    assert a.shape == b.shape, (a.shape, b.shape)
    d = a.shape[-1]
    batch_shape = a.shape[:-2]
    batch = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape \
        else 1
    eigenvalues = np.empty((batch, d), np.complex128)
    eigenvectors = np.empty((batch, d, d), np.complex128)
    info = lib.pb_bss_eig(
        batch, d, a.reshape(batch, d, d), b.reshape(batch, d, d),
        eigenvalues, eigenvectors, int(n_threads))
    if info != 0:
        raise np.linalg.LinAlgError(f'zggev failed with INFO={info}')
    return (eigenvalues.reshape(*batch_shape, d),
            eigenvectors.reshape(*batch_shape, d, d))
