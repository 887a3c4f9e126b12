"""Helper: import the reference's modules from /root/reference with
stubs for genuinely unavailable third-party dependencies (used by the
reference-parity test tier)."""
import importlib
import pathlib
import sys
import types

import numpy as np

REFERENCE = pathlib.Path('/root/reference')


def _ensure_stub(name, attrs=None):
    """Stub a module only when it cannot actually be imported."""
    try:
        importlib.import_module(name)
        return
    except ImportError:
        pass
    parts = name.split('.')
    for i in range(len(parts)):
        part = '.'.join(parts[:i + 1])
        if part not in sys.modules:
            sys.modules[part] = types.ModuleType(part)
        if i > 0:
            setattr(sys.modules['.'.join(parts[:i])],
                    parts[i], sys.modules[part])
    if attrs:
        for k, v in attrs.items():
            setattr(sys.modules[name], k, v)


def _segment_axis(x, length, shift):
    """Real implementation for the paderbox stub (1-D inputs)."""
    x = np.asarray(x)
    n = 1 + (x.shape[-1] - length) // shift \
        if x.shape[-1] >= length else 0
    idx = np.arange(length)[None, :] + shift * np.arange(n)[:, None]
    return x[..., idx]


def reference_available():
    return (REFERENCE / 'pb_bss').is_dir()


def load_reference(module_names):
    """Import and return the requested reference modules as a dict."""
    class _CachedProperty(property):
        pass

    _ensure_stub('cached_property',
                 {'cached_property': _CachedProperty})
    _ensure_stub('mir_eval')
    _ensure_stub('mir_eval.separation')
    _ensure_stub('pystoi')
    _ensure_stub('pystoi.stoi')
    _ensure_stub('pesq')
    _ensure_stub('nara_wpe')
    _ensure_stub('nara_wpe.utils')
    _ensure_stub('lazy_dataset')
    _ensure_stub('paderbox')
    _ensure_stub('paderbox.array')
    _ensure_stub('paderbox.array.segment',
                 {'segment_axis': _segment_axis})

    # the reference predates NumPy 2.0 (np.asfarray was removed)
    if not hasattr(np, 'asfarray'):
        np.asfarray = lambda a, dtype=np.float64: np.asarray(
            a, dtype=dtype)

    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    return {name: importlib.import_module(name)
            for name in module_names}
