"""Model checkpointing.

The reference serializes models via ``to_dict``/``from_dict``
(jsonpickle-compatible, reference: pb_bss/distribution/utils.py:83-190)
and resumes EM by passing a fitted model as ``initialization``. Here
models are pytrees, so the same dict schema round-trips through orbax
(TPU-native, async-capable, sharding-aware) or plain ``.npz`` files.
"""
from __future__ import annotations

import pathlib

import jax
import numpy as np

__all__ = ['save_model', 'load_model', 'save_model_npz',
           'load_model_npz']


def save_model(path, model):
    """Save a model pytree with orbax (directory checkpoint)."""
    import orbax.checkpoint as ocp
    path = pathlib.Path(path).absolute()
    with ocp.PyTreeCheckpointer() as checkpointer:
        checkpointer.save(path, model.to_dict())
    return path


def load_model(path, model_class):
    """Load a model saved by :func:`save_model`.

    Args:
        path: checkpoint directory.
        model_class: the model dataclass (or its name in
            ``pb_bss_tpu.models``).
    """
    import orbax.checkpoint as ocp
    from ..models.base import parameter_from_dict
    path = pathlib.Path(path).absolute()
    with ocp.PyTreeCheckpointer() as checkpointer:
        d = checkpointer.restore(path)
    return parameter_from_dict(model_class, d)


def _flatten_dict(d, prefix=''):
    out = {}
    for k, v in d.items():
        key = f'{prefix}{k}'
        if isinstance(v, dict):
            out.update(_flatten_dict(v, key + '/'))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_dict(flat):
    out = {}
    for key, v in flat.items():
        parts = key.split('/')
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def save_model_npz(path, model):
    """Single-file ``.npz`` checkpoint (no directory layout; handy for
    small models and tests)."""
    np.savez(path, **_flatten_dict(model.to_dict()))
    return path


def load_model_npz(path, model_class):
    from ..models.base import parameter_from_dict
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return parameter_from_dict(model_class, _unflatten_dict(flat))
