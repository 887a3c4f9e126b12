"""Model base machinery: pytree dataclasses + serialization.

Replaces the reference's ``pb_bss/distribution/utils.py`` capability
(``_ProbabilisticModel`` with to_dict/from_dict, trainer lookup by
naming convention, ``stack_parameters``, observation normalizers) with
JAX-native models: every model is a frozen dataclass registered as a
pytree, so models flow through ``jit``/``vmap``/``lax.scan``/``pjit``
unchanged and checkpoint via the same dict schema as the reference
(reference: distribution/utils.py:118-220,259-315).
"""
from __future__ import annotations

import dataclasses
import difflib
import typing

import jax
import numpy as np
import jax.numpy as jnp

__all__ = [
    'Model',
    'modelclass',
    'parameter_from_dict',
    'get_trainer_class_from_model',
    'stack_parameters',
    '_unit_norm',
    'force_hermitian',
    '_phase_norm',
    '_frequency_norm',
]

from ..ops.linalg import unit_norm as _ops_unit_norm
from ..ops.linalg import force_hermitian  # noqa: F401  (re-export)


def _unit_norm(signal, *, axis=-1, eps=1e-4, eps_style='plus', ord=None):
    """Alias of :func:`pb_bss_tpu.ops.linalg.unit_norm` (reference name)."""
    return _ops_unit_norm(
        signal, axis=axis, eps=eps, eps_style=eps_style, ord=ord)


class Model:
    """Mixin giving dataclass models dict (de)serialization and pytree
    behaviour. Use via the :func:`modelclass` decorator.

    The dict schema matches the reference's ``_ProbabilisticModel``
    (distribution/utils.py:118-190), so checkpoints interchange:

    >>> import jax.numpy as jnp
    >>> from pb_bss_tpu.models.gaussian import SphericalGaussian
    >>> g = SphericalGaussian(mean=jnp.zeros(2), covariance=jnp.ones(()))
    >>> sorted(g.to_dict().keys())
    ['covariance', 'mean']
    >>> g2 = SphericalGaussian.from_dict(g.to_dict())
    >>> bool(jnp.allclose(g2.mean, g.mean))
    True

    Attribute typos get difflib suggestions instead of a bare
    AttributeError (reference: distribution/utils.py:192-220):

    >>> try:
    ...     g.maen
    ... except AttributeError as e:
    ...     print(e)
    'SphericalGaussian' object has no attribute 'maen'.
    Close matches: ['mean']
    """

    def to_dict(self):
        keys = self.__dataclass_fields__.keys()
        ret = {}
        for k in keys:
            v = getattr(self, k)
            ret[k] = v.to_dict() if isinstance(v, Model) else v
        return ret

    @classmethod
    def from_dict(cls, d: dict):
        assert cls.__dataclass_fields__.keys() == d.keys(), (
            cls.__dataclass_fields__.keys(), d.keys())
        kwargs = {}
        for k, v in d.items():
            field_type = cls.__dataclass_fields__[k].type
            target = _resolve_model_type(field_type, cls)
            if target is not None and isinstance(v, dict):
                v = target.from_dict(v)
            kwargs[k] = v
        return cls(**kwargs)

    def replace(self, **changes):
        return dataclasses.replace(self, **changes)

    def __getattr__(self, name):
        fields = object.__getattribute__(self, '__dataclass_fields__')
        similar = difflib.get_close_matches(name, fields.keys())
        if len(similar) == 0:
            similar = list(fields.keys())
        raise AttributeError(
            f'{self.__class__.__name__!r} object has no attribute {name!r}.\n'
            f'Close matches: {similar}'
        )


def _resolve_model_type(field_type, owner_cls=None):
    """Resolve a dataclass field annotation to a Model subclass if it is
    one; string annotations (PEP 563) are looked up in the owning
    class's module."""
    if isinstance(field_type, str) and owner_cls is not None:
        import sys
        module = sys.modules.get(owner_cls.__module__)
        field_type = getattr(module, field_type, None) if module else None
    if isinstance(field_type, type) and issubclass(field_type, Model):
        return field_type
    return None


def static_field(default=None):
    """Dataclass field treated as pytree *aux data* (static metadata,
    e.g. axis tuples or fixed exponents) instead of a traced leaf."""
    return dataclasses.field(default=default, metadata={'static': True})


def modelclass(cls):
    """Decorator: dataclass + pytree registration + :class:`Model` mixin.

    Fields become pytree children, so models can be scan carries, vmap
    outputs and sharded pjit arguments. Fields declared with
    :func:`static_field` go into the pytree aux data (hashable, static
    under jit).
    """
    cls = dataclasses.dataclass(frozen=True, repr=True)(cls)
    if Model not in cls.__mro__:
        raise TypeError(f'{cls} must inherit from Model')

    field_names = tuple(
        f.name for f in dataclasses.fields(cls)
        if not f.metadata.get('static', False))
    static_names = tuple(
        f.name for f in dataclasses.fields(cls)
        if f.metadata.get('static', False))

    def flatten(obj):
        return (
            tuple(getattr(obj, n) for n in field_names),
            tuple(getattr(obj, n) for n in static_names),
        )

    def flatten_with_keys(obj):
        return tuple(
            (jax.tree_util.GetAttrKey(n), getattr(obj, n))
            for n in field_names
        ), tuple(getattr(obj, n) for n in static_names)

    def unflatten(aux, children):
        kwargs = dict(zip(field_names, children))
        kwargs.update(dict(zip(static_names, aux)))
        return cls(**kwargs)

    jax.tree_util.register_pytree_with_keys(
        cls, flatten_with_keys, unflatten, flatten_func=flatten)
    return cls


def parameter_from_dict(parameter_class_or_str, d: dict):
    """Instantiate a model from its dict representation by class or name."""
    if isinstance(parameter_class_or_str, str):
        from pb_bss_tpu import models
        parameter_class_or_str = getattr(models, parameter_class_or_str)
    return parameter_class_or_str.from_dict(d)


def get_trainer_class_from_model(parameter):
    """Name-convention lookup: ``Foo`` -> ``FooTrainer``
    (reference: distribution/utils.py:6).

    >>> from pb_bss_tpu.models import CACGMM
    >>> get_trainer_class_from_model(CACGMM).__name__
    'CACGMMTrainer'
    """
    from pb_bss_tpu import models
    if not hasattr(parameter, '__name__'):
        parameter = parameter.__class__
    name = parameter.__name__
    assert 'Trainer' not in name, name
    return getattr(models, name + 'Trainer')


def stack_parameters(parameters: typing.List[Model]):
    """Stack a list of structurally identical models along a new leading
    axis (reference: distribution/utils.py:259).

    >>> import jax.numpy as jnp
    >>> from pb_bss_tpu.models.gaussian import SphericalGaussian
    >>> g = SphericalGaussian(mean=jnp.zeros(2), covariance=jnp.ones(()))
    >>> stack_parameters([g, g, g]).mean.shape
    (3, 2)
    """
    types = {p.__class__ for p in parameters}
    assert len(types) == 1, types
    out_type = list(types)[0]

    out = {}
    for k in parameters[0].__dataclass_fields__.keys():
        datas = [getattr(p, k) for p in parameters]
        data_types = {d.__class__ for d in datas}
        assert len(data_types) == 1, data_types
        if isinstance(datas[0], Model):
            out[k] = stack_parameters(datas)
        else:
            out[k] = jnp.stack([jnp.asarray(d) for d in datas])
    return out_type(**out)


def _phase_norm(signal, reference_channel=0):
    """Phase normalization against a reference channel
    (reference: distribution/utils.py:30). signal: (..., T, D)."""
    signal = jnp.asarray(signal)
    angles = jnp.angle(signal[..., reference_channel:reference_channel + 1])
    return signal * jnp.exp(-1j * angles)


def _frequency_norm(
        signal,
        max_sensor_distance=None, shrink_factor=1.2,
        fft_size=1024, sample_rate=16000, sound_velocity=343,
):
    """Frequency normalization (reference: distribution/utils.py:41).

    signal: (F, T, D) STFT signal.
    """
    from ..utils import get_stft_center_frequencies
    frequency = get_stft_center_frequencies(fft_size, sample_rate)
    F = signal.shape[0]
    assert len(frequency) == F, (len(frequency), F)
    norm_factor = sound_velocity / (
        2 * frequency * shrink_factor * max_sensor_distance
    )
    norm_factor = np.nan_to_num(norm_factor)
    if norm_factor[-1] < 1:
        raise ValueError(
            'Distance between the sensors too high: {:.2} > {:.2}'.format(
                max_sensor_distance, sound_velocity / (2 * frequency[-1])
            )
        )
    norm_factor = norm_factor[:, None, None]
    signal = jnp.asarray(signal)
    return jnp.abs(signal) * jnp.exp(1j * jnp.angle(signal) * norm_factor)
