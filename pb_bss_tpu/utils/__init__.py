"""Array utilities (layer L0 of the framework).

Mirrors the capability surface of the reference's ``pb_bss/utils.py``
(see /root/reference/pb_bss/utils.py:111,172,185,197,281,306) but is
implemented JAX-first: every helper is jit-compatible, dtype-polymorphic
and broadcast-friendly so it can run inside compiled EM loops on TPU.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    'abs_square',
    'unsqueeze',
    'is_broadcast_compatible',
    'labels_to_one_hot',
    'get_stft_center_frequencies',
    'reshape',
    'get_pca',
    'to_numpy',
    'DeprecatedWarning',
    'deprecated',
]

from ..ops.linalg import get_pca  # noqa: E402,F401  (reference: pb_bss/utils.py:111)


def to_numpy(x):
    """Robust device-to-host transfer.

    Some TPU backends cannot transfer complex arrays directly; complex
    arrays are moved as their real and imaginary parts. For buffers
    that such a backend refuses to move at all (outputs of programs
    with complex *parameters* — see :func:`run_on_device` for the safe
    calling convention), prefer computing through ``run_on_device``.
    """
    import jax

    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        parts = jax.jit(lambda a: (a.real, a.imag))(x)
        return to_numpy(parts[0]) + 1j * to_numpy(parts[1])
    try:
        return np.asarray(x)
    except Exception:
        # retry once through a compiled copy (fresh default layout)
        return np.asarray(jax.jit(lambda a: a + 0)(x))


_DEVICE_RUN_CACHE = {}


def run_on_device(fn, *args):
    """Run ``fn(*args)`` on the accelerator with a transfer-safe
    calling convention, returning host NumPy arrays.

    Some TPU backends (e.g. the tunneled single-chip 'axon' platform)
    cannot transfer buffers to the host when the producing program had
    **complex-typed parameters** — complex math *inside* a program is
    fine, complex *inputs/outputs* at the boundary are not. This
    wrapper splits every complex leaf of ``args`` into (real, imag)
    float pairs on the host, reassembles them inside one jitted call,
    splits complex outputs back into float pairs on the device, and
    recombines them on the host. ``fn`` is compiled once per call-site
    function object.
    """
    import jax

    flat_args, treedef = jax.tree_util.tree_flatten(tuple(args))
    split_args = []
    is_complex_in = []
    for leaf in flat_args:
        leaf = np.asarray(leaf) if not hasattr(leaf, 'dtype') else leaf
        if np.iscomplexobj(leaf):
            if isinstance(leaf, jax.Array):
                # Fetching a device complex array here would itself be
                # the forbidden boundary transfer (and on affected
                # backends it poisons every later transfer in the
                # process) — fail fast with the remedy instead.
                raise TypeError(
                    'run_on_device received a DEVICE-resident complex '
                    'array. Pass the host (NumPy) array instead — '
                    'run_on_device splits complex leaves into real '
                    'pairs at the boundary itself; transferring the '
                    'complex array to the device beforehand defeats '
                    'that and corrupts the transfer channel on '
                    'tunneled TPU backends.')
            leaf = np.asarray(leaf)
            split_args.extend([
                np.ascontiguousarray(leaf.real),
                np.ascontiguousarray(leaf.imag),
            ])
            is_complex_in.append(True)
        else:
            split_args.append(leaf)
            is_complex_in.append(False)

    cache_key = (fn, treedef, tuple(is_complex_in))
    if cache_key not in _DEVICE_RUN_CACHE:
        meta = {}

        def inner(*split):
            rebuilt = []
            it = iter(split)
            for c in is_complex_in:
                if c:
                    re = next(it)
                    rebuilt.append(re + 1j * next(it))
                else:
                    rebuilt.append(next(it))
            result = fn(*jax.tree_util.tree_unflatten(treedef, rebuilt))
            out_flat, out_treedef = jax.tree_util.tree_flatten(result)
            out_split = []
            out_complex = []
            for leaf in out_flat:
                leaf = jnp.asarray(leaf)
                if jnp.iscomplexobj(leaf):
                    out_split.extend([leaf.real, leaf.imag])
                    out_complex.append(True)
                else:
                    out_split.append(leaf)
                    out_complex.append(False)
            meta['complex'] = tuple(out_complex)
            meta['treedef'] = out_treedef
            return tuple(out_split)

        _DEVICE_RUN_CACHE[cache_key] = (jax.jit(inner), meta)
    jitted, meta = _DEVICE_RUN_CACHE[cache_key]

    out_split = jitted(*split_args)
    out_leaves = []
    it = iter(out_split)
    for c in meta['complex']:
        if c:
            re = np.asarray(next(it))
            out_leaves.append(re + 1j * np.asarray(next(it)))
        else:
            out_leaves.append(np.asarray(next(it)))
    return jax.tree_util.tree_unflatten(meta['treedef'], out_leaves)


def abs_square(x):
    """Squared magnitude, |x|^2, without the sqrt of ``abs``.

    Works for real and complex inputs (reference: pb_bss/utils.py:281).

    >>> import numpy as np
    >>> float(abs_square(np.array(3 + 4j)))
    25.0
    >>> float(abs_square(np.array(3.0)))
    9.0
    """
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        return jnp.real(x) ** 2 + jnp.imag(x) ** 2
    return x ** 2


def unsqueeze(array, axis):
    """Insert singleton dimensions at the (possibly negative) positions.

    >>> unsqueeze(np.ones((2, 3)), (-3, -1)).shape
    (2, 1, 3, 1)
    >>> unsqueeze(13, (-2, -1)).shape
    (1, 1)
    """
    array = jnp.asarray(array)
    shape = list(array.shape)
    future_ndim = len(shape) + len(axis)
    axis = [a % future_ndim for a in axis]
    for p in sorted(axis):
        shape.insert(p, 1)
    return jnp.reshape(array, shape)


def is_broadcast_compatible(*shapes):
    """True when all shapes can be broadcast against each other.

    >>> is_broadcast_compatible((5, 1, 6), (5, 3, 6))
    True
    >>> is_broadcast_compatible((5, 2, 6), (5, 3, 6))
    False
    """
    if len(shapes) < 2:
        return True
    for dim in zip(*[shape[::-1] for shape in shapes]):
        if len(set(dim).union({1})) > 2:
            return False
    return True


def labels_to_one_hot(labels, categories: int, axis: int = 0,
                      keepdims=False, dtype=bool):
    """One-hot encode integer labels along ``axis``.

    Mirrors the behaviour of the reference (pb_bss/utils.py:197) but is
    expressed with a comparison against an iota so it stays vectorized
    under jit.

    >>> labels_to_one_hot([0, 1], categories=4)
    array([[ True, False],
           [False,  True],
           [False, False],
           [False, False]])
    >>> labels_to_one_hot([0, 1], categories=4, axis=-1)
    array([[ True, False, False, False],
           [False,  True, False, False]])
    """
    labels = np.asarray(labels)

    if keepdims:
        assert labels.shape[axis] == 1
        result_ndim = labels.ndim
    else:
        result_ndim = labels.ndim + 1

    if axis < 0:
        axis += result_ndim

    # categories-first layout, then move into place (mirrors the
    # reference semantics including the keepdims slice)
    onehot = (
        np.arange(categories).reshape((categories,) + (1,) * labels.ndim)
        == labels[None]
    ).astype(dtype)  # (categories, ...)

    if keepdims:
        onehot = onehot[(slice(None),) * (axis + 1) + (0,)]
    return np.moveaxis(onehot, 0, axis)


def get_stft_center_frequencies(size=1024, sample_rate=16000):
    """Center frequency in Hz of each STFT bin (reference: utils.py:172).

    >>> get_stft_center_frequencies(4, 16000)
    array([   0., 4000., 8000.])
    """
    frequency_index = np.arange(0, size / 2 + 1)
    return frequency_index * sample_rate / size


def reshape(array, operation):
    """einops-like reshape/transpose: ``'f t d -> d (f t)'``.

    Supports transposition, squeezing of literal ``1`` axes and flattening
    of output groups written either as ``(a b)`` or ``a*b``
    (reference: pb_bss/utils.py:72). Unflatten is not supported because
    concrete sizes are not available here.

    >>> reshape(np.zeros((2, 3, 4)), 'f t d -> d (f t)').shape
    (4, 6)
    >>> reshape(np.zeros((2, 3, 4)), 'f t d -> d t f').shape
    (4, 3, 2)
    """
    op = operation.replace(',', ' ').replace('(', ' ').replace(')', ' ')
    # normalize '*' to spaces inside groups is handled below
    lhs, rhs = operation.split('->')

    def tokens(side):
        side = side.replace(',', ' ')
        side = side.replace('*', ' * ')
        side = side.replace('(', ' ( ').replace(')', ' ) ')
        return side.split()

    lhs_t = [t for t in tokens(lhs) if t not in '()*']
    if any(t in tokens(lhs) for t in ('*', '(')):
        raise NotImplementedError(
            'Unflatten operation not supported by design. '
            'Actual values for dimensions are not available to this function.'
        )

    array = jnp.asarray(array)

    # squeeze literal 1 axes
    squeeze_axes = [i for i, t in enumerate(lhs_t) if t == '1']
    for ax in reversed(squeeze_axes):
        array = jnp.squeeze(array, axis=ax)
    lhs_names = [t for t in lhs_t if t != '1']

    # parse rhs into groups; '*' joins the next token into the previous group
    rhs_groups = []
    group = None
    join_next = False
    for t in tokens(rhs):
        if t == '(':
            group = []
        elif t == ')':
            rhs_groups.append(group)
            group = None
        elif t == '*':
            join_next = True
        elif group is not None:
            group.append(t)
        elif join_next:
            rhs_groups[-1].append(t)
            join_next = False
        else:
            rhs_groups.append([t])

    flat_rhs = [n for g in rhs_groups for n in g if n != '1']
    # transpose
    perm = [lhs_names.index(n) for n in flat_rhs]
    array = jnp.transpose(array, perm)

    # final reshape
    out_shape = []
    i = 0
    for g in rhs_groups:
        if g == ['1']:
            out_shape.append(1)
            continue
        size = 1
        for n in g:
            if n == '1':
                continue
            size *= array.shape[i]
            i += 1
        out_shape.append(size)
    return jnp.reshape(array, out_shape)


class DeprecatedWarning(UserWarning):
    """Category emitted by :func:`deprecated` (reference
    pb_bss/utils.py:9-11)."""


def deprecated(instructions):
    """Decorator marking a callable as deprecated (reference
    pb_bss/utils.py:13-45).

    Emits a :class:`DeprecatedWarning` naming the callable and the
    ``instructions`` for migrating away from it on every call.
    """
    import functools
    import warnings

    def decorator(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            warnings.warn(
                f'{fn.__qualname__} is deprecated. {instructions}',
                category=DeprecatedWarning,
                stacklevel=2,
            )
            return fn(*args, **kwargs)

        return wrapper

    return decorator
