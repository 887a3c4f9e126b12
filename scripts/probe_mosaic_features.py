"""Probe two Mosaic features the whole-fit integration kernel needs:

1. VMEM scratch indexed dynamically on the LEADING dim with the tile
   program_id (per-tile persistent state across a sequential grid).
2. In-kernel ``jnp.dot`` (MXU) between a scratch value and an input
   block (gather-free utterance broadcast / reduction).

Run on the real TPU (axon); also passes in interpret mode on CPU.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, a_ref, b_ref, y_ref, dot_ref, state, *, n_tiles):
    it = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(it == 0)
    def _init():
        state[i] = x_ref[...]

    @pl.when(it > 0)
    def _update():
        state[i] = state[i] * 2.0 + 1.0

    y_ref[...] = state[i]
    dot_ref[...] = jnp.dot(
        a_ref[...], b_ref[...],
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=('iters', 'interpret'))
def probe(x, a, b, *, iters, interpret=False):
    n_tiles = x.shape[1] // 128
    return pl.pallas_call(
        functools.partial(_kernel, n_tiles=n_tiles),
        grid=(iters, n_tiles),
        in_specs=[
            pl.BlockSpec((8, 128), lambda it, i: (0, i)),
            pl.BlockSpec((16, 8), lambda it, i: (0, 0)),
            pl.BlockSpec((8, 128), lambda it, i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda it, i: (0, i)),
            pl.BlockSpec((16, 128), lambda it, i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, x.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((16, x.shape[1]), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((n_tiles, 8, 128), jnp.float32)],
        interpret=interpret,
    )(x, a, b)


def main():
    interpret = jax.default_backend() == 'cpu'
    n_tiles, iters = 3, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 128 * n_tiles)),
                    jnp.float32)
    a = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((8, 128 * n_tiles)),
                    jnp.float32)
    y, d = probe(x, a, b, iters=iters, interpret=interpret)
    y = np.asarray(y)
    d = np.asarray(d)
    # state after iters-1 updates: x * 2^(iters-1) + (2^(iters-1) - 1)
    f = 2.0 ** (iters - 1)
    np.testing.assert_allclose(y, np.asarray(x) * f + (f - 1),
                               rtol=1e-6)
    np.testing.assert_allclose(d, np.asarray(a) @ np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    print(f'OK backend={jax.default_backend()} '
          f'dyn-scratch + in-kernel dot verified')


if __name__ == '__main__':
    main()
