"""Random stochastic-matrix generation from JAX PRNG keys.

Parity with reference ``stochastic_matrices.py`` (uniform entries,
axis-normalized; src/convex_dim_red/stochastic_matrices.py:15-39), but
keyed by explicit ``jax.random`` keys instead of a global RandomState so
initialization vmaps cleanly over a restarts axis.
"""

import jax
import jax.numpy as jnp

__all__ = [
    "uniform_stochastic_matrix",
    "left_stochastic_matrix",
    "right_stochastic_matrix",
]


def uniform_stochastic_matrix(key, shape, axis=0, dtype=jnp.float64):
    """Random matrix with unit sums along ``axis``."""
    m = jax.random.uniform(
        key, shape, dtype=jax.dtypes.canonicalize_dtype(dtype))
    sums = jnp.sum(m, axis=axis, keepdims=True)
    return m / sums


def left_stochastic_matrix(key, shape, dtype=jnp.float64):
    """Random matrix with unit column sums."""
    return uniform_stochastic_matrix(key, shape, axis=0, dtype=dtype)


def right_stochastic_matrix(key, shape, dtype=jnp.float64):
    """Random matrix with unit row sums."""
    return uniform_stochastic_matrix(key, shape, axis=1, dtype=dtype)
