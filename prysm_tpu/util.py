"""Utility statistics; NaN-tolerant via masked reductions (static shapes).

Rebuild of ``prysm/util.py``; the reference compresses out non-finite values
with boolean indexing, here the same statistics are computed with masked
reductions so they jit and batch.
"""
import jax.numpy as jnp


def _finite_mask(array):
    return jnp.isfinite(array)


def mean(array):
    """Mean of the finite elements of an array."""
    m = _finite_mask(array)
    return jnp.sum(jnp.where(m, array, 0)) / jnp.sum(m)


def pv(array):
    """Peak-to-valley of the finite elements of an array."""
    m = _finite_mask(array)
    mx = jnp.max(jnp.where(m, array, -jnp.inf))
    mn = jnp.min(jnp.where(m, array, jnp.inf))
    return mx - mn


def rms(array):
    """RMS of the finite elements of an array."""
    m = _finite_mask(array)
    return jnp.sqrt(jnp.sum(jnp.where(m, array * array, 0)) / jnp.sum(m))


def Sa(array):
    """Sa (mean absolute deviation) of the finite elements of an array."""
    m = _finite_mask(array)
    n = jnp.sum(m)
    mu = jnp.sum(jnp.where(m, array, 0)) / n
    return jnp.sum(jnp.where(m, jnp.abs(array - mu), 0)) / n


def std(array):
    """Standard deviation of the finite elements of an array."""
    m = _finite_mask(array)
    n = jnp.sum(m)
    mu = jnp.sum(jnp.where(m, array, 0)) / n
    var = jnp.sum(jnp.where(m, (array - mu) ** 2, 0)) / n
    return jnp.sqrt(var)


def ecdf(x):
    """Empirical cumulative distribution function: (sorted x, cdf values)."""
    xs = jnp.sort(x)
    ys = jnp.arange(1, len(xs) + 1) / float(len(xs))
    return xs, ys


def sort_xy(x, y):
    """Sort a pair of iterables in order of ascending x."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    order = jnp.argsort(x)
    return x[order], y[order]
