"""Chebyshev polynomials of the first through fourth kinds.

All four kinds share the recurrence P_{k+1} = 2x P_k - P_{k-1}, differing
only in P_1; they run as one lax.scan (see _recurrence.py).
Reference: prysm/polynomials/cheby.py.
"""
import jax.numpy as jnp

from ._recurrence import recurrence_all, seq_by_recurrence, seq_by_recurrence_with_der


def _abc(k):
    return (0.0, 2.0, 1.0)


def _cheby_value(n, x, seed1):
    if n == 0:
        return jnp.ones_like(x)
    return recurrence_all(n, x, seed1, _abc)[-1]


def _cheby_der(n, x, seed1, dseed1):
    if n == 0:
        return jnp.zeros_like(x)
    return recurrence_all(n, x, seed1, _abc, dseed1=dseed1)[1][-1]


def cheby1(n, x):
    """Chebyshev polynomial of the first kind, order n."""
    return _cheby_value(n, x, x)


def cheby1_seq(ns, x):
    """Chebyshev-T at orders ns; shape (len(ns), *x.shape)."""
    return seq_by_recurrence(ns, x, x, _abc)


def cheby1_der(n, x):
    """d/dx of Chebyshev-T order n."""
    return _cheby_der(n, x, x, 1)


def cheby1_der_seq(ns, x):
    """d/dx of Chebyshev-T at orders ns."""
    return seq_by_recurrence_with_der(ns, x, x, 1, _abc)[1]


def cheby2(n, x):
    """Chebyshev polynomial of the second kind, order n."""
    return _cheby_value(n, x, 2 * x)


def cheby2_seq(ns, x):
    """Chebyshev-U at orders ns."""
    return seq_by_recurrence(ns, x, 2 * x, _abc)


def cheby2_der(n, x):
    """d/dx of Chebyshev-U order n."""
    return _cheby_der(n, x, 2 * x, 2)


def cheby2_der_seq(ns, x):
    """d/dx of Chebyshev-U at orders ns."""
    return seq_by_recurrence_with_der(ns, x, 2 * x, 2, _abc)[1]


def cheby3(n, x):
    """Chebyshev polynomial of the third kind, order n."""
    return _cheby_value(n, x, 2 * x - 1)


def cheby3_seq(ns, x):
    """Chebyshev-V at orders ns."""
    return seq_by_recurrence(ns, x, 2 * x - 1, _abc)


def cheby3_der(n, x):
    """d/dx of Chebyshev-V order n."""
    return _cheby_der(n, x, 2 * x - 1, 2)


def cheby3_der_seq(ns, x):
    """d/dx of Chebyshev-V at orders ns."""
    return seq_by_recurrence_with_der(ns, x, 2 * x - 1, 2, _abc)[1]


def cheby4(n, x):
    """Chebyshev polynomial of the fourth kind, order n."""
    return _cheby_value(n, x, 2 * x + 1)


def cheby4_seq(ns, x):
    """Chebyshev-W at orders ns."""
    return seq_by_recurrence(ns, x, 2 * x + 1, _abc)


def cheby4_der(n, x):
    """d/dx of Chebyshev-W order n."""
    return _cheby_der(n, x, 2 * x + 1, 2)


def cheby4_der_seq(ns, x):
    """d/dx of Chebyshev-W at orders ns."""
    return seq_by_recurrence_with_der(ns, x, 2 * x + 1, 2, _abc)[1]


def cheby1_2d_sum(coefs, mns, x, y):
    """Weighted tensor-product Chebyshev-T sum on separable (x, y)."""
    mns = tuple(mns)
    if not mns:
        return jnp.zeros_like(x)
    max_m = max(m for m, _ in mns)
    max_n = max(n for _, n in mns)
    Tx = cheby1_seq(range(max_m + 1), x)
    Ty = cheby1_seq(range(max_n + 1), y)
    z = jnp.zeros(jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y)),
                  dtype=jnp.asarray(x).dtype)
    for c, (m, n) in zip(coefs, mns):
        z = z + c * Tx[m] * Ty[n]
    return z


def cheby1_2d_sum_der_xy(coefs, mns, x, y, x_norm=1.0, y_norm=1.0):
    """Weighted Chebyshev-T sum plus Cartesian first derivatives."""
    mns = tuple(mns)
    if not mns:
        z = jnp.zeros_like(x)
        return z, z, jnp.zeros_like(y)
    max_m = max(m for m, _ in mns)
    max_n = max(n for _, n in mns)
    Tx, Tx_d = seq_by_recurrence_with_der(range(max_m + 1), x, x, 1, _abc)
    Ty, Ty_d = seq_by_recurrence_with_der(range(max_n + 1), y, y, 1, _abc)
    shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y))
    dtype = jnp.asarray(x).dtype
    z = jnp.zeros(shape, dtype)
    dzdx = jnp.zeros(shape, dtype)
    dzdy = jnp.zeros(shape, dtype)
    for c, (m, n) in zip(coefs, mns):
        z = z + c * Tx[m] * Ty[n]
        dzdx = dzdx + c * Tx_d[m] * Ty[n]
        dzdy = dzdy + c * Tx[m] * Ty_d[n]
    return z, dzdx / x_norm, dzdy / y_norm
