"""Generic scan-based three-term recurrence evaluation.

Every classical family used here (Chebyshev, Legendre, Hermite, Dickson,
Laguerre, Jacobi) satisfies P_k = (a_k + b_k x) P_{k-1} - c_k P_{k-2} with
scalar per-order coefficients.  The reference walks these in Python loops
(prysm/polynomials/_recurrence.py); here the coefficient tables are
precomputed host-side and the chain runs as one ``lax.scan``, with the
derivative track D_k = b_k P_{k-1} + (a_k + b_k x) D_{k-1} - c_k D_{k-2}
carried jointly when requested.
"""
import numpy as np
import jax.numpy as jnp
from jax import lax


def recurrence_all(nmax, x, seed1, abc_fn, dseed1=None):
    """All orders 0..nmax of a three-term recurrence, stacked on axis 0.

    Parameters
    ----------
    nmax : int
        maximum order
    x : ndarray
        evaluation points
    seed1 : ndarray or scalar
        P_1 (P_0 = 1 for every family here)
    abc_fn : callable
        abc_fn(k) -> (a_k, b_k, c_k) host-side scalars for k >= 2, with
        lin_k = a_k + b_k * x
    dseed1 : scalar, optional
        dP_1/dx; if given, also return the stacked derivative track

    Returns
    -------
    ndarray or (ndarray, ndarray)
        (nmax+1, *x.shape) stacked values [and derivatives]

    """
    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x)
    with_der = dseed1 is not None
    P1 = seed1 * ones
    if with_der:
        D1 = dseed1 * ones
    if nmax == 0:
        vals = ones[None]
        return (vals, zeros[None]) if with_der else vals
    if nmax == 1:
        vals = jnp.stack([ones, P1])
        if with_der:
            return vals, jnp.stack([zeros, D1])
        return vals

    table = np.asarray([abc_fn(k) for k in range(2, nmax + 1)], dtype=np.float64)
    table = jnp.asarray(table, dtype=x.dtype)

    if with_der:
        def step(carry, abc):
            Pnm1, Pnm2, Dnm1, Dnm2 = carry
            a, b, c = abc
            lin = a + b * x
            Pn = lin * Pnm1 - c * Pnm2
            Dn = b * Pnm1 + lin * Dnm1 - c * Dnm2
            return (Pn, Pnm1, Dn, Dnm1), (Pn, Dn)

        _, (Ptail, Dtail) = lax.scan(step, (P1, ones, D1, zeros), table)
        vals = jnp.concatenate([jnp.stack([ones, P1]), Ptail])
        ders = jnp.concatenate([jnp.stack([zeros, D1]), Dtail])
        return vals, ders

    def step(carry, abc):
        Pnm1, Pnm2 = carry
        a, b, c = abc
        Pn = (a + b * x) * Pnm1 - c * Pnm2
        return (Pn, Pnm1), Pn

    _, Ptail = lax.scan(step, (P1, ones), table)
    return jnp.concatenate([jnp.stack([ones, P1]), Ptail])


def seq_by_recurrence(ns, x, seed1, abc_fn, seed0=None):
    """Orders ns of a recurrence; shape (len(ns), *x.shape).

    seed0 overrides P_0 (Dickson's D_0 = 2); the recurrence then uses it.
    """
    ns = list(ns)
    nmax = max(ns)
    if seed0 is None:
        vals = recurrence_all(nmax, x, seed1, abc_fn)
    else:
        vals = _recurrence_all_seed0(nmax, x, seed0, seed1, abc_fn)
    return vals[jnp.asarray(ns)]


def seq_by_recurrence_with_der(ns, x, seed1, dseed1, abc_fn):
    """Orders ns of a recurrence and its derivative track."""
    ns = list(ns)
    nmax = max(ns)
    vals, ders = recurrence_all(nmax, x, seed1, abc_fn, dseed1=dseed1)
    idx = jnp.asarray(ns)
    return vals[idx], ders[idx]


def _recurrence_all_seed0(nmax, x, seed0, seed1, abc_fn):
    """recurrence_all with a non-unit P_0 (e.g. Dickson D_0 = 2)."""
    ones = jnp.ones_like(x)
    P0 = seed0 * ones
    P1 = seed1 * ones
    if nmax == 0:
        return P0[None]
    if nmax == 1:
        return jnp.stack([P0, P1])
    table = np.asarray([abc_fn(k) for k in range(2, nmax + 1)], dtype=np.float64)
    table = jnp.asarray(table, dtype=x.dtype)

    def step(carry, abc):
        Pnm1, Pnm2 = carry
        a, b, c = abc
        Pn = (a + b * x) * Pnm1 - c * Pnm2
        return (Pn, Pnm1), Pn

    _, Ptail = lax.scan(step, (P1, P0), table)
    return jnp.concatenate([jnp.stack([P0, P1]), Ptail])
