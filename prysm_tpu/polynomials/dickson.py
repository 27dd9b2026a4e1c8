"""Dickson polynomials of the first and second kind.

Both satisfy P_k = x P_{k-1} - alpha P_{k-2}; the first kind has D_0 = 2,
the second E_0 = 1.  Reference: prysm/polynomials/dickson.py.
"""
import jax.numpy as jnp

from ._recurrence import recurrence_all, seq_by_recurrence, seq_by_recurrence_with_der


def _abc(alpha):
    def fn(k):
        return (0.0, 1.0, float(alpha))
    return fn


def dickson1(n, alpha, x):
    """Dickson polynomial of the first kind, order n with parameter alpha."""
    if n == 0:
        return jnp.full_like(x, 2.0)
    return seq_by_recurrence([n], x, x, _abc(alpha), seed0=2)[0]


def dickson1_seq(ns, alpha, x):
    """Dickson-D at orders ns; shape (len(ns), *x.shape)."""
    return seq_by_recurrence(ns, x, x, _abc(alpha), seed0=2)


def dickson2(n, alpha, x):
    """Dickson polynomial of the second kind, order n with parameter alpha."""
    if n == 0:
        return jnp.ones_like(x)
    return recurrence_all(n, x, x, _abc(alpha))[-1]


def dickson2_seq(ns, alpha, x):
    """Dickson-E at orders ns."""
    return seq_by_recurrence(ns, x, x, _abc(alpha))


def _dickson_der(n, alpha, x, seed0):
    if n == 0:
        return jnp.zeros_like(x)
    if seed0 == 2:
        # first kind: run the value/derivative tracks with D_0 = 2 by a
        # manual unrolled pair (the generic track assumes P_0 = 1)
        Pnm2 = jnp.full_like(x, 2.0)
        Dnm2 = jnp.zeros_like(x)
        Pnm1 = x * jnp.ones_like(x)
        Dnm1 = jnp.ones_like(x)
        if n == 1:
            return Dnm1
        for _ in range(2, n + 1):
            Pn = x * Pnm1 - alpha * Pnm2
            Dn = Pnm1 + x * Dnm1 - alpha * Dnm2
            Pnm2, Pnm1 = Pnm1, Pn
            Dnm2, Dnm1 = Dnm1, Dn
        return Dnm1
    return recurrence_all(n, x, x, _abc(alpha), dseed1=1)[1][-1]


def dickson1_der(n, alpha, x):
    """d/dx of Dickson-D order n."""
    return _dickson_der(n, alpha, x, seed0=2)


def dickson1_der_seq(ns, alpha, x):
    """d/dx of Dickson-D at orders ns."""
    return jnp.stack([_dickson_der(n, alpha, x, seed0=2) for n in ns])


def dickson2_der(n, alpha, x):
    """d/dx of Dickson-E order n."""
    return _dickson_der(n, alpha, x, seed0=1)


def dickson2_der_seq(ns, alpha, x):
    """d/dx of Dickson-E at orders ns."""
    return seq_by_recurrence_with_der(ns, x, x, 1, _abc(alpha))[1]
