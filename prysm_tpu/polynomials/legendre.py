"""Legendre polynomials (reference: prysm/polynomials/legendre.py)."""
import jax.numpy as jnp

from ._recurrence import recurrence_all, seq_by_recurrence, seq_by_recurrence_with_der


def _abc(k):
    return (0.0, (2 * k - 1) / k, (k - 1) / k)


def legendre(n, x):
    """Legendre polynomial of order n."""
    if n == 0:
        return jnp.ones_like(x)
    return recurrence_all(n, x, x, _abc)[-1]


def legendre_seq(ns, x):
    """Legendre polynomials at orders ns; shape (len(ns), *x.shape)."""
    return seq_by_recurrence(ns, x, x, _abc)


def legendre_der(n, x):
    """d/dx of Legendre polynomial of order n."""
    if n == 0:
        return jnp.zeros_like(x)
    return recurrence_all(n, x, x, _abc, dseed1=1)[1][-1]


def legendre_der_seq(ns, x):
    """d/dx of Legendre polynomials at orders ns."""
    return seq_by_recurrence_with_der(ns, x, x, 1, _abc)[1]
