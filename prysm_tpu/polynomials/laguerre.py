"""Generalized Laguerre polynomials (reference: prysm/polynomials/laguerre.py).

Recurrence: L_k = ((2k - 1 + alpha - x) L_{k-1} - (k - 1 + alpha) L_{k-2}) / k.
Derivative identity: d/dx L_n^alpha = -L_{n-1}^{alpha+1}.
"""
import jax.numpy as jnp

from ._recurrence import recurrence_all, seq_by_recurrence


def _abc(alpha):
    def fn(k):
        return ((2 * k - 1 + alpha) / k, -1.0 / k, (k - 1 + alpha) / k)
    return fn


def _seed1(alpha, x):
    return alpha + 1 - x


def laguerre(n, alpha, x):
    """Generalized Laguerre polynomial of order n, parameter alpha."""
    if n == 0:
        return jnp.ones_like(x)
    return recurrence_all(n, x, _seed1(alpha, x), _abc(alpha))[-1]


def laguerre_seq(ns, alpha, x):
    """Laguerre polynomials at orders ns; shape (len(ns), *x.shape)."""
    return seq_by_recurrence(ns, x, _seed1(alpha, x), _abc(alpha))


def laguerre_der(n, alpha, x):
    """d/dx L_n^alpha = -L_{n-1}^{alpha+1}."""
    if n < 1:
        return jnp.zeros_like(x)
    return -laguerre(n - 1, alpha + 1, x)


def laguerre_der_seq(ns, alpha, x):
    """d/dx of Laguerre polynomials at orders ns."""
    ns = list(ns)
    out = []
    nonzero = [n for n in ns if n >= 1]
    if nonzero:
        shifted = [n - 1 for n in nonzero]
        Pns = laguerre_seq(shifted, alpha + 1, x)
    i = 0
    for n in ns:
        if n < 1:
            out.append(jnp.zeros_like(x))
        else:
            out.append(-Pns[i])
            i += 1
    return jnp.stack(out)
