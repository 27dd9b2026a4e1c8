"""Hermite polynomials, probabilist's (He) and physicist's (H).

Both satisfy P_k = kind*x P_{k-1} - kind*(k-1) P_{k-2} with kind 1 or 2,
and P'_n = kind * n * P_{n-1}.  Reference: prysm/polynomials/hermite.py.
"""
import jax.numpy as jnp

from ._recurrence import recurrence_all, seq_by_recurrence


def _abc(kind):
    def fn(k):
        return (0.0, float(kind), float(kind * (k - 1)))
    return fn


def _hermite_value(n, x, kind):
    if n == 0:
        return jnp.ones_like(x)
    return recurrence_all(n, x, kind * x, _abc(kind))[-1]


def _hermite_value_seq(ns, x, kind):
    return seq_by_recurrence(ns, x, kind * x, _abc(kind))


def _hermite_der_seq(ns, x, kind):
    ns = list(ns)
    out = []
    nonzero = [n for n in ns if n > 0]
    if nonzero:
        shifted = [n - 1 for n in nonzero]
        Pns = _hermite_value_seq(shifted, x, kind)
    i = 0
    for n in ns:
        if n == 0:
            out.append(jnp.zeros_like(x))
        else:
            out.append(kind * n * Pns[i])
            i += 1
    return jnp.stack(out)


def hermite_He(n, x):
    """Probabilist's Hermite polynomial He_n."""
    return _hermite_value(n, x, kind=1)


def hermite_He_seq(ns, x):
    """He_n at sorted orders ns."""
    return _hermite_value_seq(ns, x, kind=1)


def hermite_He_der(n, x):
    """d/dx He_n = n He_{n-1}."""
    if n == 0:
        return jnp.zeros_like(x)
    return n * hermite_He(n - 1, x)


def hermite_He_der_seq(ns, x):
    """d/dx He_n at sorted orders ns."""
    return _hermite_der_seq(ns, x, kind=1)


def hermite_H(n, x):
    """Physicist's Hermite polynomial H_n."""
    return _hermite_value(n, x, kind=2)


def hermite_H_seq(ns, x):
    """H_n at sorted orders ns."""
    return _hermite_value_seq(ns, x, kind=2)


def hermite_H_der(n, x):
    """d/dx H_n = 2n H_{n-1}."""
    if n == 0:
        return jnp.zeros_like(x)
    return 2 * n * hermite_H(n - 1, x)


def hermite_H_der_seq(ns, x):
    """d/dx H_n at sorted orders ns."""
    return _hermite_der_seq(ns, x, kind=2)
