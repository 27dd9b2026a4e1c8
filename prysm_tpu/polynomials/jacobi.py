"""Jacobi polynomials via three-term recurrence, TPU-native.

Rebuild of ``prysm/polynomials/jacobi.py``.  The reference caches per-order
(A, B, C) recurrence coefficients in a Python ``lru_cache`` and loops in
Python; here the full coefficient table for orders up to n is precomputed
host-side into a single array and the recurrence runs as one ``lax.scan``
whose carry is the (P_{n-1}, P_{n-2}) pair — a sequential chain of fused
multiply-adds, the natural accelerator form of a recurrence.

All entry points accept arbitrarily-shaped x and are differentiable with
``jax.grad``; explicit derivative recurrences are also provided (they are
cheaper and are needed for raytracing sag gradients).
"""
from functools import lru_cache

import numpy as np
import jax.numpy as jnp
from jax import lax


def weight(alpha, beta, x):
    """Weight function of the Jacobi polynomials for a given alpha, beta."""
    return (1 - x) ** alpha * (1 + x) ** beta


@lru_cache(512)
def recurrence_abc(n, alpha, beta):
    """(A, B, C) for P_n = (A x + B) P_{n-1} - C P_{n-2}; host-side scalars.

    See DLMF 18.9; matches reference prysm/polynomials/jacobi.py:16-43
    including the degenerate alpha+beta in {0, -1}, n=0 case.
    """
    aplusb = alpha + beta
    if n == 0 and (aplusb == 0 or aplusb == -1):
        A = 0.5 * (alpha + beta) + 1
        B = 0.5 * (alpha - beta)
        C = 1.0
    else:
        Anum = (2 * n + aplusb + 1) * (2 * n + aplusb + 2)
        Aden = 2 * (n + 1) * (n + aplusb + 1)
        A = Anum / Aden
        Bnum = (alpha ** 2 - beta ** 2) * (2 * n + aplusb + 1)
        Bden = 2 * (n + 1) * (n + aplusb + 1) * (2 * n + aplusb)
        B = Bnum / Bden
        Cnum = (n + alpha) * (n + beta) * (2 * n + aplusb + 2)
        Cden = (n + 1) * (n + aplusb + 1) * (2 * n + aplusb)
        C = Cnum / Cden
    return float(A), float(B), float(C)


@lru_cache(256)
def _abc_table(nmax, alpha, beta):
    """Stacked (nmax, 3) float64 table of recurrence_abc(1..nmax)."""
    if nmax < 1:
        return np.zeros((0, 3))
    return np.asarray([recurrence_abc(k, alpha, beta) for k in range(1, nmax + 1)])


def _p1(alpha, beta, x):
    """P_1^{(alpha, beta)}(x)."""
    return alpha + 1 + (alpha + beta + 2) * ((x - 1) / 2)


def _jacobi_scan(nmax, alpha, beta, x, with_der=False):
    """All Jacobi polynomials 0..nmax at x, stacked on a leading axis.

    One lax.scan over the order axis; optionally also returns the stacked
    first derivatives from the differentiated recurrence.
    """
    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x)
    P1 = _p1(alpha, beta, x) * ones  # broadcast for scalar-x safety
    dP1 = ones * (0.5 * (alpha + beta + 2))
    if nmax == 0:
        Ps = ones[None]
        dPs = zeros[None]
        return (Ps, dPs) if with_der else Ps
    if nmax == 1:
        Ps = jnp.stack([ones, P1])
        dPs = jnp.stack([zeros, dP1])
        return (Ps, dPs) if with_der else Ps

    table = jnp.asarray(_abc_table(nmax - 1, alpha, beta), dtype=x.dtype)

    if with_der:
        def step(carry, abc):
            Pnm1, Pnm2, Dnm1, Dnm2 = carry
            A, B, C = abc
            lin = A * x + B
            Pn = lin * Pnm1 - C * Pnm2
            Dn = A * Pnm1 + lin * Dnm1 - C * Dnm2
            return (Pn, Pnm1, Dn, Dnm1), (Pn, Dn)

        _, (Ptail, Dtail) = lax.scan(step, (P1, ones, dP1, zeros), table)
        Ps = jnp.concatenate([jnp.stack([ones, P1]), Ptail])
        dPs = jnp.concatenate([jnp.stack([zeros, dP1]), Dtail])
        return Ps, dPs

    def step(carry, abc):
        Pnm1, Pnm2 = carry
        A, B, C = abc
        Pn = (A * x + B) * Pnm1 - C * Pnm2
        return (Pn, Pnm1), Pn

    _, Ptail = lax.scan(step, (P1, ones), table)
    return jnp.concatenate([jnp.stack([ones, P1]), Ptail])


def jacobi(n, alpha, beta, x):
    """Jacobi polynomial of order n with weight parameters alpha, beta."""
    if n == 0:
        return jnp.ones_like(x)
    if n == 1:
        return _p1(alpha, beta, x) * jnp.ones_like(x)
    return _jacobi_scan(n, alpha, beta, x)[-1]


def jacobi_seq(ns, alpha, beta, x):
    """Jacobi polynomials of (sorted) orders ns; shape (len(ns), *x.shape)."""
    ns = list(ns)
    nmax = max(ns)
    Ps = _jacobi_scan(nmax, alpha, beta, x)
    return Ps[jnp.asarray(ns)]


def jacobi_with_der(n, alpha, beta, x):
    """(P_n, dP_n/dx) via the differentiated three-term recurrence."""
    Ps, dPs = _jacobi_scan(n, alpha, beta, x, with_der=True)
    return Ps[-1], dPs[-1]


def jacobi_seq_with_der(ns, alpha, beta, x):
    """(P_n, dP_n/dx) stacked for orders ns."""
    ns = list(ns)
    nmax = max(ns)
    Ps, dPs = _jacobi_scan(nmax, alpha, beta, x, with_der=True)
    idx = jnp.asarray(ns)
    return Ps[idx], dPs[idx]


def jacobi_der(n, alpha, beta, x):
    """First derivative of P_n w.r.t. x: 0.5 (n+a+b+1) P_{n-1}^{(a+1, b+1)}."""
    if n == 0:
        return jnp.zeros_like(x)
    if n == 1:
        return jnp.ones_like(x) * (0.5 * (n + alpha + beta + 1))
    Pn = jacobi(n - 1, alpha + 1, beta + 1, x)
    return (0.5 * (n + alpha + beta + 1)) * Pn


def jacobi_der_seq(ns, alpha, beta, x):
    """First derivatives of P_n for orders ns; shape (len(ns), *x.shape)."""
    ns = list(ns)
    out = []
    nonzero = [n for n in ns if n > 0]
    if nonzero:
        shifted = [n - 1 for n in nonzero]
        Pns = jacobi_seq(shifted, alpha + 1, beta + 1, x)
    i = 0
    for n in ns:
        if n == 0:
            out.append(jnp.zeros_like(x))
        else:
            out.append(Pns[i] * (0.5 * (n + alpha + beta + 1)))
            i += 1
    return jnp.stack(out)


def jacobi_sum_clenshaw(s, alpha, beta, x):
    """Weighted sum  sum_n s[n] P_n(x)  by Clenshaw's downward recurrence.

    One lax.scan from high order to low; never materializes the mode stack.
    """
    s = list(s)
    N = len(s) - 1
    if N < 0:
        return jnp.zeros_like(x)
    if N == 0:
        return s[0] * jnp.ones_like(x)
    # tables for orders 0..N (b_n uses abc(n); recursion touches abc(n+1))
    abc = np.asarray([recurrence_abc(k, alpha, beta) for k in range(0, N + 1)])
    abc_j = jnp.asarray(abc, dtype=x.dtype)
    svec = jnp.asarray(np.asarray(s, dtype=np.float64), dtype=x.dtype)

    def step(carry, inp):
        bnp1, bnp2 = carry
        sn, abc_n, abc_np1 = inp
        A, B, _ = abc_n
        Cnp1 = abc_np1[2]
        bn = sn + (A * x + B) * bnp1 - Cnp1 * bnp2
        return (bn, bnp1), None

    zeros = jnp.zeros_like(x)
    # iterate n = N-1 .. 1 inside the scan; b_N = s_N seeds the carry
    bN = svec[N] * jnp.ones_like(x)
    carry = (bN, zeros)
    idxs = np.arange(N - 1, 0, -1)
    if len(idxs):
        inputs = (svec[jnp.asarray(idxs)],
                  abc_j[jnp.asarray(idxs)],
                  abc_j[jnp.asarray(idxs + 1)])
        carry, _ = lax.scan(step, carry, inputs)
    b1, b2 = carry
    # final step with P0 = 1, P1 = (A0 x + B0) P0 (degenerate-aware abc(0))
    A0, B0, _ = recurrence_abc(0, alpha, beta)
    C1 = recurrence_abc(1, alpha, beta)[2]
    b0 = svec[0] + (A0 * x + B0) * b1 - C1 * b2
    # alpha_0 relation: sum = b0 with P0=1 seeding
    return b0


def jacobi_radial_sum(coefs, ns, alpha, beta, x, y, normalization_radius):
    """Weighted radial Jacobi sum on (x, y) points."""
    ns = tuple(ns)
    if not ns:
        return jnp.zeros_like(x)
    R = float(normalization_radius)
    u = 2.0 * (x * x + y * y) / (R * R) - 1.0
    P = jacobi_seq(ns, alpha, beta, u)
    coefs = jnp.asarray(np.asarray(coefs, dtype=np.float64), dtype=x.dtype)
    return jnp.tensordot(coefs, P, axes=(0, 0))


def jacobi_radial_sum_der_xy(coefs, ns, alpha, beta, x, y, normalization_radius):
    """Radial Jacobi sum and its Cartesian derivatives."""
    ns = tuple(ns)
    if not ns:
        z = jnp.zeros_like(x)
        return z, z, jnp.zeros_like(y)
    R = float(normalization_radius)
    inv_Rsq = 1.0 / (R * R)
    u = 2.0 * (x * x + y * y) * inv_Rsq - 1.0
    P = jacobi_seq(ns, alpha, beta, u)
    Pp = jacobi_der_seq(ns, alpha, beta, u)
    coefs = jnp.asarray(np.asarray(coefs, dtype=np.float64), dtype=x.dtype)
    z = jnp.tensordot(coefs, P, axes=(0, 0))
    dzdu = jnp.tensordot(coefs, Pp, axes=(0, 0))
    dzdx = dzdu * (4.0 * x * inv_Rsq)
    dzdy = dzdu * (4.0 * y * inv_Rsq)
    return z, dzdx, dzdy


def jacobi_sum_clenshaw_der(s, alpha, beta, x, j=1):
    """jth partial derivative w.r.t. x of the weighted Jacobi sum.

    Contract note: the reference's function of this name
    (prysm/polynomials/jacobi.py:319) fills a caller-supplied Clenshaw
    alpha TABLE that qpoly combines downstream; here the plain Clenshaw
    sum is a jit-friendly scan, so this returns the j-th derivative
    itself via j nested forward-mode passes — exact, no extra
    recurrences, and the qpoly consumers have their own fused paths.
    """
    import jax

    def f(xv):
        return jacobi_sum_clenshaw(s, alpha, beta, xv)

    for _ in range(int(j)):
        f = (lambda g: lambda xv: jax.jvp(
            g, (xv,), (jnp.ones_like(xv),))[1])(f)
    return f(jnp.asarray(x))
