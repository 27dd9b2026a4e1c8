"""Scan-based Clenshaw summation for three-term-recurrence polynomial families.

Rebuild of ``prysm/polynomials/_clenshaw.py``.  The reference walks the
downward recurrence in a Python loop over callables, filling a dense alpha
table in place.  Here the per-order linear factors are tabulated host-side
into arrays (lin_n(x) = p_n + q_n * x with scalar p_n, q_n, plus scalar c_n)
and the recurrence runs as a single ``lax.scan`` for the value and all j
derivative tracks jointly.  Only the two lowest alpha slots are kept — the
ones every caller actually reads (alphas[0] for P0 = 1 families; Qbfs also
reads alphas[1]) — so peak memory is O((j+1) * 2 * x.size), independent of
the number of coefficients.
"""
import numpy as np
import jax.numpy as jnp
from jax import lax


def clenshaw_alphas_scan(coefs, p, q, c, x, j=0):
    """Clenshaw alpha tables for P_n(x) = (p_n + q_n x) P_{n-1} - c_n P_{n-2}.

    Parameters
    ----------
    coefs : sequence of float or ndarray
        dense coefficient vector c_0 .. c_M.  Scalars or arrays broadcastable
        with x (scalars are typical; arrays support batched coefficients).
    p, q, c : ndarray
        host-side scalar tables indexed by order n, length >= M+1.
        lin_n(x) = p[n] + q[n] * x;  c[n] multiplies P_{n-2}.
    x : ndarray
        evaluation points
    j : int, optional
        number of derivative tracks (0 = value only)

    Returns
    -------
    ndarray
        shape (j+1, 2, *x.shape): [jj, 0] is alphas[jj][0] (the jj-th
        derivative of the sum, since P_0 = 1), [jj, 1] is alphas[jj][1].

    """
    M = len(coefs) - 1
    xshape = jnp.shape(x)
    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x)
    if M < 0:
        return jnp.zeros((j + 1, 2) + xshape, dtype=jnp.asarray(x).dtype)
    if M == 0:
        out = jnp.zeros((j + 1, 2) + xshape, dtype=jnp.asarray(x).dtype)
        return out.at[0, 0].set(coefs[0] * ones)

    dtype = jnp.asarray(x).dtype
    p = jnp.asarray(np.asarray(p, dtype=np.float64)[:M + 1], dtype=dtype)
    q = jnp.asarray(np.asarray(q, dtype=np.float64)[:M + 1], dtype=dtype)
    c = jnp.asarray(np.asarray(c, dtype=np.float64)[:M + 1], dtype=dtype)
    # pad c with a harmless 0 slot at index M+1 (referenced but multiplied by 0)
    c_ext = jnp.concatenate([c, jnp.zeros((1,), dtype=dtype)])

    if all(np.isscalar(cc) or np.ndim(cc) == 0 for cc in coefs):
        coef_arr = jnp.asarray(np.asarray(coefs, dtype=np.float64), dtype=dtype)
        coef_at = lambda n_rev: coef_arr[n_rev]  # NOQA
        coef_leading = True
    else:
        coef_arr = jnp.stack([jnp.broadcast_to(jnp.asarray(cc, dtype=dtype), xshape)
                              for cc in coefs])
        coef_at = lambda n_rev: coef_arr[n_rev]  # NOQA
        coef_leading = False

    # carry[jj] = (alpha_jj[n+1], alpha_jj[n+2]); uniform scan n = M-1 .. 0.
    # alpha_jj[M] = coefs[M] for jj == 0 else 0; the derivative-track seeds
    # emerge naturally because alpha_{jj}[n] = 0 for n > M - jj.
    a_np1 = jnp.stack([coefs[M] * ones if jj == 0 else zeros
                       for jj in range(j + 1)])
    a_np2 = jnp.stack([zeros for _ in range(j + 1)])

    ns = jnp.arange(M - 1, -1, -1)

    def step(carry, n):
        a1, a2 = carry  # (j+1, *x.shape) each
        lin = p[n] + q[n] * x
        cnp1 = c_ext[n + 1]
        news = []
        for jj in range(j + 1):
            base = lin * a1[jj] - cnp1 * a2[jj]
            if jj == 0:
                cn = coef_at(n)
                new = cn + base
            else:
                new = jj * q[n] * a1[jj - 1] + base
            news.append(new)
        new_a = jnp.stack(news)
        return (new_a, a1), None

    (a0, a1), _ = lax.scan(step, (a_np1, a_np2), ns)
    return jnp.stack([a0, a1], axis=1)


def clenshaw_sum(coefs, p, q, c, x):
    """Weighted polynomial sum via Clenshaw; returns alphas[0] (P0 = 1)."""
    return clenshaw_alphas_scan(coefs, p, q, c, x, j=0)[0, 0]
