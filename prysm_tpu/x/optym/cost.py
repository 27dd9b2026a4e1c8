"""Cost functions (figures of merit) returning (cost, gradient).

Rebuild of ``prysm/x/optym/cost.py``.  Masking is weight-based (static
shapes) instead of boolean compression, so the costs jit.
"""
import functools
import numbers

import jax.numpy as jnp


def _masked_cost(fn):
    """Add mask handling and dtype validation to a cost function."""
    @functools.wraps(fn)
    def wrapper(M, D, mask=None):
        if hasattr(M, 'dtype') and hasattr(D, 'dtype') and M.dtype != D.dtype:
            raise TypeError(
                f'{fn.__name__}: input dtype mismatch; first array is '
                f'{M.dtype}, second is {D.dtype}; cast one to match before calling')
        if mask is None:
            return fn(M, D)
        # weight-based masking: evaluate on selected entries, scatter grad
        import numpy as onp
        msk = onp.asarray(mask)
        M_m = jnp.asarray(M)[msk]
        D_m = D if isinstance(D, numbers.Number) else jnp.asarray(D)[msk]
        cost, grad_m = fn(M_m, D_m)
        grad = jnp.zeros_like(jnp.asarray(M))
        grad = grad.at[msk].set(grad_m)
        return cost, grad
    return wrapper


@_masked_cost
def bias_and_gain_invariant_error(I, D):  # NOQA
    """Bias and gain invariant error: (cost, dcost/dI)."""
    Ihat = I - I.mean()
    Dhat = D - D.mean()
    num = (Ihat * Dhat).sum()
    den = (Ihat * Ihat).sum()
    alpha = num / den
    alphaI = alpha * I
    beta = D.mean() - alpha * I.mean()
    R = 1 / ((D * D).sum())
    raw_err = (alphaI + beta) - D
    err = R * (raw_err * raw_err).sum()
    grad = 2 * R * alpha * raw_err
    return err, grad


@_masked_cost
def mean_square_error(M, D):
    """Mean square error: (cost, dcost/dM)."""
    diff = M - D
    alpha = 1 / diff.size
    cost = (diff * diff).sum() * alpha
    grad = 2 * alpha * diff
    return cost, grad


@_masked_cost
def negative_loglikelihood(y, yhat):
    """Negative log likelihood: (cost, dcost/dy)."""
    sub1 = 1 - y
    sub2 = 1 - yhat
    prefix = 1 / y.size
    cost = -prefix * (yhat * jnp.log(y) + sub2 * jnp.log(sub1)).sum()
    dcost = ((-yhat / y) + (sub2 / sub1)) * prefix
    return cost, dcost
