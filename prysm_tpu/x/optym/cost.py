"""Figures of merit returning ``(cost, gradient)``.

API parity target: ``prysm/x/optym/cost.py``.  The reference hand-derives
each gradient; here every cost is written as a pure scalar jnp function and
the gradient comes from ``jax.value_and_grad`` — exact (the bias/gain
invariant error's fit coefficients drop out of the derivative by the
envelope theorem, so AD reproduces the reference's "frozen alpha" gradient).

Masks select a subset of pixels.  Selection happens host-side (boolean
indexing is a dynamic shape), gradients scatter back to the full grid.
"""
import functools

import numpy as onp

import jax
import jax.numpy as jnp


def _grad_pair(scalar_fn):
    """Wrap a scalar-valued f(M, D) into (cost, dcost/dM) with mask support."""
    value_and_grad = jax.value_and_grad(scalar_fn)

    @functools.wraps(scalar_fn)
    def wrapped(M, D, mask=None):
        if hasattr(M, 'dtype') and hasattr(D, 'dtype') and M.dtype != D.dtype:
            raise TypeError(
                f'{scalar_fn.__name__}: input dtype mismatch; first array is '
                f'{M.dtype}, second is {D.dtype}; cast one to match before calling')
        if mask is None:
            return value_and_grad(jnp.asarray(M), D)
        sel = onp.asarray(mask)
        D_sel = jnp.asarray(D)[sel] if getattr(D, 'ndim', 0) else D
        cost, partial = value_and_grad(jnp.asarray(M)[sel], D_sel)
        full = jnp.zeros(jnp.shape(M), dtype=partial.dtype).at[sel].set(partial)
        return cost, full

    return wrapped


@_grad_pair
def bias_and_gain_invariant_error(I, D):  # NOQA
    """Error between I and D, invariant to overall bias and gain in I."""
    I0 = I - I.mean()
    D0 = D - D.mean()
    gain = (I0 * D0).sum() / (I0 * I0).sum()
    bias = D.mean() - gain * I.mean()
    misfit = gain * I + bias - D
    return (misfit * misfit).sum() / (D * D).sum()


@_grad_pair
def mean_square_error(M, D):
    """Mean square error between model M and data D."""
    delta = M - D
    return (delta * delta).mean()


@_grad_pair
def negative_loglikelihood(y, yhat):
    """Mean negative log-likelihood of Bernoulli data yhat under model y."""
    per_pixel = yhat * jnp.log(y) + (1 - yhat) * jnp.log(1 - y)
    return -per_pixel.mean()
