"""Mode summation and fitting, TPU-native.

Rebuild of ``prysm/polynomials/fitting.py``.  The reference masks invalid
pixels with NaN + boolean fancy indexing, which produces data-dependent
shapes; here masking is done with weights (mask-as-float) so every op has a
static shape and the whole path jits, vmaps, and differentiates.
"""
import jax.numpy as jnp


def sum_of_2d_modes(modes, weights):
    """Weighted sum of a mode stack: (k, m, n) x (..., k) -> (..., m, n).

    The contraction maps onto a single MXU matmul; batched weight arrays
    produce batched sums.
    """
    modes = jnp.asarray(modes)
    weights = jnp.asarray(weights, dtype=modes.dtype)
    return jnp.tensordot(weights, modes, axes=(-1, 0))


def sum_of_2d_modes_adjoint(modes, databar):
    """Adjoint of sum_of_2d_modes w.r.t. weights: contract modes with databar.

    Provided for API parity; jax.grad of sum_of_2d_modes produces the same
    contraction automatically.
    """
    modes = jnp.asarray(modes)
    return jnp.tensordot(modes, databar, axes=((1, 2), (-2, -1)))


def hopkins(a, b, c, r, t, H):
    """Hopkins' aberration expansion W_abc; negative a selects the sine term."""
    if a < 0:
        c1 = jnp.sin(abs(a) * t)
    else:
        c1 = jnp.cos(a * t)
    return c1 * (r ** b) * (H ** c)


def lstsq(modes, data):
    """Least-squares fit of modes to data; NaN data points are ignored.

    Solves the weighted normal equations (static shapes, jit-friendly)
    instead of compressing NaN points out of the system as the reference
    does (prysm/polynomials/fitting.py:103-126).
    """
    modes = jnp.asarray(modes)
    k = modes.shape[0]
    M = modes.reshape((k, -1))          # (k, P)
    d = jnp.asarray(data).ravel()       # (P,)
    w = jnp.isfinite(d)
    dw = jnp.where(w, d, 0)
    Mw = M * w                          # zero out ignored pixels
    A = Mw @ M.T                        # (k, k)
    b = Mw @ dw                         # (k,)
    return jnp.linalg.solve(A, b)


def _masked_norm(flat_modes, mask_flat, to):
    """RMS ('std') or PV ('ptp') over masked pixels, via weights."""
    w = mask_flat.astype(flat_modes.dtype)
    n = jnp.sum(w)
    if to == 'std':
        mean = (flat_modes @ w) / n
        var = ((flat_modes - mean[:, None]) ** 2 @ w) / n
        return jnp.sqrt(var)
    if to == 'ptp':
        big = jnp.where(mask_flat, flat_modes, -jnp.inf)
        small = jnp.where(mask_flat, flat_modes, jnp.inf)
        return jnp.max(big, axis=1) - jnp.min(small, axis=1)
    raise ValueError(f"to must be 'std' or 'ptp', got {to}")


def normalize_modes(modes, mask, to='std'):
    """Scale modes to unit RMS (to='std') or unit PV (to='ptp') over mask."""
    modes = jnp.asarray(modes)
    squeeze = modes.ndim == 2
    if squeeze:
        modes = modes[None]
    k = modes.shape[0]
    flat = modes.reshape((k, -1))
    norms = _masked_norm(flat, jnp.asarray(mask).ravel(), to)
    norms = jnp.where(norms < 1e-9, 1.0, norms)  # loophole for piston
    out = modes * (1 / norms)[:, None, None]
    return out[0] if squeeze else out


def orthogonalize_modes(modes, mask):
    """Gram-Schmidt (QR) orthogonalization of modes over a mask.

    Zeroing masked-out pixels before QR gives the same inner products as
    compressing them away, so the factorization needs no dynamic shapes;
    the Q columns are automatically zero outside the mask.
    """
    modes = jnp.asarray(modes)
    k = modes.shape[0]
    m = jnp.asarray(mask).ravel()
    basis = modes.reshape((k, -1)) * m  # (k, P), zero outside mask
    Q, R = jnp.linalg.qr(basis.T)
    sgn = jnp.sign(jnp.diag(R))
    Qmod = Q * sgn
    return (Qmod.T).reshape(modes.shape)
