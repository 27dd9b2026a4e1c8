"""Phase Shifting Interferometry.

Rebuild of ``prysm/x/psi.py``.  The de Groot accumulation is a mode-weighted
sum (one MXU contraction over frames); phase unwrapping is a DCT-based
unweighted least-squares (Ghiglia-Romero) Poisson solve — a pure FFT
program that jits and differentiates, replacing the reference's
scikit-image reach-out (prysm/x/psi.py:160-194).
"""
from collections import namedtuple

import numpy as onp
import jax.numpy as jnp

from ..fttools import fftrange
from .._richdata import RichData
from ..polynomials import sum_of_2d_modes

Scheme = namedtuple('Scheme', ['shifts', 's', 'c'])

ZYGO_THIRTEEN_FRAME = Scheme(
    fftrange(13) * onp.pi / 4,
    onp.asarray((-3, -4, 0, 12, 21, 16, 0, -16, -21, -12, 0, 4, 3)),
    onp.asarray((0, -4, -12, -12, 0, 16, 24, 16, 0, -12, -12, -4, 0)),
)

SCHWIDER = Scheme(
    fftrange(5) * onp.pi / 2,
    onp.asarray((0, 2, 0, -2, 0)),
    onp.asarray((-1, 0, 2, 0, -1)),
)


def psi_accumulate(gs, scheme):
    """Accumulate PSI numerator (sine) and denominator (cosine) images."""
    gs = jnp.asarray(gs)
    num = sum_of_2d_modes(gs, jnp.asarray(scheme.s, dtype=gs.dtype))
    den = sum_of_2d_modes(gs, jnp.asarray(scheme.c, dtype=gs.dtype))
    return num, den


def degroot_formalism_psi(gs, scheme):
    """de Groot's PSI formalism -> wrapped phase estimate."""
    was_rd = isinstance(gs[0], RichData)
    if was_rd:
        g00 = gs[0]
        gs = [g.data for g in gs]
    num, den = psi_accumulate(gs, scheme)
    out = jnp.arctan2(num, den)
    if was_rd:
        out = RichData(out, g00.dx, g00.wavelength)
    return out


def design_scheme(N, stepsize=None, window=None):
    """Design a PSI scheme of N steps, optionally windowed."""
    if stepsize is None:
        stepsize = (2 * onp.pi) / (N - 1)
    shifts = onp.asarray(fftrange(N)) * stepsize
    s = onp.sin(shifts)
    c = onp.cos(shifts)
    if window is not None:
        if isinstance(window, str):
            from scipy import signal
            window = signal.windows.get_window(window, N)
        s = s * window
        c = c * window
    return Scheme(shifts, s, c)


def unwrap_phase(wrapped, mask=None):
    """Unwrap phase via DCT-based least-squares (Ghiglia & Romero 1994).

    Solves the discrete Poisson equation whose source is the divergence of
    the wrapped phase gradients.  Unweighted; for masked data, fill invalid
    regions beforehand (e.g. with 0).  Matches scikit-image's result up to
    an additive constant for smooth phase maps.
    """
    was_rd = isinstance(wrapped, RichData)
    if was_rd:
        w0 = wrapped
        wrapped = wrapped.data
    psi = jnp.asarray(wrapped)
    if mask is not None:
        psi = jnp.where(mask, psi, 0.0)

    def wrap(d):
        return (d + jnp.pi) % (2 * jnp.pi) - jnp.pi

    dy = wrap(jnp.diff(psi, axis=0))
    dx = wrap(jnp.diff(psi, axis=1))
    # divergence with Neumann boundaries
    rho = jnp.zeros_like(psi)
    rho = rho.at[:-1, :].add(dy)
    rho = rho.at[1:, :].add(-dy)
    rho = rho.at[:, :-1].add(dx)
    rho = rho.at[:, 1:].add(-dx)

    N0, N1 = psi.shape
    # DCT-based Poisson solve using jax.scipy.fft if present, else FFT mirror
    try:
        from jax.scipy.fft import dctn, idctn
        RHO = dctn(rho, type=2, norm='ortho')
        k0 = jnp.arange(N0)
        k1 = jnp.arange(N1)
        denom = (2 * jnp.cos(jnp.pi * k0 / N0)[:, None]
                 + 2 * jnp.cos(jnp.pi * k1 / N1)[None, :] - 4)
        denom = denom.at[0, 0].set(1.0)
        PHI = RHO / denom
        PHI = PHI.at[0, 0].set(0.0)
        out = idctn(PHI, type=2, norm='ortho')
    except ImportError:  # pragma: no cover
        raise NotImplementedError('unwrap_phase requires jax.scipy.fft.dctn')

    # restore the mean of the wrapped input (unwrap is defined up to 2 pi k)
    offset = jnp.round((psi - out).mean() / (2 * jnp.pi)) * 2 * jnp.pi
    out = out + offset
    if was_rd:
        out = RichData(out, w0.dx, w0.wavelength)
    return out
