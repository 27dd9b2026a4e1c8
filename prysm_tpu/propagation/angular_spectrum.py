"""Angular-spectrum (plane-to-plane) free space propagation.

Rebuild of ``prysm/propagation/angular_spectrum.py``; the transfer function
is built as a separable outer product of 1D quadratic phasors and the
propagation is pad -> fft2 -> multiply -> ifft2, batch-aware over leading
axes.
"""
import jax.numpy as jnp

from ..conf import config
from ..fttools import pad2d, crop_center, fftfreq
from ..mathops import cis

_AX = (-2, -1)


def angular_spectrum_transfer_function(samples, wvl, dx, z):
    """Free-space transfer function on an FFT-ordered frequency grid.

    samples (y, x); wvl um; dx mm; z mm.  exp(-i pi wvl z (kx^2 + ky^2)).
    """
    if isinstance(samples, int):
        samples = (samples, samples)
    wvl = wvl / 1e3
    ky = fftfreq(samples[0], dx, dtype=config.precision)
    kx = fftfreq(samples[1], dx, dtype=config.precision)
    prefix = -jnp.pi * wvl * z
    tfy = cis(prefix * (ky * ky))
    tfx = cis(prefix * (kx * kx))
    return jnp.outer(tfy, tfx)


def angular_spectrum(field, wvl, dx, z, Q=2, tf=None):
    """Propagate a field via the angular spectrum method.

    field complex (..., N, M); wvl um; dx mm; z mm; Q pads the array before
    the transform.  If tf is given it clobbers all other parameters.
    """
    if tf is not None:
        return jnp.fft.ifft2(jnp.fft.fft2(field, axes=_AX) * tf, axes=_AX)
    if Q != 1:
        field = pad2d(field, Q=Q)
    tf = angular_spectrum_transfer_function(field.shape[-2:], wvl, dx, z)
    forward = jnp.fft.fft2(field, axes=_AX)
    return jnp.fft.ifft2(forward * tf, axes=_AX)


def angular_spectrum_adjoint(field, wvl, dx, z, Q=2, tf=None):
    """Adjoint of angular_spectrum: conjugate transfer function + crop."""
    if tf is None:
        tf = angular_spectrum_transfer_function(field.shape[-2:], wvl, dx, z)
        if Q == 1:
            out_shape = field.shape[-2:]
        else:
            out_shape = tuple(int(s // Q) for s in field.shape[-2:])
    else:
        out_shape = field.shape[-2:]
    out = jnp.fft.ifft2(jnp.fft.fft2(field, axes=_AX) * jnp.conj(tf), axes=_AX)
    if out_shape == field.shape[-2:]:
        return out
    return crop_center(out, out_shape)


def fresnel_number(a, L, lambda_):
    """Fresnel number a^2 / (L lambda); << 1 means paraxial assumptions hold."""
    return a ** 2 / (L * lambda_)


def talbot_distance(a, lambda_):
    """Talbot distance for grating period a and wavelength lambda (um)."""
    num = lambda_
    den = 1 - jnp.sqrt(1 - lambda_ ** 2 / a ** 2)
    return num / den
