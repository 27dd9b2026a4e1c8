"""FFT-based pupil <-> focal propagation and sample-spacing conversions.

Rebuild of ``prysm/propagation/fft.py``: focus is the ortho-normalized
shift-sandwich ``fftshift(fft2(ifftshift(x)))``, preceded by FFT-aligned
padding.  All functions act on the trailing two axes so wavelength / field
batches ride along as leading dimensions.  XLA's native FFT runs these; the
explicit ``*_adjoint`` twins are provided for API parity (jax.grad derives
the same operators automatically).
"""
import math

import jax.numpy as jnp

from ..fttools import pad2d, crop_center

_AX = (-2, -1)


def _norm_ortho_fft2(x):
    # manual ortho scaling with a host float: jnp's norm='ortho' computes the
    # scale with an eager integer reduce_prod, unsupported on some backends
    scale = 1.0 / math.sqrt(x.shape[-2] * x.shape[-1])
    return jnp.fft.fft2(x, axes=_AX) * scale


def _norm_ortho_ifft2(x):
    scale = math.sqrt(x.shape[-2] * x.shape[-1])
    return jnp.fft.ifft2(x, axes=_AX) * scale


def _maybe_pad(wavefunction, Q):
    if Q != 1:
        return pad2d(wavefunction, Q)
    return wavefunction


def _shape_before_pad(padded_shape, Q):
    if Q == 1:
        return tuple(padded_shape)
    return tuple(int(s // Q) for s in padded_shape)


def _adjoint_pad2d(array, Q):
    out_shape = _shape_before_pad(array.shape[-2:], Q)
    if out_shape != array.shape[-2:]:
        return crop_center(array, out_shape)
    return array


def focus(wavefunction, Q):
    """Propagate a pupil plane to a PSF plane (unitary FFT)."""
    padded = _maybe_pad(wavefunction, Q)
    return jnp.fft.fftshift(_norm_ortho_fft2(jnp.fft.ifftshift(padded, axes=_AX)), axes=_AX)


def focus_adjoint(wavefunction, Q):
    """Adjoint of focus: inverse unitary FFT then center-crop."""
    padded_grad = jnp.fft.fftshift(_norm_ortho_ifft2(jnp.fft.ifftshift(wavefunction, axes=_AX)), axes=_AX)
    return _adjoint_pad2d(padded_grad, Q)


def unfocus(wavefunction, Q):
    """Propagate a PSF plane to a pupil plane (unitary inverse FFT)."""
    padded = _maybe_pad(wavefunction, Q)
    return jnp.fft.fftshift(_norm_ortho_ifft2(jnp.fft.ifftshift(padded, axes=_AX)), axes=_AX)


def unfocus_adjoint(wavefunction, Q):
    """Adjoint of unfocus: forward unitary FFT then center-crop."""
    padded_grad = jnp.fft.fftshift(_norm_ortho_fft2(jnp.fft.ifftshift(wavefunction, axes=_AX)), axes=_AX)
    return _adjoint_pad2d(padded_grad, Q)


def Q_for_sampling(input_diameter, prop_dist, wavelength, output_dx):
    """Q for a given output sampling: (wvl * z / D) / output_dx.

    input_diameter and prop_dist in mm, wavelength in um, output_dx in um.
    """
    resolution_element = (wavelength * prop_dist) / input_diameter
    return resolution_element / output_dx


def pupil_sample_to_psf_sample(pupil_sample, samples, wavelength, efl):
    """Pupil (mm) -> PSF (um) sample spacing: efl * wvl / (dx * N)."""
    return (efl * wavelength) / (pupil_sample * samples)


def psf_sample_to_pupil_sample(psf_sample, samples, wavelength, efl):
    """PSF (um) -> pupil (mm) sample spacing: efl * wvl / (dx * N)."""
    return (efl * wavelength) / (psf_sample * samples)
