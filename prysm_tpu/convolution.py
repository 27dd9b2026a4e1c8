"""Fourier-domain convolution and transfer-function chains.

Rebuild of ``prysm/convolution.py``.  Transfer-function multiplication
happens once in the frequency domain; callables are introspected for which
frequency grids (fx/fy/fr/ft) they accept, exactly as the reference does
(prysm/convolution.py:34-114).
"""
import inspect

import jax.numpy as jnp

from .coordinates import optimize_xy_separable, cart_to_polar
from .fttools import forward_ft_unit

_AX = (-2, -1)


def conv(obj, psf):
    """Convolve an object and a PSF via the FFT (both shape (..., M, N))."""
    O = jnp.fft.fft2(jnp.fft.ifftshift(obj, axes=_AX), axes=_AX)  # NOQA
    H = jnp.fft.fft2(jnp.fft.ifftshift(psf, axes=_AX), axes=_AX)
    i = jnp.fft.fftshift(jnp.fft.ifft2(O * H, axes=_AX), axes=_AX)
    return i.real if not jnp.iscomplexobj(obj) else i


def _frequency_grids(obj, dx, fx, fy, fr, ft, shift):
    """Fill any missing frequency grids from the sample spacing."""
    if fx is None:
        fx = forward_ft_unit(dx, obj.shape[-1], shift=shift)
    if fy is None:
        fy = forward_ft_unit(dx, obj.shape[-2], shift=shift)
    fx, fy = optimize_xy_separable(fx, fy)
    if fr is None or ft is None:
        pr, pt = cart_to_polar(fx, fy)
        fr = pr if fr is None else fr
        ft = pt if ft is None else ft
    return {'fx': fx, 'fy': fy, 'fr': fr, 'ft': ft}


def _materialize_tf(tf, grids):
    """Call a transfer-function callable with whichever grids it accepts."""
    accepted = inspect.signature(tf).parameters
    kwargs = {k: v for k, v in grids.items() if k in accepted}
    if not kwargs:
        raise ValueError(f'{tf} accepts none of fx, fy, fr, ft; a '
                         'transfer function must accept at least one')
    return tf(**kwargs)


def apply_transfer_functions(obj, dx, tfs, fx=None, fy=None, ft=None, fr=None,
                             shift=False):
    """Blur an object by N transfer functions (arrays or callables)."""
    grids = None
    if any(callable(tf) for tf in tfs):
        grids = _frequency_grids(obj, dx, fx, fy, fr, ft, shift)

    O = jnp.fft.fft2(jnp.fft.ifftshift(obj, axes=_AX), axes=_AX)  # NOQA
    if shift:
        O = jnp.fft.fftshift(O, axes=_AX)  # NOQA

    for tf in tfs:
        if callable(tf):
            tf = _materialize_tf(tf, grids)
        O = O * tf  # NOQA

    if shift:
        O = jnp.fft.ifftshift(O, axes=_AX)  # NOQA
    i = jnp.fft.fftshift(jnp.fft.ifft2(O, axes=_AX), axes=_AX)
    return i if jnp.iscomplexobj(obj) else i.real
