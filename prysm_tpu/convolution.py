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


def apply_transfer_functions(obj, dx, tfs, fx=None, fy=None, ft=None, fr=None,
                             shift=False):
    """Blur an object by N transfer functions (arrays or callables)."""
    if any(callable(tf) for tf in tfs):
        if fx is None or fy is None:
            uy = forward_ft_unit(dx, obj.shape[-2], shift=shift)
            ux = forward_ft_unit(dx, obj.shape[-1], shift=shift)
            if fx is None:
                fx = ux
            if fy is None:
                fy = uy
        fx, fy = optimize_xy_separable(fx, fy)
        computed_fr, computed_ft = cart_to_polar(fx, fy)
        if fr is None:
            fr = computed_fr
        if ft is None:
            ft = computed_ft

    if shift:
        O = jnp.fft.fftshift(jnp.fft.fft2(jnp.fft.ifftshift(obj, axes=_AX), axes=_AX), axes=_AX)  # NOQA
    else:
        O = jnp.fft.fft2(jnp.fft.ifftshift(obj, axes=_AX), axes=_AX)  # NOQA

    for tf in tfs:
        if callable(tf):
            params = inspect.signature(tf).parameters
            kwargs = {}
            if 'fx' in params:
                kwargs['fx'] = fx
            if 'fy' in params:
                kwargs['fy'] = fy
            if 'fr' in params:
                kwargs['fr'] = fr
            if 'ft' in params:
                kwargs['ft'] = ft
            if not kwargs:
                raise ValueError(f'{tf} accepts none of fx, fy, fr, ft; a '
                                 'transfer function must accept at least one')
            tf = tf(**kwargs)
        O = O * tf  # NOQA

    if shift:
        i = jnp.fft.fftshift(jnp.fft.ifft2(jnp.fft.ifftshift(O, axes=_AX), axes=_AX), axes=_AX)
        return i.real if not jnp.iscomplexobj(obj) else i
    i = jnp.fft.fftshift(jnp.fft.ifft2(O, axes=_AX), axes=_AX)
    return i.real if not jnp.iscomplexobj(obj) else i
