"""Bayer color-filter-array operations: composite, white balance, demosaic.

Rebuild of ``prysm/bayer.py``.  The reference mutates mosaics in place with
strided slice assignment; here every op is pure — checkerboard selection is
a parity-mask ``where``, convolution is pad-reflect + conv (all fusable VPU
work), and white-balance returns new arrays.
"""
import numpy as np

import jax.numpy as jnp
from jax import lax

from .conf import config
from .mathops import cis

top_left = (Ellipsis, slice(0, None, 2), slice(0, None, 2))
top_right = (Ellipsis, slice(0, None, 2), slice(1, None, 2))
bottom_left = (Ellipsis, slice(1, None, 2), slice(0, None, 2))
bottom_right = (Ellipsis, slice(1, None, 2), slice(1, None, 2))

ErrBadCFA = NotImplementedError('only rggb, bggr bayer patterns currently implemented')


def _parity_masks(shape):
    """(tl, tr, bl, br) boolean masks of the 2x2 CFA tiling for a 2D shape."""
    rows = jnp.arange(shape[-2]) % 2
    cols = jnp.arange(shape[-1]) % 2
    re = rows[:, None] == 0
    ce = cols[None, :] == 0
    return re & ce, re & ~ce, ~re & ce, ~re & ~ce


def wb_prescale(mosaic, wr, wg1, wg2, wb, cfa='rggb', safe=False, saturation=None):
    """White-balance prescaling of a mosaic; returns the scaled mosaic."""
    cfa = cfa.lower()
    if safe:
        if saturation is None:
            raise ValueError('When doing safe WB prescaling, saturation must be not-none')
        if not hasattr(saturation, '__iter__'):
            saturation = [saturation] * 4
        else:
            saturation = list(saturation)
            if len(saturation) != 4:
                raise ValueError('saturation must be scalar or contain four values')
        if any(s <= 0 for s in saturation):
            raise ValueError('saturation must be positive')
        planes = decomposite_bayer(mosaic, cfa)
        gains = (wr, wg1, wg2, wb)
        ratio = 1.0
        for plane, gain, sat in zip(planes, gains, saturation):
            rat = plane.max() * gain / sat
            ratio = jnp.maximum(ratio, rat)
        wr = wr / ratio
        wg1 = wg1 / ratio
        wg2 = wg2 / ratio
        wb = wb / ratio

    tl, tr, bl, br = _parity_masks(mosaic.shape)
    if cfa == 'rggb':
        g = jnp.where(tl, wr, jnp.where(tr, wg1, jnp.where(bl, wg2, wb)))
    elif cfa == 'bggr':
        g = jnp.where(tl, wb, jnp.where(tr, wg1, jnp.where(bl, wg2, wr)))
    else:
        raise ErrBadCFA
    return mosaic * g


def wb_postscale(rgb, wr, wg, wb, safe=False, saturation=None):
    """White-balance gains on a trichromatic (m, n, 3) image; returns new array."""
    if safe:
        if saturation is None:
            raise ValueError('When doing safe WB prescaling, saturation must be not-none')
        if not hasattr(saturation, '__iter__'):
            saturation = [saturation] * 3
        else:
            saturation = list(saturation)
            if len(saturation) != 3:
                raise ValueError('saturation must be scalar or contain three values')
        if any(s <= 0 for s in saturation):
            raise ValueError('saturation must be positive')
        gains = (wr, wg, wb)
        ratio = 1.0
        for i in range(3):
            rat = rgb[..., i].max() * gains[i] / saturation[i]
            ratio = jnp.maximum(ratio, rat)
        wr = wr / ratio
        wg = wg / ratio
        wb = wb / ratio
    return jnp.stack([rgb[..., 0] * wr, rgb[..., 1] * wg, rgb[..., 2] * wb], axis=-1)


def composite_bayer(r, g1, g2, b, cfa='rggb'):
    """Interleave densely sampled color planes into a mosaic."""
    cfa = cfa.lower()
    tl, tr, bl, br = _parity_masks(r.shape)
    if cfa == 'rggb':
        return jnp.where(tl, r, jnp.where(tr, g1, jnp.where(bl, g2, b)))
    elif cfa == 'bggr':
        return jnp.where(tl, b, jnp.where(tr, g1, jnp.where(bl, g2, r)))
    raise ErrBadCFA


def decomposite_bayer(img, cfa='rggb'):
    """Split a mosaic into (r, g1, g2, b) quarter-resolution planes."""
    cfa = cfa.lower()
    if cfa == 'rggb':
        return (img[top_left], img[top_right], img[bottom_left], img[bottom_right])
    elif cfa == 'bggr':
        b = img[top_left]
        g1 = img[top_right]
        g2 = img[bottom_left]
        r = img[bottom_right]
        return r, g1, g2, b
    raise ErrBadCFA


def recomposite_bayer(r, g1, g2, b, cfa='rggb'):
    """Reassemble quarter-resolution planes into a mosaic (inverse of decomposite)."""
    cfa = cfa.lower()
    m, n = r.shape[-2:]
    out = jnp.zeros((*r.shape[:-2], 2 * m, 2 * n), dtype=r.dtype)
    if cfa == 'rggb':
        out = out.at[top_left].set(r)
        out = out.at[top_right].set(g1)
        out = out.at[bottom_left].set(g2)
        out = out.at[bottom_right].set(b)
    elif cfa == 'bggr':
        out = out.at[top_left].set(b)
        out = out.at[top_right].set(g1)
        out = out.at[bottom_left].set(g2)
        out = out.at[bottom_right].set(r)
    else:
        raise ErrBadCFA
    return out


def demosaic_deinterlace(img, cfa='rggb'):
    """Demosaic by de-interlacing: (m//2, n//2, 3), greens averaged."""
    r, g1, g2, b = decomposite_bayer(img, cfa)
    g = (g1 + g2) / 2
    return jnp.stack([r, g, b], axis=-1)


def _fourier_shift(plane, shift_rows, shift_cols):
    """Subpixel shift via linear phase in the Fourier domain."""
    m, n = plane.shape[-2:]
    F = jnp.fft.fft2(plane, axes=(-2, -1))
    ky = jnp.fft.fftfreq(m)
    kx = jnp.fft.fftfreq(n)
    phase = cis(-2 * jnp.pi * (ky[:, None] * shift_rows + kx[None, :] * shift_cols))
    return jnp.fft.ifft2(F * phase, axes=(-2, -1)).real


def assemble_superresolved(r, g1, g2, b, zoomfactor, cfa='rggb'):
    """Assemble a trichromatic image from super-resolved color planes.

    Each plane is Fourier-shifted onto the G1 grid before stacking.
    """
    if cfa != 'rggb':
        raise NotImplementedError('assemble_superresolved: only rggb patterns supported at this time')
    rp = _fourier_shift(r, -zoomfactor, 0)
    bp = _fourier_shift(b, 0, zoomfactor)
    g2p = _fourier_shift(g2, -zoomfactor, zoomfactor)
    gp = (g2p + g1) / 2
    return jnp.stack([rp, gp, bp], axis=-1)


# Kernels from Malvar et al, fig 2.
kernel_G_at_R_or_B = [
    [0, 0, -1, 0, 0],
    [0, 0, 2, 0, 0],
    [-1, 2, 4, 2, -1],
    [0, 0, 2, 0, 0],
    [0, 0, -1, 0, 0],
]

kernel_R_at_G_in_RB = [
    [0, 0, .5, 0, 0],
    [0, -1, 0, -1, 0],
    [-1, 4, 5, 4, -1],
    [0, -1, 0, -1, 0],
    [0, 0, .5, 0, 0],
]

kernel_R_at_G_in_BR = [
    [0, 0, -1, 0, 0],
    [0, -1, 4, -1, 0],
    [.5, 0, 5, 0, .5],
    [0, -1, 4, -1, 0],
    [0, 0, -1, 0, 0],
]

kernel_R_at_B_in_BB = [
    [0, 0, -3 / 2, 0, 0],
    [0, 2, 0, 2, 0],
    [-3 / 2, 0, 6, 0, -3 / 2],
    [0, 2, 0, 2, 0],
    [0, 0, -3 / 2, 0, 0],
]


def _convolve_reflect(img, kernel, scale=1.0):
    """2D convolution with reflect boundary (scipy ndimage.convolve semantics).

    The kernel must be a host-side (static) array.  Instead of
    ``lax.conv``, the convolution unrolls into shifted adds over the
    kernel's NONZERO taps: the Malvar kernels have <= 9 taps of 25, and
    single-channel 5x5 convs lower onto the TPU MXU pathologically
    (measured ~8.7 ms per 512^2 conv at 'highest' matmul precision vs
    ~tens of us for the shift-add form, which is exact f32 on the VPU).
    """
    k = np.asarray(kernel, dtype=np.float64)
    pad = k.shape[0] // 2
    # ndimage.convolve flips the kernel; all Malvar kernels are symmetric
    # but flip anyway for exactness
    k = k[::-1, ::-1] * scale
    # scipy ndimage 'reflect' duplicates the edge sample == numpy 'symmetric'
    padded = jnp.pad(img, pad, mode='symmetric')
    H, W = img.shape[-2:]
    out = None
    for i, j in zip(*np.nonzero(k)):
        term = padded[..., i:i + H, j:j + W] * float(k[i, j])
        out = term if out is None else out + term
    return out
def demosaic_malvar(img, cfa='rggb'):
    """Malvar et al. 5x5 gradient-corrected linear demosaic -> (m, n, 3)."""
    cfa = cfa.lower()
    if img.dtype.kind not in 'fc':
        img = img.astype(config.precision)
    Gest = _convolve_reflect(img, kernel_G_at_R_or_B, scale=1 / 8.)
    c1 = _convolve_reflect(img, kernel_R_at_G_in_RB, scale=1 / 8.)
    c2 = _convolve_reflect(img, kernel_R_at_G_in_BR, scale=1 / 8.)
    c3 = _convolve_reflect(img, kernel_R_at_B_in_BB, scale=1 / 8.)

    tl, tr, bl, br = _parity_masks(img.shape)
    green = jnp.where(tr | bl, img, Gest)
    if cfa == 'rggb':
        red = jnp.where(tl, img, jnp.where(tr, c1, jnp.where(bl, c2, c3)))
        blue = jnp.where(tl, c3, jnp.where(tr, c2, jnp.where(bl, c1, img)))
    elif cfa == 'bggr':
        blue = jnp.where(tl, img, jnp.where(tr, c1, jnp.where(bl, c2, c3)))
        red = jnp.where(tl, c3, jnp.where(tr, c2, jnp.where(bl, c1, img)))
    else:
        raise ErrBadCFA
    return jnp.stack((red, green, blue), axis=-1)
