"""Evaluation routines for point spread functions.

Rebuild of ``prysm/psf.py``.  Size estimation works on the polar resampling
of the data; the crossing search is reformulated with masked reductions so
it runs with static shapes on device (the reference loops rows in Python,
prysm/psf.py:78-90).
"""
import numbers

import jax.numpy as jnp

from .fttools import fftrange
from .mathops import jinc
from .coordinates import uniform_cart_to_polar

FIRST_AIRY_ZERO = 1.220
SECOND_AIRY_ZERO = 2.233
THIRD_AIRY_ZERO = 3.238
FIRST_AIRY_ENCIRCLED = 0.8377850436212378
SECOND_AIRY_ENCIRCLED = 0.9099305350850819
THIRD_AIRY_ENCIRCLED = 0.9376474743695488

AIRYDATA = {
    1: (FIRST_AIRY_ZERO, FIRST_AIRY_ENCIRCLED),
    2: (SECOND_AIRY_ZERO, SECOND_AIRY_ENCIRCLED),
    3: (THIRD_AIRY_ZERO, THIRD_AIRY_ENCIRCLED),
}


def estimate_size(data, metric, dx=None, x=None, y=None, criteria='last'):
    """Radial coordinate at which the azimuthal rows cross <metric>.

    metric in {'fwhm', '1/e', '1/e^2'} or a float threshold; criteria picks
    the first or last crossing per azimuthal row; the result is the mean of
    per-row linearly-interpolated crossing radii.
    """
    criteria = criteria.lower()
    metric_name = metric.lower() if isinstance(metric, str) else None

    if x is None and y is None:
        y, x = (fftrange(s, dtype=data.dtype) * dx for s in data.shape)

    r, p, polar = uniform_cart_to_polar(x, y, data)
    max_ = polar.max()
    if metric_name == 'fwhm':
        hm = max_ / 2
    elif metric_name == '1/e':
        hm = 1 / jnp.e * max_
    elif metric_name == '1/e^2':
        hm = 1 / (jnp.e ** 2) * max_
    elif isinstance(metric, numbers.Number):
        hm = metric
    else:
        raise ValueError('unknown metric, use fwhm, 1/e, or 1/e^2')
    if criteria not in ('first', 'last'):
        raise ValueError('unknown criteria, use first or last')

    above = polar > hm
    crossing = above[:, :-1] != above[:, 1:]        # (rows, nr-1)
    cols = jnp.arange(crossing.shape[1])
    big = crossing.shape[1] + 1
    if criteria == 'first':
        idx = jnp.min(jnp.where(crossing, cols, big), axis=1)
    else:
        idx = jnp.max(jnp.where(crossing, cols, -1), axis=1)
    has = jnp.any(crossing, axis=1)
    idx_safe = jnp.clip(idx, 0, crossing.shape[1] - 1)
    rows = jnp.arange(polar.shape[0])
    y0 = polar[rows, idx_safe]
    y1 = polar[rows, idx_safe + 1]
    frac = jnp.where(y1 == y0, 0.0, (hm - y0) / jnp.where(y1 == y0, 1.0, y1 - y0))
    cross_r = r[idx_safe] + frac * (r[idx_safe + 1] - r[idx_safe])
    total = jnp.sum(jnp.where(has, cross_r, 0.0))
    count = jnp.sum(has)
    return total / count


def fwhm(data, dx=None, x=None, y=None, criteria='last'):
    """Full width at half maximum (2x the HWHM radius)."""
    return estimate_size(x=x, y=y, dx=dx, data=data, metric='fwhm', criteria=criteria) * 2


def one_over_e(data, dx=None, x=None, y=None, criteria='last'):
    """1/e diameter."""
    return estimate_size(x=x, y=y, dx=dx, data=data, metric='1/e', criteria=criteria) * 2


def one_over_e_sq(data, dx=None, x=None, y=None, criteria='last'):
    """1/e^2 diameter."""
    return estimate_size(x=x, y=y, dx=dx, data=data, metric='1/e^2', criteria=criteria) * 2


def centroid(data, dx=None, unit='spatial'):
    """Centroid of the data; 'pixels' corner-indexed or 'spatial' center-indexed."""
    ny, nx = data.shape
    total = jnp.sum(data)
    rows = jnp.arange(ny, dtype=data.dtype)
    cols = jnp.arange(nx, dtype=data.dtype)
    com_y = jnp.sum(data.sum(axis=1) * rows) / total
    com_x = jnp.sum(data.sum(axis=0) * cols) / total
    if unit != 'spatial':
        return com_y, com_x
    cy, cx = ny // 2, nx // 2
    return dx * (com_y - cy), dx * (com_x - cx)


def autocrop(data, px):
    """Crop a px-wide window around the centroid (host-side index math)."""
    com = centroid(data, unit='pixels')
    cy, cx = (int(c) for c in com)
    w = px // 2
    aoi_y_l = cy - w
    aoi_y_h = aoi_y_l + px
    aoi_x_l = cx - w
    aoi_x_h = aoi_x_l + px
    pad_y = (max(0, -aoi_y_l), max(0, aoi_y_h - data.shape[0]))
    pad_x = (max(0, -aoi_x_l), max(0, aoi_x_h - data.shape[1]))
    if any(pad_y) or any(pad_x):
        data = jnp.pad(data, (pad_y, pad_x))
        aoi_y_l += pad_y[0]
        aoi_y_h += pad_y[0]
        aoi_x_l += pad_x[0]
        aoi_x_h += pad_x[0]
    return data[aoi_y_l:aoi_y_h, aoi_x_l:aoi_x_h]


def airydisk(unit_r, fno, wavelength):
    """Airy pattern intensity over radial coordinate in um."""
    return jnp.abs(airydisk_efield(unit_r, fno, wavelength)) ** 2


def airydisk_efield(unit_r, fno, wavelength):
    """Airy pattern complex E-field: 2 jinc(pi r / (wvl fno))."""
    u_eff = unit_r * jnp.pi / wavelength / fno
    return 2 * jinc(u_eff)


def airydisk_ft(r, fno, wavelength):
    """Fourier transform of the Airy disk (the diffraction-limited MTF cone)."""
    extinction = 1 / (wavelength * fno)
    s = jnp.minimum(jnp.abs(r) / extinction, 1)
    return (2 / jnp.pi) * (jnp.arccos(s) - s * jnp.sqrt(1 - s ** 2))
