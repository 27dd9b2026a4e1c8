"""Shack-Hartmann lenslet-array phase screens.

Rebuild of ``prysm/x/shack_hartmann.py``: per-lenslet quadratic phases are
accumulated into static windows with immutable scatter-adds; the lenslet
double loop unrolls at trace time (lenslet counts are static).
"""
import inspect
from math import ceil

import jax.numpy as jnp

from ..coordinates import make_xy_grid
from ..segmented import _local_window
from ..geometry import rectangle
from ..mathops import is_odd, cis


def shack_hartmann(pitch, n, efl, wavelength, x, y,
                   aperture=rectangle, aperture_kwargs=None, shift=False):
    """Complex screen for a Shack-Hartmann lenslet array.

    See the reference docstring (prysm/x/shack_hartmann.py:11-70) for the
    parameter semantics and sampling constraints.
    """
    if not hasattr(n, '__iter__'):
        n = (n, n)
    if aperture_kwargs is None:
        aperture_kwargs = {}

    sig = inspect.signature(aperture)
    params = sig.parameters
    callxy = 'x' in params and 'y' in params

    dx = float(x[0, 1] - x[0, 0])
    samples_per_lenslet = int(pitch / dx + 1)

    xc, yc = make_xy_grid(n, dx=pitch, grid=False)
    import numpy as onp
    xc = onp.asarray(xc)
    yc = onp.asarray(yc).ravel()
    if shift:
        if not is_odd(n[0]):
            xc = xc + (pitch / 2)
        if not is_odd(n[1]):
            yc = yc + (pitch / 2)

    cx = ceil(x.shape[1] / 2)
    cy = ceil(y.shape[0] / 2)
    lenslet_rsq = (pitch / 2) ** 2
    total_phase = jnp.zeros_like(x)

    for yy in yc:
        for xx in xc:
            win = _local_window(cy, cx, (xx, yy), dx, samples_per_lenslet, x, y)
            lx = x[win] - xx
            ly = y[win] - yy
            rsq = lx * lx + ly * ly
            phase = rsq / (2 * efl)
            if callxy:
                phase = phase * aperture(pitch / 2, x=lx, y=ly, **aperture_kwargs)
            else:
                phase = phase * aperture(lenslet_rsq, r=rsq, **aperture_kwargs)
            total_phase = total_phase.at[win].add(phase)

    prefix = -2 * jnp.pi / (wavelength / 1e3)
    return cis(prefix * total_phase)
