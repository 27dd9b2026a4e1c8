"""Lyot-family coronagraph propagation: FPM round trips, Babinet, vortex.

Rebuild of ``prysm/propagation/coronagraph.py``.  All forward paths are pure
jnp compositions — ``jax.grad`` differentiates them end-to-end, including
through the multi-resolution stack — while explicit ``*_adjoint`` twins
mirror the reference API for hand-chained gradient pipelines.  The
multi-resolution level loop unrolls at trace time; each level is independent
until the final sum, so the levels shard cleanly over a mesh axis.
"""
import numbers

import numpy as np

import functools
import operator

import jax.numpy as jnp

from .dft import focus_dft, focus_dft_adjoint, unfocus_dft, unfocus_dft_adjoint
from ..coordinates import _bilinear_lookup
from ..mathops import cis


def _adjoint_multiply(grad, factor, real=False):
    """Adjoint with respect to x for y = x * factor."""
    if jnp.iscomplexobj(factor):
        out = grad * jnp.conj(factor)
    else:
        out = grad * factor
    if real:
        return jnp.real(out)
    return out


def to_fpm_and_back(wavefunction, fpm, executor, return_more=False):
    """focus_dft -> multiply by fpm -> unfocus_dft, one executor both legs."""
    field_at_fpm = focus_dft(wavefunction, executor)
    field_after_fpm = field_at_fpm * fpm
    field_at_next_pupil = unfocus_dft(field_after_fpm, executor)
    if return_more:
        return field_at_next_pupil, field_at_fpm, field_after_fpm
    return field_at_next_pupil


def to_fpm_and_back_adjoint(wavefunction, fpm, executor, return_more=False,
                            return_fpm_grad=False, field_at_fpm=None):
    """Adjoint of to_fpm_and_back; optionally also the FPM gradient."""
    if return_fpm_grad and field_at_fpm is None:
        raise ValueError('return_fpm_grad=True requires field_at_fpm from the forward propagation')
    fpm_is_complex = jnp.iscomplexobj(fpm)
    Ebbar = unfocus_dft_adjoint(wavefunction, executor)
    intermediate = _adjoint_multiply(Ebbar, fpm)
    Eabar = focus_dft_adjoint(intermediate, executor)
    if return_fpm_grad:
        fpm_bar = _adjoint_multiply(Ebbar, field_at_fpm, real=not fpm_is_complex)
    if return_more:
        if return_fpm_grad:
            return Eabar, Ebbar, intermediate, fpm_bar
        return Eabar, Ebbar, intermediate
    elif return_fpm_grad:
        return Eabar, fpm_bar
    return Eabar


def vortex_phase_mask(charge):
    """Focal-plane-mask callable exp(i * charge * theta) for an optical vortex.

    Pass to to_fpm_and_back_multiresolution, whose per-level grids resolve
    the on-axis phase singularity.
    """
    if not isinstance(charge, numbers.Integral):
        raise TypeError(f'charge must be an integer, got {charge!r}; '
                        'non-integer charge has a branch cut at theta=pi')

    def fpm(xf, yf):
        xp = np if isinstance(xf, np.ndarray) else jnp
        return cis(charge * xp.arctan2(yf, xf))

    return fpm


def prepare_measured_fpm(measurement, dx, center=(0, 0), charge=None, fill=None):
    """Wrap a measured complex focal-plane-mask map as an fpm callable.

    Bilinearly interpolates the measured complex transmission at requested
    focal coordinates; outside the measured extent falls back to an ideal
    vortex (if charge given), a scalar, or a callable fill.  The measurement
    is centered per the make_xy_grid / fftrange convention (array index
    n // 2 maps to `center`).
    """
    meas = np.asarray(measurement)   # host-side: no eager complex transfer
    ny, nx = meas.shape
    cx, cy = center
    re = np.ascontiguousarray(meas.real)
    im = np.ascontiguousarray(meas.imag)
    if fill is None:
        fill = vortex_phase_mask(charge) if charge is not None else 1.0
    fill_is_callable = callable(fill)

    def _np_bilinear(img, rows, cols):
        r0 = np.floor(rows).astype(np.int64)
        c0 = np.floor(cols).astype(np.int64)
        fr = rows - r0
        fc = cols - c0
        gather = lambda ri, ci: img[np.clip(ri, 0, ny - 1),  # NOQA
                                    np.clip(ci, 0, nx - 1)]
        v00, v01 = gather(r0, c0), gather(r0, c0 + 1)
        v10, v11 = gather(r0 + 1, c0), gather(r0 + 1, c0 + 1)
        top = v00 * (1 - fc) + v01 * fc
        bot = v10 * (1 - fc) + v11 * fc
        return top * (1 - fr) + bot * fr

    def fpm(xf, yf):
        host = isinstance(xf, np.ndarray)
        xp = np if host else jnp
        col = (xf - cx) / dx + nx // 2
        row = (yf - cy) / dx + ny // 2
        # clamp to the border (mode='nearest'); the inside test gates fill
        rowc = xp.clip(row, 0, ny - 1)
        colc = xp.clip(col, 0, nx - 1)
        if host:
            ri = _np_bilinear(re, rowc, colc)
            ii = _np_bilinear(im, rowc, colc)
        else:
            ri = _bilinear_lookup(re, rowc, colc)
            ii = _bilinear_lookup(im, rowc, colc)
        interp = ri + 1j * ii
        inside = (row >= 0) & (row <= ny - 1) & (col >= 0) & (col <= nx - 1)
        fillv = fill(xf, yf) if fill_is_callable else fill
        return xp.where(inside, interp, fillv)

    return fpm


def _mr_levels(executor):
    """Per-level (executor, window, xf, yf) tuples of a multiresolution stack."""
    return zip(executor.executors, executor.windows, executor.xf, executor.yf)


def to_fpm_and_back_multiresolution(wavefunction, fpm, executor, return_more=False):
    """Multi-resolution to_fpm_and_back: sum of per-level windowed round trips.

    Each level forward-propagates to its focal grid, applies mask x
    partition-of-unity window, and inverse-propagates; the level sums
    reconstruct the full-bandwidth round trip (reference rationale:
    prysm/propagation/coronagraph.py:203-246).
    """
    at_fpm, after_fpm, contributions = [], [], []
    for ex, win, xf, yf in _mr_levels(executor):
        E_focus = focus_dft(wavefunction, ex)
        E_masked = E_focus * fpm(xf, yf) * win
        contributions.append(unfocus_dft(E_masked, ex))
        at_fpm.append(E_focus)
        after_fpm.append(E_masked)
    total = functools.reduce(operator.add, contributions)
    return (total, at_fpm, after_fpm) if return_more else total


def to_fpm_and_back_multiresolution_adjoint(wavefunction, fpm, executor,
                                            return_more=False,
                                            return_fpm_grad=False,
                                            field_at_fpm=None):
    """Adjoint of to_fpm_and_back_multiresolution."""
    if return_fpm_grad and field_at_fpm is None:
        raise ValueError('return_fpm_grad=True requires field_at_fpm from '
                         'the forward propagation')
    Ebbars, intermediates, fpm_bars, contributions = [], [], [], []
    for k, (ex, win, xf, yf) in enumerate(_mr_levels(executor)):
        mask = fpm(xf, yf)
        Ebbar = unfocus_dft_adjoint(wavefunction, ex)
        intermediate = _adjoint_multiply(Ebbar, mask * win)
        contributions.append(focus_dft_adjoint(intermediate, ex))
        Ebbars.append(Ebbar)
        intermediates.append(intermediate)
        if return_fpm_grad:
            fpm_bars.append(
                _adjoint_multiply(Ebbar, field_at_fpm[k] * win,
                                  real=not jnp.iscomplexobj(mask)))
    total = functools.reduce(operator.add, contributions)
    extras = ((Ebbars, intermediates) if return_more else ()) + \
        ((fpm_bars,) if return_fpm_grad else ())
    return (total, *extras) if extras else total


def babinet(wavefunction, lyot, fpm, executor, return_more=False):
    """Lyot coronagraph via Babinet's principle.

    fpm must approach 1 at the edge of the focal window so the complement
    1 - fpm is compactly supported (Soummer-style; see reference notes at
    prysm/propagation/coronagraph.py:308-359).
    """
    round_trip = to_fpm_and_back(wavefunction, fpm=1 - fpm,
                                 executor=executor, return_more=return_more)
    removed, *focal_fields = round_trip if return_more else (round_trip,)
    field_at_lyot = wavefunction - removed
    field_after_lyot = (field_at_lyot if lyot is None
                        else lyot * field_at_lyot)
    if return_more:
        return (field_after_lyot, *focal_fields, field_at_lyot)
    return field_after_lyot


def babinet_adjoint(wavefunction, lyot, fpm, executor, field_at_fpm=None,
                    field_at_lyot=None, return_fpm_grad=False,
                    return_lyot_grad=False):
    """Adjoint of babinet; optionally recovers lyot and fpm gradients."""
    if return_lyot_grad and field_at_lyot is None:
        raise ValueError('return_lyot_grad=True requires field_at_lyot from the forward propagation')
    lyot_is_complex = True if lyot is None else jnp.iscomplexobj(lyot)
    fpm = 1 - fpm
    dbar = wavefunction
    if lyot is not None:
        cbar = _adjoint_multiply(dbar, lyot)
    else:
        cbar = dbar
    if return_fpm_grad:
        abar, fpm_bar = to_fpm_and_back_adjoint(
            cbar, fpm=fpm, executor=executor,
            return_fpm_grad=True, field_at_fpm=field_at_fpm)
    else:
        abar = to_fpm_and_back_adjoint(cbar, fpm=fpm, executor=executor)
    abar = cbar - abar
    if not (return_fpm_grad or return_lyot_grad):
        return abar
    out = [abar]
    if return_fpm_grad:
        out.append(fpm_bar)
    if return_lyot_grad:
        out.append(_adjoint_multiply(dbar, field_at_lyot, real=not lyot_is_complex))
    return tuple(out)
