"""Rugate and inhomogeneous-index coating synthesis.

Rebuild of ``prysm/x/coatings/rugate.py``: profile discretization,
sinusoidal notch rugates with apodization, and Fourier synthesis of an
index profile from a target reflectance spectrum.
"""
import numpy as onp

from ...conf import config
from .stack import Stack


def quintic_taper(edge_fraction=0.5):
    """Amplitude window w(u) ramping with a quintic smoothstep at both ends."""
    e = float(edge_fraction)

    def smoothstep(t):
        t = onp.clip(t, 0.0, 1.0)
        return t * t * t * (10 - 15 * t + 6 * t * t)

    def window(u):
        u = onp.asarray(u, dtype=config.precision)
        if e <= 0:
            return onp.ones_like(u)
        rising = smoothstep(u / e)
        falling = smoothstep((1.0 - u) / e)
        return onp.minimum(rising, falling)

    return window


def discretize_profile(n_of_z, total_thickness, n_sublayers, substrate_index,
                       ambient_index=1.0):
    """Sample a continuous index profile into a Stack of thin sublayers."""
    edges = onp.linspace(0.0, total_thickness, n_sublayers + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    indices = [n_of_z(float(z)) for z in centers]
    thicknesses = onp.full(n_sublayers, total_thickness / n_sublayers,
                           dtype=config.precision)
    return Stack(indices, thicknesses, substrate_index, ambient_index)


def rugate_period(n_avg, design_wvl):
    """Physical period for a first-order rugate notch at design_wvl."""
    return design_wvl / (2.0 * n_avg)


def notch_wavelength(n_avg, period):
    """First-order notch wavelength of a rugate of given period."""
    return 2.0 * n_avg * period


def sinusoidal_rugate(n_avg, n_amp, design_wvl, n_periods, *,
                      sublayers_per_period=30, substrate_index=None,
                      ambient_index=1.0, apodization=None, clamp=None):
    """Sinusoidal rugate stack with a first-order notch at design_wvl."""
    Lambda = rugate_period(n_avg, design_wvl)
    total = n_periods * Lambda
    if substrate_index is None:
        substrate_index = n_avg
    win = apodization

    def n_of_z(z):
        amp = n_amp
        if win is not None:
            amp = n_amp * float(win(z / total))
        n = n_avg + amp * onp.sin(2 * onp.pi * z / Lambda)
        if clamp is not None:
            n = onp.clip(n, clamp[0], clamp[1])
        return n

    n_sub = int(round(n_periods * sublayers_per_period))
    return discretize_profile(n_of_z, total, n_sub, substrate_index,
                              ambient_index)


def apodize(n_of_z, n_avg, total_thickness, window):
    """Wrap a profile so its modulation about n_avg is amplitude-tapered."""
    def tapered(z):
        return n_avg + float(window(z / total_thickness)) * (n_of_z(z) - n_avg)

    return tapered


def rugate_from_target(wavenumbers, target_amplitude, n_avg,
                       total_optical_thickness, n_sublayers, *,
                       substrate_index=None, ambient_index=1.0, clamp=None):
    """Fourier-synthesize an index profile from a target r(k) spectrum.

    Q(x) = (1/pi) Re int r(k) exp(2 i k x) dk drives d(ln n)/dx; optical
    thickness is then mapped to physical depth via dz = dx / n.
    """
    k = onp.asarray(wavenumbers, dtype=config.precision)
    r = onp.asarray(target_amplitude, dtype=config.precision)
    dk = k[1] - k[0]

    x = onp.linspace(0.0, total_optical_thickness,
                     max(n_sublayers * 4, 2000))
    phase = onp.exp(2j * onp.outer(x, k))
    Q = (1.0 / onp.pi) * onp.real((r[None, :] * phase).sum(axis=1)) * dk
    ln_n = onp.log(n_avg) + 2.0 * onp.cumsum(Q) * (x[1] - x[0])
    n_x = onp.exp(ln_n)
    if clamp is not None:
        n_x = onp.clip(n_x, clamp[0], clamp[1])

    dz = (x[1] - x[0]) / n_x
    z = onp.concatenate([onp.zeros(1), onp.cumsum(dz[:-1])])
    total_z = float(z[-1])

    def n_of_z(zz):
        return float(onp.interp(zz, z, n_x))

    if substrate_index is None:
        substrate_index = n_avg
    return discretize_profile(n_of_z, total_z, n_sublayers, substrate_index,
                              ambient_index)


__all__ = [
    'quintic_taper',
    'discretize_profile',
    'rugate_period',
    'notch_wavelength',
    'sinusoidal_rugate',
    'apodize',
    'rugate_from_target',
]
