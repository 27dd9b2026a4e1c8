"""MTF/PTF/OTF calculations from PSFs, plus atmospheric OTF analytics.

Rebuild of ``prysm/otf.py``.  The forward paths are pure jnp — ``jax.grad``
differentiates through the center normalization automatically — and the
explicit ``*_adjoint`` functions mirror the reference's hand-derived
adjoints (including the center-normalization coupling term,
prysm/otf.py:205-316), which serve as correctness oracles for autodiff.
All transforms are batch-aware over leading axes.
"""
import numbers
import math

import jax.numpy as jnp

from .mathops import _j1
from .coordinates import make_xy_grid
from ._richdata import RichData

_AX = (-2, -1)


def _center(shape):
    """Pixel index of the (floor) center of a 2D array of given shape."""
    return tuple(int(math.floor(s / 2)) for s in shape[-2:])


def _unwrap_psf(psf, dx):
    """Resolve a PSF container-or-array to (array, dx)."""
    if not hasattr(psf, 'ndim'):
        dx = psf.dx
        psf = psf.data
    if dx is None:
        raise ValueError('dx is None: dx must be provided if psf is an array')
    return psf, dx


def transform_psf(psf, dx=None):
    """Transform a PSF to k-space: fftshift(fft2(ifftshift(psf)))."""
    psf, dx = _unwrap_psf(psf, dx)
    data = jnp.fft.fftshift(jnp.fft.fft2(jnp.fft.ifftshift(psf, axes=_AX), axes=_AX), axes=_AX)
    df = 1000 / (data.shape[-2] * dx)  # cy/um to cy/mm
    return data, df


def transform_psf_adjoint(data_bar):
    """Adjoint of transform_psf: unnormalized inverse transform.

    norm='forward' semantics via a host-float scale (jnp's norm kwarg does
    an eager integer reduce_prod, unsupported on some backends).
    """
    scale = data_bar.shape[-2] * data_bar.shape[-1]
    return jnp.fft.fftshift(
        jnp.fft.ifft2(jnp.fft.ifftshift(data_bar, axes=_AX), axes=_AX) * scale,
        axes=_AX)


def _normalized_transform(psf, dx):
    """Forward-transform a PSF and divide by its central value."""
    data, df = transform_psf(psf, dx)
    cy, cx = _center(data.shape)
    normalized = data / data[..., cy:cy + 1, cx:cx + 1]
    return normalized, data, df


def _mtf_magnitude_rfft(psf):
    """|fftshift(fft2(ifftshift(psf)))| for REAL psf via rfft2 + mirror.

    Hermitian symmetry |F(-k)| = |F(k)| rebuilds the full magnitude
    plane from the half-plane rfft2 — about half the FFT work of the
    complex transform, which matters because the MTF transform is one
    of the three FFT passes in the flagship gradient step.  Requires
    even trailing dims (callers fall back otherwise).
    """
    My, M = psf.shape[-2:]
    # no input ifftshift: for even dims it only flips signs per frequency
    # (F(ifftshift x) = (-1)^k F(x)), which the magnitude erases — one
    # full-size gather copy saved (r5)
    half = jnp.abs(jnp.fft.rfft2(psf, axes=_AX))         # (..., My, M//2+1)
    # assemble the fftshifted full plane DIRECTLY from the half plane
    # (no trailing full-size fftshift pass): shifted position (q, p) maps
    # to unshifted (ky, kx) = ((q + My/2) % My, p - M/2); for p < M/2 the
    # Hermitian mirror |F(ky, kx)| = |F(-ky % My, M - kx)| supplies it
    right = jnp.roll(half[..., :, :M // 2], -(My // 2), axis=-2)
    left = jnp.roll(jnp.flip(jnp.flip(half[..., :, 1:M // 2 + 1],
                                      axis=-1), axis=-2),
                    My // 2 + 1, axis=-2)
    return jnp.concatenate([left, right], axis=-1)


def mtf_from_psf(psf, dx=None, return_more=False):
    """MTF = |center-normalized transform of the PSF| as RichData."""
    unwrapped, dxv = _unwrap_psf(psf, dx)
    even = all(s % 2 == 0 for s in unwrapped.shape[-2:])
    if not return_more and even and unwrapped.dtype.kind == 'f':
        mag = _mtf_magnitude_rfft(unwrapped)
        cy, cx = _center(mag.shape)
        df = 1000 / (mag.shape[-2] * dxv)
        normalized = mag / mag[..., cy:cy + 1, cx:cx + 1]
        return RichData(data=normalized, dx=df, wavelength=None)
    normalized, data, df = _normalized_transform(psf, dx)
    rd = RichData(data=jnp.abs(normalized), dx=df, wavelength=None)
    if return_more:
        return rd, data
    return rd


def ptf_from_psf(psf, dx=None, return_more=False):
    """PTF = angle of the center-normalized transform of the PSF.

    Normalizing BEFORE taking the angle references the phase to the
    central value with the same wrap placement as the reference
    (otf.py:107-137); subtracting angles after conversion would wrap
    differently.
    """
    normalized, data, df = _normalized_transform(psf, dx)
    rd = RichData(data=jnp.angle(normalized), dx=df, wavelength=None)
    if return_more:
        return rd, data
    return rd


def otf_from_psf(psf, dx=None, return_more=False):
    """OTF = center-normalized complex transform of the PSF."""
    normalized, data, df = _normalized_transform(psf, dx)
    rd = RichData(data=normalized, dx=df, wavelength=None)
    if return_more:
        return rd, data
    return rd


def mtf_ptf_otf_from_psf(psf, dx=None, return_more=False):
    """(MTF, PTF, OTF) from one forward transform."""
    normalized, data, df = _normalized_transform(psf, dx)
    mtf = RichData(data=jnp.abs(normalized), dx=df, wavelength=None)
    ptf = RichData(data=jnp.angle(normalized), dx=df, wavelength=None)
    otf = RichData(data=normalized, dx=df, wavelength=None)
    if return_more:
        return mtf, ptf, otf, data
    return mtf, ptf, otf


def mtf_from_psf_adjoint(mtf_bar, psf=None, dx=None, data=None):
    """Adjoint of mtf_from_psf, including the center-normalization coupling."""
    if data is None:
        data, _ = transform_psf(psf, dx)
    cy, cx = _center(data.shape)
    mag = jnp.abs(data)
    a = mag[..., cy, cx]
    data_bar = mtf_bar * data / mag / a
    S = jnp.sum(mtf_bar * mag, axis=_AX)
    correction = S * data[..., cy, cx] / a ** 3
    data_bar = data_bar.at[..., cy, cx].add(-correction)
    return jnp.real(transform_psf_adjoint(data_bar))


def ptf_from_psf_adjoint(ptf_bar, psf=None, dx=None, data=None):
    """Adjoint of ptf_from_psf, including the center-phase reference term."""
    if data is None:
        data, _ = transform_psf(psf, dx)
    cy, cx = _center(data.shape)
    msq = data.real * data.real + data.imag * data.imag
    data_bar = ptf_bar * 1j * data / msq
    correction = jnp.sum(ptf_bar, axis=_AX) * 1j * data[..., cy, cx] / msq[..., cy, cx]
    data_bar = data_bar.at[..., cy, cx].add(-correction)
    return jnp.real(transform_psf_adjoint(data_bar))


def otf_from_psf_adjoint(otf_bar, psf=None, dx=None, data=None):
    """Adjoint of otf_from_psf, including the center-normalization coupling."""
    if data is None:
        data, _ = transform_psf(psf, dx)
    cy, cx = _center(data.shape)
    c = data[..., cy, cx]
    cc = jnp.conj(c)
    data_bar = otf_bar / cc
    correction = jnp.sum(jnp.conj(data) * otf_bar, axis=_AX) / cc ** 2
    data_bar = data_bar.at[..., cy, cx].add(-correction)
    return jnp.real(transform_psf_adjoint(data_bar))


# ---------------------------------------------------------------------------
# encircled energy (Baliga & Cohn MTF-Hankel method)
# ---------------------------------------------------------------------------

def _encircled_energy_geometry(shape, df):
    """Radial frequency grid (zero bin nudged) and frequency cell deltas."""
    nx, ny = make_xy_grid(shape[-2:], dx=df)
    nu_p = jnp.hypot(nx, ny)
    nu_p = jnp.where(nu_p == 0, 1e-16, nu_p)
    dnx = ny[1, 0] - ny[0, 0]
    dny = nx[0, 1] - nx[0, 0]
    return nu_p, dnx, dny


def _encircled_energy_core(mtf_data, radius, nu_p, dx, dy):
    """EE(radius) = radius * sum(MTF * J1(2 pi radius nu)/nu) * dx * dy."""
    integration_fourier = _j1(2 * jnp.pi * radius * nu_p) / nu_p
    dat = mtf_data * integration_fourier
    return radius * jnp.sum(dat, axis=_AX) * dx * dy


def _encircled_energy_rfft(psf, dxv, radii):
    """EE via the rfft2 half plane: no mirror, no fftshift, half the sums.

    The Baliga-Cohn weight J1(2 pi r nu)/nu is even in both frequency
    axes, so the full-plane sum equals the half-plane sum with the
    interior kx columns double-counted (|F(-k)| = |F(k)| for a real
    PSF).  The weight grids are static geometry XLA hoists out of
    loops; the runtime work is one rfft2, one multiply, one half-plane
    reduction.  Requires even trailing dims (callers gate on that).
    """
    Ny, Nx = psf.shape[-2:]
    # input ifftshift dropped: sign flips only under the magnitude (see
    # _mtf_magnitude_rfft)
    half = jnp.abs(jnp.fft.rfft2(psf, axes=_AX))       # (..., Ny, Nx//2+1)
    df = 1000 / (Ny * dxv)
    ky = jnp.arange(Ny)
    fy = jnp.where(ky <= Ny // 2, ky, ky - Ny) * df
    fx = jnp.arange(Nx // 2 + 1) * df
    nu = jnp.hypot(fy[:, None], fx[None, :])
    nu = jnp.where(nu == 0, 1e-16, nu)
    # interior kx columns stand in for their conjugate mirrors
    mult = jnp.ones(Nx // 2 + 1).at[1:Nx // 2].set(2.0)
    center = half[..., 0:1, 0:1]
    out = []
    for r in radii:
        ri = r / 1e3
        w = _j1(2 * jnp.pi * ri * nu) / nu * mult[None, :]
        ee = jnp.sum(half * w, axis=_AX) / center[..., 0, 0]
        out.append(ri * ee * df * df)
    return out


def encircled_energy(psf, dx, radius, return_more=False):
    """Encircled energy of a PSF at radius (um), Baliga-Cohn method."""
    radii = (radius,) if isinstance(radius, numbers.Number) else tuple(radius)
    unwrapped, dxv = _unwrap_psf(psf, dx)
    even = all(s % 2 == 0 for s in unwrapped.shape[-2:])
    if not return_more and even and unwrapped.dtype.kind == 'f':
        out = _encircled_energy_rfft(unwrapped, dxv, radii)
        return out[0] if isinstance(radius, numbers.Number) else jnp.stack(out)
    mtf, data = mtf_from_psf(psf, dx, return_more=True)
    nu_p, dnx, dny = _encircled_energy_geometry(mtf.shape, mtf.dx)
    if not isinstance(radius, numbers.Number):
        out = jnp.stack([_encircled_energy_core(mtf.data, r / 1e3, nu_p, dnx, dny)
                         for r in radius])
    else:
        out = _encircled_energy_core(mtf.data, radius / 1e3, nu_p, dnx, dny)
    if return_more:
        return out, data
    return out


def encircled_energy_adjoint(ee_bar, psf=None, dx=None, radius=None, data=None):
    """Adjoint of encircled_energy: fold per-radius gradients to the PSF."""
    if data is not None:
        shape = data.shape
        if dx is None:
            raise ValueError('dx is None: dx must be provided to set the frequency grid')
        dxv = dx
    else:
        arr, dxv = _unwrap_psf(psf, dx)
        shape = arr.shape
    df = 1000 / (shape[-2] * dxv)
    nu_p, dnx, dny = _encircled_energy_geometry(shape, df)
    if isinstance(radius, numbers.Number):
        radii = (radius,)
        ee_bar = (ee_bar,)
    else:
        radii = radius
    mtf_bar = 0.0
    for rb, r in zip(ee_bar, radii):
        ri = r / 1e3
        kernel = _j1(2 * jnp.pi * ri * nu_p) / nu_p
        mtf_bar = mtf_bar + rb * ri * kernel * dnx * dny
    return mtf_from_psf_adjoint(mtf_bar, psf=psf, dx=dx, data=data)


def analytical_encircled_energy_circular_aperture(fno, wavelength, points):
    """Analytical encircled energy of a diffraction-limited circular aperture.

    EE(r) = 1 - J0^2(pi r / (wvl fno)) - J1^2(pi r / (wvl fno)).
    """
    p = points * jnp.pi / fno / wavelength
    return 1 - _j0(p) ** 2 - _j1(p) ** 2


def _j0(x):
    """Bessel J0 via Abramowitz & Stegun rational approximations (jit-safe)."""
    x = jnp.asarray(x)
    ax = jnp.abs(x)
    y = x * x
    num_s = 57568490574.0 + y * (-13362590354.0 + y * (651619640.7 + y * (
        -11214424.18 + y * (77392.33017 + y * -184.9052456))))
    den_s = 57568490411.0 + y * (1029532985.0 + y * (9494680.718 + y * (
        59272.64853 + y * (267.8532712 + y))))
    small = num_s / den_s
    z = 8.0 / jnp.maximum(ax, 1e-30)
    yb = z * z
    xx = ax - 0.785398164
    p0 = 1.0 + yb * (-0.1098628627e-2 + yb * (0.2734510407e-4 + yb * (
        -0.2073370639e-5 + yb * 0.2093887211e-6)))
    p1 = -0.1562499995e-1 + yb * (0.1430488765e-3 + yb * (-0.6911147651e-5 + yb * (
        0.7621095161e-6 + yb * -0.934935152e-7)))
    big = jnp.sqrt(0.636619772 / jnp.maximum(ax, 1e-30)) * (
        jnp.cos(xx) * p0 - z * jnp.sin(xx) * p1)
    return jnp.where(ax < 8.0, small, big)


def diffraction_limited_mtf(fno, wavelength, frequencies=None, samples=128):
    """Diffraction limited MTF for a circular pupil.

    Returns (frequencies, mtf) if frequencies is None, else just the MTF at
    the given frequencies (cy/mm).
    """
    extinction = 1 / (wavelength / 1000 * fno)
    if frequencies is None:
        normalized_frequency = jnp.linspace(0, 1, samples)
    else:
        normalized_frequency = jnp.abs(jnp.asarray(frequencies) / extinction)
        normalized_frequency = jnp.minimum(normalized_frequency, 1)
    mtf = _difflim_mtf_core(normalized_frequency)
    if frequencies is None:
        return normalized_frequency * extinction, mtf
    return mtf


def _difflim_mtf_core(normalized_frequency):
    """(2/pi)(arccos(nu) - nu sqrt(1 - nu^2))."""
    return (2 / jnp.pi) * (
        jnp.arccos(normalized_frequency)
        - normalized_frequency * jnp.sqrt(1 - normalized_frequency ** 2))


def longexposure_otf(nu, Cn, z, f, lambdabar, h_z_by_r=2.91):
    """Long exposure atmospheric OTF (Goodman, Statistical Optics 8.5-37/38)."""
    nu = nu / 1e3
    f = f / 1e3
    lambdabar = lambdabar / 1e6
    power = 5 / 3
    const1 = -jnp.pi ** 2 * 2 * h_z_by_r * Cn ** 2
    const2 = z * f ** power / (lambdabar ** 3)
    return jnp.exp(const1 * const2 * nu ** power)


def komogorov(r, r0):
    """Kolmogorov phase structure function D_phi = 6.88 (r/r0)^(5/3)."""
    return 6.88 * (r / r0) ** (5 / 3)


def estimate_Cn(P=1013, T=273.15, Ct=1e-4):
    """Estimate Cn from meteorological data (Weng et al)."""
    return (79 * P / (T ** 2)) * Ct ** 2 * 1e-12
