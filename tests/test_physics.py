"""Physics-oracle tests: diffraction vs closed-form solutions.

Mirrors the reference test strategy (tests/test_physics.py:12-76): numerical
propagation must match the Airy disk and the analytic diffraction-limited
MTF to ~0.1%, and array orientation conventions are pinned by a +y tilt
moving the PSF in +y.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
from prysm_tpu.geometry import circle, circle_sdf, antialias
from prysm_tpu.polynomials import zernike_nm
from prysm_tpu.propagation import Wavefront
from prysm_tpu.psf import airydisk
from prysm_tpu.otf import diffraction_limited_mtf, mtf_from_psf

PRECISION = 1e-3  # ~0.1%

TEST_PARAMETERS = [
    (10.0, 1.000, 0.5),   # f/10, visible light
    (10.0, 1.000, 1.0),   # f/10, SWIR light
    (3.00, 1.125, 3.0)]   # f/2.667, MWIR light


@pytest.mark.parametrize('efl, epd, wvl', TEST_PARAMETERS)
def test_diffprop_matches_airydisk(efl, epd, wvl):
    fno = efl / epd
    x, y = make_xy_grid(128, diameter=epd)
    r, t = cart_to_polar(x, y)
    amp = circle(epd / 2, r).astype(float)
    wf = Wavefront.from_amp_and_phase(amp, None, wvl, float(x[0, 1] - x[0, 0])).pad2d(Q=3)
    wf = wf * float(3 * np.sqrt(amp.size) / amp.sum())
    psf = wf.focus(efl, Q=1)
    s = psf.intensity.slices()
    u_, sx = s.x
    _, sy = s.y
    analytic = airydisk(u_, fno, wvl)
    assert np.allclose(np.asarray(sx), np.asarray(analytic), atol=PRECISION)
    assert np.allclose(np.asarray(sy), np.asarray(analytic), atol=PRECISION)


@pytest.mark.parametrize('efl, epd, wvl', TEST_PARAMETERS)
def test_diffprop_matches_analyticmtf(efl, epd, wvl):
    fno = efl / epd
    x, y = make_xy_grid(128, diameter=epd)
    r, t = cart_to_polar(x, y)
    amp = circle(epd / 2, r).astype(float)
    wf = Wavefront.from_amp_and_phase(amp, None, wvl, float(x[0, 1] - x[0, 0]))
    psf = wf.focus(efl, Q=3).intensity
    mtf = mtf_from_psf(psf.data, psf.dx)
    s = mtf.slices()
    u_, sx = s.x
    _, sy = s.y
    analytic = diffraction_limited_mtf(fno, wvl, frequencies=np.asarray(u_))
    assert np.allclose(np.asarray(analytic), np.asarray(sx), atol=PRECISION)
    assert np.allclose(np.asarray(analytic), np.asarray(sy), atol=PRECISION)


def test_array_orientation_consistency_tilt():
    """+y pupil tilt must move the PSF in +y (row index > center)."""
    N = 128
    wvl = .5
    Q = 3
    x, y = make_xy_grid(N, diameter=2.1)
    r, t = cart_to_polar(x, y)
    amp = circle(1, r).astype(float)
    phs = 1000 * y
    wf = Wavefront.from_amp_and_phase(amp, phs, wvl, float(x[0, 1] - x[0, 0]))
    psf = wf.focus(1, Q=Q).intensity
    data = np.asarray(psf.data)
    idx_y, idx_x = np.unravel_index(data.argmax(), data.shape)
    assert idx_x == (N * Q) // 2
    assert idx_y > (N * Q) // 2


@pytest.mark.parametrize('fno, wvl', [(1, .5), (8, 10)])
def test_airydisk_has_unit_peak(fno, wvl):
    assert float(airydisk(jnp.asarray(0.0), fno=fno, wavelength=wvl)) == pytest.approx(1, abs=1e-9)


@pytest.mark.parametrize('Q', [2, 3, 4])
def test_psf_energy_conservation_unitary_focus(Q):
    """Parseval: the ortho-normalized focus conserves total energy for
    any padding factor (pruned and dense paths alike)."""
    N = 128
    x, y = make_xy_grid(N, diameter=2.0)
    dx = 2.0 / N
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(0.8, r), dx)
    wf = Wavefront.from_amp_and_phase(amp, None, 0.55, dx)
    E_pupil = float(jnp.sum(jnp.abs(wf.data) ** 2))
    E_psf = float(jnp.sum(wf.focus(10.0, Q=Q).intensity.data))
    assert E_psf == pytest.approx(E_pupil, rel=1e-5)


def test_defocus_symmetry_of_psf():
    """+/- defocus give identical PSFs for a symmetric pupil (intensity
    is blind to the conjugate phase)."""
    N = 128
    x, y = make_xy_grid(N, diameter=2.0)
    dx = 2.0 / N
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(0.8, r), dx)
    z20 = zernike_nm(2, 0, r, t)
    for sign in (+1.0, -1.0):
        wf = Wavefront.from_amp_and_phase(amp, sign * 50.0 * z20, 0.55, dx)
        I = wf.focus(10.0, Q=2).intensity.data
        if sign > 0:
            I_plus = I
    np.testing.assert_allclose(np.asarray(I), np.asarray(I_plus),
                               rtol=1e-5, atol=1e-8)


def test_mtf_cutoff_frequency():
    """The diffraction MTF hits zero at 1/(wvl*fno) cycles/um."""
    from prysm_tpu.otf import mtf_from_psf
    N, efl, epd, wvl = 256, 100.0, 25.0, 0.55
    x, y = make_xy_grid(N, diameter=epd * 1.1)
    dx = epd * 1.1 / N
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(epd / 2, r), dx)
    wf = Wavefront.from_amp_and_phase(amp, None, wvl, dx)
    psf = wf.focus(efl, Q=2).intensity
    mtf = mtf_from_psf(psf.data, psf.dx)
    fno = efl / epd
    cutoff_cy_um = 1.0 / (wvl * fno)          # incoherent cutoff
    c = mtf.shape[0] // 2
    freqs = np.asarray(mtf.x)[c] / 1000.0     # cy/mm -> cy/um
    vals = np.asarray(mtf.data)[c]
    beyond = vals[freqs > cutoff_cy_um * 1.05]
    assert beyond.size and np.abs(beyond).max() < 1e-3
