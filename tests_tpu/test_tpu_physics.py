"""Physics oracles on the real chip at f32.

The CPU suite proves these chains match reference prysm in f64; this
module proves the HARDWARE execution (f32, MXU matmuls, relay-fetched)
still meets the 0.1% analytic-oracle tier of the reference's own
physics tests (reference tests/test_physics.py:21-54) and the f32
bounds measured in tests/test_f32_tier.py.

Relay rules: every complex intermediate lives inside jit; only real
f32 arrays and scalars are fetched (complex64 device->host copies are
UNIMPLEMENTED through the axon relay).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
from prysm_tpu.geometry import circle, circle_sdf, antialias
from prysm_tpu.polynomials import zernike_nm, zernike_nm_seq, sum_of_2d_modes
from prysm_tpu.propagation import Wavefront
from prysm_tpu.propagation.fft import pupil_sample_to_psf_sample
from prysm_tpu.psf import airydisk
from prysm_tpu.otf import (
    mtf_from_psf,
    diffraction_limited_mtf,
    encircled_energy,
    analytical_encircled_energy_circular_aperture,
)
from prysm_tpu._richdata import RichData

pytestmark = pytest.mark.tpu

PRECISION = 1e-3  # the reference's ~0.1% analytic-oracle tier

TEST_PARAMETERS = [
    (10.0, 1.000, 0.5),
    (10.0, 1.000, 1.0),
    (3.00, 1.125, 3.0)]


@pytest.mark.parametrize('efl, epd, wvl', TEST_PARAMETERS)
def test_diffprop_matches_airydisk_on_chip(efl, epd, wvl):
    fno = efl / epd
    N, Q = 128, 3
    x, y = make_xy_grid(N, diameter=epd)
    dx = float(x[0, 1] - x[0, 0])
    r, t = cart_to_polar(x, y)
    amp = circle(epd / 2, r).astype(jnp.float32)
    scale = float(3 * np.sqrt(amp.size) / float(amp.sum()))

    @jax.jit
    def chain(amp):
        wf = Wavefront.from_amp_and_phase(amp, None, wvl, dx).pad2d(Q=Q)
        wf = wf * scale
        return wf.focus(efl, Q=1).intensity.data

    data = np.asarray(chain(amp), dtype=np.float64)
    psf_dx = pupil_sample_to_psf_sample(dx, N * Q, wvl, efl)
    s = RichData(data, psf_dx, wvl).slices()
    u_, sx = s.x
    _, sy = s.y
    analytic = np.asarray(airydisk(jnp.asarray(np.asarray(u_),
                                               jnp.float32), fno, wvl))
    assert np.allclose(np.asarray(sx), analytic, atol=PRECISION)
    assert np.allclose(np.asarray(sy), analytic, atol=PRECISION)


@pytest.mark.parametrize('efl, epd, wvl', TEST_PARAMETERS)
def test_diffprop_matches_analytic_mtf_on_chip(efl, epd, wvl):
    fno = efl / epd
    N, Q = 128, 3
    x, y = make_xy_grid(N, diameter=epd)
    dx = float(x[0, 1] - x[0, 0])
    r, t = cart_to_polar(x, y)
    amp = circle(epd / 2, r).astype(jnp.float32)

    @jax.jit
    def chain(amp):
        wf = Wavefront.from_amp_and_phase(amp, None, wvl, dx)
        psf = wf.focus(efl, Q=Q).intensity
        return mtf_from_psf(psf.data, psf.dx).data

    data = np.asarray(chain(amp), dtype=np.float64)
    psf_dx = pupil_sample_to_psf_sample(dx, N * Q, wvl, efl)
    df = 1000 / (N * Q * psf_dx)
    s = RichData(data, df, None).slices()
    u_, sx = s.x
    _, sy = s.y
    analytic = diffraction_limited_mtf(fno, wvl, frequencies=np.asarray(u_))
    assert np.allclose(np.asarray(analytic), np.asarray(sx), atol=PRECISION)
    assert np.allclose(np.asarray(analytic), np.asarray(sy), atol=PRECISION)


def test_tilt_moves_psf_plus_y_on_chip():
    N, Q = 128, 3
    x, y = make_xy_grid(N, diameter=2.1)
    dx = float(x[0, 1] - x[0, 0])
    r, t = cart_to_polar(x, y)
    amp = circle(1, r).astype(jnp.float32)

    @jax.jit
    def chain(amp, y):
        wf = Wavefront.from_amp_and_phase(amp, 1000 * y, 0.5, dx)
        return wf.focus(1, Q=Q).intensity.data

    data = np.asarray(chain(amp, y))
    idx_y, idx_x = np.unravel_index(data.argmax(), data.shape)
    assert idx_x == (N * Q) // 2
    assert idx_y > (N * Q) // 2


@pytest.mark.parametrize('Q', [2, 3, 4])
def test_focus_energy_conservation_on_chip(Q, pupil256):
    *_, amp, dx = pupil256

    @jax.jit
    def energies(amp):
        wf = Wavefront.from_amp_and_phase(amp, None, 0.55, dx)
        E_pupil = jnp.sum(jnp.abs(wf.data) ** 2)
        E_psf = jnp.sum(wf.focus(10.0, Q=Q).intensity.data)
        return E_pupil, E_psf

    E_pupil, E_psf = energies(amp)
    # f32 Parseval over 256^2*Q^2 terms: 1e-4 relative
    assert float(E_psf) == pytest.approx(float(E_pupil), rel=1e-4)


def test_defocus_sign_symmetry_on_chip(pupil256):
    _, _, r, t, amp, dx = pupil256
    z20 = zernike_nm(2, 0, r, t)

    @jax.jit
    def psf(amp, opd):
        wf = Wavefront.from_amp_and_phase(amp, opd, 0.55, dx)
        return wf.focus(10.0, Q=2).intensity.data

    I_plus = np.asarray(psf(amp, 50.0 * z20), dtype=np.float64)
    I_minus = np.asarray(psf(amp, -50.0 * z20), dtype=np.float64)
    assert np.abs(I_plus - I_minus).max() / I_plus.max() < 1e-5


def test_mtf_cutoff_frequency_on_chip():
    N, efl, epd, wvl = 256, 100.0, 25.0, 0.55
    Q = 2
    x, y = make_xy_grid(N, diameter=epd * 1.1)
    dx = epd * 1.1 / N
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(epd / 2, r), dx)

    @jax.jit
    def chain(amp):
        wf = Wavefront.from_amp_and_phase(amp, None, wvl, dx)
        psf = wf.focus(efl, Q=Q).intensity
        return mtf_from_psf(psf.data, psf.dx).data

    vals2d = np.asarray(chain(amp), dtype=np.float64)
    psf_dx = pupil_sample_to_psf_sample(dx, N * Q, wvl, efl)
    df = 1000 / (N * Q * psf_dx)            # cy/mm per sample
    fno = efl / epd
    cutoff_cy_um = 1.0 / (wvl * fno)
    c = vals2d.shape[0] // 2
    freqs = (np.arange(vals2d.shape[1]) - c) * df / 1000.0  # cy/um
    vals = vals2d[c]
    beyond = vals[freqs > cutoff_cy_um * 1.05]
    assert beyond.size and np.abs(beyond).max() < 1e-3


def test_encircled_energy_matches_analytic_on_chip():
    N, efl, epd, wvl = 256, 10.0, 1.0, 0.5
    Q = 3
    fno = efl / epd
    x, y = make_xy_grid(N, diameter=epd * 1.1)
    dx = epd * 1.1 / N
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(epd / 2, r), dx)

    @jax.jit
    def chain(amp):
        wf = Wavefront.from_amp_and_phase(amp, None, wvl, dx)
        return wf.focus(efl, Q=Q).intensity.data

    I_dev = chain(amp)
    pdx = pupil_sample_to_psf_sample(dx, N * Q, wvl, efl)
    pts = np.asarray([4.0, 8.0])

    def ee(radius):
        return float(jax.jit(
            lambda I: encircled_energy(I, pdx, radius))(I_dev))

    numeric = np.asarray([ee(p) for p in pts])
    total = ee(60.0)
    analytic = np.asarray(
        analytical_encircled_energy_circular_aperture(fno, wvl, pts))
    np.testing.assert_allclose(numeric / total, analytic, rtol=2e-2)


def test_psf_peak_strehl_with_aberration_on_chip(pupil256):
    """50 nm rms of balanced spherical drops the peak by the Marechal
    estimate exp(-(2 pi W / wvl)^2) within 10% relative, at f32."""
    _, _, r, t, amp, dx = pupil256
    wvl = 0.55
    rms_nm = 50.0

    @jax.jit
    def peaks(amp, r, t):
        modes = zernike_nm_seq([(4, 0)], r, t)
        opd = sum_of_2d_modes(
            modes, jnp.asarray([rms_nm], dtype=jnp.float32))
        wf0 = Wavefront.from_amp_and_phase(amp, None, wvl, dx)
        wf1 = Wavefront.from_amp_and_phase(amp, opd, wvl, dx)
        I0 = jnp.max(wf0.focus(10.0, Q=2).intensity.data)
        I1 = jnp.max(wf1.focus(10.0, Q=2).intensity.data)
        return I0, I1

    I0, I1 = peaks(amp, r, t)
    strehl = float(I1) / float(I0)
    marechal = float(np.exp(-(2 * np.pi * rms_nm * 1e-3 / wvl) ** 2))
    assert strehl == pytest.approx(marechal, rel=0.1)
