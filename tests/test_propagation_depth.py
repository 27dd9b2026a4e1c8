"""Propagation depth: port of the reference propagation suite's intent.

Behavior matrix of /root/reference/tests/test_propagation.py (39 tests):
sampling inversions, adjoint identities at the array and Wavefront
levels, executor equivalences (FFT vs MDFT vs FFTDFT), free-space
semantics, Wavefront arithmetic, FPM/babinet gradients against finite
differences, multi-resolution vortex nulling, and measured-mask
interpolation.
"""
import numpy as np
import pytest

import jax  # NOQA: F401
import jax.numpy as jnp

from prysm_tpu import propagation, coordinates, geometry, polynomials
from prysm_tpu.wavelengths import HeNe

SAMPLES = 32
RNG = np.random.default_rng


def _cplx(rng, shape):
    return rng.normal(size=shape) + 1j * rng.normal(size=shape)


def _real_vdot(a, b):
    return float(np.real(np.vdot(np.asarray(a), np.asarray(b))))


# ---------- sampling and reversibility --------------------------------------

@pytest.mark.parametrize('dzeta', [1 / 128.0, 1 / 256.0, 11.123 / 128.0,
                                   1e10 / 2048.0])
def test_psf_sample_inverts_pupil_sample(dzeta):
    samples, wvl, efl = 128, 0.55, 10
    psf_dx = propagation.pupil_sample_to_psf_sample(dzeta, samples, wvl, efl)
    back = propagation.psf_sample_to_pupil_sample(psf_dx, samples, wvl, efl)
    assert back == pytest.approx(dzeta, rel=1e-12)


def test_wavefront_focus_then_unfocus_reverses():
    z = RNG(0).random((128, 128)).astype(complex)
    wf = propagation.Wavefront(jnp.asarray(z), HeNe, 1.0, 'pupil')
    wf2 = wf.focus(1, Q=1).unfocus(1, Q=1)
    np.testing.assert_allclose(np.asarray(wf2.data), z, atol=1e-12)


# ---------- adjoint identities ----------------------------------------------

@pytest.mark.parametrize('Q', [1, 1.5, 2])
def test_focus_adjoint_identity(Q):
    rng = RNG(789)
    x = _cplx(rng, (9, 12))
    y = _cplx(rng, np.asarray(propagation.focus(x, Q=Q)).shape)
    lhs = np.vdot(np.asarray(propagation.focus(x, Q=Q)), y)
    rhs = np.vdot(x, np.asarray(propagation.focus_adjoint(y, Q=Q)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


@pytest.mark.parametrize('Q', [1, 1.5, 2])
def test_unfocus_adjoint_identity(Q):
    rng = RNG(987)
    x = _cplx(rng, (9, 12))
    y = _cplx(rng, np.asarray(propagation.unfocus(x, Q=Q)).shape)
    lhs = np.vdot(np.asarray(propagation.unfocus(x, Q=Q)), y)
    rhs = np.vdot(x, np.asarray(propagation.unfocus_adjoint(y, Q=Q)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_wavefront_focus_adjoint_metadata():
    rng = RNG(135)
    wf = propagation.Wavefront(jnp.asarray(_cplx(rng, (8, 8))), HeNe, 0.25,
                               'pupil')
    psf = wf.focus(10, Q=2)
    gd = _cplx(rng, np.asarray(psf.data).shape)
    grad = propagation.Wavefront(jnp.asarray(gd), HeNe, psf.dx, 'psf')
    back = grad.focus_adjoint(10, Q=2)
    np.testing.assert_allclose(np.asarray(back.data),
                               np.asarray(propagation.focus_adjoint(gd, Q=2)))
    assert back.data.shape == wf.data.shape
    assert back.dx == pytest.approx(wf.dx)
    assert back.space == 'pupil'


def test_wavefront_unfocus_adjoint_metadata():
    rng = RNG(246)
    wf = propagation.Wavefront(jnp.asarray(_cplx(rng, (8, 8))), HeNe, 0.1,
                               'psf')
    pupil = wf.unfocus(10, Q=2)
    gd = _cplx(rng, np.asarray(pupil.data).shape)
    grad = propagation.Wavefront(jnp.asarray(gd), HeNe, pupil.dx, 'pupil')
    back = grad.unfocus_adjoint(10, Q=2)
    np.testing.assert_allclose(
        np.asarray(back.data), np.asarray(propagation.unfocus_adjoint(gd, Q=2)))
    assert back.data.shape == wf.data.shape
    assert back.dx == pytest.approx(wf.dx)
    assert back.space == 'psf'


# ---------- executor equivalences -------------------------------------------

def test_wavefront_unfocus_fft_equals_mdft():
    z = RNG(1).random((128, 128))
    wf = propagation.Wavefront(jnp.asarray(z, dtype=complex), HeNe, 1.0, 'psf')
    via_fft = wf.unfocus(efl=1, Q=2)
    ex = wf.prepare_executor(1, via_fft.dx, np.asarray(via_fft.data).shape)
    via_mdft = wf.unfocus_dft(ex)
    np.testing.assert_allclose(np.asarray(via_fft.data),
                               np.asarray(via_mdft.data), atol=1e-9)


def test_wavefront_focus_fft_equals_mdft():
    z = RNG(2).random((SAMPLES, SAMPLES))
    wf = propagation.Wavefront(jnp.asarray(z, dtype=complex), HeNe, 1.0,
                               'pupil')
    via_fft = wf.focus(efl=1, Q=2)
    ex = wf.prepare_executor(1, via_fft.dx, np.asarray(via_fft.data).shape)
    via_mdft = wf.focus_dft(ex)
    np.testing.assert_allclose(np.asarray(via_fft.data),
                               np.asarray(via_mdft.data), atol=1e-9)


def test_prepare_executor_fftdft_matches_mdft_with_shift():
    rng = RNG(2468)
    pupil_dx, efl, fft_samples = 0.1, 10.0, 64
    focal_dx = HeNe * efl / (pupil_dx * fft_samples)
    shift = (0.25 * focal_dx, -0.5 * focal_dx)
    kw = dict(focal_shift=shift)
    fftdft = propagation.prepare_executor(pupil_dx, (32, 40), focal_dx,
                                          (48, 64), HeNe, efl, kind='fftdft',
                                          **kw)
    mdft = propagation.prepare_executor(pupil_dx, (32, 40), focal_dx,
                                        (48, 64), HeNe, efl, kind='mdft',
                                        **kw)
    pupil = jnp.asarray(_cplx(rng, (32, 40)))
    assert fftdft.pupil_dx == pupil_dx
    assert fftdft.focal_dx == focal_dx
    np.testing.assert_allclose(np.asarray(fftdft(pupil)),
                               np.asarray(mdft(pupil)), atol=1e-10)


def test_wavefront_prepare_executor_fftdft_kind():
    pupil_dx, samples, efl = 0.1, 32, 10.0
    focal_dx = HeNe * efl / (pupil_dx * samples)
    wf = propagation.Wavefront(jnp.ones((samples, samples), dtype=complex),
                               HeNe, pupil_dx, 'pupil')
    fftdft = wf.prepare_executor(efl, focal_dx, samples, kind='fftdft')
    mdft = wf.prepare_executor(efl, focal_dx, samples)
    np.testing.assert_allclose(np.asarray(wf.focus_dft(fftdft).data),
                               np.asarray(wf.focus_dft(mdft).data),
                               atol=1e-10)


def test_prepare_executor_fftdft_rejects_incompatible_sampling():
    with pytest.raises(ValueError, match='not FFT-compatible'):
        propagation.prepare_executor(0.1, 32, 1.0, 32, HeNe, 10.0,
                                     kind='fftdft')


def test_focus_dft_adjoint_identity():
    rng = RNG(159)
    x = _cplx(rng, (7, 9))
    ex = propagation.prepare_executor(0.25, x.shape, 0.1, (8, 11), HeNe, 10.0)
    y = _cplx(rng, (8, 11))
    lhs = np.vdot(np.asarray(propagation.focus_dft(x, ex)), y)
    rhs = np.vdot(x, np.asarray(propagation.focus_dft_adjoint(y, ex)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_unfocus_dft_adjoint_identity():
    rng = RNG(7531)
    x = _cplx(rng, (8, 11))
    ex = propagation.prepare_executor(0.25, (7, 9), 0.1, x.shape, HeNe, 10.0)
    y = _cplx(rng, (7, 9))
    lhs = np.vdot(np.asarray(propagation.unfocus_dft(x, ex)), y)
    rhs = np.vdot(x, np.asarray(propagation.unfocus_dft_adjoint(y, ex)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_unit_cell_focal_grid_round_trip_is_unitary():
    pupil_dx, npup, efl = 0.1, 64, 50.0
    x, y = coordinates.make_xy_grid(npup, dx=pupil_dx)
    pupil = jnp.asarray(
        np.asarray(geometry.circle(2.4, np.hypot(x, y))), dtype=complex)
    fdx, nf = propagation.unit_cell_focal_grid(pupil_dx, 4.8, HeNe, efl)
    ex = propagation.prepare_executor(pupil_dx, npup, fdx, nf, HeNe, efl)
    rt = propagation.unfocus_dft(propagation.focus_dft(pupil, ex), ex)
    assert float(np.abs(np.asarray(rt) - np.asarray(pupil)).max()) < 1e-10


# ---------- free space -------------------------------------------------------

def test_free_space_zero_distance_identity():
    z = RNG(3).random((SAMPLES, SAMPLES))
    wf = propagation.Wavefront(jnp.asarray(z, dtype=complex), HeNe, 1.0,
                               'pupil')
    out = wf.free_space(0)
    np.testing.assert_allclose(np.asarray(out.data), z, atol=1e-12)
    assert out.dx == wf.dx
    assert out.wavelength == wf.wavelength


@pytest.mark.parametrize('Q', [1, 1.5, 2])
def test_angular_spectrum_adjoint_identity(Q):
    rng = RNG(321)
    x = _cplx(rng, (9, 12))
    fwd = propagation.angular_spectrum(x, wvl=HeNe, dx=0.25, z=1.2, Q=Q)
    y = _cplx(rng, np.asarray(fwd).shape)
    lhs = np.vdot(np.asarray(fwd), y)
    rhs = np.vdot(x, np.asarray(
        propagation.angular_spectrum_adjoint(y, wvl=HeNe, dx=0.25, z=1.2,
                                             Q=Q)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_angular_spectrum_precomputed_tf_adjoint_identity():
    rng = RNG(654)
    x = _cplx(rng, (9, 12))
    y = _cplx(rng, x.shape)
    tf = propagation.angular_spectrum_transfer_function(x.shape, HeNe, 0.25,
                                                        z=1.2)
    lhs = np.vdot(np.asarray(
        propagation.angular_spectrum(x, wvl=HeNe, dx=0.25, z=np.nan, tf=tf)),
        y)
    rhs = np.vdot(x, np.asarray(
        propagation.angular_spectrum_adjoint(y, wvl=HeNe, dx=0.25, z=np.nan,
                                             tf=tf)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_wavefront_free_space_adjoint_metadata():
    rng = RNG(753)
    dz, Q = 1.2, 2
    wf = propagation.Wavefront(jnp.asarray(_cplx(rng, (8, 8))), HeNe, 0.25,
                               'pupil')
    out = wf.free_space(dz=dz, Q=Q)
    gd = _cplx(rng, np.asarray(out.data).shape)
    grad = propagation.Wavefront(jnp.asarray(gd), HeNe, out.dx, out.space)
    back = grad.free_space_adjoint(dz=dz, Q=Q)
    np.testing.assert_allclose(
        np.asarray(back.data),
        np.asarray(propagation.angular_spectrum_adjoint(gd, wvl=HeNe, dx=0.25,
                                                        z=dz, Q=Q)))
    assert back.data.shape == wf.data.shape
    assert back.space == wf.space


def test_precomputed_tf_zero_distance_identity():
    data = RNG(4).random((4, 4))
    wf = propagation.Wavefront(jnp.asarray(data, dtype=complex), 0.6328, 1.0,
                               'pupil')
    tf = propagation.angular_spectrum_transfer_function(
        np.asarray(wf.data).shape, wf.wavelength, wf.dx, z=0)
    out = wf.free_space(tf=tf)
    np.testing.assert_allclose(np.asarray(out.data), data, atol=1e-12)


def test_talbot_distance_value():
    wvl, a = 123.456, 987.654321
    truth = wvl / (1 - np.sqrt(1 - wvl ** 2 / a ** 2))
    assert float(propagation.talbot_distance(a, wvl)) == \
        pytest.approx(truth, abs=0.1)


def test_fresnel_number_value():
    wvl, a, z = 123.456, 987.654321, 5
    assert float(propagation.fresnel_number(a, z, wvl)) == \
        pytest.approx(a ** 2 / (z * wvl))


# ---------- Wavefront arithmetic --------------------------------------------

def _wf22(data):
    return propagation.Wavefront(jnp.asarray(data, dtype=complex), 0.6328,
                                 1.0, 'pupil')


def test_wavefront_multiply_divide():
    data = np.arange(4, dtype=float).reshape(2, 2).astype(complex)
    wf = _wf22(data)
    np.testing.assert_allclose(np.asarray((wf * 2).data), data * 2)
    np.testing.assert_allclose(np.asarray((wf / 2).data), data / 2)


def test_wavefront_noncommutative_operand_order():
    data = (RNG(5).random((2, 2)) + 1).astype(complex)
    wf = _wf22(data)
    np.testing.assert_allclose(np.asarray((wf - 1.0).data), data - 1.0)
    np.testing.assert_allclose(np.asarray((wf / 2.0).data), data / 2.0)


def test_wavefront_reverse_scalar_arithmetic():
    data = (RNG(6).random((2, 2)) + 1).astype(complex)
    wf = _wf22(data)
    np.testing.assert_allclose(np.asarray((2 * wf).data), 2 * data)
    np.testing.assert_allclose(np.asarray((2 + wf).data), 2 + data)
    np.testing.assert_allclose(np.asarray((2 - wf).data), 2 - data)
    np.testing.assert_allclose(np.asarray((2 / wf).data), 2 / data)


def test_wavefront_arithmetic_rejects_mixed_spaces():
    data = jnp.ones((2, 2), dtype=complex)
    pupil = propagation.Wavefront(data, 0.6328, 1.0, 'pupil')
    psf = propagation.Wavefront(data, 0.6328, 1.0, 'psf')
    with pytest.raises(ValueError, match='space'):
        pupil + psf


def test_thinlens_and_hopkins_defocus_agree():
    x, y = coordinates.make_xy_grid(128, diameter=11)
    dx = float(x[0, 1] - x[0, 0])
    r = np.hypot(np.asarray(x), np.asarray(y))
    amp = geometry.circle(5, r)
    # W020 amplitude chosen so a 10,000 mm thin lens at efl=100 matches
    phs = np.asarray(polynomials.hopkins(0, 2, 0, r / 5, 0, 1)) \
        * (1.975347661 * HeNe * 1000)
    wf = propagation.Wavefront.from_amp_and_phase(amp, jnp.asarray(phs),
                                                  HeNe, dx)
    psf = wf.focus(efl=100, Q=2).intensity
    no_phs = propagation.Wavefront.from_amp_and_phase(amp, None, HeNe, dx)
    tl = propagation.Wavefront.thin_lens(10_000, HeNe, x, y)
    psf2 = (no_phs * tl).focus(efl=100, Q=2).intensity
    np.testing.assert_allclose(np.asarray(psf.data), np.asarray(psf2.data),
                               rtol=1e-4, atol=1e-9)


# ---------- FPM / babinet gradients -----------------------------------------

def test_to_fpm_and_back_adjoint_identity():
    rng = RNG(2468)
    x = _cplx(rng, (7, 9))
    fpm = _cplx(rng, (8, 11))
    y = _cplx(rng, x.shape)
    ex = propagation.prepare_executor(0.25, x.shape, 0.1, fpm.shape, HeNe,
                                      10.0)
    lhs = np.vdot(np.asarray(propagation.to_fpm_and_back(x, fpm, ex)), y)
    rhs = np.vdot(x, np.asarray(
        propagation.to_fpm_and_back_adjoint(y, fpm, ex)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_to_fpm_and_back_fpm_gradient_matches_fd():
    rng = RNG(123)
    z = jnp.asarray(_cplx(rng, (8, 8)))
    fpm = rng.normal(size=(8, 8))
    ex = propagation.prepare_executor(1.0, (8, 8), 0.1, (8, 8), HeNe, 10.0)
    out, at_fpm, _ = propagation.to_fpm_and_back(z, jnp.asarray(fpm), ex,
                                                 return_more=True)
    ybar = _cplx(rng, np.asarray(out).shape)
    _, fpm_bar = propagation.to_fpm_and_back_adjoint(
        jnp.asarray(ybar), jnp.asarray(fpm), ex,
        return_fpm_grad=True, field_at_fpm=at_fpm)
    yy, xx = 3, 4
    eps = 1e-6
    plus, minus = fpm.copy(), fpm.copy()
    plus[yy, xx] += eps
    minus[yy, xx] -= eps
    j_plus = _real_vdot(ybar, propagation.to_fpm_and_back(
        z, jnp.asarray(plus), ex))
    j_minus = _real_vdot(ybar, propagation.to_fpm_and_back(
        z, jnp.asarray(minus), ex))
    fd = (j_plus - j_minus) / (2 * eps)
    assert float(np.asarray(fpm_bar)[yy, xx]) == \
        pytest.approx(fd, rel=1e-5, abs=1e-8)


def test_babinet_adjoint_fpm_and_lyot_gradients_match_fd():
    rng = RNG(456)
    z = jnp.asarray(_cplx(rng, (8, 8)))
    fpm = rng.normal(size=(8, 8))
    lyot = rng.normal(size=(8, 8))
    ex = propagation.prepare_executor(1.0, (8, 8), 0.1, (8, 8), HeNe, 10.0)
    out, at_fpm, _, at_lyot = propagation.babinet(
        z, jnp.asarray(lyot), jnp.asarray(fpm), ex, return_more=True)
    ybar = _cplx(rng, np.asarray(out).shape)
    _, fpm_bar, lyot_bar = propagation.babinet_adjoint(
        jnp.asarray(ybar), jnp.asarray(lyot), jnp.asarray(fpm), ex,
        field_at_fpm=at_fpm, field_at_lyot=at_lyot,
        return_fpm_grad=True, return_lyot_grad=True)

    eps = 1e-6

    def run(fpm_arr, lyot_arr):
        return _real_vdot(ybar, propagation.babinet(
            z, jnp.asarray(lyot_arr), jnp.asarray(fpm_arr), ex))

    fy, fx = 2, 5
    plus, minus = fpm.copy(), fpm.copy()
    plus[fy, fx] += eps
    minus[fy, fx] -= eps
    fd_fpm = (run(plus, lyot) - run(minus, lyot)) / (2 * eps)

    ly, lx = 6, 1
    plus, minus = lyot.copy(), lyot.copy()
    plus[ly, lx] += eps
    minus[ly, lx] -= eps
    fd_lyot = (run(fpm, plus) - run(fpm, minus)) / (2 * eps)

    assert float(np.asarray(fpm_bar)[fy, fx]) == \
        pytest.approx(fd_fpm, rel=1e-5, abs=1e-8)
    assert float(np.asarray(lyot_bar)[ly, lx]) == \
        pytest.approx(fd_lyot, rel=1e-5, abs=1e-8)


# ---------- multi-resolution vortex -----------------------------------------

def test_vortex_phase_mask_rejects_non_integer_charge():
    with pytest.raises(TypeError):
        propagation.vortex_phase_mask(2.5)
    propagation.vortex_phase_mask(np.int64(2))   # numpy integers are fine


def test_multiresolution_adjoint_identity():
    rng = RNG(20240530)
    npup = 64
    ex = propagation.prepare_multiresolution(
        0.1, npup, 2.0, 32, HeNe, 10.0, num_levels=3, fine_samples=32)
    fpm = propagation.vortex_phase_mask(2)
    x = jnp.asarray(_cplx(rng, (npup, npup)))
    y = jnp.asarray(_cplx(rng, (npup, npup)))
    lhs = np.vdot(
        np.asarray(propagation.to_fpm_and_back_multiresolution(x, fpm, ex)),
        np.asarray(y))
    rhs = np.vdot(
        np.asarray(x),
        np.asarray(propagation.to_fpm_and_back_multiresolution_adjoint(
            y, fpm, ex)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_prepare_multiresolution_accepts_tuple_samples():
    ex = propagation.prepare_multiresolution(
        0.1, 32, 2.0, (24, 40), HeNe, 10.0, num_levels=2, fine_samples=16)
    assert ex.xf[0].shape == (24, 40)
    fpm = propagation.vortex_phase_mask(2)
    x = jnp.asarray(RNG(8).random((32, 32)).astype(complex))
    out = propagation.to_fpm_and_back_multiresolution(x, fpm, ex)
    assert np.asarray(out).shape == (32, 32)


def test_multiresolution_return_more_and_fpm_grad_matches_fd():
    rng = RNG(20260704)
    npup = 16
    ex = propagation.prepare_multiresolution(
        0.25, npup, 4.0, 16, HeNe, 10.0, num_levels=2, fine_samples=12)
    fpm = propagation.vortex_phase_mask(2)
    x = jnp.asarray(_cplx(rng, (npup, npup)))
    out, at_fpm, after_fpm = propagation.to_fpm_and_back_multiresolution(
        x, fpm, ex, return_more=True)
    assert len(at_fpm) == len(after_fpm) == len(ex)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(propagation.to_fpm_and_back_multiresolution(x, fpm, ex)))

    ybar = _cplx(rng, np.asarray(out).shape)
    _, fpm_bars = propagation.to_fpm_and_back_multiresolution_adjoint(
        jnp.asarray(ybar), fpm, ex, return_fpm_grad=True, field_at_fpm=at_fpm)

    k, iy, ix = 1, 3, 5
    x0 = float(ex.xf[k][iy, ix])
    y0 = float(ex.yf[k][iy, ix])
    eps = 1e-6

    def bumped(sign):
        def f(xf, yf):
            return fpm(xf, yf) + sign * eps * ((xf == x0) & (yf == y0))
        return f

    j_plus = _real_vdot(ybar, propagation.to_fpm_and_back_multiresolution(
        x, bumped(+1), ex))
    j_minus = _real_vdot(ybar, propagation.to_fpm_and_back_multiresolution(
        x, bumped(-1), ex))
    fd = (j_plus - j_minus) / (2 * eps)
    assert float(np.real(np.asarray(fpm_bars[k])[iy, ix])) == \
        pytest.approx(fd, rel=1e-5, abs=1e-8)


# ---------- measured FPM -----------------------------------------------------

def test_prepare_measured_fpm_interpolates_and_continues_vortex():
    n, dx = 129, 0.4
    x, y = coordinates.make_xy_grid(n, dx=dx)
    x, y = np.asarray(x), np.asarray(y)
    measurement = np.exp(1j * 2 * np.arctan2(y, x))
    fpm = propagation.prepare_measured_fpm(measurement, dx, charge=2)
    np.testing.assert_allclose(np.asarray(fpm(x, y)), measurement, atol=1e-9)
    far = np.full((1, 1), 1e5)
    ideal = np.exp(1j * 2 * np.arctan2(far, far))
    np.testing.assert_allclose(np.asarray(fpm(far, far)), ideal, atol=1e-9)


def test_prepare_measured_fpm_scalar_fill():
    n, dx = 65, 1.0
    measurement = np.ones((n, n), dtype=complex)
    fpm = propagation.prepare_measured_fpm(measurement, dx, fill=0.0)
    far = np.full((1, 1), 1e3)
    assert complex(np.asarray(fpm(far, far))[0, 0]) == 0.0


# ---------- vortex nulling (end-to-end contrast) ----------------------------

def _grey_circle(radius, npup, dx, ss=16):
    xx, yy = coordinates.make_xy_grid(npup * ss, dx=dx / ss)
    rr = np.hypot(np.asarray(xx), np.asarray(yy))
    fine = (rr < radius).astype(np.float64)
    return fine.reshape(npup, ss, npup, ss).mean(axis=(1, 3))


def _vortex_rig():
    """Charge-2 vortex coronagraph with an undersized Lyot stop."""
    wvl, efl, pupil_dx = HeNe, 100.0, 0.05
    npup, nd = 384, 320
    Dap = nd * pupil_dx
    lamD = (efl / Dap) * wvl
    period = wvl * efl / pupil_dx
    pupil = _grey_circle(Dap / 2, npup, pupil_dx).astype(complex)
    lyot = _grey_circle(0.8 * Dap / 2, npup, pupil_dx)
    nf0 = 2 * nd
    ex = propagation.prepare_multiresolution(
        pupil_dx, npup, period / nf0, nf0, wvl, efl,
        num_levels=6, fine_samples=256)
    nf, fdx = 256, lamD / 4
    final = propagation.prepare_executor(pupil_dx, npup, fdx, nf, wvl, efl)
    ref_peak = float(
        (np.abs(np.asarray(propagation.focus_dft(jnp.asarray(pupil), final)))
         ** 2).max())
    fx = np.arange(-(nf // 2), nf // 2) * fdx
    XF, YF = np.meshgrid(fx, fx)
    rad_lamD = np.hypot(XF, YF) / lamD
    return dict(pupil=pupil, lyot=lyot, ex=ex, final=final,
                ref_peak=ref_peak, rad_lamD=rad_lamD, lamD=lamD)


def _dark_hole_max(rig, fpm):
    lyot_field = propagation.to_fpm_and_back_multiresolution(
        jnp.asarray(rig['pupil']), fpm, rig['ex'])
    psf = np.abs(np.asarray(propagation.focus_dft(
        lyot_field * jnp.asarray(rig['lyot']), rig['final']))) ** 2
    norm = psf / rig['ref_peak']
    hole = (rig['rad_lamD'] > 3) & (rig['rad_lamD'] < 10)
    return float(norm[hole].max())


def test_vortex_dark_hole_and_measured_mask_error():
    rig = _vortex_rig()
    # ideal charge-2 mask: contrast below 1e-12 in the 3-10 lambda/D hole
    dh_ideal = _dark_hole_max(rig, propagation.vortex_phase_mask(2))
    assert dh_ideal < 1e-12

    # a measured-style mask map of the ideal vortex still nulls deeply;
    # injecting a 50 mrad fabrication ripple brightens the hole measurably
    def measured(error=None):
        mdx = rig['lamD'] / 8
        n = int(40 * 8) // 2 * 2 + 1
        mx, my = coordinates.make_xy_grid(n, dx=mdx)
        mx, my = np.asarray(mx), np.asarray(my)
        phase = 2 * np.arctan2(my, mx)
        if error is not None:
            phase = phase + error(np.hypot(mx, my) / rig['lamD'])
        return np.exp(1j * phase), mdx

    ideal_map, mdx = measured()
    dh_meas = _dark_hole_max(
        rig, propagation.prepare_measured_fpm(ideal_map, mdx, charge=2))
    err_map, mdx = measured(lambda r: 0.05 * np.sin(2 * np.pi * r / 3.0))
    dh_err = _dark_hole_max(
        rig, propagation.prepare_measured_fpm(err_map, mdx, charge=2))
    assert dh_meas < 1e-5
    assert dh_err > 3 * dh_meas
