"""PSF metrics, OTF family, and RichData/Slices depth: reference port.

Behavior matrix of /root/reference/tests/test_psf.py (7 tests),
test_otf.py (8), and test_richdata.py (9): airy size estimation,
centroid/autocrop, MTF/PTF/OTF center values, hand-derived adjoint
dot/FD checks, encircled-energy monotonicity, RichData coordinate
synthesis and cache invalidation, azimuthal slices, and plotters.
"""
import numpy as np
import pytest

import matplotlib
matplotlib.use('Agg')
from matplotlib import pyplot as plt

import jax  # NOQA: F401

from prysm_tpu import _richdata as rdata
from prysm_tpu import otf, psf
from prysm_tpu.coordinates import cart_to_polar, make_xy_grid
from prysm_tpu.fttools import forward_ft_unit

SAMPLES = 32
LIM = 100


def _np(x):
    return np.asarray(x)


@pytest.fixture
def tpsf():
    xx, yy = make_xy_grid(SAMPLES, diameter=LIM * 2)
    rho, phi = cart_to_polar(xx, yy)
    dat = psf.airydisk(rho, 10, 0.55)
    return _np(dat), float(xx[0, 1] - xx[0, 0])


@pytest.fixture
def tpsf_dense():
    xx, yy = make_xy_grid(SAMPLES * 4, diameter=LIM / 2)
    rho, phi = cart_to_polar(xx, yy)
    dat = psf.airydisk(rho, 10, 0.55)
    return _np(dat), float(xx[0, 1] - xx[0, 0])


# ---------- psf ---------------------------------------------------------------

def test_airydisk_aft_origin():
    assert 1 == pytest.approx(float(psf.airydisk_ft(0, 3.14, 2.718)))


def test_size_estimation_accurate(tpsf_dense):
    # F/10 at lambda = 0.55 um: FWHM = 1.028*0.55*10; the 1/e^2 width is
    # about the airy radius 1.22*0.55*10
    tpsf, dx = tpsf_dense
    true_airy_radius = 1.22 * .55 * 10
    true_fwhm = 1.028 * .55 * 10
    assert float(psf.fwhm(tpsf, dx)) == pytest.approx(true_fwhm, abs=1)
    assert float(psf.one_over_e(tpsf, dx)) == pytest.approx(
        true_airy_radius, abs=0.4)
    assert float(psf.one_over_e_sq(tpsf, dx)) == pytest.approx(
        true_airy_radius * 1.414, abs=.8)


def test_centroid_correct(tpsf_dense):
    tpsf, _ = tpsf_dense
    cy, cx = psf.centroid(tpsf, unit='pixels')
    ty, tx = (s / 2 for s in tpsf.shape)
    assert float(cy) == pytest.approx(ty, .1)
    assert float(cx) == pytest.approx(tx, .1)


def test_centered_odd_array_has_zero_spatial_centroid():
    data = np.zeros((5, 5))
    data[2, 2] = 1
    cy, cx = psf.centroid(data, dx=1)
    assert (float(cy), float(cx)) == pytest.approx((0, 0))


def test_estimate_size_accepts_numeric_metric_and_first_crossing():
    x, y = make_xy_grid(65, dx=0.1)
    data = np.exp(-(_np(x) ** 2 + _np(y) ** 2))
    numeric = psf.estimate_size(data, 0.5, dx=0.1, criteria='first')
    named = psf.estimate_size(data, 'fwhm', dx=0.1, criteria='first')
    assert float(numeric) == pytest.approx(float(named))


def test_autocrop_pads_near_array_boundary():
    data = np.zeros((5, 5))
    data[0, 0] = 1
    out = psf.autocrop(data, 4)
    assert out.shape == (4, 4)


def test_autocrop_returns_requested_centered_window(tpsf):
    tpsf, _ = tpsf
    cropped = psf.autocrop(tpsf, 10)
    cy, cx = (int(c) for c in psf.centroid(tpsf, unit='pixels'))
    expected = tpsf[cy - 5:cy + 5, cx - 5:cx + 5]
    assert cropped.shape == (10, 10)
    np.testing.assert_allclose(_np(cropped), expected)


# ---------- otf ---------------------------------------------------------------

def test_mtf_calc_correct():
    x = _np(forward_ft_unit(1 / 1e3, 128))
    xx, yy = np.meshgrid(x, x)
    dat = np.sin(xx)
    mtf = otf.mtf_from_psf(dat, x[1] - x[0])
    center = tuple(s // 2 for s in mtf.shape)
    assert float(mtf.data[center]) == 1


def test_ptf_calc_correct():
    x = _np(forward_ft_unit(1 / 1e3, 128))
    xx, yy = np.meshgrid(x, x)
    dat = np.sin(xx)
    ptf = otf.ptf_from_psf(dat, x[1] - x[0])
    center = tuple(s // 2 for s in ptf.shape)
    assert float(ptf.data[center]) == 0


def test_otf_calc_correct():
    x = _np(forward_ft_unit(1 / 1e3, 128))
    xx, yy = np.meshgrid(x, x)
    dat = np.sin(xx)
    otf_ = otf.otf_from_psf(dat, x[1] - x[0])
    center = tuple(s // 2 for s in otf_.shape)
    assert complex(otf_.data[center]) == 1 + 0j


def _shifted_gaussian(n=15, sig=0.6, x0=0.8, y0=-0.4):
    """Off-center narrow PSF whose OTF modulus stays away from zero.

    Odd n (the reference uses 14): an even grid has Nyquist bins whose
    transform is exactly real, i.e. ON the angle branch cut; numpy's FFT
    keeps their imaginary part at a signed zero while XLA's leaves
    ~1e-17 noise, so a finite-difference probe of the PTF would jump by
    2*pi there.  Odd sizing removes the Nyquist bins, preserving the
    adjoint-vs-FD intent.
    """
    c = np.arange(n) - n // 2
    xx, yy = np.meshgrid(c, c)
    return np.exp(-((xx - x0) ** 2 + (yy - y0) ** 2) / (2 * sig ** 2))


def test_transform_psf_adjoint_dot_test():
    # <A x, y> == <x, A^H y> for the linear FT and its adjoint
    rng = np.random.default_rng(0)
    n = 16
    x = rng.standard_normal((n, n))
    y = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Ax, _ = otf.transform_psf(x, dx=1.0)
    Aty = _np(otf.transform_psf_adjoint(y))
    lhs = np.sum(np.conj(_np(Ax)) * y)
    rhs = np.sum(np.conj(x) * Aty)
    assert np.allclose(lhs, rhs, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('which', ['mtf', 'ptf', 'otf'])
def test_from_psf_adjoint_matches_fd(which):
    rng = np.random.default_rng(1)
    p = _shifted_gaussian()
    dx = 1.0
    v = rng.standard_normal(p.shape)

    if which == 'mtf':
        fwd, adj = otf.mtf_from_psf, otf.mtf_from_psf_adjoint
        bar = rng.standard_normal(p.shape)
        loss = lambda q: float(np.sum(bar * _np(fwd(q, dx).data)))  # noqa: E731
    elif which == 'ptf':
        fwd, adj = otf.ptf_from_psf, otf.ptf_from_psf_adjoint
        bar = rng.standard_normal(p.shape)
        loss = lambda q: float(np.sum(bar * _np(fwd(q, dx).data)))  # noqa: E731
    else:
        fwd, adj = otf.otf_from_psf, otf.otf_from_psf_adjoint
        bar = (rng.standard_normal(p.shape)
               + 1j * rng.standard_normal(p.shape))
        loss = lambda q: float(np.real(np.sum(  # noqa: E731
            np.conj(bar) * _np(fwd(q, dx).data))))

    psf_bar = _np(adj(bar, p, dx))
    analytic = float(np.sum(psf_bar * v))

    eps = 1e-6
    fd = (loss(p + eps * v) - loss(p - eps * v)) / (2 * eps)
    assert np.allclose(analytic, fd, rtol=1e-4, atol=1e-6)

    # passing the cached transform from return_more reproduces the
    # recompute path
    _, data = fwd(p, dx, return_more=True)
    psf_bar_cached = _np(adj(bar, data=data))
    assert np.allclose(psf_bar_cached, psf_bar, rtol=1e-6, atol=1e-9)


def test_encircled_energy_monotonic_and_bounded():
    p = _shifted_gaussian(n=64, sig=2.0, x0=0.0, y0=0.0)
    p = p / p.sum()
    radii = np.array([2.0, 5.0, 10.0, 20.0, 40.0])
    ee = _np(otf.encircled_energy(p, dx=1.0, radius=radii))
    # more energy in a bigger circle (tail allows FFT roundoff at the
    # ~1e-8 level once EE saturates at 1)
    assert np.all(np.diff(ee) > -1e-7)
    assert np.all(np.diff(ee[:3]) > 0)
    assert ee[-1] <= 1.0 + 1e-6             # cannot exceed the total
    # scalar and vector forms agree
    assert np.isclose(float(otf.encircled_energy(p, 1.0, 10.0)), ee[2])


# ---------- richdata ----------------------------------------------------------

def test_general_properties_and_copy():
    data = np.random.rand(100, 100)
    rd = rdata.RichData(data, 1., 1.)
    assert rd.shape == rd.data.shape
    assert rd.size == rd.data.size
    assert rd.support == 100.
    cpy = rd.copy()
    assert id(cpy.data) != id(rd.data)


def test_exact_functional():
    data = np.random.rand(100, 100)
    rd = rdata.RichData(data, 1., 1.)
    assert np.isfinite(float(rd.exact_x(3)))
    assert np.isfinite(float(rd.exact_y(3)))
    pt = rd.exact_xy(2, 2)
    assert np.isfinite(float(pt))
    pt = rd.exact_polar(2, 0)
    assert np.isfinite(float(pt))


def test_coordinate_setters_invalidate_polar_caches():
    rd = rdata.RichData(np.arange(25, dtype=float).reshape(5, 5), 1, None)
    rd.exact_xy(0, 0)
    _ = rd.r
    x = rd.x + 1
    rd.x = x
    assert rd._r is None
    np.testing.assert_allclose(_np(rd.x), _np(x))


def test_xyrt_synthesis_for_no_xytr_as_expected():
    data = np.random.rand(10, 10)
    dx = 1.234
    rd = rdata.RichData(data, dx, None)
    x, y = rd.x, rd.y
    r, t = rd.r, rd.t
    assert float(x[0, 1] - x[0, 0]) == pytest.approx(dx, 0.001)
    assert y.shape == data.shape
    assert r.shape == data.shape
    assert t.shape == data.shape


def test_slices_does_not_alter_twosided():
    data = np.random.rand(11, 11)
    rd = rdata.RichData(data, 1.234, None)
    slc = rd.slices(twosided=True)
    _, y = slc.y
    _, x = slc.x
    assert (_np(y) == data[:, 5]).all()
    assert (_np(x) == data[5, :]).all()


def test_slices_various_interped_profiles_function():
    data = np.random.rand(11, 11)
    rd = rdata.RichData(data, 1.234, None)
    slc = rd.slices(twosided=True)
    for name in ('azavg', 'azmin', 'azmax', 'azpv', 'azvar', 'azstd'):
        u, vals = getattr(slc, name)
        assert np.isfinite(_np(u)).all()
        assert np.isfinite(_np(vals)).all()


def _ramp_rd(n, dx, wavelength, start=0):
    ramp = np.arange(start, start + n * n, dtype=float).reshape(n, n)
    return rdata.RichData(ramp, dx, wavelength)


def test_plot2d_applies_limits_and_color_limits():
    fig, ax = _ramp_rd(10, 0.5, 1.0).plot2d(xlim=1, ylim=1,
                                            clim=(10, 90))
    # scalar limits expand symmetrically; clim passes through
    assert ax.get_xlim() == pytest.approx((-1, 1))
    assert ax.get_ylim() == pytest.approx((-1, 1))
    assert ax.images[0].get_clim() == (10, 90)
    plt.close(fig)


def test_plot2d_log_uses_log_normalization():
    fig, ax = _ramp_rd(10, 1.0, 1.0, start=1).plot2d(log=True)
    assert type(ax.images[0].norm).__name__ == 'LogNorm'
    plt.close(fig)


def test_slice_plot_selects_requested_slice_and_inverts_x():
    cuts = _ramp_rd(11, 1.0, None).slices(twosided=True)
    fig, ax = cuts.plot(slices='x', show_legend=True, invert_x=True)
    assert len(ax.lines) == 1
    assert ax.xaxis_inverted()
    assert ax.get_legend() is not None
    plt.close(fig)
