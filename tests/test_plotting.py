"""Smoke tests for raytracing + coatings plotting (Agg backend)."""
import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt  # NOQA: E402

import numpy as onp  # NOQA: E402
import pytest  # NOQA: E402

from prysm_tpu.x import raytracing as rt  # NOQA: E402
import prysm_tpu.x.materials as mat  # NOQA: E402
import prysm_tpu.x.coatings as coat  # NOQA: E402


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    plt.close('all')


@pytest.fixture
def doublet_sys():
    bk7 = mat.model_glass(1.5168, 64.17, name='BK7')
    f2 = mat.model_glass(1.6200, 36.37, name='F2')
    lens = rt.LensData()
    lens.add(rt.Sphere(1 / 61.47), thickness=6.0, material=bk7)
    lens.add(rt.Sphere(-1 / 44.64), thickness=2.5, material=f2)
    lens.add(rt.Sphere(-1 / 129.94), thickness=96.1, material=mat.air)
    return rt.OpticalSystem(lens, aperture=25.0,
                            fields=[rt.Field(0.0, 0.0), rt.Field(0.0, 1.0)],
                            wavelengths=[0.5876], stop_index=1)


@pytest.fixture
def hr_stack():
    nH, nL, w0 = 2.35, 1.45, 0.55
    idx = [nH, nL] * 4 + [nH]
    th = [w0 / (4 * nH), w0 / (4 * nL)] * 4 + [w0 / (4 * nH)]
    return coat.Stack(idx, th, 1.52)


def test_layout_draws_surfaces_and_rays(doublet_sys):
    fig, ax = rt.layout(doublet_sys)
    # 4 surface profiles + element edges + rays for 2 fields
    assert len(ax.lines) + len(ax.patches) >= 6
    assert ax.get_xlabel()
    # plot namespace routes to the same drawing
    fig2, ax2 = doublet_sys.plot.layout_2d()
    assert len(ax2.lines) == len(ax.lines)


def test_layout_mirror_system():
    rc = rt.RitcheyChretien(efl=800.0, bfl=180.0, separation=120.0)
    sys_ = rt.OpticalSystem(rc.to_lensdata(), aperture=100.0,
                            wavelengths=[0.6328], stop_index=1)
    fig, ax = rt.layout(sys_)
    assert len(ax.lines) >= 3  # two mirror profiles + rays


def test_analysis_plot_grid_shapes(doublet_sys):
    fig, axs = doublet_sys.plot.spots(sampling=rt.Sampling.hex(4))
    assert onp.asarray(axs).size == 2  # 2 fields x 1 wavelength
    # fans render a tangential/sagittal axes pair per field
    fig, axs = doublet_sys.plot.ray_fans(nrays=9)
    assert onp.asarray(axs).size == 4
    fig, axs = doublet_sys.plot.opd_fans(nrays=9)
    assert onp.asarray(axs).size == 4


def test_scalar_analysis_plots(doublet_sys):
    for verb, kwargs in [
        ('field_curvature', dict(samples=5)),
        ('distortion', dict(samples=5)),
        ('chromatic_focal_shift',
         dict(wavelengths=[0.48, 0.55, 0.65], samples=5)),
        ('lateral_color', dict(wavelengths=[0.48, 0.65], samples=5)),
    ]:
        fig, ax = getattr(doublet_sys.plot, verb)(**kwargs)
        assert len(ax.lines) >= 1, verb
        assert ax.get_xlabel(), verb
        assert ax.get_ylabel(), verb


def test_full_field_map(doublet_sys):
    fig, ax = doublet_sys.plot.full_field(samples=4,
                                          sampling=rt.Sampling.hex(3))
    assert len(ax.collections) >= 1  # pcolormesh quad


def test_coating_spectrum(hr_stack):
    w = onp.linspace(0.4, 0.75, 31)
    fig, ax = coat.plot_spectrum(hr_stack, w)
    assert len(ax.lines) == 2  # R and T
    # data matches RTA directly for pol='s'
    fig, ax = coat.plot_spectrum(hr_stack, w, pol='s', quantities=('R',))
    R, T, A = coat.RTA(hr_stack, w, 0.0, 's')
    onp.testing.assert_allclose(ax.lines[0].get_ydata(), onp.asarray(R),
                                atol=1e-12)


def test_coating_profile_field_admittance(hr_stack):
    fig, ax = coat.plot_index_profile(hr_stack)
    ys = onp.concatenate([ln.get_ydata() for ln in ax.lines])
    assert ys.max() == pytest.approx(2.35)
    assert ys.min() == pytest.approx(1.45)
    fig, ax = coat.plot_field_intensity(hr_stack, 0.55)
    assert (ax.lines[0].get_ydata() >= 0).all()
    fig, ax = coat.plot_admittance(hr_stack, 0.55)
    assert len(ax.collections) == 1  # boundary markers


def test_coating_monitoring_plot(hr_stack):
    fig, ax = coat.plot_monitoring_trace(hr_stack, 0, 0.55)
    x = ax.lines[0].get_xdata()
    assert x[0] == 0.0
    assert x[-1] == pytest.approx(float(hr_stack.thicknesses[0]))
