"""Raytracing plotting helpers: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_plotting.py (44 tests): lens cross-section drawing
(ODs, rim features, bridges, stop markers), element grouping, ray
paths with failure truncation, transverse/wave aberration fans, spot
diagrams, mirror substrates, and the field-sweep plotters.  The
behaviors are the reference's; the harness below (builders, fixtures,
assertion shorthand) is this repo's own.
"""
import contextlib

import matplotlib
import numpy as np
import pytest

matplotlib.use('Agg')

from matplotlib import pyplot as plt

import jax  # NOQA: F401

import prysm_tpu.x.materials as pm
from prysm_tpu.x.raytracing import OpticalSystem
from prysm_tpu.x.raytracing.plotting import (
    mirror_substrate_outline, plot_chromatic_focal_shift, plot_distortion,
    plot_field_curvature, plot_optics, plot_ray_paths, plot_spot_diagram,
    plot_transverse_ray_aberration, plot_wave_aberration_fan)
from prysm_tpu.x.raytracing.lensdata import LensData, lens_element_groups
from prysm_tpu.x.raytracing.launch import Field
from prysm_tpu.x.raytracing.spencer_and_murty import RayTraceResult
from prysm_tpu.x.raytracing.surfaces import Conic, OffAxisConic, Plane, Surface
from prysm_tpu.x.raytracing.aperture import (
    Aperture, Chamfer, CircularExtent, Flat, FlatBackSubstrate,
    FlatParentSubstrate, ParallelSubstrate, Seat, SquareCut)

GLASS15 = pm.ConstantMaterial(1.5)


def aac(actual, desired, **kw):
    """allclose shorthand; coerces device arrays to host floats."""
    np.testing.assert_allclose(np.asarray(actual, dtype=float), desired,
                               **kw)


def drawn_only(rim, bore=None):
    """An Aperture carrying a drawn extent and no clip."""
    if rim is None:
        return None
    return Aperture(extent=CircularExtent(rim, inner_radius=bore or 0.0))


def flat(z, *, n=1.0, rim=1, bore=None, kind='refr', **kw):
    """A plane surface at axial position z."""
    return Surface(shape=Plane(), interaction=kind, material=(
        None if kind == 'refl' else pm.ConstantMaterial(n)),
        P=np.asarray([0., 0., z]), aperture=drawn_only(rim, bore), **kw)


def featured(*features, z=0, n=1.5, rim=1):
    """A refracting plane whose aperture carries rim features."""
    s = flat(z, n=n, rim=rim)
    s.aperture = Aperture(extent=CircularExtent(rim), features=features)
    return s


def synthetic_trace(prescription):
    """A 3-ray vertical fan 'landing' at each surface's vertex z."""
    zs = [prescription[0].P[2] - 1] + [s.P[2] for s in prescription]
    hist = np.asarray([[[0., h, z] for h in (-1., 0., 1.)] for z in zs])
    return RayTraceResult(hist, np.zeros_like(hist),
                          np.zeros(hist.shape[:-1]),
                          np.zeros(3, dtype=np.complex128))


def first_line(prescription, **kwargs):
    """(x, y) data of the first line plot_optics draws for prescription."""
    kwargs.setdefault('wvl', 0.55)
    kwargs.setdefault('points', 5)
    fig, ax = plot_optics(prescription, synthetic_trace(prescription),
                          **kwargs)
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        ln = ax.lines[0]
        return (np.asarray(ln.get_xdata(), dtype=float),
                np.asarray(ln.get_ydata(), dtype=float))


@pytest.fixture
def biconvex_sys():
    """Constant-index biconvex singlet with a 3-point field set."""
    rows = LensData()
    rows.add(Conic(1 / 60.0, 0.0), thickness=4.0, material=GLASS15,
             aperture=8.0)
    rows.add(Conic(-1 / 60.0, 0.0), thickness=95.0, material=pm.air,
             aperture=8.0)
    built = OpticalSystem(rows, aperture=10.0, fields=[0.0, 3.0, 5.0],
                          wavelengths=[0.5876], reference=0)
    built.solve.image_distance()
    return built


# ---------- plot_optics -------------------------------------------------------

def test_plot_optics_default_lens_od_is_square():
    x, y = first_line([flat(0, n=1.5), flat(2)])
    aac(y[:5], np.linspace(-1, 1, 5))
    # a top wall from (z=0, y=1) to (z=2, y=1), and the bottom back
    top = (y[:-1] == 1) & (y[1:] == 1) & (x[:-1] == 0) & (x[1:] == 2)
    bot = (y[:-1] == -1) & (y[1:] == -1) & (x[:-1] == 2) & (x[1:] == 0)
    assert top.any() and bot.any()


def test_plot_optics_infers_larger_paired_surface_od():
    _, y = first_line([flat(0, n=1.5, rim=1), flat(2, rim=1.5)])
    assert (y.max(), y.min()) == (1.5, -1.5)


def test_plot_optics_keeps_inner_radius_mask_on_lenses():
    x, _ = first_line([flat(0, n=1.5, bore=0.5), flat(2, bore=0.5)])
    assert np.isnan(x).any()


FEATURE_WALLS = [
    (SquareCut(0.5, 1.5, 0.25, side='upper'),
     slice(5, 10), [0.5, 0.5, 1.5, 1.5, 2.0], [1.0, 0.75, 0.75, 1.0, 1.0]),
    (Flat(0.5, 1.5, 0.25, side='upper'),
     slice(5, 10), [0.5, 0.5, 1.5, 1.5, 2.0], [1.0, 0.75, 0.75, 1.0, 1.0]),
    (Chamfer(0.5, 1.0, 0.2, side='upper'),
     slice(5, 9), [0.5, 1.0, 1.0, 2.0], [1.0, 0.8, 1.0, 1.0]),
    (Seat('front', 0.5, 0.2, side='upper'),
     slice(5, 9), [0.0, 0.5, 0.5, 2.0], [0.8, 0.8, 1.0, 1.0]),
]


@pytest.mark.parametrize('feature, sl, want_x, want_y', FEATURE_WALLS,
                         ids=['squarecut', 'flat', 'chamfer', 'seat'])
def test_plot_optics_features_inset_wall(feature, sl, want_x, want_y):
    x, y = first_line([featured(feature), flat(2)])
    aac(x[sl], want_x)
    aac(y[sl], want_y)


def test_plot_optics_still_rejects_terminal_refracting_surface():
    with pytest.raises(ValueError, match='terminates'):
        first_line([flat(0, n=1.5)])


# ---------- ray paths ---------------------------------------------------------

def test_plot_ray_paths_uses_raytrace_result_positions():
    hist = np.asarray([[[0., h, z] for h in (-1., 0., 1.)]
                       for z in (0., 2.)])
    result = RayTraceResult(hist, np.zeros_like(hist),
                            np.zeros(hist.shape[:-1]),
                            np.zeros(3, dtype=np.complex128))
    fig, ax = plot_ray_paths(result)
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        for ray, ln in enumerate(ax.lines):
            aac(ln.get_xdata(), hist[:, ray, 2])
            aac(ln.get_ydata(), hist[:, ray, 1])


def test_plot_ray_paths_truncates_failed_rays_at_failure_surface():
    # ray 0 survives both surfaces; ray 1 clips at surface 1 (reached,
    # so its intersection there is drawn); ray 2 misses surface 1
    # (never arrived: only the launch point is drawn)
    hist = np.asarray([[[0., r, z] for r in (0., 1., 2.)]
                       for z in (0., 1., 2.)])
    result = RayTraceResult(hist, np.zeros_like(hist),
                            np.zeros(hist.shape[:-1]),
                            np.asarray([2 + 0j, 1 + 2j, 1 - 1j]))
    fig, ax = plot_ray_paths(result)
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        ok, clip, miss = (np.asarray(ln.get_ydata(), dtype=float)
                          for ln in ax.lines)
        aac(ok, [0., 0., 0.])
        aac(clip[:2], [1., 1.])
        assert np.isnan(clip[2])
        aac(miss[:1], [2.])
        assert np.isnan(miss[1:]).all()


# ---------- aberration fans ---------------------------------------------------

def _fan_history():
    return np.asarray([
        [[0., -1., 0.], [0., 0., 0.], [0., 1., 0.]],
        [[0., 9., 1.], [0., 10., 1.], [0., 12., 1.]],
    ])


def test_plot_transverse_ray_aberration_plots_chief_relative_fan():
    fig, ax = plot_transverse_ray_aberration(_fan_history(), axis='y')
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        aac(ax.lines[0].get_xdata(), [-1., 0., 1.])
        aac(ax.lines[0].get_ydata(), [-1., 0., 2.])


def test_plot_transverse_ray_aberration_accepts_raytrace_result_status():
    hist = _fan_history()
    result = RayTraceResult(hist, np.zeros_like(hist),
                            np.zeros(hist.shape[:-1]),
                            np.asarray([1 + 2j, 0 + 0j, 0 + 0j]))
    fig, ax = plot_transverse_ray_aberration(result, axis='y')
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        aac(ax.lines[0].get_xdata(), [0., 1.])
        aac(ax.lines[0].get_ydata(), [0., 2.])


def test_plot_wave_aberration_fan_can_use_nm():
    fig, ax = plot_wave_aberration_fan(
        np.asarray([-1., 0., 1.]), np.asarray([-0.001, 0., 0.001]),
        units='nm', detrend=False)
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        aac(ax.lines[0].get_ydata(), [-1., 0., 1.])
        assert ax.get_ylabel() == 'OPD [nm]'


def test_plot_wave_aberration_fan_detrend():
    rho = np.asarray([-1., 0., 1.])
    w = 0.5 * rho + 0.125 * rho * rho + 0.25
    leftover = [1 / 24, -1 / 12, 1 / 24]
    # the piston+tilt fit comes off by default and with detrend=True
    for kw in ({'wavelength': 1}, {'wavelength': 1, 'detrend': True}):
        fig, ax = plot_wave_aberration_fan(rho, w, **kw)
        aac(ax.lines[0].get_ydata(), leftover)
        plt.close(fig)
    fig, ax = plot_wave_aberration_fan(rho, w, wavelength=1, detrend=False)
    aac(ax.lines[0].get_ydata(), w)
    plt.close(fig)


# ---------- element grouping --------------------------------------------------

GROUPING_CASES = [
    ('singlet', (1.5, 1.0), [(0, 1)]),
    ('cemented_doublet', (1.5, 1.6, 1.0), [(0, 1, 2)]),
    ('cemented_triplet', (1.5, 1.6, 1.7, 1.0), [(0, 1, 2, 3)]),
    ('air_spaced', (1.5, 1.0, None, 1.6, 1.0), [(0, 1), (2, 3)]),
    ('lone_dummy', (1.5, 1.0, 1.0, 1.6, 1.0), [(0, 1), (3, 4)]),
]


@pytest.mark.parametrize('label, ns, want',
                         [c for c in GROUPING_CASES],
                         ids=[c[0] for c in GROUPING_CASES])
def test_lens_element_groups(label, ns, want):
    presc, z = [], 0
    for n in ns:
        if n is None:
            z += 1  # an air gap with no surface
            continue
        presc.append(flat(z, n=n))
        z += 1
    assert lens_element_groups(presc) == want


def test_lensdata_element_groups_method_queries_the_spine(biconvex_sys):
    # the two refractors are compiled indices 1, 2 (0 is OBJECT)
    assert biconvex_sys.lens.element_groups(wvl=0.5876) == [(1, 2)]


def test_lens_element_groups_rejects_terminal_group():
    with pytest.raises(ValueError, match='terminates'):
        lens_element_groups([flat(0, n=1.5), flat(1, n=1.6)])


def test_plot_optics_skips_lone_dummy_plane():
    presc = [flat(z, n=n) for z, n in
             enumerate((1.5, 1.0, 1.0, 1.6, 1.0))]
    fig, _ = plot_optics(presc, synthetic_trace(presc), points=5, wvl=0.55)
    plt.close(fig)


def test_plot_optics_draws_stop_marker_on_dummy_plane():
    presc = [flat(z, n=n) for z, n in
             enumerate((1.5, 1.0, 1.0, 1.6, 1.0))]
    fig, ax = plot_optics(presc, synthetic_trace(presc), points=5,
                          wvl=0.55, stop_index=2)
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        # two lens groups plus the stop marker, in surface order
        assert len(ax.lines) == 3
        mx = np.asarray(ax.lines[1].get_xdata(), dtype=float)
        my = np.asarray(ax.lines[1].get_ydata(), dtype=float)
        # the synthetic rays span y = +/-1 at the stop -> semidiameter
        # 1, stem 0.2, crossbar 0.1; directions are all zero so the
        # local optical axis falls back to the surface +z.  Bottom
        # first: crossbar along z through (2, -1), stem out to -1.2
        assert mx[0] == pytest.approx(1.95)
        assert mx[1] == pytest.approx(2.05)
        assert my[0] == my[1] == -1
        assert (mx[3], my[3]) == (2, -1)
        assert mx[4] == 2 and my[4] == pytest.approx(-1.2)
        # top mirrors it, stem up and out
        assert (mx[9], my[9]) == (2, 1)
        assert mx[10] == 2 and my[10] == pytest.approx(1.2)


def test_plot_optics_marks_stop_from_system_metadata():
    rows = LensData()
    rows.add(Plane(), thickness=5.0, material=pm.air, aperture=5.0)
    rows.add(Conic(1 / 60.0, 0.0), thickness=4.0, material=GLASS15,
             aperture=8.0)
    rows.add(Conic(-1 / 60.0, 0.0), thickness=95.0, material=pm.air,
             aperture=8.0)
    rows.add(Plane(), typ='eval', material=pm.air, aperture=20.0)
    built = OpticalSystem(rows, aperture=8.0, fields=[0.0],
                          wavelengths=[0.5876], reference=0, stop_index=0)
    fig, ax = built.plot.layout_2d()
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        marks = [ln for ln in ax.lines if len(ln.get_xdata()) == 12]
        assert len(marks) == 1
        mx = np.asarray(marks[0].get_xdata(), dtype=float)
        my = np.asarray(marks[0].get_ydata(), dtype=float)
        # the T-marks cluster at the stop plane (z=0), +/- 1.2x the
        # stop semidiameter (EPD/2 = 4; the stop IS the entrance pupil)
        assert np.nanmax(np.abs(mx)) < 1.0
        assert np.nanmax(np.abs(my)) == pytest.approx(4 * 1.2, rel=1e-6)


def test_plot_optics_group_od_uses_largest_aperture_in_group():
    presc = [flat(0, n=1.5, rim=1.0), flat(1, n=1.6, rim=2.0),
             flat(2, rim=1.2)]
    _, y = first_line(presc)
    assert np.nanmax(y) == 2.0 and np.nanmin(y) == -2.0


def _bare_conic(c, z, material):
    return Surface(shape=Conic(c, 0.0), interaction='refr',
                   P=np.asarray([0., 0., z]), material=material)


def test_plot_optics_bridges_steep_surface_to_od_with_normal_segment():
    # a steep rear surface stops at its equator and bridges flat to OD
    presc = [_bare_conic(1 / 5.0, 0.0, GLASS15),
             _bare_conic(1 / 0.5, 1.0, pm.air)]
    with pytest.warns(UserWarning, match='flat edge'):
        fig, ax = plot_optics(presc, synthetic_trace(presc), points=41,
                              wvl=0.55)
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        x = np.asarray(ax.lines[0].get_xdata(), dtype=float)
        y = np.asarray(ax.lines[0].get_ydata(), dtype=float)
    assert np.isfinite(x).all() and np.isfinite(y).all()
    aac(np.max(np.abs(y)), 1.0)       # element OD preserved
    ridge = np.isclose(x, x.max())    # the constant-z bridge
    assert ridge.sum() >= 2
    aac(np.max(np.abs(y[ridge])), 1.0)
    assert np.min(np.abs(y[ridge])) <= 0.55


def test_plot_optics_draws_clear_aperture_land_to_od_silently():
    # an intentionally smaller drawn extent bridges without warning
    front = Surface(shape=Conic(1 / 50.0, 0.0), interaction='refr',
                    P=np.asarray([0., 0., 0.]), material=GLASS15,
                    aperture=drawn_only(1.0))
    rear = Surface(shape=Conic(-1 / 50.0, 0.0), interaction='refr',
                   P=np.asarray([0., 0., 1.0]), material=pm.air,
                   aperture=drawn_only(3.0))
    import warnings as w
    with w.catch_warnings():
        w.simplefilter('error')
        fig, ax = plot_optics([front, rear],
                              synthetic_trace([front, rear]),
                              points=41, wvl=0.55)
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        x = np.asarray(ax.lines[0].get_xdata(), dtype=float)
        y = np.asarray(ax.lines[0].get_ydata(), dtype=float)
    assert np.isfinite(x).all() and np.isfinite(y).all()
    aac(np.max(np.abs(y)), 3.0)       # the bigger surface sets the OD
    rim_z = float(np.asarray(front.sag(np.zeros(1), np.ones(1)))[0])
    land = np.isclose(x, rim_z) & (np.abs(y) > 1.0 + 1e-9)
    assert land.sum() >= 2
    aac(np.max(np.abs(y[land])), 3.0)


def test_plot_optics_steep_surface_capped_by_own_aperture_is_silent():
    front = Surface(shape=Conic(1 / 5.0, 0.0), interaction='refr',
                    P=np.asarray([0., 0., 0.]), material=GLASS15,
                    aperture=drawn_only(1.0))
    steep = Surface(shape=Conic(1 / 0.5, 0.0), interaction='refr',
                    P=np.asarray([0., 0., 1.0]), material=pm.air,
                    aperture=drawn_only(0.4))
    import warnings as w
    with w.catch_warnings():
        w.simplefilter('error')
        fig, _ = plot_optics([front, steep],
                             synthetic_trace([front, steep]),
                             points=41, wvl=0.55)
    plt.close(fig)


def test_plot_optics_reads_edge_features_from_surface_aperture():
    x, y = first_line([featured(SquareCut(0.5, 1.5, 0.25, side='upper')),
                       flat(2)])
    aac(x[5:10], [0.5, 0.5, 1.5, 1.5, 2.0])
    aac(y[5:10], [1.0, 0.75, 0.75, 1.0, 1.0])


def test_lensdata_add_aperture_features_propagate_to_compiled_surface():
    deco = Aperture(extent=CircularExtent(9.0),
                    features=(Chamfer(0.0, 0.5, 0.3),))
    rows = LensData()
    rows.add(Conic(1 / 60.0, 0.0), thickness=4.0, material=GLASS15,
             aperture=deco)
    rows.add(Conic(-1 / 60.0, 0.0), thickness=95.0, material=pm.air,
             aperture=8.0)
    built = OpticalSystem(rows, aperture=10.0, wavelengths=[0.5876],
                          reference=0)
    compiled = built.to_surfaces()
    assert compiled[1].aperture.features == deco.features  # [0] is OBJECT
    assert compiled[2].aperture.features == ()
    # parameter models survive as independent deep copies
    twin = built.copy().to_surfaces()[1].aperture.features[0]
    assert type(twin) is type(deco.features[0])
    assert vars(twin) == vars(deco.features[0])
    assert twin is not deco.features[0]


# ---------- mirrors and substrates --------------------------------------------

def mirror(substrate=None, *, rim=1, bore=None, shape=None, **kw):
    """A reflective surface with a drawn extent and optional substrate."""
    return Surface(
        shape=shape or Plane(), interaction='refl',
        aperture=Aperture(
            extent=CircularExtent(rim, inner_radius=bore or 0.0),
            substrate=substrate),
        **kw)


def test_plot_optics_draws_mirror_optical_surface_by_default():
    x, y = first_line([flat(0, kind='refl')])
    aac(x, np.zeros(5))
    aac(y, np.linspace(-1, 1, 5))


def test_plot_optics_draws_parallel_mirror_substrate():
    m = mirror(ParallelSubstrate(thickness=2, side=1),
               P=np.asarray([0., 0., 0.]))
    x, y = first_line([m])
    aac(x[:5], np.zeros(5))
    top = (y[:-1] == 1) & (y[1:] == 1) & (x[:-1] == 0) & (x[1:] == 2)
    bot = (y[:-1] == -1) & (y[1:] == -1) & (x[:-1] == 2) & (x[1:] == 0)
    assert top.any() and bot.any()
    aac(x[6:11], np.full(5, 2.0))


def outline_of(m, *, points=5, **kw):
    run = synthetic_trace([m])
    x, y = mirror_substrate_outline(m, run, substrate=m.aperture.substrate,
                                    points=points, **kw)
    return np.asarray(x, dtype=float), np.asarray(y, dtype=float)


def test_mirror_substrate_outline_applies_surface_decenter():
    m = mirror(ParallelSubstrate(thickness=2, side=1),
               P=np.asarray([0., 10., 5.]))
    x, y = outline_of(m)
    aac(x[:5], np.full(5, 5.0))
    aac(y[:5], np.linspace(9, 11, 5))
    aac(x[6:11], np.full(5, 7.0))


def test_mirror_substrate_outline_bores_a_through_hole():
    # an annular drawn extent renders two loops with an open bore
    m = mirror(FlatParentSubstrate(thickness=5.0, side=1),
               shape=Conic(1 / 200.0, 0.0), rim=10.0, bore=3.0,
               P=np.asarray([0., 0., 0.]))
    x, y = outline_of(m, points=41)
    # one separator between loops plus the trailing terminator
    assert np.isnan(x).sum() == 2
    keep = np.isfinite(x) & np.isfinite(y)
    assert np.all(np.abs(y[keep]) >= 3.0 - 1e-9)
    assert np.isclose(x[keep].max(), 5.0)


def test_mirror_substrate_outline_can_center_on_ray_footprint():
    m = mirror(ParallelSubstrate(thickness=2, side=1),
               P=np.asarray([0., 0., 0.]))
    hist = np.asarray([[[0., h, z] for h in (9., 10., 11.)]
                       for z in (-1., 0.)])
    run = RayTraceResult(hist, np.zeros_like(hist),
                         np.zeros(hist.shape[:-1]),
                         np.zeros(3, dtype=np.complex128))
    x, y = mirror_substrate_outline(m, run, substrate=m.aperture.substrate,
                                    center='rays', points=5)
    x, y = np.asarray(x, dtype=float), np.asarray(y, dtype=float)
    aac(x[:5], np.zeros(5))
    aac(y[:5], np.linspace(9, 11, 5))
    aac(x[6:11], np.full(5, 2.0))


def test_mirror_substrate_outline_applies_surface_tilt_in_xz_projection():
    m = mirror(ParallelSubstrate(thickness=2, side=1),
               P=np.asarray([0., 0., 0.]), R=(0, -45, 0))
    x, y = outline_of(m, x='z', y='x')
    fx, fy = x[:5], y[:5]
    assert not np.allclose(fx, fx[0])
    assert not np.allclose(fy, fy[0])
    aac(np.diff(fx) / np.diff(fy), np.full(4, -1.0))


def test_mirror_substrate_can_cut_flat_from_parent_vertex_plane():
    m = mirror(FlatParentSubstrate(thickness=2, side=1),
               shape=OffAxisConic(c=1 / 100., k=-1., dy=10), rim=5,
               P=np.asarray([0., 0., 0.]))
    x, _ = outline_of(m)
    aac(x[6:11], np.full(5, 2.0))


def test_mirror_substrate_can_cut_flat_near_aperture_for_uniform_thickness():
    m = mirror(FlatBackSubstrate(thickness=2, side=1),
               shape=OffAxisConic(c=1 / 100., k=-1., dy=10), rim=5,
               P=np.asarray([0., 0., 0.]))
    x, y = outline_of(m)
    bx, by = x[6:11], y[6:11]
    pitch = np.diff(bx) / np.diff(by)
    assert not np.allclose(bx, bx[0])
    aac(pitch, np.full(4, pitch[0]))
    face_low = float(np.asarray(m.sag(np.zeros(1),
                                      np.asarray([-5.])))[0])
    aac(bx[by == -5][0] - face_low, 2.0)


# ---------- spot diagram ------------------------------------------------------

def test_plot_spot_diagram_accepts_result_and_masks_invalid():
    hist = np.asarray([
        [[0., -1., 0.], [0., 0., 0.], [0., 1., 0.]],
        [[2., 3., 5.], [0., 1., 5.], [-2., -1., 5.]],
    ])
    run = RayTraceResult(hist, np.zeros_like(hist),
                         np.zeros(hist.shape[:-1]),
                         np.asarray([0 + 0j, 0 + 0j, 1 + 2j]))
    fig, ax = plot_spot_diagram(run)
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        # the clipped third ray is dropped; the survivors' landings stay
        aac(ax.collections[0].get_offsets(), [[2., 3.], [0., 1.]])
        assert ax.get_aspect() == 1.0


SPOT_ORIGINS = [
    ('centroid', 'centroid', [[-1., -1.], [1., 1.]]),
    ('explicit', (1., 3.), [[0., 0.], [2., 2.]]),
]


@pytest.mark.parametrize('label, origin, want', SPOT_ORIGINS,
                         ids=[c[0] for c in SPOT_ORIGINS])
def test_plot_spot_diagram_origins(label, origin, want):
    hist = np.asarray([
        [[0., 0., 0.], [0., 0., 0.]],
        [[1., 3., 5.], [3., 5., 5.]],
    ])
    fig, ax = plot_spot_diagram(hist, origin=origin)
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        aac(ax.collections[0].get_offsets(), want)


# ---------- field-sweep plotters ----------------------------------------------

def test_plot_field_curvature_plots_s_and_t_vs_field(biconvex_sys):
    sys_ = biconvex_sys
    fig, ax = plot_field_curvature(sys_, sys_.fields, label='d')
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        assert [ln.get_label() for ln in ax.lines] == ['d S', 'd T']
        for ln in ax.lines:
            aac(ln.get_ydata(), [0., 3., 5.])
        # x-values are the lab-frame foci referenced to the image vertex
        vertex_z = float(np.asarray(sys_.to_surfaces()[-1].P)[2])
        from prysm_tpu.x.raytracing.analysis import field_curvature
        fc = field_curvature(sys_, sys_.fields, sys_.wavelength())
        aac(ax.lines[0].get_xdata(), np.asarray(fc.x_fan_z) - vertex_z)
        aac(ax.lines[1].get_xdata(), np.asarray(fc.y_fan_z) - vertex_z)
        # on axis the sagittal and tangential foci coincide
        aac(ax.lines[0].get_xdata()[0], ax.lines[1].get_xdata()[0])


def test_plot_field_curvature_uses_xy_labels_for_non_pure_y_fields(
        biconvex_sys):
    skew = [Field(1.0, 1.0, unit='deg'), Field(2.0, 3.0, unit='deg')]
    fig, ax = plot_field_curvature(biconvex_sys, skew, label='d')
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        assert [ln.get_label() for ln in ax.lines] == ['d X', 'd Y']


def test_plot_chromatic_focal_shift_plots_shift_vs_wavelength(biconvex_sys):
    fig, ax = plot_chromatic_focal_shift(
        biconvex_sys, focus='paraxial', samples=9, label='paraxial')
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        ln = ax.lines[0]
        from prysm_tpu.x.raytracing.analysis import chromatic_focal_shift
        wl, dz = chromatic_focal_shift(biconvex_sys, focus='paraxial',
                                       samples=9)
        aac(ln.get_xdata(), np.asarray(wl))
        aac(ln.get_ydata(), np.asarray(dz))
        assert len(ln.get_xdata()) == 9
        assert ln.get_label() == 'paraxial'
        assert (ax.get_xlabel(), ax.get_ylabel()) == ('wavelength [um]',
                                                      'focus shift')


def test_plot_distortion_plots_percent_vs_field(biconvex_sys):
    fig, ax = plot_distortion(biconvex_sys, biconvex_sys.fields)
    with contextlib.ExitStack() as stack:
        stack.callback(plt.close, fig)
        ln = ax.lines[0]
        aac(ln.get_ydata(), [0., 3., 5.])
        from prysm_tpu.x.raytracing.analysis import distortion
        d = distortion(biconvex_sys, biconvex_sys.fields,
                       biconvex_sys.wavelength())
        aac(ln.get_xdata(), np.asarray(d.percent))
        assert ln.get_xdata()[0] == 0.0   # no distortion on axis
        assert ax.get_xlabel() == 'distortion [%]'
