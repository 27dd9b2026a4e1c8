"""Launch + aperture depth: port of the reference suites' intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_launch.py (27 tests) and test_raytracing_aperture.py
(24 tests): Field validation and vignetting maps, Sampling patterns
and obscurations, launch geometry (pupil planes, finite conjugates,
aim-to-surface), and the unified Aperture model (clips, extents,
substrates, edge features, the aperture solve).
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
import prysm_tpu.x.raytracing as rt
from prysm_tpu.x.raytracing import LensData, OpticalSystem
from prysm_tpu.x.raytracing.surfaces import OffAxisConic, Plane, Surface
from prysm_tpu.x.raytracing.spencer_and_murty import raytrace
from prysm_tpu.x.raytracing.launch import (
    Field, Sampling, launch, _apply_vignetting)
from prysm_tpu.x.raytracing.aperture import (
    AnnularClip, Aperture, Chamfer, CircularClip, CircularExtent, Flat,
    FlatBackSubstrate, FlatParentSubstrate, ParallelSubstrate, Seat,
    SquareCut, SurfaceSubstrate, annular_aperture, circular_aperture,
)


def _np(x):
    return np.asarray(x)


def plane(interaction, P, material=None, **kw):
    return Surface(shape=rt.Plane(), interaction=interaction, P=P,
                   material=material, **kw)


def conic(c, k, interaction, P, material=None, **kw):
    return Surface(shape=rt.Conic(c, k), interaction=interaction, P=P,
                   material=material, **kw)


# ---------- Field ------------------------------------------------------------

@pytest.mark.parametrize('unit, hx, hy, ax, ay', [
    ('deg', 10.0, -5.0, np.deg2rad(10.0), np.deg2rad(-5.0)),
    ('rad', 0.1, -0.05, 0.1, -0.05),
])
def test_field_angle_radians(unit, hx, hy, ax, ay):
    gx, gy = Field(hx=hx, hy=hy, kind='angle', unit=unit).angle_radians()
    np.testing.assert_allclose(gx, ax)
    np.testing.assert_allclose(gy, ay)


def test_field_height_rejects_angle_radians():
    with pytest.raises(ValueError):
        Field(hx=2.0, hy=0.0, kind='height', object_z=-10.0).angle_radians()


@pytest.mark.parametrize('kwargs', [
    dict(hx=2.0, hy=0.0, kind='height'),
    dict(kind='bogus'),
    dict(unit='furlongs'),
])
def test_field_constructor_validation(kwargs):
    with pytest.raises(ValueError):
        Field(**kwargs)


def test_field_vignetting_stored_verbatim():
    f = Field(0.0, 0.0, vignetting={'vuy': 0.3, 'vly': -0.25})
    assert f.vignetting == {'vux': 0.0, 'vlx': 0.0, 'vuy': 0.3, 'vly': -0.25}
    f = Field(0.0, 0.0, vignetting={'vux': 0.0, 'vuy': 0.0})
    assert f.vignetting is None


def test_field_vignetting_rejects_degenerate_factor():
    with pytest.raises(ValueError):
        Field(0.0, 0.0, vignetting={'vuy': 1.0})


def test_vignetting_compresses_per_side():
    f = Field(0.0, 0.0, vignetting={'vux': 0.5, 'vlx': -0.5,
                                    'vuy': 0.3, 'vly': 0.1})
    xy = np.asarray([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0],
                     [0.0, 0.0]])
    out = _np(_apply_vignetting(xy, f))
    assert out.shape == xy.shape
    np.testing.assert_allclose(out[0], [0.5, 0.0])
    np.testing.assert_allclose(out[1], [-1.5, 0.0])
    np.testing.assert_allclose(out[2], [0.0, 0.7])
    np.testing.assert_allclose(out[3], [0.0, -0.9])
    np.testing.assert_allclose(out[4], [0.0, 0.0])


# ---------- Sampling ---------------------------------------------------------

def test_sampling_points_scales_normalized():
    xy = np.asarray([[0.0, 1.0], [0.5, -0.5], [0.0, 0.0]])
    np.testing.assert_allclose(_np(Sampling.points(xy).build(4.0)), xy * 4.0)


def test_sampling_chief():
    xy = _np(Sampling.chief().build(extent=10.0))
    assert xy.shape == (1, 2)
    np.testing.assert_array_equal(xy[0], [0., 0.])


@pytest.mark.parametrize('axis, zero_col, val_col', [('y', 0, 1),
                                                     ('x', 1, 0)])
def test_sampling_fan_axis(axis, zero_col, val_col):
    xy = _np(Sampling.fan(n=11, axis=axis).build(extent=5.0))
    assert xy.shape == (11, 2)
    np.testing.assert_allclose(xy[:, zero_col], 0.0, atol=1e-12)
    assert xy[0, val_col] == pytest.approx(-5.0)
    assert xy[-1, val_col] == pytest.approx(5.0)


def test_sampling_fan_rejects_bad_axis():
    with pytest.raises(ValueError):
        Sampling.fan(n=5, axis='z')


def test_sampling_cross_count():
    assert _np(Sampling.cross(n=11).build(extent=3.0)).shape == (22, 2)


def test_sampling_rect_count():
    assert _np(Sampling.rect(n=5).build(extent=1.0)).shape == (25, 2)


def test_sampling_hex_count():
    assert _np(Sampling.hex(nrings=3).build(extent=10.0)).shape == \
        (1 + 3 * 3 * 4, 2)


def test_sampling_unknown_kind_raises():
    with pytest.raises(ValueError):
        Sampling('bogus').build(extent=1.0)


def test_sampling_obscuration_drops_center():
    extent, eps = 10.0, 0.3
    full = _np(Sampling.hex(nrings=4).build(extent=extent))
    annular = _np(Sampling.hex(nrings=4, obscuration=eps).build(
        extent=extent))
    r_full = np.hypot(full[:, 0], full[:, 1])
    r_ann = np.hypot(annular[:, 0], annular[:, 1])
    assert len(annular) == int((r_full >= eps * extent).sum())
    assert len(annular) < len(full)
    assert r_ann.min() >= eps * extent - 1e-9


def test_sampling_fan_obscuration_gap():
    xy = _np(Sampling.fan(n=21, axis='y', obscuration=0.25).build(extent=4.0))
    assert np.all(np.abs(xy[:, 1]) >= 0.25 * 4.0 - 1e-9)


# ---------- launch -----------------------------------------------------------

def _mirror_prescription():
    c = -1 / 80.0
    return [conic(c, -1.0, 'reflect', [0, 0, 0]),
            plane('eval', [0, 0, 1.0 / (2.0 * c)])]


def test_launch_chief_zero_field_is_pure_z():
    P, S = launch(_mirror_prescription(), Field(0., 0.), 0.55e-3,
                  Sampling.chief(), epd=0.0)
    P, S = _np(P), _np(S)
    assert P.shape == (1, 3) and S.shape == (1, 3)
    np.testing.assert_allclose(S[0], [0., 0., 1.], atol=1e-15)


def test_launch_field_tilt_sets_Sy():
    _, S = launch(_mirror_prescription(), Field(0., 5., unit='deg'),
                  0.55e-3, Sampling.chief(), epd=0.0)
    S = _np(S)
    np.testing.assert_allclose(S[0, 0], 0.0, atol=1e-12)
    np.testing.assert_allclose(S[0, 1], np.sin(np.deg2rad(5.0)))


def test_launch_pupil_z_defaults_to_first_surface():
    presc = _mirror_prescription()
    P, _ = launch(presc, Field(0., 0.), 0.55e-3, Sampling.fan(n=5), epd=10.0)
    np.testing.assert_array_equal(_np(P)[:, 2],
                                  float(np.asarray(presc[0].P)[2]))


def test_launch_pupil_z_override():
    P, _ = launch(_mirror_prescription(), Field(0., 0.), 0.55e-3,
                  Sampling.chief(), epd=0.0, pupil_z=-50.0)
    assert float(_np(P)[0, 2]) == -50.0


def test_launch_requires_epd_for_non_chief():
    with pytest.raises(ValueError):
        launch(_mirror_prescription(), Field(0., 0.), 0.55e-3,
               Sampling.fan(n=5))


def test_launch_pupil_extent_overrides_epd():
    P, _ = launch(_mirror_prescription(), Field(0., 0.), 0.55e-3,
                  Sampling.fan(n=5, axis='y'), epd=2.0, pupil_extent=7.0)
    assert float(_np(P)[:, 1].max()) == pytest.approx(7.0)


def test_launch_finite_conjugate_object_point():
    field = Field(0.5, -0.25, kind='height', object_z=-20.0)
    P, S = launch(_mirror_prescription(), field, 0.55e-3, Sampling.rect(n=4),
                  epd=2.0)
    P, S = _np(P), _np(S)
    np.testing.assert_allclose(P[:, 0], 0.5)
    np.testing.assert_allclose(P[:, 1], -0.25)
    np.testing.assert_allclose(P[:, 2], -20.0)
    np.testing.assert_allclose(np.linalg.norm(S, axis=-1), 1.0)


def test_launch_finite_conjugate_passes_through_pupil():
    field = Field(0.0, 0.0, kind='height', object_z=-15.0)
    P, S = launch(_mirror_prescription(), field, 0.55e-3, Sampling.rect(n=3),
                  epd=2.0, pupil_z=0.0)
    P, S = _np(P), _np(S)
    dt = (0.0 - P[:, 2]) / S[:, 2]
    arrived = P + dt[:, np.newaxis] * S
    np.testing.assert_allclose(arrived[:, :2],
                               _np(Sampling.rect(n=3).build(1.0)),
                               atol=1e-12)


def test_launch_collimated_beam_traces_to_focus():
    presc = _mirror_prescription()
    P, S = launch(presc, Field(0., 0.), 0.55e-3, Sampling.fan(n=11),
                  epd=10.0, pupil_z=-50.0)
    tr = raytrace(presc, _np(P), _np(S), 0.55e-3)
    assert float(np.max(np.abs(_np(tr.P)[-1, :, 1]))) < 1e-10


def _singlet_with_internal_stop(n_glass=1.5):
    return [
        conic(1 / 50.0, 0.0, 'refract', [0, 0, 0],
              material=materials.ConstantMaterial(n_glass)),
        plane('eval', [0, 0, 2.5]),
        conic(-1 / 50.0, 0.0, 'refract', [0, 0, 5.0],
              material=materials.air),
        plane('eval', [0, 0, 100.0]),
    ]


def test_launch_aim_to_stop_chief_lands_at_zero():
    presc = _singlet_with_internal_stop()
    P, S = launch(presc, Field(0., 1., unit='deg'), 0.55, Sampling.chief(),
                  epd=4.0, pupil_z=-10.0, aim_to=1)
    tr = raytrace(presc, _np(P), _np(S), 0.55)
    np.testing.assert_allclose(_np(tr.P)[2, 0, :2], (0., 0.), atol=1e-7)


def test_launch_aim_to_finite_keeps_object_point():
    presc = _singlet_with_internal_stop()
    fld = Field(0.0, 1.0, kind='height', object_z=-10.0)
    P, S = launch(presc, fld, 0.55, Sampling.fan(n=3), epd=10.0,
                  aim_to=1, aim_strict=False)
    np.testing.assert_allclose(_np(P), np.array([[0.0, 1.0, -10.0]] * 3),
                               atol=1e-12)
    tr = raytrace(presc, _np(P), _np(S), 0.55)
    np.testing.assert_allclose(_np(tr.P)[2, :, :2], 0.0, atol=1e-7)


# ---------- Aperture: clips --------------------------------------------------

def test_float_clip_wraps_circular():
    ap = Aperture(2.0)
    assert isinstance(ap.clip, CircularClip)
    inside = _np(ap.clips(np.asarray([0.0, 1.9, 2.1]), np.zeros(3)))
    np.testing.assert_array_equal(inside, [True, True, False])


def test_no_clip_passes_everything():
    ap = Aperture()
    assert bool(ap.clips(np.asarray([1e9]), np.asarray([1e9])))
    converged = np.asarray([True, True])
    assert not (converged & ~_np(ap.clips(np.zeros(2), np.zeros(2)))).any()


def test_annular_clip_blocks_central_disk():
    clip = annular_aperture(1.0, 3.0)
    assert isinstance(clip, AnnularClip)
    r = np.asarray([0.5, 2.0, 3.5])
    np.testing.assert_array_equal(_np(clip(r, np.zeros_like(r))),
                                  [False, True, False])
    assert clip.limiting_radius == 3.0


def test_circular_aperture_radius_and_center():
    assert circular_aperture(4.0).limiting_radius == 4.0
    assert Aperture().center() == (0.0, 0.0)
    assert Aperture(circular_aperture(4.0, x0=1.5, y0=-2.5)).center() == \
        (1.5, -2.5)


# ---------- Aperture: radii / solve ------------------------------------------

def test_limiting_radius_precedence():
    assert Aperture(2.0).limiting_radius(footprint=9.0) == 2.0
    assert Aperture().limiting_radius(footprint=9.0) == 9.0
    assert Aperture().limiting_radius() is None


def test_drawn_radius_oversize_rules():
    assert Aperture(2.0).drawn_radius() == pytest.approx(2.0 * 1.05)
    assert Aperture().drawn_radius(footprint=3.0) == pytest.approx(3.0 * 1.05)
    assert Aperture(extent=CircularExtent(5.0)).drawn_radius() == 5.0


def test_is_auto_semantics():
    assert Aperture().is_auto
    assert not Aperture(2.0).is_auto
    assert not Aperture(extent=CircularExtent(5.0)).is_auto


def test_solve_extent_stamps_version():
    ap = Aperture()
    assert ap.is_stale(7)
    ap.solve_extent(10.0, version=7)
    assert ap.extent.outer_radius == pytest.approx(10.0 * 1.05)
    assert not ap.is_stale(7)
    assert ap.is_stale(8)


def test_user_clip_never_stale():
    assert not Aperture(2.0).is_stale(123)


def test_circular_extent_outline_bore():
    ploty, mask = CircularExtent(2.0, inner_radius=0.5).outline(5)
    np.testing.assert_allclose(_np(ploty), np.linspace(-2.0, 2.0, 5))
    np.testing.assert_array_equal(_np(mask), np.abs(_np(ploty)) < 0.5)
    ploty2, _ = CircularExtent(2.0, inner_radius=0.5).outline(5, radius=3.0)
    np.testing.assert_allclose(_np(ploty2), np.linspace(-3.0, 3.0, 5))


# ---------- substrates -------------------------------------------------------

def _front_profile(surf, outer, points=5, center=0.0):
    ploty = center + np.linspace(-outer, outer, points)
    sag = np.asarray(surf.sag(np.zeros_like(ploty), ploty)) \
        + float(np.asarray(surf.P)[2])
    return ploty, sag


def _plane_mirror(z=0.0):
    return Surface(shape=Plane(), interaction='reflect',
                   P=np.asarray([0.0, 0.0, z]))


def test_surface_substrate_face_only():
    surf = _plane_mirror()
    ploty, sag = _front_profile(surf, 1.0)
    zz, tt = SurfaceSubstrate().back_outline(surf, ploty, sag, 0.0)
    np.testing.assert_allclose(_np(zz), sag)
    np.testing.assert_allclose(_np(tt), ploty)


def test_parallel_substrate_uniform_shell():
    surf = _plane_mirror()
    ploty, sag = _front_profile(surf, 1.0)
    zz, _ = ParallelSubstrate(thickness=2.0, side=1).back_outline(
        surf, ploty, sag, 0.0)
    zz = _np(zz)
    np.testing.assert_allclose(zz[:5], np.zeros(5))
    np.testing.assert_allclose(zz[6:11], np.full(5, 2.0))


def test_flat_parent_substrate_plane():
    surf = Surface(shape=OffAxisConic(c=1 / 100., k=-1., dy=10),
                   interaction='reflect', P=np.asarray([0.0, 0.0, 0.0]))
    ploty, sag = _front_profile(surf, 5.0)
    zz, _ = FlatParentSubstrate(thickness=2.0, side=1).back_outline(
        surf, ploty, sag, 0.0)
    np.testing.assert_allclose(_np(zz)[6:11], np.full(5, 2.0))


def test_flat_back_substrate_parallel_to_tangent():
    surf = Surface(shape=OffAxisConic(c=1 / 100., k=-1., dy=10),
                   interaction='reflect', P=np.asarray([0.0, 0.0, 0.0]))
    ploty, sag = _front_profile(surf, 5.0)
    zz, tt = FlatBackSubstrate(thickness=2.0, side=1).back_outline(
        surf, ploty, sag, 0.0)
    rear_x = _np(zz)[6:11].astype(float)
    rear_y = _np(tt)[6:11].astype(float)
    slope = np.diff(rear_x) / np.diff(rear_y)
    np.testing.assert_allclose(slope, np.full(4, slope[0]))
    front_lower = float(np.asarray(
        surf.sag(np.asarray([0.]), np.asarray([-5.])))[0])
    np.testing.assert_allclose(rear_x[rear_y == -5][0] - front_lower, 2.0)


def test_parallel_substrate_auto_side():
    surf = Surface(shape=OffAxisConic(c=1 / 100., k=-1., dy=10),
                   interaction='reflect', P=np.asarray([0.0, 0.0, 0.0]))
    ploty, sag = _front_profile(surf, 5.0)
    zz, _ = ParallelSubstrate(thickness=2.0).back_outline(
        surf, ploty, sag, 0.0)
    zz = _np(zz)
    np.testing.assert_allclose(np.abs(zz[6:11] - sag[::-1]), np.full(5, 2.0))


def test_bored_substrate_two_open_loops():
    surf = _plane_mirror()
    ploty, sag = _front_profile(surf, 10.0, points=41)
    zz, tt = ParallelSubstrate(thickness=5.0, side=1, bore=3.0).back_outline(
        surf, ploty, sag, 0.0)
    zz = np.asarray(zz, dtype=float)
    tt = np.asarray(tt, dtype=float)
    # NaN separators split the outline into one closed loop per side
    # each loop is NaN-terminated (reference layout)
    assert np.isnan(zz).sum() == 2
    finite = np.isfinite(tt)
    assert np.all(np.abs(tt[finite]) >= 3.0 - 1e-9)


# ---------- edge features ----------------------------------------------------

def test_square_cut_and_flat_share_span():
    assert SquareCut(0.5, 1.5, 0.25).span(0.0, 2.0, ('front', 'rear')) == \
        (0.5, 1.5, 0.25)
    assert Flat(0.5, 1.5, 0.25).span(0.0, 2.0, ('front', 'rear')) == \
        (0.5, 1.5, 0.25)
    assert not SquareCut(0.5, 1.5, 0.25).is_chamfer


def test_chamfer_marked():
    assert Chamfer(0.5, 1.0, 0.2).is_chamfer


def test_seat_steps_from_named_face():
    assert Seat('front', 0.5, 0.2).span(0.0, 2.0, ('front', 'rear')) == \
        (0.0, 0.5, 0.2)
    assert Seat('rear', 0.5, 0.2).span(0.0, 2.0, ('front', 'rear')) == \
        (1.5, 2.0, 0.2)


def test_feature_side_filter():
    f = SquareCut(0.5, 1.5, 0.25, side='upper')
    assert f.applies_to('upper')
    assert not f.applies_to('lower')
    assert SquareCut(0, 1, 0.1).applies_to('lower')


# ---------- aperture solve ---------------------------------------------------

def test_solve_apertures_sizes_auto_skips_clip():
    n15 = materials.ConstantMaterial(1.5)
    lens = LensData()
    (lens.add(rt.Sphere(1 / 50.0), thickness=4.0, material=n15)
         .add(rt.Sphere(-1 / 50.0), thickness=40.0, material=materials.air,
              aperture=8.0))
    sys_ = OpticalSystem(lens, aperture=10.0, fields=[0.0, 3.0],
                         wavelengths=[0.5876], reference=0)
    front = lens.rows[1].aperture
    rear = lens.rows[2].aperture
    assert front.is_auto and front.extent is None
    assert front.is_stale(lens._version)
    assert not rear.is_auto

    sys_.solve.apertures()

    assert front.extent is not None
    assert not front.is_stale(lens._version)
    assert 4.0 < front.extent.outer_radius < 8.0
    assert rear.extent is None
    assert rear._solved_at_version is None


def test_solve_apertures_restamps_after_edit():
    n15 = materials.ConstantMaterial(1.5)
    lens = LensData().add(rt.Sphere(1 / 50.0), thickness=4.0, material=n15)
    lens.add(rt.Sphere(-1 / 50.0), thickness=40.0, material=materials.air)
    sys_ = OpticalSystem(lens, aperture=10.0, fields=[0.0],
                         wavelengths=[0.5876], reference=0)
    sys_.solve.apertures()
    ap = lens.rows[1].aperture
    assert not ap.is_stale(lens._version)
    lens.rows[1].thickness = 5.0
    assert ap.is_stale(lens._version)
