"""Analysis-primitive depth: port of the reference analysis suite's intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_analysis.py (48 tests): transverse ray aberration
semantics, exit-pupil resolution routes, wavefront closing media and
references, Zernike fitting, distortion conventions and signs, field
curvature vs a real-ray differential oracle, chromatic analyses,
field sweeps, and the full-field grid maps.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
import prysm_tpu.x.raytracing as rt
from prysm_tpu.x.raytracing import (
    ApertureSpec, LensData, OpticalSystem,
    annular_aperture, circular_aperture,
)
from prysm_tpu.x.raytracing.surfaces import Surface
from prysm_tpu.x.raytracing.spencer_and_murty import (
    STATUS_CLIP, raytrace, valid_mask)
from prysm_tpu.x.raytracing.launch import Field, Sampling, launch
from prysm_tpu.x.raytracing.analysis import (
    transverse_ray_aberration,
    wavefront,
    resolve_exit_pupil,
    wavefront_zernike_fit,
    distortion,
    field_curvature,
    field_sweep,
    full_field,
    chromatic_focal_shift,
    lateral_color,
)
from prysm_tpu.x.raytracing.paraxial import paraxial_image_distance
from prysm_tpu.x.raytracing._resolve import compiled_surfaces
from prysm_tpu.x.raytracing.opt import (
    hopkins_eic_closing, reference_sphere_curvature)


# ---------- fixtures ---------------------------------------------------------

def _parabola():
    """Parabolic mirror at z=0; image plane at its focus z = 1/(2c)."""
    c = -1 / 80.0
    return [
        Surface(shape=rt.Conic(c, -1.0), interaction='reflect', P=[0, 0, 0]),
        Surface(shape=rt.Plane(), interaction='eval', P=[0, 0, 1 / (2 * c)]),
    ]


def _singlet(material=None):
    """Symmetric constant-index singlet, f ~ 50 mm, image at z=100."""
    glass = material or materials.ConstantMaterial(1.5)
    return [
        Surface(shape=rt.Conic(1 / 50.0, 0.0), interaction='refract',
                P=[0, 0, 0], material=glass),
        Surface(shape=rt.Conic(-1 / 50.0, 0.0), interaction='refract',
                P=[0, 0, 5.0], material=materials.air),
        Surface(shape=rt.Plane(), interaction='eval', P=[0, 0, 100.0]),
    ]


def _doublet_system():
    """Cemented-doublet OpticalSystem with angular fields out to 1 deg."""
    lens = (LensData()
            .add(rt.Sphere(1 / 60.0), thickness=6.0,
                 material=materials.ConstantMaterial(1.5168), aperture=12.0)
            .add(rt.Sphere(-1 / 45.0), thickness=2.5,
                 material=materials.ConstantMaterial(1.673), aperture=12.0)
            .add(rt.Sphere(-1 / 130.0), thickness=0.0,
                 material=materials.air, aperture=12.0))
    sys_ = OpticalSystem(
        lens, aperture=ApertureSpec.epd(22.0),
        fields=[Field(0, 0), Field(0, 0.7), Field(0, 1.0)],
        wavelengths=[0.486, 0.587, 0.656], reference=1, stop_index=1)
    sys_.solve.image_distance()
    return sys_


def _axial_bfd(presc, wavelengths):
    surfaces = compiled_surfaces(presc)
    return np.array([paraxial_image_distance(surfaces, wvl=float(w))
                     for w in wavelengths])


# ---------- transverse_ray_aberration ---------------------------------------

def _parabola_fan():
    presc = _parabola()
    P, S = launch(presc, Field(0., 0.), 0.55e-3,
                  Sampling.fan(n=11), epd=10.0, pupil_z=-50.0)
    return presc, np.asarray(P), np.asarray(S)


def test_tra_axis_selects_pupil_column():
    presc, P, S = _parabola_fan()
    tr = raytrace(presc, P, S, 0.55e-3)
    pupil_y, _ = transverse_ray_aberration(tr.P, axis='y')
    pupil_x, _ = transverse_ray_aberration(tr.P, axis='x')
    np.testing.assert_array_equal(np.asarray(pupil_y), P[:, 1])
    np.testing.assert_array_equal(np.asarray(pupil_x), P[:, 0])


def test_tra_chief_contribution_exactly_zero():
    presc, P, S = _parabola_fan()
    tr = raytrace(presc, P, S, 0.55e-3)
    _, dy = transverse_ray_aberration(tr.P, axis='y')
    assert float(np.asarray(dy)[len(dy) // 2]) == 0.0


def test_tra_perfect_parabola_is_zero():
    presc, P, S = _parabola_fan()
    tr = raytrace(presc, P, S, 0.55e-3)
    _, dy = transverse_ray_aberration(tr.P, axis='y')
    assert float(np.max(np.abs(np.asarray(dy)))) < 1e-9


def test_tra_rejects_bad_axis():
    presc, P, S = _parabola_fan()
    tr = raytrace(presc, P, S, 0.55e-3)
    with pytest.raises(ValueError):
        transverse_ray_aberration(tr.P, axis='z')


def test_tra_drops_status_invalid_rays():
    P_hist = np.array([
        [[0., -1., 0.], [0., 0., 0.], [0., 1., 0.]],
        [[0., 100., 1.], [0., 0., 1.], [0., 1., 1.]],
    ])
    status = np.array([1 + STATUS_CLIP * 1j, 0 + 0j, 0 + 0j])
    pupil_y, dy = transverse_ray_aberration(P_hist, axis='y', chief_index=1,
                                            status=status)
    np.testing.assert_array_equal(np.asarray(pupil_y), [0., 1.])
    np.testing.assert_array_equal(np.asarray(dy), [0., 1.])


def test_tra_drops_nonfinite_rays_without_status():
    P_hist = np.array([
        [[0., -1., 0.], [0., 0., 0.], [0., 1., 0.]],
        [[0., np.nan, 1.], [0., 0., 1.], [0., 1., 1.]],
    ])
    pupil_y, dy = transverse_ray_aberration(P_hist, axis='y', chief_index=1)
    np.testing.assert_array_equal(np.asarray(pupil_y), [0., 1.])
    np.testing.assert_array_equal(np.asarray(dy), [0., 1.])


def test_tra_centroid_reference_survives_dead_chief():
    P_hist = np.array([
        [[0., -1., 0.], [0., 0., 0.], [0., 1., 0.]],
        [[0., 2., 10.], [0., np.nan, 10.], [0., 4., 10.]],
    ])
    status = np.array([0 + 0j, 1 + STATUS_CLIP * 1j, 0 + 0j])
    pupil_y, dy = transverse_ray_aberration(
        P_hist, axis='y', chief_index=1, status=status, reference='centroid')
    np.testing.assert_array_equal(np.asarray(pupil_y), [-1., 1.])
    np.testing.assert_allclose(np.asarray(dy), [-1., 1.])


def test_tra_chief_reference_raises_on_dead_chief():
    P_hist = np.array([
        [[0., -1., 0.], [0., 0., 0.], [0., 1., 0.]],
        [[0., 2., 10.], [0., np.nan, 10.], [0., 4., 10.]],
    ])
    with pytest.raises(ValueError, match='centroid'):
        transverse_ray_aberration(P_hist, axis='y', chief_index=1)


def test_tra_pupil_coordinate_is_chief_relative():
    shift = 5.0
    launch_y = np.array([-1., 0., 1.]) + shift
    P_hist = np.array([
        [[0., launch_y[0], 0.], [0., launch_y[1], 0.], [0., launch_y[2], 0.]],
        [[0., 0.3, 10.], [0., 0.0, 10.], [0., -0.3, 10.]],
    ])
    pupil_y, dy = transverse_ray_aberration(P_hist, axis='y', chief_index=1)
    np.testing.assert_allclose(np.asarray(pupil_y), [-1., 0., 1.])
    np.testing.assert_allclose(np.asarray(dy), [0.3, 0.0, -0.3])


# ---------- wavefront / resolve_exit_pupil ----------------------------------

def test_wavefront_chief_opd_zero_and_pupil_passthrough():
    presc = _singlet()
    P, S = launch(presc, Field(0., 0.), 0.55,
                  Sampling.fan(n=9), epd=4.0, pupil_z=-5.0)
    P, S = np.asarray(P), np.asarray(S)
    opd, x_pup, y_pup = wavefront(presc, P, S, 0.55, P_xp=(0, 0, 0))
    chief = len(opd) // 2
    np.testing.assert_allclose(float(np.asarray(opd)[chief]), 0.0, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(x_pup), P[:, 0])
    np.testing.assert_array_equal(np.asarray(y_pup), P[:, 1])


def test_resolve_exit_pupil_axial_chief_geometric_route_raises():
    with pytest.raises(ValueError, match='near-axial chief ray'):
        resolve_exit_pupil(_singlet(), 0.55)


def test_resolve_exit_pupil_decentered_falls_back_to_axis_route():
    ld = LensData()
    ld.add_coordbreak(decenter=(1.0, 0.0, 0.0))
    ld.add(rt.Plane(), typ='eval')
    sys_ = OpticalSystem(ld, aperture=ApertureSpec.epd(2.0))
    sys_.stop_index = 0
    P = np.array([[0.0, 0.0, -1.0], [0.1, 0.0, -1.0], [-0.1, 0.0, -1.0]])
    S = np.array([[0.010, 0.0, 1.0], [0.012, 0.0, 1.0], [0.008, 0.0, 1.0]])
    S = S / np.linalg.norm(S, axis=1, keepdims=True)
    tr = sys_.trace(P, S, 0.55)
    P_xp = resolve_exit_pupil(
        sys_, 0.55, chief=(np.asarray(tr.P)[-1, 0], np.asarray(tr.S)[-1, 0]),
        axis_point=(0, 0, 0), axis_dir=(0, 0, 1))
    assert np.all(np.isfinite(np.asarray(P_xp, dtype=float)))
    opd, x_pup, y_pup = wavefront(sys_, P, S, 0.55, P_xp=P_xp)
    assert np.isfinite(np.asarray(opd)).all()
    np.testing.assert_allclose(np.asarray(x_pup), [0.0, 0.1, -0.1])
    np.testing.assert_allclose(np.asarray(y_pup), 0.0)


def test_resolve_exit_pupil_nonaxial_needs_explicit_axis():
    ld = (LensData()
          .add_coordbreak(tilt=(0.0, 20.0, 0.0))
          .add(rt.Plane(), typ='eval'))
    sys_ = OpticalSystem(ld, aperture=ApertureSpec.epd(2.0),
                         wavelengths=[0.55], reference=0, stop_index=1)
    surf = sys_.to_surfaces()[1]
    R = np.asarray(surf.R, float)
    axis_dir = R.T @ np.array([0.0, 0.0, 1.0])
    perp = R.T @ np.array([1.0, 0.0, 0.0])
    chief_P = np.asarray(surf.P, float) + 100.0 * axis_dir + 5.0 * perp
    chief_S = axis_dir + 0.03 * perp
    chief_S = chief_S / np.linalg.norm(chief_S)
    with pytest.raises(ValueError, match='centered axial geometry'):
        resolve_exit_pupil(sys_, 0.55, chief=(chief_P, chief_S))
    P_xp = resolve_exit_pupil(sys_, 0.55, chief=(chief_P, chief_S),
                              axis_point=surf.P, axis_dir=axis_dir)
    assert np.isfinite(np.asarray(P_xp, float)).all()


def test_wavefront_closes_in_penultimate_image_medium():
    presc = _singlet()
    presc[-2].material = materials.ConstantMaterial(1.25)
    wvl = 0.55
    P, S = launch(presc, Field(0., 0.), wvl,
                  Sampling.fan(n=9), epd=4.0, pupil_z=-5.0)
    P, S = np.asarray(P), np.asarray(S)
    P_xp = np.array([0.0, 0.0, 0.0])
    opd, _, _ = wavefront(presc, P, S, wvl, P_xp=P_xp)
    tr = raytrace(presc, P, S, wvl)
    chief = len(P) // 2
    C = np.asarray(tr.P)[-1, chief]
    kappa = reference_sphere_curvature(P_xp, C)
    expected = hopkins_eic_closing(tr.P, tr.S, tr.OPL, center=C,
                                   curvature=kappa, n_image=1.25,
                                   chief_index=chief)
    in_air = hopkins_eic_closing(tr.P, tr.S, tr.OPL, center=C,
                                 curvature=kappa, n_image=1.0,
                                 chief_index=chief)
    np.testing.assert_allclose(np.asarray(opd), np.asarray(expected),
                               atol=1e-12)
    assert float(np.max(np.abs(np.asarray(expected) - np.asarray(in_air)))) \
        > 1e-8


def test_wavefront_honors_object_medium_on_surface_zero():
    object_surface = Surface(shape=rt.Plane(), interaction='eval',
                             P=[0, 0, -10.0],
                             material=materials.ConstantMaterial(1.2))
    presc = [object_surface] + _singlet()
    wvl = 0.55
    P, S = launch(presc, Field(0., 0.), wvl,
                  Sampling.fan(n=9), epd=4.0, pupil_z=-20.0)
    P, S = np.asarray(P), np.asarray(S)
    P_xp = np.array([0.0, 0.0, 0.0])
    opd, _, _ = wavefront(presc, P, S, wvl, P_xp=P_xp)
    tr = raytrace(presc, P, S, wvl)
    chief = len(P) // 2
    C = np.asarray(tr.P)[-1, chief]
    expected = hopkins_eic_closing(
        tr.P, tr.S, tr.OPL, center=C,
        curvature=reference_sphere_curvature(P_xp, C),
        n_image=1.0, chief_index=chief)
    np.testing.assert_allclose(np.asarray(opd), np.asarray(expected),
                               atol=1e-12)


def test_wavefront_parabola_diffraction_limited():
    presc, P, S = _parabola_fan()
    opd, _, _ = wavefront(presc, P, S, 0.55e-3, P_xp=(0, 0, 0))
    assert float(np.max(np.abs(np.asarray(opd)))) < 1e-9


def test_wavefront_drops_vignetted_rays():
    presc = _singlet()
    presc[0].aperture = circular_aperture(1.5)
    P, S = launch(presc, Field(0., 0.), 0.55,
                  Sampling.fan(n=9), epd=4.0, pupil_z=-5.0)
    P, S = np.asarray(P), np.asarray(S)
    tr = raytrace(presc, P, S, 0.55)
    valid = np.asarray(valid_mask(tr.status, tr.P[-1]))
    assert valid.sum() < valid.size
    opd, x_pup, y_pup = wavefront(presc, P, S, 0.55, P_xp=(0, 0, 0))
    assert np.asarray(opd).shape == (valid.sum(),)
    assert np.isfinite(np.asarray(opd)).all()
    np.testing.assert_array_equal(np.asarray(x_pup), P[valid, 0])
    np.testing.assert_array_equal(np.asarray(y_pup), P[valid, 1])


def test_wavefront_centroid_reference_for_obscured_chief():
    presc = _singlet()
    presc[0].aperture = annular_aperture(1.5, 6.0)
    P, S = launch(presc, Field(0., 0.), 0.55e-3, Sampling.hex(nrings=4),
                  epd=8.0, pupil_z=-5.0)
    P, S = np.asarray(P), np.asarray(S)
    with pytest.raises(ValueError):
        wavefront(presc, P, S, 0.55e-3, P_xp=(0, 0, 0), reference='chief')
    opd, _, _ = wavefront(presc, P, S, 0.55e-3, P_xp=(0, 0, 0),
                          reference='centroid')
    opd = np.asarray(opd, dtype=float)
    assert opd.shape[0] > 0 and np.isfinite(opd).all()


def test_wavefront_centroid_equals_chief_when_chief_alive():
    presc = _singlet()
    P, S = launch(presc, Field(0., 0.), 0.55e-3, Sampling.hex(nrings=3),
                  epd=8.0, pupil_z=-5.0)
    P, S = np.asarray(P), np.asarray(S)
    a, _, _ = wavefront(presc, P, S, 0.55e-3, P_xp=(0, 0, 0),
                        reference='chief')
    b, _, _ = wavefront(presc, P, S, 0.55e-3, P_xp=(0, 0, 0),
                        reference='centroid')
    np.testing.assert_allclose(np.asarray(a, float), np.asarray(b, float),
                               atol=1e-12)


# ---------- wavefront_zernike_fit -------------------------------------------

def _disk_samples(n, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, n)
    y = rng.uniform(-1, 1, n)
    keep = x * x + y * y <= 1.0
    return x[keep], y[keep]


def test_zernike_fit_recovers_piston():
    x, y = _disk_samples(256, 0)
    opd = 0.123 * np.ones_like(x)
    coefs, rms = wavefront_zernike_fit(
        opd, x, y, [(0, 0), (1, 1), (1, -1), (2, 0)],
        normalization_radius=1.0, norm=False)
    np.testing.assert_allclose(coefs[0], 0.123, atol=1e-12)
    assert rms < 1e-12


def test_zernike_fit_exact_for_basis_term():
    x, y = _disk_samples(1024, 7)
    rsq = x * x + y * y
    opd = 0.5 * (2.0 * rsq - 1.0)        # zero-to-peak Z(2,0)
    coefs, rms = wavefront_zernike_fit(opd, x, y, [(0, 0), (2, 0)],
                                       normalization_radius=1.0, norm=False)
    np.testing.assert_allclose(coefs[1], 0.5, atol=1e-12)
    assert rms < 1e-12


def test_zernike_fit_rejects_nonpositive_norm_radius():
    with pytest.raises(ValueError):
        wavefront_zernike_fit(np.zeros(10), np.zeros(10), np.zeros(10),
                              [(0, 0)], normalization_radius=0.0)


# ---------- distortion -------------------------------------------------------

def test_distortion_zero_on_axis():
    result = distortion(_singlet(), [Field(0., 0., unit='deg')], 0.55,
                        epd=4.0)
    np.testing.assert_allclose(np.asarray(result.real_xy)[0], 0.0, atol=1e-12)
    assert float(np.asarray(result.percent)[0]) == 0.0
    assert result.unit == 'percent'
    assert result.reference == 'paraxial:f-tan'


def test_distortion_per_field_array_shapes():
    fields = [Field(0., h, unit='deg') for h in (0., 1., 2.)]
    result = distortion(_singlet(), fields, 0.55, epd=4.0)
    assert np.asarray(result.real_xy).shape == (3, 2)
    assert np.asarray(result.paraxial_xy).shape == (3, 2)
    assert np.asarray(result.percent).shape == (3,)


def test_distortion_small_field_is_small():
    result = distortion(_singlet(), [Field(0., 0.05, unit='deg')], 0.55,
                        epd=4.0)
    assert abs(float(np.asarray(result.percent)[0])) < 0.1


def test_distortion_linear_angle_agrees_with_f_tan_at_small_field():
    field = [Field(0., 0.05, unit='deg')]
    ftan = distortion(_singlet(), field, 0.55, epd=4.0)
    lin = distortion(_singlet(), field, 0.55, epd=4.0,
                     distortion_type='linear-angle')
    np.testing.assert_allclose(np.asarray(lin.paraxial_xy),
                               np.asarray(ftan.paraxial_xy), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lin.percent),
                               np.asarray(ftan.percent), atol=1e-4)


def test_distortion_sign_splits_barrel_and_pincushion():
    field = [Field(0., 8., unit='deg')]
    barrel = distortion(_singlet(), field, 0.55, epd=4.0, pupil_z=-30.0)
    pincushion = distortion(_singlet(), field, 0.55, epd=4.0, pupil_z=30.0)
    assert float(np.asarray(barrel.percent)[0]) < 0.0
    assert float(np.asarray(pincushion.percent)[0]) > 0.0


# ---------- field curvature --------------------------------------------------

def test_field_curvature_sag_equals_tan_on_axis():
    result = field_curvature(_singlet(), [Field(0., 0., unit='deg')], 0.55)
    np.testing.assert_allclose(np.asarray(result.x_fan_z),
                               np.asarray(result.y_fan_z), atol=1e-9)
    assert result.unit == 'mm'
    assert result.reference == 'global_z'


def test_field_curvature_shapes():
    fields = [Field(0., h, unit='deg') for h in (0., 1., 2.)]
    result = field_curvature(_singlet(), fields, 0.55)
    assert np.asarray(result.x_fan_z).shape == (3,)
    assert np.asarray(result.y_fan_z).shape == (3,)


def test_field_curvature_matches_differential_ray_oracle():
    def oracle_foci(presc, field, wavelength, epd, marginal_fraction=1e-3):
        def closest_z(P0, S0, P1, S1):
            d = P1 - P0
            a, b, c = np.dot(S0, S0), np.dot(S0, S1), np.dot(S1, S1)
            e, f = np.dot(S0, d), np.dot(S1, d)
            denom = a * c - b * b
            Q0 = P0 + ((c * e - b * f) / denom) * S0
            Q1 = P1 + ((b * e - a * f) / denom) * S1
            return 0.5 * (float(Q0[2]) + float(Q1[2]))

        r = marginal_fraction * epd / 2.0
        P0, S0 = launch(presc, field, wavelength, Sampling.chief(), epd=epd)
        P = np.repeat(np.asarray(P0), 3, axis=0)
        S = np.repeat(np.asarray(S0), 3, axis=0)
        P[1, 0] += r
        P[2, 1] += r
        tr = raytrace(presc, P, S, wavelength)
        Pf, Sf = np.asarray(tr.P)[-1], np.asarray(tr.S)[-1]
        return (closest_z(Pf[0], Sf[0], Pf[1], Sf[1]),
                closest_z(Pf[0], Sf[0], Pf[2], Sf[2]))

    presc = _singlet()
    fields = [Field(0., h, unit='deg') for h in (0., 3., 6., 8.)]
    result = field_curvature(presc, fields, 0.55)
    for i, field in enumerate(fields):
        x_z, y_z = oracle_foci(presc, field, 0.55, epd=4.0)
        np.testing.assert_allclose(float(np.asarray(result.x_fan_z)[i]), x_z,
                                   atol=5e-3)
        np.testing.assert_allclose(float(np.asarray(result.y_fan_z)[i]), y_z,
                                   atol=5e-3)


# ---------- chromatic --------------------------------------------------------

def test_paraxial_bfd_constant_index_is_achromatic():
    bfd = _axial_bfd(_singlet(), [0.45, 0.55, 0.65])
    np.testing.assert_allclose(bfd, bfd[0], rtol=1e-12)


def test_chromatic_shift_paraxial_focus_matches_bfd_differences():
    presc = _singlet()
    wavelengths = [0.45, 0.55, 0.65]
    wvl, shifts = chromatic_focal_shift(presc, wavelengths, focus='paraxial',
                                        reference_wavelength=0.55)
    np.testing.assert_allclose(np.asarray(wvl), wavelengths)
    ref = _axial_bfd(presc, [0.55])[0]
    np.testing.assert_allclose(np.asarray(shifts),
                               _axial_bfd(presc, wavelengths) - ref)


def test_chromatic_shift_zero_at_reference_wavelength():
    glass = materials.FormulaMaterial(
        'GLASS', lambda w: 1.6 - 0.1 * (w - 0.45) / 0.2)
    presc = _singlet(material=glass)
    wvl, shifts = chromatic_focal_shift(presc, [0.45, 0.55, 0.65],
                                        focus='paraxial',
                                        reference_wavelength=0.55)
    np.testing.assert_allclose(np.asarray(wvl), [0.45, 0.55, 0.65])
    np.testing.assert_allclose(float(np.asarray(shifts)[1]), 0.0, atol=1e-12)
    assert float(np.asarray(shifts)[0]) != float(np.asarray(shifts)[2])


def test_chromatic_shift_best_focus_constant_index_is_flat():
    wvl, shifts = chromatic_focal_shift(_singlet(), [0.45, 0.55, 0.65],
                                        epd=4.0, reference_wavelength=0.55)
    np.testing.assert_allclose(np.asarray(shifts), 0.0, atol=1e-12)


def test_lateral_color_shape():
    fields = [Field(0., h, unit='deg') for h in (0., 1.)]
    landing = lateral_color(_singlet(), fields, [0.45, 0.55], epd=4.0)
    assert np.asarray(landing).shape == (2, 2, 2)


def test_lateral_color_constant_index_landing_is_achromatic():
    landing = np.asarray(lateral_color(_singlet(), [Field(0., 1., unit='deg')],
                                       [0.45, 0.55, 0.65], epd=4.0))
    np.testing.assert_allclose(landing[0, 0], landing[0, 1], atol=1e-12)
    np.testing.assert_allclose(landing[0, 1], landing[0, 2], atol=1e-12)


# ---------- field_sweep ------------------------------------------------------

def test_field_sweep_densifies_system_fields():
    fields = field_sweep(_doublet_system(), samples=21)
    assert len(fields) == 21
    mags = [np.hypot(f.hx, f.hy) for f in fields]
    assert mags[0] == pytest.approx(0.0)
    assert mags[-1] == pytest.approx(1.0)
    np.testing.assert_allclose(np.diff(mags), 0.05, atol=1e-12)
    assert all(f.hx == 0.0 for f in fields)


def test_field_sweep_explicit_fields_pass_through():
    explicit = [Field(0, 0.3), Field(0, 0.9)]
    assert field_sweep(_doublet_system(), explicit, samples=21) == explicit


def test_field_sweep_on_axis_only_is_single():
    fields = field_sweep(_singlet(), samples=21)
    assert len(fields) == 1
    assert fields[0].hx == fields[0].hy == 0.0


def test_field_sweep_follows_field_direction():
    sys_ = _doublet_system()
    sys_.fields.fields = [Field(0.6, 0.8)]
    fields = field_sweep(sys_, samples=5)
    mags = [np.hypot(f.hx, f.hy) for f in fields]
    assert mags[0] == pytest.approx(0.0)
    assert mags[-1] == pytest.approx(1.0)
    assert fields[-1].hx == pytest.approx(0.6)
    assert fields[-1].hy == pytest.approx(0.8)


def test_curve_analyses_use_dense_sweep_by_default():
    sys_ = _doublet_system()
    fc = field_curvature(sys_, samples=9)
    assert np.asarray(fc.x_fan_z).shape == (9,)
    dist = distortion(sys_, samples=9)
    assert np.asarray(dist.percent).shape == (9,)
    landing = lateral_color(sys_, samples=9)
    assert np.asarray(landing).shape == (9, 3, 2)


# ---------- full_field -------------------------------------------------------

def test_full_field_rms_spot_grid_geometry():
    g = full_field(_doublet_system(), 'rms spot', samples=7)
    assert g.data_unit == 'mm'
    assert g.reference == 'centroid'
    assert g.metric == 'rms spot'
    assert g.kind == 'angle' and g.unit == 'deg'
    hx, hy, data = (np.asarray(a) for a in (g.hx, g.hy, g.data))
    assert hx.shape == hy.shape == data.shape == (7, 7)
    assert float(np.max(hx)) == pytest.approx(1.0)
    r = np.hypot(hx, hy)
    assert np.isnan(data[r > 1.0 + 1e-9]).all()
    inside = data[r <= 1.0 + 1e-9]
    assert np.isfinite(inside).all() and (inside > 0).all()
    edge = [data[0, 3], data[6, 3], data[3, 0], data[3, 6]]
    np.testing.assert_allclose(edge, edge[0], rtol=1e-9)


def test_full_field_rms_wfe_positive_and_symmetric():
    g = full_field(_doublet_system(), 'rms wfe', samples=5)
    data = np.asarray(g.data)
    assert np.isfinite(data[2, 2]) and data[2, 2] > 0
    np.testing.assert_allclose(data[0, 2], data[2, 0], rtol=1e-9)


def test_full_field_distortion_zero_on_axis():
    g = full_field(_doublet_system(), 'distortion', samples=5)
    data = np.asarray(g.data)
    assert float(data[2, 2]) == pytest.approx(0.0)
    assert np.isfinite(data[0, 2])


def test_full_field_lateral_color_achromat_is_zero():
    g = full_field(_doublet_system(), 'lateral color', samples=5)
    data = np.asarray(g.data)
    np.testing.assert_allclose(data[np.isfinite(data)], 0.0, atol=1e-10)


def test_full_field_max_field_override_and_bad_metric():
    g = full_field(_doublet_system(), 'rms spot', samples=5, max_field=0.5)
    assert float(np.max(np.asarray(g.hx))) == pytest.approx(0.5)
    with pytest.raises(ValueError):
        full_field(_doublet_system(), 'sharpness', samples=5)


def test_full_field_requires_field_extent():
    with pytest.raises(ValueError):
        full_field(_singlet(), 'rms spot', samples=5, epd=4.0)
