"""Status plumbing + tilt/decenter depth: port of the reference intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_status.py (13 tests) and test_raytracing_tilt_decenter.py
(10 tests): RayTraceResult attributes, status encode/decode, valid
masks, aperture clipping persistence, analytic miss, TIR, and
first-class per-surface tilt/decenter semantics.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
import prysm_tpu.x.raytracing as rt
from prysm_tpu.conf import config
from prysm_tpu.coordinates import make_rotation_matrix
from prysm_tpu.x.raytracing.surfaces import (
    Surface, annular_aperture, circular_aperture)
from prysm_tpu.x.raytracing.spencer_and_murty import (
    RayTraceResult, STATUS_CLIP, STATUS_MISS, STATUS_NEWTON, STATUS_OK,
    STATUS_TIR, decode_status, raytrace, transform_to_global_coords,
    transform_to_local_coords, valid_mask)
from prysm_tpu.x.raytracing.raygen import generate_collimated_ray_fan


def _np(x):
    return np.asarray(x)


def plane(interaction, P, material=None, **kw):
    return Surface(shape=rt.Plane(), interaction=interaction, P=P,
                   material=material, **kw)


def sphere(c, interaction, P, material=None, **kw):
    return Surface(shape=rt.Sphere(c), interaction=interaction, P=P,
                   material=material, **kw)


def conic(c, k, interaction, P, material=None, **kw):
    return Surface(shape=rt.Conic(c, k), interaction=interaction, P=P,
                   material=material, **kw)


def _parabola():
    return [conic(1 / 200., -1.0, 'reflect', np.array([0., 0., 0.])),
            plane('eval', np.array([0., 0., -50.]))]


# ---------- RayTraceResult ---------------------------------------------------

def test_raytrace_result_named_attributes():
    pres = _parabola()
    P0, S0 = generate_collimated_ray_fan(7, maxr=10.0, z=-100.0)
    P0, S0 = _np(P0), _np(S0)
    result = raytrace(pres, P0, S0, wvl=0.55)
    assert isinstance(result, RayTraceResult)
    np.testing.assert_array_equal(_np(result.P)[0], P0)
    np.testing.assert_array_equal(_np(result.S)[0], S0)
    status = _np(result.status)
    assert status.shape == (7,)
    assert np.iscomplexobj(status)
    np.testing.assert_array_equal(result.status_record.surface,
                                  status.real.astype(int))
    np.testing.assert_array_equal(result.status_record.code,
                                  status.imag.astype(int))


def test_integer_launch_arrays_promote_to_precision():
    pres = [plane('eval', np.array([0.0, 0.0, 2.0]))]
    result = raytrace(pres, [[0, 0, 0]], [[0, 0, 1]], wvl=0.55)
    expected = np.dtype(config.precision)
    assert _np(result.P).dtype == expected
    assert _np(result.S).dtype == expected
    assert _np(result.OPL).dtype == expected
    np.testing.assert_allclose(_np(result.P)[-1, 0], [0.0, 0.0, 2.0])
    np.testing.assert_allclose(_np(result.OPL)[-1, 0], 2.0)


def test_collimated_through_parabola_all_valid():
    pres = _parabola()
    P0, S0 = generate_collimated_ray_fan(11, maxr=20.0, z=-200.0)
    result = raytrace(pres, _np(P0), _np(S0), wvl=0.55)
    assert _np(valid_mask(result.status, result.P[-1])).all()
    np.testing.assert_array_equal(_np(result.status).real, len(pres))


def test_single_ray_1d_input_length1_status():
    pres = _parabola()
    result = raytrace(pres, np.array([0.0, 0.0, -100.0]),
                      np.array([0.0, 0.0, 1.0]), wvl=0.55)
    assert _np(result.status).shape == (1,)
    assert _np(valid_mask(result.status, result.P[-1]))[0]


def test_decode_status_scalar_and_array():
    assert decode_status(1 + STATUS_MISS * 1j) == 'MISS at surface 1'
    status = np.array([
        4 + STATUS_OK * 1j,
        2 + STATUS_NEWTON * 1j,
        3 + STATUS_CLIP * 1j,
        1 + STATUS_MISS * 1j,
        5 + STATUS_TIR * 1j,
    ], dtype=np.complex128)
    labels = decode_status(status)
    assert labels.shape == status.shape
    assert labels.tolist() == ['OK', 'NEWTON at surface 2',
                               'CLIPPED at surface 3', 'MISS at surface 1',
                               'TIR at surface 5']


def test_valid_mask_status_and_positions():
    status = np.array([2 + STATUS_OK * 1j, 1 + STATUS_CLIP * 1j,
                       2 + STATUS_OK * 1j], dtype=np.complex128)
    P = np.array([[0.0, 0.0, 0.0],
                  [np.nan, np.nan, np.nan],
                  [1.0, np.nan, 0.0]])
    np.testing.assert_array_equal(_np(valid_mask(status)),
                                  [True, False, True])
    np.testing.assert_array_equal(_np(valid_mask(status, P)),
                                  [True, False, False])
    np.testing.assert_array_equal(_np(valid_mask(None, P)),
                                  [True, False, False])
    assert valid_mask(None, None) is None


# ---------- clipping ---------------------------------------------------------

def test_aperture_clipping_marks_outside_rays():
    pres = [plane('eval', np.array([0., 0., 0.]),
                  aperture=lambda x, y: (x * x + y * y) <= 25.0)]
    P0, S0 = generate_collimated_ray_fan(7, maxr=9.0, z=-50.0)
    P0, S0 = _np(P0), _np(S0)
    result = raytrace(pres, P0, S0, wvl=0.55)
    launch_radii = np.hypot(P0[:, 0], P0[:, 1])
    expected = launch_radii > 5.0
    actual = _np(result.status).imag == STATUS_CLIP
    np.testing.assert_array_equal(actual, expected)
    assert np.isnan(_np(result.P)[1, actual]).all()
    assert np.isnan(_np(result.S)[1, actual]).all()
    assert np.isnan(_np(result.OPL)[1, actual]).all()
    np.testing.assert_array_equal(_np(result.status).real[actual],
                                  np.full(actual.sum(), 1.0))


def test_circular_and_annular_aperture_helpers():
    x = np.array([0.0, 2.0, 2.1])
    np.testing.assert_array_equal(
        _np(circular_aperture(2.0)(x, np.zeros_like(x))),
        [True, True, False])
    x2 = np.array([0.0, 0.5, 1.0, 2.0, 2.1])
    np.testing.assert_array_equal(
        _np(annular_aperture(1.0, 2.0)(x2, np.zeros_like(x2))),
        [False, False, True, True, False])


def test_clip_persists_downstream():
    pres = [plane('eval', np.array([0., 0., 0.]),
                  aperture=lambda x, y: x * x + y * y <= 1.0),
            plane('eval', np.array([0., 0., 5.]))]
    P0, S0 = generate_collimated_ray_fan(5, maxr=2.0, z=-10.0)
    result = raytrace(pres, _np(P0), _np(S0), wvl=0.55)
    clipped = _np(result.status).imag == STATUS_CLIP
    assert clipped.any()
    np.testing.assert_array_equal(_np(result.status).real[clipped],
                                  np.full(clipped.sum(), 1.0))
    assert np.isnan(_np(result.P)[1:, clipped]).all()
    assert np.isnan(_np(result.S)[1:, clipped]).all()
    assert np.isnan(_np(result.OPL)[1:, clipped]).all()


def test_analytic_miss_status():
    pres = [sphere(1 / 5.0, 'reflect', np.array([0., 0., 0.]))]
    P0 = np.array([[0., 0., -10.], [50., 0., -10.]])
    S0 = np.array([[0., 0., 1.], [0., 0., 1.]])
    result = raytrace(pres, P0, S0, wvl=0.55)
    assert _np(valid_mask(result.status, result.P[-1]))[0]
    status = _np(result.status)
    assert status[1].imag == STATUS_MISS
    assert status[1].real == 1.0


def test_tir_status():
    pres = [plane('eval', np.array([0., 0., -10.]),
                  material=materials.ConstantMaterial(1.5)),
            plane('refract', np.array([0., 0., 0.]),
                  material=materials.air)]
    angle = np.radians(50.0)
    P0 = np.array([[0., -10., -10.]])
    S0 = np.array([[0., np.sin(angle), np.cos(angle)]])
    result = raytrace(pres, P0, S0, wvl=0.55)
    status = _np(result.status)
    assert status[0].imag == STATUS_TIR
    assert status[0].real == 2.0


def test_mixed_batch_distinct_codes():
    pres = [sphere(1 / 100.0, 'reflect', np.array([0., 0., 0.]),
                   aperture=lambda x, y: (x * x + y * y) <= 4.0),
            plane('eval', np.array([0., 0., -10.]))]
    P0 = np.array([[0., 0., -50.], [3., 0., -50.], [200., 0., -50.]])
    S0 = np.array([[0., 0., 1.]] * 3)
    result = raytrace(pres, P0, S0, wvl=0.55)
    assert _np(valid_mask(result.status, result.P[-1]))[0]
    status = _np(result.status)
    assert status[1].imag == STATUS_CLIP
    assert status[2].imag == STATUS_MISS


# ---------- tilt / decenter --------------------------------------------------

def test_decenter_shifts_vertex():
    nominal = np.array([0., 0., 5.])
    decenter = np.array([1., 2., 0.5])
    surf = plane('eval', nominal, decenter=decenter)
    np.testing.assert_allclose(_np(surf.P), nominal + decenter)


def test_decenter_changes_intersection():
    surf = plane('eval', np.array([0., 0., 0.]), decenter=[0., 0., 3.0])
    trace = raytrace([surf], np.array([0., 0., -10.]),
                     np.array([0., 0., 1.]), wvl=0.55)
    np.testing.assert_allclose(float(_np(trace.P)[-1, 2]), 3.0,
                               atol=1e-12)


def test_decenter_validates_shape():
    with pytest.raises(ValueError, match='length-3'):
        plane('eval', np.array([0., 0., 0.]), decenter=[1.0, 2.0])


def test_coordinate_transforms_preserve_single_ray_rank():
    R = make_rotation_matrix((3.0, -7.0, 11.0))
    origin = np.array([1.0, -2.0, 3.0])
    point = np.array([4.0, 5.0, 6.0])
    direction = np.array([0.1, -0.2, 0.97])
    lp, ld = transform_to_local_coords(point, origin, direction, R)
    assert _np(lp).shape == (3,)
    assert _np(ld).shape == (3,)
    gp, gd = transform_to_global_coords(lp, origin, ld, R)
    np.testing.assert_allclose(_np(gp), point, atol=1e-12)
    np.testing.assert_allclose(_np(gd), direction, atol=1e-12)


def test_tilt_alone_sets_R():
    tilt = (10.0, 5.0, 2.0)
    surf = plane('eval', np.array([0., 0., 0.]), tilt=tilt)
    np.testing.assert_allclose(_np(surf.R),
                               _np(make_rotation_matrix(tilt)), atol=1e-12)


def test_tilt_radians_kwarg():
    angle = 0.1
    surf_deg = plane('eval', np.array([0., 0., 0.]), tilt=(0., 0., angle),
                     tilt_radians=False)
    surf_rad = plane('eval', np.array([0., 0., 0.]), tilt=(0., 0., angle),
                     tilt_radians=True)
    assert not np.allclose(_np(surf_deg.R), _np(surf_rad.R))
    surf_deg_eq = plane('eval', np.array([0., 0., 0.]),
                        tilt=(0., 0., np.degrees(angle)))
    np.testing.assert_allclose(_np(surf_deg_eq.R), _np(surf_rad.R),
                               atol=1e-12)


def test_tilt_composes_with_existing_R():
    R_base = make_rotation_matrix((0., 45., 0.))
    R_tilt = make_rotation_matrix((0., 5., 0.))
    surf = plane('eval', np.array([0., 0., 0.]), R=R_base, tilt=(0., 5., 0.))
    np.testing.assert_allclose(_np(surf.R), _np(R_base @ R_tilt), atol=1e-12)


def test_tilted_mirror_reflects_double_angle():
    alpha = np.radians(10.0)
    surf = plane('reflect', np.array([0., 0., 0.]),
                 tilt=(0., np.degrees(alpha), 0.))
    trace = raytrace([surf], np.array([0., 0., -10.]),
                     np.array([0., 0., 1.]), wvl=0.55)
    S_out = _np(trace.S)[-1]
    expected = np.array([np.sin(2 * alpha), 0.0, -np.cos(2 * alpha)])
    np.testing.assert_allclose(S_out, expected, atol=1e-9)


def test_zero_tilt_decenter_matches_unperturbed():
    P_vertex = np.array([0., 0., 5.])
    glass = materials.ConstantMaterial(1.5)
    surf_a = sphere(1 / 50.0, 'refract', P_vertex, material=glass)
    surf_b = sphere(1 / 50.0, 'refract', P_vertex, material=glass,
                    tilt=(0., 0., 0.), decenter=(0., 0., 0.))
    P0 = np.array([1., 0., -10.])
    S0 = np.array([0., 0., 1.])
    tr_a = raytrace([surf_a], P0, S0, wvl=0.55)
    tr_b = raytrace([surf_b], P0, S0, wvl=0.55)
    np.testing.assert_allclose(_np(tr_a.P), _np(tr_b.P), atol=1e-14)
    np.testing.assert_allclose(_np(tr_a.S), _np(tr_b.S), atol=1e-14)
