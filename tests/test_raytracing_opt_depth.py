"""Ray aiming, pupil location, and spot statistics: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_opt.py (28 tests): the batched Newton ray-aiming
kernel (single ray, bundles, tilted/decentered local targets, TIR
masking, strict listing, precision floors, direction normalization),
pupil locators and the chief-axis reference sphere, a Ritchey-
Chretien end-to-end sanity check, and NaN/status-aware spot
statistics.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
from prysm_tpu.conf import config
from prysm_tpu.x.raytracing.surfaces import Conic, Plane, Surface
from prysm_tpu.x.raytracing.opt import (
    aim_rays, geometric_psf_histogram, locate_ep, locate_xp,
    rms_spot_radius, spot_centroid, xp_reference_sphere)
from prysm_tpu.x.raytracing.spencer_and_murty import (
    STATUS_CLIP, STATUS_MISS, raytrace)
from prysm_tpu.x.raytracing.paraxial import paraxial_image_distance
from prysm_tpu.x.raytracing.auto import RitcheyChretien


def plane(interaction, P, material=None, **kwargs):
    return Surface(shape=Plane(), interaction=interaction, P=P,
                   material=material, **kwargs)


def conic(c, k, interaction, P, material=None, **kwargs):
    return Surface(shape=Conic(c, k), interaction=interaction, P=P,
                   material=material, **kwargs)


def _np(x):
    return np.asarray(x)


# ---------- aim_rays: single-ray (1-row bundle) -------------------------------

def test_aim_single_ray_hits_target_on_simple_mirror():
    prescription = [
        conic(1 / 200.0, -1.0, 'refl', np.array([0., 0., 0.])),
        plane('eval', np.array([0., 0., -50.])),  # rays head -z after refl
    ]
    P = np.array([[2.0, -1.0, -100.]])
    S = np.array([[0., 0., 1.]])
    P_aimed, _, converged = aim_rays(P, S, prescription, surface_index=1,
                                     target_xy=(2.0, -1.0), wvl=0.55)
    assert bool(converged[0])
    assert P_aimed[0, 2] == -100.0  # launch z preserved
    trace = raytrace(prescription, P_aimed, S, wvl=0.55)
    np.testing.assert_allclose(_np(trace.P)[-1, 0, :2], (2.0, -1.0),
                               atol=1e-6)


def _tir_unaimable_bundle():
    """A steep ray in glass that TIRs at the glass->air interface for
    every launch, so it can never be aimed onto the eval plane."""
    prescription = [
        plane('eval', np.array([0., 0., -100.]),
              material=materials.ConstantMaterial(1.5)),
        plane('refr', np.array([0., 0., 0.]), material=materials.air),
        plane('eval', np.array([0., 0., 10.])),
    ]
    theta = np.deg2rad(60.0)
    P = np.array([[0., 0., -100.]])
    S = np.array([[np.sin(theta), 0., np.cos(theta)]])
    return prescription, P, S


def test_aim_single_ray_strict_raises_on_unaimable_ray():
    prescription, P, S = _tir_unaimable_bundle()
    with pytest.raises(RuntimeError):
        aim_rays(P, S, prescription, surface_index=2, target_xy=(0.0, 0.0),
                 wvl=0.55, strict=True)


def test_aim_single_ray_strict_false_does_not_raise():
    prescription, P, S = _tir_unaimable_bundle()
    P_out, _, converged = aim_rays(P, S, prescription, surface_index=2,
                                   target_xy=(0.0, 0.0), wvl=0.55,
                                   strict=False)
    assert P_out.shape == (1, 3)
    assert not bool(converged[0])


# ---------- aim_rays (batched kernel) -----------------------------------------

def _singlet_with_internal_stop(n_glass=1.5):
    """Two refractive conics with a plane stop between them."""
    return [
        conic(1 / 50.0, 0.0, 'refr', np.array([0., 0., 0.]),
              material=materials.ConstantMaterial(n_glass)),
        plane('eval', np.array([0., 0., 2.5])),
        conic(-1 / 50.0, 0.0, 'refr', np.array([0., 0., 5.]),
              material=materials.air),
        plane('eval', np.array([0., 0., 100.])),
    ]


def _collimated_y_fan(n, half, z0, theta_deg):
    theta = np.deg2rad(theta_deg)
    P = np.zeros((n, 3))
    P[:, 1] = np.linspace(-half, half, n)
    P[:, 2] = z0
    S = np.broadcast_to(np.array([0., np.sin(theta), np.cos(theta)]),
                        (n, 3)).copy()
    return P, S


def test_aim_rays_collimated_bundle_onto_stop():
    presc = _singlet_with_internal_stop()
    P, S = _collimated_y_fan(7, half=2.0, z0=-10.0, theta_deg=2.0)
    z_before = P[:, 2].copy()
    P_aim, _, converged = aim_rays(P, S, presc, surface_index=1,
                                   target_xy=(0.0, 0.0), wvl=0.55)
    assert bool(np.all(converged))
    np.testing.assert_array_equal(P_aim[:, 2], z_before)
    tr = raytrace(presc, P_aim, S, wvl=0.55)
    np.testing.assert_allclose(_np(tr.P)[2, :, :2], 0.0, atol=1e-9)


def test_aim_rays_onto_nonzero_target():
    presc = _singlet_with_internal_stop()
    P, S = _collimated_y_fan(5, half=2.0, z0=-10.0, theta_deg=1.0)
    P_aim, _, converged = aim_rays(P, S, presc, surface_index=1,
                                   target_xy=(0.7, -0.3), wvl=0.55)
    assert bool(np.all(converged))
    tr = raytrace(presc, P_aim, S, wvl=0.55)
    np.testing.assert_allclose(_np(tr.P)[2, :, 0], 0.7, atol=1e-9)
    np.testing.assert_allclose(_np(tr.P)[2, :, 1], -0.3, atol=1e-9)


def test_aim_rays_onto_tilted_surface():
    presc = [
        conic(1 / 50.0, 0.0, 'refr', np.array([0., 0., 0.]),
              material=materials.ConstantMaterial(1.5)),
        plane('eval', np.array([0., 0., 3.0]), tilt=(0., 8., 0.)),
        plane('eval', np.array([0., 0., 50.])),
    ]
    P, S = _collimated_y_fan(5, half=2.0, z0=-10.0, theta_deg=1.5)
    P_aim, _, converged = aim_rays(P, S, presc, surface_index=1,
                                   target_xy=(0.0, 0.0), wvl=0.55)
    assert bool(np.all(converged))
    tr = raytrace(presc, P_aim, S, wvl=0.55)
    np.testing.assert_allclose(_np(tr.P)[2, :, :2], 0.0, atol=1e-9)


def test_aim_rays_targets_are_local_to_a_decentered_tilted_surface():
    """target (0, 0) is the aim surface's vertex, not the lab axis."""
    dy = 4.0
    presc = [
        plane('eval', np.array([0., 0., 0.])),
        plane('eval', np.array([0., dy, 30.]), tilt=(12., 0., 0.)),
        plane('eval', np.array([0., 0., 60.])),
    ]
    P, S = _collimated_y_fan(5, half=2.0, z0=-10.0, theta_deg=0.0)
    P_aim, _, converged = aim_rays(P, S, presc, surface_index=1,
                                   target_xy=(0.0, 0.0), wvl=0.55)
    assert bool(np.all(converged))
    tr = raytrace(presc, P_aim, S, wvl=0.55)
    np.testing.assert_allclose(_np(tr.P)[2],
                               np.tile([0.0, dy, 30.0], (5, 1)), atol=1e-9)


def test_aim_rays_masks_divergent_ray():
    """A TIR ray is flagged not-converged; the rest of the bundle aims."""
    presc = [
        plane('eval', np.array([0., 0., -5.]),
              material=materials.ConstantMaterial(1.5)),
        plane('refr', np.array([0., 0., 0.]), material=materials.air),
        plane('eval', np.array([0., 0., 10.])),
    ]
    S = np.array([
        [np.sin(np.deg2rad(60.)), 0., np.cos(np.deg2rad(60.))],
        [0., np.sin(np.deg2rad(2.)), np.cos(np.deg2rad(2.))],
        [np.sin(np.deg2rad(2.)), 0., np.cos(np.deg2rad(2.))],
    ])
    P = np.zeros((3, 3))
    P[:, 2] = -5.0
    P_aim, _, converged = aim_rays(P, S, presc, surface_index=2,
                                   target_xy=(0.0, 0.0), wvl=0.55,
                                   strict=False)
    assert not bool(converged[0])
    assert bool(converged[1]) and bool(converged[2])
    np.testing.assert_array_equal(P_aim[0, :2], P[0, :2])
    tr = raytrace(presc, P_aim, S, wvl=0.55)
    np.testing.assert_allclose(_np(tr.P)[-1, 1:, :2], 0.0, atol=1e-9)


def test_aim_rays_strict_raises_listing_indices():
    presc = [
        plane('eval', np.array([0., 0., -5.]),
              material=materials.ConstantMaterial(1.5)),
        plane('refr', np.array([0., 0., 0.]), material=materials.air),
        plane('eval', np.array([0., 0., 10.])),
    ]
    S = np.array([
        [0., np.sin(np.deg2rad(2.)), np.cos(np.deg2rad(2.))],
        [np.sin(np.deg2rad(60.)), 0., np.cos(np.deg2rad(60.))],
    ])
    P = np.zeros((2, 3))
    P[:, 2] = -5.0
    with pytest.raises(RuntimeError, match='1'):
        aim_rays(P, S, presc, surface_index=2, target_xy=(0.0, 0.0),
                 wvl=0.55, strict=True)


@pytest.mark.parametrize('precision, atol', [(32, 1e-3), (64, 1e-9)])
def test_aim_rays_precision(precision, atol):
    """The kernel converges at 32 and 64 bit; arrays carry
    config.precision."""
    old = config._explicit
    try:
        config.precision = precision
        presc = _singlet_with_internal_stop()
        P, S = _collimated_y_fan(5, half=2.0, z0=-10.0, theta_deg=1.0)
        P_aim, _, converged = aim_rays(P, S, presc, surface_index=1,
                                       target_xy=(0.0, 0.0), wvl=0.55,
                                       tol=atol, strict=True)
        assert P_aim.dtype == config.precision
        tr = raytrace(presc, P_aim, S, wvl=0.55)
        np.testing.assert_allclose(_np(tr.P)[2, :, :2], 0.0, atol=atol)
    finally:
        config._explicit = old


@pytest.mark.parametrize('target_z, launch_sz', [(1.0, 1.0), (-1.0, -1.0)])
def test_aim_rays_direction_normalizes_proposals(target_z, launch_sz):
    """Direction aiming traces unit vectors even when the Newton variable
    leaves the transverse unit disk."""
    presc = [
        plane('eval', np.array([0., 0., target_z])),
    ]
    P = np.array([[0., 0., 0.]])
    S = np.array([[0., 0., launch_sz]])
    target_xy = (2.0, -1.5)
    _, S_aim, converged = aim_rays(P, S, presc, surface_index=0,
                                   target_xy=target_xy, wvl=0.55,
                                   vary='direction', strict=True)
    assert bool(converged[0])
    np.testing.assert_allclose(np.linalg.norm(S_aim, axis=1), 1.0,
                               atol=1e-12)
    assert np.sign(S_aim[0, 2]) == np.sign(launch_sz)
    tr = raytrace(presc, P, S_aim, wvl=0.55)
    np.testing.assert_allclose(_np(tr.P)[-1, 0, :2], target_xy, atol=1e-9)


# ---------- pupil-on-axis behavior --------------------------------------------

def test_xp_reference_sphere_axis_foot_intersecting_lines():
    P_chief = np.array([1.0, 0.0, -10.0])
    direction = np.array([-1.0, 0.0, 10.0])
    S_chief = direction / np.linalg.norm(direction)
    _, _, P_xp = xp_reference_sphere(P_chief, S_chief)
    np.testing.assert_allclose(_np(P_xp), [0.0, 0.0, 0.0], atol=1e-12)


def test_locate_ep_and_locate_xp_share_helper():
    P_chief = np.array([1.0, 0.0, -10.0])
    S_chief = np.array([-1.0, 0.0, 10.0]) / np.sqrt(101)
    P_obj = np.array([0.0, 0.0, -50.0])
    P_s1 = np.array([0.0, 0.0, 0.0])
    ep = locate_ep(P_chief, S_chief, P_obj, P_s1)
    xp = locate_xp(P_chief, S_chief, P_obj, P_s1)
    np.testing.assert_allclose(_np(ep), _np(xp), atol=1e-12)
    np.testing.assert_allclose(_np(ep), [0.0, 0.0, 0.0], atol=1e-12)


def test_xp_reference_sphere_radius_matches_geometry():
    P_chief = np.array([0.5, 0.0, 10.0])
    direction = np.array([0.5, 0.0, 10.0])
    S_chief = direction / np.linalg.norm(direction)
    C, R, P_xp = xp_reference_sphere(P_chief, S_chief)
    np.testing.assert_allclose(_np(C), P_chief)
    np.testing.assert_allclose(_np(P_xp)[:2], [0.0, 0.0], atol=1e-12)
    assert R > 0


def test_xp_reference_sphere_rejects_axial_chief():
    P_chief = np.array([0.0, 0.0, 10.0])
    S_chief = np.array([0.0, 0.0, 1.0])
    with pytest.raises(ValueError, match='near-axial chief ray'):
        xp_reference_sphere(P_chief, S_chief)


# ---------- end-to-end RC sanity check ----------------------------------------

def test_rc_prescription_paraxial_image_at_bfl():
    efl, bfl, sep = 1500.0, 250.0, 400.0
    design = RitcheyChretien(efl=efl, bfl=bfl, separation=sep)
    p = design.prescription()
    c1, c2 = p.primary_curvature, p.secondary_curvature
    k1, k2 = p.primary_conic, p.secondary_conic
    P_pm = np.array([0.0, 0.0, 0.0])
    P_sm = np.array([0.0, 0.0, -sep])
    P_img = np.array([0.0, 0.0, bfl - sep])  # bfl measured from SM
    prescription = [
        conic(c1, k1, 'refl', P_pm),
        conic(c2, k2, 'refl', P_sm),
        plane('eval', P_img),
    ]
    bfd = paraxial_image_distance(prescription, wvl=0.6328)
    img_z = float(P_sm[2]) + bfd
    np.testing.assert_allclose(img_z, P_img[2], rtol=5e-3)


# ---------- spot statistics ---------------------------------------------------

def test_spot_centroid_no_status():
    P = np.array([[1., 2., 0.], [3., 4., 0.], [5., 6., 0.]])
    np.testing.assert_allclose(_np(spot_centroid(P)), [3., 4.])


def test_spot_centroid_filters_invalid_rays():
    P = np.array([[0., 0., 0.], [10., 10., 0.], [-10., -10., 0.]])
    status = np.array([0 + 0j, 1 + STATUS_CLIP * 1j, 0 + 0j])
    np.testing.assert_allclose(_np(spot_centroid(P, status)), [-5., -5.])


def test_spot_centroid_filters_nonfinite_without_status():
    P = np.array([[0., 0., 0.], [np.nan, np.nan, np.nan], [2., 2., 0.]])
    np.testing.assert_allclose(_np(spot_centroid(P)), [1., 1.])


def test_spot_centroid_all_invalid_returns_nan():
    P = np.array([[0., 0., 0.]])
    status = np.array([1 + STATUS_CLIP * 1j])
    result = spot_centroid(P, status)
    assert np.all(np.isnan(_np(result)))


def test_rms_spot_radius_zero_for_stigmatic_spot():
    P = np.tile([1.0, 2.0, 0.0], (5, 1))
    assert rms_spot_radius(P) == pytest.approx(0.0)


def test_rms_spot_radius_unit_circle():
    P = np.array([[1., 0., 0.], [-1., 0., 0.], [0., 1., 0.],
                  [0., -1., 0.]])
    assert rms_spot_radius(P) == pytest.approx(1.0)


def test_rms_spot_radius_filters_invalid_rays():
    P = np.array([[1., 0., 0.], [-1., 0., 0.], [0., 1., 0.],
                  [0., -1., 0.], [1e6, 0., 0.]])
    status = np.array([0., 0., 0., 0., 1 + STATUS_MISS * 1j],
                      dtype=complex)
    assert rms_spot_radius(P, status) == pytest.approx(1.0)


def test_rms_spot_radius_filters_nonfinite_without_status():
    P = np.array([[1., 0., 0.], [-1., 0., 0.], [np.nan, np.nan, np.nan]])
    assert rms_spot_radius(P) == pytest.approx(1.0)


def test_rms_spot_radius_custom_centroid():
    P = np.array([[1., 1., 0.], [1., 1., 0.]])
    assert rms_spot_radius(P) == pytest.approx(0.0)
    assert rms_spot_radius(P, centroid=[0., 0.]) == \
        pytest.approx(np.sqrt(2))


def test_geometric_psf_histogram_count_matches_valid_rays():
    P = np.array([[0.1, 0.0, 0.0], [-0.1, 0.0, 0.0],
                  [0.0, 0.1, 0.0], [0.0, -0.1, 0.0]])
    H, xe, ye = geometric_psf_histogram(P, bins=8)
    assert _np(H).sum() == 4
    assert H.shape == (8, 8)


def test_geometric_psf_histogram_filters_invalid():
    P = np.array([[0., 0., 0.], [0., 0., 0.], [1e6, 0., 0.]])
    status = np.array([0 + 0j, 0 + 0j, 1 + STATUS_CLIP * 1j])
    H, _, _ = geometric_psf_histogram(P, status, bins=4)
    assert _np(H).sum() == 2


def test_geometric_psf_histogram_filters_nonfinite_without_status():
    P = np.array([[0., 0., 0.], [0., 0., 0.], [np.nan, np.nan, np.nan]])
    H, _, _ = geometric_psf_histogram(P, bins=4)
    assert _np(H).sum() == 2
