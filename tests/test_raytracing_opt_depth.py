"""Ray aiming, pupil location, and spot statistics: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_opt.py (28 tests): the batched Newton ray-aiming
kernel (single ray, bundles, tilted/decentered local targets, TIR
masking, strict listing, precision floors, direction normalization),
pupil locators and the chief-axis reference sphere, a Ritchey-
Chretien end-to-end sanity check, and NaN/status-aware spot
statistics.  The behaviors are the reference's; the harness (ray
factories, aiming driver) is this repo's own.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as pm
from prysm_tpu.conf import config
from prysm_tpu.x.raytracing.surfaces import Conic, Plane, Surface
from prysm_tpu.x.raytracing.opt import (
    aim_rays, geometric_psf_histogram, locate_ep, locate_xp,
    rms_spot_radius, spot_centroid, xp_reference_sphere)
from prysm_tpu.x.raytracing.spencer_and_murty import (
    STATUS_CLIP, STATUS_MISS, raytrace)
from prysm_tpu.x.raytracing.paraxial import paraxial_image_distance
from prysm_tpu.x.raytracing.auto import RitcheyChretien

WVL = 0.55


def aac(actual, desired, **kw):
    np.testing.assert_allclose(np.asarray(actual, dtype=float), desired,
                               **kw)


def surf(shape, kind, z_or_P, n=None, **kw):
    vertex = (np.asarray([0., 0., float(z_or_P)])
              if np.isscalar(z_or_P) else np.asarray(z_or_P, dtype=float))
    glass = None if n is None else pm.ConstantMaterial(n)
    return Surface(shape=shape, interaction=kind, P=vertex, material=glass,
                   **kw)


def rays(*rows):
    """(P, S) from (px, py, pz, sx, sy, sz) rows; S normalized."""
    table = np.asarray(rows, dtype=float)
    P = table[:, :3].copy()
    S = table[:, 3:].copy()
    S /= np.linalg.norm(S, axis=1, keepdims=True)
    return P, S


def landings(prescription, P, S, at=-1):
    return np.asarray(raytrace(prescription, P, S, wvl=WVL).P)[at]


# ---------- aim_rays: single-ray (1-row bundle) -------------------------------

def test_aim_single_ray_hits_target_on_simple_mirror():
    path = [surf(Conic(1 / 200.0, -1.0), 'refl', 0.0),
            surf(Plane(), 'eval', -50.0)]  # rays go -z after reflection
    P, S = rays((2.0, -1.0, -100., 0., 0., 1.))
    aimed, _, ok = aim_rays(P, S, path, surface_index=1,
                            target_xy=(2.0, -1.0), wvl=WVL)
    assert bool(ok[0])
    assert aimed[0, 2] == -100.0  # launch z untouched
    aac(landings(path, aimed, S)[0, :2], (2.0, -1.0), atol=1e-6)


def tir_rig():
    """A steep immersed ray that totally internally reflects for every
    launch position, so aiming onto the final plane can never succeed."""
    path = [surf(Plane(), 'eval', -100.0, n=1.5),
            surf(Plane(), 'refr', 0.0, n=1.0),
            surf(Plane(), 'eval', 10.0)]
    steep = np.deg2rad(60.0)
    P, S = rays((0., 0., -100., np.sin(steep), 0., np.cos(steep)))
    return path, P, S


def test_aim_single_ray_strict_raises_on_unaimable_ray():
    path, P, S = tir_rig()
    with pytest.raises(RuntimeError):
        aim_rays(P, S, path, surface_index=2, target_xy=(0.0, 0.0),
                 wvl=WVL, strict=True)


def test_aim_single_ray_strict_false_does_not_raise():
    path, P, S = tir_rig()
    best_effort, _, ok = aim_rays(P, S, path, surface_index=2,
                                  target_xy=(0.0, 0.0), wvl=WVL,
                                  strict=False)
    assert best_effort.shape == (1, 3)
    assert not bool(ok[0])


# ---------- aim_rays (batched kernel) -----------------------------------------

def stopped_singlet(n_glass=1.5):
    """Two refractive conics straddling an internal plane stop."""
    return [surf(Conic(1 / 50.0, 0.0), 'refr', 0.0, n=n_glass),
            surf(Plane(), 'eval', 2.5),
            surf(Conic(-1 / 50.0, 0.0), 'refr', 5.0, n=1.0),
            surf(Plane(), 'eval', 100.0)]


def y_fan(count, half, z0, tilt_deg):
    heights = np.linspace(-half, half, count)
    a = np.deg2rad(tilt_deg)
    return rays(*[(0., h, z0, 0., np.sin(a), np.cos(a))
                  for h in heights])


def test_aim_rays_collimated_bundle_onto_stop():
    path = stopped_singlet()
    P, S = y_fan(7, half=2.0, z0=-10.0, tilt_deg=2.0)
    launch_z = P[:, 2].copy()
    aimed, _, ok = aim_rays(P, S, path, surface_index=1,
                            target_xy=(0.0, 0.0), wvl=WVL)
    assert bool(np.all(ok))
    np.testing.assert_array_equal(aimed[:, 2], launch_z)
    aac(landings(path, aimed, S, at=2)[:, :2], 0.0, atol=1e-9)


def test_aim_rays_onto_nonzero_target():
    path = stopped_singlet()
    P, S = y_fan(5, half=2.0, z0=-10.0, tilt_deg=1.0)
    aimed, _, ok = aim_rays(P, S, path, surface_index=1,
                            target_xy=(0.7, -0.3), wvl=WVL)
    assert bool(np.all(ok))
    at_stop = landings(path, aimed, S, at=2)
    aac(at_stop[:, 0], 0.7, atol=1e-9)
    aac(at_stop[:, 1], -0.3, atol=1e-9)


def test_aim_rays_onto_tilted_surface():
    path = [surf(Conic(1 / 50.0, 0.0), 'refr', 0.0, n=1.5),
            surf(Plane(), 'eval', 3.0, tilt=(0., 8., 0.)),
            surf(Plane(), 'eval', 50.0)]
    P, S = y_fan(5, half=2.0, z0=-10.0, tilt_deg=1.5)
    aimed, _, ok = aim_rays(P, S, path, surface_index=1,
                            target_xy=(0.0, 0.0), wvl=WVL)
    assert bool(np.all(ok))
    aac(landings(path, aimed, S, at=2)[:, :2], 0.0, atol=1e-9)


def test_aim_rays_targets_are_local_to_a_decentered_tilted_surface():
    """target (0, 0) means the aim surface's vertex, not the lab axis."""
    dy = 4.0
    path = [surf(Plane(), 'eval', 0.0),
            surf(Plane(), 'eval', [0., dy, 30.], tilt=(12., 0., 0.)),
            surf(Plane(), 'eval', 60.0)]
    P, S = y_fan(5, half=2.0, z0=-10.0, tilt_deg=0.0)
    aimed, _, ok = aim_rays(P, S, path, surface_index=1,
                            target_xy=(0.0, 0.0), wvl=WVL)
    assert bool(np.all(ok))
    aac(landings(path, aimed, S, at=2), np.tile([0.0, dy, 30.0], (5, 1)),
        atol=1e-9)


def mixed_tir_rig():
    path = [surf(Plane(), 'eval', -5.0, n=1.5),
            surf(Plane(), 'refr', 0.0, n=1.0),
            surf(Plane(), 'eval', 10.0)]
    deg = np.deg2rad
    # ray 0 is steep enough to TIR; rays 1 and 2 are gentle
    P, S = rays(
        (0., 0., -5., np.sin(deg(60.)), 0., np.cos(deg(60.))),
        (0., 0., -5., 0., np.sin(deg(2.)), np.cos(deg(2.))),
        (0., 0., -5., np.sin(deg(2.)), 0., np.cos(deg(2.))))
    return path, P, S


def test_aim_rays_masks_divergent_ray():
    """The TIR ray flags not-converged; the rest of the bundle aims."""
    path, P, S = mixed_tir_rig()
    aimed, _, ok = aim_rays(P, S, path, surface_index=2,
                            target_xy=(0.0, 0.0), wvl=WVL, strict=False)
    assert list(map(bool, ok)) == [False, True, True]
    np.testing.assert_array_equal(aimed[0, :2], P[0, :2])
    aac(landings(path, aimed, S)[1:, :2], 0.0, atol=1e-9)


def test_aim_rays_strict_raises_listing_indices():
    path, P, S = mixed_tir_rig()
    # reorder so the hopeless ray is index 1 (named in the error)
    order = [1, 0]
    with pytest.raises(RuntimeError, match='1'):
        aim_rays(P[order], S[order], path, surface_index=2,
                 target_xy=(0.0, 0.0), wvl=WVL, strict=True)


@pytest.mark.parametrize('precision, floor', [(32, 1e-3), (64, 1e-9)])
def test_aim_rays_precision(precision, floor):
    """Converges to a precision-appropriate floor at 32 and 64 bit, and
    the aimed arrays carry config.precision."""
    keep = config._explicit
    try:
        config.precision = precision
        path = stopped_singlet()
        P, S = y_fan(5, half=2.0, z0=-10.0, tilt_deg=1.0)
        aimed, _, ok = aim_rays(P, S, path, surface_index=1,
                                target_xy=(0.0, 0.0), wvl=WVL,
                                tol=floor, strict=True)
        assert aimed.dtype == config.precision
        aac(landings(path, aimed, S, at=2)[:, :2], 0.0, atol=floor)
    finally:
        config._explicit = keep


@pytest.mark.parametrize('plane_z, launch_sz', [(1.0, 1.0), (-1.0, -1.0)])
def test_aim_rays_direction_normalizes_proposals(plane_z, launch_sz):
    """Direction aiming traces unit vectors even when the Newton
    variable leaves the transverse unit disk."""
    path = [surf(Plane(), 'eval', plane_z)]
    P, S = rays((0., 0., 0., 0., 0., launch_sz))
    want = (2.0, -1.5)
    _, steered, ok = aim_rays(P, S, path, surface_index=0,
                              target_xy=want, wvl=WVL,
                              vary='direction', strict=True)
    assert bool(ok[0])
    aac(np.linalg.norm(steered, axis=1), 1.0, atol=1e-12)
    assert np.sign(steered[0, 2]) == np.sign(launch_sz)
    aac(landings(path, P, steered)[0, :2], want, atol=1e-9)


# ---------- pupil-on-axis behavior --------------------------------------------

def chief_through_origin():
    at = np.array([1.0, 0.0, -10.0])
    heading = np.array([-1.0, 0.0, 10.0])
    return at, heading / np.linalg.norm(heading)


def test_xp_reference_sphere_axis_foot_intersecting_lines():
    at, heading = chief_through_origin()
    _, _, foot = xp_reference_sphere(at, heading)
    aac(foot, [0.0, 0.0, 0.0], atol=1e-12)


def test_locate_ep_and_locate_xp_share_helper():
    at, heading = chief_through_origin()
    obj_pt = np.array([0.0, 0.0, -50.0])
    s1_pt = np.zeros(3)
    entrance = locate_ep(at, heading, obj_pt, s1_pt)
    exit_ = locate_xp(at, heading, obj_pt, s1_pt)
    # same axis, same chief -> the same answer: the z=0 crossing
    aac(entrance, np.asarray(exit_, dtype=float), atol=1e-12)
    aac(entrance, [0.0, 0.0, 0.0], atol=1e-12)


def test_xp_reference_sphere_radius_matches_geometry():
    heading = np.array([0.5, 0.0, 10.0])
    image_pt = heading.copy()
    heading = heading / np.linalg.norm(heading)
    C, R, foot = xp_reference_sphere(image_pt, heading)
    aac(C, image_pt)
    aac(np.asarray(foot, dtype=float)[:2], [0.0, 0.0], atol=1e-12)
    assert R > 0


def test_xp_reference_sphere_rejects_axial_chief():
    with pytest.raises(ValueError, match='near-axial chief ray'):
        xp_reference_sphere(np.array([0.0, 0.0, 10.0]),
                            np.array([0.0, 0.0, 1.0]))


# ---------- end-to-end RC sanity check ----------------------------------------

def test_rc_prescription_paraxial_image_at_bfl():
    efl, bfl, sep = 1500.0, 250.0, 400.0
    figures = RitcheyChretien(efl=efl, bfl=bfl,
                              separation=sep).prescription()
    sm_z = -sep
    path = [surf(Conic(figures.primary_curvature, figures.primary_conic),
                 'refl', 0.0),
            surf(Conic(figures.secondary_curvature,
                       figures.secondary_conic), 'refl', sm_z),
            surf(Plane(), 'eval', bfl - sep)]  # bfl measured from SM
    # image distance references the last powered vertex (the trailing
    # eval plane is stripped); it should land on the design BFL point
    reach = paraxial_image_distance(path, wvl=0.6328)
    aac(sm_z + reach, bfl - sep, rtol=5e-3)


# ---------- spot statistics ---------------------------------------------------

def test_spot_centroid_no_status():
    pts = np.asarray([[1., 2., 0.], [3., 4., 0.], [5., 6., 0.]])
    aac(spot_centroid(pts), [3., 4.])


def test_spot_centroid_filters_invalid_rays():
    pts = np.asarray([[0., 0., 0.], [10., 10., 0.], [-10., -10., 0.]])
    flags = np.asarray([0 + 0j, 1 + STATUS_CLIP * 1j, 0 + 0j])
    # the clipped middle ray drops; the survivors average to (-5, -5)
    aac(spot_centroid(pts, flags), [-5., -5.])


def test_spot_centroid_filters_nonfinite_without_status():
    pts = np.asarray([[0., 0., 0.], [np.nan] * 3, [2., 2., 0.]])
    aac(spot_centroid(pts), [1., 1.])


def test_spot_centroid_all_invalid_returns_nan():
    out = spot_centroid(np.zeros((1, 3)),
                        np.asarray([1 + STATUS_CLIP * 1j]))
    assert np.isnan(np.asarray(out)).all()


UNIT_RING = np.asarray([[1., 0., 0.], [-1., 0., 0.],
                        [0., 1., 0.], [0., -1., 0.]])


def test_rms_spot_radius_zero_for_stigmatic_spot():
    assert rms_spot_radius(np.tile([1.0, 2.0, 0.0], (5, 1))) == \
        pytest.approx(0.0)


def test_rms_spot_radius_unit_circle():
    assert rms_spot_radius(UNIT_RING) == pytest.approx(1.0)


def test_rms_spot_radius_filters_invalid_rays():
    with_outlier = np.vstack([UNIT_RING, [1e6, 0., 0.]])
    flags = np.zeros(5, dtype=complex)
    flags[4] = 1 + STATUS_MISS * 1j
    assert rms_spot_radius(with_outlier, flags) == pytest.approx(1.0)


def test_rms_spot_radius_filters_nonfinite_without_status():
    pts = np.asarray([[1., 0., 0.], [-1., 0., 0.], [np.nan] * 3])
    assert rms_spot_radius(pts) == pytest.approx(1.0)


def test_rms_spot_radius_custom_centroid():
    doubled = np.tile([1., 1., 0.], (2, 1))
    assert rms_spot_radius(doubled) == pytest.approx(0.0)
    assert rms_spot_radius(doubled, centroid=[0., 0.]) == \
        pytest.approx(np.sqrt(2))


def test_geometric_psf_histogram_count_matches_valid_rays():
    counts, _, _ = geometric_psf_histogram(0.1 * UNIT_RING, bins=8)
    assert np.asarray(counts).sum() == 4
    assert counts.shape == (8, 8)


def test_geometric_psf_histogram_filters_invalid():
    pts = np.asarray([[0., 0., 0.], [0., 0., 0.], [1e6, 0., 0.]])
    flags = np.asarray([0 + 0j, 0 + 0j, 1 + STATUS_CLIP * 1j])
    counts, _, _ = geometric_psf_histogram(pts, flags, bins=4)
    # 2 valid rays; the outlier neither counts nor stretches the extent
    assert np.asarray(counts).sum() == 2


def test_geometric_psf_histogram_filters_nonfinite_without_status():
    pts = np.asarray([[0., 0., 0.], [0., 0., 0.], [np.nan] * 3])
    counts, _, _ = geometric_psf_histogram(pts, bins=4)
    assert np.asarray(counts).sum() == 2
