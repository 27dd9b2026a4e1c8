"""Perturbation-to-seed mapping depth: port of the reference intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_diff_tolerance.py (14 tests): the tangent-based RMS-WFE
sensitivity against the FD sensitivity table for every perturbation
category, solve-compensator awareness, and the mapping mechanics
(coordbreak-aware surface resolution, pickup expansion, component
validation).
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
from prysm_tpu.x.raytracing import LensData, OpticalSystem
from prysm_tpu.x.raytracing.launch import Field, Sampling, launch
from prysm_tpu.x.raytracing.surfaces import Conic
from prysm_tpu.x.raytracing.spencer_and_murty import _is_measurement_surf
from prysm_tpu.x.raytracing.paraxial import paraxial_image_distance
from prysm_tpu.x.raytracing.design import WavefrontRMS
from prysm_tpu.x.raytracing.tolerance import (
    Perturbation, sensitivity_table)
from prysm_tpu.x.raytracing._diff_raytrace import wavefront_with_tangents
from prysm_tpu.x.raytracing.adjoint.seeds import (
    seed_from_perturbation, seeds_from_perturbations)

WVL = 0.5
NG = 1.6
_glass = materials.ConstantMaterial(NG)
_air = materials.air


def _place_image(sys_, gap_row):
    lens = [s for s in sys_.to_surfaces()
            if not _is_measurement_surf(s.typ)]
    bfd = float(paraxial_image_distance(lens, wvl=WVL))
    sys_.rows[gap_row].thickness = bfd
    sys_.lens._invalidate()
    return sys_


def singlet():
    lens = LensData()
    (lens.add(Conic(1 / 30.0, 0.0), typ='refr', thickness=4.0,
              material=_glass)
         .add(Conic(-1 / 30.0, 0.0), typ='refr', thickness=20.0,
              material=_air))
    sys_ = OpticalSystem(lens, aperture=10.0, wavelengths=[WVL])
    return _place_image(sys_, gap_row=2)


def singlet_cb():
    lens = LensData()
    (lens.add(Conic(1 / 30.0, 0.0), typ='refr', thickness=4.0,
              material=_glass)
         .add_coordbreak(decenter=(0., 0., 0.), tilt=(0., 0., 0.),
                         kind='basic', thickness=0.0)
         .add(Conic(-1 / 30.0, 0.0), typ='refr', thickness=20.0,
              material=_air))
    sys_ = OpticalSystem(lens, aperture=10.0, wavelengths=[WVL])
    return _place_image(sys_, gap_row=3)


def singlet_solved():
    lens = LensData()
    (lens.add(Conic(1 / 30.0, 0.0), typ='refr', thickness=4.0,
              material=_glass)
         .add(Conic(-1 / 30.0, 0.0), typ='refr', thickness=20.0,
              material=_air))
    sys_ = OpticalSystem(lens, aperture=10.0, wavelengths=[WVL])
    return sys_.solve.image_distance(wavelength=WVL)


def bundle(sys_):
    P, S = launch(sys_, Field(2.5, 2.5), WVL, Sampling.rect(n=7),
                  epd=10.0, pupil_z=-5.0)
    return np.asarray(P), np.asarray(S)


def wd_rms_sensitivities(sys_, P, S, perturbations):
    seeds = seeds_from_perturbations(perturbations)
    opd, _, _, dW = wavefront_with_tangents(
        sys_.to_surfaces(), P, S, WVL, seeds, output='length')
    opd, dW = np.asarray(opd), np.asarray(dW)
    rms = float(np.sqrt(np.mean(opd * opd)))
    return np.mean(opd[:, None] * dW, axis=0) / rms, rms


def fd_rms_sensitivities(sys_, P, S, perturbations):
    op = WavefrontRMS()

    def merit(prescription):
        return float(op.value(prescription.trace(P, S, WVL),
                              prescription, WVL))

    table = sensitivity_table(sys_, perturbations, merit)
    return table.sensitivities(), table.merit_nominal


def check(sys_, perturbations, rtol=2e-3, atol=1e-8):
    P, S = bundle(sys_)
    wd, rms = wd_rms_sensitivities(sys_, P, S, perturbations)
    fd, m_nom = fd_rms_sensitivities(sys_, P, S, perturbations)
    np.testing.assert_allclose(rms, m_nom, rtol=1e-10)
    np.testing.assert_allclose(wd, fd, rtol=rtol, atol=atol)
    return wd, fd


# ---------- per-tolerance validation -----------------------------------------

def test_curvature_surface0():
    sys_ = singlet()
    wd, _ = check(sys_, [Perturbation.normal(sys_, 'curvature', 1, 1e-6,
                                             name='c1')])
    assert abs(wd[0]) > 1e-4


def test_curvature_surface1():
    sys_ = singlet()
    check(sys_, [Perturbation.normal(sys_, 'curvature', 2, 1e-6, name='c2')])


def test_radius_alias_maps_to_curvature():
    sys_ = singlet()
    check(sys_, [Perturbation.normal(sys_, 'radius', 1, 1e-6, name='r1')])


def test_conic_surface0():
    sys_ = singlet()
    check(sys_, [Perturbation.normal(sys_, 'conic', 1, 1e-5, name='k1')])


def test_thickness_surface0_fanout():
    sys_ = singlet()
    wd, _ = check(sys_, [Perturbation.normal(sys_, 'thickness', 1, 1e-5,
                                             name='t0')])
    assert abs(wd[0]) > 1e-4


def test_tilt_coordbreak_rx():
    sys_ = singlet_cb()
    pert = Perturbation.normal(sys_, 'tilt', 2, 1e-4, name='btx',
                               component=2)
    wd, _ = check(sys_, [pert], rtol=3e-3)
    assert abs(wd[0]) > 1e-4


def test_decenter_coordbreak_dx():
    sys_ = singlet_cb()
    pert = Perturbation.normal(sys_, 'decenter', 2, 1e-5, name='dsx',
                               component=0)
    wd, _ = check(sys_, [pert], rtol=3e-3)
    assert abs(wd[0]) > 1e-4


def test_curvature_with_image_solve_is_compensator_aware():
    sys_ = singlet_solved()
    seed = seed_from_perturbation(
        Perturbation.normal(sys_, 'curvature', 1, 1e-6, name='c1'))
    assert seed.pose, 'expected a solve-induced image-plane pose tangent'
    check(sys_, [Perturbation.normal(sys_, 'curvature', 1, 1e-6, name='c1')])


def test_all_perturbations_one_trace():
    sys_ = singlet_cb()
    perts = [
        Perturbation.normal(sys_, 'curvature', 1, 1e-6, name='c1'),
        Perturbation.normal(sys_, 'conic', 1, 1e-5, name='k1'),
        Perturbation.normal(sys_, 'curvature', 3, 1e-6, name='c2'),
        Perturbation.normal(sys_, 'thickness', 1, 1e-5, name='t0'),
        Perturbation.normal(sys_, 'tilt', 2, 1e-4, name='btx', component=2),
        Perturbation.normal(sys_, 'decenter', 2, 1e-5, name='dsx',
                            component=0),
    ]
    wd, fd = check(sys_, perts, rtol=3e-3)
    assert wd.shape == (6,)


# ---------- mapping mechanics ------------------------------------------------

def test_shape_seed_resolves_index_past_coordbreak():
    sys_ = singlet_cb()
    seed = seed_from_perturbation(
        Perturbation.normal(sys_, 'curvature', 3, 1e-6, name='c2'))
    assert seed.shapes == ((2, 'c', 1.0),)


def test_conic_seed_names_k_dof():
    sys_ = singlet()
    seed = seed_from_perturbation(
        Perturbation.normal(sys_, 'conic', 1, 1e-5, name='k2'))
    assert seed.shapes == ((1, 'k', 1.0),)


def test_shape_seed_expands_through_pickup():
    sys_ = singlet()
    sys_.opt.pickup('curvature', 2, from_surface=1, scale=-1.0)
    seed = seed_from_perturbation(
        Perturbation.normal(sys_, 'curvature', 1, 1e-6, name='c1'))
    assert seed.shapes == ((1, 'c', 1.0), (2, 'c', -1.0))


def test_pose_perturbation_has_no_shape_activation():
    sys_ = singlet()
    seed = seed_from_perturbation(
        Perturbation.normal(sys_, 'thickness', 1, 1e-5, name='t0'))
    assert seed.shapes == ()
    assert seed.pose


def test_component_required_for_multi_dof_category():
    sys_ = singlet_cb()
    with pytest.raises(ValueError, match='exactly one'):
        Perturbation.normal(sys_, 'tilt', 2, 1e-4)
