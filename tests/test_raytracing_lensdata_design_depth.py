"""Optimizing a lens directly through design.Problem: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_lensdata_design.py (9 tests): the packed free vector,
residual tracking, EFL convergence through the constrained DLS,
mixed shape/gap DOFs, constraint vs objective routing, FD jacobians
that restore state, and spot reduction under scipy least_squares.
The reference gates its exact-jacobian path on torch; the repo's
equivalent is ``gradient='auto'`` via the jax adjoint engines.
"""
import numpy as np
import pytest
from scipy import optimize as sciopt

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
from prysm_tpu.x.raytracing import (
    FRAUNHOFER_LINES_UM, LensData, OpticalSystem)
from prysm_tpu.x.raytracing.design import (
    EFL, Problem, RmsSpotRadius, _TraceCache)
from prysm_tpu.x.raytracing.launch import Sampling
from prysm_tpu.x.raytracing.paraxial import effective_focal_length
from prysm_tpu.x.raytracing.surfaces import Conic

n_bk7 = materials.ConstantMaterial(1.5168, name='N-BK7')


def make_singlet(image_gap=95.0):
    # conics are rows 1 and 2
    lens = LensData()
    (lens.add(Conic(1 / 102.0, 0.0), thickness=6.0, material=n_bk7,
              aperture=12.0)
         .add(Conic(-1 / 102.0, 0.0), thickness=image_gap,
              material=materials.air, aperture=12.0))
    return OpticalSystem(lens, aperture=20.0, fields=[0],
                         wavelengths=list(FRAUNHOFER_LINES_UM.values()),
                         reference=1)


def _fresh_cache(prob):
    return _TraceCache(prob.system)


def test_problem_x0_is_the_packed_free_vector():
    ld = make_singlet()
    ld.opt.vary('curvature', surfaces=[1, 2])
    prob = Problem(ld, [EFL(ld.wavelength(), target=100.0)])
    np.testing.assert_allclose(prob.x0(), [1 / 102.0, -1 / 102.0])


def test_problem_residuals_track_the_free_vector():
    ld = make_singlet()
    ld.opt.vary('curvature', surfaces=1)
    wvl = ld.wavelength()
    target = 100.0
    prob = Problem(ld, [EFL(wvl, target=target)])
    r0 = prob.residuals(prob.x0())
    # residual = EFL(current) - target
    assert r0[0] == pytest.approx(
        effective_focal_length(ld.to_surfaces(), wvl=wvl) - target)


def test_lensdata_efl_optimization_converges():
    ld = make_singlet()
    ld.opt.vary('curvature', surfaces=1)  # one DOF, one operand
    wvl = ld.wavelength()
    target = 80.0
    prob = Problem(ld, constraints=[EFL(wvl, target=target)])
    res = prob.solve(damping=1e-8, xtol=1e-12, ftol=1e-12,
                     constraint_tol=1e-12)
    assert res.success
    assert effective_focal_length(ld.to_surfaces(), wvl=wvl) == \
        pytest.approx(target, rel=1e-6)


def test_lensdata_thickness_and_curvature_jointly_varied():
    # the free vector mixes shape and gap DOFs; the optimizer moves both
    ld = make_singlet()
    ld.opt.vary('curvature', surfaces=2).vary('thickness', surfaces=1)
    wvl = ld.wavelength()
    prob = Problem(ld, constraints=[EFL(wvl, target=90.0)])
    x0 = prob.x0()
    assert len(x0) == 2
    res = prob.solve(x0, damping=1e-8, maxiter=10)
    assert res.success
    assert effective_focal_length(ld.to_surfaces(), wvl=wvl) == \
        pytest.approx(90.0, rel=1e-5)


def test_focal_length_constraint_is_not_an_objective_residual():
    ld = make_singlet()
    ld.opt.vary('curvature', surfaces=1)
    wvl = ld.wavelength()
    prob = Problem(ld, constraints=[EFL(wvl, target=90.0)])
    assert prob.residuals(prob.x0()).size == 0
    assert prob.equalities(prob.x0()).shape == (1,)


def test_fd_free_jacobian_matches_numeric_merit_gradient():
    ld = make_singlet()
    ld.opt.vary('curvature', surfaces=[1, 2])
    wvl = ld.wavelength()
    prob = Problem(ld, [EFL(wvl, target=100.0)])
    x = np.asarray(prob.x0())
    J = np.asarray(prob.jacobian(x, method='fd', step=1e-7))

    # independent central-difference reference on the scalar merit
    ref = np.empty_like(J)
    for i in range(len(x)):
        h = 1e-7 * abs(x[i])
        xp = x.copy()
        xp[i] += h
        xm = x.copy()
        xm[i] -= h
        ref[i] = (prob.merit(xp) - prob.merit(xm)) / (2 * h)
    ld.opt.update(x)
    np.testing.assert_allclose(J, ref, rtol=1e-4)


def test_jacobian_restores_free_vector():
    ld = make_singlet()
    ld.opt.vary('curvature', surfaces=[1, 2])
    prob = Problem(ld, [EFL(ld.wavelength(), target=100.0)])
    x0 = np.asarray(prob.x0())
    prob.jacobian(x0)
    np.testing.assert_allclose(np.asarray(ld.opt.pack()), x0)


def test_rms_spot_operand_decreases_under_optimization():
    ld = make_singlet(image_gap=96.0)
    wvl = ld.wavelength()
    op = RmsSpotRadius(ld.field(0), wvl, Sampling.hex(nrings=3))
    ld.opt.vary('curvature', surfaces=[1, 2])
    prob = Problem(ld, [op])
    spot0 = op(ld, _fresh_cache(prob))
    res = sciopt.least_squares(prob.residuals, prob.x0(), jac='3-point',
                               max_nfev=60)
    ld.opt.update(res.x)
    spot1 = op(ld, _fresh_cache(prob))
    assert spot1 <= spot0


def test_exact_residual_jacobian_is_auto_gated():
    """gradient='fd' offers no residual jacobian; 'auto' matches FD."""
    ld = make_singlet()
    ld.opt.vary('curvature', surfaces=1)
    wvl = ld.wavelength()
    fd_prob = Problem(ld, [EFL(wvl, target=100.0)], gradient='fd')
    x0 = np.asarray(fd_prob.x0())
    assert fd_prob.residual_jacobian(x0) is None

    auto_prob = Problem(ld, [EFL(wvl, target=100.0)], gradient='auto')
    J_auto = np.atleast_2d(np.asarray(auto_prob.residual_jacobian(x0)))
    h = 1e-7 * abs(x0[0])
    rp = np.asarray(fd_prob.residuals(x0 + h))
    rm = np.asarray(fd_prob.residuals(x0 - h))
    ld.opt.update(x0)
    np.testing.assert_allclose(J_auto.ravel(), (rp - rm) / (2 * h),
                               rtol=1e-4)
