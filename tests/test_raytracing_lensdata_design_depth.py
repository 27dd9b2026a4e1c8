"""Optimizing a lens directly through design.Problem: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_lensdata_design.py (9 tests): the packed free vector,
residual tracking, EFL convergence through the constrained DLS,
mixed shape/gap DOFs, constraint vs objective routing, FD jacobians
that restore state, and spot reduction under scipy least_squares.
The reference gates its exact-jacobian path on torch; the repo's
equivalent is ``gradient='auto'`` via the jax adjoint engines.  The
behaviors are the reference's; the harness is this repo's own.
"""
import numpy as np
import pytest
from scipy import optimize as sciopt

import jax  # NOQA: F401

import prysm_tpu.x.materials as pm
from prysm_tpu.x.raytracing import (
    FRAUNHOFER_LINES_UM, LensData, OpticalSystem)
from prysm_tpu.x.raytracing.design import (
    EFL, Problem, RmsSpotRadius, _TraceCache)
from prysm_tpu.x.raytracing.launch import Sampling
from prysm_tpu.x.raytracing.paraxial import effective_focal_length
from prysm_tpu.x.raytracing.surfaces import Conic

CROWN = pm.ConstantMaterial(1.5168, name='N-BK7')
C0 = 1 / 102.0


def rig(gap=95.0, *varies):
    """Biconvex singlet system; conics are rows 1 and 2.

    Each element of varies is ('category', row_selector); the matching
    DOFs register before the system returns.
    """
    spine = LensData()
    spine.add(Conic(C0, 0.0), thickness=6.0, material=CROWN,
              aperture=12.0)
    spine.add(Conic(-C0, 0.0), thickness=gap, material=pm.air,
              aperture=12.0)
    built = OpticalSystem(spine, aperture=20.0, fields=[0],
                          wavelengths=list(FRAUNHOFER_LINES_UM.values()),
                          reference=1)
    for category, rows in varies:
        built.opt.vary(category, surfaces=rows)
    return built


def efl_of(system):
    return effective_focal_length(system.to_surfaces(),
                                  wvl=system.wavelength())


def test_problem_x0_is_the_packed_free_vector():
    sys_ = rig(95.0, ('curvature', [1, 2]))
    prob = Problem(sys_, [EFL(sys_.wavelength(), target=100.0)])
    np.testing.assert_allclose(prob.x0(), [C0, -C0])


def test_problem_residuals_track_the_free_vector():
    sys_ = rig(95.0, ('curvature', 1))
    prob = Problem(sys_, [EFL(sys_.wavelength(), target=100.0)])
    # residual = EFL(current) - target
    first = float(np.asarray(prob.residuals(prob.x0()))[0])
    assert first == pytest.approx(efl_of(sys_) - 100.0)


def test_lensdata_efl_optimization_converges():
    sys_ = rig(95.0, ('curvature', 1))  # one DOF, one operand
    prob = Problem(sys_, constraints=[EFL(sys_.wavelength(),
                                          target=80.0)])
    outcome = prob.solve(damping=1e-8, xtol=1e-12, ftol=1e-12,
                         constraint_tol=1e-12)
    assert outcome.success
    assert efl_of(sys_) == pytest.approx(80.0, rel=1e-6)


def test_lensdata_thickness_and_curvature_jointly_varied():
    # the free vector mixes shape and gap DOFs; the optimizer moves both
    sys_ = rig(95.0, ('curvature', 2), ('thickness', 1))
    prob = Problem(sys_, constraints=[EFL(sys_.wavelength(),
                                          target=90.0)])
    start = prob.x0()
    assert start.size == 2
    outcome = prob.solve(start, damping=1e-8, maxiter=10)
    assert outcome.success
    assert efl_of(sys_) == pytest.approx(90.0, rel=1e-5)


def test_focal_length_constraint_is_not_an_objective_residual():
    sys_ = rig(95.0, ('curvature', 1))
    prob = Problem(sys_, constraints=[EFL(sys_.wavelength(),
                                          target=90.0)])
    start = prob.x0()
    assert prob.residuals(start).size == 0
    assert prob.equalities(start).shape == (1,)


def test_fd_free_jacobian_matches_numeric_merit_gradient():
    sys_ = rig(95.0, ('curvature', [1, 2]))
    prob = Problem(sys_, [EFL(sys_.wavelength(), target=100.0)])
    at = np.asarray(prob.x0())
    grad = np.asarray(prob.jacobian(at, method='fd', step=1e-7))

    # independent central differences on the scalar merit
    check = np.empty_like(grad)
    for k in range(at.size):
        h = 1e-7 * abs(at[k])
        up, down = at.copy(), at.copy()
        up[k] += h
        down[k] -= h
        check[k] = (prob.merit(up) - prob.merit(down)) / (2 * h)
    sys_.opt.update(at)
    np.testing.assert_allclose(grad, check, rtol=1e-4)


def test_jacobian_restores_free_vector():
    sys_ = rig(95.0, ('curvature', [1, 2]))
    prob = Problem(sys_, [EFL(sys_.wavelength(), target=100.0)])
    start = np.asarray(prob.x0())
    prob.jacobian(start)
    np.testing.assert_allclose(np.asarray(sys_.opt.pack()), start)


def test_rms_spot_operand_decreases_under_optimization():
    sys_ = rig(96.0, ('curvature', [1, 2]))
    op = RmsSpotRadius(sys_.field(0), sys_.wavelength(),
                       Sampling.hex(nrings=3))
    prob = Problem(sys_, [op])
    before = op(sys_, _TraceCache(sys_))
    fit = sciopt.least_squares(prob.residuals, prob.x0(), jac='3-point',
                               max_nfev=60)
    sys_.opt.update(fit.x)
    assert op(sys_, _TraceCache(sys_)) <= before


def test_exact_residual_jacobian_is_auto_gated():
    """gradient='fd' offers no residual jacobian; 'auto' matches FD."""
    sys_ = rig(95.0, ('curvature', 1))
    target = [EFL(sys_.wavelength(), target=100.0)]
    fd_prob = Problem(sys_, target, gradient='fd')
    start = np.asarray(fd_prob.x0())
    assert fd_prob.residual_jacobian(start) is None

    exact = Problem(sys_, target, gradient='auto')
    J = np.atleast_2d(np.asarray(exact.residual_jacobian(start)))
    h = 1e-7 * abs(start[0])
    hi = np.asarray(fd_prob.residuals(start + h))
    lo = np.asarray(fd_prob.residuals(start - h))
    sys_.opt.update(start)
    np.testing.assert_allclose(J.ravel(), (hi - lo) / (2 * h), rtol=1e-4)
