"""Adjoint Jacobian tolerance helpers: port of the reference intent.

Behavior matrix of /root/reference/tests/x/raytracing/adjoint/
test_tolerance_analysis.py (8 tests) and the seedable-merit slice of
test_merit_heads.py: the multi-objective Jacobian against per-head
sweeps, ranking, inverse sensitivity, RSS against Monte Carlo,
compensated Jacobians, budgets, the sensitivity table, and WFE/spot
adjoint gradients against finite differences.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
import prysm_tpu.x.raytracing as rt
from prysm_tpu.x.raytracing.surfaces import Surface
from prysm_tpu.x.raytracing.spencer_and_murty import raytrace
from prysm_tpu.x.raytracing.adjoint.seeds import (
    seed_conic, seed_curvature, seed_decenter, seed_despace, seed_index)
from prysm_tpu.x.raytracing.adjoint.engine import adjoint_gradient
from prysm_tpu.x.raytracing.adjoint.tolerance_analysis import (
    ToleranceSensitivityTable, compensated_jacobian, inverse_sensitivity,
    multi_objective_budget, multi_objective_sensitivity, rss_prediction)
from prysm_tpu.x.raytracing.design import RmsSpotRadius, WavefrontRMS

NG = 1.62
WVL = 0.55
BASE = dict(c0=1 / 42.0, k0=-0.55, c1=-1 / 52.0, k1=0.15, z1=6.5,
            y1=0.0, zimg=55.0, ng=NG)


def make_system(**overrides):
    p = dict(BASE, **overrides)
    glass = materials.ConstantMaterial(p['ng'])
    return [
        Surface(shape=rt.Conic(p['c0'], p['k0']), interaction='refract',
                P=[0, 0, 0], material=glass),
        Surface(shape=rt.Conic(p['c1'], p['k1']), interaction='refract',
                P=[0, p['y1'], p['z1']], material=materials.air),
        Surface(shape=rt.Plane(), interaction='eval', P=[0, 0, p['zimg']]),
    ]


def ray_bundle():
    ax, ay = 0.04, 0.06
    sx, sy = np.sin(ax), np.sin(ay)
    sz = np.sqrt(1.0 - sx * sx - sy * sy)
    samples = np.linspace(-7, 7, 5)
    xx, yy = np.meshgrid(samples, samples)
    P = np.empty((xx.size, 3))
    P[:, 0] = xx.ravel()
    P[:, 1] = yy.ravel()
    P[:, 2] = -12.0
    S = np.broadcast_to([sx, sy, sz], P.shape).copy()
    return P, S


def _seeds():
    return [seed_curvature(0), seed_conic(1), seed_despace([(1, +1)]),
            seed_decenter(1, 'y'), seed_index(0)]


def _heads():
    # WFE with a fixed exit-pupil anchor so FD and adjoint share geometry
    return [WavefrontRMS(P_xp=(0, 0, 0)), RmsSpotRadius()]


def test_jacobian_matches_per_head_sweeps():
    P, S = ray_bundle()
    seeds = _seeds()
    heads = _heads()
    res = multi_objective_sensitivity(make_system(), P, S, WVL, seeds,
                                      heads)
    assert res.jacobian.shape == (len(heads), len(seeds))
    for m, head in enumerate(heads):
        g, _ = adjoint_gradient(make_system(), P, S, WVL, seeds, head)
        np.testing.assert_allclose(res.jacobian[m], np.asarray(g),
                                   rtol=1e-12, atol=0)
    assert res.param_names == [s.name for s in seeds]
    assert 'rms_wfe' in res.nominals


def test_ranked_by_orders_by_abs_sensitivity():
    P, S = ray_bundle()
    res = multi_objective_sensitivity(make_system(), P, S, WVL, _seeds(),
                                      _heads())
    ranked = res.ranked_by('rms_wfe')
    mags = [abs(v) for _, v in ranked]
    assert mags == sorted(mags, reverse=True)


def test_inverse_sensitivity_hits_budget():
    J = np.array([[2.0, -0.5, 0.0],
                  [1.0, 3.0, 4.0]])
    budget = 0.1
    tol = inverse_sensitivity(J, budget)
    deg = np.abs(J) * tol[None, :]
    for p in range(J.shape[1]):
        if np.isfinite(tol[p]):
            assert np.isclose(deg[:, p].max(), budget)


def test_inverse_sensitivity_clips():
    J = np.array([[10.0, 0.01]])
    tol = inverse_sensitivity(J, 1.0, steps_max=np.array([5.0, 5.0]))
    assert tol[0] == 0.1
    assert tol[1] == 5.0


def test_rss_matches_monte_carlo():
    J = np.array([[2.0, -1.5, 0.7],
                  [0.3, 1.1, -2.2]])
    sigmas = np.array([0.05, 0.08, 0.02])
    rss = rss_prediction(J, sigmas)
    rng = np.random.default_rng(0)
    N = 200000
    taus = rng.normal(0.0, sigmas[None, :], size=(N, J.shape[1]))
    mc = (taus @ J.T).std(axis=0, ddof=0)
    np.testing.assert_allclose(rss, mc, rtol=2e-2)


def test_compensated_jacobian_zeros_compensator_columns():
    rng = np.random.default_rng(1)
    M, P, K = 5, 7, 2
    J = rng.standard_normal((M, P))
    J_comp = rng.standard_normal((M, K))
    J_eff, motions = compensated_jacobian(J, J_comp)
    assert motions.shape == (K, P)
    np.testing.assert_allclose(J_comp.T @ J_eff, np.zeros((K, P)),
                               atol=1e-10)
    J2 = J.copy()
    J2[:, 0] = J_comp[:, 0]
    J_eff2, _ = compensated_jacobian(J2, J_comp)
    np.testing.assert_allclose(J_eff2[:, 0], 0.0, atol=1e-10)


def test_multi_objective_budget():
    J = np.array([[2.0, 1.0],
                  [1.0, 4.0]])
    tol = multi_objective_budget(J, np.array([0.2, 0.4]))
    np.testing.assert_allclose(tol, [0.1, 0.1])


def test_sensitivity_table():
    P, S = ray_bundle()
    res = multi_objective_sensitivity(make_system(), P, S, WVL, _seeds(),
                                      _heads())
    steps = np.full(len(_seeds()), 1e-3)
    tbl = ToleranceSensitivityTable(res, steps)
    np.testing.assert_allclose(tbl.sensitivity(), np.abs(res.jacobian))
    np.testing.assert_allclose(tbl.degradation_at_step(),
                               res.jacobian * steps[None, :])


# ---------- seedable merits vs finite differences ----------------------------

def _fd_merit_grad(head, P, S, h, cases):
    out = []
    for op, om in cases:
        trp = raytrace(make_system(**op), P, S, WVL)
        trm = raytrace(make_system(**om), P, S, WVL)
        vp = head.value(trp, make_system(**op), WVL)
        vm = head.value(trm, make_system(**om), WVL)
        out.append((vp - vm) / (2 * h))
    return np.asarray(out)


@pytest.mark.parametrize('head_factory', [
    lambda: WavefrontRMS(P_xp=(0, 0, 0)),
    lambda: WavefrontRMS(P_xp=(0, 0, 0), reference='piston'),
])
def test_wfe_adjoint_vs_fd(head_factory):
    P, S = ray_bundle()
    head = head_factory()
    h = 1e-6
    seeds = [seed_curvature(0), seed_despace([(1, +1)]),
             seed_decenter(1, 'y')]
    cases = [
        (dict(c0=BASE['c0'] + h), dict(c0=BASE['c0'] - h)),
        (dict(z1=BASE['z1'] + h), dict(z1=BASE['z1'] - h)),
        (dict(y1=h), dict(y1=-h)),
    ]
    g, nominal = adjoint_gradient(make_system(), P, S, WVL, seeds, head)
    g_fd = _fd_merit_grad(head, P, S, h, cases)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=2e-4, atol=1e-8)
    tr = raytrace(make_system(), P, S, WVL)
    assert nominal == pytest.approx(head.value(tr, make_system(), WVL),
                                    rel=1e-9)


def test_spot_adjoint_vs_fd():
    P, S = ray_bundle()
    head = RmsSpotRadius()
    h = 1e-6
    seeds = [seed_curvature(0), seed_decenter(1, 'y')]
    cases = [
        (dict(c0=BASE['c0'] + h), dict(c0=BASE['c0'] - h)),
        (dict(y1=h), dict(y1=-h)),
    ]
    g, _ = adjoint_gradient(make_system(), P, S, WVL, seeds, head)
    g_fd = _fd_merit_grad(head, P, S, h, cases)
    np.testing.assert_allclose(np.asarray(g), g_fd, rtol=2e-4, atol=1e-8)
