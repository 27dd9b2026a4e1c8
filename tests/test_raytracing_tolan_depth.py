"""Adjoint Jacobian tolerance helpers: port of the reference intent.

Behavior matrix of /root/reference/tests/x/raytracing/adjoint/
test_tolerance_analysis.py and the seedable-merit slice of
test_merit_heads.py: the multi-objective Jacobian against per-head
sweeps with a FIXED exit-pupil anchor, and WFE/spot adjoint gradients
against finite differences.  The pure linear-algebra helper cases live
in test_raytracing_tolerance_analysis_depth.py.
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


# ranking / inverse-sensitivity / RSS / compensator /
# budget / table cases live in
# test_raytracing_tolerance_analysis_depth.py


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
