"""Tolerance-analysis helpers on the adjoint Jacobian: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/adjoint/
test_tolerance_analysis.py (8 tests): the shared-forward
multi-objective Jacobian vs per-head sweeps, |sensitivity| ranking,
inverse sensitivity hitting (and clipping to) budgets, RSS vs a
direct Monte Carlo, compensator-column projection, the
multi-objective budget, and the sensitivity table.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
from prysm_tpu.x.raytracing.adjoint.seeds import (
    seed_conic, seed_curvature, seed_decenter, seed_despace, seed_index)
from prysm_tpu.x.raytracing.adjoint.engine import adjoint_gradient
from prysm_tpu.x.raytracing.adjoint.tolerance_analysis import (
    ToleranceSensitivityTable, compensated_jacobian, inverse_sensitivity,
    multi_objective_budget, multi_objective_sensitivity, rss_prediction)
from prysm_tpu.x.raytracing.design import RmsSpotRadius, WavefrontRMS
from prysm_tpu.x.raytracing.surfaces import Conic, Plane, Surface

NG = 1.62
WVL = 0.55


def make_system():
    glass = materials.ConstantMaterial(NG)
    return [
        Surface(shape=Conic(1 / 40.0, -0.6), interaction='refr',
                P=[0, 0, 0.0], material=glass),
        Surface(shape=Conic(-1 / 55.0, 0.2), interaction='refr',
                P=[0, 0, 6.0], material=materials.air),
        Surface(shape=Plane(), interaction='eval', P=[0, 0, 56.0]),
    ]


def ray_bundle():
    ax, ay = 0.04, 0.06
    sx, sy = np.sin(ax), np.sin(ay)
    sz = np.sqrt(1.0 - sx * sx - sy * sy)
    samples = np.linspace(-7, 7, 5)
    xx, yy = np.meshgrid(samples, samples)
    pupil = np.stack([xx.ravel(), yy.ravel()], axis=-1)
    positions = np.empty((pupil.shape[0], 3))
    positions[:, :2] = pupil
    positions[:, 2] = -12.0
    directions = np.broadcast_to(np.array([sx, sy, sz]),
                                 positions.shape).copy()
    return positions, directions


def _seeds():
    return [seed_curvature(0), seed_conic(1), seed_despace([(1, +1)]),
            seed_decenter(1, 'y'), seed_index(0)]


def _heads():
    # the seedable unified merits; Distortion is value-only
    return [WavefrontRMS(), RmsSpotRadius()]


def test_jacobian_matches_per_head_sweeps():
    P, S = ray_bundle()
    seeds = _seeds()
    heads = _heads()
    res = multi_objective_sensitivity(make_system(), P, S, WVL, seeds,
                                      heads)
    assert res.jacobian.shape == (len(heads), len(seeds))
    for m, head in enumerate(heads):
        g, _ = adjoint_gradient(make_system(), P, S, WVL, seeds, head)
        np.testing.assert_allclose(res.jacobian[m], g, rtol=1e-12, atol=0)
    assert res.param_names == [s.name for s in seeds]


def test_ranked_by_orders_by_abs_sensitivity():
    P, S = ray_bundle()
    res = multi_objective_sensitivity(make_system(), P, S, WVL, _seeds(),
                                      _heads())
    magnitudes = [abs(sens) for _, sens in res.ranked_by(0)]
    assert magnitudes == sorted(magnitudes, reverse=True)


TOY_J2X3 = np.asarray([[2.0, -0.5, 0.0], [1.0, 3.0, 4.0]])


def test_inverse_sensitivity_hits_budget():
    allowed = 0.1
    tols = inverse_sensitivity(TOY_J2X3, allowed)
    worst = (np.abs(TOY_J2X3) * tols[None, :]).max(axis=0)
    # each finite-tolerance parameter's binding objective hits budget
    finite = np.isfinite(tols)
    np.testing.assert_allclose(worst[finite], allowed)


def test_inverse_sensitivity_clips():
    tols = inverse_sensitivity(np.asarray([[10.0, 0.01]]), 1.0,
                               steps_max=np.full(2, 5.0))
    # 1/10 unclipped; 1/0.01 = 100 clipped to the 5.0 cap
    np.testing.assert_allclose(tols, [0.1, 5.0])


def test_rss_matches_monte_carlo():
    toy = np.asarray([[2.0, -1.5, 0.7], [0.3, 1.1, -2.2]])
    widths = np.asarray([0.05, 0.08, 0.02])
    predicted = rss_prediction(toy, widths)

    draws = np.random.default_rng(0).normal(
        0.0, widths[None, :], size=(200000, widths.size))
    empirical = (draws @ toy.T).std(axis=0, ddof=0)
    np.testing.assert_allclose(predicted, empirical, rtol=2e-2)


def test_compensated_jacobian_zeros_compensator_columns():
    maker = np.random.default_rng(1)
    n_heads, n_tols, n_comp = 5, 7, 2
    raw = maker.standard_normal((n_heads, n_tols))
    movers = maker.standard_normal((n_heads, n_comp))
    residual_J, motions = compensated_jacobian(raw, movers)
    assert motions.shape == (n_comp, n_tols)
    # the residual lies in the compensators' orthogonal complement
    np.testing.assert_allclose(movers.T @ residual_J, 0.0, atol=1e-10)
    # a tolerance column equal to a compensator direction vanishes
    aligned = raw.copy()
    aligned[:, 0] = movers[:, 0]
    residual_aligned, _ = compensated_jacobian(aligned, movers)
    np.testing.assert_allclose(residual_aligned[:, 0], 0.0, atol=1e-10)


def test_multi_objective_budget():
    # per param: min over objectives of budget_m / |J[m, p]| = 0.1 both
    tols = multi_objective_budget(np.asarray([[2.0, 1.0], [1.0, 4.0]]),
                                  np.asarray([0.2, 0.4]))
    np.testing.assert_allclose(tols, [0.1, 0.1])


def test_sensitivity_table():
    P, S = ray_bundle()
    res = multi_objective_sensitivity(make_system(), P, S, WVL, _seeds(),
                                      _heads())
    per_param_steps = np.full(len(_seeds()), 1e-3)
    table = ToleranceSensitivityTable(res, per_param_steps)
    np.testing.assert_allclose(table.sensitivity(), np.abs(res.jacobian))
    np.testing.assert_allclose(
        table.degradation_at_step(),
        res.jacobian * per_param_steps[None, :])
