"""Optimization ergonomics depth: port of the reference intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_optimize.py (15 tests): the optimize sugar, problem
fan-out over fields/wavelengths, constraint routing with targets and
bounds, geometry operands, recipe defaults, and lazy bundle
re-launch.  The behaviors are the reference's; the harness (builders,
fan-out probes) is this repo's own.
"""
import warnings

import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as pm
from prysm_tpu.x.raytracing import LensData, OpticalSystem
from prysm_tpu.x.raytracing.surfaces import Conic
from prysm_tpu.x.raytracing.launch import Field, Sampling
from prysm_tpu.x.raytracing.paraxial import effective_focal_length
from prysm_tpu.x.raytracing.design import (
    EFL, Merit, Problem, RmsSpotRadius, Thickness, TotalTrack,
    _CallableMerit, _TraceCache, build_problem)

BK7ISH = pm.ConstantMaterial(1.5168, name='N-BK7')


def rig(gap=96.0, **sys_kw):
    """A biconvex f/5-ish singlet system with a tunable image gap."""
    rows = LensData()
    rows.add(Conic(1 / 102.0, 0.0), thickness=6.0, material=BK7ISH,
             aperture=12.0)
    rows.add(Conic(-1 / 102.0, 0.0), thickness=gap, material=pm.air,
             aperture=12.0)
    sys_kw.setdefault('fields', [0])
    sys_kw.setdefault('wavelengths', [0.55])
    return OpticalSystem(rows, aperture=20.0, **sys_kw)


def residual0(prob):
    return abs(float(np.asarray(prob.residuals(prob.x0()))[0]))


def op_facts(prob, attr):
    return [getattr(op, attr) for op in prob.operands]


# ---------- the motivating example -------------------------------------------

def test_optimize_spot_focuses_singlet():
    sys_ = rig(gap=80.0)
    sys_.opt.vary('thickness', surfaces=2)
    prob = sys_.opt.problem('spot')
    before = residual0(prob)
    outcome = sys_.opt.optimize('spot', maxiter=20)
    after = abs(float(np.asarray(prob.residuals(outcome.x))[0]))
    assert after < 0.1 * before
    np.testing.assert_allclose(sys_.lens.rows[2].thickness, outcome.x[0])


def test_constrained_optimize_hits_efl():
    sys_ = rig()
    sys_.opt.vary('curvature', surfaces=1)
    sys_.opt.vary('thickness', surfaces=2)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', UserWarning)
        sys_.opt.optimize('spot', constraints=[EFL(target=100.0)],
                          maxiter=30, damping=1e-8)
    got = effective_focal_length(sys_.to_surfaces(), wvl=0.55)
    assert got == pytest.approx(100.0, rel=1e-5)


def test_problem_is_inspectable_and_extendable():
    prob = rig().opt.problem('spot')
    assert isinstance(prob, Problem)
    before = len(prob.operands)
    prob.operands.append(EFL(target=100.0, weight=0.1))
    assert len(prob.operands) == before + 1


# ---------- fan-out ----------------------------------------------------------

def test_fanout_counts_and_weights():
    sys_ = rig(fields=(0.0, 1.0), wavelengths=(0.48, 0.55, 0.65),
               weights=(1.0, 2.0, 1.0))
    prob = sys_.opt.problem('spot')
    assert len(prob.operands) == 6
    assert all(type(op) is RmsSpotRadius for op in prob.operands)
    assert op_facts(prob, 'weight') == [1.0, 2.0, 1.0] * 2
    assert op_facts(prob, 'wavelength') == [0.48, 0.55, 0.65] * 2


def test_fanout_explicit_wavelengths_uniform_weight():
    sys_ = rig(wavelengths=(0.48, 0.55, 0.65), weights=(1., 2., 1.))
    prob = sys_.opt.problem('spot', wavelengths=[0.5])
    assert op_facts(prob, 'wavelength') == [0.5]
    assert op_facts(prob, 'weight') == [1.0]


def test_scalar_merit_fans_over_wavelengths_only():
    sys_ = rig(fields=(0.0, 1.0), wavelengths=(0.48, 0.65),
               weights=(1.0, 2.0))
    prob = sys_.opt.problem(EFL)
    assert len(prob.operands) == 2
    assert all(type(op) is EFL for op in prob.operands)
    assert op_facts(prob, 'wavelength') == [0.48, 0.65]
    assert op_facts(prob, 'weight') == [1.0, 2.0]


class RecipeAware(Merit):
    """Custom merit accepting the fan-out recipe kwargs."""

    def __init__(self, field=None, wavelength=None, sampling=None, *,
                 weight=1.0):
        super().__init__(weight=weight)
        self.field, self.wavelength = field, wavelength
        self.sampling = sampling

    def __call__(self, prescription, cache):
        return 0.0


def test_fanout_mixes_kinds():
    sys_ = rig(fields=(0.0, 1.0), wavelengths=(0.48, 0.65))

    def homemade(prescription, cache):
        return 1.0

    pinned = EFL(target=100.0)
    prob = sys_.opt.problem(['spot', RecipeAware, pinned, homemade])
    # 4 spot + 4 RecipeAware (field x wavelength), 1 pinned, 1 wrapped
    assert len(prob.operands) == 10
    assert sum(type(op) is RecipeAware for op in prob.operands) == 4
    assert prob.operands[8] is pinned
    tail = prob.operands[9]
    assert type(tail) is _CallableMerit
    assert tail.name == 'homemade'
    assert tail(sys_, _TraceCache(sys_)) == 1.0


def test_fanout_rejects_unknown_goal_and_bad_type():
    sys_ = rig()
    with pytest.raises(ValueError, match='known goal'):
        sys_.opt.problem('sharpness')
    with pytest.raises(TypeError, match='goal items'):
        build_problem(sys_, 3.14)


# ---------- constraint routing -----------------------------------------------

def test_constraint_routing_targets_and_bounds():
    sys_ = rig()
    prob = sys_.opt.problem('spot', constraints=[
        EFL(target=100.0),
        TotalTrack(max=110.0),
        Thickness(2, min=5.0, max=120.0),
    ])
    assert len(prob.equality_constraints) == 1
    assert type(prob.equality_constraints[0]) is EFL
    assert len(prob.inequality_constraints) == 3
    start = prob.x0()
    shared = _TraceCache(sys_)
    efl_now = EFL()(sys_, shared)
    track_now = TotalTrack()(sys_, shared)
    gap_now = Thickness(2)(sys_, shared)
    np.testing.assert_allclose(np.asarray(prob.equalities(start)),
                               [efl_now - 100.0])
    np.testing.assert_allclose(
        np.asarray(prob.inequalities(start)),
        [110.0 - track_now, gap_now - 5.0, 120.0 - gap_now])


def test_constraint_target_with_bound_raises():
    with pytest.raises(ValueError, match='mixes'):
        Problem(rig(), [], constraints=[EFL(target=100.0, min=90.0)])


# ---------- geometry operands ------------------------------------------------

def test_total_track_and_thickness_hand_sums():
    sys_ = rig(gap=96.0)
    shared = _TraceCache(sys_)
    assert TotalTrack()(sys_, shared) == pytest.approx(6.0 + 96.0)
    assert Thickness(2)(sys_, shared) == pytest.approx(96.0)


def test_total_track_skips_object_row():
    sys_ = rig(gap=96.0)
    assert TotalTrack()(sys_, _TraceCache(sys_)) == pytest.approx(102.0)
    # moving the object away does not change the track
    sys_.lens.rows[0].thickness = 50.0
    assert TotalTrack()(sys_, _TraceCache(sys_)) == pytest.approx(102.0)


# ---------- recipe defaults --------------------------------------------------

def test_recipe_none_defaults_resolve_on_system():
    sys_ = rig(fields=(1.0,), wavelengths=(0.48, 0.55), weights=None)
    sys_.reference = 1
    defaulted = RmsSpotRadius()(sys_, _TraceCache(sys_))
    spelled = RmsSpotRadius(Field(0., 0.), 0.55,
                            Sampling.hex(nrings=4))(sys_, _TraceCache(sys_))
    np.testing.assert_allclose(defaulted, spelled)


def test_recipe_wavelength_none_raises_on_bare_lensdata():
    sys_ = rig()
    with pytest.raises(ValueError, match='wavelength'):
        RmsSpotRadius()(sys_.lens, _TraceCache(sys_.lens))


# ---------- lazy re-launch ---------------------------------------------------

def test_bundle_relaunches_as_design_moves():
    sys_ = rig(fields=(3.0,), stop_index=2)
    sys_.opt.vary('curvature', surfaces=1)
    prob = sys_.opt.problem('spot')
    start = prob.x0()
    _, cache_a = prob.residuals(start, return_cache=True)
    _, cache_b = prob.residuals(start + 0.002, return_cache=True)

    def launched(cache):
        return [v for k, v in cache._memo.items() if k[0] == 'launch']

    (Pa, _), = launched(cache_a)
    (Pb, _), = launched(cache_b)
    assert not np.allclose(np.asarray(Pa), np.asarray(Pb))
    sys_.opt.update(start)
