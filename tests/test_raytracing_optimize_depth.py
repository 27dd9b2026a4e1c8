"""Optimization ergonomics depth: port of the reference intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_optimize.py (15 tests): the optimize sugar, problem
fan-out over fields/wavelengths, constraint routing with targets and
bounds, geometry operands, recipe defaults, and lazy bundle
re-launch.
"""
import warnings

import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
from prysm_tpu.x.raytracing import LensData, OpticalSystem
from prysm_tpu.x.raytracing.surfaces import Conic
from prysm_tpu.x.raytracing.launch import Field, Sampling
from prysm_tpu.x.raytracing.paraxial import effective_focal_length
from prysm_tpu.x.raytracing.design import (
    EFL, Merit, Problem, RmsSpotRadius, Thickness, TotalTrack,
    _CallableMerit, _TraceCache, build_problem)

_glass = materials.ConstantMaterial(1.5168, name='N-BK7')


def make_singlet(image_gap=96.0, fields=(0,), wavelengths=(0.55,),
                 weights=None, stop_index=None):
    lens = LensData()
    (lens.add(Conic(1 / 102.0, 0.0), thickness=6.0, material=_glass,
              aperture=12.0)
         .add(Conic(-1 / 102.0, 0.0), thickness=image_gap,
              material=materials.air, aperture=12.0))
    return OpticalSystem(lens, aperture=20.0, fields=list(fields),
                         wavelengths=list(wavelengths), weights=weights,
                         stop_index=stop_index)


# ---------- the motivating example -------------------------------------------

def test_optimize_spot_focuses_singlet():
    sys_ = make_singlet(image_gap=80.0)
    sys_.opt.vary('thickness', surfaces=2)
    prob = sys_.opt.problem('spot')
    spot0 = abs(float(np.asarray(prob.residuals(prob.x0()))[0]))
    res = sys_.opt.optimize('spot', maxiter=20)
    spot1 = abs(float(np.asarray(prob.residuals(res.x))[0]))
    assert spot1 < 0.1 * spot0
    np.testing.assert_allclose(sys_.lens.rows[2].thickness, res.x[0])


def test_constrained_optimize_hits_efl():
    sys_ = make_singlet()
    sys_.opt.vary('curvature', surfaces=1).vary('thickness', surfaces=2)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', UserWarning)
        sys_.opt.optimize('spot', constraints=[EFL(target=100.0)],
                          maxiter=30, damping=1e-8)
    assert effective_focal_length(sys_.to_surfaces(), wvl=0.55) == \
        pytest.approx(100.0, rel=1e-5)


def test_problem_is_inspectable_and_extendable():
    sys_ = make_singlet()
    prob = sys_.opt.problem('spot')
    assert isinstance(prob, Problem)
    n = len(prob.operands)
    prob.operands.append(EFL(target=100.0, weight=0.1))
    assert len(prob.operands) == n + 1


# ---------- fan-out ----------------------------------------------------------

def test_fanout_counts_and_weights():
    sys_ = make_singlet(fields=(0.0, 1.0), wavelengths=(0.48, 0.55, 0.65),
                        weights=(1.0, 2.0, 1.0))
    prob = sys_.opt.problem('spot')
    assert len(prob.operands) == 6
    assert all(isinstance(op, RmsSpotRadius) for op in prob.operands)
    assert [op.weight for op in prob.operands] == \
        [1.0, 2.0, 1.0, 1.0, 2.0, 1.0]
    assert [op.wavelength for op in prob.operands] == [0.48, 0.55, 0.65] * 2


def test_fanout_explicit_wavelengths_uniform_weight():
    sys_ = make_singlet(wavelengths=(0.48, 0.55, 0.65),
                        weights=(1., 2., 1.))
    prob = sys_.opt.problem('spot', wavelengths=[0.5])
    assert [op.wavelength for op in prob.operands] == [0.5]
    assert [op.weight for op in prob.operands] == [1.0]


def test_scalar_merit_fans_over_wavelengths_only():
    sys_ = make_singlet(fields=(0.0, 1.0), wavelengths=(0.48, 0.65),
                        weights=(1.0, 2.0))
    prob = sys_.opt.problem(EFL)
    assert len(prob.operands) == 2
    assert all(isinstance(op, EFL) for op in prob.operands)
    assert [op.wavelength for op in prob.operands] == [0.48, 0.65]
    assert [op.weight for op in prob.operands] == [1.0, 2.0]


class _FanMerit(Merit):
    """Custom merit accepting the fan-out recipe kwargs."""

    def __init__(self, field=None, wavelength=None, sampling=None, *,
                 weight=1.0):
        super().__init__(weight=weight)
        self.field = field
        self.wavelength = wavelength
        self.sampling = sampling

    def __call__(self, prescription, cache):
        return 0.0


def test_fanout_mixes_kinds():
    sys_ = make_singlet(fields=(0.0, 1.0), wavelengths=(0.48, 0.65))

    def my_merit(prescription, cache):
        return 1.0

    inst = EFL(target=100.0)
    prob = sys_.opt.problem(['spot', _FanMerit, inst, my_merit])
    assert len(prob.operands) == 10
    assert len([op for op in prob.operands
                if isinstance(op, _FanMerit)]) == 4
    assert prob.operands[8] is inst
    wrapped = prob.operands[9]
    assert isinstance(wrapped, _CallableMerit)
    assert wrapped.name == 'my_merit'
    assert wrapped(sys_, _TraceCache(sys_)) == 1.0


def test_fanout_rejects_unknown_goal_and_bad_type():
    sys_ = make_singlet()
    with pytest.raises(ValueError, match='known goal'):
        sys_.opt.problem('sharpness')
    with pytest.raises(TypeError, match='goal items'):
        build_problem(sys_, 3.14)


# ---------- constraint routing -----------------------------------------------

def test_constraint_routing_targets_and_bounds():
    sys_ = make_singlet()
    prob = sys_.opt.problem('spot', constraints=[
        EFL(target=100.0),
        TotalTrack(max=110.0),
        Thickness(2, min=5.0, max=120.0),
    ])
    assert len(prob.equality_constraints) == 1
    assert isinstance(prob.equality_constraints[0], EFL)
    assert len(prob.inequality_constraints) == 3
    x0 = prob.x0()
    eq = np.asarray(prob.equalities(x0))
    ineq = np.asarray(prob.inequalities(x0))
    cache = _TraceCache(sys_)
    efl = EFL()(sys_, cache)
    ttl = TotalTrack()(sys_, cache)
    thk = Thickness(2)(sys_, cache)
    np.testing.assert_allclose(eq, [efl - 100.0])
    np.testing.assert_allclose(ineq, [110.0 - ttl, thk - 5.0, 120.0 - thk])


def test_constraint_target_with_bound_raises():
    sys_ = make_singlet()
    with pytest.raises(ValueError, match='mixes'):
        Problem(sys_, [], constraints=[EFL(target=100.0, min=90.0)])


# ---------- geometry operands ------------------------------------------------

def test_total_track_and_thickness_hand_sums():
    sys_ = make_singlet(image_gap=96.0)
    cache = _TraceCache(sys_)
    assert TotalTrack()(sys_, cache) == pytest.approx(6.0 + 96.0)
    assert Thickness(2)(sys_, cache) == pytest.approx(96.0)


def test_total_track_skips_object_row():
    lens = LensData()
    (lens.add(Conic(1 / 102.0, 0.0), thickness=6.0, material=_glass)
         .add(Conic(-1 / 102.0, 0.0), thickness=96.0,
              material=materials.air))
    sys_ = OpticalSystem(lens, aperture=20.0, wavelengths=[0.55])
    assert TotalTrack()(sys_, _TraceCache(sys_)) == pytest.approx(102.0)
    lens.rows[0].thickness = 50.0
    assert TotalTrack()(sys_, _TraceCache(sys_)) == pytest.approx(102.0)


# ---------- recipe defaults --------------------------------------------------

def test_recipe_none_defaults_resolve_on_system():
    sys_ = make_singlet(fields=(1.0,), wavelengths=(0.48, 0.55),
                        weights=None)
    sys_.reference = 1
    bare = RmsSpotRadius()(sys_, _TraceCache(sys_))
    explicit = RmsSpotRadius(Field(0., 0.), 0.55,
                             Sampling.hex(nrings=4))(sys_, _TraceCache(sys_))
    np.testing.assert_allclose(bare, explicit)


def test_recipe_wavelength_none_raises_on_bare_lensdata():
    sys_ = make_singlet()
    op = RmsSpotRadius()
    with pytest.raises(ValueError, match='wavelength'):
        op(sys_.lens, _TraceCache(sys_.lens))


# ---------- lazy re-launch ---------------------------------------------------

def test_bundle_relaunches_as_design_moves():
    sys_ = make_singlet(fields=(3.0,), stop_index=2)
    sys_.opt.vary('curvature', surfaces=1)
    prob = sys_.opt.problem('spot')
    x0 = prob.x0()
    _, c0 = prob.residuals(x0, return_cache=True)
    _, c1 = prob.residuals(x0 + 0.002, return_cache=True)

    def launch_bundles(cache):
        return [v for k, v in cache._memo.items() if k[0] == 'launch']

    (P0, _), = launch_bundles(c0)
    (P1, _), = launch_bundles(c1)
    assert not np.allclose(np.asarray(P0), np.asarray(P1))
    sys_.opt.update(x0)
