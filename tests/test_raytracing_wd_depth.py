"""WavefrontDifferential front-end depth: port of the reference intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_diff_wavefront_differential.py (17 tests): the quadratic RMS
model against re-traces and FD sensitivity tables, gram symmetry,
inverse sensitivity round trips, RSS roll-up, fast vs slow Monte
Carlo agreement, and the cumulative-probability CDF.
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
    Perturbation, monte_carlo, sensitivity_table)
from prysm_tpu.x.raytracing.wavefront_differential import (
    WavefrontDifferential, cumulative_probability, wavefront_differential)

WVL = 0.5
NG = 1.6
_glass = materials.ConstantMaterial(NG)
_air = materials.air


def _place_image(sys_, gap_row):
    lens = [s for s in sys_.to_surfaces()
            if not _is_measurement_surf(s.typ)]
    bfd = float(paraxial_image_distance(lens, wvl=WVL))
    sys_.lens.rows[gap_row].thickness = bfd
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


def bundle(sys_):
    P, S = launch(sys_, Field(2.5, 2.5), WVL, Sampling.rect(n=7),
                  epd=10.0, pupil_z=-5.0)
    return np.asarray(P), np.asarray(S)


def basic_perts(sys_):
    return [
        Perturbation.normal(sys_, 'curvature', 1, 1e-5, name='c1'),
        Perturbation.normal(sys_, 'conic', 1, 1e-4, name='k1'),
        Perturbation.normal(sys_, 'thickness', 1, 5e-4, name='t0'),
    ]


def merit_of(sys_, P, S):
    op = WavefrontRMS()

    def merit(prescription):
        return float(op.value(prescription.trace(P, S, WVL),
                              prescription, WVL))

    return merit


# ---------- model reproduces the gate ---------------------------------------

def test_nominal_rms_matches_wavefrontrms():
    sys_ = singlet()
    P, S = bundle(sys_)
    wd = wavefront_differential(sys_, basic_perts(sys_), P, S, WVL)
    np.testing.assert_allclose(wd.rms_nominal, merit_of(sys_, P, S)(sys_),
                               rtol=1e-10)


def test_piston_reference_removes_mean():
    sys_ = singlet()
    P, S = bundle(sys_)
    wd = wavefront_differential(sys_, basic_perts(sys_), P, S, WVL,
                                rms_reference='piston')
    assert wd.reference == 'piston'
    np.testing.assert_allclose(np.mean(wd.W0), 0.0, atol=1e-15)
    np.testing.assert_allclose(np.mean(wd.dW, axis=0), 0.0, atol=2e-15)


def test_resolves_system_wavelength():
    toy_glass = materials.FormulaMaterial(
        'DISP', lambda w: 1.5 + 0.02 * (w - 0.55))
    lens = LensData()
    lens.add(Conic(1 / 40.0, 0.0), typ='refr', thickness=4.0,
             material=toy_glass)
    lens.add(Conic(-1 / 40.0, 0.0), typ='refr', thickness=20.0,
             material=_air)
    sys_ = OpticalSystem(lens, aperture=10.0, wavelengths=[0.55],
                         reference=0)
    sys_.solve.image_distance()
    P, S = launch(sys_, Field(0.0, 0.0), sys_.wavelength(),
                  Sampling.rect(n=3), epd=10.0, pupil_z=-5.0)
    P, S = np.asarray(P), np.asarray(S)
    perts = [Perturbation.normal(sys_, 'curvature', 1, 1e-5, name='c1')]
    with pytest.raises(ValueError, match='near-axial chief ray'):
        wavefront_differential(sys_, perts, P, S, None)
    by_ref = wavefront_differential(sys_, perts, P, S, None, P_xp=(0, 0, 0))
    by_value = wavefront_differential(sys_, perts, P, S, 0.55,
                                      P_xp=(0, 0, 0))
    np.testing.assert_allclose(by_ref.W0, by_value.W0)
    np.testing.assert_allclose(by_ref.dW, by_value.dW)


def test_sensitivity_matches_fd_table():
    sys_ = singlet()
    P, S = bundle(sys_)
    perts = basic_perts(sys_)
    wd = wavefront_differential(sys_, perts, P, S, WVL)
    fd = sensitivity_table(sys_, perts, merit_of(sys_, P, S)).sensitivities()
    np.testing.assert_allclose(wd.sensitivity(), fd, rtol=3e-3, atol=1e-9)


def test_stop_derived_exit_pupil_matches_fd():
    sys_ = singlet()
    sys_.stop_index = 1
    P, S = bundle(sys_)
    perts = [
        Perturbation.normal(sys_, 'curvature', 1, 1e-5, name='c1'),
        Perturbation.normal(sys_, 'thickness', 1, 5e-4, name='t0'),
    ]
    wd = wavefront_differential(sys_, perts, P, S, WVL)
    fd = sensitivity_table(sys_, perts, merit_of(sys_, P, S)).sensitivities()
    np.testing.assert_allclose(wd.sensitivity(), fd, rtol=3e-3, atol=1e-9)


def test_gram_symmetric_with_A_diagonal():
    sys_ = singlet()
    P, S = bundle(sys_)
    wd = wavefront_differential(sys_, basic_perts(sys_), P, S, WVL)
    G = wd.gram()
    np.testing.assert_allclose(G, G.T, rtol=0, atol=1e-18)
    np.testing.assert_allclose(np.diag(G), wd.A, rtol=0, atol=0)


def test_predict_rms_zero_tau_is_nominal():
    sys_ = singlet()
    P, S = bundle(sys_)
    wd = wavefront_differential(sys_, basic_perts(sys_), P, S, WVL)
    np.testing.assert_allclose(wd.predict_rms(np.zeros(3)), wd.rms_nominal,
                               rtol=1e-12)


# ---------- quadratic vs re-trace --------------------------------------------

def _retrace_rms(sys_, P, S, pert, T):
    merit = merit_of(sys_, P, S)
    try:
        pert.set(pert.nominal + T)
        return float(merit(sys_))
    finally:
        pert.reset()


def test_rms_at_tracks_retrace_and_beats_linear():
    sys_ = singlet()
    P, S = bundle(sys_)
    pert = Perturbation.normal(sys_, 'curvature', 1, 1e-5, name='c1')
    wd = wavefront_differential(sys_, [pert], P, S, WVL)
    T = 2e-3
    true_rms = _retrace_rms(sys_, P, S, pert, T)
    quad = float(wd.rms_at(0, T))
    linear = wd.rms_nominal + T * float(wd.sensitivity()[0])
    assert abs(quad - true_rms) < abs(linear - true_rms)
    np.testing.assert_allclose(quad, true_rms, rtol=5e-3)


def test_full_quadratic_matches_linearized_wavefront():
    sys_ = singlet_cb()
    P, S = bundle(sys_)
    perts = [
        Perturbation.normal(sys_, 'curvature', 1, 1e-5, name='c1'),
        Perturbation.normal(sys_, 'curvature', 3, 1e-5, name='c2'),
        Perturbation.normal(sys_, 'thickness', 1, 5e-4, name='t0'),
    ]
    wd = wavefront_differential(sys_, perts, P, S, WVL)
    rng = np.random.default_rng(0)
    tau = rng.normal(size=3) * np.array([1e-3, 1e-3, 5e-2])
    W = wd.W0 + wd.dW @ tau
    np.testing.assert_allclose(wd.predict_rms_sq(tau), np.mean(W * W),
                               rtol=1e-10)


# ---------- inverse sensitivity ----------------------------------------------

def test_inverse_sensitivity_round_trips():
    sys_ = singlet()
    P, S = bundle(sys_)
    perts = basic_perts(sys_)
    wd = wavefront_differential(sys_, perts, P, S, WVL)
    target = 0.25 * wd.rms_nominal
    t_lo, t_hi = wd.inverse_sensitivity(target)
    want = wd.rms_nominal + target
    for p in range(len(perts)):
        np.testing.assert_allclose(float(wd.rms_at(p, t_hi[p])), want,
                                   rtol=1e-7)
        np.testing.assert_allclose(float(wd.rms_at(p, t_lo[p])), want,
                                   rtol=1e-7)
        assert t_lo[p] <= 0.0 <= t_hi[p]


def test_inverse_sensitivity_linear_only_one_sided():
    model = WavefrontDifferential.__new__(WavefrontDifferential)
    for slot, val in (('A', np.array([0.0])), ('B', np.array([2.0])),
                      ('C', 1.0), ('rms_nominal', 1.0), ('n_params', 1)):
        setattr(model, slot, val)
    t_lo, t_hi = model.inverse_sensitivity(0.5)
    np.testing.assert_allclose(t_hi[0], 0.625, rtol=1e-12)
    assert t_lo[0] == -np.inf


# ---------- RSS roll-up ------------------------------------------------------

def test_expected_rms_sq_matches_quadratic_mc_mean():
    sys_ = singlet()
    P, S = bundle(sys_)
    perts = basic_perts(sys_)
    wd = wavefront_differential(sys_, perts, P, S, WVL)
    res = wd.fast_monte_carlo(perts, n_trials=40000, seed=7)
    np.testing.assert_allclose(wd.expected_rms_sq(),
                               float(np.mean(res.merits ** 2)), rtol=2e-2)


def test_rms_change_per_tolerance_named_rows():
    sys_ = singlet()
    P, S = bundle(sys_)
    wd = wavefront_differential(sys_, basic_perts(sys_), P, S, WVL)
    drms = wd.rms_change_per_tolerance()
    assert drms.shape == (3,)
    assert [r['name'] for r in wd.rows()] == ['c1', 'k1', 't0']


# ---------- fast MC vs slow MC -----------------------------------------------

def test_fast_mc_matches_slow_mc():
    sys_ = singlet()
    P, S = bundle(sys_)
    perts = basic_perts(sys_)
    wd = wavefront_differential(sys_, perts, P, S, WVL)
    n, seed = 3000, 12345
    fast = wd.fast_monte_carlo(perts, n_trials=n, seed=seed)
    slow = monte_carlo(sys_, perts, merit_of(sys_, P, S), n_trials=n,
                       seed=seed)
    fs, ss = fast.summary(), slow.summary()
    np.testing.assert_allclose(fs['mean'], ss['mean'], rtol=1e-2)
    np.testing.assert_allclose(fs['std'], ss['std'], rtol=5e-2)
    np.testing.assert_allclose(fs['p95'], ss['p95'], rtol=2e-2)
    np.testing.assert_allclose(fast.merits, slow.merits, rtol=2e-2,
                               atol=1e-6)


def test_fast_mc_requires_matching_params():
    sys_ = singlet()
    P, S = bundle(sys_)
    perts = basic_perts(sys_)
    wd = wavefront_differential(sys_, perts, P, S, WVL)
    with pytest.raises(ValueError, match='match the model'):
        wd.fast_monte_carlo(perts[:2], n_trials=10)


# ---------- cumulative probability -------------------------------------------

def test_cumulative_probability_is_a_cdf():
    sys_ = singlet()
    P, S = bundle(sys_)
    perts = basic_perts(sys_)
    wd = wavefront_differential(sys_, perts, P, S, WVL)
    res = wd.fast_monte_carlo(perts, n_trials=2000, seed=1)
    thresh, prob = cumulative_probability(res)
    assert np.all(np.diff(thresh) >= 0)
    assert np.all(np.diff(prob) >= 0)
    np.testing.assert_allclose(prob[-1], 1.0, rtol=0, atol=1e-12)
    probe = float(np.median(res.merits))
    np.testing.assert_allclose(
        res.yield_at(probe),
        prob[np.searchsorted(thresh, probe, 'right') - 1],
        atol=1.0 / res.n_trials + 1e-12)


def test_cumulative_probability_raw_array():
    m, p = cumulative_probability(np.array([3.0, 1.0, 2.0]))
    np.testing.assert_allclose(m, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(p, [1 / 3, 2 / 3, 1.0])
