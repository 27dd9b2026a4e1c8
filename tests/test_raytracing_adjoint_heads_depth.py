"""Adjoint backward sweep and merit heads: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/adjoint/
test_backward_sweep.py (3 tests) and test_merit_heads.py (8):
the defining adjoint identity against the validated forward-mode
tangents, position-only cotangents, the intermediates trace, seeded
merit gradients vs FD oracles and forward mode, and the Merit
protocol contract.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import prysm_tpu.x.materials as materials
from prysm_tpu.x.raytracing.spencer_and_murty import raytrace, valid_mask
from prysm_tpu.x.raytracing._diff_raytrace import (
    raytrace_with_tangents, wavefront_with_tangents)
from prysm_tpu.x.raytracing.adjoint.seeds import (
    seed_conic, seed_curvature, seed_decenter, seed_despace, seed_index,
    seed_tilt)
from prysm_tpu.x.raytracing.adjoint.engine import (
    _trace_fn, adjoint_gradient)
from prysm_tpu.x.raytracing.opt import (
    _closest_approach_on_axis, _pupil_center_chief_index, rms_spot_radius)
from prysm_tpu.x.raytracing.design import (
    Distortion, Merit, RmsSpotRadius, WavefrontRMS)
from prysm_tpu.x.raytracing.surfaces import Conic, Plane, Surface

NG = 1.62
WVL = 0.55
BASE = dict(c0=1 / 40.0, k0=-0.6, c1=-1 / 55.0, k1=0.2, z0=0.0, z1=6.0,
            zimg=56.0, x1=0.0, y1=0.0, tiltx1=0.0, ng=NG)


def _np(x):
    return np.asarray(x)


def make_system(**overrides):
    params = dict(BASE, **overrides)
    glass = materials.ConstantMaterial(params['ng'])
    first = Surface(shape=Conic(params['c0'], params['k0']),
                    interaction='refr', P=[0, 0, params['z0']],
                    material=glass)
    second_kwargs = {}
    if params['tiltx1'] != 0.0:
        second_kwargs = dict(tilt=(0.0, 0.0, params['tiltx1']),
                             tilt_radians=True)
    second = Surface(shape=Conic(params['c1'], params['k1']),
                     interaction='refr',
                     P=[params['x1'], params['y1'], params['z1']],
                     material=materials.air, **second_kwargs)
    image = Surface(shape=Plane(), interaction='eval',
                    P=[0, 0, params['zimg']])
    return [first, second, image]


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


class RawSeed:
    """Test head: a fixed cotangent on the image-plane ray state."""

    def __init__(self, P_bar, S_bar, L_bar):
        self._bars = (P_bar, S_bar, L_bar)

    def seed(self, trace, prescription, wavelength):
        # cotangents are history-shaped: the ray state is seeded at the
        # image plane; the OPL cotangent is on the TOTAL path length, so
        # it repeats on every segment row
        P_hist = _np(trace.P)
        P_bar = np.zeros_like(P_hist)
        S_bar = np.zeros_like(P_hist)
        L_bar = np.zeros(_np(trace.OPL).shape)
        P_bar[-1] = self._bars[0]
        S_bar[-1] = self._bars[1]
        L_bar[:] = self._bars[2][None, :]
        return P_bar, S_bar, L_bar


def _all_seeds():
    shape_cols = [fn(j) for j in (0, 1)
                  for fn in (seed_curvature, seed_conic)]
    gap_cols = [seed_despace([(1, +1)]),
                seed_despace([(1, +1), (2, +1)])]  # thickness fan-out
    pose_cols = [seed_decenter(1, ax) for ax in 'xy'] + [seed_tilt(1, 'x')]
    return shape_cols + gap_cols + pose_cols + [seed_index(0)]


# ---------- backward sweep vs forward mode -------------------------------------

def test_backward_sweep_matches_forward_mode():
    P, S = ray_bundle()
    surfaces = make_system()
    seeds = _all_seeds()

    res = raytrace_with_tangents(surfaces, P, S, WVL, seeds)
    valid = _np(valid_mask(res.trace.status, res.trace.P[-1]))

    draw = np.random.default_rng(7)
    n = P.shape[0]
    P_bar, S_bar = draw.standard_normal((2, n, 3))
    L_bar = draw.standard_normal(n)
    for bar in (P_bar, S_bar, L_bar):
        bar[~valid] = 0.0  # dead lanes carry no cotangent

    Pdot = _np(res.Pdot)[-1][valid]
    Sdot = _np(res.Sdot)[-1][valid]
    Ldot = _np(res.Ldot).sum(axis=0)[valid]
    grad_fwd = (np.einsum('ni,nip->p', P_bar[valid], Pdot)
                + np.einsum('ni,nip->p', S_bar[valid], Sdot)
                + np.einsum('n,np->p', L_bar[valid], Ldot))

    head = RawSeed(P_bar, S_bar, L_bar)
    grad_adj, _ = adjoint_gradient(surfaces, P, S, WVL, seeds, head)
    np.testing.assert_allclose(grad_adj, grad_fwd, rtol=1e-7, atol=1e-10)


def test_position_only_cotangent():
    """A landing-point-only seed matches forward mode."""
    P, S = ray_bundle()
    surfaces = make_system()
    seeds = _all_seeds()
    res = raytrace_with_tangents(surfaces, P, S, WVL, seeds)
    valid = _np(valid_mask(res.trace.status, res.trace.P[-1]))

    n = P.shape[0]
    P_bar = np.zeros((n, 3))
    P_bar[valid, 0] = 1.0          # sum of x landing positions
    S_bar = np.zeros((n, 3))
    L_bar = np.zeros(n)

    grad_fwd = np.einsum('ni,nip->p', P_bar[valid],
                         _np(res.Pdot)[-1][valid])
    head = RawSeed(P_bar, S_bar, L_bar)
    grad_adj, _ = adjoint_gradient(surfaces, P, S, WVL, seeds, head)
    np.testing.assert_allclose(grad_adj, grad_fwd, rtol=1e-7, atol=1e-10)


def test_engine_nominal_trace_matches_raytrace():
    """The engine's traced function at eps=0 reproduces the nominal
    trace (the reference checks its intermediates pass the same way)."""
    P, S = ray_bundle()
    surfaces = make_system()
    seeds = [seed_curvature(0)]
    trace_ref = raytrace(surfaces, P, S, WVL)
    f = _trace_fn(surfaces, seeds, P, S, WVL, None)
    P_hist, S_hist, OPL = f(jnp.zeros(1))
    valid = _np(valid_mask(trace_ref.status, trace_ref.P[-1]))
    np.testing.assert_allclose(_np(P_hist), _np(trace_ref.P)[:, valid],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(_np(S_hist), _np(trace_ref.S)[:, valid],
                               rtol=0, atol=1e-12)


# ---------- nominal merit oracles ----------------------------------------------

def _merit_spot(system, P, S):
    tr = raytrace(system, P, S, WVL)
    valid = _np(valid_mask(tr.status, tr.P[-1]))
    xy = _np(tr.P)[-1][valid, :2]
    centroid = xy.mean(axis=0)
    return float(np.sqrt(np.mean(np.sum((xy - centroid) ** 2, axis=1))))


def _merit_wfe(system, P, S, n_image=1.0):
    tr = raytrace(system, P, S, WVL)
    valid = _np(valid_mask(tr.status, tr.P[-1]))
    chief = _pupil_center_chief_index(_np(tr.P)[0])
    C = _np(tr.P)[-1][chief]
    P_xp = _np(_closest_approach_on_axis(
        C, _np(tr.S)[-1][chief], np.zeros(3), np.array([0., 0., 1.])))
    R = float(np.sqrt(np.sum((P_xp - C) ** 2)))
    # independent reference-sphere oracle (the explicit -b - sqrt root)
    d = _np(tr.P)[-1][valid] - C
    b = np.sum(_np(tr.S)[-1][valid] * d, axis=-1)
    cc = np.sum(d * d, axis=-1) - R * R
    t = -b - np.sqrt(b * b - cc)
    OPL_total = _np(tr.OPL)[:, valid].sum(axis=0) + n_image * t
    valid_idx = np.nonzero(valid)[0]
    chief_v = int(np.nonzero(valid_idx == chief)[0][0])
    opd = OPL_total - OPL_total[chief_v]
    return float(np.sqrt(np.mean(opd ** 2)))


SEEDS_AND_OVERRIDES = [
    (lambda: seed_curvature(0), 'c0', 1e-6),
    (lambda: seed_conic(0), 'k0', 1e-5),
    (lambda: seed_curvature(1), 'c1', 1e-6),
    (lambda: seed_conic(1), 'k1', 1e-5),
    (lambda: seed_despace([(1, +1)]), 'z1', 1e-6),
    (lambda: seed_decenter(1, 'x'), 'x1', 1e-6),
    (lambda: seed_decenter(1, 'y'), 'y1', 1e-6),
    (lambda: seed_index(0), 'ng', 1e-6),
]


def _fd_grad(merit_fn, P, S):
    def central(key, h):
        sides = [merit_fn(make_system(**{key: BASE[key] + sign * h}),
                          P, S) for sign in (+1, -1)]
        return (sides[0] - sides[1]) / (2 * h)

    return np.asarray([central(key, h)
                       for _, key, h in SEEDS_AND_OVERRIDES])


def _seeds():
    return [fn() for (fn, _, _) in SEEDS_AND_OVERRIDES]


def test_spot_size_vs_fd():
    P, S = ray_bundle()
    grad_adj, _ = adjoint_gradient(make_system(), P, S, WVL, _seeds(),
                                   RmsSpotRadius())
    grad_fd = _fd_grad(_merit_spot, P, S)
    np.testing.assert_allclose(grad_adj, grad_fd, rtol=2e-5, atol=1e-8)


def test_wfe_vs_forward_mode():
    P, S = ray_bundle()
    seeds = _seeds()
    opd, xp, yp, dW = wavefront_with_tangents(make_system(), P, S, WVL,
                                              seeds, output='length')
    opd, dW = _np(opd), _np(dW)
    nv = opd.shape[0]
    rms = float(np.sqrt(np.mean(opd ** 2)))
    opd_bar = opd / (nv * rms)
    grad_fwd = np.einsum('v,vp->p', opd_bar, dW)

    grad_adj, _ = adjoint_gradient(make_system(), P, S, WVL, seeds,
                                   WavefrontRMS())
    np.testing.assert_allclose(grad_adj, grad_fwd, rtol=1e-6, atol=1e-10)


def test_wfe_vs_fd():
    P, S = ray_bundle()
    grad_adj, _ = adjoint_gradient(make_system(), P, S, WVL, _seeds(),
                                   WavefrontRMS())
    np.testing.assert_allclose(grad_adj, _fd_grad(_merit_wfe, P, S),
                               rtol=2e-5, atol=1e-9)


# ---------- the Merit contract --------------------------------------------------

def test_seeded_merits_are_merits():
    for head in (RmsSpotRadius(), WavefrontRMS()):
        assert isinstance(head, Merit)
        assert head.has_value and head.seedable


def test_distortion_is_optimizer_only():
    # a bare landing coordinate is not a usable figure of merit without
    # a target; distortion stays optimizer-only
    landing = Distortion(field=None, wavelength=WVL, epd=10.0)
    assert isinstance(landing, Merit)
    assert not (landing.seedable or landing.has_value)


def test_merit_base_stubs_raise():
    stub = Merit()
    assert not (stub.has_value or stub.seedable)
    for poke in (lambda: stub.value(None, None, None),
                 lambda: stub.seed(None, None, None),
                 lambda: stub(None, None)):
        with pytest.raises(NotImplementedError):
            poke()


def test_value_only_merit_flags():
    class TracedConstant(Merit):
        name = 'traced_constant'

        def value(self, trace, prescription, wavelength):
            return 1.0

    assert TracedConstant().has_value
    assert not TracedConstant().seedable


def test_spot_value_matches_rms_spot_radius():
    P, S = ray_bundle()
    path = make_system()
    run = raytrace(path, P, S, WVL)
    from_head = RmsSpotRadius().value(run, path, WVL)
    from_stat = float(rms_spot_radius(_np(run.P)[-1],
                                      status=_np(run.status)))
    assert np.isclose(from_head, from_stat)
    assert np.isclose(from_head, _merit_spot(path, P, S))
