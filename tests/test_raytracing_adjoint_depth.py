"""Adjoint/differential depth: port of the reference suites' intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_diff_raytrace.py, adjoint/test_primitives.py, and
adjoint/test_backward_sweep.py: per-primitive transpose (dot-product)
identities, per-seed forward tangents against central finite
differences (including the FD fallback and all-seeds-at-once), the
diffractive paths, and adjoint gradients of merit heads against
forward-mode and finite differences.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import prysm_tpu.x.materials as materials
import prysm_tpu.x.raytracing as rt
from prysm_tpu.x.raytracing.surfaces import Surface
from prysm_tpu.x.raytracing.spencer_and_murty import (
    eic_closing, intersect, raytrace, reflect, refract_with_tir,
    transform_to_global_coords, transform_to_local_coords, valid_mask)
from prysm_tpu.x.raytracing._diff_raytrace import (
    _closest_point_on_axis_jnp, raytrace_with_tangents)
from prysm_tpu.x.raytracing.adjoint.seeds import (
    seed_conic, seed_curvature, seed_decenter, seed_despace, seed_index,
    seed_tilt)
from prysm_tpu.x.raytracing.adjoint.engine import (
    BoresightHead, RmsSpotHead, adjoint_gradient)
from prysm_tpu.x.raytracing.adjoint import primitives as ap

RTOL = 1e-9
N = 17


def _np(x):
    return np.asarray(x)


def _vdot(a, b):
    return float(np.sum(_np(a) * _np(b)))


def _rng():
    return np.random.default_rng(0xC0FFEE)


def _unit(rng, n):
    v = rng.standard_normal((n, 3))
    v[:, 2] = np.abs(v[:, 2]) + 0.5
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _rot(rng):
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    return q


def _dot_identity(fn, primals, tangents, cotangents, bars):
    """<ybar, J dx> == sum_i <bar_i, dx_i> for the pullback `bars`."""
    primals = tuple(jnp.asarray(p) for p in primals)
    tangents = tuple(jnp.asarray(t, dtype=p.dtype)
                     for p, t in zip(primals, tangents))
    out, jvp = jax.jvp(fn, primals, tangents)
    if not isinstance(jvp, tuple):
        jvp = (jvp,)
    if not isinstance(cotangents, tuple):
        cotangents = (cotangents,)
    lhs = sum(_vdot(c, j) for c, j in zip(cotangents, jvp))
    rhs = sum(_vdot(b, t) for b, t in zip(bars, tangents) if b is not None)
    assert np.isclose(lhs, rhs, rtol=RTOL), (lhs, rhs)


# ---------- primitive transpose identities ----------------------------------

def test_adj_transform_local_identity():
    rng = _rng()
    R = _rot(rng)
    Q = rng.standard_normal(3)
    P = rng.standard_normal((N, 3))
    S = rng.standard_normal((N, 3))
    dP, dS = rng.standard_normal((N, 3)), rng.standard_normal((N, 3))
    dQ, dR = rng.standard_normal(3), rng.standard_normal((3, 3))
    P_loc_bar = rng.standard_normal((N, 3))
    S_loc_bar = rng.standard_normal((N, 3))
    bars = ap.adj_transform_local(P, S, Q, R, P_loc_bar, S_loc_bar)

    def fn(Pv, Sv, Qv, Rv):
        return transform_to_local_coords(Pv, Qv, Sv, Rv)

    _dot_identity(fn, (P, S, Q, R), (dP, dS, dQ, dR),
                  (P_loc_bar, S_loc_bar), bars)


def test_adj_transform_global_identity():
    rng = _rng()
    R = _rot(rng)
    Q = rng.standard_normal(3)
    P_loc = rng.standard_normal((N, 3))
    S_loc = rng.standard_normal((N, 3))
    tangents = (rng.standard_normal((N, 3)), rng.standard_normal((N, 3)),
                rng.standard_normal(3), rng.standard_normal((3, 3)))
    P_bar = rng.standard_normal((N, 3))
    S_bar = rng.standard_normal((N, 3))
    bars = ap.adj_transform_global(P_loc, S_loc, Q, R, P_bar, S_bar)

    def fn(Pv, Sv, Qv, Rv):
        return transform_to_global_coords(Pv, Qv, Sv, Rv)

    _dot_identity(fn, (P_loc, S_loc, Q, R), tangents, (P_bar, S_bar), bars)


def test_adj_refract_identity():
    rng = _rng()
    n, nprime = 1.0, 1.51
    S_loc = _unit(rng, N)
    n_hat = _unit(rng, N)
    tangents = (np.asarray(rng.standard_normal()),
                np.asarray(rng.standard_normal()),
                rng.standard_normal((N, 3)), rng.standard_normal((N, 3)))
    Sprime_bar = rng.standard_normal((N, 3))
    bars = ap.adj_refract(n, nprime, S_loc, n_hat, Sprime_bar)

    def fn(nv, npv, Sv, nh):
        out, _ = refract_with_tir(nv, npv, Sv, nh)
        return out

    _dot_identity(fn, (np.float64(n), np.float64(nprime), S_loc, n_hat),
                  tangents, Sprime_bar, bars)


def test_adj_reflect_identity():
    rng = _rng()
    S_loc = _unit(rng, N)
    n_hat = _unit(rng, N)
    tangents = (rng.standard_normal((N, 3)), rng.standard_normal((N, 3)))
    Sprime_bar = rng.standard_normal((N, 3))
    bars = ap.adj_reflect(S_loc, n_hat, Sprime_bar)
    _dot_identity(reflect, (S_loc, n_hat), tangents, Sprime_bar, bars)


def test_adj_intersect_identity():
    rng = _rng()
    c0 = 1 / 80.0

    def san(x, y, c):
        rsq = x * x + y * y
        denom = 1 + jnp.sqrt(1 - c * c * rsq)
        sag = c * rsq / denom
        g = c / jnp.sqrt(1 - c * c * rsq)
        gx, gy = g * x, g * y
        norm = jnp.sqrt(gx * gx + gy * gy + 1.0)
        n_hat = jnp.stack([gx / norm, gy / norm, -1.0 / norm * jnp.ones_like(gx)],
                          axis=-1)
        return sag, n_hat

    P0 = np.zeros((N, 3))
    P0[:, 0] = rng.uniform(-3, 3, N)
    P0[:, 1] = rng.uniform(-3, 3, N)
    S = np.tile([0.0, 0.0, 1.0], (N, 1))
    S = S + rng.standard_normal((N, 3)) * 0.01
    S /= np.linalg.norm(S, axis=1, keepdims=True)

    Q_bar = rng.standard_normal((N, 3))
    n_hat_bar = rng.standard_normal((N, 3))
    bars = ap.adj_intersect(san, P0, S, Q_bar, n_hat_bar,
                            params=(np.float64(c0),))

    def fn(Pv, Sv, cv):
        Q, n_hat, _ = intersect(Pv, Sv, lambda x, y: san(x, y, cv))
        return Q, n_hat

    tangents = (rng.standard_normal((N, 3)), rng.standard_normal((N, 3)),
                np.asarray(rng.standard_normal()))
    _dot_identity(fn, (P0, S, np.float64(c0)), tangents,
                  (Q_bar, n_hat_bar), bars)


def test_adj_opl_segment_identity_and_signed():
    rng = _rng()
    n_pre = 1.37
    t = rng.standard_normal(N)
    S = _unit(rng, N)
    seg = t[:, None] * S
    L_bar = rng.standard_normal(N)

    # unsigned
    bars = ap.adj_opl_segment(n_pre, seg, L_bar)

    def fn_u(nv, segv):
        return nv * jnp.sqrt(jnp.sum(segv * segv, axis=-1))

    tangents = (np.asarray(rng.standard_normal()),
                rng.standard_normal((N, 3)))
    _dot_identity(fn_u, (np.float64(n_pre), seg), tangents, L_bar, bars)

    # signed
    bars_s = ap.adj_opl_segment(n_pre, seg, L_bar, S)

    def fn_s(nv, segv):
        ln = jnp.sqrt(jnp.sum(segv * segv, axis=-1))
        sign = jnp.sign(jnp.sum(segv * jnp.asarray(S), axis=-1))
        return nv * sign * ln

    _dot_identity(fn_s, (np.float64(n_pre), seg), tangents, L_bar, bars_s)


def _converging_bundle(rng):
    P = rng.standard_normal((N, 3)) * 0.3
    S = np.tile([0.0, 0.0, 1.0], (N, 1)) + rng.standard_normal((N, 3)) * 0.02
    S /= np.linalg.norm(S, axis=1, keepdims=True)
    return P, S


def test_adj_eic_closing_identity():
    rng = _rng()
    P, S = _converging_bundle(rng)
    C = np.array([0.0, 0.0, 50.0])
    kappa = 1.0 / 50.0
    s_bar = rng.standard_normal(N)
    bars = ap.adj_eic_closing(P, S, C, kappa, s_bar)

    def fn(Pv, Sv, Cv, kv):
        return eic_closing(Pv, Sv, Cv, kv)[0]

    tangents = (rng.standard_normal((N, 3)), rng.standard_normal((N, 3)),
                rng.standard_normal(3), np.asarray(rng.standard_normal()))
    _dot_identity(fn, (P, S, C, np.float64(kappa)), tangents, s_bar, bars)


def test_adj_eic_closing_full_identity():
    rng = _rng()
    P, S = _converging_bundle(rng)
    C = np.array([0.0, 0.0, 50.0])
    kappa = 1.0 / 50.0
    n_image = 1.33
    s_bar = rng.standard_normal(N)
    bars = ap.adj_eic_closing_full(P, S, C, kappa, s_bar, n_image=n_image)

    def fn(Pv, Sv, Cv, kv, nv):
        return nv * eic_closing(Pv, Sv, Cv, kv)[0]

    tangents = (rng.standard_normal((N, 3)), rng.standard_normal((N, 3)),
                rng.standard_normal(3), np.asarray(rng.standard_normal()),
                np.asarray(rng.standard_normal()))
    _dot_identity(fn, (P, S, C, np.float64(kappa), np.float64(n_image)),
                  tangents, s_bar, bars)


def test_adj_closest_point_on_axis_identity():
    rng = _rng()
    P, S = _converging_bundle(rng)
    axis_point = np.array([0.0, 0.0, 0.0])
    axis_dir = np.array([0.0, 0.0, 1.0])
    P_xp_bar = rng.standard_normal(3)
    bars = ap.adj_closest_point_on_axis(P, S, axis_point, axis_dir, P_xp_bar)

    def fn(Pv, Sv):
        return _closest_point_on_axis_jnp(
            Pv, Sv, jnp.asarray(axis_point, dtype=Pv.dtype),
            jnp.asarray(axis_dir, dtype=Pv.dtype))

    tangents = (rng.standard_normal((N, 3)), rng.standard_normal((N, 3)))
    _dot_identity(fn, (P, S), tangents, P_xp_bar, bars)


# ---------- seed tangents vs central FD --------------------------------------

NG = 1.62
WVL = 0.55
BASE = dict(c0=1 / 42.0, k0=-0.55, c1=-1 / 52.0, k1=0.15,
            z0=0.0, z1=6.5, zimg=55.0, x1=0.0, y1=0.0, tiltx1=0.0, ng=NG)


def make_system(**overrides):
    p = dict(BASE, **overrides)
    glass = materials.ConstantMaterial(p['ng'])
    kw2 = {}
    if p['tiltx1'] != 0.0:
        kw2 = dict(tilt=(0.0, 0.0, p['tiltx1']), tilt_radians=True)
    return [
        Surface(shape=rt.Conic(p['c0'], p['k0']), interaction='refract',
                P=[0, 0, p['z0']], material=glass),
        Surface(shape=rt.Conic(p['c1'], p['k1']), interaction='refract',
                P=[p['x1'], p['y1'], p['z1']], material=materials.air,
                **kw2),
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


def fd_state(over_plus, over_minus, P, S, h):
    def state(over):
        tr = raytrace(make_system(**over), P, S, WVL)
        return (_np(tr.P)[-1], _np(tr.S)[-1], _np(tr.OPL).sum(axis=0))
    Pp, Sp, Lp = state(over_plus)
    Pm, Sm, Lm = state(over_minus)
    return (Pp - Pm) / (2 * h), (Sp - Sm) / (2 * h), (Lp - Lm) / (2 * h)


def _check_seed(seed, over_plus, over_minus, h, rtol=1e-6, atol_P=1e-7,
                atol_S=1e-9, atol_L=1e-7):
    P, S = ray_bundle()
    res = raytrace_with_tangents(make_system(), P, S, WVL, [seed])
    dP = _np(res.Pdot)[-1][:, :, 0]
    dS = _np(res.Sdot)[-1][:, :, 0]
    dL = _np(res.Ldot).sum(axis=0)[:, 0]
    dP_fd, dS_fd, dL_fd = fd_state(over_plus, over_minus, P, S, h)
    np.testing.assert_allclose(dP, dP_fd, rtol=rtol, atol=atol_P)
    np.testing.assert_allclose(dS, dS_fd, rtol=rtol, atol=atol_S)
    np.testing.assert_allclose(dL, dL_fd, rtol=rtol, atol=atol_L)


_H6, _H5 = 1e-6, 1e-5
_SEED_CASES = [
    ('curvature0', lambda: seed_curvature(0),
     dict(c0=BASE['c0'] + _H6), dict(c0=BASE['c0'] - _H6), _H6, {}),
    ('curvature1', lambda: seed_curvature(1),
     dict(c1=BASE['c1'] + _H6), dict(c1=BASE['c1'] - _H6), _H6, {}),
    ('conic0', lambda: seed_conic(0),
     dict(k0=BASE['k0'] + _H5), dict(k0=BASE['k0'] - _H5), _H5, {}),
    ('conic1', lambda: seed_conic(1),
     dict(k1=BASE['k1'] + _H5), dict(k1=BASE['k1'] - _H5), _H5, {}),
    ('despace1', lambda: seed_despace([(1, +1)]),
     dict(z1=BASE['z1'] + _H6), dict(z1=BASE['z1'] - _H6), _H6, {}),
    ('thickness_fanout', lambda: seed_despace([(1, +1), (2, +1)]),
     dict(z1=BASE['z1'] + _H6, zimg=BASE['zimg'] + _H6),
     dict(z1=BASE['z1'] - _H6, zimg=BASE['zimg'] - _H6), _H6, {}),
    ('decenter1_x', lambda: seed_decenter(1, 'x'),
     dict(x1=_H6), dict(x1=-_H6), _H6, {}),
    ('decenter1_y', lambda: seed_decenter(1, 'y'),
     dict(y1=_H6), dict(y1=-_H6), _H6, {}),
    ('tilt1_x', lambda: seed_tilt(1, 'x'),
     dict(tiltx1=_H6), dict(tiltx1=-_H6), _H6,
     dict(rtol=1e-5, atol_P=1e-6, atol_S=1e-8, atol_L=1e-6)),
    ('index_glass', lambda: seed_index(0),
     dict(ng=NG + _H6), dict(ng=NG - _H6), _H6, {}),
]


@pytest.mark.parametrize('mk_seed, over_plus, over_minus, h, tols',
                         [c[1:] for c in _SEED_CASES],
                         ids=[c[0] for c in _SEED_CASES])
def test_seed_tangents_match_fd(mk_seed, over_plus, over_minus, h, tols):
    _check_seed(mk_seed(), over_plus, over_minus, h, **tols)


def test_fd_fallback_freeform_curvature():
    P, S = ray_bundle()
    coefs = (1e-7,)
    c0, k0 = 1 / 40.0, -0.6

    def system(c):
        return [
            Surface(shape=rt.EvenAsphere(c, k0, coefs),
                    interaction='refract', P=[0, 0, 0],
                    material=materials.ConstantMaterial(NG)),
            Surface(shape=rt.Plane(), interaction='eval', P=[0, 0, 56.0]),
        ]

    res = raytrace_with_tangents(system(c0), P, S, WVL, [seed_curvature(0)])
    dP = _np(res.Pdot)[-1][:, :, 0]
    h = 1e-6
    trp = raytrace(system(c0 + h), P, S, WVL)
    trm = raytrace(system(c0 - h), P, S, WVL)
    dP_fd = (_np(trp.P)[-1] - _np(trm.P)[-1]) / (2 * h)
    np.testing.assert_allclose(dP, dP_fd, rtol=1e-4, atol=1e-5)


def test_all_seeds_simultaneously():
    P, S = ray_bundle()
    seeds = [seed_curvature(0), seed_conic(1), seed_despace([(1, +1)]),
             seed_decenter(1, 'y'), seed_index(0)]
    res = raytrace_with_tangents(make_system(), P, S, WVL, seeds)
    assert res.n_params == 5
    h = 1e-6
    overs = [
        (dict(c0=BASE['c0'] + h), dict(c0=BASE['c0'] - h)),
        (dict(k1=BASE['k1'] + h), dict(k1=BASE['k1'] - h)),
        (dict(z1=BASE['z1'] + h), dict(z1=BASE['z1'] - h)),
        (dict(y1=h), dict(y1=-h)),
        (dict(ng=NG + h), dict(ng=NG - h)),
    ]
    for p, (op, om) in enumerate(overs):
        dP = _np(res.Pdot)[-1][:, :, p]
        dP_fd, _, _ = fd_state(op, om, P, S, h)
        np.testing.assert_allclose(dP, dP_fd, rtol=1e-6, atol=1e-7)


# ---------- adjoint gradients of merit heads ---------------------------------

def _fd_head_grad(head, overrides_for, P, S, h=1e-6):
    """Central FD of head(trace) over each named parameter."""
    out = []
    for op, om in overrides_for:
        trp = raytrace(make_system(**op), P, S, WVL)
        trm = raytrace(make_system(**om), P, S, WVL)
        vp = float(head(jnp.asarray(_np(trp.P)), jnp.asarray(_np(trp.S)),
                        jnp.asarray(_np(trp.OPL))))
        vm = float(head(jnp.asarray(_np(trm.P)), jnp.asarray(_np(trm.S)),
                        jnp.asarray(_np(trm.OPL))))
        out.append((vp - vm) / (2 * h))
    return np.asarray(out)


@pytest.mark.parametrize('head_factory', [
    lambda: RmsSpotHead(),
    lambda: BoresightHead(target=(0.1, -0.2)),
])
def test_adjoint_gradient_matches_fd(head_factory):
    P, S = ray_bundle()
    head = head_factory()
    h = 1e-6
    seeds = [seed_curvature(0), seed_despace([(1, +1)]),
             seed_decenter(1, 'y')]
    overs = [
        (dict(c0=BASE['c0'] + h), dict(c0=BASE['c0'] - h)),
        (dict(z1=BASE['z1'] + h), dict(z1=BASE['z1'] - h)),
        (dict(y1=h), dict(y1=-h)),
    ]
    g, nominal = adjoint_gradient(make_system(), P, S, WVL, seeds, head)
    g_fd = _fd_head_grad(head, overs, P, S, h=h)
    np.testing.assert_allclose(_np(g), g_fd, rtol=1e-4, atol=1e-8)
    # the nominal value comes back alongside the gradient
    tr = raytrace(make_system(), P, S, WVL)
    direct = float(head(jnp.asarray(_np(tr.P)), jnp.asarray(_np(tr.S)),
                        jnp.asarray(_np(tr.OPL))))
    assert nominal == pytest.approx(direct, rel=1e-9)


def test_rms_spot_head_matches_analysis():
    from prysm_tpu.x.raytracing.analysis import (
        spot_positions, spot_rms_radius)
    P, S = ray_bundle()
    tr = raytrace(make_system(), P, S, WVL)
    head = RmsSpotHead()
    val = float(head(jnp.asarray(_np(tr.P)), jnp.asarray(_np(tr.S)),
                     jnp.asarray(_np(tr.OPL))))
    x, y = spot_positions(tr.P[-1], status=tr.status)
    rms = float(np.sqrt(np.mean((np.asarray(x) - np.mean(np.asarray(x))) ** 2
                                + (np.asarray(y)
                                   - np.mean(np.asarray(y))) ** 2)))
    assert val == pytest.approx(rms, rel=1e-9)
