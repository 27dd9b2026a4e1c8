"""First-root intersection robustness: port of the reference intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_intersect_robustness.py (17 tests): the departure-
banded Newton against a polynomial root oracle on folded aspheres,
wrong-sheet rescue, band transparency on mild surfaces, the bracketed
Lipschitz march, forward-only acceptance, the first-segment
exemption, domain resolution, and setup warnings.
"""
import warnings

import numpy as np
import pytest
from numpy.polynomial import polynomial as npoly

import jax  # NOQA: F401

from prysm_tpu.x.raytracing.surfaces import (
    EvenAsphere, Sphere, Surface, Zernike)
from prysm_tpu.x.raytracing.aperture import (
    Aperture, CircularExtent, circular_aperture)
from prysm_tpu.x.raytracing.intersections import (
    bracketed_newton_solve_s, ray_conic_intersect)
from prysm_tpu.x.raytracing.spencer_and_murty import (
    STATUS_OK, newton_raphson_solve_s, raytrace)


def _np(x):
    return np.asarray(x)


GULL_C = 1 / 30.0
GULL_COEFS = (-2e-5, 1e-9)


def polynomial_first_root(P, S, c, coefs):
    """All forward ray intersections with a k=-1 even asphere, sorted."""
    Px, Py, Pz = P
    Sx, Sy, Sz = S
    rsq = np.array([Px * Px + Py * Py, 2 * (Px * Sx + Py * Sy),
                    Sx * Sx + Sy * Sy])
    sag = npoly.polymul(np.array([c / 2]), rsq)
    p = rsq.copy()
    for a in coefs:
        p = npoly.polymul(p, rsq)
        sag = npoly.polyadd(sag, a * p)
    F = npoly.polysub(np.array([Pz, Sz]), sag)
    r = npoly.polyroots(F)
    real = r[np.abs(r.imag) < 1e-9].real
    return np.sort(real[real >= -1e-12])


def gull_wing_surface(outer_radius=30.0):
    shape = EvenAsphere(c=GULL_C, k=-1.0, coefs=GULL_COEFS)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        surf = Surface(shape=shape, interaction='reflect', P=[0, 0, 0],
                       aperture=Aperture(
                           clip=circular_aperture(outer_radius),
                           extent=CircularExtent(outer_radius)))
        surf.departure_band()
    return surf


def test_gull_wing_matches_polynomial_oracle():
    surf = gull_wing_surface()
    checked = 0
    for h in np.linspace(0, 14, 8):
        for ang in np.linspace(-60, 60, 17):
            a = np.radians(ang)
            P = np.array([[0.0, h, -10.0]])
            S = np.array([[0.0, np.sin(a), np.cos(a)]])
            roots = polynomial_first_root(P[0], S[0], GULL_C, GULL_COEFS)
            Q, n, v = surf.intersect(P, S, forward_only=True)
            Q, v = _np(Q), _np(v)
            if len(roots) == 0:
                assert not v[0], f'no-intersection ray traced (h={h})'
                continue
            assert v[0], f'real intersection not traced (h={h}, ang={ang})'
            s_found = float(np.sum((Q[0] - P[0]) * S[0]))
            assert s_found == pytest.approx(roots[0], abs=1e-6), \
                f'wrong sheet at h={h}, ang={ang}'
            checked += 1
    assert checked > 100


def test_known_wrong_sheet_rays_are_fixed():
    surf = gull_wing_surface()
    shape = surf.shape
    for h, ang in [(1.0, -60.0), (0.5, 60.0), (8.0, 51.0)]:
        a = np.radians(ang)
        P = np.array([[0.0, h, -10.0]])
        S = np.array([[0.0, np.sin(a), np.cos(a)]])
        roots = polynomial_first_root(P[0], S[0], GULL_C, GULL_COEFS)
        assert len(roots) >= 2

        Sz = S[..., 2]
        s0 = -P[..., 2] / Sz
        P1 = P + s0[..., np.newaxis] * S
        Qc, _, _ = ray_conic_intersect(P1, S, GULL_C, -1.0)
        s1 = _np(Qc)[..., 2] / Sz
        Qn, _, vn = newton_raphson_solve_s(P1, S, shape.sag_and_normal,
                                           s1=s1)
        s_raw = float(np.sum((_np(Qn)[0] - P[0]) * S[0]))
        assert _np(vn)[0]
        assert abs(s_raw - roots[0]) > 1.0

        Q, n, v = surf.intersect(P, S, forward_only=True)
        assert _np(v)[0]
        s_found = float(np.sum((_np(Q)[0] - P[0]) * S[0]))
        assert s_found == pytest.approx(roots[0], abs=1e-6)


def test_mild_asphere_band_is_transparent():
    shape = EvenAsphere(c=1 / 50.0, k=0.0, coefs=(1e-7, 1e-10))
    surf = Surface(shape=shape, interaction='reflect', P=[0, 0, 0],
                   aperture=Aperture(clip=circular_aperture(15.0),
                                     extent=CircularExtent(15.0)))
    h = np.linspace(-14, 14, 23)
    P = np.zeros((h.size, 3))
    P[:, 1] = h
    P[:, 2] = -5.0
    S = np.zeros((h.size, 3))
    S[:, 2] = 1.0
    Qg, ng, vg = surf.intersect(P, S, forward_only=True)
    Qc, _, _ = ray_conic_intersect(P, S, 1 / 50.0, 0.0)
    s1 = _np(Qc)[..., 2]
    Qr, nr, vr = newton_raphson_solve_s(P + np.array([0, 0, 5.0]), S,
                                        shape.sag_and_normal, s1=s1)
    assert _np(vg).all() and _np(vr).all()
    assert np.allclose(_np(Qg), _np(Qr), atol=1e-10)
    assert np.allclose(_np(ng), _np(nr), atol=1e-10)


def test_bracketed_newton_first_root_in_band():
    surf = gull_wing_surface()
    shape = surf.shape
    a = np.radians(-60)
    P1 = np.array([[0.0, -17.32050808, 0.0]])
    S = np.array([[0.0, np.sin(a), np.cos(a)]])
    lo = np.array([-30.0])
    hi = np.array([160.0])
    Q, n, v = bracketed_newton_solve_s(
        P1, S, shape.sag_and_normal, lo, hi,
        lipschitz=surf.departure_band().lipschitz, domain_radius=30.0)
    assert _np(v)[0]
    s_found = float(np.sum((_np(Q)[0] - P1[0]) * S[0]))
    roots = polynomial_first_root(P1[0], S[0], GULL_C, GULL_COEFS)
    assert s_found == pytest.approx(roots[0], abs=1e-6)


def test_bracketed_newton_requires_lipschitz():
    shape = Sphere(c=1 / 100.0)
    with pytest.raises(ValueError):
        bracketed_newton_solve_s(np.array([[0.0, 0.0, -5.0]]),
                                 np.array([[0.0, 0.0, 1.0]]),
                                 shape.sag_and_normal,
                                 np.array([0.0]), np.array([2.0]))


def test_bracketed_newton_rejects_no_sign_change():
    shape = Sphere(c=1 / 100.0)
    Q, n, v = bracketed_newton_solve_s(
        np.array([[0.0, 0.0, -5.0]]), np.array([[0.0, 0.0, 1.0]]),
        shape.sag_and_normal, np.array([0.0]), np.array([2.0]),
        lipschitz=1.0)
    assert not _np(v)[0]
    assert np.isnan(_np(Q)[0]).all()


def test_forward_only_rejects_root_behind_ray():
    shape = EvenAsphere(c=1 / 50.0, k=0.0, coefs=(1e-7,))
    surf = Surface(shape=shape, interaction='reflect', P=[0, 0, 0],
                   aperture=Aperture(clip=circular_aperture(15.0),
                                     extent=CircularExtent(15.0)))
    P = np.array([[0.0, 2.0, 5.0]])
    S = np.array([[0.0, 0.0, 1.0]])
    Q, n, v = surf.intersect(P, S, forward_only=False)
    assert _np(v)[0]
    assert float(np.sum((_np(Q)[0] - P[0]) * S[0])) < 0
    Q, n, v = surf.intersect(P, S, forward_only=True)
    assert not _np(v)[0]


def test_first_segment_exempt_from_forward_acceptance():
    shape = EvenAsphere(c=-1 / 40.0, k=0.0, coefs=(1e-8,))
    surf = Surface(shape=shape, interaction='reflect', P=[0, 0, 0],
                   aperture=Aperture(clip=circular_aperture(12.0),
                                     extent=CircularExtent(12.0)))
    h = np.linspace(-10, 10, 11)
    P = np.zeros((h.size, 3))
    P[:, 1] = h
    S = np.zeros((h.size, 3))
    S[:, 2] = 1.0
    res = raytrace([surf], P, S, 0.5876)
    assert (_np(res.status).imag == STATUS_OK).all()

    P_past = P.copy()
    P_past[:, 2] = 5.0
    res = raytrace([surf], P_past, S, 0.5876)
    assert (_np(res.status).imag == STATUS_OK).all()

    eval_surf = Surface(shape=Sphere(c=0.0), interaction='eval',
                        P=[0, 0, 5.0])
    res = raytrace([eval_surf, surf], P_past, S, 0.5876)
    assert (_np(res.status).imag != STATUS_OK).all()
    assert (_np(res.status).real == 2).all()


def test_departure_band_domain_resolution():
    asph = EvenAsphere(c=1 / 50.0, k=0.0, coefs=(1e-7,))
    s = Surface(shape=asph, interaction='reflect', P=[0, 0, 0],
                aperture=Aperture(clip=circular_aperture(9.0),
                                  extent=CircularExtent(12.0)))
    band = s.departure_band()
    assert band.bounded
    assert band.domain_radius == 9.0
    assert band.max_departure > 0

    zern = Zernike(c=1 / 50.0, k=0.0, normalization_radius=7.0,
                   nms=[(4, 0)], coefs=[1e-4])
    s = Surface(shape=zern, interaction='reflect', P=[0, 0, 0])
    assert s.departure_band().domain_radius == 7.0

    s = Surface(shape=asph, interaction='reflect', P=[0, 0, 0])
    assert s.departure_band().domain_radius == pytest.approx(0.999 * 50.0,
                                                             rel=1e-12)

    para = EvenAsphere(c=1 / 50.0, k=-1.0, coefs=(1e-7,))
    s = Surface(shape=para, interaction='reflect', P=[0, 0, 0])
    assert not s.departure_band().bounded

    s = Surface(shape=Sphere(c=1 / 50.0), interaction='reflect', P=[0, 0, 0])
    assert not s.departure_band().bounded


def test_multiple_crossing_setup_warning():
    shape = EvenAsphere(c=GULL_C, k=-1.0, coefs=GULL_COEFS)
    surf = Surface(shape=shape, interaction='reflect', P=[0, 0, 0],
                   aperture=Aperture(clip=circular_aperture(30.0),
                                     extent=CircularExtent(30.0)))
    with pytest.warns(UserWarning, match='multiple ray crossings'):
        surf.departure_band()

    mild = EvenAsphere(c=1 / 50.0, k=0.0, coefs=(1e-8,))
    surf = Surface(shape=mild, interaction='reflect', P=[0, 0, 0],
                   aperture=Aperture(clip=circular_aperture(10.0),
                                     extent=CircularExtent(10.0)))
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        surf.departure_band()


def test_rim_grazer_oracle_agreement():
    surf = gull_wing_surface()
    wrong = 0
    for h in np.linspace(15, 25, 6):
        for ang in (75.0, 80.0, 85.0, -75.0, -80.0):
            a = np.radians(ang)
            P = np.array([[0.0, h, -2.0]])
            S = np.array([[0.0, np.sin(a), np.cos(a)]])
            roots = polynomial_first_root(P[0], S[0], GULL_C, GULL_COEFS)
            Q, n, v = surf.intersect(P, S, forward_only=True)
            if not _np(v)[0]:
                continue
            s_found = float(np.sum((_np(Q)[0] - P[0]) * S[0]))
            if len(roots) == 0 or abs(s_found - roots[0]) > 1e-6:
                wrong += 1
    assert wrong == 0
