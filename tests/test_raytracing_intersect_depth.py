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
    """All forward ray intersections with a k=-1 even asphere, sorted.

    Along the ray, r^2(s) is a quadratic in s; the k=-1 sag is a pure
    polynomial in r^2, so F(s) = Pz + s Sz - sag(r^2(s)) is a polynomial
    whose nonnegative real roots are the crossings.
    """
    r2_of_s = np.array([P[0] ** 2 + P[1] ** 2,
                        2 * (P[0] * S[0] + P[1] * S[1]),
                        S[0] ** 2 + S[1] ** 2])
    z_of_s = npoly.polymul(np.array([c / 2]), r2_of_s)
    power = r2_of_s.copy()
    for coef in coefs:
        power = npoly.polymul(power, r2_of_s)
        z_of_s = npoly.polyadd(z_of_s, coef * power)
    crossings = npoly.polyroots(
        npoly.polysub(np.array([P[2], S[2]]), z_of_s))
    keep = crossings[np.abs(crossings.imag) < 1e-9].real
    return np.sort(keep[keep >= -1e-12])


def meridional_ray(h, ang_deg, z0=-10.0):
    a = np.radians(ang_deg)
    return (np.array([[0.0, h, z0]]),
            np.array([[0.0, np.sin(a), np.cos(a)]]))


def reach_of(Q, P, S):
    """Signed path length from P to the found intersection Q."""
    return float(np.sum((_np(Q)[0] - P[0]) * S[0]))


def round_aperture(radius):
    return Aperture(clip=circular_aperture(radius),
                    extent=CircularExtent(radius))


def gull_wing_surface(outer_radius=30.0):
    folded = EvenAsphere(c=GULL_C, k=-1.0, coefs=GULL_COEFS)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        surf = Surface(shape=folded, interaction='reflect', P=[0, 0, 0],
                       aperture=round_aperture(outer_radius))
        surf.departure_band()
    return surf


def test_gull_wing_matches_polynomial_oracle():
    surf = gull_wing_surface()
    checked = 0
    import itertools
    for h, ang in itertools.product(np.linspace(0, 14, 8),
                                    np.linspace(-60, 60, 17)):
        P, S = meridional_ray(h, ang)
        oracle = polynomial_first_root(P[0], S[0], GULL_C, GULL_COEFS)
        Q, _, alive = surf.intersect(P, S, forward_only=True)
        if oracle.size == 0:
            assert not _np(alive)[0], f'no-intersection ray traced (h={h})'
            continue
        assert _np(alive)[0], f'real crossing not traced (h={h}, a={ang})'
        assert reach_of(Q, P, S) == pytest.approx(oracle[0], abs=1e-6), \
            f'wrong sheet at h={h}, ang={ang}'
        checked += 1
    assert checked > 100


def test_known_wrong_sheet_rays_are_fixed():
    surf = gull_wing_surface()
    shape = surf.shape
    for h, ang in [(1.0, -60.0), (0.5, 60.0), (8.0, 51.0)]:
        P, S = meridional_ray(h, ang)
        oracle = polynomial_first_root(P[0], S[0], GULL_C, GULL_COEFS)
        assert oracle.size >= 2

        # naive conic-seeded Newton converges onto a LATER sheet here
        to_vertex_plane = -P[..., 2] / S[..., 2]
        at_plane = P + to_vertex_plane[..., np.newaxis] * S
        Qc, _, _ = ray_conic_intersect(at_plane, S, GULL_C, -1.0)
        Qn, _, naive_ok = newton_raphson_solve_s(
            at_plane, S, shape.sag_and_normal,
            s1=_np(Qc)[..., 2] / S[..., 2])
        assert _np(naive_ok)[0]
        assert abs(reach_of(Qn, P, S) - oracle[0]) > 1.0

        # the production intersect rescues the first sheet
        Q, _, alive = surf.intersect(P, S, forward_only=True)
        assert _np(alive)[0]
        assert reach_of(Q, P, S) == pytest.approx(oracle[0], abs=1e-6)


def test_mild_asphere_band_is_transparent():
    shape = EvenAsphere(c=1 / 50.0, k=0.0, coefs=(1e-7, 1e-10))
    surf = Surface(shape=shape, interaction='reflect', P=[0, 0, 0],
                   aperture=round_aperture(15.0))
    heights = np.linspace(-14, 14, 23)
    P = np.stack([np.zeros_like(heights), heights,
                  np.full_like(heights, -5.0)], axis=1)
    S = np.broadcast_to(np.array([0., 0., 1.]), P.shape).copy()
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
    P1, S = meridional_ray(-17.32050808, -60, z0=0.0)
    Q, _, alive = bracketed_newton_solve_s(
        P1, S, shape.sag_and_normal, np.array([-30.0]), np.array([160.0]),
        lipschitz=surf.departure_band().lipschitz, domain_radius=30.0)
    assert _np(alive)[0]
    oracle = polynomial_first_root(P1[0], S[0], GULL_C, GULL_COEFS)
    assert reach_of(Q, P1, S) == pytest.approx(oracle[0], abs=1e-6)


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
    surf = Surface(shape=EvenAsphere(c=1 / 50.0, k=0.0, coefs=(1e-7,)),
                   interaction='reflect', P=[0, 0, 0],
                   aperture=round_aperture(15.0))
    P = np.array([[0.0, 2.0, 5.0]])   # launched past the surface
    S = np.array([[0.0, 0.0, 1.0]])
    behind, _, alive = surf.intersect(P, S, forward_only=False)
    assert _np(alive)[0]
    assert reach_of(behind, P, S) < 0
    _, _, alive = surf.intersect(P, S, forward_only=True)
    assert not _np(alive)[0]


def test_first_segment_exempt_from_forward_acceptance():
    surf = Surface(shape=EvenAsphere(c=-1 / 40.0, k=0.0, coefs=(1e-8,)),
                   interaction='reflect', P=[0, 0, 0],
                   aperture=round_aperture(12.0))
    heights = np.linspace(-10, 10, 11)
    P = np.stack([np.zeros_like(heights), heights,
                  np.zeros_like(heights)], axis=1)
    S = np.broadcast_to(np.array([0., 0., 1.]), P.shape).copy()
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
                                  extent=CircularExtent(12.0)))  # clip wins
    band = s.departure_band()
    assert band.bounded and band.max_departure > 0
    assert band.domain_radius == 9.0  # the smaller clip wins

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
    steep = Surface(shape=EvenAsphere(c=GULL_C, k=-1.0,
                                      coefs=GULL_COEFS),
                    interaction='reflect', P=[0, 0, 0],
                    aperture=round_aperture(30.0))
    with pytest.warns(UserWarning, match='multiple ray crossings'):
        steep.departure_band()

    gentle = Surface(shape=EvenAsphere(c=1 / 50.0, k=0.0, coefs=(1e-8,)),
                     interaction='reflect', P=[0, 0, 0],
                     aperture=round_aperture(10.0))
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        gentle.departure_band()


def test_rim_grazer_oracle_agreement():
    import itertools
    surf = gull_wing_surface()
    wrong = 0
    grazers = itertools.product(np.linspace(15, 25, 6),
                                (75.0, 80.0, 85.0, -75.0, -80.0))
    for h, ang in grazers:
        P, S = meridional_ray(h, ang, z0=-2.0)
        oracle = polynomial_first_root(P[0], S[0], GULL_C, GULL_COEFS)
        Q, _, alive = surf.intersect(P, S, forward_only=True)
        if not _np(alive)[0]:
            continue
        if oracle.size == 0 or abs(reach_of(Q, P, S) - oracle[0]) > 1e-6:
            wrong += 1
    assert wrong == 0
