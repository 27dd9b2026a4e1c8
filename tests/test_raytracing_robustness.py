"""First-root intersection tests for departure-banded Newton.

Mirrors the reference's robustness suite
(``tests/x/raytracing/test_raytracing_intersect_robustness.py``): the
polynomial oracle gives every real crossing of a ray with a k=-1 even
asphere, and the guarded production ``Surface.intersect`` must land on the
first one even where unguarded conic-seeded Newton converges to the far
sheet.  Adds a jax-only check the reference cannot express: gradients flow
through the Lipschitz rescue via the implicit-function polish.
"""
import warnings

import numpy as onp
from numpy.polynomial import polynomial as npoly

import pytest

import jax
import jax.numpy as jnp

from prysm_tpu.x.raytracing.surfaces import (
    EvenAsphere, Sphere, Zernike, Surface,
)
from prysm_tpu.x.raytracing.aperture import (
    Aperture, CircularExtent, circular_aperture,
)
from prysm_tpu.x.raytracing.intersections import (
    bracketed_newton_solve_s,
    newton_raphson_solve_s,
    ray_conic_intersect,
)
from prysm_tpu.x.raytracing.spencer_and_murty import raytrace, STATUS_OK


# gull-wing even asphere with two forward crossings for many rays
GULL_C = 1 / 30.0
GULL_COEFS = (-2e-5, 1e-9)

# tighter fold where both crossings can land inside the domain
FOLD_C = 1 / 40.0
FOLD_COEFS = (-1e-4, 1e-8)
FOLD_R = 20.0


def polynomial_first_root(P, S, c, coefs):
    """All forward intersections of a ray with a k=-1 even asphere, sorted."""
    Px, Py, Pz = P
    Sx, Sy, Sz = S
    rsq = onp.array([Px * Px + Py * Py, 2 * (Px * Sx + Py * Sy),
                     Sx * Sx + Sy * Sy])
    sag = npoly.polymul(onp.array([c / 2]), rsq)
    p = rsq.copy()
    for a in coefs:
        p = npoly.polymul(p, rsq)
        sag = npoly.polyadd(sag, a * p)
    F = npoly.polysub(onp.array([Pz, Sz]), sag)
    r = npoly.polyroots(F)
    real = r[onp.abs(r.imag) < 1e-9].real
    return onp.sort(real[real >= -1e-12])


def _banded_mirror(c, coefs, rim):
    """A k=-1 aspheric mirror with its departure band pre-solved.

    Both fold builders legitimately trip the multiple-crossing setup
    warning, which the tests about that warning cover separately.
    """
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        built = Surface(shape=EvenAsphere(c=c, k=-1.0, coefs=coefs),
                        interaction='refl', P=[0, 0, 0],
                        aperture=Aperture(clip=circular_aperture(rim),
                                          extent=CircularExtent(rim)))
        built.departure_band()
    return built


def gull_wing_surface(outer_radius=30.0):
    return _banded_mirror(GULL_C, GULL_COEFS, outer_radius)


def in_domain_fold_surface():
    return _banded_mirror(FOLD_C, FOLD_COEFS, FOLD_R)


def _s_found(Q, P, S):
    return float(onp.sum((onp.asarray(Q[0]) - onp.asarray(P[0]))
                         * onp.asarray(S[0])))


def test_gull_wing_matches_polynomial_oracle():
    """Production intersect returns the exact first root on a folded asphere."""
    surf = gull_wing_surface()
    # batch the whole sweep: one vectorized intersect call instead of the
    # reference's per-ray Python loop
    hs, angs = [], []
    for h in onp.linspace(0, 14, 8):
        for ang in onp.linspace(-60, 60, 17):
            hs.append(h)
            angs.append(onp.radians(ang))
    hs = onp.asarray(hs)
    angs = onp.asarray(angs)
    P = onp.stack([onp.zeros_like(hs), hs, onp.full_like(hs, -10.0)], axis=1)
    S = onp.stack([onp.zeros_like(angs), onp.sin(angs), onp.cos(angs)],
                  axis=1)
    Q, n, v = surf.intersect(jnp.asarray(P), jnp.asarray(S),
                             forward_only=True)
    Q = onp.asarray(Q)
    v = onp.asarray(v)
    checked = 0
    for i in range(len(hs)):
        roots = polynomial_first_root(P[i], S[i], GULL_C, GULL_COEFS)
        if len(roots) == 0:
            assert not v[i], 'traced a ray with no real intersection'
            continue
        assert v[i], f'failed on a real intersection (row {i})'
        s = float(onp.sum((Q[i] - P[i]) * S[i]))
        assert s == pytest.approx(roots[0], abs=1e-6), f'wrong sheet row {i}'
        checked += 1
    # the sweep must actually exercise multi-root geometry
    assert checked > 100


def test_known_wrong_sheet_rays_are_fixed():
    """Embedded cases where unguarded Newton converges to the far sheet."""
    surf = gull_wing_surface()
    shape = surf.shape
    cases = [(1.0, -60.0), (0.5, 60.0), (8.0, 51.0)]
    for h, ang in cases:
        a = onp.radians(ang)
        P = onp.array([[0.0, h, -10.0]])
        S = onp.array([[0.0, onp.sin(a), onp.cos(a)]])
        roots = polynomial_first_root(P[0], S[0], GULL_C, GULL_COEFS)
        assert len(roots) >= 2

        # demonstrate the unguarded path is actually wrong on this ray
        Sz = S[..., 2]
        s0 = -P[..., 2] / Sz
        P1 = P + s0[..., None] * S
        Qc, _, _ = ray_conic_intersect(P1, S, GULL_C, -1.0)
        s1 = onp.asarray(Qc)[..., 2] / Sz
        Qn, _, vn = newton_raphson_solve_s(jnp.asarray(P1), jnp.asarray(S),
                                           shape.sag_and_normal,
                                           s1=jnp.asarray(s1))
        assert bool(vn[0])
        s_raw = _s_found(Qn, P1, S)
        assert abs(s_raw - (roots[0] - s0[0])) > 1.0

        # the guarded production stack lands on the first root
        Q, n, v = surf.intersect(jnp.asarray(P), jnp.asarray(S),
                                 forward_only=True)
        assert bool(v[0])
        assert _s_found(Q, P, S) == pytest.approx(roots[0], abs=1e-6)


def test_mild_asphere_roots_unchanged_by_guard():
    """The acceptance band is transparent on well-behaved surfaces."""
    shape = EvenAsphere(c=1 / 50.0, k=0.0, coefs=(1e-7, 1e-10))
    surf = Surface(shape=shape, interaction='refl', P=[0, 0, 0],
                   aperture=Aperture(clip=circular_aperture(15.0),
                                     extent=CircularExtent(15.0)))
    h = onp.linspace(-14, 14, 23)
    P = onp.zeros((h.size, 3))
    P[:, 1] = h
    P[:, 2] = -5.0
    S = onp.zeros((h.size, 3))
    S[:, 2] = 1.0
    Qg, ng, vg = surf.intersect(jnp.asarray(P), jnp.asarray(S),
                                forward_only=True)
    # unguarded reference path
    Qc, _, _ = ray_conic_intersect(jnp.asarray(P), jnp.asarray(S),
                                   1 / 50.0, 0.0)
    s1 = Qc[..., 2]
    Qr, nr, vr = newton_raphson_solve_s(
        jnp.asarray(P + onp.array([0, 0, 5.0])), jnp.asarray(S),
        shape.sag_and_normal, s1=s1)
    assert bool(vg.all()) and bool(vr.all())
    assert onp.allclose(Qg, Qr, atol=1e-10)
    assert onp.allclose(ng, nr, atol=1e-10)


def test_bracketed_newton_finds_first_root_in_band():
    """Several crossings inside the band resolve to the first."""
    surf = gull_wing_surface()
    shape = surf.shape
    a = onp.radians(-60)
    P1 = onp.array([[0.0, -17.32050808, 0.0]])
    S = onp.array([[0.0, onp.sin(a), onp.cos(a)]])
    lo = jnp.array([-30.0])
    hi = jnp.array([160.0])
    Q, n, v = bracketed_newton_solve_s(
        jnp.asarray(P1), jnp.asarray(S), shape.sag_and_normal, lo, hi,
        lipschitz=surf.departure_band().lipschitz, domain_radius=30.0)
    assert bool(v[0])
    roots = polynomial_first_root(P1[0], S[0], GULL_C, GULL_COEFS)
    assert _s_found(Q, P1, S) == pytest.approx(roots[0], abs=1e-6)


def test_bracketed_newton_requires_lipschitz():
    """The march needs its first-root-guaranteeing bound; None is an error."""
    shape = Sphere(c=1 / 100.0)
    P1 = jnp.array([[0.0, 0.0, -5.0]])
    S = jnp.array([[0.0, 0.0, 1.0]])
    with pytest.raises(ValueError):
        bracketed_newton_solve_s(P1, S, shape.sag_and_normal,
                                 jnp.array([0.0]), jnp.array([2.0]))


def test_bracketed_newton_rejects_no_sign_change():
    """A band that never crosses the surface returns invalid, not garbage."""
    shape = Sphere(c=1 / 100.0)
    P1 = jnp.array([[0.0, 0.0, -5.0]])
    S = jnp.array([[0.0, 0.0, 1.0]])
    Q, n, v = bracketed_newton_solve_s(P1, S, shape.sag_and_normal,
                                       jnp.array([0.0]), jnp.array([2.0]),
                                       lipschitz=1.0)
    assert not bool(v[0])
    assert onp.isnan(onp.asarray(Q[0])).all()


def test_forward_only_rejects_root_behind_ray():
    """A surface behind the ray is a virtual intersection at reflect/refract."""
    shape = EvenAsphere(c=1 / 50.0, k=0.0, coefs=(1e-7,))
    surf = Surface(shape=shape, interaction='refl', P=[0, 0, 0],
                   aperture=Aperture(clip=circular_aperture(15.0),
                                     extent=CircularExtent(15.0)))
    P = jnp.array([[0.0, 2.0, 5.0]])
    S = jnp.array([[0.0, 0.0, 1.0]])
    Q, n, v = surf.intersect(P, S, forward_only=False)
    assert bool(v[0])
    assert _s_found(Q, P, S) < 0
    Q, n, v = surf.intersect(P, S, forward_only=True)
    assert not bool(v[0])


def test_first_segment_exempt_from_forward_acceptance():
    """Concave-front systems launch from the vertex plane: signed segment."""
    shape = EvenAsphere(c=-1 / 40.0, k=0.0, coefs=(1e-8,))
    surf = Surface(shape=shape, interaction='refl', P=[0, 0, 0],
                   aperture=Aperture(clip=circular_aperture(12.0),
                                     extent=CircularExtent(12.0)))
    h = onp.linspace(-10, 10, 11)
    P = onp.zeros((h.size, 3))
    P[:, 1] = h
    S = onp.zeros((h.size, 3))
    S[:, 2] = 1.0
    res = raytrace([surf], jnp.asarray(P), jnp.asarray(S), 0.5876)
    assert bool((onp.asarray(res.status).imag == STATUS_OK).all())

    P_past = P.copy()
    P_past[:, 2] = 5.0
    res = raytrace([surf], jnp.asarray(P_past), jnp.asarray(S), 0.5876)
    assert bool((onp.asarray(res.status).imag == STATUS_OK).all())

    eval_surf = Surface(shape=Sphere(c=0.0), interaction='eval',
                        P=[0, 0, 5.0])
    res = raytrace([eval_surf, surf], jnp.asarray(P_past), jnp.asarray(S),
                   0.5876)
    status = onp.asarray(res.status)
    assert (status.imag != STATUS_OK).all()
    assert (status.real == 2).all()


def test_departure_band_domain_resolution():
    """Domain radius: clip, else normalization radius, else conic limit."""
    asph = EvenAsphere(c=1 / 50.0, k=0.0, coefs=(1e-7,))
    clipped = Surface(shape=asph, interaction='refl', P=[0, 0, 0],
                      aperture=Aperture(clip=circular_aperture(9.0),
                                        extent=CircularExtent(12.0)))
    band = clipped.departure_band()  # the 9 mm clip bounds the domain
    assert band.bounded and band.max_departure > 0
    assert band.domain_radius == 9.0

    normed = Surface(shape=Zernike(c=1 / 50.0, k=0.0,
                                   normalization_radius=7.0,
                                   nms=[(4, 0)], coefs=[1e-4]),
                     interaction='refl', P=[0, 0, 0])
    assert normed.departure_band().domain_radius == 7.0

    # spherical base, no bounding clip, no normalization radius: the
    # conic's own domain limit 0.999/(|c| sqrt(1+k))
    s = Surface(shape=asph, interaction='refl', P=[0, 0, 0])
    assert s.departure_band().domain_radius == pytest.approx(
        0.999 * 50.0, rel=1e-6)

    # parabolic base is unbounded: no resolvable domain, guard disabled
    parab = Surface(shape=EvenAsphere(c=1 / 50.0, k=-1.0, coefs=(1e-7,)),
                    interaction='refl', P=[0, 0, 0])
    assert not parab.departure_band().bounded

    # analytic shapes carry no conic seed and no band
    ball = Surface(shape=Sphere(c=1 / 50.0), interaction='refl',
                   P=[0, 0, 0])
    assert not ball.departure_band().bounded


def test_multiple_crossing_setup_warning():
    """Surfaces whose departure slope admits several crossings warn."""
    folded = Surface(shape=EvenAsphere(c=GULL_C, k=-1.0,
                                       coefs=GULL_COEFS),
                     interaction='refl', P=[0, 0, 0],
                     aperture=Aperture(clip=circular_aperture(30.0),
                                       extent=CircularExtent(30.0)))
    with pytest.warns(UserWarning, match='multiple ray crossings'):
        folded.departure_band()

    # mild surfaces stay silent
    mild = EvenAsphere(c=1 / 50.0, k=0.0, coefs=(1e-8,))
    surf = Surface(shape=mild, interaction='refl', P=[0, 0, 0],
                   aperture=Aperture(clip=circular_aperture(10.0),
                                     extent=CircularExtent(10.0)))
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        surf.departure_band()


def test_in_domain_far_crossing_policed_hole():
    """A far in-domain crossing admitted by the band is corrected."""
    surf = in_domain_fold_surface()
    a = onp.radians(72.0)
    P = onp.array([[0.0, -18.0, -3.0]])
    S = onp.array([[0.0, onp.sin(a), onp.cos(a)]])
    roots = polynomial_first_root(P[0], S[0], FOLD_C, FOLD_COEFS)
    assert len(roots) >= 2

    # unguarded conic-seeded Newton lands on an in-domain far crossing
    Sz = S[..., 2]
    s0 = -P[..., 2] / Sz
    P1 = P + s0[..., None] * S
    Qc, _, hit = ray_conic_intersect(jnp.asarray(P1), jnp.asarray(S),
                                     FOLD_C, -1.0)
    assert bool(hit[0])  # this ray IS policed (the seed conic is hit)
    s1 = Qc[..., 2] / Sz
    Qn, _, vn = newton_raphson_solve_s(jnp.asarray(P1), jnp.asarray(S),
                                       surf.shape.sag_and_normal, s1=s1)
    assert bool(vn[0])
    s_newton = _s_found(Qn, P1, S) + s0[0]
    assert abs(s_newton - roots[1]) < 1e-4
    Qn0 = onp.asarray(Qn[0])
    assert onp.hypot(Qn0[0], Qn0[1]) < FOLD_R

    # guarded path returns the first crossing
    Q, n, v = surf.intersect(jnp.asarray(P), jnp.asarray(S),
                             forward_only=True)
    assert bool(v[0])
    assert _s_found(Q, P, S) == pytest.approx(roots[0], abs=1e-6)


def test_in_domain_far_crossing_seed_missed_hole():
    """A seed-missed in-domain far crossing is corrected."""
    surf = in_domain_fold_surface()
    a = onp.radians(82.0)
    P = onp.array([[0.0, -18.0, -3.0]])
    S = onp.array([[0.0, onp.sin(a), onp.cos(a)]])
    roots = polynomial_first_root(P[0], S[0], FOLD_C, FOLD_COEFS)
    assert len(roots) >= 2

    Sz = S[..., 2]
    s0 = -P[..., 2] / Sz
    P1 = P + s0[..., None] * S
    Qc, _, hit = ray_conic_intersect(jnp.asarray(P1), jnp.asarray(S),
                                     FOLD_C, -1.0)
    assert not bool(hit[0])  # the seed conic misses this grazing ray

    Q, n, v = surf.intersect(jnp.asarray(P), jnp.asarray(S),
                             forward_only=True)
    assert bool(v[0])
    assert _s_found(Q, P, S) == pytest.approx(roots[0], abs=1e-6)


def test_in_domain_fold_oracle_sweep():
    """Sweep the in-domain fold against the polynomial oracle (batched)."""
    surf = in_domain_fold_surface()
    rows = []
    for Pz in (-3.0, -6.0, -12.0):
        for h in onp.linspace(-18, 18, 25):
            for ang in onp.linspace(-84, 84, 43):
                rows.append((Pz, h, onp.radians(ang)))
    rows = onp.asarray(rows)
    P = onp.stack([onp.zeros(len(rows)), rows[:, 1], rows[:, 0]], axis=1)
    S = onp.stack([onp.zeros(len(rows)), onp.sin(rows[:, 2]),
                   onp.cos(rows[:, 2])], axis=1)
    Q, n, v = surf.intersect(jnp.asarray(P), jnp.asarray(S),
                             forward_only=True)
    Q = onp.asarray(Q)
    v = onp.asarray(v)
    checked = 0
    for i in range(len(rows)):
        if not v[i]:
            continue  # deterministic rejection is acceptable
        roots = polynomial_first_root(P[i], S[i], FOLD_C, FOLD_COEFS)
        in_dom = [r for r in roots
                  if r > 1e-9 and abs(P[i, 1] + r * S[i, 1]) < FOLD_R]
        s = float(onp.sum((Q[i] - P[i]) * S[i]))
        target = in_dom[0] if in_dom else roots[0]
        assert s == pytest.approx(target, abs=1e-5), \
            f'wrong sheet at Pz={rows[i, 0]}, h={rows[i, 1]}'
        if in_dom:
            checked += 1
    assert checked > 500


def test_lipschitz_march_first_root_with_far_in_domain_crossing():
    """The Lipschitz march returns the first in-domain crossing."""
    surf = in_domain_fold_surface()
    L = surf.departure_band().lipschitz
    a = onp.radians(72.0)
    P = onp.array([[0.0, -18.0, -3.0]])
    S = onp.array([[0.0, onp.sin(a), onp.cos(a)]])
    Sz = S[..., 2]
    s0 = -P[..., 2] / Sz
    P1 = P + s0[..., None] * S
    roots = polynomial_first_root(P[0], S[0], FOLD_C, FOLD_COEFS)
    first = roots[0] - s0[0]
    second = roots[1] - s0[0]
    lo = jnp.array([min(first, second) - 5.0])
    hi = jnp.array([max(first, second) + 5.0])
    Q, n, v = bracketed_newton_solve_s(jnp.asarray(P1), jnp.asarray(S),
                                       surf.shape.sag_and_normal, lo, hi,
                                       lipschitz=L, domain_radius=FOLD_R)
    assert bool(v[0])
    assert _s_found(Q, P1, S) == pytest.approx(first, abs=1e-6)


def test_guarded_intersect_jits_and_differentiates():
    """The full guarded path compiles under jit and yields exact gradients.

    jax-only capability the reference cannot express: d(s_root)/d(coef)
    through the departure band, the masked rescue march, and the implicit-
    function polish, checked against central differences.
    """
    P = jnp.array([[0.0, -18.0, -3.0]])
    a = onp.radians(72.0)
    S = jnp.array([[0.0, onp.sin(a), onp.cos(a)]])

    def s_root_of(a4):
        shape = EvenAsphere(c=FOLD_C, k=-1.0, coefs=(a4, FOLD_COEFS[1]))
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            surf = Surface(shape=shape, interaction='refl', P=[0, 0, 0],
                           aperture=Aperture(
                               clip=circular_aperture(FOLD_R),
                               extent=CircularExtent(FOLD_R)))
        Q, n, v = surf.intersect(P, S, forward_only=True)
        return jnp.sum((Q[0] - P[0]) * S[0])

    s_val = jax.jit(s_root_of)(FOLD_COEFS[0])
    roots = polynomial_first_root(onp.asarray(P[0]), onp.asarray(S[0]),
                                  FOLD_C, FOLD_COEFS)
    assert float(s_val) == pytest.approx(roots[0], abs=1e-6)

    g = jax.grad(s_root_of)(FOLD_COEFS[0])
    eps = 1e-9
    fd = (s_root_of(FOLD_COEFS[0] + eps) - s_root_of(FOLD_COEFS[0] - eps)) \
        / (2 * eps)
    assert float(g) == pytest.approx(float(fd), rel=1e-4)


def test_rim_grazer_oracle_agreement():
    """Steep rim-grazing rays agree with the polynomial oracle."""
    import itertools
    surf = gull_wing_surface()
    disagreements = 0
    sweep = itertools.product(onp.linspace(15, 25, 6),
                              (75.0, 80.0, 85.0, -75.0, -80.0))
    for h, ang in sweep:
        a = onp.radians(ang)
        P = onp.array([[0.0, h, -2.0]])
        S = onp.array([[0.0, onp.sin(a), onp.cos(a)]])
        oracle = polynomial_first_root(P[0], S[0], GULL_C, GULL_COEFS)
        Q, _, alive = surf.intersect(P, S, forward_only=True)
        if not bool(onp.asarray(alive)[0]):
            continue
        reach = float(onp.sum((onp.asarray(Q)[0] - P[0]) * S[0]))
        if oracle.size == 0 or abs(reach - oracle[0]) > 1e-6:
            disagreements += 1
    assert disagreements == 0
