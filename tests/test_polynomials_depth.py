"""Polynomials in depth: index math, scipy oracles, derivative checks.

Port of the remaining behaviors of the reference's
``tests/test_polynomials.py`` (94 tests) not already covered by
``test_polynomials.py`` / ``test_polynomials_families.py`` here: index
round trips over full ranges, zero-separation sizing, scipy
cross-checks for every 1D family, finite-difference derivative checks,
Clenshaw properties, Dickson special cases, Hopkins' closed form,
magnitude/angle and top-N summaries, and the Q-polynomial zero-handling
contracts.
"""
import numpy as np
import pytest

import scipy.special as sps

import jax.numpy as jnp

import prysm_tpu.polynomials as poly
from prysm_tpu.polynomials import qpoly


RHO = np.linspace(0.0, 1.0, 32)
X = np.linspace(-1.0, 1.0, 129)


# ---------------------------------------------------------------------------
# index conversions over full ranges
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('fringe_idx', range(1, 100))
def test_nm_to_fringe_round_trips(fringe_idx):
    n, m = poly.fringe_to_nm(fringe_idx)
    assert poly.nm_to_fringe(n, m) == fringe_idx


@pytest.mark.parametrize('j', range(1, 100))
def test_ansi_j_round_trips(j):
    n, m = poly.ansi_j_to_nm(j)
    assert poly.nm_to_ansi_j(n, m) == j


@pytest.mark.parametrize('j', range(2, 67))
def test_xy_j_to_mn_round_trip_via_seq(j):
    m, n = poly.xy_j_to_mn(j)
    assert m >= 0 and n >= 0


def test_xy_poly_first_cross_term():
    # xy j=2..: the first cross term x*y appears with m=1, n=1
    mns = [poly.xy_j_to_mn(j) for j in range(2, 20)]
    assert (1, 1) in mns


@pytest.mark.parametrize('n', [2, 4, 6, 8, 10, 12, 14, 16, 18, 20])
def test_zero_separation_gives_correct_array_sizes(n):
    sep = poly.zernike_zero_separation(n)
    assert int(1 / sep) == int(n ** 2)


# ---------------------------------------------------------------------------
# scipy oracles for the 1D families
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('n', [0, 1, 2, 3, 4, 5])
@pytest.mark.parametrize('ab', [(0.0, 0.0), (1.0, 1.0), (-0.5, 0.5),
                                (2.0, 0.0)])
def test_jacobi_matches_scipy(n, ab):
    a, b = ab
    got = np.asarray(poly.jacobi(n, a, b, jnp.asarray(X)))
    want = sps.eval_jacobi(n, a, b, X)
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize('n', [0, 1, 2, 3, 4, 5])
def test_legendre_matches_scipy(n):
    got = np.asarray(poly.legendre(n, jnp.asarray(X)))
    np.testing.assert_allclose(got, sps.eval_legendre(n, X), atol=1e-12)


@pytest.mark.parametrize('n', [0, 1, 2, 3, 4, 5])
def test_hermite_He_matches_scipy(n):
    got = np.asarray(poly.hermite_He(n, jnp.asarray(X)))
    np.testing.assert_allclose(got, sps.eval_hermitenorm(n, X), atol=1e-10)


@pytest.mark.parametrize('n', [0, 1, 2, 3, 4, 5])
def test_hermite_H_matches_scipy(n):
    got = np.asarray(poly.hermite_H(n, jnp.asarray(X)))
    np.testing.assert_allclose(got, sps.eval_hermite(n, X), atol=1e-9)


@pytest.mark.parametrize('n', [0, 1, 2, 3, 4, 5])
def test_cheby1_matches_scipy(n):
    got = np.asarray(poly.cheby1(n, jnp.asarray(X)))
    np.testing.assert_allclose(got, sps.eval_chebyt(n, X), atol=1e-12)


@pytest.mark.parametrize('n', [0, 1, 2, 3, 4, 5])
def test_cheby2_matches_scipy(n):
    got = np.asarray(poly.cheby2(n, jnp.asarray(X)))
    np.testing.assert_allclose(got, sps.eval_chebyu(n, X), atol=1e-12)


@pytest.mark.parametrize('n', [0, 1, 2, 3, 4, 5])
def test_cheby3_4_satisfy_generating_identities(n):
    # V_n(cos t) = cos((n + 1/2) t) / cos(t / 2)
    # W_n(cos t) = sin((n + 1/2) t) / sin(t / 2)
    t = np.linspace(0.15, np.pi - 0.15, 64)
    x = np.cos(t)
    V = np.asarray(poly.cheby3(n, jnp.asarray(x)))
    W = np.asarray(poly.cheby4(n, jnp.asarray(x)))
    np.testing.assert_allclose(V, np.cos((n + 0.5) * t) / np.cos(t / 2),
                               atol=1e-10)
    np.testing.assert_allclose(W, np.sin((n + 0.5) * t) / np.sin(t / 2),
                               atol=1e-10)


@pytest.mark.parametrize('n, alpha', [(0, 0.0), (1, 0.0), (2, 1.0),
                                      (3, 0.5), (4, 2.0), (5, 0.0)])
def test_laguerre_matches_scipy(n, alpha):
    got = np.asarray(poly.laguerre(n, alpha, jnp.asarray(RHO)))
    np.testing.assert_allclose(got, sps.eval_genlaguerre(n, alpha, RHO),
                               atol=1e-10)


@pytest.mark.parametrize('n', [1, 2, 3, 4, 5])
@pytest.mark.parametrize('alpha', [0.0, 1.0, 2.0])
def test_laguerre_der_matches_scipy_identity(n, alpha):
    # d/dx L_n^a = -L_{n-1}^{a+1}
    got = np.asarray(poly.laguerre_der(n, alpha, jnp.asarray(RHO)))
    want = -sps.eval_genlaguerre(n - 1, alpha + 1, RHO)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_laguerre_der_n_zero():
    got = np.asarray(poly.laguerre_der(0, 0.0, jnp.asarray(RHO)))
    np.testing.assert_allclose(got, np.zeros_like(RHO), atol=1e-14)


# ---------------------------------------------------------------------------
# derivatives vs finite differences
# ---------------------------------------------------------------------------

def _fd_check(fn, dfn, n, atol=1e-6, lo=-0.9, hi=0.9, **kw):
    x = np.linspace(lo, hi, 257)
    h = 1e-6
    got = np.asarray(dfn(n, jnp.asarray(x), **kw))
    want = (np.asarray(fn(n, jnp.asarray(x + h), **kw))
            - np.asarray(fn(n, jnp.asarray(x - h), **kw))) / (2 * h)
    np.testing.assert_allclose(got, want, atol=atol)


@pytest.mark.parametrize('n', [1, 2, 3, 4, 5])
def test_jacobi_der_matches_finite_diff(n):
    _fd_check(lambda n, x: poly.jacobi(n, 0.0, 0.0, x),
              lambda n, x: poly.jacobi_der(n, 0.0, 0.0, x), n)


@pytest.mark.parametrize('n', [1, 4])
def test_cheby1_der_matches_finite_diff(n):
    _fd_check(poly.cheby1, poly.cheby1_der, n)


@pytest.mark.parametrize('n', [1, 4])
def test_cheby2_der_matches_finite_diff(n):
    _fd_check(poly.cheby2, poly.cheby2_der, n)


@pytest.mark.parametrize('n', [1, 4])
def test_cheby3_der_matches_finite_diff(n):
    _fd_check(poly.cheby3, poly.cheby3_der, n)


@pytest.mark.parametrize('n', [1, 4])
def test_cheby4_der_matches_finite_diff(n):
    _fd_check(poly.cheby4, poly.cheby4_der, n)


@pytest.mark.parametrize('n', [1, 4])
def test_legendre_der_matches_finite_diff(n):
    _fd_check(poly.legendre, poly.legendre_der, n)


@pytest.mark.parametrize('n', [1, 4])
def test_hermite_He_der_matches_finite_diff(n):
    _fd_check(poly.hermite_He, poly.hermite_He_der, n, atol=1e-4)


@pytest.mark.parametrize('n', [1, 4])
def test_hermite_H_der_matches_finite_diff(n):
    _fd_check(poly.hermite_H, poly.hermite_H_der, n, atol=1e-3)


@pytest.mark.parametrize('fam, der_seq, val', [
    ('cheby1', 'cheby1_der_seq', 'cheby1_der'),
    ('cheby2', 'cheby2_der_seq', 'cheby2_der'),
    ('legendre', 'legendre_der_seq', 'legendre_der'),
    ('hermite_He', 'hermite_He_der_seq', 'hermite_He_der'),
    ('hermite_H', 'hermite_H_der_seq', 'hermite_H_der'),
])
def test_der_seq_matches_loop(fam, der_seq, val):
    ns = [0, 1, 2, 3, 4]
    x = jnp.asarray(X)
    seq = np.asarray(getattr(poly, der_seq)(ns, x))
    for i, n in enumerate(ns):
        np.testing.assert_allclose(seq[i],
                                   np.asarray(getattr(poly, val)(n, x)),
                                   atol=1e-10)


def test_laguerre_der_seq_matches_loop():
    ns = [0, 1, 2, 3]
    seq = np.asarray(poly.laguerre_der_seq(ns, 1.0, jnp.asarray(RHO)))
    for i, n in enumerate(ns):
        np.testing.assert_allclose(
            seq[i], np.asarray(poly.laguerre_der(n, 1.0, jnp.asarray(RHO))),
            atol=1e-10)


# ---------------------------------------------------------------------------
# dickson
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('n', [1, 2, 3, 4, 8])
def test_dickson1_alpha0_powers(n):
    # D_n(0, x) = x^n
    got = np.asarray(poly.dickson1(n, 0.0, jnp.asarray(X)))
    np.testing.assert_allclose(got, X ** n, atol=1e-10)


@pytest.mark.parametrize('n', [1, 2, 3, 4, 8])
def test_dickson1_alpha1_cheby(n):
    # D_n(1, 2x) = 2 T_n(x)
    got = np.asarray(poly.dickson1(n, 1.0, jnp.asarray(2 * X)))
    want = 2 * sps.eval_chebyt(n, X)
    np.testing.assert_allclose(got, want, atol=1e-9)


@pytest.mark.parametrize('n', [2, 3, 4, 5])
def test_dickson2_satisfies_recurrence(n):
    # E_n = x E_{n-1} - a E_{n-2}
    a = 0.7
    x = jnp.asarray(X)
    En = np.asarray(poly.dickson2(n, a, x))
    E1 = np.asarray(poly.dickson2(n - 1, a, x))
    E2 = np.asarray(poly.dickson2(n - 2, a, x))
    np.testing.assert_allclose(En, X * E1 - a * E2, atol=1e-10)


def test_dickson_seq_matches_loop():
    ns = [0, 1, 2, 3, 4]
    x = jnp.asarray(X)
    s1 = np.asarray(poly.dickson1_seq(ns, 0.5, x))
    s2 = np.asarray(poly.dickson2_seq(ns, 0.5, x))
    for i, n in enumerate(ns):
        np.testing.assert_allclose(s1[i], np.asarray(poly.dickson1(n, 0.5, x)),
                                   atol=1e-12)
        np.testing.assert_allclose(s2[i], np.asarray(poly.dickson2(n, 0.5, x)),
                                   atol=1e-12)


# ---------------------------------------------------------------------------
# Clenshaw properties
# ---------------------------------------------------------------------------

def test_clenshaw_matches_direct_summation():
    cs = [0.3, -0.2, 0.7, 0.05, -0.4]
    x = jnp.asarray(X)
    direct = sum(c * np.asarray(poly.jacobi(n, 0.0, 0.0, x))
                 for n, c in enumerate(cs))
    got = np.asarray(poly.jacobi_sum_clenshaw(cs, 0.0, 0.0, x))
    np.testing.assert_allclose(got, direct, atol=1e-12)


def test_clenshaw_handles_single_coefficient():
    got = np.asarray(poly.jacobi_sum_clenshaw([2.5], 0.0, 0.0,
                                              jnp.asarray(X)))
    np.testing.assert_allclose(got, np.full_like(X, 2.5), atol=1e-14)


@pytest.mark.parametrize('ab', [(0.0, 0.0), (0.0, 1.0), (-0.5, 0.5)])
def test_clenshaw_der_matches_finite_diff(ab):
    a, b = ab
    cs = [0.1, -0.3, 0.2, 0.4]
    h = 1e-6
    x = np.linspace(-0.9, 0.9, 129)
    got = np.asarray(poly.jacobi_sum_clenshaw_der(cs, a, b, jnp.asarray(x)))
    # jacobi_sum_clenshaw_der returns the derivative table; row 1 = d/dx
    d_dx = got[1] if got.ndim == 2 else got
    want = (np.asarray(poly.jacobi_sum_clenshaw(cs, a, b, jnp.asarray(x + h)))
            - np.asarray(poly.jacobi_sum_clenshaw(cs, a, b,
                                                  jnp.asarray(x - h)))) / (2 * h)
    np.testing.assert_allclose(d_dx, want, atol=1e-6)


def test_clenshaw_der_zeros_above_polynomial_degree():
    """Derivative order above the polynomial degree is identically zero."""
    cs = [0.5, 0.25]  # degree 1
    out = poly.jacobi_sum_clenshaw_der(cs, 0.0, 0.0, jnp.asarray(X), j=3)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-13)


# ---------------------------------------------------------------------------
# hopkins, magnitude/angle, top-N
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('abc', [(1, 1, 1), (1, 3, 1), (0, 2, 0),
                                 (0, 4, 0), (2, 2, 2)])
def test_hopkins_correct(abc):
    a, b, c = abc
    r = np.linspace(0, 1, 16)
    t = np.linspace(0, 2 * np.pi, 16)
    rr, tt = np.meshgrid(r, t)
    H = np.sqrt(2) / 2
    got = np.asarray(poly.hopkins(a, b, c, jnp.asarray(rr), jnp.asarray(tt),
                                  H))
    want = np.cos(a * tt) * rr ** b * H ** c
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_magnitude_angle_combines_sine_cosine_pairs():
    data = [(2, 2, 3), (2, -2, 4), (2, 0, 5)]
    magang = poly.zernikes_to_magnitude_angle(data)
    assert magang['Defocus'] == (5, 0)
    assert magang['Primary Astigmatism'][0] == pytest.approx(5)
    assert magang['Primary Astigmatism'][1] == pytest.approx(
        np.degrees(np.arctan2(3, 4)))


def test_top_n_correct():
    data = {
        (3, 1): 1, (3, -1): -1, (2, 0): 10, (4, 0): 9,
        (6, 0): 12, (2, 2): 8, (3, 3): 7,
    }
    res = poly.top_n(data, 5)
    assert [r[0] for r in res] == [12, 10, 9, 8, 7]
    assert res[0][2] == 'Secondary Spherical'
    assert res[1][2] == 'Defocus'


# ---------------------------------------------------------------------------
# zernike structure
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('nm', [(1, 1), (2, 0), (3, 1), (4, 0), (5, 5)])
def test_zernike_nm_der_xy_finite_at_origin(nm):
    n, m = nm
    from prysm_tpu.polynomials.zernike import zernike_nm_der_xy
    gx, gy = zernike_nm_der_xy(n, m, jnp.asarray([0.0]), jnp.asarray([0.0]))
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gy)).all()


def test_zernike_sum_der_xy_single_mode_and_duplicates():
    from prysm_tpu.polynomials import zernike_sum_der_xy
    x = np.linspace(-0.7, 0.7, 33)
    X2, Y2 = np.meshgrid(x, x)
    xs, ys = jnp.asarray(X2), jnp.asarray(Y2)
    z1, gx1, gy1 = zernike_sum_der_xy([2.0], [(2, 0)], xs, ys)
    # the same mode listed twice with half weight gives the same sums
    z2, gx2, gy2 = zernike_sum_der_xy([1.0, 1.0], [(2, 0), (2, 0)], xs, ys)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy2), atol=1e-12)


# ---------------------------------------------------------------------------
# Q polynomials: zero handling contracts
# ---------------------------------------------------------------------------

def test_qpoly_summed_paths_ignore_trailing_zeros():
    r = np.linspace(0, 1, 64)
    coefs = [0.1, -0.2, 0.05]
    padded = [0.1, -0.2, 0.05, 0, 0, 0]
    z, zp = qpoly.compute_z_zprime_Qbfs(coefs, r, r * r)
    z2, zp2 = qpoly.compute_z_zprime_Qbfs(padded, r, r * r)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-13)
    np.testing.assert_allclose(np.asarray(zp2), np.asarray(zp), atol=1e-13)

    z, zp = qpoly.compute_z_zprime_Qcon(coefs, r, r * r)
    z2, zp2 = qpoly.compute_z_zprime_Qcon(padded, r, r * r)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-13)
    np.testing.assert_allclose(np.asarray(zp2), np.asarray(zp), atol=1e-13)


def test_q2d_summed_path_ignores_padding():
    r = np.linspace(0, 1, 32)
    t = np.linspace(0, 2 * np.pi, 32)
    rr, tt = np.meshgrid(r, t)
    cm0 = [0.1, -0.05]
    ams = [[0.2], [], [0.15]]
    bms = [[], [0.3], []]
    cm0_p = [0.1, -0.05, 0, 0]
    ams_p = [[0.2, 0, 0], [0, 0], [0.15, 0, 0], [0, 0, 0]]
    bms_p = [[0, 0], [0.3, 0, 0], [0], [0, 0, 0]]
    out = qpoly.compute_z_zprime_Q2d(cm0, ams, bms, rr, tt)
    out_p = qpoly.compute_z_zprime_Q2d(cm0_p, ams_p, bms_p, rr, tt)
    for a, b in zip(out, out_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-13)

    zero = qpoly.compute_z_zprime_Q2d([0, 0], [[0, 0]], [[0, 0]], rr, tt)
    for elem in zero:
        np.testing.assert_allclose(np.asarray(elem), 0.0, atol=1e-14)


def test_q2d_coefficient_restructure_skips_zero_terms():
    nms = [(0, 0), (5, 0), (1, 1), (8, 1), (2, -2), (7, -2)]
    coefs = [0.25, 0, -0.5, 0, 0.75, 0]
    cm0, ams, bms = poly.Q2d_nm_c_to_a_b(nms, coefs)
    assert list(cm0) == [0.25]
    assert [list(a) for a in ams] == [[0, -0.5], []]
    assert [list(b) for b in bms] == [[], [0, 0, 0.75]]

    cm0, ams, bms = poly.Q2d_nm_c_to_a_b(nms, [0] * 6)
    assert list(cm0) == []
    assert list(ams) == []
    assert list(bms) == []
