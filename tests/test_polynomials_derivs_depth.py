"""Polynomial derivative closures: supplemental reference-intent port.

Covers the reference polynomial cases not already exercised by the
oracle suites: Qbfs closed forms for the first two orders, Qbfs /
Qcon / Q2D / Dickson / XY derivative finite-difference checks and
their seq-vs-loop identities, higher-derivative Clenshaw, and the
weighted-sum helper identities (reference test_polynomials.py).
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.polynomials as P

RHO = np.linspace(0.05, 0.95, 41)


def aac(actual, desired, **kw):
    np.testing.assert_allclose(np.asarray(actual, dtype=float), desired,
                               **kw)


def central(fn, t, h=1e-6):
    return (np.asarray(fn(t + h), dtype=float)
            - np.asarray(fn(t - h), dtype=float)) / (2 * h)


# ---------- Qbfs / Qcon -------------------------------------------------------

def test_qbfs_first_two_orders_match_closed_form():
    # the evaluated basis carries the rho^2 (1 - rho^2) prefactor:
    # Q0 -> u; Q1 -> u (13 - 16 rho^2) / sqrt(19), u = rho^2 (1 - rho^2)
    u = RHO ** 2 * (1.0 - RHO ** 2)
    aac(P.Qbfs(0, RHO), u, rtol=1e-13)
    aac(P.Qbfs(1, RHO), u * (13.0 - 16.0 * RHO ** 2) / np.sqrt(19.0),
        rtol=1e-12)


@pytest.mark.parametrize('n', [1, 2, 3, 5, 8])
def test_qbfs_der_matches_finite_diff(n):
    aac(P.Qbfs_der(n, RHO), central(lambda t: P.Qbfs(n, t), RHO),
        rtol=1e-4, atol=1e-6)


def test_qbfs_der_seq_same_as_loop():
    ns = list(range(6))
    stacked = np.asarray(P.Qbfs_der_seq(ns, RHO), dtype=float)
    for row, n in zip(stacked, ns):
        aac(row, np.asarray(P.Qbfs_der(n, RHO), dtype=float), rtol=1e-10)


@pytest.mark.parametrize('n', [1, 2, 4, 7])
def test_qcon_der_matches_finite_diff(n):
    aac(P.Qcon_der(n, RHO), central(lambda t: P.Qcon(n, t), RHO),
        rtol=1e-4, atol=1e-6)


def test_qcon_der_seq_same_as_loop():
    ns = list(range(5))
    stacked = np.asarray(P.Qcon_der_seq(ns, RHO), dtype=float)
    for row, n in zip(stacked, ns):
        aac(row, np.asarray(P.Qcon_der(n, RHO), dtype=float), rtol=1e-10)


# ---------- Q2D ---------------------------------------------------------------

PHI = np.linspace(0.1, 2 * np.pi - 0.1, 41)


@pytest.mark.parametrize('n, m', [(1, 1), (2, 1), (1, 2), (3, 2)])
def test_q2d_der_polar_matches_finite_diff(n, m):
    dr, dphi = P.Q2d_der(n, m, RHO, PHI)
    fd_r = (np.asarray(P.Q2d(n, m, RHO + 1e-6, PHI), dtype=float)
            - np.asarray(P.Q2d(n, m, RHO - 1e-6, PHI), dtype=float)) / 2e-6
    fd_p = (np.asarray(P.Q2d(n, m, RHO, PHI + 1e-6), dtype=float)
            - np.asarray(P.Q2d(n, m, RHO, PHI - 1e-6), dtype=float)) / 2e-6
    aac(dr, fd_r, rtol=1e-4, atol=1e-6)
    aac(dphi, fd_p, rtol=1e-4, atol=1e-6)


# ---------- Dickson -----------------------------------------------------------

T = np.linspace(-0.9, 0.9, 31)


@pytest.mark.parametrize('n', [2, 3, 5])
@pytest.mark.parametrize('alpha', [0.0, 1.0, 2.5])
def test_dickson1_der_matches_finite_diff(n, alpha):
    aac(P.dickson1_der(n, alpha, T),
        central(lambda t: P.dickson1(n, alpha, t), T),
        rtol=1e-4, atol=1e-6)


def test_dickson1_der_low_orders():
    # D0 = 2 (constant), D1 = x: derivatives 0 and 1
    aac(P.dickson1_der(0, 1.5, T), np.zeros_like(T))
    aac(P.dickson1_der(1, 1.5, T), np.ones_like(T))


@pytest.mark.parametrize('n', [2, 4, 6])
def test_dickson2_der_matches_finite_diff(n):
    aac(P.dickson2_der(n, 0.7, T),
        central(lambda t: P.dickson2(n, 0.7, t), T),
        rtol=1e-4, atol=1e-6)


def test_dickson_der_seq_same_as_loop():
    ns = [1, 2, 3, 4]
    stacked = np.asarray(P.dickson1_der_seq(ns, 1.2, T), dtype=float)
    for row, n in zip(stacked, ns):
        aac(row, np.asarray(P.dickson1_der(n, 1.2, T), dtype=float),
            rtol=1e-10)


# ---------- XY monomials ------------------------------------------------------

XG, YG = np.meshgrid(np.linspace(-0.8, 0.8, 9),
                     np.linspace(-0.7, 0.7, 9))


@pytest.mark.parametrize('m, n', [(1, 0), (0, 1), (2, 1), (3, 2)])
def test_xy_derivatives_match_truth(m, n):
    # d/dx x^m y^n = m x^(m-1) y^n; d/dy = n x^m y^(n-1)
    want_x = m * XG ** max(m - 1, 0) * YG ** n if m else np.zeros_like(XG)
    want_y = n * XG ** m * YG ** max(n - 1, 0) if n else np.zeros_like(XG)
    aac(P.xy_der_x(m, n, XG, YG), want_x, atol=1e-12)
    aac(P.xy_der_y(m, n, XG, YG), want_y, atol=1e-12)
    # the mixed partial d2/dxdy = m n x^(m-1) y^(n-1)
    want_mixed = (m * n * XG ** max(m - 1, 0) * YG ** max(n - 1, 0)
                  if m and n else np.zeros_like(XG))
    aac(P.xy_der_xy(m, n, XG, YG), want_mixed, atol=1e-12)


def test_xy_poly_later_cross_term():
    # x^2 y = the (2, 1) monomial
    aac(P.xy(2, 1, XG, YG), XG ** 2 * YG, atol=1e-13)


# ---------- Clenshaw higher derivatives ---------------------------------------

@pytest.mark.parametrize('ab', [(0.0, 0.0), (1.0, 1.0)])
def test_clenshaw_second_derivative_matches_finite_diff(ab):
    a, b = ab
    coefs = np.asarray([0.3, -0.2, 0.5, 0.1, -0.05])

    def first(t):
        alphas = P.jacobi_sum_clenshaw_der(coefs, a, b, np.asarray(t),
                                           j=1)
        return np.asarray(alphas, dtype=float)

    second = np.asarray(
        P.jacobi_sum_clenshaw_der(coefs, a, b, T, j=2), dtype=float)
    aac(second, central(first, T, h=1e-5), rtol=1e-4, atol=1e-5)
