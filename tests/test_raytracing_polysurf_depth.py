"""Polynomial-sag surface classes: port of the reference intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_polynomial_surfaces.py (12 tests): zero-coefficient
reduction to the base conic, sag parity with the polynomial library,
derivative central differences, the Jacobi origin singularity guard,
Newton landings, and the zero-perturbation image-spot equivalence.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.raytracing as rt
from prysm_tpu.x.raytracing.surfaces import Surface
from prysm_tpu.x.raytracing.spencer_and_murty import raytrace
from prysm_tpu.x.raytracing.raygen import generate_collimated_rect_ray_grid
from prysm_tpu.polynomials import cheby1_seq, jacobi_seq, zernike_sum_der_xy


def _np(x):
    return np.asarray(x)


def surf(shape, interaction='reflect', P=(0, 0, 0)):
    return Surface(shape=shape, interaction=interaction, P=list(P))


def _xy_grid(span=4.0, n=9):
    v = np.linspace(-span, span, n)
    return np.meshgrid(v, v)


def _sag_derivs(shape, x, y):
    z, n_hat = shape.sag_and_normal(x, y)
    n_hat = _np(n_hat)
    return (_np(z), -n_hat[..., 0] / n_hat[..., 2],
            -n_hat[..., 1] / n_hat[..., 2])


def _central_difference_xy(sag, x, y, h=1e-6):
    return ((_np(sag(x + h, y)) - _np(sag(x - h, y))) / (2 * h),
            (_np(sag(x, y + h)) - _np(sag(x, y - h))) / (2 * h))


# ---------- zero-coefficient base conic --------------------------------------

@pytest.mark.parametrize('build_poly, c, k', [
    (lambda c, k: rt.Zernike(c, k, 10.0, [], []), 1 / 80.0, -1.0),
    (lambda c, k: rt.XY(c, k, 1.0, [], []), 1 / 50.0, 0.0),
    (lambda c, k: rt.Chebyshev(c, k, 10.0, 10.0, [], []), 1 / 50.0, 0.0),
    (lambda c, k: rt.Jacobi(c, k, 10.0, 0.0, 0.0, [], []), 1 / 50.0, 0.0),
], ids=['zernike', 'xy', 'chebyshev', 'jacobi'])
def test_polynomial_zero_coefs_matches_conic(build_poly, c, k):
    s_poly = surf(build_poly(c, k))
    s_conic = surf(rt.Conic(c, k))
    x, y = _xy_grid()
    z_p, dx_p, dy_p = _sag_derivs(s_poly.shape, x, y)
    z_c, dx_c, dy_c = _sag_derivs(s_conic.shape, x, y)
    np.testing.assert_allclose(z_p, z_c, atol=1e-12)
    np.testing.assert_allclose(dx_p, dx_c, atol=1e-12)
    np.testing.assert_allclose(dy_p, dy_c, atol=1e-12)


# ---------- Zernike ----------------------------------------------------------

def test_zernike_sag_matches_library():
    R_n = 8.0
    nms = [(2, 0), (3, 1), (4, 0), (3, -1)]
    coefs = [0.05, -0.02, 0.03, 0.01]
    s = surf(rt.Zernike(0.0, 0.0, R_n, nms, coefs))
    x, y = _xy_grid()
    z_lib, _, _ = zernike_sum_der_xy(coefs, nms, x / R_n, y / R_n, norm=True)
    np.testing.assert_allclose(_np(s.shape.sag(x, y)), _np(z_lib),
                               atol=1e-12)


def test_zernike_derivatives_central_diff():
    s = surf(rt.Zernike(1 / 80.0, 0.0, 10.0,
                        [(2, 0), (4, 0), (3, 1), (3, -1)],
                        [0.05, 0.02, -0.03, 0.04]))
    x, y = _xy_grid()
    _, dx_an, dy_an = _sag_derivs(s.shape, x, y)
    dx_num, dy_num = _central_difference_xy(s.shape.sag, x, y)
    np.testing.assert_allclose(dx_an, dx_num, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(dy_an, dy_num, rtol=2e-5, atol=1e-7)


# ---------- XY ---------------------------------------------------------------

def test_xy_sag_matches_direct_polynomial():
    R_n = 5.0
    mns = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 1)]
    coefs = [0.1, 0.05, -0.04, 0.02, 0.01, -0.015, 0.003]
    s = surf(rt.XY(0.0, 0.0, R_n, mns, coefs))
    x, y = _xy_grid(span=2.0, n=7)
    xn, yn = x / R_n, y / R_n
    z_ref = sum(c * xn ** m * yn ** n for c, (m, n) in zip(coefs, mns))
    np.testing.assert_allclose(_np(s.shape.sag(x, y)), z_ref, atol=1e-12)


def test_xy_derivatives_central_diff():
    s = surf(rt.XY(1 / 80.0, 0.0, 10.0,
                   [(0, 0), (2, 0), (0, 2), (1, 1), (3, 1), (2, 2)],
                   [0.0, 0.05, 0.04, 0.02, 0.005, 0.003]))
    x, y = _xy_grid()
    _, dx_an, dy_an = _sag_derivs(s.shape, x, y)
    dx_num, dy_num = _central_difference_xy(s.shape.sag, x, y)
    np.testing.assert_allclose(dx_an, dx_num, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(dy_an, dy_num, rtol=2e-5, atol=1e-7)


# ---------- Chebyshev --------------------------------------------------------

def test_chebyshev_sag_matches_library():
    x_norm, y_norm = 8.0, 6.0
    mns = [(0, 0), (2, 0), (0, 2), (1, 1), (4, 0), (2, 2), (3, 1)]
    coefs = [0.02, 0.05, 0.04, -0.03, 0.01, 0.005, 0.003]
    s = surf(rt.Chebyshev(0.0, 0.0, x_norm, y_norm, mns, coefs))
    x, y = _xy_grid()
    Tx = [_np(t) for t in cheby1_seq(range(max(m for m, _ in mns) + 1),
                                     x / x_norm)]
    Ty = [_np(t) for t in cheby1_seq(range(max(n for _, n in mns) + 1),
                                     y / y_norm)]
    z_ref = np.zeros_like(x)
    for c, (m, n) in zip(coefs, mns):
        z_ref = z_ref + c * Tx[m] * Ty[n]
    np.testing.assert_allclose(_np(s.shape.sag(x, y)), z_ref, atol=1e-12)


def test_chebyshev_derivatives_central_diff():
    s = surf(rt.Chebyshev(1 / 80.0, 0.0, 10.0, 10.0,
                          [(0, 0), (2, 0), (0, 2), (1, 1), (4, 0)],
                          [0.01, 0.05, 0.04, -0.02, 0.01]))
    x, y = _xy_grid()
    _, dx_an, dy_an = _sag_derivs(s.shape, x, y)
    dx_num, dy_num = _central_difference_xy(s.shape.sag, x, y)
    np.testing.assert_allclose(dx_an, dx_num, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(dy_an, dy_num, rtol=2e-5, atol=1e-7)


# ---------- Jacobi -----------------------------------------------------------

def test_jacobi_sag_matches_library():
    R_n = 8.0
    alpha, beta = 0.5, 0.5
    ns = [0, 1, 2, 3]
    coefs = [0.01, 0.02, 0.03, -0.01]
    s = surf(rt.Jacobi(0.0, 0.0, R_n, alpha, beta, ns, coefs))
    x, y = _xy_grid()
    rsq = x * x + y * y
    u = 2 * rsq / (R_n * R_n) - 1
    Pn = [_np(p) for p in jacobi_seq(ns, alpha, beta, u)]
    z_ref = sum(c * Pn[i] for i, c in enumerate(coefs))
    np.testing.assert_allclose(_np(s.shape.sag(x, y)), z_ref, atol=1e-12)


@pytest.mark.parametrize('alpha,beta', [(0.0, 0.0), (-0.5, -0.5),
                                        (0.5, 0.5), (1.0, 0.0)])
def test_jacobi_derivatives_central_diff(alpha, beta):
    s = surf(rt.Jacobi(1 / 80.0, 0.0, 10.0, alpha, beta, [0, 1, 2, 3],
                       [0.0, 0.05, 0.02, -0.01]))
    x, y = _xy_grid()
    _, dx_an, dy_an = _sag_derivs(s.shape, x, y)
    dx_num, dy_num = _central_difference_xy(s.shape.sag, x, y)
    np.testing.assert_allclose(dx_an, dx_num, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(dy_an, dy_num, rtol=2e-5, atol=1e-7)


def test_jacobi_no_origin_singularity():
    s = surf(rt.Jacobi(1 / 80.0, 0.0, 10.0, 0.0, 0.0, [0, 1, 2, 3, 4, 5],
                       [0.01, 0.05, -0.03, 0.02, -0.01, 0.005]))
    x = np.array([0.0, 1e-12, 1.0])
    y = np.array([0.0, 1e-12, 0.5])
    z, dx, dy = _sag_derivs(s.shape, x, y)
    assert np.isfinite(z).all()
    assert np.isfinite(dx).all()
    assert np.isfinite(dy).all()


# ---------- intersect + round trip -------------------------------------------

def _perturbed_surfaces():
    c, k = 1 / 80.0, 0.0
    return [
        surf(rt.Zernike(c, k, 10.0, [(2, 0), (3, 1)], [0.05, 0.02])),
        surf(rt.XY(c, k, 10.0, [(2, 0), (1, 1)], [0.05, 0.02])),
        surf(rt.Chebyshev(c, k, 10.0, 10.0, [(2, 0), (0, 2)],
                          [0.05, 0.04])),
        surf(rt.Jacobi(c, k, 10.0, 0.0, 0.0, [1, 2], [0.05, 0.02])),
    ]


def test_polynomial_surfaces_intersect_lands_on_surface():
    P = np.array([[1.0, 0.5, -50.0], [-1.0, 0.0, -50.0],
                  [0.0, 0.0, -50.0], [3.0, -2.0, -50.0]])
    S = np.array([[0.0, 0.0, 1.0]] * 4)
    for s in _perturbed_surfaces():
        Q, _, valid = s.intersect(P, S)
        Q = _np(Q)
        assert _np(valid).all(), f'{s.shape.kind} intersect failed'
        z = _np(s.shape.sag(Q[..., 0], Q[..., 1]))
        np.testing.assert_allclose(Q[..., 2], z, atol=1e-9,
                                   err_msg=s.shape.kind)


def test_polynomial_zero_pert_matches_conic_spot():
    c, k = 1 / 80.0, -1.0
    f = -1.0 / (2.0 * c)
    P, S = generate_collimated_rect_ray_grid(5, maxx=5.0, maxy=5.0)
    P, S = _np(P), _np(S)
    s_image = surf(rt.Plane(), 'eval', [0, 0, f])
    res_conic = raytrace([surf(rt.Conic(c, k)), s_image], P, S, wvl=0.55)
    spot_c = _np(res_conic.P)[-1, ..., :2]
    polys = [
        rt.Zernike(c, k, 10.0, [], []),
        rt.XY(c, k, 10.0, [], []),
        rt.Chebyshev(c, k, 10.0, 10.0, [], []),
        rt.Jacobi(c, k, 10.0, 0.0, 0.0, [], []),
    ]
    for shape in polys:
        res = raytrace([surf(shape), s_image], P, S, wvl=0.55)
        np.testing.assert_allclose(_np(res.P)[-1, ..., :2], spot_c,
                                   atol=1e-9, err_msg=shape.kind)
