"""Closed-form geometry breadth: port of the reference intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_geometry_breadth.py (15 tests): toroid loft
decomposition and directionality, biconic degeneracies and principal
curvatures, and the grating OPL modifier (grating equation, order
zero, evanescent orders, phase bookkeeping).
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
import prysm_tpu.x.raytracing as rt
from prysm_tpu.x.raytracing.opl import LinearGrating
from prysm_tpu.x.raytracing.surfaces import Surface
from prysm_tpu.x.raytracing.sags import even_asphere_sag, sphere_sag
from prysm_tpu.x.raytracing.spencer_and_murty import (
    STATUS_EVANESCENT, raytrace)


def _np(x):
    return np.asarray(x)


def surf(shape, interaction='reflect', P=(0, 0, 0), material=None, **kw):
    return Surface(shape=shape, interaction=interaction, P=list(P),
                   material=material, **kw)


def plane(interaction, P, material=None):
    return surf(rt.Plane(), interaction, P, material)


def _xy_grid(span=4.0, n=9):
    v = np.linspace(-span, span, n)
    return np.meshgrid(v, v)


def _sag_derivs(shape, x, y):
    z, n_hat = shape.sag_and_normal(x, y)
    n_hat = _np(n_hat)
    dx = -n_hat[..., 0] / n_hat[..., 2]
    dy = -n_hat[..., 1] / n_hat[..., 2]
    return _np(z), dx, dy


def _central_difference_xy(sag, x, y, h=1e-6):
    dx = (_np(sag(x + h, y)) - _np(sag(x - h, y))) / (2 * h)
    dy = (_np(sag(x, y + h)) - _np(sag(x, y - h))) / (2 * h)
    return dx, dy


# ---------- Toroid -----------------------------------------------------------

def test_toroid_axes_match_components():
    c_x, c_y, k_y = 1 / 100.0, 1 / 50.0, -0.5
    coefs_y = (1e-6, -2e-9)
    s = surf(rt.Toroid(c_x, c_y, k_y, coefs_y))
    x = np.linspace(-5, 5, 11)
    np.testing.assert_allclose(_np(s.shape.sag(x, np.zeros_like(x))),
                               _np(sphere_sag(c_x, x * x)), atol=1e-12)
    y = np.linspace(-5, 5, 11)
    np.testing.assert_allclose(
        _np(s.shape.sag(np.zeros_like(y), y)),
        _np(even_asphere_sag(c_y, k_y, coefs_y, y * y)), atol=1e-12)


def test_toroid_sag_is_additive_loft():
    c_x, c_y, k_y = 1 / 100.0, 1 / 50.0, -0.5
    coefs_y = (1e-6, -2e-9)
    s = surf(rt.Toroid(c_x, c_y, k_y, coefs_y))
    x, y = _xy_grid()
    z_expected = (_np(sphere_sag(c_x, x * x))
                  + _np(even_asphere_sag(c_y, k_y, coefs_y, y * y)))
    np.testing.assert_allclose(_np(s.shape.sag(x, y)), z_expected,
                               atol=1e-12)


def test_toroid_derivatives_central_diff():
    s = surf(rt.Toroid(1 / 80.0, 1 / 60.0, -0.3, (2e-6,)))
    x, y = _xy_grid()
    _, dx_an, dy_an = _sag_derivs(s.shape, x, y)
    dx_num, dy_num = _central_difference_xy(s.shape.sag, x, y)
    np.testing.assert_allclose(dx_an, dx_num, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(dy_an, dy_num, rtol=2e-5, atol=1e-7)


def test_toroid_intersect_lands_on_surface():
    s = surf(rt.Toroid(1 / 100.0, 1 / 80.0, -0.5, ()))
    P = np.array([[1.0, 0.5, -50.0], [-2.0, 1.5, -50.0], [0.0, 0.0, -50.0]])
    S = np.array([[0.0, 0.0, 1.0]] * 3)
    Q, _, valid = s.intersect(P, S)
    Q = _np(Q)
    assert _np(valid).all()
    np.testing.assert_allclose(Q[..., 2],
                               _np(s.shape.sag(Q[..., 0], Q[..., 1])),
                               atol=1e-9)


def test_toroid_cylindrical_directionality():
    s = surf(rt.Toroid(0.0, 1 / 100.0, 0.0, ()))
    P_x = np.array([[1.0, 0.0, -50.0], [2.0, 0.0, -50.0]])
    P_y = np.array([[0.0, 1.0, -50.0], [0.0, 2.0, -50.0]])
    S_z = np.array([[0.0, 0.0, 1.0]] * 2)
    res_x = raytrace([s], P_x, S_z, wvl=0.55e-3)
    res_y = raytrace([s], P_y, S_z, wvl=0.55e-3)
    np.testing.assert_allclose(_np(res_x.S)[1, :, 0], [0.0, 0.0],
                               atol=1e-12)
    assert np.all(np.abs(_np(res_y.S)[1, :, 1]) > 1e-3)


# ---------- Biconic ----------------------------------------------------------

def test_biconic_degenerates_to_conic():
    c, k = 1 / 80.0, -1.0
    s_b = surf(rt.Biconic(c, c, k, k))
    s_c = surf(rt.Conic(c, k))
    x, y = _xy_grid()
    z_b, dx_b, dy_b = _sag_derivs(s_b.shape, x, y)
    z_c, dx_c, dy_c = _sag_derivs(s_c.shape, x, y)
    np.testing.assert_allclose(z_b, z_c, atol=1e-12)
    np.testing.assert_allclose(dx_b, dx_c, atol=1e-12)
    np.testing.assert_allclose(dy_b, dy_c, atol=1e-12)


def test_biconic_derivatives_central_diff():
    s = surf(rt.Biconic(1 / 80.0, 1 / 60.0, -0.5, -1.0))
    x, y = _xy_grid()
    _, dx_an, dy_an = _sag_derivs(s.shape, x, y)
    dx_num, dy_num = _central_difference_xy(s.shape.sag, x, y)
    np.testing.assert_allclose(dx_an, dx_num, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(dy_an, dy_num, rtol=2e-5, atol=1e-7)


def test_biconic_intersect_lands_on_surface():
    s = surf(rt.Biconic(1 / 100.0, 1 / 80.0, 0.0, -0.5))
    P = np.array([[1.0, 0.5, -50.0], [-2.0, 1.5, -50.0], [0.0, 0.0, -50.0]])
    S = np.array([[0.0, 0.0, 1.0]] * 3)
    Q, _, valid = s.intersect(P, S)
    Q = _np(Q)
    assert _np(valid).all()
    np.testing.assert_allclose(Q[..., 2],
                               _np(s.shape.sag(Q[..., 0], Q[..., 1])),
                               atol=1e-9)


def test_biconic_principal_directions_decouple():
    c_x, c_y = 1 / 200.0, 1 / 100.0
    s = surf(rt.Biconic(c_x, c_y, 0.0, 0.0))
    h = 0.5
    P = np.array([[h, 0.0, -50.0], [0.0, h, -50.0]])
    S_z = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    res = raytrace([s], P, S_z, wvl=0.55e-3)
    Sx_axis = _np(res.S)[1, 0]
    Sy_axis = _np(res.S)[1, 1]
    np.testing.assert_allclose(Sx_axis[1], 0.0, atol=1e-12)
    np.testing.assert_allclose(Sy_axis[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(abs(Sx_axis[0]) / abs(Sy_axis[1]),
                               c_x / c_y, rtol=1e-4)


# ---------- gratings ---------------------------------------------------------

def test_grating_zeroth_order_matches_specular():
    g_surf = plane('reflect', [0, 0, 0])
    g_surf.grating = LinearGrating(1e-3, [1.0, 0.0, 0.0], 0)
    base = plane('reflect', [0, 0, 0])
    img = plane('eval', [0, 0, -10.0])
    P = np.array([[1.0, 0.0, -5.0], [0.0, 2.0, -5.0]])
    S = np.array([[0.0, 0.0, 1.0]] * 2)
    r0 = raytrace([g_surf, img], P, S, wvl=0.55)
    rb = raytrace([base, img], P, S, wvl=0.55)
    np.testing.assert_allclose(_np(r0.S), _np(rb.S), atol=1e-12)
    np.testing.assert_allclose(_np(r0.P), _np(rb.P), atol=1e-12)


@pytest.mark.parametrize('order', [-2, -1, 1, 2])
def test_grating_equation_normal_incidence(order):
    d = 2e-3
    wvl = 0.5
    g_surf = plane('reflect', [0, 0, 0])
    g_surf.grating = LinearGrating(d, [1.0, 0.0, 0.0], order)
    img = plane('eval', [0, 0, -10.0])
    P = np.array([[0.0, 0.0, -5.0]])
    S = np.array([[0.0, 0.0, 1.0]])
    r = raytrace([g_surf, img], P, S, wvl=wvl)
    expected_x = order * wvl * 1e-3 / d
    expected_z = -np.sqrt(1 - expected_x ** 2)
    np.testing.assert_allclose(_np(r.S)[1].squeeze(),
                               [expected_x, 0, expected_z], atol=1e-12)


def test_grating_evanescent_flagged():
    g_surf = plane('reflect', [0, 0, 0])
    g_surf.grating = LinearGrating(0.5e-3, [1.0, 0.0, 0.0], 2)
    img = plane('eval', [0, 0, -10.0])
    P = np.array([[0.0, 0.0, -5.0]])
    S = np.array([[0.0, 0.0, 1.0]])
    r = raytrace([g_surf, img], P, S, wvl=0.55)
    status = _np(r.status)
    assert status.imag.item() == STATUS_EVANESCENT
    assert status.real.item() == 1
    assert 'EVANESCENT' in r.status_record.text[0]


def test_refraction_grating_equation():
    d, wvl, n_glass = 1e-3, 0.55, 1.5
    g_surf = plane('refract', [0, 0, 0],
                   material=materials.ConstantMaterial(n_glass))
    g_surf.grating = LinearGrating(d, [1.0, 0.0, 0.0], 1)
    img = plane('eval', [0, 0, 10.0])
    P = np.array([[0.0, 0.0, -5.0]])
    S = np.array([[0.0, 0.0, 1.0]])
    r = raytrace([g_surf, img], P, S, wvl=wvl)
    expected_x = wvl * 1e-3 / (n_glass * d)
    expected_z = +np.sqrt(1 - expected_x ** 2)
    np.testing.assert_allclose(_np(r.S)[1].squeeze(),
                               [expected_x, 0, expected_z], atol=1e-12)


def test_grating_phase_enters_opl():
    d, wvl, x0 = 1e-3, 0.55, 2.0
    img = plane('eval', [0, 0, -10.0])
    P = np.array([[x0, 0.0, -5.0]])
    S = np.array([[0.0, 0.0, 1.0]])

    g1 = plane('reflect', [0, 0, 0])
    g1.grating = LinearGrating(d, [1.0, 0.0, 0.0], 1)
    r1 = raytrace([g1, img], P, S, wvl=wvl)
    np.testing.assert_allclose(_np(r1.OPL)[1].item(),
                               5.0 + wvl * 1e-3 * x0 / d, rtol=0, atol=1e-12)

    g0 = plane('reflect', [0, 0, 0])
    g0.grating = LinearGrating(d, [1.0, 0.0, 0.0], 0)
    r0 = raytrace([g0, img], P, S, wvl=wvl)
    np.testing.assert_allclose(_np(r0.OPL)[1].item(), 5.0, rtol=0,
                               atol=1e-12)

    # d(OPL)/dx equals the transverse optical momentum the grating imparts
    x1 = 3.0
    r2 = raytrace([g1, img], np.array([[x1, 0.0, -5.0]]), S, wvl=wvl)
    slope = (_np(r2.OPL)[1].item() - _np(r1.OPL)[1].item()) / (x1 - x0)
    np.testing.assert_allclose(slope, wvl * 1e-3 / d, rtol=0, atol=1e-12)
