"""Optical-path-function protocol depth: port of the reference intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_phase.py (8 tests): LinearGrating closed forms and
mutation coherence, the Surface.grating protocol gate, CallableOPL
finite-difference fallbacks and derivative preference, and a
diffractive-lens radial phase focusing rays.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
import prysm_tpu.x.raytracing as rt
from prysm_tpu.x.raytracing.opl import CallableOPL, LinearGrating, OPLFunc
from prysm_tpu.x.raytracing.surfaces import Surface
from prysm_tpu.x.raytracing.spencer_and_murty import raytrace


def _np(x):
    return np.asarray(x)


def plane(interaction, P, material=None):
    return Surface(shape=rt.Plane(), interaction=interaction, P=P,
                   material=material)


def test_linear_grating_opl_gradient_hessian():
    g = LinearGrating(4e-3, [1.0, 0.0], order=2)
    x = np.array([0.0, 1.0, -2.0])
    y = np.array([0.0, 3.0, 5.0])
    np.testing.assert_allclose(_np(g.opl(x, y, 0.5)), x / 4.0)
    opl, gx, gy = g.opl_and_gradient(x, y, 0.5)
    np.testing.assert_allclose(_np(opl), x / 4.0)
    np.testing.assert_allclose(_np(gx), 0.25)
    np.testing.assert_allclose(_np(gy), 0.0)
    pxx, pxy, pyy = g.opl_hessian(x, y, 0.5)
    np.testing.assert_allclose(_np(pxx), 0.0)
    np.testing.assert_allclose(_np(pxy), 0.0)
    np.testing.assert_allclose(_np(pyy), 0.0)


def test_linear_grating_in_plane_components_only():
    g3 = LinearGrating(2e-3, [1.0, 0.0, 7.0], order=1)
    g2 = LinearGrating(2e-3, [1.0, 0.0], order=1)
    x = np.linspace(-3, 3, 5)
    y = np.linspace(2, -2, 5)
    np.testing.assert_allclose(_np(g3.opl(x, y, 0.55)),
                               _np(g2.opl(x, y, 0.55)))


def test_linear_grating_mutation_keeps_gradient_coherent():
    g = LinearGrating(2e-3, [1.0, 0.0], order=1)
    _, gx0, _ = g.opl_and_gradient(np.array([0.0]), np.array([0.0]), 0.5)
    g.period = 4e-3
    g.order = 2
    g.g_vec = (0.0, 1.0)
    _, gx1, gy1 = g.opl_and_gradient(np.array([0.0]), np.array([0.0]), 0.5)
    np.testing.assert_allclose(_np(gx0), 0.25)
    np.testing.assert_allclose(_np(gx1), 0.0)
    np.testing.assert_allclose(_np(gy1), 0.25)


def test_surface_grating_requires_opl_func():
    host = plane('reflect', [0, 0, 0])
    ok = LinearGrating(2.0e-3, [1.0, 0.0, 0.0], 1)
    host.grating = ok
    assert isinstance(host.grating, OPLFunc)
    host.grating = None
    assert host.grating is None
    for junk in ((2.0e-3, [1.0, 0.0, 0.0], 1), 42.0):
        with pytest.raises(TypeError, match='OPLFunc'):
            host.grating = junk


# the quadratic test phase and its closed-form partials
def _quad_phase(x, y, wavelength):
    return 0.3 * x * x + 0.1 * y * y + 0.05 * x * y


def _quad_partials(x, y):
    return 0.6 * x + 0.05 * y, 0.2 * y + 0.05 * x


PROBE_X = np.array([0.5, -1.0, 2.0])
PROBE_Y = np.array([1.0, 0.5, -1.5])


def test_callable_opl_gradient_fd_fallback():
    wrapped = CallableOPL(_quad_phase)
    value, gx, gy = wrapped.opl_and_gradient(PROBE_X, PROBE_Y, 0.55)
    want_gx, want_gy = _quad_partials(PROBE_X, PROBE_Y)
    np.testing.assert_allclose(_np(value),
                               _quad_phase(PROBE_X, PROBE_Y, 0.55))
    np.testing.assert_allclose(_np(gx), want_gx, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(_np(gy), want_gy, rtol=1e-6, atol=1e-6)


def test_callable_opl_hessian_fd_fallback():
    def supplied(x, y, wavelength):
        x, y = np.asarray(x, float), np.asarray(y, float)
        return (_quad_phase(x, y, wavelength), *_quad_partials(x, y))

    wrapped = CallableOPL(_quad_phase, opl_and_gradient=supplied)
    curv = wrapped.opl_hessian(PROBE_X, PROBE_Y, 0.55)
    for got, want in zip(curv, (0.6, 0.05, 0.2)):
        np.testing.assert_allclose(_np(got), want, rtol=1e-5, atol=1e-5)


def test_callable_opl_prefers_supplied_derivatives():
    sentinel = object()

    def oag(x, y, wavelength):
        return sentinel

    cp = CallableOPL(lambda x, y, wavelength: x, opl_and_gradient=oag)
    assert cp.opl_and_gradient(np.array([0.0]), np.array([0.0]),
                               0.55) is sentinel


class _RadialOPL(OPLFunc):
    """Quadratic radial phase: a diffractive lens of power -a."""

    def __init__(self, strength):
        self.a = strength

    def opl(self, x, y, wavelength):
        return 0.5 * self.a * (x * x + y * y)

    def opl_and_gradient(self, x, y, wavelength):
        x, y = (np.asarray(v, float) for v in (x, y))
        return self.opl(x, y, wavelength), self.a * x, self.a * y

    def opl_hessian(self, x, y, wavelength):
        diag = np.full(np.shape(x), self.a)
        return diag, np.zeros_like(diag), diag


def test_radial_opl_focuses_like_a_lens():
    g = materials.ConstantMaterial(1.5)
    s = plane('refract', [0, 0, 0], material=g)
    s.grating = _RadialOPL(-1e-3)
    img = plane('eval', [0, 0, 50.0])
    P = np.array([[5.0, 0.0, -5.0], [-5.0, 0.0, -5.0], [0.0, 4.0, -5.0]])
    S = np.broadcast_to(np.array([0.0, 0.0, 1.0]), (3, 3)).copy()
    r = raytrace([s, img], P, S, wvl=0.55)
    Sx = _np(r.S)[1, :, 0]
    Sy = _np(r.S)[1, :, 1]
    assert Sx[0] < 0.0
    assert Sx[1] > 0.0
    assert Sy[2] < 0.0
    np.testing.assert_allclose(abs(_np(r.P)[-1, 0, 0]),
                               abs(_np(r.P)[-1, 1, 0]))
    assert abs(_np(r.P)[-1, 0, 0]) < 5.0
