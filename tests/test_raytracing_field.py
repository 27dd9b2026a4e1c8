"""Physical field tracing (Fresnel/PRT/pupil field/gratings) parity."""
import sys
import types

import numpy as onp
import pytest

import jax  # NOQA: F401

for _name, _attrs in (
        ('prysm.x.raytracing._first_order',
         {'initialize_slots': lambda obj: [setattr(obj, n, None)
                                           for n in type(obj).__slots__],
          'format_first_order': lambda obj, cls, **kw: cls}),
        ('prysm.x.raytracing._surface_map',
         {'SurfaceMap': type('SurfaceMap', (), {})}),
):
    if _name not in sys.modules:
        _m = types.ModuleType(_name)
        for _k, _v in _attrs.items():
            setattr(_m, _k, _v)
        sys.modules[_name] = _m

ref_rt = pytest.importorskip('prysm.x.raytracing')
ref_mat = pytest.importorskip('prysm.x.materials')

from prysm_tpu.x import raytracing as rt  # NOQA: E402
import prysm_tpu.x.materials as mat  # NOQA: E402
import prysm_tpu.x.coatings as ct  # NOQA: E402

WVL = 0.5876


def _singlet(rt_mod, mat_mod, coating=None):
    bk7 = mat_mod.model_glass(1.5168, 64.17, name='BK7')
    lens = rt_mod.LensData()
    lens.add(rt_mod.Sphere(1 / 62.0), thickness=6.0, material=bk7,
             coating=coating)
    lens.add(rt_mod.Sphere(-1 / 128.0), thickness=76.0, material=mat_mod.air)
    return rt_mod.OpticalSystem(lens, aperture=20.0, wavelengths=[WVL],
                                stop_index=1)


def test_unpolarized_amplitude_matches_reference():
    mine = _singlet(rt, mat)
    ref = _singlet(ref_rt, ref_mat)
    P, S = rt.launch(mine, mine.field(), WVL, rt.Sampling.hex(4))
    P = onp.asarray(P)
    S = onp.asarray(S)
    fm = rt.raytrace_field(mine, P, S, WVL)
    fr = ref_rt.raytrace_field(ref, P, S, WVL)
    onp.testing.assert_allclose(fm.amplitude, fr.amplitude, atol=1e-12)
    # amplitude ~ product of two Fresnel transmissions near normal
    t = 4 * 1.5168 / (1 + 1.5168) ** 2
    assert fm.amplitude.mean() == pytest.approx(t, abs=5e-3)


def test_interface_coefficients_match_reference():
    thetas = onp.linspace(0.0, 1.2, 13)
    cosI = onp.cos(thetas)
    for typ, n0, n1 in ((rt.STYPE_REFRACT, 1.0, 1.5),
                        (rt.STYPE_REFRACT, 1.5, 1.0),   # has TIR branch
                        (rt.STYPE_REFLECT, 1.0, 1.0)):
        am = rt.interface_coefficients(n0, n1, cosI, typ)
        ar = ref_rt.interface_coefficients(n0, n1, cosI, typ)
        onp.testing.assert_allclose(am[0], ar[0], atol=1e-13)
        onp.testing.assert_allclose(am[1], ar[1], atol=1e-13)


def test_coated_interface_matches_reference():
    # quarter-wave MgF2 AR coating on the first surface
    dm = WVL / (4 * 1.38)
    cm = ct.Stack([1.38], [dm], substrate_index=1.5168)
    import prysm.x.coatings as ref_ct
    cr = ref_ct.Stack([1.38], [dm], substrate_index=1.5168)
    thetas = onp.linspace(0.0, 0.8, 7)
    cosI = onp.cos(thetas)
    am = rt.interface_coefficients(1.0, 1.5168, cosI, rt.STYPE_REFRACT,
                                   coating=cm, wavelength=WVL)
    ar = ref_rt.interface_coefficients(1.0, 1.5168, cosI,
                                       ref_rt.STYPE_REFRACT,
                                       coating=cr, wavelength=WVL)
    onp.testing.assert_allclose(am[0], ar[0], atol=1e-12)
    onp.testing.assert_allclose(am[1], ar[1], atol=1e-12)
    # AR coating transmits more power than the bare surface
    bare = rt.interface_coefficients(1.0, 1.5168, cosI, rt.STYPE_REFRACT)
    p_coat = 0.5 * (abs(am[0]) ** 2 + abs(am[1]) ** 2)
    p_bare = 0.5 * (abs(bare[0]) ** 2 + abs(bare[1]) ** 2)
    assert (p_coat >= p_bare - 1e-12).all()


def test_pupil_field_matches_reference():
    mine = _singlet(rt, mat)
    ref = _singlet(ref_rt, ref_mat)
    pm = rt.pupil_field(mine, mine.field(), npupil=16)
    pr = ref_rt.pupil_field(ref, ref.field(), npupil=16)
    onp.testing.assert_allclose(pm.X, pr.X, atol=1e-9)
    onp.testing.assert_allclose(pm.Y, pr.Y, atol=1e-9)
    onp.testing.assert_allclose(pm.opd, pr.opd, atol=1e-7)
    onp.testing.assert_allclose(pm.amplitude, pr.amplitude, atol=1e-8)
    assert pm.efl == pytest.approx(pr.efl, rel=1e-10)


def test_pupil_field_psf_energy():
    mine = _singlet(rt, mat)
    pf = rt.pupil_field(mine, mine.field(), npupil=24)
    psf, dx = rt.pupil_field_psf(pf, npix=96, Q=2)
    assert psf.shape == (192, 192)
    assert psf.min() >= 0
    assert onp.isfinite(psf).all()
    assert dx > 0


def test_prt_matches_reference():
    mine = _singlet(rt, mat)
    ref = _singlet(ref_rt, ref_mat)
    P, S = rt.launch(mine, mine.field(), WVL, rt.Sampling.hex(3))
    P = onp.asarray(P)
    S = onp.asarray(S)
    rm = rt.raytrace_prt(mine, P, S, WVL)
    rr = ref_rt.raytrace_prt(ref, P, S, WVL)
    onp.testing.assert_allclose(rm.P_matrix, rr.P_matrix, atol=1e-12)


def test_prt_ideal_mirror():
    fold = rt.LensData()
    fold.add(rt.Plane(), typ='refl', thickness=30.0, material=mat.MIRROR)
    prt = rt.raytrace_prt(fold.to_surfaces(),
                          onp.array([[0., 0., -5.]]),
                          onp.array([[0., 0., 1.]]), WVL)
    onp.testing.assert_allclose(prt.P_matrix[0].real,
                                onp.diag([1.0, 1.0, -1.0]), atol=1e-12)


def test_linear_grating_matches_reference_and_physics():
    gm = rt.LinearGrating(period=1e-3, g_vec=(0, 1.0), order=1)
    gr = ref_rt.LinearGrating(period=1e-3, g_vec=(0, 1.0), order=1)

    def build(rt_mod, g):
        return [rt_mod.Surface(shape=rt_mod.Plane(), interaction='refl',
                               P=[0, 0, 10.0], grating=g)]

    P = onp.array([[0.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    S = onp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    resm = rt.raytrace(build(rt, gm), P, S, 0.5)
    resr = ref_rt.raytrace(build(ref_rt, gr), P, S, 0.5)
    onp.testing.assert_allclose(onp.asarray(resm.S), resr.S, atol=1e-12)
    onp.testing.assert_allclose(onp.asarray(resm.OPL), resr.OPL, atol=1e-12)
    # grating equation: sin(theta) = m lambda / d
    S_out = onp.asarray(resm.S)[-1, 0]
    assert S_out[1] == pytest.approx(0.5, abs=1e-12)
    # evanescent third order is flagged
    g3 = rt.LinearGrating(period=4e-4, g_vec=(0, 1.0), order=3)
    res3 = rt.raytrace(build(rt, g3), P[:1], S[:1], 0.5)
    st = res3.status_record
    assert st.code[0] == rt.STATUS_EVANESCENT


def test_grating_differentiable():
    import jax
    import jax.numpy as jnp

    def y_at_image(period):
        g = rt.CallableOPL(
            lambda x, y, wvl: (wvl * 1e-3 / period) * y)
        s = [rt.Surface(shape=rt.Plane(), interaction='refl',
                        P=[0, 0, 10.0], grating=g),
             rt.Surface(shape=rt.Plane(), interaction='eval',
                        P=[0, 0, 0.0])]
        res = rt.raytrace(s, jnp.asarray([[0., 0., 0.]]),
                          jnp.asarray([[0., 0., 1.]]), 0.5)
        return res.P[-1][0, 1]

    p0 = 1e-3
    gval = jax.grad(y_at_image)(p0)
    h = 1e-9
    fd = (y_at_image(p0 + h) - y_at_image(p0 - h)) / (2 * h)
    assert float(gval) == pytest.approx(float(fd), rel=1e-5)


def test_sine_space_and_apodization_roundtrip():
    # paraxial lens: sine-space coords are ~ the entrance coords; apodization ~1
    S_chief = onp.array([0.0, 0.0, 1.0])
    y = onp.linspace(-0.1, 0.1, 5)
    S_last = onp.stack([onp.zeros_like(y), onp.sin(y), onp.cos(y)], axis=1)
    X, Y = rt.sine_space_coords(S_last, S_chief, 100.0)
    onp.testing.assert_allclose(Y, -100.0 * onp.sin(y), atol=1e-12)
    a = onp.linspace(-1, 1, 8)
    exy = onp.stack(onp.meshgrid(a, a) + [..., ], axis=-1)[..., :2] \
        if False else onp.stack(onp.meshgrid(a, a), axis=-1)
    amp = rt.amplitude_apodization(exy, exy * 2.0)
    onp.testing.assert_allclose(amp, 0.5, atol=1e-9)
