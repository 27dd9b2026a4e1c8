"""Pupil-field bridge depth: port of the reference field suite's intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_field.py (36 tests): Fresnel identities, scalar
amplitudes, geometric apodization, sine-space coordinates, the
pupil_field orchestration (Airy recovery, telecentric exit pupils,
coatings, vignetting), polarization ray tracing, and the unified
interface coefficients with TMM coatings.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

from prysm_tpu import thinfilm
from scipy.special import j1
import prysm_tpu.x.materials as materials
import prysm_tpu.x.raytracing as rt
from prysm_tpu.x.raytracing.surfaces import Surface, annular_aperture
from prysm_tpu.x.raytracing.spencer_and_murty import (
    STYPE_REFLECT, STYPE_REFRACT, raytrace)
from prysm_tpu.x.raytracing.launch import Field, Sampling, launch
from prysm_tpu.x.raytracing import field
from prysm_tpu.x.coatings.stack import Stack


def _np(x):
    return np.asarray(x)


def plane(interaction, P, material=None, **kw):
    return Surface(shape=rt.Plane(), interaction=interaction, P=P,
                   material=material, **kw)


def conic(c, k, interaction, P, material=None, **kw):
    return Surface(shape=rt.Conic(c, k), interaction=interaction, P=P,
                   material=material, **kw)


def _slow_parabola():
    c = -1 / 400.0
    f = 1.0 / (2.0 * c)
    return [conic(c, -1.0, 'reflect', [0, 0, 0]),
            plane('eval', [0, 0, f])], abs(f)


def _fast_singlet():
    ng = materials.ConstantMaterial(1.5)
    return [conic(1 / 20.0, 0.0, 'refract', [0, 0, 0], material=ng),
            conic(-1 / 20.0, 0.0, 'refract', [0, 0, 4.0],
                  material=materials.air),
            plane('eval', [0, 0, 23.0])]


def _flat_refractor():
    return [plane('refract', [0, 0, 0],
                  material=materials.ConstantMaterial(1.5)),
            plane('eval', [0, 0, 10.0])]


# ---------- Fresnel ----------------------------------------------------------

def test_fresnel_rp_equals_rs_at_normal_incidence():
    rs = complex(_np(thinfilm.fresnel_rs(1.0, 1.5, 0.0, 0.0)))
    rp = complex(_np(thinfilm.fresnel_rp(1.0, 1.5, 0.0, 0.0)))
    assert abs(abs(rs) - abs(rp)) < 1e-12
    assert abs(abs(rp) - 0.2) < 1e-12


def test_fresnel_energy_conservation_p_pol():
    n0, n1 = 1.0, 1.5
    th0 = np.radians(40.0)
    th1 = np.arcsin(n0 / n1 * np.sin(th0))
    rp = complex(_np(thinfilm.fresnel_rp(n0, n1, th0, th1)))
    tp = complex(_np(thinfilm.fresnel_tp(n0, n1, th0, th1)))
    oblique = (n1 * np.cos(th1)) / (n0 * np.cos(th0))
    assert abs(abs(rp) ** 2 + oblique * abs(tp) ** 2 - 1.0) < 1e-12


# ---------- surface normals / scalar amplitude -------------------------------

def test_surface_normals_incidence_matches_field_angle():
    presc = _flat_refractor()
    wvl, angle = 0.55e-3, 15.0
    P, S = launch(presc, Field(0.0, angle, kind='angle'), wvl,
                  Sampling.rect(n=5), epd=4.0, pupil_z=-5.0)
    tr = raytrace(presc, _np(P), _np(S), wvl)
    cosI, n0, n1, typ = field.surface_normals_from_trace(presc, tr, wvl)
    assert np.allclose(np.abs(_np(cosI)[0]), np.cos(np.radians(angle)),
                       atol=1e-9)
    assert float(_np(n0)[0]) == pytest.approx(1.0)
    assert float(_np(n1)[0]) == pytest.approx(1.5)


def test_unpolarized_amplitude_mirror_lossless():
    c = -1 / 80.0
    presc = [conic(c, -1.0, 'reflect', [0, 0, 0]),
             plane('eval', [0, 0, 1.0 / (2.0 * c)])]
    wvl = 0.55e-3
    P, S = launch(presc, Field(0., 0.), wvl, Sampling.rect(n=7),
                  epd=10.0, pupil_z=-50.0)
    tr = raytrace(presc, _np(P), _np(S), wvl)
    amp = field.unpolarized_amplitude(presc, tr, wvl)
    assert np.allclose(_np(amp), 1.0, atol=1e-12)


def test_unpolarized_amplitude_normal_incidence_fresnel():
    presc = _flat_refractor()
    wvl = 0.55e-3
    P, S = launch(presc, Field(0., 0.), wvl, Sampling.chief(),
                  epd=4.0, pupil_z=-5.0)
    tr = raytrace(presc, _np(P), _np(S), wvl)
    amp = field.unpolarized_amplitude(presc, tr, wvl)
    R = ((1.0 - 1.5) / (1.0 + 1.5)) ** 2
    assert float(_np(amp)[0]) == pytest.approx(np.sqrt(1.0 - R), abs=1e-9)


# ---------- apodization ------------------------------------------------------

def _entrance_grid(n=11):
    x = np.linspace(-1, 1, n)
    a, b = np.meshgrid(x, x)
    return np.stack([a, b], axis=-1)


def test_apodization_identity_uniform():
    entrance = _entrance_grid()
    amp = _np(field.amplitude_apodization(entrance, entrance.copy()))
    assert np.allclose(amp, amp[5, 5])


def test_apodization_magnification_scales_inverse():
    entrance = _entrance_grid()
    amp = _np(field.amplitude_apodization(entrance, entrance * 2.0))
    assert np.allclose(amp, 0.5, atol=1e-12)


def test_apodization_masks_invalid_rays():
    entrance = _entrance_grid()
    valid = np.ones((11, 11), dtype=bool)
    valid[0, 0] = False
    amp = _np(field.amplitude_apodization(entrance, entrance.copy(),
                                          valid=valid))
    assert amp[0, 0] == 0.0
    assert amp[5, 5] > 0.0


def test_apodization_nan_neighbor_keeps_valid_rays():
    entrance = _entrance_grid()
    sphere = entrance.copy()
    sphere[3, 7, :] = np.nan
    amp = _np(field.amplitude_apodization(entrance, sphere))
    for r, c in [(3, 6), (3, 8), (2, 7), (4, 7)]:
        assert np.isfinite(amp[r, c]) and amp[r, c] > 0.0


# ---------- raytrace_field ---------------------------------------------------

def test_raytrace_field_carries_trace_and_amplitude():
    c = -1 / 80.0
    presc = [conic(c, -1.0, 'reflect', [0, 0, 0]),
             plane('eval', [0, 0, 1.0 / (2.0 * c)])]
    wvl = 0.55e-3
    P, S = launch(presc, Field(0., 0.), wvl, Sampling.rect(n=7),
                  epd=10.0, pupil_z=-50.0)
    P, S = _np(P), _np(S)
    ft = field.raytrace_field(presc, P, S, wvl)
    tr = raytrace(presc, P, S, wvl)
    np.testing.assert_allclose(_np(ft.P), _np(tr.P))
    np.testing.assert_allclose(_np(ft.status).imag, _np(tr.status).imag)
    assert np.allclose(_np(ft.amplitude), 1.0, atol=1e-12)


def test_raytrace_field_tir_zero_amplitude():
    presc = [plane('eval', [0, 0, -5.0],
                   material=materials.ConstantMaterial(1.5)),
             plane('refract', [0, 0, 0], material=materials.air),
             plane('eval', [0, 0, 10.0])]
    wvl = 0.55e-3
    P, S = launch(presc, Field(0.0, 50.0, kind='angle'), wvl,
                  Sampling.rect(n=3), epd=2.0, pupil_z=-5.0)
    ft = field.raytrace_field(presc, _np(P), _np(S), wvl)
    assert np.all(_np(ft.amplitude) == 0.0)


def test_raytrace_field_rejects_obsolete_coatings_kwarg():
    presc = _flat_refractor()
    P, S = launch(presc, Field(0., 0.), 0.55, Sampling.chief(),
                  epd=4.0, pupil_z=-5.0)
    with pytest.raises(TypeError):
        field.raytrace_field(presc, _np(P), _np(S), 0.55,
                             coatings=[None, None])


# ---------- sine space -------------------------------------------------------

def test_sine_space_coords_scale_with_sin_theta():
    scale = 50.0
    thetas = np.radians(np.array([0.0, 10.0, 20.0, 30.0]))
    S_chief = np.array([0.0, 0.0, 1.0])
    S_last = np.stack([np.zeros_like(thetas), np.sin(thetas),
                       np.cos(thetas)], axis=-1)
    X, Y = field.sine_space_coords(S_last, S_chief, scale)
    assert np.allclose(_np(X), 0.0, atol=1e-9)
    assert np.allclose(np.abs(_np(Y)), scale * np.sin(thetas), atol=1e-9)


# ---------- pupil_field orchestration ----------------------------------------

def _airy_corr(I, dx, efl, epd, wvl):
    I = I / I.max()
    cy, cx = np.unravel_index(I.argmax(), I.shape)
    yy, xx = np.indices(I.shape)
    r = np.hypot(xx - cx, yy - cy) * dx
    F = abs(efl) / epd
    x = np.pi * r / (wvl * F)
    x = np.where(x == 0, 1e-9, x)
    airy = _np((2 * j1(x) / x) ** 2)
    core = r < 2 * 1.22 * wvl * F
    return np.corrcoef(I[core].ravel(), airy[core].ravel())[0, 1]


def test_pupil_field_low_na_matches_airy():
    presc, f = _slow_parabola()
    wvl = 0.5
    pf = field.pupil_field(presc, Field(0., 0.), wvl, epd=4.0, npupil=96,
                           stop_index=0, pupil_z=-100.0)
    assert float(pf.efl) == pytest.approx(f, rel=1e-6)
    wf = field.pupil_field_to_wavefront(pf, npix=128)
    psf = wf.focus(efl=pf.efl, Q=6)
    I = np.abs(_np(psf.data)) ** 2
    assert _airy_corr(I, psf.dx, pf.efl, 4.0, wvl) > 0.999


def test_pupil_field_to_wavefront_is_pupil_space():
    presc, _ = _slow_parabola()
    pf = field.pupil_field(presc, Field(0., 0.), 0.5, epd=4.0, npupil=64,
                           stop_index=0, pupil_z=-100.0)
    wf = field.pupil_field_to_wavefront(pf, npix=128)
    assert wf.space == 'pupil'
    assert _np(wf.data).shape == (128, 128)
    assert np.iscomplexobj(_np(wf.data))
    assert wf.dx > 0


def test_pupil_field_coating_is_amplitude_only():
    from prysm_tpu.x.raytracing.analysis import wavefront
    presc = _fast_singlet()
    wvl = 0.5
    P, S = launch(presc, Field(0., 0.), wvl, Sampling.rect(n=65),
                  epd=8.0, pupil_z=-20.0)
    opd_ref, xr, yr = wavefront(presc, _np(P), _np(S), wvl, P_xp=(0, 0, 0))
    circ = np.hypot(_np(xr), _np(yr)) <= 4.0 * (1.0 + 1e-9)
    pf = field.pupil_field(presc, Field(0., 0.), wvl, epd=8.0, npupil=65,
                           P_xp=(0, 0, 0), pupil_z=-20.0)
    assert float(np.max(_np(pf.amplitude))) < 1.0
    assert float(np.ptp(_np(pf.amplitude))) > 0.0
    assert float(np.nanmax(np.abs(_np(opd_ref)[circ]))) == pytest.approx(
        float(np.nanmax(np.abs(_np(pf.opd)))) * 1e-3, rel=1e-6)


def test_fast_singlet_heavy_spherical():
    presc = _fast_singlet()
    pf = field.pupil_field(presc, Field(0., 0.), 0.5, epd=8.0, npupil=64,
                           P_xp=(0, 0, 0), pupil_z=-20.0)
    assert float(np.ptp(_np(pf.waves()))) > 1.0


def test_pupil_field_on_axis_requires_anchor():
    presc, _ = _slow_parabola()
    with pytest.raises(ValueError, match='exit pupil'):
        field.pupil_field(presc, Field(0., 0.), 0.5, epd=4.0, npupil=16,
                          pupil_z=-100.0)


def test_pupil_field_obscured_chief_needs_centroid():
    presc, _ = _slow_parabola()
    presc[0].aperture = annular_aperture(0.5, 4.0)
    wvl = 0.5
    with pytest.raises(ValueError, match='centroid'):
        field.pupil_field(presc, Field(0., 0.), wvl, epd=4.0, npupil=32,
                          stop_index=0, pupil_z=-100.0)
    pf = field.pupil_field(presc, Field(0., 0.), wvl, epd=4.0, npupil=32,
                           stop_index=0, pupil_z=-100.0,
                           reference='centroid')
    opd = np.asarray(pf.opd, dtype=float)
    assert opd.shape[0] > 0 and np.all(np.isfinite(opd))


def test_pupil_field_finite_conjugate_apodization_finite():
    ng = materials.ConstantMaterial(1.5)
    presc = [conic(1 / 30., 0, 'refract', [0, 0, 0], material=ng),
             conic(-1 / 30., 0, 'refract', [0, 0, 3.],
                   material=materials.air),
             plane('eval', [0, 0, 51.])]
    fld = Field(0.0, 0.0, kind='height', object_z=-80.0)
    pf = field.pupil_field(presc, fld, 0.5, epd=6.0, npupil=48,
                           P_xp=(0, 0, 3.0), pupil_z=0.0)
    amp = np.asarray(pf.amplitude, dtype=float)
    assert np.all(np.isfinite(amp))
    assert float(np.max(amp)) > 0.0


def test_pupil_field_vignetted_opd_tilt():
    from prysm_tpu.x.raytracing.analysis import wavefront
    presc = _flat_refractor()
    wvl, epd, npupil = 0.5, 4.0, 21
    fld = Field(0.0, 8.0, kind='angle', vignetting={'vuy': 0.5})
    sampling = Sampling.rect(n=npupil)
    P, S = launch(presc, fld, wvl, sampling, epd=epd, pupil_z=-5.0)
    opd_ref, _, _ = wavefront(presc, _np(P), _np(S), wvl, P_xp=(0, 0, 0),
                              field=fld, chief_index=sampling.chief_index)
    nominal = _np(sampling.build(0.5 * epd))
    chief = sampling.chief_index
    circ = (np.hypot(nominal[:, 0] - nominal[chief, 0],
                     nominal[:, 1] - nominal[chief, 1])
            <= 0.5 * epd * (1 + 1e-9))
    pf = field.pupil_field(presc, fld, wvl, epd=epd, npupil=npupil,
                           P_xp=(0, 0, 0), pupil_z=-5.0)
    np.testing.assert_allclose(_np(pf.opd), _np(opd_ref)[circ] * 1e3,
                               atol=1e-7)


def test_even_rect_grid_internal_chief():
    presc = _flat_refractor()
    pf = field.pupil_field(presc, Field(0, 2), 0.5, epd=4.0, npupil=16,
                           P_xp=(0, 0, 0), pupil_z=-5.0)
    assert len(_np(pf.X)) <= 16 * 16
    P, S = launch(presc, Field(0, 2), 0.5, Sampling.chief(), epd=4.0,
                  pupil_z=-5.0)
    chief = raytrace(presc, _np(P), _np(S), 0.5)
    np.testing.assert_allclose(_np(pf.P_img), _np(chief.P)[-1, 0])


def test_sampling_chief_metadata():
    assert Sampling.rect(15).chief_index == 15 * 15 // 2
    assert Sampling.rect(16).chief_index is None
    assert Sampling.chief().chief_index == 0


# ---------- polarization ray tracing -----------------------------------------

def test_prt_matrix_matches_fresnel_diattenuation():
    presc = [plane('refract', [0, 0, 0],
                   material=materials.ConstantMaterial(1.5)),
             plane('eval', [0, 0, 10.0])]
    wvl = 0.5
    P, S = launch(presc, Field(0., 40., kind='angle'), wvl, Sampling.chief(),
                  epd=1.0, pupil_z=-5.0)
    P, S = _np(P), _np(S)
    pr = field.raytrace_prt(presc, P, S, wvl)
    Pmat = _np(pr.P_matrix)[0]
    k_in = S[0] / np.linalg.norm(S[0])
    s_hat = np.array([1.0, 0.0, 0.0])
    p_in = np.cross(k_in, s_hat)
    th0 = np.radians(40.0)
    th1 = np.arcsin(1 / 1.5 * np.sin(th0))
    ts = complex(_np(thinfilm.fresnel_ts(1, 1.5, th0, th1)))
    tp = complex(_np(thinfilm.fresnel_tp(1, 1.5, th0, th1)))
    ob = (1.5 * np.cos(th1)) / (1.0 * np.cos(th0))
    assert np.linalg.norm(Pmat @ s_hat) == pytest.approx(
        np.sqrt(ob) * abs(ts), rel=1e-9)
    assert np.linalg.norm(Pmat @ p_in) == pytest.approx(
        np.sqrt(ob) * abs(tp), rel=1e-9)


def test_prt_unpolarized_degenerates_to_scalar_mirror():
    presc, _ = _slow_parabola()
    wvl = 0.5
    kw = dict(epd=4.0, npupil=96, stop_index=0, pupil_z=-100.0)
    pf_s = field.pupil_field(presc, Field(0., 0.), wvl, **kw)
    pf_p = field.pupil_field(presc, Field(0., 0.), wvl, polarized=True, **kw)
    ps, _ = field.pupil_field_psf(pf_s, npix=128, Q=4)
    pp, _ = field.pupil_field_psf(pf_p, npix=128, Q=4,
                                  input_polarization='unpolarized')
    ps, pp = _np(ps), _np(pp)
    assert float(np.abs(ps / ps.max() - pp / pp.max()).max()) < 1e-4


def test_prt_has_cross_polarization_leakage():
    presc = _fast_singlet()
    pf = field.pupil_field(presc, Field(0., 0.), 0.5, epd=8.0, npupil=64,
                           P_xp=(0, 0, 0), pupil_z=-20.0, polarized=True)
    wfx, wfy = field.pupil_field_to_wavefront(
        pf, npix=128, input_polarization=(1.0, 0.0, 0.0))
    ex = float(np.sum(np.abs(_np(wfx.data)) ** 2))
    ey = float(np.sum(np.abs(_np(wfy.data)) ** 2))
    assert 0.0 < ey / ex < 0.1


def test_pupil_field_to_wavefront_polarized_needs_input():
    presc, _ = _slow_parabola()
    pf = field.pupil_field(presc, Field(0., 0.), 0.5, epd=4.0, npupil=32,
                           stop_index=0, pupil_z=-100.0, polarized=True)
    with pytest.raises(TypeError, match='input_polarization'):
        field.pupil_field_to_wavefront(pf, npix=64)
    comps = field.pupil_field_to_wavefront(pf, npix=64,
                                           input_polarization=(1, 0, 0))
    assert isinstance(comps, list) and len(comps) == 2


# ---------- coated interface coefficients ------------------------------------

def test_interface_coefficients_zero_layer_matches_bare():
    cosI = np.cos(np.radians(np.array([0.0, 15.0, 35.0, 55.0, 75.0])))
    bare_s, bare_p = field.interface_coefficients(1.0, 1.5, cosI,
                                                  STYPE_REFRACT)
    stack = Stack([], [], substrate_index=1.5, ambient_index=1.0)
    cs, cp = field.interface_coefficients(1.0, 1.5, cosI, STYPE_REFRACT,
                                          coating=stack, wavelength=0.55)
    np.testing.assert_allclose(_np(cs), _np(bare_s), atol=1e-12)
    np.testing.assert_allclose(_np(cp), _np(bare_p), atol=1e-12)


def test_interface_coefficients_unit_power_bare_dielectric():
    cosI = np.cos(np.radians(np.array([0.0, 30.0, 60.0])))
    a_s, a_p = field.interface_coefficients(1.0, 1.5, cosI, STYPE_REFRACT)
    stack = Stack([], [], substrate_index=1.5, ambient_index=1.0)
    r_s, r_p = field.interface_coefficients(1.0, 1.5, cosI, STYPE_REFLECT,
                                            coating=stack, wavelength=0.55)
    np.testing.assert_allclose(np.abs(_np(a_s)) ** 2 + np.abs(_np(r_s)) ** 2,
                               1.0, atol=1e-12)
    np.testing.assert_allclose(np.abs(_np(a_p)) ** 2 + np.abs(_np(r_p)) ** 2,
                               1.0, atol=1e-12)


def test_quarter_wave_ar_coating_reduces_reflection():
    wvl, nl = 0.55, 1.38
    ar = Stack([nl], [wvl / (4 * nl)], substrate_index=1.5,
               ambient_index=1.0)
    a_s, a_p = field.interface_coefficients(1.0, 1.5, np.array([1.0]),
                                            STYPE_REFRACT, coating=ar,
                                            wavelength=wvl)
    T = 0.5 * (np.abs(_np(a_s)) ** 2 + np.abs(_np(a_p)) ** 2)
    R_expected = ((1.0 * 1.5 - nl ** 2) / (1.0 * 1.5 + nl ** 2)) ** 2
    assert float(1.0 - T[0]) == pytest.approx(R_expected, abs=1e-9)
    assert float(1.0 - T[0]) < 0.04


def test_metal_mirror_reduces_to_ideal():
    cosI = np.cos(np.radians(np.array([0.0, 20.0, 45.0, 70.0])))
    pec = Stack([], [], substrate_index=1.0 + 1e7j, ambient_index=1.0)
    a_s, a_p = field.interface_coefficients(1.0, 1.0, cosI, STYPE_REFLECT,
                                            coating=pec, wavelength=0.55)
    np.testing.assert_allclose(_np(a_s), 1.0, atol=1e-5)
    np.testing.assert_allclose(_np(a_p), -1.0, atol=1e-5)


def test_metal_mirror_diattenuation_and_retardance():
    cosI = np.cos(np.radians(np.array([0.0, 45.0, 70.0])))
    al = Stack([], [], substrate_index=0.96 + 6.7j, ambient_index=1.0)
    a_s, a_p = field.interface_coefficients(1.0, 1.0, cosI, STYPE_REFLECT,
                                            coating=al, wavelength=0.55)
    a_s, a_p = _np(a_s), _np(a_p)
    Rs, Rp = np.abs(a_s) ** 2, np.abs(a_p) ** 2
    assert np.all(Rs > 0.8) and np.all(Rp > 0.8)
    assert Rs[0] == pytest.approx(Rp[0], rel=1e-9)
    assert Rs[2] > Rp[2]
    retardance = np.degrees(np.angle(a_s) - np.angle(a_p)) % 360.0
    assert retardance[0] == pytest.approx(180.0, abs=1e-6)
    assert abs(retardance[2] - 180.0) > 5.0


def test_surface_coating_unpolarized_amplitude_beats_bare():
    wvl, nl = 0.55, 1.38
    ar = Stack([nl], [wvl / (4 * nl)], substrate_index=1.5,
               ambient_index=1.0)
    bare = _flat_refractor()
    coated = [plane('refract', [0, 0, 0],
                    material=materials.ConstantMaterial(1.5), coating=ar),
              plane('eval', [0, 0, 10.0])]
    P, S = launch(bare, Field(0., 0.), wvl, Sampling.chief(),
                  epd=4.0, pupil_z=-5.0)
    P, S = _np(P), _np(S)
    amp_bare = float(_np(field.raytrace_field(bare, P, S, wvl).amplitude)[0])
    amp_coat = float(_np(field.raytrace_field(coated, P, S,
                                              wvl).amplitude)[0])
    assert amp_coat > amp_bare
    assert amp_coat == pytest.approx(np.sqrt(1.0 - 0.0141), abs=1e-3)


def test_prt_metal_mirror_matches_provider_reflectance():
    al = Stack([], [], substrate_index=0.96 + 6.7j, ambient_index=1.0)
    presc = [plane('reflect', [0, 0, 0], coating=al),
             plane('eval', [0, 0, -10.0])]
    wvl = 0.55
    P, S = launch(presc, Field(0., 40., kind='angle'), wvl, Sampling.chief(),
                  epd=1.0, pupil_z=-5.0)
    P, S = _np(P), _np(S)
    pr = field.raytrace_prt(presc, P, S, wvl)
    Pmat = _np(pr.P_matrix)[0]
    cosI = np.cos(np.radians(np.array([40.0])))
    a_s, a_p = field.interface_coefficients(1.0, 1.0, cosI, STYPE_REFLECT,
                                            coating=al, wavelength=wvl)
    s_hat = np.array([1.0, 0.0, 0.0])
    k_in = S[0] / np.linalg.norm(S[0])
    p_in = np.cross(k_in, s_hat)
    assert np.linalg.norm(Pmat @ s_hat) == pytest.approx(
        abs(complex(_np(a_s)[0])), rel=1e-9)
    assert np.linalg.norm(Pmat @ p_in) == pytest.approx(
        abs(complex(_np(a_p)[0])), rel=1e-9)
