"""Seidel + primary chromatic depth: port of the reference intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_aberrations.py (9 tests): the Lagrange invariant,
Petzval against the analytic sum, W040 against a real-ray rho^4 fit,
chromatic terms for stub vs dispersive glass (including a dispersive
object medium), classical wavefront-coefficient factors, eval-plane
nullity, and the stop requirement.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
from prysm_tpu.x.raytracing import (
    FRAUNHOFER_LINES_UM, LensData, OpticalSystem)
from prysm_tpu.x.raytracing.surfaces import Conic
from prysm_tpu.x.raytracing.launch import Field, Sampling, launch
from prysm_tpu.x.raytracing import analysis
from prysm_tpu.x.raytracing.aberrations import (
    _marginal_chief_launch, paraxial_trace, seidel_aberrations)
from prysm_tpu.x.raytracing.paraxial import paraxial_image_distance
from prysm_tpu.x.raytracing._resolve import trace_context


def _n_const(value):
    return materials.ConstantMaterial(value)


_bk7_dispersive = materials.FormulaMaterial(
    'N-BK7',
    lambda wvl: {0.4861327: 1.5224, 0.5875618: 1.5168,
                 0.6562725: 1.5143}[float(wvl)])


def _singlet(epd=8.0, c1=1 / 61.0, gap=None, material=None,
             dispersive=False):
    mat = material or _n_const(1.5168)
    probe_lens = LensData()
    (probe_lens.add(Conic(c1, 0.0), thickness=6.0, material=mat,
                    aperture=10.0)
               .add(Conic(-c1, 0.0), thickness=50.0,
                    material=materials.air, aperture=10.0))
    probe = OpticalSystem(
        probe_lens, aperture=epd, fields=[Field(0, 0.0, kind='angle')],
        wavelengths=list(FRAUNHOFER_LINES_UM.values()), reference=1,
        stop_index=1)
    wvl = probe.wavelength()
    if gap is None:
        gap = paraxial_image_distance(probe.to_surfaces()[:-1], wvl)
    lens = LensData()
    (lens.add(Conic(c1, 0.0), thickness=6.0, material=mat, aperture=10.0)
         .add(Conic(-c1, 0.0), thickness=gap, material=materials.air,
              aperture=10.0))
    return OpticalSystem(
        lens, aperture=epd, fields=[Field(0, 0.0, kind='angle')],
        wavelengths=(list(FRAUNHOFER_LINES_UM.values()) if dispersive
                     else [0.5875618]),
        reference=(1 if dispersive else 0), stop_index=1)


def test_optical_invariant_constant_across_surfaces():
    ld = _singlet()
    wvl = ld.wavelength()
    field = Field(0.0, 2.0, kind='angle')
    ctx = trace_context(ld, wvl, chief=True, epd=ld.epd, stop_index=1)
    (y0m, u0m), (y0c, u0c) = _marginal_chief_launch(ctx, field)
    marg = paraxial_trace(ld, y0m, u0m, wvl, 1.0)
    chief = paraxial_trace(ld, y0c, u0c, wvl, 1.0)
    # H = n (u y_bar - u_bar y) with before-surface quantities per surface
    H = marg.n_in * (marg.u_in * chief.y - chief.u_in * marg.y)
    np.testing.assert_allclose(H, H[0], rtol=0.0, atol=1e-12)


def test_petzval_matches_analytic_sum():
    ld = _singlet()
    field = Field(0.0, 2.0, kind='angle')
    res = seidel_aberrations(ld, field=field)
    wvl = ld.wavelength()
    ctx = trace_context(ld, wvl, chief=True, epd=ld.epd, stop_index=1)
    (y0m, u0m), _ = _marginal_chief_launch(ctx, field)
    marg = paraxial_trace(ld, y0m, u0m, wvl, 1.0)
    P_petz = float(np.sum(marg.c * (1.0 / marg.n_out - 1.0 / marg.n_in)))
    expected = -res.optical_invariant ** 2 * P_petz
    np.testing.assert_allclose(res.sums['SIV'], expected, rtol=1e-12,
                               atol=1e-14)


def test_W040_matches_real_ray_rho4_coefficient():
    ld = _singlet(epd=8.0)
    wvl = ld.wavelength()
    field = Field(0.0, 0.0, kind='angle')
    res = seidel_aberrations(ld, field=field)
    W040_len = res.sums['SI'] / 8.0
    P, S = launch(ld, field, wvl, Sampling.fan(n=61, axis='y'), epd=ld.epd)
    opd, _, yp = analysis.wavefront(ld, np.asarray(P), np.asarray(S), wvl,
                                    P_xp=ld.exit_pupil(wvl),
                                    output='length')
    rho = np.asarray(yp) / (ld.epd / 2.0)
    A = np.vstack([np.ones_like(rho), rho ** 2, rho ** 4]).T
    coef, *_ = np.linalg.lstsq(A, np.asarray(opd), rcond=None)
    real_rho4 = float(coef[2])
    assert real_rho4 * W040_len < 0
    np.testing.assert_allclose(abs(real_rho4), abs(W040_len), rtol=0.05)


def test_chromatic_terms_zero_for_nondispersive_glass():
    ld = _singlet(material=_n_const(1.5168), dispersive=False)
    res = seidel_aberrations(ld, field=Field(0.0, 2.0, kind='angle'),
                             wavelengths=[0.486, 0.588, 0.656])
    assert res.CI is not None and res.CII is not None
    np.testing.assert_allclose(res.CI, 0.0, atol=0.0)
    np.testing.assert_allclose(res.CII, 0.0, atol=0.0)


def test_chromatic_terms_nonzero_for_real_glass():
    ld = _singlet(material=_bk7_dispersive, dispersive=True)
    res = seidel_aberrations(ld, field=Field(0.0, 2.0, kind='angle'))
    assert abs(res.sums['CI']) > 0
    assert abs(res.sums['CII']) > 0


def test_chromatic_terms_include_dispersive_object_medium():
    object_medium = materials.FormulaMaterial(
        'dispersive object medium', lambda wvl: 1.2 + 0.05 * float(wvl))
    ld = _singlet(material=_n_const(1.5168), dispersive=True)
    ld.lens.object_row.material = object_medium
    res = seidel_aberrations(ld, field=Field(0.0, 2.0, kind='angle'))
    assert abs(res.sums['CI']) > 0
    assert abs(res.sums['CII']) > 0


def test_wavefront_coefficients_classical_factors():
    ld = _singlet()
    res = seidel_aberrations(ld, field=Field(0.0, 2.0, kind='angle'))
    W = res.wavefront_coefficients()
    wvl_len = res.wavelength * 1e-3
    np.testing.assert_allclose(W['W040'], 0.125 * res.sums['SI'] / wvl_len)
    np.testing.assert_allclose(W['W131'], 0.5 * res.sums['SII'] / wvl_len)
    np.testing.assert_allclose(W['W222'], 0.5 * res.sums['SIII'] / wvl_len)
    np.testing.assert_allclose(
        W['W220'], 0.25 * (res.sums['SIV'] + res.sums['SIII']) / wvl_len)
    np.testing.assert_allclose(W['W311'], 0.5 * res.sums['SV'] / wvl_len)


def test_eval_plane_contributes_zero():
    ld = _singlet()
    res = seidel_aberrations(ld, field=Field(0.0, 2.0, kind='angle'))
    last = len(res.SI) - 1
    for key in ('SI', 'SII', 'SIII', 'SIV', 'SV'):
        np.testing.assert_allclose(getattr(res, key)[last], 0.0)


def test_seidel_requires_stop():
    ld = _singlet()
    ld.stop_index = None
    with pytest.raises(ValueError, match='entrance pupil'):
        seidel_aberrations(ld, field=Field(0.0, 2.0, kind='angle'))
