"""Seidel + primary chromatic depth: port of the reference intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_aberrations.py (9 tests): the Lagrange invariant,
Petzval against the analytic sum, W040 against a real-ray rho^4 fit,
chromatic terms for stub vs dispersive glass (including a dispersive
object medium), classical wavefront-coefficient factors, eval-plane
nullity, and the stop requirement.  The behaviors are the
reference's; the harness (builders, trace shorthand) is this repo's
own.
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

FRAUNHOFER = list(FRAUNHOFER_LINES_UM.values())
OFFAX = Field(0.0, 2.0, kind='angle')

_bk7ish = materials.FormulaMaterial(
    'N-BK7',
    lambda wvl: {0.4861327: 1.5224, 0.5875618: 1.5168,
                 0.6562725: 1.5143}[float(wvl)])


def aac(actual, desired, **kw):
    np.testing.assert_allclose(np.asarray(actual, dtype=float), desired,
                               **kw)


def biconvex(epd=8.0, c1=1 / 61.0, gap=None, material=None,
             dispersive=False):
    """An equiconvex singlet, image plane at paraxial focus by default."""
    glass = material or materials.ConstantMaterial(1.5168)

    def rows(rear_gap):
        spine = LensData()
        spine.add(Conic(c1, 0.0), thickness=6.0, material=glass,
                  aperture=10.0)
        spine.add(Conic(-c1, 0.0), thickness=rear_gap,
                  material=materials.air, aperture=10.0)
        return spine

    if gap is None:
        probe = OpticalSystem(rows(50.0), aperture=epd,
                              fields=[Field(0, 0.0, kind='angle')],
                              wavelengths=FRAUNHOFER, reference=1,
                              stop_index=1)
        gap = paraxial_image_distance(probe.to_surfaces()[:-1],
                                      probe.wavelength())
    spectrum = FRAUNHOFER if dispersive else [0.5875618]
    return OpticalSystem(rows(gap), aperture=epd,
                         fields=[Field(0, 0.0, kind='angle')],
                         wavelengths=spectrum,
                         reference=(1 if dispersive else 0), stop_index=1)


def paraxial_pair(system, field):
    """(marginal, chief) YNU traces of the resolved launch pair."""
    wvl = system.wavelength()
    ctx = trace_context(system, wvl, chief=True, epd=system.epd,
                        stop_index=1)
    marg_bc, chief_bc = _marginal_chief_launch(ctx, field)
    return (paraxial_trace(system, *marg_bc, wvl, 1.0),
            paraxial_trace(system, *chief_bc, wvl, 1.0))


def test_optical_invariant_constant_across_surfaces():
    marg, chief = paraxial_pair(biconvex(), OFFAX)
    # H = n (u y_bar - u_bar y), before-surface quantities per surface
    invariant = marg.n_in * (marg.u_in * chief.y - chief.u_in * marg.y)
    aac(invariant, invariant[0], rtol=0.0, atol=1e-12)


def test_petzval_matches_analytic_sum():
    rig = biconvex()
    report = seidel_aberrations(rig, field=OFFAX)
    marg, _ = paraxial_pair(rig, OFFAX)
    petzval_sum = float(np.sum(
        np.asarray(marg.c) * (1.0 / np.asarray(marg.n_out)
                              - 1.0 / np.asarray(marg.n_in))))
    aac(report.sums['SIV'],
        -report.optical_invariant ** 2 * petzval_sum,
        rtol=1e-12, atol=1e-14)


def test_W040_matches_real_ray_rho4_coefficient():
    rig = biconvex(epd=8.0)
    wvl = rig.wavelength()
    axial = Field(0.0, 0.0, kind='angle')
    report = seidel_aberrations(rig, field=axial)
    seidel_w040 = report.sums['SI'] / 8.0

    P, S = launch(rig, axial, wvl, Sampling.fan(n=61, axis='y'),
                  epd=rig.epd)
    opd, _, yp = analysis.wavefront(rig, np.asarray(P), np.asarray(S),
                                    wvl, P_xp=rig.exit_pupil(wvl),
                                    output='length')
    rho = np.asarray(yp) / (rig.epd / 2.0)
    design = np.vstack([np.ones_like(rho), rho ** 2, rho ** 4]).T
    fit, *_ = np.linalg.lstsq(design, np.asarray(opd), rcond=None)
    real_w040 = float(fit[2])
    # opposite sign conventions, magnitudes within 5%
    assert real_w040 * seidel_w040 < 0
    aac(abs(real_w040), abs(seidel_w040), rtol=0.05)


def test_chromatic_terms_zero_for_nondispersive_glass():
    report = seidel_aberrations(
        biconvex(material=materials.ConstantMaterial(1.5168)),
        field=OFFAX, wavelengths=[0.486, 0.588, 0.656])
    assert report.CI is not None and report.CII is not None
    aac(report.CI, 0.0, atol=0.0)
    aac(report.CII, 0.0, atol=0.0)


def test_chromatic_terms_nonzero_for_real_glass():
    report = seidel_aberrations(biconvex(material=_bk7ish,
                                         dispersive=True), field=OFFAX)
    assert abs(report.sums['CI']) > 0 and abs(report.sums['CII']) > 0


def test_chromatic_terms_include_dispersive_object_medium():
    rig = biconvex(material=materials.ConstantMaterial(1.5168),
                   dispersive=True)
    rig.lens.object_row.material = materials.FormulaMaterial(
        'dispersive object medium', lambda wvl: 1.2 + 0.05 * float(wvl))
    report = seidel_aberrations(rig, field=OFFAX)
    assert abs(report.sums['CI']) > 0 and abs(report.sums['CII']) > 0


def test_wavefront_coefficients_classical_factors():
    report = seidel_aberrations(biconvex(), field=OFFAX)
    W = report.wavefront_coefficients()
    lam = report.wavelength * 1e-3
    factors = {'W040': (0.125, 'SI'), 'W131': (0.5, 'SII'),
               'W222': (0.5, 'SIII'), 'W311': (0.5, 'SV')}
    for name, (scale, key) in factors.items():
        aac(W[name], scale * report.sums[key] / lam)
    aac(W['W220'],
        0.25 * (report.sums['SIV'] + report.sums['SIII']) / lam)


def test_eval_plane_contributes_zero():
    report = seidel_aberrations(biconvex(), field=OFFAX)
    image_row = len(report.SI) - 1
    for key in ('SI', 'SII', 'SIII', 'SIV', 'SV'):
        aac(getattr(report, key)[image_row], 0.0)


def test_seidel_requires_stop():
    rig = biconvex()
    rig.stop_index = None
    with pytest.raises(ValueError, match='entrance pupil'):
        seidel_aberrations(rig, field=OFFAX)
