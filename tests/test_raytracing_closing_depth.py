"""Wavefront closing, trace context, and EIC depth: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_wavefront_closing.py (7 tests), test_trace_context.py (7), and
test_eic_closing.py (7): close_wavefront as the system-level OPD
owner (resolved/fixed exit pupils, telecentric kappa=0, center
override, field-tilt ramp, invalid-chief errors, off-axis geometric
fallback), trace_context metadata resolution, and the branch-free
Hopkins equally-inclined-chord closing against an explicit
reference-sphere-root oracle.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
from prysm_tpu.x.raytracing import LensData, OpticalSystem, sample_rx
from prysm_tpu.x.raytracing.surfaces import Conic, Plane
from prysm_tpu.x.raytracing.spencer_and_murty import valid_mask
from prysm_tpu.x.raytracing.launch import Field, Sampling, launch
from prysm_tpu.x.raytracing.opt import (
    _pupil_center_chief_index, eic_distance, hopkins_eic_closing,
    reference_sphere_curvature)
from prysm_tpu.x.raytracing.analysis import (
    close_on_reference_sphere, close_wavefront, resolve_exit_pupil,
    wavefront)
from prysm_tpu.x.raytracing.design import WavefrontRMS, _TraceCache
from prysm_tpu.x.raytracing.paraxial import (
    paraxial_image_distance, ynu_first_order)
from prysm_tpu.x.raytracing._meta import object_image_indices
from prysm_tpu.x.raytracing._resolve import (
    TraceContext, compiled_surfaces, trace_context)

WVL = 0.5875618


def _np(x):
    return np.asarray(x)


def aac(actual, desired, **kw):
    np.testing.assert_allclose(np.asarray(actual, dtype=float), desired,
                               **kw)


def _doublet_system():
    sys_ = OpticalSystem(sample_rx.doublet_conic(), aperture=15.0,
                         fields=[0.0, 3.0], wavelengths=[WVL], reference=0,
                         stop_index=2)   # the front stop plane (0 is OBJECT)
    sys_.solve.image_distance()
    return sys_


def _traced_bundle(sys_, field, sampling=None):
    if sampling is None:
        sampling = Sampling.fan(n=21, axis='y')
    P, S = launch(sys_, field, WVL, sampling, epd=sys_.epd)
    trace = sys_.trace(P, S, WVL)
    return np.asarray(P), np.asarray(S), trace


def _singlet(epd=8.0):
    mat = materials.ConstantMaterial(1.5168)
    probe = LensData()
    (probe.add(Conic(1 / 61.0, 0.0), thickness=6.0, material=mat,
               aperture=10.0)
          .add(Conic(-1 / 61.0, 0.0), thickness=50.0,
               material=materials.air, aperture=10.0))
    sysp = OpticalSystem(probe, aperture=epd,
                         fields=[Field(0, 0.0, kind='angle')],
                         wavelengths=[WVL], reference=0, stop_index=1)
    foc = paraxial_image_distance(sysp.to_surfaces()[:-1],
                                  sysp.wavelength())
    lens = LensData()
    (lens.add(Conic(1 / 61.0, 0.0), thickness=6.0, material=mat,
              aperture=10.0)
         .add(Conic(-1 / 61.0, 0.0), thickness=foc,
              material=materials.air, aperture=10.0))
    return OpticalSystem(lens, aperture=epd,
                         fields=[Field(0, 0.0, kind='angle')],
                         wavelengths=[WVL], reference=0, stop_index=1)


def _telecentric(epd=6.0):
    """Image-space-telecentric build with the exit pupil at infinity."""
    mat = materials.ConstantMaterial(1.5168)
    c = 1.0 / 40.0
    probe = LensData()
    (probe.add(Conic(c, 0.0), thickness=3.0, material=mat, aperture=14.0)
          .add(Conic(-c, 0.0), thickness=60.0, material=materials.air,
               aperture=14.0))
    sp = OpticalSystem(probe, aperture=epd,
                       fields=[Field(3, 0.0, kind='angle')],
                       wavelengths=[WVL], reference=0, stop_index=1)
    ffl = ynu_first_order(sp.to_surfaces(), wvl=sp.wavelength(),
                          stop_index=1).ffl
    # a stop plane one front-focal-length ahead of the lens puts the
    # exit pupil at infinity (image-space telecentric)
    lens = LensData()
    (lens.add(Plane(), typ='eval', material=materials.air,
              aperture=epd / 2)
         .add(Conic(c, 0.0), thickness=3.0, material=mat, aperture=20.0)
         .add(Conic(-c, 0.0), thickness=60.0, material=materials.air,
              aperture=20.0))
    lens.rows[1].thickness = abs(ffl)
    sysT = OpticalSystem(lens, aperture=epd,
                         fields=[Field(3, 0.0, kind='angle')],
                         wavelengths=[WVL], reference=0, stop_index=1)
    lens.rows[3].thickness = paraxial_image_distance(
        sysT.to_surfaces()[:-1], sysT.wavelength())
    return sysT


# ---------- close_wavefront ---------------------------------------------------

def test_close_wavefront_matches_wavefront_resolved_xp():
    sys_ = _doublet_system()
    P, S, trace = _traced_bundle(sys_, Field(0.0, 0.0))
    chief = _pupil_center_chief_index(P)
    wc = close_wavefront(sys_, trace, WVL, chief)
    opd, _, _ = wavefront(sys_, P, S, WVL, output='length')
    np.testing.assert_array_equal(_np(wc.opd), _np(opd))
    assert wc.xp_mode == 'paraxial'
    assert wc.P_xp is not None
    assert wc.chief_index == chief
    np.testing.assert_array_equal(_np(wc.center),
                                  _np(trace.P)[-1, chief])


def test_close_wavefront_matches_wavefront_fixed_xp():
    sys_ = _doublet_system()
    P, S, trace = _traced_bundle(sys_, Field(0.0, 0.0))
    chief = _pupil_center_chief_index(P)
    P_xp = np.asarray(sys_.exit_pupil(WVL))
    wc = close_wavefront(sys_, trace, WVL, chief, P_xp=P_xp)
    opd, _, _ = wavefront(sys_, P, S, WVL, P_xp=P_xp, output='length')
    np.testing.assert_array_equal(_np(wc.opd), _np(opd))
    assert wc.xp_mode == 'fixed'
    np.testing.assert_array_equal(_np(wc.P_xp), P_xp)


def test_close_wavefront_telecentric_resolves_kappa_zero():
    sys_ = _telecentric()
    wvl = sys_.wavelength()
    fld = Field(3.0, 0.0)
    P, S = launch(sys_, fld, wvl, Sampling.fan(n=21, axis='y'),
                  epd=sys_.epd)
    trace = sys_.trace(P, S, wvl)
    chief = _pupil_center_chief_index(np.asarray(P))
    wc = close_wavefront(sys_, trace, wvl, chief)
    assert wc.P_xp is None
    assert wc.xp_mode == 'paraxial'
    assert wc.curvature == 0.0
    assert wc.R == np.inf
    assert wc.delta is None
    assert np.all(np.isfinite(_np(wc.opd)))


def test_close_wavefront_center_override():
    sys_ = _doublet_system()
    P, S, trace = _traced_bundle(sys_, Field(0.0, 0.0))
    chief = _pupil_center_chief_index(P)
    center = _np(trace.P)[-1, chief] + np.array([0.0, 0.0, 0.5])
    P_xp = np.asarray(sys_.exit_pupil(WVL))
    wc = close_wavefront(sys_, trace, WVL, chief, center=center,
                         P_xp=P_xp)
    valid = _np(valid_mask(trace.status, trace.P[-1]))
    _, n_image = object_image_indices(compiled_surfaces(sys_), WVL)
    expected = close_on_reference_sphere(trace, valid, chief,
                                         center=center, P_xp=P_xp,
                                         n_image=n_image)
    np.testing.assert_array_equal(_np(wc.opd), _np(expected.opd))
    default = close_wavefront(sys_, trace, WVL, chief, P_xp=P_xp)
    assert not np.array_equal(_np(wc.opd), _np(default.opd))


def test_close_wavefront_field_tilt_ramp():
    sys_ = _doublet_system()
    fld = Field(0.0, 3.0)
    P, S, trace = _traced_bundle(sys_, fld)
    chief = _pupil_center_chief_index(P)
    on = close_wavefront(sys_, trace, WVL, chief, field=fld)
    off = close_wavefront(sys_, trace, WVL, chief, field=fld,
                          apply_field_tilt=False)
    valid = _np(on.valid)
    ax, ay = fld.angle_radians()
    ramp = (np.sin(ax) * (P[valid, 0] - P[chief, 0])
            + np.sin(ay) * (P[valid, 1] - P[chief, 1]))
    np.testing.assert_array_equal(_np(on.opd), _np(off.opd) + ramp)
    opd, _, _ = wavefront(sys_, P, S, WVL, field=fld, output='length')
    np.testing.assert_array_equal(_np(on.opd), _np(opd))


def test_close_wavefront_invalid_chief_errors():
    sys_ = _doublet_system()
    P, S, trace = _traced_bundle(sys_, Field(0.0, 0.0))
    chief = _pupil_center_chief_index(P)
    dead = np.zeros(P.shape[0], dtype=bool)
    with pytest.raises(ValueError, match='chief ray is invalid'):
        close_wavefront(sys_, trace, WVL, chief, valid=dead)
    with pytest.raises(ValueError, match='anchor ray'):
        close_wavefront(sys_, trace, WVL, chief, valid=dead,
                        reference='centroid')


def test_close_wavefront_off_axis_geometric_fallback():
    """An explicit parent axis resolves a decentered system geometrically.

    An off-axis parabola imaging collimated light to its parent focus
    has OPD identically zero; the centered-ABCD route is unavailable,
    and the closing must fall back to the chief-axis geometric route.
    """
    lens = (LensData()
            .add(Plane(), typ='eval', thickness=50.0)
            .add_coordbreak(decenter=(0.0, -30.0, 0.0))
            .add(Conic(-1.0 / 200.0, -1.0), typ='refl', thickness=100.0))
    sys_ = OpticalSystem(lens, aperture=16.0, fields=[0.0],
                         wavelengths=[WVL], reference=0, stop_index=2)
    fld = Field(0.0, 0.0)
    P, S = launch(sys_, fld, WVL, Sampling.rect(n=11))
    P_xp, mode = resolve_exit_pupil(
        sys_, WVL, axis_point=(0.0, 0.0, 0.0),
        axis_dir=(0.0, 0.0, 1.0), return_mode=True)
    assert mode == 'geometric'
    assert np.isfinite(np.asarray(P_xp)).all()
    opd, xp, yp = wavefront(sys_, np.asarray(P), np.asarray(S), WVL,
                            field=fld, P_xp=P_xp, output='length')
    assert np.nanmax(np.abs(_np(opd))) < 1e-9


# ---------- trace_context -----------------------------------------------------

def test_system_fills_wavelength_and_surfaces():
    sys_ = _doublet_system()
    ctx = trace_context(sys_)
    assert ctx.wavelength == pytest.approx(WVL)
    assert ctx.surfaces == sys_.to_surfaces()
    assert ctx.epd is None
    assert ctx.stop_index is None


def test_chief_fills_epd_and_stop():
    sys_ = _doublet_system()
    ctx = trace_context(sys_, chief=True)
    assert ctx.epd == pytest.approx(sys_.entrance_pupil_diameter(WVL))
    assert ctx.stop_index == sys_.stop_index


def test_explicit_scalars_win_over_system():
    sys_ = _doublet_system()
    ctx = trace_context(sys_, 0.5, chief=True, epd=3.0, stop_index=1)
    assert ctx.wavelength == 0.5
    assert ctx.epd == 3.0
    assert ctx.stop_index == 1


def test_media_match_meta_helpers():
    sys_ = _doublet_system()
    ctx = trace_context(sys_)
    n_object, n_image = object_image_indices(ctx.surfaces, ctx.wavelength)
    assert ctx.n_object == n_object
    assert ctx.n_image == n_image


def test_bare_sequence_requires_wavelength():
    surfaces = _doublet_system().to_surfaces()
    with pytest.raises(ValueError, match='wavelength'):
        trace_context(surfaces)


def test_bare_sequence_leaves_chief_scalars_as_passed():
    surfaces = _doublet_system().to_surfaces()
    ctx = trace_context(surfaces, WVL, chief=True)
    assert ctx.epd is None
    assert ctx.stop_index is None
    ctx = trace_context(surfaces, WVL, chief=True, epd=4.0, stop_index=2)
    assert ctx.epd == 4.0
    assert ctx.stop_index == 2


def test_n_image_lazy_raise_without_image_surface():
    # media resolve on access, so a truncated sequence is usable until then
    surfaces = _doublet_system().to_surfaces()[:-1]
    ctx = TraceContext(surfaces, WVL)
    assert ctx.n_object == 1.0
    with pytest.raises(ValueError, match='image-space index'):
        ctx.n_image


# ---------- Hopkins EIC closing -----------------------------------------------

def _sphere_root_opd(trace, C, R, n_image, chief):
    """Explicit reference-sphere OPD oracle (the t = -b - sqrt root)."""
    P_last = _np(trace.P)[-1]
    S_last = _np(trace.S)[-1]
    d = P_last - C
    b = np.sum(S_last * d, axis=-1)
    cc = np.sum(d * d, axis=-1) - R * R
    t = -b - np.sqrt(b * b - cc)
    total = _np(trace.OPL).sum(axis=0) + n_image * t
    return total - total[chief]


def test_closing_matches_reference_sphere_root_to_machine_precision():
    ld = _singlet()
    wvl = ld.wavelength()
    P, S = launch(ld, Field(0.0, 0.0, kind='angle'), wvl,
                  Sampling.fan(n=41, axis='y'), epd=ld.epd)
    trace = ld.trace(P, S, wvl)
    chief = np.asarray(P).shape[0] // 2
    C = _np(trace.P)[-1, chief]
    P_xp = np.asarray(ld.exit_pupil(wvl))
    R = float(np.sqrt(np.sum((P_xp - C) ** 2)))

    opd_oracle = _sphere_root_opd(trace, C, R, 1.0, chief)
    kappa = reference_sphere_curvature(P_xp, C)
    opd_eic = _np(hopkins_eic_closing(trace.P, trace.S, trace.OPL,
                                      center=C, curvature=kappa,
                                      n_image=1.0, chief_index=chief))
    # the rationalized form avoids the converging-beam cancellation, so
    # it is at least as accurate as the explicit root
    aac(opd_eic, opd_oracle, rtol=0.0, atol=1e-11)
    assert opd_eic[chief] == 0.0
    # undercorrected spherical: the edge focuses short, so W040 < 0
    assert opd_eic[-1] < 0.0


def test_closing_is_finite_and_signed_at_telecentric_kappa_zero():
    rig = _telecentric()
    wvl = rig.wavelength()
    # the exit pupil is genuinely at infinity
    assert ynu_first_order(rig.to_surfaces(), wvl, stop_index=1).xp_z \
        is None
    kappa = reference_sphere_curvature(None, np.zeros(3))
    assert kappa == 0.0

    tilted = Field(3.0, 0.0, kind='angle')
    P, S = launch(rig, tilted, wvl, Sampling.fan(n=31, axis='y'),
                  epd=rig.epd)
    trace = rig.trace(P, S, wvl)
    chief = np.asarray(P).shape[0] // 2
    C = _np(trace.P)[-1, chief]
    opd = _np(hopkins_eic_closing(trace.P, trace.S, trace.OPL,
                                  center=C, curvature=kappa,
                                  n_image=1.0, chief_index=chief))
    assert np.isfinite(opd).all()
    assert opd[chief] == 0.0
    assert float(np.ptp(opd)) > 0.0


def test_wavefront_rms_accepts_telecentric_paraxial_exit_pupil():
    rig = _telecentric()
    wvl = rig.wavelength()
    assert ynu_first_order(rig.to_surfaces(), wvl,
                           stop_index=1).xp_z is None
    head = WavefrontRMS(field=Field(3.0, 0.0, kind='angle'),
                        wavelength=wvl,
                        sampling=Sampling.fan(n=31, axis='y'))
    rms = head(rig, _TraceCache(rig))
    assert np.isfinite(rms) and rms > 0.0


def test_closing_kappa_zero_is_limit_of_small_curvature():
    """kappa=0 (telecentric) is the continuous limit of a tiny finite
    curvature, not a separate branch."""
    ld = _singlet()
    wvl = ld.wavelength()
    P, S = launch(ld, Field(0.0, 0.0, kind='angle'), wvl,
                  Sampling.fan(n=21, axis='y'), epd=ld.epd)
    trace = ld.trace(P, S, wvl)
    chief = np.asarray(P).shape[0] // 2
    C = _np(trace.P)[-1, chief]
    opd0 = _np(hopkins_eic_closing(trace.P, trace.S, trace.OPL, center=C,
                                   curvature=0.0, n_image=1.0,
                                   chief_index=chief))
    opd_eps = _np(hopkins_eic_closing(trace.P, trace.S, trace.OPL,
                                      center=C, curvature=1e-9,
                                      n_image=1.0, chief_index=chief))
    aac(opd_eps, opd0, rtol=0.0, atol=1e-9)


def test_closing_rejects_rays_that_miss_finite_reference_sphere():
    # the second ray runs parallel 2 mm off axis: it never meets a
    # unit-radius sphere about the origin
    hist_P = np.zeros((1, 2, 3))
    hist_P[0, 1, 0] = 2.0
    hist_S = np.broadcast_to(np.array([0., 0., 1.]), (1, 2, 3)).copy()
    with pytest.raises(ValueError, match='reference sphere'):
        hopkins_eic_closing(hist_P, hist_S, np.zeros((1, 2)),
                            center=np.zeros(3), curvature=1.0,
                            chief_index=0)


def test_reference_sphere_curvature():
    assert reference_sphere_curvature(None, np.zeros(3)) == 0.0
    image_pt = np.array([0.0, 0.0, 10.0])
    pupil_pt = np.array([0.0, 0.0, -52.0])
    assert reference_sphere_curvature(pupil_pt, image_pt) == \
        pytest.approx(1.0 / 62.0)
    with pytest.raises(ValueError, match='degenerate'):
        reference_sphere_curvature(image_pt, image_pt)


def test_eic_distance_matches_definition():
    draw = np.random.default_rng(0)
    ends = draw.normal(size=(4, 5, 3))
    P_a, P_b = ends[0], ends[1]
    d_a, d_b = (v / np.linalg.norm(v, axis=-1, keepdims=True)
                for v in (ends[2], ends[3]))
    by_def = (((d_a + d_b) * (P_a - P_b)).sum(-1)
              / (1.0 + (d_a * d_b).sum(-1)))
    aac(eic_distance(P_a, d_a, P_b, d_b), by_def, rtol=1e-14)
    # equal-direction limit: swapping the ends flips the sign
    aac(_np(eic_distance(P_a, d_a, P_b, d_a)),
        -_np(eic_distance(P_b, d_a, P_a, d_a)), rtol=1e-14)
