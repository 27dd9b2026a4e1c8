"""Analysis + parabasal parity vs prysm.x.raytracing."""
import sys
import types

import numpy as onp
import pytest

import jax  # NOQA: F401

for _name, _attrs in (
        ('prysm.x.raytracing._first_order',
         {'initialize_slots': lambda obj: [setattr(obj, n, None)
                                           for n in type(obj).__slots__],
          'format_first_order':
              lambda obj, cls, **kw: cls}),
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

WVL = 0.5876


def _system(rt_mod, mat_mod):
    bk7 = mat_mod.model_glass(1.5168, 64.17, name='BK7')
    sf5 = mat_mod.model_glass(1.6727, 32.2, name='SF5')
    lens = rt_mod.LensData()
    lens.add(rt_mod.Sphere(1 / 62.0), thickness=6.0, material=bk7)
    lens.add(rt_mod.Sphere(-1 / 45.0), thickness=3.0, material=sf5)
    lens.add(rt_mod.Sphere(-1 / 128.0), thickness=95.612987,
             material=mat_mod.air)
    return rt_mod.OpticalSystem(
        lens, aperture=rt_mod.ApertureSpec.epd(20.0),
        fields=[0.0, 2.0], wavelengths=[0.4861, 0.5876, 0.6563],
        reference=1, stop_index=1)


@pytest.fixture(scope='module')
def systems():
    return _system(rt, mat), _system(ref_rt, ref_mat)


def test_parabasal_first_order_matches_reference(systems):
    mine, ref = systems
    fm = rt.first_order(mine, field=0)
    fr = ref_rt.first_order(ref, field=0)
    assert fm.backend == fr.backend == 'parabasal'
    for name in ('efl', 'bfl', 'ffl', 'paraxial_image_z', 'ep_z', 'xp_z',
                 'fno', 'na_image', 'stop_diameter', 'xp_diameter'):
        got = getattr(fm, name)
        want = getattr(fr, name)
        if want is None:
            assert got is None, name
            continue
        onp.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9,
                                    err_msg=name)
    # the 4x4 chief-frame ABCD map itself
    onp.testing.assert_allclose(fm.abcd, fr.abcd, atol=1e-9)


def test_parabasal_off_axis_matches_reference(systems):
    mine, ref = systems
    fm = rt.first_order(mine, field=1, force_sym=False)
    fr = ref_rt.first_order(ref, field=1, force_sym=False)
    for name in ('efl', 'paraxial_image_z'):
        onp.testing.assert_allclose(getattr(fm, name), getattr(fr, name),
                                    rtol=1e-8, err_msg=name)


def test_parabasal_foci_match_reference(systems):
    mine, ref = systems
    for f in (0, 1):
        zm = rt.parabasal_foci(mine, mine.field(f), WVL)
        zr = ref_rt.parabasal_foci(ref, ref.field(f), WVL)
        onp.testing.assert_allclose(zm, zr, rtol=1e-9)


def test_wavefront_matches_reference(systems):
    mine, ref = systems
    P, S = rt.launch(mine, mine.field(1), WVL, rt.Sampling.hex(5))
    opd_m, xm, ym = rt.wavefront(mine, onp.asarray(P), onp.asarray(S), WVL,
                                 output='waves', field=mine.field(1))
    opd_r, xr, yr = ref_rt.wavefront(ref, onp.asarray(P), onp.asarray(S),
                                     WVL, output='waves', field=ref.field(1))
    onp.testing.assert_allclose(onp.asarray(opd_m), onp.asarray(opd_r),
                                atol=1e-8)
    onp.testing.assert_allclose(xm, xr, atol=1e-12)
    onp.testing.assert_allclose(ym, yr, atol=1e-12)


def test_wavefront_zernike_fit_matches_reference(systems):
    mine, ref = systems
    P, S = rt.launch(mine, mine.field(0), WVL, rt.Sampling.hex(7))
    opd, xp_, yp_ = rt.wavefront(mine, onp.asarray(P), onp.asarray(S), WVL,
                                 output='waves')
    nms = [(1, 1), (1, -1), (2, 0), (4, 0)]
    cm, rm = rt.wavefront_zernike_fit(opd, xp_, yp_, nms)
    cr, rr = ref_rt.wavefront_zernike_fit(onp.asarray(opd), onp.asarray(xp_),
                                          onp.asarray(yp_), nms)
    onp.testing.assert_allclose(onp.asarray(cm), onp.asarray(cr), atol=1e-9)
    assert rm == pytest.approx(rr, abs=1e-9)


def test_spot_diagrams_match_reference(systems):
    mine, ref = systems
    sm = rt.spot_diagrams(mine, sampling=rt.Sampling.hex(4))
    sr = ref_rt.spot_diagrams(ref, sampling=ref_rt.Sampling.hex(4))
    onp.testing.assert_allclose(onp.asarray(sm.x), onp.asarray(sr.x),
                                atol=1e-10, equal_nan=True)
    onp.testing.assert_allclose(onp.asarray(sm.y), onp.asarray(sr.y),
                                atol=1e-10, equal_nan=True)
    onp.testing.assert_allclose(rt.spot_rms_radius(sm),
                                ref_rt.spot_rms_radius(sr), atol=1e-10)
    onp.testing.assert_allclose(rt.spot_geometric_radius(sm),
                                ref_rt.spot_geometric_radius(sr), atol=1e-10)


def test_fans_match_reference(systems):
    mine, ref = systems
    fm = rt.ray_aberration_fans(mine, nrays=7)
    fr = ref_rt.ray_aberration_fans(ref, nrays=7)
    onp.testing.assert_allclose(fm.x, fr.x, atol=1e-10, equal_nan=True)
    onp.testing.assert_allclose(fm.y, fr.y, atol=1e-10, equal_nan=True)
    om = rt.opd_fans(mine, nrays=7)
    orr = ref_rt.opd_fans(ref, nrays=7)
    onp.testing.assert_allclose(om.y, orr.y, atol=1e-7, equal_nan=True)


def test_distortion_matches_reference(systems):
    mine, ref = systems
    dm = rt.distortion(mine, samples=7)
    dr = ref_rt.distortion(ref, samples=7)
    onp.testing.assert_allclose(dm.percent, dr.percent, atol=1e-9)
    onp.testing.assert_allclose(dm.real_xy, dr.real_xy, atol=1e-10)


def test_lateral_color_and_chromatic_shift_match_reference(systems):
    mine, ref = systems
    lm = rt.lateral_color(mine, samples=5)
    lr = ref_rt.lateral_color(ref, samples=5)
    onp.testing.assert_allclose(lm, lr, atol=1e-10)
    wm, sm = rt.chromatic_focal_shift(mine, samples=5)
    wr, sr = ref_rt.chromatic_focal_shift(ref, samples=5)
    onp.testing.assert_allclose(wm, wr, atol=1e-12)
    onp.testing.assert_allclose(sm, sr, atol=1e-8)


def test_field_curvature_matches_reference(systems):
    mine, ref = systems
    fm = rt.field_curvature(mine, samples=5)
    fr = ref_rt.field_curvature(ref, samples=5)
    onp.testing.assert_allclose(fm.x_fan_z, fr.x_fan_z, rtol=1e-9)
    onp.testing.assert_allclose(fm.y_fan_z, fr.y_fan_z, rtol=1e-9)
    assert fm.labels == fr.labels == ('S', 'T')


def test_full_field_matches_reference(systems):
    mine, ref = systems
    fm = rt.full_field(mine, metric='rms spot', samples=5)
    fr = ref_rt.full_field(ref, metric='rms spot', samples=5)
    onp.testing.assert_allclose(fm.data, fr.data, atol=1e-10,
                                equal_nan=True)
    with pytest.raises(ValueError):
        rt.full_field(mine, metric='bogus')


def test_transverse_ray_aberration_and_exit_pupil(systems):
    mine, ref = systems
    P, S = rt.launch(mine, mine.field(1), WVL, rt.Sampling.fan(n=7))
    trm = mine.trace(onp.asarray(P), onp.asarray(S), WVL)
    trr = ref.trace(onp.asarray(P), onp.asarray(S), WVL)
    pm, dm = rt.transverse_ray_aberration(onp.asarray(trm.P), 'y',
                                          status=onp.asarray(trm.status))
    pr, dr = ref_rt.transverse_ray_aberration(onp.asarray(trr.P), 'y',
                                              status=onp.asarray(trr.status))
    onp.testing.assert_allclose(pm, pr, atol=1e-12)
    onp.testing.assert_allclose(dm, dr, atol=1e-10)
    xm = rt.resolve_exit_pupil(mine, WVL)
    xr = ref_rt.analysis.resolve_exit_pupil(ref, WVL)
    onp.testing.assert_allclose(onp.asarray(xm), onp.asarray(xr),
                                atol=1e-10)
