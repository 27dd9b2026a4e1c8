"""Entrance-pupil routing depth: port of the reference routing suite.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_pupil_routing.py (25 tests): entrance-pupil location,
paraxial vs real ray aiming, the field-continuation ladder (wide-field
rescue, chief retention, best-effort semantics, drop_unaimed), stop
targets for decentered/anamorphic/shifted stops, and chief routing.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as pmat
from prysm_tpu.x.raytracing import (
    Field, LensData, OpticalSystem, Sampling, launch, raytrace)
from prysm_tpu.x.raytracing.surfaces import Conic, Plane, Toroid
from prysm_tpu.x.raytracing.aperture import circular_aperture
from prysm_tpu.x.raytracing.paraxial import (
    entrance_pupil_z, ynu_first_order)
from prysm_tpu.x.raytracing import analysis as pa
from prysm_tpu.x.raytracing.spencer_and_murty import (
    transform_to_local_coords)
from prysm_tpu.x.raytracing.opt import declipped
from prysm_tpu.x.raytracing.launch import (
    _StopTarget, _apply_vignetting, _collimated_PS, _entrance_pupil_z,
    _parabasal_ep_z, _real_aim_to_stop, _scaled_field)

WVL = 0.55
EPD = 10.0
STOP_INDEX = 4

# Cooke-triplet prescription: radii / gaps / indices, surface by surface
_COOKE_R = (22.01359, -435.76044, -22.21328, 20.29192, 79.68360,
            -18.39533)
_COOKE_T = (3.25896, 6.00755, 0.99997, 4.75041, 2.95208, 42.20778)
_COOKE_N = (1.62260856, 1.0, 1.62365512, 1.0, 1.62260856, 1.0)


def _np(x):
    return np.asarray(x)


def cooke():
    rows = LensData()
    for radius, gap, index in zip(_COOKE_R, _COOKE_T, _COOKE_N):
        glass = pmat.air if index == 1.0 else pmat.ConstantMaterial(index)
        rows.add(Conic(1.0 / radius, 0.0), thickness=gap, material=glass)
    return OpticalSystem(rows, aperture=EPD, fields=[0.0, 14.0, 20.0],
                         wavelengths=[WVL], reference=0,
                         stop_index=STOP_INDEX)


def biconvex_stop_first():
    rows = LensData()
    rows.add(Conic(1 / 50.0, 0.0), thickness=6.0,
             material=pmat.ConstantMaterial(1.5))
    rows.add(Conic(-1 / 50.0, 0.0), thickness=46.0, material=pmat.air)
    return OpticalSystem(rows, aperture=20.0, fields=[0.0, 10.0],
                         wavelengths=[WVL], reference=0, stop_index=1)


# ---------- entrance_pupil_z -------------------------------------------------

def test_entrance_pupil_z_matches_first_order():
    sys_ = cooke()
    surfaces = sys_.to_surfaces()
    ep = entrance_pupil_z(surfaces, wvl=WVL, stop_index=sys_.stop_index)
    assert ep == pytest.approx(
        ynu_first_order(surfaces, wvl=WVL, stop_index=sys_.stop_index).ep_z)


def test_entrance_pupil_z_none_without_stop():
    assert entrance_pupil_z(list(cooke().to_surfaces()), wvl=WVL) is None


def test_entrance_pupil_z_at_first_surface_when_stop_first():
    sys_ = biconvex_stop_first()
    assert entrance_pupil_z(sys_.to_surfaces(), wvl=WVL,
                            stop_index=sys_.stop_index) == \
        pytest.approx(0.0, abs=1e-9)


# ---------- paraxial vs real aiming ------------------------------------------

def _y_at_stop(sys_, field):
    P, S = launch(sys_, field, WVL, Sampling.fan(n=11, axis='y'))
    tr = sys_.trace(P, S, WVL)
    return _np(tr.P)[STOP_INDEX + 1, :, 1]


def test_real_aiming_lands_chief_on_stop_center():
    fld = Field(0.0, 20.0, unit='deg')
    chief_par = abs(_y_at_stop(cooke(), fld)[5])
    real_sys = cooke()
    real_sys.ray_aiming = 'real'
    chief_real = abs(_y_at_stop(real_sys, fld)[5])
    assert chief_par > 1e-4
    assert chief_real < 1e-9


def test_real_aiming_linearizes_pupil_to_stop_map():
    fld = Field(0.0, 20.0, unit='deg')
    rho = np.linspace(-1.0, 1.0, 11)
    real_sys = cooke()
    real_sys.ray_aiming = 'real'
    y_real = _y_at_stop(real_sys, fld)
    y_par = _y_at_stop(cooke(), fld)
    nz = rho != 0.0
    assert np.std(y_real[nz] / rho[nz]) < 1e-6
    assert np.std(y_par[nz] / rho[nz]) > 1e-3
    y_axial = _y_at_stop(real_sys, Field(0.0, 0.0, unit='deg'))
    np.testing.assert_allclose(y_real[-1] - y_real[0],
                               y_axial[-1] - y_axial[0], rtol=1e-6)
    assert y_real[-1] - y_real[0] > y_par[-1] - y_par[0]


def test_ray_aiming_paraxial_is_default():
    assert cooke().ray_aiming == 'paraxial'


# ---------- the field-continuation ladder ------------------------------------

_FISHEYE_STOP = 3


def fisheye(epd, ray_aiming='real'):
    n16 = pmat.ConstantMaterial(1.6)
    spec = ((1 / 40.0, 3.0, n16, 14.0), (1 / 9.0, 22.0, pmat.air, 9.0),
            (1 / 16.0, 4.0, n16, 6.0), (-1 / 16.0, 45.0, pmat.air, 6.0))
    rows = LensData()
    for c, gap, glass, ca in spec:
        rows.add(Conic(c, 0.0), thickness=gap, material=glass,
                 aperture=ca)
    wide = OpticalSystem(rows, aperture=epd, fields=[0.0],
                         wavelengths=[WVL], reference=0,
                         stop_index=_FISHEYE_STOP)
    wide.ray_aiming = ray_aiming
    return wide


def _axial_stop_target(sys_, epd):
    pupil_z = float(np.asarray(list(sys_.to_surfaces())[0].P)[2])
    half = epd / 2.0
    xy = np.array([[half, 0.0], [-half, 0.0], [0.0, half], [0.0, -half]])
    P, S = _collimated_PS(xy, pupil_z, Field(0.0, 0.0))
    surfs = sys_.to_surfaces()
    tr = raytrace(declipped(surfs[:_FISHEYE_STOP + 1]), _np(P), _np(S), WVL)
    loc = _np(tr.P)[-1, :, :2]
    pupil_map = np.stack([0.5 * (loc[0] - loc[1]),
                          0.5 * (loc[2] - loc[3])], axis=1)
    stop = surfs[_FISHEYE_STOP]
    center = np.asarray(stop.aperture.center())
    clip_r = stop.aperture.limiting_radius(None)
    edge_r = float(np.max(np.sqrt(np.sum(pupil_map * pupil_map, axis=0))))
    if clip_r is not None and clip_r < edge_r:
        pupil_map = np.eye(2) * clip_r * (1.0 - 1e-9)
    return _StopTarget(center, pupil_map)


def _primary_only(sys_, angle, epd, n=15):
    ep = _entrance_pupil_z(sys_, WVL)
    pupil_z = float(np.asarray(list(sys_.to_surfaces())[0].P)[2])
    fld = Field(0.0, float(angle), unit='deg')
    pupil_xy = np.asarray(_apply_vignetting(
        _np(Sampling.fan(n=n, axis='y').build(epd / 2)), fld), dtype=float)
    P, S = _collimated_PS(pupil_xy, pupil_z, fld)
    P, S = _np(P).copy(), _np(S)
    S0 = S[0]
    shift = (pupil_z - ep) / S0[2]
    P = P + np.stack([shift * S0[0], shift * S0[1], np.zeros_like(shift)])
    return _real_aim_to_stop(
        P, S, pupil_xy / (epd / 2), sys_, _FISHEYE_STOP, WVL, False,
        stop_goal=_axial_stop_target(sys_, epd))


def test_ladder_rescues_wide_field_marginals():
    epd, ang, n = 8.0, 55.0, 15
    sys_ = fisheye(epd)
    _, _, conv_primary = _primary_only(sys_, ang, epd, n=n)
    P, S = launch(sys_, Field(0.0, ang, unit='deg'), WVL,
                  Sampling.fan(n=n, axis='y'))
    aimed = int(np.isfinite(_np(S)).all(axis=1).sum())
    assert int(np.asarray(conv_primary).sum()) < 13
    assert aimed > int(np.asarray(conv_primary).sum())


def test_ladder_holds_chief_at_wide_field():
    sys_ = fisheye(6.0)
    P, S = launch(sys_, Field(0.0, 50.0, unit='deg'), WVL,
                  Sampling.fan(n=15, axis='y'))
    y = _np(sys_.trace(P, S, WVL).P)[_FISHEYE_STOP + 1, :, 1]
    assert abs(y[7]) < 1e-9


def test_adaptive_ladder_aims_chief_past_primary_field():
    epd, ang, n = 8.0, 64.0, 15
    sys_ = fisheye(epd)
    _, _, conv_primary = _primary_only(sys_, ang, epd, n=n)
    assert not bool(np.asarray(conv_primary)[n // 2])
    P, S = launch(sys_, Field(0.0, float(ang), unit='deg'), WVL,
                  Sampling.fan(n=n, axis='y'))
    assert np.isfinite(_np(S)[n // 2]).all()
    Phist = _np(raytrace(declipped(sys_.to_surfaces()), _np(P), _np(S),
                         WVL).P)
    assert abs(Phist[_FISHEYE_STOP + 1, n // 2, 1]) < 1e-7


def test_ladder_dormant_when_primary_converges():
    epd, ang, n = 4.0, 20.0, 15
    sys_ = fisheye(epd)
    Pp, Sp, conv = _primary_only(sys_, ang, epd, n=n)
    assert bool(np.all(np.asarray(conv)))
    P, S = launch(sys_, Field(0.0, ang, unit='deg'), WVL,
                  Sampling.fan(n=n, axis='y'))
    np.testing.assert_array_equal(_np(P), _np(Pp))
    np.testing.assert_array_equal(_np(S), _np(Sp))


def test_ladder_best_effort_never_raises():
    sys_ = fisheye(6.0)
    P, S = launch(sys_, Field(0.0, 70.0, unit='deg'), WVL,
                  Sampling.fan(n=15, axis='y'))
    assert _np(P).shape == (15, 3) and _np(S).shape == (15, 3)


def test_ladder_never_worse_than_primary():
    epd, n = 7.0, 15
    for ang in (44.0, 48.0, 52.0):
        sys_ = fisheye(epd)
        _, _, conv_primary = _primary_only(sys_, ang, epd, n=n)
        P, S = launch(sys_, Field(0.0, ang, unit='deg'), WVL,
                      Sampling.fan(n=n, axis='y'))
        aimed = int(np.isfinite(_np(S)).all(axis=1).sum())
        assert aimed >= int(np.asarray(conv_primary).sum())


def test_drop_unaimed_nans_only_directions():
    sys_ = fisheye(6.0)
    fld = Field(0.0, 72.0, unit='deg')
    samp = Sampling.fan(n=15, axis='y')
    P_be, S_be = launch(sys_, fld, WVL, samp, drop_unaimed=False)
    P_dr, S_dr = launch(sys_, fld, WVL, samp)
    P_be, S_be, P_dr, S_dr = (_np(a) for a in (P_be, S_be, P_dr, S_dr))
    unaimable = ~np.isfinite(S_dr).all(axis=1)
    assert unaimable.any() and not unaimable.all()
    assert np.isfinite(S_be).all()
    np.testing.assert_array_equal(P_be, P_dr)
    np.testing.assert_array_equal(S_dr[~unaimable], S_be[~unaimable])


def test_ray_fans_truncate_unaimable_rim():
    sys_ = fisheye(6.0)
    grid = pa.ray_aberration_fans(sys_, fields=[Field(0.0, 30.0,
                                                      unit='deg')],
                                  wavelengths=[WVL], nrays=15)
    yfan = _np(grid.y)[0, 0]
    assert np.isnan(yfan).any()
    finite_idx = np.flatnonzero(np.isfinite(yfan))
    assert finite_idx.size >= 12 and 7 in finite_idx
    assert np.array_equal(finite_idx,
                          np.arange(finite_idx[0], finite_idx[-1] + 1))


def test_scaled_field_scales_coordinates():
    h = _scaled_field(Field(3.0, -4.0, unit='deg'), 0.25)
    assert (h.hx, h.hy) == pytest.approx((0.75, -1.0))
    assert h.kind == 'angle' and h.unit == 'deg'


def test_parabasal_ep_z_is_field_dependent():
    sys_ = fisheye(6.0)
    ep_paraxial = _entrance_pupil_z(sys_, WVL)
    ep_wide = _parabasal_ep_z(sys_, Field(0.0, 50.0, unit='deg'), WVL)
    assert isinstance(ep_wide, float)
    assert abs(ep_wide - ep_paraxial) > 0.5


def test_real_aiming_applies_to_chief_only_sampling():
    real_sys = cooke()
    real_sys.ray_aiming = 'real'
    fld = Field(0.0, 20.0, unit='deg')
    P, S = launch(real_sys, fld, WVL, Sampling.chief())
    tr = raytrace(real_sys.to_surfaces(), _np(P), _np(S), WVL)
    assert abs(_np(tr.P)[STOP_INDEX + 1, 0, 1]) < 1e-9
    Pf, Sf = launch(real_sys, fld, WVL, Sampling.fan(n=11, axis='y'))
    trf = raytrace(real_sys.to_surfaces(), _np(Pf), _np(Sf), WVL)
    np.testing.assert_allclose(_np(tr.P)[-1, 0, :2],
                               _np(trf.P)[-1, 5, :2], atol=1e-9)


def test_real_aiming_targets_decentered_stop_local_center():
    dy = 1.0
    lens = LensData()
    rows = zip(_COOKE_R, _COOKE_T, _COOKE_N)
    for i, (radius, gap, index) in enumerate(rows):
        glass = pmat.air if index == 1.0 else pmat.ConstantMaterial(index)
        if i == 3:
            lens.add_coordbreak(decenter=(0.0, dy, 0.0), kind='basic')
        lens.add(Conic(1.0 / radius, 0.0), thickness=gap, material=glass)
        if i == 3:
            lens.add_coordbreak(decenter=(0.0, dy, 0.0), kind='rev')
    sys_ = OpticalSystem(lens, aperture=EPD, fields=[0.0],
                         wavelengths=[WVL], reference=0,
                         stop_index=STOP_INDEX)
    sys_.ray_aiming = 'real'
    surfs = sys_.to_surfaces()
    P, S = launch(sys_, Field(0.0, 0.0), WVL, Sampling.fan(n=11, axis='y'))
    tr = raytrace(surfs, _np(P), _np(S), WVL)
    stop = surfs[STOP_INDEX]
    loc, _ = transform_to_local_coords(_np(tr.P)[STOP_INDEX + 1], stop.P,
                                       _np(tr.S)[STOP_INDEX + 1], stop.R)
    loc = _np(loc)
    assert abs(loc[5, 1]) < 1e-9
    assert abs(_np(tr.P)[STOP_INDEX + 1, 5, 1] - dy) < 1e-9


def test_binding_stop_clip_bounds_the_pupil():
    epd = 8.0
    sys_ = fisheye(epd)
    P, S = launch(sys_, Field(0.0, 0.0), WVL, Sampling.fan(n=15, axis='y'))
    y = _np(sys_.trace(P, S, WVL).P)[_FISHEYE_STOP + 1, :, 1]
    assert np.isfinite(y).all()
    assert np.nanmax(np.abs(y)) == pytest.approx(6.0, rel=1e-6)


@pytest.mark.filterwarnings(
    'ignore:a surface departs from its conic seed steeply enough')
def test_real_aiming_preserves_anamorphic_pupil_map():
    from prysm_tpu.x.raytracing.launch import _STOP_RIM_XY
    lens = LensData()
    lens.add(Toroid(c_x=0.0, c_y=1 / 100.0, k_y=0.0, coefs_y=()),
             thickness=15.0, material=pmat.ConstantMaterial(1.5))
    lens.add(Plane(), thickness=30.0, material=pmat.air)
    sys_ = OpticalSystem(lens, aperture=EPD, fields=[0.0],
                         wavelengths=[WVL], reference=0, stop_index=2)
    points = Sampling.points(np.asarray(_STOP_RIM_XY))

    P0, S0 = launch(sys_, Field(0.0, 0.0), WVL, points)
    expected = _np(sys_.trace(P0, S0, WVL).P)[3, :, :2]
    assert not np.isclose(abs(expected[0, 0]), abs(expected[2, 1]))

    sys_.ray_aiming = 'real'
    P, S = launch(sys_, Field(0.0, 0.0), WVL, points)
    actual = _np(sys_.trace(P, S, WVL).P)[3, :, :2]
    np.testing.assert_allclose(actual, expected, atol=1e-9)


def test_real_aiming_uses_shifted_clip_center():
    sys_ = cooke()
    sys_.ray_aiming = 'real'
    stop = sys_.to_surfaces()[STOP_INDEX]
    stop.aperture = circular_aperture(0.2, x0=1.0, y0=-0.5)
    P, S = launch(sys_, Field(0.0, 0.0), WVL, Sampling.fan(n=5, axis='x'))
    tr = sys_.trace(P, S, WVL)
    assert np.isfinite(_np(tr.P)[-1]).all()
    loc, _ = transform_to_local_coords(_np(tr.P)[STOP_INDEX + 1], stop.P,
                                       _np(tr.S)[STOP_INDEX + 1], stop.R)
    loc = _np(loc)
    np.testing.assert_allclose(loc[:, 0], np.linspace(0.8, 1.2, 5),
                               atol=1e-9)
    np.testing.assert_allclose(loc[:, 1], -0.5, atol=1e-9)


# ---------- routing geometry -------------------------------------------------

def test_routed_chief_through_stop_center_paraxially():
    ld = cooke()
    P, S = launch(ld, Field(0.0, 1e-3, unit='deg'), WVL, Sampling.chief())
    tr = raytrace(ld.to_surfaces(), _np(P), _np(S), WVL)
    np.testing.assert_allclose(_np(tr.P)[STOP_INDEX + 1, 0, :2], 0.0,
                               atol=1e-5)


def test_routing_noop_for_stop_at_first_surface():
    ld = biconvex_stop_first()
    P, _ = launch(ld, Field(0.0, 10.0, unit='deg'), WVL, Sampling.chief())
    P = _np(P)
    np.testing.assert_allclose(P[0, :2], 0.0, atol=1e-12)
    np.testing.assert_allclose(P[0, 2], 0.0, atol=1e-12)
