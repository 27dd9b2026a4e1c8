"""dOPD/dtau maps vs central FD of analysis.wavefront: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_diff_wavefront.py (6 tests): per-seed OPD tangents against
central differences of the composed trace->OPD pipeline, the chief
zero, waves-output scaling, nominal-path pinning against
analysis.wavefront, and a five-seed single-trace bundle.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
from prysm_tpu.x.raytracing.launch import Field
from prysm_tpu.x.raytracing._diff_raytrace import wavefront_with_tangents
from prysm_tpu.x.raytracing.adjoint.seeds import (
    seed_conic, seed_curvature, seed_decenter, seed_despace, seed_index,
    seed_tilt)
from prysm_tpu.x.raytracing.analysis import wavefront
from prysm_tpu.x.raytracing.surfaces import Conic, Plane, Surface

NG = 1.62
WVL = 0.55
BASE = dict(c0=1 / 40.0, k0=-0.6, c1=-1 / 55.0, k1=0.2, z0=0.0, z1=6.0,
            zimg=56.0, x1=0.0, y1=0.0, tiltx1=0.0, ng=NG)


def _np(x):
    return np.asarray(x)


def make_system(**overrides):
    """The common two-surface differential-test refractor."""
    params = dict(BASE, **overrides)
    glass = materials.ConstantMaterial(params['ng'])
    first = Surface(shape=Conic(params['c0'], params['k0']),
                    interaction='refr', P=[0, 0, params['z0']],
                    material=glass)
    second_kwargs = {}
    if params['tiltx1'] != 0.0:
        second_kwargs = dict(tilt=(0.0, 0.0, params['tiltx1']),
                             tilt_radians=True)
    second = Surface(shape=Conic(params['c1'], params['k1']),
                     interaction='refr',
                     P=[params['x1'], params['y1'], params['z1']],
                     material=materials.air, **second_kwargs)
    image = Surface(shape=Plane(), interaction='eval',
                    P=[0, 0, params['zimg']])
    return [first, second, image]


def ray_bundle():
    """The common tilted 5x5 pupil bundle."""
    ax, ay = 0.04, 0.06
    sx, sy = np.sin(ax), np.sin(ay)
    sz = np.sqrt(1.0 - sx * sx - sy * sy)
    samples = np.linspace(-7, 7, 5)
    xx, yy = np.meshgrid(samples, samples)
    pupil = np.stack([xx.ravel(), yy.ravel()], axis=-1)
    positions = np.empty((pupil.shape[0], 3))
    positions[:, :2] = pupil
    positions[:, 2] = -12.0
    directions = np.broadcast_to(np.array([sx, sy, sz]),
                                 positions.shape).copy()
    return positions, directions


def fd_opd(over_plus, over_minus, P, S, h, output='length'):
    opd_p, _, _ = wavefront(make_system(**over_plus), P, S, WVL,
                            output=output)
    opd_m, _, _ = wavefront(make_system(**over_minus), P, S, WVL,
                            output=output)
    return (_np(opd_p) - _np(opd_m)) / (2 * h)


# FD of the composed trace->OPD pipeline (moving reference sphere) is
# noisier than FD of the raw kernel, so atol reflects FD truncation
def check(seed, over_plus, over_minus, h, rtol=1e-5, atol=1e-7,
          output='length'):
    P, S = ray_bundle()
    opd, x, y, dW = wavefront_with_tangents(make_system(), P, S, WVL,
                                            [seed], output=output)
    dW_fd = fd_opd(over_plus, over_minus, P, S, h, output=output)
    np.testing.assert_allclose(_np(dW)[:, 0], dW_fd, rtol=rtol, atol=atol)


_H6, _H5 = 1e-6, 1e-5
_SEED_CASES = [
    ('curvature1', lambda: seed_curvature(1),
     dict(c1=BASE['c1'] + _H6), dict(c1=BASE['c1'] - _H6), _H6, {}),
    ('conic0', lambda: seed_conic(0),
     dict(k0=BASE['k0'] + _H5), dict(k0=BASE['k0'] - _H5), _H5, {}),
    ('thickness_fanout', lambda: seed_despace([(1, +1), (2, +1)]),
     dict(z1=BASE['z1'] + _H6, zimg=BASE['zimg'] + _H6),
     dict(z1=BASE['z1'] - _H6, zimg=BASE['zimg'] - _H6), _H6, {}),
    ('decenter1_x', lambda: seed_decenter(1, 'x'),
     dict(x1=_H6), dict(x1=-_H6), _H6, {}),
    ('tilt1_x', lambda: seed_tilt(1, 'x'),
     dict(tiltx1=_H6), dict(tiltx1=-_H6), _H6,
     dict(rtol=1e-4, atol=1e-7)),
]


@pytest.mark.parametrize('seed_fn, over_plus, over_minus, h, tols',
                         [c[1:] for c in _SEED_CASES],
                         ids=[c[0] for c in _SEED_CASES])
def test_seed_dW_matches_fd(seed_fn, over_plus, over_minus, h, tols):
    check(seed_fn(), over_plus, over_minus, h, **tols)


def test_chief_opd_tangent_is_zero():
    """The chief ray's OPD is identically 0, so dW there must vanish."""
    P, S = ray_bundle()
    center = np.mean(P[:, :2], axis=0)
    chief = int(np.argmin(np.sum((P[:, :2] - center) ** 2, axis=1)))
    _, _, _, dW = wavefront_with_tangents(
        make_system(), P, S, WVL,
        [seed_curvature(0), seed_conic(1), seed_decenter(1, 'y')])
    np.testing.assert_allclose(_np(dW)[chief], 0.0, atol=1e-12)


def test_waves_output_scales():
    h = 1e-6
    check(seed_curvature(0), dict(c0=BASE['c0'] + h),
          dict(c0=BASE['c0'] - h), h, output='waves', rtol=1e-5,
          atol=1e-6)


@pytest.mark.parametrize('output', ['length', 'waves'])
@pytest.mark.parametrize('field', [None, Field(2.0, 3.0)])
def test_nominal_opd_matches_analysis_wavefront(output, field):
    """The nominal opd of wavefront_with_tangents equals
    analysis.wavefront, pinning the shared exit-pupil route, ramp, and
    scaling so the differential model's W0 cannot silently desync."""
    P, S = ray_bundle()
    sys_ = make_system()
    opd_ref, x_ref, y_ref = wavefront(sys_, P, S, WVL, field=field,
                                      output=output)
    opd, x, y, _ = wavefront_with_tangents(sys_, P, S, WVL,
                                           [seed_curvature(0)],
                                           field=field, output=output)
    np.testing.assert_allclose(_np(opd), _np(opd_ref), rtol=0, atol=1e-12)
    np.testing.assert_allclose(_np(x), _np(x_ref), rtol=0, atol=1e-12)
    np.testing.assert_allclose(_np(y), _np(y_ref), rtol=0, atol=1e-12)


def test_all_seeds_one_trace():
    P, S = ray_bundle()
    seeds = [seed_curvature(0), seed_conic(1), seed_despace([(1, +1)]),
             seed_decenter(1, 'y'), seed_index(0)]
    _, _, _, dW = wavefront_with_tangents(make_system(), P, S, WVL, seeds)
    dW = _np(dW)
    assert dW.shape[1] == 5
    h = 1e-6
    overs = [
        (dict(c0=BASE['c0'] + h), dict(c0=BASE['c0'] - h)),
        (dict(k1=BASE['k1'] + h), dict(k1=BASE['k1'] - h)),
        (dict(z1=BASE['z1'] + h), dict(z1=BASE['z1'] - h)),
        (dict(y1=h), dict(y1=-h)),
        (dict(ng=NG + h), dict(ng=NG - h)),
    ]
    for p, (op, om) in enumerate(overs):
        dW_fd = fd_opd(op, om, P, S, h)
        np.testing.assert_allclose(dW[:, p], dW_fd, rtol=1e-5, atol=1e-7)
