"""Surface-irregularity tangents and Zernike sensitivity: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_diff_irregularity.py (11 tests): seed_irregularity OPD tangents
against finite differences of a Zernike-perturbed surface, output
scaling, chief-zero invariance, multi-seed traces, the partials
contract against a Zernike surface, Zernike-coefficient sensitivity
against FD refits, and irregularity as an extra-seed tolerance
column composing with compensators.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
import prysm_tpu.x.raytracing as rt
from prysm_tpu.x.raytracing import LensData, OpticalSystem
from prysm_tpu.x.raytracing.launch import Field, Sampling, launch
from prysm_tpu.x.raytracing.surfaces import Conic, Surface, Zernike
from prysm_tpu.x.raytracing.spencer_and_murty import _is_measurement_surf
from prysm_tpu.x.raytracing.paraxial import paraxial_image_distance
from prysm_tpu.x.raytracing.analysis import (
    wavefront, wavefront_zernike_fit)
from prysm_tpu.x.raytracing.sags import zernike_irregularity_partials
from prysm_tpu.x.raytracing._diff_raytrace import wavefront_with_tangents
from prysm_tpu.x.raytracing.adjoint.seeds import (
    seed_curvature, seed_irregularity)
from prysm_tpu.x.raytracing.tolerance import Perturbation
from prysm_tpu.x.raytracing.wavefront_differential import (
    WavefrontDifferential, wavefront_differential)

NG = 1.62
RN = 8.0
WVL = 0.55
C0, K0 = 1 / 40.0, -0.6


def _np(x):
    return np.asarray(x)


def make_system(irr=None):
    n_glass = materials.ConstantMaterial(NG)
    if irr is None:
        shape0 = rt.Conic(C0, K0)
    else:
        (n, m), amp = irr
        shape0 = Zernike(C0, K0, RN, [(n, m)], [amp])
    s0 = Surface(shape=shape0, interaction='refract', P=[0, 0, 0.0],
                 material=n_glass)
    s1 = Surface(shape=rt.Conic(-1 / 55.0, 0.2), interaction='refract',
                 P=[0, 0, 6.0], material=materials.air)
    img = Surface(shape=rt.Plane(), interaction='eval', P=[0, 0, 56.0])
    return [s0, s1, img]


def ray_bundle():
    ax, ay = 0.04, 0.06
    sx, sy = np.sin(ax), np.sin(ay)
    sz = np.sqrt(1.0 - sx * sx - sy * sy)
    samples = np.linspace(-7, 7, 5)
    xx, yy = np.meshgrid(samples, samples)
    P = np.empty((xx.size, 3))
    P[:, 0] = xx.ravel()
    P[:, 1] = yy.ravel()
    P[:, 2] = -12.0
    S = np.broadcast_to([sx, sy, sz], P.shape).copy()
    return P, S


# ---------- kernel level: dW vs FD -------------------------------------------

@pytest.mark.parametrize('mode', [(2, 2), (2, -2), (2, 0), (4, 0), (3, 1)])
def test_irregularity_dW_matches_fd(mode):
    P, S = ray_bundle()
    seed = seed_irregularity(0, mode[0], mode[1], RN)
    _, _, _, dW = wavefront_with_tangents(make_system(), P, S, WVL, [seed])
    h = 1e-6
    op, _, _ = wavefront(make_system((mode, +h)), P, S, WVL)
    om, _, _ = wavefront(make_system((mode, -h)), P, S, WVL)
    dW_fd = (_np(op) - _np(om)) / (2 * h)
    np.testing.assert_allclose(_np(dW)[:, 0], dW_fd, rtol=1e-5, atol=1e-7)


def test_irregularity_waves_output_scales():
    P, S = ray_bundle()
    mode = (2, 2)
    seed = seed_irregularity(0, *mode, RN)
    _, _, _, dW = wavefront_with_tangents(make_system(), P, S, WVL, [seed],
                                          output='waves')
    h = 1e-6
    op, _, _ = wavefront(make_system((mode, +h)), P, S, WVL, output='waves')
    om, _, _ = wavefront(make_system((mode, -h)), P, S, WVL, output='waves')
    np.testing.assert_allclose(_np(dW)[:, 0],
                               (_np(op) - _np(om)) / (2 * h),
                               rtol=1e-5, atol=1e-6)


def test_chief_irregularity_tangent_is_zero():
    P, S = ray_bundle()
    center = np.mean(P[:, :2], axis=0)
    chief = int(np.argmin(np.sum((P[:, :2] - center) ** 2, axis=1)))
    _, _, _, dW = wavefront_with_tangents(
        make_system(), P, S, WVL,
        [seed_irregularity(0, 2, 2, RN), seed_irregularity(1, 2, -2, RN)])
    np.testing.assert_allclose(_np(dW)[chief], 0.0, atol=1e-12)


def test_multiple_irregularity_seeds_one_trace():
    P, S = ray_bundle()
    seeds = [seed_irregularity(0, 2, 2, RN, name='CYN'),
             seed_irregularity(0, 2, -2, RN, name='CYD'),
             seed_curvature(1)]
    _, _, _, dW = wavefront_with_tangents(make_system(), P, S, WVL, seeds)
    dW = _np(dW)
    assert dW.shape[1] == 3
    h = 1e-6
    for p, mode in enumerate([(2, 2), (2, -2)]):
        op, _, _ = wavefront(make_system((mode, +h)), P, S, WVL)
        om, _, _ = wavefront(make_system((mode, -h)), P, S, WVL)
        np.testing.assert_allclose(dW[:, p], (_np(op) - _np(om)) / (2 * h),
                                   rtol=1e-5, atol=1e-7)


def test_irregularity_partials_match_zernike_surface():
    x = np.linspace(-6, 6, 9)
    y = np.linspace(-5, 5, 9)
    sag_t, gx_t, gy_t = zernike_irregularity_partials(2, 2, x, y, RN)
    shape = Zernike(0.0, 0.0, RN, [(2, 2)], [1.0])
    np.testing.assert_allclose(_np(sag_t), _np(shape.sag(x, y)),
                               rtol=1e-12, atol=1e-12)


# ---------- front-end: Zernike sensitivity -----------------------------------

_glass = materials.ConstantMaterial(1.6)
_air = materials.air


def singlet():
    lens = LensData()
    (lens.add(Conic(1 / 30.0, 0.0), typ='refr', thickness=4.0,
              material=_glass)
         .add(Conic(-1 / 30.0, 0.0), typ='refr', thickness=20.0,
              material=_air))
    sys_ = OpticalSystem(lens, aperture=10.0, wavelengths=[0.5])
    surfs = [s for s in sys_.to_surfaces()
             if not _is_measurement_surf(s.typ)]
    bfd = float(paraxial_image_distance(surfs, wvl=0.5))
    sys_.rows[2].thickness = bfd
    sys_.lens._invalidate()
    return sys_


def _bundle(sys_):
    P, S = launch(sys_, Field(2.5, 2.5), 0.5, Sampling.rect(n=7),
                  epd=10.0, pupil_z=-5.0)
    return np.asarray(P), np.asarray(S)


def _perts(sys_):
    return [
        Perturbation.normal(sys_, 'curvature', 1, 1e-5, name='c1'),
        Perturbation.normal(sys_, 'conic', 1, 1e-4, name='k1'),
        Perturbation.normal(sys_, 'thickness', 1, 5e-4, name='t0'),
    ]


NMS = [(2, 0), (2, 2), (2, -2), (3, 1), (3, -1), (4, 0)]


def test_zernike_sensitivity_nominal_matches_direct_fit():
    sys_ = singlet()
    P, S = _bundle(sys_)
    wd = wavefront_differential(sys_, _perts(sys_), P, S, 0.5)
    R = float(np.sqrt(np.max(wd.x_pupil ** 2 + wd.y_pupil ** 2)))
    nom, _ = wd.zernike_sensitivity(NMS, normalization_radius=R)
    direct, _ = wavefront_zernike_fit(wd.W0, wd.x_pupil, wd.y_pupil, NMS,
                                      normalization_radius=R)
    np.testing.assert_allclose(nom, direct, rtol=1e-12, atol=1e-14)


def test_zernike_sensitivity_matches_fd():
    sys_ = singlet()
    P, S = _bundle(sys_)
    perts = _perts(sys_)
    wd = wavefront_differential(sys_, perts, P, S, 0.5)
    R = float(np.sqrt(np.max(wd.x_pupil ** 2 + wd.y_pupil ** 2)))
    _, dc = wd.zernike_sensitivity(NMS, normalization_radius=R)

    def fit_perturbed(pert, T):
        try:
            pert.set(pert.nominal + T)
            opd, x, y = wavefront(sys_, P, S, 0.5, output='length')
            c, _ = wavefront_zernike_fit(opd, x, y, NMS,
                                         normalization_radius=R)
        finally:
            pert.reset()
        return np.asarray(c)

    for p, pert in enumerate(perts):
        h = pert.step
        dc_fd = (fit_perturbed(pert, +h) - fit_perturbed(pert, -h)) / (2 * h)
        np.testing.assert_allclose(dc[:, p], dc_fd, rtol=1e-4, atol=1e-7)


def test_zernike_sensitivity_requires_pupil_coords():
    wd = WavefrontDifferential(np.zeros(5), np.zeros((5, 1)))
    with pytest.raises(ValueError, match='pupil coordinates'):
        wd.zernike_sensitivity([(2, 0)])


# ---------- extra-seed tolerance columns -------------------------------------

def test_extra_seeds_irregularity_tolerance_column():
    sys_ = singlet()
    P, S = _bundle(sys_)
    perts = [Perturbation.normal(sys_, 'curvature', 1, 1e-5, name='c1')]
    irr = [seed_irregularity(1, 2, 2, 5.0, name='CYN'),
           seed_irregularity(2, 2, -2, 5.0, name='CYD')]
    wd = wavefront_differential(sys_, perts, P, S, 0.5, extra_seeds=irr,
                                extra_steps=[0.1, 0.1])
    assert wd.n_params == 3
    assert wd.names == ['c1', 'CYN', 'CYD']
    assert wd.A[1] > 0 and wd.A[2] > 0
    rows = wd.rows()
    assert rows[1]['scale'] == 0.1 and rows[2]['scale'] == 0.1


def test_extra_seeds_column_equals_standalone_seed():
    sys_ = singlet()
    P, S = _bundle(sys_)
    perts = [Perturbation.normal(sys_, 'curvature', 1, 1e-5, name='c1')]
    irr = seed_irregularity(1, 2, 2, 5.0, name='CYN')
    wd = wavefront_differential(sys_, perts, P, S, 0.5, extra_seeds=[irr])
    _, _, _, dW = wavefront_with_tangents(sys_.to_surfaces(), P, S, 0.5,
                                          [irr])
    np.testing.assert_allclose(wd.dW[:, 1], _np(dW)[:, 0], rtol=1e-10,
                               atol=1e-12)


def test_extra_seeds_compose_with_compensators():
    sys_ = singlet()
    P, S = _bundle(sys_)
    perts = [Perturbation.normal(sys_, 'curvature', 1, 1e-5, name='c1')]
    irr = [seed_irregularity(1, 2, 2, 5.0, name='CYN')]
    comp = [Perturbation.normal(sys_, 'thickness', 2, 1e-3, name='focus')]
    wd = wavefront_differential(sys_, perts, P, S, 0.5, extra_seeds=irr,
                                compensators=comp)
    assert wd.is_compensated
    assert wd.n_params == 2
    assert wd.compensator_motions().shape == (1, 2)
