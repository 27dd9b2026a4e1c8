"""Compensator projection vs FD re-optimization: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_diff_compensators.py (9 tests): projected maps orthogonal to the
compensator span, the compensate helper, empty-compensator identity,
compensated nominal RMS matching a Gauss-Newton re-optimized focus,
compensated sensitivities and compensator motions against FD
re-optimization.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
from prysm_tpu.x.raytracing import LensData, OpticalSystem
from prysm_tpu.x.raytracing.launch import Field, Sampling, launch
from prysm_tpu.x.raytracing.surfaces import Conic
from prysm_tpu.x.raytracing.spencer_and_murty import _is_measurement_surf
from prysm_tpu.x.raytracing.paraxial import paraxial_image_distance
from prysm_tpu.x.raytracing.tolerance import Perturbation
from prysm_tpu.x.raytracing.wavefront_differential import (
    compensate, project_out, wavefront_differential)
from prysm_tpu.x.raytracing.analysis import wavefront

WVL = 0.5
EPD = 5.0
FLD = Field(0.8, 0.0)
DEFOCUS = 0.2
_glass = materials.ConstantMaterial(1.6)
_air = materials.air


def singlet():
    lens = LensData()
    (lens.add(Conic(1 / 24.0, 0.0), typ='refr', thickness=5.0,
              material=_glass)
         .add(Conic(-1 / 80.0, 0.0), typ='refr', thickness=20.0,
              material=_air))
    sys_ = OpticalSystem(lens, aperture=EPD, wavelengths=[WVL])
    surfs = [s for s in sys_.to_surfaces()
             if not _is_measurement_surf(s.typ)]
    bfd = float(paraxial_image_distance(surfs, wvl=WVL))
    sys_.rows[2].thickness = bfd + DEFOCUS
    sys_.lens._invalidate()
    return sys_


def bundle(sys_):
    P, S = launch(sys_, FLD, WVL, Sampling.rect(n=9), epd=EPD, pupil_z=-5.0)
    return np.asarray(P), np.asarray(S)


def focus_compensator(sys_):
    return Perturbation.normal(sys_, 'thickness', 2, 1e-3, name='focus')


def wd(sys_, tols, P, S, comps=None):
    return wavefront_differential(sys_, tols, P, S, WVL, field=FLD,
                                  compensators=comps)


def reoptimize_rms(sys_, comps, P, S, n_iter=12):
    comps = list(comps)
    c = np.array([cp.nominal for cp in comps], dtype=float)

    def opd_at(cvals):
        for cp, v in zip(comps, cvals):
            cp.set(float(v))
        opd, _, _ = wavefront(sys_.to_surfaces(), P, S, WVL, field=FLD)
        return np.asarray(opd)

    try:
        for _ in range(n_iter):
            r = opd_at(c)
            J = np.empty((r.size, len(comps)))
            for i in range(len(comps)):
                h = 1e-4 * max(1.0, abs(c[i]))
                cp_, cm_ = c.copy(), c.copy()
                cp_[i] += h
                cm_[i] -= h
                J[:, i] = (opd_at(cp_) - opd_at(cm_)) / (2 * h)
            dc = -np.linalg.lstsq(J, r, rcond=None)[0]
            c = c + dc
            if np.max(np.abs(dc)) < 1e-13:
                break
        r = opd_at(c)
        rms = float(np.sqrt(np.mean(r * r)))
    finally:
        for cp in comps:
            cp.reset()
    return rms, c


def fd_compensated_sensitivity(sys_, tol, comps, P, S):
    h = tol.step
    try:
        tol.set(tol.nominal + h)
        rms_p, c_p = reoptimize_rms(sys_, comps, P, S)
        tol.set(tol.nominal - h)
        rms_m, c_m = reoptimize_rms(sys_, comps, P, S)
    finally:
        tol.reset()
    return (rms_p - rms_m) / (2 * h), (c_p - c_m) / (2 * h)


# ---------- projection mechanics ---------------------------------------------

def test_projected_maps_orthogonal_to_compensators():
    sys_ = singlet()
    P, S = bundle(sys_)
    tols = [Perturbation.normal(sys_, 'curvature', 1, 1e-5, name='c1'),
            Perturbation.normal(sys_, 'conic', 1, 1e-4, name='k1')]
    m = wd(sys_, tols, P, S, comps=[focus_compensator(sys_)])
    assert m.is_compensated
    M = m.comp_maps
    np.testing.assert_allclose(M.T @ m.W0, 0.0, atol=1e-9)
    np.testing.assert_allclose(M.T @ m.dW, 0.0, atol=1e-9)


def test_compensate_helper_matches_manual_projection():
    rng = np.random.default_rng(0)
    opd = rng.normal(size=40)
    D = rng.normal(size=(40, 3))
    M = rng.normal(size=(40, 2))
    opd_c, D_c, basis = compensate(opd, D, M)
    np.testing.assert_allclose(M.T @ opd_c, 0.0, atol=1e-12)
    np.testing.assert_allclose(D_c, project_out(D, basis), rtol=0, atol=0)


def test_empty_compensators_matches_uncompensated():
    sys_ = singlet()
    P, S = bundle(sys_)
    tols = [Perturbation.normal(sys_, 'curvature', 1, 1e-5, name='c1')]
    m0 = wd(sys_, tols, P, S)
    m1 = wd(sys_, tols, P, S, comps=[])
    assert not m0.is_compensated and not m1.is_compensated
    np.testing.assert_allclose(m0.W0, m1.W0)
    np.testing.assert_allclose(m0.dW, m1.dW)


# ---------- compensated RMS vs FD re-optimization ----------------------------

def test_compensated_nominal_rms_matches_reoptimized_focus():
    sys_ = singlet()
    P, S = bundle(sys_)
    tols = [Perturbation.normal(sys_, 'curvature', 1, 1e-5, name='c1')]
    comp = focus_compensator(sys_)
    m = wd(sys_, tols, P, S, comps=[comp])
    rms_fd, _ = reoptimize_rms(sys_, [comp], P, S)
    np.testing.assert_allclose(m.rms_nominal, rms_fd, rtol=1e-2)


def test_compensation_substantially_lowers_nominal_rms():
    sys_ = singlet()
    P, S = bundle(sys_)
    tols = [Perturbation.normal(sys_, 'curvature', 1, 1e-5, name='c1')]
    m_un = wd(sys_, tols, P, S)
    m_co = wd(sys_, tols, P, S, comps=[focus_compensator(sys_)])
    assert m_co.rms_nominal <= m_un.rms_nominal + 1e-12
    assert m_co.rms_nominal < 0.5 * m_un.rms_nominal


def test_compensated_sensitivity_matches_fd_reoptimization():
    sys_ = singlet()
    P, S = bundle(sys_)
    tol = Perturbation.normal(sys_, 'curvature', 1, 1e-6, name='c1')
    comp = focus_compensator(sys_)
    m = wd(sys_, [tol], P, S, comps=[comp])
    fd_sens, _ = fd_compensated_sensitivity(sys_, tol, [comp], P, S)
    np.testing.assert_allclose(m.sensitivity()[0], fd_sens, rtol=2e-2,
                               atol=1e-9)


def test_compensator_motions_match_fd():
    sys_ = singlet()
    P, S = bundle(sys_)
    tol = Perturbation.normal(sys_, 'curvature', 1, 1e-6, name='c1')
    comp = focus_compensator(sys_)
    m = wd(sys_, [tol], P, S, comps=[comp])
    motions = m.compensator_motions()
    assert motions.shape == (1, 1)
    assert abs(motions[0, 0]) > 1e-6
    _, dc_fd = fd_compensated_sensitivity(sys_, tol, [comp], P, S)
    np.testing.assert_allclose(motions[0, 0], dc_fd[0], rtol=3e-2)


def test_compensator_motions_without_compensators_raises():
    sys_ = singlet()
    P, S = bundle(sys_)
    m = wd(sys_, [Perturbation.normal(sys_, 'curvature', 1, 1e-6,
                                      name='c1')], P, S)
    with pytest.raises(ValueError, match='no compensators'):
        m.compensator_motions()


def test_compensated_sensitivity_below_uncompensated_for_focus_tol():
    sys_ = singlet()
    P, S = bundle(sys_)
    tol = Perturbation.normal(sys_, 'thickness', 1, 1e-4, name='t0')
    comp = focus_compensator(sys_)
    m_un = wd(sys_, [tol], P, S)
    m_co = wd(sys_, [tol], P, S, comps=[comp])
    assert abs(m_co.sensitivity()[0]) < abs(m_un.sensitivity()[0])
    fd_sens, _ = fd_compensated_sensitivity(sys_, tol, [comp], P, S)
    np.testing.assert_allclose(m_co.sensitivity()[0], fd_sens, rtol=3e-2,
                               atol=1e-9)
