"""Version-stamped first-order caches on OpticalSystem: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_system_caches.py (7 tests): first_order /
entrance_pupil_z / entrance_pupil_diameter caching keyed on the lens
edit version, launch and resolve_exit_pupil consulting those caches,
and dependency resolution not bumping the version.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
from prysm_tpu.x.raytracing import (
    ApertureSpec, Field, LensData, OpticalSystem, Sampling)
from prysm_tpu.x.raytracing import paraxial, parabasal, system as _system_mod
from prysm_tpu.x.raytracing.launch import launch
from prysm_tpu.x.raytracing.surfaces import Sphere
from prysm_tpu.x.raytracing.system import ApertureSpec as _ApertureSpec


def _doublet(aperture=None):
    lens = (LensData()
            .add(Sphere(1 / 61.47), thickness=6.0,
                 material=materials.ConstantMaterial(1.5168), aperture=12.0)
            .add(Sphere(-1 / 44.64), thickness=2.5,
                 material=materials.ConstantMaterial(1.673), aperture=12.0)
            .add(Sphere(-1 / 129.94), thickness=0.0,
                 material=materials.air, aperture=12.0))
    sys_ = OpticalSystem(
        lens, aperture=aperture or ApertureSpec.epd(22.0),
        fields=[Field(0, 0), Field(0, 0.7), Field(0, 1.0)],
        wavelengths=[0.486, 0.587, 0.656], reference=1, stop_index=1)
    sys_.solve.image_distance()
    return sys_


def _count_calls(monkeypatch, module, name):
    counter = {'n': 0}
    inner = getattr(module, name)

    def spy(*args, **kwargs):
        counter['n'] += 1
        return inner(*args, **kwargs)

    monkeypatch.setattr(module, name, spy)
    return counter


def test_first_order_cached_per_version_and_wavelength(monkeypatch):
    sys_ = _doublet()
    calls = _count_calls(monkeypatch, parabasal, 'first_order')
    fo1 = sys_.first_order(wavelength=0.587)
    fo2 = sys_.first_order(wavelength=0.587)
    assert calls['n'] == 1
    assert fo2 is fo1
    sys_.first_order(wavelength=0.486)
    assert calls['n'] == 2
    # a lens edit forces a recompute
    sys_.lens.rows[2].thickness = 2.6
    sys_.lens._invalidate()
    fo3 = sys_.first_order(wavelength=0.587)
    assert calls['n'] == 3
    assert fo3 is not fo1


def test_entrance_pupil_z_cached_and_correct(monkeypatch):
    sys_ = _doublet()
    direct = paraxial.entrance_pupil_z(sys_.to_surfaces(), 0.587,
                                       stop_index=sys_.stop_index)
    calls = _count_calls(monkeypatch, _system_mod, '_paraxial_ep_z')
    z1 = sys_.entrance_pupil_z(0.587)
    z2 = sys_.entrance_pupil_z(0.587)
    assert calls['n'] == 1
    assert z1 == z2 == direct
    sys_.lens.rows[2].thickness = 2.6
    sys_.lens._invalidate()
    sys_.entrance_pupil_z(0.587)
    assert calls['n'] == 2


def test_launch_consults_system_entrance_pupil_cache(monkeypatch):
    sys_ = _doublet()
    calls = _count_calls(monkeypatch, _system_mod, '_paraxial_ep_z')
    for f in sys_.fields:
        launch(sys_, f, 0.587, Sampling.hex(3))
    # one paraxial pupil solve across the field grid
    assert calls['n'] == 1


def test_launch_on_bare_lensdata_unchanged():
    # bare LensData has no stop metadata
    sys_ = _doublet()
    P_sys, S_sys = launch(sys_, Field(0, 0.7), 0.587, Sampling.hex(3))
    P_ld, S_ld = launch(sys_.lens, Field(0, 0.7), 0.587, Sampling.hex(3),
                        epd=22.0)
    assert np.allclose(np.asarray(S_ld), np.asarray(S_sys))
    assert np.asarray(P_ld).shape == np.asarray(P_sys).shape
    assert np.all(np.isfinite(np.asarray(P_ld)))


def test_dependency_resolution_does_not_bump_version():
    # solves/pickups during compile do not bump the edit version
    sys_ = _doublet()
    ld = sys_.lens
    ld._invalidate()  # force a cold compile with the image solve active
    v0 = ld._version
    ld.to_surfaces()
    assert ld._version == v0
    ld.to_surfaces()
    assert ld._version == v0


def test_entrance_pupil_diameter_cached_and_aperture_keyed(monkeypatch):
    sys_ = _doublet(aperture=ApertureSpec.fno(5.0))
    calls = _count_calls(monkeypatch, _ApertureSpec,
                         'entrance_pupil_diameter')
    d1 = sys_.epd
    d2 = sys_.epd
    assert calls['n'] == 1
    assert d1 == d2
    # aperture assignment changes the cache key
    sys_.aperture = ApertureSpec.fno(10.0)
    d3 = sys_.epd
    assert calls['n'] == 2
    assert d3 == pytest.approx(d1 / 2.0, rel=1e-12)


def test_resolve_exit_pupil_consults_system_first_order(monkeypatch):
    from prysm_tpu.x.raytracing.analysis import resolve_exit_pupil

    sys_ = _doublet()
    calls = _count_calls(monkeypatch, paraxial, 'ynu_first_order')
    p1 = resolve_exit_pupil(sys_, 0.587)
    p2 = resolve_exit_pupil(sys_, 0.587)
    assert calls['n'] == 1
    assert np.allclose(np.asarray(p1), np.asarray(p2))
