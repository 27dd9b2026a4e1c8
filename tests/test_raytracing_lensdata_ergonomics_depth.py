"""System-metadata defaulting ergonomics: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_lensdata_ergonomics.py (11 tests): analysis / launch /
paraxial default their metadata from an OpticalSystem when omitted,
and require explicit metadata for bare surface sequences.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
from prysm_tpu.x.raytracing import (
    FRAUNHOFER_LINES_UM, Field, LensData, OpticalSystem, Sampling, launch)
from prysm_tpu.x.raytracing.surfaces import Conic, Plane
from prysm_tpu.x.raytracing.paraxial import effective_focal_length
from prysm_tpu.x.raytracing.analysis import distortion, field_curvature


_n_bk7 = materials.ConstantMaterial(1.5168, name='N-BK7')

# toy dispersion so wavelength selection actually moves the answer
_dispersive = materials.FormulaMaterial('DISP', lambda wvl: 1.5 + 0.01 / wvl)


def _singlet(material=_n_bk7):
    lens = LensData()
    (lens.add(Conic(1 / 102.0, 0.0), thickness=6.0, material=material,
              aperture=12.0)
         .add(Conic(-1 / 102.0, 0.0), thickness=95.0,
              material=materials.air, aperture=12.0)
         .add(Plane(), typ='eval', material=materials.air, aperture=12.0))
    return OpticalSystem(lens, aperture=20.0, fields=[0, 1.0],
                         wavelengths=list(FRAUNHOFER_LINES_UM.values()),
                         reference=1, stop_index=0)


# ---------- system-level metadata resolution ----------------------------------

def test_system_wavelength_defaults_and_resolves():
    # wavelength resolution lives on OpticalSystem: None -> reference
    sys_ = _singlet()
    assert sys_.wavelength(None) == pytest.approx(sys_.reference_wavelength)
    assert sys_.wavelength(0.5) == pytest.approx(0.5)


def test_system_without_wavelengths_uses_kernel_default():
    # a system carrying no wavelengths resolves None to the kernel
    # default (0.6328); this default does not live in the free primitives
    lens = LensData().add(Conic(1 / 102.0, 0.0), thickness=6.0,
                          material=_n_bk7, aperture=12.0)
    sys_ = OpticalSystem(lens)
    assert sys_.wavelength(None) == pytest.approx(0.6328)
    assert sys_.wavelength(0.5) == pytest.approx(0.5)


def test_system_epd_and_stop_defaults():
    sys_ = _singlet()
    assert sys_.epd == pytest.approx(20.0)
    assert sys_.entrance_pupil_diameter(0.5) == pytest.approx(20.0)
    assert sys_.stop_index == 0


# ---------- paraxial ----------------------------------------------------------

def test_efl_defaults_wavelength_to_reference():
    # the system resolves None to the reference before calling the primitive
    sys_ = _singlet()
    assert sys_._ynu_first_order().efl == pytest.approx(
        effective_focal_length(sys_.to_surfaces(),
                               wvl=sys_.reference_wavelength))


def test_efl_resolves_wavelength_with_dispersion():
    sys_ = _singlet(material=_dispersive)
    surfaces = sys_.to_surfaces()
    f_val = FRAUNHOFER_LINES_UM['F']
    c_val = FRAUNHOFER_LINES_UM['C']
    # dispersion makes F differ from C
    assert (effective_focal_length(surfaces, wvl=f_val)
            != pytest.approx(effective_focal_length(surfaces, wvl=c_val)))


def test_first_order_defaults_wavelength_epd_stop():
    # the system resolves wvl/epd/stop and hands scalars to the primitive
    sys_ = _singlet()
    fo = sys_._ynu_first_order()
    assert fo.wavelength == pytest.approx(sys_.wavelength())
    assert fo.epd == pytest.approx(20.0)   # epd defaulted -> fno computed
    assert fo.fno is not None
    assert fo.stop_index == 0              # stop defaulted -> pupils computed


# ---------- launch ------------------------------------------------------------

def test_launch_defaults_epd_from_system():
    sys_ = _singlet()
    wvl = sys_.wavelength()
    P1, S1 = launch(sys_, sys_.field(0), wvl, Sampling.hex(nrings=2))
    P2, S2 = launch(sys_, sys_.field(0), wvl, Sampling.hex(nrings=2),
                    epd=sys_.epd)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P2))
    np.testing.assert_allclose(np.asarray(S1), np.asarray(S2))


def test_launch_surface_list_requires_epd():
    surfs = list(_singlet().surfaces)
    with pytest.raises(ValueError, match='entrance pupil'):
        launch(surfs, Field(0, 0), 0.55, Sampling.hex(nrings=2))


# ---------- analysis ----------------------------------------------------------

def test_distortion_defaults_epd_and_wavelength():
    sys_ = _singlet()
    fields = [Field(0, 0), Field(0, 1.0)]
    a = distortion(sys_, fields)
    b = distortion(sys_, fields, sys_.wavelength(), epd=sys_.epd)
    np.testing.assert_allclose(np.asarray(a.real_xy), np.asarray(b.real_xy))
    np.testing.assert_allclose(np.asarray(a.paraxial_xy),
                               np.asarray(b.paraxial_xy))
    np.testing.assert_allclose(np.asarray(a.percent), np.asarray(b.percent))


def test_field_curvature_defaults_wavelength():
    sys_ = _singlet()
    fields = [Field(0, 0), Field(0, 1.0)]
    a = field_curvature(sys_, fields)
    b = field_curvature(sys_, fields, sys_.wavelength())
    np.testing.assert_allclose(np.asarray(a.x_fan_z), np.asarray(b.x_fan_z))
    np.testing.assert_allclose(np.asarray(a.y_fan_z), np.asarray(b.y_fan_z))


def test_analysis_surface_list_without_epd_raises():
    surfs = list(_singlet().surfaces)
    with pytest.raises(TypeError, match='epd is required'):
        distortion(surfs, [Field(0, 0)], 0.55)
