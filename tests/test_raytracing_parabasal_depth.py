"""Parabasal (firABCD-style) first order: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_parabasal.py (25 tests): the meridional T/S basis,
launch tangent seeds vs finite differences, parity with the YNU walk
on singlets/mirrors/finite conjugates, symmetric collapse, repr,
field-index authority, decentered geometry where YNU cannot go, T/S
focus splitting, the YNU fallback for clipped chiefs, parabasal_foci,
and launch aiming warnings.
"""
import warnings

import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
from prysm_tpu.x.raytracing import (
    Field, LensData, OpticalSystem, Sampling, launch, raytrace)
from prysm_tpu.x.raytracing.surfaces import Conic, Plane, Sphere
from prysm_tpu.x.raytracing.launch import _perp_basis
from prysm_tpu.x.raytracing.paraxial import ynu_first_order
from prysm_tpu.x.raytracing.parabasal import (
    _PAIR_SLOTS, ParabasalFirstOrder, first_order, parabasal_foci)
from prysm_tpu.x.raytracing._diff_raytrace import (
    DiffSeed, raytrace_with_tangents)


def _np(x):
    return np.asarray(x)


def aac(actual, desired, **kw):
    np.testing.assert_allclose(np.asarray(actual, dtype=float), desired,
                               **kw)


# ---------- builders ----------------------------------------------------------

N152 = materials.ConstantMaterial(1.52)


def _compile_rows(rows, **sys_kw):
    """Row-table builder: each row is (positional_args, kwargs)."""
    spine = LensData()
    for args, kw in rows:
        if args == 'break':
            spine.add_coordbreak(**kw)
        else:
            spine.add(*args, **kw)
    sys_kw.setdefault('wavelengths', [0.55])
    return OpticalSystem(spine, **sys_kw)


def _singlet_system(aperture_radius=None):
    front_ca = 12 if aperture_radius is None else aperture_radius
    return _compile_rows([
        ((Sphere(1 / 100.0),), dict(thickness=4, material=N152,
                                    aperture=front_ca)),
        ((Sphere(-1 / 100.0),), dict(thickness=92, material=materials.air,
                                     aperture=12)),
        ((Plane(),), dict(typ='eval', aperture=30)),
    ], stop_index=1)


def _parabola_system():
    return _compile_rows([
        ((Conic(-1 / 400.0, -1.0),), dict(thickness=-200, typ='refl',
                                          aperture=30)),
        ((Plane(),), dict(typ='eval', aperture=5)),
    ], stop_index=0)


def _two_mirror_system():
    return _compile_rows([
        ((Conic(-1 / 400.0, -1.0),), dict(thickness=-80, typ='refl',
                                          aperture=30)),
        ((Conic(-1 / 150.0, -3.0),), dict(thickness=200, typ='refl',
                                          aperture=8)),
        ((Plane(),), dict(typ='eval', aperture=5)),
    ], stop_index=0)


def _finite_conjugate_system():
    return _compile_rows([
        ((Plane(),), dict(thickness=300, typ='eval', aperture=1)),
        ((Sphere(1 / 100.0),), dict(thickness=4, material=N152,
                                    aperture=12)),
        ((Sphere(-1 / 100.0),), dict(thickness=140,
                                     material=materials.air,
                                     aperture=12)),
        ((Plane(),), dict(typ='eval', aperture=30)),
    ], stop_index=2, fields=[Field(0, 0, kind='height', object_z=0.0)])


def _decentered_singlet_system(dy=0.4):
    return _compile_rows([
        ((Sphere(1 / 100.0),), dict(thickness=4, material=N152,
                                    aperture=12)),
        ('break', dict(decenter=(0.0, dy, 0.0))),
        ((Sphere(-1 / 100.0),), dict(thickness=92,
                                     material=materials.air,
                                     aperture=12)),
        ((Plane(),), dict(typ='eval', aperture=30)),
    ], stop_index=1)


def _assert_pairs_match_ynu(fo_p, fo_y, rtol=1e-9, skip=()):
    assert fo_p.backend == 'parabasal'
    checked = [s for s in _PAIR_SLOTS if s not in skip]
    scalar = {s: getattr(fo_y, s) for s in checked}
    pair = {s: getattr(fo_p, s) for s in checked}
    nones = {s for s in checked if scalar[s] is None}
    assert {s for s in checked if pair[s] is None} == nones
    for s in checked:
        if s in nones:
            continue
        for section in (0, 1):
            np.testing.assert_allclose(
                pair[s][section], scalar[s], rtol=rtol, atol=1e-9,
                err_msg=f'{s} section {section}')


# ---------- _perp_basis: meridional T/S pinning -------------------------------

def test_perp_basis_axial_returns_lab_axes():
    sag_ax, tan_ax = _perp_basis(np.array([0.0, 0.0, 1.0]))
    aac(sag_ax, [1.0, 0.0, 0.0])
    aac(tan_ax, [0.0, 1.0, 0.0])


def test_perp_basis_backward_axial_is_right_handed():
    look = np.array([0.0, 0.0, -1.0])
    sag_ax, tan_ax = (_np(v) for v in _perp_basis(look))
    aac(np.cross(sag_ax, tan_ax), look, atol=1e-12)


def test_perp_basis_y_meridian_continuous_both_signs():
    for sy in (0.3, -0.3):
        look = np.array([0.0, sy, np.sqrt(1 - sy * sy)])
        sag_ax, tan_ax = (_np(v) for v in _perp_basis(look))
        # sagittal axis pins to +x over the whole y-z meridian
        aac(sag_ax, [1.0, 0.0, 0.0], atol=1e-12)
        # tangential axis stays meridional
        assert abs(float(tan_ax[0])) < 1e-12
        aac(np.cross(sag_ax, tan_ax), look, atol=1e-12)


def test_perp_basis_skew_chief_is_ts_pure():
    # the sagittal vector has no z component for any skew chief
    look = np.array([0.25, 0.35, 0.0])
    look[2] = np.sqrt(1 - look @ look)
    sag_ax, tan_ax = (_np(v) for v in _perp_basis(look))
    assert abs(float(sag_ax[2])) < 1e-12
    for axis in (sag_ax, tan_ax):
        assert abs(float(axis @ look)) < 1e-12
    aac(np.cross(sag_ax, tan_ax), look, atol=1e-12)


# ---------- launch tangent seeds vs finite differences ------------------------

def test_launch_tangent_seeds_match_central_differences():
    sys_ = _singlet_system()
    surfs = sys_.to_surfaces()
    fld = Field(0, 7.0)
    P0, S0 = (np.asarray(a) for a in
              launch(sys_, fld, 0.55, Sampling.chief()))
    sag_ax, tan_ax = (_np(v) for v in _perp_basis(S0[0]))
    none3 = np.zeros(3)
    start_P = np.stack([sag_ax, tan_ax, none3, none3], axis=-1)[None]
    start_S = np.stack([none3, none3, sag_ax, tan_ax], axis=-1)[None]
    columns = [DiffSeed(name=tag) for tag in ('dx', 'dy', 'du', 'dv')]
    got = raytrace_with_tangents(surfs, P0, S0, 0.55, columns,
                                 Pdot0=start_P, Sdot0=start_S)
    step = 1e-6

    def endpoint(P_in, S_in):
        run = raytrace(surfs, P_in, S_in, 0.55)
        return _np(run.P)[-1, 0], _np(run.S)[-1, 0]

    plans = [('pos', sag_ax), ('pos', tan_ax),
             ('dir', sag_ax), ('dir', tan_ax)]
    for col, (mode, axis) in enumerate(plans):
        if mode == 'pos':
            hi = endpoint(P0 + step * axis, S0)
            lo = endpoint(P0 - step * axis, S0)
        else:
            hi = endpoint(P0, np.cos(step) * S0 + np.sin(step) * axis)
            lo = endpoint(P0, np.cos(step) * S0 - np.sin(step) * axis)
        for k, slot in enumerate(('Pdot', 'Sdot')):
            fd = (hi[k] - lo[k]) / (2 * step)
            aac(_np(getattr(got, slot))[-1, 0, :, col], fd, atol=1e-7)


def test_launch_tangent_seeds_shape_validated():
    sys_ = _singlet_system()
    surfs = sys_.to_surfaces()
    P0, S0 = launch(sys_, Field(0, 0), 0.55, Sampling.chief())
    with pytest.raises(ValueError, match='shape'):
        raytrace_with_tangents(surfs, P0, S0, 0.55,
                               [DiffSeed(name='dx')],
                               Pdot0=np.zeros((1, 3, 2)))


# ---------- parity with the YNU walk ------------------------------------------

def test_parabasal_matches_ynu_singlet():
    sys_ = _singlet_system()
    fo_y = ynu_first_order(sys_.to_surfaces(), wvl=0.55, epd=20,
                           stop_index=1)
    fo_p = first_order(sys_, wavelength=0.55, epd=20, stop_index=1)
    assert isinstance(fo_p, ParabasalFirstOrder)
    _assert_pairs_match_ynu(fo_p, fo_y)
    for slot in ('n_object', 'n_image'):
        assert getattr(fo_p, slot) == pytest.approx(getattr(fo_y, slot))
    assert fo_p.abcd.shape == (4, 4)


def test_parabasal_matches_ynu_single_mirror_signs():
    sys_ = _parabola_system()
    fo_y = ynu_first_order(sys_.to_surfaces(), wvl=0.55, epd=50,
                           stop_index=0)
    fo_p = first_order(sys_, wavelength=0.55, epd=50, stop_index=0)
    _assert_pairs_match_ynu(fo_p, fo_y)
    assert fo_p.efl[0] > 0 and fo_p.efl[1] > 0
    assert fo_p.n_image == pytest.approx(-1.0)


def test_parabasal_matches_ynu_two_mirror():
    sys_ = _two_mirror_system()
    fo_y = ynu_first_order(sys_.to_surfaces(), wvl=0.55, epd=50,
                           stop_index=0)
    fo_p = first_order(sys_, wavelength=0.55, epd=50, stop_index=0)
    _assert_pairs_match_ynu(fo_p, fo_y)


def test_parabasal_finite_conjugate_image_is_conjugate_correct():
    # YNU always reports the collimated-input (rear focal) image; the
    # parabasal reports the image of the actual finite object
    sys_ = _finite_conjugate_system()
    fo_y = ynu_first_order(sys_.to_surfaces(), wvl=0.55, epd=20,
                           stop_index=2)
    fo_p = first_order(sys_, wavelength=0.55, epd=20, stop_index=2)
    _assert_pairs_match_ynu(
        fo_p, fo_y, skip=('paraxial_image_z', 'paraxial_image_distance'))
    # thin-lens conjugate from the principal planes: 1/i = 1/f - 1/o
    f_y = fo_p.efl[1]
    obj_to_h = 300.0 + (f_y - fo_y.ffl)      # object to front principal
    img_from_h = 1.0 / (1.0 / f_y - 1.0 / obj_to_h)
    rear_h_z = (304.0 + fo_y.bfl) - f_y      # rear principal plane z
    aac(fo_p.paraxial_image_z[1], rear_h_z + img_from_h, rtol=1e-9)


def test_parabasal_force_sym_scalars():
    sys_ = _singlet_system()
    fo = first_order(sys_, wavelength=0.55, epd=20, force_sym=True)
    fo_y = ynu_first_order(sys_.to_surfaces(), wvl=0.55, epd=20,
                           stop_index=1)
    assert isinstance(fo.efl, float)
    aac(fo.efl, fo_y.efl, rtol=1e-9)
    aac(fo.xp_z, fo_y.xp_z, rtol=1e-9)


def test_parabasal_repr_reports_backend_field_and_sections():
    fo = first_order(
        _singlet_system(), field=Field(0, 1), wavelength=0.55, epd=20)
    text = repr(fo)
    assert 'ParabasalFirstOrder (backend: parabasal)' in text
    assert 'field' in text
    assert 'EFL' in text
    assert '           X            Y' in text

    symmetric = first_order(
        _singlet_system(), wavelength=0.55, epd=20, force_sym=True)
    assert '           X            Y' not in repr(symmetric)


def test_parabasal_stop_index_out_of_range_raises():
    sys_ = _singlet_system()
    with pytest.raises(IndexError):
        first_order(sys_, wavelength=0.55, stop_index=7)


def test_first_order_bare_surfaces_defaults_to_on_axis():
    sys_ = _singlet_system()
    surfs = sys_.to_surfaces()
    fo = first_order(surfs, wavelength=0.55, epd=20, stop_index=1)
    assert (fo.field.hx, fo.field.hy) == (pytest.approx(0.0),
                                          pytest.approx(0.0))
    _assert_pairs_match_ynu(
        fo, ynu_first_order(surfs, wvl=0.55, epd=20, stop_index=1))


def test_system_field_indices_are_authoritative():
    sys_ = _singlet_system()
    sys_.fields.fields = [Field(0, 0), Field(0, 7.0)]

    fo_index = first_order(sys_, field=1, wavelength=0.55, epd=20)
    assert fo_index.field is sys_.field(1)
    assert fo_index.field.hy == pytest.approx(7.0)

    fo_literal = first_order(sys_, field=(0.0, 1.0), wavelength=0.55,
                             epd=20)
    assert fo_literal.field.hy == pytest.approx(1.0)

    # a bare float is neither an index nor a literal field
    with pytest.raises(TypeError):
        first_order(sys_, field=1.0, wavelength=0.55, epd=20)

    with pytest.raises(IndexError):
        first_order(sys_, field=7, wavelength=0.55, epd=20)
    with pytest.raises(IndexError):
        parabasal_foci(sys_, 7, 0.55)


def test_raw_prescription_accepts_tuple_field_literals():
    sys_ = _singlet_system()
    surfaces = sys_.to_surfaces()

    fo = first_order(surfaces, field=(1.0, 2.0), wavelength=0.55,
                     epd=20, stop_index=1)
    assert (fo.field.hx, fo.field.hy) == (pytest.approx(1.0),
                                          pytest.approx(2.0))
    foci = parabasal_foci(surfaces, (1.0, 2.0), 0.55)
    assert np.isfinite(foci).all()


# ---------- where the YNU walk cannot go --------------------------------------

def test_parabasal_handles_decentered_geometry():
    sys_ = _decentered_singlet_system()
    with pytest.raises(ValueError, match='centered axial geometry'):
        ynu_first_order(sys_.to_surfaces(), wvl=0.55, epd=20, stop_index=1)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')  # paraxial-aiming launch warning
        fo = first_order(sys_, wavelength=0.55, epd=20, stop_index=1)
    assert fo.backend == 'parabasal'
    # a 0.4 mm element decenter perturbs but does not destroy the design
    np.testing.assert_allclose(fo.efl[0], 96.8163, rtol=1e-3)
    np.testing.assert_allclose(fo.efl[1], 96.8163, rtol=1e-3)


def test_parabasal_off_axis_field_splits_ts_foci():
    sys_ = _singlet_system()
    fo0 = first_order(sys_, field=Field(0, 0), wavelength=0.55, epd=20)
    fo7 = first_order(sys_, field=Field(0, 7.0), wavelength=0.55, epd=20)
    np.testing.assert_allclose(fo0.paraxial_image_z[0],
                               fo0.paraxial_image_z[1], rtol=1e-12)
    assert abs(fo7.paraxial_image_z[0] - fo7.paraxial_image_z[1]) > 0.1


# ---------- the YNU fallback --------------------------------------------------

def test_parabasal_falls_back_to_ynu_when_chief_clipped():
    sys_ = _singlet_system(aperture_radius=2.0)
    fo = first_order(sys_, field=Field(0, 60.0), wavelength=0.55, epd=20)
    fo_y = ynu_first_order(sys_.to_surfaces(), wvl=0.55, epd=20,
                           stop_index=1)
    assert fo.backend == 'ynu'
    assert fo.efl == (fo_y.efl, fo_y.efl)
    assert fo.abcd is None


def test_90_degree_field_corridor_known_limitation():
    # exactly 90 deg leaves the chief non-finite -> YNU fallback
    sys_ = _singlet_system()
    with warnings.catch_warnings():
        warnings.simplefilter('ignore', RuntimeWarning)
        fo = first_order(sys_, field=Field(0, 90.0), wavelength=0.55,
                         epd=20)
    assert fo.backend == 'ynu'


# ---------- parabasal_foci ----------------------------------------------------

def test_parabasal_foci_on_axis_match_paraxial_image():
    sys_ = _singlet_system()
    fo_y = ynu_first_order(sys_.to_surfaces(), wvl=0.55, epd=20,
                           stop_index=1)
    x_z, y_z = parabasal_foci(sys_, Field(0, 0), 0.55)
    np.testing.assert_allclose(x_z, fo_y.paraxial_image_z, rtol=1e-9)
    np.testing.assert_allclose(y_z, fo_y.paraxial_image_z, rtol=1e-9)


# ---------- launch warning ----------------------------------------------------

def test_launch_warns_on_decentered_with_paraxial_aiming():
    sys_ = _decentered_singlet_system()
    with pytest.warns(UserWarning, match='tilts/decenters'):
        launch(sys_, Field(0, 1.0), 0.55, Sampling.fan(5), epd=10)


def test_launch_does_not_warn_on_centered_system():
    sys_ = _singlet_system()
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        launch(sys_, Field(0, 1.0), 0.55, Sampling.fan(5), epd=10)


def test_launch_does_not_warn_with_real_aiming():
    sys_ = _decentered_singlet_system()
    sys_.ray_aiming = 'real'
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        launch(sys_, Field(0, 1.0), 0.55, Sampling.fan(5), epd=10)
