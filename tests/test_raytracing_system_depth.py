"""OpticalSystem / ApertureSpec / FieldSet and listings: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_system.py (43 tests): the aperture-spec mode
conversions and validation (including object-space NA real-ray
launches), media from surfaces, tabular listings, the vignetting-
ignored IO warning, exit-pupil caching, the wavelength/weight model,
and the vignetting solves.  The behaviors are the reference's; the
harness is this repo's own.
"""
import warnings as _warnings

import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as pm
import prysm_tpu.x.raytracing as rtpkg
from prysm_tpu.x.raytracing import (
    FRAUNHOFER_LINES_UM, ApertureSpec, Field, FieldSet, LensData,
    OpticalSystem, Sampling, launch, raytrace)
from prysm_tpu.x.raytracing.system import (
    EPD, FNO_IMAGE, FNO_OBJECT, NA_IMAGE, NA_OBJECT)
from prysm_tpu.x.raytracing.surfaces import Conic, Plane
from prysm_tpu.x.raytracing.paraxial import entrance_pupil_z
from prysm_tpu.x.raytracing.io._common import warn_vignetting_ignored
from prysm_tpu.x.raytracing import analysis as ana

CROWN = pm.ConstantMaterial(1.5168)
D_LINES = list(FRAUNHOFER_LINES_UM.values())


def aac(actual, desired, **kw):
    np.testing.assert_allclose(np.asarray(actual, dtype=float), desired,
                               **kw)


def biconvex(aperture=ApertureSpec.epd(20.0), object_index=None):
    """f/5-ish singlet; the first powered surface (row 1) is the stop."""
    spine = LensData()
    if object_index is not None:
        spine.object_row.material = pm.ConstantMaterial(object_index)
        spine.object_row.thickness = 200.0
    spine.add(Conic(1 / 102.0, 0.0), thickness=6.0, material=CROWN,
              aperture=12.0)
    spine.add(Conic(-1 / 102.0, 0.0), thickness=95.0, material=pm.air,
              aperture=12.0)
    return OpticalSystem(spine, aperture=aperture, wavelengths=D_LINES,
                         reference=1, stop_index=1)


def powerless(aperture):
    spine = LensData()
    spine.add(Plane(), typ='refr', material=pm.air, thickness=10.0)
    return OpticalSystem(spine, aperture=aperture, wavelengths=D_LINES,
                         reference=1, stop_index=1)


# ---------- package surface + namespaces --------------------------------------

def test_package_all_names_are_exported():
    assert len(rtpkg.__all__) > 100
    gone = [n for n in rtpkg.__all__ if not hasattr(rtpkg, n)]
    assert not gone, gone


def test_analysis_namespace_forwards_to_function_ports():
    """Namespace verbs bind the system and agree with the free functions
    (the repo forwards via *args/**kwargs, so the check is functional
    rather than an inspect.signature comparison)."""
    rig = biconvex()
    probe_fields = [Field(0.0, 0.0), Field(0.0, 2.0)]
    through_ns = rig.analysis.field_curvature(probe_fields, samples=3)
    direct = ana.field_curvature(rig, probe_fields, samples=3)
    aac(through_ns.x_fan_z, np.asarray(direct.x_fan_z))
    aac(through_ns.y_fan_z, np.asarray(direct.y_fan_z))
    for verb in ('wavefront', 'spot_diagrams', 'ray_aberration_fans',
                 'opd_fans', 'distortion', 'lateral_color',
                 'chromatic_focal_shift', 'full_field'):
        assert callable(getattr(rig.analysis, verb))


# ---------- ApertureSpec ------------------------------------------------------

def test_aperture_spec_modes_and_factories():
    by_factory = {
        EPD: ApertureSpec.epd(10),
        FNO_IMAGE: ApertureSpec.fno(4.0),
        FNO_OBJECT: ApertureSpec.fno(4.0, object_space=True),
        NA_IMAGE: ApertureSpec.na(0.1),
        NA_OBJECT: ApertureSpec.na(0.1, object_space=True),
    }
    for mode, spec in by_factory.items():
        assert spec.mode == mode
    with pytest.raises(ValueError, match='aperture mode'):
        ApertureSpec(1.0, mode='nonsense')
    with pytest.raises(ValueError, match='positive'):
        ApertureSpec.epd(0.0)


def test_lensdata_has_exclusive_system_owner_and_copy_is_independent():
    spine = LensData()
    owner = OpticalSystem(spine)
    assert spine.system_owner is owner
    with pytest.raises(ValueError, match='already backs'):
        OpticalSystem(spine)
    clone = owner.copy()
    assert clone.lens is not spine
    assert clone.lens.system_owner is clone


def test_fieldset_rejects_heterogeneous_metadata():
    bad_sets = [
        ('kind', [Field(), Field(0, 0, kind='height', object_z=0)]),
        ('angular unit', [Field(unit='deg'), Field(unit='rad')]),
        ('object plane', [Field(0, 0, kind='height', object_z=0),
                          Field(0, 0, kind='height', object_z=1)]),
    ]
    for needle, fields in bad_sets:
        with pytest.raises(ValueError, match=needle):
            FieldSet(fields)


def test_aperture_epd_resolves_directly():
    rig = biconvex(ApertureSpec.epd(20.0))
    assert rig.aperture.resolve(rig) == (EPD, 20.0)
    assert rig.aperture.entrance_pupil_diameter(rig) == \
        pytest.approx(20.0)
    assert rig.epd == pytest.approx(20.0)


def test_aperture_fno_and_na_image_round_trip_against_first_order():
    # EPD -> first-order F/# and NA -> EPD again: the identity
    rig = biconvex(ApertureSpec.epd(20.0))
    fo = rig.first_order(force_sym=True)
    for derived in (ApertureSpec.fno(fo.fno),
                    ApertureSpec.na(fo.na_image)):
        aac(derived.entrance_pupil_diameter(rig), 20.0, rtol=1e-9)


def test_object_space_aperture_illegal_at_infinity():
    spec = ApertureSpec.na(0.1, object_space=True)
    with pytest.raises(ValueError, match='object-space'):
        spec.validate(object_at_infinity=True)
    spec.validate(object_at_infinity=False)  # fine at finite conjugates


def test_object_space_aperture_validation_is_enforced_at_infinity():
    rig = biconvex(ApertureSpec.na(0.1, object_space=True))
    assert rig.object_at_infinity is True
    for poke in (lambda: rig.aperture.resolve(rig), lambda: rig.epd,
                 lambda: launch(rig,
                                Field(0.0, 1.0, kind='height',
                                      object_z=-10.0),
                                rig.wavelength(), Sampling.fan(n=3))):
        with pytest.raises(ValueError, match='object-space'):
            poke()


def test_focusing_apertures_raise_for_afocal_system():
    for spec in (ApertureSpec.fno(4.0),
                 ApertureSpec.fno(4.0, object_space=True),
                 ApertureSpec.na(0.1),
                 ApertureSpec.na(0.1, object_space=True)):
        rig = powerless(spec)
        # image-space focusing apertures need power; object-space ones
        # additionally need a finite conjugate
        for poke in (lambda: spec.resolve(rig), lambda: rig.epd):
            with pytest.raises(ValueError, match='afocal|object-space'):
                poke()


def test_object_space_na_resolves_to_positive_epd_finite_conjugate():
    rig = biconvex(ApertureSpec.na(0.05, object_space=True),
                   object_index=1.0)
    assert rig.aperture.resolve(rig) == (NA_OBJECT, 0.05)
    assert rig.aperture.entrance_pupil_diameter(rig) > 0.0


# ---------- object-space NA real-ray launch -----------------------------------

def _object_point_fan(rig, n=11):
    z_obj = float(rig[0].P[2])
    fld = Field(0.0, 0.0, kind='height', object_z=z_obj)
    P, S = launch(rig, fld, rig.wavelength(),
                  Sampling.fan(n=n, axis='y'))
    return np.asarray(P), np.asarray(S), z_obj


def test_object_space_na_launch_honors_sine_condition():
    """The launched cone's marginal ray obeys n_object*sin(U) = NA."""
    na = 0.1
    rig = biconvex(ApertureSpec.na(na, object_space=True),
                   object_index=1.0)
    P, S, z_obj = _object_point_fan(rig)
    # on-axis: every ray emanates from the one object point
    aac(P[:, 2], z_obj)
    aac(P[:, :2], 0.0, atol=1e-12)
    sin_marg = float(np.max(np.hypot(S[:, 0], S[:, 1])))
    aac(1.0 * sin_marg, na, rtol=1e-6)


def test_object_space_na_marginal_fills_stop_at_na_radius():
    """The aimed cone threads the stop: the chief crosses its center and
    the marginal lands at the NA-implied radius, not the clear aperture."""
    rig = biconvex(ApertureSpec.na(0.05, object_space=True),
                   object_index=1.0)
    P, S, _ = _object_point_fan(rig)
    run = rig.trace(P, S)
    y_stop = np.asarray(run.P)[rig.stop_index + 1, :, 1]  # +1: launch row
    aac(y_stop[y_stop.size // 2], 0.0, atol=1e-9)
    semi = rig.aperture.entrance_pupil_diameter(rig) / 2.0
    aac(np.max(np.abs(y_stop)), semi, rtol=1e-2)


def test_object_space_na_low_na_matches_paraxial_epd():
    """At low NA the real footprint matches the paraxial EPD."""
    rig = biconvex(ApertureSpec.na(0.005, object_space=True),
                   object_index=1.0)
    P, S, z_obj = _object_point_fan(rig, n=5)
    z_ep = entrance_pupil_z(rig.to_surfaces(), rig.wavelength(),
                            stop_index=rig.stop_index)
    rim = int(np.argmax(S[:, 1]))
    y_at_ep = P[rim, 1] + (z_ep - z_obj) * S[rim, 1] / S[rim, 2]
    aac(2.0 * y_at_ep, rig.aperture.entrance_pupil_diameter(rig),
        rtol=1e-4)


def test_object_space_na_requires_finite_conjugate_field():
    rig = biconvex(ApertureSpec.na(0.1, object_space=True),
                   object_index=1.0)
    with pytest.raises(ValueError, match='finite-'):
        launch(rig, Field(0.0, 0.0, kind='angle'), rig.wavelength(),
               Sampling.fan(n=5))


# ---------- media from surfaces -----------------------------------------------

def test_object_index_from_object_surface_material():
    in_air = biconvex().first_order()
    in_water = biconvex(object_index=1.33).first_order()
    assert in_air.n_object == pytest.approx(1.0)
    assert in_water.n_object == pytest.approx(1.33)
    assert in_water.n_image == pytest.approx(1.0)  # air image space


# ---------- OpticalSystem behavior --------------------------------------------

def test_optical_system_sequence_delegation():
    rig = biconvex()
    assert len(rig) == len(rig.lens)
    assert list(rig)[0] is rig.lens[0]
    assert rig.to_surfaces() is rig.lens.to_surfaces()


def test_fieldset_repr_lists_fields():
    trio = FieldSet([0.0, 1.0, (0.5, 2.0)])
    assert 'FieldSet' in repr(trio)
    assert len(trio) == 3


# ---------- listings ----------------------------------------------------------

def test_surface_table_marks_stop_and_formats_radius():
    rig = biconvex()
    table = rig.list_surfaces()
    rendered = repr(table)
    assert 'SurfaceTable' in rendered
    assert '[mm]' in rendered
    assert 'inf' in rendered          # the flat image plane
    assert table.records[rig.stop_index]['stop'] is True


def test_surface_table_marks_compiled_stop_after_coordbreak():
    spine = LensData()
    spine.add_coordbreak(decenter=(1.0, 0.0, 0.0))  # rows[1]
    spine.add(Plane(), typ='eval')                   # rows[2]
    rig = OpticalSystem(spine, stop_index=1)
    table = rig.list_surfaces()
    # the stop names the coordbreak row, which compiles no surface, so
    # the marker rolls onto the next real surface (the eval plane)
    assert table.records[1]['stop'] is False
    assert table.records[1]['surface_index'] is None
    assert table.records[2]['stop'] is True
    assert table.records[2]['surface_index'] == 1


def test_aperture_table_reports_clip_and_drawn_extent():
    table = biconvex().list_apertures()
    assert repr(table).startswith('ApertureTable')
    row = table.records[1]  # [0] is OBJECT
    assert row['clip'] == 'circular 12'
    assert row['drawn'] == pytest.approx(12.0 * 1.05)  # clip x oversize
    assert row['provenance'] == 'user'


def test_decenter_table_lists_coordinate_breaks():
    spine = LensData()
    spine.add_coordbreak(decenter=(1.0, 2.0, 0.0), tilt=(0.0, 3.0, 0.0),
                         kind='basic')
    spine.add(Plane(), typ='eval')
    table = OpticalSystem(spine).list_decenters()
    assert len(table.records) == 1
    row = table.records[0]
    assert (row['dx'], row['ry'], row['kind']) == (
        pytest.approx(1.0), pytest.approx(3.0), 'basic')
    # a break-free system reports the empty table
    assert 'no coordinate breaks' in repr(biconvex().list_decenters())


# ---------- IO vignetting warning ---------------------------------------------

def test_vignetting_warning_fires_only_when_present():
    with pytest.warns(UserWarning, match='vignetting'):
        warn_vignetting_ignored('S 0.02 5.0\nVUY 0.1 0.2\n', 'Code V')
    with _warnings.catch_warnings():
        _warnings.simplefilter('error')
        warn_vignetting_ignored('S 0.02 5.0\nTHI 3.0\n', 'Code V')


# ---------- exit-pupil resolution + version-stamped cache ---------------------

def test_exit_pupil_matches_first_order_and_caches():
    rig = biconvex()
    wvl = rig.wavelength()
    P_xp = rig.exit_pupil(wvl)
    aac(P_xp[2], rig.first_order(wavelength=wvl, force_sym=True).xp_z)
    aac(np.asarray(P_xp, dtype=float)[:2], 0.0)
    assert rig.exit_pupil(wvl) is P_xp  # cache hit: the very same array


def test_exit_pupil_cache_invalidated_by_lens_edit():
    rig = biconvex()
    wvl = rig.wavelength()
    before = rig.exit_pupil(wvl)
    stamp = rig.lens._version
    rig.lens.rows[0].thickness = float(rig.lens.rows[0].thickness) + 1.0
    assert rig.lens._version > stamp
    assert rig.exit_pupil(wvl) is not before


def test_exit_pupil_cache_keyed_by_stop_index():
    rig = biconvex()
    wvl = rig.wavelength()
    at_one = rig.exit_pupil(wvl)
    rig.stop_index = 2
    assert rig.exit_pupil(wvl) is not at_one


def test_exit_pupil_cache_key_includes_geometric_field_metadata():
    rig = biconvex()
    rig.stop_index = None
    wvl = rig.wavelength()
    fdeg = Field(0.1, 0.0, unit='deg')
    frad = Field(0.1, 0.0, unit='rad')

    direct_deg = ana.resolve_exit_pupil(rig, wvl, field=fdeg)
    direct_rad = ana.resolve_exit_pupil(rig, wvl, field=frad)
    assert not np.allclose(np.asarray(direct_deg),
                           np.asarray(direct_rad))

    cached_deg = rig.exit_pupil(wvl, field=fdeg)
    cached_rad = rig.exit_pupil(wvl, field=frad)
    aac(cached_deg, np.asarray(direct_deg, dtype=float))
    aac(cached_rad, np.asarray(direct_rad, dtype=float))
    assert cached_rad is not cached_deg


def test_resolve_exit_pupil_paraxial_branch_field_independent():
    rig = biconvex()
    wvl = rig.wavelength()
    on_axis = ana.resolve_exit_pupil(rig, wvl, field=Field(0.0, 0.0))
    off_axis = ana.resolve_exit_pupil(rig, wvl, field=Field(0.0, 5.0))
    aac(on_axis, np.asarray(off_axis, dtype=float), atol=1e-12)


# ---------- wavelength model --------------------------------------------------

def test_wavelengths_are_a_flat_micron_array():
    rig = OpticalSystem(LensData(), wavelengths=[0.486, 0.587, 0.656])
    assert isinstance(rig.wavelengths, np.ndarray)
    aac(rig.wavelengths, [0.486, 0.587, 0.656])


def test_wavelength_resolver_two_branches():
    rig = OpticalSystem(LensData(), wavelengths=[0.486, 0.587, 0.656],
                        reference=1)
    assert rig.wavelength() == pytest.approx(0.587)
    assert rig.wavelength(None) == pytest.approx(0.587)
    assert rig.wavelength(0.5) == pytest.approx(0.5)


def test_reference_defaults_to_zero_and_property_reads_microns():
    rig = OpticalSystem(LensData(), wavelengths=[0.4, 0.6])
    assert rig.reference == 0
    assert rig.reference_wavelength == pytest.approx(0.4)
    with pytest.raises(AttributeError):
        rig.reference_wavelength = 0.5  # read-only


def test_wavelength_default_when_no_wavelengths():
    rig = OpticalSystem(LensData())
    assert len(rig.wavelengths) == 0
    assert rig.reference_wavelength is None
    assert rig.wavelength() == pytest.approx(0.6328)


def test_weights_default_to_ones_and_validate_length():
    rig = OpticalSystem(LensData(), wavelengths=[0.4, 0.6])
    aac(rig.weights, [1.0, 1.0])
    weighted = OpticalSystem(LensData(), wavelengths=[0.4, 0.6],
                             weights=[2.0, 3.0])
    aac(weighted.weights, [2.0, 3.0])
    with pytest.raises(ValueError, match='weights length'):
        OpticalSystem(LensData(), wavelengths=[0.4, 0.6], weights=[1.0])


def test_wavelengths_mapping_is_rejected_with_a_clear_message():
    with pytest.raises(TypeError, match='not a mapping'):
        OpticalSystem(LensData(), wavelengths={'d': 0.587})


def test_nanometer_wavelength_guard():
    with pytest.warns(UserWarning, match='nanometers'):
        OpticalSystem(LensData(), wavelengths=[486.0, 587.0])
    with _warnings.catch_warnings():
        _warnings.simplefilter('error')
        OpticalSystem(LensData(), wavelengths=[0.486, 0.587])


def test_solve_image_distance_lands_d_line_paraxial_image():
    from prysm_tpu.x.raytracing.paraxial import paraxial_image_distance
    rig = biconvex()  # FRAUNHOFER wavelengths, reference index 1 (d)
    wvl = rig.reference_wavelength
    rig.solve.image_distance()
    compiled = rig.to_surfaces()
    want = (float(compiled[-2].P[2])
            + float(paraxial_image_distance(compiled[:-1], wvl=wvl)))
    assert float(compiled[-1].P[2]) == pytest.approx(want, abs=1e-9)


# ---------- set_vignetting / solve_vignetting ---------------------------------

def clipped_rear_singlet(rear_semidiameter=4.0, field=0.0):
    """The rear plane clips the nominal marginal rays (r ~ 4.8)."""
    spine = LensData()
    spine.add(Conic(1 / 30.0, 0.0), thickness=4.0,
              material=pm.ConstantMaterial(1.5), aperture=6.0)
    spine.add(Plane(), thickness=50.0, material=pm.air,
              aperture=rear_semidiameter)
    rig = OpticalSystem(spine, aperture=10.0, fields=[field],
                        wavelengths=[0.5876], reference=0)
    rig.solve.image_distance()
    return rig


def test_solve_vignetting_factors_are_symmetric_on_axis():
    from prysm_tpu.x.raytracing.launch import _solve_vignetting_factors

    rig = clipped_rear_singlet()
    factors = _solve_vignetting_factors(rig, rig.field(0),
                                        rig.wavelength())
    sides = [factors[k] for k in ('vux', 'vlx', 'vuy', 'vly')]
    # rotationally symmetric on-axis: all four sides agree
    assert max(sides) - min(sides) < 1e-9
    assert 0.05 < sides[0] < 0.5


def test_raytrace_rejects_system_and_system_trace_resolves_wavelength():
    rig = biconvex()
    P, S = launch(rig, Field(), rig.wavelength(), Sampling.chief())
    with pytest.raises(TypeError, match='compiled surface'):
        raytrace(rig, P, S, rig.wavelength())
    direct = raytrace(rig.to_surfaces(), P, S, rig.wavelength())
    through = rig.trace(P, S)
    for slot in ('P', 'S', 'OPL'):
        aac(getattr(through, slot), np.asarray(getattr(direct, slot)))


def test_set_vignetting_rim_rays_transmit_inside_limiting_aperture():
    from prysm_tpu.x.raytracing.spencer_and_murty import valid_mask

    rig = clipped_rear_singlet()
    assert rig.solve.vignetting() is rig
    assert rig.field(0).vignetting is not None

    # with factors stored, a rim-sampled launch transmits in full and
    # the marginal rays ride just inside the limiting aperture
    P, S = launch(rig, rig.field(0), rig.wavelength(),
                  Sampling.cross(n=11))
    run = rig.trace(P, S)
    assert np.asarray(valid_mask(run.status)).all()
    # history rows: launch(0), OBJECT(1), conic(2), rear(3), IMAGE(4)
    r_rear = np.hypot(*np.asarray(run.P)[3, :, :2].T)
    assert 4.0 * 0.98 < float(r_rear.max()) <= 4.0


def test_set_vignetting_overwrites_and_collapses_unvignetted_to_none():
    rig = clipped_rear_singlet(rear_semidiameter=8.0)
    # stale hand factors are overwritten, not composed with; an
    # unvignetted field stores None
    rig.field(0).vignetting = {'vux': 0.1, 'vlx': 0.1, 'vuy': 0.1,
                               'vly': 0.1}
    rig.solve.vignetting()
    assert rig.field(0).vignetting is None


def test_solve_vignetting_accepts_numpy_int_field_indices():
    rig = clipped_rear_singlet()
    assert rig.solve.vignetting(fields=np.arange(len(rig.fields))) is rig
    assert rig.field(0).vignetting is not None


def test_solve_vignetting_blocked_chief_raises():
    from prysm_tpu.x.raytracing.launch import solve_vignetting

    # the chief crosses the rear surface outside the tiny semidiameter;
    # factors are chief-referenced, so this must raise
    rig = clipped_rear_singlet(rear_semidiameter=0.3, field=10.0)
    with pytest.raises(ValueError, match='chief'):
        solve_vignetting(rig)
