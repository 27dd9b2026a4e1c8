"""LensData design registry in depth: pickups, solves, constraints, breaks.

Counterpart of the reference's ``test_raytracing_lensdata_solves.py`` /
``..._constraints.py`` / ``..._coordbreaks.py`` suites: symmetry pickups
(freeze + follow + chain resolution + cycle rejection), the paraxial
image-distance solve lifecycle, selector semantics and box/relative
bounds in radius vs curvature space, and coordinate-break layout
conventions (basic/rev/ret/dar/ben).
"""
import warnings

import numpy as onp
import pytest

import jax  # NOQA: F401  (forces backend selection before reference import)

from prysm_tpu.x import raytracing as rt
import prysm_tpu.x.materials as mat
from prysm_tpu.x.raytracing.paraxial import paraxial_image_distance

BK7 = mat.model_glass(1.5168, 64.17, name='BK7')


def _triplet():
    """Six curved surfaces in three elements; rows[0] is OBJECT."""
    lens = rt.LensData()
    lens.add(rt.Conic(1 / 50.0, 0.0), thickness=4.0, material=BK7,
             aperture=10.0)
    lens.add(rt.Conic(-1 / 80.0, 0.0), thickness=2.0, material=mat.air,
             aperture=10.0)
    lens.add(rt.Conic(1 / 60.0, 0.0), thickness=4.0, material=BK7,
             aperture=10.0)
    lens.add(rt.Conic(-1 / 70.0, 0.0), thickness=2.0, material=mat.air,
             aperture=10.0)
    lens.add(rt.Conic(1 / 90.0, 0.0), thickness=4.0, material=BK7,
             aperture=10.0)
    lens.add(rt.Conic(-1 / 100.0, 0.0), thickness=80.0, material=mat.air,
             aperture=10.0)
    return rt.OpticalSystem(lens, aperture=16.0, wavelengths=[0.5876],
                            stop_index=1)


def _singlet(thickness_last=90.0):
    lens = rt.LensData()
    lens.add(rt.Sphere(1 / 62.0), thickness=6.0, material=BK7, aperture=10.0)
    lens.add(rt.Sphere(-1 / 128.0), thickness=thickness_last,
             material=mat.air, aperture=10.0)
    return rt.OpticalSystem(lens, aperture=16.0, wavelengths=[0.5876],
                            stop_index=1)


def _curv(sys_, row):
    return float(sys_.lens.rows[row].params[0])


# ---------------------------------------------------------------------------
# pickups
# ---------------------------------------------------------------------------

def test_symmetry_pickup_freezes_dependent_and_follows_source():
    s = _triplet()
    d = s._design
    s.opt.vary('curvature', [1, 2])
    s.opt.pickup('curvature', 2, from_surface=1, scale=-1.0)
    # the driven slot leaves the free vector
    assert len(d.free_slots()) == 1
    s.to_surfaces()  # compile resolves dependents
    assert _curv(s, 2) == pytest.approx(-_curv(s, 1))


def test_pickup_tracks_source_under_update():
    s = _triplet()
    d = s._design
    s.opt.vary('curvature', 1)
    s.opt.pickup('curvature', 2, from_surface=1, scale=-1.0)
    d.update([0.03])
    assert _curv(s, 1) == pytest.approx(0.03)
    assert _curv(s, 2) == pytest.approx(-0.03)


def test_pickup_with_scale_and_offset():
    s = _triplet()
    s.opt.pickup('curvature', 3, from_surface=1, scale=0.5, offset=1e-3)
    s.to_surfaces()
    assert _curv(s, 3) == pytest.approx(0.5 * _curv(s, 1) + 1e-3)


def test_pickup_length_mismatch_raises():
    s = _triplet()
    with pytest.raises(ValueError, match='counts must agree'):
        s.opt.pickup('curvature', [2, 3], from_surface=1)


def test_coef_pickup_elementwise():
    lens = rt.LensData()
    lens.add(rt.EvenAsphere(1 / 50.0, 0.0, (1e-5, -1e-8)), thickness=3.0,
             material=BK7, aperture=8.0)
    lens.add(rt.EvenAsphere(-1 / 50.0, 0.0, (0.0, 0.0)), thickness=50.0,
             material=mat.air, aperture=8.0)
    s = rt.OpticalSystem(lens, aperture=10.0, wavelengths=[0.5876],
                         stop_index=1)
    s.opt.pickup('coefs', 2, from_surface=1, scale=-1.0)
    s.to_surfaces()
    p1 = s.lens.rows[1].build_shape().params['coefs']
    p2 = s.lens.rows[2].build_shape().params['coefs']
    onp.testing.assert_allclose(onp.asarray(p2), -onp.asarray(p1))


def test_pickup_chain_resolution_is_declaration_order_independent():
    s = _triplet()
    # declare the downstream edge first: 3 <- 2, then 2 <- 1
    s.opt.pickup('curvature', 3, from_surface=2)
    s.opt.pickup('curvature', 2, from_surface=1, scale=-1.0)
    s.to_surfaces()
    assert _curv(s, 2) == pytest.approx(-_curv(s, 1))
    assert _curv(s, 3) == pytest.approx(_curv(s, 2))


def test_pickup_cycle_is_rejected_when_declared():
    s = _triplet()
    s.opt.pickup('curvature', 2, from_surface=1)
    with pytest.raises(ValueError):
        s.opt.pickup('curvature', 1, from_surface=2)


def test_pickup_target_cannot_have_multiple_drivers():
    s = _triplet()
    s.opt.pickup('curvature', 2, from_surface=1)
    with pytest.raises(ValueError, match='already driven'):
        s.opt.pickup('curvature', 2, from_surface=3)


def test_pickup_expansion_propagates_tangents():
    s = _triplet()
    d = s._design
    s.opt.pickup('curvature', 2, from_surface=1, scale=-1.0)
    s.opt.pickup('curvature', 3, from_surface=2, scale=2.0)
    src = s.lens._category_slots('curvature', 1)[0]
    tangents = d.pickup_expansion(src)
    t2 = s.lens._category_slots('curvature', 2)[0]
    t3 = s.lens._category_slots('curvature', 3)[0]
    assert tangents[t2] == pytest.approx(-1.0)
    assert tangents[t3] == pytest.approx(-2.0)


# ---------------------------------------------------------------------------
# image-distance solve
# ---------------------------------------------------------------------------

def test_image_solve_places_image_at_paraxial_distance():
    s = _singlet(thickness_last=10.0)  # wrong on purpose
    s.solve.image_distance()
    surfs = s.to_surfaces()
    want = paraxial_image_distance(surfs[:-1], wvl=0.5876)
    assert float(s.lens.rows[2].thickness) == pytest.approx(want, rel=1e-10)


def test_image_solve_freezes_the_solved_gap():
    s = _singlet()
    s.solve.image_distance()
    s.opt.vary_all()
    d = s._design
    slot = ('thickness', 2, 0)
    assert slot not in d.free_slots()


def test_clear_image_solve_releases_the_solved_gap():
    s = _singlet()
    s.solve.image_distance()
    s.solve.clear_image_distance()
    s.opt.vary('thickness', 2)
    assert ('thickness', 2, 0) in s._design.free_slots()


def test_vary_thickness_clears_matching_image_solve():
    s = _singlet()
    s.solve.image_distance()
    s.opt.vary('thickness', 2)
    assert s._design._gap_solve is None
    assert ('thickness', 2, 0) in s._design.free_slots()


def test_image_solve_tracks_curvature_changes():
    s = _singlet()
    s.solve.image_distance()
    s.to_surfaces()
    t_before = float(s.lens.rows[2].thickness)
    s.lens.rows[1].params[0] = 1 / 55.0  # weaken the front surface
    s.to_surfaces()
    t_after = float(s.lens.rows[2].thickness)
    assert t_after != pytest.approx(t_before)
    want = paraxial_image_distance(s.to_surfaces()[:-1], wvl=0.5876)
    assert t_after == pytest.approx(want, rel=1e-10)


def test_image_solve_without_powered_surface_raises():
    lens = rt.LensData()
    s = rt.OpticalSystem(lens, wavelengths=[0.5876])
    with pytest.raises(ValueError):
        s.solve.image_distance()


def test_solve_and_pickup_compose():
    s = _singlet()
    s.opt.pickup('curvature', 2, from_surface=1, scale=-1.0)
    s.solve.image_distance()
    s.to_surfaces()
    assert _curv(s, 2) == pytest.approx(-_curv(s, 1))
    want = paraxial_image_distance(s.to_surfaces()[:-1], wvl=0.5876)
    assert float(s.lens.rows[2].thickness) == pytest.approx(want, rel=1e-9)


def test_copy_preserves_pickups_and_solves():
    s = _singlet()
    s.opt.pickup('curvature', 2, from_surface=1, scale=-1.0)
    s.solve.image_distance()
    twin = s.copy()
    twin.to_surfaces()
    assert _curv(twin, 2) == pytest.approx(-_curv(twin, 1))
    assert twin._design._gap_solve is not None
    # editing the copy does not write back into the original
    twin.lens.rows[1].params[0] = 1 / 40.0
    assert _curv(s, 1) == pytest.approx(1 / 62.0)


# ---------------------------------------------------------------------------
# selectors + constraints
# ---------------------------------------------------------------------------

def test_selector_int_list_slice_negative():
    s = _triplet()
    d = s._design
    s.opt.vary('curvature', 1)
    assert len(d.free_slots()) == 1
    s.opt.freeze_all()
    s.opt.vary('curvature', [1, 3])
    assert len(d.free_slots()) == 2
    s.opt.freeze_all()
    s.opt.vary('curvature', slice(1, 4))
    assert len(d.free_slots()) == 3
    s.opt.freeze_all()
    s.opt.vary('curvature', -2)  # the last curved surface
    assert len(d.free_slots()) == 1


def test_selector_all_skips_rows_without_category():
    s = _triplet()
    s.opt.vary('curvature', 'all')  # OBJECT/IMAGE planes have none
    assert len(s._design.free_slots()) == 6


def test_absolute_thickness_bounds():
    s = _triplet()
    s.opt.constrain('thickness', lo=0.5, hi=10.0, surfaces=1)
    s.opt.vary('thickness', 1)
    lo, hi = s._design.bounds()
    assert lo[0] == 0.5 and hi[0] == 10.0


def test_one_sided_bound_leaves_other_infinite():
    s = _triplet()
    s.opt.constrain('thickness', lo=0.0, surfaces=1)
    s.opt.vary('thickness', 1)
    lo, hi = s._design.bounds()
    assert lo[0] == 0.0 and onp.isinf(hi[0])


def test_unconstrained_free_dof_is_infinite():
    s = _triplet()
    s.opt.vary('curvature', 1)
    lo, hi = s._design.bounds()
    assert onp.isinf(lo[0]) and onp.isinf(hi[0])


def test_relative_curvature_bound_is_pct_of_curvature():
    s = _triplet()
    s.opt.vary('curvature', 1)
    s.opt.constrain('curvature', relative=0.1, surfaces=1)
    c0 = 1 / 50.0
    lo, hi = s._design.bounds()
    onp.testing.assert_allclose([lo[0], hi[0]], [c0 * 0.9, c0 * 1.1])


def test_relative_radius_bound_is_pct_of_radius():
    s = _triplet()
    s.opt.vary('radius', 1)
    s.opt.constrain('radius', relative=0.1, surfaces=1)
    lo, hi = s._design.bounds()
    onp.testing.assert_allclose(1.0 / hi[0], 50.0 * 0.9)
    onp.testing.assert_allclose(1.0 / lo[0], 50.0 * 1.1)


def test_relative_radius_bound_orders_negative_nominal():
    s = _triplet()
    s.opt.vary('radius', 2)  # radius -80
    s.opt.constrain('radius', relative=0.1, surfaces=2)
    lo, hi = s._design.bounds()
    assert lo[0] < hi[0]
    radii = sorted([1.0 / lo[0], 1.0 / hi[0]])
    onp.testing.assert_allclose(radii, [-88.0, -72.0])


def test_relative_bound_on_zero_curvature_is_unbounded_with_warning():
    lens = rt.LensData()
    lens.add(rt.Conic(0.0, 0.0), thickness=1.0, material=mat.air,
             aperture=5.0)
    s = rt.OpticalSystem(lens, wavelengths=[0.5876])
    s.opt.vary('curvature', 1)
    with pytest.warns(UserWarning):
        s.opt.constrain('curvature', relative=0.1, surfaces=1)
    lo, hi = s._design.bounds()
    assert onp.isinf(lo[0]) and onp.isinf(hi[0])


def test_relative_radius_bound_on_flat_surface_is_unbounded_with_warning():
    lens = rt.LensData()
    lens.add(rt.Conic(0.0, 0.0), thickness=1.0, material=mat.air,
             aperture=5.0)
    s = rt.OpticalSystem(lens, wavelengths=[0.5876])
    s.opt.vary('radius', 1)
    with pytest.warns(UserWarning):
        s.opt.constrain('radius', relative=0.1, surfaces=1)
    lo, hi = s._design.bounds()
    assert onp.isinf(lo[0]) and onp.isinf(hi[0])


def test_constrain_requires_a_bound_spec():
    s = _triplet()
    with pytest.raises(ValueError):
        s.opt.constrain('thickness', surfaces=1)


def test_bounds_only_returned_for_free_slots():
    s = _triplet()
    s.opt.constrain('thickness', lo=0.0, hi=10.0, surfaces='all')
    s.opt.vary('thickness', 2)
    lo, hi = s._design.bounds()
    assert len(lo) == 1
    assert lo[0] == 0.0 and hi[0] == 10.0


def test_coefs_relative_bound_per_coefficient():
    lens = rt.LensData()
    lens.add(rt.EvenAsphere(1 / 50.0, 0.0, (1e-4, -2e-6, 3e-9)),
             thickness=2.0, material=mat.air, aperture=8.0)
    s = rt.OpticalSystem(lens, wavelengths=[0.5876])
    s.opt.vary('coefs', 1)
    s.opt.constrain('coefs', relative=0.5, surfaces=1)
    lo, hi = s._design.bounds()
    assert len(lo) == 3
    assert (lo < hi).all()


# ---------------------------------------------------------------------------
# coordinate breaks
# ---------------------------------------------------------------------------

def _positions(lens):
    return [onp.asarray(s.P, dtype=float) for s in lens.to_surfaces()]


def test_basic_decenter_shifts_origin_along_local_axes():
    lens = rt.LensData()
    lens.add_coordbreak(decenter=(1.0, 2.0, 0.0))
    lens.add(rt.Sphere(0.0), thickness=5.0, material=None, typ='eval')
    P = _positions(lens)
    onp.testing.assert_allclose(P[1][:2], [1.0, 2.0], atol=1e-12)


def test_identity_break_does_not_change_axial_layout():
    a = rt.LensData()
    a.add(rt.Sphere(1 / 60.0), thickness=6.0, material=BK7, aperture=8.0)
    a.add(rt.Sphere(0.0), thickness=40.0, material=mat.air)
    b = rt.LensData()
    b.add(rt.Sphere(1 / 60.0), thickness=6.0, material=BK7, aperture=8.0)
    b.add_coordbreak()  # identity
    b.add(rt.Sphere(0.0), thickness=40.0, material=mat.air)
    Pa = _positions(a)
    Pb = _positions(b)
    onp.testing.assert_allclose(Pb[-1], Pa[-1], atol=1e-12)


def test_basic_tilt_is_cumulative_for_downstream_surfaces():
    lens = rt.LensData()
    # tilt ordering is (rz, ry, rx); rx tips the axis into the y-z plane
    lens.add_coordbreak(tilt=(0.0, 0.0, 10.0))
    lens.add(rt.Sphere(0.0), thickness=10.0, material=None, typ='eval')
    lens.add(rt.Sphere(0.0), thickness=10.0, material=None, typ='eval')
    P = _positions(lens)
    # both downstream surfaces march along the tilted axis
    d1 = P[2] - P[1]
    d2 = P[3] - P[2]
    onp.testing.assert_allclose(d1, d2, atol=1e-12)
    assert abs(d1[1]) > 1e-3  # the tilt moved the axis off z


def test_rev_inverts_a_matching_basic():
    lens = rt.LensData()
    lens.add_coordbreak(decenter=(1.0, -2.0, 0.0), tilt=(7.0, 3.0, 0.0))
    lens.add_coordbreak(decenter=(1.0, -2.0, 0.0), tilt=(7.0, 3.0, 0.0),
                        kind='rev')
    lens.add(rt.Sphere(0.0), thickness=5.0, material=None, typ='eval')
    P = _positions(lens)
    onp.testing.assert_allclose(P[-2][:2], [0.0, 0.0], atol=1e-10)


def test_unknown_coordbreak_kind_raises():
    lens = rt.LensData()
    with pytest.raises((ValueError, KeyError)):
        lens.add_coordbreak(kind='bogus')
        lens.to_surfaces()
