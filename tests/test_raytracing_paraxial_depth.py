"""Paraxial (ABCD) depth: port of the reference paraxial suite's intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_paraxial.py (35 tests): system-matrix identities,
image-distance and focal-length conventions (eval-plane stripping,
object-medium scaling), astigmatic vertex curvatures, the
Ritchey-Chretien constraint engine, and the ynu first-order report.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
import prysm_tpu.x.raytracing as rt
from prysm_tpu.x.raytracing import LensData
from prysm_tpu.x.raytracing.surfaces import Surface
from prysm_tpu.x.raytracing.paraxial import (
    FirstOrderProperties,
    back_focal_length,
    effective_focal_length,
    front_focal_length,
    local_x_vertex_curvature,
    local_y_vertex_curvature,
    paraxial_image_distance,
    system_matrix,
    ynu_first_order,
)
from prysm_tpu.x.raytracing._meta import (
    image_space_index, object_space_index)
from prysm_tpu.x.raytracing.auto import RitcheyChretien


def plane(interaction, P, material=None, **kw):
    return Surface(shape=rt.Plane(), interaction=interaction, P=P,
                   material=material, **kw)


def sphere(c, interaction, P, material=None, **kw):
    return Surface(shape=rt.Sphere(c), interaction=interaction, P=P,
                   material=material, **kw)


def conic(c, k, interaction, P, material=None, **kw):
    return Surface(shape=rt.Conic(c, k), interaction=interaction, P=P,
                   material=material, **kw)


GLASS = materials.ConstantMaterial(1.5)


def _thin_lens(R1=100.0, R2=-100.0, n_glass=1.5, z0=0.0):
    return [
        sphere(1.0 / R1, 'refract', [0., 0., z0],
               material=materials.ConstantMaterial(n_glass)),
        sphere(1.0 / R2, 'refract', [0., 0., z0 + 1e-9],
               material=materials.air),
    ]


F_THIN = 1.0 / ((1.5 - 1) * (1 / 100.0 + 1 / 100.0))


# ---------- system matrix ----------------------------------------------------

def test_system_matrix_single_plane_identity():
    M, n = system_matrix([plane('eval', [0., 0., 0.])], wvl=0.55)
    np.testing.assert_allclose(np.asarray(M), np.eye(2), atol=1e-12)
    assert n == 1.0


def test_system_matrix_translation_only():
    rx = [plane('eval', [0., 0., 0.]), plane('eval', [0., 0., 10.])]
    M, n = system_matrix(rx, wvl=0.55)
    np.testing.assert_allclose(np.asarray(M), [[1.0, 10.0], [0.0, 1.0]],
                               atol=1e-12)
    assert n == 1.0


def test_system_matrix_thin_lens_power():
    M, n = system_matrix(_thin_lens(), wvl=0.55)
    M = np.asarray(M)
    np.testing.assert_allclose(M[0, 0], 1.0, atol=1e-9)
    np.testing.assert_allclose(M[1, 0], -1.0 / F_THIN, rtol=1e-6)
    assert n == pytest.approx(1.0)


def test_system_matrix_mirror_flips_index_sign():
    _, n = system_matrix([conic(1 / 200.0, -1.0, 'reflect', [0., 0., 0.])],
                         wvl=0.55)
    assert n == pytest.approx(-1.0)


def test_system_matrix_rejects_decentered_geometry():
    ld = LensData()
    ld.add_coordbreak(decenter=(1.0, 0.0, 0.0))
    ld.add(rt.Plane(), typ='eval')
    with pytest.raises(ValueError, match='centered axial'):
        system_matrix(ld.to_surfaces(), wvl=0.55)


# ---------- image distance ---------------------------------------------------

def test_image_distance_single_sphere():
    R, n_glass = 50.0, 1.5
    rx = [sphere(1.0 / R, 'refract', [0., 0., 0.],
                 material=materials.ConstantMaterial(n_glass))]
    np.testing.assert_allclose(paraxial_image_distance(rx, wvl=0.55),
                               n_glass * R / (n_glass - 1.0), rtol=1e-12)


def test_image_distance_ignores_trailing_eval_plane():
    rx = [sphere(1 / 50.0, 'refract', [0., 0., 0.], material=GLASS)]
    rx_eval = rx + [plane('eval', [0., 0., 100.])]
    np.testing.assert_allclose(paraxial_image_distance(rx_eval, wvl=0.55),
                               paraxial_image_distance(rx, wvl=0.55),
                               rtol=1e-12)


def test_image_distance_strips_compiled_image_plane():
    from prysm_tpu.x.raytracing.spencer_and_murty import _is_measurement_surf
    ld = LensData()
    ld.add(rt.Conic(1 / 50.0, 0.0), thickness=5.0, material=GLASS)
    ld.add(rt.Conic(-1 / 50.0, 0.0), thickness=95.0, material=materials.air)
    full = ld.to_surfaces()
    assert _is_measurement_surf(full[-1].typ)
    np.testing.assert_allclose(paraxial_image_distance(full, wvl=0.55),
                               paraxial_image_distance(full[:-1], wvl=0.55),
                               rtol=1e-12)


def test_image_distance_no_power_raises():
    with pytest.raises(ValueError, match='no net power'):
        paraxial_image_distance([plane('eval', [0., 0., 0.])], wvl=0.55)


def test_rc_image_distance_lands_on_design_bfl():
    efl, bfl, sep = 1500.0, 250.0, 400.0
    p = RitcheyChretien(efl=efl, bfl=bfl, separation=sep).prescription()
    rx = [conic(p.primary_curvature, p.primary_conic, 'reflect',
                [0., 0., 0.]),
          conic(p.secondary_curvature, p.secondary_conic, 'reflect',
                [0., 0., -sep])]
    bfd = paraxial_image_distance(rx, wvl=0.6328)
    np.testing.assert_allclose(-sep + bfd, bfl - sep, rtol=1e-9)


# ---------- focal lengths ----------------------------------------------------

def test_efl_thin_lens_lensmakers():
    np.testing.assert_allclose(effective_focal_length(_thin_lens(), wvl=0.55),
                               F_THIN, rtol=1e-6)


def test_paraxial_requires_resolved_wavelength():
    ld = LensData().add(rt.Conic(1 / 50.0, 0.0), typ='refr', material=GLASS)
    with pytest.raises(ValueError, match='resolved wavelength'):
        effective_focal_length(ld.to_surfaces())
    np.testing.assert_allclose(
        effective_focal_length(ld.to_surfaces(), wvl=0.6328), 100.0)


def test_paraxial_rejects_lensdata_argument():
    ld = LensData().add(rt.Conic(1 / 50.0, 0.0), typ='refr', material=GLASS)
    with pytest.raises(TypeError, match='compiled surface list'):
        effective_focal_length(ld, wvl=0.6328)


def test_object_index_scales_efl():
    c = 1 / 50.0

    def lens(n_obj):
        ld = LensData()
        ld.object_row.material = materials.ConstantMaterial(n_obj)
        ld.add(rt.Conic(c, 0.0), typ='refr', material=GLASS)
        return ld

    ld = lens(1.33)
    assert object_space_index(ld.to_surfaces(), 0.5) == pytest.approx(1.33)
    np.testing.assert_allclose(
        effective_focal_length(ld.to_surfaces(), wvl=0.5),
        1.33 / ((1.5 - 1.33) * c), rtol=1e-9)
    np.testing.assert_allclose(
        effective_focal_length(lens(1.0).to_surfaces(), wvl=0.5),
        1.0 / ((1.5 - 1.0) * c), rtol=1e-9)


def test_efl_rc_matches_design():
    efl_design, bfl, sep = 1500.0, 250.0, 400.0
    p = RitcheyChretien(efl=efl_design, bfl=bfl, separation=sep).prescription()
    rx = [conic(p.primary_curvature, p.primary_conic, 'reflect',
                [0., 0., 0.]),
          conic(p.secondary_curvature, p.secondary_conic, 'reflect',
                [0., 0., -sep])]
    np.testing.assert_allclose(abs(effective_focal_length(rx, wvl=0.55)),
                               efl_design, rtol=1e-9)


def test_bfl_matches_image_distance_for_powered_last_surface():
    rx = [sphere(1 / 50.0, 'refract', [0., 0., 0.], material=GLASS)]
    np.testing.assert_allclose(back_focal_length(rx, wvl=0.55),
                               paraxial_image_distance(rx, wvl=0.55),
                               rtol=1e-12)


def test_bfl_unchanged_by_trailing_eval_planes():
    rx = [sphere(1 / 50.0, 'refract', [0., 0., 0.], material=GLASS)]
    rx_eval = rx + [plane('eval', [0., 0., 50.]),
                    plane('eval', [0., 0., 75.])]
    np.testing.assert_allclose(back_focal_length(rx, wvl=0.55),
                               back_focal_length(rx_eval, wvl=0.55),
                               rtol=1e-12)


def test_ffl_thin_lens_magnitude():
    np.testing.assert_allclose(abs(front_focal_length(_thin_lens(),
                                                      wvl=0.55)),
                               F_THIN, rtol=1e-6)


def test_ffl_unchanged_by_leading_eval_plane():
    rx = [sphere(1 / 50.0, 'refract', [0., 0., 10.], material=GLASS)]
    rx_eval = [plane('eval', [0., 0., 0.])] + rx
    np.testing.assert_allclose(front_focal_length(rx, wvl=0.55),
                               front_focal_length(rx_eval, wvl=0.55),
                               rtol=1e-12)


def test_ffl_no_power_raises():
    with pytest.raises(ValueError, match='no powered surfaces'):
        front_focal_length([plane('eval', [0., 0., 0.])], wvl=0.55)


# ---------- astigmatic vertex curvature --------------------------------------

def test_local_vertex_curvatures_astigmatic():
    bic = Surface(shape=rt.Biconic(1 / 80.0, 1 / 50.0, 0.0, 0.0),
                  interaction='refract', P=[0., 0., 0.], material=GLASS)
    tor = Surface(shape=rt.Toroid(1 / 70.0, 1 / 40.0, 0.0, ()),
                  interaction='refract', P=[0., 0., 0.], material=GLASS)
    assert local_x_vertex_curvature(bic) == pytest.approx(1 / 80.0)
    assert local_y_vertex_curvature(bic) == pytest.approx(1 / 50.0)
    assert local_x_vertex_curvature(tor) == pytest.approx(1 / 70.0)
    assert local_y_vertex_curvature(tor) == pytest.approx(1 / 40.0)


def test_paraxial_matrix_uses_y_curvature_for_astigmats():
    for shape, cy in [(rt.Biconic(1 / 80.0, 1 / 50.0, 0.0, 0.0), 1 / 50.0),
                      (rt.Toroid(1 / 70.0, 1 / 40.0, 0.0, ()), 1 / 40.0)]:
        surf = Surface(shape=shape, interaction='refract', P=[0., 0., 0.],
                       material=GLASS)
        np.testing.assert_allclose(
            effective_focal_length([surf], wvl=0.55),
            1.0 / ((1.5 - 1.0) * cy), rtol=1e-9)


# ---------- image-space index ------------------------------------------------

def test_image_space_index_requires_image_surface():
    rx = [sphere(1 / 50.0, 'refract', [0., 0., 0.], material=GLASS)]
    with pytest.raises(ValueError, match='trailing eval image surface'):
        image_space_index(rx, 0.55)
    assert image_space_index(rx + [plane('eval', [0., 0., 100.])], 0.55) \
        == pytest.approx(1.5)


def test_image_space_index_walks_past_trailing_evals():
    rx = [
        plane('eval', [0., 0., 0.], material=materials.air),
        plane('refract', [0., 0., 1.], material=GLASS),
        plane('eval', [0., 0., 2.]),
        plane('eval', [0., 0., 3.]),
        plane('eval', [0., 0., 4.]),
    ]
    assert image_space_index(rx, 0.55) == pytest.approx(1.5)


# ---------- RitcheyChretien constraint engine --------------------------------

def test_rc_partial_and_rebuild_from_primary_geometry():
    partial = RitcheyChretien(efl=1500.0)
    assert not partial.complete
    assert partial.degrees_of_freedom == 2
    assert 'bfl' in partial.unresolved
    with pytest.raises(ValueError, match='partially determined'):
        partial.prescription()

    reference = RitcheyChretien(efl=1500.0, bfl=250.0, separation=400.0)
    rebuilt = RitcheyChretien(
        efl=reference.efl,
        primary_focal_length=reference.primary_focal_length,
        primary_to_focus=reference.primary_to_focus)
    assert rebuilt.complete
    np.testing.assert_allclose(rebuilt.bfl, reference.bfl)
    np.testing.assert_allclose(rebuilt.separation, reference.separation)

    radii = RitcheyChretien(
        separation=reference.separation,
        primary_radius=reference.primary_radius,
        secondary_radius=reference.secondary_radius)
    assert radii.complete
    np.testing.assert_allclose(radii.efl, reference.efl)
    np.testing.assert_allclose(radii.bfl, reference.bfl)


def test_rc_discrete_branches_exposed():
    reference = RitcheyChretien(efl=1500.0, bfl=250.0, separation=400.0)
    ambiguous = RitcheyChretien(
        efl=reference.efl,
        primary_to_focus=reference.primary_to_focus,
        secondary_radius=reference.secondary_radius)
    assert not ambiguous.complete
    assert ambiguous.degrees_of_freedom == 0
    assert len(ambiguous.solutions) == 2
    assert any(np.isclose(s.bfl, reference.bfl)
               and np.isclose(s.separation, reference.separation)
               for s in ambiguous.solutions)
    with pytest.raises(ValueError, match='2 discrete solutions'):
        ambiguous.prescription()


def test_rc_redundant_conflict_raises():
    with pytest.raises(ValueError, match='conflicts'):
        RitcheyChretien(efl=1500.0, bfl=250.0, separation=400.0,
                        secondary_magnification=99.0)


# ---------- first-order report -----------------------------------------------

def test_first_order_basics():
    rx = _thin_lens()
    fo = ynu_first_order(rx, wvl=0.55)
    assert isinstance(fo, FirstOrderProperties)
    counts = (fo.n_surfaces, fo.n_refractive, fo.n_reflective, fo.n_eval)
    assert counts == (2, 2, 0, 0)
    assert fo.n_image == pytest.approx(1.0)
    focal_fns = {'efl': effective_focal_length,
                 'bfl': back_focal_length,
                 'ffl': front_focal_length,
                 'paraxial_image_distance': paraxial_image_distance}
    for slot, fn in focal_fns.items():
        np.testing.assert_allclose(getattr(fo, slot), fn(rx, wvl=0.55),
                                   rtol=1e-12)
    # no epd/stop supplied: the pupil block stays unpopulated
    assert (fo.fno, fo.ep_z, fo.xp_z, fo.stop_diameter) == (None,) * 4


def test_first_order_image_distance_from_last_lens_surface():
    rx = _thin_lens()
    pid = float(paraxial_image_distance(rx, wvl=0.55))
    z_img = float(np.asarray(rx[-1].P)[2]) + pid
    fo = ynu_first_order(rx + [plane('eval', [0., 0., z_img])], wvl=0.55)
    np.testing.assert_allclose(fo.paraxial_image_distance,
                               z_img - float(np.asarray(rx[-1].P)[2]),
                               rtol=1e-9)
    np.testing.assert_allclose(fo.paraxial_image_z, z_img, atol=1e-9)


def test_first_order_fno_and_na():
    rx = _thin_lens()
    epd = 25.0
    fo = ynu_first_order(rx, wvl=0.55, epd=epd)
    assert fo.epd == pytest.approx(epd)
    assert fo.fno == pytest.approx(abs(fo.efl) / epd)
    np.testing.assert_allclose(fo.na_image, (epd / 2.0) / abs(fo.efl),
                               rtol=1e-6)


def test_first_order_stop_at_lens_pupils_at_lens():
    fo = ynu_first_order(_thin_lens(), wvl=0.55, epd=20.0, stop_index=0)
    assert fo.ep_z == pytest.approx(0.0, abs=1e-9)
    assert fo.xp_z == pytest.approx(0.0, abs=1e-6)
    assert fo.ep_diameter == pytest.approx(20.0)
    assert fo.stop_diameter == pytest.approx(20.0, rel=1e-6)
    assert fo.xp_diameter == pytest.approx(20.0, rel=1e-6)


def test_first_order_stop_behind_lens_virtual_ep():
    f = F_THIN
    t = 0.25 * f
    rx = _thin_lens() + [plane('eval', [0., 0., t])]
    stop_diameter = 10.0
    A_b = 1.0 - t / f
    fo = ynu_first_order(rx, wvl=0.55, epd=stop_diameter / abs(A_b),
                         stop_index=2)
    np.testing.assert_allclose(fo.ep_z, f / 3.0, rtol=1e-4)
    np.testing.assert_allclose(fo.stop_diameter, stop_diameter, rtol=1e-6)


def test_first_order_repr_populated_rows_only():
    fo = ynu_first_order(_thin_lens(), wvl=0.55)
    s = repr(fo)
    assert 'EFL' in s and 'BFL' in s
    assert 'F/#' not in s
    assert 'EPD' not in s
    assert 'stop diameter' not in s
