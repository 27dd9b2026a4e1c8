"""Prescription-IO depth: port of the reference io suite's intent.

Covers the behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_io.py (56 tests) and test_raytracing_io_export.py:
units scaling, aperture clipping, field-type handling, shape decoding
(asphere/biconic/toroid/zernike/xypoly), Code V keyword semantics, and
model-glass spellings — exercised against the repo parsers with the
raytracer itself as the physical check.
"""
import os
import tempfile

import numpy as onp
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.raytracing as rt
from prysm_tpu.x.raytracing import io as rio
import prysm_tpu.x.materials as mat

D_LINE = 0.5875618


def _db():
    glasses = [mat.model_glass(1.5168, 64.17, name='N-BK7'),
               mat.model_glass(1.6727, 32.2, name='N-SF5')]
    return mat.Catalog.from_materials(glasses, namespace='SCHOTT')


def _vd(m):
    nd = float(onp.asarray(m.n(D_LINE)))
    nF = float(onp.asarray(m.n(0.4861327)))
    nC = float(onp.asarray(m.n(0.6562725)))
    return (nd - 1) / (nF - nC)


def zmx_deck(surf_lines, unit='MM', header=''):
    head = f'VERS 100000 0\nMODE SEQ\nUNIT {unit}\nWAVL 0.55\n{header}'
    return (head + 'SURF 0\n  TYPE STANDARD\n  DISZ INFINITY\n'
            + surf_lines
            + f'SURF 99\n  TYPE STANDARD\n  DISZ 0.0\n')


def seq_deck(body, header='LEN\nCUM\nDIM M\nWL 550\nEPD 10\n',
             obj='SO ; THI 1E10\n'):
    return header + obj + body + 'SI\nGO\n'


# ------------------------- ZMX: units and apertures -------------------------

def test_zmx_diam_is_clear_aperture_and_clips_rays():
    deck = zmx_deck('SURF 1\n  TYPE STANDARD\n  CURV 0.0\n  DISZ 10.0\n'
                    '  DIAM 1.0\n', header='ENPD 2\n')
    pf = rio.read_zmx(deck, _is_text=True)
    assert pf.lens.rows[1].aperture.clip.radius == 1.0
    P = onp.array([[0.0, 0.0, -1.0], [0.0, 1.5, -1.0]])
    S = onp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    tr = rt.raytrace(pf.to_surfaces(), P, S, 0.55)
    st = tr.status_record
    assert st.code[0] == 0
    assert st.code[1] != 0          # clipped
    assert st.surface[1] == 2       # at the lens surface (OBJECT is 1)


def test_zmx_cm_unit_scales_all_lengths_to_mm():
    deck = zmx_deck('SURF 1\n  TYPE STANDARD\n  CURV 2.0\n  DISZ 0.5\n'
                    '  DIAM 0.2\n', unit='CM', header='ENPD 1.0\n')
    pf = rio.read_zmx(deck, _is_text=True)
    assert pf.aperture.value == 10.0                 # 1 cm EPD -> 10 mm
    s = pf.to_surfaces()
    onp.testing.assert_allclose(float(s[1].params['c']), 0.2)   # 1/cm -> 1/mm
    onp.testing.assert_allclose(float(s[2].P[2]), 5.0)          # 0.5 cm gap
    assert pf.lens.rows[1].aperture.clip.radius == 2.0


def test_zmx_meter_unit_scales():
    deck = zmx_deck('SURF 1\n  TYPE STANDARD\n  CURV 1000.0\n  DISZ 0.001\n',
                    unit='METER', header='ENPD 0.001\n')
    pf = rio.read_zmx(deck, _is_text=True)
    assert pf.aperture.value == pytest.approx(1.0)
    onp.testing.assert_allclose(float(pf.to_surfaces()[1].params['c']), 1.0)


def test_zmx_unknown_unit_raises():
    deck = zmx_deck('SURF 1\n  TYPE STANDARD\n  DISZ 1.0\n', unit='FURLONG')
    with pytest.raises(ValueError, match='unit'):
        rio.read_zmx(deck, _is_text=True)


def test_zmx_cm_coordbreak_decenters_scale():
    deck = zmx_deck('SURF 1\n  TYPE COORDBRK\n  DISZ 0.5\n  PARM 1 1.0\n'
                    '  PARM 2 2.0\nSURF 2\n  TYPE STANDARD\n  CURV 0.0\n'
                    '  DISZ 0.0\n', unit='CM')
    pf = rio.read_zmx(deck, _is_text=True)
    onp.testing.assert_allclose(
        onp.asarray(pf.to_surfaces()[1].P, float), [10.0, 20.0, 5.0])


# ------------------------- ZMX: fields -------------------------

def test_zmx_image_height_fields_unsupported():
    deck = zmx_deck('SURF 1\n  TYPE STANDARD\n  DISZ 1.0\n',
                    header='FTYP 2 0 0 0\nXFLN 1.0\nYFLN 0.0\n')
    with pytest.raises(NotImplementedError, match='image-height'):
        rio.read_zmx(deck, _is_text=True)


def test_zmx_object_height_field_sits_on_object():
    deck = ('VERS 100000 0\nMODE SEQ\nUNIT MM\nWAVL 0.55\n'
            'FTYP 1 0 0 0\nXFLN 0.0\nYFLN 2.0\n'
            'SURF 0\n  TYPE STANDARD\n  DISZ 100.0\n'
            'SURF 1\n  TYPE STANDARD\n  DISZ 0.0\n')
    pf = rio.read_zmx(deck, _is_text=True)
    f = pf.field(0)
    assert f.kind == 'height'
    assert f.hy == pytest.approx(2.0)
    assert float(f.object_z) == pytest.approx(float(pf.to_surfaces()[0].P[2]))
    # the first real surface is 100 mm downstream of the object
    assert float(pf.to_surfaces()[1].P[2]) - float(f.object_z) == \
        pytest.approx(100.0)


def test_zmx_angle_fields_parse_as_degrees():
    deck = zmx_deck('SURF 1\n  TYPE STANDARD\n  DISZ 1.0\n',
                    header='FTYP 0\nXFLN 0 0\nYFLN 0 2\n')
    pf = rio.read_zmx(deck, _is_text=True)
    assert len(pf.fields) == 2
    f = pf.field(1)
    assert f.kind == 'angle'
    assert f.hy == pytest.approx(2.0)


# ------------------------- ZMX: shapes -------------------------

def test_zmx_mirror_surface_is_reflective():
    deck = zmx_deck('SURF 1\n  TYPE STANDARD\n  CURV -0.005\n  DISZ -100.0\n'
                    '  GLAS MIRROR\n')
    pf = rio.read_zmx(deck, _is_text=True)
    from prysm_tpu.x.raytracing.spencer_and_murty import STYPE_REFLECT
    assert pf.to_surfaces()[1].typ == STYPE_REFLECT


def test_zmx_parabola_focuses_to_paraxial_focus():
    # f = R/2 = 100; on-axis collimated rays all land on axis at z=100
    deck = zmx_deck('SURF 1\n  TYPE STANDARD\n  CURV -0.005\n  CONI -1.0\n'
                    '  DISZ -100.0\n  GLAS MIRROR\n')
    pf = rio.read_zmx(deck, _is_text=True)
    surfs = pf.to_surfaces()
    ys = onp.linspace(-10, 10, 7)
    P = onp.stack([onp.zeros_like(ys), ys, onp.full_like(ys, -1.0)], axis=1)
    S = onp.tile(onp.array([0.0, 0.0, 1.0]), (ys.size, 1))
    tr = rt.raytrace(surfs, P, S, 0.55)
    onp.testing.assert_allclose(onp.asarray(tr.P[-1][:, :2], float), 0.0,
                                atol=1e-9)


def test_zmx_evenasph_coef_order():
    deck = zmx_deck('SURF 1\n  TYPE EVENASPH\n  CURV 0.01\n  CONI -0.5\n'
                    '  PARM 1 1e-06\n  PARM 2 -2e-09\n  DISZ 5.0\n'
                    'SURF 2\n  TYPE STANDARD\n  DISZ 10\n')
    pf = rio.read_zmx(deck, _is_text=True)
    s = pf.to_surfaces()[1]
    coefs = onp.asarray(s.params['coefs'], float)
    onp.testing.assert_allclose(coefs[:2], [1e-6, -2e-9])
    # sag check: z = c r^2 / (1 + sqrt(1-(1+k)c^2r^2)) + a4 r^4 + a6 r^6
    r = 3.0
    c, k = 0.01, -0.5
    want = c * r**2 / (1 + onp.sqrt(1 - (1 + k) * c * c * r * r)) \
        + 1e-6 * r**4 - 2e-9 * r**6
    got = float(onp.asarray(s.sag(onp.array(3.0), onp.array(0.0))))
    assert got == pytest.approx(want, rel=1e-12)


def test_zmx_biconic_independent_axes():
    deck = zmx_deck('SURF 1\n  TYPE BICONICX\n  CURV 0.01\n  CONI -0.5\n'
                    '  PARM 1 0.02\n  PARM 2 -1.0\n  DISZ 5.0\n'
                    'SURF 2\n  TYPE STANDARD\n  DISZ 10\n')
    pf = rio.read_zmx(deck, _is_text=True)
    p = pf.to_surfaces()[1].params
    assert float(p['c_x']) == pytest.approx(0.02)
    assert float(p['k_x']) == pytest.approx(-1.0)
    assert float(p['c_y']) == pytest.approx(0.01)
    assert float(p['k_y']) == pytest.approx(-0.5)


def test_zmx_toroid_parm1_is_rotation_radius():
    deck = zmx_deck('SURF 1\n  TYPE TOROIDAL\n  CURV 0.01\n  CONI -0.5\n'
                    '  PARM 1 200.0\n  DISZ 5.0\n'
                    'SURF 2\n  TYPE STANDARD\n  DISZ 10\n')
    pf = rio.read_zmx(deck, _is_text=True)
    p = pf.to_surfaces()[1].params
    assert float(p['c_x']) == pytest.approx(1 / 200.0)
    assert float(p['c_y']) == pytest.approx(0.01)
    assert float(p['k_y']) == pytest.approx(-0.5)


def test_zmx_unsupported_type_raises():
    deck = zmx_deck('SURF 1\n  TYPE GRINSUR\n  DISZ 5.0\n')
    with pytest.raises(NotImplementedError):
        rio.read_zmx(deck, _is_text=True)


def test_zmx_empty_raises():
    with pytest.raises((ValueError, NotImplementedError)):
        rio.read_zmx('', _is_text=True)


def test_zmx_reads_from_file_path():
    deck = zmx_deck('SURF 1\n  TYPE STANDARD\n  CURV 0.01\n  DISZ 5.0\n')
    fd, path = tempfile.mkstemp(suffix='.zmx')
    try:
        with os.fdopen(fd, 'w') as f:
            f.write(deck)
        pf = rio.read_zmx(path)
        assert len(pf.to_surfaces()) >= 3
    finally:
        os.unlink(path)


# ------------------------- ZMX: zernike + xypoly sag -------------------------

def test_zmx_zernsag_builds_surface_zernike():
    deck = zmx_deck('SURF 1\n  TYPE ZERNSAG\n  CURV 0.0\n  DISZ 5.0\n'
                    '  PARM 1 10.0\n  XDAT 1 0.0\n  XDAT 2 0.001\n'
                    'SURF 2\n  TYPE STANDARD\n  DISZ 10\n')
    pf = rio.read_zmx(deck, _is_text=True)
    s = pf.to_surfaces()[1]
    z0 = float(onp.asarray(s.sag(onp.array(0.0), onp.array(0.0))))
    z5 = float(onp.asarray(s.sag(onp.array(0.0), onp.array(5.0))))
    assert z0 != z5 or abs(z5) > 0  # the zernike term perturbs the sag


def test_zmx_zernsag_no_coefs_behaves_as_conic():
    deck = zmx_deck('SURF 1\n  TYPE ZERNSAG\n  CURV 0.01\n  CONI -0.5\n'
                    '  DISZ 5.0\n  PARM 1 10.0\n'
                    'SURF 2\n  TYPE STANDARD\n  DISZ 10\n')
    pf = rio.read_zmx(deck, _is_text=True)
    s = pf.to_surfaces()[1]
    r = 3.0
    c, k = 0.01, -0.5
    want = c * r**2 / (1 + onp.sqrt(1 - (1 + k) * c * c * r * r))
    got = float(onp.asarray(s.sag(onp.array(0.0), onp.array(r))))
    assert got == pytest.approx(want, rel=1e-10)


def test_zmx_xypoly_builds_surface_xy():
    deck = zmx_deck('SURF 1\n  TYPE XYPOLY\n  CURV 0.0\n  DISZ 5.0\n'
                    '  PARM 1 10.0\n  XDAT 2 0.01\n'
                    'SURF 2\n  TYPE STANDARD\n  DISZ 10\n')
    pf = rio.read_zmx(deck, _is_text=True)
    s = pf.to_surfaces()[1]
    zx = float(onp.asarray(s.sag(onp.array(4.0), onp.array(0.0))))
    zy = float(onp.asarray(s.sag(onp.array(0.0), onp.array(4.0))))
    assert zx != pytest.approx(zy)  # an x-linear (or x-leading) term


# ------------------------- SEQ: apertures and scaling -------------------------

def test_seq_cao_clips():
    sm = rio.read_seq(seq_deck('S ; CUY 0.0 ; THI 10 ; CAO 1.0\n'),
                      _is_text=True)
    assert sm.lens.rows[1].aperture.clip.radius == 1.0
    P = onp.array([[0.0, 0.0, -1.0], [0.0, 1.5, -1.0]])
    S = onp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    tr = rt.raytrace(sm.to_surfaces(), P, S, 0.55)
    st = tr.status_record
    assert st.code[0] == 0 and st.code[1] != 0


def test_seq_cir_sets_clear_aperture():
    sm = rio.read_seq(seq_deck('S ; CUY 0.01 ; THI 5 ; CIR 8\n'),
                      _is_text=True)
    assert sm.lens.rows[1].aperture.clip.radius == 8.0


def test_seq_cm_lengths_scale_to_mm():
    # Code V single-letter C spelling of centimeters
    deck = seq_deck('S ; CUY 0.2 ; THI 0.5 ; CAO 0.2\n',
                    header='LEN\nCUM\nDIM C\nWL 550\nEPD 1\n')
    sm = rio.read_seq(deck, _is_text=True)
    assert sm.aperture.value == pytest.approx(10.0)
    onp.testing.assert_allclose(float(sm.to_surfaces()[1].params['c']), 0.02)
    onp.testing.assert_allclose(float(sm.to_surfaces()[2].P[2]), 5.0)
    assert sm.lens.rows[1].aperture.clip.radius == pytest.approx(2.0)


def test_seq_sto_marks_the_open_surface():
    # STO applies to the surface block it follows (Code V semantics)
    deck = seq_deck('S ; CUY 0.01 ; THI 5\nS ; CUY -0.01 ; THI 50\nSTO\n')
    sm = rio.read_seq(deck, _is_text=True)
    assert sm.stop_index == 2
    deck1 = seq_deck('S ; CUY 0.01 ; THI 5\nSTO\nS ; CUY -0.01 ; THI 50\n')
    assert rio.read_seq(deck1, _is_text=True).stop_index == 1


def test_seq_stop_without_object_row():
    deck = ('LEN\nCUM\nDIM M\nWL 550\nEPD 10\n'
            'S ; CUY 0.01 ; THI 5\nSTO\nS ; CUY -0.01 ; THI 50\nSI\nGO\n')
    sm = rio.read_seq(deck, _is_text=True)
    assert sm.stop_index >= 1     # parses; stop lands on the STO surface


# ------------------------- SEQ: header semantics -------------------------

def test_seq_wavelengths_nm_to_um_and_reference():
    deck = seq_deck('S ; CUY 0.01 ; THI 5\n',
                    header='LEN\nCUM\nDIM M\nWL 486.1 587.6 656.3\nREF 2\n'
                           'EPD 10\n')
    sm = rio.read_seq(deck, _is_text=True)
    onp.testing.assert_allclose(onp.asarray(sm.wavelengths, float),
                                [0.4861, 0.5876, 0.6563])
    assert sm.reference == 1      # REF is 1-based in the deck


def test_seq_wtw_weights():
    deck = seq_deck('S ; CUY 0.01 ; THI 5\n',
                    header='LEN\nCUM\nDIM M\nWL 486.1 587.6 656.3\n'
                           'WTW 1 2 1\nEPD 10\n')
    sm = rio.read_seq(deck, _is_text=True)
    onp.testing.assert_allclose(onp.asarray(sm.weights, float), [1, 2, 1])


def test_seq_fno_becomes_image_space_fnumber():
    deck = seq_deck('S ; CUY 0.01 ; THI 50\n',
                    header='LEN\nCUM\nDIM M\nWL 550\nFNO 5\n')
    sm = rio.read_seq(deck, _is_text=True)
    assert 'FNO' in repr(sm.aperture)
    assert sm.aperture.value == pytest.approx(5.0)


def test_seq_yan_becomes_field_list():
    deck = seq_deck('S ; CUY 0.01 ; THI 5\n',
                    header='LEN\nCUM\nDIM M\nWL 550\nEPD 10\nYAN 0 1 2\n')
    sm = rio.read_seq(deck, _is_text=True)
    assert len(sm.fields) == 3
    assert sm.field(2).hy == pytest.approx(2.0)


def test_seq_vignetting_factors_attach_to_fields():
    deck = seq_deck('S ; CUY 0.01 ; THI 50\n',
                    header='LEN\nCUM\nDIM M\nWL 550\nEPD 10\nYAN 0 2\n'
                           'VUY 0.0 0.1\nVLY 0.0 0.2\n')
    sm = rio.read_seq(deck, _is_text=True)
    f0, f1 = sm.field(0), sm.field(1)
    assert f1.vignetting is not None
    assert f1.vignetting.get('vuy', 0.0) == pytest.approx(0.1)
    assert f1.vignetting.get('vly', 0.0) == pytest.approx(0.2)


def test_seq_vignetting_compresses_launched_pupil():
    deck = seq_deck('S ; CUY 0.0 ; THI 50\n',
                    header='LEN\nCUM\nDIM M\nWL 550\nEPD 10\nYAN 0 2\n'
                           'VUY 0.0 0.5\n')
    sm = rio.read_seq(deck, _is_text=True)
    P0, _ = rt.launch(sm, sm.field(0), 0.55, rt.Sampling.rect(9))
    P1, _ = rt.launch(sm, sm.field(1), 0.55, rt.Sampling.rect(9))
    # VUY=0.5 halves the +y half of the pupil for field 1
    assert float(onp.max(onp.asarray(P1[:, 1]))) < \
        float(onp.max(onp.asarray(P0[:, 1])))


def test_seq_empty_raises():
    with pytest.raises((ValueError, NotImplementedError)):
        rio.read_seq('', _is_text=True)


def test_seq_reads_from_file_path():
    deck = seq_deck('S ; CUY 0.01 ; THI 5\n')
    fd, path = tempfile.mkstemp(suffix='.seq')
    try:
        with os.fdopen(fd, 'w') as f:
            f.write(deck)
        sm = rio.read_seq(path)
        assert len(sm.to_surfaces()) >= 3
    finally:
        os.unlink(path)


# ------------------------- SEQ: shapes -------------------------

def test_seq_mirror_keyword_reflective():
    sm = rio.read_seq(seq_deck('S ; CUY -0.005 ; THI -100 ; GLA REFL\n'),
                      _is_text=True)
    from prysm_tpu.x.raytracing.spencer_and_murty import STYPE_REFLECT
    assert sm.to_surfaces()[1].typ == STYPE_REFLECT


def test_seq_parabola_focuses_on_axis():
    sm = rio.read_seq(
        seq_deck('S ; CUY -0.005 ; K -1 ; THI -100 ; GLA REFL\n'),
        _is_text=True)
    surfs = sm.to_surfaces()
    ys = onp.linspace(-10, 10, 7)
    P = onp.stack([onp.zeros_like(ys), ys, onp.full_like(ys, -1.0)], axis=1)
    S = onp.tile(onp.array([0.0, 0.0, 1.0]), (ys.size, 1))
    tr = rt.raytrace(surfs, P, S, 0.55)
    onp.testing.assert_allclose(onp.asarray(tr.P[-1][:, :2], float), 0.0,
                                atol=1e-9)


def test_seq_K_sets_conic():
    sm = rio.read_seq(seq_deck('S ; CUY 0.01 ; K -1 ; CCY 0 ; THI 5\n'),
                      _is_text=True)
    p = sm.to_surfaces()[1].params
    assert float(p['k']) == pytest.approx(-1.0)   # CCY is a control code


def test_seq_A_through_C_coefs_become_asphere():
    sm = rio.read_seq(
        seq_deck('S ; CUY 0.01 ; K -0.5 ; A 1e-6 ; B -2e-9 ; C 1e-12 ; '
                 'THI 5\n'),
        _is_text=True)
    s = sm.to_surfaces()[1]
    coefs = onp.asarray(s.params['coefs'], float)
    onp.testing.assert_allclose(coefs[:3], [1e-6, -2e-9, 1e-12])


def test_seq_biconic_when_x_axis_present():
    sm = rio.read_seq(
        seq_deck('S ; CUY 0.01 ; CUX 0.02 ; K -0.5 ; KX -1.0 ; THI 5\n'),
        _is_text=True)
    p = sm.to_surfaces()[1].params
    assert float(p['c_x']) == pytest.approx(0.02)
    assert float(p['k_x']) == pytest.approx(-1.0)


def test_seq_zfr_builds_zernike_surface():
    sm = rio.read_seq(
        seq_deck('S ; CUY 0.0 ; THI 5 ; SPS ZFR ; NRADIUS 10 ; '
                 'ZFR 0 0 0 0.001\n'),
        _is_text=True)
    s = sm.to_surfaces()[1]
    z = float(onp.asarray(s.sag(onp.array(0.0), onp.array(5.0))))
    assert z != 0.0


def test_seq_xyp_builds_surface_xy():
    sm = rio.read_seq(
        seq_deck('S ; CUY 0.0 ; THI 5 ; SPS XYP ; NRADIUS 10 ; '
                 'XYP 0 0.01\n'),
        _is_text=True)
    s = sm.to_surfaces()[1]
    got = float(onp.asarray(s.sag(onp.array(4.0), onp.array(0.0)))) \
        + float(onp.asarray(s.sag(onp.array(0.0), onp.array(4.0))))
    assert got != 0.0


# ------------------------- SEQ: decenters -------------------------

def test_seq_decentered_surface_has_decenter():
    sm = rio.read_seq(
        seq_deck('S ; CUY 0.01 ; THI 5 ; XDE 0.1 ; YDE 0.2\n'
                 'S ; CUY -0.01 ; THI 50\n'),
        _is_text=True)
    P = onp.asarray(sm.to_surfaces()[1].P, float)
    onp.testing.assert_allclose(P[:2], [0.1, 0.2], atol=1e-12)


def test_seq_rotated_surface_has_rotation():
    sm = rio.read_seq(
        seq_deck('S ; CUY 0.01 ; THI 5 ; ADE 1.0\n'
                 'S ; CUY -0.01 ; THI 50\n'),
        _is_text=True)
    R = onp.asarray(sm.to_surfaces()[1].R, float)
    assert not onp.allclose(R, onp.eye(3))


def test_seq_undecentered_surface_identity_rotation():
    sm = rio.read_seq(seq_deck('S ; CUY 0.01 ; THI 5\n'), _is_text=True)
    R = sm.to_surfaces()[1].R
    if R is not None:   # None encodes the identity (no rotation applied)
        onp.testing.assert_allclose(onp.asarray(R, float), onp.eye(3),
                                    atol=1e-15)


def test_seq_dar_keeps_following_surfaces_on_axis():
    # DAR: decenter-and-return — the break is local to that surface
    sm = rio.read_seq(
        seq_deck('S ; CUY 0.01 ; THI 5 ; DAR ; YDE 0.5\n'
                 'S ; CUY -0.01 ; THI 50\n'),
        _is_text=True)
    surfs = sm.to_surfaces()
    onp.testing.assert_allclose(float(surfs[1].P[1]), 0.5)
    onp.testing.assert_allclose(float(surfs[2].P[1]), 0.0, atol=1e-12)


# ------------------------- SEQ: glasses -------------------------

def test_seq_positional_radius_thickness_glass():
    # Code V surfaces also accept positional S <radius> <thickness> <glass>;
    # in the default RDM mode the leading number is a radius
    deck = seq_deck('S 100.0 5.0 NBK7_SCHOTT\nS -200.0 50.0\n',
                    header='LEN\nRDM\nDIM M\nWL 550\nEPD 10\n')
    sm = rio.read_seq(deck, _is_text=True, database=_db())
    s = sm.to_surfaces()[1]
    assert float(s.params['c']) == pytest.approx(0.01)
    assert float(onp.asarray(s.material.n(D_LINE))) == \
        pytest.approx(1.5168, abs=1e-4)


def test_seq_model_glass_six_digit():
    sm = rio.read_seq(
        seq_deck('S ; CUY 0.01 ; THI 5 ; GLA 658327\nS ; CUY -0.01 ; '
                 'THI 50\n'),
        _is_text=True)
    m = sm.to_surfaces()[1].material
    assert float(onp.asarray(m.n(D_LINE))) == pytest.approx(1.658, abs=1e-9)
    assert _vd(m) == pytest.approx(32.7, rel=1e-6)


def test_seq_model_glass_dotted():
    sm = rio.read_seq(
        seq_deck('S ; CUY 0.01 ; THI 5 ; GLA 658000.327000\n'
                 'S ; CUY -0.01 ; THI 50\n'),
        _is_text=True)
    m = sm.to_surfaces()[1].material
    assert float(onp.asarray(m.n(D_LINE))) == pytest.approx(1.658, abs=1e-9)
    assert _vd(m) == pytest.approx(32.7, rel=1e-6)


def test_seq_model_glass_colon():
    sm = rio.read_seq(
        seq_deck('S ; CUY 0.01 ; THI 5 ; GLA 1.658:32.7\n'
                 'S ; CUY -0.01 ; THI 50\n'),
        _is_text=True)
    m = sm.to_surfaces()[1].material
    assert float(onp.asarray(m.n(D_LINE))) == pytest.approx(1.658, abs=1e-9)


def test_seq_model_glass_six_digit_with_vendor_suffix():
    sm = rio.read_seq(
        seq_deck('S ; CUY 0.01 ; THI 5 ; GLA 678552_SCHOTT\n'
                 'S ; CUY -0.01 ; THI 50\n'),
        _is_text=True)
    m = sm.to_surfaces()[1].material
    assert float(onp.asarray(m.n(D_LINE))) == pytest.approx(1.678, abs=1e-9)
    assert _vd(m) == pytest.approx(55.2, rel=1e-6)


def test_seq_vendor_suffix_disambiguates():
    schott = mat.Catalog.from_materials([
        mat.ConstantMaterial(1.111, name='LAF3', catalog='SCHOTT'),
    ])
    hoya = mat.Catalog.from_materials([
        mat.ConstantMaterial(1.333, name='LAF3', catalog='HOYA'),
    ])
    chain = mat.CatalogChain([schott, hoya])
    sm = rio.read_seq(
        seq_deck('S ; CUY 0.01 ; THI 5 ; GLA LAF3_SCHOTT\n'
                 'S ; CUY -0.01 ; THI 50\n'),
        _is_text=True, database=chain)
    assert float(onp.asarray(sm.to_surfaces()[1].material.n(0.55))) == \
        pytest.approx(1.111)


def test_seq_glass_catalog_suffix_stripped():
    sm = rio.read_seq(
        seq_deck('S ; CUY 0.01 ; THI 5 ; GLA NBK7_SCHOTT\n'
                 'S ; CUY -0.01 ; THI 50\n'),
        _is_text=True, database=_db())
    m = sm.to_surfaces()[1].material
    assert float(onp.asarray(m.n(D_LINE))) == pytest.approx(1.5168, abs=1e-4)


# ------------------------- export round trips -------------------------

def test_write_zmx_preserves_first_order():
    db = _db()
    lens = rt.LensData()
    lens.add(rt.Sphere(1 / 62.0), thickness=6.0, material=db['N-BK7'],
             aperture=11.0)
    lens.add(rt.Sphere(-1 / 128.0), thickness=95.6, material=mat.air)
    sys_ = rt.OpticalSystem(lens, aperture=20.0, fields=[0.0, 2.0],
                            wavelengths=[0.5876], stop_index=1,
                            title='rt')
    back = rio.read_zmx(rio.write_zmx(sys_), _is_text=True, database=db)
    # %g curvature formatting bounds the roundtrip at ~6 significant digits
    assert back._ynu_first_order().efl == \
        pytest.approx(sys_._ynu_first_order().efl, rel=1e-5)


def test_write_seq_preserves_first_order():
    db = _db()
    lens = rt.LensData()
    lens.add(rt.Sphere(1 / 62.0), thickness=6.0, material=db['N-BK7'],
             aperture=11.0)
    lens.add(rt.Sphere(-1 / 128.0), thickness=95.6, material=mat.air)
    sys_ = rt.OpticalSystem(lens, aperture=20.0, fields=[0.0, 2.0],
                            wavelengths=[0.5876], stop_index=1)
    back = rio.read_seq(rio.write_seq(sys_), _is_text=True, database=db)
    assert back._ynu_first_order().efl == \
        pytest.approx(sys_._ynu_first_order().efl, rel=1e-5)


def test_write_zmx_stop_and_title_roundtrip():
    db = _db()
    lens = rt.LensData()
    lens.add(rt.Sphere(0.01), thickness=5.0, material=db['N-BK7'])
    lens.add(rt.Sphere(0.0), thickness=10.0, material=mat.air)
    sys_ = rt.OpticalSystem(lens, aperture=10.0, wavelengths=[0.55],
                            stop_index=2, title='hello stop')
    text = rio.write_zmx(sys_)
    back = rio.read_zmx(text, _is_text=True, database=db)
    assert back.title == 'hello stop'
    assert back.stop_index == 2


def test_write_seq_mirror_fold_roundtrip():
    lens = rt.LensData()
    lens.add(rt.Sphere(-1 / 200.0), thickness=100.0, material=mat.MIRROR,
             aperture=40.0)
    sys_ = rt.OpticalSystem(lens, aperture=60.0, wavelengths=[0.6328],
                            stop_index=1)
    text = rio.write_seq(sys_)
    assert 'GLA REFL' in text
    back = rio.read_seq(text, _is_text=True)
    onp.testing.assert_allclose(
        onp.asarray(back.to_surfaces()[-1].P, float),
        onp.asarray(sys_.to_surfaces()[-1].P, float), atol=1e-9)


def test_write_zmx_wavelengths_roundtrip():
    db = _db()
    lens = rt.LensData()
    lens.add(rt.Sphere(0.01), thickness=5.0, material=db['N-BK7'])
    lens.add(rt.Sphere(0.0), thickness=10.0, material=mat.air)
    sys_ = rt.OpticalSystem(lens, aperture=10.0,
                            wavelengths=[0.4861, 0.5876, 0.6563],
                            stop_index=1)
    back = rio.read_zmx(rio.write_zmx(sys_), _is_text=True, database=db)
    onp.testing.assert_allclose(onp.asarray(back.wavelengths, float),
                                [0.4861, 0.5876, 0.6563], atol=1e-9)
