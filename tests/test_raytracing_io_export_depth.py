"""LensData -> .seq / .zmx export round-trips: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_io_export.py (13 tests): round trips on the
rotationally symmetric subset including the post-mirror sign
convention, Code V alpha/beta tilt signs, strict-export objection
aggregation, semantic metadata round trips, stop mapping past
coordinate breaks, and finite object conjugates.  The behaviors are
the reference's; the harness (builders, parametrized round-trip
driver) is this repo's own.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as pm
from prysm_tpu.x.raytracing import (
    ApertureSpec, Field, LensData, LinearGrating, OpticalSystem)
from prysm_tpu.x.raytracing.io import read_seq, read_zmx, write_seq, write_zmx
from prysm_tpu.x.raytracing.surfaces import Conic, EvenAsphere, Plane

CODECS = {'seq': (write_seq, read_seq), 'zmx': (write_zmx, read_zmx)}


def roundtrip(fmt, system, **reader_kw):
    writer, reader = CODECS[fmt]
    return reader(writer(system), _is_text=True, **reader_kw)


def singlet_rx(rows=None, epd=10.0):
    """The shared biconic singlet wrapped in a system."""
    if rows is None:
        rows = LensData()
    rows.add(Conic(1 / 50.0, 0.0), thickness=5.0, material=pm.air)
    rows.add(Conic(-1 / 50.0, -0.5), thickness=95.0, material=pm.air)
    return OpticalSystem(rows, aperture=epd, wavelengths=[0.55])


def fold_rx():
    rows = LensData()
    rows.add(Conic(1 / 200.0, -1.0), typ='refl', thickness=50.0)
    return OpticalSystem(rows, aperture=10.0, wavelengths=[0.55])


def same_geometry(original, recovered):
    """Geometry (typ, pose, c, k) equality over compiled surfaces."""
    left, right = original.surfaces, recovered.surfaces
    assert len(left) == len(right)
    for one, two in zip(left, right):
        assert one.typ == two.typ
        np.testing.assert_allclose(np.asarray(one.P), np.asarray(two.P),
                                   atol=1e-9)
        p1 = one.params or {}
        p2 = two.params or {}
        for key in ('c', 'k'):
            if key in p1 or key in p2:
                np.testing.assert_allclose(
                    np.asarray(p1.get(key, 0.0), dtype=float),
                    np.asarray(p2.get(key, 0.0), dtype=float))


# ---------- round trips -------------------------------------------------------

@pytest.mark.parametrize('fmt', CODECS)
def test_round_trip_refractive(fmt):
    src = singlet_rx()
    back = roundtrip(fmt, src)
    same_geometry(src, back)
    assert back.epd == 10.0


@pytest.mark.parametrize('fmt, marker', [('seq', 'REFL'),
                                         ('zmx', 'MIRROR')])
def test_round_trip_mirror_sign_convention(fmt, marker):
    src = fold_rx()
    writer, reader = CODECS[fmt]
    text = writer(src)
    assert marker in text
    back = reader(text, _is_text=True)
    same_geometry(src, back)
    # the image lands at negative z (folded), like the original
    z_img = float(np.asarray(back.surfaces[-1].P)[2])
    assert z_img == pytest.approx(-50.0)


def test_seq_round_trip_codev_alpha_beta_signs():
    deck = ('LEN\nCUM\nSO ; THI 1E10\n'
            'S ; CUY 0 ; THI 0 ; ADE 5 ; BDE -2 ; CDE 3\nSI\nGO\n')
    back = roundtrip('seq', read_seq(deck, _is_text=True))
    tilt = np.asarray(back.rows[1].tilt)   # rows[0] is OBJECT
    np.testing.assert_allclose(tilt, [3.0, 2.0, -5.0])


@pytest.mark.parametrize('fmt', CODECS)
def test_export_rejects_unsupported_shape_without_loss(fmt):
    rows = LensData()
    rows.add(EvenAsphere(0.01, 0.0, (1e-4,)), thickness=1.0,
             material=pm.air)
    with pytest.raises(NotImplementedError, match='even_asphere'):
        CODECS[fmt][0](rows)


def test_zmx_export_carries_stop_index():
    src = singlet_rx()
    src.stop_index = 1
    assert roundtrip('zmx', src).stop_index == 1


def test_zmx_export_maps_stop_index_past_coordbreak():
    rows = LensData()
    rows.add_coordbreak(decenter=(1.0, 0.0, 0.0), thickness=0.0)  # row 1
    rows.add(Plane(), typ='eval')
    src = OpticalSystem(rows, stop_index=1)
    text = write_zmx(src)
    assert 'STOP 2\n' in text
    assert read_zmx(text, _is_text=True).stop_index == 1


# ---------- semantic metadata -------------------------------------------------

class _Catalog1:
    """Catalog resolving exactly one name to a ConstantMaterial."""

    def __init__(self, name, index):
        self._only = name
        self.material = pm.ConstantMaterial(index, name=name)

    def material_for_name(self, name, **kwargs):
        if name != self._only:
            raise KeyError(name)
        return self.material


def immersed_rx(object_medium=None):
    rows = LensData()
    rows.object_row.thickness = 50.0
    if object_medium is not None:
        rows.object_row.material = object_medium
    return singlet_rx(rows)


def decorated_rx():
    rows = LensData()
    rows.add(Conic(1 / 50.0, 0.0), thickness=5.0, material=pm.air,
             aperture=8.0)
    rows.add(Conic(-1 / 50.0, -0.5), thickness=95.0, material=pm.air,
             aperture=7.0)
    return OpticalSystem(
        rows, aperture=10.0,
        fields=[Field(0.0, 0.0), Field(1.5, 3.0)],
        wavelengths=[0.4861, 0.5876, 0.6563],
        weights=[0.25, 1.0, 0.5], reference=1, stop_index=1,
        title='semantic round trip')


@pytest.mark.parametrize('fmt', CODECS)
def test_semantic_metadata_round_trip(fmt):
    src = decorated_rx()
    back = roundtrip(fmt, src)
    same_geometry(src, back)
    assert back.title == src.title
    np.testing.assert_allclose(np.asarray(back.wavelengths),
                               np.asarray(src.wavelengths))
    np.testing.assert_allclose(np.asarray(back.weights),
                               np.asarray(src.weights))
    assert (back.reference, back.stop_index) == (src.reference,
                                                 src.stop_index)
    keys = [(f.hx, f.hy, f.kind, f.unit) for f in src.fields]
    assert [(f.hx, f.hy, f.kind, f.unit) for f in back.fields] == keys
    assert back.rows[1].aperture.clip.radius == pytest.approx(8.0)
    assert back.rows[2].aperture.clip.radius == pytest.approx(7.0)


@pytest.mark.parametrize('fmt', CODECS)
def test_strict_export_reports_all_unsupported_semantics(fmt):
    class Anon:
        def n(self, wavelength):
            return 1.5

    rows = LensData()
    rows.add(EvenAsphere(0.01, 0.0, (1e-4,)), thickness=1.0,
             material=Anon(), grating=LinearGrating(0.01),
             coating=object())
    src = OpticalSystem(
        rows, aperture=ApertureSpec.fno(4.0),
        fields=[Field(0.0, 0.1, unit='rad')], wavelengths=[0.55],
        extras={'UNSUPPORTED': ['value']})
    with pytest.raises(NotImplementedError) as caught:
        CODECS[fmt][0](src)
    text = str(caught.value)
    objections = ('shape even_asphere', 'OPLFunc/grating', 'coating stack',
                  'material lacks an external catalog name',
                  'aperture mode', 'angular unit', 'system extras')
    missing = [o for o in objections if o not in text]
    assert not missing, missing


@pytest.mark.parametrize('fmt', CODECS)
def test_round_trip_finite_object_conjugate(fmt):
    db = _Catalog1('BK7', 1.6)
    src = immersed_rx(object_medium=db.material)
    back = roundtrip(fmt, src, database=db)
    assert back.rows[0].thickness == pytest.approx(50.0)
    assert back.rows[0].material is not pm.air
    assert back.rows[0].material is not pm.vacuum
