"""Trace-grid iterator depth: port of the reference suite's intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_trace_grid.py (16 tests): grid indexing, defaulting
from system metadata, validity masking, bit-equality with the
open-coded launch+trace path, trace_cell, resolution helpers, and
layout records.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
import prysm_tpu.x.raytracing as rt
from prysm_tpu.x.raytracing import ApertureSpec, Field, LensData, OpticalSystem
from prysm_tpu.x.raytracing.surfaces import Conic, Plane, Surface, \
    circular_aperture
from prysm_tpu.x.raytracing.launch import Sampling, launch
from prysm_tpu.x.raytracing.spencer_and_murty import raytrace, valid_mask
from prysm_tpu.x.raytracing._trace_grid import (
    TraceRecord, _require_epd, _resolve_fields, _resolve_wavelengths,
    iter_trace_grid, layout_records, trace_cell)


def _np(x):
    return np.asarray(x)


def _singlet_system(fields=None, wavelengths=None, ref=1):
    lens = LensData()
    (lens.add(Conic(1 / 50.0, 0.0), typ='refr',
              material=materials.ConstantMaterial(1.5168), thickness=5.0)
         .add(Conic(-1 / 50.0, 0.0), typ='refr', material=materials.air,
              thickness=95.0)
         .add(Plane(), typ='eval'))
    if fields is None:
        fields = [Field(0, 0), Field(0, 3)]
    if wavelengths is None:
        wavelengths = [0.4861, 0.5876, 0.6563]
    return OpticalSystem(lens, aperture=ApertureSpec.epd(10.0),
                         fields=fields, wavelengths=wavelengths,
                         reference=ref, stop_index=0)


def _bare_singlet():
    def conic(c, k, interaction, P, material=None):
        return Surface(shape=Conic(c, k), interaction=interaction, P=P,
                       material=material)
    return [
        conic(1 / 50.0, 0.0, 'refract', [0, 0, 0],
              material=materials.ConstantMaterial(1.5)),
        conic(-1 / 50.0, 0.0, 'refract', [0, 0, 5.0],
              material=materials.air),
        Surface(shape=Plane(), interaction='eval', P=[0, 0, 100.0]),
    ]


# ---------- shape and indexing -----------------------------------------------

def test_grid_row_major_indices_and_count():
    sys_ = _singlet_system()
    records = list(iter_trace_grid(sys_, None, None, Sampling.hex(nrings=2)))
    assert len(records) == 2 * 3
    assert [(r.i, r.j) for r in records] == \
        [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)]
    for r in records:
        assert isinstance(r, TraceRecord)


def test_grid_records_carry_field_and_wavelength():
    fields = [Field(0, 0), Field(0, 3)]
    sys_ = _singlet_system(fields=fields)
    records = list(iter_trace_grid(sys_, fields, [0.5876], Sampling.chief()))
    assert [r.wvl for r in records] == [0.5876, 0.5876]
    assert records[0].field is fields[0]
    assert records[1].field is fields[1]


# ---------- defaulting -------------------------------------------------------

def test_grid_defaults_from_system():
    sys_ = _singlet_system()
    records = list(iter_trace_grid(sys_, None, None, Sampling.chief()))
    assert len({r.i for r in records}) == 2
    np.testing.assert_allclose(sorted({r.wvl for r in records}),
                               sorted([0.4861, 0.5876, 0.6563]))


def test_grid_defaults_epd_from_aperture_spec():
    sys_ = _singlet_system()
    r = next(iter_trace_grid(sys_, [Field(0, 0)], [0.5876],
                             Sampling.chief()))
    assert r.epd == pytest.approx(10.0)


def test_bare_prescription_defaults_fields_requires_wavelengths():
    presc = _bare_singlet()
    records = list(iter_trace_grid(presc, None, [0.6328], Sampling.chief(),
                                   epd=4.0))
    assert len(records) == 1
    r = records[0]
    assert (r.field.hx, r.field.hy) == (0.0, 0.0)
    assert r.wvl == pytest.approx(0.6328)
    with pytest.raises(TypeError, match='pass wavelengths='):
        list(iter_trace_grid(presc, None, None, Sampling.chief(), epd=4.0))


def test_require_epd_raises_without_epd_or_system():
    presc = _bare_singlet()
    with pytest.raises(TypeError, match='epd is required'):
        list(iter_trace_grid(presc, [Field(0, 0)], [0.5876],
                             Sampling.hex(nrings=2)))


# ---------- validity ---------------------------------------------------------

def test_grid_valid_mask_clean_trace():
    sys_ = _singlet_system()
    r = next(iter_trace_grid(sys_, [Field(0, 0)], [0.5876],
                             Sampling.hex(nrings=3)))
    valid = _np(r.valid)
    assert valid.dtype == bool
    assert valid.all()
    assert valid.shape[0] == _np(r.P).shape[0]


def test_grid_valid_mask_flags_clipped():
    presc = _bare_singlet()
    presc[0].aperture = circular_aperture(1.5)
    r = next(iter_trace_grid(presc, [Field(0, 0)], [0.55],
                             Sampling.hex(nrings=4), epd=8.0))
    valid = _np(r.valid)
    assert not valid.all() and valid.any()
    expected = _np(valid_mask(r.trace.status, r.trace.P[-1]))
    np.testing.assert_array_equal(valid, expected)


# ---------- bit-equality -----------------------------------------------------

def test_grid_cell_matches_open_coded_path():
    sys_ = _singlet_system()
    field = Field(0, 3)
    wvl = 0.5876
    sampling = Sampling.fan(n=11, axis='y')
    epd = _require_epd(sys_, None, wvl)
    P_ref, S_ref = launch(sys_, field, wvl, sampling, epd=epd)
    tr_ref = sys_.trace(P_ref, S_ref, wvl)
    r = next(iter_trace_grid(sys_, [field], [wvl], sampling))
    np.testing.assert_array_equal(_np(r.P), _np(P_ref))
    np.testing.assert_array_equal(_np(r.S), _np(S_ref))
    np.testing.assert_array_equal(_np(r.trace.P), _np(tr_ref.P))
    np.testing.assert_array_equal(_np(r.trace.S), _np(tr_ref.S))


# ---------- trace_cell -------------------------------------------------------

def test_trace_cell_single_bundle():
    r = trace_cell(_singlet_system(), Field(0, 0), 0.5876,
                   Sampling.hex(nrings=2))
    assert isinstance(r, TraceRecord)
    assert (r.i, r.j) == (0, 0)
    assert _np(r.valid).all()


def test_trace_cell_custom_trace_fn():
    calls = {'n': 0}

    def counting_trace(surfaces, P, S, wvl):
        calls['n'] += 1
        return raytrace(surfaces, P, S, wvl)

    trace_cell(_singlet_system(), Field(0, 0), 0.5876, Sampling.chief(),
               trace_fn=counting_trace)
    assert calls['n'] == 1


def test_explicit_epd_overrides_system():
    r = next(iter_trace_grid(_singlet_system(), [Field(0, 0)], [0.5876],
                             Sampling.hex(nrings=2), epd=6.0))
    assert r.epd == pytest.approx(6.0)


# ---------- resolution helpers -----------------------------------------------

def test_resolve_fields_idempotent():
    fields = [Field(0, 0), Field(0, 2)]
    assert _resolve_fields(None, fields) == fields


def test_resolve_wavelengths_casts_float():
    out = _resolve_wavelengths(None, [1, 2])
    assert out == [1.0, 2.0]
    assert all(isinstance(w, float) for w in out)


# ---------- layout records ---------------------------------------------------

def test_layout_records_one_fan_per_field_plus_footprint():
    sys_ = _singlet_system()
    records, outline = layout_records(sys_, sampling=5)
    assert len(records) == len(sys_.fields)
    for r in records:
        assert _np(r.trace.P).shape[1] == 5
        np.testing.assert_array_equal(
            _np(r.valid), _np(valid_mask(r.trace.status, r.trace.P[-1])))
    assert _np(outline.P).shape[1] == 5 * len(sys_.fields)
    assert _np(outline.S).shape[1] == 5 * len(sys_.fields)


def test_layout_records_footprint_nans_clipped():
    lens = LensData()
    (lens.add(Conic(1 / 50.0, 0.0), typ='refr', aperture=3.0,
              material=materials.ConstantMaterial(1.5168), thickness=5.0)
         .add(Conic(-1 / 50.0, 0.0), typ='refr', material=materials.air,
              thickness=95.0)
         .add(Plane(), typ='eval'))
    sys_ = OpticalSystem(lens, aperture=ApertureSpec.epd(10.0),
                         fields=[Field(0, 0)], wavelengths=[0.5876],
                         reference=0, stop_index=0)
    records, outline = layout_records(sys_, sampling=9)
    r = records[0]
    valid = _np(r.valid)
    assert not valid.all() and valid.any()
    assert np.isnan(_np(outline.P)[:, ~valid, :]).all()
    np.testing.assert_array_equal(_np(outline.P)[:, valid, :],
                                  _np(r.trace.P)[:, valid, :])
