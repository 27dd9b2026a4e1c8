"""Shared field/wavelength trace-grid helpers.

Rebuild of ``prysm/x/raytracing/_trace_grid.py``.
"""
import math

import numpy as np

from .spencer_and_murty import raytrace, valid_mask
from .launch import Field, Sampling, launch
from ._resolve import compiled_surfaces, resolve_wavelength, trace_context


def _resolve_fields(system, fields):
    """Fields to evaluate, defaulting to the system FieldSet, else on-axis."""
    if fields is not None:
        resolved = list(fields)
        if not resolved:
            raise ValueError(
                'an explicit fields iterable must contain at least one '
                'field; pass fields=None for the implicit on-axis field')
        return resolved
    sys_fields = getattr(system, 'fields', None)
    if sys_fields is not None and len(sys_fields) > 0:
        return list(sys_fields)
    return [Field(0.0, 0.0)]


def field_sweep(system, fields=None, samples=101):
    """Dense field samples spanning the system field set."""
    base = _resolve_fields(system, fields)
    if fields is not None or len(base) == 0:
        return base
    kinds = {f.kind for f in base}
    if len(kinds) != 1:
        return base
    kind = kinds.pop()
    if kind == 'angle':
        if len({f.unit for f in base}) != 1:
            return base
        object_z = None
    else:
        if len({f.object_z for f in base}) != 1:
            return base
        object_z = base[0].object_z
    unit = base[0].unit
    mags = [math.hypot(f.hx, f.hy) for f in base]
    mmax = max(mags)
    if mmax <= 0.0:
        return base
    outer = base[mags.index(mmax)]
    ux = outer.hx / mmax
    uy = outer.hy / mmax
    mmin = min(mags)
    if mmin >= mmax:
        mmin = 0.0
    samples = max(int(samples), 2)
    step = (mmax - mmin) / (samples - 1)
    return [
        Field(ux * (mmin + step * i), uy * (mmin + step * i),
              kind=kind, unit=unit, object_z=object_z)
        for i in range(samples)
    ]


def _resolve_wavelengths(system, wavelengths):
    """Wavelengths (microns) to evaluate, defaulting to the system set."""
    if wavelengths is not None:
        return [float(w) for w in wavelengths]
    wv = getattr(system, 'wavelengths', None)
    if wv is not None and len(wv):
        return [float(w) for w in wv]
    try:
        return [resolve_wavelength(system, None)]
    except ValueError:
        raise TypeError(
            'wavelengths is required for a bare surface sequence; only an '
            'OpticalSystem defaults the wavelength set.') from None


def _require_epd(system, epd, wvl=None):
    """Resolve epd from an explicit value or the system; error if neither."""
    if epd is None:
        epd = trace_context(system, wvl, chief=True).epd
    if epd is None:
        raise TypeError(
            'epd is required; pass epd=... or supply an OpticalSystem whose '
            'aperture spec resolves it.')
    return float(epd)


class TraceRecord:
    """One traced (field, wavelength) cell: indices, bundle, and trace."""

    __slots__ = ('i', 'j', 'field', 'wvl', 'epd', 'P', 'S', 'trace', 'valid')

    def __init__(self, i, j, field, wvl, epd, P, S, trace, valid):
        self.i = i
        self.j = j
        self.field = field
        self.wvl = wvl
        self.epd = epd
        self.P = P
        self.S = S
        self.trace = trace
        self.valid = valid


def _launch_trace(system, field, wvl, sampling, *, epd, pupil_z, aim_to,
                  trace_fn):
    epd = _require_epd(system, epd, wvl)
    P, S = launch(system, field, wvl, sampling, epd=epd, pupil_z=pupil_z,
                  aim_to=aim_to, drop_unaimed=True)
    trace = trace_fn(compiled_surfaces(system), P, S, wvl)
    valid = np.asarray(valid_mask(trace.status, trace.P[-1]))
    return epd, P, S, trace, valid


def trace_cell(system, field, wvl, sampling, *, epd=None, pupil_z=None,
               aim_to=None, trace_fn=raytrace):
    """Launch and trace one (field, wavelength) bundle -> TraceRecord."""
    epd, P, S, trace, valid = _launch_trace(
        system, field, wvl, sampling, epd=epd, pupil_z=pupil_z,
        aim_to=aim_to, trace_fn=trace_fn)
    return TraceRecord(0, 0, field, wvl, epd, P, S, trace, valid)


def iter_trace_grid(system, fields, wavelengths, sampling, *,
                    epd=None, pupil_z=None, aim_to=None, trace_fn=raytrace):
    """Trace one pupil sampling over every field x wavelength cell."""
    fields = _resolve_fields(system, fields)
    wavelengths = _resolve_wavelengths(system, wavelengths)
    for i, field in enumerate(fields):
        for j, wvl in enumerate(wavelengths):
            epd_w, P, S, trace, valid = _launch_trace(
                system, field, wvl, sampling, epd=epd, pupil_z=pupil_z,
                aim_to=aim_to, trace_fn=trace_fn)
            yield TraceRecord(i, j, field, wvl, epd_w, P, S, trace, valid)


class LayoutRecord:
    """One traced layout fan: the field, its trace, and the valid mask."""

    __slots__ = ('field', 'trace', 'valid')

    def __init__(self, field, trace, valid):
        self.field = field
        self.trace = trace
        self.valid = valid


class _OutlineTrace:
    """Minimal P/S carrier for layout glass sizing over many fields."""

    __slots__ = ('P', 'S')

    def __init__(self, P, S):
        self.P = P
        self.S = S


def _valid_only_positions(trace):
    P = np.array(trace.P)
    mask = valid_mask(trace.status, P[-1])
    if mask is not None:
        P[:, ~np.asarray(mask), :] = np.nan
    return P


def layout_records(system, fields=None, wavelength=None, sampling=None,
                   axis='y'):
    """(records, outline): one traced fan per field for a 2D layout."""
    wvl = resolve_wavelength(system, wavelength)
    fields = _resolve_fields(system, fields)
    if sampling is None:
        sampling = Sampling.fan(n=3, axis=axis)
    elif isinstance(sampling, int):
        sampling = Sampling.fan(n=int(sampling), axis=axis)
    records = []
    for field in fields:
        trace = raytrace(compiled_surfaces(system),
                         *launch(system, field, wvl, sampling,
                                 drop_unaimed=True), wvl)
        records.append(LayoutRecord(field, trace,
                                    valid_mask(trace.status, trace.P[-1])))
    outline = _OutlineTrace(
        np.concatenate([_valid_only_positions(r.trace) for r in records],
                       axis=1),
        np.concatenate([np.asarray(r.trace.S) for r in records], axis=1),
    )
    return records, outline
