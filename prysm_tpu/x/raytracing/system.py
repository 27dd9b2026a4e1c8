"""System-level metadata wrapper for LensData.

Rebuild of ``prysm/x/raytracing/system.py``: ApertureSpec (EPD / F-number
/ NA modes), FieldSet, and OpticalSystem — aperture/field/wavelength
metadata, cached derived quantities, and the verb namespaces.
"""
import copy
import math
import numbers
import warnings

import numpy as np

from .paraxial import (
    effective_focal_length,
    entrance_pupil_z as _paraxial_entrance_pupil_z,
    system_matrix,
    ynu_first_order as _ynu,
)
from .spencer_and_murty import _is_measurement_surf
from .lensdata import DesignState, LensData
from ._cache import StateCache, structural_key
from ._meta import object_space_index
from ._namespaces import (
    _AnalysisNamespace,
    _OptNamespace,
    _PlotNamespace,
    _SolveNamespace,
    _TolNamespace,
)

# aperture modes
EPD = 'EPD'
FNO_IMAGE = 'FNO_IMAGE'
FNO_OBJECT = 'FNO_OBJECT'
NA_IMAGE = 'NA_IMAGE'
NA_OBJECT = 'NA_OBJECT'

_APERTURE_MODES = (EPD, FNO_IMAGE, FNO_OBJECT, NA_IMAGE, NA_OBJECT)
_OBJECT_SPACE_MODES = (FNO_OBJECT, NA_OBJECT)
_POWER_EPS = 1e-30


def _tuple_or_none(value):
    if value is None:
        return None
    arr = np.asarray(value, dtype=np.float64).ravel()
    return tuple(float(v) for v in arr)


def _field_key(field):
    if field is None:
        return None
    vignetting = getattr(field, 'vignetting', None)
    vignetting = (None if vignetting is None
                  else tuple((k, float(v))
                             for k, v in sorted(vignetting.items())))
    return (
        getattr(field, 'hx', None),
        getattr(field, 'hy', None),
        getattr(field, 'kind', None),
        getattr(field, 'unit', None),
        getattr(field, 'object_z', None),
        vignetting,
    )


def _aperture_key(aperture):
    if aperture is None:
        return None
    return (aperture.mode, float(aperture.value))


class ApertureSpec:
    """The aperture of an optical system: a mode plus a value."""

    __slots__ = ('mode', 'value')

    def __init__(self, value, mode=EPD):
        """value in the units of mode (EPD diameter, F-number, or NA)."""
        mode = str(mode).upper()
        if mode not in _APERTURE_MODES:
            raise ValueError(
                f'aperture mode {mode!r} must be one of {_APERTURE_MODES}')
        self.mode = mode
        self.value = float(value)
        if not math.isfinite(self.value) or self.value <= 0.0:
            raise ValueError('aperture value must be finite and positive')

    @classmethod
    def epd(cls, value):
        """An entrance-pupil-diameter aperture."""
        return cls(value, EPD)

    @classmethod
    def fno(cls, value, *, object_space=False):
        """An image-space (default) or object-space F-number aperture."""
        return cls(value, FNO_OBJECT if object_space else FNO_IMAGE)

    @classmethod
    def na(cls, value, *, object_space=False):
        """An image-space (default) or object-space NA aperture."""
        return cls(value, NA_OBJECT if object_space else NA_IMAGE)

    def validate(self, object_at_infinity, *, has_power=True):
        """Raise if this spec is illegal for the conjugate or power."""
        if object_at_infinity and self.mode in _OBJECT_SPACE_MODES:
            raise ValueError(
                f'aperture mode {self.mode!r} is object-space and requires '
                'a finite-conjugate object; this system images from infinity')
        if not has_power and self.mode != EPD:
            raise ValueError(
                f'aperture mode {self.mode!r} needs a focusing system; this '
                'system has no net power (afocal) -- specify an EPD instead')

    def _validate_for_system(self, system, wvl=None):
        object_at_infinity = bool(getattr(system, 'object_at_infinity', True))
        self.validate(object_at_infinity, has_power=True)
        if self.mode == EPD:
            return
        wvl = system.wavelength(wvl)
        M, _ = system_matrix(system.to_surfaces(), wvl=wvl)
        C = float(M[1, 0])
        self.validate(object_at_infinity, has_power=abs(C) >= _POWER_EPS)

    def resolve(self, system, wvl=None):
        """(kind, value) launch boundary condition for this spec."""
        self._validate_for_system(system, wvl)
        return (self.mode, self.value)

    def entrance_pupil_diameter(self, system, wvl=None):
        """Equivalent paraxial entrance-pupil diameter for this spec."""
        object_at_infinity = bool(getattr(system, 'object_at_infinity', True))
        self.validate(object_at_infinity, has_power=True)
        if self.mode == EPD:
            return self.value

        wvl = system.wavelength(wvl)
        surfaces = system.to_surfaces()
        M, _ = system_matrix(surfaces, wvl=wvl)
        C = float(M[1, 0])
        self.validate(object_at_infinity, has_power=abs(C) >= _POWER_EPS)

        if self.mode == NA_IMAGE:
            return 2.0 * self.value / abs(C)
        if self.mode == FNO_IMAGE:
            efl = effective_focal_length(surfaces, wvl=wvl)
            return abs(efl) / self.value

        # object-space modes: marginal ray from the object to the EP
        n_obj = object_space_index(system, wvl)
        if self.mode == FNO_OBJECT:
            na_obj = 1.0 / (2.0 * self.value)
        else:
            na_obj = self.value
        u_obj = na_obj / n_obj
        z_obj = float(surfaces[0].P[2])
        z_ep = _paraxial_entrance_pupil_z(surfaces, wvl=wvl,
                                          stop_index=system.stop_index)
        if z_ep is None:
            raise ValueError(
                'cannot resolve an object-space aperture: the entrance '
                'pupil is at infinity (object-space telecentric) or the '
                'stop is unknown')
        return 2.0 * u_obj * abs(z_ep - z_obj)

    def __repr__(self):
        if self.mode == EPD:
            return f'ApertureSpec(EPD={self.value:g})'
        return f'ApertureSpec({self.mode}={self.value:g})'


class FieldSet:
    """Ordered field points with a tabular repr."""

    __slots__ = ('fields',)

    def __init__(self, fields=None):
        self.fields = _coerce_fields(fields)
        self._validate_homogeneous()

    def _validate_homogeneous(self):
        if not self.fields:
            return
        first = self.fields[0]
        for field in self.fields[1:]:
            if field.kind != first.kind:
                raise ValueError('a FieldSet must use one field kind')
            if first.kind == 'angle' and field.unit != first.unit:
                raise ValueError(
                    'an angular FieldSet must use one angular unit')
            if first.kind == 'height' and field.object_z != first.object_z:
                raise ValueError('a height FieldSet must use one object plane')

    def __len__(self):
        return len(self.fields)

    def __iter__(self):
        return iter(self.fields)

    def __getitem__(self, item):
        return self.fields[item]

    def __repr__(self):
        if not self.fields:
            return 'FieldSet (empty)'
        lines = ['FieldSet']
        kind = self.fields[0].kind
        if kind == 'angle':
            lines.append(f'  {"#":>3s}  {"hx":>10s}  {"hy":>10s}  unit')
            for i, f in enumerate(self.fields):
                lines.append(
                    f'  {i:>3d}  {f.hx:>10.4g}  {f.hy:>10.4g}  {f.unit}')
        else:
            lines.append(
                f'  {"#":>3s}  {"hx":>10s}  {"hy":>10s}  {"object_z":>10s}')
            for i, f in enumerate(self.fields):
                lines.append(
                    f'  {i:>3d}  {f.hx:>10.4g}  {f.hy:>10.4g}  '
                    f'{f.object_z:>10.4g}')
        return '\n'.join(lines)


class OpticalSystem:
    """System metadata around a LensData surface spine."""

    __slots__ = ('_lens', 'aperture', 'fields', 'wavelengths', 'weights',
                 'reference', 'title', 'stop_index',
                 'ray_aiming', 'source_path', 'source_format', 'extras',
                 '_design', '_derived', '_trace_cache', '_cache_generation',
                 '__weakref__')

    def __init__(self, lens, *, aperture=None, fields=None, wavelengths=None,
                 weights=None, reference=None, title=None,
                 stop_index=None, ray_aiming='paraxial', source_path=None,
                 source_format=None, extras=None):
        if not isinstance(lens, LensData):
            raise TypeError('OpticalSystem requires a LensData instance')
        if lens.system_owner is not None:
            raise ValueError(
                'LensData is already attached to an OpticalSystem; copy the '
                'lens before constructing another system')
        self._lens = lens
        if aperture is not None and not isinstance(aperture, ApertureSpec):
            aperture = ApertureSpec.epd(aperture)
        self.aperture = aperture
        self.fields = (fields if isinstance(fields, FieldSet)
                       else FieldSet(fields))
        self.wavelengths = _coerce_wavelengths(wavelengths)
        self.weights = _coerce_weights(weights, self.wavelengths)
        if len(self.wavelengths) and float(np.max(self.wavelengths)) >= 200.0:
            offender = float(np.max(self.wavelengths))
            warnings.warn(
                f'wavelengths are micrometers; {offender:g} looks like '
                'nanometers', stacklevel=2)
        if reference is not None and not isinstance(reference,
                                                    numbers.Integral):
            raise TypeError('reference must be an integer index or None')
        self.reference = 0 if reference is None else int(reference)
        if self.reference < 0 or (len(self.wavelengths)
                                  and self.reference >= len(self.wavelengths)):
            raise IndexError('reference wavelength index is out of range')
        if not len(self.wavelengths) and self.reference != 0:
            raise IndexError('an empty wavelength set only permits reference=0')
        self.title = title
        if stop_index is not None:
            if not isinstance(stop_index, numbers.Integral):
                raise TypeError('stop_index must be an integer or None')
            stop_index = int(stop_index)
            surfaces = lens.to_surfaces()
            if stop_index < 0 or stop_index >= len(surfaces):
                raise IndexError('stop_index is out of range')
        self.stop_index = stop_index
        ray_aiming = str(ray_aiming).lower()
        if ray_aiming not in ('paraxial', 'real'):
            raise ValueError(
                f"ray_aiming must be 'paraxial' or 'real', got {ray_aiming!r}")
        self.ray_aiming = ray_aiming
        self.source_path = source_path
        self.source_format = source_format
        self.extras = dict(extras) if extras else {}
        lens._attach_system(self)
        self._design = DesignState(lens)
        self._derived = StateCache()
        self._trace_cache = StateCache()
        self._cache_generation = lens._version

    @property
    def lens(self):
        """The exclusively attached LensData."""
        return self._lens

    # -- surface-sequence delegation --
    def to_surfaces(self):
        """Compiled surface list of the underlying lens."""
        return self.lens.to_surfaces()

    def trace(self, P, S, wavelength=None, **kwargs):
        """Trace a fixed launch bundle through this system."""
        from .spencer_and_murty import raytrace
        wvl = self.wavelength(wavelength)
        return raytrace(self.to_surfaces(), P, S, wvl, **kwargs)

    @property
    def surfaces(self):
        """Compiled surface list of the underlying lens."""
        return self.lens.surfaces

    @property
    def rows(self):
        """Editable rows of the underlying lens."""
        return self.lens.rows

    def __len__(self):
        return len(self.lens)

    def __iter__(self):
        return iter(self.lens)

    def __getitem__(self, item):
        return self.lens[item]

    # -- inner verb namespaces --
    @property
    def opt(self):
        """Design + optimization namespace."""
        return _OptNamespace(self)

    @property
    def solve(self):
        """State-writing solves namespace."""
        return _SolveNamespace(self)

    @property
    def plot(self):
        """Plotting namespace."""
        return _PlotNamespace(self)

    @property
    def analysis(self):
        """Analysis namespace."""
        return _AnalysisNamespace(self)

    @property
    def tol(self):
        """Tolerancing namespace."""
        return _TolNamespace(self)

    # -- metadata resolvers --
    @property
    def reference_wavelength(self):
        """Resolved reference wavelength in microns, or None."""
        if len(self.wavelengths) == 0:
            return None
        return float(self.wavelengths[self.reference])

    def wavelength(self, wavelength=None):
        """Resolve a wavelength to microns; None selects the reference."""
        if wavelength is None:
            ref = self.reference_wavelength
            return 0.6328 if ref is None else ref
        return float(wavelength)

    def field(self, field=None):
        """Resolve a field selector (None / index / (hx, hy) / Field)."""
        if field is None:
            if not self.fields:
                return Field(0.0, 0.0)
            return self.fields[0]
        if isinstance(field, numbers.Integral):
            return self.fields[int(field)]
        return _coerce_field(field)

    @property
    def epd(self):
        """Equivalent entrance-pupil diameter, or None."""
        return self.entrance_pupil_diameter()

    def entrance_pupil_diameter(self, wvl=None):
        """Equivalent entrance-pupil diameter at wvl, cached."""
        self._sync_cache_generation()
        if self.aperture is None:
            return None
        wvl = self.wavelength(wvl)
        key = ('epd', self.lens._version, float(wvl),
               self.aperture.mode, self.aperture.value)
        return self._derived.get_or_compute(
            key,
            lambda: float(self.aperture.entrance_pupil_diameter(self, wvl)))

    @property
    def object_at_infinity(self):
        """True when the OBJECT endpoint is at infinity."""
        rows = self.lens.rows
        if not rows:
            return True
        first = rows[0]
        from .surfaces import _map_stype
        typ = getattr(first, 'typ', None)
        if typ is None or not _is_measurement_surf(_map_stype(typ)):
            return True
        return not math.isfinite(
            float(getattr(first, 'thickness', float('inf'))))

    def first_order(self, field=0, wavelength=None, *, epd=None,
                    stop_index=None, force_sym=False):
        """Cached parabasal first-order properties about a chief ray."""
        self._sync_cache_generation()
        from .parabasal import first_order, _resolve_field
        wvl = self.wavelength(wavelength)
        resolved_stop = (stop_index if stop_index is not None
                         else self.stop_index)
        key = ('fo', self.lens._version,
               _field_key(_resolve_field(self, field)), float(wvl), epd,
               resolved_stop, bool(force_sym))
        return self._derived.get_or_compute(
            key, lambda: first_order(self, field=field, wavelength=wvl,
                                     epd=epd, stop_index=stop_index,
                                     force_sym=force_sym))

    def _ynu_first_order(self, wvl=None, *, epd=None, stop_index=None):
        """Internal YNU first-order properties, cached."""
        self._sync_cache_generation()
        wvl = self.wavelength(wvl)
        resolved_stop = (stop_index if stop_index is not None
                         else self.stop_index)
        epd = self.entrance_pupil_diameter(wvl) if epd is None else float(epd)
        surfaces = self.to_surfaces()
        key = ('ynu_fo', self.lens._version, float(wvl), epd, resolved_stop)
        return self._derived.get_or_compute(
            key, lambda: _ynu(surfaces, wvl=wvl, epd=epd,
                              stop_index=resolved_stop))

    def entrance_pupil_z(self, wvl=None, stop_index=None):
        """Lab-frame z of the paraxial entrance pupil, cached."""
        self._sync_cache_generation()
        wvl = self.wavelength(wvl)
        resolved_stop = (stop_index if stop_index is not None
                         else self.stop_index)
        surfaces = self.to_surfaces()
        key = ('ep_z', self.lens._version, float(wvl), resolved_stop)
        return self._derived.get_or_compute(
            key, lambda: _paraxial_entrance_pupil_z(
                surfaces, wvl, stop_index=resolved_stop))

    def exit_pupil(self, wvl=None, field=None, *, stop_index=None, epd=None,
                   axis_point=None, axis_dir=None):
        """Resolved exit-pupil reference point, cached."""
        self._sync_cache_generation()
        from .analysis import resolve_exit_pupil
        wvl = self.wavelength(wvl)
        resolved_stop = (stop_index if stop_index is not None
                         else self.stop_index)
        key = (
            'exit_pupil', self.lens._version, float(wvl), _field_key(field),
            resolved_stop, None if epd is None else float(epd),
            _tuple_or_none(axis_point), _tuple_or_none(axis_dir),
            _aperture_key(self.aperture), self.ray_aiming,
        )
        return self._derived.get_or_compute(
            key, lambda: resolve_exit_pupil(
                self, wvl, stop_index=resolved_stop, epd=epd, field=field,
                axis_point=axis_point, axis_dir=axis_dir))

    def reset_raytrace_cache(self):
        """Clear cached values without rewinding the lens generation."""
        self._trace_cache.clear()
        self._derived.clear()
        self.lens._surfaces_cache = None
        self._cache_generation = self.lens._version
        return self

    def _sync_cache_generation(self):
        generation = self.lens._version
        if generation != self._cache_generation:
            self._trace_cache.clear()
            self._derived.clear()
            self._cache_generation = generation

    def _fingerprint(self):
        """Hashable snapshot of metadata that drives a grid trace."""
        aperture = self.aperture
        ap = None if aperture is None else (aperture.mode, aperture.value)
        fields = tuple(
            (f.kind, f.hx, f.hy, f.unit, f.object_z,
             None if f.vignetting is None
             else tuple(sorted(f.vignetting.items())))
            for f in self.fields)
        return (self.lens._version, ap, fields,
                tuple(float(w) for w in self.wavelengths),
                tuple(float(w) for w in self.weights),
                self.reference, self.stop_index, self.ray_aiming)

    def _cached_grid(self, kind, fn, kwargs):
        """fn(self, **kwargs), memoized on the live fingerprint."""
        self.lens.to_surfaces()
        self._sync_cache_generation()
        key = (self._fingerprint(), kind, structural_key(kwargs))
        return self._trace_cache.get_or_compute(key,
                                                lambda: fn(self, **kwargs))

    # -- listings delegate to the lens --
    def list_surfaces(self, *, unit='mm'):
        """Tabular surface listing."""
        return self.lens.list_surfaces(stop_index=self.stop_index, unit=unit)

    def list_apertures(self):
        """Tabular per-surface clear-aperture listing."""
        return self.lens.list_apertures()

    def list_decenters(self):
        """Tabular coordinate-break decenter / tilt listing."""
        return self.lens.list_decenters()

    def copy(self):
        """A copy: lens, design state, and metadata containers copied."""
        new = OpticalSystem(
            self.lens.copy(), aperture=copy.deepcopy(self.aperture),
            fields=copy.deepcopy(list(self.fields)),
            wavelengths=np.array(self.wavelengths, copy=True),
            weights=np.array(self.weights, copy=True),
            reference=self.reference,
            title=self.title, stop_index=self.stop_index,
            ray_aiming=self.ray_aiming,
            source_path=self.source_path, source_format=self.source_format,
            extras=copy.deepcopy(self.extras))
        new._design = self._design.copy(new.lens)
        return new

    def __repr__(self):
        ap = repr(self.aperture) if self.aperture is not None else 'None'
        return (f'OpticalSystem(rows={len(self.lens.rows)}, aperture={ap}, '
                f'fields={len(self.fields)}, '
                f'wavelengths={len(self.wavelengths)}, '
                f'stop_index={self.stop_index})')


def _coerce_field(field):
    """Coerce a literal field specification (Field or (hx, hy))."""
    if isinstance(field, Field):
        return field
    if isinstance(field, numbers.Number):
        raise TypeError(
            'a literal field must be a (hx, hy) pair or a Field, not a bare '
            f'scalar; got {field!r} (use an int to index the FieldSet)')
    return Field(float(field[0]), float(field[1]))


def _coerce_fields(fields):
    if fields is None:
        return []
    if isinstance(fields, FieldSet):
        return list(fields.fields)
    out = []
    for field in fields:
        if isinstance(field, numbers.Number):
            out.append(Field(0.0, float(field)))
        else:
            out.append(_coerce_field(field))
    return out


def _coerce_wavelengths(wavelengths):
    if wavelengths is None:
        return np.asarray([], dtype=np.float64)
    if hasattr(wavelengths, 'keys'):
        raise TypeError(
            'wavelengths must be a sequence of micron floats, not a mapping; '
            'pass e.g. list(FRAUNHOFER_LINES_UM.values()) and select the '
            'reference by integer index')
    out = np.asarray([float(w) for w in wavelengths], dtype=np.float64)
    if len(out) and (not bool(np.all(np.isfinite(out)))
                     or bool(np.any(out <= 0.0))):
        raise ValueError('wavelengths must be finite and positive')
    return out


def _coerce_weights(weights, wavelengths):
    n = len(wavelengths)
    if weights is None:
        return np.ones(n, dtype=np.float64)
    weights = np.asarray([float(w) for w in weights], dtype=np.float64)
    if len(weights) != n:
        raise ValueError(
            f'weights length {len(weights)} does not match the {n} '
            'wavelengths')
    if len(weights) and (not bool(np.all(np.isfinite(weights)))
                         or bool(np.any(weights < 0.0))):
        raise ValueError('weights must be finite and nonnegative')
    if len(weights) and not bool(np.any(weights > 0.0)):
        raise ValueError('at least one wavelength weight must be positive')
    return weights


# imported at module end to avoid a circular import at package load time
from .launch import Field  # NOQA: E402


__all__ = ['OpticalSystem', 'ApertureSpec', 'FieldSet',
           'EPD', 'FNO_IMAGE', 'FNO_OBJECT', 'NA_IMAGE', 'NA_OBJECT']
