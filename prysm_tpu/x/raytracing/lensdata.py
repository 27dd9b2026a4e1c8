"""Editable LensData rows and surface compilation.

Rebuild of ``prysm/x/raytracing/lensdata.py``: SurfaceRow / CoordBreak
rows with cache-invalidating edits, coordinate-break layout (basic /
dar / ret / rev / ben), compilation into posed Surface lists, and the
DesignState DOF registry (vary/freeze/constrain, pickups, image-distance
solve).  This layer is a host-side editor — pure numpy float64; the
compiled Surface list is what feeds the jittable trace kernel.
"""
import copy
import math
import numbers
import warnings
import weakref
from collections.abc import MutableSequence

import numpy as np

from ..materials import MIRROR, air
from .aperture import as_aperture
from .surfaces import Plane, Surface, _map_stype
from .paraxial import paraxial_image_distance
from .spencer_and_murty import (
    STYPE_IMG, STYPE_OBJ, STYPE_REFLECT, STYPE_REFRACT,
    _is_measurement_surf,
)

_DEG2RAD = math.pi / 180.0


def R_rh(rz, ry, rx, radians=False):
    """Right-handed ZYX rotation matrix (host numpy)."""
    k = 1.0 if radians else _DEG2RAD
    alpha = rx * k
    beta = ry * k
    gamma = rz * k
    ca, sa = np.cos(alpha), np.sin(alpha)
    cb, sb = np.cos(beta), np.sin(beta)
    cg, sg = np.cos(gamma), np.sin(gamma)
    Rx = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
    Ry = np.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
    Rz = np.array([[cg, -sg, 0], [sg, cg, 0], [0, 0, 1]])
    return Rx @ Ry @ Rz


# 180-degree x rotation for normal-incidence mirror folds
_FLIP_Z = np.array([[1.0, 0.0, 0.0],
                    [0.0, -1.0, 0.0],
                    [0.0, 0.0, -1.0]])


def _ben_auto_gamma(alpha_deg, beta_deg):
    """BEN auto-roll gamma (degrees) keeping the folded axis level."""
    a = alpha_deg * _DEG2RAD
    b = beta_deg * _DEG2RAD
    num = -np.sin(a) * np.sin(b)
    den = np.cos(a) + np.cos(b)
    return np.arctan2(num, den) / _DEG2RAD


def _as_mat(R):
    if R is None:
        return np.eye(3)
    return np.asarray(R)


def _local_to_global(Rgl):
    return _as_mat(Rgl).T


def _compose_global_to_local(Rgl, local_rot):
    return _as_mat(local_rot) @ _as_mat(Rgl)


def _axial_step(thickness):
    return np.array([0.0, 0.0, float(thickness)])


def _none_if_identity(Rgl):
    if Rgl is None:
        return None
    if np.allclose(np.asarray(Rgl), np.eye(3)):
        return None
    return Rgl


def _apply_decenter_tilt(o, Rgl, decenter, tilt):
    o = o + _local_to_global(Rgl) @ np.asarray(decenter, dtype=float)
    Rt = R_rh(tilt[0], tilt[1], tilt[2])
    return o, _compose_global_to_local(Rgl, Rt)


class _FrameState:
    """Mutable frame state for coordinate-break layout scans."""

    __slots__ = ('o', 'Rgl', 'frames', 'pending_pose', 'pending_fold')

    def __init__(self):
        self.o = np.zeros(3)
        self.Rgl = None
        self.frames = {}
        self.pending_pose = None
        self.pending_fold = None

    def advance(self, thickness):
        self.o = self.o + _local_to_global(self.Rgl) @ _axial_step(thickness)


class _ShapeDescriptor:
    """Shape-declared DOF layout used by SurfaceRow."""

    __slots__ = ('cls', 'scalar_dofs', 'vector_dofs', 'meta_keys',
                 'categories', 'build')

    def __init__(self, cls):
        self.cls = cls
        self.scalar_dofs = tuple(cls.SCALAR_DOFS)
        self.vector_dofs = tuple(cls.VECTOR_DOFS)
        self.meta_keys = tuple(cls.META_KEYS)
        self.categories = {k: list(v) for k, v in cls.CATEGORIES.items()}
        self.build = cls.from_params


def _adapter_for(shape):
    cls = type(shape)
    if not hasattr(cls, 'from_params'):
        raise TypeError(
            f'shape {cls.__name__} is not registered with LensData; declare '
            'SCALAR_DOFS / VECTOR_DOFS / META_KEYS / CATEGORIES and a '
            'from_params classmethod on the shape class')
    return _ShapeDescriptor(cls)


def _bounds_for_dof(nominal, lo, hi, relative, is_radius):
    """Ordered (lo, hi) bounds for one constrained DOF slot."""
    if is_radius:
        if nominal == 0.0:
            if relative is not None:
                warnings.warn(
                    'relative radius bound on a flat (c=0) surface is '
                    'degenerate; leaving it unbounded', stacklevel=3)
            return None
        quantity = 1.0 / nominal
    else:
        quantity = nominal

    if relative is not None:
        if quantity == 0.0:
            warnings.warn(
                'relative bound on a zero nominal is degenerate; leaving it '
                'unbounded', stacklevel=3)
            return None
        qlo = quantity * (1.0 - relative)
        qhi = quantity * (1.0 + relative)
    else:
        qlo = -np.inf if lo is None else float(lo)
        qhi = np.inf if hi is None else float(hi)

    if is_radius:
        # radius bounds map to curvature; the reciprocal flips ordering
        blo = 0.0 if np.isinf(qhi) else 1.0 / qhi
        bhi = 0.0 if np.isinf(qlo) else 1.0 / qlo
    else:
        blo, bhi = qlo, qhi
    if blo > bhi:
        blo, bhi = bhi, blo
    return (blo, bhi)


def _invalidate_row_owner(row):
    owner = getattr(row, '_owner', None)
    if owner is not None:
        owner._invalidate()


def _layout_thickness(row):
    thi = float(row.thickness)
    if not math.isfinite(thi):
        return 0.0
    return thi


def _validate_material(material):
    if material is None or material is MIRROR:
        return material
    if not callable(getattr(material, 'n', None)):
        raise TypeError(
            'material must be a MaterialProtocol object with a callable '
            '.n(wvl_um) (e.g. ConstantMaterial(1.5) or a catalog glass), '
            f'None for air, or MIRROR; got {material!r}')
    return material


def _normalize_interaction_material(typ, material):
    if typ is None:
        typ = 'refl' if material is MIRROR else 'refr'
    mapped = _map_stype(typ)
    if mapped == STYPE_REFLECT:
        if material is not None and material is not MIRROR:
            raise ValueError(
                'reflective surfaces take material=MIRROR or material=None; '
                f'got {material!r}')
        return typ, material
    if material is MIRROR:
        raise ValueError('material=MIRROR requires a reflective surface type')
    if mapped == STYPE_REFRACT and material is None:
        raise ValueError('refractive surfaces require a material')
    return typ, material


class _InvalidatingArray(np.ndarray):
    """ndarray view that clears its row owner's surface cache on edits."""

    def __new__(cls, values, row, dtype=None):
        arr = np.asarray(values, dtype=dtype).view(cls)
        arr._row = row
        return arr

    def __array_finalize__(self, obj):
        self._row = getattr(obj, '_row', None)

    def __setitem__(self, item, value):
        super().__setitem__(item, value)
        row = getattr(self, '_row', None)
        if row is not None:
            _invalidate_row_owner(row)


def _invalidating_array(values, row, dtype=None):
    arr = np.asarray(values, dtype=dtype)
    out = arr.view(_InvalidatingArray)
    out._row = row
    return out


_MISSING = object()


class _InvalidatingDict(dict):
    """dict that clears its row owner's surface cache on mutation."""

    def __init__(self, *args, row=None, **kwargs):
        self._row = row
        super().__init__(*args, **kwargs)

    def _invalidate(self):
        row = getattr(self, '_row', None)
        if row is not None:
            _invalidate_row_owner(row)

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        self._invalidate()

    def __delitem__(self, key):
        super().__delitem__(key)
        self._invalidate()

    def clear(self):
        super().clear()
        self._invalidate()

    def pop(self, key, default=_MISSING):
        if default is _MISSING:
            value = super().pop(key)
        else:
            if key not in self:
                return default
            value = super().pop(key)
        self._invalidate()
        return value

    def popitem(self):
        value = super().popitem()
        self._invalidate()
        return value

    def setdefault(self, key, default=None):
        if key in self:
            return self[key]
        value = super().setdefault(key, default)
        self._invalidate()
        return value

    def update(self, *args, **kwargs):
        super().update(*args, **kwargs)
        self._invalidate()


def _invalidating_dict(value, row):
    if value is None:
        return None
    if isinstance(value, _InvalidatingDict):
        return _InvalidatingDict(dict(value), row=row)
    if not isinstance(value, dict):
        return value
    return _InvalidatingDict(value, row=row)


class ControlledRows(MutableSequence):
    """Endpoint-preserving, invalidating sequence of owned lens rows."""

    def __init__(self, owner, rows):
        self._owner = owner
        self._rows = []
        self._replace(list(rows), invalidate=False)

    def __len__(self):
        return len(self._rows)

    def __getitem__(self, item):
        return self._rows[item]

    def _validate_row(self, row):
        if not isinstance(row, (SurfaceRow, CoordBreak)):
            raise TypeError(
                'LensData rows must be SurfaceRow or CoordBreak instances; '
                f'got {type(row).__name__}')
        current_owner = getattr(row, '_owner', None)
        if current_owner is not None and current_owner is not self._owner:
            raise ValueError('row is already attached to another LensData')

    def _validate_candidate(self, rows):
        if len(rows) < 2:
            raise ValueError('LensData must retain OBJECT and IMAGE endpoints')
        for row in rows:
            self._validate_row(row)
        if len({id(row) for row in rows}) != len(rows):
            raise ValueError('the same row object cannot appear more than once')
        first, last = rows[0], rows[-1]
        if (not isinstance(first, SurfaceRow)
                or _map_stype(first.typ) != STYPE_OBJ):
            raise ValueError('row 0 must remain the OBJECT endpoint')
        if (not isinstance(last, SurfaceRow)
                or _map_stype(last.typ) != STYPE_IMG):
            raise ValueError('the final row must remain the IMAGE endpoint')
        for row in rows[1:-1]:
            if (isinstance(row, SurfaceRow)
                    and _map_stype(row.typ) in (STYPE_OBJ, STYPE_IMG)):
                raise ValueError('OBJECT and IMAGE rows may only be endpoints')

    def _replace(self, rows, *, invalidate=True):
        self._validate_candidate(rows)
        old = self._rows
        old_ids = {id(row) for row in old}
        new_ids = {id(row) for row in rows}
        for row in old:
            if id(row) not in new_ids:
                object.__setattr__(row, '_owner', None)
        for row in rows:
            if id(row) not in old_ids:
                object.__setattr__(row, '_owner', self._owner)
        self._rows = rows
        if invalidate:
            self._owner._invalidate()

    def __setitem__(self, item, value):
        candidate = list(self._rows)
        if isinstance(item, slice):
            candidate[item] = list(value)
        else:
            candidate[item] = value
        self._replace(candidate)

    def __delitem__(self, item):
        candidate = list(self._rows)
        del candidate[item]
        self._replace(candidate)

    def insert(self, index, value):
        candidate = list(self._rows)
        candidate.insert(index, value)
        self._replace(candidate)

    def __repr__(self):
        return repr(self._rows)


class SurfaceRow:
    """One sequential optical surface in a LensData system."""

    _INVALIDATING_ATTRS = {
        'params', 'meta', 'thickness', 'material', 'typ',
        'aperture', 'grating', 'coating',
    }

    def __setattr__(self, name, value):
        if name == 'typ':
            owner = getattr(self, '_owner', None)
            if owner is not None:
                index = next(i for i, row in enumerate(owner.rows)
                             if row is self)
                mapped = _map_stype(value)
                if index == 0 and mapped != STYPE_OBJ:
                    raise ValueError('row 0 must remain the OBJECT endpoint')
                if index == len(owner.rows) - 1 and mapped != STYPE_IMG:
                    raise ValueError(
                        'the final row must remain the IMAGE endpoint')
                if 0 < index < len(owner.rows) - 1 \
                        and mapped in (STYPE_OBJ, STYPE_IMG):
                    raise ValueError(
                        'OBJECT and IMAGE rows may only be endpoints')
        if name == 'params':
            value = _invalidating_array(value, self, dtype=np.float64)
        elif name == 'meta':
            value = _invalidating_dict(value, self)
        elif name == 'material':
            value = _validate_material(value)
        elif name == 'aperture':
            value = as_aperture(value)
        object.__setattr__(self, name, value)
        if name in self._INVALIDATING_ATTRS:
            _invalidate_row_owner(self)

    def __init__(self, shape, *, thickness=0.0, material=None, typ=None,
                 aperture=None, grating=None, coating=None):
        typ, material = _normalize_interaction_material(typ, material)
        object.__setattr__(self, '_owner', None)
        adapter = _adapter_for(shape)
        params = []
        key_offsets = {}
        sp = shape.params or {}
        for key in adapter.scalar_dofs:
            key_offsets[key] = (len(params), 1)
            params.append(sp[key])
        for key in adapter.vector_dofs:
            vals = list(sp[key])
            key_offsets[key] = (len(params), len(vals))
            params.extend(vals)

        self.shape_kind = type(shape)
        self.adapter = adapter
        self.params = (np.asarray(params, dtype=np.float64)
                       if params else np.zeros(0, dtype=np.float64))
        self.key_offsets = key_offsets
        self.meta = {key: sp[key] for key in adapter.meta_keys}

        categories = {}
        for cat, keys in adapter.categories.items():
            offs = []
            for key in keys:
                start, length = key_offsets[key]
                offs.extend(range(start, start + length))
            categories[cat] = offs
        self.categories = categories

        self.thickness = thickness
        self.material = material
        self.typ = typ
        self.aperture = aperture
        self.grating = grating
        self.coating = coating

    @property
    def is_reflective(self):
        """True if this surface reflects (folds the layout frame)."""
        return _map_stype(self.typ) == STYPE_REFLECT

    def build_shape(self):
        """Rebuild the Shape from the current parameter array + meta."""
        p = dict(self.meta)
        scalar = set(self.adapter.scalar_dofs)
        for key, (start, length) in self.key_offsets.items():
            if key in scalar:
                p[key] = self.params[start]
            else:
                # a length-1 vector DOF stays a length-1 block
                p[key] = self.params[start:start + length]
        return self.adapter.build(p)

    def dof_slots(self, row_index):
        """Yield (group, row_index, offset) for every scalar DOF."""
        for off in range(len(self.params)):
            yield ('shape', row_index, off)
        yield ('thickness', row_index, 0)

    def copy(self):
        """A detached copy of the row."""
        new = object.__new__(SurfaceRow)
        object.__setattr__(new, '_owner', None)
        new.shape_kind = self.shape_kind
        new.adapter = self.adapter
        new.params = np.array(self.params, copy=True)
        new.key_offsets = dict(self.key_offsets)
        new.meta = copy.deepcopy(dict(self.meta))
        new.categories = {k: list(v) for k, v in self.categories.items()}
        new.thickness = self.thickness
        new.material = self.material
        new.typ = self.typ
        new.aperture = copy.deepcopy(self.aperture)
        new.grating = copy.deepcopy(self.grating)
        new.coating = copy.deepcopy(self.coating)
        return new


class CoordBreak:
    """A right-handed coordinate break row."""

    _INVALIDATING_ATTRS = {
        'decenter', 'tilt', 'kind', 'ret_target', 'thickness',
    }

    def __setattr__(self, name, value):
        if name in ('decenter', 'tilt'):
            value = _invalidating_array(value, self, dtype=np.float64)
        object.__setattr__(self, name, value)
        if name in self._INVALIDATING_ATTRS:
            _invalidate_row_owner(self)

    def __init__(self, *, decenter=(0.0, 0.0, 0.0), tilt=(0.0, 0.0, 0.0),
                 kind='basic', ret_target=None, thickness=0.0):
        object.__setattr__(self, '_owner', None)
        self.decenter = np.asarray(decenter, dtype=np.float64)
        self.tilt = np.asarray(tilt, dtype=np.float64)
        self.kind = kind
        self.ret_target = ret_target
        self.thickness = thickness

    def dof_slots(self, row_index):
        """Yield decenter / tilt / thickness DOF slots for this break."""
        for off in range(3):
            yield ('decenter', row_index, off)
        for off in range(3):
            yield ('tilt', row_index, off)
        yield ('thickness', row_index, 0)

    def copy(self):
        """A detached copy of the coordinate break."""
        new = object.__new__(CoordBreak)
        object.__setattr__(new, '_owner', None)
        new.decenter = np.array(self.decenter, copy=True)
        new.tilt = np.array(self.tilt, copy=True)
        new.kind = self.kind
        new.ret_target = self.ret_target
        new.thickness = self.thickness
        return new


class SurfaceMap:
    """Row index <-> compiled-surface index mapping (coordbreaks skipped)."""

    __slots__ = ('_row_for_surface', '_surface_for_row', '_n_rows')

    def __init__(self, lens):
        self._row_for_surface = []
        self._surface_for_row = {}
        self._n_rows = len(lens.rows)
        for r, row in enumerate(lens.rows):
            if isinstance(row, SurfaceRow):
                self._surface_for_row[r] = len(self._row_for_surface)
                self._row_for_surface.append(r)

    def row_for_surface(self, surface_index):
        """LensData row index of one compiled surface."""
        return self._row_for_surface[surface_index]

    def surface_for_row(self, row_index):
        """Compiled surface index of one SurfaceRow row."""
        return self._surface_for_row[row_index]

    def records(self):
        """Per-row dicts of row_index, surface_index (None for breaks), and
        the Zemax-style sequential surface number (OBJECT = 0, every row
        including coordinate breaks increments)."""
        return [{'row_index': r,
                 'surface_index': self._surface_for_row.get(r),
                 'zemax_surface_number': r}
                for r in range(self._n_rows)]


def lens_element_groups(surfaces, *, wvl=0.587, ambient_index=1.0,
                        index_atol=1e-9):
    """Group consecutive refracting surfaces into physical lens elements."""
    groups = []
    active = []
    for j, surf in enumerate(surfaces):
        if surf.typ != STYPE_REFRACT:
            if active:
                raise ValueError(
                    'refracting lens group is interrupted before returning '
                    'to ambient material')
            continue
        if surf.material is None:
            raise ValueError('refracting surfaces must define a material')
        n_post = float(np.asarray(surf.material.n(wvl)).reshape(-1)[0])
        active.append(j)
        if np.isclose(n_post, ambient_index, rtol=0, atol=index_atol):
            if len(active) >= 2:
                groups.append(tuple(active))
            active = []
    if active:
        raise ValueError(
            'a refracting lens group terminates before returning to ambient '
            'material')
    return groups


class LensData:
    """Editable sequential optical system."""

    def __init__(self):
        self._surfaces_cache = None
        self._version = 0       # bumped on every edit
        self._resolving = False
        self._system_owner_ref = None
        self._resolve_hook = None
        object_row = SurfaceRow(
            Plane(), thickness=float('inf'), material=air, typ='object')
        image_row = SurfaceRow(Plane(), thickness=0.0, typ='image')
        self._rows = ControlledRows(self, (object_row, image_row))

    @property
    def rows(self):
        """Controlled mutable sequence retaining OBJECT/IMAGE invariants."""
        return self._rows

    @property
    def system_owner(self):
        """The attached OpticalSystem, or None."""
        if self._system_owner_ref is None:
            return None
        return self._system_owner_ref()

    def _attach_system(self, system):
        owner = self.system_owner
        if owner is not None and owner is not system:
            raise ValueError(
                'LensData is already attached to an OpticalSystem; copy the '
                'lens before constructing another system')
        self._system_owner_ref = weakref.ref(system)

    @property
    def object_row(self):
        """The OBJECT endpoint row."""
        return self.rows[0]

    @property
    def image_row(self):
        """The IMAGE endpoint row."""
        return self.rows[-1]

    def add(self, shape, *, thickness=0.0, material=None, typ=None,
            aperture=None, grating=None, coating=None):
        """Insert a surface row before the IMAGE endpoint; returns self."""
        self.rows.insert(len(self.rows) - 1, SurfaceRow(
            shape, thickness=thickness, material=material, typ=typ,
            aperture=aperture, grating=grating, coating=coating))
        self._invalidate()
        return self

    def add_coordbreak(self, *, decenter=(0.0, 0.0, 0.0),
                       tilt=(0.0, 0.0, 0.0), kind='basic', ret_target=None,
                       thickness=0.0):
        """Insert a coordinate break before the IMAGE endpoint."""
        self.rows.insert(len(self.rows) - 1, CoordBreak(
            decenter=decenter, tilt=tilt, kind=kind, ret_target=ret_target,
            thickness=thickness))
        self._invalidate()
        return self

    def _invalidate(self):
        if self._resolving:
            return
        self._surfaces_cache = None
        self._version += 1

    # -- compilation --
    def to_surfaces(self):
        """Compile rows into posed Surface objects (cached)."""
        if self._surfaces_cache is not None:
            return self._surfaces_cache
        if self._resolve_hook is not None:
            self._resolve_hook()
        surfaces = self._compile_surfaces()
        self._surfaces_cache = surfaces
        return surfaces

    def element_groups(self, *, wvl=0.587, ambient_index=1.0,
                       index_atol=1e-9):
        """Physical lens-element groups of the compiled surfaces."""
        return lens_element_groups(self.to_surfaces(), wvl=wvl,
                                   ambient_index=ambient_index,
                                   index_atol=index_atol)

    def _compile_surfaces(self):
        if any(isinstance(row, CoordBreak) for row in self.rows):
            return self._to_surfaces_general()
        return self._to_surfaces_axial()

    def _build_surface(self, row, P, R=None):
        return Surface(
            shape=row.build_shape(), interaction=row.typ, P=P, R=R,
            material=None if row.material is MIRROR else row.material,
            aperture=row.aperture, grating=row.grating,
            coating=getattr(row, 'coating', None))

    def _to_surfaces_axial(self):
        surfaces = []
        z = 0.0
        sign = 1.0
        for row in self.rows:
            surfaces.append(self._build_surface(row, P=[0.0, 0.0, z]))
            if row.is_reflective:
                sign = -sign
            z = z + sign * _layout_thickness(row)
        return surfaces

    def _to_surfaces_general(self):
        surfaces = []
        state = _FrameState()
        for idx, row in enumerate(self.rows):
            if isinstance(row, CoordBreak):
                self._apply_coordbreak(row, state)
                continue
            if state.pending_pose is not None:
                o_s, Rgl_s = _apply_decenter_tilt(state.o, state.Rgl,
                                                  *state.pending_pose)
                state.pending_pose = None
            else:
                o_s, Rgl_s = state.o, state.Rgl
            surfaces.append(self._build_surface(
                row, P=o_s, R=_none_if_identity(Rgl_s)))
            state.frames[idx] = (o_s, Rgl_s)
            # fold the running frame at a reflecting surface
            if row.is_reflective:
                if state.pending_fold is not None:
                    state.Rgl = _compose_global_to_local(
                        state.Rgl, R_rh(*state.pending_fold))
                    state.pending_fold = None
                else:
                    state.Rgl = _compose_global_to_local(state.Rgl, _FLIP_Z)
            state.o = (state.o
                       + _local_to_global(state.Rgl)
                       @ _axial_step(_layout_thickness(row)))
        return surfaces

    def _apply_coordbreak(self, cb, state):
        kind = cb.kind
        decenter = cb.decenter
        tilt = cb.tilt
        if kind == 'dar':
            # decenter-and-return: one-shot pose for the next surface only
            state.pending_pose = (decenter, tilt)
            state.advance(cb.thickness)
            return
        if kind == 'ret':
            # return-to-surface: restore a prior row's recorded frame
            if cb.ret_target is None or cb.ret_target not in state.frames:
                raise ValueError(
                    f'RET coordinate break targets row {cb.ret_target!r}, '
                    'which has not been placed yet')
            state.o, state.Rgl = state.frames[cb.ret_target]
            state.advance(cb.thickness)
            return
        if kind == 'rev':
            # reverse: inverse of a matching basic break
            Rt = R_rh(tilt[0], tilt[1], tilt[2])
            state.Rgl = _compose_global_to_local(state.Rgl, _as_mat(Rt).T)
            state.o = state.o - _local_to_global(state.Rgl) @ np.asarray(
                decenter, dtype=float)
            state.advance(cb.thickness)
            return
        if kind == 'ben':
            # decenter-and-bend: fold registered for the next reflector
            state.o, state.Rgl = _apply_decenter_tilt(state.o, state.Rgl,
                                                      decenter, tilt)
            gamma = _ben_auto_gamma(tilt[2], tilt[1])
            state.pending_fold = (gamma, tilt[1], tilt[2])
            state.advance(cb.thickness)
            return
        if kind != 'basic':
            raise ValueError(
                f"unknown coordinate-break kind {kind!r}; expected one of "
                "'basic', 'dar', 'ret', 'rev', 'ben'")
        state.o, state.Rgl = _apply_decenter_tilt(state.o, state.Rgl,
                                                  decenter, tilt)
        state.advance(cb.thickness)

    @property
    def surfaces(self):
        """The compiled surface list (cached; invalidated on edits)."""
        return self.to_surfaces()

    # -- sequence protocol (duck-type as a surface list) --
    def __len__(self):
        """Number of compiled surfaces."""
        return len(self.to_surfaces())

    def __iter__(self):
        """Iterate over compiled surfaces."""
        return iter(self.to_surfaces())

    def __getitem__(self, item):
        """Compiled surface(s) by index."""
        return self.to_surfaces()[item]

    # -- slot addressing --
    def _all_slots(self):
        out = []
        for r, row in enumerate(self.rows):
            out.extend(row.dof_slots(r))
        return out

    def _slot_value(self, slot):
        group, r, off = slot
        row = self.rows[r]
        if group == 'shape':
            return row.params[off]
        if group == 'thickness':
            return row.thickness
        if group == 'decenter':
            return row.decenter[off]
        if group == 'tilt':
            return row.tilt[off]
        raise KeyError(group)

    def _set_slot_value(self, slot, value):
        group, r, off = slot
        row = self.rows[r]
        if group == 'shape':
            row.params[off] = value
        elif group == 'thickness':
            row.thickness = value
        elif group == 'decenter':
            row.decenter[off] = value
        elif group == 'tilt':
            row.tilt[off] = value
        else:
            raise KeyError(group)

    def _select_rows(self, surfaces):
        n = len(self.rows)
        if surfaces == 'all' or surfaces is None:
            return list(range(n))
        if isinstance(surfaces, slice):
            return list(range(*surfaces.indices(n)))
        if isinstance(surfaces, numbers.Integral):
            surfaces = [int(surfaces)]
        out = []
        for selector in surfaces:
            if not isinstance(selector, numbers.Integral):
                raise TypeError('surface selectors must be integer indices')
            index = int(selector)
            if index < 0:
                index += n
            if index < 0 or index >= n:
                raise IndexError(
                    f'surface row index {selector} is out of range')
            out.append(index)
        return out

    def _category_slots(self, category, surfaces):
        known = {'thickness', 'tilt', 'decenter'}
        for row in self.rows:
            if isinstance(row, SurfaceRow):
                known.update(row.categories)
        if category not in known:
            raise KeyError(f'unknown design category {category!r}')
        slots = []
        for r in self._select_rows(surfaces):
            row = self.rows[r]
            if category == 'thickness':
                slots.append(('thickness', r, 0))
            elif category in ('tilt', 'decenter'):
                if isinstance(row, CoordBreak):
                    for off in range(3):
                        slots.append((category, r, off))
            else:
                if isinstance(row, SurfaceRow):
                    for off in row.categories.get(category, ()):
                        slots.append(('shape', r, off))
        if not slots:
            raise ValueError(
                f'category {category!r} has no DOFs on the selected rows')
        return slots

    # -- listings --
    def list_surfaces(self, *, stop_index=None, unit=None):
        """Lens-data-editor surface table."""
        from .listings import surface_table
        return surface_table(self, stop_index=stop_index, unit=unit)

    def list_apertures(self):
        """Per-surface clear-aperture table."""
        from .listings import aperture_table
        return aperture_table(self)

    def list_decenters(self):
        """Coordinate-break decenter / tilt table."""
        from .listings import decenter_table
        return decenter_table(self)

    def copy(self):
        """A structural copy with cloned rows."""
        new = LensData()
        new._rows = ControlledRows(new, [row.copy() for row in self.rows])
        return new

    def __repr__(self):
        return f'LensData(n_rows={len(self.rows)})'


class DesignState:
    """DOF registry, pickups, and solves for an OpticalSystem."""

    def __init__(self, lens):
        self.lens = lens
        self._free = {}
        self._bounds = {}
        self._pickups = []
        self._image_solve = None
        self._dependent = set()
        lens._resolve_hook = self._resolve_dependencies

    # -- free vector --
    def free_slots(self):
        """Ordered list of the slots currently marked free."""
        return [s for s in self.lens._all_slots() if self._free.get(s, False)]

    def pack(self):
        """Gather the free DOFs into a dense vector."""
        free = self.free_slots()
        out = np.empty(len(free), dtype=np.float64)
        for i, slot in enumerate(free):
            out[i] = self.lens._slot_value(slot)
        return out

    def scatter(self, x):
        """Write a dense free vector back into the rows."""
        free = self.free_slots()
        if len(x) != len(free):
            raise ValueError(f'expected {len(free)} free DOFs, got {len(x)}')
        for slot, value in zip(free, x):
            self.lens._set_slot_value(slot, float(value))

    def bounds(self):
        """(lo, hi) arrays parallel to the free vector."""
        free = self.free_slots()
        lo = np.empty(len(free), dtype=np.float64)
        hi = np.empty(len(free), dtype=np.float64)
        for i, slot in enumerate(free):
            blo, bhi = self._bounds.get(slot, (-np.inf, np.inf))
            lo[i] = blo
            hi[i] = bhi
        return lo, hi

    def update(self, x):
        """Scatter a free vector, resolve dependents, invalidate."""
        self.scatter(x)
        self._resolve_dependencies()
        self.lens._invalidate()
        return self

    # -- variable selection --
    def vary(self, category, surfaces='all'):
        """Mark a category of DOFs free over a range of surfaces."""
        slots = self.lens._category_slots(category, surfaces)
        if category == 'thickness':
            self._clear_image_distance_solve_if_selected(slots)
        for slot in slots:
            if slot not in self._dependent:
                self._free[slot] = True
        return self

    def freeze(self, category, surfaces='all'):
        """Inverse of vary."""
        for slot in self.lens._category_slots(category, surfaces):
            self._free.pop(slot, None)
        return self

    def vary_all(self):
        """Mark every scalar DOF free (except dependents)."""
        for slot in self.lens._all_slots():
            if slot not in self._dependent:
                self._free[slot] = True
        return self

    def freeze_all(self):
        """Mark every scalar DOF fixed."""
        self._free.clear()
        return self

    def constrain(self, category, *, lo=None, hi=None, relative=None,
                  surfaces='all'):
        """Box bounds on a category of DOFs (radius bounds -> curvature)."""
        if relative is None and lo is None and hi is None:
            raise ValueError('constrain needs lo/hi (absolute) or relative')
        is_radius = category in ('radius', 'radius_x', 'radius_y')
        for slot in self.lens._category_slots(category, surfaces):
            nominal = float(self.lens._slot_value(slot))
            bounds = _bounds_for_dof(nominal, lo, hi, relative, is_radius)
            if bounds is None:
                self._bounds.pop(slot, None)
            else:
                self._bounds[slot] = bounds
        return self

    # -- pickups and solves --
    def pickup(self, category, surface, *, from_surface, from_category=None,
               scale=1.0, offset=0.0):
        """Make DOFs pickups of others: dependent = scale*source + offset."""
        from_category = from_category or category
        targets = self.lens._category_slots(category, surface)
        sources = self.lens._category_slots(from_category, from_surface)
        if not targets or not sources:
            raise ValueError(
                f'pickup found no {category!r}/{from_category!r} DOFs on the '
                'requested surfaces')
        if len(targets) != len(sources):
            raise ValueError(
                f'pickup target ({len(targets)} DOFs) and source '
                f'({len(sources)} DOFs) must have equal length')
        existing_targets = self._pickup_target_slots()
        overlap = existing_targets.intersection(targets)
        if overlap:
            raise ValueError(
                f'pickup target {next(iter(overlap))!r} already has a driver')
        if self._image_solve is not None:
            solve_slot = ('thickness', self._image_solve[0], 0)
            if solve_slot in targets:
                raise ValueError(
                    f'pickup target {solve_slot!r} is driven by the active '
                    'image-distance solve')
        candidate = [*self._pickups,
                     (targets, sources, float(scale), float(offset))]
        self._topological_pickup_edges(candidate)
        for t in targets:
            self._free.pop(t, None)
            self._dependent.add(t)
        self._pickups = candidate
        self.lens._invalidate()
        return self

    def solve_image_distance(self, surface=None, *, wavelength=None):
        """Solve a gap so the image plane sits at the paraxial image."""
        lens = self.lens
        if surface is None:
            powered = [i for i, r in enumerate(lens.rows)
                       if isinstance(r, SurfaceRow)
                       and not _is_measurement_surf(_map_stype(r.typ))]
            if not powered:
                raise ValueError('no powered surface precedes the image plane')
            surface = max(powered)
        else:
            selected = lens._select_rows(surface)
            surface = selected[0]
        if not isinstance(lens.rows[surface], SurfaceRow):
            raise ValueError(
                'image-distance solve target must be a surface row')
        slot = ('thickness', surface, 0)
        if slot in self._pickup_target_slots():
            raise ValueError(
                f'image-distance solve target {slot!r} already has a pickup '
                'driver')
        self._image_solve = (surface, wavelength)
        self._free.pop(slot, None)
        self._dependent.add(slot)
        lens._invalidate()
        return self

    def clear_image_distance_solve(self):
        """Disable the active paraxial image-distance solve, if any."""
        if self._image_solve is None:
            return self
        surface, _ = self._image_solve
        slot = ('thickness', surface, 0)
        self._image_solve = None
        if slot not in self._pickup_target_slots():
            self._dependent.discard(slot)
        self.lens._invalidate()
        return self

    def _pickup_target_slots(self):
        out = set()
        for targets, _, _, _ in self._pickups:
            out.update(targets)
        return out

    def pickup_expansion(self, source_slot):
        """Slot tangents induced by one independent source-slot tangent."""
        tangents = {source_slot: 1.0}
        for target, source, scale, _ in self._topological_pickup_edges(
                self._pickups):
            if source in tangents:
                tangents[target] = scale * tangents[source]
        return tangents

    @staticmethod
    def _topological_pickup_edges(pickups):
        """Flatten pickup blocks in dependency order, rejecting cycles."""
        edges = []
        drivers = {}
        for targets, sources, scale, offset in pickups:
            for target, source in zip(targets, sources):
                if target in drivers:
                    raise ValueError(
                        f'pickup target {target!r} has multiple drivers')
                edge = (target, source, scale, offset)
                drivers[target] = edge
                edges.append(edge)
        ordered = []
        remaining = dict(drivers)
        while remaining:
            ready = [edge for edge in remaining.values()
                     if edge[1] not in remaining]
            if not ready:
                cycle = ', '.join(repr(slot) for slot in remaining)
                raise ValueError(f'pickup dependency cycle: {cycle}')
            for edge in ready:
                ordered.append(edge)
                remaining.pop(edge[0])
        return ordered

    def _clear_image_distance_solve_if_selected(self, slots):
        if self._image_solve is None:
            return
        surface, _ = self._image_solve
        if ('thickness', surface, 0) in slots:
            self.clear_image_distance_solve()

    def _resolve_dependencies(self):
        """Apply pickups then solves before compilation."""
        lens = self.lens
        lens._resolving = True
        try:
            for target, source, scale, offset in \
                    self._topological_pickup_edges(self._pickups):
                lens._set_slot_value(
                    target, scale * lens._slot_value(source) + offset)
            if self._image_solve is not None:
                surf_idx, wvl = self._image_solve
                surfaces = lens._compile_surfaces()
                mapping = SurfaceMap(lens)
                solved_surface = mapping.surface_for_row(surf_idx)
                image_surface = solved_surface + 1
                if image_surface >= len(surfaces):
                    raise ValueError(
                        'image-distance solve target must be the gap before '
                        'the IMAGE plane')
                image_row_idx = mapping.row_for_surface(image_surface)
                image_row = lens.rows[image_row_idx]
                if (image_surface != len(surfaces) - 1
                        or _map_stype(image_row.typ) != STYPE_IMG):
                    raise ValueError(
                        'image-distance solve target must be the gap before '
                        'the IMAGE plane')
                powered = surfaces[:image_surface]
                pid = paraxial_image_distance(powered, wvl=wvl)
                lens.rows[surf_idx].thickness = pid
        finally:
            lens._resolving = False

    def copy(self, new_lens):
        """A DesignState over new_lens with this registry copied."""
        new = DesignState(new_lens)
        new._free = dict(self._free)
        new._bounds = dict(self._bounds)
        new._pickups = [(list(t), list(s), sc, off)
                        for t, s, sc, off in self._pickups]
        new._image_solve = self._image_solve
        new._dependent = set(self._dependent)
        return new


__all__ = ['LensData', 'SurfaceRow', 'CoordBreak', 'DesignState',
           'SurfaceMap', 'R_rh', 'lens_element_groups']
