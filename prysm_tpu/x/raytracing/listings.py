"""Tabular LensData listings: surfaces, apertures, coordinate breaks.

Rebuild of ``prysm/x/raytracing/listings.py``.
"""
from .spencer_and_murty import (
    STYPE_EVAL, STYPE_OBJ, STYPE_IMG, STYPE_REFLECT, STYPE_REFRACT)
from .surfaces import _map_stype
from .aperture import AnnularClip, CircularClip
from ..materials import MIRROR, air, vacuum
from .lensdata import CoordBreak, SurfaceMap


def _radius_str(c):
    c = float(c)
    if c == 0.0:
        return 'inf'
    return f'{1.0 / c:.6g}'


def _type_str(typ):
    s = _map_stype(typ)
    return {STYPE_REFRACT: 'refr', STYPE_REFLECT: 'refl',
            STYPE_EVAL: 'eval', STYPE_OBJ: 'object',
            STYPE_IMG: 'image'}.get(s, str(typ))


def material_str(material, typ):
    """Display string for a row material."""
    if (_map_stype(typ) == STYPE_REFLECT or material is MIRROR
            or material == MIRROR):
        return 'MIRROR'
    if material is None or material is air or material is vacuum:
        return ''
    name = getattr(material, 'name', None)
    if name:
        return str(name)
    return str(material)


def surface_row_mappings(lensdata):
    """Per-row dicts mapping row index to compiled-surface index."""
    return SurfaceMap(lensdata).records()


class SurfaceTable:
    """Lens-data-editor table."""

    __slots__ = ('records', 'unit', 'stop_index')

    def __init__(self, records, unit=None, stop_index=None):
        self.records = records
        self.unit = unit
        self.stop_index = stop_index

    def __repr__(self):
        unit = f' [{self.unit}]' if self.unit else ''
        header = (f'  {"#":>3s} {"":>1s} {"type":>6s} {"radius":>12s} '
                  f'{"conic":>10s} {"thickness":>12s} {"material":>10s} '
                  f'{"semidia":>10s} {"coat":>5s}')
        lines = [f'SurfaceTable{unit}', header,
                 '  ' + '-' * (len(header) - 2)]
        for r in self.records:
            mark = '*' if r['stop'] else ' '
            sd = ('' if r['semidiameter'] is None
                  else f'{r["semidiameter"]:.6g}')
            coat = 'Y' if r.get('coating') else ''
            lines.append(
                f'  {r["index"]:>3d} {mark:>1s} {r["type"]:>6s} '
                f'{r["radius"]:>12s} {r["conic"]:>10s} '
                f'{r["thickness"]:>12.6g} {r["material"]:>10s} {sd:>10s} '
                f'{coat:>5s}')
        return '\n'.join(lines)


class ApertureTable:
    """Per-surface aperture table."""

    __slots__ = ('records', 'version')

    def __init__(self, records, version=None):
        self.records = records
        self.version = version

    def __repr__(self):
        header = (f'  {"#":>3s} {"clip":>18s} {"drawn":>12s} '
                  f'{"provenance":>10s} {"stale":>6s}')
        lines = ['ApertureTable', header, '  ' + '-' * (len(header) - 2)]
        for r in self.records:
            drawn = '' if r['drawn'] is None else f'{r["drawn"]:.6g}'
            stale = 'stale' if r['stale'] else ''
            lines.append(
                f'  {r["index"]:>3d} {r["clip"]:>18s} {drawn:>12s} '
                f'{r["provenance"]:>10s} {stale:>6s}')
        return '\n'.join(lines)


class DecenterTable:
    """Coordinate-break table."""

    __slots__ = ('records',)

    def __init__(self, records):
        self.records = records

    def __repr__(self):
        if not self.records:
            return 'DecenterTable (no coordinate breaks)'
        header = (f'  {"#":>3s} {"dx":>9s} {"dy":>9s} {"dz":>9s} '
                  f'{"rz":>9s} {"ry":>9s} {"rx":>9s} {"kind":>7s}')
        lines = ['DecenterTable', header, '  ' + '-' * (len(header) - 2)]
        for r in self.records:
            lines.append(
                f'  {r["index"]:>3d} {r["dx"]:>9.4g} {r["dy"]:>9.4g} '
                f'{r["dz"]:>9.4g} {r["rz"]:>9.4g} {r["ry"]:>9.4g} '
                f'{r["rx"]:>9.4g} {r["kind"]:>7s}')
        return '\n'.join(lines)


def surface_table(lensdata, *, stop_index=None, unit=None):
    """Build the lens-data-editor surface table for a LensData."""
    records = []
    mappings = surface_row_mappings(lensdata)
    for mapping, row in zip(mappings, lensdata.rows):
        i = mapping['row_index']
        surface_index = mapping['surface_index']
        is_stop = surface_index == stop_index and stop_index is not None
        if isinstance(row, CoordBreak):
            records.append({
                'index': i, 'type': f'CB:{row.kind}', 'radius': '',
                'conic': '', 'thickness': float(row.thickness),
                'material': '', 'semidiameter': None, 'coating': False,
                'surface_index': surface_index, 'stop': is_stop,
            })
            continue
        shape = row.build_shape()
        params = shape.params or {}
        # the shape's descriptor names its canonical radius/conic DOFs
        cats = type(shape).CATEGORIES
        radius_keys = cats.get('radius') or cats.get('curvature') or ()
        conic_keys = cats.get('conic') or ()
        c = params.get(radius_keys[-1], 0.0) if radius_keys else 0.0
        k = params.get(conic_keys[-1], 0.0) if conic_keys else 0.0
        records.append({
            'index': i, 'type': _type_str(row.typ),
            'radius': _radius_str(c),
            'conic': f'{float(k):.6g}',
            'thickness': float(row.thickness),
            'material': material_str(row.material, row.typ),
            'semidiameter': _clip_radius(row.aperture),
            'coating': getattr(row, 'coating', None) is not None,
            'surface_index': surface_index, 'stop': is_stop,
        })
    return SurfaceTable(records, unit=unit, stop_index=stop_index)


def _clip_radius(aperture):
    r = aperture.limiting_radius()
    return None if r is None else float(r)


def _clip_str(clip):
    if clip is None:
        return ''
    if isinstance(clip, CircularClip):
        return f'circular {clip.radius:.6g}'
    if isinstance(clip, AnnularClip):
        return f'annular {clip.inner_radius:.4g}-{clip.outer_radius:.4g}'
    return type(clip).__name__


def aperture_table(lensdata):
    """Build the per-surface aperture table for a LensData."""
    records = []
    version = lensdata._version
    for i, row in enumerate(lensdata.rows):
        if isinstance(row, CoordBreak):
            continue
        ap = row.aperture
        records.append({
            'index': i,
            'clip': _clip_str(ap.clip),
            'drawn': ap.drawn_radius(),
            'provenance': 'auto' if ap.is_auto else 'user',
            'stale': ap.is_stale(version),
        })
    return ApertureTable(records, version=version)


def decenter_table(lensdata):
    """Build the coordinate-break decenter / tilt table for a LensData."""
    records = []
    for i, row in enumerate(lensdata.rows):
        if not isinstance(row, CoordBreak):
            continue
        dx, dy, dz = (float(v) for v in row.decenter)
        rz, ry, rx = (float(v) for v in row.tilt)
        records.append({
            'index': i, 'dx': dx, 'dy': dy, 'dz': dz,
            'rz': rz, 'ry': ry, 'rx': rx, 'kind': row.kind,
        })
    return DecenterTable(records)


__all__ = ['surface_table', 'aperture_table', 'decenter_table',
           'SurfaceTable', 'ApertureTable', 'DecenterTable', 'material_str']
