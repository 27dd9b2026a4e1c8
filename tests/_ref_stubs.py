"""Functional stand-ins for modules missing from the reference snapshot.

The reference tree lacks ``prysm/x/raytracing/_first_order.py`` and
``_surface_map.py`` (imported by its paraxial/listings/tolerancing
layers).  install() registers working replacements so the reference
package imports for parity testing.
"""
import sys
import types


class StubSurfaceMap:
    """Row index <-> compiled-surface index mapping over a LensData."""

    def __init__(self, lens):
        from prysm.x.raytracing.lensdata import SurfaceRow
        lens = getattr(lens, 'lens', lens)
        self._rows = list(lens.rows)
        self._surface_for_row = {}
        self._row_for_surface = []
        for r, row in enumerate(self._rows):
            if isinstance(row, SurfaceRow):
                self._surface_for_row[r] = len(self._row_for_surface)
                self._row_for_surface.append(r)

    def records(self):
        return [{'row_index': r,
                 'surface_index': self._surface_for_row.get(r),
                 'zemax_surface_number': r}
                for r in range(len(self._rows))]

    def surface_for_row(self, r):
        return self._surface_for_row[r]

    def row_for_surface(self, s):
        return self._row_for_surface[s]


def _initialize_slots(obj):
    for name in type(obj).__slots__:
        setattr(obj, name, None)


def _format_first_order(obj, clsname, **_kw):
    vals = ((n, getattr(obj, n)) for n in type(obj).__slots__)
    inner = ', '.join(f'{n}={v!r}' for n, v in vals if v is not None)
    return f'{clsname}({inner})'


def install():
    """Register (or upgrade) the stubs in sys.modules."""
    name = 'prysm.x.raytracing._first_order'
    if name not in sys.modules:
        m = types.ModuleType(name)
        m.initialize_slots = _initialize_slots
        m.format_first_order = _format_first_order
        sys.modules[name] = m

    name = 'prysm.x.raytracing._surface_map'
    if name in sys.modules:
        sys.modules[name].SurfaceMap = StubSurfaceMap
    else:
        m = types.ModuleType(name)
        m.SurfaceMap = StubSurfaceMap
        sys.modules[name] = m
    # rebind names imported before the upgrade
    for consumer in ('prysm.x.raytracing.listings',
                     'prysm.x.raytracing._diff_raytrace',
                     'prysm.x.raytracing.lensdata'):
        mod = sys.modules.get(consumer)
        if mod is not None and hasattr(mod, 'SurfaceMap'):
            mod.SurfaceMap = StubSurfaceMap
