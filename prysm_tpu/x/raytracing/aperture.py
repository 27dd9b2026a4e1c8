"""Surface apertures: clips, drawn extents, substrates, rim features.

Rebuild of ``prysm/x/raytracing/aperture.py``: the clip predicate is the
only part the trace kernel touches; extents / substrates / edge features
are layout-drawing metadata carried for the plotting and solve layers.
"""
import copy

import numpy as np


class CircularClip:
    """Circular clip predicate carrying its radius."""

    def __init__(self, radius, x0=0.0, y0=0.0):
        self.radius = float(radius)
        self.x0 = float(x0)
        self.y0 = float(y0)

    def __call__(self, x, y):
        """True where local coordinates are inside the aperture."""
        dx = x - self.x0
        dy = y - self.y0
        return dx * dx + dy * dy <= self.radius * self.radius

    @property
    def limiting_radius(self):
        """Outer radius that bounds transmitted light."""
        return self.radius

    def __repr__(self):
        return f'CircularClip(radius={self.radius:g})'


class AnnularClip:
    """Annular clip predicate passing the ring, blocking the central disk."""

    def __init__(self, inner_radius, outer_radius, x0=0.0, y0=0.0):
        self.inner_radius = float(inner_radius)
        self.outer_radius = float(outer_radius)
        self.x0 = float(x0)
        self.y0 = float(y0)

    def __call__(self, x, y):
        """True where local coordinates fall in the clear annulus."""
        dx = x - self.x0
        dy = y - self.y0
        rsq = dx * dx + dy * dy
        return ((rsq >= self.inner_radius * self.inner_radius)
                & (rsq <= self.outer_radius * self.outer_radius))

    @property
    def limiting_radius(self):
        """Outer radius that bounds transmitted light."""
        return self.outer_radius

    def __repr__(self):
        return (f'AnnularClip(inner_radius={self.inner_radius:g}, '
                f'outer_radius={self.outer_radius:g})')


def circular_aperture(radius, x0=0.0, y0=0.0):
    """Circular clip predicate of the given radius."""
    return CircularClip(radius, x0, y0)


def annular_aperture(inner_radius, outer_radius, x0=0.0, y0=0.0):
    """Annular clip predicate passing the ring between the radii."""
    return AnnularClip(inner_radius, outer_radius, x0, y0)


class CircularExtent:
    """Circular (annular when inner_radius > 0) drawn outline."""

    def __init__(self, outer_radius, inner_radius=0.0):
        self.outer_radius = float(outer_radius)
        self.inner_radius = float(inner_radius)

    def outline(self, points, *, center=0.0, radius=None):
        """Sample a meridian and bore mask; radius overrides outer_radius."""
        r = self.outer_radius if radius is None else radius
        local = np.linspace(-r, r, points)
        ploty = center + local
        mask = np.abs(local) < self.inner_radius
        return ploty, mask

    def __repr__(self):
        if self.inner_radius:
            return (f'CircularExtent(outer_radius={self.outer_radius:g}, '
                    f'inner_radius={self.inner_radius:g})')
        return f'CircularExtent(outer_radius={self.outer_radius:g})'


class Substrate:
    """Mirror backing drawn behind a surface's meridian."""

    def __init__(self, thickness, side='auto', bore=0.0):
        self.thickness = float(thickness)
        self.side = side
        self.bore = float(bore)

    def __repr__(self):
        return f'{type(self).__name__}(thickness={self.thickness:g})'


class SurfaceSubstrate:
    """Zero-thickness backing that traces the surface profile itself."""


class ParallelSubstrate(Substrate):
    """Backing offset parallel to the surface sag."""


class FlatParentSubstrate(Substrate):
    """Flat backing referenced to the parent vertex."""


class FlatBackSubstrate(Substrate):
    """Flat backing referenced to the aperture edge or vertex."""

    def __init__(self, thickness, side='auto', reference='aperture',
                 bore=0.0):
        super().__init__(thickness, side=side, bore=bore)
        self.reference = reference


class EdgeFeature:
    """Rim-wall cosmetic feature."""

    def __init__(self, side='both'):
        self.side = side


class SquareCut(EdgeFeature):
    """Square cut on the rim wall."""

    def __init__(self, z_start, z_end, depth, side='both'):
        super().__init__(side=side)
        self.z_start = float(z_start)
        self.z_end = float(z_end)
        self.depth = float(depth)


class Flat(SquareCut):
    """Flat ground on the rim wall."""


class Chamfer(SquareCut):
    """Chamfer on the rim wall."""


class Seat(EdgeFeature):
    """Mounting seat on the rim wall."""

    def __init__(self, face, width, depth, side='both'):
        super().__init__(side=side)
        self.face = face
        self.width = float(width)
        self.depth = float(depth)


class Aperture:
    """A surface's clip, drawn extent, oversize, substrate, rim features.

    clip: None / float (circular) / callable.  extent is a drawn outline,
    never a clip; None derives or solves from the traced footprint.
    """

    def __init__(self, clip=None, *, extent=None, oversize=1.05,
                 substrate=None, features=()):
        if isinstance(clip, (int, float)) and not isinstance(clip, bool):
            clip = circular_aperture(clip)
        self.clip = clip
        self.oversize = float(oversize)
        self.substrate = substrate
        self.features = tuple(features)
        self._user_extent = extent is not None
        self.extent = extent
        self._solved_at_version = None

    @property
    def is_auto(self):
        """True when no clip and no user-set extent (the solve sizes it)."""
        return self.clip is None and not self._user_extent

    def clips(self, x, y):
        """Boolean mask of rays passing the clip (scalar True for no clip)."""
        if self.clip is None:
            return np.bool_(True)
        return self.clip(x, y)

    def limiting_radius(self, footprint=None):
        """Clip radius if the clip exposes one, else the footprint."""
        clip = self.clip
        if clip is not None:
            r = getattr(clip, 'limiting_radius', None)
            if r is not None:
                return r
        return footprint

    def center(self):
        """Local xy center exposed by the clip, else the surface origin."""
        clip = self.clip
        return (float(getattr(clip, 'x0', 0.0)),
                float(getattr(clip, 'y0', 0.0)))

    def drawn_radius(self, footprint=None):
        """Drawn radius: explicit extent, else limiting_radius x oversize."""
        if self.extent is not None:
            return self.extent.outer_radius
        lr = self.limiting_radius(footprint)
        return None if lr is None else lr * self.oversize

    def solve_extent(self, footprint, version, oversize=None):
        """Write a derived circular extent from a traced footprint."""
        ov = self.oversize if oversize is None else float(oversize)
        self.extent = CircularExtent(footprint * ov)
        self._user_extent = False
        self._solved_at_version = version

    def is_stale(self, version):
        """True when an auto extent has not been solved against version."""
        if not self.is_auto:
            return False
        return self._solved_at_version != version

    def copy(self):
        """A deep parameter copy; the extent solve-stamp travels with it."""
        new = Aperture(copy.deepcopy(self.clip),
                       extent=copy.deepcopy(self.extent),
                       oversize=self.oversize,
                       substrate=copy.deepcopy(self.substrate),
                       features=copy.deepcopy(self.features))
        new._user_extent = self._user_extent
        new._solved_at_version = self._solved_at_version
        return new

    def __deepcopy__(self, memo):
        """Deep copy preserving the solve stamp."""
        return self.copy()

    def __repr__(self):
        bits = []
        if self.clip is not None:
            bits.append(f'clip={self.clip!r}')
        if self.extent is not None:
            tag = '' if self._user_extent else ' (auto)'
            bits.append(f'extent={self.extent!r}{tag}')
        if self.substrate is not None:
            bits.append(f'substrate={self.substrate!r}')
        return f"Aperture({', '.join(bits)})"


def as_aperture(value):
    """Coerce None / float / callable / Aperture into an Aperture."""
    if isinstance(value, Aperture):
        return value
    if value is None:
        return Aperture()
    return Aperture(clip=value)
