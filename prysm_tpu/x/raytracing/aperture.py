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
    """Mirror backing drawn behind a surface's meridian.

    Subclasses define the rear face through back_sag; back_outline
    closes the optical face against it, splitting a bored back into two
    disjoint loops (reference: x/raytracing/aperture.py:120-172).
    Coordinates are the surface's local frame (sag along local z).
    """

    def __init__(self, thickness, side='auto', bore=0.0):
        self.thickness = float(thickness)
        self.side = side
        self.bore = float(bore)

    def _resolved_side(self, sag):
        """+1 / -1 offset sign; 'auto' puts the back behind the figure."""
        side = self.side
        if isinstance(side, str):
            if side != 'auto':
                raise ValueError(f'unknown substrate side {side!r}')
            sag = np.asarray(sag)
            departure = np.nanmean(sag - sag[len(sag) // 2])
            return -1.0 if departure > 0 else 1.0
        side = float(side)
        if side == 0.0:
            raise ValueError('substrate side must be nonzero')
        return float(np.sign(side))

    def back_sag(self, surf, ploty, sag, center=0.0):
        """Rear-face local z along the sampled meridian; override."""
        raise NotImplementedError

    def back_outline(self, surf, ploty, sag, center=0.0, bore=None):
        """Closed meridional outline (zz, yy) of face + back, local frame.

        A positive bore (default the substrate's) removes |y - center| <
        bore and renders the result as two loops separated by NaN.
        """
        bore = self.bore if bore is None else float(bore)
        ploty = np.asarray(ploty, dtype=float)
        sag = np.asarray(sag, dtype=float)
        rear = np.asarray(self.back_sag(surf, ploty, sag, center=center),
                          dtype=float)
        if bore > 0.0:
            zz, yy = [], []
            for sel in (ploty >= center + bore, ploty <= center - bore):
                good = sel & np.isfinite(sag) & np.isfinite(rear)
                if not good.any():
                    continue
                fz, rz, py = sag[good], rear[good], ploty[good]
                zz += [*fz, *rz[::-1], fz[0], np.nan]
                yy += [*py, *py[::-1], py[0], np.nan]
            return np.asarray(zz[:-1]), np.asarray(yy[:-1])
        zz = np.concatenate([sag, rear[::-1], sag[:1]])
        yy = np.concatenate([ploty, ploty[::-1], ploty[:1]])
        return zz, yy

    def __repr__(self):
        return f'{type(self).__name__}(thickness={self.thickness:g})'


class SurfaceSubstrate:
    """Zero-thickness backing that traces the surface profile itself."""

    bore = 0.0

    def back_outline(self, surf, ploty, sag, center=0.0, bore=None):
        """Just the optical face (no drawn back)."""
        return np.asarray(sag, dtype=float), np.asarray(ploty, dtype=float)


class ParallelSubstrate(Substrate):
    """Backing offset parallel to the surface sag."""

    def back_sag(self, surf, ploty, sag, center=0.0):
        """Optical sag offset by the (signed) thickness."""
        sag = np.asarray(sag, dtype=float)
        return sag + self._resolved_side(sag) * self.thickness


class FlatParentSubstrate(Substrate):
    """Flat backing referenced to the parent vertex."""

    def back_sag(self, surf, ploty, sag, center=0.0):
        """Flat plane at the local vertex sag plus the signed thickness."""
        sag = np.asarray(sag, dtype=float)
        vertex = float(np.asarray(surf.sag(np.zeros(1), np.zeros(1)))[0])
        return np.full_like(sag,
                            vertex + self._resolved_side(sag)
                            * self.thickness)


class FlatBackSubstrate(Substrate):
    """Flat backing tangent to the surface at a reference coordinate."""

    def __init__(self, thickness, side='auto', reference='aperture',
                 bore=0.0):
        super().__init__(thickness, side=side, bore=bore)
        self.reference = reference

    def _reference_coordinate(self, ploty):
        ref = self.reference
        if not isinstance(ref, str):
            return float(ref)
        ref = ref.lower()
        if ref in ('center', 'centre'):
            return float(np.nanmean(ploty))
        if ref in ('vertex', 'local_vertex', 'section_vertex', 'parent',
                   'parent_vertex'):
            return 0.0
        if ref == 'aperture':
            return float(np.nanmax(np.abs(ploty)))
        raise ValueError(f'unknown FlatBackSubstrate reference {ref!r}')

    def back_sag(self, surf, ploty, sag, center=0.0):
        """Plane through the surface tangent at the reference coordinate."""
        sag = np.asarray(sag, dtype=float)
        ploty = np.asarray(ploty, dtype=float)
        ref = self._reference_coordinate(ploty)
        coord = np.asarray([ref], dtype=float)
        z, n_hat = surf.sag_and_normal(np.zeros_like(coord), coord)
        z = float(np.asarray(z)[0])
        n_hat = np.asarray(n_hat)
        slope = float(-n_hat[..., 1].ravel()[0] / n_hat[..., 2].ravel()[0])
        offset = self._resolved_side(sag) * self.thickness
        return z + slope * (ploty - ref) + offset


class EdgeFeature:
    """Rim-wall cosmetic feature."""

    is_chamfer = False

    def __init__(self, side='both'):
        self.side = side

    def applies_to(self, wall_side):
        """True when this feature is cut on the given wall ('upper'/'lower')."""
        return self.side in ('both', wall_side)

    def span(self, x0, x1, endpoint_names):
        """(start, end, depth) axial extent of the inset; override."""
        raise NotImplementedError


class SquareCut(EdgeFeature):
    """Square cut on the rim wall."""

    def __init__(self, z_start, z_end, depth, side='both'):
        super().__init__(side=side)
        self.z_start = float(z_start)
        self.z_end = float(z_end)
        self.depth = float(depth)

    def span(self, x0, x1, endpoint_names):
        """Fixed axial inset extent (z_start, z_end, depth)."""
        return self.z_start, self.z_end, self.depth


class Flat(SquareCut):
    """Flat ground on the rim wall."""


class Chamfer(SquareCut):
    """Chamfer on the rim wall."""

    is_chamfer = True


class Seat(EdgeFeature):
    """Mounting seat stepped a fixed width in from a named wall face."""

    def __init__(self, face, width, depth, side='both'):
        super().__init__(side=side)
        self.face = face
        self.width = float(width)
        self.depth = float(depth)

    def span(self, x0, x1, endpoint_names):
        """Axial inset extent stepping width in from the named face."""
        face = str(self.face).lower()
        sign = float(np.sign(x1 - x0)) or 1.0
        if face == endpoint_names[0]:
            return x0, x0 + sign * self.width, self.depth
        if face == endpoint_names[1]:
            return x1 - sign * self.width, x1, self.depth
        raise ValueError('seat face must name one wall endpoint')


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
