"""Surface apertures: clip predicates carrying their limiting radii.

Rebuild of the clip portion of ``prysm/x/raytracing/aperture.py`` (the
drawing/substrate cosmetics are plotting concerns, out of scope for the
trace kernel).
"""


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
        """Compact representation."""
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
        """Compact representation."""
        return (f'AnnularClip(inner_radius={self.inner_radius:g}, '
                f'outer_radius={self.outer_radius:g})')


class Aperture:
    """Surface aperture: an optional clip predicate."""

    def __init__(self, clip=None):
        if isinstance(clip, (int, float)):
            clip = CircularClip(clip)
        self.clip = clip

    def clips(self, x, y):
        """True where rays pass the aperture."""
        if self.clip is None:
            raise ValueError('aperture has no clip')
        return self.clip(x, y)

    def limiting_radius(self):
        """Radius bounding transmitted light, or None if unbounded."""
        if self.clip is None:
            return None
        return getattr(self.clip, 'limiting_radius', None)


def as_aperture(value):
    """Coerce None / float / callable / Aperture into an Aperture."""
    if isinstance(value, Aperture):
        return value
    if value is None:
        return Aperture()
    return Aperture(clip=value)


def circular_aperture(radius, x0=0.0, y0=0.0):
    """Circular clip predicate of the given radius."""
    return CircularClip(radius, x0, y0)


def annular_aperture(inner_radius, outer_radius, x0=0.0, y0=0.0):
    """Annular clip predicate passing the ring between the radii."""
    return AnnularClip(inner_radius, outer_radius, x0, y0)
