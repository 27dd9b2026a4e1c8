"""Object/image-space index helpers over compiled surfaces.

Rebuild of ``prysm/x/raytracing/_meta.py``.
"""
from .spencer_and_murty import STYPE_REFRACT, _is_measurement_surf


def _surface_medium_index(surface, wavelength, fallback):
    material = getattr(surface, 'material', None)
    if material is not None:
        return float(material.n(wavelength))
    return float(fallback)


def object_space_index(surfaces, wavelength):
    """Object-space medium index from the object surface (air if absent)."""
    if hasattr(surfaces, 'to_surfaces'):
        surfaces = surfaces.to_surfaces()
    if (len(surfaces) > 0
            and _is_measurement_surf(getattr(surfaces[0], 'typ', None))):
        return _surface_medium_index(surfaces[0], wavelength, 1.0)
    return 1.0


def object_image_indices(surfaces, wavelength):
    """(n_object, n_image); the image side falls back to the object side."""
    n_object = object_space_index(surfaces, wavelength)
    n_image = image_space_index(surfaces, wavelength, fallback=n_object)
    return n_object, n_image


def image_space_index(surfaces, wavelength, fallback=1.0):
    """Image-space medium index from an explicit image surface."""
    if len(surfaces) == 0:
        return float(fallback)
    if not _is_measurement_surf(getattr(surfaces[-1], 'typ', None)):
        raise ValueError(
            'image-space index requires a trailing eval image surface; '
            'append an explicit image surface instead of relying on a bare '
            'final powered surface.')
    n = object_space_index(surfaces, wavelength)
    if len(surfaces) == 1:
        return n
    start = 1 if _is_measurement_surf(
        getattr(surfaces[0], 'typ', None)) else 0
    for surface in surfaces[start:]:
        if getattr(surface, 'typ', None) == STYPE_REFRACT:
            n = _surface_medium_index(surface, wavelength, n)
    return float(n)
