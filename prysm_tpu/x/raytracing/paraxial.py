"""Paraxial (first-order) ABCD analysis of surface sequences.

Rebuild of ``prysm/x/raytracing/paraxial.py``: scalar 2x2 (y, u) matrix
walk over a centered axial surface list, yielding EFL/BFL/FFL, image
distance, and pupil locations.  Host-side scalar math.
"""
import numpy as np

from .spencer_and_murty import (
    STYPE_REFLECT, STYPE_REFRACT, _is_measurement_surf,
)

_AXIAL_GEOMETRY_TOL = 1e-12


class NonAxialSystemError(ValueError):
    """A surface sequence is outside the centered-axial ABCD contract."""


def _require_wavelength(wvl):
    if wvl is None:
        raise ValueError('wavelength must be resolved before calling a '
                         'paraxial primitive; pass an explicit wvl.')
    return float(wvl)


def _as_surface_list(surfaces):
    if hasattr(surfaces, 'to_surfaces'):
        raise TypeError('paraxial primitives take a compiled surface list; '
                        'pass system.to_surfaces().')
    return list(surfaces)


def local_vertex_curvatures(surf):
    """(c_x, c_y) local vertex curvatures of a surface."""
    shape = getattr(surf, 'shape', None)
    params = (getattr(shape, 'params', None) or
              getattr(surf, 'params', None) or {})
    if 'c_x' in params and 'c_y' in params:
        return float(params['c_x']), float(params['c_y'])
    if 'c' in params:
        c = float(params['c'])
        return c, c
    return 0.0, 0.0


def local_x_vertex_curvature(surf):
    """Local x-section vertex curvature."""
    return local_vertex_curvatures(surf)[0]


def local_y_vertex_curvature(surf):
    """Local y-section vertex curvature."""
    return local_vertex_curvatures(surf)[1]


def _paraxial_curvature(surf):
    return local_y_vertex_curvature(surf)


def _assert_first_order_geometry(surfaces):
    for idx, surf in enumerate(surfaces):
        P = np.asarray(getattr(surf, 'P', (0.0, 0.0, 0.0)))
        if P.shape[0] >= 2 and not np.allclose(P[:2], 0.0,
                                               atol=_AXIAL_GEOMETRY_TOL, rtol=0):
            raise NonAxialSystemError(
                'paraxial first-order calculations require centered axial '
                f'geometry; surface {idx} has a decentered vertex.')
        R = getattr(surf, 'R', None)
        if R is not None and not np.allclose(np.asarray(R), np.eye(3),
                                             atol=_AXIAL_GEOMETRY_TOL, rtol=0):
            raise NonAxialSystemError(
                'paraxial first-order calculations require centered axial '
                f'geometry; surface {idx} is tilted or rotated.')


def _first_order_surfaces(surfaces):
    surfaces = _as_surface_list(surfaces)
    _assert_first_order_geometry(surfaces)
    return surfaces


def object_space_index(surfaces, wvl):
    """Index of the medium on the object side of the first surface."""
    if len(surfaces) > 0:
        first = surfaces[0]
        if _is_measurement_surf(getattr(first, 'typ', None)):
            material = getattr(first, 'material', None)
            if material is not None:
                return float(material.n(wvl))
    return 1.0


def _translation_matrix(t, n):
    return np.array([[1.0, t / n], [0.0, 1.0]])


def _refraction_matrix(c, n, n_prime):
    P_pwr = (n_prime - n) * c
    return np.array([[1.0, 0.0], [-P_pwr, 1.0]])


def _apply_surface_matrix(M, n, surf, wvl):
    c = _paraxial_curvature(surf)
    if surf.typ == STYPE_REFLECT:
        n_prime = -n
        return _refraction_matrix(c, n, n_prime) @ M, n_prime
    if surf.typ == STYPE_REFRACT:
        n_prime = float(surf.material.n(wvl))
        return _refraction_matrix(c, n, n_prime) @ M, n_prime
    return M, n


def _walk_matrix(surfaces, wvl, n_start, *, end_index=None,
                 include_end_surface=True):
    surfaces = _first_order_surfaces(surfaces)
    M = np.eye(2)
    n = float(n_start)
    z_prev = float(surfaces[0].P[2])
    if end_index is None:
        end_index = len(surfaces) - 1
    for k, surf in enumerate(surfaces):
        if k > end_index:
            break
        if k > 0:
            t = float(surf.P[2]) - z_prev
            M = _translation_matrix(t, n) @ M
        if include_end_surface or k != end_index:
            M, n = _apply_surface_matrix(M, n, surf, wvl)
        z_prev = float(surf.P[2])
    return M, n


def system_matrix(surfaces, wvl=None):
    """2x2 ABCD system matrix in (y, u) and the signed image-space index."""
    surfaces = _first_order_surfaces(surfaces)
    wvl = _require_wavelength(wvl)
    n_object = object_space_index(surfaces, wvl)
    return _walk_matrix(surfaces, wvl, n_object)


def paraxial_image_distance(surfaces, wvl=None):
    """Signed distance from the last interacting vertex to the paraxial image."""
    surfaces = _as_surface_list(surfaces)
    while len(surfaces) > 1 and _is_measurement_surf(
            getattr(surfaces[-1], 'typ', None)):
        surfaces = surfaces[:-1]
    M, n_final = system_matrix(surfaces, wvl=wvl)
    A = M[0, 0]
    C = M[1, 0]
    if abs(C) < 1e-30:
        raise ValueError('paraxial system has no net power; cannot solve for '
                         'an image distance from a collimated input.')
    return -A * n_final / C


def effective_focal_length(surfaces, wvl=None):
    """System EFL from the ABCD matrix: -n_object / C."""
    surfaces = _first_order_surfaces(surfaces)
    wvl = _require_wavelength(wvl)
    n_object = object_space_index(surfaces, wvl)
    M, _ = _walk_matrix(surfaces, wvl, n_object)
    C = M[1, 0]
    if abs(C) < 1e-30:
        raise ValueError('paraxial system has no net power; EFL is infinite.')
    return -float(n_object) / C


def back_focal_length(surfaces, wvl=None):
    """Distance from the last powered vertex to the rear focal point."""
    surfaces = _first_order_surfaces(surfaces)
    last_powered = None
    last_interacting = None
    for surf in surfaces:
        if surf.typ not in (STYPE_REFLECT, STYPE_REFRACT):
            continue
        last_interacting = surf
        if _paraxial_curvature(surf) != 0.0:
            last_powered = surf
    if last_powered is None:
        raise ValueError('surfaces contain no powered surfaces; BFL is undefined.')
    bfd = paraxial_image_distance(surfaces, wvl=wvl)
    extra = float(last_interacting.P[2]) - float(last_powered.P[2])
    return bfd + extra


def front_focal_length(surfaces, wvl=None):
    """Distance from the front focal point to the first powered vertex."""
    surfaces = _first_order_surfaces(surfaces)
    first_powered = None
    for surf in surfaces:
        if (_paraxial_curvature(surf) != 0.0
                and surf.typ in (STYPE_REFLECT, STYPE_REFRACT)):
            first_powered = surf
            break
    if first_powered is None:
        raise ValueError('surfaces contain no powered surfaces; FFL is undefined.')
    wvl = _require_wavelength(wvl)
    n_object = object_space_index(surfaces, wvl)
    M, _ = _walk_matrix(surfaces, wvl, n_object)
    C = M[1, 0]
    D = M[1, 1]
    if abs(C) < 1e-30:
        raise ValueError('paraxial system has no net power; FFL is infinite.')
    ffl_from_first_entry = -float(D) * float(n_object) / float(C)
    extra = float(first_powered.P[2]) - float(surfaces[0].P[2])
    return ffl_from_first_entry + extra


def _matrix_to_plane(surfaces, k, wvl, n_start):
    return _walk_matrix(surfaces, wvl, n_start, end_index=k,
                        include_end_surface=False)


def entrance_pupil_z(surfaces, wvl=None, stop_index=None):
    """Lab-frame z of the paraxial entrance pupil (None if undefined)."""
    surfaces = _first_order_surfaces(surfaces)
    wvl = _require_wavelength(wvl)
    n_object = object_space_index(surfaces, wvl)
    if stop_index is None:
        return None
    k = int(stop_index)
    if k < 0 or k >= len(surfaces):
        return None
    M_to_stop, _ = _matrix_to_plane(surfaces, k, wvl, n_object)
    A_b = float(M_to_stop[0, 0])
    B_b = float(M_to_stop[0, 1])
    if abs(A_b) < 1e-30:
        return None
    return float(surfaces[0].P[2]) + B_b * float(n_object) / A_b


class FirstOrderProperties:
    """Paraxial first-order properties of a surface sequence."""

    _FIELDS = ('wavelength', 'n_object', 'n_image', 'n_surfaces',
               'n_refractive', 'n_reflective', 'n_eval', 'total_track',
               'efl', 'bfl', 'ffl', 'paraxial_image_distance',
               'paraxial_image_z', 'epd', 'fno', 'na_image', 'stop_index',
               'ep_z', 'xp_z', 'ep_distance', 'xp_distance',
               'stop_diameter', 'ep_diameter', 'xp_diameter')

    def __init__(self):
        for f in self._FIELDS:
            setattr(self, f, None)

    def __repr__(self):
        """Summary of the non-None fields."""
        parts = [f'{f}={getattr(self, f)!r}' for f in self._FIELDS
                 if getattr(self, f) is not None]
        return f"FirstOrderProperties({', '.join(parts)})"


def ynu_first_order(surfaces, wvl=None, *, epd=None, stop_index=None):
    """First-order properties via the scalar YNU/ABCD matrix walk."""
    surfaces = _first_order_surfaces(surfaces)
    wvl = _require_wavelength(wvl)
    n_object = object_space_index(surfaces, wvl)
    epd = None if epd is None else float(epd)
    out = FirstOrderProperties()
    n_surfaces = len(surfaces)
    if n_surfaces == 0:
        raise ValueError('surfaces is empty')

    out.wavelength = float(wvl)
    out.n_object = float(n_object)
    out.n_surfaces = n_surfaces
    out.n_refractive = sum(1 for s in surfaces if s.typ == STYPE_REFRACT)
    out.n_reflective = sum(1 for s in surfaces if s.typ == STYPE_REFLECT)
    out.n_eval = n_surfaces - out.n_refractive - out.n_reflective
    out.total_track = float(surfaces[-1].P[2]) - float(surfaces[0].P[2])

    M, n_image_signed = _walk_matrix(surfaces, wvl, n_object)
    out.n_image = float(n_image_signed)
    A = float(M[0, 0])
    C = float(M[1, 0])
    D = float(M[1, 1])

    has_power = abs(C) >= 1e-30
    if has_power:
        out.efl = -float(n_object) / C
        dist_from_end = -A * out.n_image / C
        out.paraxial_image_z = float(surfaces[-1].P[2]) + dist_from_end
        first_powered = last_powered = last_interacting = None
        for surf in surfaces:
            if surf.typ not in (STYPE_REFLECT, STYPE_REFRACT):
                continue
            last_interacting = surf
            if _paraxial_curvature(surf) != 0.0:
                if first_powered is None:
                    first_powered = surf
                last_powered = surf
        if last_interacting is not None:
            out.paraxial_image_distance = (
                out.paraxial_image_z - float(last_interacting.P[2]))
        else:
            out.paraxial_image_distance = dist_from_end
        if last_powered is not None:
            out.bfl = out.paraxial_image_z - float(last_powered.P[2])
        if first_powered is not None:
            ffl_from_first = -D * float(n_object) / C
            out.ffl = (ffl_from_first + float(first_powered.P[2])
                       - float(surfaces[0].P[2]))

    if epd is not None:
        out.epd = float(epd)
        if has_power:
            out.fno = abs(out.efl) / out.epd
            out.na_image = abs(C) * out.epd / 2.0

    if stop_index is not None:
        k = int(stop_index)
        if k < 0 or k >= n_surfaces:
            raise IndexError(f'stop_index {k} out of range for surfaces of '
                             f'length {n_surfaces}')
        out.stop_index = k
        M_to_stop, n_at_stop = _matrix_to_plane(surfaces, k, wvl, n_object)
        M_from_stop, _ = _walk_matrix(surfaces[k:], wvl, n_at_stop)
        A_b = float(M_to_stop[0, 0])
        B_b = float(M_to_stop[0, 1])
        B_a = float(M_from_stop[0, 1])
        D_a = float(M_from_stop[1, 1])
        if abs(A_b) >= 1e-30:
            out.ep_distance = B_b * float(n_object) / A_b
            out.ep_z = float(surfaces[0].P[2]) + out.ep_distance
        if abs(D_a) >= 1e-30:
            out.xp_distance = -B_a * out.n_image / D_a
            out.xp_z = float(surfaces[-1].P[2]) + out.xp_distance
        if epd is not None:
            out.ep_diameter = out.epd
            if abs(A_b) >= 1e-30:
                out.stop_diameter = out.epd * abs(A_b)
                if abs(D_a) >= 1e-30:
                    A_a = float(M_from_stop[0, 0])
                    C_a = float(M_from_stop[1, 0])
                    det_from_stop = A_a * D_a - B_a * C_a
                    out.xp_diameter = out.stop_diameter * abs(det_from_stop / D_a)
    return out
