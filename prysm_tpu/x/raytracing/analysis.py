"""Ray-optics analysis: wavefront, spots, fans, distortion, color.

Rebuild of ``prysm/x/raytracing/analysis.py``.  Grid arrays are indexed
[field_index, wavelength_index, sample_index].  Host numpy orchestration
over the jittable trace kernel.
"""
from collections import namedtuple
from dataclasses import dataclass

import numpy as np

from ...polynomials import zernike_nm_seq, lstsq

from .spencer_and_murty import raytrace, valid_mask, _is_measurement_surf
from .opt import (
    xp_reference_sphere,
    hopkins_eic_closing,
    reference_sphere_curvature,
    centroid_referenced_rms,
    centroid_referenced_max,
    _pupil_center_chief_index,
)
from .paraxial import paraxial_image_distance, NonAxialSystemError
from .launch import Field, Sampling, _apply_vignetting
from ._trace_grid import (
    TraceRecord, iter_trace_grid, trace_cell, _resolve_fields,  # NOQA: F401
    _resolve_wavelengths, _require_epd, field_sweep,
)
from ._resolve import compiled_surfaces, resolve_wavelength, trace_context
from .surfaces import Conic, EvenAsphere, Plane, Sphere

_PREC = np.float64


@dataclass(frozen=True)
class DistortionResult:
    """Chief-ray vs paraxial-proxy image landings and percent distortion."""

    real_xy: object
    paraxial_xy: object
    percent: object
    fields: object = None
    unit: str = 'percent'
    reference: str = 'paraxial'


@dataclass(frozen=True)
class FieldCurvatureResult:
    """X/Y-fan parabasal focus z per field."""

    x_fan_z: object
    y_fan_z: object
    fields: object = None
    labels: object = None
    image_z: object = None
    unit: str = 'mm'
    reference: str = 'global_z'


RayFanGrid = namedtuple(
    'RayFanGrid',
    ['fields', 'wavelengths', 'pupil_x', 'pupil_y', 'x', 'y',
     'unit', 'reference'])
OPDFanGrid = namedtuple(
    'OPDFanGrid',
    ['fields', 'wavelengths', 'pupil_x', 'pupil_y', 'x', 'y',
     'unit', 'reference'])
SpotGrid = namedtuple(
    'SpotGrid',
    ['fields', 'wavelengths', 'x', 'y', 'valid', 'reference_xy',
     'unit', 'reference'])
FullFieldGrid = namedtuple(
    'FullFieldGrid',
    ['hx', 'hy', 'data', 'metric', 'kind', 'unit', 'data_unit',
     'reference'])


def _axis_index(axis):
    if axis == 'x':
        return 0
    if axis == 'y':
        return 1
    raise ValueError(f"axis must be 'x' or 'y', got {axis!r}")


def _reference_value(values, valid, reference, chief_index, *,
                     allow_none=False):
    """Reference point shared by fan and spot analyses."""
    values = np.asarray(values)
    if reference == 'centroid':
        return np.mean(values[valid], axis=0)
    if reference == 'chief':
        if not bool(valid[chief_index]):
            raise ValueError(
                'chief ray is invalid; pass reference="centroid" for an '
                'obscured or vignetted bundle')
        return values[chief_index]
    if reference is None and allow_none:
        return np.zeros(values.shape[1:], dtype=values.dtype)
    choices = ("'centroid', 'chief', or None" if allow_none
               else "'centroid' or 'chief'")
    raise ValueError(f'reference must be {choices}, got {reference!r}')


def _center_valid(values, valid, reference, chief_index, *, allow_none=False):
    """Reference-subtract values and NaN-out invalid rays."""
    values = np.array(values, copy=True)
    ref = _reference_value(values, valid, reference, chief_index,
                           allow_none=allow_none)
    out = values - ref
    out[~valid] = np.nan
    return out, ref


def resolve_exit_pupil(system, wavelength, *, stop_index=None, epd=None,
                       field=None, chief=None, axis_point=None, axis_dir=None,
                       min_perp=1e-6, return_mode=False):
    """Exit-pupil reference point P_xp for a wavefront evaluation.

    Paraxial stop route when available, chief-axis closest approach
    otherwise; None for image-space telecentric.
    """
    def _ret(P_xp, mode):
        return (P_xp, mode) if return_mode else P_xp

    resolved_stop = (stop_index if stop_index is not None
                     else getattr(system, 'stop_index', None))
    if resolved_stop is not None:
        try:
            resolver = getattr(system, '_ynu_first_order', None)
            if callable(resolver):
                fo = resolver(wvl=wavelength, epd=epd,
                              stop_index=resolved_stop)
            else:
                from .paraxial import ynu_first_order
                fo = ynu_first_order(compiled_surfaces(system),
                                     wvl=wavelength, epd=epd,
                                     stop_index=resolved_stop)
        except NonAxialSystemError:
            # no centered ABCD; only an explicit-axis call may go geometric
            if axis_point is None and axis_dir is None:
                raise
        else:
            if fo.xp_z is None:
                return _ret(None, 'paraxial')
            P_xp = np.array([0.0, 0.0, float(fo.xp_z)], dtype=_PREC)
            return _ret(P_xp, 'paraxial')

    if chief is not None:
        P_chief_final, S_chief_final = chief
    else:
        if field is None:
            field = Field(0.0, 0.0)
        epd_geo = epd
        if epd_geo is None:
            resolver = getattr(system, 'entrance_pupil_diameter', None)
            if callable(resolver):
                epd_geo = resolver(wavelength)
        if epd_geo is None:
            epd_geo = 1.0  # chief is a single pupil-center ray
        tr = trace_cell(system, field, wavelength, Sampling.chief(),
                        epd=epd_geo).trace
        P_chief_final = np.asarray(tr.P)[-1, 0]
        S_chief_final = np.asarray(tr.S)[-1, 0]
    _, _, P_xp = xp_reference_sphere(P_chief_final, S_chief_final,
                                     axis_point=axis_point,
                                     axis_dir=axis_dir, min_perp=min_perp)
    return _ret(np.asarray(P_xp, dtype=_PREC), 'geometric')


# ---------- transverse ray aberration ---------------------------------------

def transverse_ray_aberration(P_hist, axis='y', chief_index=None, status=None,
                              reference='chief'):
    """(pupil, delta): image-plane offset vs pupil coordinate per ray."""
    P_hist = np.asarray(P_hist)
    ax = _axis_index(axis)
    if chief_index is None:
        chief_index = _pupil_center_chief_index(P_hist[0])
    pupil = P_hist[0, :, ax]
    image = P_hist[-1, :, ax]

    valid = np.asarray(valid_mask(status, P_hist[-1]))

    if reference == 'chief':
        ref_pupil = pupil[chief_index]
    elif reference == 'centroid':
        ref_pupil = np.mean(pupil[valid])
    else:
        ref_pupil = _reference_value(pupil, valid, reference, chief_index)
    ref_image = _reference_value(image, valid, reference, chief_index)
    return pupil[valid] - ref_pupil, image[valid] - ref_image


def spot_positions(P_final, status=None, origin=None):
    """(x, y) valid image-plane spot landings, optionally re-centered."""
    P_final = np.asarray(P_final)
    x = P_final[..., 0]
    y = P_final[..., 1]
    if status is not None:
        valid = np.asarray(valid_mask(status, P_final))
        x = x[valid]
        y = y[valid]
    if origin is not None:
        if isinstance(origin, str):
            if origin.lower() == 'centroid':
                origin = (np.nanmean(x), np.nanmean(y))
            else:
                raise ValueError("origin string must be 'centroid'")
        origin = np.asarray(origin)
        x = x - origin[0]
        y = y - origin[1]
    return x, y


# ---------- wavefront --------------------------------------------------------

def _filtered_chief_index(valid, chief_index):
    valid_indices = np.nonzero(valid)[0]
    return int(np.nonzero(valid_indices == chief_index)[0][0])


def _resolve_chief_index(P, valid, reference, chief_index):
    if chief_index is not None:
        return int(chief_index)
    mask = valid if reference == 'centroid' else None
    return _pupil_center_chief_index(np.asarray(P), mask)


def _require_valid_chief(valid, chief_index, reference='chief'):
    if bool(valid[chief_index]):
        return
    if reference == 'chief':
        raise ValueError(
            'chief ray is invalid; cannot define reference sphere.  Pass '
            "reference='centroid' for an obscured or vignetted bundle.")
    raise ValueError(
        f'anchor ray (chief_index={chief_index}) is invalid; pass a '
        'chief_index that survives the trace, or omit it to auto-select '
        'the surviving ray nearest the pupil center')


class ReferenceSphereClosing:
    """Chief-zeroed OPD and reusable reference-sphere geometry."""

    __slots__ = ('opd', 'curvature', 'filtered_chief', 'R', 'delta')

    def __init__(self, opd, curvature, filtered_chief, R, delta):
        self.opd = opd
        self.curvature = curvature
        self.filtered_chief = filtered_chief
        self.R = R
        self.delta = delta


def close_on_reference_sphere(trace, valid, chief_index, *, center, P_xp,
                              n_image, curvature=None):
    """Close a traced bundle onto the chief-image reference sphere."""
    center = np.asarray(center)
    if curvature is None:
        curvature = reference_sphere_curvature(P_xp, center)
    else:
        curvature = float(curvature)
    if P_xp is None:
        delta = None
        R = np.inf
    else:
        delta = np.asarray(P_xp, dtype=center.dtype) - center
        R = float(np.sqrt(np.sum(delta * delta)))
    filtered_chief = _filtered_chief_index(valid, chief_index)
    P = np.asarray(trace.P)
    S = np.asarray(trace.S)
    OPL = np.asarray(trace.OPL)
    opd = hopkins_eic_closing(P[:, valid], S[:, valid], OPL[:, valid],
                              center=center, curvature=curvature,
                              n_image=n_image, chief_index=filtered_chief)
    return ReferenceSphereClosing(opd, curvature, filtered_chief, R, delta)


class WavefrontClosing:
    """Closed wavefront of one bundle, with the geometry that made it."""

    __slots__ = ('opd', 'valid', 'chief_index', 'center', 'P_xp', 'xp_mode',
                 'curvature', 'R', 'delta', 'filtered_chief', 'n_image')

    def __init__(self, opd, valid, chief_index, center, P_xp, xp_mode,
                 curvature, R, delta, filtered_chief, n_image):
        self.opd = opd
        self.valid = valid
        self.chief_index = chief_index
        self.center = center
        self.P_xp = P_xp
        self.xp_mode = xp_mode
        self.curvature = curvature
        self.R = R
        self.delta = delta
        self.filtered_chief = filtered_chief
        self.n_image = n_image


def close_wavefront(system, trace, wavelength, chief_index, *, field=None,
                    center=None, P_xp=None, stop_index=None, epd=None,
                    axis_point=None, axis_dir=None, min_perp=1e-6, valid=None,
                    reference='chief', apply_field_tilt=True, ctx=None):
    """Close a traced bundle into a chief-referenced OPD.

    Owns validity, medium indices, exit-pupil resolution, EIC closing,
    and the launch-plane field-tilt ramp.
    """
    if valid is None:
        valid = np.asarray(valid_mask(trace.status, trace.P[-1]))
    chief_index = int(chief_index)
    _require_valid_chief(valid, chief_index, reference)
    if ctx is None:
        ctx = trace_context(system, wavelength)
    n_image = ctx.n_image
    P_chief = np.asarray(trace.P)[-1, chief_index]
    if center is None:
        center = P_chief
    if P_xp is None:
        P_xp, xp_mode = resolve_exit_pupil(
            system, wavelength, stop_index=stop_index, epd=epd,
            chief=(P_chief, np.asarray(trace.S)[-1, chief_index]),
            axis_point=axis_point, axis_dir=axis_dir, min_perp=min_perp,
            return_mode=True)
    else:
        xp_mode = 'fixed'
    if P_xp is not None:
        P_xp = np.asarray(P_xp, dtype=_PREC)
    closing = close_on_reference_sphere(trace, valid, chief_index,
                                        center=center, P_xp=P_xp,
                                        n_image=n_image)
    opd = closing.opd
    if apply_field_tilt and field is not None:
        ax, ay = field.angle_radians()
        P0 = np.asarray(trace.P)[0]
        x_pupil = P0[valid, 0] - P0[chief_index, 0]
        y_pupil = P0[valid, 1] - P0[chief_index, 1]
        opd = opd + (np.sin(ax) * x_pupil + np.sin(ay) * y_pupil)
    return WavefrontClosing(opd, valid, chief_index, center, P_xp, xp_mode,
                            closing.curvature, closing.R, closing.delta,
                            closing.filtered_chief, n_image)


def _wavefront_from_trace(system, P, wavelength, trace, *, P_xp=None,
                          chief_index=None, pupil_coords=None, field=None,
                          output='length', reference='chief'):
    """Wavefront kernel for callers that already hold the trace."""
    valid = np.asarray(valid_mask(trace.status, trace.P[-1]))
    P = np.asarray(P)
    chief_index = _resolve_chief_index(P, valid, reference, chief_index)
    closing = close_wavefront(system, trace, wavelength, chief_index,
                              field=field, P_xp=P_xp, valid=valid,
                              reference=reference,
                              apply_field_tilt=pupil_coords is None)
    if pupil_coords is None:
        x_pupil = P[valid, 0] - P[chief_index, 0]
        y_pupil = P[valid, 1] - P[chief_index, 1]
        tilt_field = None
    else:
        x_pupil = np.asarray(pupil_coords[0])[valid]
        y_pupil = np.asarray(pupil_coords[1])[valid]
        tilt_field = field
    opd, _ = _apply_field_and_output(closing.opd, x_pupil, y_pupil,
                                     tilt_field, output, wavelength)
    return opd, x_pupil, y_pupil, valid


def _apply_field_and_output(opd, x_pupil, y_pupil, field, output,
                            wavelength):
    """Field-tilt removal and length/waves scaling."""
    if field is not None:
        ax, ay = field.angle_radians()
        opd = opd + (np.sin(ax) * x_pupil + np.sin(ay) * y_pupil)
    if output == 'length':
        scale = 1.0
    elif output == 'waves':
        scale = -1.0 / (float(wavelength) * 1e-3)
    else:
        raise ValueError(
            f"output must be 'length' or 'waves', got {output!r}")
    return opd * scale, scale


def wavefront(system, P, S, wavelength=None, *, P_xp=None, chief_index=None,
              pupil_coords=None, field=None, output='length',
              reference='chief'):
    """(opd, x_pupil, y_pupil): OPD on the chief-centered reference sphere."""
    if reference not in ('chief', 'centroid'):
        raise ValueError(
            f"reference must be 'chief' or 'centroid', got {reference!r}")
    wavelength = resolve_wavelength(system, wavelength)
    trace = raytrace(compiled_surfaces(system), P, S, wavelength)
    opd, x_pupil, y_pupil, _ = _wavefront_from_trace(
        system, P, wavelength, trace, P_xp=P_xp, chief_index=chief_index,
        pupil_coords=pupil_coords, field=field, output=output,
        reference=reference)
    return opd, x_pupil, y_pupil


def wavefront_zernike_fit(opd, x_pupil, y_pupil, nms, *,
                          normalization_radius=None, norm=True):
    """(coefs, residual_rms): least-squares Zernike fit of a wavefront."""
    opd = np.asarray(opd)
    x_pupil = np.asarray(x_pupil)
    y_pupil = np.asarray(y_pupil)
    valid = np.isfinite(opd) & np.isfinite(x_pupil) & np.isfinite(y_pupil)
    if not valid.any():
        raise ValueError('at least one finite OPD sample is required')
    opd = opd[valid]
    x_pupil = x_pupil[valid]
    y_pupil = y_pupil[valid]
    rsq = x_pupil * x_pupil + y_pupil * y_pupil
    if normalization_radius is None:
        normalization_radius = float(np.sqrt(np.max(rsq)))
    if normalization_radius <= 0.0:
        raise ValueError(
            'normalization_radius must be positive; got '
            f'{normalization_radius}')
    rho = np.sqrt(rsq) / normalization_radius
    theta = np.arctan2(y_pupil, x_pupil)
    basis = np.asarray(zernike_nm_seq(nms, rho, theta, norm=norm))
    coefs = np.asarray(lstsq(basis, opd))
    fit = np.tensordot(coefs, basis, axes=1)
    residual = opd - fit
    rms = float(np.sqrt(np.mean(residual * residual)))
    return coefs, rms


# ---------- distortion -------------------------------------------------------

def distortion(system, fields=None, wavelength=None, *, epd=None,
               paraxial_fraction=1e-4, distortion_type='f-tan',
               pupil_z=None, samples=101):
    """Per-field chief-ray image error vs a generalized paraxial map."""
    wavelength = resolve_wavelength(system, wavelength)
    epd = _require_epd(system, epd, wavelength)
    fields = field_sweep(system, fields, samples)
    if distortion_type not in ('f-tan', 'linear-angle'):
        raise ValueError(
            "distortion_type must be 'f-tan' or 'linear-angle', got "
            f'{distortion_type!r}')
    if paraxial_fraction <= 0:
        raise ValueError('paraxial_fraction must be positive')

    n = len(fields)
    real_xy = np.zeros((n, 2), dtype=_PREC)
    paraxial_xy = np.zeros((n, 2), dtype=_PREC)
    percent = np.zeros(n, dtype=_PREC)
    chief = Sampling.chief()

    # two basis launches retain anamorphic scale and x/y coupling
    origin_field = Field(0.0, 0.0, kind='angle', unit='rad')
    origin = trace_cell(system, origin_field, wavelength, chief,
                        epd=epd, pupil_z=pupil_z)
    origin_xy = np.asarray(origin.trace.P)[-1, 0, :2]
    image_map = np.zeros((2, 2), dtype=_PREC)
    for axis in range(2):
        plus_angles = [0.0, 0.0]
        minus_angles = [0.0, 0.0]
        plus_angles[axis] = float(paraxial_fraction)
        minus_angles[axis] = -float(paraxial_fraction)
        plus = trace_cell(
            system, Field(*plus_angles, kind='angle', unit='rad'),
            wavelength, chief, epd=epd, pupil_z=pupil_z)
        minus = trace_cell(
            system, Field(*minus_angles, kind='angle', unit='rad'),
            wavelength, chief, epd=epd, pupil_z=pupil_z)
        image_map[:, axis] = (
            np.asarray(plus.trace.P)[-1, 0, :2]
            - np.asarray(minus.trace.P)[-1, 0, :2]
        ) / (2.0 * float(paraxial_fraction))

    for i, field in enumerate(fields):
        ax, ay = field.angle_radians()
        real = trace_cell(system, field, wavelength, chief,
                          epd=epd, pupil_z=pupil_z)
        real_xy[i] = np.asarray(real.trace.P)[-1, 0, :2]
        if distortion_type == 'linear-angle':
            field_coordinate = np.array([ax, ay], dtype=_PREC)
        else:
            field_coordinate = np.array([np.tan(ax), np.tan(ay)],
                                        dtype=_PREC)
        paraxial_xy[i] = origin_xy + image_map @ field_coordinate

        ideal_delta = paraxial_xy[i] - origin_xy
        real_delta = real_xy[i] - origin_xy
        denom = float(np.hypot(*ideal_delta))
        if denom > 0.0:
            # signed: project the real landing onto the ideal image-height
            # direction (pincushion positive, barrel negative)
            real_height = float(np.dot(real_delta, ideal_delta)) / denom
            percent[i] = 100.0 * (real_height - denom) / denom

    return DistortionResult(
        real_xy, paraxial_xy, percent, tuple(fields),
        unit='percent', reference=f'paraxial:{distortion_type}')


# ---------- field curvature --------------------------------------------------

_AXISYMMETRIC_SHAPES = (Plane, Sphere, Conic, EvenAsphere)


def _field_is_pure_y(field):
    return abs(float(getattr(field, 'hx', 0.0))) <= 1e-12


def _system_is_axisymmetric(system):
    surfaces = (system.to_surfaces()
                if hasattr(system, 'to_surfaces') else list(system))
    for surf in surfaces:
        if getattr(surf, 'R', None) is not None:
            return False
        P = np.asarray(getattr(surf, 'P', (0.0, 0.0, 0.0)))
        if np.any(np.abs(P[:2]) > 1e-12):
            return False
        if not isinstance(getattr(surf, 'shape', None),
                          _AXISYMMETRIC_SHAPES):
            return False
    return True


def _field_curvature_labels(system, fields):
    fields = list(fields)
    if fields and all(_field_is_pure_y(field) for field in fields) \
            and _system_is_axisymmetric(system):
        return ('S', 'T'), ('sagittal', 'tangential')
    return ('X', 'Y'), ('x fan', 'y fan')


def field_curvature(system, fields=None, wavelength=None, *, samples=101):
    """X- and y-section parabasal focus z per field point."""
    from .parabasal import parabasal_foci  # local: avoid a circular import

    ctx = trace_context(system, wavelength)
    wavelength = ctx.wavelength
    fields = field_sweep(system, fields, samples)
    n = len(fields)
    x_fan_z = np.zeros(n, dtype=_PREC)
    y_fan_z = np.zeros(n, dtype=_PREC)
    for i, field in enumerate(fields):
        x_fan_z[i], y_fan_z[i] = parabasal_foci(system, field, wavelength)
    labels, _ = _field_curvature_labels(ctx.surfaces, fields)
    return FieldCurvatureResult(
        x_fan_z, y_fan_z, tuple(fields), labels,
        float(ctx.surfaces[-1].P[2]),
        unit=getattr(system, 'unit', None) or 'mm', reference='global_z')


# ---------- color ------------------------------------------------------------

def _system_wavelength_range(system):
    wavelengths = getattr(system, 'wavelengths', None)
    if wavelengths is None or len(wavelengths) == 0:
        return None
    values = [float(w) for w in wavelengths]
    return min(values), max(values)


def _chromatic_wavelength_samples(system, wavelengths, samples):
    if wavelengths is not None:
        return np.asarray([float(w) for w in wavelengths], dtype=_PREC)
    span = _system_wavelength_range(system)
    if span is None:
        raise TypeError(
            'wavelengths is required unless system carries system '
            'wavelength metadata')
    return np.linspace(span[0], span[1], int(samples), dtype=_PREC)


def _best_focus_shift_from_trace(P_final, S_final, status=None):
    """Axial shift minimizing centroid-referenced RMS spot radius."""
    P_final = np.asarray(P_final)
    S_final = np.asarray(S_final)
    valid = np.asarray(valid_mask(status, P_final))
    valid = valid & np.isfinite(S_final).all(axis=1)
    valid = valid & (np.abs(S_final[:, 2]) > 1e-30)
    if not valid.any():
        raise ValueError('at least one valid ray is required for best focus')

    P = P_final[valid]
    S = S_final[valid]
    xy = P[:, :2]
    slopes = S[:, :2] / S[:, 2:3]
    xy = xy - np.mean(xy, axis=0)
    slopes = slopes - np.mean(slopes, axis=0)
    denom = float(np.sum(slopes * slopes))
    if denom <= 0.0:
        return 0.0
    return -float(np.sum(xy * slopes)) / denom


def _best_focus_z(system, wavelength, *, epd, field, sampling):
    if field is None:
        field = Field(0.0, 0.0, unit='deg')
    if sampling is None:
        sampling = Sampling.hex(nrings=8)
    r = trace_cell(system, field, wavelength, sampling, epd=epd)
    dz = _best_focus_shift_from_trace(r.trace.P[-1], r.trace.S[-1],
                                      r.trace.status)
    return float(compiled_surfaces(system)[-1].P[2]) + dz


def _chromatic_focus_z(system, wavelength, focus, *, epd, field, sampling):
    surfaces = compiled_surfaces(system)
    if focus == 'paraxial':
        ref = surfaces
        while len(ref) > 1 and _is_measurement_surf(
                getattr(ref[-1], 'typ', None)):
            ref = ref[:-1]
        return (float(ref[-1].P[2])
                + float(paraxial_image_distance(surfaces, wvl=wavelength)))
    if focus == 'best':
        return _best_focus_z(system, wavelength, epd=epd, field=field,
                             sampling=sampling)
    raise ValueError(f"focus must be 'best' or 'paraxial', got {focus!r}")


def chromatic_focal_shift(system, wavelengths=None, *,
                          reference_wavelength=None, focus='best',
                          epd=None, field=None, sampling=None, samples=101):
    """(wavelengths, shift): best-focus shift as a function of wavelength."""
    wavelengths = _chromatic_wavelength_samples(system, wavelengths, samples)
    if reference_wavelength is None:
        reference_wavelength = resolve_wavelength(system, None)
    reference_wavelength = float(reference_wavelength)
    focus = focus.lower()
    foci = np.array([
        _chromatic_focus_z(system, float(w), focus, epd=epd, field=field,
                           sampling=sampling)
        for w in wavelengths
    ], dtype=_PREC)

    ref = _chromatic_focus_z(system, reference_wavelength, focus, epd=epd,
                             field=field, sampling=sampling)
    return wavelengths, foci - ref


def lateral_color(system, fields=None, wavelengths=None, *, epd=None,
                  samples=101):
    """Chief-ray landing at every (field, wavelength): (nf, nw, 2)."""
    epd = _require_epd(system, epd)
    fields = field_sweep(system, fields, samples)
    wavelengths = _resolve_wavelengths(system, wavelengths)
    out = np.zeros((len(fields), len(wavelengths), 2), dtype=_PREC)
    for r in iter_trace_grid(system, fields, wavelengths,
                             Sampling.chief(), epd=epd):
        out[r.i, r.j] = np.asarray(r.trace.P)[-1, 0, :2]
    return out


# ---------- grid analyses ----------------------------------------------------

def _fan_grid_setup(system, fields, wavelengths, nrays, distribution):
    fields = _resolve_fields(system, fields)
    wavelengths = _resolve_wavelengths(system, wavelengths)
    x_fan = Sampling.fan(n=nrays, axis='x', distribution=distribution)
    y_fan = Sampling.fan(n=nrays, axis='y', distribution=distribution)
    xy_x = x_fan.build(1.0)
    xy_y = y_fan.build(1.0)
    nrays = xy_x.shape[0]
    pupil_x = np.empty((len(fields), nrays), dtype=_PREC)
    pupil_y = np.empty((len(fields), nrays), dtype=_PREC)
    for i, field in enumerate(fields):
        pupil_x[i] = _apply_vignetting(xy_x, field)[:, 0]
        pupil_y[i] = _apply_vignetting(xy_y, field)[:, 1]
    shape = (len(fields), len(wavelengths), nrays)
    x = np.full(shape, np.nan, dtype=_PREC)
    y = np.full(shape, np.nan, dtype=_PREC)
    return fields, wavelengths, x_fan, y_fan, pupil_x, pupil_y, x, y


def _fan_image_error(record, axis, reference):
    """NaN-padded reference-subtracted image error of one fan."""
    ax = _axis_index(axis)
    image = np.asarray(record.trace.P)[-1, :, ax]
    ci = _pupil_center_chief_index(np.asarray(record.P))
    centered, _ = _center_valid(image, record.valid, reference, ci)
    return centered


def ray_aberration_fans(system, fields=None, wavelengths=None, *,
                        nrays=21, epd=None, distribution='uniform',
                        reference='chief'):
    """RayFanGrid of transverse ray aberrations per field x wavelength."""
    fields, wavelengths, x_fan, y_fan, pupil_x, pupil_y, x, y = \
        _fan_grid_setup(system, fields, wavelengths, nrays, distribution)
    for xr, yr in zip(
            iter_trace_grid(system, fields, wavelengths, x_fan, epd=epd),
            iter_trace_grid(system, fields, wavelengths, y_fan, epd=epd)):
        x[xr.i, xr.j] = _fan_image_error(xr, 'x', reference)
        y[yr.i, yr.j] = _fan_image_error(yr, 'y', reference)
    return RayFanGrid(
        tuple(fields), np.asarray(wavelengths, dtype=_PREC),
        pupil_x, pupil_y, x, y,
        getattr(system, 'unit', None) or 'mm', reference)


def _exit_pupil_for(system, wavelength, *, field=None, stop_index=None,
                    epd=None):
    if hasattr(system, 'exit_pupil') and hasattr(system, 'lens'):
        return system.exit_pupil(wavelength, field=field,
                                 stop_index=stop_index, epd=epd)
    return resolve_exit_pupil(system, wavelength, stop_index=stop_index,
                              epd=epd, field=field)


def _opd_fan(system, record, tilt_field, P_xp, output, n_pupil):
    opd, _, _, valid = _wavefront_from_trace(
        system, record.P, record.wvl, record.trace, P_xp=P_xp,
        field=tilt_field, output=output)
    full = np.full(n_pupil, np.nan, dtype=_PREC)
    full[valid] = opd
    return full


def opd_fans(system, fields=None, wavelengths=None, *, nrays=21,
             epd=None, distribution='uniform', stop_index=None,
             output='waves'):
    """OPDFanGrid of wavefront fans per field x wavelength."""
    fields, wavelengths, x_fan, y_fan, pupil_x, pupil_y, x, y = \
        _fan_grid_setup(system, fields, wavelengths, nrays, distribution)
    n_pupil = pupil_x.shape[-1]
    for xr, yr in zip(
            iter_trace_grid(system, fields, wavelengths, x_fan, epd=epd),
            iter_trace_grid(system, fields, wavelengths, y_fan, epd=epd)):
        field = yr.field
        tilt_field = (field if getattr(field, 'kind', 'angle') == 'angle'
                      else None)
        P_xp = _exit_pupil_for(system, yr.wvl, field=field,
                               stop_index=stop_index, epd=yr.epd)
        x[xr.i, xr.j] = _opd_fan(system, xr, tilt_field, P_xp, output,
                                 n_pupil)
        y[yr.i, yr.j] = _opd_fan(system, yr, tilt_field, P_xp, output,
                                 n_pupil)
    unit = 'waves' if output == 'waves' else (
        getattr(system, 'unit', None) or 'mm')
    return OPDFanGrid(
        tuple(fields), np.asarray(wavelengths, dtype=_PREC),
        pupil_x, pupil_y, x, y, unit, 'chief')


def spot_diagrams(system, fields=None, wavelengths=None, *,
                  sampling=None, epd=None, reference='centroid'):
    """SpotGrid of image-plane landings per field x wavelength."""
    fields = _resolve_fields(system, fields)
    wavelengths = _resolve_wavelengths(system, wavelengths)
    if sampling is None:
        sampling = Sampling.hex(nrings=6)
    nf = len(fields)
    nw = len(wavelengths)
    n_samples = sampling.build(1.0).shape[0]
    x = np.full((nf, nw, n_samples), np.nan, dtype=_PREC)
    y = np.full((nf, nw, n_samples), np.nan, dtype=_PREC)
    valid = np.zeros((nf, nw, n_samples), dtype=bool)
    reference_xy = np.full((nf, nw, 2), np.nan, dtype=_PREC)
    for r in iter_trace_grid(system, fields, wavelengths, sampling,
                             epd=epd):
        v = r.valid
        Pl = np.asarray(r.trace.P)
        image_xy = np.stack([Pl[-1, :, 0], Pl[-1, :, 1]], axis=1)
        ci = _pupil_center_chief_index(np.asarray(r.P))
        centered, ref = _center_valid(image_xy, v, reference, ci,
                                      allow_none=True)
        x[r.i, r.j] = centered[:, 0]
        y[r.i, r.j] = centered[:, 1]
        valid[r.i, r.j] = v
        reference_xy[r.i, r.j] = ref
    return SpotGrid(
        tuple(fields), np.asarray(wavelengths, dtype=_PREC),
        x, y, valid, reference_xy,
        getattr(system, 'unit', None) or 'mm', reference)


def spot_rms_radius(spot_grid):
    """(nf, nw) centroid-referenced RMS spot radii."""
    return centroid_referenced_rms(np.asarray(spot_grid.x),
                                   np.asarray(spot_grid.y), axis=2)


def spot_geometric_radius(spot_grid):
    """(nf, nw) maximum (geometric) spot radii from the centroid."""
    return centroid_referenced_max(np.asarray(spot_grid.x),
                                   np.asarray(spot_grid.y), axis=2)


# ---------- full-field displays ----------------------------------------------

def _full_field_template(system, max_field):
    base = _resolve_fields(system, None)
    kinds = {f.kind for f in base}
    if len(kinds) != 1:
        raise ValueError('full_field requires system fields of a single kind')
    kind = kinds.pop()
    if kind == 'angle':
        if len({f.unit for f in base}) != 1:
            raise ValueError(
                'full_field requires system fields with a single angular '
                'unit')
        object_z = None
    else:
        if len({f.object_z for f in base}) != 1:
            raise ValueError(
                'full_field requires system fields with a single object '
                'plane')
        object_z = base[0].object_z
    unit = base[0].unit
    if max_field is None:
        max_field = max(float(np.hypot(f.hx, f.hy)) for f in base)
    max_field = float(max_field)
    if max_field <= 0.0:
        raise ValueError(
            'full_field needs a nonzero field extent; define off-axis '
            'system fields or pass max_field')
    return kind, unit, object_z, max_field


def _as_wavelength_list(wavelengths):
    if wavelengths is None:
        return None
    if np.ndim(wavelengths) == 0:
        return [float(wavelengths)]
    return [float(w) for w in wavelengths]


def _spectral_weights(system, wavelengths, resolved):
    if wavelengths is None:
        w = getattr(system, 'weights', None)
        if w is not None and len(w) == len(resolved):
            return [float(x) for x in w]
    return [1.0] * len(resolved)


def _full_field_rms_spot(system, fields, wavelengths, sampling, epd):
    """Polychromatic pooled centroid-referenced RMS spot radius per field."""
    wvls = _resolve_wavelengths(system, wavelengths)
    weights = _spectral_weights(system, wavelengths, wvls)
    if sampling is None:
        sampling = Sampling.hex(nrings=6)
    n_samples = sampling.build(1.0).shape[0]
    shape = (len(fields), len(wvls), n_samples)
    x = np.full(shape, np.nan, dtype=_PREC)
    y = np.full(shape, np.nan, dtype=_PREC)
    for r in iter_trace_grid(system, fields, wvls, sampling, epd=epd):
        v = r.valid
        Pl = np.asarray(r.trace.P)
        xi = np.full(n_samples, np.nan, dtype=_PREC)
        yi = np.full(n_samples, np.nan, dtype=_PREC)
        xi[v] = Pl[-1, v, 0]
        yi[v] = Pl[-1, v, 1]
        x[r.i, r.j] = xi
        y[r.i, r.j] = yi
    w = np.asarray(weights, dtype=_PREC)[None, :, None]
    m = np.isfinite(x)
    wm = np.where(m, w, 0.0)
    xw = np.where(m, x, 0.0)
    yw = np.where(m, y, 0.0)
    wsum = wm.sum(axis=(1, 2))
    safe = np.where(wsum > 0.0, wsum, 1.0)
    cx = (wm * xw).sum(axis=(1, 2)) / safe
    cy = (wm * yw).sum(axis=(1, 2)) / safe
    r2 = (xw - cx[:, None, None]) ** 2 + (yw - cy[:, None, None]) ** 2
    rms = np.sqrt((wm * r2).sum(axis=(1, 2)) / safe)
    rms[wsum == 0.0] = np.nan
    return rms


def _full_field_rms_wfe(system, fields, wavelength, sampling, epd,
                        stop_index):
    """Piston-removed RMS wavefront error (waves) per field."""
    if sampling is None:
        sampling = Sampling.hex(nrings=6)
    out = np.full(len(fields), np.nan, dtype=_PREC)
    for i, field in enumerate(fields):
        r = trace_cell(system, field, wavelength, sampling, epd=epd)
        tilt_field = field if field.kind == 'angle' else None
        P_xp = _exit_pupil_for(system, wavelength, field=field,
                               stop_index=stop_index, epd=r.epd)
        try:
            opd, _, _, _ = _wavefront_from_trace(
                system, r.P, wavelength, r.trace, P_xp=P_xp,
                field=tilt_field, output='waves')
        except ValueError:
            continue  # the chief ray was clipped: a hole in the map
        if opd.size:
            resid = opd - np.mean(opd)
            out[i] = float(np.sqrt(np.mean(resid * resid)))
    return out


def full_field(system, metric='rms spot', *, samples=15, max_field=None,
               wavelengths=None, sampling=None, epd=None, stop_index=None):
    """FullFieldGrid of a scalar image-quality metric over the field disc."""
    kind, unit, object_z, radius = _full_field_template(system, max_field)
    wavelengths = _as_wavelength_list(wavelengths)
    coords = np.linspace(-radius, radius, int(samples))
    hx, hy = np.meshgrid(coords, coords)
    inside = np.hypot(hx, hy) <= radius * (1.0 + 1e-9)
    idx = np.nonzero(inside.ravel())[0]
    flat_fields = [
        Field(float(fx), float(fy), kind=kind, unit=unit, object_z=object_z)
        for fx, fy in zip(hx.ravel()[idx], hy.ravel()[idx])
    ]
    key = metric.lower().replace('-', ' ').replace('_', ' ')
    if key == 'rms spot':
        values = _full_field_rms_spot(system, flat_fields, wavelengths,
                                      sampling, epd)
        data_unit = getattr(system, 'unit', None) or 'mm'
        reference = 'centroid'
    elif key == 'rms wfe':
        wvl = resolve_wavelength(
            system, None if wavelengths is None else wavelengths[0])
        values = _full_field_rms_wfe(system, flat_fields, wvl, sampling,
                                     epd, stop_index)
        data_unit = 'waves'
        reference = 'piston'
    elif key == 'distortion':
        wvl = None if wavelengths is None else wavelengths[0]
        values = distortion(system, flat_fields, wvl, epd=epd).percent
        data_unit = 'percent'
        reference = 'paraxial:f-tan'
    elif key == 'lateral color':
        wvls = _resolve_wavelengths(system, wavelengths)
        if len(wvls) < 2:
            raise ValueError(
                "metric 'lateral color' needs at least two wavelengths")
        landing = lateral_color(system, flat_fields, wvls, epd=epd)
        d = (landing[:, int(np.argmax(wvls))]
             - landing[:, int(np.argmin(wvls))])
        values = np.hypot(d[:, 0], d[:, 1])
        data_unit = getattr(system, 'unit', None) or 'mm'
        reference = 'spectral-extremes'
    else:
        raise ValueError(
            "metric must be 'rms spot', 'rms wfe', 'distortion', or "
            f"'lateral color', got {metric!r}")
    data = np.full(hx.size, np.nan, dtype=_PREC)
    data[idx] = np.asarray(values, dtype=_PREC)
    return FullFieldGrid(
        hx, hy, data.reshape(hx.shape), key, kind, unit, data_unit,
        reference)
