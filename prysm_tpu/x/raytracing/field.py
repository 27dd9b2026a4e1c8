"""Complex pupil fields from ray traces.

Rebuild of ``prysm/x/raytracing/field.py``: the bridge from geometric
traces to the physical-optics stack — per-ray Fresnel/coating
amplitudes, sine-space exit-pupil coordinates, energy-conservation
apodization, polarization ray tracing (3x3 P matrices), and resampling
onto a regular-grid Wavefront for diffraction propagation.
"""
import numpy as np
from scipy import interpolate

from ...coordinates import make_xy_grid
from ...propagation import Wavefront
from ..coatings.stack import Stack, stack_rt

from . import spencer_and_murty as sm
from .spencer_and_murty import (
    STYPE_REFLECT, STYPE_REFRACT, raytrace,
)
from .launch import Sampling, _apply_vignetting
from .paraxial import effective_focal_length
from .opt import _pupil_center_chief_index
from .analysis import _apply_field_and_output, close_wavefront
from ._resolve import compiled_surfaces, trace_context
from ._trace_grid import trace_cell
from ._meta import object_space_index

_PREC = np.float64
_CPREC = np.complex128


def _row_dot(a, b):
    return np.sum(np.asarray(a) * np.asarray(b), axis=-1)


def _complex_sqrt(x):
    return np.sqrt(np.asarray(x, dtype=_CPREC))


def _fresnel_ts(n0, n1, theta0, theta1):
    """Fresnel s-transmission amplitude (host numpy; complex-safe)."""
    num = 2 * n0 * np.cos(theta0)
    den = n0 * np.cos(theta0) + n1 * np.cos(theta1)
    return num / den


def _fresnel_tp(n0, n1, theta0, theta1):
    """Fresnel p-transmission amplitude (host numpy; complex-safe)."""
    num = 2 * n0 * np.cos(theta0)
    den = n0 * np.cos(theta1) + n1 * np.cos(theta0)
    return num / den


class FieldTraceResult:
    """A geometric trace plus per-ray scalar amplitude."""

    __slots__ = ('trace', 'amplitude')

    def __init__(self, trace, amplitude):
        self.trace = trace
        self.amplitude = amplitude

    @property
    def P(self):
        """Position history of the wrapped trace."""
        return self.trace.P

    @property
    def S(self):
        """Direction history of the wrapped trace."""
        return self.trace.S

    @property
    def OPL(self):
        """OPL history of the wrapped trace."""
        return self.trace.OPL

    @property
    def status(self):
        """Status of the wrapped trace."""
        return self.trace.status


def _complex_index(material, wavelength, *, consumer):
    nk = getattr(material, 'nk', None)
    if not callable(nk):
        raise TypeError(
            f'{consumer} requires material objects with callable '
            f'.nk(wvl_um); {material!r} only satisfies the geometric '
            '.n tier')
    return complex(nk(wavelength))


def _complex_object_space_index(surfaces, wavelength, *, consumer):
    if (surfaces and sm._is_measurement_surf(surfaces[0].typ)
            and surfaces[0].material is not None):
        return _complex_index(surfaces[0].material, wavelength,
                              consumer=consumer)
    return 1.0 + 0.0j


def surface_normals_from_trace(system, trace, wavelength, *,
                               complex_indices=False):
    """(cosI, n0, n1, typ): per-surface incidence data from a trace.

    Re-evaluates sag_and_normal at the recorded intersections — the
    exact path the kernel walked — so the hot trace needs no changes.
    """
    P_hist = np.asarray(trace.P)
    S_hist = np.asarray(trace.S)
    surfaces = list(system)
    jj = len(surfaces)
    n_rays = P_hist.shape[1]
    cosI = np.empty((jj, n_rays), dtype=P_hist.dtype)
    index_dtype = _CPREC if complex_indices else _PREC
    n0 = np.empty(jj, dtype=index_dtype)
    n1 = np.empty(jj, dtype=index_dtype)
    typ = np.empty(jj, dtype=int)

    if complex_indices:
        nj = _complex_object_space_index(
            surfaces, wavelength, consumer='physical field tracing')
    else:
        nj = object_space_index(surfaces, wavelength)
    for j, surf in enumerate(surfaces):
        XYZloc, Sloc = sm.transform_to_local_coords(
            P_hist[j + 1], surf.P, S_hist[j], surf.R)
        XYZloc = np.asarray(XYZloc)
        Sloc = np.asarray(Sloc)
        _, n_hat = surf.sag_and_normal(XYZloc[..., 0], XYZloc[..., 1])
        cosI[j] = _row_dot(n_hat, Sloc)

        n0[j] = nj
        typ[j] = surf.typ
        if surf.typ == STYPE_REFRACT:
            if complex_indices:
                nprime = _complex_index(
                    surf.material, wavelength,
                    consumer='physical field tracing')
            else:
                nprime = float(surf.material.n(wavelength))
            n1[j] = nprime
            nj = nprime
        else:
            n1[j] = nj
    return cosI, n0, n1, typ


def _transmission_energy_norm(n0, n1, theta0, pol):
    """Obliquity factor from field transmission to sqrt(power)."""
    cost0 = np.cos(theta0)
    cost1 = _complex_sqrt(1.0 - ((n0 / n1) * np.sin(theta0)) ** 2)
    with np.errstate(divide='ignore', invalid='ignore'):
        if pol == 's':
            ratio = (n1 * cost1) / (n0 * cost0)
        else:
            ratio = (n1 * cost0) / (n0 * cost1)
    return _complex_sqrt(np.real(ratio))


def _coating_coefficients(coating, n0, n1, cosI, theta0, typ, wavelength):
    """Thin-film stack s/p amplitudes for one traced interface."""
    if wavelength is None:
        raise TypeError('a coated surface requires a wavelength')
    if typ == STYPE_REFRACT:
        stack = Stack(coating.indices, coating.thicknesses,
                      substrate_index=n1, ambient_index=n0)
        _, t_s = stack_rt(stack, wavelength, theta0, 's')
        _, t_p = stack_rt(stack, wavelength, theta0, 'p')
        t_s = np.asarray(t_s)
        t_p = np.asarray(t_p)
        a_s = (t_s * _transmission_energy_norm(n0, n1, theta0, 's')).astype(
            _CPREC)
        a_p = (t_p * _transmission_energy_norm(n0, n1, theta0, 'p')).astype(
            _CPREC)
        # TIR and grazing incidence transmit no power
        cost1 = _complex_sqrt(1.0 - ((n0 / n1) * np.sin(theta0)) ** 2)
        dead = (np.imag(cost1) != 0) | ~np.isfinite(a_s) | ~np.isfinite(a_p)
        a_s[dead] = 0.0
        a_p[dead] = 0.0
        return a_s, a_p
    if typ == STYPE_REFLECT:
        stack = Stack(coating.indices, coating.thicknesses,
                      substrate_index=coating.substrate_index,
                      ambient_index=n0)
        r_s, _ = stack_rt(stack, wavelength, theta0, 's')
        r_p, _ = stack_rt(stack, wavelength, theta0, 'p')
        # s-p-k basis signs match the bare ideal mirror limit (1, -1)
        return ((-np.asarray(r_s)).astype(_CPREC),
                np.asarray(r_p).astype(_CPREC))
    ones = np.ones_like(cosI, dtype=_CPREC)
    return ones, ones


def interface_coefficients(n0, n1, cosI, typ, *, coating=None,
                           wavelength=None):
    """Energy-normalized s/p amplitude coefficients for one interface.

    TIR returns zero; bare reflection is the ideal mirror (1, -1).
    """
    cosI = np.abs(np.asarray(cosI))
    theta0 = np.arccos(np.clip(cosI, 0.0, 1.0))
    if coating is not None:
        return _coating_coefficients(coating, n0, n1, cosI, theta0, typ,
                                     wavelength)
    if typ == STYPE_REFRACT:
        sint1 = (n0 / n1) * np.sin(theta0)
        cost1 = _complex_sqrt(1.0 - sint1 * sint1)
        with np.errstate(divide='ignore', invalid='ignore'):
            theta1 = np.arccos(cost1)
            t_s = _fresnel_ts(n0, n1, theta0, theta1)
            t_p = _fresnel_tp(n0, n1, theta0, theta1)
            oblique = _complex_sqrt((n1 * cost1) / (n0 * np.cos(theta0)))
            a_s = (t_s * oblique).astype(_CPREC)
            a_p = (t_p * oblique).astype(_CPREC)
        dead = (np.imag(cost1) != 0) | ~np.isfinite(a_s) | ~np.isfinite(a_p)
        a_s[dead] = 0.0
        a_p[dead] = 0.0
        return a_s, a_p
    ones = np.ones_like(cosI, dtype=_CPREC)
    if typ == STYPE_REFLECT:
        return ones, -ones
    return ones, ones


def _power_coefficient(a_s, a_p):
    return 0.5 * (np.abs(a_s) ** 2 + np.abs(a_p) ** 2)


def unpolarized_amplitude(system, trace, wavelength):
    """Per-ray scalar amplitude transmittance through the system."""
    cosI, n0, n1, typ = surface_normals_from_trace(
        system, trace, wavelength, complex_indices=True)
    surfaces = list(system)
    jj, n_rays = cosI.shape
    amp = np.ones(n_rays, dtype=_PREC)
    for j in range(jj):
        coating = surfaces[j].coating
        if coating is None and typ[j] != STYPE_REFRACT:
            continue
        a_s, a_p = interface_coefficients(
            n0[j], n1[j], cosI[j], typ[j], coating=coating,
            wavelength=wavelength)
        amp = amp * np.sqrt(np.clip(_power_coefficient(a_s, a_p), 0.0,
                                    None))
    return amp


def raytrace_field(system, P, S, wavelength):
    """Intensity-aware trace: geometry plus a scalar amplitude."""
    surfaces = compiled_surfaces(system)
    trace = raytrace(surfaces, P, S, wavelength)
    amplitude = unpolarized_amplitude(surfaces, trace, wavelength)
    return FieldTraceResult(trace, amplitude)


def _axis_perp_basis(axis_dir, dtype):
    """Orthonormal (u, v) spanning the plane perpendicular to the axis."""
    if axis_dir is None:
        w = np.array([0.0, 0.0, 1.0], dtype=dtype)
    else:
        w = np.asarray(axis_dir, dtype=dtype)
        w = w / np.sqrt(np.sum(w * w))
    helper = np.array([1.0, 0.0, 0.0], dtype=dtype)
    if abs(float(np.sum(helper * w))) > 0.9:
        helper = np.array([0.0, 1.0, 0.0], dtype=dtype)
    u = helper - np.sum(helper * w) * w
    u = u / np.sqrt(np.sum(u * u))
    v = np.cross(w, u)
    return u, v


def sine_space_coords(S_last, S_chief, scale, axis_dir=None):
    """(X, Y): sine-space pupil coordinates of a bundle, chief-referenced."""
    S_last = np.asarray(S_last)
    S_chief = np.asarray(S_chief, dtype=S_last.dtype)
    u, v = _axis_perp_basis(axis_dir, S_last.dtype)
    # chief minus ray: the reference-sphere landing sits downstream of XP
    d = float(scale) * (S_chief[None, :] - S_last)
    return d @ u, d @ v


def _inpaint_nan(arr):
    """Fill non-finite samples from finite neighbors (diffusion passes)."""
    arr = np.asarray(arr, dtype=_PREC).copy()
    hole = ~np.isfinite(arr)
    if not np.any(hole):
        return arr
    arr[hole] = 0.0
    cnt = np.zeros_like(arr)
    cnt[1:] += 1.0
    cnt[:-1] += 1.0
    cnt[:, 1:] += 1.0
    cnt[:, :-1] += 1.0
    for _ in range(int(max(arr.shape))):
        acc = np.zeros_like(arr)
        acc[1:] += arr[:-1]
        acc[:-1] += arr[1:]
        acc[:, 1:] += arr[:, :-1]
        acc[:, :-1] += arr[:, 1:]
        arr[hole] = acc[hole] / cnt[hole]
    return arr


def amplitude_apodization(entrance_xy, sphere_xy, *, valid=None):
    """sqrt(dA_entrance / dA_sphere): energy-conservation amplitude."""
    entrance_xy = np.asarray(entrance_xy)
    sphere_xy = np.asarray(sphere_xy)
    a = entrance_xy[..., 0]
    b = entrance_xy[..., 1]
    X = _inpaint_nan(sphere_xy[..., 0])
    Y = _inpaint_nan(sphere_xy[..., 1])
    a_axis = a[0, :]
    b_axis = b[:, 0]
    dX_da = np.gradient(X, a_axis, axis=1)
    dX_db = np.gradient(X, b_axis, axis=0)
    dY_da = np.gradient(Y, a_axis, axis=1)
    dY_db = np.gradient(Y, b_axis, axis=0)
    detJ = dX_da * dY_db - dX_db * dY_da
    mag = np.abs(detJ)
    with np.errstate(divide='ignore', invalid='ignore'):
        amp = 1.0 / np.sqrt(mag)
    amp[~np.isfinite(amp)] = 0.0
    if valid is not None:
        amp[~valid] = 0.0
    return amp


# ---------- orchestration: pupil field + propagation bridge -----------------

class PupilField:
    """Complex pupil-field samples on the exit-pupil reference sphere."""

    __slots__ = ('X', 'Y', 'amplitude', 'opd', 'wavelength', 'efl',
                 'n_image', 'P_xp', 'P_img', 'P_matrix')

    def __init__(self, X, Y, amplitude, opd, wavelength, efl, n_image,
                 P_xp, P_img, P_matrix=None):
        self.X = X
        self.Y = Y
        self.amplitude = amplitude
        self.opd = opd
        self.wavelength = wavelength
        self.efl = efl
        self.n_image = n_image
        self.P_xp = P_xp
        self.P_img = P_img
        self.P_matrix = P_matrix

    @property
    def polarized(self):
        """True when the field carries per-ray polarization matrices."""
        return self.P_matrix is not None

    def waves(self):
        """OPD in waves at this field's wavelength (both in microns)."""
        return np.asarray(self.opd) / float(self.wavelength)


def _pupil_coordinate_scale(ctx, P_xp, center):
    """abs(EFL) when available, else the reference-sphere radius."""
    try:
        return abs(float(effective_focal_length(ctx.surfaces,
                                                wvl=ctx.wavelength)))
    except ValueError:
        if P_xp is None:
            raise
        return float(np.sqrt(np.sum((np.asarray(P_xp)
                                     - np.asarray(center)) ** 2)))


def pupil_field(system, field, wavelength=None, *, epd=None, npupil=64,
                stop_index=None, P_xp=None, P_img=None, axis_dir=None,
                pupil_z=None, reference='chief', polarized=False):
    """Realize the complex pupil field on the exit-pupil reference sphere.

    Traces an npupil x npupil entrance grid, closes the wavefront, and
    returns the scattered sine-space samples (amplitudes x OPD) ready
    for pupil_field_to_wavefront.
    """
    ctx = trace_context(system, wavelength, chief=True, epd=epd,
                        stop_index=stop_index)
    wavelength = ctx.wavelength
    epd = ctx.epd
    if epd is None:
        raise TypeError(
            'epd is required; pass epd=... or an OpticalSystem whose '
            'aperture spec resolves it.')
    if reference not in ('chief', 'centroid'):
        raise ValueError(
            f"reference must be 'chief' or 'centroid', got {reference!r}")
    sampling = Sampling.rect(n=npupil)
    nominal_grid = sampling.build(0.5 * epd)
    grid_count = len(nominal_grid)
    if sampling.chief_index is None:
        # even rect grid: append a separately traced exact chief
        normalized = sampling.build(1.0)
        trace_sampling = Sampling.points(
            np.concatenate([normalized, np.zeros((1, 2), dtype=_PREC)],
                           axis=0))
        chief_index = grid_count
        nominal_pupil_xy = np.concatenate(
            [nominal_grid, np.zeros((1, 2), dtype=_PREC)], axis=0)
    else:
        trace_sampling = sampling
        chief_index = sampling.chief_index
        nominal_pupil_xy = nominal_grid

    def _trace_fn(presc, P, S, w):
        if polarized:
            return raytrace_prt(presc, P, S, w)
        return raytrace_field(presc, P, S, w)

    record = trace_cell(system, field, wavelength, trace_sampling,
                        epd=epd, pupil_z=pupil_z, trace_fn=_trace_fn)
    valid = record.valid
    result = record.trace
    if polarized:
        trace = result.trace
        coating_amp = None
        P_matrix_all = result.P_matrix
    else:
        trace = result.trace
        coating_amp = result.amplitude
        P_matrix_all = None

    # nominal coordinates define the circle; vignetted ones match rays
    pupil_xy = _apply_vignetting(nominal_pupil_xy, field)

    mask = valid if reference == 'centroid' else None
    if reference == 'centroid':
        chief_index = _pupil_center_chief_index(pupil_xy, mask)

    # rect fills a square; the entrance pupil is the inscribed circle
    r_entrance = np.hypot(
        nominal_pupil_xy[:, 0] - nominal_pupil_xy[chief_index, 0],
        nominal_pupil_xy[:, 1] - nominal_pupil_xy[chief_index, 1])
    circ = r_entrance <= (0.5 * epd) * (1.0 + 1e-9)
    valid = valid & circ

    P_img = None if P_img is None else np.asarray(P_img)
    closing = close_wavefront(system, trace, wavelength, chief_index,
                              center=P_img, P_xp=P_xp,
                              stop_index=ctx.stop_index,
                              epd=epd, axis_dir=axis_dir, min_perp=1e-3,
                              valid=valid, reference=reference,
                              apply_field_tilt=False, ctx=ctx)
    P_img = closing.center
    P_xp = closing.P_xp
    n_image = closing.n_image
    opd = closing.opd

    scale = _pupil_coordinate_scale(ctx, P_xp, P_img)
    S_hist = np.asarray(trace.S)
    X_all, Y_all = sine_space_coords(S_hist[-1], S_hist[-1, chief_index],
                                     scale, axis_dir)

    entrance_xy = np.ascontiguousarray(
        pupil_xy[:grid_count]).reshape(npupil, npupil, 2)
    sphere_xy = np.stack(
        [X_all[:grid_count], Y_all[:grid_count]], axis=-1
    ).reshape(npupil, npupil, 2)
    valid_grid = valid[:grid_count].reshape(npupil, npupil)
    amp_geo = amplitude_apodization(entrance_xy, sphere_xy,
                                    valid=valid_grid).reshape(-1)
    if coating_amp is None:
        amplitude_all = amp_geo
    else:
        amplitude_all = amp_geo * np.asarray(coating_amp)[:grid_count]

    x_pupil = pupil_xy[valid, 0] - pupil_xy[chief_index, 0]
    y_pupil = pupil_xy[valid, 1] - pupil_xy[chief_index, 1]
    tilt_field = field if field.kind == 'angle' else None
    opd, _ = _apply_field_and_output(opd, x_pupil, y_pupil, tilt_field,
                                     'length', wavelength)
    valid_indices = np.nonzero(valid)[0]
    grid_valid = valid[:grid_count]
    keep_grid_samples = valid_indices < grid_count
    opd_um = opd[keep_grid_samples] * 1e3

    n_image = abs(float(n_image))
    P_matrix = (None if P_matrix_all is None
                else np.asarray(P_matrix_all)[valid][keep_grid_samples])
    return PupilField(
        X=X_all[:grid_count][grid_valid], Y=Y_all[:grid_count][grid_valid],
        amplitude=amplitude_all[:grid_count][grid_valid],
        opd=opd_um, wavelength=wavelength, efl=scale / n_image,
        n_image=n_image,
        P_xp=(None if P_xp is None else np.asarray(P_xp)),
        P_img=P_img, P_matrix=P_matrix)


def _resample_grid(pf, npix, margin):
    """Scatter-to-regular-grid setup shared by the wavefront bridge."""
    x = np.asarray(pf.X)
    y = np.asarray(pf.Y)
    finite = np.isfinite(x) & np.isfinite(y) & np.isfinite(pf.opd)
    x = x[finite]
    y = y[finite]
    opd = np.asarray(pf.opd)[finite]
    r = float(np.max(np.hypot(x, y)))
    diameter = 2.0 * r * float(margin)
    xg, yg = make_xy_grid(npix, diameter=diameter)
    xg = np.asarray(xg)
    yg = np.asarray(yg)
    dx = diameter / npix
    pts = np.stack([x, y], axis=-1)
    opd_grid = interpolate.griddata(pts, opd, (xg, yg), method='cubic',
                                    fill_value=0.0)
    opd_grid[~np.isfinite(opd_grid)] = 0.0
    phase_nm = opd_grid * 1.0e3   # OPD um -> nm
    return finite, pts, (xg, yg), dx, phase_nm


def _griddata_complex(pts, values, grid_pts):
    re = interpolate.griddata(pts, np.real(values), grid_pts,
                              method='cubic', fill_value=0.0)
    im = interpolate.griddata(pts, np.imag(values), grid_pts,
                              method='cubic', fill_value=0.0)
    re[~np.isfinite(re)] = 0.0
    im[~np.isfinite(im)] = 0.0
    return re + 1j * im


def pupil_field_to_wavefront(pf, *, npix=256, margin=1.05,
                             input_polarization=None):
    """Resample scattered pupil-field samples onto a regular-grid Wavefront.

    A polarized field returns the [Ex, Ey] component wavefronts.
    Propagate to the PSF with .focus(efl=pf.efl).
    """
    finite, pts, grid_pts, dx, phase_nm = _resample_grid(pf, npix, margin)
    k = 2 * np.pi / pf.wavelength / 1e3   # radians per nm of OPD
    phase_term = np.exp(1j * k * phase_nm)

    if not pf.polarized:
        amp = np.asarray(pf.amplitude)[finite]
        amp_grid = interpolate.griddata(pts, amp, grid_pts, method='cubic',
                                        fill_value=0.0)
        amp_grid[~np.isfinite(amp_grid)] = 0.0
        return Wavefront(amp_grid * phase_term, pf.wavelength, dx)

    if input_polarization is None:
        raise TypeError(
            'input_polarization is required for a polarized PupilField')
    e_in = np.zeros(3, dtype=_CPREC)
    e_in[:len(input_polarization)] = np.asarray(input_polarization,
                                                dtype=_CPREC)
    amp = np.asarray(pf.amplitude)[finite]
    e_vec = np.einsum('nij,j->ni', pf.P_matrix[finite], e_in)
    wavefronts = []
    for c in (0, 1):   # transverse x, y; Ez neglected
        g = _griddata_complex(pts, amp * e_vec[:, c], grid_pts)
        wavefronts.append(Wavefront(g * phase_term, pf.wavelength, dx))
    return wavefronts


def pupil_field_psf(pf, *, npix=256, margin=1.05, Q=2,
                    input_polarization='unpolarized'):
    """(psf, dx): intensity PSF from a pupil field.

    Polarized fields are illuminated with the requested input state;
    'unpolarized' incoherently averages two orthogonal inputs.
    """
    import numpy as onp
    if not pf.polarized:
        wf = pupil_field_to_wavefront(pf, npix=npix, margin=margin)
        psf = wf.focus(pf.efl, Q=Q)
        return onp.abs(onp.asarray(psf.data)) ** 2, psf.dx

    if isinstance(input_polarization, str):
        if input_polarization != 'unpolarized':
            raise ValueError(
                "string input_polarization must be 'unpolarized'")
        inputs = [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0)]
        weight = 0.5
    else:
        inputs = [input_polarization]
        weight = 1.0

    total = None
    last_dx = None
    for e_in in inputs:
        comps = pupil_field_to_wavefront(pf, npix=npix, margin=margin,
                                         input_polarization=e_in)
        for wf in comps:
            psf = wf.focus(pf.efl, Q=Q)
            last_dx = psf.dx
            contribution = weight * onp.abs(onp.asarray(psf.data)) ** 2
            total = contribution if total is None else total + contribution
    return total, last_dx


# ---------- polarization ray tracing (PRT) ----------------------------------

class PRTResult:
    """A geometric trace plus a per-ray 3x3 polarization ray-trace matrix."""

    __slots__ = ('trace', 'P_matrix')

    def __init__(self, trace, P_matrix):
        self.trace = trace
        self.P_matrix = P_matrix

    @property
    def P(self):
        """Position history of the wrapped trace."""
        return self.trace.P

    @property
    def S(self):
        """Direction history of the wrapped trace."""
        return self.trace.S

    @property
    def OPL(self):
        """OPL history of the wrapped trace."""
        return self.trace.OPL

    @property
    def status(self):
        """Status of the wrapped trace."""
        return self.trace.status


def _global_normal_and_cosI(surf, P_int_global, S_in_global):
    """Global-frame surface normal and incidence cosine."""
    XYZloc, Sloc = sm.transform_to_local_coords(
        P_int_global, surf.P, S_in_global, surf.R)
    XYZloc = np.asarray(XYZloc)
    Sloc = np.asarray(Sloc)
    _, n_local = surf.sag_and_normal(XYZloc[..., 0], XYZloc[..., 1])
    n_local = np.asarray(n_local)
    if surf.R is None:
        n_global = n_local
    else:
        n_global = np.matmul(np.asarray(surf.R).T,
                             n_local[..., np.newaxis]).squeeze(-1)
    return n_global, _row_dot(n_local, Sloc)


def _unit(v):
    n = np.sqrt(np.sum(v * v, axis=-1, keepdims=True))
    return v / n


def raytrace_prt(system, P, S, wavelength):
    """Polarization ray trace: geometry plus a per-ray 3x3 P matrix."""
    surfaces = compiled_surfaces(system)
    trace = raytrace(surfaces, P, S, wavelength)
    surfaces = list(surfaces)
    P_hist = np.asarray(trace.P)
    S_hist = np.asarray(trace.S)
    n_rays = P_hist.shape[1]
    Pmat = np.broadcast_to(np.eye(3, dtype=_CPREC),
                           (n_rays, 3, 3)).copy()

    nj = _complex_object_space_index(
        surfaces, wavelength, consumer='polarization ray tracing')
    for j, surf in enumerate(surfaces):
        coating = surf.coating
        k_in = _unit(S_hist[j])
        k_out = _unit(S_hist[j + 1])
        n_g, cosI = _global_normal_and_cosI(surf, P_hist[j + 1], S_hist[j])

        s = np.cross(k_in, n_g)
        s_norm = np.sqrt(np.sum(s * s, axis=-1, keepdims=True))
        # normal incidence: any perpendicular works since a_s == a_p there
        degen = (s_norm[..., 0] < 1e-12)
        xhat = np.array([1.0, 0.0, 0.0], dtype=k_in.dtype)
        fallback = np.cross(k_in, xhat)
        fb_norm = np.sqrt(np.sum(fallback * fallback, axis=-1,
                                 keepdims=True))
        small = fb_norm[..., 0] < 1e-12
        if np.any(small):
            yhat = np.array([0.0, 1.0, 0.0], dtype=k_in.dtype)
            fallback[small] = np.cross(k_in[small], yhat)
            fb_norm = np.sqrt(np.sum(fallback * fallback, axis=-1,
                                     keepdims=True))
        s_norm_safe = np.where(s_norm > 0, s_norm, 1.0)
        s = np.where(degen[:, None], fallback / fb_norm, s / s_norm_safe)
        p_in = np.cross(k_in, s)
        p_out = np.cross(k_out, s)

        if surf.typ == STYPE_REFRACT:
            n1 = _complex_index(surf.material, wavelength,
                                consumer='polarization ray tracing')
        else:
            n1 = nj
        a_s, a_p = interface_coefficients(nj, n1, cosI, surf.typ,
                                          coating=coating,
                                          wavelength=wavelength)
        if surf.typ == STYPE_REFRACT:
            nj = n1

        O_in = np.stack([s, p_in, k_in], axis=-1)
        O_out = np.stack([s, p_out, k_out], axis=-1)
        J = np.zeros((n_rays, 3, 3), dtype=_CPREC)
        J[:, 0, 0] = a_s
        J[:, 1, 1] = a_p
        J[:, 2, 2] = 1.0
        Pj = O_out @ J @ np.swapaxes(O_in, -1, -2).astype(_CPREC)
        Pmat = Pj @ Pmat
    return PRTResult(trace, Pmat)


__all__ = [
    'FieldTraceResult',
    'PRTResult',
    'PupilField',
    'amplitude_apodization',
    'interface_coefficients',
    'pupil_field',
    'pupil_field_psf',
    'pupil_field_to_wavefront',
    'raytrace_field',
    'raytrace_prt',
    'sine_space_coords',
    'surface_normals_from_trace',
    'unpolarized_amplitude',
]
