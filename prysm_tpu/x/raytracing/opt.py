"""Ray aiming, pupil location, OPD closing, and spot statistics.

Rebuild of ``prysm/x/raytracing/opt.py``.  Aiming is a host-side
damped-Newton loop whose inner landing evaluation is a batched trace —
every ray in the bundle aims concurrently, with per-ray step damping.
"""
import copy

import numpy as np

from ...conf import config
from . import spencer_and_murty
from .spencer_and_murty import valid_mask
from ._line_math import (
    closest_point_on_line_to_line,
    normalize_vector,
    unit_vector_between,
)


def declipped(surfaces):
    """Surfaces with clips removed; aiming registers rays, it does not clip.

    A ray aimed onto a stop edge would otherwise NaN mid-solve when a
    Newton iterate steps past the clip.  Clips apply in the real trace.
    """
    out = []
    for surf in surfaces:
        if getattr(surf.aperture, 'clip', None) is not None:
            bare = copy.copy(surf)
            bare.aperture = None
            surf = bare
        out.append(surf)
    return out


def aim_rays(P, S, surfaces, surface_index, target_xy, wvl,
             tol=1e-12, maxiter=20, strict=True, vary='position'):
    """Aim a bundle so each ray lands at target_xy on a surface.

    target_xy is in the aim surface's local frame; either one (x, y)
    shared by every ray or an (N, 2) per-ray array.  vary selects whether
    launch position or direction is adjusted.  Returns (P, S, converged).
    """
    if vary not in ('position', 'direction'):
        raise ValueError(
            f"vary must be 'position' or 'direction', got {vary!r}")
    dtype = np.dtype(config.precision)
    P = np.asarray(P, dtype=dtype).copy()
    S = np.asarray(S, dtype=dtype).copy()
    target = np.asarray(target_xy, dtype=dtype)
    if target.ndim == 1:
        target = target.reshape(1, 2)
    trace_path = declipped(surfaces[:surface_index + 1])

    if vary == 'direction':
        sz_sign = np.sign(S[:, 2])
        sz_sign[sz_sign == 0] = 1.0
        sz_anchor = sz_sign * np.abs(S[:, 2])

        def apply(var):
            sx = var[:, 0]
            sy = var[:, 1]
            norm = np.sqrt(sx * sx + sy * sy + sz_anchor * sz_anchor)
            zero_norm = norm == 0
            norm[zero_norm] = 1.0
            S[:, 0] = sx / norm
            S[:, 1] = sy / norm
            S[:, 2] = np.where(zero_norm, sz_sign, sz_anchor / norm)

        var0 = S[:, :2].copy()
    else:
        def apply(var):
            P[:, 0] = var[:, 0]
            P[:, 1] = var[:, 1]

        var0 = P[:, :2].copy()

    aim_surf = surfaces[surface_index]

    def landing(var):
        apply(var)
        tr = spencer_and_murty.raytrace(trace_path, P, S, wvl)
        loc, _ = spencer_and_murty.transform_to_local_coords(
            tr.P[-1], aim_surf.P, tr.S[-1], aim_surf.R)
        return np.asarray(loc[:, :2])

    eps = float(np.finfo(dtype).eps)
    sqrt_eps = eps ** 0.5

    var = var0
    r = landing(var) - target
    rn = np.sqrt((r * r).sum(axis=1))
    dead = ~np.isfinite(rn)  # NaN landing (TIR / miss): cannot be aimed

    for _ in range(int(maxiter)):
        stepping = (~dead) & (rn > tol)
        if not bool(np.any(stepping)):
            break

        # forward-difference 2x2 Jacobian per ray
        h = sqrt_eps * np.maximum(
            1.0, np.maximum(np.abs(var[:, 0]), np.abs(var[:, 1])))
        L0 = r + target
        var_dx = var.copy()
        var_dx[:, 0] = var_dx[:, 0] + h
        L_dx = landing(var_dx)
        var_dy = var.copy()
        var_dy[:, 1] = var_dy[:, 1] + h
        L_dy = landing(var_dy)

        a = (L_dx[:, 0] - L0[:, 0]) / h
        c = (L_dx[:, 1] - L0[:, 1]) / h
        b = (L_dy[:, 0] - L0[:, 0]) / h
        d = (L_dy[:, 1] - L0[:, 1]) / h

        det = a * d - b * c
        jac_scale = a * a + b * b + c * c + d * d
        singular = (~np.isfinite(det)) | (np.abs(det) < eps * jac_scale)

        rx = r[:, 0]
        ry = r[:, 1]
        det[singular] = 1.0
        d0 = (-rx * d + b * ry) / det
        d1 = (rx * c - a * ry) / det

        delta = np.stack([d0, d1], axis=1)
        delta[~stepping | singular] = 0.0
        dead = dead | singular
        stepping = stepping & ~singular

        # per-ray damped step so one stubborn ray cannot stall the bundle
        alpha = np.ones_like(rn)
        var_try = var
        r_try = r
        rn_try = rn
        for _bt in range(40):
            var_try = var + alpha[:, np.newaxis] * delta
            r_try = landing(var_try) - target
            rn_try = np.sqrt((r_try * r_try).sum(axis=1))
            need = stepping & ~(rn_try <= rn) & (alpha > sqrt_eps)
            if not bool(np.any(need)):
                break
            alpha[need] *= 0.5

        ok = stepping & (rn_try <= rn)
        stalled = stepping & ~ok
        var = np.where(ok[:, np.newaxis], var_try, var)
        r = np.where(ok[:, np.newaxis], r_try, r)
        rn = np.where(ok, rn_try, rn)
        dead = dead | stalled

    apply(var)
    converged = np.isfinite(rn) & (rn <= tol)

    if strict and not bool(np.all(converged)):
        bad_idx = np.where(~converged)[0].tolist()
        n_bad = len(bad_idx)
        max_res = float(np.nanmax(np.where(dead, 0.0, rn)))
        raise RuntimeError(
            f'aim_rays failed to converge {n_bad} of {converged.shape[0]} '
            f'rays (indices {bad_idx}); worst finite residual {max_res:.3e}. '
            'Pass strict=False to return best-effort launch parameters.')
    return P, S, converged


def _closest_approach_on_axis(P_chief, S_chief, axis_point, axis_dir):
    return closest_point_on_line_to_line(P_chief, S_chief,
                                         axis_point, axis_dir)


def _chief_axis_perp_norm(S_chief, axis_dir):
    S_chief = np.asarray(S_chief)
    axis_dir = normalize_vector(np.asarray(axis_dir), axis=-1)
    s_parallel = np.sum(S_chief * axis_dir) * axis_dir
    s_perp = S_chief - s_parallel
    return float(np.sqrt(np.sum(s_perp * s_perp)))


def _pupil_on_axis(P_chief, S_chief, axis_p1, axis_p2):
    axis_p1 = np.asarray(axis_p1)
    S_axis = unit_vector_between(axis_p1, np.asarray(axis_p2))
    return _closest_approach_on_axis(P_chief, S_chief, axis_p1, S_axis)


def locate_ep(P_chief, S_chief, P_obj, P_s1):
    """Entrance-pupil position: closest approach of the chief to the
    (P_obj, P_s1) axis."""
    return _pupil_on_axis(P_chief, S_chief, P_obj, P_s1)


def locate_xp(P_chief, S_chief, P_img, P_sk):
    """Exit-pupil position: closest approach of the chief to the
    (P_img, P_sk) axis."""
    return _pupil_on_axis(P_chief, S_chief, P_img, P_sk)


def xp_reference_sphere(P_chief, S_chief, axis_point=None, axis_dir=None,
                        min_perp=1e-6):
    """(C, R, P_xp): the exit-pupil reference sphere for one chief ray."""
    if axis_point is None:
        axis_point = np.zeros(3, dtype=np.asarray(P_chief).dtype)
    if axis_dir is None:
        axis_dir = np.array([0., 0., 1.], dtype=np.asarray(P_chief).dtype)
    if _chief_axis_perp_norm(S_chief, axis_dir) < min_perp:
        raise ValueError(
            'cannot locate the exit pupil from a near-axial chief ray; pass '
            'P_xp or a resolvable stop/pupil route to anchor the reference '
            'sphere')
    C = np.asarray(P_chief)
    P_xp = _closest_approach_on_axis(P_chief, S_chief,
                                     np.asarray(axis_point),
                                     np.asarray(axis_dir))
    R = np.sqrt(np.sum((P_xp - C) ** 2))
    return C, float(R), P_xp


def _pupil_center_chief_index(P, valid=None):
    """Index of the launch ray nearest the bundle's pupil center."""
    P = np.asarray(P)
    center = np.mean(P[:, :2], axis=0)
    d2 = np.sum((P[:, :2] - center) ** 2, axis=1)
    if valid is not None:
        d2 = np.where(np.asarray(valid), d2, np.inf)
    return int(np.argmin(d2))


def eic_distance(P_a, d_a, P_b, d_b):
    """Hopkins equally-inclined-chord distance between two pencils."""
    dP = P_a - P_b
    num = ((d_a + d_b) * dP).sum(axis=-1)
    denom = 1.0 + (d_a * d_b).sum(axis=-1)
    return num / denom


def reference_sphere_curvature(P_xp, center):
    """Curvature 1/R of the chief-image reference sphere (0 for XP at inf)."""
    if P_xp is None:
        return 0.0
    R = float(np.sqrt(np.sum((np.asarray(P_xp) - np.asarray(center)) ** 2)))
    if R <= 1e-12:
        raise ValueError(
            'reference-sphere radius is degenerate (the exit pupil coincides '
            'with the image point); pass a separated P_xp')
    return 1.0 / R


def hopkins_eic_closing(P_hist, S_hist, OPL_hist, *, center, curvature,
                        n_image=1.0, chief_index=None):
    """Chief-referenced OPD on the image reference sphere, branch-free.

    Parametrized by the sphere center and curvature kappa = 1/R so the
    single expression s = -b - kappa m / (1 + sqrt(1 + kappa^2 m)), with
    r = P_last - center, b = S_last.r, m = b^2 - r.r, spans finite pupils
    and the telecentric kappa -> 0 limit without cancellation (reference:
    prysm/x/raytracing/opt.py:401-468).
    """
    from .spencer_and_murty import eic_closing

    C = np.asarray(center)
    P_last = np.asarray(P_hist[-1])
    S_last = np.asarray(S_hist[-1])
    OPL_through = np.asarray(OPL_hist).sum(axis=0)
    if chief_index is None:
        chief_index = _pupil_center_chief_index(np.asarray(P_hist[0]))
    k = float(curvature)
    s, disc = eic_closing(P_last, S_last, C, k)
    s = np.asarray(s)
    disc = np.asarray(disc)
    min_disc = float(np.min(disc))
    tol = 64.0 * np.finfo(disc.dtype).eps
    if min_disc < -tol:
        raise ValueError(
            'ray does not intersect the reference sphere; check P_xp/center '
            'or use the telecentric curvature=0 limit')
    OPL_total = OPL_through + n_image * s
    return OPL_total - OPL_total[chief_index]


# ---------- spot statistics ----------

def _centered_r2(x, y, axis, center):
    x = np.asarray(x)
    y = np.asarray(y)
    if center is None:
        cx = np.nanmean(x, axis=axis, keepdims=True)
        cy = np.nanmean(y, axis=axis, keepdims=True)
    else:
        cx, cy = center
    dx = x - cx
    dy = y - cy
    return dx * dx + dy * dy


def centroid_referenced_rms(x, y, *, axis=-1, center=None):
    """NaN-aware RMS distance from the per-slice centroid (or center)."""
    return np.sqrt(np.nanmean(_centered_r2(x, y, axis, center), axis=axis))


def centroid_referenced_max(x, y, *, axis=-1, center=None):
    """NaN-aware max distance from the per-slice centroid (or center)."""
    return np.sqrt(np.nanmax(_centered_r2(x, y, axis, center), axis=axis))


def spot_centroid(P_final, status=None):
    """Mean (x, y) of valid rays at a surface plane."""
    P_final = np.asarray(P_final)
    valid = valid_mask(status, P_final)
    if valid is not None:
        P_final = P_final[np.asarray(valid)]
    if P_final.shape[0] == 0:
        return np.array([np.nan, np.nan], dtype=P_final.dtype)
    return P_final[..., :2].mean(axis=0)


def rms_spot_radius(P_final, status=None, centroid=None):
    """RMS distance of valid rays from their centroid (or given center)."""
    P_final = np.asarray(P_final)
    valid = valid_mask(status, P_final)
    if valid is not None:
        P_final = P_final[np.asarray(valid)]
    if P_final.shape[0] == 0:
        return float('nan')
    center = None if centroid is None else tuple(np.asarray(centroid))
    return float(centroid_referenced_rms(
        P_final[..., 0], P_final[..., 1], axis=0, center=center))


def geometric_psf_histogram(P_final, status=None, bins=64, extent=None):
    """(H, xedges, yedges): 2D histogram of valid rays — the geometric PSF."""
    P_final = np.asarray(P_final)
    valid = valid_mask(status, P_final)
    if valid is not None:
        P_final = P_final[np.asarray(valid)]
    x = P_final[..., 0]
    y = P_final[..., 1]
    if extent is None:
        if x.size == 0:
            extent = [(-1.0, 1.0), (-1.0, 1.0)]
        else:
            cx = float(x.mean())
            cy = float(y.mean())
            r = max(float(np.abs(x - cx).max()),
                    float(np.abs(y - cy).max())) * 1.05
            r = max(r, 1e-12)
            extent = [(cx - r, cx + r), (cy - r, cy + r)]
    H, xedges, yedges = np.histogram2d(x, y, bins=bins, range=extent)
    return H, xedges, yedges
