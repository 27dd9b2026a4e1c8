"""Device-resident batched raytrace analysis: fields x wavelengths on chip.

The reference's analysis layer traces one (field, wavelength) bundle at a
time from host Python (``prysm/x/raytracing/analysis.py:245-630``); this
module is the TPU-first replacement the reference has no counterpart for:

* all fields of one wavelength merge into a single (F*N, 3) ray batch —
  rays are independent, so the per-surface kernel sees one wide bundle
  and the MXU/VPU stay busy instead of running F small traces;
* launch geometry, chief indices, exit-pupil anchors, field-tilt ramps,
  and Zernike design matrices are host-built *constants* (tiny, static);
* trace -> EIC closing -> masked Zernike normal-equation solve runs as
  ONE jitted program per wavelength: there are zero host syncs between
  the launch arrays entering the device and the fitted coefficients
  leaving it.

``device_wavefront_fit`` is the flagship: (W, F, K) Zernike coefficients
from a single dispatch per wavelength.  ``merged_trace`` exposes the raw
wide-batch trace for rays*surfaces/s measurement.
"""
import numpy as np

import jax
import jax.numpy as jnp

from ...polynomials import zernike_nm_seq
from .spencer_and_murty import (raytrace, eic_closing,
                                RayTraceResult)
from .launch import launch, Sampling
from ._resolve import compiled_surfaces, trace_context
from .opt import _pupil_center_chief_index
from ._trace_grid import _resolve_fields, _resolve_wavelengths

_PREC = np.float64


def _host_launches(system, fields, wavelength, sampling, epd):
    """Stacked (F, N, 3) launch bundles for one wavelength (host, tiny)."""
    Ps, Ss = [], []
    for f in fields:
        P, S = launch(system, f, wavelength, sampling, epd=epd)
        Ps.append(np.asarray(P, dtype=_PREC))
        Ss.append(np.asarray(S, dtype=_PREC))
    n = {p.shape[0] for p in Ps}
    if len(n) != 1:
        raise ValueError(
            'fields launched different ray counts; device batching needs a '
            'uniform pattern (disable vignetting-dependent dropping)')
    return np.stack(Ps), np.stack(Ss)


def _chief_indices(P0):
    """Pupil-center ray index per field (same rule as the host path)."""
    return np.asarray([_pupil_center_chief_index(P0[i])
                       for i in range(P0.shape[0])])


def _tilt_ramps(fields, P0, chiefs):
    """Static launch-plane field-tilt ramps, (F, N)."""
    ramps = np.zeros(P0.shape[:2], dtype=_PREC)
    for i, f in enumerate(fields):
        ax, ay = f.angle_radians()
        u = P0[i, :, 0] - P0[i, chiefs[i], 0]
        v = P0[i, :, 1] - P0[i, chiefs[i], 1]
        ramps[i] = np.sin(ax) * u + np.sin(ay) * v
    return ramps


def _design_matrices(P0, chiefs, nms, norm, normalization_radius):
    """Static Zernike design matrices (F, N, K) on the launch coordinates."""
    F, N = P0.shape[:2]
    out = np.empty((F, N, len(nms)), dtype=_PREC)
    uv_out = np.empty((F, 2, N), dtype=_PREC)
    for i in range(F):
        u = P0[i, :, 0] - P0[i, chiefs[i], 0]
        v = P0[i, :, 1] - P0[i, chiefs[i], 1]
        rr = np.hypot(u, v)
        nr = (float(rr.max()) if normalization_radius is None
              else float(normalization_radius))
        basis = np.asarray(zernike_nm_seq(nms, rr / nr, np.arctan2(v, u),
                                          norm=norm))
        out[i] = np.moveaxis(basis, 0, -1)
        uv_out[i] = np.stack([u, v])
    return out, uv_out


def merged_trace(system, fields=None, wavelengths=None, sampling=None, *,
                 epd=None):
    """One wide-batch trace per wavelength: all fields' rays merged.

    Returns (wavelengths, results) where results[w] is the RayTraceResult
    of the (F*N)-ray merged bundle; reshape leading ray axes with
    ``unmerge`` below.  Histories stay on device.
    """
    fields = _resolve_fields(system, fields)
    wavelengths = _resolve_wavelengths(system, wavelengths)
    sampling = Sampling.hex(nrings=6) if sampling is None else sampling
    surfaces = compiled_surfaces(system)
    results = []
    for wvl in wavelengths:
        P, S = _host_launches(system, fields, float(wvl), sampling, epd)
        F, N = P.shape[:2]

        def run(P, S, _w=float(wvl)):
            # jit wants pytree outputs; rewrap the result container outside
            res = raytrace(surfaces, P, S, _w)
            return res.P, res.S, res.OPL, res.status

        # upload once: numpy args would re-transfer on every dispatch
        Ph, Sh, Lh, st = jax.jit(run)(jnp.asarray(P.reshape(F * N, 3)),
                                      jnp.asarray(S.reshape(F * N, 3)))
        results.append(RayTraceResult(Ph, Sh, Lh, st))
    return wavelengths, results


def unmerge(history, F):
    """(n_surf, F*N, ...) -> (n_surf, F, N, ...)."""
    h = jnp.asarray(history)
    n_surf, FN = h.shape[:2]
    return h.reshape(n_surf, F, FN // F, *h.shape[2:])


def fit_from_trace(P_end, S_end, OPL, alive, A, ramps, chief_onehot,
                   P_xp, n_image, reduce_rays=lambda x: x):
    """Masked Zernike normal-equation fit from merged-trace outputs.

    Chief-ray quantities are gathered through one-hot sums rather than
    indexing, and every ray-axis contraction funnels through
    ``reduce_rays`` — identity serially; ``lax.psum`` over the ray mesh
    axis in the sharded path (parallel/raytrace.py), where each device
    holds a slice of the ray axis and the chief may live on another
    shard.  The two paths are numerically identical because the one-hot
    products contribute exact zeros off the chief.
    """
    # (F, 3) chief landing point; (F,) chief path total -- psum'd sums.
    # Dead rays carry NaN histories; select-before-multiply keeps the
    # 0 * NaN products out of the one-hot sums.
    chief_mask = chief_onehot > 0
    center = reduce_rays(jnp.einsum(
        'fn,fnc->fc', chief_onehot,
        jnp.where(chief_mask[..., None], P_end, 0.0)))
    if P_xp is None:
        kappa = jnp.zeros(P_end.shape[0], dtype=P_end.dtype)
    else:
        R = jnp.linalg.norm(P_xp[None] - center, axis=-1)
        kappa = 1.0 / R
    s, _ = eic_closing(P_end, S_end, center[:, None, :], kappa[:, None])
    total = OPL + n_image * s
    chief_total = reduce_rays(jnp.einsum(
        'fn,fn->f', chief_onehot, jnp.where(chief_mask, total, 0.0)))
    opd = total - chief_total[:, None] + ramps
    # masked normal equations: dead (and pad) rays weight zero
    w = alive.astype(opd.dtype)
    opd0 = jnp.where(alive, opd, 0.0)
    Aw = A * w[..., None]
    G = reduce_rays(jnp.einsum('fnk,fnl->fkl', Aw, A))
    b = reduce_rays(jnp.einsum('fnk,fn->fk', Aw, opd0))
    coefs = jnp.linalg.solve(G, b[..., None])[..., 0]
    fit = jnp.einsum('fnk,fk->fn', A, coefs)
    err2 = jnp.where(alive, (opd0 - fit) ** 2, 0.0)
    rms = jnp.sqrt(reduce_rays(err2.sum(axis=1))
                   / reduce_rays(w.sum(axis=1)))
    return coefs, rms


def device_wavefront_fit(system, nms, fields=None, wavelengths=None,
                         sampling=None, *, epd=None, norm=True,
                         normalization_radius=None):
    """Zernike coefficients for every (wavelength, field), fully on device.

    For each wavelength, ONE jitted program traces all fields' rays as a
    merged batch, closes the wavefront on the chief-image reference
    sphere (EIC closing, curvature from the paraxial exit pupil), applies
    the launch-plane field-tilt ramp, and solves the masked Zernike
    normal equations.  Dead rays weight zero in the fit; there are no
    host syncs between launch and the coefficient arrays.

    Returns (coefs, rms) with shapes (W, F, K) and (W, F), as device
    arrays.  normalization_radius=None uses each field's launch-pattern
    radius (static), where the host fit uses the max over *surviving*
    rays — pass it explicitly when comparing heavily vignetted bundles.
    """
    fields = _resolve_fields(system, fields)
    wavelengths = _resolve_wavelengths(system, wavelengths)
    sampling = Sampling.hex(nrings=6) if sampling is None else sampling
    surfaces = compiled_surfaces(system)

    coef_out, rms_out = [], []
    for wvl in wavelengths:
        wvl = float(wvl)
        P, S = _host_launches(system, fields, wvl, sampling, epd)
        F, N = P.shape[:2]
        chiefs = _chief_indices(P)
        ramps = _tilt_ramps(fields, P, chiefs)
        A, _ = _design_matrices(P, chiefs, nms, norm, normalization_radius)
        ctx = trace_context(system, wvl)
        xp = system.exit_pupil(wvl) if hasattr(system, 'exit_pupil') else None
        P_xp = None if xp is None else np.asarray(xp, dtype=_PREC)
        n_image = float(ctx.n_image)

        chief_onehot = np.zeros((F, N), dtype=_PREC)
        chief_onehot[np.arange(F), chiefs] = 1.0

        def step(P, S, A, ramps, chief_w, P_xp, *, _w=wvl, _F=F, _N=N):
            res = raytrace(surfaces, P.reshape(_F * _N, 3),
                           S.reshape(_F * _N, 3), _w)
            return fit_from_trace(
                res.P[-1].reshape(_F, _N, 3),
                res.S[-1].reshape(_F, _N, 3),
                res.OPL.sum(axis=0).reshape(_F, _N),
                (res.status.imag == 0).reshape(_F, _N),
                A, ramps, chief_w, P_xp, n_image)

        args = [jnp.asarray(a) for a in (P, S, A, ramps, chief_onehot)]
        xp_dev = None if P_xp is None else jnp.asarray(P_xp)
        c, r = jax.jit(step)(*args, xp_dev)
        coef_out.append(c)
        rms_out.append(r)
    return jnp.stack(coef_out), jnp.stack(rms_out)


__all__ = ['device_wavefront_fit', 'fit_from_trace', 'merged_trace', 'unmerge']
