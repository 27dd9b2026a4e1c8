"""Sharded batched raytrace: the merged ray axis over a device mesh.

The reference traces one (field, wavelength) bundle at a time on one
host (``prysm/x/raytracing/spencer_and_murty.py:500-622``); here the
merged (field x ray) bundle of ``x/raytracing/batch.py`` shards over a
mesh axis.  Rays are independent through the trace, so the only
communication is in the wavefront fit: the chief-ray gather, the Zernike
normal-equation Gram/rhs, and the residual sums are ``lax.psum`` s over
the ray axis — a handful of (F, K, K)-sized collectives riding ICI after
an arbitrarily large per-device trace.

``shard_wavefront_fit`` reproduces ``device_wavefront_fit`` exactly
(same fit kernel, reductions swapped from identity to psum; pad rays
carry zero weight), which the test suite asserts at f64 on a CPU mesh.
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec
from jax.experimental.shard_map import shard_map

from ..x.raytracing.batch import (
    _chief_indices,
    _design_matrices,
    _host_launches,
    _resolve_fields,
    _resolve_wavelengths,
    _tilt_ramps,
    fit_from_trace,
)
from ..x.raytracing.spencer_and_murty import raytrace
from ..x.raytracing._resolve import compiled_surfaces, trace_context
from ..x.raytracing.launch import Sampling

_PREC = np.float64


def _pad_rays(arrays, N, n_shards):
    """Pad the ray axis (axis 1) up to a multiple of n_shards.

    Pad rays replicate ray 0 of their field (they trace fine) and are
    excluded from the fit by the weight mask.
    """
    Np = -(-N // n_shards) * n_shards
    if Np == N:
        return arrays, N
    pad = Np - N

    def pad_one(a):
        fill = np.repeat(a[:, :1], pad, axis=1)
        return np.concatenate([a, fill], axis=1)

    return [pad_one(a) for a in arrays], Np


def shard_wavefront_fit(mesh, system, nms, fields=None, wavelengths=None,
                        sampling=None, *, axis=None, epd=None, norm=True,
                        normalization_radius=None):
    """Zernike coefficients per (wavelength, field), rays sharded on mesh.

    axis defaults to the mesh's last axis name.  Returns (coefs, rms)
    with shapes (W, F, K) and (W, F), matching device_wavefront_fit.
    """
    axis = axis or mesh.axis_names[-1]
    n_shards = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    fields = _resolve_fields(system, fields)
    wavelengths = _resolve_wavelengths(system, wavelengths)
    sampling = Sampling.hex(nrings=6) if sampling is None else sampling
    surfaces = compiled_surfaces(system)

    ray_spec = PartitionSpec(None, axis)        # (F, N) family
    ray3_spec = PartitionSpec(None, axis, None)  # (F, N, 3) family
    rep = PartitionSpec()

    coef_out, rms_out = [], []
    for wvl in wavelengths:
        wvl = float(wvl)
        P, S = _host_launches(system, fields, wvl, sampling, epd)
        F, N = P.shape[:2]
        chiefs = _chief_indices(P)
        ramps = _tilt_ramps(fields, P, chiefs)
        A, _ = _design_matrices(P, chiefs, nms, norm, normalization_radius)
        (P, S, A, ramps), Np = _pad_rays([P, S, A, ramps], N, n_shards)
        # masks are padded with ZEROS, never replicated: a pad ray must
        # not double the chief weight nor enter the fit
        chief_onehot = np.zeros((F, Np), dtype=_PREC)
        chief_onehot[np.arange(F), chiefs] = 1.0
        valid = np.zeros((F, Np), dtype=bool)
        valid[:, :N] = True

        ctx = trace_context(system, wvl)
        xp = system.exit_pupil(wvl) if hasattr(system, 'exit_pupil') else None
        P_xp = None if xp is None else np.asarray(xp, dtype=_PREC)
        n_image = float(ctx.n_image)

        def local_step(P, S, A, ramps, chief_w, valid, P_xp,
                       *, _w=wvl, _F=F, _Nl=Np // n_shards):
            res = raytrace(surfaces, P.reshape(_F * _Nl, 3),
                           S.reshape(_F * _Nl, 3), _w)
            alive = (res.status.imag == 0).reshape(_F, _Nl) & valid
            return fit_from_trace(
                res.P[-1].reshape(_F, _Nl, 3),
                res.S[-1].reshape(_F, _Nl, 3),
                res.OPL.sum(axis=0).reshape(_F, _Nl),
                alive, A, ramps, chief_w, P_xp, n_image,
                reduce_rays=lambda x: lax.psum(x, axis))

        in_specs = (ray3_spec, ray3_spec, ray3_spec, ray_spec, ray_spec,
                    ray_spec)
        xp_spec = () if P_xp is None else (rep,)
        sharded = shard_map(
            local_step, mesh=mesh,
            in_specs=in_specs + xp_spec,
            out_specs=(rep, rep))
        args = [jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
                for a, spec in zip((P, S, A, ramps, chief_onehot, valid),
                                   in_specs)]
        if P_xp is not None:
            args.append(jax.device_put(jnp.asarray(P_xp),
                                       NamedSharding(mesh, rep)))

            def run(*a):
                return sharded(*a)
        else:
            def run(*a):
                return sharded(*a)
        c, r = jax.jit(run)(*args)
        coef_out.append(c)
        rms_out.append(r)
    return jnp.stack(coef_out), jnp.stack(rms_out)


def shard_merged_trace_rate(mesh, system, wavelength, sampling=None, *,
                            axis=None, epd=None):
    """One sharded merged trace; returns summed landing coordinates.

    The throughput witness for the sharded trace path: every device
    traces its slice of the merged bundle, one psum closes the result.
    """
    axis = axis or mesh.axis_names[-1]
    n_shards = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    fields = _resolve_fields(system, None)
    sampling = Sampling.hex(nrings=6) if sampling is None else sampling
    surfaces = compiled_surfaces(system)
    P, S = _host_launches(system, fields, float(wavelength), sampling, epd)
    F, N = P.shape[:2]
    (P, S), Np = _pad_rays([P, S], N, n_shards)

    def local(P, S):
        res = raytrace(surfaces, P.reshape(-1, 3), S.reshape(-1, 3),
                       float(wavelength))
        return lax.psum(jnp.nan_to_num(res.P[-1]).sum(axis=0), axis)

    spec = PartitionSpec(None, axis, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec),
                   out_specs=PartitionSpec())
    args = [jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
            for a in (P, S)]
    return jax.jit(fn)(*args), F * Np * len(surfaces)


__all__ = ['shard_wavefront_fit', 'shard_merged_trace_rate']
