"""FFT-based pupil <-> focal propagation and sample-spacing conversions.

Rebuild of ``prysm/propagation/fft.py``: focus is the ortho-normalized
shift-sandwich ``fftshift(fft2(ifftshift(x)))``, preceded by FFT-aligned
padding.  All functions act on the trailing two axes so wavelength / field
batches ride along as leading dimensions.  XLA's native FFT runs these; the
explicit ``*_adjoint`` twins are provided for API parity (jax.grad derives
the same operators automatically).
"""
import math

import jax.numpy as jnp

from ..fttools import pad2d, crop_center

_AX = (-2, -1)


def _norm_ortho_fft2(x):
    # manual ortho scaling with a host float: jnp's norm='ortho' computes the
    # scale with an eager integer reduce_prod, unsupported on some backends
    scale = 1.0 / math.sqrt(x.shape[-2] * x.shape[-1])
    return jnp.fft.fft2(x, axes=_AX) * scale


def _norm_ortho_ifft2(x):
    scale = math.sqrt(x.shape[-2] * x.shape[-1])
    return jnp.fft.ifft2(x, axes=_AX) * scale


def _maybe_pad(wavefunction, Q):
    if Q != 1:
        return pad2d(wavefunction, Q)
    return wavefunction


def _shape_before_pad(padded_shape, Q):
    if Q == 1:
        return tuple(padded_shape)
    return tuple(int(s // Q) for s in padded_shape)


def _adjoint_pad2d(array, Q):
    out_shape = _shape_before_pad(array.shape[-2:], Q)
    if out_shape != array.shape[-2:]:
        return crop_center(array, out_shape)
    return array


def _pruned_geometry(in_shape, Q):
    """Padded shape when the pruned transform applies, else None.

    Pruning needs even input dims and a symmetric even pad on both axes
    (the flagship Q=2 case); anything else falls back to the dense path.
    """
    if Q == 1:
        return None
    out = tuple(math.ceil(s * Q) for s in in_shape)
    ok = all(s % 2 == 0 and o > s and (o - s) % 2 == 0
             for s, o in zip(in_shape, out))
    return out if ok else None


def _cb(n, rdtype):
    """(-1)^k checkerboard sign vector, a compile-time constant."""
    return jnp.where(jnp.arange(n) % 2 == 0, 1.0, -1.0).astype(rdtype)


def _pruned_pad_shift_transform(E, M_y, M_x, transform):
    """fftshift(transform2d(ifftshift(pad_center(E)))) with zero rows
    pruned AND both shift copies folded into checkerboard signs.

    After ifftshift, the centered pad becomes a middle band of zero rows
    and columns; the first (row) FFT pass therefore only runs over the N
    nonzero rows — 25% of the two-pass fft2 cost saved at Q=2 — and the
    zeros are concatenated back in before the dense column pass.

    The trailing output fftshift (a full-size gather copy — ~80 us at
    2048^2 c64, r5) is algebraic instead: fftshift(F(w)) = F(w * cb)
    with cb = (-1)^n for even sizes, so the signs multiply the
    (smaller) pre-transform operands and fuse into the concatenates.
    Exact (sign flips only); callers must NOT fftshift the result.
    """
    N_y, N_x = E.shape[-2:]
    h_y, h_x = N_y // 2, N_x // 2
    rdt = E.real.dtype
    iv = jnp.fft.ifftshift(E, axes=_AX)
    lead = E.shape[:-2]
    cbx = _cb(M_x, rdt)
    z_cols = jnp.zeros((*lead, N_y, M_x - N_x), iv.dtype)
    # cbx at each piece's destination columns: [0:h_x] and [M_x-(N_x-h_x):]
    rows = jnp.concatenate(
        [iv[..., :, :h_x] * cbx[:h_x],
         z_cols,
         iv[..., :, h_x:] * cbx[M_x - (N_x - h_x):]], axis=-1)
    Y = transform(rows, axis=-1)
    cby = _cb(M_y, rdt)
    z_mid = jnp.zeros((*lead, M_y - N_y, M_x), Y.dtype)
    Y = jnp.concatenate(
        [Y[..., :h_y, :] * cby[:h_y, None],
         z_mid,
         Y[..., h_y:, :] * cby[M_y - (N_y - h_y):, None]], axis=-2)
    return transform(Y, axis=-2)


def _pruned_shift_transform_crop(X, N_y, N_x, transform):
    """crop_center(fftshift(transform2d(ifftshift(X)))) with pruned rows
    and the full-size input ifftshift folded into output signs.

    The adjoint-side twin: only the N rows that survive the final crop
    enter the second (row-direction) pass.  For even sizes the input
    ifftshift satisfies F(ifftshift(x)) = cb * F(x) per axis and the
    column permutation commutes with the row-direction transform, so
    the 2048^2 gather copy becomes a (N_y, N_x) sign multiply on the
    cropped output — exact, sign flips only.
    """
    M_y, M_x = X.shape[-2:]
    h_y, h_x = N_y // 2, N_x // 2
    rdt = X.real.dtype
    Z = transform(X, axis=-2)
    rows = jnp.concatenate([Z[..., M_y - h_y:, :], Z[..., :h_y, :]],
                           axis=-2)
    W = transform(rows, axis=-1)
    out = jnp.concatenate([W[..., :, M_x - h_x:], W[..., :, :h_x]],
                          axis=-1)
    cby = _cb(M_y, rdt)
    cbx = _cb(M_x, rdt)
    sr = jnp.concatenate([cby[M_y - h_y:], cby[:h_y]])
    sc = jnp.concatenate([cbx[M_x - h_x:], cbx[:h_x]])
    return out * (sr[:, None] * sc[None, :])


def _dense_cb_sandwich(x, transform2d):
    """fftshift(transform2d(ifftshift(x))) via checkerboard signs.

    For even trailing dims the whole shift sandwich collapses to
    cb2 * T(cb2 * x) * (-1)^(Ny/2 + Nx/2) — two fused sign multiplies
    instead of two full-size gather copies.  Exact: sign flips only.
    """
    Ny, Nx = x.shape[-2:]
    rdt = x.real.dtype
    cb2 = _cb(Ny, rdt)[:, None] * _cb(Nx, rdt)[None, :]
    s0 = (-1.0) ** ((Ny // 2) + (Nx // 2))
    return cb2 * transform2d(cb2 * x) * s0


def focus(wavefunction, Q):
    """Propagate a pupil plane to a PSF plane (unitary FFT)."""
    geom = _pruned_geometry(wavefunction.shape[-2:], Q)
    if geom is not None:
        scale = 1.0 / math.sqrt(geom[0] * geom[1])
        # the output fftshift is folded into the pruned transform's signs
        return _pruned_pad_shift_transform(wavefunction, *geom,
                                           jnp.fft.fft) * scale
    padded = _maybe_pad(wavefunction, Q)
    if all(s % 2 == 0 for s in padded.shape[-2:]):
        return _dense_cb_sandwich(padded, _norm_ortho_fft2)
    return jnp.fft.fftshift(_norm_ortho_fft2(jnp.fft.ifftshift(padded, axes=_AX)), axes=_AX)


def focus_adjoint(wavefunction, Q):
    """Adjoint of focus: inverse unitary FFT then center-crop."""
    out_shape = _shape_before_pad(wavefunction.shape[-2:], Q)
    if (out_shape != wavefunction.shape[-2:]
            and _pruned_geometry(out_shape, Q) == wavefunction.shape[-2:]):
        M_y, M_x = wavefunction.shape[-2:]
        scale = math.sqrt(M_y * M_x)
        return _pruned_shift_transform_crop(
            wavefunction, *out_shape, jnp.fft.ifft) * scale
    padded_grad = jnp.fft.fftshift(_norm_ortho_ifft2(jnp.fft.ifftshift(wavefunction, axes=_AX)), axes=_AX)
    return _adjoint_pad2d(padded_grad, Q)


def unfocus(wavefunction, Q):
    """Propagate a PSF plane to a pupil plane (unitary inverse FFT)."""
    geom = _pruned_geometry(wavefunction.shape[-2:], Q)
    if geom is not None:
        # the two ifft passes already carry the 1/(My*Mx) factor; the
        # output fftshift is folded into the pruned transform's signs
        scale = math.sqrt(geom[0] * geom[1])
        return _pruned_pad_shift_transform(wavefunction, *geom,
                                           jnp.fft.ifft) * scale
    padded = _maybe_pad(wavefunction, Q)
    if all(s % 2 == 0 for s in padded.shape[-2:]):
        return _dense_cb_sandwich(padded, _norm_ortho_ifft2)
    return jnp.fft.fftshift(_norm_ortho_ifft2(jnp.fft.ifftshift(padded, axes=_AX)), axes=_AX)


def unfocus_adjoint(wavefunction, Q):
    """Adjoint of unfocus: forward unitary FFT then center-crop."""
    out_shape = _shape_before_pad(wavefunction.shape[-2:], Q)
    if (out_shape != wavefunction.shape[-2:]
            and _pruned_geometry(out_shape, Q) == wavefunction.shape[-2:]):
        M_y, M_x = wavefunction.shape[-2:]
        scale = 1.0 / math.sqrt(M_y * M_x)
        return _pruned_shift_transform_crop(
            wavefunction, *out_shape, jnp.fft.fft) * scale
    padded_grad = jnp.fft.fftshift(_norm_ortho_fft2(jnp.fft.ifftshift(wavefunction, axes=_AX)), axes=_AX)
    return _adjoint_pad2d(padded_grad, Q)


def Q_for_sampling(input_diameter, prop_dist, wavelength, output_dx):
    """Q for a given output sampling: (wvl * z / D) / output_dx.

    input_diameter and prop_dist in mm, wavelength in um, output_dx in um.
    """
    resolution_element = (wavelength * prop_dist) / input_diameter
    return resolution_element / output_dx


def pupil_sample_to_psf_sample(pupil_sample, samples, wavelength, efl):
    """Pupil (mm) -> PSF (um) sample spacing: efl * wvl / (dx * N)."""
    return (efl * wavelength) / (pupil_sample * samples)


def psf_sample_to_pupil_sample(psf_sample, samples, wavelength, efl):
    """PSF (um) -> pupil (mm) sample spacing: efl * wvl / (dx * N)."""
    return (efl * wavelength) / (psf_sample * samples)
