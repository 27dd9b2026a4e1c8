"""Pallas-fused chirp stages for the Bluestein chirp-Z transform.

The CZT per axis is: chirp multiply -> zero-pad to K -> FFT -> x H ->
IFFT -> slice -> output chirp (reference ``prysm/fttools.py:296-361``).
The FFTs belong to XLA (its radix kernels are the fast path); what leaks
HBM bandwidth in the jnp pipeline is the *elementwise scaffolding*:

* the input chirp product and the zero-pad are two separate HBM
  round-trips of the (padded) array;
* the final slice, per-axis output chirps, and phase factors are three
  more elementwise passes.

``czt_prechirp_pad`` fuses multiply+pad into one write-once kernel over
the padded output (the pad region never reads the input), and
``czt_postchirp`` fuses slice + both output chirps + both phase factors
+ the optical norm into one pass.  ``czt_pallas`` plumbs them around the
plan's FFT pipeline as a drop-in for ``CZT.__call__``.

Complex data moves as separate real/imag planes (the library-wide axon
constraint: no complex arrays across jit/kernel boundaries).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import pallas_interpret

_LANE = 128


def _pad_to(n, m):
    return ((n + m - 1) // m) * m


def _prechirp_kernel(xr, xi, brr, bri, bcr, bci, outr, outi):
    # complex (x * brow) * bcol on the unpadded block; the caller maps
    # this kernel only over the live region, the pad stays zeroed
    ar, ai = xr[...], xi[...]
    br_r, br_i = brr[...], bri[...]
    bc_r, bc_i = bcr[...], bci[...]
    # (x * brow)
    t_r = ar * br_r - ai * br_i
    t_i = ar * br_i + ai * br_r
    # (* bcol)
    outr[...] = t_r * bc_r - t_i * bc_i
    outi[...] = t_r * bc_i + t_i * bc_r


def czt_prechirp_pad(x_re, x_im, brow_re, brow_im, bcol_re, bcol_im,
                     Ky, Kx):
    """(Ny, Nx) field -> (Ky, Kx) chirped zero-padded operand, one pass.

    Returns (re, im); rows/cols beyond (Ny, Nx) are zeros written by the
    out-shape initialization, never round-tripped through HBM as a
    separate pad op.
    """
    Ny, Nx = x_re.shape[-2:]
    dtype = x_re.dtype

    def body(xr, xi, brr, bri, bcr, bci, outr, outi):
        outr[...] = jnp.zeros_like(outr)
        outi[...] = jnp.zeros_like(outi)
        ar, ai = xr[...], xi[...]
        br_r, br_i = brr[...], bri[...]
        bc_r, bc_i = bcr[...], bci[...]
        t_r = ar * br_r - ai * br_i
        t_i = ar * br_i + ai * br_r
        pr = t_r * bc_r - t_i * bc_i
        pi = t_r * bc_i + t_i * bc_r
        outr[:Ny, :Nx] = pr
        outi[:Ny, :Nx] = pi

    out_shape = [jax.ShapeDtypeStruct((Ky, Kx), dtype),
                 jax.ShapeDtypeStruct((Ky, Kx), dtype)]
    return pl.pallas_call(
        body,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=pallas_interpret(),
    )(x_re, x_im,
      brow_re.reshape(Ny, 1), brow_im.reshape(Ny, 1),
      bcol_re.reshape(1, Nx), bcol_im.reshape(1, Nx))


def czt_postchirp(y_re, y_im, arow_re, arow_im, acol_re, acol_im,
                  yph_re, yph_im, xph_re, xph_im, sy, sx, My, Mx, norm):
    """Slice (sy:sy+My, sx:sx+Mx) and apply both output chirps + phases +
    norm in one fused pass.  Returns (re, im)."""
    dtype = y_re.dtype

    def body(yr, yi, arr_, ari, acr, aci, ypr, ypi, xpr, xpi, outr, outi):
        ar = yr[sy:sy + My, sx:sx + Mx]
        ai = yi[sy:sy + My, sx:sx + Mx]
        # combined per-row factor: arow * y_phase (complex)
        fr_r = arr_[...] * ypr[...] - ari[...] * ypi[...]
        fr_i = arr_[...] * ypi[...] + ari[...] * ypr[...]
        # combined per-col factor: acol * x_phase * norm
        fc_r = (acr[...] * xpr[...] - aci[...] * xpi[...]) * norm
        fc_i = (acr[...] * xpi[...] + aci[...] * xpr[...]) * norm
        t_r = ar * fr_r - ai * fr_i
        t_i = ar * fr_i + ai * fr_r
        outr[...] = t_r * fc_r - t_i * fc_i
        outi[...] = t_r * fc_i + t_i * fc_r

    out_shape = [jax.ShapeDtypeStruct((My, Mx), dtype),
                 jax.ShapeDtypeStruct((My, Mx), dtype)]
    return pl.pallas_call(
        body,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=pallas_interpret(),
    )(y_re, y_im,
      arow_re.reshape(My, 1), arow_im.reshape(My, 1),
      acol_re.reshape(1, Mx), acol_im.reshape(1, Mx),
      yph_re.reshape(My, 1), yph_im.reshape(My, 1),
      xph_re.reshape(1, Mx), xph_im.reshape(1, Mx))


def czt_pallas(plan, ary):
    """Apply a CZT plan with the chirp scaffolding fused in Pallas.

    Numerically identical (to fp rounding) to ``plan(ary)``; the FFT/IFFT
    pipeline stays on XLA's radix kernels.  2-D single-field input only
    (the jnp plan remains the batched path).
    """
    if ary.ndim != 2:
        raise ValueError('czt_pallas takes a single (Ny, Nx) field')
    ar = jnp.real(ary).astype(plan.brow_re.dtype)
    ai = jnp.imag(ary).astype(plan.brow_re.dtype)

    # fused input chirps + zero-pad for the FIRST axis conv; the second
    # axis pads inside the FFT call (jnp handles length-K FFTs natively)
    pr, pi = czt_prechirp_pad(
        ar, ai, plan.brow_re[:, 0], plan.brow_im[:, 0],
        plan.bcol_re, plan.bcol_im,
        plan.Ny if plan.x_first else plan.Ky,
        plan.Kx if plan.x_first else plan.Nx)
    out = jax.lax.complex(pr, pi)

    sy, sx = plan.Ny - 1, plan.Nx - 1
    if plan.x_first:
        # conv over x: the operand is already padded to Kx
        out = jnp.fft.ifft(jnp.fft.fft(out, axis=-1) * plan.Hcol, axis=-1)
        out = out[..., sx:sx + plan.Mx]
        # conv over y (jnp pads to Ky inside the fft)
        out = jnp.fft.ifft(
            jnp.fft.fft(out, plan.Ky, axis=-2) * plan.Hrow, axis=-2)
        res = czt_postchirp(
            jnp.real(out), jnp.imag(out),
            plan.arow_re[:, 0], plan.arow_im[:, 0],
            plan.acol_re, plan.acol_im,
            plan.y_phase_re[:, 0], plan.y_phase_im[:, 0],
            plan.x_phase_re, plan.x_phase_im,
            sy, 0, plan.My, plan.Mx, plan.norm)
    else:
        out = jnp.fft.ifft(jnp.fft.fft(out, axis=-2) * plan.Hrow, axis=-2)
        out = out[..., sy:sy + plan.My, :]
        out = jnp.fft.ifft(
            jnp.fft.fft(out, plan.Kx, axis=-1) * plan.Hcol, axis=-1)
        res = czt_postchirp(
            jnp.real(out), jnp.imag(out),
            plan.arow_re[:, 0], plan.arow_im[:, 0],
            plan.acol_re, plan.acol_im,
            plan.y_phase_re[:, 0], plan.y_phase_im[:, 0],
            plan.x_phase_re, plan.x_phase_im,
            0, sx, plan.My, plan.Mx, plan.norm)
    return jax.lax.complex(*res)


__all__ = ['czt_pallas', 'czt_prechirp_pad', 'czt_postchirp']
