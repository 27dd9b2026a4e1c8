"""Sharded broadband propagation and phase-retrieval steps over a mesh.

Mesh axes used here (the natural parallel axes of the domain, SURVEY 2.3):

* ``wl``  — wavelength (data-parallel-like): per-wavelength pupils and DFT
  bases shard on their leading W axis; the incoherent sum over wavelengths
  is a ``psum`` riding ICI.
* ``ty`` — focal-plane row tiles (tensor-parallel-like): the MDFT's Ey
  basis shards over output rows, so every chip computes a horizontal strip
  of the focal plane; the loss reduction is the only collective.

``jax.grad`` differentiates straight through ``shard_map``: the transpose
of the wavelength ``psum`` is the broadcast of the image-plane cotangent,
and the coefficient gradient comes back as a ``psum`` over both axes —
the all-reduce that the reference's ``sum_of_2d_modes_adjoint`` performs
implicitly on one device (prysm/polynomials/fitting.py:40-57).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..mathops import cis
from .broadband import SpectralMDFT


def _abs2(E):
    return E.real * E.real + E.imag * E.imag


def broadband_psf(coefs, amp, modes, wavelengths, weights, plan):
    """Weighted incoherent broadband PSF from shared mode coefficients.

    coefs (K,), amp (Ny, Nx), modes (K, Ny, Nx), wavelengths (W,) um,
    weights (W,), plan SpectralMDFT -> (My, Mx) broadband intensity.
    Pure function; works unsharded or inside shard_map.
    """
    opd = jnp.tensordot(coefs, modes, axes=(0, 0))          # (Ny, Nx), nm
    scale = 2 * jnp.pi / (wavelengths * 1e3)                # (W,) rad/nm
    phase = scale[:, None, None] * opd[None]                # (W, Ny, Nx)
    fields = amp[None] * cis(phase)
    E = plan(fields)                                        # (W, My, Mx)
    return jnp.tensordot(weights, _abs2(E), axes=(0, 0))    # (My, Mx)


def shard_broadband_step(mesh, plan, amp, modes, wavelengths, weights, I_meas,
                         wl_axis='wl', tile_axis='ty'):
    """Build a jitted, mesh-sharded broadband phase-retrieval step.

    Returns step(coefs) -> (loss, grad) with:
      - wavelengths/weights and the plan's W axis sharded over ``wl_axis``
      - the plan's Ey output-row axis and I_meas rows sharded over ``tile_axis``
      - coefs/amp/modes replicated

    The wavelength reduction is a psum inside the mapped function; the
    coefficient gradient psum is inserted by the shard_map transpose.
    """
    plan_specs = SpectralMDFT(
        Ex_re=P(wl_axis, None, None), Ex_im=P(wl_axis, None, None),
        Ey_re=P(wl_axis, tile_axis, None), Ey_im=P(wl_axis, tile_axis, None),
        norm=P(wl_axis, None, None),
        pupil_dx=plan.pupil_dx, focal_dx=plan.focal_dx,
    )

    def local_loss(coefs, amp, modes, wavelengths, weights, plan, I_meas):
        I_partial = broadband_psf(coefs, amp, modes, wavelengths, weights, plan)
        # sum the per-wavelength-shard partial intensities: the image is
        # nonlinear downstream, so reduce before the data term
        I_rows = jax.lax.psum(I_partial, wl_axis)           # (My_local, Mx)
        resid = I_rows - I_meas
        partial = jnp.sum(resid * resid)
        # replicated across wl (I_rows identical within a ty group after the
        # wavelength psum); the ty psum completes the full-image reduction
        return jax.lax.psum(partial, tile_axis)

    mapped = shard_map(
        local_loss, mesh=mesh,
        in_specs=(P(), P(), P(), P(wl_axis), P(wl_axis), plan_specs,
                  P(tile_axis, None)),
        out_specs=P(),
    )

    def loss_fn(coefs):
        return mapped(coefs, amp, modes, wavelengths, weights, plan, I_meas)

    return jax.jit(jax.value_and_grad(loss_fn))
