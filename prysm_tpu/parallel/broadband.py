"""Broadband (polychromatic) propagation: wavelength-stacked MDFT plans.

The reference's Wavefront is single-wavelength per call
(prysm/propagation/wavefront.py:44-51); a polychromatic model loops in
Python.  Here the wavelength axis is a leading array axis end to end: the
matrix-DFT basis matrices for all wavelengths are stacked into (W, M, N)
arrays built host-side, the apply is one batched complex matmul pair (MXU
work), and the wavelength axis shards over a mesh with zero code change
(the arrays are ordinary pytree leaves).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..conf import config
from ..fttools import _host_fftrange


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpectralMDFT:
    """Wavelength-stacked matrix-DFT plan.

    Ex: (W, Mx, Nx), Ey: (W, My, Ny) complex; norm: (W, 1, 1) real.
    Applying maps (W, Ny, Nx) fields -> (W, My, Mx) fields, one wavelength
    per leading index.  All leaves are arrays, so the W axis shards.
    Leaves are real/imag pairs; the complex bases are assembled by
    ``lax.complex`` at trace time (complex arrays never cross a jit
    boundary -- see fttools.MDFT).
    """

    Ex_re: jax.Array
    Ex_im: jax.Array
    Ey_re: jax.Array
    Ey_im: jax.Array
    norm: jax.Array

    @property
    def Ex(self):
        """Complex x bases (W, Mx, Nx); assembled at trace time."""
        return jax.lax.complex(self.Ex_re, self.Ex_im)

    @property
    def Ey(self):
        """Complex y bases (W, My, Ny); assembled at trace time."""
        return jax.lax.complex(self.Ey_re, self.Ey_im)
    pupil_dx: float = dataclasses.field(metadata=dict(static=True), default=None)
    focal_dx: float = dataclasses.field(metadata=dict(static=True), default=None)

    def __call__(self, fields):
        """(..., W, Ny, Nx) -> (..., W, My, Mx)."""
        Ex = self.Ex
        Ey = self.Ey
        fields = fields.astype(Ex.dtype)
        out = jnp.matmul(Ey, fields)
        out = jnp.matmul(out, jnp.swapaxes(Ex, -1, -2))
        return out * self.norm

    def adjoint(self, grads):
        """Adjoint (conjugate transpose per wavelength)."""
        Ex = self.Ex
        Ey = self.Ey
        grads = grads.astype(Ex.dtype)
        out = jnp.matmul(jnp.swapaxes(Ey, -1, -2).conj(), grads)
        out = jnp.matmul(out, Ex.conj())
        return out * self.norm

    def nbytes(self):
        """Total size of the stacked basis matrices, bytes."""
        return 2 * (self.Ex_re.nbytes + self.Ey_re.nbytes)


def plan_mdft_spectral(pupil_dx, pupil_samples, focal_dx, focal_samples,
                       wavelengths, efl, focal_shift=(0, 0), dtype=None):
    """Build a SpectralMDFT for a set of wavelengths sharing one focal grid.

    The focal grid (focal_dx, focal_samples) is identical across
    wavelengths — the hard part of broadband coronagraphy — so each
    wavelength's spatial frequencies (and hence basis matrices) differ by
    the 1/(wavelength * efl) factor.  The optical norm
    pupil_dx * focal_dx / (wavelength * efl) is baked in per wavelength.
    """
    if dtype is None:
        dtype = config.precision_complex
    if not hasattr(pupil_samples, '__len__'):
        pupil_samples = (pupil_samples, pupil_samples)
    if not hasattr(focal_samples, '__len__'):
        focal_samples = (focal_samples, focal_samples)
    pny, pnx = pupil_samples
    fny, fnx = focal_samples
    fsx, fsy = focal_shift
    wavelengths = np.asarray(wavelengths, dtype=np.float64)

    x = _host_fftrange(pnx) * pupil_dx
    y = _host_fftrange(pny) * pupil_dx
    xf = _host_fftrange(fnx) * focal_dx + fsx
    yf = _host_fftrange(fny) * focal_dx + fsy

    Exs = []
    Eys = []
    norms = []
    for wvl in wavelengths:
        inv_lz = 1.0 / (wvl * efl)
        fx = xf * inv_lz
        fy = yf * inv_lz
        prefix = -2j * np.pi
        Exs.append(np.exp(prefix * np.outer(fx, x)))
        Eys.append(np.exp(prefix * np.outer(fy, y)))
        norms.append(pupil_dx * focal_dx * inv_lz)
    rdtype = np.empty(0, dtype=np.dtype(dtype)).real.dtype
    Ex = np.stack(Exs)
    Ey = np.stack(Eys)
    return SpectralMDFT(
        Ex_re=jnp.asarray(Ex.real, dtype=rdtype),
        Ex_im=jnp.asarray(Ex.imag, dtype=rdtype),
        Ey_re=jnp.asarray(Ey.real, dtype=rdtype),
        Ey_im=jnp.asarray(Ey.imag, dtype=rdtype),
        norm=jnp.asarray(np.asarray(norms)[:, None, None], dtype=rdtype),
        pupil_dx=pupil_dx, focal_dx=focal_dx,
    )


def spectral_focus(fields, plan):
    """Pupil -> focal for a (W, Ny, Nx) stack of per-wavelength fields."""
    return plan(fields)


def spectral_unfocus(fields, plan):
    """Focal -> pupil for a (W, My, Mx) stack (per-wavelength adjoint)."""
    return plan.adjoint(fields)


def spectral_babinet(fields, lyot, fpm, plan):
    """Babinet Lyot coronagraph for a (W, Ny, Nx) stack in two batched MDFTs.

    The per-wavelength loop over ``propagation.coronagraph.babinet``
    compiles W separate matmul chains; here the whole spectral stack
    rides two batched (W, My, Ny) x (W, Ny, Nx) contractions, which the
    MXU executes at far better utilization.  Semantics match the serial
    loop exactly: fpm (broadcast (My, Mx) or per-wavelength (W, My, Mx))
    is complemented to 1 - fpm, the round trip is subtracted from the
    incident field, and the lyot stop multiplies last.
    """
    at_fpm = plan(fields)
    removed = plan.adjoint(at_fpm * (1 - fpm))
    field_at_lyot = fields - removed
    return field_at_lyot if lyot is None else lyot * field_at_lyot
