"""Distributed FFT focus/unfocus: pupils sharded over mesh rows.

The single-chip ``focus`` (prysm_tpu/propagation/fft.py, mirroring
reference ``prysm/propagation/fft.py:7-48``) is the ortho-normalized
shift sandwich ``fftshift(fft2(ifftshift(pad(E))))``.  For pupils beyond
one chip's HBM the row axis shards over the mesh, and the sandwich is
re-expressed so the only communication is two all-to-all transposes:

for even N, ``fftshift(fft(ifftshift(x)))[j] = s * (-1)^j *
FFT[(-1)^m x[m]][j]`` with ``s = (-1)^(N/2)`` — the shifts become
*local* checkerboard sign multiplies, which matters because a literal
``roll`` of a sharded axis is a collective permute per shift.

Pipeline per device (rows sharded, d devices):

1. pad + checkerboard along the (fully local) column axis, column FFT;
2. ``all_to_all`` transpose -> full columns local;
3. pad + checkerboard along rows, row FFT, row output signs;
4. ``all_to_all`` back -> rows sharded again; column output signs + norm.

``jax.grad`` flows through ``shard_map``: the transpose of an
all-to-all is the opposite all-to-all, so the backward pass is the same
communication volume as forward.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..fttools import _pad_split


def _axis_size(mesh, axis):
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if axis not in sizes:
        raise ValueError(
            f'mesh has axes {sorted(sizes)}; no axis named {axis!r}')
    return sizes[axis]


def _checkerboard(n, dtype):
    """(-1)^index along one axis, as a host-built constant."""
    return np.where(np.arange(n) % 2 == 0, 1.0, -1.0).astype(dtype)


def _axis_sign(n):
    """The global sign s = (-1)^(n/2) of the centered-FFT identity."""
    if n % 2:
        raise ValueError(
            f'distributed centered FFTs need even sizes, got {n}')
    return 1.0 if (n // 2) % 2 == 0 else -1.0


def _padded(n, Q):
    return int(math.ceil(n * Q))


def _pad_axis(block, axis, target):
    """FFT-aligned symmetric pad of one axis (same split as pad2d)."""
    n = block.shape[axis]
    if n == target:
        return block
    pads = [(0, 0)] * block.ndim
    pads[axis] = _pad_split(target - n)
    return jnp.pad(block, pads)


def plan_distributed_focus(mesh, shape, Q, *, axis='fy', inverse=False,
                           dtype=np.float32):
    """Build a jitted sharded focus (or unfocus) over ``mesh``.

    Parameters
    ----------
    mesh : jax.sharding.Mesh
        the device mesh; ``axis`` names the dimension the pupil's row
        axis shards over.
    shape : (int, int)
        unpadded logical pupil shape (Ny, Nx), both even; Ny must divide
        by the mesh axis size, as must the padded sizes.
    Q : float
        padding factor, as in ``focus``.
    inverse : bool
        build ``unfocus`` (inverse centered transform) instead.
    dtype : numpy dtype
        real dtype of the sign vectors (match the field's real dtype).

    Returns
    -------
    callable
        ``apply(E)`` taking the full logical (Ny, Nx) complex pupil
        (sharded on entry via the in_spec) and returning the padded
        (QNy, QNx) focal field, rows sharded over ``axis``.  Matches
        ``propagation.fft.focus(E, Q)`` / ``unfocus`` bitwise-close.
    """
    d = _axis_size(mesh, axis)
    Ny, Nx = shape
    My, Mx = _padded(Ny, Q), _padded(Nx, Q)
    for n, label in ((Ny, 'Ny'), (My, 'padded Ny'), (Mx, 'padded Nx')):
        if n % d:
            raise ValueError(
                f'{label}={n} does not divide over {d} devices on '
                f'axis {axis!r}')
    # per-axis centered-FFT ingredients, built host-side
    col_in = _checkerboard(Mx, dtype)
    col_out = _checkerboard(Mx, dtype) * _axis_sign(Mx)
    row_in = _checkerboard(My, dtype)
    row_out = _checkerboard(My, dtype) * _axis_sign(My)
    # ortho normalization with host floats (no eager reduce_prod on device)
    norm = 1.0 / math.sqrt(My * Mx) if not inverse else math.sqrt(My * Mx)
    fft = jnp.fft.ifft if inverse else jnp.fft.fft

    def local(E_rows):
        # E_rows: (Ny/d, Nx) local block; columns fully local
        a = _pad_axis(E_rows, 1, Mx)
        a = fft(a * col_in[None, :], axis=1)
        # transpose: full columns local, rows split -> (Ny, Mx/d)
        a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=0,
                               tiled=True)
        a = _pad_axis(a, 0, My)
        a = fft(a * row_in[:, None], axis=0) * row_out[:, None]
        # transpose back: rows sharded again -> (My/d, Mx)
        a = jax.lax.all_to_all(a, axis, split_axis=0, concat_axis=1,
                               tiled=True)
        return a * col_out[None, :] * norm

    mapped = shard_map(local, mesh=mesh,
                       in_specs=P(axis, None), out_specs=P(axis, None))
    return jax.jit(mapped)


def plan_distributed_unfocus(mesh, shape, Q, *, axis='fy',
                             dtype=np.float32):
    """Sharded ``unfocus`` (inverse centered transform); see
    :func:`plan_distributed_focus`."""
    return plan_distributed_focus(mesh, shape, Q, axis=axis, inverse=True,
                                  dtype=dtype)


def shard_focus_grad_step(mesh, shape, Q, *, axis='fy', dtype=np.float32):
    """Jitted sharded PSF data-consistency step through the focus FFT.

    loss(E) = sum((|focus(E)|^2 - I_meas)^2) with E and I_meas rows
    sharded; returns step(E_re, E_im, I_meas) -> (loss, (dE_re, dE_im)).
    The field ships as separate real/imag planes so callers never build
    an eager complex device array (axon relay constraint).
    """
    focus_fn = plan_distributed_focus(mesh, shape, Q, axis=axis,
                                      dtype=dtype)

    def loss(E_re, E_im, I_meas):
        E = jax.lax.complex(E_re, E_im)
        F = focus_fn(E)
        I = F.real * F.real + F.imag * F.imag
        resid = I - I_meas
        return jnp.sum(resid * resid)

    return jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))


__all__ = ['plan_distributed_focus', 'plan_distributed_unfocus',
           'shard_focus_grad_step']
