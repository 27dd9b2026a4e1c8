"""Matrix-DFT / chirp-Z pupil <-> focal propagation with arbitrary sampling.

Rebuild of ``prysm/propagation/dft.py``.  ``prepare_executor`` builds a
pytree transform plan (see prysm_tpu.fttools) with the optical normalization
``pupil_dx * focal_dx / (wavelength * efl)`` baked in; the multi-resolution
stack carries per-level plans, partition-of-unity windows, and focal grids
as parallel tuples — levels are independent until the final sum, which is
the natural shard axis for a mesh (`psum` of per-level contributions).
"""
import math
import dataclasses
from collections.abc import Iterable

import numpy as np
import jax
import jax.numpy as jnp

from ..fttools import (  # NOQA: F401 - MDFT/CZT/FFTDFT importable from here as in the reference (propagation/dft.py imports)
    MDFT,
    CZT,
    FFTDFT,
    fftrange,
    _host_fftrange,
    plan_mdft,
    plan_czt,
    plan_fftdft,
)


def coordinates_for_focus(pupil_dx, pupil_samples, focal_dx, focal_samples,
                          wavelength, efl, focal_shift=(0, 0)):
    """Coordinate / frequency vectors for an MDFT pupil <-> focal propagation.

    Fraunhofer kernel exp(-2i pi x_pupil . x_focal / (lambda efl)); returns
    host-side numpy (x, y, fx, fy) with fx = x_focal / (lambda * efl).
    Units: pupil mm, focal um, wavelength um, efl mm
    (reference: prysm/propagation/dft.py:12-66).
    """
    pny, pnx = _as_pair(pupil_samples)
    fny, fnx = _as_pair(focal_samples)
    fsx, fsy = focal_shift
    x = _host_fftrange(pnx) * pupil_dx
    y = _host_fftrange(pny) * pupil_dx
    inv_lz = 1.0 / (wavelength * efl)
    fx = (_host_fftrange(fnx) * focal_dx + fsx) * inv_lz
    fy = (_host_fftrange(fny) * focal_dx + fsy) * inv_lz
    return x, y, fx, fy


_PLANNERS = {'mdft': plan_mdft, 'czt': plan_czt, 'fftdft': plan_fftdft}


def _as_pair(n):
    """(ny, nx) from a scalar-or-pair sample count."""
    return tuple(n) if isinstance(n, Iterable) else (n, n)


def prepare_executor(pupil_dx, pupil_samples, focal_dx, focal_samples,
                     wavelength, efl, focal_shift=(0, 0), kind='mdft',
                     dtype=None, matmul_precision=None):
    """Build a reusable MDFT/CZT/FFTDFT pupil <-> focal plan.

    The plan is in the focus orientation: plan(pupil) -> focal data,
    plan.adjoint(focal) -> pupil data.  pupil_dx/focal_dx are stashed on the
    plan as static metadata for callers that label outputs.
    matmul_precision applies to the MDFT kind only (MXU pass count; see
    fttools.MDFT.matmul_precision): None keeps the bit-stable default.
    """
    x, y, fx, fy = coordinates_for_focus(
        pupil_dx, pupil_samples, focal_dx, focal_samples,
        wavelength, efl, focal_shift)
    norm = (pupil_dx * focal_dx) / (wavelength * efl)
    try:
        planner = _PLANNERS[kind]
    except KeyError:
        raise ValueError(f"kind must be 'mdft', 'czt', or 'fftdft', got {kind!r}")
    kwargs = {}
    if kind == 'mdft' and matmul_precision is not None:
        kwargs['matmul_precision'] = matmul_precision
    return planner(x, y, fx, fy, sign=-1, norm=norm, dtype=dtype,
                   pupil_dx=pupil_dx, focal_dx=focal_dx, **kwargs)


def unit_cell_focal_grid(pupil_dx, pupil_diameter, wavelength, efl, Q=2):
    """(focal_dx, focal_samples) spanning the full DFT unit cell.

    A matrix-DFT round trip is unitary only when the focal window spans
    wavelength * efl / pupil_dx (reference: prysm/propagation/dft.py:120-152).
    """
    nsamp = math.ceil(Q * pupil_diameter / pupil_dx)
    return wavelength * efl / (pupil_dx * nsamp), nsamp


def _smootherstep(t):
    """C2 smoothstep 6t^5 - 15t^4 + 10t^3, clipped to [0, 1]."""
    t = np.clip(t, 0, 1)
    return t ** 3 * (10 + t * (6 * t - 15))


def _cumulative_window(r, a, b):
    """Radial taper: 1 for r < a, 0 for r > b, C2 transition between."""
    frac = (r - a) / (b - a)
    return 1 - _smootherstep(frac)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultiResolutionExecutor:
    """A stack of arbitrary-sampling plans plus partition-of-unity windows.

    Per-level pupil -> focal plans (coarsest first), real hand-off windows
    summing to one over the focal plane, and focal-plane coordinate
    meshgrids for evaluating mask callables.  Levels are independent until
    the final sum (reference: prysm/propagation/dft.py:170-294).

    windows/xf/yf are *host* (numpy) arrays: they are static geometry, so
    inside a trace they fold to constants, and plan-time mask evaluation
    (stack_multiresolution) stays on the host -- no eager complex device
    arrays (the axon relay does not move those reliably).
    """

    executors: tuple
    windows: tuple   # of numpy arrays (static geometry)
    xf: tuple        # of numpy arrays
    yf: tuple        # of numpy arrays

    def __len__(self):
        """Number of resolution levels."""
        return len(self.executors)


def prepare_multiresolution(pupil_dx, pupil_samples, focal_dx, focal_samples,
                            wavelength, efl, num_levels, scaling=4.0,
                            fine_samples=None, window=(0.2, 0.7), kind='mdft',
                            dtype=None):
    """Build a MultiResolutionExecutor for focal-plane-mask propagation.

    Every level's focal grid is shifted by half a sample in x and y so a
    mask singularity at the origin is never sampled exactly; windows are
    computed host-side (they depend only on static geometry) and shipped to
    device once.
    """
    if fine_samples is None:
        fine_samples = focal_samples

    coarse_ny_nx = _as_pair(focal_samples)
    fine_ny_nx = _as_pair(fine_samples)

    def _level(k):
        """Plan + host-side focal geometry for pyramid level k (0=coarsest)."""
        ny, nx = coarse_ny_nx if k == 0 else fine_ny_nx
        step = focal_dx / scaling ** k
        # every focal grid is offset by half a sample so a mask singularity
        # at the origin always falls between samples, at every zoom level
        off = 0.5 * step
        plan = prepare_executor(pupil_dx, pupil_samples, step, (ny, nx),
                                wavelength, efl, focal_shift=(off, off),
                                kind=kind, dtype=dtype)
        gx, gy = np.meshgrid(_host_fftrange(nx) * step + off,
                             _host_fftrange(ny) * step + off)
        # the half-extent of this level's grid sets where its hand-off
        # taper to the next-coarser level lives
        return plan, gx, gy, 0.5 * step * min(ny, nx)

    plans, gxs, gys, extents = zip(*(_level(k) for k in range(num_levels)))
    inner, outer = window

    def _taper(k, j):
        """Hand-off taper owned by level j, sampled on level k's grid."""
        r = np.hypot(gxs[k], gys[k])
        return _cumulative_window(r, inner * extents[j], outer * extents[j])

    # level k keeps the annulus between its own taper and the next-finer
    # level's taper; the coarsest reaches outward forever and the finest
    # covers the origin, so the stack sums to one everywhere
    wins = []
    for k in range(num_levels):
        w = np.ones_like(gxs[k]) if k == 0 else _taper(k, k)
        if k + 1 < num_levels:
            w = w - _taper(k, k + 1)
        wins.append(np.asarray(w))

    return MultiResolutionExecutor(
        executors=tuple(plans),
        windows=tuple(wins),
        xf=tuple(np.asarray(g) for g in gxs),
        yf=tuple(np.asarray(g) for g in gys),
    )


def focus_dft(wavefunction, executor):
    """Pupil -> focal propagation via a precomputed plan."""
    return executor(wavefunction)


def focus_dft_adjoint(wavefunction, executor):
    """Adjoint of focus_dft."""
    return executor.adjoint(wavefunction)


def unfocus_dft(wavefunction, executor):
    """Focal -> pupil propagation via a precomputed plan (its adjoint)."""
    return executor.adjoint(wavefunction)


def unfocus_dft_adjoint(wavefunction, executor):
    """Adjoint of unfocus_dft."""
    return executor(wavefunction)
