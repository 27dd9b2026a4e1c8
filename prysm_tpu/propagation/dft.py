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
    if not isinstance(pupil_samples, Iterable):
        pupil_samples = (pupil_samples, pupil_samples)
    if not isinstance(focal_samples, Iterable):
        focal_samples = (focal_samples, focal_samples)
    pny, pnx = pupil_samples
    fny, fnx = focal_samples
    fsx, fsy = focal_shift
    x = _host_fftrange(pnx) * pupil_dx
    y = _host_fftrange(pny) * pupil_dx
    inv_lz = 1.0 / (wavelength * efl)
    fx = (_host_fftrange(fnx) * focal_dx + fsx) * inv_lz
    fy = (_host_fftrange(fny) * focal_dx + fsy) * inv_lz
    return x, y, fx, fy


_PLANNERS = {'mdft': plan_mdft, 'czt': plan_czt, 'fftdft': plan_fftdft}


def prepare_executor(pupil_dx, pupil_samples, focal_dx, focal_samples,
                     wavelength, efl, focal_shift=(0, 0), kind='mdft',
                     dtype=None):
    """Build a reusable MDFT/CZT/FFTDFT pupil <-> focal plan.

    The plan is in the focus orientation: plan(pupil) -> focal data,
    plan.adjoint(focal) -> pupil data.  pupil_dx/focal_dx are stashed on the
    plan as static metadata for callers that label outputs.
    """
    x, y, fx, fy = coordinates_for_focus(
        pupil_dx, pupil_samples, focal_dx, focal_samples,
        wavelength, efl, focal_shift)
    norm = (pupil_dx * focal_dx) / (wavelength * efl)
    try:
        planner = _PLANNERS[kind]
    except KeyError:
        raise ValueError(f"kind must be 'mdft', 'czt', or 'fftdft', got {kind!r}")
    return planner(x, y, fx, fy, sign=-1, norm=norm, dtype=dtype,
                   pupil_dx=pupil_dx, focal_dx=focal_dx)


def unit_cell_focal_grid(pupil_dx, pupil_diameter, wavelength, efl, Q=2):
    """(focal_dx, focal_samples) spanning the full DFT unit cell.

    A matrix-DFT round trip is unitary only when the focal window spans
    wavelength * efl / pupil_dx (reference: prysm/propagation/dft.py:120-152).
    """
    focal_samples = math.ceil(Q * pupil_diameter / pupil_dx)
    focal_dx = wavelength * efl / pupil_dx / focal_samples
    return focal_dx, focal_samples


def _smootherstep(t):
    """C2 smoothstep 6t^5 - 15t^4 + 10t^3, clipped to [0, 1]."""
    t = np.clip(t, 0, 1)
    return t * t * t * (t * (t * 6 - 15) + 10)


def _cumulative_window(r, a, b):
    """Radial taper: 1 for r < a, 0 for r > b, C2 transition between."""
    return 1 - _smootherstep((r - a) / (b - a))


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
    inner, outer = window

    executors = []
    xfs = []
    yfs = []
    radii = []
    halves = []
    for k in range(num_levels):
        nf = focal_samples if k == 0 else fine_samples
        if not isinstance(nf, Iterable):
            nf = (nf, nf)
        nfy, nfx = nf
        fdx = focal_dx / scaling ** k
        shift = fdx / 2.0  # half-pixel: keep the singular origin off-grid
        ex = prepare_executor(pupil_dx, pupil_samples, fdx, nf,
                              wavelength, efl, focal_shift=(shift, shift),
                              kind=kind, dtype=dtype)
        xline = _host_fftrange(nfx) * fdx + shift
        yline = _host_fftrange(nfy) * fdx + shift
        xf, yf = np.meshgrid(xline, yline)
        executors.append(ex)
        xfs.append(xf)
        yfs.append(yf)
        radii.append(np.hypot(xf, yf))
        halves.append(min(nfy, nfx) / 2.0 * fdx)

    windows = []
    for k in range(num_levels):
        r = radii[k]
        here = 1.0 if k == 0 else _cumulative_window(r, inner * halves[k], outer * halves[k])
        nxt = 0.0 if k == num_levels - 1 else _cumulative_window(r, inner * halves[k + 1], outer * halves[k + 1])
        windows.append(np.asarray(here - nxt))

    return MultiResolutionExecutor(
        executors=tuple(executors),
        windows=tuple(np.asarray(w) for w in windows),
        xf=tuple(np.asarray(a) for a in xfs),
        yf=tuple(np.asarray(a) for a in yfs),
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
