"""Pallas TPU kernels for the hot computational ops.

The reference library has no native code (SURVEY.md §2.3): its performance
comes from NumPy/CuPy kernels behind a backend shim.  The TPU-native
equivalent of that obligation is hand-written Pallas kernels for the ops
where the cycles go:

* :mod:`~prysm_tpu.ops.mdft` — the matrix-DFT double matmul
  ``Ey @ a @ Ex.T`` (reference prysm/fttools.py:201-228), fused into a single
  kernel with 3-multiplication complex arithmetic on the MXU.
* :mod:`~prysm_tpu.ops.zernike` — Zernike/Jacobi weighted mode synthesis
  (reference prysm/polynomials/zernike.py:74-166 + fitting.py:7-38) without
  materializing the mode stack in HBM.
* :mod:`~prysm_tpu.ops.raster` — polygon SDF rasterization + antialias ramp
  (reference prysm/geometry.py:11-34,419-548) with vertices in SMEM, one
  VMEM pass per tile.

Every kernel has a jnp twin used for CPU/f64 oracle runs; dispatch is
controlled by :func:`set_pallas_mode` (``auto`` uses Pallas only on TPU).
"""
from .dispatch import set_pallas_mode, get_pallas_mode, pallas_enabled, pallas_interpret  # NOQA
from .mdft import mdft2, mdft2_adjoint, plan_mdft_pack  # NOQA
from .zernike import zernike_sum_pallas  # NOQA
from .raster import polygon_raster_pallas, circle_raster_pallas  # NOQA
from .noise import expose_pallas  # NOQA
