"""Pallas TPU kernels for the hot computational ops.

The reference library has no native code (SURVEY.md 2.3): its performance
comes from NumPy/CuPy kernels behind a backend shim.  The TPU-native
equivalent of that obligation is hand-written Pallas kernels — but ONLY
where they beat the compiler.  Round-3 on-chip measurements with honest
execution timing (tools/kernel_bench.py, chained-slope-fetch) settled
which do:

* :mod:`~prysm_tpu.ops.zernike` — Zernike/Jacobi weighted mode synthesis
  (reference prysm/polynomials/zernike.py:74-166 + fitting.py:7-38)
  without materializing the mode stack in HBM.  WINS: 1.44x (512^2) /
  1.76x (1024^2) over the XLA path even with the jnp synthesis hoisted
  out of optimization loops.  Wired into ``polynomials.zernike_sum``.
* :mod:`~prysm_tpu.ops.noise` — the full detector noise chain on the TPU
  hardware PRNG (``Detector.expose_fused``), one VMEM pass per tile.

Kernels that LOST to XLA under honest timing were deleted in round 3
rather than carried as trophies: the fused matrix-DFT matmul (XLA's plan
won through fwd+bwd), the CZT chirp scaffolding (0.95-0.97x: XLA already
fuses the elementwise stages into its FFTs), and the SDF rasterizers
(0.32-0.78x: XLA fuses elementwise SDF chains at bandwidth).  The
measurement, not the existence, of a kernel is the deliverable; see
docs/how-tos/tpu-and-scaling.md.

Every kernel has a jnp twin used for CPU/f64 oracle runs; dispatch is
controlled by :func:`set_pallas_mode` (``auto`` uses Pallas only on TPU).
"""
from .dispatch import set_pallas_mode, get_pallas_mode, pallas_enabled, pallas_interpret  # NOQA
from .zernike import zernike_sum_pallas  # NOQA
from .noise import expose_pallas  # NOQA
