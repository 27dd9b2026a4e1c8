"""prysm_tpu: a TPU-native physical-optics framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of prysm
(brandondube/prysm): pupil-plane wavefront synthesis, Fourier-domain
propagation, PSF/MTF/image-chain simulation, interferometric analysis, and
experimental subsystems — designed for jit/vmap/shard_map execution on TPU
meshes rather than translated from the reference's NumPy idioms.
"""
from .conf import config  # NOQA
