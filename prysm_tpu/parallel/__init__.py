"""Multi-chip parallelism: mesh construction and sharded propagation.

The reference library is single-process/single-device by construction
(SURVEY 2.3); this package is new work.  The natural parallel axes of
physical-optics modeling are wavelengths, field points, focal-plane tiles,
and polynomial mode batches; they map onto ``jax.sharding.Mesh`` axes with
XLA collectives over ICI.
"""
from .mesh import make_mesh, make_hybrid_mesh, mesh_axes  # NOQA
from .broadband import (  # NOQA
    SpectralMDFT, plan_mdft_spectral, spectral_focus, spectral_unfocus,
    spectral_babinet,
)
from .sharding import (  # NOQA
    shard_broadband_step, broadband_psf,
)
from .coronagraph import (  # NOQA
    StackedMultiRes, stack_multiresolution, multires_roundtrip,
    shard_multires_roundtrip, shard_multires_babinet,
)
from .mdft_contraction import (  # NOQA
    shard_mdft_contraction, shard_mdft_contraction_roundtrip,
)
from .raytrace import (  # NOQA
    shard_wavefront_fit, shard_merged_trace_rate,
)
