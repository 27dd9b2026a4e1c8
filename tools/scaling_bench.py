"""Weak-scaling efficiency of the sharded broadband step over a mesh.

BASELINE.json targets >= 80% multi-host scaling efficiency.  Real
multi-chip hardware is not reachable from this container (one v5e via
the axon relay), so this harness measures the *path*: the same
shard_map program over 1, 2, 4, 8 devices with the problem scaled
proportionally (weak scaling — W wavelengths per device held fixed).

On virtual CPU devices the absolute numbers mean nothing (all "chips"
share one host's cores), but the harness is exactly what runs on a pod
slice: point JAX at real devices and the efficiency column becomes the
BASELINE metric.  Usage:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py [N] [W_per_device]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(N=256, w_per_device=2, fN=128):
    import jax
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        # sitecustomize pre-initializes the axon platform; the env var is
        # read too late, force it through the config (see conftest.py)
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.geometry import circle_sdf, antialias
    from prysm_tpu.polynomials import zernike_nm_seq
    from prysm_tpu.parallel import (make_mesh, plan_mdft_spectral,
                                    shard_broadband_step)
    from prysm_tpu.parallel.sharding import broadband_psf

    n_avail = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8) if d <= n_avail]

    x, y = make_xy_grid(N, diameter=2.2)
    dx = float(x[0, 1] - x[0, 0])
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(1.0, r), dx)
    nms = [(2, 0), (2, 2), (3, 1), (4, 0)]
    modes = zernike_nm_seq(nms, r, t)
    coefs = jnp.asarray([5.0, -3.0, 2.0, 1.0])

    rows = []
    per_dev_rate_1 = None
    for d in sizes:
        W = w_per_device * d
        wavelengths = jnp.linspace(0.5, 0.6, W)
        weights = jnp.ones(W) / W
        plan = plan_mdft_spectral(dx, (N, N), 0.4, fN,
                                  np.asarray(wavelengths), 10.0)
        I_meas = broadband_psf(coefs * 0.5, amp, modes, wavelengths,
                               weights, plan)
        mesh = make_mesh({'wl': d, 'ty': 1}, devices=jax.devices()[:d])
        step = shard_broadband_step(mesh, plan, amp, modes, wavelengths,
                                    weights, I_meas)
        out = step(coefs)
        jax.block_until_ready(out)
        iters = 20
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step(coefs)
            jax.block_until_ready(out)
            samples.append((time.perf_counter() - t0) / iters)
        sec = float(np.median(samples))
        rate = W / sec                      # wavelengths rendered per second
        per_dev = rate / d
        if per_dev_rate_1 is None:
            per_dev_rate_1 = per_dev
        rows.append({
            'devices': d, 'wavelengths': W,
            'step_ms': round(sec * 1e3, 3),
            'wl_per_s': round(rate, 2),
            'weak_scaling_efficiency': round(per_dev / per_dev_rate_1, 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({'platform': jax.devices()[0].platform,
                      'note': ('efficiency is meaningful on real chips; '
                               'virtual CPU devices share one host'),
                      'rows': rows}))


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
