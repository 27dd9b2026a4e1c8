"""TPU-hardware correctness tier (VERDICT r4 item 2).

The main suite (tests/) runs f64 on a virtual CPU mesh; nothing there
asserts that the f32 execution on the real chip meets the tolerance
tiers ``tests/test_f32_tier.py`` measures on CPU.  This tier runs the
physics oracles, executor equivalences, adjoint inner products,
Pallas-vs-jnp kernel twins, gradient checks, and a raytrace against a
host-numpy f64 oracle — all on the hardware backend, at its native f32.

Run it standalone (ONE process; the axon relay serializes compiles and
a second concurrent TPU process hangs):

    timeout 900 python -m pytest tests_tpu/ -q

or through the driver entry that records the artifact:

    python bench.py --validate      # writes TPU_VALIDATE_r05.json

Device->host rules through the relay (see .claude/skills/verify):
complex64 copies are UNIMPLEMENTED — tests fetch real f32 arrays or
split complex scalars into float(real)/float(imag); eager complex
device arrays are never created (real/imag legs + lax.complex inside
jit, as the library's plans do).
"""
import numpy as np
import pytest

import jax


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'tpu: runs on the real TPU chip at f32')


@pytest.fixture(scope='session', autouse=True)
def require_hardware():
    import os
    plat = jax.devices()[0].platform
    if plat == 'cpu' and not os.environ.get('PRYSM_TPU_TIER_ALLOW_CPU'):
        pytest.skip('TPU tier requires the hardware backend '
                    f'(got {plat!r}); run without JAX_PLATFORMS=cpu, or '
                    'set PRYSM_TPU_TIER_ALLOW_CPU=1 to shake out logic '
                    'on the CPU backend (not a hardware witness)',
                    allow_module_level=True)
    return plat


def cvdot(a_re, a_im, b_re, b_im):
    """<a, b> of complex pairs as (re, im) f32 scalars (relay-safe)."""
    import jax.numpy as jnp
    re = jnp.sum(a_re * b_re + a_im * b_im)
    im = jnp.sum(a_re * b_im - a_im * b_re)
    return re, im


@pytest.fixture(scope='session')
def pupil256():
    """(x, y, r, t, amp, dx) for a 256^2 anti-aliased circular pupil."""
    import jax.numpy as jnp
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.geometry import circle_sdf, antialias
    x, y = make_xy_grid(256, diameter=2.2)
    dx = 2.2 / 256
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(1.0, r), dx)
    jax.block_until_ready(amp)
    return x, y, r, t, amp, dx
