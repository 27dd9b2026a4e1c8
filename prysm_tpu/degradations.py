"""Image-chain degradations: smear and jitter transfer functions.

Rebuild of ``prysm/degradations.py``.
"""
import jax.numpy as jnp

__all__ = ['jitter_ft', 'smear_ft']


def smear_ft(fx, fy, width, height):
    """Analytic Fourier transform of smear: separable sinc."""
    if width == 0 and height == 0:
        raise ValueError('one of width or height must be nonzero')
    out1 = jnp.sinc(fx * width) if width != 0 else 1
    out2 = jnp.sinc(fy * height) if height != 0 else 1
    return out1 * out2


def jitter_ft(fr, scale):
    """Analytic Fourier transform of Gaussian jitter."""
    core = jnp.pi * scale * fr
    return jnp.exp(-2 * core * core)
