"""Refractive index models (reference: prysm/refractive.py)."""
import jax.numpy as jnp


def cauchy(wvl, A, *args):
    """Cauchy's equation: n = A + B/wvl^2 + C/wvl^4 + ..."""
    seed = A
    for idx, arg in enumerate(args):
        power = 2 * idx + 2
        seed = seed + arg / jnp.power(wvl, power)
    return seed


def sellmeier(wvl, A, B):
    """Sellmeier equation: n^2 = 1 + sum a wvl^2 / (wvl^2 - b)."""
    wvlsq = jnp.square(wvl)
    seed = wvlsq * 0 + 1.0
    for a, b in zip(A, B):
        seed = seed + (a * wvlsq) / (wvlsq - b)
    return jnp.sqrt(seed)


def internal_transmission(t, k, wvl):
    """Internal transmission of a glass slab of thickness t (mm), wvl nm."""
    wvl = wvl / 1e3
    return jnp.exp(-4 * jnp.pi * k * t / wvl)
