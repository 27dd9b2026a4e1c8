"""Fused detector-noise Pallas kernel (TPU hardware PRNG).

The reference noise chain (prysm/detector.py:83-141) is dark + fixed-pattern
scaling -> Poisson shot -> Gaussian read -> bias -> full-well clip -> gain ->
ADC clip/quantize.  The jnp path (prysm_tpu/detector.py) samples with
``jax.random`` — several HBM round trips per frame for the threefry bits,
the Poisson rejection loop, and the elementwise chain.  This kernel fuses
the entire chain into one VMEM pass per (frame, tile) using the TPU's
per-core hardware PRNG (``pltpu.prng_random_bits``):

* uniform bits -> Box–Muller Gaussians (two transcendentals per pair);
* shot noise via the Gaussian approximation of Poisson
  ``max(0, round(lam + sqrt(lam) z))`` — accurate for lam ≳ ~20 electrons
  (relative moment error < 1%), the regime of real detector exposures; use
  the jnp path (exact Poisson) for photon-starved scenes;
* read noise, bias, full-well clip, gain, and ADC clip in registers.

Output is f32 DN values after the ADC clip; integer casting and the
optional nonlinearity LUT happen outside (they fuse under XLA).

Different (frame, tile) cells seed the PRNG with distinct offsets, so all
cells are independent; the same ``seed`` reproduces the same exposure.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import pallas_interpret

_TILE = 256


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _uniform01(shape):
    """Uniform in (0, 1) from hardware random bits (24-bit mantissa)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # >> 8 keeps 24 bits (exact in f32, sign bit clear); Mosaic can't cast
    # uint32 -> f32, so bitcast the small value to int32 first
    bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return bits24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def _box_muller(shape):
    """Two independent standard Gaussians from hardware random bits."""
    u1 = _uniform01(shape)
    u2 = _uniform01(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = (2.0 * jnp.pi) * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _dn_chain(lam, z_shot, z_read, read_noise, bias, fwc, inv_gain, adc_cap):
    """Shared shot->DN chain: Gaussian-approx Poisson, read, bias, FWC,
    gain, ADC clip.  Used by both the Pallas kernel and the jnp twin so
    the algorithm under test is identical."""
    shot = jnp.maximum(jnp.round(lam + jnp.sqrt(lam) * z_shot), 0.0)
    val = shot + read_noise * z_read + bias
    val = jnp.minimum(val, fwc) * inv_gain
    return jnp.clip(val, 0.0, adc_cap)


def _expose_kernel(read_noise, bias, fwc, inv_gain, adc_cap,
                   seed_ref, mean_ref, out_ref):
    f = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    cell = (f * pl.num_programs(1) + i) * pl.num_programs(2) + j
    pltpu.prng_seed(seed_ref[0] + cell)

    lam = mean_ref[...]
    z_shot, z_read = _box_muller(lam.shape)
    out_ref[0] = _dn_chain(lam, z_shot, z_read, read_noise, bias, fwc,
                           inv_gain, adc_cap)


def expose_pallas(mean_electrons, frames, seed, read_noise, bias, fwc,
                  conversion_gain, bits):
    """Fused exposure: mean electron map -> (frames, *shape) f32 DN.

    mean_electrons: 2D mean electron count per pixel (signal*t + dark,
    fixed-pattern scalings already applied).  seed: int (same seed, same
    frames).  Returns float32 DN after the ADC clip; quantize/cast outside.
    """
    mean_electrons = jnp.asarray(mean_electrons, jnp.float32)
    if mean_electrons.ndim != 2:
        raise ValueError('expose_pallas requires a 2D mean electron map')
    if pallas_interpret() or jax.default_backend() not in ('tpu', 'axon'):
        # the interpreter has no TPU hardware PRNG; run the identical chain
        # with jax.random Gaussians (different bit stream, same algorithm)
        key = jax.random.fold_in(jax.random.PRNGKey(int(seed)), 0)
        k1, k2 = jax.random.split(key)
        shape = (frames, *mean_electrons.shape)
        z_shot = jax.random.normal(k1, shape, jnp.float32)
        z_read = jax.random.normal(k2, shape, jnp.float32)
        return _dn_chain(mean_electrons[None], z_shot, z_read,
                         float(read_noise), float(bias), float(fwc),
                         float(1.0 / conversion_gain), float(2 ** bits - 1))
    Ny, Nx = mean_electrons.shape
    Typ, Txp = _round_up(Ny, _TILE), _round_up(Nx, _TILE)
    mp = jnp.pad(mean_electrons, [(0, Typ - Ny), (0, Txp - Nx)])
    seed_arr = jnp.asarray([seed], jnp.int32)
    adc_cap = float(2 ** bits - 1)

    kern = functools.partial(
        _expose_kernel, float(read_noise), float(bias), float(fwc),
        float(1.0 / conversion_gain), adc_cap)
    grid = (frames, Typ // _TILE, Txp // _TILE)
    mean_spec = pl.BlockSpec((_TILE, _TILE), lambda f, i, j: (i, j),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, _TILE, _TILE), lambda f, i, j: (f, i, j),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), mean_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((frames, Typ, Txp), jnp.float32),
        interpret=pallas_interpret(),
    )(seed_arr, mp)
    return out[:, :Ny, :Nx]
