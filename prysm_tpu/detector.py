"""Detector simulation: noise model, pixel transfer functions, bin/tile.

Rebuild of ``prysm/detector.py``.  The noise chain uses explicit
``jax.random`` keys (the reference draws from global numpy RNG state,
prysm/detector.py:118-121); clipping is branch-free; bin/tile are pure
reshape/broadcast ops that fuse under jit and batch over leading frames.
"""
import numbers
import functools
import itertools

import jax
import jax.numpy as jnp


def apply_lut(img, lut):
    """Apply a lookup table: lut[img] with integer img (a gather)."""
    return jnp.take(lut, img)


class Detector:
    """Model of a detector (focal plane array + ADC).

    Parameters match the reference (prysm/detector.py:32-81): dark_current
    e-/s, read_noise e-, bias e-, fwc e-, conversion_gain e-/DN, bits,
    exposure_time s, optional prnu/dcnu fixed maps and a nonlinearity lut.
    """

    def __init__(self, dark_current, read_noise, bias, fwc, conversion_gain,
                 bits, exposure_time, prnu=None, dcnu=None, lut=None):
        """Store detector parameters."""
        self.dark_current = dark_current
        self.read_noise = read_noise
        self.bias = bias
        self.fwc = fwc
        self.conversion_gain = conversion_gain
        self.bits = bits
        self.exposure_time = exposure_time
        self.prnu = prnu
        self.dcnu = dcnu
        self.lut = lut

    def expose(self, aerial_img, frames=1, key=None):
        """Form exposure(s) of an aerial image (e-/s) -> DN.

        Noise chain: dark + PRNU/DCNU -> Poisson shot -> Gaussian read ->
        bias -> FWC clip -> gain -> ADC clip/quantize -> optional LUT.
        An explicit jax.random key is required for reproducible noise.
        """
        if key is None:
            raise ValueError('expose requires an explicit jax.random key')
        electrons = aerial_img * self.exposure_time
        if self.prnu is not None:
            electrons = electrons * self.prnu
        dark = self.dark_current * self.exposure_time
        if self.dcnu is not None:
            dark = dark * self.dcnu

        electrons = (electrons + dark).ravel()
        k_shot, k_read = jax.random.split(key)
        shot_noise = jax.random.poisson(k_shot, electrons,
                                        (frames, electrons.size)).astype(electrons.dtype)
        read_noise = self.read_noise * jax.random.normal(k_read, shot_noise.shape,
                                                         dtype=electrons.dtype)
        scaling = 1 / self.conversion_gain
        input_to_adc = shot_noise + read_noise + self.bias
        input_to_adc = jnp.minimum(input_to_adc, self.fwc)
        output = input_to_adc * scaling
        adc_cap = 2 ** self.bits - 1
        output = jnp.clip(output, 0, adc_cap)
        if self.bits <= 8:
            output = output.astype(jnp.uint8)
        elif self.bits <= 16:
            output = output.astype(jnp.uint16)
        elif self.bits <= 32:
            output = output.astype(jnp.uint32)
        else:
            raise ValueError('> 32 unsigned bits not supported')
        output = output.reshape((frames, *aerial_img.shape))
        if frames == 1:
            output = output[0]
        if self.lut is not None:
            output = apply_lut(output, self.lut)
        return output

    def expose_fused(self, aerial_img, frames=1, seed=0):
        """Exposure via the fused Pallas noise kernel (TPU hardware PRNG).

        One VMEM pass per (frame, tile): Box-Muller Gaussians from
        ``pltpu.prng_random_bits``, shot noise by the Gaussian
        approximation of Poisson (valid for >= ~20 mean electrons; use
        :meth:`expose` for photon-starved scenes), then the identical
        read/bias/FWC/gain/ADC chain.  See prysm_tpu/ops/noise.py.
        """
        from .ops.noise import expose_pallas
        electrons = aerial_img * self.exposure_time
        if self.prnu is not None:
            electrons = electrons * self.prnu
        dark = self.dark_current * self.exposure_time
        if self.dcnu is not None:
            dark = dark * self.dcnu
        mean = electrons + dark
        out = expose_pallas(mean, frames, seed, self.read_noise, self.bias,
                            self.fwc, self.conversion_gain, self.bits)
        if self.bits <= 8:
            out = out.astype(jnp.uint8)
        elif self.bits <= 16:
            out = out.astype(jnp.uint16)
        elif self.bits <= 32:
            out = out.astype(jnp.uint32)
        else:
            raise ValueError('> 32 unsigned bits not supported')
        if frames == 1:
            out = out[0]
        if self.lut is not None:
            out = apply_lut(out, self.lut)
        return out


def olpf_ft(fx, fy, width_x, width_y):
    """Analytic FT of an optical low-pass filter (birefringent 2/4-pole)."""
    return jnp.cos(2 * width_x * fx) * jnp.cos(2 * width_y * fy)


def pixel_ft(fx, fy, width_x, width_y):
    """Analytic FT of a rectangular pixel aperture: separable sinc."""
    return jnp.sinc(fx * width_x) * jnp.sinc(fy * width_y)


def pixel(x, y, width_x, width_y):
    """Spatial representation of a rectangular pixel."""
    width_x = width_x / 2
    width_y = width_y / 2
    return (x <= width_x) & (x >= -width_x) & (y <= width_y) & (y >= -width_y)


def bindown(array, factor, mode='avg'):
    """Bin an array by integer factor(s) via reshape + reduce.

    Shapes must be integer multiples of factor on each axis.
    """
    if isinstance(factor, numbers.Number):
        factor = tuple([factor] * array.ndim)
    output_shape = tuple(s // n for s, n in zip(array.shape, factor))
    inter_shape = tuple(itertools.chain(*zip(output_shape, factor)))
    view = array.reshape(inter_shape)
    reduction_axes = tuple(range(1, 2 * array.ndim, 2))
    if mode.lower() in ('avg', 'average', 'mean'):
        return view.mean(axis=reduction_axes)
    elif mode.lower() == 'sum':
        return view.sum(axis=reduction_axes)
    raise ValueError('mode must be average or sum.')


def tile(array, factor, scaling='sum'):
    """Tile (repeat) an array by factor; the adjoint of bindown."""
    if isinstance(factor, numbers.Number):
        factor = tuple([factor] * array.ndim)
    intermediate = [None] * len(factor)
    slc = (slice(s) for s in array.shape)
    shape1 = tuple(itertools.chain(*zip(slc, intermediate)))
    shape2 = tuple(itertools.chain(*zip(array.shape, factor)))
    output_shape = tuple(s * n for s, n in zip(array.shape, factor))
    view = jnp.broadcast_to(array[shape1], shape2)
    view = view.reshape(output_shape)
    if scaling == 'sum':
        sf = functools.reduce(lambda x, y: x * y, factor)
        view = view * (1 / sf)
    elif scaling in ('avg', 'average', 'mean'):
        pass
    else:
        raise ValueError('scaling must be average or sum')
    return view
