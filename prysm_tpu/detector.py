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


# mean electron count above which the Gaussian approximation of Poisson
# shot noise holds to < 1% moment error — the fused kernel's regime
PHOTON_RICH_ELECTRONS = 20.0


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
        # which sampler the most recent expose() used: 'fused' or 'random'
        self.last_expose_path = None

    def _mean_electrons(self, aerial_img):
        """Mean electron map: signal*t with PRNU, plus dark with DCNU."""
        electrons = aerial_img * self.exposure_time
        if self.prnu is not None:
            electrons = electrons * self.prnu
        dark = self.dark_current * self.exposure_time
        if self.dcnu is not None:
            dark = dark * self.dcnu
        return electrons + dark

    def _quantize(self, output):
        """ADC integer cast + optional nonlinearity LUT."""
        if self.bits <= 8:
            output = output.astype(jnp.uint8)
        elif self.bits <= 16:
            output = output.astype(jnp.uint16)
        elif self.bits <= 32:
            output = output.astype(jnp.uint32)
        else:
            raise ValueError('> 32 unsigned bits not supported')
        if self.lut is not None:
            output = apply_lut(output, self.lut)
        return output

    def _choose_path(self, mean, method):
        """Dispatch policy for the noise sampler.

        'auto' routes to the fused TPU kernel whenever its Gaussian-shot
        approximation is sound: TPU backend, f32, 2D frame, and either a
        concretely photon-rich scene (min mean >= PHOTON_RICH_ELECTRONS)
        or a traced scene (under jit the production photon-rich regime is
        assumed; pass method='random' for photon-starved work).  Exact
        Poisson via jax.random everywhere else.
        """
        if method in ('fused', 'random'):
            return method
        if method != 'auto':
            raise ValueError(
                f"method must be 'auto', 'fused', or 'random'; got "
                f'{method!r}')
        if jax.default_backend() not in ('tpu', 'axon'):
            return 'random'
        if mean.ndim != 2 or jnp.result_type(mean) != jnp.float32:
            return 'random'
        if not isinstance(mean, jax.core.Tracer):
            if float(jnp.min(mean)) < PHOTON_RICH_ELECTRONS:
                return 'random'
        return 'fused'

    def expose(self, aerial_img, frames=1, key=None, seed=None,
               method='auto'):
        """Form exposure(s) of an aerial image (e-/s) -> DN.

        Noise chain: dark + PRNU/DCNU -> Poisson shot -> Gaussian read ->
        bias -> FWC clip -> gain -> ADC clip/quantize -> optional LUT.
        Either an explicit jax.random ``key`` or an integer ``seed`` is
        required for reproducible noise.

        On TPU, photon-rich scenes route through the fused Pallas
        hardware-PRNG kernel (one VMEM pass; ~200x the jax.random chain at
        1024^2) without any API change; CPU runs, f64 oracles, and
        concretely photon-starved scenes keep the exact-Poisson
        ``jax.random`` path.  Force a path with method='fused'/'random';
        the path taken is recorded on ``self.last_expose_path``.
        """
        if key is None and seed is None:
            raise ValueError(
                'expose requires an explicit jax.random key or integer seed')
        mean = self._mean_electrons(aerial_img)
        path = self._choose_path(mean, method)
        self.last_expose_path = path
        if path == 'fused':
            if seed is None:
                # any key word is a valid hardware-PRNG seed
                seed = jax.random.key_data(key).ravel()[-1].astype(jnp.int32)
            output = self._sample_fused(mean, frames, seed)
        else:
            if key is None:
                key = jax.random.PRNGKey(seed)
            output = self._sample_random(mean, frames, key)
        output = output.reshape((frames, *aerial_img.shape))
        if frames == 1:
            output = output[0]
        return self._quantize(output)

    def _sample_random(self, mean, frames, key):
        """Exact-Poisson shot + Gaussian read chain via jax.random."""
        mean = mean.ravel()
        k_shot, k_read = jax.random.split(key)
        shot = jax.random.poisson(k_shot, mean,
                                  (frames, mean.size)).astype(mean.dtype)
        read = self.read_noise * jax.random.normal(k_read, shot.shape,
                                                   dtype=mean.dtype)
        input_to_adc = jnp.minimum(shot + read + self.bias, self.fwc)
        output = input_to_adc * (1 / self.conversion_gain)
        return jnp.clip(output, 0, 2 ** self.bits - 1)

    def _sample_fused(self, mean, frames, seed):
        """Fused Pallas chain (TPU hardware PRNG, Gaussian shot approx)."""
        from .ops.noise import expose_pallas
        return expose_pallas(mean, frames, seed, self.read_noise, self.bias,
                             self.fwc, self.conversion_gain, self.bits)

    def expose_fused(self, aerial_img, frames=1, seed=0):
        """Exposure forced through the fused Pallas noise kernel.

        Equivalent to ``expose(..., seed=seed, method='fused')``: one VMEM
        pass per (frame, tile), Box-Muller Gaussians from
        ``pltpu.prng_random_bits``, shot noise by the Gaussian
        approximation of Poisson (valid for >= ~20 mean electrons; use
        method='random' for photon-starved scenes), then the identical
        read/bias/FWC/gain/ADC chain.  See prysm_tpu/ops/noise.py.
        """
        return self.expose(aerial_img, frames=frames, seed=seed,
                           method='fused')


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
