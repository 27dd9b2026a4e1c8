"""Point Diffraction Interferometry (PS/PDI, Medecki).

Rebuild of ``prysm/x/pdi.py``: the two interferometer arms are matrix-DFT
FPM round trips with precomputed plans; the forward model is a pure
function of the input wave and phase shift.
"""
from functools import partial

import jax.numpy as jnp

from ..coordinates import make_xy_grid
from ..propagation import Wavefront as WF, prepare_executor
from ..geometry import circle


def rectangle_pulse(x, duty=0.5, amplitude=0.5, offset=0.5, period=2 * jnp.pi):
    """Rectangular pulse in [0, 1]; generalized square wave."""
    x = jnp.asarray(x)
    xwrapped = jnp.mod(x, period)
    mask = xwrapped < (duty * period)
    mask3 = jnp.abs(xwrapped) < jnp.finfo(x.dtype).eps
    hi = offset + amplitude
    lo = offset - amplitude
    y = jnp.where(mask, hi, lo)
    return jnp.where(mask3, offset, y)


class PSPDI:
    """Phase Shifting Point Diffraction Interferometer.

    See the reference docstring (prysm/x/pdi.py:54-110) for parameter
    semantics; geometry and executors are built identically.
    """

    def __init__(self, x, y, efl, epd, wavelength,
                 test_arm_offset=64,
                 test_arm_fov=64,
                 test_arm_samples=256,
                 test_arm_transmissivity=1,
                 pinhole_diameter=0.25,
                 pinhole_samples=128,
                 grating_rulings=64,
                 grating_type='sin_amp',
                 grating_axis='x'):
        """Build gratings, masks, and the per-arm transform plans."""
        grating_type = grating_type.lower()
        grating_axis = grating_axis.lower()
        self.x = x
        self.y = y
        self.dx = float(x[0, 1] - x[0, 0])
        self.efl = efl
        self.epd = epd
        self.wavelength = wavelength
        self.fno = efl / epd
        self.flambd = self.fno * self.wavelength

        self.grating_rulings = grating_rulings
        self.grating_period = self.epd / grating_rulings
        self.grating_type = grating_type
        self.grating_axis = grating_axis

        if grating_type == 'ronchi':
            f = partial(rectangle_pulse, duty=0.5, amplitude=0.5, offset=0.5,
                        period=self.grating_period)
        elif grating_type == 'sin_amp':
            def f(x):
                prefix = grating_rulings * jnp.pi / (epd / 2)
                sin = jnp.sin(prefix * x)
                shifted_sin = (sin + 1) / 2
                squished = shifted_sin * 0.1
                return 1 - squished
        else:
            raise ValueError('unsupported grating type')
        self.grating_func = f

        self.test_arm_offset = test_arm_offset
        self.test_arm_fov = test_arm_fov
        self.test_arm_samples = test_arm_samples
        self.test_arm_eps = test_arm_fov / test_arm_samples
        self.test_arm_fov_compute = (test_arm_fov + self.test_arm_eps) * self.flambd
        self.test_arm_mask_rsq = (test_arm_fov * self.flambd / 2) ** 2
        self.test_arm_transmissivity = test_arm_transmissivity

        if self.grating_axis == 'x':
            self.test_arm_shift = (grating_rulings * self.flambd, 0)
        else:
            self.test_arm_shift = (0, grating_rulings * self.flambd)

        self.pinhole_diameter = pinhole_diameter * self.flambd
        self.pinhole_samples = pinhole_samples
        self.dx_pinhole = pinhole_diameter / (pinhole_samples - 1)
        self.pinhole_fov_radius = pinhole_samples / 2 * self.dx_pinhole

        xph, yph = make_xy_grid(pinhole_samples, diameter=2 * self.pinhole_fov_radius)
        rphsq = xph * xph + yph * yph
        self.pinhole = circle((pinhole_diameter / 2) ** 2, rphsq)

        xt, yt = make_xy_grid(test_arm_samples, diameter=self.test_arm_fov_compute)
        self.dx_test_arm = float(xt[0, 1] - xt[0, 0])
        rtsq = xt * xt + yt * yt
        self.test_mask = circle(self.test_arm_mask_rsq, rtsq)

        pupil_samples = self.x.shape
        self.pinhole_executor = prepare_executor(
            pupil_dx=self.dx, pupil_samples=pupil_samples,
            focal_dx=self.dx_pinhole, focal_samples=self.pinhole.shape,
            wavelength=self.wavelength, efl=self.efl)
        self.test_executor = prepare_executor(
            pupil_dx=self.dx, pupil_samples=pupil_samples,
            focal_dx=self.dx_test_arm, focal_samples=self.test_mask.shape,
            wavelength=self.wavelength, efl=self.efl,
            focal_shift=self.test_arm_shift)

    def forward_model(self, wave_in, phase_shift=0, debug=False):
        """Intensity at the detector for an input wave and PSI phase shift."""
        if phase_shift != 0:
            shift = phase_shift / (2 * jnp.pi) * self.grating_period
            x = self.x + shift
        else:
            x = self.x
        grating = self.grating_func(x)
        i = wave_in * grating
        if not isinstance(i, WF):
            i = WF(i, self.wavelength, self.dx)

        if debug:
            ref_beam, ref_at_fpm, ref_after_fpm = \
                i.to_fpm_and_back(self.pinhole, self.pinhole_executor, return_more=True)
            test_beam, test_at_fpm, test_after_fpm = \
                i.to_fpm_and_back(self.test_mask, self.test_executor, return_more=True)
        else:
            ref_beam = i.to_fpm_and_back(self.pinhole, self.pinhole_executor)
            test_beam = i.to_fpm_and_back(self.test_mask, self.test_executor)

        if self.test_arm_transmissivity != 1:
            test_beam = test_beam * self.test_arm_transmissivity

        self.ref_beam = ref_beam
        self.test_beam = test_beam
        total_field = ref_beam + test_beam
        if debug:
            return {
                'total_field': total_field,
                'at_camera': {'ref': ref_beam, 'test': test_beam},
                'at_fpm': {
                    'ref': (ref_at_fpm, ref_after_fpm),
                    'test': (test_at_fpm, test_after_fpm),
                },
            }
        return total_field.intensity


def evaluate_test_ref_arm_matching(debug_dict):
    """Ratio of mean ref to mean test intensity (fringe-visibility tuning)."""
    pak = debug_dict['at_camera']
    I1 = pak['ref'].intensity
    I2 = pak['test'].intensity
    ratio = I1.data.mean() / I2.data.mean()
    return ratio, I1, I2
