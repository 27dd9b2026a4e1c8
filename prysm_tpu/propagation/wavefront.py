"""Wavefront class: fluent object API over the propagation functions.

Rebuild of ``prysm/propagation/wavefront.py``.  ``Wavefront`` is a
registered pytree whose only array leaf is the complex field; wavelength,
dx, and space are static metadata.  That makes a Wavefront a legal argument
to / return from jitted functions, and ``jax.grad`` flows through its data
leaf — the explicit ``*_adjoint`` methods are kept for API parity with the
reference's hand-chained gradient pipelines.

Units (identical to the reference): field dx in mm for pupil space and um
for psf space, OPD in nm, wavelength in um, efl/z in mm.
"""
import numbers
import operator
import dataclasses

import jax
import jax.numpy as jnp

from .._richdata import RichData
from ..fttools import pad2d, crop_center
from ..mathops import cis
from .fft import (
    focus, focus_adjoint, unfocus, unfocus_adjoint,
    pupil_sample_to_psf_sample, psf_sample_to_pupil_sample,
)
from .dft import (
    prepare_executor, prepare_multiresolution,
    focus_dft, focus_dft_adjoint, unfocus_dft, unfocus_dft_adjoint,
)
from .angular_spectrum import angular_spectrum, angular_spectrum_adjoint
from .coronagraph import (
    to_fpm_and_back, to_fpm_and_back_adjoint,
    to_fpm_and_back_multiresolution, to_fpm_and_back_multiresolution_adjoint,
    babinet, babinet_adjoint,
)


def phase_prefix(wavelength):
    """Scale factor such that multiplication with OPD in nm produces radians."""
    return 1j * 2 * jnp.pi / wavelength / 1e3


def _phase_scale(wavelength):
    """Real radians-per-nm scale (the magnitude of phase_prefix)."""
    return 2 * jnp.pi / wavelength / 1e3


def _field_data(field):
    """ndarray data from a Wavefront-like field (pass through otherwise)."""
    if isinstance(field, Wavefront):
        return field.data
    return field


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Wavefront:
    """(Complex) representation of a wavefront.

    data: complex field, possibly with leading batch axes.
    wavelength: um.  dx: mm (space='pupil') or um (space='psf').
    """

    data: jax.Array
    wavelength: float = dataclasses.field(metadata=dict(static=True), default=None)
    dx: float = dataclasses.field(metadata=dict(static=True), default=None)
    space: str = dataclasses.field(metadata=dict(static=True), default='pupil')

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_amp_and_phase(cls, amplitude, phase, wavelength, dx):
        """Wavefront from amplitude and OPD (nm); phase=None means zero OPD."""
        if phase is not None:
            P = amplitude * cis(_phase_scale(wavelength) * phase)
        else:
            P = amplitude
        return cls(jnp.asarray(P), wavelength, dx)

    @classmethod
    def phase_screen(cls, phase, wavelength, dx):
        """Unit-amplitude complex screen from OPD in nm."""
        E = cis(_phase_scale(wavelength) * phase)
        return cls(E, wavelength, dx)

    @classmethod
    def thin_lens(cls, f, wavelength, x, y, dx=None):
        """Quadratic-phase thin-lens screen of focal length f (mm).

        Pass dx explicitly when x/y are traced (inside jit) — the sample
        spacing is static metadata and cannot be read off a tracer.
        """
        w = wavelength / 1e3  # um -> mm
        term1 = -2 * jnp.pi / w
        rsq = x * x + y * y
        cmplx_screen = cis(term1 * (rsq / (2 * f)))
        if dx is None:
            dx = float(x[0, 1] - x[0, 0])
        return cls(cmplx_screen, wavelength, dx, 'pupil')

    # -- views --------------------------------------------------------------
    @property
    def intensity(self):
        """Intensity, |E|^2, as RichData."""
        d = self.data
        return RichData(d.real * d.real + d.imag * d.imag, self.dx, self.wavelength)

    @property
    def phase(self):
        """Phase, angle(E); possibly wrapped for large OPD."""
        return RichData(jnp.angle(self.data), self.dx, self.wavelength)

    @property
    def real(self):
        """Re(E)."""
        return RichData(jnp.real(self.data), self.dx, self.wavelength)

    @property
    def imag(self):
        """Im(E)."""
        return RichData(jnp.imag(self.data), self.dx, self.wavelength)

    def copy(self):
        """Return a copy of this instance (arrays are immutable; shallow)."""
        return self._like(self.data)

    # view builders: re-wrap raw arrays in this wavefront's metadata
    def _like(self, data):
        """A wavefront sharing this one's wavelength/dx/space."""
        return Wavefront(data, self.wavelength, self.dx, self.space)

    def _at_focus(self, data, executor):
        """A focal-plane wavefront on the executor's output grid."""
        return Wavefront(data, self.wavelength, executor.focal_dx, 'psf')

    def _focal_stack(self, fields, executor):
        """Focal-plane views of per-level fields of a multiresolution pack."""
        return [Wavefront(f, self.wavelength, ex.focal_dx, 'psf')
                for f, ex in zip(fields, executor.executors)]

    # -- explicit adjoints (API parity with the reference) -------------------
    def from_amp_and_phase_adjoint_phase(self, wf_bar):
        """Gradient w.r.t. phase: k * Im(conj(E) * Ebar)."""
        k = phase_prefix(self.wavelength)
        return k * jnp.imag(wf_bar.data * jnp.conj(self.data))

    def from_amp_and_phase_adjoint_amp(self, wf_bar, phase=None):
        """Gradient w.r.t. amplitude: Re(conj(S) * Ebar) with S the phasor."""
        if phase is not None:
            S = cis(_phase_scale(self.wavelength) * phase)
            return jnp.real(wf_bar.data * jnp.conj(S))
        absP = jnp.abs(self.data)
        nonzero = absP > 0
        grad = jnp.real(wf_bar.data * jnp.conj(self.data))
        return jnp.where(nonzero, grad / jnp.where(nonzero, absP, 1), 0)

    def phase_screen_adjoint_phase(self, wf_bar):
        """Gradient w.r.t. the phase of a phase_screen."""
        return self.from_amp_and_phase_adjoint_phase(wf_bar)

    @classmethod
    def thin_lens_adjoint(cls, f, wavelength, x, y, wf_bar):
        """Scalar gradient w.r.t. thin-lens focal length f."""
        L_bar = _field_data(wf_bar)
        L = cls.thin_lens(f, wavelength, x, y).data
        w = wavelength / 1e3
        rsq = x * x + y * y
        coeff = jnp.pi / (w * f * f)
        return coeff * jnp.sum(rsq * jnp.imag(L_bar * jnp.conj(L)))

    def intensity_adjoint(self, intensity_bar):
        """Gradient w.r.t. the complex field before intensity: 2 Ibar E."""
        Gbar = 2 * intensity_bar * self.data
        return Wavefront(Gbar, self.wavelength, self.dx, self.space)

    # -- shaping ------------------------------------------------------------
    def pad2d(self, Q, value=0, mode='constant', out_shape=None, inplace=True):
        """Wavefront with FFT-aligned padded data (ref wavefront.py:300).

        inplace=True rebinds this object's data and returns self (arrays
        themselves are immutable under JAX); False returns a new Wavefront.
        """
        padded = pad2d(self.data, Q=Q, value=value, mode=mode, out_shape=out_shape)
        if inplace:
            self.data = padded
            return self
        return Wavefront(padded, self.wavelength, self.dx, self.space)

    def crop(self, out_shape, inplace=True):
        """Wavefront cropped to the centermost out_shape (ref wavefront.py:334).

        inplace=True rebinds this object's data and returns self (arrays
        themselves are immutable under JAX); False returns a new Wavefront.
        """
        cropped = crop_center(self.data, out_shape)
        if inplace:
            self.data = cropped
            return self
        return Wavefront(cropped, self.wavelength, self.dx, self.space)

    # -- arithmetic ---------------------------------------------------------
    def _numerical_operation(self, other, op, reverse=False):
        func = getattr(operator, op)
        if isinstance(other, Wavefront):
            criteria = [
                abs(self.dx - other.dx) / self.dx * 100 < 0.1,
                self.data.shape == other.data.shape,
                self.wavelength == other.wavelength,
                self.space == other.space,
            ]
            if not all(criteria):
                raise ValueError('all physicality criteria not met: sample '
                                 'spacing, shape, wavelength, or space different.')
            data = func(other.data, self.data) if reverse else func(self.data, other.data)
        elif isinstance(other, (jax.Array, numbers.Number)):
            data = func(other, self.data) if reverse else func(self.data, other)
        else:
            raise TypeError(f"unsupported operand type(s) for {op}: 'Wavefront' and {type(other)}")
        return Wavefront(data, self.wavelength, self.dx, self.space)

    def __mul__(self, other):
        """E * other."""
        return self._numerical_operation(other, 'mul')

    def __rmul__(self, other):
        """other * E."""
        return self._numerical_operation(other, 'mul', reverse=True)

    def __truediv__(self, other):
        """E / other."""
        return self._numerical_operation(other, 'truediv')

    def __rtruediv__(self, other):
        """other / E."""
        return self._numerical_operation(other, 'truediv', reverse=True)

    def __add__(self, other):
        """E + other."""
        return self._numerical_operation(other, 'add')

    def __radd__(self, other):
        """other + E."""
        return self._numerical_operation(other, 'add', reverse=True)

    def __sub__(self, other):
        """E - other."""
        return self._numerical_operation(other, 'sub')

    def __rsub__(self, other):
        """other - E."""
        return self._numerical_operation(other, 'sub', reverse=True)

    # -- propagation verbs --------------------------------------------------
    def free_space(self, dz=None, Q=1, tf=None):
        """Plane-to-plane angular-spectrum propagation over dz mm."""
        if dz is None and tf is None:
            raise ValueError('dz must be provided if tf is None')
        out = angular_spectrum(self.data, wvl=self.wavelength, dx=self.dx,
                               z=dz, Q=Q, tf=tf)
        return Wavefront(out, self.wavelength, self.dx, self.space)

    def free_space_adjoint(self, dz=None, Q=1, tf=None):
        """Adjoint of free_space."""
        if dz is None and tf is None:
            raise ValueError('dz must be provided if tf is None')
        out = angular_spectrum_adjoint(self.data, wvl=self.wavelength,
                                       dx=self.dx, z=dz, Q=Q, tf=tf)
        return Wavefront(out, self.wavelength, self.dx, self.space)

    def focus(self, efl, Q=2):
        """Pupil -> psf propagation via unitary FFT."""
        if self.space != 'pupil':
            raise ValueError('can only propagate from a pupil to psf plane')
        data = focus(self.data, Q=Q)
        dx = pupil_sample_to_psf_sample(self.dx, data.shape[-1], self.wavelength, efl)
        return Wavefront(data, self.wavelength, dx, 'psf')

    def focus_adjoint(self, efl, Q=2):
        """Adjoint of focus."""
        if self.space != 'psf':
            raise ValueError('can only apply adjoint from a psf to pupil plane')
        samples = self.data.shape[-1]
        data = focus_adjoint(self.data, Q=Q)
        dx = psf_sample_to_pupil_sample(self.dx, samples, self.wavelength, efl)
        return Wavefront(data, self.wavelength, dx, 'pupil')

    def unfocus(self, efl, Q=2):
        """Psf -> pupil propagation via unitary inverse FFT."""
        if self.space != 'psf':
            raise ValueError('can only propagate from a psf to pupil plane')
        data = unfocus(self.data, Q=Q)
        dx = psf_sample_to_pupil_sample(self.dx, data.shape[-1], self.wavelength, efl)
        return Wavefront(data, self.wavelength, dx, 'pupil')

    def unfocus_adjoint(self, efl, Q=2):
        """Adjoint of unfocus."""
        if self.space != 'pupil':
            raise ValueError('can only apply adjoint from a pupil to psf plane')
        samples = self.data.shape[-1]
        data = unfocus_adjoint(self.data, Q=Q)
        dx = pupil_sample_to_psf_sample(self.dx, samples, self.wavelength, efl)
        return Wavefront(data, self.wavelength, dx, 'psf')

    def prepare_executor(self, efl, dx, samples, shift=(0, 0), kind='mdft'):
        """Build a reusable transform plan for this wavefront's geometry.

        (dx, samples) describe the *other* plane: focal um when self is a
        pupil, pupil mm when self is a psf.
        """
        if isinstance(samples, int):
            samples = (samples, samples)
        if self.space == 'pupil':
            return prepare_executor(
                pupil_dx=self.dx, pupil_samples=self.data.shape[-2:],
                focal_dx=dx, focal_samples=samples,
                wavelength=self.wavelength, efl=efl, focal_shift=shift, kind=kind)
        elif self.space == 'psf':
            return prepare_executor(
                pupil_dx=dx, pupil_samples=samples,
                focal_dx=self.dx, focal_samples=self.data.shape[-2:],
                wavelength=self.wavelength, efl=efl, focal_shift=shift, kind=kind)
        raise ValueError(f'unknown space {self.space!r}')

    def prepare_multiresolution(self, efl, focal_dx, focal_samples, num_levels,
                                scaling=4.0, fine_samples=None, window=(0.2, 0.7),
                                kind='mdft'):
        """Build a MultiResolutionExecutor for this wavefront."""
        if self.space != 'pupil':
            raise ValueError('multiresolution propagation begins at a pupil plane')
        return prepare_multiresolution(
            pupil_dx=self.dx, pupil_samples=self.data.shape[-2:],
            focal_dx=focal_dx, focal_samples=focal_samples,
            wavelength=self.wavelength, efl=efl, num_levels=num_levels,
            scaling=scaling, fine_samples=fine_samples, window=window, kind=kind)

    def focus_dft(self, executor):
        """Pupil -> psf via a precomputed plan."""
        if self.space != 'pupil':
            raise ValueError('can only propagate from a pupil to psf plane')
        data = focus_dft(self.data, executor)
        return Wavefront(data, self.wavelength, executor.focal_dx, 'psf')

    def focus_dft_adjoint(self, executor):
        """Adjoint of focus_dft."""
        if self.space != 'psf':
            raise ValueError('can only apply adjoint from a psf to pupil plane')
        data = focus_dft_adjoint(self.data, executor)
        return Wavefront(data, self.wavelength, executor.pupil_dx, 'pupil')

    def unfocus_dft(self, executor):
        """Psf -> pupil via a precomputed plan."""
        if self.space != 'psf':
            raise ValueError('can only propagate from a psf to pupil plane')
        data = unfocus_dft(self.data, executor)
        return Wavefront(data, self.wavelength, executor.pupil_dx, 'pupil')

    def unfocus_dft_adjoint(self, executor):
        """Adjoint of unfocus_dft."""
        if self.space != 'pupil':
            raise ValueError('can only apply adjoint from a pupil to psf plane')
        data = unfocus_dft_adjoint(self.data, executor)
        return Wavefront(data, self.wavelength, executor.focal_dx, 'psf')

    def to_fpm_and_back(self, fpm, executor, return_more=False):
        """Propagate to a focal plane mask, apply it, and return."""
        fpm = _field_data(fpm)
        pak = to_fpm_and_back(self.data, fpm=fpm, executor=executor,
                              return_more=return_more)
        if not return_more:
            return self._like(pak)
        at_next_pupil, at_fpm, after_fpm = pak
        return (self._like(at_next_pupil),
                self._at_focus(at_fpm, executor),
                self._at_focus(after_fpm, executor))

    def to_fpm_and_back_adjoint(self, fpm, executor, return_more=False,
                                return_fpm_grad=False, field_at_fpm=None):
        """Adjoint of to_fpm_and_back."""
        fpm = _field_data(fpm)
        field_at_fpm = _field_data(field_at_fpm)
        pak = to_fpm_and_back_adjoint(self.data, fpm=fpm, executor=executor,
                                      return_more=return_more,
                                      return_fpm_grad=return_fpm_grad,
                                      field_at_fpm=field_at_fpm)
        if not (return_more or return_fpm_grad):
            return self._like(pak)
        # first element is the pupil gradient; the rest live at focus
        head, *tail = pak
        return (self._like(head),
                *(self._at_focus(t, executor) for t in tail))

    def to_fpm_and_back_multiresolution(self, fpm, executor, return_more=False):
        """Multi-resolution focal-plane-mask round trip."""
        if self.space != 'pupil':
            raise ValueError('can only propagate from a pupil to psf plane')
        pak = to_fpm_and_back_multiresolution(self.data, fpm, executor,
                                              return_more=return_more)
        if not return_more:
            return self._like(pak)
        out, at_fpm, after_fpm = pak
        return (self._like(out),
                self._focal_stack(at_fpm, executor),
                self._focal_stack(after_fpm, executor))

    def to_fpm_and_back_multiresolution_adjoint(self, fpm, executor,
                                                return_more=False,
                                                return_fpm_grad=False,
                                                field_at_fpm=None):
        """Adjoint of to_fpm_and_back_multiresolution."""
        if field_at_fpm is not None:
            field_at_fpm = [_field_data(f) for f in field_at_fpm]
        pak = to_fpm_and_back_multiresolution_adjoint(
            self.data, fpm, executor, return_more=return_more,
            return_fpm_grad=return_fpm_grad, field_at_fpm=field_at_fpm)

        if not (return_more or return_fpm_grad):
            return self._like(pak)
        # pupil gradient first, then per-level focal stacks
        head, *stacks = pak
        return (self._like(head),
                *(self._focal_stack(fields, executor) for fields in stacks))

    def babinet(self, lyot, fpm, executor, return_more=False):
        """Lyot coronagraph via Babinet's principle."""
        fpm = _field_data(fpm)
        lyot = _field_data(lyot)
        pak = babinet(self.data, lyot=lyot, fpm=fpm, executor=executor,
                      return_more=return_more)
        if not return_more:
            return self._like(pak)
        after_lyot, at_fpm, after_fpm, at_lyot = pak
        return (self._like(after_lyot),
                self._at_focus(at_fpm, executor),
                self._at_focus(after_fpm, executor),
                self._like(at_lyot))

    def babinet_adjoint(self, lyot, fpm, executor, field_at_fpm=None,
                        field_at_lyot=None, return_fpm_grad=False,
                        return_lyot_grad=False):
        """Adjoint of babinet."""
        fpm = _field_data(fpm)
        lyot = _field_data(lyot)
        field_at_fpm = _field_data(field_at_fpm)
        field_at_lyot = _field_data(field_at_lyot)
        pak = babinet_adjoint(self.data, lyot=lyot, fpm=fpm, executor=executor,
                              field_at_fpm=field_at_fpm, field_at_lyot=field_at_lyot,
                              return_fpm_grad=return_fpm_grad,
                              return_lyot_grad=return_lyot_grad)
        if not (return_fpm_grad or return_lyot_grad):
            return self._like(pak)
        remaining = iter(pak)
        out = [self._like(next(remaining))]
        if return_fpm_grad:
            out.append(self._at_focus(next(remaining), executor))
        if return_lyot_grad:
            out.append(self._like(next(remaining)))
        return tuple(out)
