"""Deformable mirror forward model and adjoint.

Rebuild of ``prysm/x/dm.py``.  The DM surface is influence-function Fourier
convolution of an FFT-centered poke lattice, with Fourier-domain subpixel
shift, homography rotation projection, Fourier upsampling, and pad/crop to
the output grid.  The render chain is a pure function of the actuator
array, so ``jax.grad`` differentiates it; ``render_adjoint`` mirrors the
reference's hand-rolled reverse chain for API parity.
"""
import copy

import numpy as onp
import jax
import jax.numpy as jnp

from ..conf import config
from ..mathops import is_odd, cis
from ..fttools import forward_ft_unit, fourier_resample, crop_center, pad2d
from ..convolution import apply_transfer_functions
from ..coordinates import (
    warp,
    apply_homography,
    make_rotation_matrix,
    drop_z_3d_transformation,
    make_homomorphic_translation_matrix,
    promote_3d_transformation_to_homography,
)


def prepare_actuator_lattice(shape, Nact, sep, dtype):
    """FFT-centered actuator lattice bookkeeping (host-side slices)."""
    cy, cx = [s // 2 for s in shape]
    Nactx, Nacty = Nact
    skip_samples_x, skip_samples_y = sep
    actuators = jnp.zeros((Nacty, Nactx), dtype=dtype)
    offx = 0
    offy = 0
    if not is_odd(Nactx):
        offx = skip_samples_x // 2
    if not is_odd(Nacty):
        offy = skip_samples_y // 2
    neg_extreme_x = cx + -Nactx // 2 * skip_samples_x + offx
    neg_extreme_y = cy + -Nacty // 2 * skip_samples_y + offy
    pos_extreme_x = cx + Nactx // 2 * skip_samples_x + offx
    pos_extreme_y = cy + Nacty // 2 * skip_samples_y + offy
    ix = slice(neg_extreme_x, pos_extreme_x, skip_samples_x)
    iy = slice(neg_extreme_y, pos_extreme_y, skip_samples_y)
    poke_arr = jnp.zeros(shape, dtype=dtype)
    return {
        'actuators': actuators,
        'poke_arr': poke_arr,
        'ixx': ix,
        'iyy': iy,
    }


def prepare_fwd_reverse_projection_coordinates(shape, rot):
    """Forward and reverse warp grids for a rigid-body rotation projection."""
    R = make_rotation_matrix(rot)
    oy, ox = [(s - 1) / 2 for s in shape]
    y = jnp.arange(shape[0], dtype=config.precision)
    x = jnp.arange(shape[1], dtype=config.precision)
    x, y = jnp.meshgrid(x, y)
    Tin = onp.eye(4)
    Tin[0, -1] = -ox
    Tin[1, -1] = -oy
    Tout = onp.eye(4)
    Tout[0, -1] = ox
    Tout[1, -1] = oy
    Rh = onp.zeros((4, 4))
    Rh[:3, :3] = onp.asarray(R)
    Rh[3, 3] = 1
    Mfwd = Tout @ (Rh @ Tin)
    mask = [0, 1, 3]
    Mfwd = Mfwd[mask][:, mask]
    Mifwd = onp.linalg.inv(Mfwd)
    xfwd, yfwd = apply_homography(jnp.asarray(Mifwd), x, y)
    xrev, yrev = apply_homography(jnp.asarray(Mfwd), x, y)
    return (xfwd, yfwd), (xrev, yrev)


class DM:
    """Rectangular-grid DM with a shared influence function.

    See the reference docstring (prysm/x/dm.py:86-143) for parameter
    semantics; behavior is identical.  ``render`` is a pure function of
    ``self.actuators`` — set them and call render, or use ``render_fn``
    to obtain a jit-compatible closure over everything but the actuators.
    """

    def __init__(self, ifn, Nout, Nact=50, sep=10, shift=(0, 0), rot=(0, 0, 0),
                 upsample=1, project_centering='fft'):
        """Build the poke lattice, transfer function, and projections."""
        if isinstance(Nout, int):
            Nout = (Nout, Nout)
        if isinstance(Nact, int):
            Nact = (Nact, Nact)
        if isinstance(sep, int):
            sep = (sep, sep)
        s = ifn.shape

        # host constant: render_fn closes over the influence function;
        # device residency would make jit const-embedding read it back
        self.ifn = onp.asarray(ifn)
        # transfer function built host-side (numpy): an eager complex FFT is
        # a device complex allocation, which the axon relay cannot do; the
        # complex tf is assembled by lax.complex at trace time (.tf property)
        Ifn = onp.fft.fft2(onp.asarray(ifn))
        self.Nout = Nout
        self.Nact = Nact
        self.sep = sep
        self.shift = shift
        self.obliquity = float(make_rotation_matrix(rot, host=True)[2, 2])
        self.rot = rot
        self.upsample = upsample

        from ..mathops import host_planner
        with host_planner():
            out = prepare_actuator_lattice(s, Nact, sep,
                                           dtype=self.ifn.dtype)
        self.actuators = jnp.asarray(onp.asarray(out['actuators']))
        self.poke_arr = onp.asarray(out['poke_arr'])   # host jit constant
        self.ixx = out['ixx']
        self.iyy = out['iyy']

        self.needs_rot = not onp.allclose(rot, [0, 0, 0])
        if self.needs_rot:
            with host_planner():
                fwd, rev = prepare_fwd_reverse_projection_coordinates(s, rot)
            self.projx, self.projy = (onp.asarray(a) for a in fwd)
            self.invprojx, self.invprojy = (onp.asarray(a) for a in rev)
        else:
            self.projx = self.projy = None
            self.invprojx = self.invprojy = None

        if shift[0] != 0 or shift[1] != 0:
            Y = onp.fft.fftfreq(s[0], 1)
            X = onp.fft.fftfreq(s[1], 1)
            # host complex exponentials: numpy, not an eager device cis
            Xramp = onp.exp(1j * (X * (-2 * onp.pi * shift[0])))
            Yramp = onp.exp(1j * (Y * (-2 * onp.pi * shift[1])))
            Xramp = onp.broadcast_to(Xramp, s)
            Yramp = onp.broadcast_to(Yramp, tuple(reversed(s))).T
            tf = Ifn * Xramp * Yramp
        else:
            tf = Ifn
        rdtype = onp.empty(0, dtype=self.ifn.dtype).real.dtype
        self._tf_re = onp.asarray(tf.real, dtype=rdtype)  # host constants
        self._tf_im = onp.asarray(tf.imag, dtype=rdtype)

    @property
    def tf(self):
        """Transfer-function chain; complex assembled at trace time."""
        return [jax.lax.complex(jnp.asarray(self._tf_re),
                                jnp.asarray(self._tf_im))]

    def copy(self):
        """Make a (deep) copy of this DM."""
        return copy.deepcopy(self)

    def update(self, actuators):
        """Set the actuator commands."""
        self.actuators = jnp.asarray(actuators).reshape(self.actuators.shape)

    def render(self, wfe=True):
        """Render the DM surface (or reflected WFE) from self.actuators."""
        return self.render_fn(wfe)(self.actuators)

    def render_fn(self, wfe=True):
        """Pure function actuators -> surface; jit/grad-compatible."""
        def _render(actuators):
            poke_arr = jnp.asarray(self.poke_arr).at[
                self.iyy, self.ixx].set(actuators)
            sfe = apply_transfer_functions(poke_arr, None, self.tf, shift=False)
            if self.needs_rot:
                warped = warp(sfe, self.projx, self.projy)
            else:
                warped = sfe
            if wfe:
                warped = warped * (2 * self.obliquity)
            if self.upsample != 1:
                warped = fourier_resample(warped, self.upsample)
            self.Nintermediate = warped.shape
            if warped.shape[0] < self.Nout[0]:
                warped = pad2d(warped, out_shape=self.Nout)
            elif warped.shape[0] > self.Nout[1]:
                warped = crop_center(warped, out_shape=self.Nout)
            return warped
        return _render

    def render_adjoint(self, protograd, wfe=True):
        """Hand-rolled adjoint of render(): image-plane grad -> actuator grad."""
        if protograd.shape[0] > self.Nintermediate[0]:
            protograd = crop_center(protograd, out_shape=self.Nintermediate)
        elif protograd.shape[0] < self.Nintermediate[0]:
            protograd = pad2d(protograd, out_shape=self.Nintermediate)
        if self.upsample != 1:
            upsample = self.ifn.shape[0] / protograd.shape[0]
            protograd = fourier_resample(protograd, upsample)
        if wfe:
            protograd = protograd * (2 * self.obliquity)
        if self.needs_rot:
            protograd = warp(protograd, self.invprojx, self.invprojy)
        in_actuator_space = apply_transfer_functions(
            protograd, None, [jnp.conj(t) for t in self.tf], shift=False)
        return in_actuator_space[self.iyy, self.ixx]
