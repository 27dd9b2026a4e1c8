"""Optical-path-length functions attached to raytracing surfaces.

Rebuild of ``prysm/x/raytracing/opl.py``: wavelength-aware OPL modifiers
(gratings, holograms) whose in-plane gradient drives the tangential
momentum kick in Surface.diffract.  Local coordinates mm, wavelength um,
OPL mm.
"""
import numpy as onp
import jax.numpy as jnp

from .sags import fd_step


class OPLFunc:
    """Base class for wavelength-aware optical-path modifiers."""

    finite_difference_step = None

    def opl(self, x, y, wavelength):
        """Optical path length in millimeters."""
        raise NotImplementedError

    def _fd_step(self, *arrs):
        return fd_step(self.finite_difference_step, *arrs)

    def opl_and_gradient(self, x, y, wavelength):
        """(opl, gx, gy) via central differences by default."""
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        h = self._fd_step(x, y)
        opl = self.opl(x, y, wavelength)
        gx = (self.opl(x + h, y, wavelength)
              - self.opl(x - h, y, wavelength)) / (2.0 * h)
        gy = (self.opl(x, y + h, wavelength)
              - self.opl(x, y - h, wavelength)) / (2.0 * h)
        return opl, gx, gy

    def opl_hessian(self, x, y, wavelength):
        """(OPL_xx, OPL_xy, OPL_yy) via central differences."""
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        h = self._fd_step(x, y)
        _, gxxp, _ = self.opl_and_gradient(x + h, y, wavelength)
        _, gxxm, _ = self.opl_and_gradient(x - h, y, wavelength)
        _, gxyp, gyyp = self.opl_and_gradient(x, y + h, wavelength)
        _, gxym, gyym = self.opl_and_gradient(x, y - h, wavelength)
        pxx = (gxxp - gxxm) / (2.0 * h)
        pyy = (gyyp - gyym) / (2.0 * h)
        pxy = (gxyp - gxym) / (2.0 * h)
        return pxx, pxy, pyy


class LinearGrating(OPLFunc):
    """Ideal linear grating as a wavelength-dependent OPL ramp.

    period mm; g_vec the in-plane grating-vector direction; order the
    diffracted order.
    """

    def __init__(self, period, g_vec=(1.0, 0.0), order=1):
        self._period = None
        self._order = None
        self._g_vec = None
        self.period = period
        self.order = order
        self.g_vec = g_vec

    @property
    def period(self):
        """Grating period, mm."""
        return self._period

    @period.setter
    def period(self, value):
        value = float(value)
        if not onp.isfinite(value) or value <= 0.0:
            raise ValueError('grating period must be finite and positive')
        self._period = value

    @property
    def order(self):
        """Diffracted order."""
        return self._order

    @order.setter
    def order(self, value):
        value = float(value)
        if not onp.isfinite(value):
            raise ValueError('grating order must be finite')
        self._order = value

    @property
    def g_vec(self):
        """In-plane grating-vector direction (gx, gy)."""
        return self._g_vec

    @g_vec.setter
    def g_vec(self, value):
        g = onp.atleast_1d(onp.asarray(value, dtype=float)).ravel()
        if g.size == 0:
            raise ValueError('g_vec must contain at least one component')
        gx = float(g[0])
        gy = float(g[1]) if g.size > 1 else 0.0
        if not onp.isfinite(gx) or not onp.isfinite(gy):
            raise ValueError('g_vec components must be finite')
        self._g_vec = (gx, gy)

    def _gradient(self, wavelength):
        wavelength_mm = float(wavelength) * 1e-3
        scale = self.order * wavelength_mm / self.period
        return scale * self.g_vec[0], scale * self.g_vec[1]

    def opl(self, x, y, wavelength):
        """Unwrapped grating OPL ramp in millimeters."""
        gx, gy = self._gradient(wavelength)
        return gx * x + gy * y

    def opl_and_gradient(self, x, y, wavelength):
        """The OPL ramp and its constant spatial gradient."""
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        gx, gy = self._gradient(wavelength)
        opl = gx * x + gy * y
        gxa = jnp.full(jnp.shape(x), gx, dtype=x.dtype)
        gya = jnp.full(jnp.shape(x), gy, dtype=x.dtype)
        return opl, gxa, gya

    def opl_hessian(self, x, y, wavelength):
        """The Hessian of a linear ramp is zero."""
        z = jnp.zeros_like(jnp.asarray(x))
        return z, z, z

    def __repr__(self):
        order = int(self.order) if self.order.is_integer() else self.order
        return (f'LinearGrating(period={self.period!r}, '
                f'g_vec={self.g_vec!r}, order={order!r})')


class CallableOPL(OPLFunc):
    """OPLFunc backed by wavelength-aware user callables."""

    def __init__(self, opl, opl_and_gradient=None, opl_hessian=None):
        if not callable(opl):
            raise TypeError('CallableOPL requires an OPL callable')
        self._opl = opl
        self._oag = opl_and_gradient
        self._ohess = opl_hessian

    def opl(self, x, y, wavelength):
        """User OPL."""
        return self._opl(x, y, wavelength)

    def opl_and_gradient(self, x, y, wavelength):
        """User (opl, gx, gy), else finite differences."""
        if self._oag is None:
            return super().opl_and_gradient(x, y, wavelength)
        return self._oag(x, y, wavelength)

    def opl_hessian(self, x, y, wavelength):
        """User Hessian, else finite differences."""
        if self._ohess is None:
            return super().opl_hessian(x, y, wavelength)
        return self._ohess(x, y, wavelength)


__all__ = ['OPLFunc', 'LinearGrating', 'CallableOPL']
