"""RichData container and Slices azimuthal-statistics views.

Rebuild of ``prysm/_richdata.py``.  RichData is a host-side convenience
wrapper over a device array — it never appears inside jitted hot loops
(those operate on raw arrays); it exists for the analysis/plotting surface
of the library.  Interpolation uses the package's own bilinear lookup so no
scipy round-trip (or host transfer) is required.
"""
import copy
from numbers import Number  # NOQA
from collections.abc import Iterable

import jax
import jax.numpy as jnp

from .coordinates import (
    make_xy_grid,
    cart_to_polar,
    polar_to_cart,
    optimize_xy_separable,
    uniform_cart_to_polar,
    _bilinear_lookup,
)


def fix_interp_pair(x, y):
    """Ensure x, y have the same shape; scalars broadcast against iterables."""
    if y is None:
        y = 0
    if x is None:
        x = 0
    if isinstance(x, Iterable) and not isinstance(y, Iterable):
        y = [y] * len(x)
    elif isinstance(y, Iterable) and not isinstance(x, Iterable):
        x = [x] * len(y)
    return x, y


class RichData:
    """2D data + sample spacing + wavelength with lazy coordinate grids."""

    _default_twosided = True

    def __init__(self, data, dx, wavelength):
        """data: 2D array; dx: sample spacing; wavelength: um (or None)."""
        self.data = data
        self.dx = dx
        self.wavelength = wavelength
        self._x = self._y = self._r = self._t = None

    @property
    def data(self):
        """The underlying array."""
        return self._data

    @data.setter
    def data(self, d):
        self._data = jnp.asarray(d) if d is not None else None
        self._x = self._y = self._r = self._t = None

    @property
    def shape(self):
        """Proxy to data shape."""
        return self.data.shape

    @property
    def size(self):
        """Proxy to data size."""
        return self.data.size

    @property
    def x(self):
        """X coordinate grid, lazily built."""
        if self._x is None:
            self._x, self._y = make_xy_grid(self.shape, dx=self.dx)
        return self._x

    @x.setter
    def x(self, value):
        """Replace the X grid; derived polar grids invalidate (ref
        _richdata.py:101-106; lookups here are stateless so there is no
        interpolator cache to clear)."""
        self._x = value
        self._r = self._t = None

    @property
    def y(self):
        """Y coordinate grid, lazily built."""
        if self._y is None:
            self._x, self._y = make_xy_grid(self.shape, dx=self.dx)
        return self._y

    @y.setter
    def y(self, value):
        """Replace the Y grid; derived polar grids invalidate."""
        self._y = value
        self._r = self._t = None

    @property
    def r(self):
        """Radial coordinate grid, lazily built."""
        if self._r is None:
            self._r, self._t = cart_to_polar(self.x, self.y)
        return self._r

    @r.setter
    def r(self, value):
        self._r = value

    @property
    def t(self):
        """Azimuthal coordinate grid, lazily built."""
        if self._t is None:
            self._r, self._t = cart_to_polar(self.x, self.y)
        return self._t

    @t.setter
    def t(self, value):
        self._t = value

    @property
    def support_x(self):
        """Width of the domain along x."""
        return self.shape[1] * self.dx

    @property
    def support_y(self):
        """Width of the domain along y."""
        return self.shape[0] * self.dx

    @property
    def support(self):
        """Maximum width of the domain."""
        return max((self.support_x, self.support_y))

    def copy(self):
        """Return a (deep) copy of this instance."""
        return copy.deepcopy(self)

    def slices(self, twosided=None):
        """Create a Slices instance from this instance."""
        if twosided is None:
            twosided = self._default_twosided
        x, y = self.x, self.y
        return Slices(data=self.data, x=x[0], y=y[..., 0], twosided=twosided)

    def _lookup(self, x, y):
        xg, yg = optimize_xy_separable(self.x, self.y)
        xv = xg.ravel()
        yv = yg.ravel()
        cols = (jnp.asarray(x) - xv[0]) / self.dx
        rows = (jnp.asarray(y) - yv[0]) / self.dx
        return _bilinear_lookup(self.data, rows, cols)

    def exact_polar(self, rho, phi=None):
        """Data at the specified (rho, phi) coordinate pairs (bilinear)."""
        rho, phi = fix_interp_pair(rho, phi)
        x, y = polar_to_cart(jnp.asarray(rho), jnp.asarray(phi))
        return self._lookup(x, y)

    def exact_xy(self, x, y=None):
        """Data at the specified (x, y) coordinate pairs (bilinear)."""
        x, y = fix_interp_pair(x, y)
        return self._lookup(jnp.asarray(x), jnp.asarray(y))

    def exact_x(self, x):
        """Data along the y=0 slice at exact x coordinates."""
        return self.exact_xy(x, 0)

    def exact_y(self, y):
        """Data along the x=0 slice at exact y coordinates."""
        return self.exact_xy(0, y)

    def astype(self, dtype):
        """Return a copy of self with data cast to dtype."""
        out = self.copy()
        out.data = self.data.astype(dtype)
        return out

    def plot2d(self, xlim=None, ylim=None, clim=None, cmap=None,
               log=False, power=1, interpolation=None,
               show_colorbar=True, colorbar_label=None, extend='both',
               axis_labels=(None, None), zorder=3, fig=None, ax=None):
        """Plot the data as an image with spatial extent (ref _richdata.py:311)."""
        import numpy as np
        from numbers import Number
        from matplotlib import colors
        from .plotting import share_fig_ax
        if isinstance(xlim, Number):
            xlim = (-xlim, xlim)
        if isinstance(ylim, Number):
            ylim = (-ylim, ylim)
        fig, ax = share_fig_ax(fig, ax)
        data = np.asarray(self.data)
        if log:
            norm = colors.LogNorm()
        elif power != 1:
            norm = colors.PowerNorm(power)
        else:
            norm = None
        extx = self.support_x / 2
        exty = self.support_y / 2
        im = ax.imshow(data, extent=[-extx, extx, -exty, exty], cmap=cmap,
                       norm=norm, clim=clim, origin='lower',
                       interpolation=interpolation, zorder=zorder)
        if show_colorbar:
            fig.colorbar(im, ax=ax, label=colorbar_label, fraction=0.046,
                         extend=extend)
        ax.set(xlabel=axis_labels[0], ylabel=axis_labels[1], xlim=xlim, ylim=ylim)
        return fig, ax


def _richdata_flatten(rd):
    return (rd._data,), (rd.dx, rd.wavelength)


def _richdata_unflatten(aux, children):
    rd = RichData.__new__(RichData)
    rd._data = children[0]
    rd.dx, rd.wavelength = aux
    rd._x = rd._y = rd._r = rd._t = None
    return rd


# RichData is a pytree (data is the leaf; dx/wavelength are static
# metadata), so jitted functions can return it and tree_map works on it.
# Subclasses (Interferogram) carry more host state and stay host-side.
jax.tree_util.register_pytree_node(RichData, _richdata_flatten,
                                   _richdata_unflatten)


class Slices:
    """x/y cuts and azimuthal statistics of a 2D array."""

    def __init__(self, data, x, y, twosided=True):
        """data 2D; x, y 1D coordinate vectors; twosided controls extents."""
        self._source = data
        self._source_polar = None
        self._r = None
        self._p = None
        self._x = x
        self._y = y
        self.center_y = int(jnp.argmin(jnp.abs(y)))
        self.center_x = int(jnp.argmin(jnp.abs(x)))
        self.twosided = twosided

    def check_polar_calculated(self):
        """Ensure the polar representation of the source data is computed."""
        if self._source_polar is None:
            rho, phi, polar = uniform_cart_to_polar(self._x, self._y, self._source)
            self._r, self._p = rho, phi
            self._source_polar = polar

    @property
    def x(self):
        """(x coords, data) along the y=0 slice."""
        if self.twosided:
            return self._x, self._source[self.center_y, :]
        return (self._x[self.center_x:],
                self._source[self.center_y, self.center_x:])

    @property
    def y(self):
        """(y coords, data) along the x=0 slice."""
        if self.twosided:
            return self._y, self._source[:, self.center_x]
        return (self._y[self.center_y:],
                self._source[self.center_y:, self.center_x])

    @property
    def azavg(self):
        """(rho, azimuthal average)."""
        self.check_polar_calculated()
        return self._r, jnp.nanmean(self._source_polar, axis=0)

    @property
    def azmedian(self):
        """(rho, azimuthal median)."""
        self.check_polar_calculated()
        return self._r, jnp.nanmedian(self._source_polar, axis=0)

    @property
    def azmin(self):
        """(rho, azimuthal minimum)."""
        self.check_polar_calculated()
        return self._r, jnp.nanmin(self._source_polar, axis=0)

    @property
    def azmax(self):
        """(rho, azimuthal maximum)."""
        self.check_polar_calculated()
        return self._r, jnp.nanmax(self._source_polar, axis=0)

    @property
    def azpv(self):
        """(rho, azimuthal peak-to-valley)."""
        r, mx = self.azmax
        _, mn = self.azmin
        return r, mx - mn

    @property
    def azvar(self):
        """(rho, azimuthal variance)."""
        self.check_polar_calculated()
        return self._r, jnp.nanvar(self._source_polar, axis=0)

    @property
    def azstd(self):
        """(rho, azimuthal standard deviation)."""
        self.check_polar_calculated()
        return self._r, jnp.nanstd(self._source_polar, axis=0)

    def plot(self, slices, lw=None, alpha=None, zorder=None, invert_x=False,
             xlim=(None, None), xscale='linear',
             ylim=(None, None), yscale='log',
             show_legend=True, axis_labels=(None, None),
             fig=None, ax=None):
        """Plot named slices ('x', 'y', 'azavg', ...) on shared axes.

        lw/alpha/zorder may be scalars (applied to every slice) or
        sequences parallel to ``slices``; a scalar ``xlim`` means
        (-xlim, xlim) when the slices are two-sided (reference
        prysm/_richdata.py:587-690).
        """
        import numpy as np
        from numbers import Number
        from .plotting import share_fig_ax

        if isinstance(slices, str):
            slices = [slices]
        if alpha is None or isinstance(alpha, Number):
            alpha = [alpha] * len(slices)
        if lw is None or isinstance(lw, Number):
            lw = [lw or 2] * len(slices)
        if zorder is None or isinstance(zorder, int):
            zorder = [zorder or 3] * len(slices)
        if not hasattr(xlim, '__iter__') and self.twosided:
            xlim = (-xlim, xlim)

        fig, ax = share_fig_ax(fig, ax)
        for slice_, alpha_, lw_, zorder_ in zip(slices, alpha, lw, zorder):
            u, v = getattr(self, slice_)
            u = np.asarray(u).copy()
            v = np.asarray(v).copy()
            if invert_x:
                # 1/u explodes at DC; blank those samples instead
                zeros = np.abs(u) < 1e-9
                u[zeros] = np.nan
                v[zeros] = np.nan
                u = 1 / u
            ax.plot(u, v, lw=lw_, alpha=alpha_, zorder=zorder_, label=slice_)
        if show_legend:
            ax.legend(title='Slice')
        ax.set(xscale=xscale, xlim=xlim, yscale=yscale, ylim=ylim,
               xlabel=axis_labels[0], ylabel=axis_labels[1])
        if invert_x:
            ax.invert_xaxis()
        return fig, ax
