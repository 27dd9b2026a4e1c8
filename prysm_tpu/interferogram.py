"""Interferometric data analysis: PSD, filtering, synthesis, Interferogram.

Rebuild of ``prysm/interferogram.py``.  Array math is jnp (NaN-tolerant via
masked reductions); data-dependent-shape operations (crop to valid region)
resolve their indices host-side, as befits an interactive analysis class.
Random synthesis takes explicit ``jax.random`` keys.
"""
import inspect
import warnings

import numpy as onp
import jax
import jax.numpy as jnp

from ._richdata import RichData
from .mathops import jinc
from .io import (
    read_zygo_dat,
    read_zygo_datx,
    write_zygo_ascii,
    write_zygo_dat,
)
from .fttools import forward_ft_unit, pad2d
from .coordinates import cart_to_polar, broadcast_1d_to_2d, make_xy_grid
from .polynomials import lstsq
from .util import mean, rms, pv, Sa, std  # NOQA
from .wavelengths import HeNe
from .plotting import share_fig_ax

_AX = (-2, -1)


def _rmax_square_array(r):
    loc = list(r.shape)
    loc[1] = loc[1] // 2
    loc[0] = loc[0] - 1
    return r[tuple(loc)]


def fit_plane(x, y, z):
    """Least-squares plane fit; returns the plane evaluated on (x, y)."""
    coefs = lstsq(jnp.stack([jnp.broadcast_to(x, z.shape),
                             jnp.broadcast_to(y, z.shape)]), z)
    return coefs[0] * x + coefs[1] * y


def fit_sphere(z):
    """Least-squares sphere (power) fit; returns (finite mask, sphere)."""
    x = jnp.linspace(-1, 1, z.shape[1])
    y = jnp.linspace(-1, 1, z.shape[0])
    xx, yy = jnp.meshgrid(x, y)
    pts = jnp.isfinite(z)
    rho_sq = xx * xx + yy * yy
    focus = rho_sq
    # weighted normal equations over finite points (static shapes)
    A = jnp.stack([focus.ravel(), jnp.ones_like(focus).ravel()], axis=1)
    w = pts.ravel()
    zz = jnp.where(w, z.ravel(), 0)
    Aw = A * w[:, None]
    coefs = jnp.linalg.solve(Aw.T @ A, Aw.T @ zz)
    sphere = focus * coefs[0]
    return pts, sphere


def window_2d_welch(r, alpha=8):
    """2D Welch window, 1 - |r/rmax|^alpha."""
    rmax = _rmax_square_array(r)
    return 1 - jnp.abs(r / rmax) ** alpha


def make_window(signal, dx, which=None, alpha=4):
    """Window for PSD analysis; auto-selects Welch (circular) or Hann."""
    s = signal.shape
    if which is None:
        ysamples = int(round(s[0] * 0.02, 0))
        xsamples = int(round(s[1] * 0.02, 0))
        sig = onp.asarray(signal)
        corner1 = sig[:ysamples, :xsamples] == 0
        corner2 = sig[-ysamples:, :xsamples] == 0
        corner3 = sig[:ysamples, -xsamples:] == 0
        corner4 = sig[-ysamples:, -xsamples:] == 0
        if corner1.all() and corner2.all() and corner3.all() and corner4.all():
            x, y = make_xy_grid(s, dx=dx)
            r, _ = cart_to_polar(x, y)
            which = window_2d_welch(r, alpha=alpha)
        else:
            y = jnp.hanning(s[0])
            x = jnp.hanning(s[1])
            which = jnp.outer(y, x)
    elif isinstance(which, str):
        wl = which.lower()
        if wl == 'welch':
            x, y = make_xy_grid(s, dx=dx)
            r, _ = cart_to_polar(x, y)
            which = window_2d_welch(r, alpha=alpha)
        elif wl in ('hann', 'hanning'):
            y = jnp.hanning(s[0])
            x = jnp.hanning(s[1])
            which = jnp.outer(y, x)
        else:
            raise ValueError('unknown window type')
    return which


def psd(height, dx, window=None):
    """Power spectral density (GH_FFT normalization): (ux, uy, psd)."""
    window = make_window(height, dx, window)
    ft = jnp.fft.ifftshift(jnp.fft.fft2(jnp.fft.fftshift(height * window)))
    psd_ = jnp.abs(ft) ** 2
    fs = 1 / dx
    S2 = jnp.sum(window ** 2)
    psd_ = psd_ / (S2 * fs * fs)
    ux = forward_ft_unit(dx, height.shape[1])
    uy = forward_ft_unit(dx, height.shape[0])
    ux, uy = broadcast_1d_to_2d(ux, uy)
    return ux, uy, psd_


def bandlimited_rms(r, psd, wllow=None, wlhigh=None, flow=None, fhigh=None):
    """Bandlimited RMS from a PSD between spatial periods or frequencies."""
    default_max = r.max()
    if wllow is not None or wlhigh is not None:
        # period args take precedence; this truth table reproduces the
        # reference exactly, including the quirk that a lone wllow only
        # pins the warning path, not fhigh (ref interferogram.py:190-240)
        flow = None if wlhigh is None else 1 / wlhigh
        fhigh = (default_max if wlhigh is None
                 else (1 / wllow if wllow is not None else None))
    elif flow is not None or fhigh is not None:
        flow = 0 if flow is None else flow
        fhigh = default_max if fhigh is None else fhigh
    else:
        raise ValueError('must specify either period (wavelength) or frequency')
    if flow is None:
        warnings.warn('no lower limit given, using 0 for low frequency')
        flow = 0
    if fhigh is None:
        warnings.warn('no upper limit given, using limit imposed by data.')
        fhigh = r.max()

    # frequency step from the two samples straddling the grid center
    if r.ndim == 2:
        cy, cx = (s // 2 for s in r.shape)
        df = jnp.abs(r[cy - 1, cx] - r[cy, cx])
    else:
        c = r.shape[0] // 2
        df = jnp.abs(r[c - 1] - r[c])
    band = jnp.where((r < flow) | (r > fhigh), 0, psd)
    total = jnp.trapezoid(band, dx=df, axis=0)
    if r.ndim == 2:
        total = jnp.trapezoid(total, dx=df, axis=0)
    return jnp.sqrt(total)


def abc_psd(nu, a, b, c):
    """Lorentzian PSD model a / (1 + (nu/b)^c)."""
    return a / (1 + (nu / b) ** c)


def ab_psd(nu, a, b):
    """Inverse-power PSD model a nu^-b."""
    return a * nu ** (-b)


def synthesize_surface_from_psd(psd, nu_x, nu_y, key=None):
    """Synthesize a surface height map from PSD data (random phase).

    Requires an explicit jax.random key (the reference used global numpy
    RNG state, prysm/interferogram.py:345).
    """
    if key is None:
        raise ValueError('synthesize_surface_from_psd requires a jax.random key')
    randnums = jax.random.uniform(key, psd.shape)
    randfft = jnp.fft.fft2(randnums)
    phase = jnp.angle(randfft)

    fs = -2 * nu_y[0]
    dx = dy = 1 / fs
    ny, nx = psd.shape
    x = jnp.arange(nx) * dx
    y = jnp.arange(ny) * dy
    A = x[-1] * y[-1]
    signal = (jnp.cos(phase) + 1j * jnp.sin(phase)) * jnp.sqrt(A * psd)
    coef = 1 / dx / dy
    out = jnp.fft.ifftshift(jnp.fft.ifft2(jnp.fft.fftshift(signal))) * coef
    return x, y, out.real


def render_synthetic_surface(size, samples, rms=None, mask=None,
                             psd_fcn=abc_psd, key=None, **psd_fcn_kwargs):
    """Render a synthetic surface with given RMS from a PSD model."""
    dxg = size / (samples - 1)
    nu = onp.array(forward_ft_unit(dxg, samples))  # copy; jax buffers are read-only
    center = samples // 2
    nu[center] = nu[center + 1] / 10
    nu_x = nu_y = nu
    nu_xx, nu_yy = onp.meshgrid(nu_x, nu_y)
    nu_r = onp.hypot(nu_xx, nu_yy)
    psd_ = psd_fcn(jnp.asarray(nu_r), **psd_fcn_kwargs)
    x, y, z = synthesize_surface_from_psd(psd_, nu_x, nu_y, key=key)
    if isinstance(mask, str):
        if mask.lower() != 'circle':
            raise ValueError("mask must be an array, None, or 'circle'")
        gx, gy = make_xy_grid(samples, diameter=size)
        mask = jnp.hypot(gx, gy) <= size / 2
    if mask is not None:
        z = jnp.where(mask == 0, jnp.nan, z)
    if rms is not None:
        from .util import rms as rms_fn
        z = z * (rms / rms_fn(z))
    return x, y, z


def _loglog_linear_psd_fit(f, psd):
    """Closed-form least-squares fit of ab_psd in log-log space."""
    logf = jnp.log10(f)
    logp = jnp.log10(psd)
    lf = logf - logf.mean()
    slope = (lf * (logp - logp.mean())).sum() / (lf * lf).sum()
    a = 10.0 ** (logp.mean() - slope * logf.mean())
    return a, -slope


def _abc_psd_guess(f, psd):
    """Data-derived seed for abc_psd fitting."""
    f = onp.asarray(f)
    psd = onp.asarray(psd)
    npts = psd.shape[0]
    k = max(3, npts // 10)
    a = float(onp.median(psd[:k]))
    _, c = _loglog_linear_psd_fit(jnp.asarray(f[npts // 2:]),
                                  jnp.asarray(psd[npts // 2:]))
    c = max(float(c), 0.5)
    below = onp.nonzero(psd < (a / 2))[0]
    if below.size > 0:
        b = float(f[below[0]])
    else:
        b = float(onp.sqrt(f[0] * f[-1]))
    return [a, b, c]


def fit_psd(f, psd, callable=abc_psd, guess=None, return_='coefficients'):
    """Fit PSD model parameters by log-space least squares.

    ab_psd is solved in closed form; other models use a Gauss-Newton descent
    on the log residuals implemented with jax gradients (the reference uses
    scipy least_squares, prysm/interferogram.py:467).
    """
    sig = inspect.signature(callable)
    nparams = len(sig.parameters) - 1
    f = jnp.asarray(f)
    psd = jnp.asarray(psd)
    if nparams < 3:
        f = f[5:]
        psd = psd[5:]
    D = jnp.log10(psd)

    if callable is ab_psd:
        a, b = _loglog_linear_psd_fit(f, psd)
        return onp.asarray([float(a), float(b)])

    if guess is None:
        if callable is abc_psd:
            initial_args = _abc_psd_guess(f, psd)
        else:
            initial_args = [1.0] * nparams
            initial_args[0] = 100.0
    else:
        initial_args = list(guess)

    # log-parameterized Adam-style descent: positivity for free, robust for
    # the Lorentzian family
    logx = jnp.log(jnp.asarray(initial_args, dtype=jnp.float64))

    def loss(logx):
        M = callable(f, *jnp.exp(logx))
        resid = jnp.log10(M) - D
        return jnp.sum(resid * resid)

    g = jax.grad(loss)
    lr = 0.05
    m = jnp.zeros_like(logx)
    v = jnp.zeros_like(logx)
    for i in range(500):
        gi = g(logx)
        m = 0.9 * m + 0.1 * gi
        v = 0.999 * v + 0.001 * gi * gi
        mhat = m / (1 - 0.9 ** (i + 1))
        vhat = v / (1 - 0.999 ** (i + 1))
        logx = logx - lr * mhat / (jnp.sqrt(vhat) + 1e-12)
    return onp.asarray(jnp.exp(logx))


def hann2d(M, N):
    """Rotationally-symmetric 2D Hann window."""
    n = jnp.arange(N)[None, :] - (N // 2)
    m = jnp.arange(M)[:, None] - (M // 2)
    nn = jnp.hypot(n, m)
    N2 = min(N, M)
    w = jnp.cos(jnp.pi / N2 * nn) ** 2
    return jnp.where(nn > N2 // 2, 0, w)


def ideal_lpf_iir2d(r, dx, fc_over_nyq):
    """Ideal impulse response of a 2D lowpass filter (jinc kernel)."""
    c = jnp.pi * fc_over_nyq / dx
    return jinc(r * c) * (fc_over_nyq ** 2 * jnp.pi / 2)


def designfilt2d(r, dx, fc, typ='lowpass'):
    """Design a rotationally symmetric 2D filter transfer function |H|."""
    w = hann2d(*r.shape)
    nyq = 1 / (2 * dx)
    tl = typ.lower()
    if tl in ('lp', 'lowpass'):
        h = ideal_lpf_iir2d(r, dx, fc / nyq)
        H = jnp.abs(jnp.fft.fft2(w * h))
    elif tl in ('hp', 'highpass'):
        h = ideal_lpf_iir2d(r, dx, fc / nyq)
        H = 1 - jnp.abs(jnp.fft.fft2(w * h))
    elif tl in ('bp', 'bandpass'):
        hl = ideal_lpf_iir2d(r, dx, fc[0] / nyq)
        hh = ideal_lpf_iir2d(r, dx, fc[1] / nyq)
        Hl = jnp.abs(jnp.fft.fft2(hl * w))
        Hh = 1 - jnp.abs(jnp.fft.fft2(hh * w))
        H = 1 - (Hh + Hl)
    elif tl in ('br', 'bandreject'):
        hl = ideal_lpf_iir2d(r, dx, fc[0] / nyq)
        hh = ideal_lpf_iir2d(r, dx, fc[1] / nyq)
        Hl = jnp.abs(jnp.fft.fft2(hl * w))
        Hh = 1 - jnp.abs(jnp.fft.fft2(hh * w))
        H = Hh + Hl
    else:
        raise ValueError('unknown filter type')
    return H


def make_random_subaperture_mask(shape, mask, key=None):
    """Random subaperture placement of mask within shape (explicit key)."""
    if key is None:
        raise ValueError('make_random_subaperture_mask requires a jax.random key')
    max_shift = [(s1 - s2) for s1, s2 in zip(shape, mask.shape)]
    if any(s < 0 for s in max_shift):
        raise ValueError('mask must fit inside shape')
    ky, kx = jax.random.split(key)
    dy = int(jax.random.randint(ky, (), 0, max_shift[0] + 1))
    dx = int(jax.random.randint(kx, (), 0, max_shift[1] + 1))
    out = jnp.zeros(shape, dtype=bool)
    out = out.at[dy:dy + mask.shape[0], dx:dx + mask.shape[1]].set(mask)
    return out


class Interferogram(RichData):
    """Analysis class for interferometric data (phase in nm, dx in mm)."""

    def __init__(self, phase, dx=0, wavelength=HeNe, intensity=None, meta=None):
        """phase nm; dx mm (0 = not laterally calibrated); wavelength um."""
        if not wavelength:
            if meta:
                wavelength = meta.get('wavelength', None)
                if wavelength is None:
                    wavelength = meta.get('Wavelength')
                if wavelength is not None:
                    wavelength *= 1e6  # m -> um
        super().__init__(data=phase, dx=dx, wavelength=wavelength)
        self.intensity = intensity
        self.meta = meta
        self._latcaled = dx != 0

    @property
    def dropout_percentage(self):
        """Percentage of NaN pixels."""
        return float(jnp.count_nonzero(jnp.isnan(self.data)) / self.data.size * 100)

    @property
    def pv(self):
        """Peak-to-Valley phase error (DIN/ISO St)."""
        return pv(self.data)

    @property
    def rms(self):
        """RMS phase error (DIN/ISO Sq)."""
        return rms(self.data)

    @property
    def Sa(self):
        """Sa phase error (DIN/ISO Sa)."""
        return Sa(self.data)

    @property
    def strehl(self):
        """Strehl ratio assuming the data is wavefront error."""
        wvl = self.wavelength * 1e3
        phase_variance = (2 * jnp.pi * std(self.data) / wvl) ** 2
        return jnp.exp(-phase_variance)

    @property
    def std(self):
        """Standard deviation of phase error."""
        return std(self.data)

    def pvr(self, normalization_radius=None):
        """Peak-to-Valley residual (Evans 2008): PV of Z36 fit + 3 RMS resid."""
        from .polynomials import (
            zernike_nm_seq, fringe_to_nm, lstsq as _lstsq, sum_of_2d_modes,
        )
        r = self.r
        t = self.t
        if normalization_radius is None:
            shp = self.data.shape
            if shp[0] != shp[1]:
                raise ValueError('pvr: if normalization_radius is None, data must be square')
            normalization_radius = _rmax_square_array(r)
        r = r / normalization_radius
        mask = r > 1
        data = jnp.where(mask, jnp.nan, self.data)
        nms = [fringe_to_nm(j) for j in range(1, 38)]
        basis = zernike_nm_seq(nms, r, t, norm=False)
        coefs = _lstsq(basis, data)
        projected = sum_of_2d_modes(basis, coefs)
        projected = jnp.where(mask, jnp.nan, projected)
        fit_err = data - projected
        rms_resid = rms(fit_err)
        pv_fit = pv(projected)
        return pv_fit + 3 * rms_resid

    def fill(self, _with=0):
        """Fill NaN values with a constant."""
        self.data = jnp.where(jnp.isnan(self.data), _with, self.data)
        return self

    def crop(self):
        """Crop data to the rectangle bounding the finite region (host-side)."""
        finite = onp.isfinite(onp.asarray(self.data))
        cols = onp.any(finite, axis=0)
        rows = onp.any(finite, axis=1)
        if not cols.any():
            return self
        r0, r1 = onp.nonzero(rows)[0][[0, -1]]
        c0, c1 = onp.nonzero(cols)[0][[0, -1]]
        lr = slice(int(r0), int(r1) + 1)
        tb = slice(int(c0), int(c1) + 1)
        xy = None if self._x is None else (self.x[lr, tb], self.y[lr, tb])
        rt = None if self._r is None else (self.r[lr, tb], self.t[lr, tb])
        self.data = self.data[lr, tb]
        if xy is not None:
            self._x, self._y = xy
        if rt is not None:
            self._r, self._t = rt
        return self

    def recenter(self):
        """Shift x/y so the data contains a zero sample FFT-style."""
        c = tuple(s // 2 for s in self.shape)
        x = self.x
        y = self.y
        self._x = x - x[c]
        self._y = y - y[c]
        self._r = None
        self._t = None
        return self

    def remove_piston(self):
        """Subtract the mean (piston)."""
        self.data = self.data - mean(self.data)
        return self

    def remove_tiptilt(self):
        """Subtract a least-squares plane (tip/tilt)."""
        plane = fit_plane(self.x, self.y, self.data)
        self.data = self.data - plane
        return self

    def remove_power(self):
        """Subtract a least-squares sphere (power)."""
        mask, sphere = fit_sphere(self.data)
        self.data = jnp.where(mask, self.data - sphere, self.data)
        return self

    def mask(self, mask):
        """NaN out pixels where mask is False."""
        self.data = jnp.where(mask, self.data, jnp.nan)
        return self

    def strip_latcal(self):
        """Revert to pixel units."""
        self.dx = 1.
        self._x = self._y = self._r = self._t = None
        self._latcaled = False
        return self

    def latcal(self, plate_scale):
        """Laterally calibrate with a plate scale (units per pixel)."""
        self.strip_latcal()
        self.dx = plate_scale
        self._latcaled = True
        return self

    def pad(self, value=jnp.nan, *, samples=None, shape=None):
        """Pad the data, filling the periphery with value."""
        if samples is None and shape is None:
            raise ValueError('Neither samples nor shape specified')
        if samples is not None and shape is not None:
            raise ValueError('Both samples and shape provided: only one can be given')
        if samples is not None:
            if isinstance(samples, int):
                samples = (samples, samples)
            shape = tuple(s + p for s, p in zip(self.data.shape, samples))
        self.data = pad2d(self.data, value=value, out_shape=shape)
        return self.latcal(self.dx)

    def spike_clip(self, nsigma=3):
        """NaN out points beyond nsigma standard deviations."""
        over = jnp.abs(self.data) > nsigma * self.std
        self.data = jnp.where(over, jnp.nan, self.data)
        return self

    def psd(self):
        """PSD of the data as RichData (~nm^2/mm^2)."""
        ux, uy, psd_ = psd(self.data, self.dx)
        p = RichData(psd_, 0, self.wavelength)
        p._x = ux
        p._y = uy
        p.dx = float(ux[0, 1] - ux[0, 0])
        p._default_twosided = False
        return p

    def filter(self, fc, typ='lowpass'):
        """Apply a rotationally symmetric frequency-domain filter."""
        H = designfilt2d(self.r, self.dx, fc, typ)
        D = jnp.fft.fft2(self.data)
        self.data = jnp.fft.ifft2(D * H).real
        return self

    def bandlimited_rms(self, wllow=None, wlhigh=None, flow=None, fhigh=None):
        """Bandlimited RMS from the PSD of the data."""
        p = self.psd()
        return bandlimited_rms(r=p.r, psd=p.data, wllow=wllow, wlhigh=wlhigh,
                               flow=flow, fhigh=fhigh)

    def total_integrated_scatter(self, wavelength, incident_angle=0):
        """Total integrated scatter at a wavelength (um) and AOI (deg)."""
        upper_limit = 1000 / wavelength
        kernel = 4 * jnp.pi * jnp.cos(jnp.radians(incident_angle))
        kernel = kernel * self.bandlimited_rms(fhigh=upper_limit) / wavelength
        return 1 - jnp.exp(-kernel ** 2)

    def slope(self):
        """(slope x, slope y, slope magnitude) as RichData."""
        dx = self.dx
        gy, gx = jnp.gradient(self.data, dx)
        gr = jnp.hypot(gx, gy)
        return RichData(gx, dx, None), RichData(gy, dx, None), RichData(gr, dx, None)

    def interferogram(self, visibility=1, passes=2, tilt_waves=(0, 0),
                      interpolation=None, fig=None, ax=None):
        """Plot synthetic fringes for the data."""
        import numpy as np
        data = self.data
        yramp = np.linspace(-1, 1, data.shape[0]) * (tilt_waves[1] / 2)
        xramp = np.linspace(-1, 1, data.shape[1]) * (tilt_waves[0] / 2)
        yramp = np.broadcast_to(yramp, tuple(reversed(data.shape))).T
        xramp = np.broadcast_to(xramp, data.shape)
        phase = np.asarray(self.data) / (1e3 * self.wavelength)
        phase = phase + (xramp + yramp)
        fig, ax = share_fig_ax(fig, ax)
        plotdata = visibility * np.cos(2 * np.pi * passes * phase)
        x, y = np.asarray(self.x), np.asarray(self.y)
        im = ax.imshow(plotdata,
                       extent=[x.min(), x.max(), y.min(), y.max()],
                       cmap='gray', interpolation=interpolation,
                       clim=(-1, 1), origin='lower')
        fig.colorbar(im, label='Intensity', ax=ax, fraction=0.046)
        return fig, ax

    def save_zygo_ascii(self, file):
        """Save to a Zygo ASCII file."""
        sf = 1 / (self.wavelength * 1e3)
        phase = onp.asarray(self.data) * sf
        write_zygo_ascii(file, phase=phase, dx=self.dx, intensity=None,
                         wavelength=self.wavelength)

    def save_zygo_dat(self, file):
        """Save to a Zygo binary dat file."""
        write_zygo_dat(file, phase=onp.asarray(self.data), dx=self.dx,
                       intensity=None, wavelength=self.wavelength)

    def __str__(self):
        """Pretty-print string representation."""
        z_unit = 'mm' if self._latcaled else 'px'
        diameter_y, diameter_x = self.support_y, self.support_x
        return inspect.cleandoc(f"""Interferogram with:
                Size: ({diameter_x:.3f}x{diameter_y:.3f}){z_unit}
                {float(self.pv):.3f} PV, {float(self.rms):.3f} RMS nm""")

    @staticmethod
    def from_zygo_dat(path, multi_intensity_action='first'):
        """Create an Interferogram from a Zygo dat/datx file."""
        if str(path).lower().endswith('datx'):
            zydat = read_zygo_datx(path)
            res = zydat['meta']['Lateral Resolution']
        else:
            zydat = read_zygo_dat(path, multi_intensity_action=multi_intensity_action)
            res = zydat['meta']['lateral_resolution']
        phase = zydat['phase']
        return Interferogram(phase=phase, dx=res * 1e3,
                             intensity=zydat['intensity'],
                             meta=zydat['meta'], wavelength=None)

    @staticmethod
    def render_from_psd(size, samples, rms=None, mask='circle',
                        psd_fcn=abc_psd, key=None, **psd_fcn_kwargs):
        """Render a synthetic interferogram from a PSD model."""
        x, y, z = render_synthetic_surface(size=size, samples=samples, rms=rms,
                                           mask=mask, psd_fcn=psd_fcn, key=key,
                                           **psd_fcn_kwargs)
        dx = float(x[1] - x[0])
        return Interferogram(phase=z, dx=dx, wavelength=HeNe)
