"""Tabulated n(wvl) and n(wvl, T) materials.

Rebuild of ``prysm/x/materials/tabulated.py``: validated sample tables
with linear / nearest / log / pchip interpolation and separable bilinear
temperature-grid lookup.
"""
import warnings

import numpy as np
from scipy import interpolate

from .core import BaseMaterial, MaterialRangeError, MissingKError


class MaterialData:
    """Validated wavelength, n, optional k / uncertainty samples."""

    def __init__(self, wavelengths, n, *, k=None, sigma_n=None, metadata=None):
        self.wavelengths = wavelengths.copy()
        self.n = n.copy()
        self.k = None if k is None else k.copy()
        self.sigma_n = None if sigma_n is None else sigma_n.copy()
        self.metadata = dict(metadata or {})

    @property
    def wavelength_range(self):
        """Sample range in microns."""
        return float(self.wavelengths[0]), float(self.wavelengths[-1])


def _match_query_dtype(value, query):
    dtype = getattr(query, 'dtype', None)
    if dtype is None or not np.issubdtype(dtype, np.floating):
        dtype = np.dtype(np.float64)
    if hasattr(value, 'astype'):
        return value.astype(dtype, copy=False)
    return dtype.type(value)


def _nearest_interp(x, xp, fp):
    idx = np.clip(np.searchsorted(xp, x, side='left'), 0, len(xp) - 1)
    left = np.clip(idx - 1, 0, len(xp) - 1)
    choose_left = np.abs(x - xp[left]) <= np.abs(x - xp[idx])
    return fp[np.where(choose_left, left, idx)]


def _linear_interp(x, xp, fp, extrapolate):
    out = _match_query_dtype(np.interp(x, xp, fp), x)
    if not extrapolate or len(xp) < 2:
        return out
    lslope = (fp[1] - fp[0]) / (xp[1] - xp[0])
    rslope = (fp[-1] - fp[-2]) / (xp[-1] - xp[-2])
    left = fp[0] + np.subtract(x, xp[0]) * lslope
    right = fp[-1] + np.subtract(x, xp[-1]) * rslope
    out = np.where(np.less(x, xp[0]), left, out)
    out = np.where(np.greater(x, xp[-1]), right, out)
    return out


def _interp1d(x, xp, fp, method, extrapolate):
    if method == 'linear':
        return _linear_interp(x, xp, fp, extrapolate)
    if method == 'nearest':
        return _nearest_interp(x, xp, fp)
    if method == 'log':
        if np.any(fp <= 0):
            raise ValueError('log interpolation requires positive samples')
        return np.exp(_linear_interp(x, xp, np.log(fp), extrapolate))
    if method == 'pchip':
        pchip = interpolate.PchipInterpolator(xp, fp, extrapolate=extrapolate)
        return _match_query_dtype(pchip(x), x)
    raise ValueError(
        "interpolation method must be 'linear', 'nearest', 'pchip', or 'log'")


def _normalize_interp_method(method):
    key = str(method).lower()
    if key not in ('linear', 'nearest', 'pchip', 'log'):
        raise ValueError(
            "interpolation method must be 'linear', 'nearest', 'pchip', or 'log'")
    return key


def _validate_axis(values, name):
    if not np.all(np.isfinite(values)):
        raise ValueError(f'{name} must contain only finite values')
    if np.any(values <= 0):
        raise ValueError(f'{name} must be positive')
    if values.size > 1 and np.any(np.diff(values) <= 0):
        raise ValueError(
            f'{name} must be strictly increasing with no duplicates')


def _validate_samples(wavelengths, n, k, sigma_n, sigma_k):
    if wavelengths.ndim != 1:
        raise ValueError('wavelengths must be a 1D array')
    if wavelengths.size == 0:
        raise ValueError('wavelengths must contain at least one value')
    _validate_axis(wavelengths, 'wavelengths')
    if n.shape != wavelengths.shape:
        raise ValueError('n samples must match wavelengths')
    if not np.all(np.isfinite(n)):
        raise ValueError('n samples must contain only finite values')
    for label, arr in (('k', k), ('sigma_n', sigma_n), ('sigma_k', sigma_k)):
        if arr is None:
            continue
        if arr.shape != wavelengths.shape:
            raise ValueError(f'{label} samples must match wavelengths')
        if not np.all(np.isfinite(arr)):
            raise ValueError(f'{label} samples must contain only finite values')
    if k is not None and np.any(k < 0):
        raise ValueError('k must be nonnegative')


class TabulatedMaterial(BaseMaterial):
    """Material with tabulated n(wvl) and optional k(wvl)."""

    def __init__(self, name, wavelengths, n, *, k=None,
                 interpolation='linear', n_interpolation=None,
                 k_interpolation=None, sigma_n=None, sigma_k=None,
                 extrapolate=False, method=None, k_zero_policy='raise',
                 **kwargs):
        missing_k = kwargs.pop('missing_k', 'zero' if k is None else 'raise')
        wavelengths = np.array(wavelengths, dtype=np.float64)
        n = np.array(n, dtype=np.float64)
        k = None if k is None else np.array(k, dtype=np.float64)
        sigma_n = None if sigma_n is None else np.array(sigma_n, dtype=np.float64)
        sigma_k = None if sigma_k is None else np.array(sigma_k, dtype=np.float64)
        _validate_samples(wavelengths, n, k, sigma_n, sigma_k)
        if wavelengths.size < 2 and (method or interpolation) != 'nearest':
            raise ValueError(
                'at least two samples are required for interpolation')
        if method is not None:
            interpolation = method
        interpolation = _normalize_interp_method(interpolation)
        n_interpolation = _normalize_interp_method(n_interpolation or interpolation)
        k_interpolation = _normalize_interp_method(k_interpolation or interpolation)
        if k_zero_policy not in ('raise', 'linear'):
            raise ValueError("k_zero_policy must be 'raise' or 'linear'")
        if (k_interpolation == 'log' and k is not None and np.any(k == 0)
                and k_zero_policy == 'raise'):
            raise ValueError(
                "log interpolation for k requires positive k samples; set "
                "k_zero_policy='linear' to handle zeros explicitly")
        metadata = dict(kwargs.pop('metadata', {}) or {})
        if extrapolate:
            metadata['extrapolate_wavelength'] = True
        metadata.update({
            'method': n_interpolation,
            'extrapolate': bool(extrapolate),
            'missing_k': missing_k,
            'k_zero_policy': k_zero_policy,
        })
        wavelength_range = kwargs.pop(
            'wavelength_range', (float(wavelengths[0]), float(wavelengths[-1])))
        super().__init__(name, wavelength_range=wavelength_range,
                         metadata=metadata, missing_k=missing_k, **kwargs)
        self.wavelengths = wavelengths
        self.n_samples = n
        self.k_samples = k
        self.sigma_n = sigma_n
        self.sigma_k = sigma_k
        self.n_interpolation = n_interpolation
        self.k_interpolation = k_interpolation
        self.method = n_interpolation
        self.k_zero_policy = k_zero_policy
        self.extrapolate = extrapolate
        self.data = MaterialData(wavelengths, n, k=k, sigma_n=sigma_n,
                                 metadata=metadata)
        self.fit_report = None

    def _check_wavelength(self, wvl):
        if self.metadata.get('extrapolate_wavelength'):
            return
        lo, hi = self.wavelength_range
        if np.any(np.less(wvl, lo) | np.greater(wvl, hi)):
            raise MaterialRangeError(
                f'wavelength for {self.name} outside material range '
                f'{lo:g} to {hi:g} um')

    def n(self, wvl_um, temperature=None):
        """Interpolated real index."""
        self._check_wavelength(wvl_um)
        self._check_temperature(temperature)
        return _interp1d(wvl_um, self.wavelengths, self.n_samples,
                         self.n_interpolation, self.extrapolate)

    def k(self, wvl_um, temperature=None):
        """Interpolated extinction coefficient."""
        self._check_wavelength(wvl_um)
        self._check_temperature(temperature)
        if self.k_samples is None:
            if self.missing_k == 'raise':
                raise MissingKError(f'material {self.name} has no k samples')
            return self._missing_k(wvl_um)
        method = self.k_interpolation
        if (method == 'log' and np.any(self.k_samples == 0)
                and self.k_zero_policy == 'linear'):
            method = 'linear'
        return _interp1d(wvl_um, self.wavelengths, self.k_samples, method,
                         self.extrapolate)


def _coerce_temperature_grid(grid, temperatures, wavelengths, label,
                             layout=None):
    if grid is None:
        return None
    arr = np.array(grid, dtype=np.float64)
    tw = (len(temperatures), len(wavelengths))
    wt = (len(wavelengths), len(temperatures))
    if tw == wt and arr.shape == tw:
        if layout == ('wavelength', 'temperature'):
            return arr.T
        return arr
    if arr.shape == tw:
        return arr
    if arr.shape == wt:
        return arr.T
    raise ValueError(f'{label} grid must have shape temperature x wavelength')


def _bracket(xp, x, extrapolate):
    """Bracketing indices + fraction; clamped unless extrapolating."""
    if xp.shape[0] == 1:
        return 0, 0, x * 0
    idx = np.clip(np.searchsorted(xp, x, side='right'), 1, xp.shape[0] - 1)
    x0 = xp[idx - 1]
    frac = (x - x0) / (xp[idx] - x0)
    if not extrapolate:
        frac = np.clip(frac, 0.0, 1.0)
    return idx - 1, idx, frac


def _interp_grid(wavelengths, temperatures, grid, wvl, temp, extrapolate):
    """Separable bilinear grid interpolation, vectorized over queries."""
    wvl_b, temp_b = np.broadcast_arrays(wvl, temp)
    w = np.reshape(wvl_b, (-1,))
    t = np.reshape(temp_b, (-1,))
    iw0, iw1, fw = _bracket(wavelengths, w, extrapolate)
    it0, it1, ft = _bracket(temperatures, t, extrapolate)
    g0 = grid[it0, iw0] + (grid[it0, iw1] - grid[it0, iw0]) * fw
    g1 = grid[it1, iw0] + (grid[it1, iw1] - grid[it1, iw0]) * fw
    out = g0 + (g1 - g0) * ft
    if hasattr(out, 'astype'):
        out = out.astype(grid.dtype, copy=False)
    return np.reshape(out, wvl_b.shape)


class TemperatureGridMaterial(BaseMaterial):
    """Material with n(wvl, T) samples on a wavelength-temperature grid."""

    def __init__(self, name, wavelengths, temperatures, n, *, k=None,
                 dn_dlambda=None, dn_dT=None, sigma_n=None,
                 extrapolate=False, layout=None, **kwargs):
        missing_k = kwargs.pop('missing_k', 'zero' if k is None else 'raise')
        wavelengths = np.array(wavelengths, dtype=np.float64)
        temperatures = np.array(temperatures, dtype=np.float64)
        if wavelengths.ndim != 1:
            raise ValueError('wavelengths must be a 1D array')
        if temperatures.ndim != 1:
            raise ValueError('temperatures must be a 1D array')
        w_order = np.argsort(wavelengths)
        t_order = np.argsort(temperatures)
        wavelengths = wavelengths[w_order]
        temperatures = temperatures[t_order]
        _validate_axis(wavelengths, 'wavelengths')
        _validate_axis(temperatures, 'temperatures')
        if layout is None and len(wavelengths) == len(temperatures):
            warnings.warn(
                f'{name} grid is square; assuming (temperature, wavelength) '
                "layout. Pass layout=('temperature', 'wavelength') or "
                "('wavelength', 'temperature') to disambiguate.",
                stacklevel=2)

        def coerce(g, label):
            g = _coerce_temperature_grid(g, temperatures, wavelengths, label,
                                         layout)
            return None if g is None else g[t_order][:, w_order]

        n_grid = coerce(n, 'n')
        k_grid = coerce(k, 'k')
        dn_dlambda_grid = coerce(dn_dlambda, 'dn_dlambda')
        dn_dT_grid = coerce(dn_dT, 'dn_dT')
        sigma_n_grid = coerce(sigma_n, 'sigma_n')

        metadata = dict(kwargs.pop('metadata', {}) or {})
        if extrapolate:
            metadata['extrapolate_wavelength'] = True
            metadata['extrapolate_temperature'] = True
        wavelength_range = kwargs.pop(
            'wavelength_range', (float(wavelengths[0]), float(wavelengths[-1])))
        temperature_range = kwargs.pop(
            'temperature_range',
            (float(temperatures[0]), float(temperatures[-1])))
        super().__init__(name, wavelength_range=wavelength_range,
                         temperature_range=temperature_range,
                         metadata=metadata, missing_k=missing_k, **kwargs)
        self.wavelengths = wavelengths
        self.temperatures = temperatures
        self.n_grid = n_grid
        self.k_grid = k_grid
        self.dn_dlambda_grid = dn_dlambda_grid
        self.dn_dT_grid = dn_dT_grid
        self.sigma_n = sigma_n_grid
        self.extrapolate = extrapolate

    def _temperature(self, temperature):
        if temperature is None:
            if len(self.temperatures) == 1:
                return self.temperatures[0]
            raise ValueError(f'temperature is required for {self.name}')
        return temperature

    def n(self, wvl_um, temperature=None):
        """Bilinear n(wvl, T)."""
        temp = self._temperature(temperature)
        self._check_wavelength(wvl_um)
        self._check_temperature(temp)
        return _interp_grid(self.wavelengths, self.temperatures, self.n_grid,
                            wvl_um, temp, self.extrapolate)

    def k(self, wvl_um, temperature=None):
        """Bilinear k(wvl, T), or the missing-k policy."""
        temp = self._temperature(temperature)
        self._check_wavelength(wvl_um)
        self._check_temperature(temp)
        if self.k_grid is None:
            if self.missing_k == 'raise':
                raise MissingKError(f'material {self.name} has no k grid')
            wvl_b, temp_b = np.broadcast_arrays(wvl_um, temp)
            return np.zeros(wvl_b.shape, dtype=self.n_grid.dtype) + temp_b * 0
        return _interp_grid(self.wavelengths, self.temperatures, self.k_grid,
                            wvl_um, temp, self.extrapolate)

    def dn_dlambda(self, wvl_um, temperature=None):
        """Measured dn/dwvl if gridded, else finite differences."""
        if self.dn_dlambda_grid is None:
            return super().dn_dlambda(wvl_um, temperature=temperature)
        temp = self._temperature(temperature)
        self._check_wavelength(wvl_um)
        self._check_temperature(temp)
        return _interp_grid(self.wavelengths, self.temperatures,
                            self.dn_dlambda_grid, wvl_um, temp,
                            self.extrapolate)

    def dn_dT(self, wvl_um, temperature):
        """Measured dn/dT if gridded, else finite differences."""
        if self.dn_dT_grid is None:
            return super().dn_dT(wvl_um, temperature)
        self._check_wavelength(wvl_um)
        self._check_temperature(temperature)
        return _interp_grid(self.wavelengths, self.temperatures,
                            self.dn_dT_grid, wvl_um, temperature,
                            self.extrapolate)
