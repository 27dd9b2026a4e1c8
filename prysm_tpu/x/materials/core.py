"""Material protocol, records, and the shared material base class.

Rebuild of ``prysm/x/materials/core.py``.  Wavelengths are microns,
temperatures Kelvin, complex index n + 1j*k.  Materials are host-side
metadata objects whose ``n``/``k`` evaluate through numpy (float64) — the
trace/thin-film consumers pull scalars or small vectors out of them at
setup time, outside jit, so there is nothing to accelerate here.
"""
import inspect

import numpy as np



class MaterialRangeError(ValueError):
    """A material was evaluated outside its valid range."""


class MissingKError(ValueError):
    """Extinction data was requested but is not available."""


def _normalize_name(name):
    return ''.join(ch for ch in str(name).strip().upper() if ch not in '-_ ')


def _range_contains(outer, inner):
    if outer is None or inner is None:
        return False
    lo, hi = outer
    ilo, ihi = inner
    if None in (lo, hi, ilo, ihi):
        return False
    return lo <= ilo and hi >= ihi


def _accepts_temperature(func):
    if func is None:
        return False
    try:
        sig = inspect.signature(func)
    except (TypeError, ValueError):
        return False
    for p in sig.parameters.values():
        if p.kind is inspect.Parameter.VAR_KEYWORD:
            return True
        if p.name == 'temperature' and p.kind in (
                inspect.Parameter.KEYWORD_ONLY,
                inspect.Parameter.POSITIONAL_OR_KEYWORD):
            return True
    return False


def _validate_range(values, valid_range, label, name):
    if valid_range is None:
        return
    lo, hi = valid_range
    if lo is None and hi is None:
        return
    out = False
    if lo is not None:
        out = out | np.less(values, lo)
    if hi is not None:
        out = out | np.greater(values, hi)
    if np.any(out):
        if lo is None:
            text = f'<= {hi:g}'
        elif hi is None:
            text = f'>= {lo:g}'
        else:
            text = f'{lo:g} to {hi:g}'
        raise MaterialRangeError(
            f'{label} for {name} is outside valid range {text}')


def _user_page_info(material):
    wr = material.wavelength_range
    lo, hi = wr if wr is not None else (None, None)
    meta = material.metadata
    catalog = material.catalog
    return {
        'shelf': 'user',
        'book': catalog or 'USER',
        'page': material.name,
        'filepath': material.source or '',
        'catalog': catalog or 'USER',
        'rangeMin': lo,
        'rangeMax': hi,
        'model': meta.get('model', meta.get('method')),
    }


class MaterialProtocol:
    """Duck-typed material interface: n / k / nk of (wvl_um, temperature)."""

    def n(self, wvl_um, temperature=None):
        """Real refractive index at wavelength in microns."""

    def k(self, wvl_um, temperature=None):
        """Extinction coefficient at wavelength in microns."""

    def nk(self, wvl_um, temperature=None):
        """Complex refractive index n + 1j*k."""

    def __call__(self, wvl_um):
        """Alias for n(wvl_um)."""


class MaterialRecord:
    """Metadata-only catalog entry with a lazy loader."""

    __slots__ = ('name', 'catalog', 'variant', 'aliases', 'source',
                 'citation', 'license', 'wavelength_range',
                 'temperature_range', 'process', 'material_class',
                 'metadata', 'loader', 'material_id')

    def __init__(self, name, *, catalog=None, variant=None, aliases=(),
                 source=None, citation=None, license=None,
                 wavelength_range=None, temperature_range=None, process=None,
                 material_class=None, metadata=None, loader=None,
                 material_id=None):
        self.name, self.catalog, self.variant = name, catalog, variant
        self.aliases = tuple(aliases) if aliases is not None else ()
        self.source, self.citation = source, citation
        self.license = license
        self.wavelength_range = wavelength_range
        self.temperature_range = temperature_range
        self.process, self.loader = process, loader
        self.metadata = {} if metadata is None else dict(metadata)
        if material_class is None:
            material_class = self.metadata.get('material_class')
        self.material_class = material_class
        if material_id is None:
            material_id = ':'.join(str(p) for p in (catalog, name, variant) if p)
        self.material_id = material_id

    def load(self):
        """Instantiate (or return) the material this record describes."""
        if self.loader is None:
            raise ValueError(f'material record {self.name!r} has no loader')
        return self.loader()

    def names_for_match(self):
        """Name, variant, and aliases used for normalized lookup."""
        names = [self.name]
        if self.variant:
            names.append(self.variant)
        names.extend(self.aliases)
        return tuple(names)


class BaseMaterial:
    """Shared metadata, range validation, and derived optical metrics."""

    def __init__(self, name, *, catalog=None, variant=None, source=None,
                 citation=None, license=None, wavelength_range=None,
                 temperature_range=None, process=None, metadata=None,
                 missing_k='zero'):
        if missing_k not in ('zero', 'raise'):
            raise ValueError("missing_k must be 'zero' or 'raise'")
        self.name = name
        self.catalog = catalog
        self.variant = variant
        self.source = source
        self.citation = citation
        self.license = license
        self.wavelength_range = wavelength_range
        self.temperature_range = temperature_range
        self.process = process
        self.metadata = dict(metadata or {})
        self.missing_k = missing_k
        self._page_info_builder = _user_page_info

    def __call__(self, wvl_um):
        """Alias for n(wvl_um)."""
        return self.n(wvl_um)

    @property
    def page_info(self):
        """Provenance view derived from this material's attributes."""
        return self._page_info_builder(self)

    def _check_wavelength(self, wvl):
        if self.metadata.get('extrapolate_wavelength'):
            return
        _validate_range(wvl, self.wavelength_range, 'wavelength', self.name)

    def _check_temperature(self, temperature):
        if temperature is None or self.metadata.get('extrapolate_temperature'):
            return
        _validate_range(temperature, self.temperature_range, 'temperature',
                        self.name)

    def _missing_k(self, wvl_um):
        if self.missing_k == 'raise':
            raise MissingKError(
                f'extinction data k is not available for {self.name}')
        if np.isscalar(wvl_um):
            return wvl_um * 0
        if hasattr(wvl_um, 'shape'):
            return np.zeros_like(wvl_um)
        return np.zeros(np.shape(wvl_um), dtype=np.float64)

    def k(self, wvl_um, temperature=None):
        """Extinction coefficient, or the configured missing-k policy."""
        self._check_wavelength(wvl_um)
        self._check_temperature(temperature)
        return self._missing_k(wvl_um)

    def nk(self, wvl_um, temperature=None):
        """Complex refractive index n + 1j*k."""
        return (self.n(wvl_um, temperature=temperature)
                + 1j * self.k(wvl_um, temperature=temperature))

    def n_at(self, wvl_um, temperature=None):
        """n at one wavelength; registry-search convenience."""
        return self.n(wvl_um, temperature=temperature)

    def dispersion(self, wvl1_um, wvl2_um, temperature=None):
        """n(wvl1) - n(wvl2)."""
        return (self.n(wvl1_um, temperature=temperature)
                - self.n(wvl2_um, temperature=temperature))

    def partial_dispersion(self, wvl1_um, wvl2_um, wvl3_um, wvl4_um,
                           temperature=None):
        """(n1 - n2) / (n3 - n4)."""
        return (self.dispersion(wvl1_um, wvl2_um, temperature=temperature)
                / self.dispersion(wvl3_um, wvl4_um, temperature=temperature))

    def abbe(self, wvl_short_um, wvl_center_um, wvl_long_um, temperature=None):
        """Abbe-like number for arbitrary line choices."""
        nc = self.n(wvl_center_um, temperature=temperature)
        ns = self.n(wvl_short_um, temperature=temperature)
        nl = self.n(wvl_long_um, temperature=temperature)
        return (nc - 1) / (ns - nl)

    def _central_difference(self, evaluate, x, h_floor, valid_range,
                            extrapolate):
        """Range-clamped central difference (one-sided at band edges)."""
        h = np.maximum(np.abs(x) * 1e-6, h_floor)
        hi_pt = np.add(x, h)
        lo_pt = np.subtract(x, h)
        if valid_range is not None and not extrapolate:
            lo, hi = valid_range
            if hi is not None:
                hi_pt = np.minimum(hi_pt, hi)
            if lo is not None:
                lo_pt = np.maximum(lo_pt, lo)
        num = evaluate(hi_pt) - evaluate(lo_pt)
        den = hi_pt - lo_pt
        return np.where(den == 0, 0.0, num / np.where(den == 0, 1.0, den))

    def dn_dlambda(self, wvl_um, temperature=None):
        """Finite-difference dn/dwvl."""
        return self._central_difference(
            lambda w: self.n(w, temperature=temperature), wvl_um, 1e-6,
            self.wavelength_range, self.metadata.get('extrapolate_wavelength'))

    def dn_dT(self, wvl_um, temperature):
        """Finite-difference dn/dT."""
        return self._central_difference(
            lambda t: self.n(wvl_um, temperature=t), temperature, 1e-3,
            self.temperature_range, self.metadata.get('extrapolate_temperature'))

    def record(self, *, loader=None, catalog=None):
        """Create a metadata record for this material."""
        if loader is None:
            loader = lambda: self  # NOQA: E731
        return MaterialRecord(
            name=self.name,
            catalog=self.catalog if catalog is None else catalog,
            variant=self.variant,
            aliases=tuple(self.metadata.get('aliases', ())),
            source=self.source,
            citation=self.citation,
            license=self.license,
            wavelength_range=self.wavelength_range,
            temperature_range=self.temperature_range,
            process=self.process,
            material_class=self.metadata.get('material_class',
                                             type(self).__name__),
            metadata=dict(self.metadata),
            loader=loader,
        )


def _const_like(wvl_um, value):
    if np.isscalar(wvl_um):
        return wvl_um * 0 + value
    if hasattr(wvl_um, 'shape'):
        return np.zeros_like(wvl_um) + value
    return np.zeros(np.shape(wvl_um), dtype=np.float64) + value


class ConstantMaterial(BaseMaterial):
    """Material with constant n and optional constant k."""

    def __init__(self, n, *, name=None, k=None, **kwargs):
        n = float(n)
        if np.isfinite(n) is False:
            raise ValueError('the constant index n must be finite')
        if k is not None:
            k = float(k)
            if k < 0 or not np.isfinite(k):
                raise ValueError('the constant k must be finite and >= 0')
        missing_k = kwargs.pop('missing_k',
                               'raise' if k is not None else 'zero')
        super().__init__(name if name is not None else f'const_{n:g}',
                         missing_k=missing_k, **kwargs)
        self.n_value, self.k_value = n, k
        self.index = n
        self.extinction = k if k is not None else 0.0
        self.fit_report = None
        self.metadata.setdefault('model', 'constant')
        self.metadata.setdefault('extrapolate', True)

    def n(self, wvl_um, temperature=None):
        """Constant real index, shaped like the query."""
        self._check_wavelength(wvl_um)
        self._check_temperature(temperature)
        return _const_like(wvl_um, self.n_value)

    def k(self, wvl_um, temperature=None):
        """Constant extinction, shaped like the query."""
        self._check_wavelength(wvl_um)
        self._check_temperature(temperature)
        if self.k_value is None:
            return self._missing_k(wvl_um)
        return _const_like(wvl_um, self.k_value)


class FormulaMaterial(BaseMaterial):
    """Material backed by a dispersion-formula callable."""

    def __init__(self, name, formula, coefficients=(), *, k_formula=None,
                 k_coefficients=(), **kwargs):
        missing_k = kwargs.pop('missing_k',
                               'zero' if k_formula is None else 'raise')
        super().__init__(name, missing_k=missing_k, **kwargs)
        self.formula = formula
        self.coefficients = tuple(coefficients)
        self.k_formula = k_formula
        self.k_coefficients = tuple(k_coefficients)
        self._formula_wants_temperature = _accepts_temperature(formula)
        self._k_formula_wants_temperature = _accepts_temperature(k_formula)

    def n(self, wvl_um, temperature=None):
        """Formula-derived real index."""
        self._check_wavelength(wvl_um)
        self._check_temperature(temperature)
        if temperature is not None and self._formula_wants_temperature:
            return self.formula(wvl_um, *self.coefficients,
                                temperature=temperature)
        return self.formula(wvl_um, *self.coefficients)

    def k(self, wvl_um, temperature=None):
        """Formula-derived extinction coefficient."""
        self._check_wavelength(wvl_um)
        self._check_temperature(temperature)
        if self.k_formula is None:
            return self._missing_k(wvl_um)
        if temperature is not None and self._k_formula_wants_temperature:
            return self.k_formula(wvl_um, *self.k_coefficients,
                                  temperature=temperature)
        return self.k_formula(wvl_um, *self.k_coefficients)


# d/F/C spectral lines, microns (nd / Abbe definition)
_LINE_D, _LINE_F, _LINE_C = 0.5875618, 0.4861327, 0.6562725


def model_glass(nd, vd, name=None):
    """Two-term Cauchy stand-in glass hitting (nd, Vd) at the d/F/C lines."""
    from .formulas import cauchy
    B = ((nd - 1.0) / vd) / (1.0 / _LINE_F ** 2 - 1.0 / _LINE_C ** 2)
    A = nd - B / _LINE_D ** 2
    if name is None:
        name = f'model {nd:.4f}/{vd:.2f}'
    return FormulaMaterial(name, cauchy, (A, B),
                           metadata={'model_glass': True, 'nd': nd, 'vd': vd})
