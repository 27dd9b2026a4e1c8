"""Finite-difference tolerance sensitivity and Monte Carlo tools.

Rebuild of ``prysm/x/raytracing/tolerance.py``.
"""
import numpy as np

from .design import _TraceCache
from .sensitivity import central_difference

_PREC = np.float64


def _as_lens(lensdata):
    """The LensData spine, unwrapping an OpticalSystem if given one."""
    return getattr(lensdata, 'lens', lensdata)


def _resolve_slot(lensdata, category, surface, component=None):
    """Resolve a (category, surface) pair to one LensData DOF slot.

    component selects one axis of a tilt/decenter triple (0/1/2).
    """
    lensdata = _as_lens(lensdata)
    slots = lensdata._category_slots(category, surface)
    if component is not None:
        slots = [s for s in slots if s[2] == int(component)]
    if len(slots) != 1:
        extra = '' if component is None else f' component {component}'
        raise ValueError(
            f'perturbation target {category!r} on surface {surface!r}'
            f'{extra} resolved to {len(slots)} DOFs; tolerancing needs '
            'exactly one scalar DOF (for tilt/decenter pass '
            'component=0/1/2)')
    return slots[0]


class Perturbation:
    """A LensData DOF slot plus a sampling distribution."""

    __slots__ = ('name', 'lensdata', 'slot', 'sampler', 'nominal', 'step',
                 'variance', 'distribution')

    def __init__(self, lensdata, slot, sampler, nominal, step, *, variance,
                 distribution, name=''):
        self.name = str(name)
        self.lensdata = _as_lens(lensdata)
        self.slot = slot
        self.sampler = sampler
        self.nominal = float(nominal)
        self.step = float(step)
        self.variance = float(variance)
        if self.variance < 0.0 or not bool(np.isfinite(self.variance)):
            raise ValueError(
                'perturbation variance must be finite and nonnegative')
        self.distribution = str(distribution)

    def set(self, value):
        """Set the targeted DOF and invalidate the compiled system."""
        self.lensdata._set_slot_value(self.slot, value)
        self.lensdata._invalidate()

    def sample(self, rng):
        """One sample from this perturbation's distribution."""
        return float(self.sampler(rng))

    def reset(self):
        """Restore the targeted DOF to its nominal value."""
        self.set(self.nominal)

    def __repr__(self):
        return (f'Perturbation(name={self.name!r}, '
                f'nominal={self.nominal:g}, step={self.step:g})')

    @classmethod
    def normal(cls, lensdata, category, surface, sigma, name='',
               component=None):
        """Normal(nominal, sigma); sigma is absolute."""
        lensdata = _as_lens(lensdata)
        slot = _resolve_slot(lensdata, category, surface, component)
        nom = float(lensdata._slot_value(slot))
        sigma = float(sigma)

        def sampler(rng):
            return float(rng.normal(nom, sigma))

        return cls(lensdata, slot, sampler, nom, sigma,
                   variance=sigma * sigma, distribution='normal', name=name)

    @classmethod
    def normal_relative(cls, lensdata, category, surface, sigma_rel,
                        name='', component=None):
        """Normal with sigma = sigma_rel * abs(nominal)."""
        lensdata = _as_lens(lensdata)
        slot = _resolve_slot(lensdata, category, surface, component)
        nom = float(lensdata._slot_value(slot))
        sigma = abs(nom) * float(sigma_rel)

        def sampler(rng):
            return float(rng.normal(nom, sigma))

        return cls(lensdata, slot, sampler, nom, sigma,
                   variance=sigma * sigma, distribution='normal', name=name)

    @classmethod
    def uniform(cls, lensdata, category, surface, half_width, name='',
                component=None):
        """Uniform over (nominal - hw, nominal + hw)."""
        lensdata = _as_lens(lensdata)
        slot = _resolve_slot(lensdata, category, surface, component)
        nom = float(lensdata._slot_value(slot))
        hw = abs(float(half_width))

        def sampler(rng):
            return float(rng.uniform(nom - hw, nom + hw))

        return cls(lensdata, slot, sampler, nom, hw,
                   variance=hw * hw / 3.0, distribution='uniform',
                   name=name)

    @classmethod
    def triangular(cls, lensdata, category, surface, half_width, name='',
                   component=None):
        """Triangular centered on nominal with half-width hw."""
        lensdata = _as_lens(lensdata)
        slot = _resolve_slot(lensdata, category, surface, component)
        nom = float(lensdata._slot_value(slot))
        hw = abs(float(half_width))

        def sampler(rng):
            return float(rng.triangular(nom - hw, nom, nom + hw))

        return cls(lensdata, slot, sampler, nom, hw,
                   variance=hw * hw / 6.0, distribution='triangular',
                   name=name)


def operand_as_merit(operand):
    """Wrap a design operand into a one-arg merit(system) -> float."""

    def merit(system):
        cache = _TraceCache(system)
        return float(operand(system, cache))

    return merit


class SensitivityTable:
    """Per-parameter centered-difference sensitivity report."""

    __slots__ = ('rows', 'merit_nominal')

    def __init__(self, rows, merit_nominal):
        self.rows = list(rows)
        self.merit_nominal = float(merit_nominal)

    def names(self):
        """Row names in order."""
        return [r['name'] for r in self.rows]

    def sensitivities(self):
        """Centered dM/dx per row."""
        return np.array([r['sensitivity'] for r in self.rows])

    def worst_delta_per_row(self):
        """max(abs(delta_plus), abs(delta_minus)) per row."""
        return np.array([
            max(abs(r['delta_plus']), abs(r['delta_minus']))
            for r in self.rows
        ])

    def __repr__(self):
        lines = [
            f'SensitivityTable(merit_nominal={self.merit_nominal:.6g}):',
            (f'{"name":<20} {"nominal":>14} {"step":>12} '
             f'{"d_plus":>12} {"d_minus":>12} {"dM/dx":>12}'),
        ]
        for r in self.rows:
            lines.append(
                f'{r["name"]:<20} {r["nominal"]:>14.6g} '
                f'{r["step"]:>12.6g} {r["delta_plus"]:>12.6g} '
                f'{r["delta_minus"]:>12.6g} {r["sensitivity"]:>12.6g}')
        return '\n'.join(lines)


def sensitivity_table(system, perturbations, merit, *, step=None):
    """Centered-difference sensitivity of merit w.r.t. each perturbation.

    Default h is the perturbation's own step (one sigma / half-width);
    step= overrides globally.  Parameters are restored afterward.
    """
    perturbations = list(perturbations)
    m_nom = float(merit(system))
    rows = []
    for p in perturbations:
        h = float(step) if step is not None else p.step
        if h == 0.0:
            rows.append({
                'name': p.name, 'nominal': p.nominal, 'step': 0.0,
                'merit_nominal': m_nom, 'merit_plus': m_nom,
                'merit_minus': m_nom, 'delta_plus': 0.0,
                'delta_minus': 0.0, 'sensitivity': 0.0,
            })
            continue

        def probe(value, p=p):
            p.set(value)
            return merit(system)

        try:
            m_plus, m_minus = central_difference(probe, p.nominal, h)
        finally:
            p.set(p.nominal)
        rows.append({
            'name': p.name, 'nominal': p.nominal, 'step': h,
            'merit_nominal': m_nom, 'merit_plus': m_plus,
            'merit_minus': m_minus,
            'delta_plus': m_plus - m_nom,
            'delta_minus': m_minus - m_nom,
            'sensitivity': (m_plus - m_minus) / (2.0 * h),
        })
    return SensitivityTable(rows, merit_nominal=m_nom)


class MonteCarloResult:
    """Outcome of a tolerancing Monte Carlo trial run."""

    __slots__ = ('merits', 'sampled_x', 'nominals', 'names')

    def __init__(self, merits, sampled_x, nominals, names):
        self.merits = np.asarray(merits, dtype=_PREC)
        self.sampled_x = (None if sampled_x is None
                          else np.asarray(sampled_x, dtype=_PREC))
        self.nominals = np.asarray(nominals, dtype=_PREC)
        self.names = list(names)

    @property
    def n_trials(self):
        """Number of trials run."""
        return int(self.merits.shape[0])

    def summary(self):
        """n_trials/min/max/mean/std/median/p95/p99 over the merits."""
        m = self.merits
        return {
            'n_trials': int(m.shape[0]),
            'min': float(m.min()),
            'max': float(m.max()),
            'mean': float(m.mean()),
            'std': float(m.std()),
            'median': float(np.median(m)),
            'p95': float(np.percentile(m, 95)),
            'p99': float(np.percentile(m, 99)),
        }

    def yield_at(self, threshold):
        """Fraction of trials with merit <= threshold."""
        return float((self.merits <= float(threshold)).mean())

    def __repr__(self):
        s = self.summary()
        return (f'MonteCarloResult(n={s["n_trials"]}, '
                f'mean={s["mean"]:.6g}, std={s["std"]:.6g}, '
                f'p95={s["p95"]:.6g})')


def monte_carlo(system, perturbations, merit, n_trials, *,
                seed=None, record_samples=False):
    """Run a Monte Carlo tolerancing simulation; restores nominals."""
    perturbations = list(perturbations)
    n_p = len(perturbations)
    rng = np.random.default_rng(seed)
    merits = np.empty(int(n_trials), dtype=_PREC)
    sampled_x = (np.empty((int(n_trials), n_p), dtype=_PREC)
                 if record_samples else None)
    try:
        for trial in range(int(n_trials)):
            for i, p in enumerate(perturbations):
                v = p.sample(rng)
                p.set(v)
                if record_samples:
                    sampled_x[trial, i] = v
            merits[trial] = float(merit(system))
    finally:
        for p in perturbations:
            p.reset()
    nominals = [p.nominal for p in perturbations]
    names = [p.name for p in perturbations]
    return MonteCarloResult(merits, sampled_x, nominals, names)


__all__ = [
    'Perturbation', 'SensitivityTable', 'sensitivity_table',
    'MonteCarloResult', 'monte_carlo', 'operand_as_merit',
]
