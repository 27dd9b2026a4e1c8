"""Automatic first-order design models (Ritchey-Chretien).

Rebuild of ``prysm/x/raytracing/auto.py``: a constraint-closure model
over the classical two-mirror RC relations.  The fixed-point closure is
driven by a declarative rule table rather than an inline cascade; each
rule names its output, inputs, and the algebraic relation used for the
conflict message.
"""
from dataclasses import dataclass
import math

import numpy as np

_NAMES = (
    'efl', 'bfl', 'separation', 'primary_focal_length',
    'primary_to_focus', 'secondary_magnification',
    'primary_radius', 'secondary_radius',
)


@dataclass(frozen=True)
class RCPrescription:
    """Complete Ritchey-Chretien mirror figure prescription."""

    primary_curvature: float
    secondary_curvature: float
    primary_conic: float
    secondary_conic: float


class _Singular(Exception):
    pass


def _div(num, den, atol, relation):
    if abs(den) <= atol:
        raise ValueError(
            f'singular Ritchey-Chretien constraint: {relation}')
    return num / den


# closure rules: (output, inputs, fn(values, atol), relation label).
# fn returns the closed value; _div raises on singular denominators.
_RULES = (
    ('primary_focal_length', ('primary_radius',),
     lambda v, a: v['primary_radius'] / 2.0,
     'primary_radius = 2*primary_focal_length'),
    ('primary_radius', ('primary_focal_length',),
     lambda v, a: 2.0 * v['primary_focal_length'],
     'primary_radius = 2*primary_focal_length'),

    ('primary_to_focus', ('bfl', 'separation'),
     lambda v, a: v['bfl'] - v['separation'],
     'primary_to_focus = bfl - separation'),
    ('bfl', ('primary_to_focus', 'separation'),
     lambda v, a: v['primary_to_focus'] + v['separation'],
     'bfl = primary_to_focus + separation'),
    ('separation', ('bfl', 'primary_to_focus'),
     lambda v, a: v['bfl'] - v['primary_to_focus'],
     'separation = bfl - primary_to_focus'),
    ('separation', ('efl', 'primary_to_focus', 'secondary_magnification'),
     lambda v, a: _div(v['efl'] - v['primary_to_focus'],
                       v['secondary_magnification'] + 1.0, a,
                       'secondary magnification is negative one'),
     'separation = (efl-primary_to_focus)/(magnification+1)'),

    ('primary_focal_length', ('efl', 'secondary_magnification'),
     lambda v, a: _div(-v['efl'], v['secondary_magnification'], a,
                       'secondary magnification is zero'),
     'primary_focal_length = -efl/secondary_magnification'),
    ('efl', ('primary_focal_length', 'secondary_magnification'),
     lambda v, a: (-v['primary_focal_length']
                   * v['secondary_magnification']),
     'efl = -primary_focal_length*secondary_magnification'),
    ('secondary_magnification', ('efl', 'primary_focal_length'),
     lambda v, a: _div(-v['efl'], v['primary_focal_length'], a,
                       'primary focal length is zero'),
     'secondary_magnification = -efl/primary_focal_length'),

    # B = F - M D and F = -f1 M -> M = -B/(D+f1)
    ('secondary_magnification',
     ('bfl', 'separation', 'primary_focal_length'),
     lambda v, a: _div(-v['bfl'],
                       v['separation'] + v['primary_focal_length'], a,
                       'separation + primary focal length is zero'),
     'magnification = -bfl/(separation+primary_focal_length)'),

    ('secondary_radius', ('bfl', 'secondary_magnification'),
     lambda v, a: _div(-2.0 * v['bfl'],
                       v['secondary_magnification'] - 1.0, a,
                       'secondary magnification is one'),
     'secondary_radius = -2*bfl/(magnification-1)'),
    ('bfl', ('secondary_radius', 'secondary_magnification'),
     lambda v, a: (-0.5 * v['secondary_radius']
                   * (v['secondary_magnification'] - 1.0)),
     'bfl = -secondary_radius*(magnification-1)/2'),
    ('secondary_magnification', ('secondary_radius', 'bfl'),
     lambda v, a: 1.0 + _div(-2.0 * v['bfl'], v['secondary_radius'], a,
                             'secondary radius is zero'),
     'magnification = 1 - 2*bfl/secondary_radius'),

    ('efl', ('bfl', 'separation', 'secondary_magnification'),
     lambda v, a: (v['bfl']
                   + v['secondary_magnification'] * v['separation']),
     'efl = bfl + magnification*separation'),
    ('bfl', ('efl', 'separation', 'secondary_magnification'),
     lambda v, a: (v['efl']
                   - v['secondary_magnification'] * v['separation']),
     'bfl = efl - magnification*separation'),
    ('separation', ('efl', 'bfl', 'secondary_magnification'),
     lambda v, a: _div(v['efl'] - v['bfl'],
                       v['secondary_magnification'], a,
                       'secondary magnification is zero'),
     'separation = (efl-bfl)/magnification'),
    ('secondary_magnification', ('efl', 'bfl', 'separation'),
     lambda v, a: _div(v['efl'] - v['bfl'], v['separation'], a,
                       'separation is zero'),
     'magnification = (efl-bfl)/separation'),
)

# secondary-radius closures that only apply when the output is unknown
_GUARDED_RULES = (
    ('secondary_magnification', ('efl', 'separation', 'secondary_radius'),
     'bfl',
     lambda v, a: _div(v['secondary_radius'] - 2.0 * v['efl'],
                       v['secondary_radius'] - 2.0 * v['separation'], a,
                       'secondary-radius closure is degenerate'),
     'secondary radius with efl and separation'),
    ('separation', ('efl', 'bfl', 'secondary_radius'), 'separation',
     lambda v, a: _div(
         -v['secondary_radius'] * (v['efl'] - v['bfl']),
         2.0 * v['bfl'] - v['secondary_radius'], a,
         'secondary-radius closure is degenerate'),
     'secondary radius with efl and bfl'),
    ('efl', ('bfl', 'separation', 'secondary_radius'), 'efl',
     lambda v, a: (v['bfl'] + v['separation']
                   - 2.0 * v['separation'] * v['bfl']
                   / v['secondary_radius']),
     'secondary radius with bfl and separation'),
    ('efl', ('separation', 'primary_focal_length', 'secondary_radius'),
     'efl',
     lambda v, a: _div(
         v['secondary_radius'] * v['primary_focal_length'],
         2.0 * (v['primary_focal_length'] + v['separation'])
         - v['secondary_radius'], a,
         'mirror-radius closure is degenerate'),
     'efl from separation and both mirror radii'),
)


class RitcheyChretien:
    """Partially determined Ritchey-Chretien first-order constraint model.

    Supply any consistent subset of the supported quantities; the model
    closes all algebraically determined values, reports unresolved names
    and remaining degrees of freedom, and emits mirror figures only once
    the canonical (efl, bfl, separation) triple is complete.
    """

    def __init__(self, *, efl=None, bfl=None, separation=None,
                 primary_focal_length=None, primary_to_focus=None,
                 secondary_magnification=None, primary_radius=None,
                 secondary_radius=None, rtol=1e-10, atol=1e-12):
        self.rtol = float(rtol)
        self.atol = float(atol)
        self._values = {name: None for name in _NAMES}
        self._sources = {}
        supplied = {
            'efl': efl, 'bfl': bfl, 'separation': separation,
            'primary_focal_length': primary_focal_length,
            'primary_to_focus': primary_to_focus,
            'secondary_magnification': secondary_magnification,
            'primary_radius': primary_radius,
            'secondary_radius': secondary_radius,
        }
        self._supplied = {name: float(value)
                          for name, value in supplied.items()
                          if value is not None}
        for name, value in self._supplied.items():
            if not math.isfinite(value):
                raise ValueError(f'{name} must be finite')
            self._set(name, value, f'input {name}')
        self._close()
        self._validate_complete_geometry()

    def _set(self, name, value, source):
        value = float(value)
        current = self._values[name]
        if current is None:
            self._values[name] = value
            self._sources[name] = source
            return True
        if not math.isclose(current, value, rel_tol=self.rtol,
                            abs_tol=self.atol):
            raise ValueError(
                f'inconsistent Ritchey-Chretien constraints for {name}: '
                f'{current:g} from {self._sources[name]} conflicts with '
                f'{value:g} from {source}')
        return False

    def _known(self, *names):
        return all(self._values[name] is not None for name in names)

    def _close(self):
        changed = True
        while changed:
            changed = False
            for out, inputs, fn, relation in _RULES:
                if self._known(*inputs):
                    changed |= self._set(out, fn(self._values, self.atol),
                                         relation)
            for out, inputs, guard, fn, relation in _GUARDED_RULES:
                if self._known(*inputs) and not self._known(guard):
                    changed |= self._set(out, fn(self._values, self.atol),
                                         relation)

    def _validate_complete_geometry(self):
        if not self.complete:
            return
        F, B, D = self.efl, self.bfl, self.separation
        for value, name in ((F, 'efl'), (D, 'separation'),
                            (F - B, 'efl-bfl'),
                            (F - B - D, 'efl-bfl-separation')):
            if abs(value) <= self.atol:
                raise ValueError(
                    f'singular Ritchey-Chretien geometry: {name} is zero')

    @property
    def complete(self):
        """True when the canonical (efl, bfl, separation) triple closed."""
        return self._known('efl', 'bfl', 'separation')

    @property
    def unresolved(self):
        """Names of quantities the closure could not determine."""
        return tuple(name for name in _NAMES if self._values[name] is None)

    @property
    def degrees_of_freedom(self):
        """Remaining canonical DOFs after the supplied constraints."""
        if not self._supplied:
            return 3
        F = self._values['efl'] or 100.0
        B = self._values['bfl'] or 20.0
        D = self._values['separation'] or 30.0
        rows = []
        for name, value in self._supplied.items():
            if name == 'efl':
                rows.append((1.0, 0.0, 0.0))
            elif name == 'bfl':
                rows.append((0.0, 1.0, 0.0))
            elif name == 'separation':
                rows.append((0.0, 0.0, 1.0))
            elif name == 'secondary_magnification':
                rows.append((1.0, -1.0, -value))
            elif name in ('primary_focal_length', 'primary_radius'):
                fp = (value if name == 'primary_focal_length'
                      else value / 2.0)
                rows.append((D + fp, -fp, F))
            elif name == 'primary_to_focus':
                rows.append((0.0, 1.0, -1.0))
            elif name == 'secondary_radius':
                rows.append((value, -value + 2.0 * D, -value + 2.0 * B))
        rank = int(np.linalg.matrix_rank(np.asarray(rows, dtype=float),
                                         tol=self.atol))
        return max(0, 3 - rank)

    @property
    def solutions(self):
        """All discrete complete solutions implied by the supplied inputs.

        A complete model returns itself; continuously underdetermined
        models return (); the two algebraically closed three-constraint
        forms with two mirror-layout branches return both.
        """
        if self.complete:
            return (self,)
        v = self._values
        if self._known('efl', 'primary_to_focus', 'secondary_radius'):
            F, p, R2 = (v['efl'], v['primary_to_focus'],
                        v['secondary_radius'])
            # B^2 - (p+R2) B + R2(F+p)/2 = 0
            roots = np.roots((1.0, -(p + R2), 0.5 * R2 * (F + p)))
            triples = ((F, float(root.real), float(root.real) - p)
                       for root in roots
                       if abs(float(root.imag)) <= self.atol)
        elif self._known('primary_focal_length', 'primary_to_focus',
                         'secondary_radius'):
            f1, p, R2 = (v['primary_focal_length'], v['primary_to_focus'],
                         v['secondary_radius'])
            # 2D^2 + 2(p+f1-R2)D + 2pf1-R2(p+f1) = 0
            roots = np.roots((2.0, 2.0 * (p + f1 - R2),
                              2.0 * p * f1 - R2 * (p + f1)))
            triples = []
            for root in roots:
                if abs(float(root.imag)) > self.atol:
                    continue
                D = float(root.real)
                B = p + D
                if abs(f1 + D) <= self.atol:
                    continue
                F = f1 * B / (f1 + D)
                triples.append((F, B, D))
        else:
            return ()

        candidates = []
        for F, B, D in triples:
            try:
                candidate = type(self)(efl=F, bfl=B, separation=D,
                                       rtol=self.rtol, atol=self.atol)
            except ValueError:
                continue
            for name, supplied in self._supplied.items():
                if not math.isclose(getattr(candidate, name), supplied,
                                    rel_tol=self.rtol, abs_tol=self.atol):
                    break
            else:
                candidates.append(candidate)
        candidates.sort(key=lambda model: (model.separation, model.bfl,
                                           model.efl))
        return tuple(candidates)

    def prescription(self):
        """Complete mirror curvatures/conics; rejects partial models."""
        if not self.complete:
            discrete = self.solutions
            suffix = (f'; {len(discrete)} discrete solutions are available '
                      'from .solutions' if discrete else '')
            raise ValueError(
                'Ritchey-Chretien model is partially determined; '
                'unresolved: ' + ', '.join(self.unresolved) + suffix)
        B, D = self.bfl, self.separation
        M = self.secondary_magnification
        R1 = self.primary_radius
        R2 = self.secondary_radius
        k1 = -1.0 - 2.0 / M ** 3 * B / D
        k2 = -1.0 - 2.0 / (M - 1.0) ** 3 * (M * (2.0 * M - 1.0) + B / D)
        return RCPrescription(1.0 / R1, 1.0 / R2, k1, k2)

    def to_lensdata(self, *, primary_aperture=None, secondary_aperture=None):
        """Generate a two-mirror LensData when the model is complete."""
        from .lensdata import LensData
        from .surfaces import Conic

        p = self.prescription()
        lens = LensData()
        lens.add(Conic(p.primary_curvature, p.primary_conic), typ='refl',
                 thickness=self.separation, aperture=primary_aperture)
        lens.add(Conic(p.secondary_curvature, p.secondary_conic),
                 typ='refl', thickness=self.bfl,
                 aperture=secondary_aperture)
        return lens

    def __getattr__(self, name):
        if name in _NAMES:
            return self._values[name]
        raise AttributeError(name)

    def __repr__(self):
        known = ', '.join(
            f'{name}={value:g}' for name, value in self._values.items()
            if value is not None)
        return (f'RitcheyChretien({known}; '
                f'degrees_of_freedom={self.degrees_of_freedom})')


__all__ = ['RitcheyChretien', 'RCPrescription']
