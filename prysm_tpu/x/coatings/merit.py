"""Spectral/angular merit terms for coating design.

API parity target: ``prysm/x/coatings/merit.py``.  Wavelengths and
thicknesses are microns, angles radians; ``pol`` is 's', 'p', or 'avg'
(incoherent average of both).

Each term is a quantity extractor (R, T, per-layer A, boundary |E|^2)
paired with a cotangent seeder that maps dF/dq into the diff engine's seed
keywords; the shared base class owns sampling-grid validation, polarization
averaging, and the value / residual / gradient plumbing.
"""
import numpy as onp

import jax.numpy as jnp

from ...conf import config
from .diff import forward_eval, thickness_gradient, assembly_cotangent


def _sampled(x):
    return jnp.asarray(x, dtype=config.precision)


class _Term:
    """One weighted least-squares term over a (wvl, theta, pol) sample set."""

    quantity = None

    def __init__(self, wvl, theta=0.0, pol='avg', target=0.0, weight=1.0):
        """Sample grid (wvl um, theta rad), polarization, target, weight."""
        self.wvl, self.theta = _sampled(wvl), _sampled(theta)
        self.target, self.weight = _sampled(target), _sampled(weight)
        self.pol = pol.lower()
        if self.pol not in ('s', 'p', 'avg'):
            raise ValueError("pol must be one of 's', 'p', 'avg'")
        if (self.wvl.ndim == 1 and self.theta.ndim == 1
                and self.wvl.size > 1 and self.theta.size > 1):
            raise ValueError('wvl and theta are both 1-D; meshgrid them '
                             'to sample a spectral/angular grid')
        try:
            jnp.broadcast_shapes(self.wvl.shape, self.theta.shape,
                                 self.target.shape, self.weight.shape)
        except (ValueError, TypeError) as exc:
            # jax raises TypeError for rank-matched incompatible shapes
            raise ValueError('wvl, theta, target, and weight must be '
                             'broadcast-compatible') from exc

    # -- hooks each quantity implements --------------------------------------

    def _extract(self, fwd):
        raise NotImplementedError('subclasses supply the quantity extractor')

    def _seed(self, fwd, dq):
        """Map a quantity cotangent into diff-engine seed kwargs."""
        raise NotImplementedError('subclasses supply the cotangent seeder')

    assembly_capable = False

    # -- shared machinery ----------------------------------------------------

    def _forward(self, stack):
        """(pol-averaged quantity, list of ForwardEvals)."""
        pol_list = ('s', 'p') if self.pol == 'avg' else (self.pol,)
        fwds = [forward_eval(stack, self.wvl, self.theta, p) for p in pol_list]
        total = self._extract(fwds[0])
        for f in fwds[1:]:
            total = total + self._extract(f)
        return total / len(fwds), fwds

    def _misfit(self, q):
        return q - self.target

    def residuals(self, stack):
        """Weighted residual vector sqrt(w)(q - target), flattened."""
        q, _ = self._forward(stack)
        return jnp.atleast_1d(jnp.sqrt(self.weight) * self._misfit(q)).ravel()

    def value(self, stack):
        """Weighted sum of squared deviations from target (scalar)."""
        q, _ = self._forward(stack)
        return float(jnp.sum(self.weight * self._misfit(q) ** 2))

    def _cotangent(self, q, n_pols):
        dF_dq = 2 * self.weight * self._misfit(q)
        return jnp.broadcast_to(dF_dq, q.shape) / n_pols

    def value_and_grad(self, stack, grad_fn=thickness_gradient):
        """Scalar value and its gradient through ``grad_fn``."""
        q, fwds = self._forward(stack)
        dF_dq = self._cotangent(q, len(fwds))
        grad = jnp.zeros(len(stack), dtype=config.precision)
        for f in fwds:
            grad = grad + grad_fn(f, **self._seed(f, dF_dq))
        return float(jnp.sum(self.weight * self._misfit(q) ** 2)), grad

    def assembly_seeds(self, stack):
        """(ForwardEval, M-cotangent) pairs for needle synthesis."""
        if not self.assembly_capable:
            raise NotImplementedError('needle synthesis supports only '
                                      'reflectance/transmittance targets')
        q, fwds = self._forward(stack)
        dF_dq = self._cotangent(q, len(fwds))
        return [(f, assembly_cotangent(f, **self._seed(f, dF_dq)))
                for f in fwds]


def _one_hot_seed(shape, where, dq):
    seeded = jnp.zeros(shape, dtype=config.precision)
    return seeded.at[where].set(dq)


class Reflectance(_Term):
    """Target the intensity reflectance R = abs(r)^2."""

    quantity, assembly_capable = 'R', True

    def _extract(self, fwd):  # NOQA: D102
        return fwd.R_value

    def _seed(self, fwd, dq):  # NOQA: D102
        return {'dR': dq}


class Transmittance(_Term):
    """Target the intensity transmittance T."""

    quantity, assembly_capable = 'T', True

    def _extract(self, fwd):  # NOQA: D102
        return fwd.T_value

    def _seed(self, fwd, dq):  # NOQA: D102
        return {'dT': dq}


class _IndexedTerm(_Term):
    """Term addressing one layer or boundary by position."""

    def __init__(self, where, wvl, theta=0.0, pol='avg', target=0.0,
                 weight=1.0):
        super().__init__(wvl, theta=theta, pol=pol, target=target,
                         weight=weight)
        self.where = int(where)


class LayerAbsorptance(_IndexedTerm):
    """Target the absorptance A of one layer."""

    quantity = 'A'

    @property
    def layer(self):
        """The addressed layer."""
        return self.where

    def _extract(self, fwd):  # NOQA: D102
        return fwd.A_value[self.where]

    def _seed(self, fwd, dq):  # NOQA: D102
        return {'dA': _one_hot_seed(fwd.A_value.shape, self.where, dq)}


class FieldIntensityAtBoundary(_IndexedTerm):
    """Target the standing-wave intensity |E|^2 at one boundary."""

    quantity = 'Esq'

    @property
    def boundary(self):
        """The addressed boundary."""
        return self.where

    def _extract(self, fwd):  # NOQA: D102
        return fwd.Esq_value[self.where]

    def _seed(self, fwd, dq):  # NOQA: D102
        return {'dEsq': _one_hot_seed(fwd.Esq_value.shape, self.where, dq)}


class PeakFieldAtInterfaces(_Term):
    """Target the peak standing-wave intensity over a set of boundaries."""

    quantity = 'Esq'

    def __init__(self, wvl, theta=0.0, pol='avg', boundaries=None,
                 target=0.0, weight=1.0):
        super().__init__(wvl, theta=theta, pol=pol, target=target,
                         weight=weight)
        self.boundaries = None if boundaries is None else list(boundaries)

    def _subset(self, fwd):
        Esq = fwd.Esq_value
        if self.boundaries is None:
            return Esq, onp.arange(len(Esq))
        chosen = onp.asarray(self.boundaries)
        return Esq[chosen], chosen

    def _extract(self, fwd):
        Esq, _ = self._subset(fwd)
        return jnp.max(Esq, axis=0)

    def _seed(self, fwd, dq):
        # route the cotangent entirely to the argmax boundary per sample
        Esq, chosen = self._subset(fwd)
        trailing = Esq.ndim - 1
        winner = jnp.argmax(Esq, axis=0)
        lane = jnp.arange(Esq.shape[0]).reshape((-1,) + (1,) * trailing)
        selector = (lane == winner[None]).astype(config.precision)
        full = jnp.zeros(fwd.Esq_value.shape, dtype=config.precision)
        return {'dEsq': full.at[chosen].set(selector * dq[None])}


class FieldInLayer(_IndexedTerm):
    """Target mean standing-wave intensity at a layer's two boundaries."""

    quantity = 'Esq'

    @property
    def layer(self):
        """The addressed layer."""
        return self.where

    def _extract(self, fwd):  # NOQA: D102
        both = fwd.Esq_value[self.where:self.where + 2]
        return 0.5 * (both[0] + both[1])

    def _seed(self, fwd, dq):  # NOQA: D102
        half = jnp.zeros(fwd.Esq_value.shape, dtype=config.precision)
        half = half.at[self.where].add(0.5 * dq)
        return {'dEsq': half.at[self.where + 1].add(0.5 * dq)}


class MeritFunction:
    """A weighted collection of merit terms, summed."""

    def __init__(self, terms):
        self.terms = [terms] if isinstance(terms, _Term) else list(terms)

    def value(self, stack):
        """Total weighted sum-of-squares merit (scalar)."""
        return float(sum(term.value(stack) for term in self.terms))

    def residuals(self, stack):
        """Every term's weighted residual vector, concatenated."""
        if not self.terms:
            return jnp.zeros(0, dtype=config.precision)
        return jnp.concatenate([term.residuals(stack) for term in self.terms])

    def value_and_grad(self, stack, grad_fn=thickness_gradient):
        """Total merit plus its gradient through grad_fn."""
        pairs = [term.value_and_grad(stack, grad_fn=grad_fn)
                 for term in self.terms]
        total = sum(v for v, _ in pairs)
        grad = jnp.zeros(len(stack), dtype=config.precision)
        for _, g in pairs:
            grad = grad + g
        return float(total), grad


def as_merit(obj):
    """Normalize a term / list of terms / MeritFunction to a MeritFunction."""
    if isinstance(obj, MeritFunction):
        return obj
    return MeritFunction(obj)


__all__ = ['Reflectance', 'Transmittance', 'LayerAbsorptance',
           'FieldIntensityAtBoundary', 'PeakFieldAtInterfaces',
           'FieldInLayer', 'MeritFunction', 'as_merit']
