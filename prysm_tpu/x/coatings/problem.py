"""Design-vector view of a coating stack for the optym optimizers.

API parity target: ``prysm/x/coatings/problem.py``.  A
:class:`_LayerSelection` owns the variable-layer bookkeeping (pack a stack
into a design vector, scatter a design vector back); :class:`CoatingProblem`
wires that view to a merit function and the analytic gradient engine.
"""
import numpy as onp

import jax.numpy as jnp

from ...conf import config
from ..optym.problem import Problem

from .stack import Stack
from .merit import as_merit
from .diff import thickness_gradient, index_gradient


class _LayerSelection:
    """Which layers are free, and how they map to/from the design vector."""

    def __init__(self, stack, variable_layers, variables):
        self.variables = str(variables)
        self.layers = (list(range(len(stack))) if variable_layers is None
                       else list(variable_layers))
        self.mask = onp.zeros(len(stack), dtype=bool)
        self.mask[self.layers] = True
        if variables == 'index':
            bad = [i for i in self.layers if callable(stack.indices[i])]
            if bad:
                raise TypeError('index-variable design requires numeric layer '
                                f'indices, but layer {bad[0]} is a '
                                'dispersion callable')

    def pack(self, stack):
        """Stack -> design vector of the free thicknesses or indices."""
        if self.variables == 'index':
            values = [onp.real(stack.indices[i]) for i in self.layers]
            return jnp.asarray(values, dtype=config.precision)
        everything = onp.asarray(stack.thicknesses, dtype=config.precision)
        return jnp.asarray(everything[self.mask])

    def scatter(self, stack, x):
        """Design vector -> new Stack with the free entries replaced."""
        x = onp.asarray(x, dtype=config.precision)
        if self.variables == 'index':
            media = list(stack.indices)
            for slot, i in enumerate(self.layers):
                media[i] = float(x[slot])
            return Stack(media, stack.thicknesses, stack.substrate_index,
                         stack.ambient_index)
        depths = onp.array(stack.thicknesses, dtype=config.precision)
        depths[self.mask] = x
        return Stack(stack.indices, depths, stack.substrate_index,
                     stack.ambient_index)


class CoatingProblem(Problem):
    """Minimize a MeritFunction over a Stack's thicknesses or indices."""

    has_fg = True

    def __init__(self, stack, merit, *, variable_layers=None,
                 variables='thickness'):
        super().__init__()
        if variables not in ('thickness', 'index'):
            raise ValueError("variables must be either 'thickness' or 'index'")
        self.stack0, self.merit = stack, as_merit(merit)
        self.variables = variables
        self.selection = _LayerSelection(stack, variable_layers, variables)
        self._grad_engine = (index_gradient if variables == 'index'
                             else thickness_gradient)

    @property
    def variable_layers(self):
        """Indices of the free layers."""
        return self.selection.layers

    def x0(self):
        """Initial design vector: variable layers' thickness or index."""
        return self.selection.pack(self.stack0)

    def stack_from_x(self, x):
        """Build a Stack with the variable thickness/index set to x."""
        return self.selection.scatter(self.stack0, x)

    def _fg(self, x):
        trial = self.stack_from_x(x)
        value, full_grad = self.merit.value_and_grad(
            trial, grad_fn=self._grad_engine)
        return value, jnp.asarray(onp.asarray(full_grad)[self.selection.mask])

    def residuals(self, x):
        """Weighted residual vector at x (for the least-squares path)."""
        return self.merit.residuals(self.stack_from_x(x))


__all__ = ['CoatingProblem']
