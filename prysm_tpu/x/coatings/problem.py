"""Optimization problem for coating layer variables.

Rebuild of ``prysm/x/coatings/problem.py`` over prysm_tpu's optym.
"""
import numpy as onp
import jax.numpy as jnp

from ...conf import config
from ..optym.problem import Problem

from .stack import Stack
from .merit import as_merit
from .diff import thickness_gradient, index_gradient


class CoatingProblem(Problem):
    """Minimize a MeritFunction over a Stack's thicknesses or indices."""

    has_fg = True

    def __init__(self, stack, merit, *, variable_layers=None,
                 variables='thickness'):
        super().__init__()
        if variables not in ('thickness', 'index'):
            raise ValueError("variables must be 'thickness' or 'index'")
        self.stack0 = stack
        self.merit = as_merit(merit)
        self.variables = variables
        n = len(stack)
        if variable_layers is None:
            variable_layers = list(range(n))
        self.variable_layers = list(variable_layers)
        self._mask = onp.zeros(n, dtype=bool)
        self._mask[self.variable_layers] = True
        self._grad_fn = (index_gradient if variables == 'index'
                         else thickness_gradient)
        if variables == 'index':
            for i in self.variable_layers:
                if callable(stack.indices[i]):
                    raise TypeError(
                        'index-variable design needs numeric layer indices; '
                        f'layer {i} is a dispersion callable')

    def x0(self):
        """Initial design vector: variable layers' thickness or index."""
        if self.variables == 'index':
            return jnp.asarray([onp.real(self.stack0.indices[i])
                                for i in self.variable_layers],
                               dtype=config.precision)
        th = onp.asarray(self.stack0.thicknesses, dtype=config.precision)
        return jnp.asarray(th[self._mask])

    def stack_from_x(self, x):
        """Build a Stack with the variable thickness/index set to x."""
        x = onp.asarray(x, dtype=config.precision)
        if self.variables == 'index':
            indices = list(self.stack0.indices)
            for slot, i in enumerate(self.variable_layers):
                indices[i] = float(x[slot])
            return Stack(indices, self.stack0.thicknesses,
                         self.stack0.substrate_index,
                         self.stack0.ambient_index)
        th = onp.array(self.stack0.thicknesses, dtype=config.precision)
        th[self._mask] = x
        return Stack(self.stack0.indices, th, self.stack0.substrate_index,
                     self.stack0.ambient_index)

    def _fg(self, x):
        stack = self.stack_from_x(x)
        val, grad = self.merit.value_and_grad(stack, grad_fn=self._grad_fn)
        return val, jnp.asarray(onp.asarray(grad)[self._mask])

    def residuals(self, x):
        """Weighted residual vector at x (for the least-squares path)."""
        stack = self.stack_from_x(x)
        return self.merit.residuals(stack)


__all__ = ['CoatingProblem']
