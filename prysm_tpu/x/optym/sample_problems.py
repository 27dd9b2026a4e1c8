"""Canonical optimization test problems.

Rebuild of ``prysm/x/optym/sample_problems.py``.  Objectives are written as
pure jnp expressions; analytic gradients/Hessians come from autodiff (the
Problem base class), so each problem is ~10 lines instead of hand-derived
derivative code, and every derivative order is consistent by construction.
"""
import jax.numpy as jnp

from .problem import Problem


def _asx(x):
    return jnp.asarray(x, dtype=float)


class SphereProblem(Problem):
    """Sphere function; global minimum f(0) = 0."""

    has_f = True

    def _f(self, x):
        x = _asx(x)
        return (x * x).sum()


class RosenbrockProblem(Problem):
    """Rosenbrock function; global minimum f([1, ..., 1]) = 0."""

    has_f = True

    def _f(self, x):
        x = _asx(x)
        if x.size < 2:
            raise ValueError('rosenbrock requires at least two variables')
        xf = x.ravel()
        diff = xf[1:] - xf[:-1] * xf[:-1]
        offset = 1 - xf[:-1]
        return (100 * diff * diff + offset * offset).sum()


class RastriginProblem(Problem):
    """Rastrigin function; global minimum f(0) = 0."""

    has_f = True

    def _f(self, x):
        x = _asx(x)
        arg = 2 * jnp.pi * x
        return 10 * x.size + (x * x - 10 * jnp.cos(arg)).sum()


class HimmelblauProblem(Problem):
    """Himmelblau's function; one global minimum is f([3, 2]) = 0."""

    has_f = True

    def _f(self, x):
        x = _asx(x)
        if x.size != 2:
            raise ValueError('himmelblau requires exactly two variables')
        x0, x1 = x.ravel()
        a = x0 * x0 + x1 - 11
        b = x0 + x1 * x1 - 7
        return a * a + b * b


_SPHERE = SphereProblem()
_ROSENBROCK = RosenbrockProblem()
_RASTRIGIN = RastriginProblem()
_HIMMELBLAU = HimmelblauProblem()


def sphere(x):
    """Sphere function (f, g); global minimum f(0) = 0."""
    return _SPHERE.fg(x)


def rosenbrock(x):
    """Rosenbrock function (f, g); global minimum f([1, ..., 1]) = 0."""
    return _ROSENBROCK.fg(x)


def rastrigin(x):
    """Rastrigin function (f, g); global minimum f(0) = 0."""
    return _RASTRIGIN.fg(x)


def himmelblau(x):
    """Himmelblau's function (f, g); one global minimum is f([3, 2]) = 0."""
    return _HIMMELBLAU.fg(x)
