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


class _AutodiffProblem(Problem):
    """Problem whose derivative hooks are exact jax transforms.

    The reference sample problems hand-derive g/fg/h/hvp; here the
    analytic hooks are jax.grad / value_and_grad / hessian / jvp over
    the one scalar objective -- exact, and declared through the same
    has_* protocol the optimizers consult.
    """

    has_f = has_g = has_fg = has_h = has_hvp = True

    def _g(self, x):
        import jax
        return jax.grad(self._f)(_asx(x))

    def _fg(self, x):
        import jax
        f, g = jax.value_and_grad(self._f)(_asx(x))
        return f, g

    def _h(self, x):
        import jax
        x = _asx(x)
        shape = x.shape

        def flat_f(xf):
            return self._f(xf.reshape(shape))

        return jax.hessian(flat_f)(x.ravel())

    def _hvp(self, x, v):
        import jax
        x, v = _asx(x), _asx(v)
        return jax.jvp(jax.grad(self._f), (x,), (v,))[1]


class SphereProblem(_AutodiffProblem):
    """Sphere function; global minimum f(0) = 0."""

    def _f(self, x):
        x = _asx(x)
        return (x * x).sum()


class RosenbrockProblem(_AutodiffProblem):
    """Rosenbrock function; global minimum f([1, ..., 1]) = 0."""

    def _f(self, x):
        x = _asx(x)
        if x.size < 2:
            raise ValueError('rosenbrock requires at least two variables')
        xf = x.ravel()
        diff = xf[1:] - xf[:-1] * xf[:-1]
        offset = 1 - xf[:-1]
        return (100 * diff * diff + offset * offset).sum()


class RastriginProblem(_AutodiffProblem):
    """Rastrigin function; global minimum f(0) = 0."""

    def _f(self, x):
        x = _asx(x)
        arg = 2 * jnp.pi * x
        return 10 * x.size + (x * x - 10 * jnp.cos(arg)).sum()


class HimmelblauProblem(_AutodiffProblem):
    """Himmelblau's function; one global minimum is f([3, 2]) = 0."""

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
