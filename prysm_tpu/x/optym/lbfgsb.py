"""L-BFGS-B optimizers.

Rebuild of ``prysm/x/optym/_lbfgsb.py`` (wrapper over SciPy's compiled
L-BFGS-B driver — the reference's single native-code touchpoint) and
``_prysm_lbfgsb.py`` (backend-portable twin).  Here:

* ``LBFGSB`` drives scipy's reverse-communication ``setulb`` (the C port in
  SciPy >= 1.15) with the step() API, so governors compose with a
  production-quality bound-constrained quasi-Newton method.
* ``PrysmLBFGSB`` is a pure-JAX projected L-BFGS with two-loop recursion and
  Armijo backtracking — device-resident state, no host library.  For
  strongly bound-active problems the scipy driver's generalized Cauchy
  point handling converges faster; for unbounded/weakly-bounded problems
  they behave alike.
"""
import numpy as np

import jax.numpy as jnp

from scipy.optimize import _lbfgsb as _sp_lbfgsb

from .problem import as_problem

# task[0] codes of the SciPy >= 1.15 C driver
_TASK_NEW_X = 1
_TASK_FG = 3
_TASK_CONVERGENCE = 4
_TASK_STOP = 5
_TASK_WARNING = 6
_TASK_ERROR = 7


class _DriverStop:
    """StopIteration payload for non-error driver termination."""

    def __init__(self, success, message):
        self.success = success
        self.message = message


class LBFGSB:
    """L-BFGS-B via SciPy's compiled reverse-communication driver.

    Exposes the optym step() API: each step() advances the driver until it
    reports a completed iteration (NEW_X), returning the pre-step (x, f, g).
    Raises StopIteration with a _DriverStop payload on convergence.
    """

    def __init__(self, fg, x0, memory=10, lower_bounds=None, upper_bounds=None,
                 factr=1e7, pgtol=1e-8, maxls=20):
        """fg(x) -> (f, g); x0 initial vector; memory = history pairs."""
        self.problem = as_problem(fg)
        x0 = np.asarray(x0, dtype=np.float64).ravel()
        self.x0 = x0.copy()
        self.n = x0.size
        self.m = int(memory)
        n, m = self.n, self.m

        if lower_bounds is None:
            lower_bounds = np.full(n, -np.inf)
        if upper_bounds is None:
            upper_bounds = np.full(n, np.inf)
        self.l = np.asarray(lower_bounds, dtype=np.float64).ravel()  # NOQA
        self.u = np.asarray(upper_bounds, dtype=np.float64).ravel()
        nbd = np.zeros(n, dtype=np.int32)
        has_l = np.isfinite(self.l)
        has_u = np.isfinite(self.u)
        nbd[has_l & ~has_u] = 1
        nbd[has_l & has_u] = 2
        nbd[~has_l & has_u] = 3
        self._nbd = nbd
        # driver requires finite sentinels where nbd says unbounded
        self._lb = np.where(has_l, self.l, 0.0)
        self._ub = np.where(has_u, self.u, 0.0)

        self.factr = float(factr)
        self.pgtol = float(pgtol)
        self.maxls = int(maxls)

        self._x = x0.copy()
        self._f = np.array(0.0, dtype=np.float64)
        self._g = np.zeros(n, dtype=np.float64)
        self._wa = np.zeros(2 * m * n + 5 * n + 11 * m * m + 8 * m, np.float64)
        self._iwa = np.zeros(3 * n, dtype=np.int32)
        self._task = np.zeros(2, dtype=np.int32)
        self._ln_task = np.zeros(2, dtype=np.int32)
        self._lsave = np.zeros(4, dtype=np.int32)
        self._isave = np.zeros(44, dtype=np.int32)
        self._dsave = np.zeros(29, dtype=np.float64)
        self.nfev = 0
        self.iter = 0
        self.last_step_metadata = {}

    @property
    def x(self):
        """Current iterate."""
        return self._x

    @property
    def g(self):
        """Gradient at the last evaluated point."""
        return self._g

    def _call_driver(self):
        _sp_lbfgsb.setulb(
            self.m, self._x, self._lb, self._ub, self._nbd, self._f, self._g,
            self.factr, self.pgtol, self._wa, self._iwa, self._task,
            self._lsave, self._isave, self._dsave, self.maxls, self._ln_task)

    def step(self):
        """Advance the driver to the next completed iteration."""
        x_prev = self._x.copy()
        f_prev = None
        g_prev = None
        while True:
            self._call_driver()
            code = int(self._task[0])
            if code == _TASK_FG:
                f, g = self.problem.fg(self._x)
                self._f = np.array(float(f), dtype=np.float64)
                self._g = np.asarray(g, dtype=np.float64).ravel()
                self.nfev += 1
                if f_prev is None:
                    f_prev = float(f)
                    g_prev = self._g.copy()
            elif code == _TASK_NEW_X:
                self.iter += 1
                return (x_prev,
                        float(self._f) if f_prev is None else f_prev,
                        self._g.copy() if g_prev is None else g_prev)
            elif code == _TASK_CONVERGENCE:
                raise StopIteration(_DriverStop(True, 'converged'))
            elif code in (_TASK_STOP, _TASK_WARNING):
                raise StopIteration(_DriverStop(True, 'driver stop'))
            else:
                raise StopIteration(_DriverStop(False, f'driver error code {code}'))

    def run_to(self, N):
        """Run up to N iterations; returns (x, f, g) at the final point."""
        out = None
        for _ in range(N):
            try:
                out = self.step()
            except StopIteration:
                break
        return self._x, float(self._f), self._g


class PrysmLBFGSB:
    """Pure-JAX projected L-BFGS with box bounds.

    Two-loop recursion over a rolling (s, y) memory with Armijo
    backtracking; iterates are projected onto the box and gradients masked
    at active bounds.  All state is jnp arrays — no host library in the
    loop, so the curvature updates fuse with the user's jitted fg.
    """

    def __init__(self, fg, x0, memory=10, lower_bounds=None, upper_bounds=None,
                 c1=1e-4, c2=0.9, max_ls=25):
        """fg(x) -> (f, g); x0 initial vector; memory = history pairs."""
        self.problem = as_problem(fg)
        self.x0 = jnp.asarray(x0, dtype=float)
        self.m = int(memory)
        self.l = (jnp.full_like(self.x0, -jnp.inf) if lower_bounds is None  # NOQA
                  else jnp.asarray(lower_bounds, dtype=float))
        self.u = (jnp.full_like(self.x0, jnp.inf) if upper_bounds is None
                  else jnp.asarray(upper_bounds, dtype=float))
        self.x = jnp.clip(self.x0, self.l, self.u)
        self.c1 = c1
        self.c2 = c2
        self.max_ls = int(max_ls)
        self._S = []
        self._Y = []
        self._prev = None
        self._cached_fg = None  # (f, g) at self.x, from the line search
        self.nfev = 0
        self.iter = 0
        self.last_step_metadata = {}

    def _masked_gradient(self, x, g):
        at_lower = jnp.isfinite(self.l) & (x <= self.l) & (g > 0)
        at_upper = jnp.isfinite(self.u) & (x >= self.u) & (g < 0)
        return jnp.where(at_lower | at_upper, 0, g)

    def _two_loop(self, g):
        q = g
        alphas = []
        for s, y, rho in reversed(self._pairs):
            a = rho * jnp.vdot(s, q)
            alphas.append(a)
            q = q - a * y
        if self._pairs:
            s, y, rho = self._pairs[-1]
            gamma = jnp.vdot(s, y) / jnp.vdot(y, y)
            q = q * gamma
        for (s, y, rho), a in zip(self._pairs, reversed(alphas)):
            b = rho * jnp.vdot(y, q)
            q = q + s * (a - b)
        return q

    @property
    def _pairs(self):
        return list(zip(self._S, self._Y, self._rhos))

    def step(self):
        """Perform one projected quasi-Newton iteration (Wolfe line search)."""
        if self._cached_fg is not None:
            f, g = self._cached_fg
            self._cached_fg = None
        else:
            f, g = self.problem.fg(self.x)
            self.nfev += 1
        f = jnp.asarray(f, dtype=float)
        g = jnp.asarray(g, dtype=float)
        gm = self._masked_gradient(self.x, g)

        if jnp.linalg.norm(gm) == 0:
            raise StopIteration(_DriverStop(True, 'projected gradient is zero'))

        if self._prev is not None:
            x_prev, g_prev = self._prev
            s = self.x - x_prev
            y = g - g_prev
            sy = float(jnp.vdot(s, y))
            if sy > 1e-10 * float(jnp.linalg.norm(s) * jnp.linalg.norm(y) + 1e-300):
                self._S.append(s)
                self._Y.append(y)
                if len(self._S) > self.m:
                    self._S.pop(0)
                    self._Y.pop(0)

        self._rhos = [1.0 / jnp.vdot(s, y) for s, y in zip(self._S, self._Y)]
        d = -self._two_loop(gm)
        # ensure descent on the masked gradient
        if float(jnp.vdot(d, gm)) >= 0:
            d = -gm

        x = self.x
        f0 = float(f)
        slope = float(jnp.vdot(gm, d))

        # Wolfe line search with bisection/expansion bracketing; the trial
        # gradient is cached for the next iteration (one fg per accepted step
        # in the common alpha=1 case)
        alpha = 1.0
        lo, hi = 0.0, jnp.inf
        accepted = False
        for _ in range(self.max_ls):
            x_trial = jnp.clip(x + alpha * d, self.l, self.u)
            f_trial, g_trial = self.problem.fg(x_trial)
            f_trial = float(f_trial)
            self.nfev += 1
            if f_trial > f0 + self.c1 * alpha * slope:
                hi = alpha
                alpha = 0.5 * (lo + hi)
                continue
            dslope = float(jnp.vdot(jnp.asarray(g_trial, dtype=float), d))
            if dslope < self.c2 * slope:  # step too short; expand
                lo = alpha
                alpha = 2 * alpha if jnp.isinf(hi) else 0.5 * (lo + hi)
                continue
            accepted = True
            break
        if not accepted:
            if f_trial < f0:  # accept the best-effort decrease
                accepted = True
            else:
                raise StopIteration(_DriverStop(False, 'line search failed'))

        self._prev = (x, g)
        self.x = x_trial
        self._cached_fg = (f_trial, jnp.asarray(g_trial, dtype=float))
        self.iter += 1
        self.last_step_metadata = {'alpha': alpha, 'f_next': f_trial}
        return x, f0, g
