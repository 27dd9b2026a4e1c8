"""L-BFGS-B optimizers.

Rebuild of ``prysm/x/optym/_lbfgsb.py`` (wrapper over SciPy's compiled
L-BFGS-B driver — the reference's single native-code touchpoint) and
``_prysm_lbfgsb.py`` (backend-portable twin).  Here:

* ``LBFGSB`` drives scipy's reverse-communication ``setulb`` (the C port in
  SciPy >= 1.15) with the step() API, so governors compose with a
  production-quality bound-constrained quasi-Newton method.
* ``PrysmLBFGSB`` is a pure-JAX implementation of the full
  Byrd-Lu-Nocedal-Zhu algorithm: compact limited-memory form,
  generalized Cauchy point over the projected-gradient path, and
  Sherman-Morrison-Woodbury subspace minimization on the free set, all
  inside one jitted device program per iteration.  On bound-active
  problems it matches the compiled driver iteration-for-iteration (see
  tests/test_optym.py head-to-heads).
"""
import functools

import numpy as np

import jax
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
_TASK_ABNORMAL = 8


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
                 factr=0.0, pgtol=0.0, maxls=20):
        """fg(x) -> (f, g); x0 initial vector; memory = history pairs.

        factr/pgtol default to 0 (run until the caller's governor stops
        the loop) so step()/run_to() do not terminate behind the user's
        back; the driver may still signal CONVERGENCE at an exactly
        stationary point, surfaced as StopIteration (step) or a
        UserWarning (run_to).
        """
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
        """Current iterate (a copy — the driver's buffer stays private)."""
        return self._x.copy()

    @property
    def g(self):
        """Gradient at the last evaluated point (a copy)."""
        return self._g.copy()

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
                self.last_step_metadata = {'task': 'NEW_X'}
                return (x_prev,
                        float(self._f) if f_prev is None else f_prev,
                        self._g.copy() if g_prev is None else g_prev)
            else:
                raise StopIteration(self._terminal(code))

    def _terminal(self, code):
        """Map a terminal driver status code to a StopIteration payload.

        The C driver's status 8 (ABNORMAL: line-search failure et al.)
        is a known failed termination, not an unknown code.
        """
        if code == _TASK_CONVERGENCE:
            self.last_step_metadata = {'task': 'CONVERGENCE'}
            return _DriverStop(True, 'converged')
        if code in (_TASK_STOP, _TASK_WARNING):
            self.last_step_metadata = {'task': 'STOP'}
            return _DriverStop(True, 'driver stop')
        if code == _TASK_ABNORMAL:
            self.last_step_metadata = {'task': 'ABNORMAL'}
            return _DriverStop(False, 'abnormal driver termination')
        self.last_step_metadata = {'task': f'ERROR({code})'}
        return _DriverStop(False, f'driver error code {code}')

    def run_to(self, N):
        """Yield (x, f, g) for up to N iterations.

        If the driver signals convergence before N iterations complete
        (possible only at an exactly stationary point with the factr=0 /
        pgtol=0 defaults), the StopIteration is swallowed and a
        UserWarning is emitted instead of propagating mid-iteration.
        """
        import warnings
        for _ in range(N):
            try:
                yield self.step()
            except StopIteration as e:
                payload = e.args[0] if e.args else None
                warnings.warn(
                    'L-BFGS-B driver signaled '
                    f'{getattr(payload, "message", "termination")} after '
                    f'{self.iter} iteration(s); stopping early', UserWarning)
                return


# ---------------------------------------------------------------------------
# Pure-JAX L-BFGS-B: compact limited-memory form, generalized Cauchy point,
# and subspace minimization (Byrd, Lu, Nocedal & Zhu 1995), device-resident.
# ---------------------------------------------------------------------------

def _compact_form(S, Y, valid, theta):
    """W, M of the compact representation B = theta I - W M W^T.

    S, Y are (m, n) rolling histories ordered oldest -> newest with
    invalid rows zeroed; valid is the (m,) slot mask.  Invalid slots are
    decoupled by padding the middle-matrix diagonal, and contribute
    nothing because their W columns are zero.
    """
    m = S.shape[0]
    SY = S @ Y.T
    SS = S @ S.T
    pad = jnp.where(valid, 0.0, 1.0)
    D = jnp.diag(jnp.where(valid, jnp.diagonal(SY), 1.0))
    L = jnp.tril(SY, -1)
    M_inv = jnp.block([[-D, L.T],
                       [L, theta * SS + jnp.diag(pad)]])
    W = jnp.concatenate([Y.T, theta * S.T], axis=1)  # (n, 2m)
    M = jnp.linalg.inv(M_inv)
    return W, M


def _cauchy_point(x, g, lower, upper, W, M, theta):
    """Generalized Cauchy point of the L-BFGS-B quadratic along P(x - t g).

    Walks the breakpoints of the projected-gradient path in sorted order,
    updating the directional derivative pair (f', f'') in the compact
    form (BLNZ Algorithm CP), inside one lax.while_loop with static
    shapes.  Returns (x_cauchy, c) with c = W^T (x_cauchy - x).
    """
    eps = jnp.finfo(x.dtype).eps
    n = x.shape[0]
    inf = jnp.inf

    at_lower_out = (x <= lower) & (g > 0)
    at_upper_out = (x >= upper) & (g < 0)
    d = jnp.where(at_lower_out | at_upper_out, 0.0, -g)

    # per-variable breakpoint along x - t g
    t_break = jnp.where(
        d > 0, (upper - x) / jnp.where(d == 0, 1.0, d),
        jnp.where(d < 0, (lower - x) / jnp.where(d == 0, 1.0, d), inf))
    t_break = jnp.where(d == 0, inf, t_break)
    order = jnp.argsort(t_break)
    t_sorted = t_break[order]

    p = W.T @ d                                     # (2m,)
    fp = -(d @ d)
    fpp = -theta * fp - p @ (M @ p)
    fpp = jnp.maximum(fpp, eps)
    dt_min = -fp / fpp

    xc0 = jnp.where(at_lower_out, lower, jnp.where(at_upper_out, upper, x))

    def cond(state):
        j, t_old, fp, fpp, dt_min, p, c, d, xc, done = state
        return (~done) & (j < n)

    def body(state):
        j, t_old, fp, fpp, dt_min, p, c, d, xc, done = state
        b = order[j]
        t_b = t_sorted[j]
        dt = t_b - t_old
        # stop when the 1-D minimizer lands inside this interval, or when
        # the remaining breakpoints are at infinity
        stop = (dt_min < dt) | ~jnp.isfinite(t_b)

        def fix_variable(args):
            fp, fpp, p, c, d, xc = args
            g_b = g[b]
            d_b = d[b]
            bound_b = jnp.where(d_b > 0, upper[b], lower[b])
            z_b = bound_b - x[b]
            c2 = c + dt * p
            w_b = W[b]
            Mw = M @ w_b
            fp2 = (fp + dt * fpp + g_b * g_b + theta * g_b * z_b
                   - g_b * (w_b @ (M @ c2)))
            fpp2 = (fpp - theta * g_b * g_b - 2.0 * g_b * (Mw @ p)
                    - g_b * g_b * (Mw @ w_b))
            fpp2 = jnp.maximum(fpp2, eps)
            p2 = p + g_b * w_b
            d2 = d.at[b].set(0.0)
            xc2 = xc.at[b].set(bound_b)
            return fp2, fpp2, p2, c2, d2, xc2

        fp2, fpp2, p2, c2, d2, xc2 = jax.lax.cond(
            stop, lambda a: a, fix_variable, (fp, fpp, p, c, d, xc))
        dt_min2 = jnp.where(stop, dt_min, -fp2 / fpp2)
        t_old2 = jnp.where(stop, t_old, t_b)
        return (j + 1, t_old2, fp2, fpp2, dt_min2, p2, c2, d2, xc2,
                done | stop)

    c0 = jnp.zeros(W.shape[1], dtype=x.dtype)
    state = (0, jnp.asarray(0.0, x.dtype), fp, fpp, dt_min, p, c0, d,
             xc0, jnp.asarray(False))
    (_, t_old, fp, fpp, dt_min, p, c, d, xc, _) = jax.lax.while_loop(
        cond, body, state)

    dt_min = jnp.maximum(dt_min, 0.0)
    t_cp = t_old + dt_min
    # free variables move to their path position; fixed ones already sit
    # at their bounds in xc
    moved = jnp.clip(x + t_cp * d, lower, upper)
    xc = jnp.where(d != 0, moved, xc)
    c = c + dt_min * p
    return xc, c


def _subspace_step(x, g, xc, c, lower, upper, W, M, theta):
    """Subspace minimizer over the free variables at the Cauchy point.

    Direct primal method with Sherman-Morrison-Woodbury on the compact
    form; fixed variables are masked rather than gathered so all shapes
    stay static under jit.  Returns the line-search target xbar.
    """
    free = (xc > lower) & (xc < upper)
    freef = free.astype(x.dtype)

    # reduced gradient of the quadratic at the Cauchy point
    r = (g + theta * (xc - x) - W @ (M @ c)) * freef

    Wf = W * freef[:, None]                          # zero fixed rows
    k2 = W.shape[1]
    inner = jnp.eye(k2, dtype=x.dtype) - (M @ (Wf.T @ Wf)) / theta
    v = jnp.linalg.solve(inner, M @ (Wf.T @ r))
    du = -(r / theta + (Wf @ v) / (theta * theta))
    du = du * freef

    # longest feasible fraction of the full subspace step
    to_upper = jnp.where(du > 0, (upper - xc) / jnp.where(du == 0, 1.0, du),
                         jnp.inf)
    to_lower = jnp.where(du < 0, (lower - xc) / jnp.where(du == 0, 1.0, du),
                         jnp.inf)
    alpha = jnp.clip(jnp.min(jnp.minimum(to_upper, to_lower)), 0.0, 1.0)
    return jnp.clip(xc + alpha * du, lower, upper)


@functools.partial(jax.jit, static_argnames=())
def _lbfgsb_direction(x, g, S, Y, valid, theta, lower, upper):
    """One fused device program: compact form -> Cauchy point -> subspace."""
    W, M = _compact_form(S, Y, valid, theta)
    xc, c = _cauchy_point(x, g, lower, upper, W, M, theta)
    xbar = _subspace_step(x, g, xc, c, lower, upper, W, M, theta)
    return xbar


class PrysmLBFGSB:
    """Pure-JAX L-BFGS-B: full BLNZ algorithm, device-resident.

    Implements the same method as the compiled driver wrapped by LBFGSB
    (limited-memory compact form, generalized Cauchy point over the
    projected-gradient path, subspace minimization on the free set,
    strong-Wolfe-style line search) with all per-iteration linear algebra
    in one jitted device program; only fg evaluations and the line-search
    control flow run on host.  Reference twins:
    prysm/x/optym/_prysm_lbfgsb.py (pure Python) and _lbfgsb.py (F77).
    """

    def __init__(self, fg, x0, memory=10, lower_bounds=None, upper_bounds=None,
                 c1=1e-4, c2=0.9, max_ls=25):
        """fg(x) -> (f, g); x0 initial vector; memory = history pairs.

        The working dtype tracks x0: an f32 start keeps every history
        buffer, bound, and linear-algebra pass in f32 (integer x0 promotes
        to the default float).
        """
        self.problem = as_problem(fg)
        x0 = jnp.asarray(x0)
        if not jnp.issubdtype(x0.dtype, jnp.floating):
            x0 = x0.astype(float)
        self.x0 = x0.ravel()
        dtype = self.x0.dtype
        n = self.x0.size
        self.m = int(memory)
        self.l = (jnp.full(n, -jnp.inf, dtype=dtype) if lower_bounds is None  # NOQA
                  else jnp.asarray(lower_bounds, dtype=dtype).ravel())
        self.u = (jnp.full(n, jnp.inf, dtype=dtype) if upper_bounds is None
                  else jnp.asarray(upper_bounds, dtype=dtype).ravel())
        self.x = jnp.clip(self.x0, self.l, self.u)
        self.c1 = float(c1)
        self.c2 = float(c2)
        self.max_ls = int(max_ls)

        dt = self.x.dtype
        self._S = jnp.zeros((self.m, n), dtype=dt)
        self._Y = jnp.zeros((self.m, n), dtype=dt)
        self._valid = jnp.zeros(self.m, dtype=bool)
        self._theta = 1.0
        self._prev = None
        self._cached_fg = None
        self.nfev = 0
        self.iter = 0
        self.last_step_metadata = {}

    # -- history ------------------------------------------------------------

    def _admit_pair(self, s, y):
        """Shift in a curvature pair when s.y passes the BLNZ test."""
        sy = float(s @ y)
        yy = float(y @ y)
        if sy <= 2.2e-16 * yy or not np.isfinite(sy):
            return
        self._S = jnp.roll(self._S, -1, axis=0).at[-1].set(s)
        self._Y = jnp.roll(self._Y, -1, axis=0).at[-1].set(y)
        self._valid = jnp.roll(self._valid, -1).at[-1].set(True)
        self._theta = yy / sy

    def _projected_gradient_norm(self, x, g):
        pg = jnp.clip(x - g, self.l, self.u) - x
        return float(jnp.max(jnp.abs(pg)))

    # -- iteration ----------------------------------------------------------

    def step(self):
        """One full L-BFGS-B iteration; returns the pre-step (x, f, g)."""
        if self._cached_fg is not None:
            f, g = self._cached_fg
            self._cached_fg = None
        else:
            f, g = self.problem.fg(self.x)
            self.nfev += 1
        f0 = float(f)
        g = jnp.asarray(g, dtype=self.x.dtype).ravel()

        if self._projected_gradient_norm(self.x, g) == 0.0:
            raise StopIteration(_DriverStop(True, 'projected gradient is zero'))

        if self._prev is not None:
            x_prev, g_prev = self._prev
            self._admit_pair(self.x - x_prev, g - g_prev)

        xbar = _lbfgsb_direction(self.x, g, self._S, self._Y, self._valid,
                                 jnp.asarray(self._theta, self.x.dtype),
                                 self.l, self.u)
        d = xbar - self.x
        slope = float(d @ g)
        if slope >= 0 or not np.isfinite(slope):
            # quadratic model failed to produce descent: steepest-descent
            # restart on the projected gradient
            self._S = jnp.zeros_like(self._S)
            self._Y = jnp.zeros_like(self._Y)
            self._valid = jnp.zeros_like(self._valid)
            self._theta = 1.0
            d = jnp.clip(self.x - g, self.l, self.u) - self.x
            slope = float(d @ g)
            if slope >= 0:
                raise StopIteration(_DriverStop(True, 'no descent direction'))

        x, accepted = self.x, False
        alpha, lo, hi = 1.0, 0.0, np.inf
        f_best, x_best, fg_best = np.inf, None, None
        for _ in range(self.max_ls):
            x_trial = jnp.clip(x + alpha * d, self.l, self.u)
            f_trial, g_trial = self.problem.fg(x_trial)
            f_trial = float(f_trial)
            self.nfev += 1
            if f_trial < f_best:
                f_best, x_best = f_trial, x_trial
                fg_best = (f_trial,
                           jnp.asarray(g_trial, dtype=self.x.dtype).ravel())
            if f_trial > f0 + self.c1 * alpha * slope or not np.isfinite(f_trial):
                hi = alpha
                alpha = 0.5 * (lo + hi)
                continue
            dslope = float(jnp.asarray(g_trial, dtype=self.x.dtype).ravel() @ d)
            if abs(dslope) <= self.c2 * abs(slope):
                accepted = True
                break
            if dslope < 0:
                lo = alpha
                alpha = 2 * alpha if np.isinf(hi) else 0.5 * (lo + hi)
            else:
                hi = alpha
                alpha = 0.5 * (lo + hi)
        if not accepted:
            if f_best < f0:
                x_trial, (f_trial, g_trial) = x_best, fg_best
            else:
                raise StopIteration(_DriverStop(False, 'line search failed'))

        self._prev = (x, g)
        self.x = x_trial
        self._cached_fg = (f_trial,
                           jnp.asarray(g_trial, dtype=self.x.dtype).ravel())
        self.iter += 1
        self.last_step_metadata = {'alpha': alpha, 'f_next': float(f_trial)}
        return x, f0, g

    def run_to(self, N):
        """Run up to N iterations; returns (x, f, g) at the final point."""
        for _ in range(N):
            try:
                self.step()
            except StopIteration:
                break
        f, g = (self._cached_fg if self._cached_fg is not None
                else self.problem.fg(self.x))
        return self.x, float(f), jnp.asarray(g, dtype=self.x.dtype)
