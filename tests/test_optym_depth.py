"""Optym depth: port of the reference optym submodule suites' intent.

Behavior matrix of the reference tests for least_squares (DLS
constraints, damping modes, trust radii, analytic Jacobians), cost
functions (masking, dtype guards, FD gradients), governors, the
Problem adapter (FD derivatives, duck typing), the strong Wolfe line
search, activation functions, and first-order optimizer contracts
(old-x convention, bound projection, momentum masking at active
bounds).
"""
import warnings

import numpy as np
import pytest

import jax  # NOQA: F401

from prysm_tpu.x.optym import (
    Adam, AdaGrad, AdaMomentum, AnyGovernor, ConstraintTolerance,
    DampedLeastSquares, FunctionTolerance, GradientDescent,
    GradientTolerance, LBFGSB, MaxEvaluations, MaxIterations,
    Problem, RAdam, RMSProp, StepRecord, StepTolerance, Yogi,
    as_problem, damped_least_squares, ls_strong_wolfe, rosenbrock,
    runN, run_until,
    Tanh, Arctan, Softplus, Sigmoid, Softmax,
    bias_and_gain_invariant_error, mean_square_error,
    negative_loglikelihood,
)


class _VectorResidualProblem:
    def __init__(self, target):
        self.target = np.asarray(target, dtype=float)

    def residuals(self, x):
        return np.asarray(x, dtype=float) - self.target


def quadratic_fg(x):
    return float(0.5 * np.sum(x * x)), x.copy()


# ---------- damped least squares --------------------------------------------

def test_dls_equality_constraint():
    result = damped_least_squares(
        _VectorResidualProblem([3.0, 4.0]), x0=np.array([0.0, 0.0]),
        equality_constraints=lambda x: x[0] + x[1] - 1.0,
        damping=0.0, maxiter=3)
    assert result.success
    np.testing.assert_allclose(result.x, [0.0, 1.0], atol=1e-9)


def test_dls_active_inequality_constraint():
    result = damped_least_squares(
        _VectorResidualProblem([0.0, 0.0]), x0=np.array([4.0, 1.0]),
        inequality_constraints=lambda x: x[0] - 2.0,
        damping=0.0, maxiter=3)
    assert result.success
    np.testing.assert_allclose(result.x, [2.0, 0.0], atol=1e-9)
    assert result.lambda_ineq[0] < 0.0


def test_dls_step_returns_old_x():
    opt = DampedLeastSquares(_VectorResidualProblem([1.0, 2.0]),
                             x0=np.array([0.0, 0.0]), damping=0.0, maxiter=5)
    x_returned, f, g = opt.step()
    np.testing.assert_array_equal(x_returned, [0.0, 0.0])
    np.testing.assert_allclose(f, 2.5)
    np.testing.assert_allclose(g, [-1.0, -2.0])
    np.testing.assert_allclose(opt.x, [1.0, 2.0], atol=1e-9)
    assert opt.iter == 1


def test_dls_with_runN():
    opt = DampedLeastSquares(_VectorResidualProblem([1.0, 2.0]),
                             x0=np.array([0.0, 0.0]), damping=0.0, maxiter=5)
    x_returned, f, g = next(runN(opt, 1))
    np.testing.assert_array_equal(x_returned, [0.0, 0.0])
    np.testing.assert_allclose(f, 2.5)
    np.testing.assert_allclose(opt.x, [1.0, 2.0], atol=1e-9)


def test_dls_sensitivity_damping_diagonal():
    class Scaled:
        def residuals(self, x):
            x = np.asarray(x, dtype=float)
            return np.array([10 * x[0] - 1, x[1] - 1])

    opt = DampedLeastSquares(Scaled(), x0=np.array([0.0, 0.0]), damping=0.5,
                             damping_mode='sensitivity', damping_floor=0.0,
                             maxiter=5)
    opt.step()
    np.testing.assert_allclose(opt.last_step_metadata['damping_diagonal'],
                               [50.0, 0.5], rtol=1e-5)


def test_dls_trust_radii_scale_whole_step():
    opt = DampedLeastSquares(_VectorResidualProblem([10.0, 1.0]),
                             x0=np.array([0.0, 0.0]), damping=0.0,
                             trust_radii=np.array([0.5, np.inf]), maxiter=5)
    opt.step()
    np.testing.assert_allclose(opt.x, [0.5, 0.05], atol=1e-12)
    assert opt.last_step_metadata['trust_scale'] == pytest.approx(0.05)


def test_dls_adaptive_damping_decreases_on_accept():
    opt = DampedLeastSquares(_VectorResidualProblem([1.0]),
                             x0=np.array([0.0]), damping=10.0,
                             adaptive_damping=True, damping_decrease=0.5,
                             maxiter=5)
    opt.step()
    assert opt.last_step_metadata['damping'] == 10.0
    assert opt.damping == 5.0


class _AnalyticJacobianProblem:
    def __init__(self, target, decline=False):
        self.target = np.asarray(target, dtype=float)
        self.decline = decline
        self.n_res = 0
        self.n_jac = 0

    def residuals(self, x):
        self.n_res += 1
        return np.asarray(x, dtype=float) - self.target

    def residual_jacobian(self, x):
        self.n_jac += 1
        return None if self.decline else np.eye(self.target.size)


def test_dls_uses_analytic_jacobian():
    problem = _AnalyticJacobianProblem([3.0, 4.0])
    result = damped_least_squares(problem, x0=np.array([0.0, 0.0]),
                                  damping=0.0, maxiter=3)
    assert result.success
    np.testing.assert_allclose(result.x, [3.0, 4.0], atol=1e-12)
    assert problem.n_jac >= 1


def test_dls_fd_fallback_when_jacobian_declines():
    r1 = damped_least_squares(_AnalyticJacobianProblem([3.0, 4.0],
                                                       decline=True),
                              x0=np.array([0.0, 0.0]), damping=0.0, maxiter=3)
    r2 = damped_least_squares(_VectorResidualProblem([3.0, 4.0]),
                              x0=np.array([0.0, 0.0]), damping=0.0, maxiter=3)
    assert r1.success
    np.testing.assert_allclose(r1.x, r2.x, atol=1e-12)
    assert r1.nfev == r2.nfev


def test_dls_analytic_jacobian_cuts_nfev():
    rf = damped_least_squares(_AnalyticJacobianProblem([3.0, 4.0]),
                              x0=np.array([0.0, 0.0]), damping=0.0, maxiter=3)
    rs = damped_least_squares(_VectorResidualProblem([3.0, 4.0]),
                              x0=np.array([0.0, 0.0]), damping=0.0, maxiter=3)
    np.testing.assert_allclose(rf.x, rs.x, atol=1e-12)
    assert rf.nfev < rs.nfev


# ---------- cost functions ---------------------------------------------------

def test_mse_unmasked():
    M = np.array([1.0, 2.0, 3.0, 4.0])
    D = np.zeros(4)
    cost, grad = mean_square_error(M, D)
    np.testing.assert_allclose(cost, 30 / 4)
    np.testing.assert_allclose(grad, 2 * M / M.size)


def test_mse_masked_scatter():
    M = np.array([1.0, 2.0, 3.0, 4.0])
    D = np.zeros(4)
    mask = np.array([True, False, True, False])
    cost, grad = mean_square_error(M, D, mask=mask)
    np.testing.assert_allclose(cost, 5.0)
    np.testing.assert_allclose(grad[~mask], 0.0)
    np.testing.assert_allclose(grad[mask], 2 * M[mask] / mask.sum())


def test_mse_grad_dtype_tracks_input():
    M = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    _, grad = mean_square_error(M, np.zeros(3, dtype=np.float32))
    assert np.asarray(grad).dtype == np.float32


def test_bgie_zero_on_affine_match():
    rng = np.random.default_rng(1)
    D = rng.standard_normal(64) + 2.0
    I = 2.5 * D + 7.0  # NOQA
    cost, grad = bias_and_gain_invariant_error(I, D)
    np.testing.assert_allclose(cost, 0.0, atol=1e-18)
    np.testing.assert_allclose(grad, 0.0, atol=1e-12)


def test_bgie_grad_matches_fd():
    rng = np.random.default_rng(2)
    D = rng.standard_normal(16) + 1.0
    I = rng.standard_normal(16) + 0.5  # NOQA
    _, grad = bias_and_gain_invariant_error(I, D)
    eps = 1e-6
    fd = np.zeros_like(I)
    for i in range(I.size):
        Ip, Im = I.copy(), I.copy()
        Ip[i] += eps
        Im[i] -= eps
        fd[i] = (bias_and_gain_invariant_error(Ip, D)[0]
                 - bias_and_gain_invariant_error(Im, D)[0]) / (2 * eps)
    np.testing.assert_allclose(grad, fd, rtol=1e-6, atol=1e-10)


def test_bgie_mask_equals_manual_subset():
    rng = np.random.default_rng(0)
    D = rng.standard_normal(32) + 1.0
    I = rng.standard_normal(32) + 0.5  # NOQA
    mask = np.zeros(32, dtype=bool)
    mask[:16] = True
    cost_m, grad_m = bias_and_gain_invariant_error(I, D, mask=mask)
    cost_u, grad_u = bias_and_gain_invariant_error(I[mask], D[mask])
    np.testing.assert_allclose(cost_m, cost_u)
    np.testing.assert_allclose(grad_m[mask], grad_u)
    np.testing.assert_allclose(grad_m[~mask], 0.0)


def test_nll_at_exact_match():
    y = np.array([0.5, 0.7, 0.9])
    cost, grad = negative_loglikelihood(y, y.copy())
    np.testing.assert_allclose(grad, 0.0, atol=1e-12)
    expected = -(y * np.log(y) + (1 - y) * np.log(1 - y)).mean()
    np.testing.assert_allclose(cost, expected)


def test_nll_scalar_yhat_with_mask():
    y = np.array([0.5, 0.7, 0.9])
    mask = np.array([True, False, True])
    cost, grad = negative_loglikelihood(y, 0.5, mask=mask)
    np.testing.assert_allclose(grad[~mask], 0.0)
    assert np.isfinite(cost)


def test_cost_dtype_mismatch_raises():
    M = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    D = np.zeros(3, dtype=np.float64)
    with pytest.raises(TypeError, match='dtype mismatch'):
        mean_square_error(M, D)


def test_cost_dtype_check_skips_scalar():
    negative_loglikelihood(np.array([0.5, 0.7]), 0.5)   # must not raise


# ---------- governors --------------------------------------------------------

def test_run_until_max_iterations():
    opt = GradientDescent(quadratic_fg, np.array([1.0, -2.0]), alpha=0.1)
    result = run_until(opt, MaxIterations(3))
    assert not result.success
    assert result.message == 'maximum iterations reached'
    assert result.nit == 3
    assert len(result.records) == 3
    np.testing.assert_allclose(result.x, [0.729, -1.458])
    np.testing.assert_array_equal(result.records[0].x, [1.0, -2.0])
    np.testing.assert_allclose(result.records[0].x_next, [0.9, -1.8])


def test_function_tolerance_stops():
    opt = GradientDescent(quadratic_fg, np.array([1.0]), alpha=0.5)
    result = run_until(opt, FunctionTolerance(0.1, relative=False))
    assert result.success
    assert result.message == 'function tolerance reached'
    assert result.nit == 3


def test_gradient_tolerance_stops():
    opt = GradientDescent(quadratic_fg, np.array([1.0]), alpha=0.5)
    result = run_until(opt, GradientTolerance(0.6))
    assert result.success
    assert result.message == 'gradient tolerance reached'
    assert result.nit == 2


def test_step_tolerance_stops_adam():
    opt = Adam(quadratic_fg, np.array([1.0]), alpha=0.1)
    result = run_until(opt, StepTolerance(0.2))
    assert result.success
    assert result.message == 'step tolerance reached'
    assert result.nit == 1


def test_run_until_with_lbfgsb_records_task():
    opt = LBFGSB(quadratic_fg, np.array([1.0, -1.0]))
    result = run_until(opt, MaxIterations(1))
    assert not result.success
    assert result.nit == 1
    assert result.nfev >= 1
    assert 'task' in result.records[0].metadata


def test_dls_metadata_with_generic_governors():
    opt = DampedLeastSquares(_VectorResidualProblem([1.0, 2.0]),
                             x0=np.array([0.0, 0.0]), damping=0.0, maxiter=5)
    governor = AnyGovernor([FunctionTolerance(10.0, relative=False),
                            ConstraintTolerance(1e-12)])
    result = run_until(opt, governor)
    assert result.success
    assert result.message == 'function tolerance reached'
    np.testing.assert_allclose(result.x, [1.0, 2.0], atol=1e-9)
    assert result.records[0].metadata['accepted']
    assert result.records[0].metadata['step_norm'] > 0


def test_max_evaluations_reads_nfev():
    opt = DampedLeastSquares(_VectorResidualProblem([1.0, 2.0]),
                             x0=np.array([0.0, 0.0]), damping=0.0, maxiter=5)
    result = run_until(opt, MaxEvaluations(1))
    assert not result.success
    assert result.message == 'maximum function evaluations reached'
    assert result.nfev >= 1


def test_step_record_aliases_inputs():
    x, g, x_next = np.array([1.0]), np.array([2.0]), np.array([3.0])
    record = StepRecord(None, 1, x, 4.0, g, x_next)
    assert record.x is x
    assert record.g is g
    assert record.x_next is x_next


# ---------- Problem adapter --------------------------------------------------

def _half_quadratic(x):
    return float(0.5 * np.sum(x * x))


class FGOnly(Problem):
    """Counts joint fg evaluations of the half-quadratic."""

    has_fg = True
    calls = 0

    def _fg(self, x):
        self.calls += 1
        return _half_quadratic(x), x


class SeparateFG(Problem):
    """Counts split f and g evaluations of the half-quadratic."""

    has_f = has_g = True
    f_calls = g_calls = 0

    def _f(self, x):
        self.f_calls += 1
        return _half_quadratic(x)

    def _g(self, x):
        self.g_calls += 1
        return x


class FOnly(Problem):
    has_f = True

    def __init__(self, fd_method='central'):
        super().__init__(fd_method=fd_method)

    _f = staticmethod(_half_quadratic)


class GOnly(Problem):
    has_g = True

    def _g(self, x):
        return x


def test_problem_f_routes_to_fg():
    p = FGOnly()
    np.testing.assert_allclose(p.f(np.array([3.0, 4.0])), 12.5)
    assert p.calls == 1


def test_problem_g_routes_to_fg():
    p = FGOnly()
    np.testing.assert_allclose(p.g(np.array([3.0, 4.0])), [3.0, 4.0])
    assert p.calls == 1


def test_problem_fg_routes_to_f_and_g():
    p = SeparateFG()
    f, g = p.fg(np.array([3.0, 4.0]))
    np.testing.assert_allclose(f, 12.5)
    np.testing.assert_allclose(g, [3.0, 4.0])
    assert p.f_calls == 1 and p.g_calls == 1


def test_problem_forward_difference_gradient():
    p = FOnly(fd_method='forward')
    x = np.array([3.0, 4.0])
    np.testing.assert_allclose(p.g(x), x, rtol=1e-6, atol=1e-6)


def test_problem_central_difference_gradient():
    p = FOnly(fd_method='central')
    x = np.array([3.0, 4.0])
    np.testing.assert_allclose(p.g(x), x, rtol=1e-9, atol=1e-9)


def test_problem_hessian_from_g():
    p = GOnly()
    np.testing.assert_allclose(p.h(np.array([3.0, 4.0])), np.eye(2),
                               rtol=1e-9, atol=1e-9)


def test_problem_hvp_from_g():
    p = GOnly()
    v = np.array([1.0, -2.0])
    np.testing.assert_allclose(p.hvp(np.array([3.0, 4.0]), v), v,
                               rtol=1e-9, atol=1e-9)


def test_problem_rejects_unknown_fd_method():
    with pytest.raises(ValueError):
        Problem(fd_method='backward')


def test_as_problem_identity_and_ducks():
    p = FGOnly()
    assert as_problem(p) is p

    class Duck:
        def fg(self, x):
            return 0.0, x
    d = Duck()
    assert as_problem(d) is d


def test_as_problem_wraps_callable_and_rejects_other():
    p = as_problem(quadratic_fg)
    f, g = p.fg(np.array([1.0, -2.0]))
    np.testing.assert_allclose(f, 2.5)
    np.testing.assert_allclose(g, [1.0, -2.0])
    with pytest.raises(TypeError):
        as_problem(42)


def test_adam_accepts_problem_instance():
    p = FGOnly()
    x0 = np.array([5.0, -3.0])
    opt = Adam(p, x0, alpha=0.5)
    for _ in range(200):
        x, f, g = opt.step()
    assert f < quadratic_fg(x0)[0] * 1e-3


# ---------- strong Wolfe line search ----------------------------------------

C1, C2 = 1e-4, 0.9


def _wolfe_holds(fg, xk, pk, alpha, phi_a, derphi_a):
    f0, g0 = fg(xk)
    derphi0 = float(np.dot(g0, pk))
    return (phi_a <= f0 + C1 * alpha * derphi0 + 1e-12
            and abs(derphi_a) <= C2 * abs(derphi0) + 1e-12)


def test_wolfe_accepts_alpha_one_on_identity_quadratic():
    def fg(x):
        return float(0.5 * np.sum(x * x)), x
    xk = np.array([1.0, -2.0])
    pk = -fg(xk)[1]
    alpha, phi_a, derphi_a, g_a = ls_strong_wolfe(fg, xk, pk)
    assert alpha is not None
    np.testing.assert_allclose(alpha, 1.0)
    np.testing.assert_allclose(phi_a, 0.0, atol=1e-12)
    assert _wolfe_holds(fg, xk, pk, alpha, phi_a, derphi_a)


def test_wolfe_zooms_on_overshoot():
    H = 10.0 * np.eye(2)

    def fg(x):
        return float(0.5 * x @ H @ x), H @ x
    xk = np.array([1.0, 1.0])
    pk = -fg(xk)[1]
    alpha, phi_a, derphi_a, _ = ls_strong_wolfe(fg, xk, pk)
    assert alpha is not None and 0 < alpha < 1.0
    assert _wolfe_holds(fg, xk, pk, alpha, phi_a, derphi_a)


def test_wolfe_extrapolates_on_undershoot():
    H = 0.01 * np.eye(2)

    def fg(x):
        return float(0.5 * x @ H @ x), H @ x
    xk = np.array([1.0, -1.0])
    pk = -fg(xk)[1]
    alpha, phi_a, derphi_a, _ = ls_strong_wolfe(fg, xk, pk)
    assert alpha is not None and alpha > 1.0
    assert _wolfe_holds(fg, xk, pk, alpha, phi_a, derphi_a)


def test_wolfe_respects_maxalpha():
    def fg(x):
        return float(0.5 * np.sum(x * x)), x
    xk = np.array([1.0, -1.0])
    pk = -fg(xk)[1]
    alpha, phi_a, derphi_a, _ = ls_strong_wolfe(fg, xk, pk, maxalpha=0.5)
    assert alpha is not None and alpha <= 0.5 + 1e-12
    assert _wolfe_holds(fg, xk, pk, alpha, phi_a, derphi_a)


def test_wolfe_returns_gradient_at_accepted_alpha():
    def fg(x):
        return float(0.5 * np.sum(x * x)), x
    xk = np.array([1.0, -2.0])
    pk = -fg(xk)[1]
    alpha, _, _, g_a = ls_strong_wolfe(fg, xk, pk)
    np.testing.assert_allclose(g_a, fg(xk + alpha * pk)[1], atol=1e-12)


# ---------- activation functions --------------------------------------------

def _fd1(fn, x, eps=1e-7):
    return (fn(x + eps) - fn(x - eps)) / (2 * eps)


@pytest.mark.parametrize('cls, ref_fn', [
    (Tanh, np.tanh),
    (Arctan, np.arctan),
])
def test_activation_forward(cls, ref_fn):
    x = np.linspace(-1, 1)
    np.testing.assert_allclose(np.asarray(cls().forward(x)), ref_fn(x),
                               atol=1e-12)


@pytest.mark.parametrize('cls', [Tanh, Arctan, Softplus, Sigmoid])
def test_activation_backprop_matches_fd(cls):
    x = np.linspace(-1, 1)
    act = cls()
    truth = _fd1(lambda u: np.asarray(act.forward(u)), x)
    np.testing.assert_allclose(np.asarray(act.backprop(x)), truth, rtol=1e-5,
                               atol=1e-6)


def test_softmax_forward_rows_sum_to_one():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 4))
    out = np.asarray(Softmax().forward(x))
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    np.testing.assert_allclose(out, e / e.sum(axis=-1, keepdims=True),
                               atol=1e-12)
    np.testing.assert_allclose(out.sum(axis=-1), 1.0)


def test_softmax_backprop_is_vjp():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 4))
    grad = rng.standard_normal((5, 4))
    sm = Softmax()
    s = np.asarray(sm.forward(x))
    vjp = np.asarray(sm.backprop(grad))
    # analytic softmax VJP: s * (grad - sum(grad * s))
    expected = s * (grad - (grad * s).sum(axis=-1, keepdims=True))
    np.testing.assert_allclose(vjp, expected, atol=1e-10)


# ---------- first-order optimizer contracts ---------------------------------

H_DIAG = np.array([1.0, 2.0, 0.5, 4.0])


def hfg(x):
    return float(0.5 * np.sum(H_DIAG * x * x)), H_DIAG * x


X0 = np.array([1.0, -2.0, 3.0, -0.5])

FIRST_ORDER = [
    (GradientDescent, {'alpha': 0.1}),
    (AdaGrad, {'alpha': 0.1}),
    (RMSProp, {'alpha': 0.1}),
    (Adam, {'alpha': 0.1}),
    (RAdam, {'alpha': 0.1}),
    (AdaMomentum, {'alpha': 0.1}),
    (Yogi, {'alpha': 0.1}),
]


@pytest.mark.parametrize('cls, kwargs', FIRST_ORDER)
def test_first_order_optimizers_descend(cls, kwargs):
    opt = cls(hfg, X0.copy(), **kwargs)
    fs = []
    for _ in range(30):
        x, f, _ = opt.step()
        fs.append(f)
    assert fs[-1] < fs[0]


def test_all_optimizers_old_x_convention():
    for cls, kwargs in FIRST_ORDER:
        opt = cls(hfg, X0.copy(), **kwargs)
        x_before = np.asarray(opt.x).copy()
        x_returned, f, g = opt.step()
        np.testing.assert_array_equal(
            np.asarray(x_returned), x_before,
            err_msg=f'{cls.__name__}.step() returned the wrong iterate')
        np.testing.assert_allclose(f, hfg(x_before)[0])
        assert not np.array_equal(np.asarray(opt.x), x_before)


def test_lbfgsb_step_triple_is_coherent():
    opt = LBFGSB(hfg, X0.copy())
    x, f, g = opt.step()
    np.testing.assert_array_equal(x, X0)
    f_check, g_check = hfg(np.asarray(x))
    np.testing.assert_allclose(f, f_check)
    np.testing.assert_allclose(g, g_check)


def test_lbfgsb_run_to_quiet_on_quadratic():
    opt = LBFGSB(hfg, X0.copy())
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        traj = list(opt.run_to(10))
    assert len(traj) == 10


def test_lbfgsb_rosenbrock_runs_full_iterations():
    opt = LBFGSB(rosenbrock, np.array([-1.2, 1.0]))
    result = run_until(opt, MaxIterations(5), maxiter=5)
    assert result.nit == 5
    assert not result.success


def test_lbfgsb_warns_when_driver_converges_early():
    opt = LBFGSB(hfg, np.zeros(4))    # exactly stationary start
    with pytest.warns(UserWarning, match='L-BFGS-B'):
        list(opt.run_to(10))


@pytest.mark.parametrize('cls, kwargs', FIRST_ORDER)
def test_first_order_default_bounds_unconstrained(cls, kwargs):
    x0 = np.array([1.0, -2.0], dtype=np.float32)
    opt = cls(hfg, x0, **kwargs)
    assert opt.l.shape == x0.shape and opt.u.shape == x0.shape
    assert opt.l.dtype == x0.dtype and opt.u.dtype == x0.dtype
    assert not opt._has_bounds
    assert np.all(np.isneginf(opt.l)) and np.all(np.isposinf(opt.u))


@pytest.mark.parametrize('cls, kwargs', FIRST_ORDER)
def test_first_order_projects_x0_and_steps(cls, kwargs):
    def outward_fg(x):
        return float(np.sum(x)), np.ones_like(x)

    lb, ub = np.array([0.0, 0.0]), np.array([1.0, 1.0])
    opt = cls(outward_fg, np.array([-2.0, 2.0]),
              lower_bounds=lb, upper_bounds=ub, **kwargs)
    np.testing.assert_array_equal(np.asarray(opt.x), [0.0, 1.0])
    x_returned, _, _ = opt.step()
    np.testing.assert_array_equal(np.asarray(x_returned), [0.0, 1.0])
    assert np.all(np.asarray(opt.x) >= lb) and np.all(np.asarray(opt.x) <= ub)
    assert opt.last_step_metadata['bounded_variables'] >= 1


@pytest.mark.parametrize('cls, kwargs', FIRST_ORDER)
def test_active_bound_masks_outward_but_allows_inward(cls, kwargs):
    gradient = np.array([1.0])

    def fg(x):
        return float(gradient[0] * x[0]), gradient.copy()

    opt = cls(fg, np.array([0.0]), lower_bounds=np.array([0.0]),
              upper_bounds=np.array([1.0]), **kwargs)
    _, _, g = opt.step()
    np.testing.assert_array_equal(np.asarray(g), [1.0])
    np.testing.assert_array_equal(
        np.asarray(opt.last_step_metadata['projected_gradient']), [0.0])
    np.testing.assert_array_equal(np.asarray(opt.x), [0.0])
    gradient[0] = -1.0
    opt.step()
    assert float(np.asarray(opt.x)[0]) > 0.0


def test_adam_momentum_not_accumulated_at_bound():
    def fg(x):
        return float(x[0]), np.array([1.0])

    opt = Adam(fg, np.array([0.0]), alpha=0.1,
               lower_bounds=np.array([0.0]), upper_bounds=np.array([1.0]))
    opt.step()
    np.testing.assert_array_equal(np.asarray(opt.x), [0.0])
    np.testing.assert_array_equal(np.asarray(opt.m), [0.0])
    np.testing.assert_array_equal(np.asarray(opt.v), [0.0])


def test_adagrad_accumulator_not_fed_at_bound():
    def fg(x):
        return float(x[0]), np.array([1.0])

    opt = AdaGrad(fg, np.array([0.0]), alpha=0.1,
                  lower_bounds=np.array([0.0]), upper_bounds=np.array([1.0]))
    opt.step()
    np.testing.assert_array_equal(np.asarray(opt.x), [0.0])
    assert float(np.sum(np.asarray(opt.accumulator))) == \
        pytest.approx(0.0, abs=1e-30)


def test_first_order_bounds_validate_shape_and_order():
    """Box bounds are validated at construction: size mismatch and
    crossed bounds each raise (reference optimizer-regression suite)."""
    with pytest.raises(ValueError, match='same shape or size'):
        GradientDescent(quadratic_fg, np.array([0.0, 1.0]), alpha=0.1,
                        lower_bounds=np.zeros(3))
    with pytest.raises(ValueError, match='lower_bounds'):
        GradientDescent(quadratic_fg, np.array([0.0, 1.0]), alpha=0.1,
                        lower_bounds=np.array([1.0, 0.0]),
                        upper_bounds=np.array([0.0, 1.0]))
