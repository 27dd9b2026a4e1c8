"""PrysmLBFGSB in depth: the full BLNZ algorithm against dense oracles.

Port of the *intent* of the reference's
``tests/x/optym/test_optym_prysm_lbfgsb.py`` (63 tests) to this repo's
architecture: construction and bookkeeping, history admission and rolling,
the compact representation vs an independently-built dense BFGS matrix,
the generalized Cauchy point vs a dense segment-walk oracle, subspace
minimization vs a dense Newton solve, bounded convergence, and the fp32
robustness family (the working dtype tracks x0).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from prysm_tpu.x.optym.lbfgsb import (
    PrysmLBFGSB,
    _cauchy_point,
    _compact_form,
    _lbfgsb_direction,
    _subspace_step,
)
from prysm_tpu.x.optym.problem import Problem


# ---------------------------------------------------------------------------
# problems
# ---------------------------------------------------------------------------

def _sphere_fg(x):
    x = np.asarray(x, dtype=np.float64)
    return float(x @ x), 2.0 * x


class _SphereProblem(Problem):
    def fg(self, x):
        return _sphere_fg(x)


def _make_quadratic(dim, dtype=np.float64, seed=0, cond=None):
    """(fg, x_star, A) for f = 0.5 (x - x*)^T A (x - x*), A SPD."""
    rng = np.random.default_rng(seed)
    if cond is None:
        Q = rng.standard_normal((dim, dim))
        A = Q.T @ Q + np.eye(dim) * dim
    else:
        # exact spectrum from 1 to cond through a random rotation
        evals = np.geomspace(1.0, cond, dim)
        Q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
        A = (Q * evals) @ Q.T
    A = A.astype(dtype)
    x_star = rng.standard_normal(dim).astype(dtype)

    def fg(x):
        d = np.asarray(x, dtype=dtype) - x_star
        return float(0.5 * d @ A @ d), (A @ d).astype(dtype)

    return fg, x_star, A


def _rosenbrock_fg(x):
    x = np.asarray(x, dtype=np.float64)
    f = float(np.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                     + (1.0 - x[:-1]) ** 2))
    g = np.zeros_like(x)
    g[:-1] = -400.0 * x[:-1] * (x[1:] - x[:-1] ** 2) - 2.0 * (1.0 - x[:-1])
    g[1:] += 200.0 * (x[1:] - x[:-1] ** 2)
    return f, g


# ---------------------------------------------------------------------------
# dense oracles, independent of the compact-form implementation
# ---------------------------------------------------------------------------

def _dense_bfgs_matrix(S, Y, valid, theta, n):
    """B built by iterated dense BFGS updates (not the compact form)."""
    B = np.eye(n) * float(theta)
    for s, y, ok in zip(np.asarray(S), np.asarray(Y), np.asarray(valid)):
        if not ok:
            continue
        Bs = B @ s
        B = B - np.outer(Bs, Bs) / (s @ Bs) + np.outer(y, y) / (y @ s)
    return B


def _dense_cauchy(x, g, lo, hi, B):
    """Generalized Cauchy point by explicit segment walk with dense B.

    An independent oracle for BLNZ Algorithm CP: march the projected
    gradient path breakpoint by breakpoint, minimizing the quadratic
    model on each segment with explicit matrix algebra.
    """
    n = x.size
    t_hit = np.full(n, np.inf)
    down = g > 0
    up = g < 0
    t_hit[down] = (x[down] - lo[down]) / g[down]
    t_hit[up] = (x[up] - hi[up]) / g[up]
    walk = np.argsort(t_hit)

    xc = x.astype(np.float64).copy()
    free = np.ones(n, dtype=bool)
    t_prev = 0.0
    for b in walk:
        seg = np.where(free, -g, 0.0)
        slope = g @ seg + (xc - x) @ B @ seg
        curv = seg @ B @ seg
        if slope >= 0:
            t_star = 0.0
        elif curv <= 0:
            t_star = np.inf
        else:
            t_star = -slope / curv
        span = t_hit[b] - t_prev
        if t_star < span:
            return xc + t_star * seg
        if not np.isfinite(t_hit[b]):
            return xc
        xc = xc + span * seg
        xc[b] = lo[b] if g[b] > 0 else hi[b]
        free[b] = False
        t_prev = t_hit[b]
    return xc


def _fill_history(opt, fg, n_steps):
    """Advance the optimizer so real curvature pairs populate history."""
    for _ in range(n_steps):
        try:
            opt.step()
        except StopIteration:
            break


def _compact_parts(opt):
    W, M = _compact_form(opt._S, opt._Y, opt._valid,
                         jnp.asarray(opt._theta, opt.x.dtype))
    return np.asarray(W), np.asarray(M)


def _B_from_compact(opt):
    """Dense B reconstructed from the compact form: theta I - W M W^T."""
    W, M = _compact_parts(opt)
    n = opt.x.size
    return float(opt._theta) * np.eye(n) - W @ M @ W.T


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def test_construct_with_callable():
    opt = PrysmLBFGSB(_sphere_fg, np.array([1.0, 2.0]))
    assert np.allclose(np.asarray(opt.x), [1.0, 2.0])


def test_construct_with_problem_instance():
    opt = PrysmLBFGSB(_SphereProblem(), np.array([1.0, 2.0]))
    f, g = opt.problem.fg(opt.x)
    assert f == pytest.approx(5.0)


def test_construct_with_explicit_bounds_clips_x0():
    opt = PrysmLBFGSB(_sphere_fg, np.array([5.0, -5.0]),
                      lower_bounds=[-1.0, -1.0], upper_bounds=[1.0, 1.0])
    assert np.allclose(np.asarray(opt.x), [1.0, -1.0])


def test_default_bounds_are_infinite():
    opt = PrysmLBFGSB(_sphere_fg, np.zeros(3))
    assert np.all(np.asarray(opt.l) == -np.inf)
    assert np.all(np.asarray(opt.u) == np.inf)


@pytest.mark.parametrize('dtype', [np.float32, np.float64])
def test_working_dtype_tracks_x0(dtype):
    opt = PrysmLBFGSB(_sphere_fg, np.ones(4, dtype=dtype))
    assert opt.x.dtype == dtype
    assert opt._S.dtype == dtype
    assert opt._Y.dtype == dtype
    assert opt.l.dtype == dtype


def test_integer_x0_promotes_to_float():
    opt = PrysmLBFGSB(_sphere_fg, np.array([1, 2, 3]))
    assert jnp.issubdtype(opt.x.dtype, jnp.floating)


def test_history_starts_empty():
    opt = PrysmLBFGSB(_sphere_fg, np.ones(3), memory=5)
    assert not bool(np.asarray(opt._valid).any())
    assert opt.iter == 0
    assert opt.nfev == 0


# ---------------------------------------------------------------------------
# step bookkeeping
# ---------------------------------------------------------------------------

def test_first_step_is_projected_steepest_descent():
    """With no history, the subspace model is B = theta I = I, so the
    first trial direction is the (projected) steepest descent step."""
    x0 = np.array([0.3, -0.2, 0.1])
    opt = PrysmLBFGSB(_sphere_fg, x0)
    _, g0 = _sphere_fg(x0)
    xbar = np.asarray(_lbfgsb_direction(
        opt.x, jnp.asarray(g0), opt._S, opt._Y, opt._valid,
        jnp.asarray(1.0, opt.x.dtype), opt.l, opt.u))
    np.testing.assert_allclose(xbar, x0 - g0, atol=1e-12)


def test_step_returns_pre_step_iterate():
    x0 = np.array([1.0, -2.0])
    opt = PrysmLBFGSB(_sphere_fg, x0)
    x_pre, f_pre, g_pre = opt.step()
    np.testing.assert_allclose(np.asarray(x_pre), x0)
    assert f_pre == pytest.approx(5.0)
    np.testing.assert_allclose(np.asarray(g_pre), 2.0 * x0)
    assert float(np.asarray(opt.x) @ np.asarray(opt.x)) < 5.0


def test_step_advances_bookkeeping():
    fg, _, _ = _make_quadratic(4, seed=0)
    opt = PrysmLBFGSB(fg, np.zeros(4))
    opt.step()
    assert opt.iter == 1
    assert opt.nfev >= 2  # initial eval + at least one line-search trial
    opt.step()
    assert opt.iter == 2


def test_zero_gradient_stops_with_success():
    opt = PrysmLBFGSB(_sphere_fg, np.zeros(3))
    with pytest.raises(StopIteration) as e:
        opt.step()
    assert e.value.value.success


def test_linesearch_failure_reports_unsuccessful():
    """A pathological fg that always increases cannot satisfy Armijo."""
    def bad_fg(x):
        x = np.asarray(x)
        # gradient points away from any descent: f grows along -g
        return float(np.sum(x)), -np.ones_like(x)

    opt = PrysmLBFGSB(bad_fg, np.zeros(3), max_ls=4)
    with pytest.raises(StopIteration) as e:
        opt.step()
    assert not e.value.value.success


def test_run_to_stops_at_convergence():
    fg, x_star, _ = _make_quadratic(4, seed=2)
    opt = PrysmLBFGSB(fg, np.zeros(4))
    x, f, g = opt.run_to(200)
    np.testing.assert_allclose(np.asarray(x), x_star, atol=1e-7)
    assert np.abs(np.asarray(g)).max() < 1e-5


def test_metadata_present_after_step():
    opt = PrysmLBFGSB(_sphere_fg, np.ones(2))
    opt.step()
    assert 'alpha' in opt.last_step_metadata
    assert 'f_next' in opt.last_step_metadata


# ---------------------------------------------------------------------------
# history admission and rolling
# ---------------------------------------------------------------------------

def test_admit_pair_requires_curvature():
    opt = PrysmLBFGSB(_sphere_fg, np.ones(3), memory=4)
    s = jnp.asarray([1.0, 0.0, 0.0])
    opt._admit_pair(s, -s)  # s.y < 0: rejected by the BLNZ test
    assert not bool(np.asarray(opt._valid).any())
    opt._admit_pair(s, s)   # s.y = |s|^2 > 0: admitted
    assert bool(np.asarray(opt._valid)[-1])


def test_admit_pair_updates_theta():
    opt = PrysmLBFGSB(_sphere_fg, np.ones(2), memory=4)
    s = jnp.asarray([1.0, 0.0])
    y = jnp.asarray([3.0, 0.0])
    opt._admit_pair(s, y)
    assert opt._theta == pytest.approx(9.0 / 3.0)  # y.y / s.y


def test_history_rolls_at_capacity():
    opt = PrysmLBFGSB(_sphere_fg, np.ones(2), memory=3)
    for k in range(1, 6):
        v = jnp.asarray([float(k), 0.0])
        opt._admit_pair(v, v)
    S = np.asarray(opt._S)
    # newest three pairs in oldest -> newest order
    np.testing.assert_allclose(S[:, 0], [3.0, 4.0, 5.0])
    assert bool(np.asarray(opt._valid).all())


def test_history_fills_during_optimization():
    fg, _, _ = _make_quadratic(6, seed=3)
    opt = PrysmLBFGSB(fg, np.zeros(6), memory=5)
    _fill_history(opt, fg, 4)
    assert int(np.asarray(opt._valid).sum()) >= 3


# ---------------------------------------------------------------------------
# compact representation vs dense BFGS
# ---------------------------------------------------------------------------

def test_compact_form_shapes():
    opt = PrysmLBFGSB(_sphere_fg, np.ones(7), memory=4)
    W, M = _compact_parts(opt)
    assert W.shape == (7, 8)
    assert M.shape == (8, 8)


def test_compact_form_empty_history_is_theta_identity():
    opt = PrysmLBFGSB(_sphere_fg, np.ones(5), memory=3)
    B = _B_from_compact(opt)
    np.testing.assert_allclose(B, np.eye(5), atol=1e-12)


def test_compact_form_matches_dense_bfgs():
    """theta I - W M W^T equals B built by iterated dense BFGS updates."""
    fg, _, _ = _make_quadratic(6, seed=4)
    opt = PrysmLBFGSB(fg, np.zeros(6), memory=5)
    _fill_history(opt, fg, 5)
    B_compact = _B_from_compact(opt)
    B_dense = _dense_bfgs_matrix(opt._S, opt._Y, opt._valid, opt._theta, 6)
    np.testing.assert_allclose(B_compact, B_dense, rtol=1e-8, atol=1e-8)


def test_compact_form_invalid_slots_contribute_nothing():
    opt = PrysmLBFGSB(_sphere_fg, np.ones(4), memory=6)
    s = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    y = jnp.asarray([2.0, 0.0, 0.0, 0.0])
    opt._admit_pair(s, y)
    B_full = _B_from_compact(opt)
    # same single pair in a memory-1 optimizer: identical dense B
    small = PrysmLBFGSB(_sphere_fg, np.ones(4), memory=1)
    small._admit_pair(s, y)
    np.testing.assert_allclose(B_full, _B_from_compact(small),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('dtype', [np.float32, np.float64])
def test_compact_form_preserves_dtype(dtype):
    fg, _, _ = _make_quadratic(4, dtype=dtype, seed=5)
    opt = PrysmLBFGSB(fg, np.zeros(4, dtype=dtype), memory=3)
    _fill_history(opt, fg, 3)
    W, M = _compact_form(opt._S, opt._Y, opt._valid,
                         jnp.asarray(opt._theta, opt.x.dtype))
    assert W.dtype == dtype
    assert M.dtype == dtype


def test_compact_form_spd_on_quadratic_history():
    fg, _, _ = _make_quadratic(5, seed=6)
    opt = PrysmLBFGSB(fg, np.zeros(5), memory=5)
    _fill_history(opt, fg, 5)
    evals = np.linalg.eigvalsh(_B_from_compact(opt))
    assert evals.min() > 0


# ---------------------------------------------------------------------------
# generalized Cauchy point vs the dense segment-walk oracle
# ---------------------------------------------------------------------------

def _cauchy_inputs(opt, g):
    W, M = _compact_form(opt._S, opt._Y, opt._valid,
                         jnp.asarray(opt._theta, opt.x.dtype))
    xc, c = _cauchy_point(opt.x, jnp.asarray(g, opt.x.dtype), opt.l, opt.u,
                          W, M, jnp.asarray(opt._theta, opt.x.dtype))
    return np.asarray(xc), np.asarray(c), np.asarray(W)


def test_cauchy_no_history_unconstrained():
    """B = I: the Cauchy point is the unit steepest-descent step x - g."""
    x0 = np.array([1.0, -2.0, 3.0])
    opt = PrysmLBFGSB(_sphere_fg, x0)
    g = np.array([1.0, -2.0, 3.0])
    xc, c, W = _cauchy_inputs(opt, g)
    np.testing.assert_allclose(xc, x0 - g, atol=1e-12)


def test_cauchy_no_history_with_bounds_matches_oracle():
    x0 = np.array([0.5, -0.5, 0.2])
    lo = np.array([-1.0, -0.6, -1.0])
    hi = np.array([0.6, 1.0, 0.25])
    opt = PrysmLBFGSB(_sphere_fg, x0, lower_bounds=lo, upper_bounds=hi)
    g = np.array([2.0, -3.0, 1.0])
    xc, _, _ = _cauchy_inputs(opt, g)
    want = _dense_cauchy(x0, g, lo, hi, np.eye(3))
    np.testing.assert_allclose(xc, want, atol=1e-10)


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4])
def test_cauchy_matches_oracle_with_history(seed):
    rng = np.random.default_rng(seed)
    dim = 6
    fg, _, _ = _make_quadratic(dim, seed=seed)
    lo = rng.uniform(-2.0, -0.5, dim)
    hi = rng.uniform(0.5, 2.0, dim)
    opt = PrysmLBFGSB(fg, rng.uniform(-0.4, 0.4, dim),
                      lower_bounds=lo, upper_bounds=hi, memory=5)
    _fill_history(opt, fg, 4)
    _, g = fg(np.asarray(opt.x))
    xc, _, _ = _cauchy_inputs(opt, g)
    B = _B_from_compact(opt)
    want = _dense_cauchy(np.asarray(opt.x), g, lo, hi, B)
    np.testing.assert_allclose(xc, want, rtol=1e-7, atol=1e-8)


def test_cauchy_c_equals_WT_displacement():
    fg, _, _ = _make_quadratic(5, seed=7)
    lo, hi = np.full(5, -0.3), np.full(5, 0.3)
    opt = PrysmLBFGSB(fg, np.zeros(5), lower_bounds=lo, upper_bounds=hi,
                      memory=4)
    _fill_history(opt, fg, 3)
    _, g = fg(np.asarray(opt.x))
    xc, c, W = _cauchy_inputs(opt, g)
    np.testing.assert_allclose(c, W.T @ (xc - np.asarray(opt.x)),
                               rtol=1e-8, atol=1e-10)


def test_cauchy_already_active_variable_stays_put():
    """A variable pinned at its bound with the gradient pulling outward
    never moves."""
    x0 = np.array([1.0, 0.0])
    lo = np.array([-1.0, -1.0])
    hi = np.array([1.0, 1.0])
    opt = PrysmLBFGSB(_sphere_fg, x0, lower_bounds=lo, upper_bounds=hi)
    g = np.array([-5.0, 1.0])  # pulls x[0] past its upper bound
    xc, _, _ = _cauchy_inputs(opt, g)
    assert xc[0] == pytest.approx(1.0)
    assert xc[1] == pytest.approx(-1.0)  # hits the lower face


def test_cauchy_no_finite_breakpoints():
    """Unbounded: the only stop is the 1-D model minimizer."""
    x0 = np.array([2.0, -1.0])
    opt = PrysmLBFGSB(_sphere_fg, x0)
    g = np.array([0.5, 0.5])
    xc, _, _ = _cauchy_inputs(opt, g)
    np.testing.assert_allclose(xc, x0 - g, atol=1e-12)


def test_cauchy_all_clamped_at_start():
    """Every variable at a bound with outward gradient: xc == x."""
    x0 = np.array([1.0, -1.0])
    opt = PrysmLBFGSB(_sphere_fg, x0, lower_bounds=[-1.0, -1.0],
                      upper_bounds=[1.0, 1.0])
    g = np.array([-1.0, 1.0])
    xc, _, _ = _cauchy_inputs(opt, g)
    np.testing.assert_allclose(xc, x0, atol=1e-14)


@pytest.mark.parametrize('dtype', [np.float32, np.float64])
def test_cauchy_dtype_propagation(dtype):
    x0 = np.array([0.5, -0.5], dtype=dtype)
    opt = PrysmLBFGSB(_sphere_fg, x0, lower_bounds=np.full(2, -1, dtype),
                      upper_bounds=np.full(2, 1, dtype))
    W, M = _compact_form(opt._S, opt._Y, opt._valid,
                         jnp.asarray(opt._theta, opt.x.dtype))
    xc, c = _cauchy_point(opt.x, jnp.asarray(x0), opt.l, opt.u, W, M,
                          jnp.asarray(opt._theta, opt.x.dtype))
    assert xc.dtype == dtype
    assert c.dtype == dtype


# ---------------------------------------------------------------------------
# subspace minimization
# ---------------------------------------------------------------------------

def test_subspace_unconstrained_matches_dense_newton():
    """With no active bounds, xbar solves B (xbar - x) = -g exactly."""
    fg, _, _ = _make_quadratic(6, seed=8)
    opt = PrysmLBFGSB(fg, np.zeros(6), memory=5)
    _fill_history(opt, fg, 5)
    _, g = fg(np.asarray(opt.x))
    W, M = _compact_form(opt._S, opt._Y, opt._valid,
                         jnp.asarray(opt._theta, opt.x.dtype))
    th = jnp.asarray(opt._theta, opt.x.dtype)
    gj = jnp.asarray(g, opt.x.dtype)
    xc, c = _cauchy_point(opt.x, gj, opt.l, opt.u, W, M, th)
    xbar = np.asarray(_subspace_step(opt.x, gj, xc, c, opt.l, opt.u,
                                     W, M, th))
    B = _B_from_compact(opt)
    want = np.asarray(opt.x) - np.linalg.solve(B, g)
    np.testing.assert_allclose(xbar, want, rtol=1e-7, atol=1e-9)


def test_subspace_active_coordinates_unchanged():
    """Variables fixed at a bound by the Cauchy walk stay on the bound."""
    fg, _, _ = _make_quadratic(5, seed=9)
    lo, hi = np.full(5, -0.05), np.full(5, 0.05)
    opt = PrysmLBFGSB(fg, np.zeros(5), lower_bounds=lo, upper_bounds=hi,
                      memory=4)
    _fill_history(opt, fg, 3)
    _, g = fg(np.asarray(opt.x))
    W, M = _compact_form(opt._S, opt._Y, opt._valid,
                         jnp.asarray(opt._theta, opt.x.dtype))
    th = jnp.asarray(opt._theta, opt.x.dtype)
    gj = jnp.asarray(g, opt.x.dtype)
    xc, c = _cauchy_point(opt.x, gj, opt.l, opt.u, W, M, th)
    xbar = np.asarray(_subspace_step(opt.x, gj, xc, c, opt.l, opt.u,
                                     W, M, th))
    xc = np.asarray(xc)
    fixed = (xc <= lo) | (xc >= hi)
    if fixed.any():
        np.testing.assert_allclose(xbar[fixed], xc[fixed], atol=1e-12)


def test_subspace_result_always_inside_box():
    rng = np.random.default_rng(11)
    fg, _, _ = _make_quadratic(6, seed=11)
    lo = rng.uniform(-0.5, -0.1, 6)
    hi = rng.uniform(0.1, 0.5, 6)
    opt = PrysmLBFGSB(fg, np.zeros(6), lower_bounds=lo, upper_bounds=hi,
                      memory=4)
    for _ in range(6):
        opt.step()
        x = np.asarray(opt.x)
        assert np.all(x >= lo - 1e-12)
        assert np.all(x <= hi + 1e-12)


# ---------------------------------------------------------------------------
# convergence
# ---------------------------------------------------------------------------

def test_quadratic_converges_to_known_minimum():
    fg, x_star, _ = _make_quadratic(6, seed=1)
    opt = PrysmLBFGSB(fg, np.zeros(6))
    x, f, g = opt.run_to(100)
    np.testing.assert_allclose(np.asarray(x), x_star, atol=1e-6)


def test_rosenbrock_5d_converges():
    opt = PrysmLBFGSB(_rosenbrock_fg, np.zeros(5), memory=10)
    x, f, g = opt.run_to(400)
    np.testing.assert_allclose(np.asarray(x), np.ones(5), atol=1e-5)


def test_bounded_quadratic_converges_to_face():
    """When the unconstrained minimum is outside the box, the solution
    pins the pulling coordinates on the face."""
    A = np.diag([1.0, 4.0])
    x_star = np.array([2.0, 3.0])

    def fg(x):
        d = np.asarray(x) - x_star
        return float(0.5 * d @ A @ d), A @ d

    opt = PrysmLBFGSB(fg, np.zeros(2), lower_bounds=[-1.0, -1.0],
                      upper_bounds=[1.0, 1.0])
    x, f, g = opt.run_to(50)
    np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-8)


def test_bounded_rosenbrock_5d():
    lo = np.full(5, -0.5)
    hi = np.full(5, 0.8)  # excludes the unconstrained minimum at 1
    opt = PrysmLBFGSB(_rosenbrock_fg, np.zeros(5),
                      lower_bounds=lo, upper_bounds=hi, memory=10)
    x, f, g = opt.run_to(300)
    x = np.asarray(x)
    assert np.all(x >= lo - 1e-10) and np.all(x <= hi + 1e-10)
    # the leading coordinates ride the active face
    assert x[0] == pytest.approx(0.8, abs=1e-6)
    # projected gradient is (near) zero at a constrained stationary point
    pg = np.clip(x - np.asarray(_rosenbrock_fg(x)[1]), lo, hi) - x
    assert np.abs(pg).max() < 1e-4


def test_bounded_large_dim_quadratic():
    dim = 40
    fg, x_star, _ = _make_quadratic(dim, seed=12)
    lo = np.full(dim, -0.25)
    hi = np.full(dim, 0.25)
    opt = PrysmLBFGSB(fg, np.zeros(dim), lower_bounds=lo, upper_bounds=hi,
                      memory=8)
    x, f, g = opt.run_to(300)
    x = np.asarray(x)
    pg = np.clip(x - np.asarray(g), lo, hi) - x
    assert np.abs(pg).max() < 1e-5


def test_illconditioned_quadratic_converges():
    fg, x_star, _ = _make_quadratic(8, seed=13, cond=1e6)
    opt = PrysmLBFGSB(fg, np.zeros(8), memory=10)
    x, f, g = opt.run_to(500)
    assert f < 1e-10 * max(1.0, abs(fg(np.zeros(8))[0]))


def test_unbounded_matches_bounded_with_loose_box():
    """An enormous box must not change the trajectory."""
    fg, _, _ = _make_quadratic(5, seed=14)
    a = PrysmLBFGSB(fg, np.zeros(5))
    b = PrysmLBFGSB(fg, np.zeros(5), lower_bounds=np.full(5, -1e12),
                    upper_bounds=np.full(5, 1e12))
    for _ in range(10):
        try:
            a.step()
            b.step()
        except StopIteration:
            break
        np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x),
                                   rtol=1e-10, atol=1e-12)


# ---------------------------------------------------------------------------
# fp32 robustness family
# ---------------------------------------------------------------------------

def test_fp32_illconditioned_quadratic_converges():
    fg, x_star, _ = _make_quadratic(6, dtype=np.float32, seed=15, cond=1e4)
    opt = PrysmLBFGSB(fg, np.zeros(6, np.float32), memory=8)
    x, f, g = opt.run_to(300)
    assert opt.x.dtype == np.float32
    assert np.isfinite(f)
    assert f < 1e-4


def test_fp32_large_n_quadratic():
    fg, _, _ = _make_quadratic(100, dtype=np.float32, seed=16)
    opt = PrysmLBFGSB(fg, np.zeros(100, np.float32), memory=10)
    x, f, g = opt.run_to(200)
    assert np.isfinite(np.asarray(x)).all()
    assert f < 1e-3


def test_fp32_history_saturation_no_blowup():
    fg, _, _ = _make_quadratic(10, dtype=np.float32, seed=17)
    opt = PrysmLBFGSB(fg, np.zeros(10, np.float32), memory=3)
    x, f, g = opt.run_to(150)  # many more steps than memory slots
    assert np.isfinite(np.asarray(x)).all()
    assert np.isfinite(f)


def test_fp32_memory_above_n_does_not_nan():
    fg, _, _ = _make_quadratic(4, dtype=np.float32, seed=18)
    opt = PrysmLBFGSB(fg, np.zeros(4, np.float32), memory=12)
    x, f, g = opt.run_to(100)
    assert np.isfinite(np.asarray(x)).all()


def test_fp32_bounded_quadratic_stays_in_box():
    fg, _, _ = _make_quadratic(6, dtype=np.float32, seed=19)
    lo = np.full(6, -0.2, np.float32)
    hi = np.full(6, 0.2, np.float32)
    opt = PrysmLBFGSB(fg, np.zeros(6, np.float32),
                      lower_bounds=lo, upper_bounds=hi)
    opt.run_to(100)
    x = np.asarray(opt.x)
    assert np.all(x >= lo - 1e-6) and np.all(x <= hi + 1e-6)


def test_fp32_dtype_invariants_after_long_run():
    fg, _, _ = _make_quadratic(5, dtype=np.float32, seed=20)
    opt = PrysmLBFGSB(fg, np.zeros(5, np.float32), memory=4)
    opt.run_to(120)
    assert opt.x.dtype == np.float32
    assert opt._S.dtype == np.float32
    assert opt._Y.dtype == np.float32


def test_fp32_rosenbrock_converges_loosely():
    opt = PrysmLBFGSB(
        lambda x: _rosenbrock_fg(np.asarray(x, np.float64)),
        np.zeros(2, np.float32), memory=10)
    x, f, g = opt.run_to(400)
    np.testing.assert_allclose(np.asarray(x), np.ones(2), atol=5e-3)


def test_fp32_extreme_conditioning_does_not_nan():
    fg, _, _ = _make_quadratic(6, dtype=np.float32, seed=21, cond=1e7)
    opt = PrysmLBFGSB(fg, np.zeros(6, np.float32), memory=8)
    x, f, g = opt.run_to(200)
    assert np.isfinite(np.asarray(x)).all()
    assert np.isfinite(f)


# ---------------------------------------------------------------------------
# projection behavior on bound-pinned problems
# ---------------------------------------------------------------------------

def test_direction_lands_on_pulled_face_first_step():
    """For a separable quadratic pulling hard past the box, the very first
    direction target already sits on the pulled face."""
    A = np.eye(3)
    x_star = np.array([10.0, 10.0, 0.1])

    def fg(x):
        d = np.asarray(x) - x_star
        return float(0.5 * d @ d), d

    lo = np.full(3, -1.0)
    hi = np.full(3, 1.0)
    opt = PrysmLBFGSB(fg, np.zeros(3), lower_bounds=lo, upper_bounds=hi)
    _, g = fg(np.zeros(3))
    xbar = np.asarray(_lbfgsb_direction(
        opt.x, jnp.asarray(g), opt._S, opt._Y, opt._valid,
        jnp.asarray(1.0, opt.x.dtype), opt.l, opt.u))
    np.testing.assert_allclose(xbar[:2], [1.0, 1.0], atol=1e-10)
    assert abs(xbar[2] - 0.1) < 1e-10


def test_projection_outperforms_plain_gradient_on_pinned_quadratic():
    """The subspace step reaches the constrained optimum in far fewer
    iterations than projected gradient descent."""
    dim = 12
    fg, x_star, A = _make_quadratic(dim, seed=22)
    lo = np.full(dim, -0.2)
    hi = np.full(dim, 0.2)
    opt = PrysmLBFGSB(fg, np.zeros(dim), lower_bounds=lo, upper_bounds=hi,
                      memory=8)
    opt.run_to(60)
    x = np.asarray(opt.x)
    pg = np.clip(x - np.asarray(fg(x)[1]), lo, hi) - x
    assert np.abs(pg).max() < 1e-6

    # projected gradient descent with a safe fixed step, same budget
    L = np.linalg.eigvalsh(A).max()
    xg = np.zeros(dim)
    for _ in range(60):
        xg = np.clip(xg - (1.0 / L) * fg(xg)[1], lo, hi)
    pg_gd = np.clip(xg - fg(xg)[1], lo, hi) - xg
    assert np.abs(pg).max() < 1e-2 * max(np.abs(pg_gd).max(), 1e-12)


def test_iterates_always_feasible_over_long_run():
    rng = np.random.default_rng(23)
    fg, _, _ = _make_quadratic(8, seed=23)
    lo = rng.uniform(-0.5, -0.1, 8)
    hi = rng.uniform(0.1, 0.5, 8)
    opt = PrysmLBFGSB(fg, rng.uniform(-0.1, 0.1, 8),
                      lower_bounds=lo, upper_bounds=hi, memory=6)
    for _ in range(40):
        try:
            opt.step()
        except StopIteration:
            break
        x = np.asarray(opt.x)
        assert np.all(x >= lo - 1e-12) and np.all(x <= hi + 1e-12)


def test_run_until_returns_governor_decision():
    from prysm_tpu.x.optym import MaxIterations, run_until

    def bowl(x):
        return float(0.5 * np.sum(x * x)), np.asarray(x)

    opt = PrysmLBFGSB(bowl, np.asarray([1.0, -2.0, 0.5, 3.0]), memory=5)
    outcome = run_until(opt, MaxIterations(10))
    assert outcome.decision.stop
    assert len(outcome.records) <= 10


def test_pulling_corner_terminates_with_zero_projected_gradient():
    """At a corner with the gradient pushing into every active face the
    projected gradient vanishes, so step() terminates immediately (the
    reference reports no-descent there; the repo reports convergence —
    either way the optimizer must not loop or leave the box)."""
    def ramp(x):
        return float(np.sum(x)), np.ones(2)

    corner = np.zeros(2)
    opt = PrysmLBFGSB(ramp, corner, lower_bounds=np.zeros(2),
                      upper_bounds=np.ones(2), memory=3)
    with pytest.raises(StopIteration):
        opt.step()
    np.testing.assert_array_equal(np.asarray(opt.x), corner)


# ---------------------------------------------------------------------------
# scipy-driver wrapper regressions (reference
# tests/x/optym/test_optym_optimizers_regression.py)
# ---------------------------------------------------------------------------

def test_scipy_driver_decodes_abnormal_status():
    """Status 8 (ABNORMAL) from the C driver is a known failed
    termination, not an unknown code."""
    from prysm_tpu.x.optym.lbfgsb import LBFGSB

    opt = LBFGSB(_sphere_fg, np.array([1.0, 2.0]))
    payload = opt._terminal(8)
    assert payload.success is False
    assert 'abnormal' in payload.message.lower()
    assert opt.last_step_metadata['task'] == 'ABNORMAL'
    # unknown codes still fall through to the generic error payload
    other = opt._terminal(42)
    assert other.success is False and '42' in other.message


def test_scipy_driver_state_stays_private():
    """Mutating arrays handed out by step()/x/g must not corrupt the
    reverse-communication driver's workspace."""
    from prysm_tpu.x.optym.lbfgsb import LBFGSB

    opt = LBFGSB(_sphere_fg, np.array([1.0, 2.0]))
    x_ret, _, g_ret = opt.step()
    x_view = opt.x
    before = opt._x.copy()

    x_ret[...] = 100
    g_ret[...] = 100
    x_view[...] = 100

    np.testing.assert_array_equal(opt._x, before)
    np.testing.assert_array_equal(opt.x, opt._x)
    assert not np.array_equal(opt.x, x_view)
