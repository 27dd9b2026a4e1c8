"""optym: optimizers converge on canonical problems, match reference behavior."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu.x import optym

import prysm.x.optym as ref_optym


def test_sample_problems_match_reference():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(6)
    for name in ('sphere', 'rosenbrock', 'rastrigin'):
        fo, go = getattr(optym, name)(jnp.asarray(x))
        fr, gr = getattr(ref_optym, name)(x)
        np.testing.assert_allclose(float(fo), float(fr), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(go), np.asarray(gr), rtol=1e-8, atol=1e-10)
    x2 = rng.standard_normal(2)
    fo, go = optym.himmelblau(jnp.asarray(x2))
    fr, gr = ref_optym.himmelblau(x2)
    np.testing.assert_allclose(float(fo), float(fr), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(go), np.asarray(gr), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize('opt_cls,kwargs', [
    ('GradientDescent', dict(alpha=0.1)),
    ('AdaGrad', dict(alpha=0.5)),
    ('RMSProp', dict(alpha=0.05)),
    ('Adam', dict(alpha=0.1)),
    ('RAdam', dict(alpha=0.1)),
    ('AdaMomentum', dict(alpha=0.1)),
    ('Yogi', dict(alpha=0.1)),
])
def test_first_order_optimizers_descend_sphere(opt_cls, kwargs):
    x0 = jnp.asarray([3.0, -2.0, 1.5])
    opt = getattr(optym, opt_cls)(optym.sphere, x0, **kwargs)
    f_first = None
    for _ in range(200):
        x, f, g = opt.step()
        if f_first is None:
            f_first = float(f)
    assert float(f) < f_first * 0.1, f'{opt_cls} failed to descend'


def test_optimizer_matches_reference_trajectory():
    """Adam on Rosenbrock: identical trajectory to the reference."""
    x0 = np.asarray([-1.2, 1.0])
    ours = optym.Adam(optym.rosenbrock, jnp.asarray(x0), alpha=0.05)
    theirs = ref_optym.Adam(ref_optym.rosenbrock, x0.copy(), alpha=0.05)
    for _ in range(50):
        xo, fo, go = ours.step()
        xr, fr, gr = theirs.step()
        np.testing.assert_allclose(np.asarray(xo), np.asarray(xr), rtol=1e-8,
                                   atol=1e-10)
        np.testing.assert_allclose(float(fo), float(fr), rtol=1e-8)


def test_run_until_with_governors():
    x0 = jnp.asarray([3.0, -2.0])
    opt = optym.Adam(optym.sphere, x0, alpha=0.2)
    gov = optym.AnyGovernor([optym.MaxIterations(500),
                             optym.GradientTolerance(1e-5)])
    result = optym.run_until(opt, gov)
    assert result.success
    assert 'gradient tolerance' in result.message
    assert float(optym.sphere(result.x)[0]) < 1e-8


def test_bounds_projection():
    x0 = jnp.asarray([3.0, -2.0])
    opt = optym.Adam(optym.sphere, x0, alpha=0.2,
                     lower_bounds=jnp.asarray([1.0, -jnp.inf]))
    for _ in range(300):
        opt.step()
    x = np.asarray(opt.x)
    assert x[0] == pytest.approx(1.0, abs=1e-9)   # pinned at the bound
    assert abs(x[1]) < 1e-3                        # free coordinate converges


def test_lbfgsb_scipy_driver_converges():
    opt = optym.LBFGSB(optym.rosenbrock, jnp.asarray([-1.2, 1.0]))
    result = optym.run_until(opt, optym.MaxIterations(200))
    f_final = float(optym.rosenbrock(result.x)[0])
    assert f_final < 1e-8


def test_lbfgsb_bounds():
    opt = optym.LBFGSB(optym.sphere, np.asarray([3.0, -2.0]),
                       lower_bounds=np.asarray([1.0, -np.inf]))
    result = optym.run_until(opt, optym.MaxIterations(100))
    x = np.asarray(result.x)
    assert x[0] == pytest.approx(1.0, abs=1e-8)
    assert abs(x[1]) < 1e-6


def test_prysm_lbfgsb_converges():
    opt = optym.PrysmLBFGSB(optym.rosenbrock, jnp.asarray([-1.2, 1.0]))
    result = optym.run_until(opt, optym.MaxIterations(300))
    f_final = float(optym.rosenbrock(result.x)[0])
    assert f_final < 1e-6


def test_damped_least_squares_unconstrained():
    class Prob:
        def residuals(self, x):
            return np.asarray([x[0] - 1.0, 10 * (x[1] - x[0] ** 2)])

    result = optym.damped_least_squares(Prob(), x0=np.asarray([-1.0, 2.0]),
                                        maxiter=100)
    np.testing.assert_allclose(result.x, [1.0, 1.0], atol=1e-5)


def test_damped_least_squares_equality_constraint():
    class Prob:
        def residuals(self, x):
            return np.asarray([x[0] - 3.0, x[1] + 1.0])

    result = optym.damped_least_squares(
        Prob(), x0=np.asarray([0.0, 0.0]),
        equality_constraints=lambda x: x[0] - x[1],  # x0 == x1
        maxiter=100)
    np.testing.assert_allclose(result.x[0], result.x[1], atol=1e-6)
    np.testing.assert_allclose(result.x[0], 1.0, atol=1e-4)


def test_damped_least_squares_matches_reference():
    class Prob:
        def residuals(self, x):
            return np.asarray([x[0] - 1.0, 10 * (x[1] - x[0] ** 2), x[0] * x[1]])

    kwargs = dict(x0=np.asarray([0.5, 0.5]), damping=1e-4, maxiter=30)
    ours = optym.damped_least_squares(Prob(), **kwargs)
    theirs = ref_optym.damped_least_squares(Prob(), **kwargs)
    np.testing.assert_allclose(ours.x, np.asarray(theirs.x), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(ours.cost, float(theirs.cost), rtol=1e-6)


def test_activations_match_reference():
    import prysm.x.optym.activation as ref_act
    from prysm_tpu.x.optym import activation as act
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 5))
    g = rng.standard_normal((4, 5))
    so = act.Softmax()
    sr = ref_act.Softmax()
    np.testing.assert_allclose(np.asarray(so.forward(jnp.asarray(x))),
                               np.asarray(sr.forward(x)), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(so.backprop(jnp.asarray(g))),
                               np.asarray(sr.backprop(g)), rtol=1e-8, atol=1e-12)
    for name in ('Tanh', 'Arctan', 'Softplus', 'Sigmoid'):
        o = getattr(act, name)(a=1.3, x0=0.2, y0=-0.1)
        r = getattr(ref_act, name)(a=1.3, x0=0.2, y0=-0.1)
        np.testing.assert_allclose(np.asarray(o.forward(jnp.asarray(x))),
                                   np.asarray(r.forward(x)), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(o.backprop(jnp.asarray(x))),
                                   np.asarray(r.backprop(x)), rtol=1e-8)


def test_costs_match_reference():
    import prysm.x.optym.cost as ref_cost
    from prysm_tpu.x.optym import cost
    rng = np.random.default_rng(2)
    M = rng.random((8, 8))
    D = rng.random((8, 8))
    mask = rng.random((8, 8)) > 0.3
    for name in ('bias_and_gain_invariant_error', 'mean_square_error'):
        co, go = getattr(cost, name)(jnp.asarray(M), jnp.asarray(D))
        cr, gr = getattr(ref_cost, name)(M, D)
        np.testing.assert_allclose(float(co), float(cr), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(go), np.asarray(gr), rtol=1e-8)
        co, go = getattr(cost, name)(jnp.asarray(M), jnp.asarray(D), mask=mask)
        cr, gr = getattr(ref_cost, name)(M.copy(), D.copy(), mask=mask)
        np.testing.assert_allclose(float(co), float(cr), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(go), np.asarray(gr), rtol=1e-8)


def test_spatial_gradient_adjoint_identity():
    from prysm_tpu.x.optym import SpatialGradient2D
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 8)))
    y = jnp.asarray(rng.standard_normal((8, 8)))
    op = SpatialGradient2D()
    lhs = float(jnp.vdot(op.forward_x(x), y))
    rhs = float(jnp.vdot(x, op.adjoint_x(y)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
    lhs = float(jnp.vdot(op.forward_y(x), y))
    rhs = float(jnp.vdot(x, op.adjoint_y(y)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_strong_wolfe_matches_reference_contract():
    import prysm.x.optym.linesearch as ref_ls
    prob_m = optym.RosenbrockProblem()
    x = np.array([-1.2, 1.0])
    f, g = prob_m.fg(x)
    f = float(f)
    g = np.asarray(g)
    pk = -g
    am, fam, dam, gam = optym.ls_strong_wolfe(prob_m, x, pk, fg_at_xk=(f, g))
    ar, far, dar, gar = ref_ls.ls_strong_wolfe(
        lambda z: tuple(map(np.asarray, prob_m.fg(z))), x, pk,
        fg_at_xk=(f, g))
    d0 = np.dot(g, pk)
    for a, fa, da in ((am, fam, dam), (ar, far, dar)):
        assert fa <= f + 1e-4 * a * d0          # sufficient decrease
        assert abs(da) <= 0.9 * abs(d0)         # curvature
    # both return the gradient at the accepted point
    np.testing.assert_allclose(gam, np.asarray(prob_m.fg(x + am * pk)[1]),
                                atol=1e-12)
    # ascent directions are rejected by both
    assert optym.ls_strong_wolfe(prob_m, x, g, fg_at_xk=(f, g))[0] is None
    # a cap with remaining descent is taken exactly
    ac, fac, _, _ = optym.ls_strong_wolfe(prob_m, x, pk, fg_at_xk=(f, g),
                                        maxalpha=1e-6)
    assert ac == 1e-6 and fac < f


def test_plot_convergence_series():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    prob = optym.RosenbrockProblem()
    x0 = np.array([-1.2, 1.0])
    o = optym.Adam(prob.fg, x0, alpha=0.05)
    res = optym.run_until(o, optym.MaxIterations(40))
    fig, ax = optym.plot_convergence(res, yscale='log')
    axes = np.atleast_1d(np.asarray(ax, dtype=object)).ravel()
    assert len(axes) == 2
    f_series = axes[0].lines[0].get_ydata()
    np.testing.assert_allclose(f_series,
                                [r.f for r in res.records], atol=0)
    # alias names route to the same series
    fig, ax2 = optym.plot_convergence(res.records, quantities=('cost',))
    np.testing.assert_allclose(ax2.lines[0].get_ydata(), f_series, atol=0)
    with pytest.raises(ValueError):
        optym.plot_convergence(res, quantities=('nope',))
    with pytest.raises(ValueError):
        optym.plot_convergence([])
    # bounded count reflects active box faces
    ob = optym.GradientDescent(prob.fg, x0, alpha=0.02,
                             lower_bounds=[-1.0, -1.0],
                             upper_bounds=[0.5, 2.0])
    resb = optym.run_until(ob, optym.MaxIterations(25))
    fig, axb = optym.plot_convergence(resb, quantities=('f', 'bounded'))
    axbs = np.atleast_1d(np.asarray(axb, dtype=object)).ravel()
    assert axbs[1].lines[0].get_ydata().max() >= 1
    plt.close('all')


# ---------------------------------------------------------------------------
# full-BLNZ PrysmLBFGSB: head-to-head vs the SciPy compiled driver on
# bound-active problems (VERDICT r2 item 8: iteration parity within 2x)
# ---------------------------------------------------------------------------

def _iters_to_tol(opt_cls, fg, x0, tol, fstar=0.0, maxiter=400, **kwargs):
    opt = opt_cls(fg, jnp.asarray(x0, dtype=float), **kwargs)
    for k in range(maxiter):
        try:
            opt.step()
        except StopIteration:
            break
        f, _ = fg(opt.x)
        if float(f) - fstar < tol:
            return k + 1, float(f)
    f, _ = fg(opt.x)
    return maxiter, float(f)


def test_prysm_lbfgsb_bound_active_parity_sphere():
    # minimum at the corner (1, 0.5): both bounds active at the solution
    lb = np.asarray([1.0, 0.5])
    kw = dict(lower_bounds=lb)
    it_ref, f_ref = _iters_to_tol(optym.LBFGSB, optym.sphere, [3.0, 2.0],
                                  1e-10, fstar=1.25, **kw)
    it_mine, f_mine = _iters_to_tol(optym.PrysmLBFGSB, optym.sphere,
                                    [3.0, 2.0], 1e-10, fstar=1.25, **kw)
    assert f_mine - 1.25 < 1e-10
    assert it_mine <= max(2 * it_ref, it_ref + 3)


def test_prysm_lbfgsb_bound_active_parity_rosenbrock():
    # upper bound x1 <= 0.8 cuts the valley: active constraint at optimum
    ub = np.asarray([0.8, np.inf])
    x0 = [-1.2, 1.0]
    opt_ref = optym.LBFGSB(optym.rosenbrock, jnp.asarray(x0),
                           upper_bounds=ub)
    res_ref = optym.run_until(opt_ref, optym.MaxIterations(300))
    opt_m = optym.PrysmLBFGSB(optym.rosenbrock, jnp.asarray(x0),
                              upper_bounds=ub)
    res_m = optym.run_until(opt_m, optym.MaxIterations(300))
    f_ref = float(optym.rosenbrock(res_ref.x)[0])
    f_m = float(optym.rosenbrock(res_m.x)[0])
    # same constrained optimum (x0 pinned at 0.8)
    assert abs(float(np.asarray(res_m.x)[0]) - 0.8) < 1e-8
    assert f_m <= f_ref * (1 + 1e-6) + 1e-10


def test_prysm_lbfgsb_box_10d_quadratic():
    # random PD quadratic with half the optimum outside the box
    rng = np.random.default_rng(5)
    A = rng.standard_normal((10, 10))
    Q = A @ A.T + 10 * np.eye(10)
    b = rng.standard_normal(10) * 10
    Qj = jnp.asarray(Q)
    bj = jnp.asarray(b)

    def fg(x):
        x = jnp.asarray(x, dtype=float)
        g = Qj @ x - bj
        return 0.5 * x @ Qj @ x - bj @ x, g

    lb = np.full(10, -0.25)
    ub = np.full(10, 0.25)
    ref = optym.LBFGSB(fg, jnp.zeros(10), lower_bounds=lb, upper_bounds=ub)
    r_ref = optym.run_until(ref, optym.MaxIterations(200))
    mine = optym.PrysmLBFGSB(fg, jnp.zeros(10),
                             lower_bounds=lb, upper_bounds=ub)
    r_m = optym.run_until(mine, optym.MaxIterations(200))
    f_ref = float(fg(r_ref.x)[0])
    f_m = float(fg(r_m.x)[0])
    assert f_m <= f_ref + 1e-8 * (1 + abs(f_ref))
    # iteration parity within 2x on a strongly bound-active problem
    assert mine.iter <= 2 * max(ref.iter, 5)


def test_prysm_lbfgsb_unbounded_still_fast():
    it_ref, _ = _iters_to_tol(optym.LBFGSB, optym.rosenbrock,
                              [-1.2, 1.0], 1e-10)
    it_m, f_m = _iters_to_tol(optym.PrysmLBFGSB, optym.rosenbrock,
                              [-1.2, 1.0], 1e-10)
    assert f_m < 1e-10
    assert it_m <= max(2 * it_ref, it_ref + 5)


def test_prysm_lbfgsb_cauchy_point_leaves_box_interior_alone():
    from prysm_tpu.x.optym.lbfgsb import (_compact_form, _cauchy_point,
                                          _subspace_step)
    n, m = 6, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n))
    g = jnp.asarray(rng.standard_normal(n))
    S = jnp.zeros((m, n))
    Y = jnp.zeros((m, n))
    valid = jnp.zeros(m, dtype=bool)
    lower = jnp.full(n, -1e6)
    upper = jnp.full(n, 1e6)
    W, M = _compact_form(S, Y, valid, jnp.asarray(1.0))
    xc, c = _cauchy_point(x, g, lower, upper, W, M, jnp.asarray(1.0))
    # no history, huge box: Cauchy point = steepest descent full step
    np.testing.assert_allclose(np.asarray(xc), np.asarray(x - g), rtol=1e-12)
    xbar = _subspace_step(x, g, xc, c, lower, upper, W, M, jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(xbar), np.asarray(x - g),
                               rtol=1e-10)
