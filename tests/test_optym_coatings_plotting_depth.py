"""Optym sample problems / plotting and coatings plotting: reference port.

Behavior matrix of /root/reference/tests/x/optym/
test_optym_sample_problems.py (8 tests), test_optym_plotting.py (3),
and x/coatings/test_plotting.py (6): analytic gradients vs FD,
Problem-class hooks (f/g/fg/h/hvp), known minima, gradient shape
preservation, dimension validation, convergence-series values and
bound counting, and the coatings plotters end to end.
"""
import numpy as np
import pytest

import matplotlib
matplotlib.use('Agg')
from matplotlib import pyplot as plt

import jax  # NOQA: F401

from prysm_tpu.x.optym import (
    GradientDescent, MaxIterations, StepRecord, himmelblau, plot_convergence,
    rastrigin, rosenbrock, run_until, sphere)
from prysm_tpu.x.optym.sample_problems import (
    HimmelblauProblem, RastriginProblem, RosenbrockProblem, SphereProblem)
from prysm_tpu.x.coatings import Stack
from prysm_tpu.x.coatings import plotting as cp

WVL = 0.55
SUB = 1.52


def _np(x):
    return np.asarray(x)


# ---------- sample problems ---------------------------------------------------

def finite_difference_gradient(fg, x, step=1e-6):
    g = np.empty_like(x)
    xf = x.ravel()
    gf = g.ravel()
    for j in range(x.size):
        xp = x.copy()
        xm = x.copy()
        xp.ravel()[j] = xf[j] + step
        xm.ravel()[j] = xf[j] - step
        fp, _ = fg(xp)
        fm, _ = fg(xm)
        gf[j] = (fp - fm) / (2 * step)
    return g


def finite_difference_hvp(problem, x, v, step=1e-6):
    return (_np(problem.g(x + step * v))
            - _np(problem.g(x - step * v))) / (2 * step)


@pytest.mark.parametrize('func, x', [
    (sphere, np.array([1.5, -2.0, 0.25])),
    (rosenbrock, np.array([-1.2, 1.0, 0.5])),
    (rastrigin, np.array([0.25, -0.5, 1.25])),
    (himmelblau, np.array([-2.5, 3.0])),
])
def test_sample_problem_gradients_match_finite_difference(func, x):
    _, g = func(x)
    g_fd = finite_difference_gradient(func, x)
    np.testing.assert_allclose(_np(g), g_fd, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('problem, func, x, v', [
    (SphereProblem(), sphere, np.array([1.5, -2.0, 0.25]),
     np.array([0.5, -1.0, 2.0])),
    (RosenbrockProblem(), rosenbrock, np.array([-1.2, 1.0, 0.5]),
     np.array([0.25, -1.5, 0.75])),
    (RastriginProblem(), rastrigin, np.array([0.25, -0.5, 1.25]),
     np.array([1.0, -0.25, 0.5])),
    (HimmelblauProblem(), himmelblau, np.array([-2.5, 3.0]),
     np.array([0.5, -1.5])),
])
def test_sample_problem_classes_provide_analytic_hooks(problem, func, x, v):
    assert problem.has_f
    assert problem.has_g
    assert problem.has_fg
    assert problem.has_h
    assert problem.has_hvp

    f, g = func(x)
    pf, pg = problem.fg(x)
    np.testing.assert_allclose(_np(problem.f(x)), f)
    np.testing.assert_allclose(_np(problem.g(x)), _np(g))
    np.testing.assert_allclose(_np(pf), f)
    np.testing.assert_allclose(_np(pg), _np(g))

    h = _np(problem.h(x))
    hv = _np(problem.hvp(x, v))
    np.testing.assert_allclose(h, h.T)
    np.testing.assert_allclose(h @ v.ravel(), hv.ravel())
    np.testing.assert_allclose(hv, finite_difference_hvp(problem, x, v),
                               rtol=1e-5, atol=1e-5)


def test_sphere_minimum():
    f, g = sphere(np.zeros(4))
    np.testing.assert_allclose(f, 0)
    np.testing.assert_allclose(_np(g), 0)


def test_rosenbrock_minimum():
    f, g = rosenbrock(np.ones(5))
    np.testing.assert_allclose(f, 0)
    np.testing.assert_allclose(_np(g), 0)


def test_rastrigin_minimum():
    f, g = rastrigin(np.zeros((2, 3)))
    np.testing.assert_allclose(f, 0)
    np.testing.assert_allclose(_np(g), 0)


def test_himmelblau_minimum():
    f, g = himmelblau(np.array([3.0, 2.0]))
    np.testing.assert_allclose(f, 0, atol=1e-12)
    np.testing.assert_allclose(_np(g), 0, atol=1e-10)


def test_sample_problems_preserve_gradient_shape():
    for func, x in [
            (sphere, np.zeros((2, 3))),
            (rosenbrock, np.ones((2, 3))),
            (rastrigin, np.zeros((2, 3))),
            (himmelblau, np.zeros((1, 2)))]:
        _, g = func(x)
        assert _np(g).shape == x.shape


def test_sample_problems_reject_invalid_dimensions():
    with pytest.raises(ValueError, match='at least two'):
        rosenbrock(np.array([1.0]))
    with pytest.raises(ValueError, match='exactly two'):
        himmelblau(np.array([1.0, 2.0, 3.0]))


# ---------- optym plotting ----------------------------------------------------

def quadratic_fg(x):
    f = float(0.5 * np.sum(x * x))
    return f, x.copy()


def test_plot_convergence_plots_f_and_gradient_norm():
    opt = GradientDescent(quadratic_fg, np.array([1.0, -2.0]), alpha=0.1)
    result = run_until(opt, MaxIterations(3))
    fig, ax = plot_convergence(result, quantities=('f', 'g_norm'))
    axes = np.asarray(ax).ravel()
    np.testing.assert_allclose(axes[0].lines[0].get_ydata(),
                               [2.5, 2.025, 1.64025])
    np.testing.assert_allclose(axes[1].lines[0].get_ydata(),
                               [2.0, 1.8, 1.62])
    assert axes[0].get_ylabel() == 'f'
    assert axes[1].get_ylabel() == '||g|| inf'
    assert axes[1].get_xlabel() == 'iteration'
    plt.close(fig)


def test_plot_convergence_counts_active_box_bounds():
    class _BoundedOptimizer:
        l = np.array([0.0, -np.inf, 0.0])  # NOQA: E741
        u = np.array([np.inf, 1.0, 2.0])

    record = StepRecord(
        optimizer=_BoundedOptimizer(), iteration=1,
        x=np.array([1.0, 0.5, 1.0]), f=1.0, g=np.zeros(3),
        x_next=np.array([0.0, 1.0, 2.0]))
    fig, ax = plot_convergence([record], quantities='bounded')
    np.testing.assert_array_equal(ax.lines[0].get_ydata(), [3.0])
    assert ax.get_ylabel() == 'bounded variables'
    plt.close(fig)


def test_plot_convergence_counts_active_inequalities_from_metadata():
    record = {
        'iteration': 2,
        'cost': 1.0,
        'active_inequalities': np.array([0, 3]),
    }
    fig, ax = plot_convergence([record], quantities='bounded')
    np.testing.assert_array_equal(ax.lines[0].get_xdata(), [2.0])
    np.testing.assert_array_equal(ax.lines[0].get_ydata(), [2.0])
    plt.close(fig)


# ---------- coatings plotting -------------------------------------------------

@pytest.fixture
def stack():
    return Stack([1.38, 2.05, 1.38, 2.05], [0.10, 0.067, 0.10, 0.067], SUB)


def test_plot_spectrum(stack):
    wvls = np.linspace(0.45, 0.65, 50)
    fig, ax = cp.plot_spectrum(stack, wvls, quantities=('R', 'T', 'A'))
    assert ax.lines
    plt.close(fig)


def test_plot_spectrum_single_pol(stack):
    wvls = np.linspace(0.45, 0.65, 30)
    fig, ax = cp.plot_spectrum(stack, wvls, pol='s', quantities=('R',))
    assert ax.lines
    plt.close(fig)


def test_plot_index_profile(stack):
    fig, ax = cp.plot_index_profile(stack)
    assert ax.lines
    plt.close(fig)


def test_plot_field_intensity(stack):
    fig, ax = cp.plot_field_intensity(stack, WVL, pol='s')
    assert ax.lines
    plt.close(fig)


def test_plot_admittance(stack):
    fig, ax = cp.plot_admittance(stack, WVL, pol='s')
    assert ax.lines
    plt.close(fig)


def test_plot_monitoring_trace(stack):
    fig, ax = cp.plot_monitoring_trace(stack, 1, WVL, max_factor=2.0)
    assert ax.lines
    plt.close(fig)
