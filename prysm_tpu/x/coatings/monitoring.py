"""Optical-monitoring simulation for coating deposition.

Rebuild of ``prysm/x/coatings/monitoring.py``: signal traces while a
layer grows, turning-point / level-cut termination, as-built run
simulation, and monitor-wavelength selection.
"""
from functools import reduce

import numpy as onp
import jax.numpy as jnp

from ...conf import config
from ...thinfilm import _cos_snell

from .stack import (
    Stack, _resolve, _admittance, _char_matrix, _eye2,
    stack_characteristic_matrices,
)


def _signal_curve(below_indices, below_thicknesses, grow_index, d_grid,
                  monitor_wvl, theta, pol, mode, n0, nsub):
    """Monitor signal of a growing layer over deposited thickness."""
    pol = pol.lower()
    if below_indices:
        sub = Stack(below_indices, below_thicknesses, nsub, n0)
        mats = stack_characteristic_matrices(sub, monitor_wvl, theta, pol)
        P_below = reduce(jnp.matmul, mats, _eye2())
    else:
        P_below = _eye2()

    n_k = _resolve(grow_index, monitor_wvl)
    cost_k = _cos_snell(n0, n_k, theta)
    eta_k = _admittance(n_k, cost_k, pol)
    dbeta = (2 * jnp.pi * n_k * cost_k) / monitor_wvl
    beta = dbeta * jnp.asarray(d_grid)
    Mk = _char_matrix(beta, jnp.broadcast_to(eta_k + 0j, beta.shape))
    A = Mk @ P_below[None]

    cost0 = jnp.cos(jnp.asarray(theta, dtype=config.precision))
    cost_sub = _cos_snell(n0, nsub, theta)
    eta0 = _admittance(n0, cost0, pol)
    eta_sub = _admittance(nsub, cost_sub, pol)
    B = A[..., 0, 0] + A[..., 0, 1] * eta_sub
    C = A[..., 1, 0] + A[..., 1, 1] * eta_sub
    den = eta0 * B + C
    if mode == 'R':
        r = (eta0 * B - C) / den
        return jnp.abs(r) ** 2
    t = 2 * eta0 / den
    return jnp.real(eta_sub) / jnp.real(eta0) * jnp.abs(t) ** 2


def monitoring_trace(stack, layer, monitor_wvl, *, theta=0.0, pol='s',
                     mode='R', n_points=400, max_factor=1.0):
    """(thickness grid, monitor signal) while growing one layer."""
    th = onp.asarray(stack.thicknesses, dtype=config.precision)
    n0 = _resolve(stack.ambient_index, monitor_wvl)
    nsub = _resolve(stack.substrate_index, monitor_wvl)
    d_target = float(th[layer])
    d_grid = onp.linspace(0.0, max_factor * d_target, n_points)
    sig = _signal_curve(list(stack.indices[layer + 1:]), th[layer + 1:],
                        stack.indices[layer], d_grid, monitor_wvl, theta,
                        pol, mode, n0, nsub)
    return d_grid, sig


def turning_points(d, signal):
    """Deposited thicknesses at the extrema of a monitor trace."""
    d = onp.asarray(d)
    s = onp.asarray(signal)
    slope = onp.sign(onp.diff(s))
    idx = onp.where(slope[:-1] != slope[1:])[0] + 1
    return d[idx]


def level_cut(d, signal, level, target=None):
    """Deposited thickness where the signal crosses a level.

    With several crossings, return the one nearest target (else the
    first); with none, the closest-approach thickness.
    """
    d = onp.asarray(d)
    s = onp.asarray(signal) - level
    sign = onp.sign(s)
    idx = onp.where(sign[:-1] != sign[1:])[0]
    if idx.size == 0:
        return float(d[onp.argmin(onp.abs(s))])
    crossings = []
    for i in idx:
        s0, s1 = s[i], s[i + 1]
        frac = 0.0 if s1 == s0 else -s0 / (s1 - s0)
        crossings.append(d[i] + frac * (d[i + 1] - d[i]))
    crossings = onp.asarray(crossings)
    if target is None:
        return float(crossings[0])
    return float(crossings[onp.argmin(onp.abs(crossings - target))])


def cutoff_levels(stack, monitor_wvl, *, theta=0.0, pol='s', mode='R',
                  n_points=400):
    """Nominal monitor level at the end of each layer's deposition."""
    th = onp.asarray(stack.thicknesses, dtype=config.precision)
    n0 = _resolve(stack.ambient_index, monitor_wvl)
    nsub = _resolve(stack.substrate_index, monitor_wvl)
    levels = []
    for k in range(len(stack)):
        sig = _signal_curve(list(stack.indices[k + 1:]), th[k + 1:],
                            stack.indices[k], onp.array([th[k]]),
                            monitor_wvl, theta, pol, mode, n0, nsub)
        levels.append(float(sig[0]))
    return onp.asarray(levels, dtype=config.precision)


def simulate_run(stack, monitor_wvl, *, strategy='level', turning_index=1,
                 signal_errors=None, thickness_errors=None, theta=0.0,
                 pol='s', mode='R', n_points=600, max_factor=1.8,
                 levels=None):
    """Simulate a monitored deposition run; return the as-built Stack.

    Layers deposit substrate-side first (index N-1 down to 0), each
    terminated by the level or turning-point strategy with optional
    per-layer monitor errors.
    """
    N = len(stack)
    th_nom = onp.asarray(stack.thicknesses, dtype=config.precision)
    n0 = _resolve(stack.ambient_index, monitor_wvl)
    nsub = _resolve(stack.substrate_index, monitor_wvl)
    asbuilt = th_nom.copy()

    if strategy == 'level' and levels is None:
        levels = cutoff_levels(stack, monitor_wvl, theta=theta, pol=pol,
                               mode=mode, n_points=n_points)

    for k in range(N - 1, -1, -1):
        d_grid = onp.linspace(1e-12, max_factor * th_nom[k], n_points)
        sig = _signal_curve(list(stack.indices[k + 1:]), asbuilt[k + 1:],
                            stack.indices[k], d_grid, monitor_wvl, theta,
                            pol, mode, n0, nsub)
        sig = onp.asarray(sig)
        if strategy == 'turning':
            tps = turning_points(d_grid, sig)
            if tps.size >= turning_index:
                d_real = float(tps[turning_index - 1])
            else:
                d_real = float(th_nom[k])
            if thickness_errors is not None:
                d_real = d_real + float(thickness_errors[k])
        elif strategy == 'level':
            L = float(levels[k])
            if signal_errors is not None:
                L = L + float(signal_errors[k])
            d_real = level_cut(d_grid, sig, L, target=float(th_nom[k]))
        else:
            raise ValueError("strategy must be 'level' or 'turning'")
        asbuilt[k] = max(d_real, 0.0)

    return Stack(stack.indices, asbuilt, stack.substrate_index,
                 stack.ambient_index)


def monitoring_error_sensitivity(stack, monitor_wvl, design_wvls, *,
                                 strategy='level', theta=0.0, pol='s',
                                 design_pol='s', mode='R', eps=1e-4,
                                 **kwargs):
    """Jacobian of realized reflectance w.r.t. per-layer termination error."""
    from .stack import RTA
    N = len(stack)
    design_wvls = onp.atleast_1d(
        onp.asarray(design_wvls, dtype=config.precision))
    base = simulate_run(stack, monitor_wvl, strategy=strategy, theta=theta,
                        pol=pol, mode=mode, **kwargs)
    R0, _, _ = RTA(base, design_wvls, theta, design_pol)
    R0 = onp.atleast_1d(onp.asarray(R0))

    J = onp.zeros((design_wvls.size, N), dtype=config.precision)
    for k in range(N):
        err = onp.zeros(N, dtype=config.precision)
        err[k] = eps
        if strategy == 'turning':
            run = simulate_run(stack, monitor_wvl, strategy=strategy,
                               thickness_errors=err, theta=theta, pol=pol,
                               mode=mode, **kwargs)
        else:
            run = simulate_run(stack, monitor_wvl, strategy=strategy,
                               signal_errors=err, theta=theta, pol=pol,
                               mode=mode, **kwargs)
        Rk, _, _ = RTA(run, design_wvls, theta, design_pol)
        J[:, k] = (onp.atleast_1d(onp.asarray(Rk)) - R0) / eps
    return J


def choose_monitor_wavelength(stack, candidates, design_wvls, *,
                              strategy='level', **kwargs):
    """(best wavelength, per-candidate score) by lowest error sensitivity."""
    scores = []
    for wm in candidates:
        J = monitoring_error_sensitivity(stack, wm, design_wvls,
                                         strategy=strategy, **kwargs)
        scores.append(float(onp.sqrt(onp.sum(J * J))))
    scores = onp.asarray(scores, dtype=config.precision)
    best = float(onp.asarray(candidates)[int(onp.argmin(scores))])
    return best, scores


__all__ = [
    'monitoring_trace',
    'turning_points',
    'level_cut',
    'cutoff_levels',
    'simulate_run',
    'monitoring_error_sensitivity',
    'choose_monitor_wavelength',
]
