"""Differential raytracing: launch tangents via jax.jvp.

Replaces the reference's hand-written forward-tangent engine
(``prysm/x/raytracing/_diff_raytrace.py``, ~1300 lines of per-primitive
tangent rules) with ``jax.jvp`` through the trace kernel — the Newton
intersections carry implicit-function gradients, so each seed is one
forward-mode sweep of the same jittable program.
"""
import numpy as onp
import jax
import jax.numpy as jnp

from .spencer_and_murty import raytrace


class DiffSeed:
    """Named launch-tangent seed (dx / dy / du / dv)."""

    __slots__ = ('name',)

    def __init__(self, name=None):
        self.name = name


class DiffTraceResult:
    """A trace plus per-seed position/direction tangent histories.

    Pdot / Sdot have shape (n_hist, N, 3, n_seeds), indexed like the
    trace histories with a trailing seed axis.
    """

    __slots__ = ('trace', 'Pdot', 'Sdot', 'seeds')

    def __init__(self, trace, Pdot, Sdot, seeds):
        self.trace = trace
        self.Pdot = Pdot
        self.Sdot = Sdot
        self.seeds = seeds


def raytrace_with_tangents(surfaces, P, S, wvl, seeds, Pdot0=None,
                           Sdot0=None):
    """Trace a bundle and propagate launch tangents by forward-mode AD.

    Pdot0 / Sdot0: (N, 3, n_seeds) tangent columns on the launch
    position / direction.  Returns a DiffTraceResult whose trace keeps
    per-surface intermediates (for frame transport).
    """
    P = jnp.asarray(onp.asarray(P, dtype=float))
    S = jnp.asarray(onp.asarray(S, dtype=float))
    n_seeds = len(seeds)
    if Pdot0 is None:
        Pdot0 = onp.zeros(P.shape + (n_seeds,))
    if Sdot0 is None:
        Sdot0 = onp.zeros(S.shape + (n_seeds,))
    Pdot0 = onp.asarray(Pdot0, dtype=float)
    Sdot0 = onp.asarray(Sdot0, dtype=float)
    if Pdot0.shape != P.shape + (n_seeds,):
        Pdot0 = onp.broadcast_to(Pdot0, P.shape + (n_seeds,))
    if Sdot0.shape != S.shape + (n_seeds,):
        Sdot0 = onp.broadcast_to(Sdot0, S.shape + (n_seeds,))

    def f(Pv, Sv):
        r = raytrace(surfaces, Pv, Sv, wvl)
        return r.P, r.S

    Pdots = []
    Sdots = []
    for k in range(n_seeds):
        tP = jnp.asarray(Pdot0[..., k])
        tS = jnp.asarray(Sdot0[..., k])
        _, (dP, dS) = jax.jvp(f, (P, S), (tP, tS))
        Pdots.append(onp.asarray(dP))
        Sdots.append(onp.asarray(dS))
    Pdot = onp.stack(Pdots, axis=-1)
    Sdot = onp.stack(Sdots, axis=-1)
    trace = raytrace(surfaces, P, S, wvl, keep_intermediates=True)
    return DiffTraceResult(trace, Pdot, Sdot, list(seeds))


__all__ = ['DiffSeed', 'DiffTraceResult', 'raytrace_with_tangents']
