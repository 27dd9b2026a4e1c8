"""Reverse-mode trace sensitivities via jax.

Rebuild of ``prysm/x/raytracing/adjoint/backward_sweep.py``'s public
surface (``adjoint_gradient``) without the ~1500 lines of hand-written
per-primitive adjoint rules: seeds are materialized as a perturbation
vector ``eps`` applied *functionally* to the compiled surface list, and
``jax.vjp`` / ``jax.grad`` differentiate the whole trace program — the
Newton intersections already carry implicit-function gradients, so one
backward pass yields d(merit)/d(every seed) exactly.

Heads are either

* a callable ``head(P_hist, S_hist, OPL_hist) -> scalar`` in jnp math
  (gradients come from jax.grad; no hand-derived cotangent seeds), or
* an object with ``seed(trace, system, wavelength) -> (P_bar, S_bar,
  L_bar)`` history-shaped cotangents (the reference's duck-typed head
  protocol), optionally plus ``direct_gradient(trace, system,
  wavelength, seeds)``.
"""
import numpy as onp

import jax
import jax.numpy as jnp

from ....conf import config
from ..spencer_and_murty import raytrace
from ..surfaces import Surface, CallableShape
from .._resolve import compiled_surfaces


class _IndexOffset:
    """Material wrapper adding a (traced) offset to the real index."""

    __slots__ = ('base', 'delta')

    def __init__(self, base, delta):
        self.base = base
        self.delta = delta

    def n(self, wvl, temperature=None):
        return self.base.n(wvl) + self.delta

    def k(self, wvl, temperature=None):
        return self.base.k(wvl) if hasattr(self.base, 'k') else 0.0

    @property
    def name(self):
        return getattr(self.base, 'name', 'material')


def _resolve_surfaces(system_or_surfaces):
    return compiled_surfaces(system_or_surfaces)


def apply_seeds(surfaces, seeds, eps):
    """The surface list perturbed by eps[k] along each seed's action.

    Pure function of (surfaces, eps): vertices translate by eps*Qdot,
    rotations linearize as R + eps*Rdot, scalar shape DOFs shift by
    eps*scale, sag terms add eps*fn(x, y), media gain eps on the index.
    Exact at eps=0, which is where the vjp linearizes.
    """
    out = []
    for j, s in enumerate(surfaces):
        Pj = jnp.asarray(s.P, dtype=config.precision)
        Rj = s.R
        shape = s.shape
        shape_contribs = []
        sag_terms = []
        index_delta = None
        for k, seed in enumerate(seeds):
            pq = seed.pose.get(j)
            if pq is not None:
                Qdot, Rdot = pq
                if Qdot is not None and onp.any(onp.asarray(Qdot)):
                    Pj = Pj + eps[k] * jnp.asarray(Qdot,
                                                   dtype=config.precision)
                if Rdot is not None:
                    base_R = (jnp.eye(3, dtype=config.precision) if Rj is None
                              else jnp.asarray(Rj, dtype=config.precision))
                    Rj = base_R + eps[k] * jnp.asarray(
                        Rdot, dtype=config.precision)
            for sidx, pname, scale in seed.shapes:
                if sidx == j:
                    shape_contribs.append((pname, scale, k))
            if seed.sag_term is not None and seed.sag_term[0] == j:
                sag_terms.append((seed.sag_term[1], k))
            if seed.index is not None and seed.index[0] == j:
                contrib = eps[k] * seed.index[1]
                index_delta = (contrib if index_delta is None
                               else index_delta + contrib)

        if shape_contribs:
            p = dict(shape.params)
            for pname, scale, k in shape_contribs:
                if pname not in p:
                    kind = getattr(shape, 'kind', type(shape).__name__)
                    raise KeyError(
                        f'surface {j} is a {kind} shape with '
                        f'shape DOFs {sorted(p)}; seed targets {pname!r} '
                        '(note: indices are compiled indices, OBJECT = 0)')
                p[pname] = p[pname] + eps[k] * scale
            shape = shape.with_params(p)
        if sag_terms:
            base = shape

            def _sag(x, y, _b=base, _t=tuple(sag_terms)):
                z = _b.sag(x, y)
                for fn, k in _t:
                    z = z + eps[k] * fn(x, y)
                return z

            shape = CallableShape(_sag, params=dict(base.params))
        mat = s.material
        if index_delta is not None and mat is not None:
            mat = _IndexOffset(mat, index_delta)
        out.append(Surface(shape=shape, interaction=s.typ, P=Pj, R=Rj,
                           material=mat, aperture=s.aperture,
                           grating=s.grating, coating=s.coating))
    return out


def _trace_fn(surfaces, seeds, P, S, wvl, tol_sag, Pdot0=None, Sdot0=None):
    """f(eps) over the nominal-valid subset of the bundle.

    Rays dead at the nominal point (clipped, TIR, missed) are dropped on
    the host BEFORE differentiation: the vjp linearizes at eps = 0, where
    the kept lanes are all finite, so no NaN from dead-lane masking can
    reach reverse mode (0 cotangent times a NaN partial poisons the
    whole bundle otherwise).  Heads therefore see an all-valid bundle,
    which matches the operands' valid-ray statistics.

    Pdot0 / Sdot0 ((N, 3, K)) carry launch-recipe tangents: when the
    launch bundle itself depends on the seed parameters (an internal
    stop moves the entrance pupil; an F/#/NA aperture spec rescales the
    pupil with focal length), the start of each ray becomes
    P + Pdot0 @ eps so the vjp/jvp picks up the launch term the
    reference derives through its paraxial launch derivatives
    (design.py:867).
    """
    P = onp.asarray(P, dtype=float)
    S = onp.asarray(S, dtype=float)
    r0 = raytrace(surfaces, jnp.asarray(P), jnp.asarray(S), wvl,
                  tol_sag=tol_sag)
    from ..spencer_and_murty import valid_mask
    valid = onp.asarray(valid_mask(r0.status, r0.P[-1]))
    if not valid.all():
        P = P[valid]
        S = S[valid]
        if Pdot0 is not None:
            Pdot0 = onp.asarray(Pdot0, dtype=float)[valid]
        if Sdot0 is not None:
            Sdot0 = onp.asarray(Sdot0, dtype=float)[valid]
    P = jnp.asarray(P)
    S = jnp.asarray(S)
    Pdot0 = None if Pdot0 is None else jnp.asarray(Pdot0)
    Sdot0 = None if Sdot0 is None else jnp.asarray(Sdot0)

    def f(eps):
        Pe, Se = P, S
        if Pdot0 is not None:
            Pe = Pe + Pdot0 @ eps
        if Sdot0 is not None:
            Se = Se + Sdot0 @ eps
            Se = Se / jnp.linalg.norm(Se, axis=-1, keepdims=True)
        r = raytrace(apply_seeds(surfaces, seeds, eps), Pe, Se, wvl,
                     tol_sag=tol_sag)
        return r.P, r.S, r.OPL

    return f


def adjoint_gradient(system, P, S, wvl, seeds, head, *, tol_sag=None,
                     Pdot0=None, Sdot0=None):
    """Gradient of a scalar merit w.r.t. every seed parameter.

    One forward trace and one reverse-mode pass (reference
    ``adjoint/backward_sweep.py:330``); see the module docstring for the
    two head protocols.  Returns (grad, nominal) when the head yields a
    value (callable heads always do; seed-protocol heads return
    nominal=None unless they expose ``value``).
    """
    surfaces = _resolve_surfaces(system)
    seeds = list(seeds)
    eps0 = jnp.zeros(len(seeds), dtype=config.precision)
    f = _trace_fn(surfaces, seeds, P, S, wvl, tol_sag, Pdot0=Pdot0,
                  Sdot0=Sdot0)

    seed_meth = getattr(head, 'seed', None)
    if seed_meth is None:
        if not callable(head):
            raise TypeError('head must be callable or provide seed()')
        value, grad = jax.value_and_grad(
            lambda e: head(*f(e)))(eps0)
        return onp.asarray(grad), float(value)

    trace = raytrace(surfaces, jnp.asarray(onp.asarray(P, dtype=float)),
                     jnp.asarray(onp.asarray(S, dtype=float)), wvl,
                     tol_sag=tol_sag)
    cot = seed_meth(trace, system, wvl)
    _, vjp = jax.vjp(f, eps0)
    (grad,) = vjp(tuple(jnp.asarray(c, dtype=config.precision)
                        for c in cot))
    grad = onp.asarray(grad)
    direct = getattr(head, 'direct_gradient', None)
    if direct is not None:
        extra = direct(trace, system, wvl, seeds)
        if extra is not None:
            grad = grad + onp.asarray(extra)
    value_meth = getattr(head, 'value', None)
    nominal = (value_meth(trace, system, wvl)
               if callable(value_meth) else None)
    return grad, nominal


def adjoint_gradient_multi(system, P, S, wvl, seeds, heads, *,
                           tol_sag=None, Pdot0=None, Sdot0=None):
    """(grads, values) for several callable heads over one bundle.

    One forward trace and one linearization shared by all heads; each
    head costs only a vjp pullback, not a re-trace.  grads is
    (M, n_seeds); values is the list of nominal head values.
    """
    surfaces = _resolve_surfaces(system)
    seeds = list(seeds)
    heads = list(heads)
    eps0 = jnp.zeros(len(seeds), dtype=config.precision)
    f = _trace_fn(surfaces, seeds, P, S, wvl, tol_sag, Pdot0=Pdot0,
                  Sdot0=Sdot0)

    def g(eps):
        Ph, Sh, L = f(eps)
        return jnp.stack([jnp.asarray(h(Ph, Sh, L)) for h in heads])

    vals, pullback = jax.vjp(g, eps0)
    eye = onp.eye(len(heads))
    grads = onp.stack([onp.asarray(pullback(jnp.asarray(eye[m]))[0])
                       for m in range(len(heads))])
    return grads, [float(v) for v in onp.asarray(vals)]


def _masked_mean(v, m, axis=None):
    m = m.astype(v.dtype)
    return (v * m).sum(axis) / jnp.maximum(m.sum(axis), 1.0)


def _final_xy_and_mask(P_hist):
    xy = P_hist[-1][:, :2]
    valid = jax.lax.stop_gradient(jnp.isfinite(P_hist[-1]).all(axis=-1))
    xy = jnp.where(valid[:, None], xy, 0.0)
    return xy, valid


class RmsSpotHead:
    """RMS transverse spot radius about the centroid (or the chief ray)."""

    def __init__(self, reference='centroid', chief_index=0,
                 name='rms_spot'):
        self.reference = reference
        self.chief_index = int(chief_index)
        self.name = name

    def __call__(self, P_hist, S_hist, OPL_hist):
        xy, valid = _final_xy_and_mask(P_hist)
        if self.reference == 'chief':
            ref = xy[self.chief_index]
        else:
            ref = _masked_mean(xy, valid[:, None] &
                               jnp.ones_like(xy, dtype=bool), axis=0)
        d2 = ((xy - ref) ** 2).sum(axis=1)
        return jnp.sqrt(_masked_mean(d2, valid))


class BoresightHead:
    """Distance of the image-plane centroid from a target point."""

    def __init__(self, target=(0.0, 0.0), name='boresight'):
        self.target = jnp.asarray(target, dtype=config.precision)
        self.name = name

    def __call__(self, P_hist, S_hist, OPL_hist):
        xy, valid = _final_xy_and_mask(P_hist)
        cen = _masked_mean(xy, valid[:, None] &
                           jnp.ones_like(xy, dtype=bool), axis=0)
        return jnp.sqrt(((cen - self.target) ** 2).sum() + 1e-30)


class OplSpreadHead:
    """RMS spread of total optical path about the bundle mean.

    A closing-free proxy for wavefront error (rays sharing a pupil grid
    to a common image point); exact OPD closings live in analysis.py.
    """

    def __init__(self, name='opl_spread'):
        self.name = name

    def __call__(self, P_hist, S_hist, OPL_hist):
        L = OPL_hist.sum(axis=0)
        valid = jax.lax.stop_gradient(jnp.isfinite(L))
        L = jnp.where(valid, L, 0.0)
        mean = _masked_mean(L, valid)
        return jnp.sqrt(_masked_mean((L - mean) ** 2, valid))


class RayHeightHead:
    """RMS ray height at one surface of the history (footprint control).

    RMS rather than mean-|y|: |y| is non-differentiable for a ray
    sitting exactly on the axis (the chief), where AD's abs convention
    and the one-sided truth disagree; the quadratic form is smooth.
    """

    def __init__(self, surface, axis=1, name=None):
        self.surface = int(surface)
        self.axis = int(axis)
        self.name = name or f'height_s{surface}'

    def __call__(self, P_hist, S_hist, OPL_hist):
        v = P_hist[self.surface][:, self.axis]
        valid = jax.lax.stop_gradient(jnp.isfinite(v))
        v = jnp.where(valid, v, 0.0)
        return jnp.sqrt(_masked_mean(v * v, valid))


__all__ = [
    'adjoint_gradient', 'adjoint_gradient_multi', 'apply_seeds',
    'RmsSpotHead', 'BoresightHead', 'OplSpreadHead', 'RayHeightHead',
]
