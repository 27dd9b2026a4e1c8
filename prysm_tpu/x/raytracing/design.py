"""Design operands and optimization problems for raytracing systems.

Rebuild of ``prysm/x/raytracing/design.py``: Merit operands (spot size,
wavefront RMS, Zernike terms, first-order and packaging constraints),
the Problem wrapper over the system's DesignState free vector, and the
goal factory.  With gradient='auto', ray operands differentiate through
the trace — reverse mode (one jax.vjp per operand head) for spot and
boresight merits, forward mode (wavefront_with_tangents) for the
wavefront-closing merits — and remaining scalar operands fall back to
central differences of the free vector.
"""
import inspect
import math
import warnings

import numpy as np

from ..optym.least_squares import (  # NOQA: F401 - re-export for users
    DampedLeastSquares,
    DampedLeastSquaresResult,
    damped_least_squares,
)

from .launch import Field, Sampling, launch as _launch
from .spencer_and_murty import raytrace, valid_mask, _is_measurement_surf
from .surfaces import _map_stype
from .sensitivity import merit_jacobian_free as _merit_jacobian_free
from .opt import rms_spot_radius, _pupil_center_chief_index
from .paraxial import (
    effective_focal_length,
    back_focal_length,
    paraxial_image_distance,
)
from . import analysis as _analysis
from ._resolve import compiled_surfaces, trace_context
from ._cache import StateCache, structural_key

_PREC = np.float64


# ---------- Trace cache ------------------------------------------------------

class _TraceCache:
    """Per-merit-call raytrace cache keyed by array identity."""

    __slots__ = ('_system', '_cache', '_n_traces', '_xp_cache',
                 '_launch_cache', '_ctx_cache')

    def __init__(self, system):
        self._system = system
        self._cache = StateCache()
        self._xp_cache = StateCache()
        self._launch_cache = StateCache()
        self._ctx_cache = StateCache()
        self._n_traces = 0

    def context(self, wavelength=None):
        """Resolved TraceContext for one wavelength, memoized."""
        key = None if wavelength is None else float(wavelength)
        return self._ctx_cache.get_or_compute(
            key, lambda: trace_context(self._system, wavelength))

    def launch(self, field, wavelength, sampling, *, epd=None):
        """Launch bundle (P, S) for a recipe, memoized per merit call."""
        key = (None if field is None else id(field),
               None if sampling is None else id(sampling),
               float(wavelength), epd)

        def _compute():
            f = Field() if field is None else field
            s = Sampling.hex(nrings=4) if sampling is None else sampling
            return _launch(self._system, f, wavelength, s, epd=epd)

        return self._launch_cache.get_or_compute(key, _compute)

    def trace(self, P, S, wavelength):
        """Cached raytrace of one bundle."""
        key = (id(P), id(S), float(wavelength))

        def _compute():
            self._n_traces += 1
            return raytrace(compiled_surfaces(self._system), P, S,
                            wavelength)

        return self._cache.get_or_compute(key, _compute)

    def exit_pupil(self, P, S, wavelength, *, P_xp=None, chief_index=None,
                   stop_index=None, epd=None, axis_point=None,
                   axis_dir=None):
        """Exit-pupil reference point for an operand bundle, resolved once."""
        if P_xp is not None:
            return np.asarray(P_xp)
        key = (id(P), id(S), float(wavelength), chief_index, stop_index,
               epd, structural_key(axis_point), structural_key(axis_dir))

        def _compute():
            resolved_stop = (stop_index if stop_index is not None
                             else getattr(self._system, 'stop_index', None))
            chief = None
            if resolved_stop is None:
                tr = self.trace(P, S, wavelength)
                ci = (chief_index if chief_index is not None
                      else _pupil_center_chief_index(np.asarray(P)))
                chief = (np.asarray(tr.P)[-1, ci], np.asarray(tr.S)[-1, ci])
            return _analysis.resolve_exit_pupil(
                self._system, wavelength, stop_index=stop_index, epd=epd,
                chief=chief, axis_point=axis_point, axis_dir=axis_dir)

        return self._xp_cache.get_or_compute(key, _compute)

    @property
    def n_traces(self):
        """Number of underlying raytrace calls (cache misses)."""
        return self._n_traces


# ---------- Operands ---------------------------------------------------------

def _class_accepts_kw(cls, name):
    params = inspect.signature(cls).parameters
    if name in params:
        return True
    return any(p.kind == inspect.Parameter.VAR_KEYWORD
               for p in params.values())


class Merit:
    """Target/weight plumbing shared by merit terms."""

    name = 'merit'

    def __init__(self, target=None, weight=1.0, *, min=None, max=None):
        self.target = 0.0 if target is None else float(target)
        self.weight = float(weight)
        self.min = None if min is None else float(min)
        self.max = None if max is None else float(max)
        self._target_set = target is not None

    def _bundle(self, system, cache):
        """Resolved (P, S, wavelength) for ray merits; None otherwise."""
        return None

    def __call__(self, system, cache):
        raise NotImplementedError(
            f'{type(self).__name__} provides no optimizer value')

    def value(self, trace, system, wavelength):
        """Merit value from an already-traced bundle.

        The base implementation evaluates the merit's adjoint head on
        the trace histories when one exists; merits without a
        jnp-differentiable head raise.
        """
        head_fn = getattr(self, 'adjoint_head', None)
        if head_fn is None:
            raise NotImplementedError(
                f'{type(self).__name__} provides no trace-based value')
        import jax.numpy as jnp
        head = head_fn()
        return float(head(jnp.asarray(trace.P), jnp.asarray(trace.S),
                          jnp.asarray(trace.OPL)))

    def seed(self, trace, system, wavelength):
        """(P_bar, S_bar, L_bar) history-shaped adjoint cotangents.

        Where the reference hand-derives per-merit cotangent seeds,
        the base implementation is one ``jax.grad`` of the merit's
        adjoint head over the trace histories — any head gets exact
        seeds for free.
        """
        head_fn = getattr(self, 'adjoint_head', None)
        if head_fn is None:
            raise NotImplementedError(
                f'{type(self).__name__} provides no adjoint seed')
        import jax
        import jax.numpy as jnp
        head = head_fn()
        grads = jax.grad(lambda P, S, L: head(P, S, L),
                         argnums=(0, 1, 2))(
            jnp.asarray(trace.P), jnp.asarray(trace.S),
            jnp.asarray(trace.OPL))
        return tuple(np.asarray(g) for g in grads)

    def direct_gradient(self, trace, system, wavelength, seeds):
        """Optional d merit / d seed terms outside the ray-state sweep."""
        return None

    @property
    def seedable(self):
        """True when this merit can drive the adjoint sweep."""
        return (type(self).seed is not Merit.seed
                or getattr(self, 'adjoint_head', None) is not None)

    @property
    def has_value(self):
        """True when this merit provides a traced-bundle value."""
        return (type(self).value is not Merit.value
                or getattr(self, 'adjoint_head', None) is not None)


class _RayMerit(Merit):
    """Merit over one launch recipe (field, wavelength, sampling)."""

    def __init__(self, field=None, wavelength=None, sampling=None, *,
                 target=None, weight=1.0, min=None, max=None, epd=None):
        super().__init__(target=target, weight=weight, min=min, max=max)
        self.field = field
        self.wavelength = None if wavelength is None else float(wavelength)
        self.sampling = sampling
        self.epd = epd

    def _bundle(self, system, cache):
        wvl = cache.context(self.wavelength).wavelength
        P, S = cache.launch(self.field, wvl, self.sampling, epd=self.epd)
        return P, S, wvl


class RmsSpotRadius(_RayMerit):
    """Weighted RMS spot radius at the image plane for one recipe."""

    name = 'rms_spot_radius'

    def __call__(self, system, cache):
        P, S, wvl = self._bundle(system, cache)
        trace = cache.trace(P, S, wvl)
        return float(rms_spot_radius(np.asarray(trace.P)[-1],
                                     status=np.asarray(trace.status)))

    def adjoint_head(self):
        """jnp-differentiable twin of __call__ for the adjoint engine."""
        from .adjoint.engine import RmsSpotHead
        return RmsSpotHead(reference='centroid', name=self.name)


class RayHeightAt(_RayMerit):
    """One ray's position along one axis at one surface (history row)."""

    def __init__(self, field=None, wavelength=None, sampling=None, *,
                 surface_index, axis, target=None, weight=1.0,
                 min=None, max=None, ray_index=0, epd=None):
        super().__init__(field, wavelength, sampling, target=target,
                         weight=weight, min=min, max=max, epd=epd)
        self.surface_index = int(surface_index)
        self.axis = int(axis)
        self.ray_index = int(ray_index)

    def __call__(self, system, cache):
        P, S, wvl = self._bundle(system, cache)
        trace = cache.trace(P, S, wvl)
        return float(np.asarray(trace.P)[self.surface_index, self.ray_index,
                                         self.axis])


class Boresight(_RayMerit):
    """Centroid distance from a target point at the final surface."""

    def __init__(self, field=None, wavelength=None, sampling=None, *,
                 target_xy=(0.0, 0.0), weight=1.0, min=None, max=None,
                 epd=None):
        super().__init__(field, wavelength, sampling, weight=weight,
                         min=min, max=max, epd=epd)
        self.target_xy = (float(target_xy[0]), float(target_xy[1]))

    def __call__(self, system, cache):
        P, S, wvl = self._bundle(system, cache)
        trace = cache.trace(P, S, wvl)
        Pf = np.asarray(trace.P)[-1]
        valid = np.asarray(valid_mask(trace.status, Pf))
        if valid.any():
            mean = Pf[valid, :2].mean(axis=0)
        else:
            mean = Pf[:, :2].mean(axis=0)
        dx = mean[0] - self.target_xy[0]
        dy = mean[1] - self.target_xy[1]
        return float(np.sqrt(dx * dx + dy * dy))

    def adjoint_head(self):
        """jnp-differentiable twin of __call__ for the adjoint engine."""
        from .adjoint.engine import BoresightHead
        return BoresightHead(target=self.target_xy, name='boresight')


class EFL(Merit):
    """Effective focal length (paraxial ABCD)."""

    name = 'efl'

    def __init__(self, wavelength=None, target=None, weight=1.0, *,
                 min=None, max=None):
        super().__init__(target=target, weight=weight, min=min, max=max)
        self.wavelength = None if wavelength is None else float(wavelength)

    def __call__(self, system, cache):
        ctx = cache.context(self.wavelength)
        return float(effective_focal_length(ctx.surfaces,
                                            wvl=ctx.wavelength))


class BFL(Merit):
    """Back focal length (last powered vertex to rear focal point)."""

    name = 'bfl'

    def __init__(self, wavelength=None, target=None, weight=1.0, *,
                 min=None, max=None):
        super().__init__(target=target, weight=weight, min=min, max=max)
        self.wavelength = None if wavelength is None else float(wavelength)

    def __call__(self, system, cache):
        ctx = cache.context(self.wavelength)
        return float(back_focal_length(ctx.surfaces, wvl=ctx.wavelength))


class ParaxialImageDistance(Merit):
    """Signed distance from the last vertex to the paraxial image plane."""

    name = 'paraxial_image_distance'

    def __init__(self, wavelength=None, target=None, weight=1.0, *,
                 min=None, max=None):
        super().__init__(target=target, weight=weight, min=min, max=max)
        self.wavelength = None if wavelength is None else float(wavelength)

    def __call__(self, system, cache):
        ctx = cache.context(self.wavelength)
        return float(paraxial_image_distance(ctx.surfaces,
                                             wvl=ctx.wavelength))


class TotalTrack(Merit):
    """Sum of finite row gaps from the first non-object row (Code V TTL)."""

    name = 'total_track'

    def __init__(self, target=None, weight=1.0, *, min=None, max=None):
        super().__init__(target=target, weight=weight, min=min, max=max)

    def __call__(self, system, cache):
        rows = system.rows
        start = 0
        if rows:
            typ = getattr(rows[0], 'typ', None)
            if typ is not None and _is_measurement_surf(_map_stype(typ)):
                start = 1
        total = 0.0
        for row in rows[start:]:
            t = float(getattr(row, 'thickness', 0.0))
            if math.isfinite(t):
                total += t
        return float(total)


class Thickness(Merit):
    """One system row's axial gap, by row index (the edge guard)."""

    name = 'thickness'

    def __init__(self, surface, target=None, weight=1.0, *,
                 min=None, max=None):
        super().__init__(target=target, weight=weight, min=min, max=max)
        self.surface = int(surface)

    def __call__(self, system, cache):
        return float(system.rows[self.surface].thickness)


class _CallableMerit(Merit):
    """Adapter giving f(system, cache) -> float the Merit protocol."""

    def __init__(self, fn, target=None, weight=1.0, *, min=None, max=None):
        super().__init__(target=target, weight=weight, min=min, max=max)
        self.fn = fn
        self.name = getattr(fn, '__name__', 'callable')

    def __call__(self, system, cache):
        return float(self.fn(system, cache))


class WavefrontRMS(_RayMerit):
    """RMS of OPD on the chief-ray reference sphere for one recipe."""

    name = 'rms_wfe'

    def __init__(self, field=None, wavelength=None, sampling=None, *,
                 target=None, weight=1.0, min=None, max=None,
                 chief_index=None, axis_point=None, axis_dir=None,
                 P_xp=None, epd=None, stop_index=None, reference='chief'):
        super().__init__(field, wavelength, sampling, target=target,
                         weight=weight, min=min, max=max, epd=epd)
        self.chief_index = chief_index
        self.axis_point = axis_point
        self.axis_dir = axis_dir
        self.P_xp = P_xp
        self.stop_index = stop_index
        if reference not in ('chief', 'piston'):
            raise ValueError("reference must be 'chief' or 'piston'")
        self.reference = reference

    def _geometry(self, trace, system, wavelength, *, P_xp_override=None,
                  ctx=None):
        chief = self.chief_index
        if chief is None:
            chief = _pupil_center_chief_index(np.asarray(trace.P)[0])
        P_xp = P_xp_override if P_xp_override is not None else self.P_xp
        return _analysis.close_wavefront(
            system, trace, wavelength, chief, field=self.field, P_xp=P_xp,
            stop_index=self.stop_index, epd=self.epd,
            axis_point=self.axis_point, axis_dir=self.axis_dir, ctx=ctx)

    def _rms(self, closing):
        opd = closing.opd
        if self.reference == 'piston':
            opd = opd - np.mean(opd)
        return float(np.sqrt(np.mean(opd * opd)))

    def __call__(self, system, cache):
        P, S, wvl = self._bundle(system, cache)
        trace = cache.trace(P, S, wvl)
        ctx = cache.context(self.wavelength)
        P_xp = cache.exit_pupil(
            P, S, wvl, P_xp=self.P_xp,
            chief_index=self.chief_index, stop_index=self.stop_index,
            epd=self.epd, axis_point=self.axis_point,
            axis_dir=self.axis_dir)
        g = self._geometry(trace, system, wvl, P_xp_override=P_xp, ctx=ctx)
        return self._rms(g)

    def tangent_gradient(self, system, P, S, wvl, seeds):
        """d(rms_wfe)/d(seed) row via the forward-mode tangent engine.

        One jvp sweep per seed carries the closing's exit-pupil and
        curvature couplings exactly (paraxial stop motion enters through
        P_xp_dot, as in wavefront_differential's tangent path).
        """
        from ._diff_raytrace import wavefront_with_tangents
        from .wavefront_differential import _xp_z_tangents_robust

        surfaces = compiled_surfaces(system)
        P_xp = self.P_xp
        P_xp_dot = None
        reference_curvature = None
        reference_curvature_dot = None
        stop_index = (self.stop_index if self.stop_index is not None
                      else getattr(system, 'stop_index', None))
        if P_xp is None and stop_index is not None:
            P_xp, xp_mode = _analysis.resolve_exit_pupil(
                system, wvl, stop_index=self.stop_index, epd=self.epd,
                field=self.field, axis_point=self.axis_point,
                axis_dir=self.axis_dir, return_mode=True)
            if xp_mode == 'paraxial':
                xp_z_dot = _xp_z_tangents_robust(
                    surfaces, wvl, seeds, stop_index)
                if P_xp is None:
                    reference_curvature = 0.0
                    reference_curvature_dot = np.zeros(len(seeds),
                                                       dtype=_PREC)
                else:
                    P_xp_dot = np.zeros((3, len(seeds)), dtype=_PREC)
                    P_xp_dot[2] = xp_z_dot
        opd, _, _, dW = wavefront_with_tangents(
            surfaces, P, S, wvl, seeds,
            chief_index=self.chief_index,
            axis_point=self.axis_point, axis_dir=self.axis_dir,
            P_xp=P_xp, P_xp_dot=P_xp_dot,
            reference_curvature=reference_curvature,
            reference_curvature_dot=reference_curvature_dot,
            field=self.field, output='length')
        if self.reference == 'piston':
            opd = opd - np.mean(opd)
            dW = dW - np.mean(dW, axis=0, keepdims=True)
        rms = float(np.sqrt(np.mean(opd * opd)))
        if rms == 0.0:
            return np.zeros(len(seeds), dtype=_PREC)
        return (opd @ dW) / (opd.shape[0] * rms)


class ZernikeCoefficient(_RayMerit):
    """One coefficient of a Zernike fit to the OPD for one recipe."""

    name = 'zernike_coefficient'

    def __init__(self, field=None, wavelength=None, sampling=None, *,
                 n, m, nms_basis, target=None, weight=1.0,
                 min=None, max=None, chief_index=None,
                 axis_point=None, axis_dir=None, P_xp=None, epd=None,
                 stop_index=None, normalization_radius=None, norm=True):
        super().__init__(field, wavelength, sampling, target=target,
                         weight=weight, min=min, max=max, epd=epd)
        self.n = int(n)
        self.m = int(m)
        nms_basis = [(int(nn), int(mm)) for nn, mm in nms_basis]
        if (self.n, self.m) not in nms_basis:
            raise ValueError(
                f'(n, m)=({self.n}, {self.m}) must appear in nms_basis '
                f'{nms_basis!r}; the basis sets which modes are jointly fit')
        self.nms_basis = tuple(nms_basis)
        self._idx = nms_basis.index((self.n, self.m))
        self.chief_index = chief_index
        self.axis_point = axis_point
        self.axis_dir = axis_dir
        self.P_xp = P_xp
        self.stop_index = stop_index
        self.normalization_radius = normalization_radius
        self.norm = bool(norm)

    def __call__(self, system, cache):
        P, S, wvl = self._bundle(system, cache)
        trace = cache.trace(P, S, wvl)
        P_xp = cache.exit_pupil(
            P, S, wvl, P_xp=self.P_xp,
            chief_index=self.chief_index, stop_index=self.stop_index,
            epd=self.epd, axis_point=self.axis_point,
            axis_dir=self.axis_dir)
        opd, x_pup, y_pup, _ = _analysis._wavefront_from_trace(
            system, P, wvl, trace, chief_index=self.chief_index, P_xp=P_xp,
            field=self.field)
        coefs, _ = _analysis.wavefront_zernike_fit(
            opd, x_pup, y_pup, self.nms_basis,
            normalization_radius=self.normalization_radius, norm=self.norm)
        return float(coefs[self._idx])


class Distortion(Merit):
    """Percent distortion at one off-axis field, vs paraxial proxy."""

    name = 'distortion'

    def __init__(self, field, wavelength=None, *, epd, target=None,
                 weight=1.0, min=None, max=None, paraxial_fraction=1e-4):
        super().__init__(target=target, weight=weight, min=min, max=max)
        self.field = field
        self.wavelength = None if wavelength is None else float(wavelength)
        self.epd = float(epd)
        self.paraxial_fraction = float(paraxial_fraction)

    def __call__(self, system, cache):
        wvl = cache.context(self.wavelength).wavelength
        result = _analysis.distortion(
            system, [self.field], wvl, epd=self.epd,
            paraxial_fraction=self.paraxial_fraction)
        return float(result.percent[0])


class FieldCurvature(Merit):
    """abs(x_fan_z - y_fan_z) at one off-axis field (parabasal foci)."""

    name = 'field_curvature'

    def __init__(self, field, wavelength=None, *, target=None,
                 weight=1.0, min=None, max=None):
        super().__init__(target=target, weight=weight, min=min, max=max)
        self.field = field
        self.wavelength = None if wavelength is None else float(wavelength)

    def __call__(self, system, cache):
        from .parabasal import parabasal_foci

        wvl = cache.context(self.wavelength).wavelength
        x_z, y_z = parabasal_foci(system, self.field, wvl)
        if not (math.isfinite(x_z) and math.isfinite(y_z)):
            raise ValueError(
                'field_curvature operand: the chief ray failed to trace at '
                f'field {self.field!r}; cannot evaluate field curvature '
                '(check the starting geometry or constrain the variables).')
        return float(abs(x_z - y_z))


# ---------- Problem ----------------------------------------------------------

def _is_system(model):
    return hasattr(model, '_design') and hasattr(model, 'to_surfaces')


class Problem:
    """Design optimization over an OpticalSystem's free vector."""

    def __init__(self, system, operands=None, *,
                 constraints=None, gradient='fd'):
        if not _is_system(system):
            raise TypeError(
                'Problem requires an OpticalSystem (it owns the DesignState '
                'free vector and resolves the experiment metadata); got '
                f'{type(system).__name__}.')
        if gradient not in ('auto', 'fd'):
            raise ValueError(
                f"gradient must be 'auto' or 'fd', got {gradient!r}")
        self.system = system
        self.design = system._design
        self.operands = list(operands or [])
        eqs, ineqs = _route_constraints(constraints)
        self.equality_constraints = eqs
        self.inequality_constraints = ineqs
        self.gradient = gradient

    def x0(self):
        """Initial free vector from the DesignState."""
        return self.design.pack()

    def _set_x(self, x):
        self.design.update(x)

    def _operand_vector(self, operands, *, weighted):
        cache = _TraceCache(self.system)
        out = np.empty(len(operands), dtype=_PREC)
        for i, op in enumerate(operands):
            v = op(self.system, cache)
            r = v - op.target
            if weighted:
                r = op.weight * r
            out[i] = r
        return out, cache

    def residuals(self, x, return_cache=False):
        """Per-operand weighted residual vector."""
        self._set_x(x)
        out, cache = self._operand_vector(self.operands, weighted=True)
        if return_cache:
            return out, cache
        return out

    def equalities(self, x, return_cache=False):
        """Unweighted equality constraint vector, op_i - target_i == 0."""
        self._set_x(x)
        out, cache = self._operand_vector(
            self.equality_constraints, weighted=False)
        if return_cache:
            return out, cache
        return out

    def inequalities(self, x, return_cache=False):
        """Unweighted inequality constraint vector, g_i(x) >= 0."""
        self._set_x(x)
        cache = _TraceCache(self.system)
        out = np.empty(len(self.inequality_constraints), dtype=_PREC)
        for i, (op, kind, bound) in enumerate(self.inequality_constraints):
            v = op(self.system, cache)
            out[i] = (v - bound) if kind == 'min' else (bound - v)
        if return_cache:
            return out, cache
        return out

    def solve(self, x0=None, **kwargs):
        """Constrained damped least squares; updates the lens to the result."""
        eq = _combine_constraints(
            self.equalities, kwargs.pop('equality_constraints', None))
        ineq = _combine_constraints(
            self.inequalities, kwargs.pop('inequality_constraints', None))
        result = damped_least_squares(
            self, x0=x0, equality_constraints=eq,
            inequality_constraints=ineq, **kwargs)
        self._set_x(result.x)
        if not result.success:
            warnings.warn(
                f'optimization did not converge: {result.message}; the '
                'lens was updated to the best iterate anyway',
                stacklevel=2)
        return result

    def _eval_merit(self, system):
        cache = _TraceCache(system)
        total = 0.0
        for op in self.operands:
            v = op(system, cache)
            r = op.weight * (v - op.target)
            total = total + r * r
        return total

    def merit(self, x):
        """Scalar sum of squared weighted residuals."""
        self._set_x(x)
        return float(self._eval_merit(self.system))

    def jacobian(self, x, method='fd', step=1e-6):
        """Gradient of the scalar merit with respect to x (FD)."""
        self._set_x(x)
        return _merit_jacobian_free(
            self.design, lambda: self._eval_merit(self.system),
            method='fd', step=step)

    def residual_jacobian(self, x, step=1e-6):
        """Adjoint Jacobian of the weighted residual vector at x, or None.

        None when gradient='fd' — damped_least_squares then central-
        differences the residuals itself.
        """
        if self.gradient != 'auto':
            return None
        return self._auto_residual_jacobian(x, step=step)

    def _auto_residual_jacobian(self, x, step=1e-6):
        """Exact d(weighted residual)/dx via the adjoint engine.

        Ray operands that expose adjoint_head() are grouped by launch
        bundle and differentiated in one reverse-mode pass per operand
        through the trace (reference routes this through
        ``adjoint/tolerance_analysis.py:72``); remaining operands
        (paraxial scalars etc.) fall back to central differences.
        """
        from .adjoint.seeds import seed_from_slot
        from .adjoint.tolerance_analysis import multi_objective_sensitivity

        self._set_x(x)
        x = np.asarray(x, dtype=float)
        slots = self.design.free_slots()
        seeds = [seed_from_slot(self.system.lens, slot, self.design,
                                name=str(slot)) for slot in slots]
        J = np.zeros((len(self.operands), x.size), dtype=_PREC)

        cache = _TraceCache(self.system)
        groups = {}
        fd_rows = []
        for i, op in enumerate(self.operands):
            tangent_fn = getattr(op, 'tangent_gradient', None)
            if tangent_fn is not None:
                P, S, wvl = op._bundle(self.system, cache)
                try:
                    row = tangent_fn(self.system, np.asarray(P),
                                     np.asarray(S), wvl, seeds)
                except (ValueError, NotImplementedError):
                    fd_rows.append(i)
                else:
                    J[i] = op.weight * np.asarray(row)
                continue
            head_fn = getattr(op, 'adjoint_head', None)
            if head_fn is None:
                fd_rows.append(i)
                continue
            P, S, wvl = op._bundle(self.system, cache)
            key = (float(wvl), id(P))
            groups.setdefault(key, (P, S, wvl, []))[3].append(i)
        for P, S, wvl, rows in groups.values():
            heads = [self.operands[i].adjoint_head() for i in rows]
            res = multi_objective_sensitivity(
                self.system, np.asarray(P), np.asarray(S), wvl, seeds,
                heads)
            for m, i in enumerate(rows):
                J[i] = self.operands[i].weight * res.jacobian[m]

        if fd_rows:
            ops = [self.operands[i] for i in fd_rows]

            def sub(xv):
                self._set_x(xv)
                out, _ = self._operand_vector(ops, weighted=True)
                return out

            for k in range(x.size):
                h = step * max(1.0, abs(x[k]))
                xp = x.copy()
                xp[k] += h
                fp = sub(xp)
                xp[k] = x[k] - h
                fm = sub(xp)
                for m, i in enumerate(fd_rows):
                    J[i, k] = (fp[m] - fm[m]) / (2 * h)
            self._set_x(x)
        return J


def _as_operand_list(operands):
    if operands is None:
        return []
    if isinstance(operands, Merit):
        return [operands]
    return list(operands)


def _route_constraints(constraints):
    """Split constraints into equality operands and (op, kind, bound)."""
    eqs = []
    ineqs = []
    for op in _as_operand_list(constraints):
        mn = getattr(op, 'min', None)
        mx = getattr(op, 'max', None)
        if mn is None and mx is None:
            eqs.append(op)
            continue
        if getattr(op, '_target_set', False):
            raise ValueError(
                f'constraint {getattr(op, "name", type(op).__name__)} '
                'mixes target= with min=/max=; use target= alone for an '
                'equality or min=/max= alone for inequalities')
        if mn is not None:
            ineqs.append((op, 'min', float(mn)))
        if mx is not None:
            ineqs.append((op, 'max', float(mx)))
    return eqs, ineqs


def _combine_constraints(primary, extra):
    if extra is None:
        return primary
    if callable(extra):
        return (primary, extra)
    return (primary, *tuple(extra))


# ---------- Goal factory -----------------------------------------------------

_GOAL_OPERANDS = {
    'spot': RmsSpotRadius,
    'wavefront': WavefrontRMS,
}


def build_problem(system, goal='spot', *, sampling=None, fields=None,
                  wavelengths=None, constraints=None):
    """Assemble a Problem from goal items fanned over fields/wavelengths."""
    items = list(goal) if isinstance(goal, (list, tuple)) else [goal]

    resolve_field = getattr(system, 'field', None)
    if fields is not None:
        flds = [resolve_field(f) if callable(resolve_field) else f
                for f in fields]
    else:
        flds = list(getattr(system, 'fields', None) or [])
    if not flds:
        flds = [None]

    if wavelengths is not None:
        wvls = [float(w) for w in wavelengths]
        wts = [1.0] * len(wvls)
    else:
        wvls = [float(w) for w in getattr(system, 'wavelengths', [])]
        wts = [float(w) for w in getattr(system, 'weights', [])]
        if len(wts) != len(wvls):
            wts = [1.0] * len(wvls)
    if not wvls:
        wvls = [None]
        wts = [1.0]

    ops = []
    for item in items:
        if isinstance(item, str):
            cls = _GOAL_OPERANDS.get(item)
            if cls is None:
                raise ValueError(
                    f'unknown goal {item!r}; known goals: '
                    f'{sorted(_GOAL_OPERANDS)}')
        elif isinstance(item, type) and issubclass(item, Merit):
            cls = item
        elif isinstance(item, Merit):
            ops.append(item)
            continue
        elif callable(item):
            ops.append(_CallableMerit(item))
            continue
        else:
            raise TypeError(
                'goal items must be a string, a Merit subclass or '
                f'instance, or a callable; got {type(item).__name__}')
        recipe_class = (_class_accepts_kw(cls, 'field')
                        or _class_accepts_kw(cls, 'sampling'))
        wavelength_class = _class_accepts_kw(cls, 'wavelength')
        weight_class = _class_accepts_kw(cls, 'weight')
        if recipe_class:
            for f in flds:
                for w, wt in zip(wvls, wts):
                    kwargs = {}
                    if _class_accepts_kw(cls, 'field'):
                        kwargs['field'] = f
                    if wavelength_class:
                        kwargs['wavelength'] = w
                    if _class_accepts_kw(cls, 'sampling'):
                        kwargs['sampling'] = sampling
                    if weight_class:
                        kwargs['weight'] = wt
                    ops.append(cls(**kwargs))
        elif wavelength_class:
            for w, wt in zip(wvls, wts):
                kwargs = {'wavelength': w}
                if weight_class:
                    kwargs['weight'] = wt
                ops.append(cls(**kwargs))
        else:
            kwargs = {}
            if weight_class:
                kwargs['weight'] = 1.0
            ops.append(cls(**kwargs))
    return Problem(system, ops, constraints=constraints)


__all__ = [
    'Merit', 'RmsSpotRadius', 'RayHeightAt', 'Boresight', 'EFL', 'BFL',
    'ParaxialImageDistance', 'TotalTrack', 'Thickness', 'WavefrontRMS',
    'ZernikeCoefficient', 'Distortion', 'FieldCurvature',
    'Problem', 'build_problem',
    'DampedLeastSquares', 'DampedLeastSquaresResult',
    'damped_least_squares',
]
