"""Surface containers and shape objects for raytracing.

Rebuild of ``prysm/x/raytracing/surfaces.py``.  Shapes carry static
parameters and expose ``sag`` / ``sag_and_normal`` as pure jnp functions;
the polynomial freeforms reuse the package's fused sum+derivative
evaluators.  ``Surface.interact`` is a pure masked function of the ray
bundle, so whole traces jit and differentiate.

Conic-seeded shapes carry a lazily computed ``DepartureBand`` (reference
``surfaces.py:85-132,1262-1339``): max sag departure from the seed conic,
the departure-slope bound for the first-root monotonicity certificate, and
the sag Lipschitz bound for the march rescue.  The band is pure jnp with
``stop_gradient``, so it evaluates eagerly to concrete floats at build time
(then cached) and stays traceable when shape parameters are optimization
tracers (then recomputed per trace, matching the reference's rebuild-per-
design-edit semantics).
"""
import numbers
import warnings

import numpy as onp

import jax.core
import jax.numpy as jnp
from jax import lax

from ...conf import config
from ...coordinates import (
    apply_tilt_decenter,
    coerce_3d_rotation,
    make_rotation_matrix,
    promote_3d_point,
)
from ...polynomials import (
    cheby1_2d_sum, cheby1_2d_sum_der_xy,
    jacobi_radial_sum, jacobi_radial_sum_der_xy,
    xy_sum, xy_sum_der_xy,
    zernike_sum, zernike_sum_der_xy,
)

from .spencer_and_murty import (
    STYPE_EVAL, STYPE_OBJ, STYPE_IMG, STYPE_REFLECT, STYPE_REFRACT,
    _is_measurement_surf,
    STATUS_OK, STATUS_MISS, STATUS_NEWTON, STATUS_CLIP, STATUS_TIR,
    STATUS_EVANESCENT,
    refract, refract_with_tir, reflect,
    diffract as _diffract_kernel,
    transform_to_local_coords, transform_to_global_coords,
    intersect as newton_intersect,
    SURFACE_INTERSECTION_DEFAULT_MAXITER,
)
from .intersections import (
    ConicSeedMixin,
    MARCH_RADIUS_MARGIN,
    ray_conic_intersect,
    ray_plane_intersect,
    ray_sphere_intersect,
)
from .aperture import annular_aperture, as_aperture, circular_aperture
from .opl import OPLFunc
from .sags import (
    Q2d_and_der, Q2d_sag,
    _add_conic_base_derivatives, _add_conic_base_sag,
    autodiff_sag_and_normal,
    conic_sag, conic_sag_and_normal, conic_sag_der,
    conic_sag_hessian, conic_sag_param_partials,
    even_asphere_sag, even_asphere_sag_der_xy,
    gradient_to_unit_normal, phi_conic, plane_sag_and_normal, product_rule,
    sphere_sag, sphere_sag_der,
)


# Sample count per axis for the departure-band precompute; the max-departure
# estimate is padded to absorb the grid resolution (reference surfaces.py:85)
DEPARTURE_BAND_SAMPLES = 64
# departure-gradient ceiling: past this slope the acceptance band can hold
# more than one crossing, so first-root selection warns (ref surfaces.py:89)
DEPARTURE_GRADIENT_WARN = 0.5


class DepartureBand:
    """Conic-seed departure bounds backing the first-root guarantee.

    Quantifies how far (and how steeply) a polynomial sag departs from
    its seed conic over a characterized disk: max_departure pads the
    sag envelope, domain_radius records the disk, gradient_bound feeds
    the monotonicity certificate, and lipschitz the Lipschitz-march
    rescue.  An unbounded band (analytic shape, or no characterizable
    conic domain; reference surfaces.py:92-131) carries None in every
    numeric field and bounded=False.
    """

    _LIMIT_FIELDS = ('max_departure', 'domain_radius',
                     'gradient_bound', 'lipschitz')

    def __init__(self, *, bounded, **limits):
        self.bounded = bounded
        for field in self._LIMIT_FIELDS:
            setattr(self, field, limits.get(field) if bounded else None)

    @classmethod
    def unbounded(cls):
        """A band with no finite bound (analytic shape / no conic domain)."""
        return cls(bounded=False)

    def __repr__(self):
        if not self.bounded:
            return 'DepartureBand(bounded=False)'
        parts = []
        for field in self._LIMIT_FIELDS:
            try:
                parts.append(f'{field}={getattr(self, field):g}')
            except (TypeError, ValueError):
                return 'DepartureBand(bounded=True, traced)'
        return f"DepartureBand({', '.join(parts)})"


def _concrete_float(x):
    """float(x) if x is a concrete scalar, else None (traced value)."""
    if isinstance(x, jax.core.Tracer):
        return None
    try:
        return float(x)
    except (TypeError, ValueError):
        return None


def _map_stype(typ):
    """Map a user-facing interaction spec to an STYPE constant."""
    if isinstance(typ, str):
        t = typ.lower()
        mapping = {
            'reflect': STYPE_REFLECT, 'refl': STYPE_REFLECT,
            'mirror': STYPE_REFLECT,
            'refract': STYPE_REFRACT, 'refr': STYPE_REFRACT,
            'eval': STYPE_EVAL, 'evaluate': STYPE_EVAL,
            'object': STYPE_OBJ, 'obj': STYPE_OBJ,
            'image': STYPE_IMG, 'img': STYPE_IMG,
        }
        try:
            return mapping[t]
        except KeyError:
            raise ValueError(f'unknown interaction {typ!r}')
    if typ in (STYPE_REFLECT, STYPE_REFRACT, STYPE_EVAL, STYPE_OBJ, STYPE_IMG):
        return typ
    raise ValueError(f'unknown interaction {typ!r}')


def _shape_from_params(cls, p):
    """Rebuild a descriptor-declared shape from a stored parameter dict.

    SCALAR_DOFS + VECTOR_DOFS + META_KEYS name the constructor's keyword
    arguments exactly; binding this as a classmethod is what registers a
    shape as LensData-editable (reference: prysm/x/raytracing/
    surfaces.py:312-323).
    """
    keys = cls.SCALAR_DOFS + cls.VECTOR_DOFS + cls.META_KEYS
    return cls(**{key: p[key] for key in keys})


class Shape:
    """Base class for sag-bearing shape objects.

    Subclasses declare their editable-DOF layout for LensData via
    SCALAR_DOFS / VECTOR_DOFS / META_KEYS / CATEGORIES plus a bound
    from_params classmethod.
    """

    SCALAR_DOFS = ()
    VECTOR_DOFS = ()
    META_KEYS = ()
    CATEGORIES = {}

    def __init__(self, **params):
        self.params = params

    def __getattr__(self, name):
        params = self.__dict__.get('params', {})
        if name in params:
            return params[name]
        raise AttributeError(name)

    def sag(self, x, y):
        """Surface sag at local (x, y); override."""
        raise NotImplementedError

    def sag_and_normal(self, x, y):
        """(sag, unit normal); default derives the normal via autodiff."""
        if not hasattr(self, '_auto_san'):
            self._auto_san = autodiff_sag_and_normal(self.sag)
        return self._auto_san(x, y)

    def _sag_gradient(self, x, y):
        """(dz/dx, dz/dy) via one forward-mode sweep per axis."""
        ones = jnp.ones_like(x)
        zeros = jnp.zeros_like(x)
        _, gx = jax.jvp(self.sag, (x, y), (ones, zeros))
        _, gy = jax.jvp(self.sag, (x, y), (zeros, ones))
        return gx, gy

    def sag_hessian(self, x, y):
        """Sag Hessian (sag_xx, sag_xy, sag_yy) at (x, y).

        Base implementation nests forward-mode AD over the sag; shapes
        with closed-form Hessians (Plane, Sphere, Conic) override.
        """
        x = jnp.asarray(x, dtype=float)
        y = jnp.asarray(y, dtype=float)
        ones = jnp.ones_like(x)
        zeros = jnp.zeros_like(x)
        _, (sag_xx, sag_xy) = jax.jvp(self._sag_gradient, (x, y),
                                      (ones, zeros))
        _, (_, sag_yy) = jax.jvp(self._sag_gradient, (x, y),
                                 (zeros, ones))
        return sag_xx, sag_xy, sag_yy

    def sag_param_partials(self, x, y, name):
        """(sag_t, gx_t, gy_t): partials wrt a scalar shape DOF at fixed x, y.

        The base implementation rebuilds the shape with the named
        parameter traced and differentiates sag + gradient with one
        jvp — the generic path that lets freeform-coefficient
        tolerances reuse the differential machinery without a re-trace.
        """
        params = self.params
        if not params or name not in params:
            raise ValueError(
                f'shape has no parameter {name!r} to differentiate against')
        builder = getattr(type(self), 'from_params', None)
        if builder is None:
            raise ValueError(
                f'{type(self).__name__} cannot rebuild from params; '
                'override sag_param_partials')
        x = jnp.asarray(x, dtype=float)
        y = jnp.asarray(y, dtype=float)

        def f(v):
            p = dict(params)
            p[name] = v
            shp = builder(p)
            z = shp.sag(x, y)
            gx, gy = Shape._sag_gradient(shp, x, y)
            return z, gx, gy

        v0 = jnp.asarray(float(params[name]))
        _, (sag_t, gx_t, gy_t) = jax.jvp(f, (v0,), (jnp.ones_like(v0),))
        return sag_t, gx_t, gy_t


class CallableShape(Shape):
    """Shape from user callables sag(x, y) [and sag_and_normal(x, y)]."""

    def __init__(self, sag, sag_and_normal=None, params=None):
        super().__init__(**(params or {}))
        self._sag = sag
        self._san = sag_and_normal

    def sag(self, x, y):
        """Evaluate the user sag."""
        return self._sag(x, y)

    def sag_and_normal(self, x, y):
        """Evaluate sag and normal (autodiff if not supplied)."""
        if self._san is not None:
            return self._san(x, y)
        return super().sag_and_normal(x, y)


class Plane(Shape):
    """Flat surface z = 0."""

    analytic_intersect = True

    SCALAR_DOFS = ()
    VECTOR_DOFS = ()
    META_KEYS = ()
    CATEGORIES = {}

    from_params = classmethod(_shape_from_params)

    def __init__(self):
        super().__init__()

    def sag(self, x, y):
        """Zero sag."""
        return jnp.zeros(jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y)),
                         dtype=jnp.result_type(x, y))

    def sag_and_normal(self, x, y):
        """Zero sag, +z normal."""
        return plane_sag_and_normal(x, y)

    def sag_hessian(self, x, y):
        """Plane sag Hessian (all zero)."""
        z = jnp.zeros(jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y)),
                      dtype=jnp.result_type(x, y))
        return z, z, z

    def intersect(self, P, S, sag_and_normal=None, tol_sag=None, maxiter=None):
        """Closed-form plane intersection."""
        return ray_plane_intersect(P, S)


class Sphere(Shape):
    """Sphere of curvature c."""

    analytic_intersect = True

    SCALAR_DOFS = ('c',)
    VECTOR_DOFS = ()
    META_KEYS = ()
    CATEGORIES = {'curvature': ['c'], 'radius': ['c']}

    from_params = classmethod(_shape_from_params)

    def __init__(self, c):
        super().__init__(c=c)

    def sag(self, x, y):
        """Spherical sag."""
        return sphere_sag(self.params['c'], x * x + y * y)

    def sag_and_normal(self, x, y):
        """Spherical sag and normal."""
        return conic_sag_and_normal(self.params['c'], 0.0, x, y)

    def intersect(self, P, S, sag_and_normal=None, tol_sag=None, maxiter=None):
        """Closed-form sphere intersection."""
        return ray_sphere_intersect(P, S, self.params['c'])


class Conic(Shape):
    """Conicoid of curvature c and conic constant k."""

    analytic_intersect = True

    SCALAR_DOFS = ('c', 'k')
    VECTOR_DOFS = ()
    META_KEYS = ()
    CATEGORIES = {'curvature': ['c'], 'radius': ['c'], 'conic': ['k']}

    from_params = classmethod(_shape_from_params)

    def __init__(self, c, k):
        super().__init__(c=c, k=k)

    def sag(self, x, y):
        """Conic sag."""
        return conic_sag(self.params['c'], self.params['k'], x * x + y * y)

    def sag_and_normal(self, x, y):
        """Conic sag and normal."""
        return conic_sag_and_normal(self.params['c'], self.params['k'], x, y)

    def sag_hessian(self, x, y):
        """Closed-form conic Hessian."""
        return conic_sag_hessian(self.params['c'], self.params['k'], x, y)

    def sag_param_partials(self, x, y, name):
        """Partials of conic sag and gradient wrt 'c' or 'k'."""
        return conic_sag_param_partials(self.params['c'], self.params['k'],
                                        x, y, name)

    def intersect(self, P, S, sag_and_normal=None, tol_sag=None, maxiter=None):
        """Closed-form conic intersection."""
        return ray_conic_intersect(P, S, self.params['c'], self.params['k'])


class OffAxisConic(Shape):
    """Off-axis section of a parent conicoid, decentered by (dx, dy)."""

    analytic_intersect = True

    SCALAR_DOFS = ('c', 'k')
    VECTOR_DOFS = ()
    META_KEYS = ('dx', 'dy')
    CATEGORIES = {'curvature': ['c'], 'radius': ['c'], 'conic': ['k']}

    from_params = classmethod(_shape_from_params)

    def __init__(self, c, k, dx=0.0, dy=0.0):
        super().__init__(c=c, k=k, dx=dx, dy=dy)

    def sag(self, x, y):
        """Sag of the off-axis section, in the parent conic's frame."""
        p = self.params
        xs = x + p['dx']
        ys = y + p['dy']
        return conic_sag(p['c'], p['k'], xs * xs + ys * ys)

    def sag_and_normal(self, x, y):
        """Sag and normal of the off-axis section (parent frame)."""
        p = self.params
        return conic_sag_and_normal(p['c'], p['k'], x + p['dx'], y + p['dy'])

    def intersect(self, P, S, sag_and_normal=None, tol_sag=None, maxiter=None):
        """Closed-form off-axis conic intersection (parent frame)."""
        p = self.params
        return ray_conic_intersect(P, S, p['c'], p['k'],
                                   dx=p['dx'], dy=p['dy'])


class EvenAsphere(ConicSeedMixin, Shape):
    """Conic base plus even-order polynomial asphere."""

    SCALAR_DOFS = ('c', 'k')
    VECTOR_DOFS = ('coefs',)
    META_KEYS = ()
    CATEGORIES = {'curvature': ['c'], 'radius': ['c'], 'conic': ['k'],
                  'coefs': ['coefs']}

    from_params = classmethod(_shape_from_params)

    def __init__(self, c, k, coefs):
        super().__init__(c=c, k=k, coefs=tuple(coefs))

    def seed_conic(self):
        """Conic seed for Newton intersection."""
        return self.params['c'], self.params['k'], 0.0, 0.0

    def sag(self, x, y):
        """Even asphere sag."""
        p = self.params
        return even_asphere_sag(p['c'], p['k'], p['coefs'], x * x + y * y)

    def sag_and_normal(self, x, y):
        """Even asphere sag and normal."""
        p = self.params
        z = even_asphere_sag(p['c'], p['k'], p['coefs'], x * x + y * y)
        ddx, ddy = even_asphere_sag_der_xy(p['c'], p['k'], p['coefs'], x, y)
        return z, gradient_to_unit_normal(ddx, ddy)


class Q2D(ConicSeedMixin, Shape):
    """2D-Q (Forbes) freeform on a conic base."""

    SCALAR_DOFS = ('c', 'k')
    VECTOR_DOFS = ()
    META_KEYS = ('normalization_radius', 'cm0', 'ams', 'bms', 'dx', 'dy')
    CATEGORIES = {'curvature': ['c'], 'radius': ['c'], 'conic': ['k']}

    from_params = classmethod(_shape_from_params)

    def __init__(self, c, k, normalization_radius, cm0, ams, bms, dx=0.0, dy=0.0):
        super().__init__(c=c, k=k, normalization_radius=normalization_radius,
                         cm0=tuple(cm0), ams=tuple(map(tuple, ams)),
                         bms=tuple(map(tuple, bms)), dx=dx, dy=dy)

    def seed_conic(self):
        """Conic seed for Newton intersection."""
        p = self.params
        return p['c'], p['k'], p['dx'], p['dy']

    def sag(self, x, y):
        """Q2D freeform sag."""
        p = self.params
        return Q2d_sag(p['cm0'], p['ams'], p['bms'], x, y,
                       p['normalization_radius'], p['c'], p['k'],
                       dx=p['dx'], dy=p['dy'])

    def sag_and_normal(self, x, y):
        """Q2D freeform sag and normal."""
        p = self.params
        z, ddx, ddy = Q2d_and_der(p['cm0'], p['ams'], p['bms'], x, y,
                                  p['normalization_radius'], p['c'], p['k'],
                                  dx=p['dx'], dy=p['dy'])
        return z, gradient_to_unit_normal(ddx, ddy)


class Zernike(ConicSeedMixin, Shape):
    """Zernike freeform departure on a conic base."""

    SCALAR_DOFS = ('c', 'k')
    VECTOR_DOFS = ('coefs',)
    META_KEYS = ('normalization_radius', 'nms', 'norm')
    CATEGORIES = {'curvature': ['c'], 'radius': ['c'], 'conic': ['k'],
                  'coefs': ['coefs']}

    from_params = classmethod(_shape_from_params)

    def __init__(self, c, k, normalization_radius, nms, coefs, norm=True):
        super().__init__(c=c, k=k, normalization_radius=normalization_radius,
                         nms=tuple(map(tuple, nms)), coefs=tuple(coefs),
                         norm=norm)

    def seed_conic(self):
        """Conic seed for Newton intersection."""
        return self.params['c'], self.params['k'], 0.0, 0.0

    def sag(self, x, y):
        """Zernike freeform sag."""
        p = self.params
        R = p['normalization_radius']
        z_p = zernike_sum(p['coefs'], p['nms'], x / R, y / R, norm=p['norm'])
        return _add_conic_base_sag(p['c'], p['k'], x, y, z_p)

    def sag_and_normal(self, x, y):
        """Zernike freeform sag and normal."""
        p = self.params
        R = p['normalization_radius']
        z_p, ddx_p, ddy_p = zernike_sum_der_xy(p['coefs'], p['nms'],
                                               x / R, y / R, norm=p['norm'])
        ddx_p = ddx_p / R
        ddy_p = ddy_p / R
        z, ddx, ddy = _add_conic_base_derivatives(p['c'], p['k'], x, y,
                                                  z_p, ddx_p, ddy_p)
        return z, gradient_to_unit_normal(ddx, ddy)


class XY(ConicSeedMixin, Shape):
    """XY-polynomial freeform on a conic base."""

    SCALAR_DOFS = ('c', 'k')
    VECTOR_DOFS = ('coefs',)
    META_KEYS = ('normalization_radius', 'mns')
    CATEGORIES = {'curvature': ['c'], 'radius': ['c'], 'conic': ['k'],
                  'coefs': ['coefs']}

    from_params = classmethod(_shape_from_params)

    def __init__(self, c, k, normalization_radius, mns, coefs):
        super().__init__(c=c, k=k, normalization_radius=normalization_radius,
                         mns=tuple(map(tuple, mns)), coefs=tuple(coefs))

    def seed_conic(self):
        """Conic seed for Newton intersection."""
        return self.params['c'], self.params['k'], 0.0, 0.0

    def sag(self, x, y):
        """XY freeform sag."""
        p = self.params
        R = p['normalization_radius']
        z_p = xy_sum(p['coefs'], p['mns'], x / R, y / R)
        return _add_conic_base_sag(p['c'], p['k'], x, y, z_p)

    def sag_and_normal(self, x, y):
        """XY freeform sag and normal."""
        p = self.params
        R = p['normalization_radius']
        z_p, ddx_p, ddy_p = xy_sum_der_xy(p['coefs'], p['mns'], x / R, y / R)
        z, ddx, ddy = _add_conic_base_derivatives(p['c'], p['k'], x, y,
                                                  z_p, ddx_p / R, ddy_p / R)
        return z, gradient_to_unit_normal(ddx, ddy)


class Chebyshev(ConicSeedMixin, Shape):
    """Chebyshev-T tensor-product freeform on a conic base."""

    SCALAR_DOFS = ('c', 'k')
    VECTOR_DOFS = ('coefs',)
    META_KEYS = ('x_norm', 'y_norm', 'mns')
    CATEGORIES = {'curvature': ['c'], 'radius': ['c'], 'conic': ['k'],
                  'coefs': ['coefs']}

    from_params = classmethod(_shape_from_params)

    def __init__(self, c, k, x_norm, y_norm, mns, coefs):
        super().__init__(c=c, k=k, x_norm=x_norm, y_norm=y_norm,
                         mns=tuple(map(tuple, mns)), coefs=tuple(coefs))

    def seed_conic(self):
        """Conic seed for Newton intersection."""
        return self.params['c'], self.params['k'], 0.0, 0.0

    def sag(self, x, y):
        """Chebyshev freeform sag."""
        p = self.params
        z_p = cheby1_2d_sum(p['coefs'], p['mns'], x / p['x_norm'], y / p['y_norm'])
        return _add_conic_base_sag(p['c'], p['k'], x, y, z_p)

    def sag_and_normal(self, x, y):
        """Chebyshev freeform sag and normal."""
        p = self.params
        z_p, ddx_p, ddy_p = cheby1_2d_sum_der_xy(
            p['coefs'], p['mns'], x / p['x_norm'], y / p['y_norm'],
            x_norm=p['x_norm'], y_norm=p['y_norm'])
        z, ddx, ddy = _add_conic_base_derivatives(p['c'], p['k'], x, y,
                                                  z_p, ddx_p, ddy_p)
        return z, gradient_to_unit_normal(ddx, ddy)


class Jacobi(ConicSeedMixin, Shape):
    """Radial Jacobi polynomial freeform on a conic base."""

    SCALAR_DOFS = ('c', 'k')
    VECTOR_DOFS = ('coefs',)
    META_KEYS = ('normalization_radius', 'alpha', 'beta', 'ns')
    CATEGORIES = {'curvature': ['c'], 'radius': ['c'], 'conic': ['k'],
                  'coefs': ['coefs']}

    from_params = classmethod(_shape_from_params)

    def __init__(self, c, k, normalization_radius, alpha, beta, ns, coefs):
        super().__init__(c=c, k=k, normalization_radius=normalization_radius,
                         alpha=alpha, beta=beta, ns=tuple(ns),
                         coefs=tuple(coefs))

    def seed_conic(self):
        """Conic seed for Newton intersection."""
        return self.params['c'], self.params['k'], 0.0, 0.0

    def sag(self, x, y):
        """Jacobi freeform sag."""
        p = self.params
        z_p = jacobi_radial_sum(p['coefs'], p['ns'], p['alpha'], p['beta'],
                                x, y, p['normalization_radius'])
        return _add_conic_base_sag(p['c'], p['k'], x, y, z_p)

    def sag_and_normal(self, x, y):
        """Jacobi freeform sag and normal."""
        p = self.params
        z_p, ddx_p, ddy_p = jacobi_radial_sum_der_xy(
            p['coefs'], p['ns'], p['alpha'], p['beta'], x, y,
            p['normalization_radius'])
        z, ddx, ddy = _add_conic_base_derivatives(p['c'], p['k'], x, y,
                                                  z_p, ddx_p, ddy_p)
        return z, gradient_to_unit_normal(ddx, ddy)


class Toroid(ConicSeedMixin, Shape):
    """Toroid: circular x section, even-asphere y section."""

    SCALAR_DOFS = ('c_x', 'c_y', 'k_y')
    VECTOR_DOFS = ('coefs_y',)
    META_KEYS = ()
    CATEGORIES = {'curvature': ['c_x', 'c_y'],
                  'radius': ['c_x', 'c_y'],
                  'radius_x': ['c_x'], 'radius_y': ['c_y'],
                  'conic': ['k_y'],
                  'coefs': ['coefs_y']}

    from_params = classmethod(_shape_from_params)

    def __init__(self, c_x, c_y, k_y, coefs_y):
        coefs_y = tuple(coefs_y) if coefs_y is not None else ()
        super().__init__(c_x=c_x, c_y=c_y, k_y=k_y, coefs_y=coefs_y)

    def seed_conic(self):
        """Conic seed for Newton intersection."""
        p = self.params
        return 0.5 * (p['c_x'] + p['c_y']), 0.0, 0.0, 0.0

    def sag(self, x, y):
        """Toroidal sag."""
        p = self.params
        z_x = sphere_sag(p['c_x'], x * x)
        z_y = even_asphere_sag(p['c_y'], p['k_y'], p['coefs_y'], y * y)
        return z_x + z_y

    def sag_and_normal(self, x, y):
        """Toroidal sag and normal."""
        p = self.params
        xsq = x * x
        ysq = y * y
        phi_x = phi_conic(p['c_x'], 0.0, xsq)
        z_x = sphere_sag(p['c_x'], xsq, phi=phi_x)
        ddx = (p['c_x'] * x) / phi_x
        zero = jnp.zeros_like(y)
        z_y = even_asphere_sag(p['c_y'], p['k_y'], p['coefs_y'], ysq)
        _, ddy = even_asphere_sag_der_xy(p['c_y'], p['k_y'], p['coefs_y'],
                                         zero, y)
        return z_x + z_y, gradient_to_unit_normal(ddx, ddy)


class Biconic(ConicSeedMixin, Shape):
    """Biconic: independent curvatures/conics along x and y."""

    SCALAR_DOFS = ('c_x', 'c_y', 'k_x', 'k_y')
    VECTOR_DOFS = ()
    META_KEYS = ()
    CATEGORIES = {'curvature': ['c_x', 'c_y'],
                  'radius': ['c_x', 'c_y'],
                  'radius_x': ['c_x'], 'radius_y': ['c_y'],
                  'conic': ['k_x', 'k_y']}

    from_params = classmethod(_shape_from_params)

    def __init__(self, c_x, c_y, k_x, k_y):
        super().__init__(c_x=c_x, c_y=c_y, k_x=k_x, k_y=k_y)

    def seed_conic(self):
        """Conic seed for Newton intersection."""
        p = self.params
        return 0.5 * (p['c_x'] + p['c_y']), 0.5 * (p['k_x'] + p['k_y']), 0.0, 0.0

    def sag(self, x, y):
        """Biconic sag."""
        p = self.params
        xsq = x * x
        ysq = y * y
        phi = jnp.sqrt(1 - (1.0 + p['k_x']) * p['c_x'] ** 2 * xsq
                       - (1.0 + p['k_y']) * p['c_y'] ** 2 * ysq)
        return (p['c_x'] * xsq + p['c_y'] * ysq) / (1 + phi)

    def sag_and_normal(self, x, y):
        """Biconic sag and normal."""
        p = self.params
        c_x, c_y, kx, ky = p['c_x'], p['c_y'], p['k_x'], p['k_y']
        xsq = x * x
        ysq = y * y
        opkx = 1.0 + kx
        opky = 1.0 + ky
        phi = jnp.sqrt(1 - opkx * c_x * c_x * xsq - opky * c_y * c_y * ysq)
        opphi = 1 + phi
        num = c_x * xsq + c_y * ysq
        z = num / opphi
        two_phi_opphi = 2 * phi * opphi
        den = phi * opphi * opphi
        ddx = c_x * x * (two_phi_opphi + num * opkx * c_x) / den
        ddy = c_y * y * (two_phi_opphi + num * opky * c_y) / den
        return z, gradient_to_unit_normal(ddx, ddy)


class Interaction:
    """Result of one Surface.interact, including local intermediates."""

    __slots__ = ('P', 'S', 'n_post', 'opl', 'code',
                 'P0', 'S_loc', 'Q_loc', 'n_hat', 'Sprime', 'S_specular',
                 'grating_grad')

    def __init__(self, P, S, n_post, opl, code,
                 P0, S_loc, Q_loc, n_hat, Sprime, S_specular,
                 grating_grad=None):
        self.P = P
        self.S = S
        self.n_post = n_post
        self.opl = opl
        self.code = code
        self.P0 = P0
        self.S_loc = S_loc
        self.Q_loc = Q_loc
        self.n_hat = n_hat
        self.Sprime = Sprime
        self.S_specular = S_specular
        self.grating_grad = grating_grad


def _pose_is_device(*vals):
    """True when any pose ingredient is traced or device-resident."""
    for v in vals:
        if v is None:
            continue
        if isinstance(v, jax.core.Tracer) or isinstance(v, jax.Array):
            return True
    return False


def _host_pose(P, R, tilt, decenter, tilt_radians):
    """Promote/coerce/offset a surface pose entirely in host numpy.

    Differentiable construction (jax.jvp/vjp through decenter/tilt
    seeds) routes through the jnp twin instead — see the dispatch in
    Surface.__init__.
    """
    dt = onp.dtype(str(jnp.dtype(config.precision)))
    if not hasattr(P, '__iter__'):
        P = [0.0, 0.0, P]
    else:
        P = list(onp.asarray(P).ravel())
        if not 1 <= len(P) <= 3:
            raise ValueError('P must contain one to three coordinates')
        P = [0.0] * (3 - len(P)) + [float(v) for v in P]
    P = onp.asarray(P, dtype=dt)
    if type(R) in (list, tuple):
        R = make_rotation_matrix(R, host=True)
    elif R is not None:
        R = onp.asarray(R, dtype=dt)
    if decenter is not None:
        decenter = onp.asarray(decenter, dtype=dt)
        if decenter.shape != (3,):
            raise ValueError('decenter must be a length-3 vector, got '
                             f'shape {decenter.shape}')
        P = P + decenter
    if tilt is not None:
        R_tilt = make_rotation_matrix(tilt, radians=tilt_radians, host=True)
        R = R_tilt if R is None else R @ R_tilt
    return P, R


class Surface:
    """A posed optical surface with a shape and interaction mode."""

    _analytic_intersect = False

    def __init__(self, shape=None, interaction=None, pose=None, material=None,
                 aperture=None, grating=None, *, P=None, R=None, tilt=None,
                 decenter=None, tilt_radians=False, coating=None):
        """shape: Shape; interaction: 'reflect'/'refract'/'eval'/... or STYPE.

        pose: (P, R) or object with .P/.R; material required for refraction;
        aperture: None / float radius / clip callable / Aperture; grating:
        an OPLFunc phase modifier; coating: a coatings.Stack consumed by
        the physical-field tracer.
        """
        if shape is None:
            raise TypeError('Surface requires a shape')
        if interaction is None:
            raise TypeError('Surface requires an interaction')
        if pose is not None:
            try:
                P, R = pose
            except (TypeError, ValueError):
                P = pose.P
                R = pose.R
        if P is None:
            raise TypeError('Surface requires a pose or P')

        typ = _map_stype(interaction)
        # the pose is static metadata read by host planners (paraxial
        # walks, launch aiming, layout plots) and embedded as constants
        # by the trace kernel's jit — keep it in HOST numpy; device
        # residency would turn every host read into a relay fetch.  The
        # differentiable engines construct surfaces with TRACED pose
        # ingredients; those keep the jnp pipeline.
        if _pose_is_device(P, R, tilt, decenter):
            P = promote_3d_point(P, dtype=config.precision)
            R = coerce_3d_rotation(R)
            P, R = apply_tilt_decenter(P, R, tilt=tilt, decenter=decenter,
                                       tilt_radians=tilt_radians,
                                       dtype=config.precision)
        else:
            P, R = _host_pose(P, R, tilt, decenter, tilt_radians)
        if typ == STYPE_REFRACT and material is None:
            raise ValueError('refractive surfaces must have a material, not None')

        self.shape = shape
        self.typ = typ
        self.P = P
        self.R = R
        self.material = material
        self.aperture = aperture
        self.grating = grating
        self.coating = coating
        # views onto the shape object, re-exposed for trace consumers
        self.params = shape.params
        self.sag = shape.sag
        self.sag_and_normal = shape.sag_and_normal
        self._analytic_intersect = bool(getattr(shape, 'analytic_intersect',
                                                False))
        self._departure_band = None

    # validated attributes: setters coerce, getters return the stored model
    @property
    def aperture(self):
        """Surface aperture model."""
        return self._aperture_model

    @aperture.setter
    def aperture(self, value):
        self._aperture_model = as_aperture(value)

    @property
    def grating(self):
        """Optical-path modifier on this surface, or None."""
        return self._opl_modifier

    @grating.setter
    def grating(self, value):
        if not (value is None or isinstance(value, OPLFunc)):
            raise TypeError(
                'grating must be an OPLFunc (LinearGrating, CallableOPL) '
                f'or None; got {value!r}')
        self._opl_modifier = value

    def grating_opl(self, Q_loc, wavelength):
        """OPL added by the surface modifier at local intersection points.

        Q_loc: intersection points in the surface local frame, last axis
        xyz; returns the per-ray OPL contribution, shape Q_loc.shape[:-1]
        (reference surfaces.py:1389-1405).
        """
        return self.grating.opl(Q_loc[..., 0], Q_loc[..., 1], wavelength)

    def departure_band(self):
        """Conic-seed departure bounds for the first-root acceptance band.

        Returns a DepartureBand; an analytic shape or a surface with no
        characterizable conic domain yields DepartureBand.unbounded().
        Cached when the bounds evaluate to concrete floats; recomputed per
        trace when shape parameters are tracers (reference
        surfaces.py:1262-1268).
        """
        if self._departure_band is not None:
            return self._departure_band
        band = self._compute_departure_band()
        cacheable = not band.bounded or all(
            isinstance(v, float) for v in
            (band.max_departure, band.domain_radius,
             band.gradient_bound, band.lipschitz))
        if cacheable:
            self._departure_band = band
        return band

    def _compute_departure_band(self):
        """Characterize sag departure from the seed conic over the domain.

        Twin of reference surfaces.py:1270-1339, pure jnp under
        stop_gradient: the band is a certificate, not physics, so it must
        not leak gradients into the trace.
        """
        shape = self.shape
        if not hasattr(shape, 'seed_conic'):
            return DepartureBand.unbounded()
        c, k, dx, dy = shape.seed_conic()
        # characterize only a physical clip or the shape's intrinsic domain;
        # drawn extent is cosmetic and must never change intersection physics
        ap = self.aperture
        R = ap.limiting_radius()
        if R is None:
            p = shape.params or {}
            R = p.get('normalization_radius')
            if R is None and 'x_norm' in p:
                R = max(p['x_norm'], p['y_norm'])
        if R is None:
            ck = _concrete_float(c)
            kk = _concrete_float(k)
            if ck is not None and kk is not None:
                ckk = (1.0 + kk) * ck * ck
                if ckk > 0.0:
                    # stay just inside the seed conic's finite sag domain
                    R = 0.999 / ckk ** 0.5
        Rf = _concrete_float(R)
        if R is None or (Rf is not None and not (0.0 < Rf < float('inf'))):
            return DepartureBand.unbounded()
        c = lax.stop_gradient(c)
        k = lax.stop_gradient(k)
        dx = lax.stop_gradient(dx)
        dy = lax.stop_gradient(dy)
        R = lax.stop_gradient(jnp.asarray(R, dtype=config.precision))
        n = DEPARTURE_BAND_SAMPLES
        xs = jnp.linspace(-R, R, n, dtype=config.precision)
        X, Y = jnp.meshgrid(xs, xs)
        inside = X * X + Y * Y <= R * R
        Xs = X + dx
        Ys = Y + dy
        dep = shape.sag(X, Y) - conic_sag(c, k, Xs * Xs + Ys * Ys)
        # analytic departure gradient = grad(sag) - grad(seed conic), each
        # read straight from the unit normal (grad = (-n_x, -n_y) / n_z),
        # evaluated to the rim where the departure slope peaks — an FD
        # stencil would drop the rim ring and bias the bound low
        _, n_sag = shape.sag_and_normal(X, Y)
        _, n_con = conic_sag_and_normal(c, k, Xs, Ys)
        gx = n_con[..., 0] / n_con[..., 2] - n_sag[..., 0] / n_sag[..., 2]
        gy = n_con[..., 1] / n_con[..., 2] - n_sag[..., 1] / n_sag[..., 2]
        gmag_dep = jnp.hypot(gx, gy)
        dep = jnp.where(inside, dep, jnp.nan)
        gmag_dep = jnp.where(inside, gmag_dep, jnp.nan)
        finite_any = _concrete_float(jnp.isfinite(dep).any())
        if finite_any is not None and not finite_any:
            return DepartureBand.unbounded()
        D = lax.stop_gradient(jnp.nanmax(jnp.abs(dep)))
        # departure slope bound for the monotonicity certificate
        G = lax.stop_gradient(jnp.nanmax(gmag_dep))
        # sag slope bound for the Lipschitz rescue, over the enlarged disk
        R_march = MARCH_RADIUS_MARGIN * R
        xm = jnp.linspace(-R_march, R_march, n, dtype=config.precision)
        Xm, Ym = jnp.meshgrid(xm, xm)
        _, nrm = shape.sag_and_normal(Xm, Ym)
        gmag = jnp.hypot(nrm[..., 0], nrm[..., 1]) / jnp.abs(nrm[..., 2])
        gmag = jnp.where(Xm * Xm + Ym * Ym <= R_march * R_march,
                         gmag, jnp.nan)
        L = lax.stop_gradient(jnp.nanmax(gmag))
        Gf = _concrete_float(G)
        if Gf is not None and Gf >= DEPARTURE_GRADIENT_WARN:
            # static message: surfaces are recompiled every edit
            # (optimization / tolerancing rebuilds them), so a value-
            # templated warning would defeat once-per-location dedup
            warnings.warn(
                'a surface departs from its conic seed steeply enough that '
                'the intersection acceptance band can admit multiple ray '
                'crossings; the traced intersection on such a surface may '
                'be ambiguous.')

        def _scalar(v):
            f = _concrete_float(v)
            return f if f is not None else v

        return DepartureBand(bounded=True,
                             max_departure=_scalar(1.1 * D),
                             domain_radius=_scalar(R),
                             gradient_bound=_scalar(1.1 * G),
                             lipschitz=_scalar(1.1 * L))

    def interact(self, P_in, S_in, n_pre, wvl, tol_sag=None,
                 first_segment=False):
        """March one bundle through this surface: intersect, clip, bend.

        Returns an Interaction with global outgoing position/direction,
        following index, signed-segment OPL, and per-ray status codes.
        """
        P0, S_loc = transform_to_local_coords(P_in, self.P, S_in, self.R)
        forward_only = not _is_measurement_surf(self.typ) and not first_segment
        Q_loc, n_hat, converged = self.intersect(P0, S_loc, tol_sag=tol_sag,
                                                 forward_only=forward_only)

        miss = STATUS_MISS if self._analytic_intersect else STATUS_NEWTON
        code = jnp.where(converged, STATUS_OK, miss).astype(jnp.int32)

        if self.aperture.clip is not None:
            inside = self.aperture.clips(Q_loc[..., 0], Q_loc[..., 1])
            code = jnp.where(converged & ~inside, STATUS_CLIP, code)

        if self.typ == STYPE_REFLECT:
            Sprime = reflect(S_loc, n_hat)
            n_post = n_pre
        elif self.typ == STYPE_REFRACT:
            n_post = self.material.n(wvl)
            Sprime, tir = refract_with_tir(n_pre, n_post, S_loc, n_hat)
            code = jnp.where((code == STATUS_OK) & tir & converged,
                             STATUS_TIR, code)
        else:
            Sprime = S_loc
            n_post = n_pre

        S_specular = Sprime
        opl_grating = None
        grating_grad = None
        if (self.grating is not None
                and self.typ in (STYPE_REFLECT, STYPE_REFRACT)):
            # one OPL evaluation feeds the bend, path term, and AD capture
            opl_func, gx, gy = self.grating.opl_and_gradient(
                Q_loc[..., 0], Q_loc[..., 1], wvl)
            grating_grad = (gx, gy)
            Sprime, valid_diff = self.diffract(
                Sprime, n_hat, n_post, Q_loc, wvl, grad=grating_grad)
            code = jnp.where((code == STATUS_OK) & ~valid_diff,
                             STATUS_EVANESCENT, code)
            opl_grating = opl_func

        P_out, S_out = transform_to_global_coords(Q_loc, self.P, Sprime, self.R)

        seg = P_out - P_in
        # seg is collinear with the unit S_in by construction (the bend
        # happens after the intersection), so the signed length is just
        # seg . S_in — identical to sign(seg.S)*|seg| but smooth at zero
        # length, where the norm form would poison reverse-mode with 0/0
        opl = n_pre * jnp.sum(seg * S_in, axis=-1)
        if opl_grating is not None:
            opl = opl + opl_grating
        return Interaction(P_out, S_out, n_post, opl, code,
                           P0, S_loc, Q_loc, n_hat, Sprime, S_specular,
                           grating_grad=grating_grad)

    def diffract(self, S_specular, n_hat, n_post, Q_loc, wavelength,
                 grad=None):
        """Tangential momentum kick from the surface OPL function.

        Returns (S_out, valid); evanescent orders keep the specular
        direction and are masked invalid.  Branch-free masked jnp.
        """
        if self.grating is None:
            return S_specular, jnp.ones(S_specular.shape[:-1], dtype=bool)
        if grad is None:
            _, gx, gy = self.grating.opl_and_gradient(
                Q_loc[..., 0], Q_loc[..., 1], wavelength)
        else:
            gx, gy = grad
        return _diffract_kernel(S_specular, n_hat, gx, gy, n_post)

    def intersect(self, P, S, tol_sag=None, maxiter=None, forward_only=False):
        """Intersect rays with the surface shape -> (Q, n, valid).

        Conic-seeded shapes are policed by the departure band: the Newton
        root must land inside the seed-relative acceptance band, with the
        monotonicity certificate deciding which rays need the Lipschitz
        first-root rescue (reference surfaces.py:1486-1531).
        """
        if hasattr(self.shape, 'seed_conic'):
            band = self.departure_band()
            return self.shape.intersect(P, S, self.sag_and_normal,
                                        tol_sag=tol_sag, maxiter=maxiter,
                                        departure=band.max_departure,
                                        domain_radius=band.domain_radius,
                                        departure_gradient=band.gradient_bound,
                                        sag_lipschitz=band.lipschitz,
                                        forward_only=forward_only)
        if hasattr(self.shape, 'intersect'):
            return self.shape.intersect(P, S, self.sag_and_normal,
                                        tol_sag=tol_sag, maxiter=maxiter)
        if maxiter is None:
            maxiter = SURFACE_INTERSECTION_DEFAULT_MAXITER
        return newton_intersect(P, S, self.sag_and_normal, tol_sag=tol_sag,
                                maxiter=maxiter)


__all__ = [
    'STYPE_REFLECT', 'STYPE_REFRACT', 'STYPE_EVAL', 'STYPE_OBJ', 'STYPE_IMG',
    'Shape', 'CallableShape', 'Plane', 'Sphere', 'Conic', 'OffAxisConic',
    'EvenAsphere', 'Q2D', 'Zernike', 'XY', 'Chebyshev', 'Jacobi', 'Toroid',
    'Biconic', 'Surface', 'Interaction', 'DepartureBand',
    'DEPARTURE_BAND_SAMPLES', 'DEPARTURE_GRADIENT_WARN',
    'circular_aperture', 'annular_aperture',
    'product_rule', 'phi_conic', 'sphere_sag', 'sphere_sag_der',
    'conic_sag', 'conic_sag_der', 'even_asphere_sag',
    'even_asphere_sag_der_xy', 'Q2d_and_der', 'Q2d_sag',
    'ray_plane_intersect', 'ray_sphere_intersect', 'ray_conic_intersect',
]
