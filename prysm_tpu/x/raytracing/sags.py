"""Sag functions and analytic surface normals for raytracing.

Rebuild of ``prysm/x/raytracing/sags.py``.  All sags are pure jnp
expressions; the polynomial freeform families reuse the package's
Clenshaw/derivative machinery (zernike_sum_der_xy etc.) so sag and gradient
come from one pass.  For shapes without hand-derived normals,
``autodiff_sag_and_normal`` derives them with ``jax.grad``.
"""
import jax
import jax.numpy as jnp

from ...polynomials import (
    compute_z_Q2d,
    compute_z_zprime_Q2d,
)


def product_rule(u, v, du, dv):
    """d(uv) = u dv + v du."""
    return u * dv + v * du


def gradient_to_unit_normal(Fx, Fy):
    """Unit surface normal from sag partial derivatives (dz/dx, dz/dy).

    F(x, y, z) = z - sag(x, y); grad F = (-Fx, -Fy, 1), normalized.
    """
    norm = jnp.sqrt(Fx * Fx + Fy * Fy + 1.0)
    inv = 1.0 / norm
    return jnp.stack([-Fx * inv, -Fy * inv, inv], axis=-1)


def plane_sag_and_normal(x, y):
    """Sag (0) and normal (+z) of a plane."""
    z = jnp.zeros(jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y)),
                  dtype=jnp.result_type(x, y))
    n = jnp.zeros((*z.shape, 3), dtype=z.dtype).at[..., 2].set(1.0)
    return z, n


def phi_conic(c, k, rhosq):
    """sqrt(1 - (1+k) c^2 rho^2), the conic sag denominator root."""
    csq = c * c
    return jnp.sqrt(1 - (1 + k) * csq * rhosq)


def sphere_sag(c, rhosq, phi=None):
    """Sag of a sphere of curvature c."""
    if phi is None:
        phi = phi_conic(c, 0.0, rhosq)
    return (c * rhosq) / (1 + phi)


def sphere_sag_der(c, rho, phi=None):
    """d(sag)/d(rho) for a sphere."""
    if phi is None:
        phi = phi_conic(c, 0.0, rho * rho)
    return (c * rho) / phi


def conic_sag(c, kappa, rhosq, phi=None):
    """Sag of a conicoid of curvature c and conic constant kappa."""
    if phi is None:
        phi = phi_conic(c, kappa, rhosq)
    return (c * rhosq) / (1 + phi)


def conic_sag_der(c, kappa, rho, phi=None):
    """d(sag)/d(rho) for a conicoid."""
    if phi is None:
        phi = phi_conic(c, kappa, rho * rho)
    return (c * rho) / phi


def conic_sag_der_xy(c, kappa, x, y, phi=None):
    """(dz/dx, dz/dy) for a conicoid."""
    if phi is None:
        phi = phi_conic(c, kappa, x * x + y * y)
    coef = c / phi
    return coef * x, coef * y


def conic_sag_and_normal(c, kappa, X, Y):
    """Sag and unit normal of a conicoid at (X, Y)."""
    rhosq = X * X + Y * Y
    phi = phi_conic(c, kappa, rhosq)
    z = (c * rhosq) / (1 + phi)
    coef = c / phi
    return z, gradient_to_unit_normal(coef * X, coef * Y)


def even_asphere_sag(c, kappa, coefs, rsq):
    """Conic base + even-power polynomial: sum coefs[i] r^(4+2i) over r^2."""
    z = conic_sag(c, kappa, rsq)
    if len(coefs) == 0:
        return z
    # Horner evaluation over rsq, starting at r^4
    acc = 0.0
    for a in reversed(coefs):
        acc = acc * rsq + a
    return z + acc * rsq * rsq


def even_asphere_sag_der_xy(c, kappa, coefs, x, y, phi=None):
    """(dz/dx, dz/dy) for an even asphere."""
    rsq = x * x + y * y
    ddx_c, ddy_c = conic_sag_der_xy(c, kappa, x, y, phi=phi)
    if len(coefs) == 0:
        return ddx_c, ddy_c
    # d/drsq of sum a_i rsq^(2+i) = sum a_i (2+i) rsq^(1+i)
    acc = 0.0
    for i, a in reversed(list(enumerate(coefs))):
        acc = acc * rsq + a * (2 + i)
    dpoly_drsq = acc * rsq
    return ddx_c + 2 * x * dpoly_drsq, ddy_c + 2 * y * dpoly_drsq


def _conic_base_xy_sag(c, kappa, x, y):
    """Conic sag on cartesian inputs."""
    return conic_sag(c, kappa, x * x + y * y)


def _statically_zero(c):
    """True only for a concrete scalar zero; traced values keep the
    general path so curvature stays a usable jit/grad design variable."""
    try:
        return bool(c == 0)
    except Exception:
        return False


def _add_conic_base_sag(c, kappa, x, y, z_p):
    """Add the conic base to a polynomial departure sag."""
    if _statically_zero(c):
        return z_p
    return z_p + _conic_base_xy_sag(c, kappa, x, y)


def _add_conic_base_derivatives(c, kappa, x, y, z_p, ddx_p, ddy_p):
    """Add conic base sag + derivatives to polynomial departures."""
    if _statically_zero(c):
        return z_p, ddx_p, ddy_p
    rhosq = x * x + y * y
    phi = phi_conic(c, kappa, rhosq)
    z = conic_sag(c, kappa, rhosq, phi=phi)
    ddx, ddy = conic_sag_der_xy(c, kappa, x, y, phi=phi)
    return z_p + z, ddx_p + ddx, ddy_p + ddy


def Q2d_sag(cm0, ams, bms, x, y, normalization_radius, c, k, dx=0, dy=0):
    """Sag of a 2D-Q freeform on a conic base."""
    xs = x + dx
    ys = y + dy
    r = jnp.hypot(xs, ys) / normalization_radius
    t = jnp.arctan2(ys, xs)
    z_p = compute_z_Q2d(cm0, ams, bms, r, t)
    return _add_conic_base_sag(c, k, xs, ys, z_p)


def Q2d_and_der(cm0, ams, bms, x, y, normalization_radius, c, k, dx=0, dy=0):
    """Sag and cartesian derivatives of a 2D-Q freeform on a conic base."""
    xs = x + dx
    ys = y + dy
    R = normalization_radius
    r = jnp.hypot(xs, ys)
    t = jnp.arctan2(ys, xs)
    u = r / R
    z_p, dr, dt = compute_z_zprime_Q2d(cm0, ams, bms, u, t)
    # chain rule polar -> cartesian; dr is d/du so scale by 1/R
    r_safe = jnp.where(r == 0, 1.0, r)
    cost = xs / r_safe
    sint = ys / r_safe
    ddx_p = dr / R * cost - dt * sint / r_safe
    ddy_p = dr / R * sint + dt * cost / r_safe
    ddx_p = jnp.where(r == 0, 0.0, ddx_p)
    ddy_p = jnp.where(r == 0, 0.0, ddy_p)
    return _add_conic_base_derivatives(c, k, xs, ys, z_p, ddx_p, ddy_p)


def fd_step(finite_difference_step, *arrs):
    """Default finite-difference step from the dtype of the arrays."""
    if finite_difference_step is not None:
        return finite_difference_step
    dtype = jnp.result_type(*arrs)
    return float(jnp.finfo(dtype).eps) ** (1 / 3)


def autodiff_sag_and_normal(sag):
    """Build sag_and_normal from a scalar sag(x, y) via jax autodiff.

    The returned callable evaluates the sag and its gradient in one vmapped
    value_and_grad pass; this is the generic path for CallableShape.
    """
    vag = jax.vmap(jax.value_and_grad(sag, argnums=(0, 1)))

    def sag_and_normal(x, y):
        shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y))
        xf = jnp.broadcast_to(x, shape).ravel()
        yf = jnp.broadcast_to(y, shape).ravel()
        z, (Fx, Fy) = vag(xf, yf)
        n = gradient_to_unit_normal(Fx, Fy)
        return z.reshape(shape), n.reshape((*shape, 3))

    return sag_and_normal


# ---------- derivative helpers (reference: x/raytracing/sags.py:76-420) -----
#
# Unit-level twins of the reference's hand-derived sag differentials; the
# Hessian and parameter partials are one jax.jvp sweep of the closed-form
# sag gradient, so they stay exact for any (c, kappa) without rederiving.

def der_direction_cosine_conic(c, k, rho, rhosq=None, phi=None):
    """d/drho of (1 / phi), phi = sqrt(1 - (1+k) c^2 rho^2).

    The product-rule term for Q-type aspheres whose polynomial part is
    divided by the conic denominator root.
    """
    if rhosq is None:
        rhosq = rho * rho
    if phi is None:
        phi = phi_conic(c, k, rhosq)
    return (1.0 + k) * c * c * rho / (phi * phi * phi)


def conic_sag_hessian(c, kappa, x, y, phi=None):
    """Cartesian second derivatives (sag_xx, sag_xy, sag_yy) of a conic.

    Forward-mode derivatives of the closed-form gradient: smooth in
    (x, y) with no 1/r singularity; reduces to the sphere Hessian at
    kappa = 0.
    """
    x = jnp.asarray(x, dtype=float)
    y = jnp.asarray(y, dtype=float)

    def grad(xv, yv):
        return conic_sag_der_xy(c, kappa, xv, yv)

    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x)
    _, (sag_xx, sag_xy) = jax.jvp(grad, (x, y), (ones, zeros))
    _, (_, sag_yy) = jax.jvp(grad, (x, y), (zeros, ones))
    return sag_xx, sag_xy, sag_yy


def conic_sag_param_partials(c, kappa, x, y, name, phi=None):
    """(sag_t, gx_t, gy_t): partials of sag and gradient wrt 'c' or 'k'.

    The explicit parameter channel of the differential ray trace's
    intersection tangent, at fixed (x, y).
    """
    if name not in ('c', 'k'):
        raise ValueError(f"name must be 'c' or 'k', got {name!r}")
    x = jnp.asarray(x, dtype=float)
    y = jnp.asarray(y, dtype=float)
    rhosq = x * x + y * y

    def f(cv, kv):
        ph = phi_conic(cv, kv, rhosq)
        z = conic_sag(cv, kv, rhosq, phi=ph)
        gx, gy = conic_sag_der_xy(cv, kv, x, y, phi=ph)
        return z, gx, gy

    tangent = ((1.0, 0.0) if name == 'c' else (0.0, 1.0))
    _, (sag_t, gx_t, gy_t) = jax.jvp(
        f, (jnp.asarray(float(c)), jnp.asarray(float(kappa))),
        tuple(jnp.asarray(t) for t in tangent))
    return sag_t, gx_t, gy_t


def zernike_irregularity_partials(n, m, x, y, normalization_radius,
                                  norm=True):
    """Amplitude partials of one Zernike surface-irregularity term.

    For delta z = a * Z_n^m(x / R, y / R):
    d(sag)/da = Z_n^m, d(dz/dx)/da = (1/R) dZ/dx, d(dz/dy)/da = (1/R) dZ/dy.
    With norm=True unit amplitude is unit RMS over the disk of radius R.
    """
    from ...polynomials.zernike import zernike_sum, zernike_nm_der_xy

    R = float(normalization_radius)
    xn = jnp.asarray(x, dtype=float) / R
    yn = jnp.asarray(y, dtype=float) / R
    sag = zernike_sum([1.0], [(n, m)], xn, yn, norm=norm)
    dzdx, dzdy = zernike_nm_der_xy(n, m, xn, yn, norm=norm)
    return sag, dzdx / R, dzdy / R
