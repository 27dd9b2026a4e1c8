"""Ray/surface intersection helpers for sequential raytracing.

Rebuild of ``prysm/x/raytracing/intersections.py``: analytic plane/sphere/
conic intersections (Welford's rationalized quadratic) and the conic-seeded
Newton path for polynomial shapes.  Everything is branch-free masked jnp,
so intersections jit, vmap, and differentiate.

The reference's Lipschitz-march rescue for pathological freeforms is not
reproduced; the conic seed plus masked Newton covers the practical design
space, and rays that fail simply report non-convergence.
"""
import jax.numpy as jnp

from .spencer_and_murty import (
    DEFAULT_TOL_SAG,  # NOQA - re-export
    SURFACE_INTERSECTION_DEFAULT_MAXITER,
    intersect as newton_intersect,
    newton_raphson_solve_s,
    resolve_tol_sag,  # NOQA - re-export
)
from .sags import conic_sag_and_normal

MARCH_RADIUS_MARGIN = 1.1


def _statically_zero(c):
    """True only when c is a concrete Python/numpy scalar equal to zero.

    Traced values (jit/grad parameters) return False, keeping the analytic
    conic path instead of a TracerBoolConversionError — curvature is a
    design variable, so this branch must survive tracing.
    """
    try:
        return bool(c == 0.0)
    except Exception:
        return False


def ray_plane_intersect(P, S):
    """Intersect rays P + t S with the local plane Z = 0 -> (Q, n, valid)."""
    P = jnp.atleast_2d(P)
    S = jnp.atleast_2d(S)
    Sz = S[..., 2]
    t = -P[..., 2] / Sz
    Q = P + t[..., None] * S
    n = jnp.zeros(Q.shape, dtype=Q.dtype).at[..., 2].set(1.0)
    return Q, n, (Sz != 0)


def _conic_quadratic_t(c, kappa, P1, S, dx, dy):
    """Vertex-side root of the conic quadratic (Welford's form)."""
    Sx = S[..., 0]
    Sy = S[..., 1]
    Sz = S[..., 2]
    Xp = P1[..., 0] + dx
    Yp = P1[..., 1] + dy
    A_ = 1.0 + kappa * Sz * Sz
    B_ = Xp * Sx + Yp * Sy - Sz / c
    C_ = Xp * Xp + Yp * Yp
    disc = B_ * B_ - A_ * C_
    disc_nonneg = disc >= 0
    sqrt_disc = jnp.sqrt(jnp.where(disc_nonneg, disc, 0.0))
    sign_c = jnp.where(jnp.asarray(c) > 0, 1.0, -1.0)
    z_dir = jnp.where(Sz < 0, -1.0, 1.0)
    denom = z_dir * sign_c * sqrt_disc - B_
    vertex_tangent = denom == 0
    t = C_ / jnp.where(vertex_tangent, 1.0, denom)
    t = jnp.where(vertex_tangent, 0.0, t)
    return t, disc_nonneg


def ray_conic_intersect(P, S, c, kappa, dx=0.0, dy=0.0):
    """Intersect rays with a (possibly off-axis) conicoid -> (Q, n, valid)."""
    if _statically_zero(c):
        return ray_plane_intersect(P, S)
    P = jnp.atleast_2d(P)
    S = jnp.atleast_2d(S)
    Sz = S[..., 2]
    s0 = -P[..., 2] / Sz
    P1 = P + s0[..., None] * S
    t, disc_nonneg = _conic_quadratic_t(c, kappa, P1, S, dx, dy)
    Q = P1 + t[..., None] * S
    Xq = Q[..., 0] + dx
    Yq = Q[..., 1] + dy
    phi_arg = 1.0 - (1.0 + kappa) * c * c * (Xq * Xq + Yq * Yq)
    _, n = conic_sag_and_normal(c, kappa, Xq, Yq)
    return Q, n, disc_nonneg & (phi_arg >= 0)


def ray_sphere_intersect(P, S, c):
    """Intersect rays with a sphere of curvature c -> (Q, n, valid)."""
    return ray_conic_intersect(P, S, c, 0.0)


class ConicSeedMixin:
    """Newton intersection seeded by the analytic root of a conic fit.

    The shape supplies seed_conic() -> (c, k, dx, dy); the conic root seeds
    the Newton iteration on the full sag, cutting iterations to a handful
    for realistic departures.
    """

    def seed_conic(self):
        """(c, k, dx, dy) of the conic approximant; override per shape."""
        p = getattr(self, 'params', {}) or {}
        return p.get('c', 0.0), p.get('k', 0.0), 0.0, 0.0

    def intersect(self, P, S, sag_and_normal, tol_sag=None, maxiter=None,
                  forward_only=False, **_ignored):
        """Conic-seeded Newton intersection -> (Q, n, valid)."""
        if maxiter is None:
            maxiter = SURFACE_INTERSECTION_DEFAULT_MAXITER
        P = jnp.atleast_2d(P)
        S = jnp.atleast_2d(S)
        c, k, dx, dy = self.seed_conic()
        Sz = S[..., 2]
        s0 = -P[..., 2] / Sz
        P1 = P + s0[..., None] * S
        if _statically_zero(c):
            seed = jnp.zeros_like(s0)
            seed_ok = jnp.ones_like(s0, dtype=bool)
        else:
            seed, seed_ok = _conic_quadratic_t(c, k, P1, S, dx, dy)
            seed = jnp.where(seed_ok, seed, 0.0)
        Q, n, valid = newton_raphson_solve_s(P1, S, sag_and_normal, s1=seed,
                                             tol_sag=tol_sag, maxiter=maxiter)
        if forward_only:
            # reject roots behind the incoming ray origin: total march
            # s0 + s must move the ray forward along S
            s_total = (Q - P)[..., 2] / Sz
            valid = valid & (s_total >= 0)
            Q = jnp.where(valid[..., None], Q, jnp.nan)
            n = jnp.where(valid[..., None], n, jnp.nan)
        return Q, n, valid
