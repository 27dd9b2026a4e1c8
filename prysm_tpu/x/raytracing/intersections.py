"""Ray/surface intersection helpers for sequential raytracing.

Rebuild of ``prysm/x/raytracing/intersections.py``: analytic plane/sphere/
conic intersections (Welford's rationalized quadratic), the conic-seeded
Newton path for polynomial shapes, and the departure-band first-root
machinery — the monotonicity certificate plus the Lipschitz-march rescue
(reference ``intersections.py:160-477``).  Everything is branch-free masked
jnp, so intersections jit, vmap, and differentiate; the reference's
shrinking-active-set march (``intersections.py:222-272``) becomes a
fixed-shape ``lax.while_loop`` whose lanes freeze on convergence, and the
value-dependent "any rays need rescue?" gates become masks.
"""
import jax.numpy as jnp
from jax import lax

from ...mathops import row_dot
from .spencer_and_murty import (
    DEFAULT_TOL_SAG,  # NOQA - re-export
    SURFACE_INTERSECTION_DEFAULT_MAXITER,
    intersect as newton_intersect,
    newton_raphson_solve_s,
    resolve_tol_sag,  # NOQA - re-export
)
from .sags import conic_sag_and_normal

MARCH_RADIUS_MARGIN = 1.1
# floor on |cos(incidence)| used to widen the acceptance band at grazing
# incidence (reference intersections.py:15)
COS_INCIDENCE_FLOOR = 1e-3
# margin on the monotonicity certificate (reference intersections.py:18)
CERTIFICATE_MARGIN = 1e-3
# cap on Lipschitz-march steps before a ray is rejected (reference :162)
LIPSCHITZ_MARCH_MAXSTEPS = 256
# switch from Lipschitz descent to local Newton near the first root (:164)
NEWTON_SWITCH_FRACTION = 1e-2


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


def _conic_quadratic_coeffs(c, kappa, P1, S, dx, dy):
    """(A, B, C) of the conic quadratic in Welford's rationalized form.

    Shared by the vertex-side root (reference ``intersections.py:50-60``
    covers the same physics) and the closest-approach rescue band for
    seed-miss rays.  Assembled component-wise: a trailing-axis reduction
    over the xy pair lowers to real reduce ops that break elementwise
    fusion on TPU (measured: 6 extra reduces cost ~15% of the whole
    doublet trace, the r4->r5 bench regression).
    """
    Sz = S[..., 2]
    px = P1[..., 0] + dx
    py = P1[..., 1] + dy
    A_ = 1.0 + kappa * Sz * Sz
    B_ = px * S[..., 0] + py * S[..., 1] - Sz / c
    C_ = px * px + py * py
    return A_, B_, C_


def _conic_quadratic_t(c, kappa, P1, S, dx, dy):
    """Vertex-side root of the conic quadratic (Welford's form)."""
    Sz = S[..., 2]
    A_, B_, C_ = _conic_quadratic_coeffs(c, kappa, P1, S, dx, dy)
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


def _domain_corridor(P1, S, s_lo, s_hi, domain_radius):
    """Clip each ray's band to where its transverse radius stays <= R.

    Branch-free twin of reference ``intersections.py:169-197``; rays that
    never enter the disk return with lo > hi.
    """
    Sx = S[..., 0]
    Sy = S[..., 1]
    Px = P1[..., 0]
    Py = P1[..., 1]
    a = Sx * Sx + Sy * Sy
    b = Px * Sx + Py * Sy
    c = Px * Px + Py * Py - domain_radius * domain_radius
    lo = jnp.broadcast_to(jnp.asarray(s_lo, dtype=P1.dtype), a.shape)
    hi = jnp.broadcast_to(jnp.asarray(s_hi, dtype=P1.dtype), a.shape)
    disc = b * b - a * c
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(a > 0, a, 1.0)
    s_a = (-b - sqrt_disc) / a_safe
    s_b = (-b + sqrt_disc) / a_safe
    swept = a > 0
    real = swept & (disc >= 0)
    lo = jnp.where(real, jnp.maximum(lo, s_a), lo)
    hi = jnp.where(real, jnp.minimum(hi, s_b), hi)
    # swept miss, or axial ray outside the disk: empty corridor
    empty = (swept & ~real) | (~swept & (c > 0))
    hi = jnp.where(empty, lo - 1.0, hi)
    return lo, hi


def _lipschitz_march_solve_s(sag_and_normal, P1, S, s_lo, s_hi,
                             sag_lipschitz, tol_sag, maxiter,
                             domain_radius=None, active=None):
    """First-root solve by Lipschitz (sphere-tracing) descent from the floor.

    Steps abs(F) / Lip from s_lo and switches to local Newton near the root
    (reference ``intersections.py:200-272``).  The reference compacts a
    shrinking active set with fancy indexing; here every lane stays resident
    and freezes on convergence/exhaustion inside a ``lax.while_loop`` that
    exits when no lane is live — fixed shapes, jit/vmap-safe.

    ``active`` masks lanes that should march at all (the rescue subset);
    inactive lanes return invalid without evaluating anything.  Gradients
    flow through one differentiable Newton polish step at the accepted root
    (implicit-function style, matching ``newton_raphson_solve_s``).
    """
    dtype = P1.dtype
    if domain_radius is not None:
        s_lo, s_hi = _domain_corridor(P1, S, s_lo, s_hi,
                                      MARCH_RADIUS_MARGIN * domain_radius)
    else:
        shape = P1.shape[:-1]
        s_lo = jnp.broadcast_to(jnp.asarray(s_lo, dtype=dtype), shape)
        s_hi = jnp.broadcast_to(jnp.asarray(s_hi, dtype=dtype), shape)

    Sz = S[..., 2]
    S_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - Sz * Sz))
    Lip = jnp.abs(Sz) + sag_lipschitz * S_t
    # Lip == 0 only for an in-plane ray over locally flat sag
    Lip = jnp.where(Lip > 0.0, Lip, 1.0)

    live0 = s_lo <= s_hi
    if active is not None:
        live0 = live0 & active

    P1_d = lax.stop_gradient(P1)
    S_d = lax.stop_gradient(S)
    lo_d = lax.stop_gradient(s_lo)
    hi_d = lax.stop_gradient(s_hi)
    Lip_d = lax.stop_gradient(Lip)

    def cond(carry):
        i, s, live, conv = carry
        return (i < maxiter) & live.any()

    def body(carry):
        i, s, live, conv = carry
        Pj = P1_d + s[..., None] * S_d
        sagj, n_hat = sag_and_normal(Pj[..., 0], Pj[..., 1])
        Fj = Pj[..., 2] - sagj
        newly = live & (jnp.abs(Fj) < tol_sag)
        conv = conv | newly
        step_lip = jnp.abs(Fj) / Lip_d
        Fp = row_dot(S_d, n_hat) / n_hat[..., 2]
        Fp_safe = jnp.where(jnp.abs(Fp) > 0, Fp, 1.0)
        step_newton = -Fj / Fp_safe
        # switch to Newton only near the root and away from tangency
        near = (jnp.isfinite(step_newton)
                & (jnp.abs(Fp) > COS_INCIDENCE_FLOOR)
                & (step_lip < NEWTON_SWITCH_FRACTION * (1.0 + jnp.abs(s))))
        s_new = jnp.where(near, s + step_newton, s + step_lip)
        # clamp Newton to the corridor; descent alone detects passing s_hi
        s_new = jnp.clip(s_new, lo_d, hi_d)
        exhausted = (~near) & ~newly & (s + step_lip > hi_d)
        survive = live & ~newly & ~exhausted & jnp.isfinite(Fj)
        s = jnp.where(survive, s_new, s)
        return i + 1, s, survive, conv

    zero = jnp.zeros(live0.shape, dtype=bool)
    _, s, _, valid = lax.while_loop(
        cond, body, (jnp.asarray(0), lo_d, live0, zero))

    # differentiable polish step: value unchanged at a root, gradient exact
    s = lax.stop_gradient(s)
    Pj = P1 + s[..., None] * S
    sagj, n_hat = sag_and_normal(Pj[..., 0], Pj[..., 1])
    Fj = Pj[..., 2] - sagj
    Fpj = row_dot(S, n_hat) / n_hat[..., 2]
    graze = ~(jnp.abs(Fpj) > 1e-300)
    step = Fj / jnp.where(graze, 1.0, Fpj)
    s = jnp.where(graze | ~jnp.isfinite(step), s, s - step)
    Pj = P1 + s[..., None] * S
    sagj, n_hat = sag_and_normal(Pj[..., 0], Pj[..., 1])
    nan = jnp.asarray(jnp.nan, dtype=dtype)
    Q = jnp.where(valid[..., None], Pj, nan)
    n_out = jnp.where(valid[..., None], n_hat, nan)
    return Q, n_out, valid


def bracketed_newton_solve_s(P1, S, sag_and_normal, s_lo, s_hi,
                             tol_sag=None,
                             maxiter=SURFACE_INTERSECTION_DEFAULT_MAXITER,
                             lipschitz=None, domain_radius=None):
    """First-root solve in a band by Lipschitz (sphere-tracing) descent.

    The Lipschitz bound makes the march provably unable to step over the
    first root, so it needs no segment scan or bracket-refinement heuristics
    (reference ``intersections.py:274-322``).

    Parameters
    ----------
    P1 : ndarray
        (N, 3) ray origins, expressed on the surface vertex plane.
    S : ndarray
        (N, 3) unit direction cosines.
    sag_and_normal : callable
        maps (x, y) to the surface sag and its unit normal.
    s_lo, s_hi : ndarray
        (N,) endpoints of the search band (path length along each ray
        measured from P1).
    tol_sag : float, optional
        absolute convergence tolerance on the residual Z - sag.
    maxiter : int, optional
        iteration cap per solve.
    lipschitz : float
        max abs(grad sag) over the domain; required — it is what guarantees
        the march finds the first root.
    domain_radius : float, optional
        radius of the characterized disk; clips the march to where the bound
        holds.

    Returns
    -------
    Q, n_hat, valid : ndarray, ndarray, ndarray
        intersection points, unit surface normals, and a length-N boolean
        convergence mask.  Failed rays are NaN.
    """
    if lipschitz is None:
        raise ValueError(
            'a lipschitz bound (the max |grad sag| over the domain) is '
            'required: it is what guarantees the march cannot step over '
            'the first root.')
    P1 = jnp.atleast_2d(P1)
    S = jnp.atleast_2d(S)
    tol_sag = resolve_tol_sag(tol_sag, P1.dtype)
    steps = max(maxiter, LIPSCHITZ_MARCH_MAXSTEPS)
    return _lipschitz_march_solve_s(sag_and_normal, P1, S, s_lo, s_hi,
                                    lipschitz, tol_sag, steps,
                                    domain_radius=domain_radius)


def seeded_newton_intersect(seed, P, S, sag_and_normal, tol_sag=None,
                            maxiter=None, departure=None, domain_radius=None,
                            departure_gradient=None, sag_lipschitz=None,
                            forward_only=False):
    """Conic-seeded Newton intersection -> (Q, n, valid).

    ``seed`` is the (c, k, dx, dy) conic approximant of the shape; its
    analytic root seeds the Newton iteration on the full sag, cutting
    iterations to a handful for realistic departures.  With
    ``departure``/``domain_radius`` bounds (from the owning Surface's
    DepartureBand), the Newton root is accepted only inside the
    seed-relative band; uncertified rays run the Lipschitz rescue.  Twin of
    reference ``intersections.py:337-477`` with the value-dependent rescue
    gate (`if rescue.any()`) replaced by a masked march so the whole path
    jits.
    """
    if maxiter is None:
        maxiter = SURFACE_INTERSECTION_DEFAULT_MAXITER
    P = jnp.atleast_2d(P)
    S = jnp.atleast_2d(S)
    c, k, dx, dy = seed
    Sz = S[..., 2]
    s0 = -P[..., 2] / Sz
    P1 = P + s0[..., None] * S
    if _statically_zero(c):
        seed = jnp.zeros_like(s0)
        seed_ok = jnp.ones_like(s0, dtype=bool)
        Q_conic = P1
        n_conic = jnp.zeros(P1.shape, dtype=P1.dtype).at[..., 2].set(1.0)
    else:
        seed, seed_ok = _conic_quadratic_t(c, k, P1, S, dx, dy)
        seed = jnp.where(seed_ok, seed, 0.0)
        Q_conic = P1 + seed[..., None] * S
        _, n_conic = conic_sag_and_normal(
            c, k, Q_conic[..., 0] + dx, Q_conic[..., 1] + dy)
    Q, n, valid = newton_raphson_solve_s(P1, S, sag_and_normal, s1=seed,
                                         tol_sag=tol_sag, maxiter=maxiter)
    tol = resolve_tol_sag(tol_sag, P1.dtype)

    band_active = departure is not None and domain_radius is not None
    if band_active:
        s_root = row_dot(Q - P1, S)
        cosi = jnp.abs(row_dot(S, n_conic))
        # monotonicity certificate on the unfloored seed incidence
        if departure_gradient is not None:
            S_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - Sz * Sz))
            certified = (cosi - departure_gradient * S_t) > CERTIFICATE_MARGIN
        else:
            certified = jnp.ones(cosi.shape, dtype=bool)
        # grazing/NaN incidence gets the widest finite band
        cosi = jnp.where(cosi >= COS_INCIDENCE_FLOOR, cosi,
                         COS_INCIDENCE_FLOOR)
        # slack for Newton convergence noise in near-zero departure bands
        band = (departure + 100.0 * tol * (1.0 + jnp.abs(seed))) / cosi
        rseed_sq = (Q_conic[..., 0] * Q_conic[..., 0]
                    + Q_conic[..., 1] * Q_conic[..., 1])
        seed_hit = seed_ok & jnp.isfinite(seed)
        police = seed_hit & (rseed_sq <= domain_radius * domain_radius)
        in_band = jnp.abs(s_root - seed) <= band
        # departure bounds do not certify roots outside the domain
        rroot_sq = Q[..., 0] * Q[..., 0] + Q[..., 1] * Q[..., 1]
        in_domain = rroot_sq <= domain_radius * domain_radius
        # preserve roots the band-only guard would have accepted
        old_anchorless = ~seed_hit & ~in_domain
        prior_accept = (valid & (~police | (in_band & in_domain))
                        & ~old_anchorless)
        certified_accept = valid & police & in_band & in_domain & certified
        rescue = police & ~certified_accept
        lo = seed - band
        hi = seed + band
        if not _statically_zero(c):
            # closest-approach band for rays whose seed conic misses
            # (reference intersections.py:443-459)
            A_, B_, C_ = _conic_quadratic_coeffs(c, k, P1, S, dx, dy)
            abs_c = jnp.abs(jnp.asarray(c, dtype=P1.dtype))
            z_max = abs_c * domain_radius * domain_radius / 2.0 + departure
            scale = 2.0 / abs_c + 2.0 * jnp.abs(1.0 + k) * z_max
            d_imp = (departure + 100.0 * tol) * scale
            A_safe = jnp.where(A_ > 0, A_, 1.0)
            t_star = -B_ / A_safe
            c_min = C_ - B_ * B_ / A_safe
            wsq = (d_imp - c_min) / A_safe
            rescuable = (~seed_hit & (A_ > 0) & (wsq >= 0)
                         & jnp.isfinite(t_star))
            w = jnp.sqrt(jnp.abs(wsq))
            lo = jnp.where(rescuable, t_star - w, lo)
            hi = jnp.where(rescuable, t_star + w, hi)
            rescue = rescue | rescuable
        if sag_lipschitz is not None:
            Qr, nr, vr = _lipschitz_march_solve_s(
                sag_and_normal, P1, S, lo, hi, sag_lipschitz, tol,
                max(maxiter, LIPSCHITZ_MARCH_MAXSTEPS),
                domain_radius=domain_radius, active=rescue)
        else:
            Qr, nr = Q, n
            vr = jnp.zeros(rescue.shape, dtype=bool)
        won = rescue & vr
        Q = jnp.where(won[..., None], Qr, Q)
        n = jnp.where(won[..., None], nr, n)
        # the rescue wins where it converged; where it stalls, previous
        # band-only accepts survive; non-rescued accepts keep Newton
        accept = certified_accept | won | (rescue & ~vr & prior_accept)
        accept = accept | (prior_accept & ~rescue)
        valid = accept
        Q = jnp.where(valid[..., None], Q, jnp.nan)
        n = jnp.where(valid[..., None], n, jnp.nan)

    if forward_only:
        # reject roots behind the incoming ray origin: total march
        # s0 + s must move the ray forward along S, with slack for
        # Newton noise (reference intersections.py:471-475)
        s_root = row_dot(Q - P1, S)
        backward = (s0 + s_root) < (-100.0 * tol * (1.0 + jnp.abs(s0)))
        valid = valid & ~backward
        Q = jnp.where(valid[..., None], Q, jnp.nan)
        n = jnp.where(valid[..., None], n, jnp.nan)
    return Q, n, valid
