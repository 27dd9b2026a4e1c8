"""Spencer & Murty's general ray-trace algorithm, TPU-native.

Rebuild of ``prysm/x/raytracing/spencer_and_murty.py``.  The kernel is a
pure function of batched (N, 3) ray bundles:

* the Newton surface intersection runs a fixed-iteration ``lax.fori_loop``
  with per-ray convergence masking — uniform work per lane, the natural
  accelerator shape, instead of the reference's shrinking active-set
  compaction (prysm/x/raytracing/spencer_and_murty.py:265-305);
* dead rays are masked with ``where`` (NaN fill), never in-place writes;
* the per-surface loop unrolls at trace time (surface lists are static and
  heterogeneous), so the whole trace jits and differentiates end to end —
  forward tangents and adjoints come from ``jax.jvp``/``jax.grad`` rather
  than hand-written per-primitive rules.

Status encoding is identical to the reference (complex: surface index in
the real part, failure family in the imaginary part).
"""
import numpy as onp
import jax.numpy as jnp
from jax import lax

from ...conf import config
from ...mathops import row_dot

SURFACE_INTERSECTION_DEFAULT_MAXITER = 100
DEFAULT_TOL_SAG = 1e-12

STYPE_REFLECT = -1
STYPE_REFRACT = -2
STYPE_EVAL = -3
STYPE_OBJ = -4
STYPE_IMG = -5


_MEASUREMENT_STYPES = frozenset((STYPE_EVAL, STYPE_OBJ, STYPE_IMG))


def _is_measurement_surf(typ):
    """True for a non-bending measurement surface (EVAL, OBJECT, or IMAGE)."""
    return typ in _MEASUREMENT_STYPES


# status-code values and label strings are API parity with the reference
# encoding; positive codes are numerical failures (Newton non-convergence,
# aperture clip), negative are geometric (no intersection, TIR, evanescent)
STATUS_OK = 0
STATUS_NEWTON = 1
STATUS_CLIP = 2
STATUS_MISS = -1
STATUS_TIR = -2
STATUS_EVANESCENT = -3

_STATUS_LABELS = dict(zip(
    (STATUS_OK, STATUS_NEWTON, STATUS_CLIP,
     STATUS_MISS, STATUS_TIR, STATUS_EVANESCENT),
    ('OK', 'NEWTON', 'CLIPPED', 'MISS', 'TIR', 'EVANESCENT'),
))


class RayTraceResult:
    """Structured return type for raytrace: P, S, OPL, status histories."""

    __slots__ = ('P', 'S', 'OPL', 'status', 'intermediates')

    def __init__(self, P, S, OPL, status, intermediates=None):
        self.P = P
        self.S = S
        self.OPL = OPL
        self.status = status
        self.intermediates = intermediates

    @property
    def status_record(self):
        """Decoded (surface, code) status view; host-side, lazy so the
        trace itself stays traceable under jit/grad."""
        return RayStatus.from_encoded(onp.asarray(self.status))

    def __repr__(self):
        """Compact summary."""
        return (f'RayTraceResult(N_rays={self.status.shape[0]}, '
                f'N_surfaces={self.P.shape[0] - 1}, '
                f'valid={int(valid_mask(self.status).sum())})')


class RayStatus:
    """Host-side (surface, code) view of the complex status array.

    A plain record of two int arrays — both components of the packed
    status, materialized once on decode.
    """

    def __init__(self, surface, code):
        self.surface = onp.asarray(surface)
        self.code = onp.asarray(code)

    @classmethod
    def from_encoded(cls, status):
        """Split a packed complex status array into int component views."""
        z = onp.asarray(status)
        return cls(z.real.astype(int), z.imag.astype(int))

    @property
    def encoded(self):
        """Pack back into the compact complex representation."""
        return self.surface + 1j * self.code

    @property
    def text(self):
        """Human-readable status strings."""
        return decode_status(self.encoded)


def decode_status(status):
    """Decode the compact complex status encoding to strings.

    Scalar in -> ``str`` out; array in -> object ndarray of the same
    shape.  Vectorized over the flattened components rather than
    dispatching per element.
    """
    surf = onp.atleast_1d(onp.real(status)).astype(int).ravel()
    code = onp.atleast_1d(onp.imag(status)).astype(int).ravel()
    out = onp.empty(surf.shape, dtype=object)
    for i in range(surf.size):
        c = int(code[i])
        name = _STATUS_LABELS.get(c, f'UNKNOWN({c})')
        out[i] = name if c == STATUS_OK else f'{name} at surface {int(surf[i])}'
    if onp.ndim(status) == 0:
        return out[0]
    return out.reshape(onp.shape(status))


def _finite_ray_mask(P):
    return jnp.isfinite(P).all(axis=-1)


def valid_mask(status, P=None):
    """Reduce status (and optional positions) to a bool valid-ray mask."""
    if status is None:
        if P is None:
            return None
        return _finite_ray_mask(P)
    valid = jnp.asarray(status).imag == STATUS_OK
    if P is not None:
        valid = valid & _finite_ray_mask(P)
    return valid


def resolve_tol_sag(tol_sag, dtype):
    """Dtype-aware Newton convergence tolerance (see reference rationale)."""
    if tol_sag is None:
        return max(DEFAULT_TOL_SAG, float(jnp.finfo(dtype).eps) * 100.0)
    return tol_sag


def newton_raphson_solve_s(P1, S, sag_and_normal, s1=0.0, tol_sag=None,
                           maxiter=SURFACE_INTERSECTION_DEFAULT_MAXITER):
    """Newton-Raphson ray-surface intersection, batched and masked.

    P1: (N, 3) positions on the vertex tangent plane; S: (N, 3) direction
    cosines; sag_and_normal(x, y) -> (sag, n_hat).  Returns (Q, n_hat,
    valid).  Runs a fixed number of iterations with per-ray freezing on
    convergence — jit-compatible, no data-dependent shapes.

    Gradients use the implicit function theorem rather than unrolling the
    loop: the iteration runs under stop_gradient and one differentiable
    Newton polish step reattaches the solution to its inputs.  At a root
    F(s*) = 0 the polish step's derivative is exactly the implicit
    derivative -dF/dinput / dF/ds, so jax.grad/jvp see a single step
    instead of `maxiter` of them — orders of magnitude cheaper to
    transpose and compile, with no accuracy loss.
    """
    dtype = P1.dtype
    tol = resolve_tol_sag(tol_sag, dtype)
    sj0 = jnp.broadcast_to(jnp.asarray(s1, dtype=dtype), P1.shape[:-1])
    finite = (jnp.isfinite(P1).all(axis=-1) & jnp.isfinite(S).all(axis=-1)
              & jnp.isfinite(sj0))

    P1_d = lax.stop_gradient(P1)
    S_d = lax.stop_gradient(S)

    def body(_, carry):
        sj, done = carry
        Pj = P1_d + sj[..., None] * S_d
        sagj, n_hat = sag_and_normal(Pj[..., 0], Pj[..., 1])
        Fj = Pj[..., 2] - sagj
        newly = jnp.abs(Fj) < tol
        done = done | newly
        Fpj = row_dot(S_d, n_hat) / n_hat[..., 2]
        step = Fj / Fpj
        sj_next = jnp.where(done | ~jnp.isfinite(step), sj, sj - step)
        return sj_next, done

    sj, converged = lax.fori_loop(
        0, maxiter, body, (lax.stop_gradient(sj0), jnp.zeros_like(finite)))
    sj = lax.stop_gradient(sj)
    # differentiable polish step: value unchanged at a root, gradient exact
    Pj = P1 + sj[..., None] * S
    sagj, n_hat = sag_and_normal(Pj[..., 0], Pj[..., 1])
    Fj = Pj[..., 2] - sagj
    converged = (converged | (jnp.abs(Fj) < tol)) & finite
    Fpj = row_dot(S, n_hat) / n_hat[..., 2]
    # grazing lanes (Fpj ~ 0) would put inf into the quotient and NaN into
    # reverse mode through the where; substitute a benign denominator
    graze = ~(jnp.abs(Fpj) > 1e-300)
    step = Fj / jnp.where(graze, 1.0, Fpj)
    sj = jnp.where(graze | ~jnp.isfinite(step), sj, sj - step)
    # final evaluation at the polished solution for outputs
    Pj = P1 + sj[..., None] * S
    sagj, n_hat = sag_and_normal(Pj[..., 0], Pj[..., 1])
    nan = jnp.nan
    Q = jnp.where(converged[..., None], Pj, nan)
    n_out = jnp.where(converged[..., None], n_hat, nan)
    return Q, n_out, converged


def intersect(P0, S, sag_and_normal, s1=0, tol_sag=None,
              maxiter=SURFACE_INTERSECTION_DEFAULT_MAXITER):
    """Find ray-surface intersections from arbitrary local-frame origins."""
    P0 = jnp.atleast_2d(P0)
    S = jnp.atleast_2d(S)
    Z0 = P0[..., 2]
    m = S[..., 2]
    s0 = -Z0 / m
    P1 = P0 + s0[..., None] * S
    return newton_raphson_solve_s(P1, S, sag_and_normal, s1,
                                  tol_sag=tol_sag, maxiter=maxiter)


def transform_to_global_coords(XYZ, P, S, R=None):
    """Local -> global: rotate by R^T (applied as right-multiply), add P."""
    if R is not None:
        XYZ = jnp.matmul(XYZ, R)
        S = jnp.matmul(S, R)
    return XYZ + P, S


def transform_to_local_coords(XYZ, P, S, R=None):
    """Global -> local: subtract P, rotate by R."""
    XYZ2 = XYZ - P
    if R is not None:
        Rt = jnp.swapaxes(R, -1, -2)
        XYZ2 = jnp.matmul(XYZ2, Rt)
        S = jnp.matmul(S, Rt)
    return XYZ2, S


def refract(n, nprime, S, n_hat):
    """Snell's law for exitant direction cosines (NaN where TIR)."""
    S = jnp.atleast_2d(S)
    n_hat = jnp.atleast_2d(n_hat)
    out, tir = refract_with_tir(n, nprime, S, n_hat)
    return jnp.where(tir[..., None], jnp.nan, out)


def refract_with_tir(n, nprime, S, n_hat):
    """(Sprime, tir_mask) with finite values on TIR lanes.

    TIR is reported through the mask, NOT by sqrt(negative): the clamped
    sqrt keeps reverse-mode finite on TIR lanes (a zero cotangent times
    the NaN derivative of sqrt(<0) would otherwise poison every
    gradient in the bundle).
    """
    S = jnp.atleast_2d(S)
    n_hat = jnp.atleast_2d(n_hat)
    mu = n / nprime
    cosI = row_dot(n_hat, S)
    sinT_sq = mu * mu * (1.0 - cosI * cosI)
    tir = sinT_sq >= 1.0
    cosT = jnp.sqrt(jnp.where(tir, 1.0, 1.0 - sinT_sq))
    factor = jnp.sign(cosI) * cosT - mu * cosI
    return mu * S + factor[..., None] * n_hat, tir


def reflect(S, n_hat):
    """Reflect rays off a surface."""
    S = jnp.atleast_2d(S)
    n_hat = jnp.atleast_2d(n_hat)
    cosI = row_dot(S, n_hat)
    return S - 2.0 * cosI[..., None] * n_hat


def diffract(S_specular, n_hat, gx, gy, n_post):
    """Tangential momentum kick of a grating OPL gradient.

    (gx, gy) is the in-plane gradient of the grating OPL (order and
    period folded in).  Returns (S_out, valid); evanescent orders keep
    the specular direction and are masked invalid.  Branch-free masked
    jnp — this single expression serves the nominal trace and its
    forward/reverse differentials (``_diff_raytrace.d_diffract``,
    ``adjoint.primitives.adj_diffract``) so the rules cannot drift.
    """
    G = jnp.stack([gx, gy, jnp.zeros_like(gx)], axis=-1)
    G_dot_n = (G * n_hat).sum(-1, keepdims=True)
    G_tan = G - G_dot_n * n_hat
    s_dot_n = (S_specular * n_hat).sum(-1, keepdims=True)
    s_specular_tan = S_specular - s_dot_n * n_hat
    s_diff_tan = s_specular_tan + G_tan / n_post
    tan_sq = (s_diff_tan * s_diff_tan).sum(-1)
    valid = tan_sq <= 1.0
    normal_mag = jnp.sqrt(jnp.where(valid, 1.0 - tan_sq, 0.0))
    sign = jnp.sign(s_dot_n[..., 0])
    S_diff = s_diff_tan + (sign * normal_mag)[..., None] * n_hat
    S_diff = jnp.where(valid[..., None], S_diff, S_specular)
    return S_diff, valid


def eic_closing(P, S, C, kappa):
    """Determinate EIC closing segment to the reference sphere.

    s~ = -b - kappa m / (1 + sqrt(max(1 + kappa^2 m, 0))) with
    r = P - C, b = S.r, m = b^2 - r.r; spans finite pupils and the
    telecentric kappa -> 0 limit without cancellation (reference:
    prysm/x/raytracing/opt.py:401-468).  Returns (s, disc) — disc is
    the UNclamped discriminant so host callers can validate that the
    clamp was not exercised.  Single traceable expression shared by
    ``opt.hopkins_eic_closing``, ``_diff_raytrace`` (wavefront tangents,
    ``d_eic_closing``), and ``adjoint.primitives.adj_eic_closing``.
    """
    r = P - C
    b = jnp.sum(S * r, axis=-1)
    m = b * b - jnp.sum(r * r, axis=-1)
    disc = 1.0 + kappa * kappa * m
    s = -b - kappa * m / (1.0 + jnp.sqrt(jnp.maximum(disc, 0.0)))
    return s, disc


def _launch_medium_index(surfaces, wvl):
    """Index of the medium the bundle launches in (object-space material)."""
    first = surfaces[0] if len(surfaces) else None
    mat = getattr(first, 'material', None)
    if mat is not None and _is_measurement_surf(getattr(first, 'typ', None)):
        return mat.n(wvl)
    return 1.0


def raytrace(surfaces, P, S, wvl, tol_sag=None, keep_intermediates=False):
    """Trace a batched ray bundle through a sequence of surfaces.

    surfaces: compiled Surface sequence; P, S: (3,) or (N, 3) starting
    positions/directions; wvl: microns.  Returns a RayTraceResult with
    (n_surf+1, N, 3) position/direction histories, per-segment OPL, and the
    complex status encoding.  Fully differentiable: wrap in jax.grad /
    jax.jvp for sensitivities instead of the reference's hand-rolled
    tangent/adjoint stacks.
    """
    if hasattr(surfaces, 'to_surfaces'):
        raise TypeError('raytrace requires a compiled surface sequence; call '
                        'system.trace(...) for an OpticalSystem or pass '
                        'lens.to_surfaces() explicitly')
    try:
        len(surfaces)
    except TypeError as e:
        raise TypeError('raytrace requires a sized compiled surface sequence') from e

    # config.precision wins over the input dtype, as at every allocation
    # site in the reference (see tests/test_config_precision.py)
    P = jnp.asarray(P).astype(config.precision)
    S = jnp.asarray(S).astype(config.precision)
    squeeze_batch = (P.ndim == 1)
    if squeeze_batch:
        P = P[None, :]
        S = S[None, :]
    n_rays = P.shape[0]

    P_hist = [P]
    S_hist = [S]
    OPL_hist = [jnp.zeros(P.shape[:-1], dtype=P.dtype)]
    status_surf = jnp.zeros(n_rays, dtype=jnp.int32)
    status_code = jnp.zeros(n_rays, dtype=jnp.int32)

    Pj, Sj = P, S
    nj = _launch_medium_index(surfaces, wvl)
    intermediates = [] if keep_intermediates else None
    for j, surf in enumerate(surfaces):
        surf_idx = j + 1
        step = surf.interact(Pj, Sj, nj, wvl, tol_sag=tol_sag,
                             first_segment=(j == 0))

        active = status_code == STATUS_OK
        failed = active & (step.code != STATUS_OK)
        status_surf = jnp.where(failed, surf_idx, status_surf)
        status_code = jnp.where(failed, step.code, status_code)
        active = active & ~failed

        dead = ~active
        Pjp1 = jnp.where(dead[..., None], jnp.nan, step.P)
        Sjp1 = jnp.where(dead[..., None], jnp.nan, step.S)
        opl = jnp.where(dead, jnp.nan, step.opl)
        if surf.typ == STYPE_REFRACT:
            nj = step.n_post
        P_hist.append(Pjp1)
        S_hist.append(Sjp1)
        OPL_hist.append(opl)
        Pj, Sj = Pjp1, Sjp1
        if intermediates is not None:
            intermediates.append(step)

    fully_valid = status_code == STATUS_OK
    status_surf = jnp.where(fully_valid, len(surfaces), status_surf)
    status = status_surf + 1j * status_code.astype(config.precision_complex)

    P_out = jnp.stack(P_hist)
    S_out = jnp.stack(S_hist)
    OPL_out = jnp.stack(OPL_hist)
    if squeeze_batch:
        P_out = P_out.squeeze(axis=1)
        S_out = S_out.squeeze(axis=1)
        OPL_out = OPL_out.squeeze(axis=1)
    return RayTraceResult(P_out, S_out, OPL_out, status, intermediates)
