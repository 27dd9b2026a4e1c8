"""Gradients for coating merits via jax.grad.

Rebuild of ``prysm/x/coatings/diff.py``.  The reference hand-derives the
transfer-matrix adjoint (characteristic-matrix VJPs, O(N) cotangent
scans); here the same seeded gradients come from ``jax.grad`` of a pure
re-evaluation — one autodiff sweep replaces ~300 lines of adjoint
algebra, and the whole thing jits.

Cotangent convention matches the reference: a complex cotangent c_z
pairs as dF = Re(conj(c_z) dz).  jax.grad returns the conjugate of that
for complex leaves, handled in :func:`assembly_cotangent`.
"""
import jax
import jax.numpy as jnp

from ...conf import config
from ...thinfilm import _cos_snell

from .stack import (
    _admittance,
    _char_matrix,
    _eye2,
    _matvec,
    _resolve,
    backward_products,
    forward_products,
    stack_characteristic_matrices,
)


class ForwardEval:
    """Cached forward evaluation of a stack at one (wvl, theta, pol) grid."""

    def __init__(self, stack, wvl, theta0, pol):
        pol = pol.lower()
        if pol not in ('p', 's'):
            raise ValueError("unknown polarization, use 'p' or 's'")
        self.stack, self.wvl, self.theta0, self.pol = stack, wvl, theta0, pol

        n0 = self.n0 = _resolve(stack.ambient_index, wvl)
        nsub = _resolve(stack.substrate_index, wvl)
        self.eta0 = _admittance(
            n0, jnp.cos(jnp.asarray(theta0, dtype=config.precision)), pol)
        self.eta_sub = _admittance(nsub, _cos_snell(n0, nsub, theta0), pol)

        # per-layer kinematics, factored through the free-space wavenumber:
        # beta_j = (k0 n_j cos(theta_j)) d_j, so d(beta)/d(d) is the prefactor
        k0 = 2 * jnp.pi / wvl
        self.ns = list(stack.resolved_indices(wvl))
        self.costs = [_cos_snell(n0, n, theta0) for n in self.ns]
        self.dbeta_dd = [k0 * n * c for n, c in zip(self.ns, self.costs)]
        self.betas = [p * d for p, d in zip(self.dbeta_dd, stack.thicknesses)]
        self.etas = [_admittance(n, c, pol)
                     for n, c in zip(self.ns, self.costs)]

        self.matrices = stack_characteristic_matrices(stack, wvl, theta0, pol)
        self.L = forward_products(self.matrices)
        self.R = backward_products(self.matrices)
        self.M = self.R[0]
        self.r, self.t, self.E, self.H = _rtEH(self.R, self.eta0, self.eta_sub)
        self.v_sub = jnp.stack([self.t, self.t * self.eta_sub], axis=-1)

    @property
    def R_value(self):
        """Reflectance abs(r)^2."""
        return jnp.abs(self.r) ** 2

    @property
    def T_value(self):
        """Transmittance with the tilted-admittance flux factor."""
        return jnp.real(self.eta_sub) / jnp.real(self.eta0) * jnp.abs(self.t) ** 2

    @property
    def A_value(self):
        """Per-layer absorptance, shape (N, *calc)."""
        flux = jnp.real(self.E * jnp.conj(self.H)) / jnp.real(self.eta0)
        return flux[:-1] - flux[1:]

    @property
    def Esq_value(self):
        """Standing-wave intensity abs(E)^2 at each boundary, (N+1, *calc)."""
        return jnp.abs(self.E) ** 2


def forward_eval(stack, wvl, theta0, pol):
    """Build a ForwardEval for one sample set."""
    return ForwardEval(stack, wvl, theta0, pol)


def _rtEH(R, eta0, eta_sub):
    """(r, t, E, H) from the backward (substrate-side) matrix products."""
    M = R[0]
    # Abeles B/C assembly; substrate admittance closes the recursion
    B, C = (M[..., i, 0] + M[..., i, 1] * eta_sub for i in (0, 1))
    denom = eta0 * B + C
    r = (eta0 * B - C) / denom
    t = 2 * eta0 / denom
    v_sub = jnp.stack([t, t * eta_sub], axis=-1)
    fields = jnp.stack([_matvec(Rk, v_sub) for Rk in R], axis=0)
    return r, t, fields[..., 0], fields[..., 1]


def _quantities_from_matrices(matrices, eta0, eta_sub):
    """(r, t, E, H) from per-layer characteristic matrices."""
    return _rtEH(backward_products(matrices), eta0, eta_sub)


def _seeded_scalar(r, t, E, H, eta0, eta_sub, dR, dT, dA, dEsq):
    """Seed-weighted sum of the physical quantities (the VJP scalar)."""
    total = jnp.zeros((), dtype=config.precision)
    if dR is not None:
        total = total + jnp.sum(dR * jnp.abs(r) ** 2)
    if dT is not None:
        T = jnp.real(eta_sub) / jnp.real(eta0) * jnp.abs(t) ** 2
        total = total + jnp.sum(dT * T)
    if dA is not None:
        flux = jnp.real(E * jnp.conj(H)) / jnp.real(eta0)
        A = flux[:-1] - flux[1:]
        total = total + jnp.sum(dA * A)
    if dEsq is not None:
        total = total + jnp.sum(dEsq * jnp.abs(E) ** 2)
    return total


def thickness_gradient(fwd, dR=None, dT=None, dA=None, dEsq=None):
    """Gradient of a seeded scalar merit w.r.t. every layer thickness."""
    etas = fwd.etas
    dbdd = fwd.dbeta_dd
    eta0, eta_sub = fwd.eta0, fwd.eta_sub

    def scalar_of_d(d):
        mats = [_char_matrix(dbdd[j] * d[j], etas[j])
                for j in range(len(etas))]
        r, t, E, H = _quantities_from_matrices(mats, eta0, eta_sub)
        return _seeded_scalar(r, t, E, H, eta0, eta_sub, dR, dT, dA, dEsq)

    d0 = jnp.asarray(fwd.stack.thicknesses, dtype=config.precision)
    return jax.grad(scalar_of_d)(d0)


def index_gradient(fwd, dR=None, dT=None, dA=None, dEsq=None):
    """Gradient of a seeded scalar merit w.r.t. every (real) layer index.

    The derivative is taken in the real part of each layer index; any
    imaginary (absorbing) component is held fixed at its forward value
    so lossy layers differentiate at the right point.
    """
    eta0, eta_sub = fwd.eta0, fwd.eta_sub
    n0 = fwd.n0
    theta0 = fwd.theta0
    wvl = fwd.wvl
    pol = fwd.pol
    d = jnp.asarray(fwd.stack.thicknesses, dtype=config.precision)
    imag = [jnp.imag(jnp.asarray(n)) for n in fwd.ns]

    def scalar_of_n(nvec):
        mats = []
        for j in range(nvec.shape[0]):
            n = nvec[j] + 1j * imag[j]
            cost = _cos_snell(n0, n, theta0)
            beta = (2 * jnp.pi * n * d[j] * cost) / wvl
            eta = _admittance(n, cost, pol)
            mats.append(_char_matrix(beta, eta))
        r, t, E, H = _quantities_from_matrices(mats, eta0, eta_sub)
        return _seeded_scalar(r, t, E, H, eta0, eta_sub, dR, dT, dA, dEsq)

    n0vec = jnp.asarray([jnp.real(n) for n in fwd.ns], dtype=config.precision)
    return jax.grad(scalar_of_n)(n0vec)


def _dchar_dbeta(beta, eta):
    """Derivative of the characteristic matrix w.r.t. phase thickness."""
    cosb = jnp.cos(beta) + 0j
    sinb = jnp.sin(beta)
    row0 = jnp.stack([-sinb, -1j * cosb / eta], axis=-1)
    row1 = jnp.stack([-1j * eta * cosb, -sinb], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def char_matrix_vjp(beta, eta, M_bar):
    """Pull a matrix cotangent back to (c_beta, c_eta) cotangents.

    Kept for API parity with the reference diff engine; implemented with
    the analytic derivative matrices.
    """
    cosb = jnp.cos(beta) + 0j
    sinb = jnp.sin(beta)
    zero = jnp.zeros_like(sinb + 0j)
    dMdb = _dchar_dbeta(beta, eta)
    dMde = jnp.stack([
        jnp.stack([zero, 1j * sinb / (eta * eta)], axis=-1),
        jnp.stack([-1j * sinb, zero], axis=-1)], axis=-2)
    c_beta = jnp.sum(jnp.conj(dMdb) * M_bar, axis=(-2, -1))
    c_eta = jnp.sum(jnp.conj(dMde) * M_bar, axis=(-2, -1))
    return c_beta, c_eta


def assembly_cotangent(fwd, dR=None, dT=None):
    """Assembled-matrix cotangent c_M with dF = Re(sum(conj(c_M) dM)).

    jax.grad on a complex leaf returns the conjugate of that pairing, so
    the result is conjugated once here.
    """
    eta0, eta_sub = fwd.eta0, fwd.eta_sub

    def scalar_of_M(M):
        B = M[..., 0, 0] + M[..., 0, 1] * eta_sub
        C = M[..., 1, 0] + M[..., 1, 1] * eta_sub
        denom = eta0 * B + C
        r = (eta0 * B - C) / denom
        t = 2 * eta0 / denom
        total = jnp.zeros((), dtype=config.precision)
        if dR is not None:
            total = total + jnp.sum(dR * jnp.abs(r) ** 2)
        if dT is not None:
            T = jnp.real(eta_sub) / jnp.real(eta0) * jnp.abs(t) ** 2
            total = total + jnp.sum(dT * T)
        return total

    g = jax.grad(scalar_of_M)(fwd.M + 0j)
    return jnp.conj(g)


def layer_cotangents(fwd, dR=None, dT=None, dA=None, dEsq=None):
    """Per-layer (c_beta, c_eta) cotangent lists for a seeded scalar.

    API parity with the reference; derived from one jax.grad sweep over
    the per-layer (beta, eta) leaves.
    """
    eta0, eta_sub = fwd.eta0, fwd.eta_sub
    N = len(fwd.matrices)
    if N == 0:
        return [], []
    shape = jnp.shape(fwd.betas[0])

    def scalar_of_be(betas, etas):
        mats = [_char_matrix(betas[j], etas[j]) for j in range(N)]
        r, t, E, H = _quantities_from_matrices(mats, eta0, eta_sub)
        return _seeded_scalar(r, t, E, H, eta0, eta_sub, dR, dT, dA, dEsq)

    b0 = jnp.stack([jnp.broadcast_to(b + 0j, shape) for b in fwd.betas])
    e0 = jnp.stack([jnp.broadcast_to(e + 0j, shape) for e in fwd.etas])
    gb, ge = jax.grad(scalar_of_be, argnums=(0, 1))(b0, e0)
    c_beta = [jnp.conj(gb[j]) for j in range(N)]
    c_eta = [jnp.conj(ge[j]) for j in range(N)]
    return c_beta, c_eta


__all__ = [
    'ForwardEval',
    'forward_eval',
    'char_matrix_vjp',
    'assembly_cotangent',
    'layer_cotangents',
    'thickness_gradient',
    'index_gradient',
]
