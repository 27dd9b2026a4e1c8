"""Thin-film stack engine with internal field access.

Rebuild of ``prysm/x/coatings/stack.py``.  Layers are ambient-side
first; angles radians; thicknesses and wavelengths microns.  The compute
core is pure jnp over an (N, *calc, 2, 2) matrix stack — cumulative
products use ``lax.associative_scan`` (log-depth parallel prefix, the
natural accelerator shape), and complex trig is built from real cos/sin/
cosh/sinh so nothing hits the axon complex-transcendental compile hang.
"""
import numpy as onp
import jax.numpy as jnp
from jax import lax

from ...conf import config
from ...thinfilm import _cos_snell


def _resolve(index, wvl):
    """Resolve a constant, callable, or material index at wavelength wvl."""
    nk = getattr(index, 'nk', None)
    if callable(nk):
        return nk(wvl)
    if callable(index):
        return index(wvl)
    return index


def _admittance(n, cost, pol):
    """Tilted optical admittance for index n at cos(theta)."""
    if pol == 'p':
        return n / cost
    return n * cost


def _ccos(z):
    """cos of a complex array from real primitives (axon-safe)."""
    z = jnp.asarray(z)
    if not jnp.iscomplexobj(z):
        return jnp.cos(z) + 0j
    zr = jnp.real(z)
    zi = jnp.imag(z)
    return lax.complex(jnp.cos(zr) * jnp.cosh(zi),
                       -jnp.sin(zr) * jnp.sinh(zi))


def _csin(z):
    """sin of a complex array from real primitives (axon-safe)."""
    z = jnp.asarray(z)
    if not jnp.iscomplexobj(z):
        return jnp.sin(z) + 0j
    zr = jnp.real(z)
    zi = jnp.imag(z)
    return lax.complex(jnp.sin(zr) * jnp.cosh(zi),
                       jnp.cos(zr) * jnp.sinh(zi))


def _char_matrix(beta, eta):
    """Per-layer characteristic matrix with trailing (2, 2) axes."""
    cosb = _ccos(beta)
    sinb = _csin(beta)
    eta = jnp.asarray(eta) + 0j
    m01 = -1j * sinb / eta
    m10 = -1j * eta * sinb
    row0 = jnp.stack([cosb, m01], axis=-1)
    row1 = jnp.stack([m10, cosb], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _matvec(M, v):
    """Batched matrix-vector product: (*calc, 2, 2) applied to (*calc, 2)."""
    return (M @ v[..., None])[..., 0]


def _eye2():
    """2x2 complex identity (broadcasts under matmul)."""
    return jnp.eye(2) + 0j


class Stack:
    """A multilayer thin-film stack.

    indices: per-layer index (number / callable / material), ambient side
    first; thicknesses: per-layer physical thickness, microns;
    substrate_index / ambient_index: the bounding media.
    """

    __slots__ = ('indices', 'thicknesses', 'substrate_index', 'ambient_index')

    def __init__(self, indices, thicknesses, substrate_index,
                 ambient_index=1.0):
        indices = list(indices)
        thicknesses = jnp.asarray(thicknesses, dtype=config.precision)
        if thicknesses.ndim == 0:
            thicknesses = jnp.full(len(indices), thicknesses,
                                   dtype=config.precision)
        if len(indices) != thicknesses.shape[0]:
            raise ValueError('indices and thicknesses must describe the same '
                             'number of layers')
        self.indices = indices
        self.thicknesses = thicknesses
        self.substrate_index = substrate_index
        self.ambient_index = ambient_index

    def __len__(self):
        return self.thicknesses.shape[0]

    def resolved_indices(self, wvl):
        """Per-layer indices evaluated at wavelength wvl."""
        return [_resolve(n, wvl) for n in self.indices]

    def __repr__(self):
        return f'Stack({len(self)} layers, substrate={self.substrate_index!r})'


def _layer_arrays(stack, wvl, theta0, pol):
    """Stacked per-layer (beta, eta, dbeta_dd, n, cost), leading layer axis."""
    n0 = _resolve(stack.ambient_index, wvl)
    betas, etas, dbdds, ns, costs = [], [], [], [], []
    for n, d in zip(stack.resolved_indices(wvl), stack.thicknesses):
        cost = _cos_snell(n0, n, theta0)
        betas.append((2 * jnp.pi * n * d * cost) / wvl)
        etas.append(_admittance(n, cost, pol))
        dbdds.append((2 * jnp.pi * n * cost) / wvl)
        ns.append(n)
        costs.append(cost)
    return n0, betas, etas, dbdds, ns, costs


def stack_characteristic_matrices(stack, wvl, theta0, pol):
    """Per-layer characteristic matrices, ambient side first."""
    pol = pol.lower()
    _, betas, etas, _, _, _ = _layer_arrays(stack, wvl, theta0, pol)
    return [_char_matrix(b, e) for b, e in zip(betas, etas)]


def forward_products(matrices):
    """Cumulative left products: length N+1 list, entry 0 the identity.

    Uses a log-depth associative scan over the stacked layer axis.
    """
    if len(matrices) == 0:
        return [_eye2()]
    mats = jnp.stack([jnp.broadcast_to(M, matrices[0].shape)
                      for M in matrices])
    cum = lax.associative_scan(jnp.matmul, mats)
    return [_eye2()] + [cum[k] for k in range(cum.shape[0])]


def backward_products(matrices):
    """Cumulative right products: length N+1 list, entry N the identity."""
    N = len(matrices)
    if N == 0:
        return [_eye2()]
    mats = jnp.stack([jnp.broadcast_to(M, matrices[0].shape)
                      for M in matrices])
    rev = mats[::-1]
    # f(a, b) = b @ a accumulates products in right-to-left order
    cum = lax.associative_scan(lambda a, b: jnp.matmul(b, a), rev)
    out = [cum[N - 1 - k] for k in range(N)]
    out.append(_eye2())
    return out


def _evaluate(stack, wvl, theta0, pol):
    """Shared transfer-matrix forward pass."""
    pol = pol.lower()
    if pol not in ('p', 's'):
        raise ValueError("unknown polarization, use 'p' or 's'")

    n0 = _resolve(stack.ambient_index, wvl)
    nsub = _resolve(stack.substrate_index, wvl)
    cost0 = jnp.cos(jnp.asarray(theta0, dtype=config.precision))
    cost_sub = _cos_snell(n0, nsub, theta0)
    eta0 = _admittance(n0, cost0, pol)
    eta_sub = _admittance(nsub, cost_sub, pol)

    matrices = stack_characteristic_matrices(stack, wvl, theta0, pol)
    R = backward_products(matrices)
    M = R[0]

    # [B, C] = M [1, eta_sub]: front-side tangential fields per unit
    # substrate-side electric field
    B = M[..., 0, 0] + M[..., 0, 1] * eta_sub
    C = M[..., 1, 0] + M[..., 1, 1] * eta_sub
    denom = eta0 * B + C
    r = (eta0 * B - C) / denom
    t = 2 * eta0 / denom

    v_sub = jnp.stack([t, t * eta_sub], axis=-1)
    fields = jnp.stack([_matvec(Rk, v_sub) for Rk in R], axis=0)
    return matrices, R, eta0, eta_sub, r, t, fields


def stack_rt(stack, wvl, theta0, pol):
    """Amplitude reflection and transmission coefficients (r, t)."""
    _, _, _, _, r, t, _ = _evaluate(stack, wvl, theta0, pol)
    return r, t


def internal_fields(stack, wvl, theta0, pol):
    """Tangential E and H at every boundary; leading axis = boundary."""
    *_, fields = _evaluate(stack, wvl, theta0, pol)
    return fields[..., 0], fields[..., 1]


def field_at_depth(stack, z, wvl, theta0, pol):
    """Tangential (E, H) at arbitrary depth(s) z inside the stack."""
    pol = pol.lower()
    z = jnp.asarray(z, dtype=config.precision)
    N = len(stack)
    if N == 0:
        raise ValueError('field_at_depth requires at least one layer')

    n0 = _resolve(stack.ambient_index, wvl)
    ns = jnp.asarray(stack.resolved_indices(wvl))
    ds = stack.thicknesses

    E, H = internal_fields(stack, wvl, theta0, pol)

    Z = jnp.concatenate([jnp.zeros(1, dtype=config.precision),
                         jnp.cumsum(ds)])
    if bool(onp.any((onp.asarray(z) < 0) | (onp.asarray(z) > float(Z[-1])))):
        raise ValueError('z must lie within the coating stack')
    li = jnp.clip(jnp.searchsorted(Z, z, side='right') - 1, 0, N - 1)

    n_z = ns[li]
    cost_z = _cos_snell(n0, n_z, theta0)
    eta_z = _admittance(n_z, cost_z, pol)
    t_below = Z[li + 1] - z
    beta_z = (2 * jnp.pi * n_z * t_below * cost_z) / wvl
    Mz = _char_matrix(beta_z, eta_z)

    E_stack = jnp.stack([E[k] for k in range(N + 1)])
    H_stack = jnp.stack([H[k] for k in range(N + 1)])
    v_bottom = jnp.stack([E_stack[li + 1], H_stack[li + 1]], axis=-1)
    f = _matvec(Mz, v_bottom)
    return f[..., 0], f[..., 1]


def RTA(stack, wvl, theta0, pol):
    """Reflectance, transmittance, and per-layer absorptance (R, T, A)."""
    _, _, eta0, eta_sub, r, t, fields = _evaluate(stack, wvl, theta0, pol)
    R = jnp.abs(r) ** 2
    T = jnp.real(eta_sub) / jnp.real(eta0) * jnp.abs(t) ** 2

    E = fields[..., 0]
    H = fields[..., 1]
    # net substrate-ward power flux at each boundary over incident power;
    # each layer absorbs the difference (telescopes to A = 1 - R - T)
    flux = jnp.real(E * jnp.conj(H)) / jnp.real(eta0)
    A = flux[:-1] - flux[1:]
    return R, T, A
