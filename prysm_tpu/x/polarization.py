"""Jones and Mueller calculus.

Rebuild of ``prysm/x/polarization.py``.  Jones matrices carry their (2, 2)
matrix in the trailing axes with arbitrary leading (spatial) batch axes —
under jit the 4 components are just a leading vmap-style axis, so polarized
propagation is the same fused program run on four fields.
In-place element assembly becomes ``jnp.stack`` construction.
"""
import functools

import jax.numpy as jnp

from ..conf import config
from ..mathops import cis
from .. import propagation

supported_propagation_funcs = [
    'focus', 'unfocus', 'focus_dft', 'unfocus_dft', 'angular_spectrum',
]


def _stack22(e00, e01, e10, e11, shape=None):
    """Assemble (..., 2, 2) from four broadcastable elements."""
    cdt = config.precision_complex
    e00 = jnp.asarray(e00, dtype=cdt)
    e01 = jnp.asarray(e01, dtype=cdt)
    e10 = jnp.asarray(e10, dtype=cdt)
    e11 = jnp.asarray(e11, dtype=cdt)
    if shape is not None:
        tgt = tuple(shape)
        e00 = jnp.broadcast_to(e00, tgt)
        e01 = jnp.broadcast_to(e01, tgt)
        e10 = jnp.broadcast_to(e10, tgt)
        e11 = jnp.broadcast_to(e11, tgt)
    else:
        shp = jnp.broadcast_shapes(e00.shape, e01.shape, e10.shape, e11.shape)
        e00 = jnp.broadcast_to(e00, shp)
        e01 = jnp.broadcast_to(e01, shp)
        e10 = jnp.broadcast_to(e10, shp)
        e11 = jnp.broadcast_to(e11, shp)
    row0 = jnp.stack([e00, e01], axis=-1)
    row1 = jnp.stack([e10, e11], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def linear_pol_vector(angle, degrees=True):
    """Linearly polarized Jones vector at the given angle.

    Scalar angle -> shape (2,); array angle -> (*angle.shape, 2, 1).
    """
    angle = jnp.asarray(angle)
    if degrees:
        angle = angle * jnp.pi / 180
    cost = jnp.cos(angle)
    sint = jnp.sin(angle)
    cdt = config.precision_complex
    if angle.ndim:
        return jnp.stack([cost, sint], axis=-1)[..., :, None].astype(cdt)
    return jnp.asarray([cost, sint], dtype=cdt)


def circular_pol_vector(handedness='left', shape=None):
    """Circularly polarized Jones vector."""
    cdt = config.precision_complex
    s = 1 / jnp.sqrt(2)
    if handedness == 'left':
        vec = jnp.asarray([s, 1j * s], dtype=cdt)
    elif handedness == 'right':
        vec = jnp.asarray([s, -1j * s], dtype=cdt)
    else:
        raise ValueError(f"unknown handedness {handedness}, use 'left' or 'right'")
    if shape is not None:
        return jnp.broadcast_to(vec[:, None], (*shape, 2, 1))
    return vec


def jones_rotation_matrix(theta, shape=None):
    """In-plane rotation of the transverse coordinate system."""
    cost = jnp.cos(theta)
    sint = jnp.sin(theta)
    shape22 = None if shape is None else (*shape, 2, 2)
    out = _stack22(cost, sint, -sint, cost)
    if shape is not None:
        out = jnp.broadcast_to(out, shape22)
    return out


def linear_retarder(retardance, theta=0, shape=None):
    """Homogeneous linear retarder Jones matrix."""
    retphasor = cis(jnp.asarray(retardance, dtype=config.precision))
    jones = _stack22(1, 0, 0, retphasor)
    if shape is not None:
        jones = jnp.broadcast_to(jones, (*shape, 2, 2))
    derot = jones_rotation_matrix(-theta)
    rot = jones_rotation_matrix(theta)
    return derot @ jones @ rot


def linear_diattenuator(alpha, theta=0, shape=None):
    """Homogeneous linear diattenuator Jones matrix."""
    if not 0 <= alpha <= 1:
        raise ValueError(f'alpha cannot be less than 0 or greater than 1, got: {alpha}')
    jones = _stack22(1, 0, 0, alpha)
    if shape is not None:
        jones = jnp.broadcast_to(jones, (*shape, 2, 2))
    derot = jones_rotation_matrix(-theta)
    rot = jones_rotation_matrix(theta)
    return derot @ jones @ rot


def half_wave_plate(theta=0, shape=None):
    """Half wave plate (pi retardance)."""
    return linear_retarder(jnp.pi, theta=theta, shape=shape)


def quarter_wave_plate(theta=0, shape=None):
    """Quarter wave plate (pi/2 retardance)."""
    return linear_retarder(jnp.pi / 2, theta=theta, shape=shape)


def linear_polarizer(theta=0, shape=None):
    """Linear polarizer (unit diattenuation)."""
    return linear_diattenuator(0, theta=theta, shape=shape)


def vector_vortex_retarder(charge, theta, retardance=jnp.pi, rotate=0):
    """Spatially-varying vector vortex retarder, Mawet et al. 2009 Eq (7)."""
    theta = theta * charge
    cost = jnp.cos(theta)
    sint = jnp.sin(theta)
    jcosr = -1j * jnp.cos(retardance / 2)
    jsinr = jnp.sin(retardance / 2)
    vvr_lhs = _stack22(cost, sint, sint, -cost) * jsinr
    # the reference writes jcosr only into [0, 0] (twice, prysm/x/
    # polarization.py:339-340); behavior preserved
    vvr_rhs = _stack22(jcosr * jnp.ones_like(cost), 0, 0, 0)
    vvr = vvr_lhs + vvr_rhs
    return jones_rotation_matrix(-rotate) @ vvr @ jones_rotation_matrix(rotate)


def broadcast_kron(a, b):
    """Broadcasted Kronecker product of (..., 2, 2) arrays -> (..., 4, 4)."""
    tmp = jnp.einsum('...ik,...jl', a, b)
    return tmp.reshape([*a.shape[:-2], a.shape[-2] * b.shape[-2],
                        a.shape[-1] * b.shape[-1]])


def jones_to_mueller(jones, broadcast=True):
    """Jones -> Mueller conversion (Chipman, Lam, Young Eq 6.99)."""
    import numpy as onp
    U = onp.asarray([[1, 0, 0, 1],
                     [1, 0, 0, -1],
                     [0, 1, 1, 0],
                     [0, 1j, -1j, 0]]) / onp.sqrt(2)
    Uj = jnp.asarray(U, dtype=config.precision_complex)
    Uinv = jnp.asarray(onp.linalg.inv(U), dtype=config.precision_complex)
    if broadcast:
        jprod = broadcast_kron(jnp.conj(jones), jones)
    else:
        jprod = jnp.kron(jnp.conj(jones), jones)
    return jnp.real(Uj @ jprod @ Uinv)


def pauli_spin_matrix(index, shape=None):
    """Pauli spin matrix of given index (CLY Eq 6.108)."""
    if index not in (0, 1, 2, 3):
        raise ValueError(f'index should be 0,1,2, or 3. Got {index}')
    if index == 0:
        out = _stack22(1, 0, 0, 1)
    elif index == 1:
        out = _stack22(1, 0, 0, -1)
    elif index == 2:
        out = _stack22(0, 1, 1, 0)
    else:
        out = _stack22(0, -1j, 1j, 0)
    if shape is not None:
        out = jnp.broadcast_to(out, (*shape, 2, 2))
    return out


def pauli_coefficients(jones):
    """Pauli coefficients (c0, c1, c2, c3) of a Jones matrix."""
    c0 = (jones[..., 0, 0] + jones[..., 1, 1]) / 2
    c1 = (jones[..., 0, 0] - jones[..., 1, 1]) / 2
    c2 = (jones[..., 0, 1] + jones[..., 1, 0]) / 2
    c3 = 1j * (jones[..., 0, 1] - jones[..., 1, 0]) / 2
    return c0, c1, c2, c3


def jones_adapter(prop_func):
    """Wrap a propagation function to act on (..., 2, 2) Jones fields.

    The four components propagate independently; they are moved onto a
    leading axis so the underlying batch-aware propagation runs them in one
    fused call rather than a Python loop.  Idempotent: wrapping an
    already-adapted function returns it unchanged, so an explicit
    ``jones_adapter(focus)`` composes safely with a prior
    ``add_jones_propagation()`` module patch.
    """
    if getattr(prop_func, '_jones_adapted', False):
        return prop_func

    @functools.wraps(prop_func)
    def wrapper(*args, **kwargs):
        wavefunction = args[0]
        other_args = args[1:] if len(args) > 1 else ()
        if wavefunction.ndim == 2:
            return prop_func(*args, **kwargs)
        # (..., 2, 2) -> (4, ...) leading batch
        J = jnp.moveaxis(wavefunction.reshape(*wavefunction.shape[:-2], 4), -1, 0)
        ret = prop_func(J, *other_args, **kwargs)
        out = jnp.moveaxis(ret, 0, -1)
        return out.reshape(*out.shape[:-1], 2, 2)
    wrapper._jones_adapted = True
    return wrapper


def add_jones_propagation(funcs_to_change=supported_propagation_funcs):
    """Monkey-patch prysm_tpu.propagation functions with the Jones adapter."""
    for name, func in vars(propagation).items():
        if name in funcs_to_change:
            setattr(propagation, name, jones_adapter(func))


def apply_polarization_optic(field, pol_optic):
    """Apply a Jones-matrix optic to a scalar field -> (..., 2, 2) field."""
    if field.ndim == 2:
        field = field[..., None, None]
    return pol_optic * field
