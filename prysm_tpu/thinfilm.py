"""Thin film calculations: Fresnel coefficients and multilayer stacks.

Rebuild of ``prysm/thinfilm.py``.  The characteristic-matrix product over
layers runs as a ``lax.scan`` with vectorized trailing (spatial/spectral)
dimensions — the same cost structure as the reference's hand-rolled 2x2
element loop (prysm/thinfilm.py:264-293), but compiler-scheduled and
differentiable w.r.t. every thickness and index.

Complex-aware square roots (numpy's scimath) are emulated by promoting to
the complex dtype, so evanescent/TIR cases behave identically.
"""
import jax.numpy as jnp
from jax import lax


def brewsters_angle(n0, n1, deg=True):
    """Brewster's angle at an interface."""
    ang = jnp.arctan2(n1, n0)
    return jnp.degrees(ang) if deg else ang


def critical_angle(n0, n1, deg=True):
    """Minimum angle for total internal reflection."""
    ang = jnp.arcsin(n1 / n0)
    return jnp.degrees(ang) if deg else ang


def _to_complex(x):
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        return x
    cdtype = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64
    return x.astype(cdtype)


def snell_aor(n0, n1, theta, deg=True):
    """Angle of refraction via Snell's law (complex for evanescent cases)."""
    if deg:
        theta = jnp.radians(theta)
    arg = _to_complex(n0 / n1 * jnp.sin(theta))
    return jnp.arcsin(arg)


def _cos_snell(n0, n1, theta):
    """cos(theta_1) from Snell's law, complex-aware, TIR sign flip."""
    sint = n0 / n1 * jnp.sin(theta)
    cost = jnp.sqrt(_to_complex(1 - sint * sint))
    tir = (jnp.imag(sint) == 0) & (jnp.real(sint) > 1)
    return jnp.where(tir, -cost, cost)


def fresnel_rs(n0, n1, theta0, theta1):
    """Fresnel reflection coefficient, s-polarization."""
    num = n0 * jnp.cos(theta0) - n1 * jnp.cos(theta1)
    den = n0 * jnp.cos(theta0) + n1 * jnp.cos(theta1)
    return num / den


def fresnel_ts(n0, n1, theta0, theta1):
    """Fresnel transmission coefficient, s-polarization."""
    num = 2 * n0 * jnp.cos(theta0)
    den = n0 * jnp.cos(theta0) + n1 * jnp.cos(theta1)
    return num / den


def fresnel_rp(n0, n1, theta0, theta1):
    """Fresnel reflection coefficient, p-polarization."""
    num = n0 * jnp.cos(theta1) - n1 * jnp.cos(theta0)
    den = n0 * jnp.cos(theta1) + n1 * jnp.cos(theta0)
    return num / den


def fresnel_tp(n0, n1, theta0, theta1):
    """Fresnel transmission coefficient, p-polarization."""
    num = 2 * n0 * jnp.cos(theta0)
    den = n0 * jnp.cos(theta1) + n1 * jnp.cos(theta0)
    return num / den


def multilayer_stack_rt(indices, thicknesses, wavelength, polarization,
                        substrate_index, aoi=0, ambient_index=1):
    """r, t coefficients of a multilayer stack (characteristic matrices).

    indices/thicknesses: leading layer axis, trailing vectorized dims.
    wavelength um; polarization {'p', 's'}; aoi degrees.
    """
    polarization = polarization.lower()
    if polarization not in ('p', 's'):
        raise ValueError('unknown polarization, use p or s')
    aoi = jnp.radians(jnp.asarray(aoi, dtype=float))
    indices = jnp.atleast_1d(jnp.asarray(indices))
    thicknesses = jnp.atleast_1d(jnp.asarray(thicknesses))
    indices, thicknesses = jnp.broadcast_arrays(indices, thicknesses)
    if indices.shape[0] == 0:
        raise ValueError('indices and thicknesses must contain at least one film layer')

    cost0 = jnp.cos(aoi)

    def layer_mats(n, d):
        cost = _cos_snell(ambient_index, n, aoi)
        beta = (2 * jnp.pi * n * d * cost) / wavelength
        sinb, cosb = jnp.sin(beta), jnp.cos(beta)
        if polarization == 'p':
            upper_right = -1j * sinb * cost / n
            lower_left = -1j * n * sinb / cost
        else:
            upper_right = -1j * sinb / (cost * n)
            lower_left = -1j * n * sinb * cost
        return cosb, upper_right, lower_left

    c0, u0, l0 = layer_mats(indices[0], thicknesses[0])
    ones = jnp.ones_like(c0)
    m00, m01, m10, m11 = c0 * ones, u0 * ones, l0 * ones, c0 * ones

    if indices.shape[0] > 1:
        def step(carry, layer):
            m00, m01, m10, m11 = carry
            n, d = layer
            cosb, upper_right, lower_left = layer_mats(n, d)
            new00 = m00 * cosb + m01 * lower_left
            new01 = m00 * upper_right + m01 * cosb
            new10 = m10 * cosb + m11 * lower_left
            new11 = m10 * upper_right + m11 * cosb
            return (new00, new01, new10, new11), None

        (m00, m01, m10, m11), _ = lax.scan(
            step, (m00, m01, m10, m11), (indices[1:], thicknesses[1:]))

    substrate_index = jnp.asarray(substrate_index)
    cos_sub = _cos_snell(ambient_index, substrate_index, aoi)
    # Macleod B/C form: [B; C] = M @ [1; eta_sub] with tilted admittances
    # eta = n*cos (s) / n/cos (p); r = (eta0*B - C)/(eta0*B + C).  The
    # p-pol transmission amplitude carries an extra cos(aoi)/cos(aot)
    # obliquity factor relative to the plain 2*eta0/(eta0*B + C) form to
    # match the reference's field convention (thinfilm.py:295-311).
    if polarization == 'p':
        eta0 = ambient_index / cost0
        eta_sub = substrate_index / cos_sub
        obliquity = cost0 / cos_sub
    else:
        eta0 = ambient_index * cost0
        eta_sub = substrate_index * cos_sub
        obliquity = 1.0
    B = m00 + m01 * eta_sub
    C = m10 + m11 * eta_sub
    denom = eta0 * B + C
    r = (eta0 * B - C) / denom
    t = obliquity * 2 * eta0 / denom
    return r, t
