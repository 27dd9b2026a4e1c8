"""Small math helpers shared across the package.

The reference's ``prysm/mathops.py`` is mostly a backend shim — JAX *is* the
backend here, so only the actual math helpers survive: ``jinc``, ``row_dot``,
and the tiny scalar utilities used by the Zernike index machinery.
"""
import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['jinc', 'row_dot', 'cis', 'cexp', 'is_odd', 'is_power_of_2',
           'sign', 'kronecker', 'gamma']


def cis(theta):
    """exp(i theta) for real theta, as cos + i sin.

    TPU-native complex exponential: XLA lowers exp(i x) to exactly this
    pair, and the experimental axon remote compiler stalls on the fused
    complex `exp` HLO, so the framework phrases every unit phasor this way.

    NumPy inputs stay on the host (numpy out): plan builders evaluate
    phase masks host-side so complex arrays never transfer eagerly.
    """
    if isinstance(theta, np.ndarray):
        return np.cos(theta) + 1j * np.sin(theta)
    return jax.lax.complex(jnp.cos(theta), jnp.sin(theta))


def cexp(z):
    """exp(z) for complex z: exp(Re z) * (cos(Im z) + i sin(Im z)).

    Real inputs pass through to jnp.exp unchanged.
    """
    z = jnp.asarray(z)
    if not jnp.iscomplexobj(z):
        return jnp.exp(z)
    return jnp.exp(z.real) * cis(z.imag)


def jinc(r):
    """Jinc: J1(r) / r for r != 0, 0.5 at r = 0 (first zero at r = pi).

    Computed via a where() substitution so the function is safe under jit
    and differentiable away from the singular point.  Matches reference
    semantics (prysm/mathops.py:232-257).
    """
    r = jnp.asarray(r)
    near0 = jnp.abs(r) < 1e-8
    safe = jnp.where(near0, 1.0, r)
    val = _j1(safe) / safe
    return jnp.where(near0, 0.5, val)


def _j1(x):
    """Bessel J1 via the standard Abramowitz & Stegun rational approximations.

    Accurate to ~1e-7 relative in float32 terms and fully elementwise/jit
    friendly; used instead of host scipy so jinc traces on device.
    """
    x = jnp.asarray(x)
    ax = jnp.abs(x)

    # |x| < 8: polynomial in x^2
    y_small = x * x
    num_s = x * (72362614232.0 + y_small * (-7895059235.0 + y_small * (
        242396853.1 + y_small * (-2972611.439 + y_small * (
            15704.48260 + y_small * -30.16036606)))))
    den_s = 144725228442.0 + y_small * (2300535178.0 + y_small * (
        18583304.74 + y_small * (99447.43394 + y_small * (
            376.9991397 + y_small))))
    small = num_s / den_s

    # |x| >= 8: asymptotic form
    z = 8.0 / jnp.maximum(ax, 1e-30)
    y_big = z * z
    xx = ax - 2.356194491
    p0 = 1.0 + y_big * (0.183105e-2 + y_big * (-0.3516396496e-4 + y_big * (
        0.2457520174e-5 + y_big * -0.240337019e-6)))
    p1 = 0.04687499995 + y_big * (-0.2002690873e-3 + y_big * (
        0.8449199096e-5 + y_big * (-0.88228987e-6 + y_big * 0.105787412e-6)))
    big = jnp.sqrt(0.636619772 / jnp.maximum(ax, 1e-30)) * (
        jnp.cos(xx) * p0 - z * jnp.sin(xx) * p1)
    big = big * jnp.sign(x)

    return jnp.where(ax < 8.0, small, big)


def row_dot(a, b):
    """Batched dot product over the trailing axis: sum(a * b, axis=-1).

    The reference hand-unrolls the length-3 case for memory bandwidth
    (prysm/mathops.py:168-229); XLA fuses the multiply-reduce automatically.
    """
    return jnp.sum(a * b, axis=-1)


def is_odd(int_to_check):
    """Whether an integer is odd (host-side)."""
    return int_to_check & 0x1


def is_power_of_2(value):
    """Whether a value is a power of 2 (host-side)."""
    if value == 1:
        return False
    return bool(value) and not value & (value - 1)


def sign(x):
    """Sign of a scalar with sign(0) = 1 (host-side, Zernike index math)."""
    return -1 if x < 0 else 1


def kronecker(i, j):
    """Kronecker delta (host-side)."""
    return 1 if i == j else 0


def gamma(n, m):
    """Recursive gamma coefficient (host-side scalar).

    Matches reference semantics (prysm/mathops.py:314-329).
    """
    if n == 1 and m == 2:
        return 3 / 8
    elif n == 1 and m > 2:
        mm1 = m - 1
        coef = (2 * mm1 + 1) / (2 * (mm1 - 1))
        return coef * gamma(1, mm1)
    else:
        nm1 = n - 1
        num = (nm1 + 1) * (2 * m + 2 * nm1 - 1)
        den = (m + nm1 - 2) * (2 * nm1 + 1)
        return (num / den) * gamma(nm1, m)
