"""Math helpers and the user-facing backend shim.

JAX is the compute backend of this framework — every internal module uses
``jax.numpy`` directly, so unlike the reference (``prysm/mathops.py:11-116``)
nothing *inside* ``prysm_tpu`` routes through a swappable shim.  The shim
surface survives for user code written against the reference's
``from prysm.mathops import np`` idiom: here it defaults to JAX (``np`` ->
``jax.numpy``, ``fft`` -> ``jax.numpy.fft``, scipy namespaces ->
``jax.scipy.*``) and the ``set_backend_to_*`` functions remap only that
user-facing surface, never the framework's own jitted kernels.
"""
from numbers import Number
import warnings

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    'host_planner','jinc', 'row_dot', 'cis', 'cexp', 'is_odd', 'is_power_of_2',
           'sign', 'kronecker', 'gamma', 'BackendShim',
           'set_backend_to_defaults', 'set_backend_to_numpy',
           'set_backend_to_cupy', 'set_backend_to_pytorch',
           'set_backend_to_mlx', 'set_fft_backend_to_mkl_fft',
           'array_to_true_numpy']

_truenp = np
_scalar_types = (Number, _truenp.generic)


def cis(theta):
    """exp(i theta) for real theta, as cos + i sin.

    TPU-native complex exponential: XLA lowers exp(i x) to exactly this
    pair, and the experimental axon remote compiler stalls on the fused
    complex `exp` HLO, so the framework phrases every unit phasor this way.

    NumPy inputs stay on the host (numpy out): plan builders evaluate
    phase masks host-side so complex arrays never transfer eagerly.
    """
    if isinstance(theta, _truenp.ndarray):
        return _truenp.cos(theta) + 1j * _truenp.sin(theta)
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


def host_planner():
    """Context manager running planner math on the host CPU backend.

    Library planners (composite apertures, DM setup, executor builders)
    produce arrays that later embed into jitted programs as constants.
    Host (CPU-backend) arrays embed for free; accelerator arrays would be
    read back through the device link at trace time — on a relay-attached
    TPU each read costs ~1 ms and permanently de-pipelines the dispatch
    queue.  Usage::

        with host_planner():
            ifn = build_influence_functions(...)
        ifn = truenp.asarray(ifn)   # host constant
    """
    import contextlib
    import jax
    try:
        if jax.default_backend() != 'cpu':
            return jax.default_device(jax.local_devices(backend='cpu')[0])
    except RuntimeError:
        pass
    return contextlib.nullcontext()


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


class BackendShim:
    """A shim that allows a backend to be swapped at runtime.

    Same contract as the reference (prysm/mathops.py:11-22): attribute
    access forwards to ``_srcmodule``.  Here the shims default to JAX and
    only affect user code written against them — prysm_tpu's own kernels
    call ``jax.numpy`` directly and always run through XLA.
    """

    def __init__(self, src):
        self._srcmodule = src

    def __getattr__(self, key):
        if key == '_srcmodule':
            return self._srcmodule
        return getattr(self._srcmodule, key)


def _jax_backend_modules():
    from jax.scipy import ndimage as jndimage
    from jax.scipy import signal as jsignal
    from jax.scipy import optimize as joptimize
    from jax.scipy import linalg as jlinalg
    try:
        from jax.scipy import interpolate as jinterpolate
    except ImportError:  # pragma: no cover - present in all supported jax
        jinterpolate = None
    return jnp, jnp.fft, jndimage, jinterpolate, joptimize, jsignal, jlinalg


# user-facing swappable namespaces; default source is JAX (the TPU backend)
(_dnp, _dfft, _dndimage, _dinterpolate,
 _doptimize, _dsignal, _dlinalg) = _jax_backend_modules()
backend_np = BackendShim(_dnp)
backend_fft = BackendShim(_dfft)
backend_ndimage = BackendShim(_dndimage)
backend_interpolate = BackendShim(_dinterpolate)
backend_optimize = BackendShim(_doptimize)
backend_signal = BackendShim(_dsignal)
backend_linalg = BackendShim(_dlinalg)

# reference-compatible names (prysm/mathops.py:33-45 exports these as
# `np`, `fft`, ...; the bare names here would shadow host numpy inside
# this module, so the canonical objects are backend_* and these aliases
# are assigned once all host-side helpers above have bound `_truenp`)
fft = backend_fft
ndimage = backend_ndimage
interpolate = backend_interpolate
optimize = backend_optimize
signal = backend_signal
linalg = backend_linalg


def set_backend_to_defaults():
    """Restore the default (JAX) user-facing backend namespaces.

    The reference's defaults are numpy/scipy (prysm/mathops.py:77-87);
    the TPU framework's default is JAX.  Use :func:`set_backend_to_numpy`
    for host numpy/scipy semantics.
    """
    (backend_np._srcmodule, backend_fft._srcmodule,
     backend_ndimage._srcmodule, backend_interpolate._srcmodule,
     backend_optimize._srcmodule, backend_signal._srcmodule,
     backend_linalg._srcmodule) = _jax_backend_modules()


def set_backend_to_numpy():
    """Point the user-facing namespaces at host numpy/scipy.

    Matches what the reference calls "defaults" (prysm/mathops.py:77-87).
    """
    import scipy.linalg
    from scipy import ndimage as sndimage, interpolate as sinterpolate
    from scipy import fft as sfft, optimize as soptimize, signal as ssignal
    backend_np._srcmodule = _truenp
    backend_fft._srcmodule = sfft
    backend_ndimage._srcmodule = sndimage
    backend_interpolate._srcmodule = sinterpolate
    backend_optimize._srcmodule = soptimize
    backend_signal._srcmodule = ssignal
    backend_linalg._srcmodule = scipy.linalg


def set_backend_to_cupy():
    """Point the user-facing namespaces at CuPy (prysm/mathops.py:48-75).

    Raises ImportError where CuPy is not installed (e.g. TPU hosts),
    exactly as the reference does.
    """
    import cupy as cp
    from cupyx.scipy import fft as cpfft, ndimage as cpndimage
    from cupyx.scipy import interpolate as cpinterpolate
    backend_np._srcmodule = cp
    backend_fft._srcmodule = cpfft
    backend_ndimage._srcmodule = cpndimage
    backend_interpolate._srcmodule = cpinterpolate
    for name, shim in (('signal', backend_signal), ('linalg', backend_linalg)):
        try:
            import importlib
            shim._srcmodule = importlib.import_module(f'cupyx.scipy.{name}')
        except ImportError:
            pass


def set_backend_to_pytorch():
    """Point np/fft at torch (prysm/mathops.py:90-98); other namespaces keep JAX."""
    import torch
    backend_np._srcmodule = torch
    backend_fft._srcmodule = torch.fft
    warnings.warn('set_backend_to_pytorch: only np and fft remapped; '
                  'ndimage, interpolate, optimize, and signal remain on JAX.')


def set_backend_to_mlx():
    """Point np/fft at MLX (prysm/mathops.py:101-110); other namespaces keep JAX."""
    import mlx.core as mx
    backend_np._srcmodule = mx
    backend_fft._srcmodule = mx.fft
    warnings.warn('set_backend_to_mlx: only np and fft remapped; '
                  'ndimage, interpolate, optimize, signal, and linalg remain on JAX.')


def set_fft_backend_to_mkl_fft():
    """Point the fft namespace at mkl_fft (prysm/mathops.py:113-118)."""
    from mkl_fft import _numpy_fft as mklfft
    backend_fft._srcmodule = mklfft


def array_to_true_numpy(*args):
    """Convert arrays from any backend to bona-fide host numpy arrays.

    Reference parity (prysm/mathops.py:119-165) plus JAX: device arrays
    transfer host-side via ``numpy.asarray`` (one device->host copy).
    Scalars and numpy arrays pass through; returns a single array for a
    single input, else a list.
    """
    if len(args) == 0:
        return None
    out = []
    for arg in args:
        if isinstance(arg, _scalar_types) or isinstance(arg, _truenp.ndarray):
            out.append(arg)
        elif isinstance(arg, jax.Array):
            out.append(_truenp.asarray(arg))
        elif hasattr(arg, 'get'):  # cupy
            out.append(arg.get())
        elif hasattr(arg, 'numpy'):  # torch
            out.append(arg.numpy(force=True))
        else:  # mlx and other array-protocol libraries
            out.append(_truenp.array(arg))
    if len(out) == 1:
        return out[0]
    return out


# reference drop-in name: `from prysm_tpu.mathops import np` gives the
# swappable shim (default JAX).  Assigned last; module internals above
# bind host numpy as _truenp and never read this global at call time.
np = backend_np
