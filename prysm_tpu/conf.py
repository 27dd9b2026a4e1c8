"""Precision configuration.

The reference library (prysm/conf.py:28-96) keeps a mutable global singleton
whose one functional knob is the working real dtype.  In a JAX framework a
mutable global that changes dtypes between traces would poison compilation
caches, so here the configuration is a tiny host-side object consumed only at
*trace time* (array construction); everything inside ``jit`` sees static
dtypes.

The default follows JAX's x64 state: float64 when ``jax_enable_x64`` is on
(CPU oracle tests vs the reference), float32 otherwise (TPU execution).

Importing this module also pins JAX's default matmul precision to
``'highest'``: on TPU, the MXU's default f32 matmul path accumulates at
bfloat16 mantissa width, which measured 4.5e-3 relative error on a 512^2
matrix-DFT against the f64 oracle — three orders of magnitude worse than
true f32 (5.7e-6) and far outside this library's accuracy tiers
(coronagraph contrast, interferometric OPD).  ``'highest'`` runs the
multi-pass f32-equivalent MXU path.  Speed-hungry users can opt back into
bf16 per scope with ``jax.default_matmul_precision('default')`` or via
``set_matmul_precision``.
"""
import jax
import jax.numpy as jnp

__all__ = ['config', 'Config', 'set_matmul_precision']

# accuracy over silent bf16: see module docstring
jax.config.update('jax_default_matmul_precision', 'highest')


def set_matmul_precision(mode):
    """Set the global matmul precision: 'highest' (default) | 'high' | 'default'.

    'default' is the TPU MXU's bf16-accumulation fast path (~4.5e-3
    relative on a 512^2 MDFT); use it only where that tier is acceptable.
    """
    jax.config.update('jax_default_matmul_precision', mode)

_COMPLEX_FOR_REAL = {
    jnp.dtype(jnp.float16): jnp.complex64,
    jnp.dtype(jnp.bfloat16): jnp.complex64,
    jnp.dtype(jnp.float32): jnp.complex64,
    jnp.dtype(jnp.float64): jnp.complex128,
}


class Config:
    """Global configuration of precision.

    Mirrors the API of the reference Config (prysm/conf.py:28-96): reading
    ``config.precision`` / ``config.precision_complex`` yields the working
    real/complex dtypes.  Unlike the reference there is no eager global dtype
    mutation: if never set, precision tracks the JAX x64 flag so the same code
    is float64 under oracle tests and float32 on TPU.
    """

    def __init__(self, precision=None):
        self._explicit = None
        if precision is not None:
            self.precision = precision

    @property
    def precision(self):
        """Real-valued working dtype."""
        if self._explicit is not None:
            return self._explicit
        return jnp.dtype(jnp.float64) if jax.config.jax_enable_x64 else jnp.dtype(jnp.float32)

    @precision.setter
    def precision(self, prec):
        """Accept a bit depth (16/32/64), a dtype-like, or None to reset.

        Mirrors the reference setter's input domain (conf.py:47-76):
        integers select the float of that width; anything numpy accepts
        as a real floating dtype passes through; everything else is a
        ValueError.
        """
        import numbers

        import numpy as np

        if prec is None:
            self._explicit = None
            return
        if isinstance(prec, numbers.Integral) and not isinstance(prec, bool):
            by_depth = {16: jnp.float16, 32: jnp.float32, 64: jnp.float64}
            if int(prec) not in by_depth:
                raise ValueError(
                    'precision bit depth must be one of 16, 32, 64; got '
                    f'{prec!r}')
            self._explicit = jnp.dtype(by_depth[int(prec)])
            return
        if prec in ('32', 'f32'):
            prec = jnp.float32
        elif prec in ('64', 'f64'):
            prec = jnp.float64
        try:
            dt = jnp.dtype(prec)
        except TypeError as exc:
            raise ValueError(f'{prec!r} is not a valid precision') from exc
        if np.dtype(dt).kind != 'f':
            raise ValueError(
                f'precision must be a real floating dtype, got {dt}')
        self._explicit = dt

    @property
    def precision_complex(self):
        """Complex-valued working dtype, paired with precision."""
        return jnp.dtype(_COMPLEX_FOR_REAL[self.precision])


config = Config()
