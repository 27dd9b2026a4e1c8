"""Pallas kernel dispatch control.

Modes:

* ``'auto'`` (default) — Pallas kernels run compiled when the default JAX
  backend is a TPU, otherwise the jnp twins run.
* ``'force'`` — always use the Pallas kernels, compiled.
* ``'interpret'`` — always use the Pallas kernels in interpreter mode
  (CPU-testable; used by the test suite to validate kernels off-TPU).
* ``'off'`` — never use Pallas.

The mode is consulted at *trace time* (host Python), so flipping it between
jit calls retraces cleanly; it is never read inside a compiled program.
"""
import jax

_MODE = 'auto'
_VALID = ('auto', 'force', 'interpret', 'off')


def set_pallas_mode(mode):
    """Set the global Pallas dispatch mode ('auto'|'force'|'interpret'|'off')."""
    global _MODE
    if mode not in _VALID:
        raise ValueError(f'pallas mode must be one of {_VALID}, got {mode!r}')
    _MODE = mode


def get_pallas_mode():
    """Current Pallas dispatch mode."""
    return _MODE


def pallas_enabled():
    """True when Pallas kernels should be used at this trace point."""
    if _MODE == 'off':
        return False
    if _MODE in ('force', 'interpret'):
        return True
    try:
        return jax.default_backend() in ('tpu', 'axon')
    except RuntimeError:  # pragma: no cover - backend init failure
        return False


def pallas_interpret():
    """True when kernels should run in interpreter mode."""
    return _MODE == 'interpret'
