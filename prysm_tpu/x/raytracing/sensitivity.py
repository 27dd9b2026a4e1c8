"""Scalar-merit Jacobian over a LensData free vector.

Rebuild of ``prysm/x/raytracing/sensitivity.py``.
"""
import numpy as np

_PREC = np.float64


def central_difference(probe, base, h):
    """(probe(base + h), probe(base - h))."""
    return float(probe(base + h)), float(probe(base - h))


def fd_jacobian(f, x, step=1e-6, mask=None):
    """Central-difference gradient of scalar f over vector x."""
    x = np.asarray(x)
    n = len(x)
    J = np.zeros(n, dtype=_PREC)
    for i in range(n):
        if mask is not None and not mask[i]:
            continue
        v0 = float(x[i])
        h = step * (abs(v0) if v0 != 0.0 else 1.0)

        def probe(value, i=i):
            xx = np.array(x, copy=True)
            xx[i] = value
            return f(xx)

        fp, fm = central_difference(probe, v0, h)
        J[i] = (fp - fm) / (2.0 * h)
    return J


def merit_jacobian_free(dofs, merit, method='fd', step=1e-6):
    """Gradient of a scalar merit w.r.t. a system's dense free vector.

    dofs is the DesignState (pack/update); restored before return.
    """
    x0 = dofs.pack()
    if method != 'fd':
        raise ValueError(f"method must be 'fd', got {method!r}")

    def f(x):
        dofs.update(x)
        return float(merit())

    try:
        return fd_jacobian(f, x0, step=step)
    finally:
        dofs.update(x0)


__all__ = ['central_difference', 'fd_jacobian', 'merit_jacobian_free']
