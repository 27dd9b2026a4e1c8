"""XY monomials x^m y^n (reference: prysm/polynomials/xy.py).

Sums evaluate via separable power tables and two matmuls
(y_powers.T @ C @ x_powers), which lands directly on the MXU.
"""
import numpy as np
import jax.numpy as jnp

from ..coordinates import optimize_xy_separable


def xy_j_to_mn(j):
    """Convert a mono-index j into the (m, n) powers; j=1 is piston."""
    if j < 1:
        raise ValueError('j must be >= 1')
    if j == 1:
        return 0, 0
    total_order = int(np.ceil((np.sqrt(8 * j + 1) - 3) / 2))
    first_j = total_order * (total_order + 1) // 2 + 1
    y_order = j - first_j
    x_order = total_order - y_order
    return x_order, y_order


def xy(m, n, x, y, cartesian_grid=True):
    """XY monomial x^m * y^n."""
    if cartesian_grid:
        x, y = optimize_xy_separable(x, y)
    return x ** m * y ** n


def xy_der_x(m, n, x, y, cartesian_grid=True):
    """d/dx of x^m y^n = m x^(m-1) y^n (0 when m == 0)."""
    if cartesian_grid:
        x, y = optimize_xy_separable(x, y)
    if m == 0:
        return jnp.zeros(jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y)),
                         dtype=jnp.asarray(x).dtype)
    return m * x ** (m - 1) * y ** n


def xy_der_y(m, n, x, y, cartesian_grid=True):
    """d/dy of x^m y^n = n x^m y^(n-1) (0 when n == 0)."""
    if cartesian_grid:
        x, y = optimize_xy_separable(x, y)
    if n == 0:
        return jnp.zeros(jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y)),
                         dtype=jnp.asarray(x).dtype)
    return n * x ** m * y ** (n - 1)


def xy_der_xy(m, n, x, y, cartesian_grid=True):
    """d2/dxdy of x^m y^n = m n x^(m-1) y^(n-1) (0 when m or n == 0)."""
    if cartesian_grid:
        x, y = optimize_xy_separable(x, y)
    if m == 0 or n == 0:
        return jnp.zeros(jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y)),
                         dtype=jnp.asarray(x).dtype)
    return (m * n) * x ** (m - 1) * y ** (n - 1)


def _monomial_seq(maxk, z):
    """[z^0, z^1, ..., z^maxk] as a list (cumulative products)."""
    out = [jnp.ones_like(z)]
    current = None
    for _ in range(1, maxk + 1):
        current = z if current is None else current * z
        out.append(current)
    return out


def _monomial_der_seq(maxk, z):
    """[0, 1, 2z, ..., maxk z^(maxk-1)] as a list."""
    out = [jnp.zeros_like(z)]
    if maxk == 0:
        return out
    out.append(jnp.ones_like(z))
    current = None
    for k in range(2, maxk + 1):
        current = z if current is None else current * z
        out.append(k * current)
    return out


def _xy_seq_with(mns, x, y, cartesian_grid, x_powers_op, y_powers_op):
    mns2 = np.asarray(mns)
    maxm, maxn = mns2.max(axis=0)
    if cartesian_grid and x.ndim > 1:
        x, y = optimize_xy_separable(x, y)
    x_seq = x_powers_op(int(maxm), x)
    y_seq = y_powers_op(int(maxn), y)
    shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y))
    out = [jnp.broadcast_to(x_seq[m] * y_seq[n], shape) for m, n in mns2]
    return jnp.stack(out)


def xy_seq(mns, x, y, cartesian_grid=True):
    """XY monomials at (m, n) pairs; shape (len(mns), *grid.shape)."""
    return _xy_seq_with(mns, x, y, cartesian_grid, _monomial_seq, _monomial_seq)


def xy_der_x_seq(mns, x, y, cartesian_grid=True):
    """d/dx of the XY monomial seq."""
    return _xy_seq_with(mns, x, y, cartesian_grid, _monomial_der_seq, _monomial_seq)


def xy_der_y_seq(mns, x, y, cartesian_grid=True):
    """d/dy of the XY monomial seq."""
    return _xy_seq_with(mns, x, y, cartesian_grid, _monomial_seq, _monomial_der_seq)


def xy_der_xy_seq(mns, x, y, cartesian_grid=True):
    """Mixed d2/dxdy of the XY monomial seq."""
    return _xy_seq_with(mns, x, y, cartesian_grid, _monomial_der_seq, _monomial_der_seq)


def _monomial_table(maxk, z):
    """(maxk+1, len(z)) array of powers z^0..z^maxk."""
    z = z.reshape(-1)
    rows = [jnp.ones_like(z)]
    for _ in range(1, maxk + 1):
        rows.append(rows[-1] * z)
    return jnp.stack(rows)


def _xy_coefficient_matrices(coefs, mns, dtype):
    """Pack sparse XY coefficients into dense host-side power tables."""
    mns2 = np.asarray(mns)
    maxm, maxn = mns2.max(axis=0)
    coefs = np.asarray(coefs, dtype=np.float64)
    mat = np.zeros((maxn + 1, maxm + 1))
    dx_mat = np.zeros_like(mat)
    dy_mat = np.zeros_like(mat)
    for c, (m, n) in zip(coefs, mns2):
        mat[n, m] += c
        if m:
            dx_mat[n, m - 1] += c * m
        if n:
            dy_mat[n - 1, m] += c * n
    return (jnp.asarray(mat, dtype), jnp.asarray(dx_mat, dtype),
            jnp.asarray(dy_mat, dtype))


def _xy_sum_cartesian(coefs, mns, x, y, with_derivatives):
    x, y = optimize_xy_separable(x, y)
    mns2 = np.asarray(mns)
    maxm, maxn = mns2.max(axis=0)
    x_powers = _monomial_table(int(maxm), x)
    y_powers = _monomial_table(int(maxn), y)
    mat, dx_mat, dy_mat = _xy_coefficient_matrices(coefs, mns2, x_powers.dtype)
    z = y_powers.T @ mat @ x_powers
    if not with_derivatives:
        return z
    dzdx = y_powers.T @ dx_mat @ x_powers
    dzdy = y_powers.T @ dy_mat @ x_powers
    return z, dzdx, dzdy


def xy_sum(coefs, mns, x, y, cartesian_grid=True):
    """Weighted sum of XY monomials."""
    mns = tuple(mns)
    if not mns:
        return jnp.zeros_like(x)
    if cartesian_grid and x.ndim > 1:
        return _xy_sum_cartesian(coefs, mns, x, y, with_derivatives=False)
    modes = xy_seq(mns, x, y, cartesian_grid=cartesian_grid)
    return jnp.tensordot(jnp.asarray(coefs, dtype=modes.dtype), modes, axes=1)


def xy_sum_der_xy(coefs, mns, x, y, cartesian_grid=True):
    """Weighted XY sum and its Cartesian first derivatives."""
    mns = tuple(mns)
    if not mns:
        z = jnp.zeros_like(x)
        return z, z, jnp.zeros_like(y)
    if cartesian_grid and x.ndim > 1:
        return _xy_sum_cartesian(coefs, mns, x, y, with_derivatives=True)
    coefs = jnp.asarray(coefs)
    modes = xy_seq(mns, x, y, cartesian_grid=cartesian_grid)
    dx_modes = xy_der_x_seq(mns, x, y, cartesian_grid=cartesian_grid)
    dy_modes = xy_der_y_seq(mns, x, y, cartesian_grid=cartesian_grid)
    coefs = coefs.astype(modes.dtype)
    z = jnp.tensordot(coefs, modes, axes=1)
    dzdx = jnp.tensordot(coefs, dx_modes, axes=1)
    dzdy = jnp.tensordot(coefs, dy_modes, axes=1)
    return z, dzdx, dzdy
