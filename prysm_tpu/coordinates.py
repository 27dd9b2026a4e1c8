"""Coordinate grids, conversions, homographies, and warping.

TPU-native rebuild of the reference ``prysm/coordinates.py``.  Grid
construction happens at trace time with static shapes; interpolation (warp /
polar resampling) is implemented directly on ``jax.numpy`` with gather-based
bilinear lookup so it is differentiable and ``vmap``/``shard_map`` friendly
(the reference delegates to scipy ndimage/RegularGridInterpolator,
prysm/coordinates.py:269-341,644-672).
"""
import numpy as np  # host-side small-matrix construction only
import jax.numpy as jnp

from .conf import config
from .fttools import fftrange


def optimize_xy_separable(x, y):
    """Reduce 2D x, y grids to broadcastable 1D row/column vectors.

    Separable operations on an (N, N) meshgrid cost 2N^2; on broadcast 1D
    vectors they cost 2N (reference rationale: prysm/coordinates.py:11-45).
    """
    if x.ndim == 2:
        x = x[0, :]
        y = y[:, 0][:, jnp.newaxis]
    else:
        x = x.reshape(1, -1)
        y = y.reshape(-1, 1)
    return x, y


def broadcast_1d_to_2d(x, y):
    """Broadcast two (x, y) vectors to 2D grids."""
    shpx = (y.size, x.size)
    xx = jnp.broadcast_to(x, shpx)
    yy = jnp.broadcast_to(y[:, jnp.newaxis], shpx)
    return xx, yy


def cart_to_polar(x, y, vec_to_grid=True):
    """(rho, phi) polar coordinates of the (x, y) input points."""
    if vec_to_grid and hasattr(x, 'ndim') and x.ndim == 1:
        y = y[:, jnp.newaxis]
        x = x[jnp.newaxis, :]
    rho = jnp.hypot(x, y)
    phi = jnp.arctan2(y, x)
    return rho, phi


def polar_to_cart(rho, phi):
    """(x, y) cartesian coordinates of the (rho, phi) input points."""
    x = rho * jnp.cos(phi)
    y = rho * jnp.sin(phi)
    return x, y


def make_xy_grid(shape, *, dx=0, diameter=0, grid=True, host=False):
    """Create an FFT-aligned x, y grid with given spacing or diameter.

    Matches the reference convention exactly (prysm/coordinates.py:344-378):
    samples at fftrange(n) * dx, i.e. the zero-coordinate sample sits at
    index n//2.

    host=True builds the grid in numpy instead of on the device — use it
    when the grid feeds host-side planners (composite apertures, launch
    geometry): on relay-attached TPUs a later device->host read of a grid
    scalar costs ~1 ms and permanently de-pipelines the dispatch queue.
    """
    if not isinstance(shape, tuple):
        shape = (shape, shape)
    if diameter != 0:
        dx = diameter / max(shape)
    if host:
        import numpy as onp
        dtype = onp.dtype(str(jnp.dtype(config.precision)))
        y, x = (onp.fft.fftshift(onp.fft.fftfreq(s, 1 / s)).astype(dtype)
                * dx for s in shape)
        if grid:
            x, y = onp.meshgrid(x, y)
        return x, y
    y, x = (fftrange(s, dtype=config.precision) * dx for s in shape)
    if grid:
        x, y = jnp.meshgrid(x, y)
    return x, y


def sample_axis(distribution, lo, hi, n, dtype=None, key=None):
    """Samples between two endpoints under a named distribution.

    'random' requires an explicit jax.random key (the reference used global
    numpy RNG state, prysm/coordinates.py:157).
    """
    if dtype is None:
        dtype = config.precision
    if n == 1:
        return jnp.asarray([(lo + hi) / 2.0], dtype=dtype)
    distribution = distribution.lower()
    if distribution == 'uniform':
        return jnp.linspace(lo, hi, n, dtype=dtype)
    if distribution == 'random':
        if key is None:
            raise ValueError("distribution 'random' requires a jax.random key")
        import jax.random as jr
        return jr.uniform(key, (n,), dtype=dtype, minval=lo, maxval=hi)
    if distribution == 'cheby':
        k = jnp.arange(n)
        nodes = jnp.cos(k * jnp.pi / (n - 1))
        return ((lo + hi) / 2.0 - (hi - lo) / 2.0 * nodes).astype(dtype)
    raise ValueError(f'unknown distribution {distribution!r}; '
                     "expected 'uniform', 'random', or 'cheby'")


def promote_3d_point(P, dtype=None):
    """Coerce a scalar or trailing-coordinate iterable into a 3-vector."""
    if dtype is None:
        dtype = config.precision
    if not hasattr(P, '__iter__'):
        return jnp.asarray([0, 0, P], dtype=dtype)
    P = list(P)
    if not 1 <= len(P) <= 3:
        raise ValueError('P must contain one to three coordinates')
    out = [0.0, 0.0, 0.0]
    out[-len(P):] = P
    return jnp.asarray(out, dtype=dtype)


def make_rotation_matrix(zyx, radians=False, host=False):
    """3x3 rotation matrix from (Z, Y, X) Euler angles.

    Built host-side in numpy (reference: prysm/coordinates.py:381-429);
    host=True skips the device conversion so host-side planners can
    consume the matrix without a later device read.
    """
    ZYX = np.zeros(3)
    ZYX[:len(zyx)] = zyx
    if not radians:
        ZYX = np.radians(ZYX)
    gamma, beta, alpha = ZYX
    c1, c2, c3 = np.cos(alpha), np.cos(beta), np.cos(gamma)
    s1, s2, s3 = np.sin(alpha), np.sin(beta), np.sin(gamma)
    Rx = np.asarray([[1, 0, 0], [0, c1, -s1], [0, s1, c1]])
    Ry = np.asarray([[c2, 0, s2], [0, 1, 0], [-s2, 0, c2]])
    Rz = np.asarray([[c3, -s3, 0], [s3, c3, 0], [0, 0, 1]])
    out = Rx @ Ry @ Rz
    if host:
        return out.astype(np.dtype(str(jnp.dtype(config.precision))))
    return jnp.asarray(out, dtype=config.precision)


def coerce_3d_rotation(R):
    """None, a supplied rotation matrix, or a matrix from (Z,Y,X) Euler angles."""
    if isinstance(R, (list, tuple)):
        return make_rotation_matrix(R)
    return R


def apply_tilt_decenter(P, R, tilt=None, decenter=None,
                        tilt_radians=False, dtype=None):
    """Combine a base 3D position and rotation with tilt/decenter offsets."""
    if dtype is None:
        dtype = config.precision
    if decenter is not None:
        decenter = jnp.asarray(decenter, dtype=dtype)
        if decenter.shape != (3,):
            raise ValueError(
                f'decenter must be a length-3 vector, got shape {decenter.shape}')
        P = P + decenter
    if tilt is not None:
        R_tilt = make_rotation_matrix(tilt, radians=tilt_radians)
        R = R_tilt if R is None else R @ R_tilt
    return P, R


def promote_3d_transformation_to_homography(M):
    """3x3 transformation -> 4x4 homography."""
    M = np.asarray(M)
    out = np.zeros((4, 4))
    out[:3, :3] = M
    out[3, 3] = 1
    return jnp.asarray(out, dtype=config.precision)


def promote_affine_transformation_to_homography(Maff):
    """2x3 affine transformation -> 3x3 homography."""
    Maff = np.asarray(Maff)
    out = np.zeros((3, 3))
    out[:2, :3] = Maff
    out[2, 2] = 1
    return jnp.asarray(out, dtype=config.precision)


def make_homomorphic_translation_matrix(tx=0, ty=0, tz=0):
    """4x4 homography translating (x, y, z) by (tx, ty, tz)."""
    out = np.eye(4)
    out[0, -1] = tx
    out[1, -1] = ty
    out[2, -1] = tz
    return jnp.asarray(out, dtype=config.precision)


def drop_z_3d_transformation(M):
    """Drop the Z row/column of a 4x4 homography -> 3x3 (x, y, w)."""
    mask = jnp.asarray([0, 1, 3])
    return M[mask][:, mask]


def pack_xy_to_homographic_points(x, y):
    """Pack (x, y) arrays into a 3xN homogeneous-coordinate matrix."""
    xr = jnp.ravel(x)
    return jnp.stack([xr, jnp.ravel(y), jnp.ones_like(xr)], axis=0)


def apply_homography(M, x, y):
    """Apply a 3x3 homography to (x, y) point arrays."""
    points = pack_xy_to_homographic_points(x, y)
    xp, yp, w = M @ points
    xp = xp / w
    yp = yp / w
    if x.ndim > 1:
        xp = jnp.reshape(xp, x.shape)
        yp = jnp.reshape(yp, x.shape)
    return xp, yp


def solve_for_planar_homography(src, dst):
    """Planar homography H with H * src = dst (normalized DLT).

    Host-side numpy: this is a tiny SVD solved once at setup time, not a
    device computation.
    """
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    if src.ndim != 2 or src.shape[-1] != 2 or src.shape != dst.shape:
        raise ValueError('src and dst must be matching (N, 2) point sets')
    if src.shape[0] < 4:
        raise ValueError('the DLT needs at least four correspondences')

    def normalize(points):
        # Hartley conditioning: centroid to the origin, mean radius sqrt(2)
        center = points.mean(axis=0)
        spread = np.hypot(*(points - center).T).mean()
        if spread == 0:
            raise ValueError('points must not all coincide')
        s = np.sqrt(2) / spread
        T = np.array([[s, 0.0, -s * center[0]],
                      [0.0, s, -s * center[1]],
                      [0.0, 0.0, 1.0]])
        return (points - center) * s, T

    srcn, Tsrc = normalize(src)
    dstn, Tdst = normalize(dst)
    # DLT design matrix, assembled blockwise from the homogeneous source
    # points: each correspondence contributes [-p1, 0, x2 p1] (x equation)
    # and [0, -p1, y2 p1] (y equation); row order does not affect the
    # nullspace, so the x block stacks above the y block.
    p1 = np.column_stack((srcn, np.ones(len(srcn))))
    zero = np.zeros_like(p1)
    x2 = dstn[:, :1]
    y2 = dstn[:, 1:]
    A = np.concatenate([
        np.concatenate([-p1, zero, x2 * p1], axis=1),
        np.concatenate([zero, -p1, y2 * p1], axis=1),
    ], axis=0)
    if np.linalg.matrix_rank(A) < 8:
        raise ValueError('point configuration is degenerate')
    Hn = np.linalg.svd(A)[2][-1].reshape(3, 3)
    H = np.linalg.inv(Tdst) @ Hn @ Tsrc
    w = H[2, 2]
    H = H / (w if abs(w) > np.finfo(H.dtype).eps else np.linalg.norm(H))
    return jnp.asarray(H, dtype=config.precision)


def _bilinear_lookup(img, rows, cols):
    """Differentiable bilinear sample of img at fractional (row, col) points.

    Points outside [0, N-1] on either axis return exactly 0, matching scipy
    map_coordinates' mode='constant', cval=0 semantics (the whole sample is
    cval once the point leaves the domain, no partial blending).
    """
    nr, nc = img.shape[-2:]
    inside = (rows >= 0) & (rows <= nr - 1) & (cols >= 0) & (cols <= nc - 1)
    r0 = jnp.floor(rows)
    c0 = jnp.floor(cols)
    fr = rows - r0
    fc = cols - c0
    r0 = r0.astype(jnp.int32)
    c0 = c0.astype(jnp.int32)
    r1 = r0 + 1
    c1 = c0 + 1

    def gather(ri, ci):
        ric = jnp.clip(ri, 0, nr - 1)
        cic = jnp.clip(ci, 0, nc - 1)
        return img[..., ric, cic]

    v00 = gather(r0, c0)
    v01 = gather(r0, c1)
    v10 = gather(r1, c0)
    v11 = gather(r1, c1)
    top = v00 * (1 - fc) + v01 * fc
    bot = v10 * (1 - fc) + v11 * fc
    out = top * (1 - fr) + bot * fr
    return jnp.where(inside, out, 0)


def warp(img, xnew, ynew):
    """Warp an image via "pull" (dst -> src) lookup with bilinear interpolation.

    The reference uses cubic-spline map_coordinates
    (prysm/coordinates.py:644-672); bilinear is the TPU-native choice — a
    four-point gather that is differentiable and fuses, with no sequential
    prefilter pass.
    """
    return _bilinear_lookup(img, ynew, xnew)


def uniform_cart_to_polar(x, y, data):
    """Interpolate uniformly-sampled cartesian data onto a polar grid.

    Returns (rho, phi, f(rho, phi)); bilinear interpolation.
    """
    x, y = optimize_xy_separable(x, y)
    xv = x.ravel()
    yv = y.ravel()
    _max = jnp.max(jnp.abs(jnp.asarray([xv[0], xv[-1], yv[0], yv[-1]])))
    rho = jnp.linspace(0, _max, xv.size)
    phi = jnp.linspace(0, 2 * jnp.pi, yv.size)
    rv, pv = jnp.meshgrid(rho, phi)
    xq, yq = polar_to_cart(rv, pv)
    # fractional indices into the uniform grid
    dx = xv[1] - xv[0]
    dy = yv[1] - yv[0]
    cols = (xq - xv[0]) / dx
    rows = (yq - yv[0]) / dy
    return rho, phi, _bilinear_lookup(data, rows, cols)


def resample_2d(array, sample_pts, query_pts, kind='linear'):
    """Resample a 2D array from uniform sample_pts onto query_pts grids.

    sample_pts/query_pts are (x, y) 1D vector pairs as in the reference
    (prysm/coordinates.py:319-341); only uniform source grids are supported
    and interpolation is bilinear.
    """
    x, y = sample_pts
    xq, yq = query_pts
    xq2, yq2 = jnp.meshgrid(xq, yq)
    dx = x[1] - x[0]
    dy = y[1] - y[0]
    cols = (xq2 - x[0]) / dx
    rows = (yq2 - y[0]) / dy
    return _bilinear_lookup(array, rows, cols)


def distort_annular_grid(r, eps):
    """Distort an annular grid so the annulus [eps, 1] maps to the unit disk."""
    return (r - eps) * (1 / (1 - eps))


def chebygauss_quadrature_xy(rings, radius=1, spokes=-1, center=(0, 0)):
    """Chebyshev-Gauss quadrature sampling of a polar grid (Forbes spiral).

    Host-side construction; returns jnp arrays of (x, y) sample points.
    Reference: prysm/coordinates.py:702-758.
    """
    if spokes == -1:
        spokes = 2 * rings + 1
    n = rings
    radii = []
    for k in range(1, n + 1):
        xk = 0.5 + 0.5 * np.cos(((2 * k - 1) / (2 * n)) * np.pi)
        radii.append(xk * radius)
    psi = (5 ** 0.5 + 1) / 2
    o_x = np.empty(spokes * len(radii))
    o_y = np.empty(spokes * len(radii))
    lower = 0
    for k, rr in enumerate(radii):
        Delta = 2 * np.pi / spokes
        j = np.arange(1, spokes + 1, dtype=np.float64)
        t = (j + ((k + 1) / psi)) * Delta
        o_x[lower:lower + spokes] = rr * np.cos(t)
        o_y[lower:lower + spokes] = rr * np.sin(t)
        lower += spokes
    return (jnp.asarray(o_x + center[0], dtype=config.precision),
            jnp.asarray(o_y + center[1], dtype=config.precision))
