"""Ray (grid/fan) generation routines.

Rebuild of ``prysm/x/raytracing/raygen.py``; generation is trace-time setup
producing (N, 3) position/direction arrays.
"""
import numpy as onp
import jax.numpy as jnp

from ...conf import config
from ...coordinates import (
    make_rotation_matrix,
    polar_to_cart,
    promote_3d_point,
    sample_axis,
)


def concat_rayfans(*rayfans):
    """Merge N (P, S) rayfans into one batch."""
    ps = [p for p, s in rayfans]
    ss = [s for p, s in rayfans]
    return jnp.vstack(ps), jnp.vstack(ss)


def split_rayfans(P, chunksizes, S=None):
    """Split concatenated rayfans back into the input chunks."""
    expected_N = sum(chunksizes)
    if P.shape[0] != expected_N:
        raise ValueError('P is not sum(chunksizes) in length')
    ps = []
    low = 0
    for size in chunksizes:
        ps.append(P[low:low + size])
        low += size
    if S is None:
        return ps
    ss = []
    low = 0
    for size in chunksizes:
        ss.append(S[low:low + size])
        low += size
    return ps, ss


def _make_collimated_S(npoints, yangle=0, xangle=0):
    """(npoints, 3) direction cosines for collimated rays."""
    S = jnp.asarray([0., 0., 1.], dtype=config.precision)
    R = make_rotation_matrix((0, yangle, -xangle))
    S = jnp.matmul(R, S)
    return jnp.broadcast_to(S[None, :], (npoints, 3))


def generate_collimated_ray_fan(nrays, maxr, z=0, minr=None, azimuth=90,
                                yangle=0, xangle=0, distribution='uniform',
                                key=None):
    """1D fan of collimated rays -> (P, S)."""
    dtype = config.precision
    distribution = distribution.lower()
    if minr is None:
        minr = -maxr
    S = _make_collimated_S(nrays, yangle=yangle, xangle=xangle)
    r = sample_axis(distribution, minr, maxr, nrays, dtype=dtype, key=key)
    t = jnp.broadcast_to(jnp.radians(jnp.asarray(azimuth, dtype=dtype)), r.shape)
    x, y = polar_to_cart(r, t)
    z = jnp.broadcast_to(jnp.asarray(z, dtype=dtype), x.shape)
    return jnp.stack([x, y, z], axis=1), S


def generate_collimated_rect_ray_grid(nrays, maxx, z=0, minx=None, maxy=None,
                                      miny=None, yangle=0, xangle=0,
                                      distribution='uniform', key=None):
    """2D rectangular grid of collimated rays -> (P, S); nrays^2 total."""
    distribution = distribution.lower()
    if minx is None:
        minx = -maxx
    if maxy is None:
        maxy = maxx
    if miny is None:
        miny = -maxy
    S = _make_collimated_S(nrays * nrays, yangle=yangle, xangle=xangle)
    dtype = config.precision
    x = sample_axis(distribution, minx, maxx, nrays, dtype=dtype, key=key)
    y = sample_axis(distribution, miny, maxy, nrays, dtype=dtype, key=key)
    xx, yy = jnp.meshgrid(x, y)
    xx = xx.ravel()
    yy = yy.ravel()
    z = jnp.broadcast_to(jnp.asarray(z, dtype=dtype), xx.shape)
    return jnp.stack([xx, yy, z], axis=1), S


def generate_finite_ray_fan(nrays, na, P=0, min_na=None, azimuth=90,
                            yangle=0, xangle=0, n=1, distribution='uniform',
                            key=None):
    """1D fan of rays from a finite point with given NA -> (P, S)."""
    P = promote_3d_point(P, dtype=config.precision)
    distribution = distribution.lower()
    if min_na is None:
        min_na = -na
    max_t = float(onp.arcsin(na / n))
    min_t = float(onp.arcsin(min_na / n))
    t = sample_axis(distribution, min_t, max_t, nrays, key=key)
    l = jnp.sin(t)  # NOQA
    m = jnp.sqrt(1 - l * l)
    k = jnp.zeros_like(l)
    if azimuth == 0:
        k, l = l, k  # NOQA
    S = jnp.stack([k, l, m], axis=1)
    if yangle != 0 or xangle != 0:
        R = make_rotation_matrix((0, yangle, -xangle))
        S = jnp.matmul(R, S[..., None]).squeeze(-1)
    P = jnp.broadcast_to(P[None, :], (nrays, 3))
    return P, S


def clip_to_aperture(rayfan, aperture):
    """Pre-trace filter: keep rays whose origins pass the aperture."""
    P, S = rayfan
    inside = onp.asarray(aperture(P[..., 0], P[..., 1]), dtype=bool)
    return P[inside], S[inside]


def generate_collimated_hex_ray_grid(nrings, spacing, z=0, yangle=0, xangle=0):
    """Hexapolar grid of collimated rays: N = 1 + 3 nrings (nrings+1)."""
    if nrings < 0:
        raise ValueError(f'nrings must be >= 0, got {nrings}')
    pts_x = [0.0]
    pts_y = [0.0]
    for k in range(1, nrings + 1):
        nazi = 6 * k
        thetas = onp.linspace(0, 2 * onp.pi, nazi, endpoint=False)
        r = k * spacing
        pts_x.extend((r * onp.cos(thetas)).tolist())
        pts_y.extend((r * onp.sin(thetas)).tolist())
    nrays = 1 + 3 * nrings * (nrings + 1)
    xs = jnp.asarray(pts_x, dtype=config.precision)
    ys = jnp.asarray(pts_y, dtype=config.precision)
    zs = jnp.broadcast_to(jnp.asarray(z, dtype=config.precision), (nrays,))
    P = jnp.stack([xs, ys, zs], axis=1)
    S = _make_collimated_S(nrays, yangle=yangle, xangle=xangle)
    return P, S


def generate_collimated_radial_spiral_ray_grid(nrings, maxr, z=0,
                                               samples_per_ring=None,
                                               radial_distribution='cheby',
                                               include_center=True,
                                               yangle=0, xangle=0):
    """Radial-azimuthal spiral grid (Forbes-style Q-fitting sampling)."""
    if nrings < 1:
        raise ValueError(f'nrings must be >= 1, got {nrings}')
    if samples_per_ring is None:
        def samples_per_ring(k):
            return 6 * k
    if radial_distribution == 'cheby':
        k = onp.arange(1, nrings + 1)
        nodes = onp.cos((nrings - k + 0.5) * onp.pi / (2 * nrings))
        radii = maxr * nodes
    else:
        radii = onp.asarray(sample_axis(radial_distribution, 0.0, maxr,
                                        nrings + 1))[1:]
    pts_x = []
    pts_y = []
    if include_center:
        pts_x.append(0.0)
        pts_y.append(0.0)
    for k, r in enumerate(radii, start=1):
        nazi = int(samples_per_ring(k))
        if nazi <= 0:
            continue
        offset = (onp.pi / nazi) * (k % 2)
        thetas = onp.linspace(0, 2 * onp.pi, nazi, endpoint=False) + offset
        pts_x.extend((float(r) * onp.cos(thetas)).tolist())
        pts_y.extend((float(r) * onp.sin(thetas)).tolist())
    nrays = len(pts_x)
    xs = jnp.asarray(pts_x, dtype=config.precision)
    ys = jnp.asarray(pts_y, dtype=config.precision)
    zs = jnp.broadcast_to(jnp.asarray(z, dtype=config.precision), (nrays,))
    P = jnp.stack([xs, ys, zs], axis=1)
    S = _make_collimated_S(nrays, yangle=yangle, xangle=xangle)
    return P, S
