"""Ray bundle generators: fans, grids, hexapolar and spiral samplings.

API parity target: ``prysm/x/raytracing/raygen.py``.  Generation is
trace-time setup producing (N, 3) position/direction arrays; every
generator funnels through :func:`_bundle` (stack transverse samples with a
z plane) and :func:`_tilted_axis` (the collimated direction field).
"""
from itertools import accumulate

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
    return (jnp.vstack([p for p, _ in rayfans]),
            jnp.vstack([s for _, s in rayfans]))


def split_rayfans(P, chunksizes, S=None):
    """Split concatenated rayfans back into the input chunks."""
    if P.shape[0] != sum(chunksizes):
        raise ValueError('P is not sum(chunksizes) in length')
    edges = [0, *accumulate(chunksizes)]
    spans = list(zip(edges[:-1], edges[1:]))
    ps = [P[a:b] for a, b in spans]
    if S is None:
        return ps
    return ps, [S[a:b] for a, b in spans]


def _tilted_axis(npoints, yangle=0, xangle=0):
    """(npoints, 3) direction cosines of a tilted +z axis."""
    nominal = jnp.asarray([0., 0., 1.], dtype=config.precision)
    tilted = make_rotation_matrix((0, yangle, -xangle)) @ nominal
    return jnp.broadcast_to(tilted[None, :], (npoints, 3))


def _bundle(x, y, z):
    """Stack transverse samples against a constant-z launch plane."""
    plane = jnp.broadcast_to(jnp.asarray(z, dtype=config.precision), x.shape)
    return jnp.stack([x, y, plane], axis=1)


def generate_collimated_ray_fan(nrays, maxr, z=0, minr=None, azimuth=90,
                                yangle=0, xangle=0, distribution='uniform',
                                key=None):
    """1D fan of collimated rays -> (P, S)."""
    dtype = config.precision
    if minr is None:
        minr = -maxr
    radii = sample_axis(distribution.lower(), minr, maxr, nrays, dtype=dtype,
                        key=key)
    azi = jnp.broadcast_to(jnp.radians(jnp.asarray(azimuth, dtype=dtype)),
                           radii.shape)
    x, y = polar_to_cart(radii, azi)
    return _bundle(x, y, z), _tilted_axis(nrays, yangle=yangle, xangle=xangle)


def generate_collimated_rect_ray_grid(nrays, maxx, z=0, minx=None, maxy=None,
                                      miny=None, yangle=0, xangle=0,
                                      distribution='uniform', key=None):
    """2D rectangular grid of collimated rays -> (P, S); nrays^2 total."""
    minx = -maxx if minx is None else minx
    maxy = maxx if maxy is None else maxy
    miny = -maxy if miny is None else miny
    dtype = config.precision
    distribution = distribution.lower()
    cols = sample_axis(distribution, minx, maxx, nrays, dtype=dtype, key=key)
    rows = sample_axis(distribution, miny, maxy, nrays, dtype=dtype, key=key)
    xx, yy = jnp.meshgrid(cols, rows)
    return (_bundle(xx.ravel(), yy.ravel(), z),
            _tilted_axis(nrays * nrays, yangle=yangle, xangle=xangle))


def generate_finite_ray_fan(nrays, na, P=0, min_na=None, azimuth=90,
                            yangle=0, xangle=0, n=1, distribution='uniform',
                            key=None):
    """1D fan of rays from a finite point with given NA -> (P, S)."""
    origin = promote_3d_point(P, dtype=config.precision)
    if min_na is None:
        min_na = -na
    angles = sample_axis(distribution.lower(),
                         float(onp.arcsin(min_na / n)),
                         float(onp.arcsin(na / n)), nrays, key=key)
    sin_t = jnp.sin(angles)
    cos_t = jnp.sqrt(1 - sin_t * sin_t)
    flat = jnp.zeros_like(sin_t)
    # azimuth 90 puts the fan in the y plane, 0 in the x plane
    k, l = (sin_t, flat) if azimuth == 0 else (flat, sin_t)  # NOQA: E741
    S = jnp.stack([k, l, cos_t], axis=1)
    if yangle != 0 or xangle != 0:
        R = make_rotation_matrix((0, yangle, -xangle))
        S = (R @ S[..., None]).squeeze(-1)
    return jnp.broadcast_to(origin[None, :], (nrays, 3)), S


def clip_to_aperture(rayfan, aperture):
    """Pre-trace filter: keep rays whose origins pass the aperture."""
    P, S = rayfan
    passes = onp.asarray(aperture(P[..., 0], P[..., 1]), dtype=bool)
    return P[passes], S[passes]


def _ring_points(radius, count, offset=0.0):
    """(x list, y list) of count points evenly around a ring."""
    azimuths = onp.linspace(0, 2 * onp.pi, count, endpoint=False) + offset
    return ((radius * onp.cos(azimuths)).tolist(),
            (radius * onp.sin(azimuths)).tolist())


def generate_collimated_hex_ray_grid(nrings, spacing, z=0, yangle=0, xangle=0):
    """Hexapolar grid of collimated rays: N = 1 + 3 nrings (nrings+1)."""
    if nrings < 0:
        raise ValueError(f'nrings must be >= 0, got {nrings}')
    xs, ys = [0.0], [0.0]
    for ring in range(1, nrings + 1):
        rx, ry = _ring_points(ring * spacing, 6 * ring)
        xs += rx
        ys += ry
    count = 1 + 3 * nrings * (nrings + 1)
    P = _bundle(jnp.asarray(xs, dtype=config.precision),
                jnp.asarray(ys, dtype=config.precision), z)
    return P, _tilted_axis(count, yangle=yangle, xangle=xangle)


def generate_collimated_radial_spiral_ray_grid(nrings, maxr, z=0,
                                               samples_per_ring=None,
                                               radial_distribution='cheby',
                                               include_center=True,
                                               yangle=0, xangle=0):
    """Radial-azimuthal spiral grid (Forbes-style Q-fitting sampling)."""
    if nrings < 1:
        raise ValueError(f'nrings must be >= 1, got {nrings}')
    if samples_per_ring is None:
        samples_per_ring = lambda ring: 6 * ring  # NOQA: E731
    if radial_distribution == 'cheby':
        ring_no = onp.arange(1, nrings + 1)
        radii = maxr * onp.cos((nrings - ring_no + 0.5) * onp.pi
                               / (2 * nrings))
    else:
        radii = onp.asarray(sample_axis(radial_distribution, 0.0, maxr,
                                        nrings + 1))[1:]
    xs, ys = ([0.0], [0.0]) if include_center else ([], [])
    for ring, radius in enumerate(radii, start=1):
        count = int(samples_per_ring(ring))
        if count > 0:
            # alternate a half-step azimuthal offset ring to ring
            rx, ry = _ring_points(float(radius), count,
                                  offset=(onp.pi / count) * (ring % 2))
            xs += rx
            ys += ry
    P = _bundle(jnp.asarray(xs, dtype=config.precision),
                jnp.asarray(ys, dtype=config.precision), z)
    return P, _tilted_axis(len(xs), yangle=yangle, xangle=xangle)
