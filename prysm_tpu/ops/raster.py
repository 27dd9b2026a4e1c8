"""Fused SDF rasterization Pallas kernels.

Anti-aliased aperture masks are signed-distance fields pushed through a one
pixel coverage ramp (reference prysm/geometry.py:11-34).  For a polygon the
SDF is a per-edge segment-distance + even-odd parity scan
(prysm/geometry.py:419-463): V edges x N^2 pixels, which in the jnp path
materializes O(V) intermediates between fusion boundaries.  These kernels
evaluate the full edge loop per (256, 256) tile inside VMEM — vertices are
static constants folded into the program — and emit the finished coverage
map in one pass.  Used per-segment by composite apertures, where the edge
loop runs dozens of times over shifted windows.

Forward-only by design: masks are geometry, not optimization variables (the
reference has no adjoint for rasterization either); gradients, if requested,
flow through the jnp twin in :mod:`prysm_tpu.geometry`.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import pallas_interpret

_TILE = 256


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _coverage(d, dx):
    return jnp.clip(0.5 - d / dx, 0.0, 1.0)


def _polygon_kernel(edges, dx, x_ref, y_ref, out_ref):
    x = x_ref[...]
    y = y_ref[...]
    d2 = None
    inside = None
    for x0, y0, x1, y1 in edges:
        ex = x1 - x0
        ey = y1 - y0
        wx = x - x0
        wy = y - y0
        t = jnp.clip((wx * ex + wy * ey) * (1.0 / (ex * ex + ey * ey)), 0.0, 1.0)
        px = wx - t * ex
        py = wy - t * ey
        seg = px * px + py * py
        d2 = seg if d2 is None else jnp.minimum(d2, seg)
        straddle = (y0 > y) != (y1 > y)
        crosses = straddle & ((wx * ey < ex * wy) == (y1 > y0))
        inside = crosses if inside is None else inside ^ crosses
    d = jnp.sqrt(d2)
    d = jnp.where(inside, -d, d)
    out_ref[...] = _coverage(d, dx)


def _circle_kernel(radius, dx, invert, r_ref, out_ref):
    d = r_ref[...] - radius
    if invert:
        d = -d
    out_ref[...] = _coverage(d, dx)


def _tiled_call(kernel, arrays, shape):
    """Run an elementwise-tile kernel over 2D arrays of a common shape."""
    Ny, Nx = shape
    Typ, Txp = _round_up(Ny, _TILE), _round_up(Nx, _TILE)
    padded = [jnp.pad(a.astype(jnp.float32),
                      [(0, Typ - Ny), (0, Txp - Nx)]) for a in arrays]
    tile_spec = pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(Typ // _TILE, Txp // _TILE),
        in_specs=[tile_spec] * len(padded),
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((Typ, Txp), jnp.float32),
        interpret=pallas_interpret(),
    )(*padded)
    return out[:Ny, :Nx]


def polygon_raster_pallas(vertices, x, y, dx):
    """Anti-aliased polygon coverage mask in one fused pass.

    vertices: host-side (V, 2) array (static).  x, y: 2D coordinate grids
    (broadcast 1D rows/columns are expanded).  dx: pixel pitch for the
    antialias ramp.  Returns coverage in [0, 1], f32.
    """
    vertices = np.asarray(vertices, dtype=np.float64)
    n = len(vertices)
    edges = tuple(
        (float(vertices[i][0]), float(vertices[i][1]),
         float(vertices[(i + 1) % n][0]), float(vertices[(i + 1) % n][1]))
        for i in range(n))
    x, y = jnp.broadcast_arrays(jnp.asarray(x), jnp.asarray(y))
    if x.ndim != 2:
        raise ValueError('polygon_raster_pallas requires 2D grids')
    return _tiled_call(partial(_polygon_kernel, edges, float(dx)),
                       [x, y], x.shape)


def circle_raster_pallas(radius, r, dx, invert=False):
    """Anti-aliased circular (or inverted/obscuration) coverage mask.

    radius: static float. r: 2D radial grid. dx: pixel pitch.
    """
    r = jnp.asarray(r)
    if r.ndim != 2:
        raise ValueError('circle_raster_pallas requires a 2D radial grid')
    return _tiled_call(partial(_circle_kernel, float(radius), float(dx),
                               bool(invert)),
                       [r], r.shape)


def _annulus_kernel(rin, rout, dx, r_ref, out_ref):
    center = (rin + rout) / 2.0
    halfwidth = (rout - rin) / 2.0
    d = jnp.abs(r_ref[...] - center) - halfwidth
    out_ref[...] = _coverage(d, dx)


def annulus_raster_pallas(rin, rout, r, dx):
    """Anti-aliased annular coverage mask in one fused pass."""
    r = jnp.asarray(r)
    if r.ndim != 2:
        raise ValueError('annulus_raster_pallas requires a 2D radial grid')
    return _tiled_call(partial(_annulus_kernel, float(rin), float(rout),
                               float(dx)),
                       [r], r.shape)


def _rect_kernel(width, height, cosang, sinang, dx, x_ref, y_ref, out_ref):
    x = x_ref[...]
    y = y_ref[...]
    # static rotation folded to two fused multiplies; matches the
    # reference's polar-rotation convention (geometry.py:98-116:
    # theta + angle, i.e. x' = x cos a - y sin a)
    xr = x * cosang - y * sinang
    yr = x * sinang + y * cosang
    qx = jnp.abs(xr) - width
    qy = jnp.abs(yr) - height
    outside = jnp.hypot(jnp.maximum(qx, 0.0), jnp.maximum(qy, 0.0))
    inside = jnp.minimum(jnp.maximum(qx, qy), 0.0)
    out_ref[...] = _coverage(outside + inside, dx)


def rectangle_raster_pallas(width, x, y, dx, height=None, angle=0.0):
    """Anti-aliased (rotated) rectangle coverage mask, one fused pass."""
    x, y = jnp.broadcast_arrays(jnp.asarray(x), jnp.asarray(y))
    if x.ndim != 2:
        raise ValueError('rectangle_raster_pallas requires 2D grids')
    if height is None:
        height = width
    a = np.radians(float(angle))
    return _tiled_call(
        partial(_rect_kernel, float(width), float(height),
                float(np.cos(a)), float(np.sin(a)), float(dx)),
        [x, y], x.shape)


def regular_polygon_raster_pallas(sides, radius, x, y, dx, rotation=0.0):
    """Anti-aliased regular-polygon coverage via the fused edge-loop kernel.

    Vertices are generated host-side with the same convention as
    ``geometry.regular_polygon_sdf`` (first vertex at +y, i.e. 90 deg,
    plus rotation).
    """
    from ..geometry import _generate_vertices
    verts = _generate_vertices(int(sides), radius, (0, 0), rotation)
    return polygon_raster_pallas(verts, x, y, dx)


def _telescope_kernel(outer, inner, vanes, half_w, rot, dx,
                      x_ref, y_ref, out_ref):
    x = x_ref[...]
    y = y_ref[...]
    r = jnp.sqrt(x * x + y * y)
    d = r - outer                                   # outer circle
    if inner is not None:
        d = jnp.maximum(d, inner - r)               # subtract obscuration
    if vanes:
        step = 2.0 * np.pi / vanes
        dspider = None
        for k in range(vanes):
            angle = step * k - rot
            c, s = float(np.cos(angle)), float(np.sin(angle))
            along = x * c - y * s
            across = x * s + y * c
            vane = jnp.hypot(jnp.minimum(along, 0.0), across) - half_w
            dspider = vane if dspider is None else jnp.minimum(dspider, vane)
        d = jnp.maximum(d, -dspider)                # subtract the vanes
    out_ref[...] = _coverage(d, dx)


def telescope_pupil_raster_pallas(x, y, dx, *, outer_radius,
                                  inner_radius=None, spider_vanes=0,
                                  spider_width=0.0, spider_rotation=0.0):
    """Classic obscured telescope pupil in ONE fused pass.

    outer circle minus central obscuration minus spider vanes — the CSG
    chain the jnp path materializes as three full-grid SDFs plus two
    max() passes (reference geometry.py: circle/annulus/spider + CSG at
    prysm/geometry.py:37-96).  All shapes are static geometry.
    """
    x, y = jnp.broadcast_arrays(jnp.asarray(x), jnp.asarray(y))
    if x.ndim != 2:
        raise ValueError('telescope_pupil_raster_pallas requires 2D grids')
    return _tiled_call(
        partial(_telescope_kernel, float(outer_radius),
                None if inner_radius is None else float(inner_radius),
                int(spider_vanes), float(spider_width) / 2.0,
                float(np.radians(spider_rotation)), float(dx)),
        [x, y], x.shape)
