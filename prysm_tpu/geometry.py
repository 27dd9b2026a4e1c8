"""Anti-aliased aperture geometry via signed distance functions.

TPU-native rebuild of ``prysm/geometry.py``: every shape is a signed distance
field (negative inside), composed with min/max CSG and converted to pixel
coverage by a one-pixel linear edge ramp (``antialias``).  All functions are
pure elementwise jnp ops — they fuse under jit into a single VPU pass and
``vmap`` cleanly over shape-parameter batches (e.g. per-segment apertures).

Sign and ramp conventions match the reference exactly
(prysm/geometry.py:11-34): coverage = clip(0.5 - d/dx, 0, 1).
"""
import numpy as np  # host-side vertex generation only
import jax.numpy as jnp

from .conf import config
from .coordinates import cart_to_polar, optimize_xy_separable, polar_to_cart


def antialias(d, dx):
    """Convert signed distance to pixel coverage with a one pixel edge ramp.

    coverage = clip(0.5 - d/dx, 0, 1): 1 inside, 0 outside, fractional within
    a pixel of the edge.  Combine shapes on distance (union/intersect/
    subtract) and ramp once; multiplying already-ramped masks double counts
    shared edges.
    """
    coverage = 0.5 - d / dx
    return jnp.clip(coverage, 0, 1)


def union(*ds):
    """Signed distance of the union of shapes (pointwise min)."""
    out = ds[0]
    for d in ds[1:]:
        out = jnp.minimum(out, d)
    return out


def intersect(*ds):
    """Signed distance of the intersection of shapes (pointwise max)."""
    out = ds[0]
    for d in ds[1:]:
        out = jnp.maximum(out, d)
    return out


def subtract(d1, d2):
    """Signed distance of shape 1 with shape 2 removed."""
    return jnp.maximum(d1, -d2)


def multisample(func, x, y, samples=8):
    """Anti-alias a membership function by multisampling within edge pixels.

    Fallback for membership functions with no signed distance.  The
    reference scatters subsample means into edge pixels with boolean fancy
    indexing (prysm/geometry.py:96-151); here every pixel evaluates the
    subsample mean and a where() selects it only at edges — O(samples^2 N^2)
    flops but fully static shapes, no host sync, and trivially vmappable.
    For large grids prefer SDF + antialias.
    """
    x, y = optimize_xy_separable(x, y)
    xr = x.ravel()
    yr = y.ravel()
    dx = xr[1] - xr[0]
    dy = yr[1] - yr[0]
    cover = func(x, y).astype(config.precision)
    cover2 = jnp.broadcast_to(cover, (yr.size, xr.size))
    # edge pixels: any disagreement within the 3x3 neighborhood
    p = jnp.pad(cover2, 1, mode='edge')
    N0, N1 = cover2.shape
    mn = cover2
    mx = cover2
    for i in range(3):
        for j in range(3):
            window = p[i:i + N0, j:j + N1]
            mn = jnp.minimum(mn, window)
            mx = jnp.maximum(mx, window)
    edge = mn != mx

    off = (jnp.arange(samples, dtype=config.precision) + 0.5) / samples - 0.5
    # subsample grid: (samples, samples) offsets around each pixel center
    xs = x[None, None, ...] + (off * dx)[:, None, None, None]
    ys = y[None, None, ...] + (off * dy)[None, :, None, None]
    vals = func(xs, ys).astype(config.precision)
    vals = jnp.broadcast_to(vals, (samples, samples, N0, N1))
    means = vals.mean(axis=(0, 1))
    return jnp.where(edge, means, cover2)


def gaussian(sigma, x, y, center=(0, 0)):
    """Gaussian falloff mask with FWHM-parameterized width sigma."""
    x, y = optimize_xy_separable(x, y)
    x0, y0 = center
    return jnp.exp(-4 * jnp.log(2) * ((x - x0) ** 2 + (y - y0) ** 2) / sigma ** 2)


def rectangle_sdf(width, x, y, height=None, angle=0):
    """Signed distance to a rectangle with half-width/height, negative inside."""
    if angle != 0:
        if angle == 90:
            x, y = y, x
        else:
            r, p = cart_to_polar(x, y)
            p = p + jnp.radians(angle)
            x, y = polar_to_cart(r, p)
    else:
        x, y = optimize_xy_separable(x, y)
    if height is None:
        height = width
    qx = jnp.abs(x) - width
    qy = jnp.abs(y) - height
    outside = jnp.hypot(jnp.maximum(qx, 0), jnp.maximum(qy, 0))
    inside = jnp.minimum(jnp.maximum(qx, qy), 0)
    return outside + inside


def rectangle(width, x, y, height=None, angle=0):
    """Binary rectangle mask; 1 inside."""
    return rectangle_sdf(width, x, y, height=height, angle=angle) <= 0


def rotated_ellipse_sdf(width_major, width_minor, x, y, major_axis_angle=0):
    """First-order (Taubin) signed distance to an origin-centered ellipse."""
    if width_minor > width_major:
        raise ValueError('By definition, major axis must be larger than minor.')
    A = jnp.radians(-major_axis_angle)
    a, b = width_major, width_minor
    xr = x * jnp.cos(A) + y * jnp.sin(A)
    yr = x * jnp.sin(A) - y * jnp.cos(A)
    F = (xr / a) ** 2 + (yr / b) ** 2 - 1
    g = jnp.hypot(2 * xr / (a * a), 2 * yr / (b * b))
    return F / jnp.maximum(g, 1e-15)


def rotated_ellipse(width_major, width_minor, x, y, major_axis_angle=0):
    """Binary ellipse mask; 1 inside."""
    return rotated_ellipse_sdf(width_major, width_minor, x, y,
                               major_axis_angle=major_axis_angle) <= 0


def square(x, y):
    """All-ones mask (the full square array)."""
    return jnp.ones_like(x)


def circle_sdf(radius, r):
    """Signed distance to a circle, negative inside."""
    return r - radius


def circle(radius, r):
    """Binary circular mask; 1 inside the radius."""
    return circle_sdf(radius, r) <= 0


def annulus_sdf(rin, rout, r):
    """Signed distance to an annulus, negative inside."""
    center = (rin + rout) / 2
    halfwidth = (rout - rin) / 2
    return jnp.abs(r - center) - halfwidth


def annulus(rin, rout, r):
    """Binary annular mask; 1 between the radii."""
    return annulus_sdf(rin, rout, r) <= 0


def polygon_sdf(vertices, x, y):
    """Signed distance to a polygon (segment distance + even-odd parity).

    vertices is a host-side (N, 2) array; the per-edge loop unrolls at trace
    time into fused elementwise ops (edge counts are small).
    """
    if x.size and y.size:
        x, y = optimize_xy_separable(x, y)
    vertices = np.asarray(vertices, dtype=np.float64)
    n = len(vertices)
    d2 = None
    inside = None
    for i in range(n):
        x0, y0 = (float(v) for v in vertices[i])
        x1, y1 = (float(v) for v in vertices[(i + 1) % n])
        ex = x1 - x0
        ey = y1 - y0
        wx = x - x0
        wy = y - y0
        t = (wx * ex + wy * ey) / (ex * ex + ey * ey)
        t = jnp.clip(t, 0, 1)
        px = wx - t * ex
        py = wy - t * ey
        seg = px * px + py * py
        d2 = seg if d2 is None else jnp.minimum(d2, seg)
        straddle = (y0 > y) != (y1 > y)
        crosses = straddle & ((wx * ey < ex * wy) == (y1 > y0))
        inside = crosses if inside is None else inside ^ crosses
    d = jnp.sqrt(d2)
    return jnp.where(inside, -d, d)


def _generate_vertices(sides, radius=1, center=(0, 0), rotation=0):
    """Host-side vertex list for a regular polygon."""
    angle = 2 * np.pi / sides
    rotation = np.radians(rotation)
    x0, y0 = center
    points = np.arange(sides, dtype=np.float64)
    x = radius * np.sin(points * angle + rotation) + x0
    y = radius * np.cos(points * angle + rotation) + y0
    return np.stack((x, y), axis=1)


def regular_polygon_sdf(sides, radius, x, y, center=(0, 0), rotation=0):
    """Signed distance to a regular polygon, negative inside."""
    verts = _generate_vertices(sides, radius, center, rotation)
    return polygon_sdf(verts, x, y)


def regular_polygon(sides, radius, x, y, center=(0, 0), rotation=0):
    """Binary regular polygon mask; 1 inside."""
    return regular_polygon_sdf(sides, radius, x, y,
                               center=center, rotation=rotation) <= 0


def spider_sdf(vanes, width, x, y, rotation=0, center=(0, 0), rotation_is_rad=False):
    """Signed distance to spider vanes (semi-infinite capsules), negative inside."""
    half_width = width / 2
    x0, y0 = center
    x = x - x0
    y = y - y0
    if not rotation_is_rad:
        rotation = jnp.radians(rotation)
    step = 2 * jnp.pi / vanes
    d = None
    for multiple in range(vanes):
        angle = step * multiple - rotation
        c = jnp.cos(angle)
        s = jnp.sin(angle)
        along = x * c - y * s
        across = x * s + y * c
        vane = jnp.hypot(jnp.minimum(along, 0), across) - half_width
        d = vane if d is None else jnp.minimum(d, vane)
    return d


def spider(vanes, width, x, y, rotation=0, center=(0, 0), rotation_is_rad=False):
    """Binary spider-vane mask; 1 inside the vanes."""
    return spider_sdf(vanes, width, x, y, rotation=rotation, center=center,
                      rotation_is_rad=rotation_is_rad) <= 0


def offset_circle(radius, x, y, center):
    """Binary mask of a circle offset from the grid center."""
    x, y = optimize_xy_separable(x, y)
    x = x - center[0]
    y = y - center[1]
    r = jnp.hypot(x, y)
    return circle(radius, r)


def rectangle_with_corner_fillets_sdf(width, height, cradius, x, y,
                                      center=(0, 0), rotation=0):
    """Signed distance to a rectangle with filleted corners, negative inside."""
    if rotation != 0:
        r, t = cart_to_polar(x, y)
        t = t + jnp.radians(rotation)
        x, y = polar_to_cart(r, t)
    else:
        x, y = optimize_xy_separable(x, y)
    x = x - center[0]
    y = y - center[1]
    qx = jnp.abs(x) - (width - cradius)
    qy = jnp.abs(y) - (height - cradius)
    outside = jnp.hypot(jnp.maximum(qx, 0), jnp.maximum(qy, 0))
    inside = jnp.minimum(jnp.maximum(qx, qy), 0)
    return outside + inside - cradius


def rectangle_with_corner_fillets(width, height, cradius, x, y,
                                  center=(0, 0), rotation=0):
    """Binary mask of a rectangle with filleted corners; 1 inside."""
    return rectangle_with_corner_fillets_sdf(
        width, height, cradius, x, y, center=center, rotation=rotation) <= 0
