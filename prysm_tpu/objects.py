"""Scene objects for image simulation: slits, pinholes, stars, edges.

Rebuild of ``prysm/objects.py``; in-place masked assignment becomes
``jnp.where`` selection so every target is a pure elementwise program.
"""
import jax.numpy as jnp

from .conf import config
from .mathops import jinc
from .coordinates import optimize_xy_separable


def _contrast_rails(contrast):
    """(low, high) gray levels for a target of the given contrast."""
    lo = (1 - contrast) / 2
    return lo, 1 - lo


def _canon_background(background):
    """Normalize a background color spec to 'b' or 'w'."""
    b = background.lower()
    if b in ('b', 'black'):
        return 'b'
    if b in ('w', 'white'):
        return 'w'
    raise ValueError('invalid background color')


def _rotate_grid(x, y, angle_deg):
    """Rotate (x, y) by angle_deg; returns (xp, yp)."""
    a = jnp.radians(angle_deg)
    c, s = jnp.cos(a), jnp.sin(a)
    return x * c - y * s, x * s + y * c


def slit(x, y, width_x, width_y=None):
    """Boolean mask of a slit or pair of crossed slits."""
    x, y = optimize_xy_separable(x, y)
    bands = [jnp.abs(g) <= w / 2
             for g, w in ((x, width_x), (y, width_y)) if w is not None]
    mask = jnp.zeros((y.size, x.size), dtype=bool)
    for b in bands:
        mask = mask | b
    return mask


def slit_ft(width_x, width_y, fx, fy):
    """Analytic FT of a slit, normalized to 1 at DC.

    Grid support along the slit's long axis is recovered from the frequency
    sample spacing (reference: prysm/objects.py:40-88).
    """
    wx = width_x or None
    wy = width_y or None
    if wx is None and wy is None:
        raise ValueError('slit_ft: at least one of width_x, width_y must be nonzero')
    fx, fy = optimize_xy_separable(fx, fy)
    on_fx_axis = fy == 0
    on_fy_axis = fx == 0
    if wy is None:
        out = jnp.sinc(fx * wx) * on_fx_axis
    elif wx is None:
        out = jnp.sinc(fy * wy) * on_fy_axis
    else:
        # two crossed slits: union = sum of bands minus the doubly-counted
        # overlap, normalized by the union's area
        Lx, Ly = 1 / (fx[0, 1] - fx[0, 0]), 1 / (fy[1, 0] - fy[0, 0])
        sx, sy = jnp.sinc(fx * wx), jnp.sinc(fy * wy)
        union_area = wx * Ly + wy * Lx - wx * wy
        out = (wx * Ly * sx * on_fx_axis
               + wy * Lx * sy * on_fy_axis
               - wx * wy * sx * sy) / union_area
    return out.astype(config.precision)


def pinhole(radius, rho):
    """Boolean mask of a pinhole."""
    return rho <= radius


def pinhole_ft(radius, fr):
    """Analytic FT of a pinhole: jinc(2 pi radius fr)."""
    return jinc(fr * (radius * 2 * jnp.pi))


def siemensstar(r, t, spokes, oradius=0.9, iradius=0, background='black',
                contrast=0.9, sinusoidal=False):
    """Siemens star target in [0, 1]."""
    lo, hi = _contrast_rails(contrast)
    arr = (contrast * jnp.cos(spokes / 2 * t) + 1) / 2
    outside = (r > oradius) | (r < iradius)
    fill = 0.0 if _canon_background(background) == 'b' else 1.0
    arr = jnp.where(outside, fill, arr)
    # binary threshold runs after masking, so background pixels map onto the
    # bottom/top contrast levels exactly as in the reference
    if not sinusoidal:
        arr = jnp.where(arr < 0.5, lo, jnp.where(arr > 0.5, hi, arr))
    return arr


def tiltedsquare(x, y, angle=4, radius=0.5, contrast=0.9, background='white'):
    """Tilted square target (for MTF slanted-edge work)."""
    lo, hi = _contrast_rails(contrast)
    xp, yp = _rotate_grid(x, y, angle)
    inside = (jnp.abs(xp) <= radius) & (jnp.abs(yp) <= radius)
    if _canon_background(background) == 'w':
        return jnp.where(inside, lo, hi)
    return jnp.where(inside, hi, lo)


def slantededge(x, y, angle=4, contrast=0.9, crossed=False):
    """Slanted-edge target; optionally crossed (4 edges)."""
    lo, hi = _contrast_rails(contrast)
    xp, _ = _rotate_grid(x, y, angle)
    mask = xp > 0
    if crossed:
        upperright = mask & jnp.rot90(mask)
        mask = upperright | jnp.rot90(upperright, 2)
    return jnp.where(mask, lo, hi)
