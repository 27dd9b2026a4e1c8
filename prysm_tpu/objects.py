"""Scene objects for image simulation: slits, pinholes, stars, edges.

Rebuild of ``prysm/objects.py``; in-place masked assignment becomes
``jnp.where`` selection so every target is a pure elementwise program.
"""
import jax.numpy as jnp

from .conf import config
from .mathops import jinc
from .coordinates import optimize_xy_separable


def slit(x, y, width_x, width_y=None):
    """Boolean mask of a slit or pair of crossed slits."""
    x, y = optimize_xy_separable(x, y)
    mask = jnp.zeros((y.size, x.size), dtype=bool)
    if width_x is not None:
        mask = mask | (jnp.abs(x) <= width_x / 2)
    if width_y is not None:
        mask = mask | (jnp.abs(y) <= width_y / 2)
    return mask


def slit_ft(width_x, width_y, fx, fy):
    """Analytic FT of a slit, normalized to 1 at DC.

    Grid support along the slit's long axis is recovered from the frequency
    sample spacing (reference: prysm/objects.py:40-88).
    """
    if not width_x:
        width_x = None
    if not width_y:
        width_y = None
    if width_x is None and width_y is None:
        raise ValueError('slit_ft: at least one of width_x, width_y must be nonzero')
    fx, fy = optimize_xy_separable(fx, fy)
    if width_x is not None and width_y is not None:
        Lx = 1 / (fx[0, 1] - fx[0, 0])
        Ly = 1 / (fy[1, 0] - fy[0, 0])
        sx = jnp.sinc(fx * width_x)
        sy = jnp.sinc(fy * width_y)
        band_x = (width_x * Ly) * sx * (fy == 0)
        band_y = (width_y * Lx) * sy * (fx == 0)
        overlap = (width_x * width_y) * sx * sy
        area = width_x * Ly + width_y * Lx - width_x * width_y
        out = (band_x + band_y - overlap) / area
    elif width_x is not None:
        out = jnp.sinc(fx * width_x) * (fy == 0)
    else:
        out = jnp.sinc(fy * width_y) * (fx == 0)
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
    background = background.lower()
    delta = (1 - contrast) / 2
    bottom = delta
    top = 1 - delta
    arr = contrast * jnp.cos(spokes / 2 * t)
    arr = (arr + 1) / 2
    mask = (r > oradius) | (r < iradius)
    if background in ('b', 'black'):
        arr = jnp.where(mask, 0.0, arr)
    elif background in ('w', 'white'):
        arr = jnp.where(mask, 1.0, arr)
    else:
        raise ValueError('invalid background color')
    # binary threshold runs after masking, so background pixels map onto the
    # bottom/top contrast levels exactly as in the reference
    if not sinusoidal:
        arr = jnp.where(arr < 0.5, bottom, jnp.where(arr > 0.5, top, arr))
    return arr


def tiltedsquare(x, y, angle=4, radius=0.5, contrast=0.9, background='white'):
    """Tilted square target (for MTF slanted-edge work)."""
    background = background.lower()
    delta = (1 - contrast) / 2
    angle = jnp.radians(angle)
    xp = x * jnp.cos(angle) - y * jnp.sin(angle)
    yp = x * jnp.sin(angle) + y * jnp.cos(angle)
    mask = (jnp.abs(xp) <= radius) & (jnp.abs(yp) <= radius)
    if background in ('w', 'white'):
        return jnp.where(mask, delta, 1 - delta)
    return jnp.where(mask, 1 - delta, delta)


def slantededge(x, y, angle=4, contrast=0.9, crossed=False):
    """Slanted-edge target; optionally crossed (4 edges)."""
    diff = (1 - contrast) / 2
    angle = jnp.radians(angle)
    xp = x * jnp.cos(angle) - y * jnp.sin(angle)
    mask = xp > 0
    if crossed:
        upperright = mask & jnp.rot90(mask)
        lowerleft = jnp.rot90(upperright, 2)
        mask = upperright | lowerleft
    return jnp.where(mask, diff, 1 - diff)
