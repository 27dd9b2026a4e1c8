"""Segmented apertures: hexagonal and keystone composites.

Rebuild of ``prysm/segmented.py``.  Geometry bookkeeping (hex lattice
coordinates, window offsets) is host-side Python exactly as in the
reference; device work is the per-segment SDF rasterization and the OPD
composition.  In-place window accumulation becomes immutable
``.at[window].add`` scatter updates, so ``compose_opd`` is a pure function
of the coefficient array — differentiable with ``jax.grad`` and usable
inside jit (windows are static slices).

The per-segment basis preparation deduplicates identical local grids the
same way the reference does (prysm/segmented.py:178-259).
"""
import math
import inspect
import numbers
from collections import namedtuple

import numpy as np
import jax
import jax.numpy as jnp

from .conf import config
from .geometry import regular_polygon_sdf, circle_sdf, annulus_sdf, spider, antialias
from .coordinates import cart_to_polar, polar_to_cart
from .polynomials import sum_of_2d_modes

FLAT_TO_FLAT_TO_VERTEX_TO_VERTEX = 1.1547005383792515  # 2/sqrt(3)
VERTEX_TO_VERTEX_TO_FLAT_TO_FLAT = 1 / FLAT_TO_FLAT_TO_VERTEX_TO_VERTEX

Hex = namedtuple('Hex', ['q', 'r', 's'])


from .mathops import host_planner as _host_planner  # NOQA: E402


def add_hex(h1, h2):
    """Add two hex coordinates together."""
    return Hex(h1.q + h2.q, h1.r + h2.r, h1.s + h2.s)


def sub_hex(h1, h2):
    """Subtract two hex coordinates."""
    return Hex(h1.q - h2.q, h1.r - h2.r, h1.s - h2.s)


def mul_hex(h1, h2):
    """Multiply two hex coordinates."""
    return Hex(h1.q * h2.q, h1.r * h2.r, h1.s * h2.s)


hex_dirs = [
    Hex(1, 0, -1), Hex(1, -1, 0), Hex(0, -1, 1),
    Hex(-1, 0, 1), Hex(-1, 1, 0), Hex(0, 1, -1),
]


def hex_dir(i):
    """Hex direction associated with a given integer, wrapped at 6."""
    return hex_dirs[i % 6]


def hex_neighbor(h, direction):
    """Neighboring hex in a given direction."""
    return add_hex(h, hex_dir(direction))


def hex_to_xy(h, radius, rot=90):
    """Convert hexagon coordinate to (x, y) given segment radius and rotation."""
    if rot == 90:
        x = 3 / 2 * h.q
        y = VERTEX_TO_VERTEX_TO_FLAT_TO_FLAT * h.q + math.sqrt(3) * h.r
    else:
        x = math.sqrt(3) * h.q + VERTEX_TO_VERTEX_TO_FLAT_TO_FLAT * h.r
        y = 3 / 2 * h.r
    return x * radius, y * radius


def scale_hex(h, k):
    """Scale a hex coordinate by some constant factor."""
    return Hex(h.q * k, h.r * k, h.s * k)


def hex_ring(radius):
    """All hex coordinates in a given ring, first element 'north'."""
    start = Hex(-radius, radius, 0)
    tile = start
    results = []
    for i in range(6):
        for _ in range(radius):
            results.append(tile)
            tile = hex_neighbor(tile, i)
    for _ in range(radius):
        results.append(results.pop(0))
    return results


def _local_window(cy, cx, center, dx, samples_per_seg, x, y):
    """Static slice pair delimiting a segment's local window (host-side)."""
    if isinstance(samples_per_seg, int):
        samples_per_seg = (samples_per_seg, samples_per_seg)
    offset_x = cx + int(center[0] / dx) - samples_per_seg[0]
    offset_y = cy + int(center[1] / dx) - samples_per_seg[1]
    upper_x = offset_x + (2 * samples_per_seg[0])
    upper_y = offset_y + (2 * samples_per_seg[1])
    offset_x = min(max(offset_x, 0), x.shape[1])
    offset_y = min(max(offset_y, 0), y.shape[0])
    upper_x = min(max(upper_x, 0), x.shape[1])
    upper_y = min(max(upper_y, 0), y.shape[0])
    return slice(offset_y, upper_y), slice(offset_x, upper_x)


class CompositeHexagonalAperture:
    """An aperture composed of several hexagonal segments.

    Attributes of interest: ``amp`` (the composite amplitude mask),
    ``windows``/``local_coords``/``local_masks``/``segment_ids``, and after
    ``prepare_opd_bases``, ``opd_bases``/``opd_grids``.
    """

    def __init__(self, x, y, rings, segment_diameter, segment_separation,
                 segment_angle=90, exclude=()):
        """See reference prysm/segmented.py:136-176 for parameter meanings."""
        with _host_planner():
            (self.vtov,
             self.all_centers,
             self.windows,
             self.local_coords,
             self.local_masks,
             self.segment_ids,
             self.amp) = _composite_hexagonal_aperture(
                rings, segment_diameter, segment_separation, x, y,
                segment_angle, exclude)
        # planner outputs become host arrays: they are jit constants of
        # compose_opd / downstream wavefront steps (see _host_planner)
        self.local_masks = [np.asarray(m) for m in self.local_masks]
        self.amp = np.asarray(self.amp)
        self.x = x
        self.y = y
        self.segment_diameter = segment_diameter
        self.segment_separation = segment_separation
        self.segment_angle = segment_angle
        self.exclude = exclude

    def prepare_opd_bases(self, basis_func, orders, basis_func_kwargs=None,
                          normalization_radius=None):
        """Prepare (deduplicated) per-segment polynomial bases."""
        if normalization_radius is None:
            normalization_radius = self.vtov / 2
        if not isinstance(normalization_radius, (tuple, list)):
            normalization_radius = (normalization_radius, normalization_radius)
        if basis_func_kwargs is None:
            basis_func_kwargs = {}

        sig = inspect.signature(basis_func)
        params = sig.parameters
        gridcache = {}
        polycache = {}
        grids = []
        bases = []
        ctx = _host_planner()
        ctx.__enter__()
        if 'r' in params and 't' in params:
            nr = normalization_radius[0]
            for x, y in self.local_coords:
                corner = float(x[0, 0])
                key = (corner, *x.shape)
                if key not in gridcache:
                    r, t = cart_to_polar(x, y)
                    r = r / nr
                    basis = jnp.asarray(list(basis_func(orders, r=r, t=t, **basis_func_kwargs)))
                    gridcache[key] = (r, t)
                    polycache[key] = basis
                else:
                    r, t = gridcache[key]
                    basis = polycache[key]
                grids.append((r, t))
                bases.append(basis)
        else:
            for x, y in self.local_coords:
                corner = float(x[0, 0])
                key = (corner, *x.shape)
                if key not in gridcache:
                    xx = x / normalization_radius[0]
                    yy = y / normalization_radius[1]
                    basis = jnp.asarray(list(basis_func(orders, x=xx, y=yy, **basis_func_kwargs)))
                    gridcache[key] = (xx, yy)
                    polycache[key] = basis
                else:
                    xx, yy = gridcache[key]
                    basis = polycache[key]
                grids.append((xx, yy))
                bases.append(basis)

        ctx.__exit__(None, None, None)
        # host constants: the bases embed into jitted compose steps
        bases = [np.asarray(b) for b in bases]
        self.opd_bases = bases
        self.opd_grids = grids
        return grids, bases

    def compose_opd(self, coefs, out=None):
        """Compose per-segment OPD; pure function of coefs, differentiable.

        coefs has shape (len(self.segment_ids), len(orders)).  When ``out``
        is given, the composed OPD is accumulated onto it functionally
        (``out + opd`` — JAX arrays are immutable) and the sum returned,
        matching the reference's in-place accumulation (ref segmented.py:261).

        The per-segment loop of static-window slice-adds is deliberate:
        a batched one-scatter formulation (einsum all tiles + index
        scatter-add) measured 48 -> 1660 us on the v5e — TPU scatter is
        the wrong primitive here; the 19 dynamic-update-slices fuse and
        are already within ~2x of the pure mode-synthesis FLOPs (r5).
        """
        acc = jnp.zeros_like(self.x) if out is None else jnp.asarray(out)
        for win, mask, base, c in zip(self.windows, self.local_masks,
                                      self.opd_bases, coefs):
            tile = sum_of_2d_modes(base, c) * mask
            acc = acc.at[win].add(tile)
        return acc


def _composite_hexagonal_aperture(rings, segment_diameter, segment_separation,
                                  x, y, segment_angle=90, exclude=(0,)):
    if segment_angle not in {0, 90}:
        raise ValueError('can only synthesize composite apertures with '
                         'hexagons along a cartesian axis')
    segment_vtov = segment_diameter * FLAT_TO_FLAT_TO_VERTEX_TO_VERTEX
    segment_separation = (segment_separation * FLAT_TO_FLAT_TO_VERTEX_TO_VERTEX) / 2
    rseg = segment_vtov / 2

    # geometry planning is host work: pull the grids to numpy once so the
    # per-segment window/cache bookkeeping below never issues device
    # scalar reads (on relay-attached TPUs each read costs ~1 ms and
    # permanently de-pipelines the dispatch queue)
    x = np.asarray(x)
    y = np.asarray(y)
    dx = float(x[0, 1] - x[0, 0])
    samples_per_seg = int(rseg / dx + 1)
    cx = int(np.ceil(x.shape[1] / 2))
    cy = int(np.ceil(y.shape[0] / 2))
    center_segment_window = _local_window(cy, cx, (0, 0), dx, samples_per_seg, x, y)

    mask = jnp.zeros(x.shape, dtype=config.precision)

    segment_id = 0
    xx = x[center_segment_window]
    yy = y[center_segment_window]
    center_sdf = regular_polygon_sdf(6, rseg, xx, yy, center=(0, 0), rotation=segment_angle)
    center_mask = antialias(center_sdf, dx)
    if 0 not in exclude:
        mask = mask.at[center_segment_window].max(center_mask)
        local_masks = [center_mask]
        segment_ids = [0]
        all_centers = [(0., 0.)]
        windows = [center_segment_window]
        local_coords = [(xx, yy)]
    else:
        local_masks = []
        local_coords = []
        segment_ids = []
        all_centers = []
        windows = []

    for i in range(1, rings + 1):
        hexes = hex_ring(i)
        centers = [hex_to_xy(h, rseg + segment_separation, rot=segment_angle)
                   for h in hexes]
        ids = np.arange(segment_id + 1, segment_id + 1 + len(centers), dtype=int)
        id_mask = ~np.isin(ids, exclude, assume_unique=True)
        valid_ids = ids[id_mask]
        centers_arr = np.asarray(centers)[id_mask]
        all_centers += centers_arr.tolist()
        for seg_id, center in zip(valid_ids, centers_arr):
            segment_ids.append(int(seg_id))
            local_window = _local_window(cy, cx, center, dx, samples_per_seg, x, y)
            windows.append(local_window)
            xx = x[local_window]
            yy = y[local_window]
            local_coords.append((xx - center[0], yy - center[1]))
            local_sdf = regular_polygon_sdf(6, rseg, xx, yy, center=center,
                                            rotation=segment_angle)
            local_mask = antialias(local_sdf, dx)
            local_masks.append(local_mask)
            mask = mask.at[local_window].max(local_mask)
        segment_id = ids[-1]

    return (segment_vtov, all_centers, windows, local_coords, local_masks,
            segment_ids, mask)


class CompositeKeystoneAperture:
    """Composite aperture with a circular center and keystone ring segments."""

    def __init__(self, x, y, center_circle_diameter, rings, ring_radius,
                 segments_per_ring, radial_gap, azimuthal_gap=None,
                 rotation_per_ring=None):
        """See reference prysm/segmented.py:371-446 for parameter meanings."""
        if azimuthal_gap is None:
            azimuthal_gap = radial_gap
        with _host_planner():
            pak = _composite_keystone_aperture(
                x=x, y=y, center_circle_diameter=center_circle_diameter,
                rings=rings, ring_radius=ring_radius,
                segments_per_ring=segments_per_ring, radial_gap=radial_gap,
                azimuthal_gap=azimuthal_gap,
                rotation_per_ring=rotation_per_ring)
        cs = pak['center_segment']
        ks = pak['keystones']
        # host constants: see _host_planner
        cs['mask'] = np.asarray(cs['mask'])
        ks['masks'] = [np.asarray(mk) for mk in ks['masks']]

        # table-driven attribute exposure: (public attr, packet key)
        center_view = ('x', 'y', 'r', 't', 'mask', 'window')
        for key in center_view:
            # single-letter grid keys double up: center_xx, center_rr, ...
            attr = f'center_{key * 2 if len(key) == 1 else key}'
            setattr(self, attr, cs[key])
        keystone_view = {
            'segment_centers': 'centers', 'segment_corners': 'corners',
            'segment_ids_ods': 'ids_ods', 'segment_windows': 'windows',
            'segment_grids': 'local_xy', 'segment_masks': 'masks',
            'segment_rotations': 'rotations', 'segment_ledges': 'left_edges',
            'segment_redges': 'right_edges',
            'segment_radial_diameters': 'radial_diameters',
            'segment_ids': 'ids',
        }
        for attr, key in keystone_view.items():
            setattr(self, attr, ks[key])
        self.amp = np.asarray(pak['amplitude_mask'])

        geometry_params = dict(
            x=x, y=y, center_circle_diameter=center_circle_diameter,
            radial_gap=radial_gap, azimuthal_gap=azimuthal_gap,
            rings=rings, ring_radius=ring_radius,
            segments_per_ring=segments_per_ring,
            rotation_per_ring=rotation_per_ring)
        self.__dict__.update(geometry_params)

    def prepare_opd_bases(self, center_basis, center_orders,
                          segment_basis, segment_orders,
                          center_basis_kwargs=None, segment_basis_kwargs=None,
                          rotate_xyaxes=False):
        """Prepare center and per-keystone polynomial bases."""
        with _host_planner():
            return self._prepare_opd_bases_impl(
                center_basis, center_orders, segment_basis, segment_orders,
                center_basis_kwargs, segment_basis_kwargs, rotate_xyaxes)

    def _prepare_opd_bases_impl(self, center_basis, center_orders,
                                segment_basis, segment_orders,
                                center_basis_kwargs, segment_basis_kwargs,
                                rotate_xyaxes):
        if center_basis_kwargs is None:
            center_basis_kwargs = {}
        if segment_basis_kwargs is None:
            segment_basis_kwargs = {}
        bases = []
        grids = []

        sig = inspect.signature(center_basis)
        params = sig.parameters
        nr = self.center_circle_diameter / 2
        if 'r' in params and 't' in params:
            rr = self.center_rr / nr
            tt = self.center_tt
            basis = jnp.asarray(list(center_basis(center_orders, r=rr, t=tt,
                                                  **center_basis_kwargs)))
            grids.append((rr, tt))
        else:
            xx = self.center_xx / nr
            yy = self.center_yy / nr
            basis = jnp.asarray(list(center_basis(center_orders, x=xx, y=yy,
                                                  **center_basis_kwargs)))
            grids.append((xx, yy))
        bases.append(basis)

        sig = inspect.signature(segment_basis)
        params = sig.parameters
        if 'r' in params and 't' in params:
            for x, y in self.segment_grids:
                xext = float(x[0, -1] - x[0, 0])
                yext = float(y[-1, 0] - y[0, 0])
                nr = min(xext, yext) / 2
                r, t = cart_to_polar(x, y)
                r = r / nr
                basis = jnp.asarray(list(segment_basis(segment_orders, r=r, t=t,
                                                       **segment_basis_kwargs)))
                grids.append((r, t))
                bases.append(basis)
        else:
            if not rotate_xyaxes:
                raise ValueError('must rotate xy axes')
            for i, (x, y) in enumerate(self.segment_grids):
                t_offset = self.segment_rotations[i]
                r, t = cart_to_polar(x, y)
                t = t - t_offset
                x, y = polar_to_cart(r, t)

                xc, yc = self.segment_centers[i]
                xcorner, ycorner = self.segment_corners[i]
                xcenter, ycenter = self.segment_ids_ods[i]
                xcenter = np.asarray(xcenter) - xc
                ycenter = np.asarray(ycenter) - yc
                xcorner = np.asarray(xcorner) - xc
                ycorner = np.asarray(ycorner) - yc

                rcenter = np.hypot(xcenter, ycenter)
                tcenter = np.arctan2(ycenter, xcenter) - t_offset
                xcenter = rcenter * np.cos(tcenter)
                xmax = xcenter.max()

                rcorner = np.hypot(xcorner, ycorner)
                tcorner = np.arctan2(ycorner, xcorner) - t_offset
                xcorner = rcorner * np.cos(tcorner)
                ycorner = rcorner * np.sin(tcorner)
                xmin = xcorner.min()
                ymin = ycorner.min()
                ymax = ycorner.max()

                xnorm = (xmax - xmin) / 2
                ynorm = (ymax - ymin) / 2
                xx = x / xnorm
                yy = y / ynorm
                basis = jnp.asarray(list(segment_basis(segment_orders, x=xx, y=yy,
                                                       **segment_basis_kwargs)))
                grids.append((xx, yy))
                bases.append(basis)

        bases = [np.asarray(b) for b in bases]  # host jit constants
        self.opd_bases = bases
        self.opd_grids = grids
        return grids, bases

    def compose_opd(self, center_coefs, segment_coefs, out=None):
        """Compose center + segment OPD; pure and differentiable.

        When ``out`` is given, the composed OPD is accumulated onto it
        functionally and the sum returned (ref segmented.py:568).
        """
        out = jnp.zeros_like(self.x) if out is None else jnp.asarray(out)
        center_coefs = jnp.asarray(center_coefs, dtype=self.opd_bases[0].dtype)
        tile = sum_of_2d_modes(self.opd_bases[0], center_coefs)
        out = out.at[self.center_window].add(tile * self.center_mask)
        for win, mask, base, c in zip(self.segment_windows, self.segment_masks,
                                      self.opd_bases[1:], segment_coefs):
            c = jnp.asarray(c, dtype=base.dtype)
            tile = sum_of_2d_modes(base, c) * mask
            out = out.at[win].add(tile)
        return out


def _composite_keystone_aperture(x, y, center_circle_diameter, rings,
                                 ring_radius, segments_per_ring,
                                 rotation_per_ring, radial_gap, azimuthal_gap):
    if isinstance(rotation_per_ring, numbers.Number) or rotation_per_ring is None:
        rotation_per_ring = [rotation_per_ring] * rings
    if isinstance(ring_radius, numbers.Number):
        ring_radius = [ring_radius] * rings
    if isinstance(segments_per_ring, numbers.Number):
        segments_per_ring = [segments_per_ring] * rings
    if isinstance(radial_gap, numbers.Number):
        radial_gap = [radial_gap] * rings

    center_radius = center_circle_diameter / 2
    # host grids for the same reason as the hex planner above
    x = np.asarray(x)
    y = np.asarray(y)

    local_masks = []
    local_coords = []
    segment_ids = []
    all_centers = []
    windows = []
    center_angles = []
    left_edges = []
    right_edges = []
    radial_diameters = []
    corners = []
    idods = []
    primary_mask = jnp.zeros(x.shape, dtype=config.precision)
    all_spiders = jnp.zeros(x.shape, dtype=bool)

    dx = float(x[0, 1] - x[0, 0])
    r, t = cart_to_polar(x, y)
    ccx = int(np.ceil(x.shape[1] / 2))
    ccy = int(np.ceil(y.shape[0] / 2))

    center_diameter_samples = math.ceil(center_circle_diameter / dx)
    win = _local_window(ccy, ccx, (0, 0), dx, center_diameter_samples, x, y)
    center_xx = x[win]
    center_yy = y[win]
    center_rr = r[win]
    center_tt = t[win]
    center_mask = antialias(circle_sdf(center_radius, center_rr), dx)
    primary_mask = primary_mask.at[win].set(center_mask)
    outer_radius = center_radius

    segment_id = 0
    iterable = (segments_per_ring, ring_radius, radial_gap, rotation_per_ring)
    for (nsegments, local_radius, gap, rotation) in zip(*iterable):
        inner_radius = outer_radius + gap
        outer_radius = inner_radius + local_radius
        arc_per_seg = 360 / nsegments
        arc_rad = np.radians(arc_per_seg)
        if rotation is None:
            rotation = arc_per_seg
        segment_angles = np.arange(nsegments, dtype=np.float64) * arc_per_seg + rotation
        segment_angles = np.radians(segment_angles) - np.pi

        for angle in segment_angles:
            lo = angle
            hi = angle + arc_rad
            while hi > 2 * np.pi:
                hi = hi - 2 * np.pi
            while lo > 2 * np.pi:
                lo = lo - 2 * np.pi
            if hi < lo:
                lo, hi = hi, lo
            mid = lo + arc_rad / 2
            center_angles.append(mid)

            # a pie has five corners
            c1 = (inner_radius, lo)
            c2 = (inner_radius, hi)
            c3 = (outer_radius, lo)
            c4 = (outer_radius, hi)
            c5 = (outer_radius, mid)
            arr = np.asarray([c1, c2, c3, c4, c5])
            rr_c = arr[:, 0]
            tt_c = arr[:, 1]
            xx = rr_c * np.cos(tt_c)
            yy = rr_c * np.sin(tt_c)
            minx, maxx = xx.min(), xx.max()
            miny, maxy = yy.min(), yy.max()
            rangex = maxx - minx
            rangey = maxy - miny
            samples = [math.ceil(v / dx / 2) for v in (rangex, rangey)]
            cxw = minx + rangex / 2
            cyw = miny + rangey / 2

            window = _local_window(ccy, ccx, (cxw, cyw), dx, samples, x, y)
            xxx = x[window]
            yyy = y[window]
            rr = r[window]
            tt = t[window]
            # radial (ring) edges are antialiased via SDF; the angular wedge
            # cut stays a hard boolean gate
            arc = antialias(annulus_sdf(inner_radius, outer_radius, rr), dx)
            ang_mask = (tt > lo) & (tt < hi)
            if (lo < np.pi) & (hi > np.pi):
                ang_mask = ang_mask | (tt < (hi - 2 * np.pi))
            elif (lo >= np.pi) & (hi > np.pi):
                llo = lo - 2 * np.pi
                lhi = hi - 2 * np.pi
                ang_mask = (tt > llo) & (tt < lhi)
                lo, hi = llo, lhi

            seg_mask = arc * ang_mask
            primary_mask = primary_mask.at[window].max(seg_mask)

            mid_r = (inner_radius + outer_radius) / 2
            center = (mid_r * np.cos(mid), mid_r * np.sin(mid))
            ledge = (mid_r * np.cos(lo), mid_r * np.sin(lo))
            redge = (mid_r * np.cos(hi), mid_r * np.sin(hi))
            cid = (inner_radius * np.cos(mid), inner_radius * np.sin(mid))
            cod = (outer_radius * np.cos(mid), outer_radius * np.sin(mid))
            xxc = [cid[0], cod[0]]
            yyc = [cid[1], cod[1]]

            segment_ids.append(segment_id)
            local_masks.append(seg_mask)
            local_coords.append((xxx - center[0], yyy - center[1]))
            all_centers.append(center)
            windows.append(window)
            left_edges.append(ledge)
            right_edges.append(redge)
            radial_diameters.append(outer_radius - inner_radius)
            idods.append((xxc, yyc))
            corners.append((xx, yy))
            segment_id += 1

            # spider between this arc and the next, at the right-hand seam
            minx = min(xx[1], xx[3])
            maxx = max(xx[1], xx[3])
            miny = min(yy[1], yy[3])
            maxy = max(yy[1], yy[3])
            rangex = maxx - minx
            rangey = maxy - miny
            samples = tuple(math.ceil(v) for v in (rangex / dx + gap / dx,
                                                   rangey / dx + gap / dx))
            cxw = minx + rangex / 2
            cyw = miny + rangey / 2
            window = _local_window(ccy, ccx, (cxw, cyw), dx, samples, x, y)
            xx_w = x[window]
            yy_w = y[window]
            rr = r[window]
            spid = spider(1, azimuthal_gap, xx_w, yy_w, rotation=hi,
                          rotation_is_rad=True)
            spid = spid & (circle_sdf(inner_radius, rr) > 0)
            spid = spid & (circle_sdf(outer_radius, rr) <= 0)
            all_spiders = all_spiders.at[window].max(spid)

    primary_mask = jnp.where(all_spiders, 0, primary_mask)
    return {
        'center_segment': {
            'x': center_xx, 'y': center_yy, 'r': center_rr, 't': center_tt,
            'mask': center_mask, 'window': win,
        },
        'keystones': {
            'centers': all_centers, 'corners': corners, 'ids_ods': idods,
            'windows': windows, 'local_xy': local_coords, 'masks': local_masks,
            'rotations': center_angles, 'left_edges': left_edges,
            'right_edges': right_edges, 'radial_diameters': radial_diameters,
            'ids': segment_ids,
        },
        'amplitude_mask': primary_mask,
    }
