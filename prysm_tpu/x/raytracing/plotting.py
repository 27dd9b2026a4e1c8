"""Layout drawings and analysis plots for raytracing.

Rebuild of ``prysm/x/raytracing/plotting.py`` with a condensed drawing
core: surface meridional profiles over their drawn radii, lens-element
glass outlines, mirror substrates, stop markers, ray-path overlays, and
the standard analysis plots (spots, fans, OPD fans, field curvature,
distortion, chromatic focal shift, lateral color, full-field maps).
"""
import warnings

import numpy as np

from .spencer_and_murty import (
    STYPE_REFLECT, STYPE_REFRACT, valid_mask, _is_measurement_surf)
from .lensdata import lens_element_groups
from ._resolve import compiled_surfaces, resolve_wavelength
from ._trace_grid import layout_records, _resolve_fields


def share_fig_ax(fig=None, ax=None):
    """(fig, ax), creating either as needed."""
    import matplotlib.pyplot as plt
    if fig is None and ax is None:
        fig, ax = plt.subplots()
    elif ax is None:
        ax = fig.gca()
    elif fig is None:
        fig = ax.get_figure()
    return fig, ax


_AXIS_INDEX = {'x': 0, 'y': 1, 'z': 2}


def _axis_pair(x, y):
    try:
        return _AXIS_INDEX[x.lower()], _AXIS_INDEX[y.lower()]
    except KeyError:
        raise ValueError(f"axes must be 'x', 'y', or 'z'; got {x!r}, {y!r}")


def plot_ray_paths(result, *, x='z', y='y', lw=1, ls='-', c='r', alpha=1,
                   zorder=4, fig=None, ax=None):
    """Draw the traced ray paths of a RayTraceResult.

    Invalid rays are dropped; the default view is the classical ZY plot.
    """
    ix, iy = _axis_pair(x, y)
    fig, ax = share_fig_ax(fig, ax)
    P = np.asarray(result.P)
    mask = valid_mask(result.status, P[-1])
    P = np.array(P, copy=True)
    if mask is not None:
        P[:, ~np.asarray(mask), :] = np.nan
    ax.plot(P[..., ix], P[..., iy], lw=lw, ls=ls, c=c, alpha=alpha,
            zorder=zorder)
    ax.set(xlabel=x, ylabel=y)
    return fig, ax


def _footprint_radius(surf, phist, j):
    """Max valid ray radius at surface j, in its local frame."""
    from .spencer_and_murty import transform_to_local_coords
    p = np.asarray(phist)[j + 1]
    loc, _ = transform_to_local_coords(p, surf.P, np.zeros_like(p), surf.R)
    loc = np.asarray(loc)
    r = np.hypot(loc[..., 0], loc[..., 1])
    r = r[np.isfinite(r)]
    return float(r.max()) if r.size else 0.0


def _drawn_radius(surf, phist, j):
    """Drawn semi-diameter for surface j (extent, clip, or footprint)."""
    foot = None if phist is None else _footprint_radius(surf, phist, j)
    r = surf.aperture.drawn_radius(foot)
    if r is None or r == 0.0:
        r = foot or 1.0
    return float(r)


def _surface_profile_points(surf, radius, points, inner_radius=0.0):
    """Global (N, 3) meridional profile of a surface along its local y."""
    yloc = np.linspace(-radius, radius, points)
    if inner_radius > 0:
        yloc = yloc[np.abs(yloc) >= inner_radius]
    xloc = np.zeros_like(yloc)
    sag = np.asarray(surf.sag(xloc, yloc))
    pts = np.stack([xloc, yloc, sag], axis=1)
    if surf.R is not None:
        pts = pts @ np.asarray(surf.R)
    return pts + np.asarray(surf.P)


def plot_optics(system, result=None, *, wvl=None, ambient_index=1.0,
                index_atol=1e-9, points=100, lw=1, ls='-', c='k', alpha=1,
                zorder=3, x='z', y='y', fig=None, ax=None,
                stop_index=None):
    """Draw the optics of a system: surface profiles, glass, stop marks.

    Surfaces draw over their aperture's drawn radius (footprint-sized
    when auto extents are unsolved; run sys.solve.apertures() to size
    and persist them); consecutive refracting surfaces of one element
    connect with edge lines; a bare-plane stop draws edge T-marks.
    """
    wvl = resolve_wavelength(system, wvl)
    ix, iy = _axis_pair(x, y)
    fig, ax = share_fig_ax(fig, ax)
    surfaces = compiled_surfaces(system)
    phist = None if result is None else result.P
    if stop_index is None:
        stop_index = getattr(system, 'stop_index', None)

    profiles = {}
    for j, surf in enumerate(surfaces):
        if _is_measurement_surf(surf.typ) and j != len(surfaces) - 1 \
                and j != stop_index:
            continue
        radius = _drawn_radius(surf, phist, j)
        inner = 0.0
        extent = surf.aperture.extent
        if extent is not None:
            inner = float(getattr(extent, 'inner_radius', 0.0))
        pts = _surface_profile_points(surf, radius, points, inner)
        profiles[j] = pts
        is_stop_plane = (j == stop_index
                         and surf.typ not in (STYPE_REFLECT, STYPE_REFRACT))
        if _is_measurement_surf(surf.typ) and not is_stop_plane:
            ax.plot(pts[:, ix], pts[:, iy], lw=lw, ls='--', c='0.5',
                    alpha=alpha, zorder=zorder)
        elif is_stop_plane:
            _draw_stop_marks(ax, surf, radius, ix, iy, zorder)
        else:
            ax.plot(pts[:, ix], pts[:, iy], lw=lw, ls=ls, c=c, alpha=alpha,
                    zorder=zorder)
        # mirror substrate back line
        substrate = surf.aperture.substrate
        if substrate is not None and surf.typ == STYPE_REFLECT:
            t = float(getattr(substrate, 'thickness', 0.0))
            back = pts.copy()
            back[:, 2] = back[:, 2] + t
            ax.plot(back[:, ix], back[:, iy], lw=lw, ls=ls, c=c,
                    alpha=alpha, zorder=zorder)
            for k in (0, -1):
                ax.plot([pts[k, ix], back[k, ix]],
                        [pts[k, iy], back[k, iy]], lw=lw, ls=ls, c=c,
                        alpha=alpha, zorder=zorder)

    # close the lens-element glass outlines
    try:
        groups = lens_element_groups(surfaces, wvl=wvl,
                                     ambient_index=ambient_index,
                                     index_atol=index_atol)
    except ValueError:
        groups = []
    for group in groups:
        for a, b in zip(group[:-1], group[1:]):
            if a not in profiles or b not in profiles:
                continue
            pa = profiles[a]
            pb = profiles[b]
            for ka, kb in ((0, 0), (-1, -1)):
                ax.plot([pa[ka, ix], pb[kb, ix]],
                        [pa[ka, iy], pb[kb, iy]], lw=lw, ls=ls, c=c,
                        alpha=alpha, zorder=zorder)

    ax.set(xlabel=x, ylabel=y)
    ax.set_aspect('equal')
    return fig, ax


def _draw_stop_marks(ax, surf, radius, ix, iy, zorder):
    """Edge T-marks for a bare-plane aperture stop."""
    stem = 0.2 * radius
    for sign in (1.0, -1.0):
        edge = np.array([[0.0, sign * radius, 0.0],
                         [0.0, sign * (radius + stem), 0.0]])
        bar = np.array([[0.0, sign * radius, -0.5 * stem],
                        [0.0, sign * radius, 0.5 * stem]])
        for seg in (edge, bar):
            pts = seg
            if surf.R is not None:
                pts = pts @ np.asarray(surf.R)
            pts = pts + np.asarray(surf.P)
            ax.plot(pts[:, ix], pts[:, iy], lw=1.5, c='k', zorder=zorder)


def layout(system, *, fields=None, wavelength=None, sampling=None,
           axis='y', colors=None, lw=1, fig=None, ax=None, **optics_kwargs):
    """2D layout: the optics plus one traced fan per field."""
    records, outline = layout_records(system, fields=fields,
                                     wavelength=wavelength,
                                     sampling=sampling, axis=axis)
    fig, ax = share_fig_ax(fig, ax)
    plot_optics(system, outline, wvl=wavelength, fig=fig, ax=ax,
                **optics_kwargs)
    if colors is None:
        import matplotlib.pyplot as plt
        cycle = plt.rcParams['axes.prop_cycle'].by_key().get(
            'color', ['r', 'g', 'b'])
        colors = [cycle[i % len(cycle)] for i in range(len(records))]
    for rec, color in zip(records, colors):
        plot_ray_paths(rec.trace, y=axis, c=color, lw=lw, fig=fig, ax=ax)
    return fig, ax


def plot_transverse_ray_aberration(phist, lw=1, ls='-', c='r', alpha=1,
                                   zorder=4, axis='y', chief_index=None,
                                   status=None, reference='chief',
                                   fig=None, ax=None):
    """Transverse ray-aberration fan plot for one traced bundle."""
    from .analysis import transverse_ray_aberration
    pupil, delta = transverse_ray_aberration(
        phist, axis=axis, chief_index=chief_index, status=status,
        reference=reference)
    order = np.argsort(pupil)
    fig, ax = share_fig_ax(fig, ax)
    ax.plot(pupil[order], delta[order], lw=lw, ls=ls, c=c, alpha=alpha,
            zorder=zorder)
    ax.set(xlabel=f'pupil {axis}', ylabel=f'image Δ{axis}')
    return fig, ax


def plot_wave_aberration_fan(coord, opd, *, wavelength=None, units='waves',
                             lw=1, ls='-', c='b', alpha=1, zorder=4,
                             fig=None, ax=None):
    """Wavefront (OPD) fan plot from pupil coordinates + OPD samples."""
    coord = np.asarray(coord)
    opd = np.asarray(opd)
    if units == 'waves' and wavelength is not None:
        opd = opd / float(wavelength)
    order = np.argsort(coord)
    fig, ax = share_fig_ax(fig, ax)
    ax.plot(coord[order], opd[order], lw=lw, ls=ls, c=c, alpha=alpha,
            zorder=zorder)
    ax.set(xlabel='pupil coordinate', ylabel=f'OPD [{units}]')
    return fig, ax


def plot_spot_diagram(phist, marker='+', c='k', alpha=1, zorder=4, s=None,
                      status=None, origin=None, fig=None, ax=None):
    """Image-plane spot diagram for one traced bundle."""
    from .analysis import spot_positions
    xs, ys = spot_positions(np.asarray(phist)[-1], status=status,
                            origin=origin)
    fig, ax = share_fig_ax(fig, ax)
    ax.scatter(xs, ys, marker=marker, c=c, alpha=alpha, zorder=zorder, s=s)
    ax.set(xlabel='x', ylabel='y')
    ax.set_aspect('equal')
    return fig, ax


def _field_axis_values(fields):
    """Scalar field magnitudes for sweep plots (signed along y)."""
    out = []
    for f in fields:
        mag = float(np.hypot(f.hx, f.hy))
        if f.hy < 0 or (f.hy == 0 and f.hx < 0):
            mag = -mag
        out.append(mag)
    return np.asarray(out)


def plot_field_curvature(system, fields=None, wavelength=None, *,
                         samples=101, fig=None, ax=None):
    """S/T (or X/Y) parabasal focus vs field."""
    from .analysis import field_curvature
    r = field_curvature(system, fields, wavelength, samples=samples)
    h = _field_axis_values(r.fields)
    fig, ax = share_fig_ax(fig, ax)
    ax.plot(r.x_fan_z - r.image_z, h, label=r.labels[0])
    ax.plot(r.y_fan_z - r.image_z, h, ls='--', label=r.labels[1])
    ax.legend()
    ax.set(xlabel=f'focus shift [{r.unit}]', ylabel='field')
    return fig, ax


def plot_distortion(system, fields=None, wavelength=None, *, epd=None,
                    samples=101, distortion_type='f-tan', fig=None, ax=None):
    """Percent distortion vs field."""
    from .analysis import distortion
    r = distortion(system, fields, wavelength, epd=epd, samples=samples,
                   distortion_type=distortion_type)
    h = _field_axis_values(r.fields)
    fig, ax = share_fig_ax(fig, ax)
    ax.plot(r.percent, h)
    ax.set(xlabel='distortion [%]', ylabel='field')
    return fig, ax


def plot_chromatic_focal_shift(system, wavelengths=None, *, samples=101,
                               focus='best', epd=None, fig=None, ax=None):
    """Focus shift vs wavelength."""
    from .analysis import chromatic_focal_shift
    w, shift = chromatic_focal_shift(system, wavelengths, samples=samples,
                                     focus=focus, epd=epd)
    fig, ax = share_fig_ax(fig, ax)
    ax.plot(w, shift)
    ax.set(xlabel='wavelength [um]', ylabel='focus shift')
    return fig, ax


def plot_lateral_color(system, fields=None, wavelengths=None, *, epd=None,
                       samples=101, fig=None, ax=None):
    """Chief-ray lateral color vs field, referenced to the first column."""
    from .analysis import lateral_color
    from ._trace_grid import _resolve_wavelengths, field_sweep
    fields = field_sweep(system, fields, samples)
    wvls = _resolve_wavelengths(system, wavelengths)
    landing = lateral_color(system, fields, wvls, epd=epd)
    h = _field_axis_values(fields)
    fig, ax = share_fig_ax(fig, ax)
    # one curve per non-reference wavelength; the reference column is the
    # zero of the differences and would plot as a flat line
    ref = int(getattr(system, 'reference', 0) or 0)
    if not 0 <= ref < len(wvls):
        ref = 0
    for j, w in enumerate(wvls):
        if j == ref:
            continue
        dy = landing[:, j, 1] - landing[:, ref, 1]
        ax.plot(dy, h, label=f'{w:.4g} um')
    ax.legend()
    ax.set(xlabel='lateral shift', ylabel='field')
    return fig, ax


def plot_full_field(grid, *, cmap='viridis', clim=None, colorbar=True,
                    fig=None, ax=None):
    """Render a FullFieldGrid metric map."""
    fig, ax = share_fig_ax(fig, ax)
    im = ax.pcolormesh(np.asarray(grid.hx), np.asarray(grid.hy),
                       np.asarray(grid.data), cmap=cmap, shading='auto')
    if clim is not None:
        im.set_clim(*clim)
    if colorbar:
        fig.colorbar(im, ax=ax, label=f'{grid.metric} [{grid.data_unit}]')
    ax.set(xlabel=f'field x [{grid.unit}]', ylabel=f'field y [{grid.unit}]')
    ax.set_aspect('equal')
    return fig, ax


def _wavelength_colors(nw, colors):
    if colors is not None:
        return list(colors)
    import matplotlib.pyplot as plt
    cycle = plt.rcParams['axes.prop_cycle'].by_key().get(
        'color', ['b', 'g', 'r'])
    return [cycle[j % len(cycle)] for j in range(nw)]


def _plot_fan_grid(grid, value_label, *, axes='both', colors=None,
                   sharey='row', figsize=None):
    """Shared renderer for RayFanGrid / OPDFanGrid."""
    import matplotlib.pyplot as plt
    nf = len(grid.fields)
    ncols = 2 if axes == 'both' else 1
    fig, axs = plt.subplots(nf, ncols, sharey=sharey, figsize=figsize,
                            squeeze=False)
    colors = _wavelength_colors(len(grid.wavelengths), colors)
    panels = (('y', 'x') if axes == 'both'
              else (axes,))
    for i in range(nf):
        for kcol, which in enumerate(panels):
            ax = axs[i][kcol]
            pupil = grid.pupil_y[i] if which == 'y' else grid.pupil_x[i]
            data = grid.y[i] if which == 'y' else grid.x[i]
            for j, w in enumerate(grid.wavelengths):
                order = np.argsort(pupil)
                ax.plot(pupil[order], data[j][order], c=colors[j],
                        label=f'{w:.4g} um' if i == 0 else None)
            ax.set(xlabel=f'pupil {which}',
                   ylabel=value_label if kcol == 0 else None)
    axs[0][0].legend(fontsize='small')
    return fig, axs


def plot_ray_fans(fan_grid, *, axes='both', colors=None, sharey='row',
                  figsize=None):
    """Grid of transverse ray-aberration fans (RayFanGrid)."""
    return _plot_fan_grid(fan_grid, f'Δ [{fan_grid.unit}]',
                          axes=axes, colors=colors, sharey=sharey,
                          figsize=figsize)


def plot_opd_fans(fan_grid, *, axes='both', colors=None, sharey='row',
                  figsize=None):
    """Grid of OPD fans (OPDFanGrid)."""
    return _plot_fan_grid(fan_grid, f'OPD [{fan_grid.unit}]',
                          axes=axes, colors=colors, sharey=sharey,
                          figsize=figsize)


def plot_spots(spot_grid, *, colors=None, s=4, figsize=None,
               sharexy=True):
    """Grid of spot diagrams (SpotGrid), one panel per field."""
    import matplotlib.pyplot as plt
    nf = len(spot_grid.fields)
    fig, axs = plt.subplots(1, nf, figsize=figsize, squeeze=False,
                            sharex=sharexy, sharey=sharexy)
    colors = _wavelength_colors(len(spot_grid.wavelengths), colors)
    for i in range(nf):
        ax = axs[0][i]
        for j, w in enumerate(spot_grid.wavelengths):
            ax.scatter(spot_grid.x[i, j], spot_grid.y[i, j], s=s,
                       c=colors[j],
                       label=f'{w:.4g} um' if i == 0 else None)
        ax.set_aspect('equal')
        ax.set(xlabel='x', title=f'field {i}')
    axs[0][0].set(ylabel='y')
    axs[0][0].legend(fontsize='small')
    return fig, axs


def plot_spot_diagrams(spot_grid, *, ncols=None, colors=None, marker='+',
                       s=None, equal_limits=True, legend=True, figsize=None,
                       fig=None, axs=None):
    """Grid of spot diagrams, one subplot per field, richer layout.

    Consumes a SpotGrid from analysis.spot_diagrams and scatters every
    wavelength (colored) in each field's subplot; equal_limits gives all
    subplots the same square limits so spot sizes compare by eye
    (reference: x/raytracing/plotting.py:1417).
    """
    import matplotlib.pyplot as plt
    nf = len(spot_grid.fields)
    nw = len(spot_grid.wavelengths)
    if ncols is None:
        ncols = nf
    nrows = (nf + ncols - 1) // ncols
    if axs is None:
        fig, axs = plt.subplots(nrows, ncols, figsize=figsize,
                                squeeze=False)
    else:
        axs = np.atleast_2d(axs)
        fig = fig or axs.flat[0].figure
    colors = _wavelength_colors(nw, colors)
    half = 0.0
    for i in range(nf):
        ax = axs.flat[i]
        for j, w in enumerate(spot_grid.wavelengths):
            x = np.asarray(spot_grid.x[i, j])
            y = np.asarray(spot_grid.y[i, j])
            ax.scatter(x, y, s=s, marker=marker, c=colors[j],
                       label=f'{w:.4g} um' if i == 0 else None)
            fin = np.isfinite(x) & np.isfinite(y)
            if fin.any():
                half = max(half, float(np.abs(x[fin]).max()),
                           float(np.abs(y[fin]).max()))
        ax.set_aspect('equal')
        ax.set(xlabel='x', title=f'field {i}')
        if i % ncols == 0:
            ax.set(ylabel='y')
    if equal_limits and half > 0.0:
        pad = 1.05 * half
        for i in range(nf):
            axs.flat[i].set(xlim=(-pad, pad), ylim=(-pad, pad))
    for i in range(nf, nrows * ncols):
        axs.flat[i].set_visible(False)
    if legend:
        axs.flat[0].legend(fontsize='small')
    return fig, axs


# ---------- mirror outlines --------------------------------------------------

def _mirror_profile(surf, result, surface_index, points, radius, center):
    """(N, 3) global meridional profile of a mirror's optical face.

    Returns (pts, yloc, sag, center) with center resolved to a number
    so callers can reference downstream geometry (bores, back rules) to
    the same origin as the sampled meridian.
    """
    phist = None if result is None else result.P
    if center == 'chief':
        if phist is None:
            raise ValueError(
                "center='chief' needs a trace result to locate the "
                'bundle; pass result= or a numeric center')
        p = np.asarray(phist)[surface_index + 1]
        from .spencer_and_murty import transform_to_local_coords
        loc, _ = transform_to_local_coords(p, surf.P, np.zeros_like(p),
                                           surf.R)
        yv = np.asarray(loc)[..., 1]
        yv = yv[np.isfinite(yv)]
        center = float(yv.mean()) if yv.size else 0.0
    center = float(center)
    if radius is None:
        radius = _drawn_radius(surf, phist, surface_index)
    yloc = np.linspace(center - radius, center + radius, points)
    xloc = np.zeros_like(yloc)
    sag = np.asarray(surf.sag(xloc, yloc))
    pts = np.stack([xloc, yloc, sag], axis=1)
    return pts, yloc, sag, center


def _profile_to_global(surf, pts):
    if surf.R is not None:
        pts = pts @ np.asarray(surf.R)
    return pts + np.asarray(surf.P)


def mirror_surface_outline(surf, result=None, surface_index=0, *, points=100,
                           x='z', y='y', radius=None, center=0.0):
    """X/Y arrays drawing one mirror optical surface's meridian.

    The drawn half-diameter defaults to the surface aperture's drawn
    radius, else the traced ray footprint; center='chief' re-centers the
    profile on the bundle (reference: x/raytracing/plotting.py:334).
    """
    pts, _, _, _ = _mirror_profile(surf, result, surface_index, points,
                                   radius, center)
    g = _profile_to_global(surf, pts)
    ix, iy = _axis_pair(x, y)
    return g[:, ix], g[:, iy]


def mirror_substrate_outline(surf, result=None, surface_index=0, *,
                             substrate, points=100, x='z', y='y',
                             radius=None, center=0.0):
    """Closed X/Y outline of a mirror: optical face, back, rim walls.

    substrate selects the back-face rule: SurfaceSubstrate retraces the
    optical profile; ParallelSubstrate offsets it by the thickness;
    FlatParentSubstrate is flat at vertex sag + thickness;
    FlatBackSubstrate is flat at the aperture-edge (or vertex) sag +
    thickness; None draws the optical face only
    (reference: x/raytracing/plotting.py:374).
    """
    pts, yloc, sag, center = _mirror_profile(surf, result, surface_index,
                                             points, radius, center)
    ix, iy = _axis_pair(x, y)
    if substrate is None:
        g = _profile_to_global(surf, pts)
        return g[:, ix], g[:, iy]
    zz, yy = substrate.back_outline(surf, yloc, sag, center=center)
    path = np.stack([np.zeros_like(yy), yy, zz], axis=1)
    # NaN separators (bored backs) survive the rigid transform
    g = _profile_to_global(surf, path)
    return g[:, ix], g[:, iy]


def plot_mirror_surface(surf, result=None, surface_index=0, *, points=100,
                        x='z', y='y', radius=None, center=0.0,
                        lw=1, ls='-', c='k', alpha=1, zorder=3,
                        fig=None, ax=None):
    """Draw one mirror optical surface (see mirror_surface_outline)."""
    fig, ax = share_fig_ax(fig, ax)
    xx, yy = mirror_surface_outline(
        surf, result, surface_index, points=points, x=x, y=y,
        radius=radius, center=center)
    ax.plot(xx, yy, c=c, lw=lw, ls=ls, alpha=alpha, zorder=zorder)
    return fig, ax


def plot_mirror_substrate(surf, result=None, surface_index=0, *, substrate,
                          points=100, x='z', y='y', radius=None, center=0.0,
                          lw=1, ls='-', c='k', alpha=1, zorder=3,
                          fig=None, ax=None):
    """Draw one mirror with its optical surface and substrate outline."""
    fig, ax = share_fig_ax(fig, ax)
    xx, yy = mirror_substrate_outline(
        surf, result, surface_index, substrate=substrate, points=points,
        x=x, y=y, radius=radius, center=center)
    ax.plot(xx, yy, c=c, lw=lw, ls=ls, alpha=alpha, zorder=zorder)
    return fig, ax


__all__ = [
    'share_fig_ax',
    'plot_ray_paths',
    'plot_optics',
    'layout',
    'plot_transverse_ray_aberration',
    'plot_wave_aberration_fan',
    'plot_spot_diagram',
    'plot_spot_diagrams',
    'plot_field_curvature',
    'plot_distortion',
    'plot_chromatic_focal_shift',
    'plot_lateral_color',
    'plot_full_field',
    'plot_ray_fans',
    'plot_opd_fans',
    'plot_spots',
    'mirror_surface_outline',
    'mirror_substrate_outline',
    'plot_mirror_surface',
    'plot_mirror_substrate',
]
