"""Plotting for coating designs.

Rebuild of ``prysm/x/coatings/plotting.py``: spectrum, index profile,
standing-wave intensity, admittance diagram, and monitoring traces.
"""
import numpy as np

from ...plotting import share_fig_ax
from .stack import RTA, field_at_depth, internal_fields
from .monitoring import monitoring_trace


def _boundary_depths(stack):
    th = np.asarray(stack.thicknesses)
    return np.concatenate([[0.0], np.cumsum(th)])


def _rta_pol(stack, wvls, theta, pol):
    """(R, T, A_total) versus wvls for 's' / 'p' / 'avg'."""
    if pol == 'avg':
        Rs, Ts, As = _rta_pol(stack, wvls, theta, 's')
        Rp, Tp, Ap = _rta_pol(stack, wvls, theta, 'p')
        return 0.5 * (Rs + Rp), 0.5 * (Ts + Tp), 0.5 * (As + Ap)
    R, T, A = RTA(stack, wvls, theta, pol)
    R = np.asarray(R)
    T = np.asarray(T)
    return R, T, 1.0 - R - T


def plot_spectrum(stack, wvls, theta=0.0, pol='avg', quantities=('R', 'T'),
                  fig=None, ax=None):
    """Reflectance / transmittance / absorptance vs wavelength."""
    wvls = np.asarray(wvls)
    R, T, A = _rta_pol(stack, wvls, theta, pol)
    series = {'R': R, 'T': T, 'A': A}
    labels = {'R': 'reflectance', 'T': 'transmittance',
              'A': 'absorptance'}
    fig, ax = share_fig_ax(fig, ax)
    for q in quantities:
        if q not in series:
            raise ValueError(
                f"unknown spectrum quantity {q!r}; choose from "
                f"{sorted(series)}")
        ax.plot(wvls, series[q], label=labels[q])
    ax.set_xlabel('wavelength [um]')
    ax.set_ylabel('fraction of incident power')
    ax.legend()
    return fig, ax


def plot_index_profile(stack, wvl=0.55, fig=None, ax=None):
    """Step plot of refractive index versus depth through the stack."""
    Z = _boundary_depths(stack)
    ns = stack.resolved_indices(wvl)
    ns = np.asarray([np.real(np.asarray(n)) for n in ns], dtype=float)
    fig, ax = share_fig_ax(fig, ax)
    for k in range(len(stack)):
        ax.plot([Z[k], Z[k + 1]], [ns[k], ns[k]], c='C0')
        if k > 0:
            ax.plot([Z[k], Z[k]], [ns[k - 1], ns[k]], c='C0', lw=0.75)
    ax.set_xlabel('depth [um]')
    ax.set_ylabel('refractive index')
    return fig, ax


def plot_field_intensity(stack, wvl, theta=0.0, pol='s', n_points=1000,
                         fig=None, ax=None):
    """Standing-wave intensity abs(E(z))^2 through the stack."""
    Z = _boundary_depths(stack)
    z = np.linspace(0.0, float(Z[-1]), n_points)
    E, _ = field_at_depth(stack, z, wvl, theta, pol)
    intensity = np.abs(np.asarray(E)) ** 2
    fig, ax = share_fig_ax(fig, ax)
    ax.plot(z, intensity, c='C3')
    for zb in Z[1:-1]:
        ax.axvline(zb, c='k', lw=0.5, alpha=0.3)
    ax.set_xlabel('depth [um]')
    ax.set_ylabel('|E|^2 (incident = 1)')
    return fig, ax


def plot_admittance(stack, wvl, theta=0.0, pol='s', n_points=2000,
                    fig=None, ax=None):
    """The admittance diagram: the H/E locus through the stack."""
    Z = _boundary_depths(stack)
    z = np.linspace(0.0, float(Z[-1]), n_points)
    E, H = field_at_depth(stack, z, wvl, theta, pol)
    Y = np.asarray(H) / np.asarray(E)
    fig, ax = share_fig_ax(fig, ax)
    ax.plot(np.real(Y), np.imag(Y), c='C2')
    Eb, Hb = internal_fields(stack, wvl, theta, pol)
    Yb = np.asarray(Hb) / np.asarray(Eb)
    ax.scatter(np.real(Yb), np.imag(Yb), c='k', s=12, zorder=4)
    ax.set_xlabel('Re(Y)  (admittance)')
    ax.set_ylabel('Im(Y)')
    ax.set_aspect('equal', adjustable='datalim')
    return fig, ax


def plot_monitoring_trace(stack, layer, monitor_wvl, theta=0.0, pol='s',
                          mode='R', n_points=400, max_factor=1.0,
                          fig=None, ax=None):
    """In-situ monitoring signal while one layer is deposited."""
    d, sig = monitoring_trace(stack, layer, monitor_wvl, theta=theta,
                              pol=pol, mode=mode, n_points=n_points,
                              max_factor=max_factor)
    fig, ax = share_fig_ax(fig, ax)
    ax.plot(np.asarray(d), np.asarray(sig), c='C4')
    ax.set_xlabel('deposited thickness [um]')
    ax.set_ylabel(f'monitor signal ({mode})')
    return fig, ax


__all__ = [
    'plot_spectrum',
    'plot_index_profile',
    'plot_field_intensity',
    'plot_admittance',
    'plot_monitoring_trace',
]
