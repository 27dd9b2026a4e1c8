"""3D line/ray geometry helpers used by raytracing routines.

Rebuild of ``prysm/x/raytracing/_line_math.py``; host numpy.
"""
import numpy as np


def normalize_vector(v, axis=-1):
    """v scaled to unit length along axis."""
    v = np.asarray(v)
    return v / np.linalg.norm(v, axis=axis, keepdims=True)


def unit_vector_between(P1, P2):
    """Unit vector pointing from P1 to P2."""
    diff = np.asarray(P2) - np.asarray(P1)
    return normalize_vector(diff, axis=-1)


def closest_point_on_line_to_line(P, S, axis_point, axis_dir):
    """Point on (axis_point, axis_dir) closest to the line (P, S).

    Parallel lines return the foot of perpendicular from P onto the axis.
    """
    A = np.asarray(P)
    Sc = np.asarray(S)
    B = np.asarray(axis_point)
    Sa = normalize_vector(axis_dir, axis=-1)
    w = A - B
    a = np.dot(Sc, Sc)
    b = np.dot(Sc, Sa)
    c = np.dot(Sa, Sa)
    d = np.dot(Sc, w)
    e = np.dot(Sa, w)
    denom = a * c - b * b
    if abs(denom) < 1e-30:
        t = e / c
        return B + t * Sa
    t = (a * e - b * d) / denom
    return B + t * Sa
