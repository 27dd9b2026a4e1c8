"""Polynomial families: Jacobi, Zernike, Chebyshev, Legendre, Hermite,
Laguerre, Dickson, Q (Forbes), XY, plus fitting/mode-sum machinery.

Each family exposes the canonical surface of the reference
(prysm/polynomials/__init__.py:1-7): <f>, <f>_seq, <f>_der, <f>_der_seq.
"""
from .jacobi import (  # NOQA
    jacobi, jacobi_der, jacobi_seq, jacobi_der_seq,
    jacobi_with_der, jacobi_seq_with_der,
    jacobi_sum_clenshaw, jacobi_radial_sum, jacobi_radial_sum_der_xy,
)
from .zernike import (  # NOQA
    zernike_norm, zernike_nm, zernike_nm_seq, zernike_sum,
    zernike_nm_der, zernike_nm_der_seq,
    zernike_nm_der_xy, zernike_nm_der_xy_seq, zernike_sum_der_xy,
    nm_to_fringe, nm_to_ansi_j, ansi_j_to_nm, noll_to_nm, fringe_to_nm,
    nm_to_name, top_n, zernikes_to_magnitude_angle,
    zernikes_to_magnitude_angle_nmkey, zero_separation,
)
from .fitting import (  # NOQA
    sum_of_2d_modes, sum_of_2d_modes_adjoint, hopkins, lstsq,
    normalize_modes, orthogonalize_modes,
)
