"""Polynomial indexing helpers shared by raytracing IO parsers."""
from ....polynomials import noll_to_nm, fringe_to_nm, xy_j_to_mn  # NOQA: F401
