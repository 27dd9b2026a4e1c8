"""Compatibility alias for the historically misspelled module name.

The reference ships ``prysm/degredations.py`` re-exporting
``degradations`` so imports against the old spelling keep working
(reference degredations.py:1-4); this module mirrors that seam.
"""
from .degradations import *  # NOQA
from .degradations import jitter_ft, smear_ft  # NOQA
