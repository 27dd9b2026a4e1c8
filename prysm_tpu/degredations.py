"""Compatibility alias for the historically misspelled module name.

Older prysm releases shipped the degradations module under the
misspelled name ``degredations``; downstream code written against those
releases imports the old spelling.  The v0.22 reference no longer
carries the alias, but we keep this seam so such code ports unchanged.
"""
from .degradations import *  # NOQA
from .degradations import jitter_ft, smear_ft  # NOQA
