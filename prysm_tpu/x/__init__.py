"""Experimental subsystems (instrument models, optimizers, raytracing, ...).

Like the reference (prysm/x/__init__.py is empty), subpackages are imported
explicitly: ``from prysm_tpu.x import dm``, etc.
"""
