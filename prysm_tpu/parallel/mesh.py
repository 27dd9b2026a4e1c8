"""Device mesh helpers."""
import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axis_sizes, devices=None):
    """Create a Mesh from an ordered {axis_name: size} mapping.

    The product of sizes must equal the device count; pass -1 for at most
    one axis to infer its size.
    """
    if devices is None:
        devices = jax.devices()
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    n = len(devices)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total != n:
        raise ValueError(f'mesh sizes {sizes} do not match device count {n}')
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(names))


def mesh_axes(mesh):
    """Ordered axis names of a mesh."""
    return tuple(mesh.axis_names)
