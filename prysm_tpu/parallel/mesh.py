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


def make_hybrid_mesh(dcn_axes, ici_axes, devices=None):
    """A mesh with slow (DCN, inter-host) and fast (ICI, intra-host) axes.

    dcn_axes / ici_axes are ordered {name: size} mappings.  On a real
    multi-process pod slice this delegates to
    ``mesh_utils.create_hybrid_device_mesh`` so DCN axes map across
    hosts; on a single process (including virtual CPU devices) the
    device list is reshaped directly, preserving the axis semantics for
    dry runs.  Collectives over the leading (DCN) axes then model the
    inter-host hops; everything else rides ICI.
    """
    names = tuple(dcn_axes) + tuple(ici_axes)
    dcn_shape = tuple(dcn_axes.values())
    ici_shape = tuple(ici_axes.values())
    if devices is None:
        devices = jax.devices()
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils
        dev_array = mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=devices)
        # create_hybrid_device_mesh returns (*dcn, *ici) mesh shape
        return Mesh(dev_array, axis_names=names)
    want = int(np.prod(dcn_shape)) * int(np.prod(ici_shape))
    if want != len(devices):
        raise ValueError(
            f'hybrid mesh wants {want} devices, have {len(devices)}')
    dev_array = np.asarray(devices).reshape(dcn_shape + ici_shape)
    return Mesh(dev_array, axis_names=names)
