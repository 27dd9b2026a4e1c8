"""Distributed matrix-DFT: shard the contraction (pupil) axis.

The third mesh pattern from SURVEY §5: ``out = norm * Ey @ a @ Ex.T``
contracts over the pupil rows/columns, so sharding the pupil's row axis
gives each device a horizontal slab of the pupil and ``Ey``'s matching
columns; the per-device partial products combine with one ``psum``.
This is the layout for pupils too large for one chip's HBM — the focal
result is replicated, the pupil never is.

The row-tile pattern in ``sharding.py`` is the communication-free dual
(shard the OUTPUT rows); this one trades a psum for sharded input.
"""
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..fttools import MDFT


def shard_mdft_contraction(mesh, plan, axis='ct'):
    """Jitted pupil -> focal apply with the pupil rows sharded.

    plan: an fttools.MDFT; axis: mesh axis to shard the contraction
    (pupil row) dimension over.  Returns apply(a) taking the FULL (Ny,
    Nx) pupil (sharded on entry by constraint) and returning the
    replicated (My, Mx) focal field.  The Ny axis must divide the mesh
    axis size.
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if axis not in sizes:
        raise ValueError(
            f'mesh has axes {sorted(sizes)}; no axis named {axis!r}')
    n_shard = sizes[axis]
    Ny = plan.Ey_re.shape[1]   # real leaf: no eager complex assembly
    if Ny % n_shard:
        raise ValueError(
            f'pupil row count {Ny} does not divide over {n_shard} '
            f'devices on axis {axis!r}')

    def local(a_rows, Ey_cols, Ex):
        # partial = Ey[:, rows] @ a[rows, :] — contraction-sharded matmul;
        # the psum completes the row sum, then the (small, replicated)
        # Ex contraction runs on every device
        partial = jnp.matmul(Ey_cols, a_rows.astype(Ey_cols.dtype))
        full = jax.lax.psum(partial, axis)
        return jnp.matmul(full, Ex.T) * plan.norm

    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(None, axis), P()),
        out_specs=P())

    def apply(a):
        return mapped(a, plan.Ey, plan.Ex)

    return jax.jit(apply)


def shard_mdft_contraction_roundtrip(mesh, plan, focal_factor=None,
                                     axis='ct'):
    """Jitted pupil -> focal -> (mask) -> pupil round trip, pupil sharded.

    focal_factor: optional (My, Mx) array multiplied at the focal plane
    (a mask, a window — evaluate it host-side once).  Both legs keep the
    pupil rows sharded; the focal plane is small and replicated.
    Returns apply(a) with a (Ny, Nx) pupil in and out.
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if axis not in sizes:
        raise ValueError(
            f'mesh has axes {sorted(sizes)}; no axis named {axis!r}')
    n_shard = sizes[axis]
    Ny = plan.Ey_re.shape[1]   # real leaf: no eager complex assembly
    if Ny % n_shard:
        raise ValueError(
            f'pupil row count {Ny} does not divide over {n_shard} '
            f'devices on axis {axis!r}')
    if focal_factor is not None:
        import numpy as onp
        ff = onp.asarray(focal_factor)
        ff_re = jnp.asarray(ff.real, dtype=plan.Ex_re.dtype)
        ff_im = jnp.asarray(ff.imag, dtype=plan.Ex_re.dtype)

    def local(a_rows, Ey_cols, Ex):
        partial = jnp.matmul(Ey_cols, a_rows.astype(Ey_cols.dtype))
        focal = jnp.matmul(jax.lax.psum(partial, axis), Ex.T) * plan.norm
        if focal_factor is not None:
            focal = focal * jax.lax.complex(ff_re, ff_im)
        # adjoint leg: back out only THIS device's pupil rows — no second
        # collective, the focal operand is already replicated
        back = jnp.matmul(focal, Ex.conj()) * plan.norm
        return jnp.matmul(Ey_cols.conj().T, back)

    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(None, axis), P()),
        out_specs=P(axis, None))

    def apply(a):
        return mapped(a, plan.Ey, plan.Ex)

    return jax.jit(apply)


__all__ = ['shard_mdft_contraction', 'shard_mdft_contraction_roundtrip']
