"""Mesh-sharded multi-resolution coronagraph propagation.

The multi-resolution focal stack is the codebase's "long axis" (SURVEY
§5): levels are independent windowed round trips until one final sum, so
they shard over a mesh axis and the level-sum becomes a ``psum`` riding
ICI.  The serial oracle is
``propagation.coronagraph.to_fpm_and_back_multiresolution``.

Masks and windows depend only on static geometry, so ``window * fpm`` is
evaluated per level at plan time and shipped to device once; trace-time
work is two complex matmuls per level (MXU) plus the collectives.
"""
import dataclasses

import numpy as onp

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StackedMultiRes:
    """All levels of a MultiResolutionExecutor stacked on a leading axis.

    Ex (L, Mx, Nx), Ey (L, My, Ny), norm (L,), maskwin (L, My, Mx): the
    per-level ``window * fpm`` focal-plane factor.  Leaves are real/imag
    pairs; complex is assembled at trace time (see fttools.MDFT).
    """

    Ex_re: jax.Array
    Ex_im: jax.Array
    Ey_re: jax.Array
    Ey_im: jax.Array
    norm: jax.Array
    maskwin_re: jax.Array
    maskwin_im: jax.Array

    @property
    def Ex(self):
        """Complex x bases (L, Mx, Nx); assembled at trace time."""
        return jax.lax.complex(self.Ex_re, self.Ex_im)

    @property
    def Ey(self):
        """Complex y bases (L, My, Ny); assembled at trace time."""
        return jax.lax.complex(self.Ey_re, self.Ey_im)

    @property
    def maskwin(self):
        """Complex window*mask factors (L, My, Mx); assembled at trace time."""
        return jax.lax.complex(self.maskwin_re, self.maskwin_im)

    def __len__(self):
        """Number of levels."""
        return self.Ex_re.shape[0]


def stack_multiresolution(mre, fpm, *, babinet=False, dtype=None):
    """StackedMultiRes from a MultiResolutionExecutor and a mask callable.

    Requires every level to share one focal shape (build the executor
    with fine_samples == focal_samples); babinet=True bakes the 1 - fpm
    complement in, for use behind a Lyot-style subtraction.
    """
    shapes = {(ex.Ey_re.shape, ex.Ex_re.shape) for ex in mre.executors}
    if len(shapes) != 1:
        raise ValueError(
            'stack_multiresolution requires uniform level shapes; build '
            'the executor with fine_samples == focal_samples '
            f'(got {sorted(shapes)})')
    rdtype = (mre.executors[0].Ex_re.dtype if dtype is None
              else onp.empty(0, dtype=onp.dtype(dtype)).real.dtype)
    Ex_re = jnp.stack([ex.Ex_re for ex in mre.executors]).astype(rdtype)
    Ex_im = jnp.stack([ex.Ex_im for ex in mre.executors]).astype(rdtype)
    Ey_re = jnp.stack([ex.Ey_re for ex in mre.executors]).astype(rdtype)
    Ey_im = jnp.stack([ex.Ey_im for ex in mre.executors]).astype(rdtype)
    norm = jnp.asarray([ex.norm for ex in mre.executors], dtype=rdtype)
    mws = []
    for win, xf, yf in zip(mre.windows, mre.xf, mre.yf):
        m = fpm(onp.asarray(xf), onp.asarray(yf))
        if babinet:
            m = 1 - m
        m = onp.asarray(m) * onp.asarray(win)
        mws.append(m)
    maskwin = onp.stack(mws)
    return StackedMultiRes(
        Ex_re=Ex_re, Ex_im=Ex_im, Ey_re=Ey_re, Ey_im=Ey_im, norm=norm,
        maskwin_re=jnp.asarray(maskwin.real, dtype=rdtype),
        maskwin_im=jnp.asarray(maskwin.imag, dtype=rdtype))


def _level_roundtrip(a, ex, ey, nrm, mw):
    focal = (ey @ a @ ex.T) * nrm
    gated = focal * mw
    return (ey.conj().T @ gated @ ex.conj()) * nrm


def multires_roundtrip(a, plan):
    """Sum of windowed per-level round trips (local levels only).

    Equal to to_fpm_and_back_multiresolution when plan holds every
    level; inside shard_map it computes this shard's partial sum.
    """
    contributions = jax.vmap(_level_roundtrip, in_axes=(None, 0, 0, 0, 0))(
        a, plan.Ex, plan.Ey, plan.norm, plan.maskwin)
    return contributions.sum(axis=0)


def shard_multires_roundtrip(mesh, plan, lvl_axis='lv'):
    """Jitted a -> c with levels sharded over ``lvl_axis``.

    Each device round-trips its levels; the level-sum is one psum.  The
    level count must divide the mesh axis size.
    """
    n_shard = dict(zip(mesh.axis_names, mesh.devices.shape))[lvl_axis]
    if len(plan) % n_shard:
        raise ValueError(
            f'{len(plan)} levels do not divide over {n_shard} '
            f'devices on axis {lvl_axis!r}')

    def local(a, pl):
        return jax.lax.psum(multires_roundtrip(a, pl), lvl_axis)

    plan_specs = StackedMultiRes(
        Ex_re=P(lvl_axis, None, None), Ex_im=P(lvl_axis, None, None),
        Ey_re=P(lvl_axis, None, None), Ey_im=P(lvl_axis, None, None),
        norm=P(lvl_axis),
        maskwin_re=P(lvl_axis, None, None),
        maskwin_im=P(lvl_axis, None, None))
    mapped = shard_map(local, mesh=mesh, in_specs=(P(), plan_specs),
                       out_specs=P())
    return jax.jit(lambda a: mapped(a, plan))


def shard_multires_babinet(mesh, plan, lyot, lvl_axis='lv'):
    """Jitted a -> field_after_lyot for a Babinet-style Lyot coronagraph.

    ``plan`` must be stacked with babinet=True (the 1 - fpm complement).
    The complement round trip c is psum'd over the level axis and the
    subtraction a - c with the Lyot stop runs replicated.
    """
    roundtrip = shard_multires_roundtrip(mesh, plan, lvl_axis=lvl_axis)
    lyot = None if lyot is None else jnp.asarray(lyot)

    def babinet_fn(a):
        c = roundtrip(a)
        field_at_lyot = a - c
        if lyot is None:
            return field_at_lyot
        return lyot * field_at_lyot

    return jax.jit(babinet_fn)


__all__ = [
    'StackedMultiRes', 'stack_multiresolution', 'multires_roundtrip',
    'shard_multires_roundtrip', 'shard_multires_babinet',
]
