"""Coefficient-gradient all-reduce pipelined with the backward pass.

SURVEY §5 names this as a rebuild goal with no reference counterpart: on
one device the coefficient gradient's reduction is the implicit sum
inside ``sum_of_2d_modes_adjoint`` (reference
``prysm/polynomials/fitting.py:40-57``); sharded over a mesh it becomes
an all-reduce that naively serializes after the whole backward pass.

Structure used here: the spectral (wavelength) axis is processed as
``n_chunks`` *independent* forward+backward slices, each ending in its
own ``psum`` of that slice's coefficient-gradient contribution.  The
chunks are emitted as independent subgraphs (an unrolled Python loop,
not a ``scan``, which would serialize them), so chunk k's all-reduce
has no data dependence on chunk k+1's backward compute.

Left alone, XLA's all-reduce combiner merges the per-chunk reductions
back into one big all-reduce at the end of the backward pass — exactly
the serialization this module exists to avoid (witnessed in
SCALING_r04.json: 3 lowered all-reduces compiled to 1).  To keep the
per-chunk structure through compilation, each chunk's psum *input* is
chained to the previous chunk's psum *output* through a
``lax.optimization_barrier``: the barrier creates a dependence between
consecutive all-reduces (so the combiner cannot legally merge them)
without making any chunk's forward/backward *compute* depend on another
chunk's collective — the compute stays free for the scheduler to bridge
collectives with.  ``overlap_evidence`` exposes the compiled HLO so
tests (and the scaling how-to) can verify the structure; see its
docstring for exactly what a TPU-target AOT module can and cannot
witness about runtime overlap.
"""
import re

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..mathops import cis
from .broadband import SpectralMDFT


def _abs2(E):
    return E.real * E.real + E.imag * E.imag


def _chunk(tree, sl):
    return jax.tree_util.tree_map(lambda a: a[sl], tree)


def overlapped_spectral_grad(mesh, plan, amp, modes, wavelengths, weights,
                             I_meas, n_chunks=2, wl_axis='wl'):
    """Jitted sharded broadband grad step with per-chunk grad psums.

    The W wavelengths shard over ``wl_axis``; each device splits its
    local wavelengths into ``n_chunks`` slices whose data terms are
    independent (per-wavelength residuals against per-wavelength
    measured frames, I_meas of shape (W, My, Mx)).  Every chunk runs
    value_and_grad locally then immediately psums its coefficient
    gradient; consecutive psums are dependence-chained through an
    optimization barrier so the collective combiner cannot merge them
    (module docstring), while chunk compute stays independent for the
    scheduler to overlap with in-flight reductions.

    Returns step(coefs) -> (loss, grad), numerically identical to a
    single monolithic reduction (floating-point reassociation aside).
    """
    def local(coefs, amp, modes, wavelengths, weights, plan, I_meas):
        W_loc = wavelengths.shape[0]
        if W_loc % n_chunks:
            raise ValueError(
                f'local wavelength count {W_loc} does not split into '
                f'{n_chunks} chunks')
        size = W_loc // n_chunks

        def chunk_loss(c, sl):
            p = _chunk(plan, sl)
            opd = jnp.tensordot(c, modes, axes=(0, 0))
            scale = 2 * jnp.pi / (wavelengths[sl] * 1e3)
            fields = amp[None] * cis(scale[:, None, None] * opd[None])
            E = p(fields)
            resid = _abs2(E) - I_meas[sl]
            return jnp.sum(weights[sl, None, None] * resid * resid)

        total_loss = 0.0
        total_grad = jnp.zeros_like(coefs)
        prev_reduced = None
        # unrolled on purpose: a scan would serialize the per-chunk work.
        # check_vma=False means no automatic psum is inserted for the
        # replicated coefs cotangent — the explicit per-chunk psum below
        # is the only reduction (tested against the serial grad).
        for k in range(n_chunks):
            sl = slice(k * size, (k + 1) * size)
            lk, gk_local = jax.value_and_grad(chunk_loss)(coefs, sl)
            if prev_reduced is not None:
                # chain THIS chunk's psum input to the PREVIOUS chunk's
                # psum output: consecutive all-reduces become dependent
                # (combiner-proof) while gk_local's compute is not
                gk_local, _ = jax.lax.optimization_barrier(
                    (gk_local, prev_reduced))
            gk = jax.lax.psum(gk_local, wl_axis)
            prev_reduced = gk
            total_loss = total_loss + lk
            total_grad = total_grad + gk
        # the scalar loss reduction joins the same chain so it cannot
        # be folded into a grad all-reduce either
        loss_in, _ = jax.lax.optimization_barrier((total_loss, prev_reduced))
        return jax.lax.psum(loss_in, wl_axis), total_grad

    plan_specs = SpectralMDFT(
        Ex_re=P(wl_axis, None, None), Ex_im=P(wl_axis, None, None),
        Ey_re=P(wl_axis, None, None), Ey_im=P(wl_axis, None, None),
        norm=P(wl_axis, None, None),
        pupil_dx=plan.pupil_dx, focal_dx=plan.focal_dx)

    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(wl_axis), P(wl_axis), plan_specs,
                  P(wl_axis, None, None)),
        out_specs=(P(), P()), check_vma=False)

    def step(coefs):
        return mapped(coefs, amp, modes, wavelengths, weights, plan, I_meas)

    return jax.jit(step)


def overlap_evidence(step_fn, *args, compiler_options=None):
    """Compiled-HLO accounting of the step's all-reduce structure.

    What a TPU-target AOT module CAN witness:

    - ``lowered_all_reduces``: the authored reduce structure (one psum
      per chunk plus the loss psum).
    - ``compiled_all_reduces``: how many survive XLA's collective
      combiner.  Equality with the lowered count is the r5 fix — the
      barrier chain keeps the per-chunk pipeline out of the combiner.
    - ``interleaved_compute``: with the latency-hiding scheduler the
      module is emitted in schedule order (``is_scheduled=true``); this
      counts fusion/dot compute ops scheduled *between* consecutive
      all-reduces in the entry computation.  A nonzero count means the
      reductions are spread through the backward pass with adjacent
      independent compute — the precondition for the TPU runtime to
      bridge a collective's ICI phase with vector-core work.

    What it CANNOT witness: ``async_pairs`` counts
    ``all-reduce-start``/``done`` ops, and is always 0 here — the TPU
    backend's post-optimization HLO text never represents collectives
    in async form (verified by sweeping the async-collective compiler
    flags; async conversion happens below the HLO the AOT client
    exposes).  The field is kept so artifacts are comparable across
    rounds, but on this target it measures representation, not overlap.
    """
    lowered = jax.jit(step_fn).lower(*args)
    stablehlo = lowered.as_text()
    compiled = lowered.compile(compiler_options=compiler_options).as_text()
    return {
        'lowered_all_reduces': stablehlo.count('stablehlo.all_reduce'),
        'compiled_all_reduces': len(re.findall(r'\ball-reduce\(', compiled)),
        'async_pairs': compiled.count('all-reduce-start'),
        'interleaved_compute': interleaved_compute(compiled),
    }


def interleaved_compute(hlo_text,
                        ops=('all-reduce', 'all-gather', 'all-to-all',
                             'collective-permute', 'reduce-scatter')):
    """Compute ops between consecutive collectives in the entry schedule.

    Requires a scheduled module (text order == execution order); returns
    the number of fusion/dot/convolution ops that appear after the first
    and before the last collective of the entry computation, i.e. work
    the scheduler has interleaved with the communication pipeline.
    """
    entry = hlo_text[hlo_text.find('ENTRY'):]
    pat = '|'.join(re.escape(op) for op in ops)
    positions = [m.start() for m in re.finditer(rf'\b(?:{pat})\(', entry)]
    if len(positions) < 2:
        return 0
    between = entry[positions[0]:positions[-1]]
    return len(re.findall(r'\b(?:fusion|dot|convolution)\(', between))


__all__ = ['overlapped_spectral_grad', 'overlap_evidence',
           'interleaved_compute']
