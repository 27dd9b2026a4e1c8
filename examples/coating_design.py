"""Design a V-coat antireflection coating with analytic gradients.

Refines layer thicknesses of an H/L pair on BK7 against a visible-band
reflectance merit using the coatings gradient engine, then reports the
spectrum and a deposition monitoring curve.
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
if 'JAX_PLATFORMS' in os.environ:
    # some hosts pre-import jax before env vars are read; re-assert
    import jax as _jax
    _jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import numpy as np

import prysm_tpu.x.coatings as coat


def main(plot=False):
    nL, nM, nsub = 1.38, 1.70, 1.52   # MgF2 over a medium-index layer
    w0 = 0.55
    # deliberately mis-thicknessed start (indices ambient side first)
    stack = coat.Stack([nL, nM], [w0 / (4 * nL) * 1.2, w0 / (4 * nM) * 0.85],
                       nsub)
    wvls = np.linspace(0.45, 0.65, 41)

    R0 = np.asarray(coat.RTA(stack, wvls, 0.0, 's')[0]).mean()
    result = coat.refine(stack, coat.Reflectance(wvls, target=0.0),
                         method='lbfgsb', maxiter=200)
    stack = result.stack
    R1 = np.asarray(coat.RTA(stack, wvls, 0.0, 's')[0]).mean()
    print(f'band-average R: {R0:.4%} -> {R1:.4%}')
    print('thicknesses (um):', np.round(np.asarray(stack.thicknesses), 5))

    d, sig = coat.monitoring_trace(stack, 0, w0)
    print(f'monitor swing while depositing layer 0: '
          f'{float(np.ptp(np.asarray(sig))):.4f}')

    if plot:
        import matplotlib.pyplot as plt
        fig, axs = plt.subplots(1, 2, figsize=(9, 3.5))
        coat.plot_spectrum(stack, wvls, fig=fig, ax=axs[0])
        coat.plot_monitoring_trace(stack, 0, w0, fig=fig, ax=axs[1])
        plt.show()
    return R1


if __name__ == '__main__':
    main(plot=False)
