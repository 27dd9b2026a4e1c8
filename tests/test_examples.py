"""The examples/ scripts run end to end and hit their quality marks."""
import runpy
import sys

import pytest

EXAMPLES = 'examples'
sys.path.insert(0, EXAMPLES)


def test_phase_retrieval_example():
    mod = runpy.run_path(f'{EXAMPLES}/phase_retrieval.py')
    err = mod['main'](N=128, fN=64)
    assert err < 1e-6  # nm


def test_lens_design_example():
    mod = runpy.run_path(f'{EXAMPLES}/lens_design.py')
    sys_ = mod['main'](plot=False)
    from prysm_tpu.x.raytracing.design import _TraceCache
    import prysm_tpu.x.raytracing as rt
    assert rt.EFL()(sys_, _TraceCache(sys_)) == pytest.approx(100.0,
                                                              abs=1e-5)


def test_coating_design_example():
    mod = runpy.run_path(f'{EXAMPLES}/coating_design.py')
    R = mod['main'](plot=False)
    assert R < 0.006  # band-average reflectance under 0.6%


def test_coronagraph_example():
    mod = runpy.run_path(f'{EXAMPLES}/coronagraph_dark_hole.py')
    suppression = mod['main'](N=96, fN=48, plot=False)
    assert suppression > 50.0


def test_lowfs_example():
    mod = runpy.run_path(f'{EXAMPLES}/lowfs_realtime.py')
    err = mod['main'](N=128, fN=48)
    assert err < 0.5  # nm, linear-regime estimation at a 3 nm stimulus
