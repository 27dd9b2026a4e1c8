"""Profiling utilities and optimizer checkpoint/resume."""
import os

import numpy as np
import pytest

import jax  # NOQA: F401

from prysm_tpu import profiling
from prysm_tpu.x import optym


def test_checkpoint_resume_bit_exact(tmp_path):
    """An interrupted run restored from its checkpoint reproduces the
    uninterrupted trajectory exactly (all Adam moments round-trip)."""
    prob = optym.RosenbrockProblem()
    x0 = np.array([-1.2, 1.0])
    path = str(tmp_path / 'run.ckpt')

    o1 = optym.Adam(prob.fg, x0, alpha=0.05)
    optym.run_until(o1, optym.AnyGovernor([
        optym.MaxIterations(30), optym.CheckpointGovernor(path, every=10)]))
    assert os.path.exists(path)

    gold = optym.Adam(prob.fg, x0, alpha=0.05)
    optym.run_until(gold, optym.MaxIterations(50))

    o2 = optym.Adam(prob.fg, x0, alpha=0.05)
    payload = optym.load_checkpoint(path, o2)
    assert payload['records'][-1]['iteration'] == 30
    optym.run_until(o2, optym.MaxIterations(20))
    np.testing.assert_allclose(np.asarray(o2.x), np.asarray(gold.x),
                               atol=1e-14)


def test_checkpoint_roundtrips_lbfgs_history(tmp_path):
    prob = optym.RosenbrockProblem()
    x0 = np.array([-1.2, 1.0])
    o = optym.PrysmLBFGSB(prob.fg, x0)
    optym.run_until(o, optym.MaxIterations(8))
    path = str(tmp_path / 'l.ckpt')
    optym.save_checkpoint(path, o)
    o2 = optym.PrysmLBFGSB(prob.fg, x0)
    optym.load_checkpoint(path, o2)
    # both continue identically (history pairs restored)
    r1 = optym.run_until(o, optym.MaxIterations(5))
    r2 = optym.run_until(o2, optym.MaxIterations(5))
    np.testing.assert_allclose(np.asarray(o.x), np.asarray(o2.x),
                               atol=1e-12)
    assert r1.records[-1].f == pytest.approx(r2.records[-1].f, rel=1e-12)


def test_checkpoint_type_guard(tmp_path):
    prob = optym.RosenbrockProblem()
    x0 = np.array([0.0, 0.0])
    o = optym.Adam(prob.fg, x0, alpha=0.1)
    path = str(tmp_path / 'a.ckpt')
    optym.save_checkpoint(path, o)
    with pytest.raises(TypeError, match='Adam'):
        optym.load_checkpoint(
            path, optym.GradientDescent(prob.fg, x0, alpha=0.1))
    with pytest.raises(ValueError):
        bad = str(tmp_path / 'bad.ckpt')
        import pickle
        with open(bad, 'wb') as f:
            pickle.dump({'nope': 1}, f)
        optym.load_checkpoint(bad)


def test_time_fn_and_report(capsys):
    t = profiling.time_fn(lambda v: (v * v).sum(), np.ones(64), iters=5,
                          warmup=1)
    assert t.samples.shape == (5,)
    assert t.best <= t.median <= t.best + 5 * t.std + t.median
    rec = profiling.report('tiny', t, flops=128)
    out = capsys.readouterr().out
    assert 'tiny' in out and 'median_ms' in out
    assert rec['per_second'] > 0
    assert 'tflops_per_s' in rec


def test_compiled_stats_and_memory():
    stats = profiling.compiled_stats(lambda x: (x * x).sum(), np.ones(256))
    # cost analysis reports bytes on CPU; {} acceptable on odd backends
    assert isinstance(stats, dict)
    mem = profiling.device_memory_stats()
    assert isinstance(mem, dict)
