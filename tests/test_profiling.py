"""Profiling hooks (utils/profiling.py): no-op when disabled, real XLA
trace files when enabled (SURVEY.md §5.1 upgrade)."""

import glob
import os

import jax.numpy as jnp

from diffusionvid_tpu.utils.profiling import StepProfiler, annotate, trace


def test_trace_disabled_noop():
    with trace(None):
        x = jnp.ones(4) + 1
    assert float(x.sum()) == 8


def test_step_profiler_disabled_noop():
    prof = StepProfiler(None)
    for i in range(20):
        prof.step(i)
    prof.close()


def test_trace_writes_files(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        with annotate("tiny_matmul"):
            x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
            x.block_until_ready()
    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), files


def test_step_profiler_window(tmp_path):
    logdir = str(tmp_path / "steps")
    prof = StepProfiler(logdir, start=2, stop=4)
    for i in range(6):
        prof.step(i)
        y = jnp.arange(16.0) * 2
        y.block_until_ready()
    prof.close()
    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), files
