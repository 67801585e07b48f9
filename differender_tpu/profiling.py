"""Tracing / profiling utilities.

The reference's entire profiling story is Taichi's ``kernel_profiler=True``
plus TRACE logging behind ``--debug``
(`/root/reference/examples/taichi_volume_raycaster.py:534-540`), and the
per-pixel march-length diagnostics ``valid_sample_step_count`` /
``max_valid_sample_step_count``
(`/root/reference/differender/volume_raycaster.py:84,89,303,370-372`) —
the latter live on as ``RenderOutput.valid_steps`` / ``.max_valid_steps``.

This module provides the TPU-native equivalents: XLA profiler traces
(viewable in TensorBoard/XProf, including per-fusion device timings) and
named annotation scopes.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA device trace into ``log_dir``::

        with profiling.trace("/tmp/trace"):
            render_jit(...).image.block_until_ready()
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up in profiler timelines (host + device)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def timed(name: str, results: Optional[dict] = None) -> Iterator[None]:
    """Wall-clock a block.  NOTE: measures host wall time only — callers
    must ``block_until_ready()`` inside the block to include device work."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if results is not None:
            results[name] = dt
        else:
            print(f"[timed] {name}: {dt * 1e3:.2f} ms")


def march_stats(render_output) -> dict:
    """Reference-style march diagnostics from a RenderOutput
    (`valid_sample_step_count` semantics, SURVEY §5)."""
    import numpy as np
    valid = np.asarray(render_output.valid_steps) - 1
    n = np.asarray(render_output.n_samples)
    return {
        "max_valid_steps": int(valid.max()),
        "mean_valid_steps": float(valid.mean()),
        "max_samples_requested": int(n.max()),
        "hit_fraction": float((n > 0).mean()),
        "terminated_early_fraction": float(((valid < n) & (n > 0)).mean()),
    }
