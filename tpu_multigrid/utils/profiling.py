"""Tracing / profiling (SURVEY.md §5).

The reference has zero instrumentation — its SYCL events order dependencies
but are never queried for timing (``Poissons_SYCL.cpp:132-136,600-603``).
This module provides:

* ``trace_annotate`` — named ``jax.profiler`` trace spans so cycle phases
  show up in TensorBoard/Perfetto traces;
* ``profile_solve`` — wall-clock + DOF-throughput + roofline accounting for
  a solve callable, tunnel-proof (syncs via scalar readback).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

V5E_HBM_GBPS = 819.0


@contextlib.contextmanager
def trace_annotate(name: str):
    """Named profiler span (no-op overhead outside profiling sessions)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclasses.dataclass
class CycleStats:
    """Per-cycle performance report."""
    cycle_ms: float
    dof_per_sec: float
    effective_gbps: float
    bandwidth_fraction: float
    grid: str

    def __str__(self):
        return (f"{self.grid}: {self.cycle_ms:.3f} ms/cycle, "
                f"{self.dof_per_sec / 1e9:.2f} GDOF/s, "
                f"{self.effective_gbps:.0f} GB/s effective "
                f"({100 * self.bandwidth_fraction:.1f}% of HBM roofline)")


def _sync(x):
    """Force completion.  block_until_ready is unreliable over relayed
    devices (see benchmarks/bench_ops.py); a scalar readback always syncs."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.asarray(leaf).ravel()[0])


def profile_solve(step: Callable, *args, n: int, cycles: int = 8,
                  traffic_bytes: Optional[float] = None,
                  peak_gbps: float = V5E_HBM_GBPS) -> CycleStats:
    """Time ``step(*args)`` (one cycle) and report throughput/roofline.

    ``traffic_bytes``: modeled HBM bytes per cycle; when given, effective
    bandwidth and roofline fraction are reported against it.
    """
    out = step(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(cycles):
        out = step(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / cycles
    dofs = (n - 1) ** 2
    eff = (traffic_bytes or 0.0) / dt / 1e9
    return CycleStats(
        cycle_ms=dt * 1e3,
        dof_per_sec=dofs / dt,
        effective_gbps=eff,
        bandwidth_fraction=eff / peak_gbps if traffic_bytes else 0.0,
        grid=f"{n + 1}x{n + 1}",
    )


def start_trace(logdir: str):
    """Begin a jax.profiler trace (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)


def stop_trace():
    jax.profiler.stop_trace()


def enable_compilation_cache(path: str = None):
    """Enable JAX's persistent compilation cache (TPU platforms only).

    In this environment compiles route through a remote-compile tunnel at
    ~30-300 s per program; the on-disk cache makes repeated runs (bench,
    CLI, examples) start in seconds.  Verified working through the tunnel.

    No-op when the selected platform is CPU: CPU compiles are fast, and
    reading the shared cross-session cache from CPU runs has produced
    deserialization SEGFAULTS in the test suite (observed in
    compilation_cache.get_executable_and_time with entries accumulated
    across sessions/platforms on this container).
    """
    import os
    plats = (getattr(jax.config, "jax_platforms", None)
             or os.environ.get("JAX_PLATFORMS", ""))
    if plats.split(",")[0].strip() == "cpu":
        return
    p = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_comp"))
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    # The axon remote compile is asynchronous: jax's own compile timer sees
    # well under a second even for programs whose remote compile takes
    # minutes (measured r5: a 1015 s bench compile wrote NO cache entries
    # under the default 1.0 s floor).  Write everything.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
