"""Profiling hooks: jax.profiler traces + per-iteration solver stats.

The reference's observability is TimerOutputs sections and `println`
iteration counts (SURVEY.md section 5).  Here:
  * `trace(dir)` wraps a block in a jax.profiler trace viewable in
    TensorBoard/XProf,
  * `iteration_stats` runs the circulant solver host-stepped, recording
    per-iteration frontier statistics (improved-node counts, max delta) -
    the structured equivalent of the reference's convergence printouts.
"""
from __future__ import annotations

import contextlib
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig
from ..ops.circulant import CirculantGraph, CircState, _circ_step


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block: `with trace('/tmp/prof'): solver.solve(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class IterationStat(NamedTuple):
    iteration: int
    improved_nodes: int
    max_delta: float


def iteration_stats(
    cg: CirculantGraph,
    source: int,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    max_iters: int = 10_000,
) -> List[IterationStat]:
    """Host-stepped circulant solve recording per-iteration statistics.

    Slower than the fused while_loop solve (one device round-trip per
    iteration); intended for debugging/analysis, like the reference's
    TimerOutputs-instrumented bfmtest_bench (src/SSSP/bfm_new.jl:51-102).
    """
    dtype = jnp.dtype(config.dtype)
    cmap = cg.cmap
    M, nt = cmap.M, cmap.ntheta
    inf = jnp.asarray(jnp.inf, dtype)

    dist = jnp.full((M, nt), inf, dtype)
    dcen = inf
    if source == cmap.center:
        dcen = jnp.asarray(0.0, dtype)
    else:
        dist = dist.at[cmap.m_of[source], cmap.c_of[source]].set(0.0)

    src_flat = jnp.asarray(cg.src_flat)
    w = jnp.asarray(cg.w)
    fan_slots = jnp.asarray(cg.fan_slots)
    fan_w = jnp.asarray(cg.fan_w)

    step = jax.jit(lambda s: _circ_step(s, src_flat, w, fan_slots, fan_w))

    state = CircState(dist, dcen, jnp.asarray(True), jnp.zeros((), jnp.int32))
    stats: List[IterationStat] = []
    for it in range(max_iters):
        new = step(state)
        improved = np.asarray(jnp.sum(new.dist < state.dist))
        delta = np.asarray(
            jnp.max(jnp.where(jnp.isfinite(state.dist), state.dist - new.dist, 0.0))
        )
        stats.append(IterationStat(it + 1, int(improved), float(delta)))
        if not bool(new.changed):
            break
        state = new
    return stats
