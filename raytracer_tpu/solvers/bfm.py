"""Bellman-Ford-Moore SSSP solver on TPU.

TPU-native redesign of the reference's headline solver family:
  * CPU threads version  src/SSSP/bfm.jl:1-52
  * CUDA kernels version src/SSSP/bfm_gpu.jl:207-247

The whole solve is ONE compiled XLA program: a `lax.while_loop` whose body
is the static-shape relaxation step from ops/relax.py and whose condition
(`any(Q)`) never leaves the device - the reference's per-iteration
`sum(Q)` device-to-host sync (bfm_gpu.jl:223) disappears entirely.

`prepare` packs the host CSR graph into frozen device arrays once;
`solve`/`solve_many` run single- or multi-source (vmapped) solves; `bfm`
is the reference-signature convenience wrapper.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig
from ..ops.graph import csr_to_ell
from ..ops.relax import BFMState, DeviceGraph, bfm_step, init_state
from ..ops.weights import edge_weights_dual, edge_weights_scalar
from .types import BellmanFordMoore


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def prepare(
    A: sp.csr_matrix,
    halo: np.ndarray,
    gr,
    U: np.ndarray,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
) -> DeviceGraph:
    """Pack graph + weights + halo into device arrays (one-time host step).

    The counterpart of the reference's `move2device`
    (src/SSSP/bfm_gpu.jl:170-205), but all weights are precomputed here:
    velocities are static per solve, so the device never recomputes
    2*len/(U_tail+U_head) per iteration like the CUDA kernel does.
    """
    dtype = jnp.dtype(config.dtype)
    ell = csr_to_ell(A, node_pad=config.node_pad, degree_pad=config.degree_pad)

    U = np.asarray(U)
    if U.ndim == 2:
        w = edge_weights_dual(gr, ell, U, dtype=dtype)
    else:
        w = edge_weights_scalar(gr, ell, U, dtype=dtype)

    halo = np.asarray(halo)
    if halo.size == 0:
        hsrc = np.zeros(8, dtype=np.int32)
        hdst = np.zeros(8, dtype=np.int32)
    else:
        hpad = _round_up(halo.shape[0], 8)
        hsrc = np.zeros(hpad, dtype=np.int32)
        hdst = np.zeros(hpad, dtype=np.int32)
        hsrc[: halo.shape[0]] = halo[:, 0]
        hdst[: halo.shape[0]] = halo[:, 1]

    return DeviceGraph(
        nbr=jnp.asarray(ell.nbr),
        w=jnp.asarray(w),
        halo_src=jnp.asarray(hsrc),
        halo_dst=jnp.asarray(hdst),
        n=ell.n,
    )


@functools.partial(jax.jit, static_argnames=("max_iters", "dtype_name"))
def _solve_jit(g: DeviceGraph, source: jax.Array, max_iters: int, dtype_name: str) -> BFMState:
    dtype = jnp.dtype(dtype_name)
    state = init_state(g, source, dtype)

    def cond(s: BFMState):
        return jnp.any(s.front) & (s.it < max_iters)

    def body(s: BFMState):
        return bfm_step(s, g)

    return jax.lax.while_loop(cond, body, state)


@functools.partial(jax.jit, static_argnames=("max_iters", "dtype_name"))
def _solve_many_jit(g: DeviceGraph, sources: jax.Array, max_iters: int, dtype_name: str) -> BFMState:
    """Batched multi-source solve: vmapped state, shared while_loop.

    All sources iterate together; converged sources no-op (their frontier
    is empty, `where` keeps their state).  Zero collectives, so the source
    axis shards freely across chips (see parallel/multisource.py).
    """
    dtype = jnp.dtype(dtype_name)
    state = jax.vmap(lambda s: init_state(g, s, dtype))(sources)

    def cond(s: BFMState):
        return jnp.any(s.front) & (s.it[0] < max_iters)

    def body(s: BFMState):
        return jax.vmap(lambda st: bfm_step(st, g))(s)

    return jax.lax.while_loop(cond, body, state)


def solve(g: DeviceGraph, source: int, config: SolverConfig = DEFAULT_SOLVER_CONFIG) -> BellmanFordMoore:
    """Single-source solve -> BellmanFordMoore(prev, dist) (host arrays)."""
    st = _solve_jit(g, jnp.asarray(source, jnp.int32), config.max_iters, config.dtype)
    return BellmanFordMoore(prev=np.asarray(st.prev)[: g.n], dist=np.asarray(st.dist)[: g.n])


def solve_many(g: DeviceGraph, sources: Sequence[int], config: SolverConfig = DEFAULT_SOLVER_CONFIG) -> BellmanFordMoore:
    """Multi-source solve; prev/dist have leading source axis."""
    st = _solve_many_jit(g, jnp.asarray(sources, jnp.int32), config.max_iters, config.dtype)
    return BellmanFordMoore(prev=np.asarray(st.prev)[:, : g.n], dist=np.asarray(st.dist)[:, : g.n])


def bfm(
    A: sp.csr_matrix,
    halo: np.ndarray,
    source: int,
    gr,
    U: np.ndarray,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
) -> BellmanFordMoore:
    """Reference-signature entry point (src/SSSP/bfm.jl:1-52).

    Packs the graph and runs the jitted while_loop solve.  For repeated
    solves on the same graph use `prepare` + `solve` to amortise packing.
    """
    g = prepare(A, halo, gr, U, config)
    return solve(g, source, config)


def bfm_gpu(*args, **kwargs) -> BellmanFordMoore:
    """API-parity alias: the reference exposes a separate CUDA entry point
    (src/SSSP/bfm_gpu.jl:207); here CPU/TPU take the same XLA path."""
    return bfm(*args, **kwargs)


bfm_tpu = bfm_gpu


def bfm3d(
    A: sp.csr_matrix,
    source: int,
    gr3,
    U: np.ndarray,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
) -> BellmanFordMoore:
    """BFM on a 3-D spherical-shell grid (models/grid3d.py).

    Same ELL machinery as the 2-D solver with 3-D cartesian segment
    lengths; no halo (the 3-D grid has no doubled discontinuity nodes).
    Replaces the reference's legacy 3-D CUDA solvers (src/Dijsktra.jl).
    """
    return bfm(A, np.empty((0, 2), dtype=np.int64), source, gr3, U, config)
