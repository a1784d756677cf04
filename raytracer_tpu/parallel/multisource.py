"""Multi-source travel-time tables, sharded across TPU chips.

The reference runs one source per solve and loops serially
(benchmarks/gpu.jl:61-63).  Here sources are vmapped on-chip and the
source batch is sharded over a 1-D device mesh with `shard_map`; the BFM
while_loop contains NO collectives, so each chip converges independently
(its local frontier empties) and the ICI is touched only by the final
travel-time gather.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig
from ..ops.relax import BFMState, DeviceGraph, bfm_step, init_state
from .mesh import SOURCE_AXIS, make_mesh, pad_sources


def _solve_block(g: DeviceGraph, sources: jax.Array, max_iters: int, dtype) -> BFMState:
    """Vmapped multi-source solve for one shard (no cross-device ops)."""
    state = jax.vmap(lambda s: init_state(g, s, dtype))(sources)

    def cond(s: BFMState):
        return jnp.any(s.front) & (s.it[0] < max_iters)

    def body(s: BFMState):
        return jax.vmap(lambda st: bfm_step(st, g))(s)

    return jax.lax.while_loop(cond, body, state)


@functools.partial(jax.jit, static_argnames=("max_iters", "dtype_name", "mesh"))
def _sharded_solve(g: DeviceGraph, sources: jax.Array, max_iters: int, dtype_name: str, mesh: Mesh):
    dtype = jnp.dtype(dtype_name)
    fn = jax.shard_map(
        lambda gg, ss: _solve_block(gg, ss, max_iters, dtype),
        mesh=mesh,
        in_specs=(P(), P(SOURCE_AXIS)),
        out_specs=P(SOURCE_AXIS),
        check_vma=False,
    )
    return fn(g, sources)


def solve_sharded(
    g: DeviceGraph,
    sources: Sequence[int],
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
) -> BFMState:
    """Solve a batch of sources sharded over the mesh; returns device state
    with a leading (padded) source axis."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    padded = pad_sources(np.asarray(sources), n_dev)
    return _sharded_solve(g, jnp.asarray(padded), config.max_iters, config.dtype, mesh)


def travel_time_table(
    g: DeviceGraph,
    sources: Sequence[int],
    receivers: Sequence[int],
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
) -> np.ndarray:
    """(n_sources, n_receivers) travel-time table.

    BASELINE config #4: batched travel-time table, sources sharded across
    chips, zero collectives in the inner loop.
    """
    sources = np.asarray(sources)
    st = solve_sharded(g, sources, config, mesh)
    dist = st.dist  # (padded_sources, n_pad), sharded
    table = dist[:, jnp.asarray(np.asarray(receivers), jnp.int32)]
    return np.asarray(table)[: len(sources)]
