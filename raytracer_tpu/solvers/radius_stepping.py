"""Radius-stepping SSSP (delta-stepping flavoured), device-side.

Equivalent of src/SSSP/radius_stepping.jl:7-107: relax out of the frontier,
then settle every unsettled node whose tentative distance is within the new
radius (the min unsettled distance).  Here both phases are dense
static-shape jnp ops inside one `lax.while_loop`; the threaded min
reduction (`min_distancet`) is a free XLA reduce.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig
from ..ops.relax import DeviceGraph
from .bfm import prepare
from .types import RadiusStepping


class _RSState(NamedTuple):
    dist: jax.Array
    prev: jax.Array
    unsettled: jax.Array  # Q in the reference
    front: jax.Array      # F in the reference
    it: jax.Array


@functools.partial(jax.jit, static_argnames=("max_iters", "dtype_name"))
def _solve_jit(g: DeviceGraph, source, max_iters: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    n_pad = g.nbr.shape[0]
    inf = jnp.asarray(jnp.inf, dtype)

    dist = jnp.full((n_pad,), inf, dtype).at[source].set(0)
    prev = jnp.arange(n_pad, dtype=jnp.int32)
    unsettled = jnp.ones((n_pad,), bool).at[source].set(False)
    front = jnp.zeros((n_pad,), bool).at[source].set(True)
    state = _RSState(dist, prev, unsettled, front, jnp.zeros((), jnp.int32))

    def cond(s):
        return jnp.any(s.front) & (s.it < max_iters)

    def body(s):
        # pull-based relaxation: unsettled nodes take the min over frontier
        # neighbours (reference pushes frontier->unsettled; same fixpoint,
        # race-free here).
        nd = s.dist[g.nbr]
        in_front = s.front[g.nbr]
        cand = jnp.where(in_front, nd + g.w, inf)
        kmin = jnp.argmin(cand, axis=1)
        best = jnp.take_along_axis(cand, kmin[:, None], axis=1)[:, 0]
        pbest = jnp.take_along_axis(g.nbr, kmin[:, None], axis=1)[:, 0]
        upd = s.unsettled & (best < s.dist)
        dist = jnp.where(upd, best, s.dist)
        prev = jnp.where(upd, pbest, s.prev)

        # new radius = min unsettled tentative distance; settle the shell
        delta = jnp.min(jnp.where(s.unsettled, dist, inf))
        front = s.unsettled & (dist <= delta)
        unsettled = s.unsettled & ~front
        return _RSState(dist, prev, unsettled, front, s.it + 1)

    return jax.lax.while_loop(cond, body, state)


def radius_stepping(
    A: sp.csr_matrix,
    halo: np.ndarray,
    source: int,
    gr,
    U: np.ndarray,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
) -> RadiusStepping:
    """Reference-signature entry (src/SSSP/radius_stepping.jl:7-46).

    Note: like the reference implementation, this ignores halo merging in
    the inner loop (the reference version predates the halo machinery);
    pass an empty halo for graphs without doubled discontinuity nodes.
    """
    g = prepare(A, halo, gr, U, config)
    st = _solve_jit(g, jnp.asarray(source, jnp.int32), config.max_iters, config.dtype)
    return RadiusStepping(prev=np.asarray(st.prev)[: g.n], dist=np.asarray(st.dist)[: g.n])
