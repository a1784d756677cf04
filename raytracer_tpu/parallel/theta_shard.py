"""Theta-sharded (domain-decomposed) directional-sweep solve.

`parallel/multisource.py` shards the SOURCE batch -- embarrassingly
parallel, zero collectives, but bounded by one chip's HBM/VMEM per
field.  This module shards the GRID itself: the annulus' theta axis is
split into contiguous column blocks across a 1-D device mesh, and each
Gauss-Seidel round exchanges a +-2-column halo with the ring neighbours
(`jax.lax.ppermute`) -- the capability class the reference lacks
entirely (SURVEY.md section 5: no distributed backend; the reference's
halo is an intra-device twin table, src/GridAnnulus.jl:943-950).

Algorithm: block Gauss-Seidel over device blocks (the multi-chip
analogue of the lane-blocked intra-chip sweeps of PERF_NOTES round 3p).
Per round, on every device in parallel:

  1. ppermute the two boundary columns each way (the stencil's theta
     reach is +-2 -- ops/circulant.py), a ring exchange that also
     realises the annulus' periodic wrap exactly;
  2. centre-fan settle with a global `lax.pmin` (the core point is a
     single shared node);
  3. forward in-block column sweep (lax.scan) seeded with the LEFT
     neighbour's halo as the scan carry, then a backward sweep seeded
     with the RIGHT halo -- inside a block this is the same sequential
     Gauss-Seidel as ops/sweep_theta.py (`_sweep(carry_init=...)`);
  4. global convergence vote: `psum` of the per-block improved flags.

Exactness: every candidate is a real path cost (stencil edges and
min-plus chain compositions), iterates decrease monotonically, and a
round that changes nothing anywhere means every stencil edge is
satisfied -- the same fixpoint as the single-device engines; equality
is pinned by tests/test_theta_shard.py on the virtual CPU mesh and by
__graft_entry__.dryrun_multichip.

Scaling story: per-device memory is O(nt/D * ML) for the field while
the (replicated) stencil tables are O(ML) -- fields beyond one chip's
HBM become solvable.  Per round the ICI moves 4*S*ML floats per device
boundary (two columns each way); at 8640x2400 (ML=8192) and S=8 that is
1 MB/boundary/round against ~45 MB of per-round field traffic -- the
halo rides ICI in the noise.  Convergence costs a couple of extra
rounds versus the single-device sweep (block-Jacobi staleness between
blocks), measured 4 -> 5-7 rounds at the test sizes.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig
from ..ops.circulant import CirculantGraph
from ..ops.diag_wrapped import LANES, SUB, _extract_cached
from ..ops.sweep_theta import (SweepState, _sweep, pack_sweep_tables)
from ..ops.wrapped_t import _textract_jit, pack_twrapped_stencil

THETA_AXIS = "theta"


def make_theta_mesh(devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (THETA_AXIS,))


@functools.partial(jax.jit,
                   static_argnames=("static", "max_rounds", "S", "mesh"))
def _solve_theta_sharded_jit(src_m, src_c, src_cen, tbl, tol, static,
                             max_rounds: int, S: int, mesh: Mesh):
    """Sharded solve: returns SweepState with the GLOBAL (S, nt, ML)
    field (theta-sharded on device) and the round count."""
    dtype = tbl.wg[0].dtype
    nt, ML = static.nt, static.ML
    D = mesh.devices.size
    ntl = nt // D
    inf = jnp.asarray(jnp.inf, dtype)
    zero = jnp.zeros((), dtype)
    fan = tbl.fan_w[None, None, :]
    fan_in = tbl.fan_in[None, None, :]
    perm_fwd = [(i, (i + 1) % D) for i in range(D)]   # send right
    perm_bwd = [((i + 1) % D, i) for i in range(D)]   # send left

    def block(tbl, src_m, src_c, src_cen, tol):
        bid = jax.lax.axis_index(THETA_AXIS)
        col = bid * ntl + jnp.arange(ntl, dtype=jnp.int32)[None, :, None]
        lane = jnp.arange(ML, dtype=jnp.int32)[None, None, :]
        v0 = jnp.where((col == src_c[:, None, None])
                       & (lane == src_m[:, None, None])
                       & (~src_cen[:, None, None]), zero, inf)
        cen0 = jnp.where(src_cen, zero, inf)

        def rnd(state: SweepState) -> SweepState:
            v, cen = state.dist, state.cen
            # centre fan (global: the core point is shared)
            cen_loc = jnp.min(v + fan_in, axis=(1, 2))
            cen = jnp.minimum(cen, jax.lax.pmin(cen_loc, THETA_AXIS))
            v = jnp.minimum(v, cen[:, None, None] + fan)
            # +-2-column ring halo exchange (also the periodic wrap)
            left = jax.lax.ppermute(v[:, -2:, :], THETA_AXIS, perm_fwd)
            right = jax.lax.ppermute(v[:, :2, :], THETA_AXIS, perm_bwd)
            v = _sweep(v, tbl, static, reverse=False,
                       carry_init=(left[:, 1], left[:, 0]))
            v = _sweep(v, tbl, static, reverse=True,
                       carry_init=(right[:, 0], right[:, 1]))
            changed_loc = (jnp.any(v < state.dist - tol)
                           | jnp.any(cen < state.cen - tol))
            changed = jax.lax.psum(
                changed_loc.astype(jnp.int32), THETA_AXIS) > 0
            return SweepState(v, cen, changed, state.it + 1)

        def cond(s: SweepState):
            return s.changed & (s.it < max_rounds)

        st = jax.lax.while_loop(
            cond, rnd, SweepState(v0, cen0, jnp.asarray(True),
                                  jnp.zeros((), jnp.int32)))
        cen_loc = jnp.min(st.dist + fan_in, axis=(1, 2))
        cen = jnp.minimum(st.cen, jax.lax.pmin(cen_loc, THETA_AXIS))
        v = jnp.minimum(st.dist, cen[:, None, None] + fan)
        return SweepState(v, cen, st.changed, st.it)

    fn = jax.shard_map(
        block, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=SweepState(P(None, THETA_AXIS, None), P(), P(), P()),
        check_vma=False,
    )
    return fn(tbl, src_m, src_c, src_cen, tol)


def solve_sweep_theta_sharded(
    cg: CirculantGraph,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
    receivers=None,
    max_rounds: int = None,
    _packed=None,
) -> Tuple[np.ndarray, int]:
    """Domain-decomposed sweep solve over a theta-sharded device mesh.

    Returns (values, rounds): values is (S, n_out) node-ordered travel
    times (all nodes, or the `receivers` subset).  ntheta must divide by
    the mesh size; sources are vmapped (replicated) on every device --
    shard big SOURCE batches with parallel/multisource.py, big GRIDS
    with this.  Backtrace (`prev`) is not assembled here: recover paths
    with the single-device engines, or from the field via the host
    steepest-descent walk (solvers/path.py).
    """
    mesh = mesh if mesh is not None else make_theta_mesh()
    dtype = jnp.dtype(config.dtype)
    ws = _packed if _packed is not None else pack_twrapped_stencil(
        cg, dtype=dtype, band_closure=0)
    tbl, static = pack_sweep_tables(ws, cg, dtype)
    if static.nt % mesh.devices.size:
        raise ValueError(
            f"ntheta={static.nt} not divisible by mesh size "
            f"{mesh.devices.size}")
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    cmap = cg.cmap
    S = len(sources)
    is_cen = sources == cmap.center
    src_m = jnp.asarray(np.where(is_cen, 0, cmap.m_of[sources]), jnp.int32)
    src_c = jnp.asarray(np.where(is_cen, 0, cmap.c_of[sources]), jnp.int32)
    src_cen = jnp.asarray(is_cen)
    tol = jnp.asarray(config.tol_value(), dtype)
    cap = max_rounds if max_rounds is not None else config.max_iters

    st = _solve_theta_sharded_jit(src_m, src_c, src_cen, tbl, tol, static,
                                  cap, S, mesh)
    n_out, (jm, jc, jcm, jv) = _extract_cached(ws.dcache, cmap, receivers)
    nt = static.nt
    cen2d = jnp.broadcast_to(jnp.repeat(st.cen, LANES)[None, :],
                             (SUB, S * LANES))
    rows = np.asarray(_textract_jit(st.dist.reshape(S * nt, static.ML),
                                    cen2d, st.it, jm, jc, jcm, jv, S, nt))
    return rows[:, :-1], int(rows[0, -1])
