"""Multi-stage / multiphase BFM sweeps (layer-by-layer propagation).

TPU equivalents of the reference's experimental multi-leg phase
scaffolding:
  * `bfm_ms`         (src/SSSP/bfm_new_ms.jl:30-138): element-incidence
    graph with halo, runs the first (downward) and last (upward) levels of
    the partition iterator, restarting from the minimum-distance boundary
    node with distances reset outside that boundary.
  * `bfm_multiphase` (src/SSSP/bfm_multiphase.jl:30-156): nodal sparse
    graph, sweeps the first `nlevels` iterator levels (reference hardcodes
    3), swapping the velocity at the active boundaries above/below per
    sweep direction before each level.

Both are dense-mask reformulations: the per-level frontier restriction
(`ID[Gi] not in current_level && continue`) becomes a boolean level mask
applied when rebuilding the frontier; relaxation itself is unrestricted,
exactly like the reference.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig, VELOCITY_BUFFER
from ..models.partition import GridPartition, level_mask, partition_grid
from ..ops.relax import BFMState, DeviceGraph, bfm_step, init_state
from .bfm import prepare
from .types import BellmanFordMoore


def directions(nlayers: int) -> Dict[int, Tuple[str, str]]:
    """Ray direction per iterator level (src/SSSP/bfm_new_ms.jl:1-14)."""
    nmax = 2 * nlayers - 1
    out: Dict[int, Tuple[str, str]] = {}
    out[1] = out[nmax] = ("above", "above")
    for i in range(2, nlayers):
        out[i] = out[nmax - i + 1] = ("below", "above")
    out[nlayers] = ("below", "below")
    return out


def boundary_velocity(
    U: np.ndarray,
    interpolant: Callable,
    r_boundary: float,
    boundary_nodes: np.ndarray,
    ray_direction: str,
    buffer: float = VELOCITY_BUFFER,
) -> np.ndarray:
    """Swap the velocity of boundary nodes to the value just above/below
    (src/SSSP/bfm_new_ms.jl:16-28 convention: 'above' samples r+buffer)."""
    U = np.asarray(U, dtype=np.float64).copy()
    if ray_direction == "above":
        val = interpolant(r_boundary + buffer)
    else:
        val = interpolant(r_boundary - buffer)
    U[boundary_nodes] = val
    return U


def _masked_step(state: BFMState, g: DeviceGraph, mask: jax.Array) -> BFMState:
    """bfm_step with the frontier restricted to `mask` (level-masked
    _update_Q!, src/SSSP/bfm_new_ms.jl:152-168)."""
    s = bfm_step(state, g)
    return s._replace(front=s.front & mask)


@functools.partial(jax.jit, static_argnames=("max_iters", "dtype_name"))
def _masked_solve_jit(g: DeviceGraph, dist0, prev0, front0, mask, max_iters: int, dtype_name: str):
    state = BFMState(dist=dist0, prev=prev0, front=front0 & mask, it=jnp.zeros((), jnp.int32))

    def cond(s):
        return jnp.any(s.front) & (s.it < max_iters)

    def body(s):
        return _masked_step(s, g, mask)

    return jax.lax.while_loop(cond, body, state)


def _boundary_nodes(gr, partition: GridPartition) -> Dict[str, np.ndarray]:
    return {
        b: np.flatnonzero(partition.boundary_of == k + 1)
        for k, b in enumerate(partition.boundaries)
    }


def _lane_mask_of(cg, ws, node_mask: np.ndarray) -> np.ndarray:
    """(ML,) lane mask from a per-node mask: partition labels depend only
    on radius and radius is constant along a slot, so any column's node
    represents its slot."""
    rep = cg.cmap.node_of[:, 0]                      # (M,)
    lm = np.zeros(ws.ML, dtype=bool)
    lm[: cg.cmap.M] = node_mask[rep]
    return lm


def _halo_slot_map(cg, ws, halo: np.ndarray) -> Optional[np.ndarray]:
    """(K, ML) partner-slot maps of the halo twin table (identity where
    no twin).  Twins share their original's theta column, so the
    node-level halo collapses to per-slot maps; a destination slot can
    have SEVERAL partner slots (each discontinuity's original slot pairs
    with two twin slots on production annuli), so K rows cover the
    maximum multiplicity — a single last-write-wins permutation would
    silently drop twin-merge links."""
    if halo is None or len(halo) == 0:
        return None
    m_dst = cg.cmap.m_of[halo[:, 1]]
    m_src = cg.cmap.m_of[halo[:, 0]]
    partners = {}
    for a, b in zip(m_dst, m_src):
        partners.setdefault(int(a), []).append(int(b))
    # dedupe BEFORE sizing K: every theta column of a ring maps to the
    # same (dst, src) slot pair, so the raw lists carry ~ntheta copies
    # of each partner and K would balloon to ~ntheta (a 45-180x gather
    # blow-up in the kernel); true multiplicity is ~2
    partners = {a: list(dict.fromkeys(v)) for a, v in partners.items()}
    K = max(len(v) for v in partners.values())
    hm = np.tile(np.arange(ws.ML, dtype=np.int32), (K, 1))
    for a, srcs in partners.items():
        for k, b in enumerate(srcs):
            hm[k, a] = b
    return hm


def _ms_stages(cg, ws, static, halo, partition, levels, dtype):
    """StageSpec list for the bfm_ms level sequence."""
    from ..ops.stream_t import StageSpec, masked_stream_tables

    halo_map = _halo_slot_map(cg, ws, halo)
    stages = []
    for li, level in enumerate(levels):
        nmask = level_mask(partition, level)
        lane = _lane_mask_of(cg, ws, nmask)
        cen_on = cg.cmap.center >= 0 and bool(nmask[cg.cmap.center])
        tables = masked_stream_tables(ws, lane[: ws.Mp], cen_on, dtype)
        reset_keep = None
        cen_keep = True
        if li > 0:
            first_boundary = partition.iterator[level][1]
            bmask = np.isin(partition.id, [first_boundary])
            reset_keep = _lane_mask_of(cg, ws, bmask)
            cen_keep = cg.cmap.center >= 0 and bool(bmask[cg.cmap.center])
        stages.append(StageSpec(tables=tables, static=static,
                                sel_mask=lane, reset_keep=reset_keep,
                                cen_keep=cen_keep, halo_map=halo_map))
    return stages


def _ms_sweep_stages(cg, ws, halo, partition, levels, dtype):
    """SweepStageSpec list for the bfm_ms level sequence (the
    directional-sweep engine's destination-masked stage tables)."""
    from ..ops.sweep_theta import (SweepStageSpec, pack_rsweep_tables,
                                   pack_sweep_tables)

    halo_map = _halo_slot_map(cg, ws, halo)
    stages = []
    for li, level in enumerate(levels):
        nmask = level_mask(partition, level)
        lane = _lane_mask_of(cg, ws, nmask)
        cen_on = cg.cmap.center >= 0 and bool(nmask[cg.cmap.center])
        tables, _ = pack_sweep_tables(ws, cg, dtype,
                                      slot_mask=lane[: ws.Mp],
                                      cen_on=cen_on)
        (wdn, wup), _ = pack_rsweep_tables(ws, cg, dtype,
                                           slot_mask=lane[: ws.Mp])
        reset_keep = None
        cen_keep = True
        if li > 0:
            first_boundary = partition.iterator[level][1]
            bmask = np.isin(partition.id, [first_boundary])
            reset_keep = _lane_mask_of(cg, ws, bmask)
            cen_keep = cg.cmap.center >= 0 and bool(bmask[cg.cmap.center])
        stages.append(SweepStageSpec(tables=tables, wtab_dn=wdn,
                                     wtab_up=wup, reset_keep=reset_keep,
                                     cen_keep=cen_keep,
                                     halo_map=halo_map))
    return stages


def _bfm_ms_sweep(A, halo, source, gr, U, config, levels,
                  interpret: bool = False,
                  want_prev: bool = True,
                  _reuse: Optional[dict] = None) -> BellmanFordMoore:
    """bfm_ms on the directional-sweep engine: each level-masked stage
    converges in ~3-4 sweep rounds instead of O(ntheta) Jacobi
    iterations (see ops/sweep_theta.py); same staged semantics as the
    stream variant (lane resets, unmasked improvement-gated twin merge),
    equality-tested against the ELL reference implementation."""
    from ..ops.circulant import build_circulant, recover_prev_device
    from ..ops.sweep_theta import solve_sweep_staged
    from ..ops.wrapped_t import pack_twrapped_stencil

    dtype = np.dtype(config.dtype)
    key = ("ms_sweep_setup", tuple(levels) if levels else None)
    if _reuse is not None and key in _reuse:
        cg, ws, stages, levels = _reuse[key]
    else:
        partition = partition_grid(gr)
        if levels is None:
            levels = (1, 2 * partition.nlayers - 1)
        cg = build_circulant(gr, A, halo, U, dtype=dtype)
        ws = pack_twrapped_stencil(cg, dtype=dtype, band_closure=0)
        stages = _ms_sweep_stages(cg, ws, halo, partition, levels, dtype)
        if _reuse is not None:
            _reuse[key] = (cg, ws, stages, levels)
    dist, _ = solve_sweep_staged(cg, ws, stages, [source], config,
                                 interpret=interpret)
    dist = dist[0]
    if want_prev:
        prev = recover_prev_device(cg, dist)
        prev[source] = source
    else:
        prev = np.arange(len(dist))
    return BellmanFordMoore(prev=prev, dist=dist)


def _bfm_ms_stream(A, halo, source, gr, U, config, levels,
                   interpret: bool = False,
                   want_prev: bool = True,
                   _reuse: Optional[dict] = None) -> BellmanFordMoore:
    """bfm_ms on the circulant fast path (ops/stream_t.py staged solve):
    level masks become per-slot lane masks, the boundary restart a lane
    reset, and all stages run in one device dispatch.  ~100x faster than
    the ELL path on production meshes.  Predecessors are recovered
    best-effort from the final field over the unmasked stencil (the
    multi-leg restart makes a single global shortest-path tree
    ill-defined; the reference's experimental ms code has the same
    ambiguity)."""
    from ..ops.circulant import build_circulant, recover_prev_device
    from ..ops.stream_t import _stream_tables, solve_stream_staged
    from ..ops.wrapped_t import pack_twrapped_stencil

    dtype = np.dtype(config.dtype)
    key = ("ms_setup", tuple(levels) if levels else None)
    if _reuse is not None and key in _reuse:
        cg, ws, static, partition, stages, levels = _reuse[key]
    else:
        partition = partition_grid(gr)
        if levels is None:
            levels = (1, 2 * partition.nlayers - 1)
        cg = build_circulant(gr, A, halo, U, dtype=dtype)
        # closure must stay off: closed-band entries are 2-hop
        # compositions whose intermediate slot is not mask-checked
        ws = pack_twrapped_stencil(cg, dtype=dtype, band_closure=0)
        _, static = _stream_tables(ws, dtype)
        stages = _ms_stages(cg, ws, static, halo, partition, levels, dtype)
        if _reuse is not None:
            _reuse[key] = (cg, ws, static, partition, stages, levels)
    dist, _ = solve_stream_staged(cg, ws, stages, [source], config,
                                  interpret=interpret)
    dist = dist[0]
    if want_prev:
        prev = recover_prev_device(cg, dist)
        prev[source] = source
    else:
        prev = np.arange(len(dist))
    return BellmanFordMoore(prev=prev, dist=dist)


def bfm_ms(
    A: sp.csr_matrix,
    halo: np.ndarray,
    source: int,
    gr,
    U: np.ndarray,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    levels: Optional[Tuple[int, ...]] = None,
    method: str = "ell",
    interpret: bool = False,
    want_prev: bool = True,
    _reuse: Optional[dict] = None,
) -> BellmanFordMoore:
    """Multi-stage BFM (src/SSSP/bfm_new_ms.jl:30-138).

    Default levels = (1, last), like the reference's
    `for i in [1, length(iterator)]`.  Between levels the source moves to
    the minimum-distance node of the level's first boundary and all other
    distances reset to +inf.

    method='stream' runs the circulant fast path (staged level-masked
    streamed solve, one device dispatch); 'sweep' the directional-sweep
    engine (~3-4 rounds per stage); 'ell' is the general-graph
    reference implementation the fast paths are equality-tested against.
    """
    if method == "sweep":
        return _bfm_ms_sweep(A, halo, source, gr, U, config, levels,
                             interpret=interpret, want_prev=want_prev,
                             _reuse=_reuse)
    if method == "stream":
        # pass a dict as _reuse to amortise the one-time circulant pack
        # (~3 s host work at 180x63) across repeated solves - the solve
        # itself is ~56 ms
        return _bfm_ms_stream(A, halo, source, gr, U, config, levels,
                              interpret=interpret, want_prev=want_prev,
                              _reuse=_reuse)
    partition = partition_grid(gr)
    if levels is None:
        levels = (1, 2 * partition.nlayers - 1)
    bnodes = _boundary_nodes(gr, partition)

    dtype = jnp.dtype(config.dtype)
    g = prepare(A, halo, gr, U, config)
    n_pad = g.nbr.shape[0]

    st = init_state(g, jnp.asarray(source, jnp.int32), dtype)
    dist, prev = st.dist, st.prev

    for li, level in enumerate(levels):
        active = partition.iterator[level]
        first_boundary = active[1]
        mask_np = np.zeros(n_pad, dtype=bool)
        mask_np[: gr.nnods] = level_mask(partition, level)
        mask = jnp.asarray(mask_np)

        if li > 0:
            # restart from the best node on the level's first boundary:
            # non-boundary distances reset to +inf, the boundary keeps its
            # accumulated travel times (the reference never zeroes the new
            # source, src/SSSP/bfm_new_ms.jl:96-110 - only the frontier is
            # re-seeded around it)
            keep = jnp.asarray(bnodes[first_boundary])
            src = keep[jnp.argmin(dist[keep])].astype(jnp.int32)
            reset = jnp.ones(n_pad, dtype=bool).at[keep].set(False)
            dist = jnp.where(reset, jnp.asarray(np.inf, dtype), dist)
            st0 = init_state(g, src, dtype)
            front = st0.front
        else:
            front = st.front

        out = _masked_solve_jit(g, dist, prev, front, mask, config.max_iters, config.dtype)
        dist, prev = out.dist, out.prev

    return BellmanFordMoore(prev=np.asarray(prev)[: gr.nnods], dist=np.asarray(dist)[: gr.nnods])


def _bfm_multiphase_stream(A, source, gr, U, partition, interpolant,
                           config, nlevels,
                           interpret: bool = False) -> BellmanFordMoore:
    """bfm_multiphase on the circulant fast path: the per-level boundary
    velocity swap is a weight edit at boundary slots, expressed as one
    circulant repack per level (each level gets its own stage tables);
    all levels then run masked in one device dispatch."""
    from ..ops.circulant import build_circulant, recover_prev_device
    from ..ops.stream_t import (
        StageSpec,
        _stream_tables,
        masked_stream_tables,
        solve_stream_staged,
    )
    from ..ops.wrapped_t import pack_twrapped_stencil

    partition = partition or partition_grid(gr)
    bnodes = _boundary_nodes(gr, partition)
    ray_dir = directions(partition.nlayers)
    bdict = dict(zip(partition.boundaries, partition.rboundaries))
    U = np.asarray(U, dtype=np.float64).copy()
    empty_halo = np.empty((0, 2), dtype=np.int64)
    dtype = np.dtype(config.dtype)

    stages = []
    cg0 = ws0 = static0 = None
    for i in range(1, nlevels + 1):
        active = partition.iterator[i]
        current_boundaries = active[1:]
        if interpolant is not None:
            for b in current_boundaries:
                U = boundary_velocity(
                    U, interpolant, bdict[b], bnodes[b],
                    ray_dir[i][0 if b == current_boundaries[0] else 1])
        cg = build_circulant(gr, A, empty_halo, U, dtype=dtype)
        ws = pack_twrapped_stencil(cg, dtype=dtype, band_closure=0)
        _, static = _stream_tables(ws, dtype)
        if cg0 is None:
            cg0, ws0, static0 = cg, ws, static
        nmask = level_mask(partition, i)
        lane = _lane_mask_of(cg, ws, nmask)
        cen_on = cg.cmap.center >= 0 and bool(nmask[cg.cmap.center])
        stages.append(StageSpec(
            tables=masked_stream_tables(ws, lane[: ws.Mp], cen_on, dtype),
            static=static, sel_mask=lane))

    dist, _ = solve_stream_staged(cg0, ws0, stages, [source], config,
                                  interpret=interpret)
    dist = dist[0]
    prev = recover_prev_device(cg0, dist)
    prev[source] = source
    return BellmanFordMoore(prev=prev, dist=dist)


def _bfm_multiphase_sweep(A, source, gr, U, partition, interpolant,
                          config, nlevels,
                          interpret: bool = False) -> BellmanFordMoore:
    """bfm_multiphase on the directional-sweep engine: per-level boundary
    velocity swaps become per-stage table repacks, all levels masked and
    run in one dispatch at ~3-4 sweep rounds each."""
    from ..ops.circulant import build_circulant, recover_prev_device
    from ..ops.sweep_theta import (SweepStageSpec, pack_rsweep_tables,
                                   pack_sweep_tables, solve_sweep_staged)
    from ..ops.wrapped_t import pack_twrapped_stencil

    partition = partition or partition_grid(gr)
    bnodes = _boundary_nodes(gr, partition)
    ray_dir = directions(partition.nlayers)
    bdict = dict(zip(partition.boundaries, partition.rboundaries))
    U = np.asarray(U, dtype=np.float64).copy()
    empty_halo = np.empty((0, 2), dtype=np.int64)
    dtype = np.dtype(config.dtype)

    stages = []
    cg0 = ws0 = None
    for i in range(1, nlevels + 1):
        active = partition.iterator[i]
        current_boundaries = active[1:]
        if interpolant is not None:
            for b in current_boundaries:
                U = boundary_velocity(
                    U, interpolant, bdict[b], bnodes[b],
                    ray_dir[i][0 if b == current_boundaries[0] else 1])
        cg = build_circulant(gr, A, empty_halo, U, dtype=dtype)
        ws = pack_twrapped_stencil(cg, dtype=dtype, band_closure=0)
        if cg0 is None:
            cg0, ws0 = cg, ws
        nmask = level_mask(partition, i)
        lane = _lane_mask_of(cg, ws, nmask)
        cen_on = cg.cmap.center >= 0 and bool(nmask[cg.cmap.center])
        tables, _ = pack_sweep_tables(ws, cg, dtype,
                                      slot_mask=lane[: ws.Mp],
                                      cen_on=cen_on)
        (wdn, wup), _ = pack_rsweep_tables(ws, cg, dtype,
                                           slot_mask=lane[: ws.Mp])
        stages.append(SweepStageSpec(tables=tables, wtab_dn=wdn,
                                     wtab_up=wup))

    dist, _ = solve_sweep_staged(cg0, ws0, stages, [source], config,
                                 interpret=interpret)
    dist = dist[0]
    prev = recover_prev_device(cg0, dist)
    prev[source] = source
    return BellmanFordMoore(prev=prev, dist=dist)


def bfm_multiphase(
    A: sp.csr_matrix,
    source: int,
    gr,
    U: np.ndarray,
    partition: Optional[GridPartition] = None,
    interpolant: Optional[Callable] = None,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    nlevels: int = 3,
    method: str = "ell",
    interpret: bool = False,
) -> BellmanFordMoore:
    """Multiphase BFM on the nodal graph (src/SSSP/bfm_multiphase.jl:30-156).

    Sweeps the first `nlevels` partition levels (the reference hardcodes
    `for i in 1:3`), updating the boundary-node velocities above/below per
    the level's ray direction before each sweep.  No halo (the reference
    variant predates node doubling).

    method='stream' runs the circulant fast path (per-level repacked
    weights, masked staged streamed solve in one dispatch); 'sweep' the
    directional-sweep engine (~3-4 rounds per stage); 'ell' is the
    general-graph reference implementation.
    """
    if method == "sweep":
        return _bfm_multiphase_sweep(A, source, gr, U, partition,
                                     interpolant, config, nlevels,
                                     interpret=interpret)
    if method == "stream":
        return _bfm_multiphase_stream(A, source, gr, U, partition,
                                      interpolant, config, nlevels,
                                      interpret=interpret)
    partition = partition or partition_grid(gr)
    bnodes = _boundary_nodes(gr, partition)
    ray_dir = directions(partition.nlayers)
    bdict = dict(zip(partition.boundaries, partition.rboundaries))

    U = np.asarray(U, dtype=np.float64).copy()
    empty_halo = np.empty((0, 2), dtype=np.int64)
    dtype = jnp.dtype(config.dtype)

    dist = prev = None
    for i in range(1, nlevels + 1):
        active = partition.iterator[i]
        current_boundaries = active[1:]
        if interpolant is not None:
            for b in current_boundaries:
                U = boundary_velocity(U, interpolant, bdict[b], bnodes[b], ray_dir[i][0 if b == current_boundaries[0] else 1])

        # weights change with U -> repack per level
        g = prepare(A, empty_halo, gr, U, config)
        n_pad = g.nbr.shape[0]
        mask_np = np.zeros(n_pad, dtype=bool)
        mask_np[: gr.nnods] = level_mask(partition, i)
        mask = jnp.asarray(mask_np)

        st0 = init_state(g, jnp.asarray(source, jnp.int32), dtype)
        if dist is None:
            dist, prev = st0.dist, st0.prev
        front = st0.front & mask

        out = _masked_solve_jit(g, dist, prev, front, mask, config.max_iters, config.dtype)
        dist, prev = out.dist, out.prev

    return BellmanFordMoore(prev=np.asarray(prev)[: gr.nnods], dist=np.asarray(dist)[: gr.nnods])


def find_new_source_min(dist: np.ndarray, partition: GridPartition, boundary: str) -> int:
    """Minimum-distance node on a boundary (src/SSSP/bfm_multiphase.jl:158-170)."""
    nodes = np.flatnonzero(partition.id == boundary)
    return int(nodes[np.argmin(np.asarray(dist)[nodes])])
