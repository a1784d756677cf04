"""Node-sharded (domain-decomposed) 3-D directional-sweep solve.

The 3-D counterpart of `parallel/theta_shard.py`: one grid axis of the
structured (r, phi, theta) box is split into contiguous slabs across a
1-D device mesh, and each round exchanges a +-1-plane halo with the slab
neighbours (`jax.lax.ppermute`) -- per-device field memory drops to
O(n / D), so boxes beyond one chip's HBM become solvable.  The reference
has no 3-D distributed capability at all (SURVEY.md section 5; its 3-D
solvers are single-GPU CUDA, src/Dijsktra.jl:459-481).

Algorithm (block Gauss-Seidel over device slabs):

  1. ppermute the boundary plane each way (the 26-point stencil's reach
     is +-1 per axis); the ring wrap pair is harmless because
     `_shifted_weights` already sets +inf weights across the global box
     faces, so wrapped halo contributions are +inf no-ops;
  2. a full triaxial sweep round (solvers/solve3d.py::_plane_sweep3d,
     down+up along each axis).  Sweeps ALONG the sharded axis seed their
     scan carry with the neighbour's halo plane (carry_init) -- they are
     the only ops that apply the inter-slab edges.  Sweeps along the
     OTHER axes run on an edge-masked weight copy: their in-plane rolls
     along the sharded axis wrap block-internally, so every stencil
     shift with a component along the sharded axis is masked +inf on the
     slab's first/last plane (the true inter-slab weights are applied by
     step 2's halo-seeded sweeps instead, never by a wrapped roll);
  3. global convergence vote: `psum` of per-slab improved flags.

Exactness: every candidate is a real path cost; at a no-change round
the halo planes equal the neighbours' settled boundary planes, so the
inter-slab edges are satisfied through the halo-seeded sweeps and the
in-slab edges through the local taps -- the same SSSP fixpoint as the
single-device engines (pinned by tests/test_shard3d.py on the virtual
CPU mesh and by __graft_entry__.dryrun_multichip).

Cost model: per round the ICI moves 2*S*(n/n_axis) floats per slab
boundary (one plane each way) against O(26 * n/D) of local weight
traffic -- the halo rides ICI in the noise.  Convergence adds O(D)
rounds of staleness in the worst case (information crosses one slab
boundary per round), measured D/2-ish extra rounds at the test sizes.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig
from ..models.grid3d import Grid3D
from ..solvers.solve3d import (SHIFTS, Solve3DState, _plane_sweep3d,
                               _shifted_weights, _sweep_layout3d)

SHARD3D_AXIS = "shard3d"


def make_shard3d_mesh(devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (SHARD3D_AXIS,))


def _take_plane(v, pos: int, axis: int):
    """Boundary plane of the (S,)+shape field along data axis `axis`."""
    idx = [slice(None)] * v.ndim
    idx[axis] = pos
    return v[tuple(idx)]


def _edge_masked(W, shard_axis: int):
    """Local weight copy with every shift crossing the slab boundary
    along shard_axis masked +inf on the first/last local plane."""
    Wm = W
    for s, sh in enumerate(SHIFTS):
        d = sh[shard_axis]
        if d == 0:
            continue
        idx = [s] + [slice(None)] * 3
        idx[1 + shard_axis] = -1 if d == 1 else 0
        Wm = Wm.at[tuple(idx)].set(jnp.inf)
    return Wm


def _source_field(src_kji, shp_loc, shard_axis: int, dtype):
    """Local (S,)+shp_loc source field from global (k, j, i) coords."""
    nloc = shp_loc[shard_axis]
    bid = jax.lax.axis_index(SHARD3D_AXIS)
    inf = jnp.asarray(jnp.inf, dtype)
    axes_idx = []
    for a in range(3):
        g = jnp.arange(shp_loc[a], dtype=jnp.int32)
        if a == shard_axis:
            g = g + bid * nloc
        shape = [1, 1, 1]
        shape[a] = shp_loc[a]
        axes_idx.append(g.reshape(shape))
    match = ((axes_idx[0][None] == src_kji[:, 0, None, None, None])
             & (axes_idx[1][None] == src_kji[:, 1, None, None, None])
             & (axes_idx[2][None] == src_kji[:, 2, None, None, None]))
    return jnp.where(match, jnp.zeros((), dtype), inf)


def _stage_fix(v0, W, tol, max_rounds: int, shard_axis: int,
               perm_fwd, perm_bwd) -> Solve3DState:
    """One halo-exchanged block-Gauss-Seidel fixpoint on the local slab
    from an explicit initial field (shared by the plain and staged
    sharded solves)."""
    Wm = _edge_masked(W, shard_axis)

    def shift_w(Warr, sh):
        return Warr[SHIFTS.index(sh)]

    scan_costs = tuple(
        (shift_w(Wm, tuple(-u for u in unit)), shift_w(Wm, unit))
        for unit in ((1, 0, 0), (0, 1, 0), (0, 0, 1)))
    layouts = {
        a: _sweep_layout3d(W if a == shard_axis else Wm, scan_costs, a)
        for a in (0, 1, 2)
    }

    def round_one(d, h_up, h_dn):
        for a in (0, 1, 2):
            if a == shard_axis:
                d = _plane_sweep3d(d, layouts[a], a, True,
                                   carry_init=h_dn)
                d = _plane_sweep3d(d, layouts[a], a, False,
                                   carry_init=h_up)
            else:
                d = _plane_sweep3d(d, layouts[a], a, True)
                d = _plane_sweep3d(d, layouts[a], a, False)
        return d

    def rnd(state: Solve3DState) -> Solve3DState:
        v = state.dist
        # +-1-plane ring halo (global faces self-mask through +inf W)
        h_up = jax.lax.ppermute(
            _take_plane(v, -1, 1 + shard_axis), SHARD3D_AXIS, perm_fwd)
        h_dn = jax.lax.ppermute(
            _take_plane(v, 0, 1 + shard_axis), SHARD3D_AXIS, perm_bwd)
        v = jax.vmap(round_one)(v, h_up, h_dn)
        changed_loc = jnp.any(v < state.dist - tol)
        changed = jax.lax.psum(
            changed_loc.astype(jnp.int32), SHARD3D_AXIS) > 0
        return Solve3DState(v, changed, state.it + 1)

    def cond(s: Solve3DState):
        return s.changed & (s.it < max_rounds)

    return jax.lax.while_loop(
        cond, rnd, Solve3DState(v0, jnp.asarray(True),
                                jnp.zeros((), jnp.int32)))


@functools.partial(jax.jit, static_argnames=("max_rounds", "S", "mesh",
                                             "shard_axis"))
def _solve3d_sharded_jit(src_kji, W, tol, max_rounds: int, S: int,
                         mesh: Mesh, shard_axis: int) -> Solve3DState:
    """Sharded 3-D sweep solve; returns the GLOBAL (S, n2, n1, n0) field
    (slab-sharded on device) and the round count."""
    D = mesh.devices.size
    perm_fwd = [(i, (i + 1) % D) for i in range(D)]   # send up-slab
    perm_bwd = [((i + 1) % D, i) for i in range(D)]   # send down-slab

    def block(W, src_kji, tol):
        v0 = _source_field(src_kji, W.shape[1:], shard_axis, W.dtype)
        return _stage_fix(v0, W, tol, max_rounds, shard_axis,
                          perm_fwd, perm_bwd)

    spec = [None, None, None, None]
    spec[1 + shard_axis] = SHARD3D_AXIS
    fn = jax.shard_map(
        block, mesh=mesh,
        in_specs=(P(*spec), P(), P()),
        out_specs=Solve3DState(P(None, *spec[1:]), P(), P()),
        check_vma=False,
    )
    return fn(W, src_kji, tol)


@functools.partial(jax.jit, static_argnames=("max_rounds", "S", "mesh",
                                             "shard_axis", "plan", "widx"))
def _staged3d_sharded_jit(src_kji, Ws, tol, max_rounds: int, S: int,
                          mesh: Mesh, shard_axis: int,
                          plan: tuple, widx: tuple) -> Solve3DState:
    """Staged (multi-region) sharded solve in ONE dispatch.

    plan: per stage i >= 1 a static (src_k, dst_k, merge_idx, merge_k)
    tuple: the stage starts from +inf everywhere except radial plane
    `dst_k`, seeded from the PREVIOUS stage field's plane `src_k`
    (min-merged with stage `merge_idx`'s plane `merge_k` when merge_idx
    is not None).  Radial (k) planes are unsharded for shard_axis in
    (1, 2), so every seed handoff is shard-local - zero extra
    collectives beyond the per-round halo exchange.
    widx: per-stage index into Ws (stage weight sets may repeat).
    """
    D = mesh.devices.size
    perm_fwd = [(i, (i + 1) % D) for i in range(D)]
    perm_bwd = [((i + 1) % D, i) for i in range(D)]

    def block(*args):
        Ws_loc = args[:-2]
        src_kji, tol = args[-2:]
        dtype = Ws_loc[0].dtype
        inf = jnp.asarray(jnp.inf, dtype)
        v0 = _source_field(src_kji, Ws_loc[0].shape[1:], shard_axis, dtype)
        st = _stage_fix(v0, Ws_loc[widx[0]], tol, max_rounds, shard_axis,
                        perm_fwd, perm_bwd)
        fields, total_it = [st.dist], st.it
        for i, (src_k, dst_k, merge_idx, merge_k) in enumerate(plan):
            seed = fields[-1][:, src_k]
            if merge_idx is not None:
                seed = jnp.minimum(seed, fields[merge_idx][:, merge_k])
            d0 = jnp.full_like(fields[-1], inf).at[:, dst_k].set(seed)
            st = _stage_fix(d0, Ws_loc[widx[i + 1]], tol, max_rounds,
                            shard_axis, perm_fwd, perm_bwd)
            fields.append(st.dist)
            total_it = total_it + st.it
        return Solve3DState(fields[-1], st.changed, total_it)

    spec = [None, None, None, None]
    spec[1 + shard_axis] = SHARD3D_AXIS
    fn = jax.shard_map(
        block, mesh=mesh,
        in_specs=tuple(P(*spec) for _ in Ws) + (P(), P()),
        out_specs=Solve3DState(P(None, *spec[1:]), P(), P()),
        check_vma=False,
    )
    return fn(*Ws, src_kji, tol)


def solve3d_sharded(
    gr: Grid3D,
    U: np.ndarray,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
    receivers=None,
    max_rounds: int = None,
    shard_axis: int = 1,
) -> Tuple[np.ndarray, int]:
    """Domain-decomposed 3-D sweep solve over a slab-sharded device mesh.

    Returns (values, rounds): values is (S, n_out) flat-node-ordered
    travel times (all nodes, or the `receivers` subset).  shard_axis is
    the grid axis to decompose, 0 = r, 1 = phi (default), 2 = theta; its
    extent must divide by the mesh size.  Sources are replicated on
    every device -- shard big SOURCE batches with
    parallel/multisource.py, big GRIDS with this.  Same fixpoint as
    `solve3d` (all engines); `prev` is not assembled here -- recover it
    with solvers/solve3d.py::recover_prev3d on the returned field.
    """
    mesh = mesh if mesh is not None else make_shard3d_mesh()
    dtype = np.dtype(config.dtype)
    D = mesh.devices.size
    n0, n1, n2 = gr.nnods
    shp = (n2, n1, n0)
    if shp[shard_axis] % D:
        raise ValueError(
            f"grid axis {shard_axis} extent {shp[shard_axis]} not "
            f"divisible by mesh size {D}")
    W = jnp.asarray(_shifted_weights(gr, U, dtype))
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    S = len(sources)
    k = sources // (n1 * n0)
    j = (sources // n0) % n1
    i = sources % n0
    src_kji = jnp.asarray(np.stack([k, j, i], axis=1), jnp.int32)
    tol = jnp.asarray(config.tol_value(), dtype)
    cap = max_rounds if max_rounds is not None else config.max_iters

    st = _solve3d_sharded_jit(src_kji, W, tol, cap, S, mesh, shard_axis)
    vals = np.asarray(st.dist.reshape(S, -1))
    if receivers is not None:
        vals = vals[:, np.asarray(receivers, dtype=np.int64).ravel()]
    return vals, int(st.it)


def _staged_prep(gr, sources, config, mesh, shard_axis: int):
    """Shared validation + source-coordinate prep for the staged solves."""
    mesh = mesh if mesh is not None else make_shard3d_mesh()
    if shard_axis not in (1, 2):
        raise ValueError(
            "staged sharded solves need the seed (radial) planes "
            "unsharded; use shard_axis 1 (phi) or 2 (theta), not 0")
    D = mesh.devices.size
    n0, n1, n2 = gr.nnods
    shp = (n2, n1, n0)
    if shp[shard_axis] % D:
        raise ValueError(
            f"grid axis {shard_axis} extent {shp[shard_axis]} not "
            f"divisible by mesh size {D}")
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    k = sources // (n1 * n0)
    j = (sources // n0) % n1
    i = sources % n0
    src_kji = jnp.asarray(np.stack([k, j, i], axis=1), jnp.int32)
    tol = jnp.asarray(config.tol_value(), np.dtype(config.dtype))
    return mesh, shp, src_kji, tol, len(sources)


def solve3d_reflection_sharded(
    gr: Grid3D,
    U: np.ndarray,
    sources,
    r_reflect: float,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
    receivers=None,
    max_rounds: int = None,
    shard_axis: int = 1,
) -> Tuple[np.ndarray, int]:
    """Slab-sharded two-stage topside reflection (3-D PcP class).

    The domain-decomposed form of solvers/solve3d.py::solve3d_reflection
    (same fixpoint, pinned by tests/test_shard3d.py): stage A solves the
    region above `r_reflect`, stage B restarts from the reflector
    plane's stage-A times.  The reflector is a radial (k) plane --
    unsharded under shard_axis 1/2 -- so the stage handoff is
    shard-local; the only collectives are the per-round +-1-plane halo
    exchange and the psum convergence vote, exactly as in the plain
    sharded solve.  Star-1 stencil only (the +-1-plane halo is the
    stencil reach).
    """
    from ..solvers.solve3d import mask_region3d

    dtype = np.dtype(config.dtype)
    mesh, shp, src_kji, tol, S = _staged_prep(gr, sources, config, mesh,
                                              shard_axis)
    r_ax = np.asarray(gr.r_ax)
    k_lev = int(np.argmin(np.abs(r_ax - r_reflect)))
    if abs(r_ax[k_lev] - r_reflect) > 1e-6:
        raise ValueError("r_reflect must be a grid radial level "
                         "(build with grid3d(force_radii=[r_reflect]))")
    keep = (gr.r >= r_reflect - 1e-6).reshape(shp)
    Wm = jnp.asarray(mask_region3d(_shifted_weights(gr, U, dtype), keep))
    cap = max_rounds if max_rounds is not None else config.max_iters

    plan = ((k_lev, k_lev, None, 0),)
    st = _staged3d_sharded_jit(src_kji, (Wm,), tol, cap, S, mesh,
                               shard_axis, plan, (0, 0))
    vals = np.asarray(st.dist.reshape(S, -1))
    if receivers is not None:
        vals = vals[:, np.asarray(receivers, dtype=np.int64).ravel()]
    return vals, int(st.it)


def solve3d_converted_sharded(
    gr: Grid3D,
    U_down: np.ndarray,
    U_core: np.ndarray,
    sources,
    r_boundary: float,
    U_up: Optional[np.ndarray] = None,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    mesh: Optional[Mesh] = None,
    receivers=None,
    max_rounds: int = None,
    shard_axis: int = 1,
) -> Tuple[np.ndarray, int]:
    """Slab-sharded three-stage boundary-converted transit (3-D SKS/PKP
    class) -- the domain-decomposed form of
    solvers/solve3d.py::solve3d_converted (same fixpoint, same twin-
    doubled-grid requirement; pinned by tests/test_shard3d.py).

    Stage handoffs (topside plane -> underside twin -> topside) are
    radial-plane copies, shard-local under shard_axis 1/2; collectives
    stay the per-round halo exchange + psum vote.  Star-1 stencil only.
    """
    from ..solvers.solve3d import mask_region3d

    dtype = np.dtype(config.dtype)
    mesh, shp, src_kji, tol, S = _staged_prep(gr, sources, config, mesh,
                                              shard_axis)
    r_ax = np.asarray(gr.r_ax)
    k_top = int(np.argmin(np.abs(r_ax - r_boundary)))
    if (abs(r_ax[k_top] - r_boundary) > 1e-6 or k_top == 0
            or abs(r_ax[k_top - 1]
                   - (r_boundary - gr.twin_offset)) > 1e-6):
        raise ValueError(
            "r_boundary must be a twin-doubled forced radius of the "
            "grid (build with grid3d(force_radii=[r_boundary, ...]))")
    k_under = k_top - 1
    same_up = U_up is None or U_up is U_down

    keep_top = (gr.r >= r_boundary - 1e-6).reshape(shp)
    keep_core = (gr.r <= r_boundary - 1e-6).reshape(shp)
    W_dn = jnp.asarray(mask_region3d(
        _shifted_weights(gr, U_down, dtype), keep_top))
    W_k = jnp.asarray(mask_region3d(
        _shifted_weights(gr, U_core, dtype), keep_core))
    Ws = (W_dn, W_k) if same_up else (W_dn, W_k, jnp.asarray(
        mask_region3d(_shifted_weights(gr, U_up, dtype), keep_top)))
    widx = (0, 1, 0) if same_up else (0, 1, 2)
    cap = max_rounds if max_rounds is not None else config.max_iters

    plan = ((k_top, k_under, None, 0), (k_under, k_top, 0, k_top))
    st = _staged3d_sharded_jit(src_kji, Ws, tol, cap, S, mesh,
                               shard_axis, plan, widx)
    vals = np.asarray(st.dist.reshape(S, -1))
    if receivers is not None:
        vals = vals[:, np.asarray(receivers, dtype=np.int64).ravel()]
    return vals, int(st.it)
