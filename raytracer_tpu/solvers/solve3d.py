"""TPU-fast SSSP on the regular 3-D spherical-shell grid.

Replaces the reference's legacy 3-D CUDA solvers
(src/Dijsktra.jl:196-292,459-481) with a design that exploits the grid
regularity the reference never used: the star-0 nodal stencil of a
structured hexahedral lattice is the fixed 26-point neighbourhood
(di, dj, dk) in {-1,0,1}^3 \\ {0}, so one relaxation sweep is 26
STATICALLY-shifted whole-array add+min ops over the dense
(nr, nphi, ntheta) distance field - no gathers, no adjacency structure,
nothing for XLA to serialize.  Per-shift edge weights (2*L/(U1+U2),
identical formula to the 2-D solvers / reference bfm) are precomputed
host-side with +inf at the non-periodic box faces.

Six exact (sum, min) min-plus scans (both directions along each axis)
propagate along grid lines in one step, cutting the iteration count from
O(n0+n1+n2) to roughly the number of direction changes of the optimal
paths; they only apply valid single-axis relaxation chains, so the
fixpoint is unchanged.  Termination uses config.tol (see
config.SolverConfig).

`solve3d` matches `bfm.bfm3d` (ELL path) and Dijkstra on the same weight
matrix - asserted in tests/test_grid3d.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig
from ..models.grid3d import Grid3D
from ..ops.weights import _safe_weight

def shifts_star(star: int = 1):
    """The star-`star` lattice stencil: every (dk, dj, di) in
    {-star..star}^3 with gcd 1 (collinear multiples of a shorter shift
    add no new direction - the two-hop chain through the midpoint is
    already in the graph, so dropping them preserves the SPM fixpoint
    up to the midpoint's velocity sampling, which only HELPS accuracy).
    star=1 is the 26-tap stencil (the reference's 3-D neighbourhood,
    src/StructuredGrid.jl:121-168); star=2 adds the 72 gcd-1 two-cell
    directions (98 taps), halving the worst-case angular quantisation
    ~19 deg -> ~9.7 deg and quartering the SPM overshoot; star=3 is
    290 taps (~6.5 deg).  The angular-refinement analog of the
    reference's nodal_incidence star expansion
    (src/StructuredGrid.jl:203-223), but by DIRECTION, not hop count."""
    import math

    out = []
    rng = range(-star, star + 1)
    for dk in rng:
        for dj in rng:
            for di in rng:
                if (dk, dj, di) == (0, 0, 0):
                    continue
                if math.gcd(math.gcd(abs(dk), abs(dj)), abs(di)) != 1:
                    continue
                out.append((dk, dj, di))
    return tuple(out)


SHIFTS = shifts_star(1)


def _shifted_weights(gr: Grid3D, U: np.ndarray, dtype=np.float32,
                     shifts=SHIFTS) -> np.ndarray:
    """(n_shifts, n2, n1, n0) per-shift edge weights, +inf across box
    faces.

    W[s, k, j, i] = weight of the edge from node (i+di, j+dj, k+dk) into
    node (i, j, k) for shift s = (dk, dj, di).
    """
    n0, n1, n2 = gr.nnods
    shp = (n2, n1, n0)
    X = gr.x.reshape(shp)
    Y = gr.y.reshape(shp)
    Z = gr.z.reshape(shp)
    Ug = np.asarray(U, dtype=np.float64).reshape(shp)

    W = np.full((len(shifts),) + shp, np.inf, dtype=np.float64)
    for s, (dk, dj, di) in enumerate(shifts):
        src = tuple(np.roll(a, (-dk, -dj, -di), axis=(0, 1, 2)) for a in (X, Y, Z, Ug))
        L = np.sqrt((src[0] - X) ** 2 + (src[1] - Y) ** 2 + (src[2] - Z) ** 2)
        w = _safe_weight(L, Ug + src[3])
        # mask wrapped entries (non-periodic box): a shift of +-d along
        # an axis wraps the last/first d planes
        if dk > 0:
            w[n2 - dk:, :, :] = np.inf
        elif dk < 0:
            w[:-dk, :, :] = np.inf
        if dj > 0:
            w[:, n1 - dj:, :] = np.inf
        elif dj < 0:
            w[:, :-dj, :] = np.inf
        if di > 0:
            w[:, :, n0 - di:] = np.inf
        elif di < 0:
            w[:, :, :-di] = np.inf
        W[s] = w
    return W.astype(dtype)


def _sweep(dist: jax.Array, W: jax.Array, shifts=SHIFTS) -> jax.Array:
    out = dist
    for s, (dk, dj, di) in enumerate(shifts):
        src = jnp.roll(dist, shift=(-dk, -dj, -di), axis=(0, 1, 2))
        out = jnp.minimum(out, src + W[s])
    return out


def _axis_scan(dist: jax.Array, cost_fwd: jax.Array, cost_bwd: jax.Array, axis: int) -> jax.Array:
    """Exact min-plus chain relaxation along `axis`, both directions.

    cost_fwd[..., t, ...] = weight entering position t from t-1 (+inf at
    t=0); cost_bwd = entering t from t+1 (flipped for the reverse scan).
    """

    def combine(a, b):
        (sa, ma), (sb, mb) = a, b
        return sa + sb, jnp.minimum(ma + sb, mb)

    out = dist
    for cost, flip in ((cost_fwd, False), (cost_bwd, True)):
        x = jnp.flip(dist, axis=axis) if flip else dist
        c = jnp.flip(cost, axis=axis) if flip else cost
        _, scanned = jax.lax.associative_scan(combine, (c, x), axis=axis)
        if flip:
            scanned = jnp.flip(scanned, axis=axis)
        out = jnp.minimum(out, scanned)
    return out


class Solve3DState(NamedTuple):
    dist: jax.Array
    changed: jax.Array
    it: jax.Array


def _sweep_layout3d(W, scan_costs, axis: int):
    """Per-axis plane layouts for _plane_sweep3d, computed ONCE per solve
    (outside the while_loop — a guaranteed hoist of the ~109 MB weight
    transposes instead of relying on XLA's loop-invariant code motion):
    W as (nA, 26, p0, p1) planes plus the four in-plane scan-cost plane
    stacks."""
    oaxes = [a for a in (0, 1, 2) if a != axis]
    xs_W = jnp.moveaxis(jnp.moveaxis(W, 1 + axis, 1), 1, 0)
    xs_c = []
    for a in oaxes:
        cf, cb = scan_costs[a]
        xs_c += [jnp.moveaxis(cf, axis, 0), jnp.moveaxis(cb, axis, 0)]
    return (xs_W,) + tuple(xs_c)


def _plane_sweep3d(d, layout, axis: int, down: bool, carry_init=None,
                   shifts=SHIFTS):
    """One Gauss-Seidel plane sweep along `axis` (directional sweeping).

    Planes are processed sequentially (a lax.scan over the axis,
    reverse=True for the descending/down direction): the 9 cross taps
    (shift[axis] = +1 for down, -1 for up) read the neighbouring plane
    ALREADY UPDATED this sweep, so arrivals propagate across the whole
    box along `axis` in a single pass; the 8 in-plane taps then run
    Gauss-Seidel within the plane, and the two in-plane min-plus axis
    scans (_axis_scan) give full single-line reach per plane visit.
    Every candidate is a real path cost, so the SSSP fixpoint is that of
    the Jacobi engines.  The fast-sweeping analog of ops/sweep_theta.py
    for the structured 3-D grid (reference workload:
    src/Dijsktra.jl:196-292).

    carry_init seeds the scan carry (the plane "before" the first one
    processed) -- +inf when None (the box face); the node-sharded solver
    (parallel/shard3d.py) passes the neighbour block's halo plane."""
    sgn = +1 if down else -1
    reach = max(abs(sh[axis]) for sh in shifts)
    # cross[m-1]: taps reading the plane processed m steps ago (shift
    # m*sgn along the sweep axis); taps with the OPPOSITE axis sign are
    # applied by the other direction's pass of the same round
    cross = [[s for s, sh in enumerate(shifts) if sh[axis] == m * sgn]
             for m in range(1, reach + 1)]
    inpl = [s for s, sh in enumerate(shifts) if sh[axis] == 0]
    oaxes = [a for a in (0, 1, 2) if a != axis]

    def pl_shift(s):
        sh = shifts[s]
        return (sh[oaxes[0]], sh[oaxes[1]])

    xs_d = jnp.moveaxis(d, axis, 0)

    def step(prevs, x):
        cur, Wp, c0f, c0b, c1f, c1b = x
        for m in range(reach):
            for s in cross[m]:
                da, db = pl_shift(s)
                cur = jnp.minimum(cur,
                                  jnp.roll(prevs[m], (-da, -db), axis=(0, 1))
                                  + Wp[s])
        for s in inpl:
            da, db = pl_shift(s)
            cur = jnp.minimum(cur, jnp.roll(cur, (-da, -db), axis=(0, 1))
                              + Wp[s])
        cur = _axis_scan(cur, c0f, c0b, 0)
        cur = _axis_scan(cur, c1f, c1b, 1)
        return (cur,) + prevs[:-1], cur

    inf_pl = jnp.full_like(xs_d[0], jnp.inf)
    if carry_init is None:
        init = (inf_pl,) * reach
    elif isinstance(carry_init, tuple):
        init = carry_init + (inf_pl,) * (reach - len(carry_init))
    else:   # single halo plane (parallel/shard3d.py, star-1 contract)
        init = (carry_init,) + (inf_pl,) * (reach - 1)
    _, ys = jax.lax.scan(step, init, (xs_d,) + layout, reverse=down)
    return jnp.moveaxis(ys, 0, axis)


@functools.partial(jax.jit, static_argnames=("max_iters", "axes", "S",
                                              "shifts"))
def _solve3d_sweep_jit(srcs, W, scan_costs, tol, max_iters: int,
                       axes: Tuple[int, ...] = (0, 1, 2),
                       S: int = 1, shifts=SHIFTS) -> Solve3DState:
    """Directional-sweep solve: down+up plane sweeps along each axis per
    round; converges in ~2-3 rounds where the Jacobi engines take
    O(n0+n1+n2) iterations (tests pin equality).  `it` counts ROUNDS.
    srcs: (S,) flat source ids; S > 1 vmaps the round (the per-plane W
    stream is shared across the batch)."""
    shp = W.shape[1:]
    n = shp[0] * shp[1] * shp[2]
    srcs = jnp.atleast_1d(srcs).astype(jnp.int32)
    dist0 = (jnp.arange(n, dtype=jnp.int32)[None, :] == srcs[:, None])
    dist0 = jnp.where(dist0, jnp.zeros((), W.dtype),
                      jnp.asarray(jnp.inf, W.dtype)).reshape((S,) + shp)
    return _sweep_fix(dist0, W, scan_costs, tol, max_iters, axes, S, shifts)


@functools.partial(jax.jit, static_argnames=("max_iters", "axes", "S",
                                              "shifts"))
def _solve3d_sweep_init_jit(dist0, W, scan_costs, tol, max_iters: int,
                            axes: Tuple[int, ...] = (0, 1, 2),
                            S: int = 1, shifts=SHIFTS) -> Solve3DState:
    """Directional-sweep solve from an arbitrary (S,)+shape initial
    field (multi-seed restarts: staged reflections, multiphase legs)."""
    return _sweep_fix(dist0, W, scan_costs, tol, max_iters, axes, S, shifts)


def _sweep_fix(dist0, W, scan_costs, tol, max_iters: int,
               axes: Tuple[int, ...], S: int,
               shifts=SHIFTS) -> Solve3DState:
    layouts = {a: _sweep_layout3d(W, scan_costs, a) for a in axes}

    def round_one(d):
        for a in axes:
            d = _plane_sweep3d(d, layouts[a], a, True, shifts=shifts)
            d = _plane_sweep3d(d, layouts[a], a, False, shifts=shifts)
        return d

    def body(s: Solve3DState):
        d = jax.vmap(round_one)(s.dist) if S > 1 else \
            round_one(s.dist[0])[None]
        changed = jnp.any(d < s.dist - tol)
        return Solve3DState(d, changed, s.it + 1)

    def cond(s: Solve3DState):
        return s.changed & (s.it < max_iters)

    return jax.lax.while_loop(
        cond, body, Solve3DState(dist0, jnp.asarray(True),
                                 jnp.zeros((), jnp.int32)))


@functools.partial(jax.jit, static_argnames=("max_iters", "scan_every",
                                              "shifts"))
def _solve3d_jit(src, W, scan_costs, tol, max_iters: int, scan_every: int,
                 shifts=SHIFTS) -> Solve3DState:
    """src: flat source node id (scalar).  The initial field is built on
    device (the 4 MB dist0 upload costs ~35 ms over the axon tunnel)."""
    shp = W.shape[1:]
    n = shp[0] * shp[1] * shp[2]
    dist0 = jnp.where(jnp.arange(n, dtype=jnp.int32) == src.astype(jnp.int32),
                      jnp.zeros((), W.dtype),
                      jnp.asarray(jnp.inf, W.dtype)).reshape(shp)
    state = Solve3DState(dist0, jnp.asarray(True), jnp.zeros((), jnp.int32))

    def scans(d):
        for axis, (cf, cb) in enumerate(scan_costs):
            d = _axis_scan(d, cf, cb, axis)
        return d

    def cond(s: Solve3DState):
        return s.changed & (s.it < max_iters)

    def body(s: Solve3DState):
        d = s.dist
        if scan_every == 1:
            d = scans(d)
        elif scan_every > 1:
            d = jax.lax.cond(s.it % scan_every == 0, scans, lambda x: x, d)
        d = _sweep(d, W, shifts)
        changed = jnp.any(d < s.dist - tol)
        return Solve3DState(d, changed, s.it + 1)

    return jax.lax.while_loop(cond, body, state)


class Packed3D(NamedTuple):
    W_np: np.ndarray    # host (26, n2, n1, n0); uploaded lazily per engine
    scan_costs: tuple
    shape: Tuple[int, int, int]
    plan: object        # ops.sweep3d.Sweep3DPlan (static layout)
    dcache: dict        # lazy device uploads: 'W' (xla) / 'W4' (pallas) -
                        # each engine pins only its own ~109 MB layout
    shifts: tuple = SHIFTS   # the stencil (star-1 default; shifts_star(k))


def prepare3d(gr: Grid3D, U: np.ndarray,
              config: SolverConfig = DEFAULT_SOLVER_CONFIG,
              star: int = 1) -> Packed3D:
    """Precompute arrays for repeated solve3d calls.  star >= 2 widens
    the stencil (shifts_star) to cut the angular discretisation bias;
    the Pallas kernel plan is star-1-only, so wider stencils route to
    the sweep/xla engines."""
    shifts = shifts_star(star)
    dtype = np.dtype(config.dtype)
    W = _shifted_weights(gr, U, dtype, shifts)
    # axis scans: axis 0 = k (r), 1 = j (phi), 2 = i (theta);
    # forward cost entering t from t-1 = weight of shift -1 along that axis
    def shift_w(dk, dj, di):
        return jnp.asarray(W[shifts.index((dk, dj, di))])

    scan_costs = (
        (shift_w(-1, 0, 0), shift_w(1, 0, 0)),
        (shift_w(0, -1, 0), shift_w(0, 1, 0)),
        (shift_w(0, 0, -1), shift_w(0, 0, 1)),
    )
    n0, n1, n2 = gr.nnods
    if star == 1:
        from ..ops.sweep3d import plan_sweep3d

        plan = plan_sweep3d(W)
    else:
        plan = None
    return Packed3D(W_np=W, scan_costs=scan_costs,
                    shape=(n2, n1, n0), plan=plan, dcache={},
                    shifts=shifts)


def _kernel_vmem_bytes(plan, itemsize: int, S: int = 1) -> int:
    """Rough VMEM footprint of the sweep3d kernel: ping-pong scratch
    (per source in the batched kernel) + double-buffered W slab +
    in/out blocks + the 27 slab/tap statement temps per block."""
    G = plan.H8 + plan.NB * plan.BR + plan.H8
    blk = plan.BR * plan.L0
    return itemsize * (S * 2 * G * plan.L0    # ping-pong pages
                       + 2 * 26 * blk         # W4 block, double-buffered
                       + 4 * blk              # din/out blocks, buffered
                       + 27 * blk)            # slab + tap temps


def _auto_source_batch(plan, itemsize: int, nsources: int) -> int:
    """Largest source-group size (<= 8) whose kernel VMEM estimate fits
    the 100 MB budget."""
    S = min(8, max(1, nsources))
    while S > 1 and _kernel_vmem_bytes(plan, itemsize, S) >= 100 * 2**20:
        S -= 1
    return S


@functools.partial(jax.jit, static_argnames=("statics", "max_iters",
                                             "scan_every", "sweeps",
                                             "interpret"))
def _solve3d_kernel_jit(src, W4, scan_costs, tol, statics,
                        max_iters: int, scan_every: int,
                        sweeps: int, interpret: bool):
    """while_loop around the Pallas T-sweep kernel (ops/sweep3d.py).

    Scans (when enabled) run at the XLA level between dispatches, i.e. at
    `sweeps`-granularity: every max(scan_every, sweeps) iterations."""
    from ..ops.sweep3d import sweep3d_T

    n1, BR, NB, L0, H8, shape = statics
    n2, _, n0 = shape
    rows = n2 * n1
    dtype = W4.dtype
    flat0 = jnp.full((NB * BR, L0), jnp.inf, dtype)
    k = src.astype(jnp.int32) // n0
    i = src.astype(jnp.int32) % n0
    flat0 = flat0.at[k, i].set(0.0)

    def scans(f):
        d = f[:rows, :n0].reshape(shape)
        for axis, (cf, cb) in enumerate(scan_costs):
            d = _axis_scan(d, cf, cb, axis)
        return f.at[:rows, :n0].set(d.reshape(rows, n0))

    def cond(s: Solve3DState):
        return s.changed & (s.it < max_iters)

    def body(s: Solve3DState):
        f = s.dist
        if scan_every > 0:
            # fire at the first dispatch boundary at/after each multiple
            # of scan_every (it advances in `sweeps` steps)
            f = jax.lax.cond(s.it % max(scan_every, sweeps) < sweeps,
                             scans, lambda x: x, f)
        f = sweep3d_T(f, W4, n1, BR, NB, L0, H8, sweeps, interpret)
        changed = jnp.any(f < s.dist - tol)
        return Solve3DState(f, changed, s.it + sweeps)

    out = jax.lax.while_loop(cond, body,
                             Solve3DState(flat0, jnp.asarray(True),
                                          jnp.zeros((), jnp.int32)))
    return Solve3DState(out.dist[:rows, :n0].reshape(shape),
                        out.changed, out.it)


@functools.partial(jax.jit, static_argnames=("statics", "max_iters",
                                             "scan_every", "sweeps", "S",
                                             "interpret"))
def _solve3d_kernel_batched_jit(srcs, W4, scan_costs, tol, statics,
                                max_iters: int, scan_every: int,
                                sweeps: int, S: int, interpret: bool):
    """S sources per dispatch through the batched sweep kernel: the
    109 MB/sweep weight stream is read once per sweep for the whole
    group (ops/sweep3d.py), so per-source device cost drops ~1/S.  The
    group iterates until the LAST source converges (same fixpoint per
    source; label-correcting extra sweeps are no-ops)."""
    from ..ops.sweep3d import sweep3d_T_batched

    n1, BR, NB, L0, H8, shape = statics
    n2, _, n0 = shape
    rows = n2 * n1
    dtype = W4.dtype
    flat0 = jnp.full((S, NB * BR, L0), jnp.inf, dtype)
    srcs = srcs.astype(jnp.int32)
    k = srcs // n0
    i = srcs % n0
    flat0 = flat0.at[jnp.arange(S), k, i].set(0.0)

    def scans_one(d3):
        for axis, (cf, cb) in enumerate(scan_costs):
            d3 = _axis_scan(d3, cf, cb, axis)
        return d3

    def scans(f):
        d = f[:, :rows, :n0].reshape((S,) + shape)
        d = jax.vmap(scans_one)(d)
        return f.at[:, :rows, :n0].set(d.reshape(S, rows, n0))

    def cond(s: Solve3DState):
        return s.changed & (s.it < max_iters)

    def body(s: Solve3DState):
        f = s.dist
        if scan_every > 0:
            f = jax.lax.cond(s.it % max(scan_every, sweeps) < sweeps,
                             scans, lambda x: x, f)
        f = sweep3d_T_batched(f, W4, n1, BR, NB, L0, H8, sweeps, interpret)
        changed = jnp.any(f < s.dist - tol)
        return Solve3DState(f, changed, s.it + sweeps)

    out = jax.lax.while_loop(cond, body,
                             Solve3DState(flat0, jnp.asarray(True),
                                          jnp.zeros((), jnp.int32)))
    return Solve3DState(out.dist[:, :rows, :n0].reshape((S,) + shape),
                        out.changed, out.it)


@jax.jit
def _gather3d_it_batched(dist, it, idx):
    """(S, n_receivers + 1): receiver values per source with the group
    iteration count appended to every row - ONE array, ONE pull per
    source group."""
    S = dist.shape[0]
    vals = dist.reshape(S, -1)[:, idx]
    itcol = jnp.broadcast_to(it.astype(vals.dtype), (S, 1))
    return jnp.concatenate([vals, itcol], axis=1)


@jax.jit
def _flat3d_it_batched(dist, it):
    S = dist.shape[0]
    flat = dist.reshape(S, -1)
    itcol = jnp.broadcast_to(it.astype(flat.dtype), (S, 1))
    return jnp.concatenate([flat, itcol], axis=1)


@jax.jit
def _gather3d_it(dist, it, idx):
    """Receiver values with the iteration count appended - ONE array,
    ONE pull per source (a separate scalar `int(st.it)` fetch costs a
    full extra ~28 ms tunnel round trip; this halved 3-D table
    wall-clock at 64 sources)."""
    vals = dist.reshape(-1)[idx]
    return jnp.concatenate([vals, it.astype(vals.dtype)[None]])


@jax.jit
def _flat3d_it(dist, it):
    flat = dist.reshape(-1)
    return jnp.concatenate([flat, it.astype(flat.dtype)[None]])


@functools.partial(jax.jit, static_argnames=("shifts",))
def _neighbour_argmin(dist3, W, shifts):
    """(best, prev, ids): per node the neighbour attaining
    min_s dist[nbr_s] + W[s] (the fixpoint condition; ties by first
    shift).  Shared by the plain and stage-seeded prev recoveries."""
    shape = dist3.shape
    ids = jnp.arange(dist3.size, dtype=jnp.int32).reshape(shape)
    best = jnp.full(shape, jnp.inf, dist3.dtype)
    prev = ids
    for s, (dk, dj, di) in enumerate(shifts):
        cand = jnp.roll(dist3, (-dk, -dj, -di), axis=(0, 1, 2)) + W[s]
        nid = jnp.roll(ids, (-dk, -dj, -di), axis=(0, 1, 2))
        take = cand < best
        best = jnp.where(take, cand, best)
        prev = jnp.where(take, nid, prev)
    return best, prev, ids


def _prev3d_jit(dist3, W, src, shifts=SHIFTS):
    """Predecessor tree from a converged field (neighbour argmin).
    Source and unreachable nodes point to themselves."""
    best, prev, ids = _neighbour_argmin(dist3, W, shifts)
    prev = jnp.where(jnp.isfinite(best), prev, ids)
    return prev.reshape(-1).at[src].set(src.astype(jnp.int32))


def recover_prev3d(gr: Grid3D, U: np.ndarray, dist, sources,
                   config: SolverConfig = DEFAULT_SOLVER_CONFIG,
                   _packed: Packed3D = None, star: int = 1):
    """(S, nnods) int32 predecessor trees for converged solve3d fields.

    The reference's 3-D Dijkstra keeps a prev dict and walks it
    (src/Dijsktra.jl:28-33, 73-78); here prev is recovered after the
    fact from the fixpoint condition in one device pass per source
    (26 static rolls + argmin), so the solvers never carry index state.
    Feed rows to `recontruct_path`/`backtrace_paths`/`path_sensitivity`
    (no halo in 3-D).  Every chosen edge has w > 0, so backtraces
    strictly descend and terminate at the source."""
    packed = _packed if _packed is not None else prepare3d(gr, U, config,
                                                           star=star)
    if "W" not in packed.dcache:
        packed.dcache["W"] = jnp.asarray(packed.W_np)
    W = packed.dcache["W"]
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int32))
    d = np.asarray(dist)
    if d.ndim == 1 or d.ndim == 3:
        d = d.reshape((1,) + packed.shape)
    else:
        d = d.reshape((len(sources),) + packed.shape)
    out = [
        _prev3d_jit(jnp.asarray(d[i]), W, jnp.asarray(sources[i]),
                    packed.shifts)
        for i in range(len(sources))
    ]
    return np.stack([np.asarray(p) for p in out])


def solve3d(
    gr: Grid3D,
    U: np.ndarray,
    sources: Sequence[int],
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    scan_every: int = None,
    receivers=None,
    engine: str = "auto",
    sweeps: int = 8,
    source_batch: int = 0,
    interpret: bool = False,
    _packed: Packed3D = None,
    star: int = 1,
) -> Tuple[np.ndarray, int]:
    """(S, nnods) distance fields on the structured 3-D grid; with
    `receivers` (node ids), (S, n_receivers) gathered on device — the
    full-field device->host pull (~4 MB/source at 1M nodes) never
    happens for table workloads.

    engine: 'pallas' = the multi-sweep VMEM-resident kernel
    (ops/sweep3d.py, `sweeps` relaxations per dispatch); 'xla' = the
    jnp roll sweep; 'sweep' = directional plane sweeps (Gauss-Seidel
    fast sweeping, ~2-3 rounds instead of O(n) Jacobi iterations;
    `iters` then counts rounds); 'auto' picks pallas on TPU.  Identical
    fixpoint.
    scan_every: axis-scan cadence in iterations (0 = never; None =
    engine default).  The scans only accelerate convergence (136 -> 152
    iterations without them at 1M nodes) but cost ~3.8 ms/firing per
    source and do NOT share the batched kernel's weight stream, so on
    the pallas engine they lose outright (64-source table: 9 ms/source
    without vs 51 with) - default 0 there, 8 on the XLA engine where
    the sweep itself is the expensive part.

    source_batch: sources per kernel dispatch on the pallas engine
    (0 = auto by VMEM estimate, typically 4 at 1M nodes; 1 = the
    single-source kernel).  Batched groups share one weight stream per
    sweep, so per-source device cost drops ~1/batch; the group runs
    until its last source converges (fixpoint per source unchanged).

    The star-0 stencil solve; star-1 graphs (element-neighbour expansion)
    fall back to the generic ELL solver (bfm.bfm3d).
    """
    packed = _packed if _packed is not None else prepare3d(gr, U, config,
                                                           star=star)
    shifts = packed.shifts
    shp = packed.shape
    dtype = np.dtype(config.dtype)
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    tol = jnp.asarray(config.tol_value(), dtype)
    ridx = (None if receivers is None
            else jnp.asarray(np.asarray(receivers, dtype=np.int32).ravel()))
    if sweeps < 1:
        raise ValueError("sweeps must be >= 1")
    if engine == "auto":
        import jax as _jax

        on_tpu = _jax.devices()[0].platform == "tpu"
        fits = (packed.plan is not None
                and _kernel_vmem_bytes(packed.plan, dtype.itemsize)
                < 100 * 2**20)
        engine = "pallas" if (on_tpu and fits) else (
            "xla" if len(shifts) == 26 else "sweep")
    if engine == "pallas" and packed.plan is None:
        raise ValueError("engine='pallas' supports the star-1 stencil "
                         "only; use engine='sweep' or 'xla' for star>=2")
    if scan_every is None:
        scan_every = 0 if engine == "pallas" else 8

    ncol = gr.nnods_total if receivers is None else len(ridx)
    out = np.empty((len(sources), ncol), dtype=dtype)
    # dispatch every source's solve asynchronously, sync once per source
    # only when materialising results (the tunnel round-trip latency
    # overlaps the next source's device work)
    pending = []
    plan = packed.plan
    statics = (None if plan is None else
               (plan.n1, plan.BR, plan.NB, plan.L0, plan.H8, packed.shape))
    # NOTE: not dcache.setdefault(key, jnp.asarray(...)) — setdefault
    # evaluates its default EAGERLY, which would dispatch the ~109 MB
    # weight upload on every call (~0.8 s over the tunnel) and discard
    # it.  This exact bug cost 6x on 3-D solves in round 3.
    key = "W4" if engine == "pallas" else "W"
    if key not in packed.dcache:
        packed.dcache[key] = jnp.asarray(
            packed.plan.W4 if engine == "pallas" else packed.W_np)
    Wdev = packed.dcache[key]
    if engine == "pallas":
        S = (source_batch if source_batch > 0
             else _auto_source_batch(plan, dtype.itemsize, len(sources)))
    elif engine == "sweep":
        S = max(1, min(source_batch, len(sources)))
        groups = [sources[lo:lo + S] for lo in range(0, len(sources), S)]
        for grp in groups:
            g_src = np.asarray(grp, dtype=np.int32)
            if len(g_src) < S:
                g_src = np.concatenate(
                    [g_src, np.full(S - len(g_src), g_src[-1], np.int32)])
            st = _solve3d_sweep_jit(g_src, Wdev, packed.scan_costs, tol,
                                    config.max_iters, (0, 1, 2), S,
                                    shifts)
            pending.append((len(grp),
                            _flat3d_it_batched(st.dist, st.it) if ridx is None
                            else _gather3d_it_batched(st.dist, st.it, ridx)))
        iters = 0
        si = 0
        for ngrp, vals_it in pending:
            arr = np.asarray(vals_it)
            out[si:si + ngrp] = arr[:ngrp, :-1]
            iters = max(iters, int(arr[0, -1]))
            si += ngrp
        return out, iters
    else:
        S = 1
    if S > 1:
        # flat id layout: theta fastest (grid3d.py:27)
        groups = [sources[lo:lo + S] for lo in range(0, len(sources), S)]
        for grp in groups:
            g_src = np.asarray(grp, dtype=np.int32)
            if len(g_src) < S:   # pad the tail group with its last source
                g_src = np.concatenate(
                    [g_src, np.full(S - len(g_src), g_src[-1], np.int32)])
            st = _solve3d_kernel_batched_jit(g_src, Wdev,
                                             packed.scan_costs, tol,
                                             statics, config.max_iters,
                                             scan_every, sweeps, S,
                                             interpret)
            pending.append((len(grp),
                            _flat3d_it_batched(st.dist, st.it) if ridx is None
                            else _gather3d_it_batched(st.dist, st.it, ridx)))
        iters = 0
        si = 0
        for ngrp, vals_it in pending:
            arr = np.asarray(vals_it)
            out[si:si + ngrp] = arr[:ngrp, :-1]
            iters = max(iters, int(arr[0, -1]))
            si += ngrp
        return out, iters
    for src in sources:
        # flat id layout: theta fastest (grid3d.py:27)
        if engine == "pallas":
            st = _solve3d_kernel_jit(np.int32(src), Wdev,
                                     packed.scan_costs, tol, statics,
                                     config.max_iters, scan_every,
                                     sweeps, interpret)
        else:
            st = _solve3d_jit(np.int32(src), Wdev, packed.scan_costs, tol,
                              config.max_iters, scan_every, shifts)
        pending.append(_flat3d_it(st.dist, st.it) if ridx is None
                       else _gather3d_it(st.dist, st.it, ridx))
    iters = 0
    for si, vals_it in enumerate(pending):
        arr = np.asarray(vals_it)
        out[si] = arr[:-1]
        iters = max(iters, int(arr[-1]))
    return out, iters


def mask_region3d(W: np.ndarray, keep: np.ndarray,
                  shifts=SHIFTS) -> np.ndarray:
    """Copy of the (26, n2, n1, n0) shifted weights with every edge
    touching a node OUTSIDE `keep` (dense (n2, n1, n0) bool) removed --
    the dense-lattice form of the 2-D phase machinery's stage masks
    (solvers/phases.py)."""
    Wm = np.array(W, copy=True)
    for s, (dk, dj, di) in enumerate(shifts):
        src_keep = np.roll(keep, (-dk, -dj, -di), axis=(0, 1, 2))
        Wm[s][~keep] = np.inf
        Wm[s][~src_keep] = np.inf
    return Wm


def solve3d_reflection(
    gr: Grid3D,
    U: np.ndarray,
    sources: Sequence[int],
    r_reflect: float,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    receivers=None,
    star: int = 1,
) -> Tuple[np.ndarray, int]:
    """Two-stage topside reflection on the 3-D grid (PcP for the CMB):
    stage A solves the region ABOVE the reflector from the sources;
    stage B restarts from the reflector-level field (every reflector
    node a seed at its stage-A time) and solves the same masked region
    -- T_PcP(x) = min_b [T_A(b) + T_B(b -> x)] over reflector nodes b.

    The 3-D counterpart of the 2-D staged PcP (solvers/phases.py,
    VERDICT r03 item 7); physically meaningful when `gr` was built with
    force_radii including `r_reflect` (sharp interface + side-aware
    velocities via `velocity3d`).  Returns ((S, n) times -- or (S,
    n_receivers) -- and the total sweep-round count).
    """
    dtype = np.dtype(config.dtype)
    shifts = shifts_star(star)
    shp3 = (gr.nnods[2], gr.nnods[1], gr.nnods[0])
    W = _shifted_weights(gr, U, dtype, shifts)
    keep = (gr.r >= r_reflect - 1e-6).reshape(shp3)
    Wm = jnp.asarray(mask_region3d(W, keep, shifts))
    scan_costs = _scan_costs_of(Wm, shifts)

    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    S = len(sources)
    tol = jnp.asarray(config.tol_value(), dtype)
    stA = _solve3d_sweep_jit(jnp.asarray(sources), Wm, scan_costs, tol,
                             config.max_iters, (0, 1, 2), S, shifts)

    lev = jnp.asarray((np.abs(gr.r - r_reflect) < 1e-6).reshape(shp3))
    inf = jnp.asarray(jnp.inf, dtype)
    d0B = jnp.where(lev[None], stA.dist, inf)
    stB = _solve3d_sweep_init_jit(d0B, Wm, scan_costs, tol,
                                  config.max_iters, (0, 1, 2), S, shifts)
    out = np.asarray(stB.dist.reshape(S, -1))
    if receivers is not None:
        out = out[:, np.asarray(receivers, dtype=np.int64).ravel()]
    return out, int(stA.it) + int(stB.it)


def _scan_costs_of(Wm, shifts=SHIFTS):
    def shift_w(dk, dj, di):
        return Wm[shifts.index((dk, dj, di))]

    return tuple(
        (shift_w(*a), shift_w(*b))
        for a, b in (((-1, 0, 0), (1, 0, 0)), ((0, -1, 0), (0, 1, 0)),
                     ((0, 0, -1), (0, 0, 1))))


def solve3d_converted(
    gr: Grid3D,
    U_down: np.ndarray,
    U_core: np.ndarray,
    sources: Sequence[int],
    r_boundary: float,
    U_up: Optional[np.ndarray] = None,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    receivers=None,
    star: int = 1,
) -> Tuple[np.ndarray, int]:
    """Three-stage boundary-converted core transit on the 3-D grid —
    the structured-lattice counterpart of the 2-D
    `solvers/phases.py::converted_travel_times` (SKS class with
    U_down = U_up = the Vs node field, U_core = Vp; PKP class all-Vp).

    `gr` must be twin-doubled at `r_boundary`
    (`grid3d(force_radii=[...])`): the boundary appears as the topside
    level at exactly r_boundary plus the underside twin one radial
    level below (r_boundary - twin_offset, carrying the below-side
    velocity via `velocity3d`).  Stage A solves the topside region
    (levels >= r_boundary) with U_down; the core stage seeds the
    UNDERSIDE twin plane from stage A's topside-plane times (the dense
    analogue of the 2-D halo-twin seeding — the twin-gap traversal
    ~twin_offset/v is forgiven, as the 2-D zero-cost merge forgives it)
    and solves the region below with U_core; stage B seeds the topside
    plane from the core field's underside plane and re-solves the
    topside region with U_up (default U_down).  Nodes outside the
    topside region return +inf in the final field.
    """
    dtype = np.dtype(config.dtype)
    shifts = shifts_star(star)
    shp3 = (gr.nnods[2], gr.nnods[1], gr.nnods[0])
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

    keep_top = (gr.r >= r_boundary - 1e-6).reshape(shp3)
    keep_core = (gr.r <= r_boundary - 1e-6).reshape(shp3)
    W_dn = jnp.asarray(mask_region3d(
        _shifted_weights(gr, U_down, dtype, shifts), keep_top, shifts))
    W_k = jnp.asarray(mask_region3d(
        _shifted_weights(gr, U_core, dtype, shifts), keep_core, shifts))
    W_up = W_dn if same_up else jnp.asarray(mask_region3d(
        _shifted_weights(gr, U_up, dtype, shifts), keep_top, shifts))
    sc_dn, sc_k = _scan_costs_of(W_dn, shifts), _scan_costs_of(W_k, shifts)
    sc_up = sc_dn if same_up else _scan_costs_of(W_up, shifts)

    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    S = len(sources)
    tol = jnp.asarray(config.tol_value(), dtype)
    inf = jnp.asarray(jnp.inf, dtype)

    stA = _solve3d_sweep_jit(jnp.asarray(sources), W_dn, sc_dn, tol,
                             config.max_iters, (0, 1, 2), S, shifts)
    d0K = jnp.full_like(stA.dist, inf).at[:, k_under].set(
        stA.dist[:, k_top])
    stK = _solve3d_sweep_init_jit(d0K, W_k, sc_k, tol,
                                  config.max_iters, (0, 1, 2), S, shifts)
    d0B = jnp.full_like(stK.dist, inf).at[:, k_top].set(
        jnp.minimum(stK.dist[:, k_under], stA.dist[:, k_top]))
    stB = _solve3d_sweep_init_jit(d0B, W_up, sc_up, tol,
                                  config.max_iters, (0, 1, 2), S, shifts)
    out = np.asarray(stB.dist.reshape(S, -1))
    if receivers is not None:
        out = out[:, np.asarray(receivers, dtype=np.int64).ravel()]
    return out, int(stA.it) + int(stK.it) + int(stB.it)


def composite_velocity3d(gr: Grid3D, r_boundary: float,
                         V_above, V_below) -> np.ndarray:
    """Node velocities of the COMPOSITE radial model: `V_above`
    interpolant for r >= r_boundary, `V_below` for r < r_boundary.

    A boundary-converted phase class (SKS: S mantle legs + P core leg)
    is exactly the Fermat first arrival of the composite model whose
    speed is Vs above the CMB and Vp below it - conversion at the
    crossing is Snell's law, which the continuous Fermat minimum
    enforces automatically.  Feed the result to `solve3d` (any star) or
    `refine3d_travel_times` for the bias-free bent time."""
    rr = np.asarray(gr.r, np.float64)
    above = rr >= r_boundary - 1e-9
    out = np.where(above, np.asarray(V_above(rr), np.float64),
                   np.asarray(V_below(rr), np.float64))
    return out


def refine3d_travel_times(
    gr: Grid3D,
    U: np.ndarray,
    source: int,
    receivers: Sequence[int],
    profile_r: np.ndarray,
    profile_v: np.ndarray,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    star: int = 2,
    m: int = 160,
    iters: int = 800,
    lr: float = 3.0,
    engine: str = "sweep",
    _packed: Packed3D = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Bias-free 3-D first arrivals: star-`star` SPM solve + prev
    recovery + batched bending refinement (VERDICT r04 item 3 - the 2-D
    cure of solvers/refine.py lifted to the lattice).

    The SPM stage only needs to land the polyline in the right phase
    class (its angular quantisation bias is then removed by the bend),
    so star=2 suffices; the bent time is a strict upper bound of the
    continuous Fermat minimum of (profile_r, profile_v) and lands
    within quadrature error of ray theory (tests/test_grid3d_disc.py
    pins <=1% vs the flat-earth anchor where SPM alone carried
    +3.4-5.2%).  For converted phases pass the composite velocities
    (`composite_velocity3d`) as both U and the profile.

    Returns (times, spm_times): the refined and the raw SPM arrival per
    receiver."""
    from .path import recontruct_path
    from .refine import refine_paths_batch

    packed = _packed if _packed is not None else prepare3d(gr, U, config,
                                                           star=star)
    dist, _ = solve3d(gr, U, [source], config, engine=engine,
                      _packed=packed)
    prev = recover_prev3d(gr, U, dist, [source], config, _packed=packed)[0]
    receivers = np.asarray(receivers, dtype=np.int64).ravel()
    spm_t = np.asarray(dist[0])[receivers]
    paths = [recontruct_path(prev, int(source), int(r_))
             for r_ in receivers]
    pts = [np.stack([gr.x[p], gr.y[p], gr.z[p]], axis=1) for p in paths]
    r_max = float(np.max(gr.r))
    _, t = refine_paths_batch(pts, profile_r, profile_v, m=m, iters=iters,
                              lr=lr, r_max=r_max)
    # bending is a descent from the SPM polyline: never worse
    return np.minimum(np.asarray(t), spm_t), spm_t


@functools.partial(jax.jit, static_argnames=("shifts",))
def _prev3d_seeded_jit(dist3, W, shifts=SHIFTS):
    """Stage-field predecessor tree: like _prev3d_jit, but a node whose
    best neighbour candidate cannot explain its own time (its value came
    from SEEDING - a stage handoff plane, not relaxation) points to
    itself, so backtraces stop at the stage boundary."""
    best, prev, ids = _neighbour_argmin(dist3, W, shifts)
    eps = jnp.asarray(1e-3, dist3.dtype)
    explained = jnp.isfinite(best) & (best <= dist3 * (1 + 1e-5) + eps)
    prev = jnp.where(explained, prev, ids)
    return prev.reshape(-1)


def converted3d_refined(
    gr: Grid3D,
    U_down: np.ndarray,
    U_core: np.ndarray,
    source: int,
    receivers: Sequence[int],
    r_boundary: float,
    profile_r: np.ndarray,
    profile_v_mantle: np.ndarray,
    profile_v_core: np.ndarray,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    star: int = 2,
    m: int = 192,
    iters: int = 800,
    lr: float = 3.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Bias-free 3-D converted-phase (SKS-class) first arrivals: staged
    star-`star` solve + per-stage path recovery + bending under the
    COMPOSITE radial profile (mantle speed above r_boundary, core speed
    below - Snell's law at the crossing emerges from the continuous
    Fermat minimum).  VERDICT r04 item 3: the staged star-1 solve
    carried +3.4-5.2% vs the tau-p anchor, star-2 +1.4-1.9%; the bent
    time lands within quadrature error (<=1%, pinned in
    tests/test_grid3d_disc.py).

    The initial polyline comes from the STAGED fields (stage prevs via
    `_prev3d_seeded_jit`, stage handoffs stitched through the twin
    planes), which pins the phase CLASS; a plain composite-velocity SPM
    solve would instead find interface-skimming paths whose graph edges
    mix the two side velocities (measured -2% vs the anchor).

    Returns (refined_times, spm_times) per receiver."""
    from .path import recontruct_path
    from .refine import refine_paths_batch

    dtype = np.dtype(config.dtype)
    shifts = shifts_star(star)
    shp3 = (gr.nnods[2], gr.nnods[1], gr.nnods[0])
    n0, n1 = gr.nnods[0], gr.nnods[1]
    r_ax = np.asarray(gr.r_ax)
    k_top = int(np.argmin(np.abs(r_ax - r_boundary)))
    k_under = k_top - 1

    keep_top = (gr.r >= r_boundary - 1e-6).reshape(shp3)
    keep_core = (gr.r <= r_boundary - 1e-6).reshape(shp3)
    W_dn = jnp.asarray(mask_region3d(
        _shifted_weights(gr, U_down, dtype, shifts), keep_top, shifts))
    W_k = jnp.asarray(mask_region3d(
        _shifted_weights(gr, U_core, dtype, shifts), keep_core, shifts))
    sc_dn = _scan_costs_of(W_dn, shifts)
    sc_k = _scan_costs_of(W_k, shifts)

    tol = jnp.asarray(config.tol_value(), dtype)
    inf = jnp.asarray(jnp.inf, dtype)
    src_a = jnp.asarray([int(source)])

    stA = _solve3d_sweep_jit(src_a, W_dn, sc_dn, tol, config.max_iters,
                             (0, 1, 2), 1, shifts)
    d0K = jnp.full_like(stA.dist, inf).at[:, k_under].set(
        stA.dist[:, k_top])
    stK = _solve3d_sweep_init_jit(d0K, W_k, sc_k, tol, config.max_iters,
                                  (0, 1, 2), 1, shifts)
    d0B = jnp.full_like(stK.dist, inf).at[:, k_top].set(
        stK.dist[:, k_under])
    stB = _solve3d_sweep_init_jit(d0B, W_dn, sc_dn, tol, config.max_iters,
                                  (0, 1, 2), 1, shifts)

    prevA = np.array(_prev3d_seeded_jit(stA.dist[0], W_dn, shifts))
    prevK = np.asarray(_prev3d_seeded_jit(stK.dist[0], W_k, shifts))
    prevB = np.asarray(_prev3d_seeded_jit(stB.dist[0], W_dn, shifts))
    prevA[int(source)] = int(source)
    dB = np.asarray(stB.dist[0]).reshape(-1)
    spm_t = dB[np.asarray(receivers, dtype=np.int64)]

    plane = n0 * n1                      # flat stride of one r-level

    def col_node(node, k):
        """Node id at r-level k in the same (phi, theta) column."""
        return int(node) % plane + k * plane

    paths = []
    for r_ in np.asarray(receivers, dtype=np.int64):
        pB = recontruct_path(prevB, -1, int(r_))   # walk to its seed
        pB = pB[:-1] if pB[-1] == -1 else pB       # (sentinel never hit)
        e_top = int(pB[-1])
        pK = recontruct_path(prevK, -1, col_node(e_top, k_under))
        pK = pK[:-1] if pK[-1] == -1 else pK
        s_under = int(pK[-1])
        pA = recontruct_path(prevA, int(source), col_node(s_under, k_top))
        nodes = np.concatenate([pB, pK, pA]).astype(np.int64)
        paths.append(np.stack([gr.x[nodes], gr.y[nodes], gr.z[nodes]],
                              axis=1))

    rs = np.asarray(profile_r, np.float64)
    v_comp = np.where(rs >= r_boundary,
                      np.asarray(profile_v_mantle, np.float64),
                      np.asarray(profile_v_core, np.float64))
    _, t = refine_paths_batch(paths, rs, v_comp, m=m, iters=iters, lr=lr,
                              r_max=float(np.max(gr.r)))
    return np.asarray(t), spm_t
