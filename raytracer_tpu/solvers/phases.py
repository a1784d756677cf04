"""Named seismic phases on top of the staged masked solver.

The reference scaffolds a phase library
(/root/reference/src/multiphase/library.jl:9-31) on top of its ms /
multiphase sweeps (src/SSSP/bfm_new_ms.jl:30-138) but never delivers a
working named-phase API - the library is dead code and the sweeps run
only the first/last partition levels.  This module finishes the idea on
the circulant fast path:

  P / S     direct first arrival (plain solve; wave picks Vp/Vs)
  PcP / ScS reflection at the core-mantle boundary: leg 1 solves the
            SSSP restricted to the mantle region (nodes above the CMB,
            boundary included), leg 2 keeps only the CMB boundary
            values and re-solves the same region - the up-leg takes the
            min over all reflection points automatically, which is the
            first-arrival reflected branch
  PP        single surface reflection, composed from two direct-P
            fields by reciprocity: the Fermat-minimax bounce -
            PP(s, r) = max over minor-arc surface bounce points b of
            t_s(b) + t_r(b) (the stationary point is a maximum along
            the bounce path; a min would collapse to direct P)

Validated against the independent classical ray-theory reflected branch
(models/raytheory.py::reflected_arrival) in tests/test_phases.py and
benchmarks/accuracy.py.

Region masks piggyback on the radial partition (models/partition.py):
a phase leg's region is "every layer above reflector k plus boundaries
1..k", which - like the ms level masks - depends only on radius and so
collapses to a per-slot lane mask of the circulant layout.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import scipy.sparse as sp

from ..config import DEFAULT_SOLVER_CONFIG, R, SolverConfig
from ..models.partition import partition_grid
from .types import BellmanFordMoore

# reflector name -> boundary index in DISCONTINUITY_RADII (1-based)
REFLECTORS = {"cmb": 7, "660": 5, "410": 4, "moho": 2}


def _region_mask_above(partition, k: int) -> np.ndarray:
    """Nodes in layers 1..k and on boundaries 1..k (the region a ray may
    traverse before reflecting at boundary k)."""
    return ((partition.layer_of >= 1) & (partition.layer_of <= k)) | \
           ((partition.boundary_of >= 1) & (partition.boundary_of <= k))


def _region_mask_below(partition, k: int) -> np.ndarray:
    """Nodes strictly below boundary k: layers k+1.. plus boundaries
    k+1.. — the interior of a transmitted (core) leg.  The boundary-k
    nodes themselves are deliberately EXCLUDED from updating: they sit
    on the topside of the discontinuity and carry topside velocities,
    so letting them relax inside the core stage would fabricate fast
    creep paths riding the mantle side of the interface.  Their twins
    (offset below, carrying underside velocities) are in layer k+1 by
    radius, and the per-iteration unmasked halo min-merge moves values
    across the interface in both directions."""
    return (partition.layer_of > k) | (partition.boundary_of > k)


def _phase_setup(A, halo, gr, U, k: int, config, _reuse=None,
                 engine: str = "stream"):
    from ..ops.circulant import build_circulant
    from ..ops.stream_t import _stream_tables, masked_stream_tables
    from ..ops.wrapped_t import pack_twrapped_stencil
    from .multiphase import _halo_slot_map, _lane_mask_of

    # key carries a light content fingerprint of U so one reuse dict can
    # serve several phases (PcP with Vp then ScS with Vs; a U-blind key
    # would silently reuse the wrong weight pack)
    Ua = np.asarray(U)
    fp = (Ua.shape, float(Ua[:: max(1, Ua.size // 16)].sum()))
    key = ("phase_setup", k, engine, fp)
    if _reuse is not None and key in _reuse:
        return _reuse[key]
    partition = partition_grid(gr)
    dtype = np.dtype(config.dtype)
    cg = build_circulant(gr, A, halo, U, dtype=dtype)
    ws = pack_twrapped_stencil(cg, dtype=dtype, band_closure=0)
    halo_map = _halo_slot_map(cg, ws, halo)
    region = _region_mask_above(partition, k)
    lane = _lane_mask_of(cg, ws, region)
    cen_on = cg.cmap.center >= 0 and bool(region[cg.cmap.center])
    if engine == "sweep":
        from ..ops.sweep_theta import pack_rsweep_tables, pack_sweep_tables

        tbl, _ = pack_sweep_tables(ws, cg, dtype, slot_mask=lane[: ws.Mp],
                                   cen_on=cen_on)
        (wdn, wup), _ = pack_rsweep_tables(ws, cg, dtype,
                                           slot_mask=lane[: ws.Mp])
        static, tables = None, (tbl, wdn, wup)
    else:
        _, static = _stream_tables(ws, dtype)
        tables = masked_stream_tables(ws, lane[: ws.Mp], cen_on, dtype)
    bmask = partition.boundary_of == k
    keep = _lane_mask_of(cg, ws, bmask)
    out = (cg, ws, static, tables, lane, keep, halo_map)
    if _reuse is not None:
        _reuse[key] = out
    return out


def _phase_stages(static, tables, lane, keep, halo_map, engine: str,
                  reflected: bool):
    """Stage list for one region leg (or the two-leg reflected solve) on
    either staged engine."""
    if engine == "sweep":
        from ..ops.sweep_theta import SweepStageSpec

        tbl, wdn, wup = tables
        stages = [SweepStageSpec(tables=tbl, wtab_dn=wdn, wtab_up=wup,
                                 halo_map=halo_map)]
        if reflected:
            stages.append(SweepStageSpec(tables=tbl, wtab_dn=wdn,
                                         wtab_up=wup, reset_keep=keep,
                                         cen_keep=False,
                                         halo_map=halo_map))
        return stages
    from ..ops.stream_t import StageSpec

    stages = [StageSpec(tables=tables, static=static, sel_mask=lane,
                        halo_map=halo_map)]
    if reflected:
        stages.append(StageSpec(tables=tables, static=static,
                                sel_mask=lane, reset_keep=keep,
                                cen_keep=False, halo_map=halo_map))
    return stages


def _staged_solve(cg, ws, stages, source, config, interpret, engine):
    if engine == "sweep":
        from ..ops.sweep_theta import solve_sweep_staged

        return solve_sweep_staged(cg, ws, stages, [source], config,
                                  interpret=interpret)
    from ..ops.stream_t import solve_stream_staged

    return solve_stream_staged(cg, ws, stages, [source], config,
                               interpret=interpret)


def region_travel_times(
    A: sp.csr_matrix,
    halo: np.ndarray,
    source: int,
    gr,
    U: np.ndarray,
    reflector: str = "cmb",
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    interpret: bool = False,
    _reuse: Optional[dict] = None,
    engine: str = "stream",
) -> np.ndarray:
    """(n,) single-leg field: SSSP restricted to the region above the
    reflector (the 'down leg' primitive; reflected_travel_times composes
    two of these through the boundary restart).  Used by the tests to
    cross-check the staged solve by reciprocity:
    PcP(s, r) = min over boundary nodes b of leg_s[b] + leg_r[b].
    engine='sweep' runs the directional-sweep staged solver (~3-4
    rounds per stage); 'stream' the streamed Jacobi staged solver."""
    k = REFLECTORS[reflector.lower()]
    cg, ws, static, tables, lane, keep, halo_map = _phase_setup(
        A, halo, gr, U, k, config, _reuse=_reuse, engine=engine)
    stages = _phase_stages(static, tables, lane, keep, halo_map, engine,
                           reflected=False)
    dist, _ = _staged_solve(cg, ws, stages, source, config, interpret,
                            engine)
    return dist[0]


def reflected_travel_times(
    A: sp.csr_matrix,
    halo: np.ndarray,
    source: int,
    gr,
    U: np.ndarray,
    reflector: str = "cmb",
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    interpret: bool = False,
    _reuse: Optional[dict] = None,
    engine: str = "stream",
) -> np.ndarray:
    """(n,) first-arrival times of the branch reflected at `reflector`
    (PcP with U = Vp, ScS with U = Vs).  Two region-masked stages in one
    device dispatch; nodes outside the region return +inf.  Pass a dict
    as `_reuse` to amortise the one-time circulant pack (~3 s host) over
    repeated solves (~0.1 s each).  engine='sweep' runs the
    directional-sweep staged solver (~3-4 rounds per stage)."""
    k = REFLECTORS[reflector.lower()]
    cg, ws, static, tables, lane, keep, halo_map = _phase_setup(
        A, halo, gr, U, k, config, _reuse=_reuse, engine=engine)
    stages = _phase_stages(static, tables, lane, keep, halo_map, engine,
                           reflected=True)
    dist, _ = _staged_solve(cg, ws, stages, source, config, interpret,
                            engine)
    return dist[0]


def converted_travel_times(
    A: sp.csr_matrix,
    halo: np.ndarray,
    source: int,
    gr,
    U_down: np.ndarray,
    U_core: np.ndarray,
    U_up: Optional[np.ndarray] = None,
    reflector: str = "cmb",
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    interpret: bool = False,
    _reuse: Optional[dict] = None,
    engine: str = "stream",
) -> np.ndarray:
    """(n,) first arrivals of the boundary-converted core class: a
    three-stage solve with PER-STAGE velocity packs — down leg above
    `reflector` with U_down, transmitted leg below it with U_core, up
    leg with U_up (default U_down).  (Vs, Vp, Vs) is the SKS class,
    (Vp, Vp, Vp) the PKP class (the core region includes the inner
    core, so PKIKP rides the same solve), (Vs, Vp, Vp) SKP.

    Semantics — the kinematic first arrival of the whole
    boundary-touching class of the leg waves: the boundary restart
    keeps the boundary values across stages and the core leg may be
    degenerate (a boundary node keeps its own down-leg time), so the
    field is min(reflection, topside interface diffraction, converted
    core transit).  For the wave-converted classes this is the new
    capability: SKS overtakes every topside-S path beyond ~85 deg (the
    classical SKS/S crossover), so the surface field there IS SKS —
    validated against models/flatearth.py::converted_first_arrival in
    tests/test_converted.py.  For all-P legs the topside CMB creep
    (Pdiff) is kinematically first at every distance (its branch line
    is tangent to direct P and PKIKP(180) sits ~25 s above it), so
    'PKP' adds nothing over the plain solve's own first arrival — the
    alias exists for completeness and returns the class min honestly.
    Like `reflected_travel_times`, nodes outside the up-leg region
    (core interior) return +inf in the final field.

    Mechanics: the core stage masks the topside boundary nodes from
    updating (their topside velocities would fabricate mantle-speed
    creep inside the core; `_region_mask_below`), and its boundary
    restart keeps the underside TWINS as well as the originals —
    `constrain2layers` removes every direct topside-core edge, so the
    twins (equal to their originals after stage 1's per-iteration halo
    min-merge) are the only seeds the core stage can see.  Conversion
    is thus exactly the discontinuity machinery of the plain solve.

    The reference has no converted-phase capability at all (its phase
    library src/multiphase/library.jl:9-31 is dead code); this is a
    capability extension built from the staged machinery.
    """
    from ..ops.circulant import build_circulant
    from ..ops.stream_t import _stream_tables, masked_stream_tables
    from ..ops.wrapped_t import pack_twrapped_stencil
    from .multiphase import _halo_slot_map, _lane_mask_of

    k = REFLECTORS[reflector.lower()]
    dtype = np.dtype(config.dtype)
    same_up = U_up is None or U_up is U_down
    partition = partition_grid(gr)

    def _pack(tag, U):
        # _reuse key carries a light content fingerprint of U so one
        # reuse dict can serve several phases (SKS then PKP swaps the
        # down-leg table; a tag-only key would silently reuse the wrong
        # weights)
        Ua = np.asarray(U)
        fp = (Ua.shape, float(Ua[:: max(1, Ua.size // 16)].sum()))
        key = ("conv_pack", tag, fp)
        if _reuse is not None and key in _reuse:
            return _reuse[key]
        cg = build_circulant(gr, A, halo, U, dtype=dtype)
        ws = pack_twrapped_stencil(cg, dtype=dtype, band_closure=0)
        out = (cg, ws)
        if _reuse is not None:
            _reuse[key] = out
        return out

    cg1, ws1 = _pack("down", U_down)
    cgk, wsk = _pack("core", U_core)
    cg3, ws3 = (cg1, ws1) if same_up else _pack("up", U_up)
    if not (ws1.Mp == wsk.Mp == ws3.Mp and ws1.ML == wsk.ML == ws3.ML):
        raise AssertionError("per-leg circulant packs disagree in layout "
                             "(same graph must give same Mp/ML)")

    halo_map = _halo_slot_map(cg1, ws1, halo)
    region_up = _region_mask_above(partition, k)
    region_dn = _region_mask_below(partition, k)
    lane_up = _lane_mask_of(cg1, ws1, region_up)
    lane_dn = _lane_mask_of(cg1, ws1, region_dn)
    orig = partition.boundary_of == k
    # the underside twins of boundary k: `constrain2layers` removes all
    # direct edges between the topside originals and the region below,
    # so the core stage can only be seeded THROUGH the twins (which
    # hold the merged down-leg times at end of stage 1: the per-
    # iteration halo min-merge keeps them equal to their originals).
    # The boundary restart before the core stage must therefore keep
    # the twins too, or the stage sees no finite neighbour anywhere and
    # converges to an all-inf no-op.
    twin = np.zeros_like(orig)
    ha, hb = halo[:, 0], halo[:, 1]
    twin[hb[orig[ha]]] = True
    twin[ha[orig[hb]]] = True
    keep = _lane_mask_of(cg1, ws1, orig)
    keep_dn = _lane_mask_of(cg1, ws1, orig | twin)
    cen = cg1.cmap.center
    cen_up = cen >= 0 and bool(region_up[cen])
    cen_dn = cen >= 0 and bool(region_dn[cen])

    if engine == "sweep":
        from ..ops.sweep_theta import (SweepStageSpec, pack_rsweep_tables,
                                       pack_sweep_tables)

        def _stage(ws_, cg_, lane, cen_on, **kw):
            tbl, _ = pack_sweep_tables(ws_, cg_, dtype,
                                       slot_mask=lane[: ws_.Mp],
                                       cen_on=cen_on)
            (wdn, wup), _ = pack_rsweep_tables(ws_, cg_, dtype,
                                               slot_mask=lane[: ws_.Mp])
            return SweepStageSpec(tables=tbl, wtab_dn=wdn, wtab_up=wup,
                                  halo_map=halo_map, **kw)
    else:
        from ..ops.stream_t import StageSpec

        def _stage(ws_, cg_, lane, cen_on, **kw):
            _, static = _stream_tables(ws_, dtype)
            tables = masked_stream_tables(ws_, lane[: ws_.Mp], cen_on,
                                          dtype)
            return StageSpec(tables=tables, static=static,
                             sel_mask=lane, halo_map=halo_map, **kw)

    stages = [
        _stage(ws1, cg1, lane_up, cen_up),
        _stage(wsk, cgk, lane_dn, cen_dn, reset_keep=keep_dn,
               cen_keep=False),
        _stage(ws3, cg3, lane_up, cen_up, reset_keep=keep,
               cen_keep=False),
    ]
    dist, _ = _staged_solve(cg1, ws1, stages, source, config, interpret,
                            engine)
    return dist[0]


def pp_travel_times(
    t_src: np.ndarray,
    t_rcv: np.ndarray,
    gr,
    src: int,
    rcv: int,
) -> float:
    """PP time from two direct-P SURFACE fields by reciprocity.

    The classical PP bounce point is a STATIONARY point of
    f(b) = t_src[b] + t_rcv[b] that is a maximum along the bounce path
    (Fermat minimax: d/db f = p_src - p_rcv = 0 at the minor-arc
    midpoint, and dp/dDelta < 0 makes it a maximum there) - minimising f
    would collapse toward the direct arrival as b approaches either
    endpoint.  So: evaluate f over surface bounce points on the minor
    arc strictly between source and receiver and take the maximum."""
    rr = np.asarray(gr.r)
    surf = np.flatnonzero(rr == rr.max())
    th = np.mod(np.asarray(gr.theta)[surf], 2 * np.pi)
    ts = float(np.mod(gr.theta[src], 2 * np.pi))
    tr = float(np.mod(gr.theta[rcv], 2 * np.pi))
    span = np.mod(tr - ts, 2 * np.pi)
    if span > np.pi:      # minor arc runs the other way
        ts, tr = tr, ts
        span = 2 * np.pi - span
    rel = np.mod(th - ts, 2 * np.pi)
    eps = 1e-9
    ok = (rel > eps) & (rel < span - eps)
    cand = t_src[surf[ok]] + t_rcv[surf[ok]]
    cand = cand[np.isfinite(cand)]
    return float(np.max(cand)) if len(cand) else float("inf")


def depth_phase_travel_times(
    A: sp.csr_matrix,
    halo: np.ndarray,
    source: int,
    gr,
    U_up: np.ndarray,
    U_main: np.ndarray,
    receivers: Sequence[int],
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    interpret: bool = False,
) -> np.ndarray:
    """Free-surface depth phases (pP / sP / sS / pS) on the SPM graph.

    A depth phase is an up-going leg from the buried source (wave speed
    `U_up`: Vp for pP/pS, Vs for sP/sS) reflected at the free surface
    into a full main branch (`U_main`).  Composition by reciprocity
    over surface bounce points b:  f(b) = t_up[source->b] +
    t_main[b->receiver], the second field solved FROM the receiver
    (the graph is undirected with symmetric weights).

    Unlike PP - whose Fermat bounce is the minor-arc MAXIMUM of the
    composition (`pp_travel_times`) - a depth phase's bounce is an
    interior LOCAL MINIMUM of f along the surface ring: moving the
    bounce from the epicentre toward the receiver first shortens the
    path (the up leg tilts onto the geometric depth-phase ray), then
    lengthens it up the PP-like midpoint hump, then collapses into the
    direct arrival at the receiver itself.  So: scan the cyclic ring,
    reject the receiver's own node (the collapsed direct arrival), and
    return the smallest interior cyclic local minimum - the earliest
    depth-phase arrival, pinned against the independent tau-p anchor
    (models/flatearth.py::depth_phase_first_arrival) in
    tests/test_depth_phases.py.  The reference has no depth-phase
    capability (its phase library src/multiphase/library.jl:9-31 is
    dead code).  Returns one time per receiver; inf when no interior
    local minimum exists (e.g. a surface source, where the depth phase
    merges into the direct arrival).
    """
    from .api import AnnulusSolver

    method = "circulant" if interpret else "auto"
    solver_up = AnnulusSolver(gr, A, halo, U_up, config, method=method)
    t_src = np.asarray(solver_up.solve(source, want_prev=False).dist)
    same_U = U_main is U_up or np.shares_memory(U_main, U_up)
    solver_main = solver_up if same_U else AnnulusSolver(
        gr, A, halo, U_main, config, method=method)

    rr = np.asarray(gr.r)
    surf = np.flatnonzero(rr == rr.max())
    order = np.argsort(np.mod(np.asarray(gr.theta)[surf], 2 * np.pi))
    surf = surf[order]
    f_src = t_src[surf]

    out = np.empty(len(receivers))
    for j, r_ in enumerate(np.asarray(receivers)):
        t_rcv = np.asarray(
            solver_main.solve(int(r_), want_prev=False).dist)
        f = f_src + t_rcv[surf]
        fl = np.roll(f, 1)
        fr = np.roll(f, -1)
        is_min = (np.isfinite(f) & (f <= fl) & (f <= fr)
                  & ((f < fl) | (f < fr)))
        # degenerate collapses: the receiver's own node (direct-arrival
        # collapse) and the source's own node when the source sits on
        # the surface (f(source)=direct arrival, documented to return
        # inf).  Spurious f32-noise "minima" on the monotone slope
        # collapsing into the receiver hover a hair above the direct
        # arrival - reject by a margin floor rather than masking the
        # receiver's ring neighbours, which at short epicentral
        # distances would suppress a GENUINE bounce point sitting 1-2
        # surface nodes away (a real pP is strictly later than the
        # direct arrival by >= the two-way leg above the source, far
        # above the margin at any resolvable source depth).
        is_min[surf == int(r_)] = False
        is_min[surf == int(source)] = False
        f_direct = max(float(t_src[int(r_)]), float(t_rcv[int(source)]))
        is_min &= f > f_direct + max(0.05, 1e-4 * f_direct)
        out[j] = float(np.min(f[is_min])) if is_min.any() else np.inf
    return out


def phase_travel_times(
    A: sp.csr_matrix,
    halo: np.ndarray,
    source: int,
    gr,
    U: np.ndarray,
    phase: str = "P",
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    receivers: Optional[Sequence[int]] = None,
    interpret: bool = False,
    Us: Optional[np.ndarray] = None,
    _reuse: Optional[dict] = None,
    engine: str = "stream",
) -> np.ndarray:
    """First-arrival times of a named phase at `receivers` (or all
    nodes).  U must carry the matching wave speed (Vp for P phases, Vs
    for S phases).  For the converted core phases U is the P-speed
    table and `Us` (required when the phase has an S leg) the S-speed
    table.  Pass one dict as `_reuse` across calls to amortise the
    circulant packs (keys carry a U fingerprint, so mixed Vp/Vs phase
    batches are safe).

    'P'/'S'     -> plain solve (AnnulusSolver fast path)
    'Pdiff'/'Sdiff' -> the same field: an SPM first-arrival graph path
                   naturally creeps along the core-mantle boundary, so
                   beyond the direct-P shadow (~100 deg) the surface
                   first arrival IS the diffracted branch (the 150-deg
                   anchor ~1051 s matches AK135 Pdiff; ACCURACY.md).
                   The alias exists so the intent is explicit — the
                   reference's library stub for these models
                   (src/multiphase/library.jl:9-31) is dead code that
                   never produced a field.
    'PcP'/'ScS' -> reflected_travel_times at the CMB
    'PP'/'SS'   -> reciprocity composition of two direct fields;
                   requires `receivers` (returns one time per receiver;
                   for SS pass the S-speed table as U)
    'pP'/'sP'/'sS'/'pS' (case-sensitive: lowercase = the up leg from a
                   BURIED source) -> free-surface depth phases via
                   depth_phase_travel_times; requires `receivers`, and
                   `Us` when either leg is S
    """
    if phase in ("pP", "sP", "sS", "pS"):
        if receivers is None:
            raise ValueError(f"{phase} needs explicit receivers")
        if "s" in phase.lower() and Us is None:
            raise ValueError(f"{phase} has an S leg: pass Us (the "
                             "S-speed node table) alongside U (P-speed)")
        U_of = {"p": U, "s": Us}
        return depth_phase_travel_times(
            A, halo, source, gr, U_of[phase[0]], U_of[phase[1].lower()],
            receivers, config=config, interpret=interpret)
    p = phase.upper()
    if p in ("P", "S", "PDIFF", "SDIFF"):
        from .api import AnnulusSolver

        solver = AnnulusSolver(gr, A, halo, U, config,
                              method="circulant" if interpret else "auto")
        dist = solver.solve(source, want_prev=False).dist
        return dist if receivers is None else dist[np.asarray(receivers)]
    if p in ("PCP", "SCS"):
        dist = reflected_travel_times(A, halo, source, gr, U,
                                      reflector="cmb", config=config,
                                      interpret=interpret, _reuse=_reuse,
                                      engine=engine)
        return dist if receivers is None else dist[np.asarray(receivers)]
    if p in ("SKS", "PKP", "PKIKP", "SKP", "PKS"):
        legs = {"SKS": ("s", "s"), "PKP": ("p", "p"),
                "PKIKP": ("p", "p"), "SKP": ("s", "p"),
                "PKS": ("p", "s")}[p]
        if "s" in legs and Us is None:
            raise ValueError(f"{phase} has an S leg: pass Us (the "
                             "S-speed node table) alongside U (P-speed)")
        U_of = {"p": U, "s": Us}
        dist = converted_travel_times(A, halo, source, gr,
                                      U_down=U_of[legs[0]], U_core=U,
                                      U_up=U_of[legs[1]],
                                      reflector="cmb", config=config,
                                      interpret=interpret, _reuse=_reuse,
                                      engine=engine)
        return dist if receivers is None else dist[np.asarray(receivers)]
    if p in ("PP", "SS"):
        if receivers is None:
            raise ValueError(f"{p} needs explicit receivers")
        from .api import AnnulusSolver

        solver = AnnulusSolver(gr, A, halo, U, config,
                              method="circulant" if interpret else "auto")
        t_src = solver.solve(source, want_prev=False).dist
        out = []
        for r_ in np.asarray(receivers):
            t_rcv = solver.solve(int(r_), want_prev=False).dist
            out.append(pp_travel_times(t_src, t_rcv, gr, source, int(r_)))
        return np.asarray(out)
    raise ValueError(f"unknown phase {phase!r}; supported: P, S, Pdiff, "
                     f"Sdiff, PcP, ScS, PP, SS, SKS, PKP, PKIKP, SKP, "
                     f"PKS, pP, sP, sS, pS")
