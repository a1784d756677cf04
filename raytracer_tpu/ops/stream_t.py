"""Streamed theta-major solver: the >=1M-node 2-D fast path.

The monolithic theta-major kernel (ops/wrapped_t.py) holds its whole
working set - distance field, 5-page dc stack, moving-frame accumulator
- in VMEM, which caps it at roughly 700k nodes per dispatch (the 5-page
stack alone is 5*(S*NTT)*ML floats).  The reference never ran past 465k
nodes (benchmarks/GPU_4_threads_star1_NOreorder.csv), so that ceiling
never cost parity - but a TPU-native framework should own the regime the
reference couldn't reach.

This module removes the ceiling with the ops/sweep3d.py recipe applied
to the 2-D annulus:

* the distance field lives in HBM at its natural (S, ntheta, ML) shape -
  no sublane-alignment duplicate rows, so the theta wrap is an exact
  `jnp.roll` and the whole defect-row/merge_dup machinery of the
  wrapped kernels disappears;
* ring scan (theta) and chain scan (slot) run at XLA level as pure
  log-doubling min-plus scans (11-ish roll+add+min steps per direction;
  XLA tiles them through HBM at memory bandwidth, any size);
* the BAND SWEEP - the dominant cost, (2*maxdm+1)*5 add+min passes per
  iteration - is a Pallas kernel with a grid over (source, theta-block):
  the 5 dc pages are built by exact XLA rolls, padded to a block
  multiple, and STREAMED block-by-block through VMEM by the BlockSpec
  pipeline while the weight-row table stays VMEM-resident.  Per-block
  state is bounded by the block size, not the grid, so any node count
  compiles in a fixed VMEM budget.

COARSE-TO-FINE WARM START (`warm_levels`): iteration count tracks the
ray paths' theta-column span (~nt/2 sweeps for far receivers, the
device-side wall at large grids).  Level l solves a theta-coarsened
circulant with nt/2**l columns whose edges are min-plus compositions of
fine hop pairs with even column step (every coarse weight is a real
fine path cost, see `_coarsen_theta`), then initialises level l-1 with
its field on the matching column parity.  A label-correcting solver
accepts any upper-bound initialisation without changing the fixpoint,
so the result is exact (tested cold == warm); the coarse levels run on
half/quarter-size fields with doubled column reach, so the total
iteration count drops from O(nt) toward O(nt/2**L + sum of short
refinement tails).

The band sweep is row-local along theta (the dc shift is baked into the
pre-rolled pages; every in-kernel op is a lane roll or an elementwise
add/min), so blocking theta is exact - no halos.  Weight tables, frame
math and the min-plus band closure are shared verbatim with
ops/wrapped_t.py via `pack_twrapped_stencil`, and the iteration
structure (ring, chain, band, fan, tolerance-based termination) is
identical, so the two paths converge to the same fixpoint.

Replaces the CUDA relaxation of reference src/SSSP/bfm_gpu.jl:487-526
at grid sizes the reference (and the monolithic kernel) could not hold.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig
from .circulant import CirculantGraph, _DC_RANGE
from .diag_circulant import LANES, SUB, _round_up, decompose_diagonals
from .diag_wrapped import (
    _extract_cached,
    _pipelined_chunk_solve,
    _window_costs,
)
from .wrapped_t import (
    NDC,
    TWStencil,
    _compose_band,
    _textract_jit,
    pack_tables_from_decomp,
    pack_twrapped_stencil,
)

# theta rows per band-sweep block; the kernel's VMEM need is
# ~ (2*NDC*TB*ML + R8*ML + 3*TB*ML) * itemsize regardless of grid size
_BLOCK_CHOICES = (512, 256, 128, 64, 32, 16, 8)
_BLOCK_VMEM_BUDGET = 64 * 1024 * 1024


def _pow_spans(cover: int):
    """Power-of-two spans (1, 2, 4, ...) whose doubling scan covers every
    offset in [0, cover): after applying span s to a field covering runs
    of length < s, coverage extends to < 2s."""
    spans, s, total = [], 1, 1
    while total < cover:
        spans.append(s)
        total += s
        s *= 2
    return tuple(spans) if spans else (1,)


class StreamTables(NamedTuple):
    """Device-side tables of one level of the streamed path.

    cfp/cbp : (L, ML) forward/backward chain window costs for the pure
              power-of-two doubling spans (the monolithic kernel uses a
              statics+fixed-span-fori hybrid to bound Mosaic code size;
              at XLA level log-doubling is strictly fewer passes)
    """

    wrows: jax.Array
    ring_f: jax.Array
    ring_b: jax.Array
    cfp: jax.Array
    cbp: jax.Array
    fan_w: jax.Array


class LevelStatic(NamedTuple):
    """Hashable per-level static geometry for the jitted solve."""

    Mp: int
    ML: int
    nt: int
    maxdm: int
    chain_spans: Tuple[int, ...]
    TB: int


def _stream_tables(ws: TWStencil, dtype) -> Tuple[StreamTables, LevelStatic]:
    key = "stream_tables"
    if key in ws.dcache:
        return ws.dcache[key]
    Mp, ML = ws.Mp, ws.ML
    # span-1 window cost IS the per-hop chain cost (cfl[0] by
    # construction in pack_twrapped_stencil)
    chain_f = np.asarray(ws.cfl[0, 0], dtype=np.float64)
    chain_b = np.asarray(ws.cbl[0, 0], dtype=np.float64)
    spans = _pow_spans(Mp)
    cfp = _window_costs(chain_f, spans)
    cbp = _window_costs(chain_b[::-1], spans)[:, ::-1]
    tables = StreamTables(
        wrows=jnp.asarray(ws.wrows),
        ring_f=jnp.asarray(ws.ring_f),
        ring_b=jnp.asarray(ws.ring_b),
        cfp=jnp.asarray(cfp.astype(dtype)),
        cbp=jnp.asarray(cbp.astype(dtype)),
        fan_w=jnp.asarray(ws.fan_w),
    )
    static = LevelStatic(
        Mp=Mp, ML=ML, nt=ws.nt, maxdm=ws.maxdm, chain_spans=spans,
        TB=_pick_block(ws.nt, ML, ws.wrows.shape[0], np.dtype(dtype).itemsize),
    )
    ws.dcache[key] = (tables, static)
    return tables, static


def _pick_block(nt: int, ML: int, wrows_rows: int, itemsize: int) -> int:
    for tb in _BLOCK_CHOICES:
        need = (2 * NDC * tb * ML + 3 * tb * ML + wrows_rows * ML) * itemsize
        if need <= _BLOCK_VMEM_BUDGET:
            return tb
    return _BLOCK_CHOICES[-1]


def _coarsen_theta(dms, dcs, wmat, pad_dm: int):
    """Theta-coarsen a diagonal decomposition by 2: hops between
    same-parity columns only - single fine hops with even dc plus every
    2-hop composition with even total dc, with dc relabelled in coarse
    column units (fine dc=+-2 -> coarse dc=+-1, composed |dc|<=4 ->
    coarse |dc|<=2).  Slots are NOT coarsened.  Every output weight is a
    real fine path cost (w1[m] + w2[m + dm1] walks hop 1 from slot m
    then hop 2 from its landing slot), so solving the coarse circulant
    yields exact upper bounds on the fine fixpoint at the matching
    columns - the warm-start validity condition.

    The composition is offset-invariant (the stencil is circulant), so
    one coarse stencil serves both even- and odd-parity column sets.
    """
    Mp = wmat.shape[1]
    n_dm = 2 * pad_dm + 1
    B = np.full((n_dm, NDC, Mp), np.inf)
    for d in range(len(dms)):
        i, j = int(dms[d]) + pad_dm, int(dcs[d]) + _DC_RANGE
        B[i, j] = np.minimum(B[i, j], wmat[d])

    NDC4 = 2 * 2 * _DC_RANGE + 1                 # |dc_total| <= 4, fine units
    out = np.full((n_dm, NDC4, Mp), np.inf)
    for dc in range(-_DC_RANGE, _DC_RANGE + 1):  # single even-dc hops
        if dc % 2 == 0:
            out[:, dc + 2 * _DC_RANGE, :] = B[:, dc + _DC_RANGE, :]

    for i1 in range(n_dm):
        dm1 = i1 - pad_dm
        blk1 = B[i1]
        if not np.isfinite(blk1).any():
            continue
        # hop-2 weights read at hop 1's landing slot: m -> m + dm1
        sh = np.full_like(B, np.inf)
        if dm1 >= 0:
            sh[:, :, : Mp - dm1] = B[:, :, dm1:]
        else:
            sh[:, :, -dm1:] = B[:, :, : Mp + dm1]
        for j1 in range(NDC):
            w1 = blk1[j1]
            if not np.isfinite(w1).any():
                continue
            dc1 = j1 - _DC_RANGE
            i2 = slice(max(0, -dm1), min(n_dm, n_dm - dm1))
            cand = w1[None, None, :] + sh[i2, :]
            tgt = out[i2.start + dm1: i2.stop + dm1,
                      dc1 - _DC_RANGE + 2 * _DC_RANGE:
                      dc1 + _DC_RANGE + 2 * _DC_RANGE + 1]
            np.minimum(tgt, cand, out=tgt)

    dms2, dcs2, rows = [], [], []
    for i in range(n_dm):
        for jt in range(0, NDC4, 2):             # even fine dc totals
            if i == pad_dm and jt == 2 * _DC_RANGE:
                continue                         # identity slot
            if np.isfinite(out[i, jt]).any():
                dms2.append(i - pad_dm)
                dcs2.append(jt // 2 - _DC_RANGE)  # coarse dc units
                rows.append(out[i, jt])
    return (np.asarray(dms2, np.asarray(dms).dtype),
            np.asarray(dcs2, np.asarray(dcs).dtype), np.stack(rows))


def _warm_stencils(ws: TWStencil, cg: CirculantGraph, dtype,
                   band_closure: int, levels: int):
    """Coarse-level stencils 1..L (level l has nt / 2**l columns), cached
    in the fine stencil's dcache.  Stops early when nt goes odd or the
    coarse ring would be trivially small."""
    key = ("warm", int(band_closure), int(levels))
    if key in ws.dcache:
        return ws.dcache[key]
    dec = decompose_diagonals(cg)
    dms, dcs, wmat = dec.dms, dec.dcs, dec.wmat.copy()
    if band_closure:
        dms, dcs, wmat = _compose_band(dms, dcs, wmat, dec.pad, band_closure)
    out = []
    nt = dec.nt
    for _ in range(levels):
        if nt % 2 or nt // 2 < 8:
            break
        dms, dcs, wmat = _coarsen_theta(dms, dcs, wmat, dec.pad)
        nt //= 2
        out.append(pack_tables_from_decomp(
            dms, dcs, wmat, dec.Mp, nt, dec.M,
            cg.fan_slots, cg.fan_w, dtype))
    ws.dcache[key] = out
    return out


def _make_band_kernel(ML: int, maxdm: int):
    n_dm = 2 * maxdm + 1

    def kernel(stack_ref, w_ref, out_ref):
        # stack_ref: (NDC, 1, TB, ML) pre-rolled dc pages for this
        # (source, theta-block); w_ref: (R8, ML) moving-frame weight rows
        cur = stack_ref[_DC_RANGE, 0]
        # moving-frame accumulator, identical frame math to the
        # monolithic kernel (ops/wrapped_t.py band_sweep)
        macc = pltpu.roll(cur, (ML - maxdm - 1) % ML, axis=1)

        def trip(t, macc):
            macc = pltpu.roll(macc, 1, axis=1)
            for u5 in range(NDC):
                w = w_ref[pl.ds(t * NDC + u5, 1), :]
                macc = jnp.minimum(macc, stack_ref[u5, 0] + w)
            return macc

        macc = jax.lax.fori_loop(0, n_dm, trip, macc)
        out_ref[0] = pltpu.roll(macc, (ML - maxdm) % ML, axis=1)

    return kernel


def _band_call(stack: jax.Array, wrows: jax.Array, maxdm: int, TB: int,
               interpret: bool) -> jax.Array:
    """stack: (NDC, S, NTB, ML) -> (S, NTB, ML) band-swept field."""
    _, S, NTB, ML = stack.shape
    NB = NTB // TB
    kernel = _make_band_kernel(ML, maxdm)
    return pl.pallas_call(
        kernel,
        grid=(S, NB),
        out_shape=jax.ShapeDtypeStruct((S, NTB, ML), stack.dtype),
        in_specs=[
            pl.BlockSpec((NDC, 1, TB, ML), lambda s, b: (0, s, b, 0)),
            pl.BlockSpec(wrows.shape, lambda s, b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TB, ML), lambda s, b: (s, b, 0)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(stack, wrows)


class StreamState(NamedTuple):
    dist: jax.Array           # (S, nt, ML)
    cen: jax.Array            # (S,)
    changed: jax.Array
    it: jax.Array


def _run_level(dist0, cen0, it0, tbl: StreamTables, st: LevelStatic,
               tol, max_iters: int, interpret: bool,
               sel=None, halo_map=None) -> StreamState:
    """One level's while_loop from an explicit initial field (trace-time
    helper shared by the cold, warm and staged solve paths).

    `sel` (optional (1, 1, ML) bool): slots allowed to UPDATE - the
    dense-field equivalent of the reference's level-masked frontier
    (src/SSSP/bfm_new_ms.jl:152-168): masked slots keep their value but
    remain readable by in-level relaxations, so the select is applied
    after every sub-stage (a later stage must read the masked slot's OLD
    value, not a discarded candidate).  Multi-hop scan compositions
    respect the mask through their cost tables: the chain window costs
    are built destination-masked (see `masked_stream_tables`), which
    under window doubling forbids out-of-level INTERMEDIATE slots while
    still allowing the first hop to read an out-of-level source - the
    exact pull semantics of the reference's masked relaxation.
    """
    Mp, ML, nt, maxdm, chain_spans, TB = st
    wrows, rf, rb, cfp, cbp, fan = tbl
    NTB = _round_up(nt, TB)

    def gate(v_new, v_old):
        return v_new if sel is None else jnp.where(sel, v_new, v_old)

    def ring_scan(v):
        s = 1
        while s < nt:
            v = jnp.minimum(v, jnp.roll(v, s, axis=1) + s * rf)
            s *= 2
        s = 1
        while s < nt:
            v = jnp.minimum(v, jnp.roll(v, -s, axis=1) + s * rb)
            s *= 2
        return v

    def chain_scan(v):
        # +inf window-boundary costs make lane-wrap reads self-masking
        for k, s in enumerate(chain_spans):
            v = jnp.minimum(v, jnp.roll(v, s, axis=2) + cfp[k][None, None])
        for k, s in enumerate(chain_spans):
            v = jnp.minimum(v, jnp.roll(v, -s, axis=2) + cbp[k][None, None])
        return v

    def band(v):
        # exact theta wrap at XLA level; pad rows are +inf and row-local
        # kernel ops keep them inert
        stack = jnp.stack([jnp.roll(v, -dc, axis=1)
                           for dc in range(-_DC_RANGE, _DC_RANGE + 1)])
        stack = jnp.pad(stack, ((0, 0), (0, 0), (0, NTB - nt), (0, 0)),
                        constant_values=np.inf)
        out = _band_call(stack, wrows, maxdm, TB, interpret)
        return out[:, :nt, :]

    def iteration(state: StreamState) -> StreamState:
        v, cen = state.dist, state.cen
        v = gate(ring_scan(v), v)
        v = gate(chain_scan(v), v)
        v = gate(band(v), v)
        if halo_map is not None:
            # the reference's twin min-merge runs UNMASKED every
            # iteration (src/SSSP/bfm.jl:54-62 has no level gate), so
            # out-of-level twins still receive their partner's value -
            # a per-slot lane permutation + min, exempt from `sel`.
            # Like the reference it fires only while the partner is
            # actively improving (dist[s] < dist0[s]), so stale values
            # don't spill across a stage reset.
            # halo_map is (K, ML): K partner rows per destination slot
            # (identity-padded) — gather gives (S, nt, K, ML), min over K
            pv = v[:, :, halo_map]
            improved = pv < state.dist[:, :, halo_map]
            pv = jnp.where(improved, pv, jnp.asarray(jnp.inf, v.dtype))
            v = jnp.minimum(v, jnp.min(pv, axis=2))
        cen = jnp.minimum(cen, jnp.min(v + fan[None], axis=(1, 2)))
        v = gate(jnp.minimum(v, cen[:, None, None] + fan[None]), v)
        changed = (jnp.any(v < state.dist - tol)
                   | jnp.any(cen < state.cen - tol))
        return StreamState(v, cen, changed, state.it + 1)

    def cond(s: StreamState):
        return s.changed & (s.it < max_iters)

    return jax.lax.while_loop(
        cond, iteration, StreamState(dist0, cen0, jnp.asarray(True), it0))


def masked_stream_tables(ws: TWStencil, slot_mask: np.ndarray,
                         cen_on: bool, dtype) -> StreamTables:
    """Per-stage tables for a level-masked solve (the ms/multiphase
    family).  slot_mask: (Mp,) bool - slots whose nodes belong to the
    stage's active partition level (level labels depend only on radius,
    and radius is constant along a slot, so the node-level mask IS a
    per-slot lane mask - the structural fact that puts the reference's
    layer sweeps on the circulant fast path).

    Chain window costs are rebuilt from the destination-masked per-hop
    cost: window doubling then forbids out-of-level intermediates while
    the first hop may still read an out-of-level source (reference pull
    semantics).  The fan row goes all-+inf when the centre is outside
    the level.  Ring and band tables are shared with the parent stencil
    (their candidates are destination-gated in `_run_level`).

    NOTE: the parent stencil must be packed with band_closure=0 - closed
    band entries are 2-hop compositions whose intermediate slot is not
    mask-checked.
    """
    Mp, ML = ws.Mp, ws.ML
    lane_mask = np.zeros(ML, dtype=bool)
    lane_mask[:Mp] = slot_mask[:Mp]
    chain_f = np.where(lane_mask, np.asarray(ws.cfl[0, 0], np.float64),
                       np.inf)
    chain_b = np.where(lane_mask, np.asarray(ws.cbl[0, 0], np.float64),
                       np.inf)
    spans = _pow_spans(Mp)
    cfp = _window_costs(chain_f, spans)
    cbp = _window_costs(chain_b[::-1], spans)[:, ::-1]
    fan = ws.fan_w if cen_on else np.full_like(ws.fan_w, np.inf)
    return StreamTables(
        wrows=jnp.asarray(ws.wrows),
        ring_f=jnp.asarray(ws.ring_f),
        ring_b=jnp.asarray(ws.ring_b),
        cfp=jnp.asarray(cfp.astype(dtype)),
        cbp=jnp.asarray(cbp.astype(dtype)),
        fan_w=jnp.asarray(fan),
    )


class StageSpec(NamedTuple):
    """One stage of a staged (multi-level) solve.

    tables    : stage tables (typically from masked_stream_tables; may
                carry stage-specific weights, e.g. multiphase boundary
                velocity swaps)
    static    : LevelStatic (same nt/Mp/ML across stages)
    sel_mask  : (ML,) bool host array - slots allowed to update
    reset_keep: None, or (ML,) bool host array: before the stage, slots
                NOT in it reset to +inf (the ms boundary restart)
    cen_keep  : centre value survives the reset
    """

    tables: StreamTables
    static: LevelStatic
    sel_mask: np.ndarray
    reset_keep: object = None
    cen_keep: bool = True
    # (K, ML) int32 partner-slot maps for the unmasked twin min-merge
    # (halo_map[k, m] = m where no k-th twin); None = no halo
    halo_map: object = None


@functools.partial(
    jax.jit,
    static_argnames=("statics", "resets", "cen_keeps", "halos",
                     "max_iters", "interpret", "S"),
)
def _solve_stream_staged_jit(src_m, src_c, src_cen, stage_tbls, sels,
                             reset_keeps, halo_maps, tol,
                             statics: Tuple[LevelStatic, ...],
                             resets: Tuple[bool, ...],
                             cen_keeps: Tuple[bool, ...],
                             halos: Tuple[bool, ...],
                             max_iters: int, interpret: bool, S: int):
    """Sequential level-masked stages in ONE dispatch (one tunnel sync).

    stage_tbls/sels/reset_keeps are per-stage pytrees; statics/resets/
    cen_keeps are the matching static tuples.
    """
    dtype = stage_tbls[0][0].dtype
    inf = jnp.asarray(jnp.inf, dtype)
    zero = jnp.zeros((), dtype)
    nt, ML = statics[0].nt, statics[0].ML

    t_r = jnp.arange(nt, dtype=jnp.int32)[None, :, None]
    lane = jnp.arange(ML, dtype=jnp.int32)[None, None, :]
    dist0 = jnp.where((t_r == src_c[:, None, None])
                      & (lane == src_m[:, None, None])
                      & (~src_cen[:, None, None]), zero, inf)
    cen0 = jnp.where(src_cen, zero, inf)

    st = StreamState(dist0, cen0, jnp.asarray(True),
                     jnp.zeros((), jnp.int32))
    for i in range(len(statics)):
        dist, cen = st.dist, st.cen
        if resets[i]:
            dist = jnp.where(reset_keeps[i][None, None, :], dist, inf)
            if not cen_keeps[i]:
                cen = jnp.full_like(cen, jnp.inf)
        st = _run_level(dist, cen, st.it, stage_tbls[i], statics[i],
                        tol, max_iters, interpret,
                        sel=sels[i][None, None, :],
                        halo_map=halo_maps[i] if halos[i] else None)
    return st


def solve_stream_staged(
    cg: CirculantGraph,
    ws_stages,
    stages,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    interpret: bool = False,
    batch: int = 1,
    receivers=None,
) -> Tuple[np.ndarray, int]:
    """Run StageSpec stages sequentially (the circulant fast path of the
    reference's bfm_ms / bfm_multiphase layer sweeps).  `ws_stages` is
    the stencil whose dcache holds extraction arrays (stage 0's)."""
    dtype = jnp.dtype(config.dtype)
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    cmap = cg.cmap
    S = max(1, min(batch, len(sources)))
    tol = jnp.asarray(config.tol_value(), dtype)
    nt, ML = stages[0].static.nt, stages[0].static.ML

    stage_tbls = tuple(sp.tables for sp in stages)
    statics = tuple(sp.static for sp in stages)
    sels = tuple(jnp.asarray(sp.sel_mask) for sp in stages)
    resets = tuple(sp.reset_keep is not None for sp in stages)
    reset_keeps = tuple(
        jnp.asarray(sp.reset_keep if sp.reset_keep is not None
                    else np.ones(ML, dtype=bool))
        for sp in stages)
    cen_keeps = tuple(bool(sp.cen_keep) for sp in stages)
    halos = tuple(sp.halo_map is not None for sp in stages)
    halo_maps = tuple(
        jnp.asarray(sp.halo_map if sp.halo_map is not None
                    else np.arange(ML, dtype=np.int32)[None, :])
        for sp in stages)

    n_out, (jm, jc, jcm, jv) = _extract_cached(ws_stages.dcache, cmap,
                                               receivers)

    def dispatch(chunk):
        is_cen = chunk == cmap.center
        src_m = np.where(is_cen, 0, cmap.m_of[chunk]).astype(np.int32)
        src_c = np.where(is_cen, 0, cmap.c_of[chunk]).astype(np.int32)
        st = _solve_stream_staged_jit(
            src_m, src_c, is_cen, stage_tbls, sels, reset_keeps,
            halo_maps, tol, statics, resets, cen_keeps, halos,
            config.max_iters, interpret, S,
        )
        cen2d = jnp.broadcast_to(jnp.repeat(st.cen, LANES)[None, :],
                                 (SUB, S * LANES))
        return _textract_jit(st.dist.reshape(S * nt, ML), cen2d, st.it,
                             jm, jc, jcm, jv, S, nt)

    return _pipelined_chunk_solve(sources, S, n_out, dtype, dispatch)


@functools.partial(
    jax.jit,
    static_argnames=("statics", "max_iters", "interpret", "S"),
)
def _solve_stream_jit(src_m, src_c, src_cen, tbls, tol, tol_coarse,
                      statics: Tuple[LevelStatic, ...],
                      max_iters: int, interpret: bool, S: int):
    """Multi-level streamed solve from (S,) source descriptors.

    tbls/statics: level 0 = finest, last = coarsest (len 1 = cold solve).
    The initial state is device-built from tiny descriptors and the whole
    coarse-to-fine chain runs in ONE dispatch - same one-sync host
    boundary discipline as the monolithic kernel.
    """
    dtype = tbls[0][0].dtype
    inf = jnp.asarray(jnp.inf, dtype)
    zero = jnp.zeros((), dtype)
    L = len(statics) - 1

    # source column / parity chain down the levels: a coarse column j at
    # level l+1 is fine column 2*j + par_l at level l (the circulant
    # stencil is offset-invariant, so odd-parity sources coarsen onto
    # the odd column set with the same tables)
    cols = [src_c]
    pars = []
    for _ in range(L):
        pars.append(cols[-1] % 2)
        cols.append(cols[-1] // 2)

    ntL, MLL = statics[L].nt, statics[L].ML
    t_r = jnp.arange(ntL, dtype=jnp.int32)[None, :, None]
    lane = jnp.arange(MLL, dtype=jnp.int32)[None, None, :]
    dist0 = jnp.where((t_r == cols[L][:, None, None])
                      & (lane == src_m[:, None, None])
                      & (~src_cen[:, None, None]), zero, inf)
    cen0 = jnp.where(src_cen, zero, inf)

    # coarse levels stop at a LOOSER tolerance: they only supply an
    # upper-bound initialisation, so iterating them to the fine tol
    # wastes sweeps polishing bounds the fine level re-derives anyway
    # (the fine level always runs to `tol`, so the result is unchanged)
    st = _run_level(dist0, cen0, jnp.zeros((), jnp.int32),
                    tbls[L], statics[L], tol if L == 0 else tol_coarse,
                    max_iters, interpret)
    for l in range(L - 1, -1, -1):
        Mp, MLl, ntl = statics[l].Mp, statics[l].ML, statics[l].nt
        up = st.dist[:, jnp.arange(ntl, dtype=jnp.int32) // 2, :Mp]
        up = jnp.pad(up, ((0, 0), (0, 0), (0, MLl - Mp)),
                     constant_values=np.inf)
        col = jnp.arange(ntl, dtype=jnp.int32)[None, :, None]
        fine0 = jnp.where(col % 2 == pars[l][:, None, None], up, inf)
        st = _run_level(fine0, st.cen, st.it, tbls[l], statics[l],
                        tol if l == 0 else tol_coarse,
                        max_iters, interpret)
    return st


def auto_warm_levels(nt: int) -> int:
    """Measured warm-level policy (PERF_NOTES.md round 3): the coarse
    chain pays off in a narrow column-count window around ~1080
    (1080x300: 223 -> 167 ms) and loses outside it - small grids are
    tunnel-bound, and at 1440+/2160 columns the fine refinement tail
    needs nearly as many sweeps as a cold solve (cold 336/822 ms beat
    every warm variant).  Empirical on v5e; revisit per hardware."""
    return 1 if 1000 <= nt <= 1200 else 0


def solve_circulant_stream(
    cg: CirculantGraph,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    interpret: bool = False,
    band_closure: int = 0,
    warm_levels: int = None,
    batch: int = 1,
    receivers=None,
    device_out: bool = False,
    _packed: TWStencil = None,
) -> Tuple[np.ndarray, int]:
    """Streamed theta-major solve; API mirrors solve_circulant_twrapped
    (sources chunked, asynchronous dispatch, one sync per call, optional
    on-device receiver extraction, device_out for device-resident rows).
    Works at any grid size.

    warm_levels > 0 runs the coarse-to-fine chain (exact; see module
    docstring); None takes config.warm_levels.
    """
    dtype = jnp.dtype(config.dtype)
    ws = _packed if _packed is not None else pack_twrapped_stencil(
        cg, dtype=dtype, band_closure=band_closure)
    if warm_levels is None:
        warm_levels = config.warm_levels
    if warm_levels is None:
        warm_levels = auto_warm_levels(ws.nt)
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    cmap = cg.cmap
    S = max(1, min(batch, len(sources)))
    tol = jnp.asarray(config.tol_value(), dtype)

    levels = [ws]
    if warm_levels:
        levels += _warm_stencils(ws, cg, dtype, band_closure, warm_levels)
    tbls, statics = zip(*(_stream_tables(w, dtype) for w in levels))

    n_out, (jm, jc, jcm, jv) = _extract_cached(ws.dcache, cmap, receivers)
    nt, ML = ws.nt, ws.ML

    def dispatch(chunk):
        is_cen = chunk == cmap.center
        src_m = np.where(is_cen, 0, cmap.m_of[chunk]).astype(np.int32)
        src_c = np.where(is_cen, 0, cmap.c_of[chunk]).astype(np.int32)
        st = _solve_stream_jit(
            src_m, src_c, is_cen, tuple(tbls), tol,
            jnp.asarray(max(config.tol_value(), 0.05), dtype),
            tuple(statics), config.max_iters, interpret, S,
        )
        cen2d = jnp.broadcast_to(jnp.repeat(st.cen, LANES)[None, :],
                                 (SUB, S * LANES))
        return _textract_jit(st.dist.reshape(S * nt, ML), cen2d, st.it,
                             jm, jc, jcm, jv, S, nt)

    return _pipelined_chunk_solve(sources, S, n_out, dtype, dispatch,
                                  device_out=device_out)
