"""Theta-major ("transposed") full-iteration Pallas kernel.

Fourth-generation TPU relaxation kernel for the circulant BFM (the
CUDA-relaxation replacement, reference src/SSSP/bfm_gpu.jl:487-526),
superseding ops/diag_wrapped.py's slot-major layout.  The distance page
is stored THETA-MAJOR: row t holds theta (t mod nt), lane m holds slot m
- the transpose of diag_wrapped's (slot-rows, theta-lanes).  That one
change re-orients every per-diagonal operation onto the cheap axis:

1. WEIGHT ROWS, NOT LANE REDUCES.  A diagonal's weight vector w[m]
   varies along slots = lanes, constant along theta = rows.  Reading it
   is one dynamic SUBLANE row `(1, ML)` of a host-packed table -
   naturally broadcast along rows by the add.  The slot-major kernel
   needed an (Mp,128) select + 7-step lane min-reduce per diagonal
   (measured ~40% of its band cost; the (1,Mp)->(Mp,1) relayout
   alternative measured slower still).

2. INCREMENTAL LANE ROLL, NOT PER-DIAGONAL SLICES.  The dm slot-shift
   is along lanes.  Diagonals are processed in ascending-dm order by
   ONE static roll-by-1 per fori trip of a 5-page stack (dc pages
   concatenated along rows) - no dynamic slices, no 8-alignment
   bookkeeping, no rho grouping, no scalar prefetch.

3. SELF-MASKING SLOT EDGES.  Lanes [Mp, ML) hold +inf and every kernel
   op preserves that (band weights, ring costs, chain window costs and
   the fan are all +inf on pad lanes), so band reads that roll past the
   slot-range edge land on +inf with NO masks in the inner loop.

4. CHEAPER WRAP COVER.  Theta duplication pads nt to a multiple of 8
   (sublanes) instead of 128 (lanes): 184 rows vs 256 lanes at nt=180 -
   28% less arithmetic everywhere - and only dup = NTT-nt defect rows
   need the duplicate-merge.

Ring scan (theta) runs along rows with sublane rolls; chain scan (slot)
along lanes with static lane rolls, wrap reads killed by +inf window
boundary costs.  Same hybrid static-doubling + fixed-span-fori scheme,
same exactness argument as diag_wrapped.py: every candidate is a real
path cost, wrong reads are +inf, iterates decrease to the SSSP fixpoint,
termination by SolverConfig.tol.
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
    _chain_spans,
    _compose_vertical,
    _extract_cached,
    _node_extract_arrays,
    _pipelined_chunk_solve,
    _pow2_below,
    _window_costs,
)

RING_REPEAT = 16   # fori span of the theta (row) scan
NDC = 2 * _DC_RANGE + 1


class TWStencil(NamedTuple):
    """Host-packed stencil for the theta-major kernel.

    wrows  : (R8, ML) weight rows; row 5*t + (dc+2) = weights of diagonal
             (dm = -maxdm + t, dc), +inf where the stencil has no such
             diagonal and on pad lanes [Mp, ML)
    ring_f/b : (1, ML) per-slot ring hop costs
    cfl/cbl  : (L, 1, ML) chain window costs (spans 1,2,..,CHAIN_REPEAT)
    fan_w    : (1, ML) centre<->slot fan weights
    """

    wrows: np.ndarray
    ring_f: np.ndarray
    ring_b: np.ndarray
    cfl: np.ndarray
    cbl: np.ndarray
    fan_w: np.ndarray
    maxdm: int
    Mp: int
    ML: int
    M: int
    nt: int
    NTT: int
    # per-stencil cache of device-resident arrays (cost tables uploaded
    # once; extraction index arrays keyed by receiver set) - repeated
    # solves move only source descriptors and results over the tunnel
    dcache: dict


def _compose_band(dms, dcs, wmat, pad_dm: int, levels: int):
    """Min-plus square the truncated band `levels` times.

    B'[dm, dc] = min(B[dm, dc], min over splits (B[dm1, dc1][m] +
    B[dm2, dc2][m + dm1])) truncated to |dm| <= pad_dm, |dc| <= _DC_RANGE.
    Every composed weight is a real 2-hop path cost, so relaxing with the
    closed band preserves the exact SSSP fixpoint while letting one sweep
    advance up to 2**levels original hops.  In the theta-major kernel the
    sweep already visits every (dm, dc) slot (absent ones are +inf
    no-ops), so the denser band costs NOTHING per sweep - the closure
    trades one-time host work for iteration count.
    """
    Mp = wmat.shape[1]
    n_dm = 2 * pad_dm + 1
    B = np.full((n_dm, NDC, Mp), np.inf)
    for d in range(len(dms)):
        i, j = int(dms[d]) + pad_dm, int(dcs[d]) + _DC_RANGE
        B[i, j] = np.minimum(B[i, j], wmat[d])
    ident = np.zeros(Mp)
    for _ in range(levels):
        out = B.copy()
        # identity terms: B composed with the zero-cost stay-put "hop"
        out[pad_dm, _DC_RANGE] = np.minimum(out[pad_dm, _DC_RANGE], ident)
        for i1 in range(n_dm):
            dm1 = i1 - pad_dm
            blk1 = B[i1]                       # (NDC, Mp)
            if not np.isfinite(blk1).any():
                continue
            # B2 shifted to the first hop's landing slot: m -> m + dm1
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
                # (dm2, dc2) windows whose sum stays inside the truncation
                i2 = slice(max(0, -dm1), min(n_dm, n_dm - dm1))
                j2 = slice(max(0, -dc1), min(NDC, NDC - dc1))
                cand = w1[None, None, :] + sh[i2, j2]
                tgt = out[i2.start + dm1:i2.stop + dm1,
                          j2.start + dc1:j2.stop + dc1]
                np.minimum(tgt, cand, out=tgt)
        B = out
    dms2, dcs2, rows = [], [], []
    for i in range(n_dm):
        for j in range(NDC):
            if i == pad_dm and j == _DC_RANGE:
                continue  # identity slot
            if np.isfinite(B[i, j]).any():
                dms2.append(i - pad_dm)
                dcs2.append(j - _DC_RANGE)
                rows.append(B[i, j])
    return (np.asarray(dms2, dms.dtype), np.asarray(dcs2, dcs.dtype),
            np.stack(rows))


_VMEM_BUDGET = 100 * 1024 * 1024


def max_twrapped_batch(tw: "TWStencil",
                       limit_bytes: int = _VMEM_BUDGET) -> int:
    """Largest source block S whose monolithic kernel fits the scoped
    VMEM limit.  The kernel materialises the (S*NTT, ML) field, the
    5-page dc stack plus its pre-concat page temps, the moving-frame
    accumulator and the output - ~13 field-sized arrays (empirical
    envelope).  0 means even S=1 does not fit: route to the streamed
    path (ops/stream_t.py), whose VMEM need is block-bounded."""
    itemsize = np.dtype(tw.wrows.dtype).itemsize
    per_source = 13 * tw.NTT * tw.ML * itemsize
    fixed = tw.wrows.size * itemsize
    return max(0, int((limit_bytes - fixed) // per_source))


def supports_twrapped(cg: CirculantGraph) -> bool:
    """Same wrap condition as the slot-major kernel, on the 8-row cover:
    every defect row needs a defect-free twin."""
    nt = cg.ntheta
    NTT = _round_up(nt, SUB)
    dup = NTT - nt
    return nt >= SUB and (dup == 0 or dup >= _DC_RANGE)


def pack_twrapped_stencil(cg: CirculantGraph, dtype=np.float32,
                          vertical_closure: int = 0,
                          band_closure: int = 0) -> TWStencil:
    dec = decompose_diagonals(cg)
    dms, dcs, wmat = dec.dms, dec.dcs, dec.wmat.copy()
    if vertical_closure:
        dms, dcs, wmat = _compose_vertical(dms, dcs, wmat, dec.pad,
                                           vertical_closure)
    if band_closure:
        dms, dcs, wmat = _compose_band(dms, dcs, wmat, dec.pad, band_closure)
    return pack_tables_from_decomp(dms, dcs, wmat, dec.Mp, dec.nt, dec.M,
                                   cg.fan_slots, cg.fan_w, dtype)


def pack_tables_from_decomp(dms, dcs, wmat, Mp: int, nt: int, M: int,
                            fan_slots, fan_w, dtype=np.float32) -> TWStencil:
    """Pack kernel tables from an explicit (dms, dcs, wmat) diagonal
    decomposition - the tail of pack_twrapped_stencil, split out so the
    streamed path's theta-coarsened warm-start stencils (which synthesise
    their own decompositions) share the exact same packing code."""
    NTT = _round_up(nt, SUB)
    maxdm = int(np.max(np.abs(dms)))
    ML = _round_up(Mp + maxdm + 1, LANES)

    # weight rows are stored in the band sweep's MOVING FRAME: the kernel
    # rolls the accumulator (not the 5-page stack) by one lane per trip,
    # so row (t, dc) holds w shifted to source-slot coordinates:
    # w_t[x] = w[x - dm] (dst m = x - dm reads src slot x = m + dm)
    R = (2 * maxdm + 1) * NDC
    wrows = np.full((_round_up(R, SUB), ML), np.inf)
    for d in range(len(dms)):
        dm, dc = int(dms[d]), int(dcs[d])
        if dc == 0 and abs(dm) <= 1:
            continue  # dm in {-1,0,+1}, dc=0 handled exactly by the chain scan
        t = dm + maxdm
        lo, hi = max(0, dm), min(Mp + dm, Mp)  # x range with x-dm in [0,Mp)
        row = wrows[t * NDC + (dc + _DC_RANGE)]
        row[lo:hi] = np.minimum(row[lo:hi], wmat[d][lo - dm:hi - dm])

    def _diag_vec(dm0: int, dc0: int) -> np.ndarray:
        hit = (dms == dm0) & (dcs == dc0)
        out = np.full(ML, np.inf)
        if hit.any():
            out[:Mp] = wmat[int(np.flatnonzero(hit)[0])]
        return out

    chain_f = _diag_vec(-1, 0)
    chain_f[0] = np.inf
    chain_b = _diag_vec(+1, 0)
    chain_b[Mp - 1] = np.inf
    chain_b[Mp:] = np.inf
    spans = _chain_spans(Mp)
    cfl = _window_costs(chain_f, spans)[:, None, :]
    cbl = _window_costs(chain_b[::-1], spans)[:, ::-1][:, None, :]

    fan_row = np.full((1, ML), np.inf)
    fan_row[0, fan_slots] = fan_w

    return TWStencil(
        wrows=wrows.astype(dtype),
        ring_f=_diag_vec(0, -1)[None, :].astype(dtype),
        ring_b=_diag_vec(0, +1)[None, :].astype(dtype),
        cfl=cfl.astype(dtype), cbl=cbl.astype(dtype),
        fan_w=fan_row.astype(dtype),
        maxdm=maxdm, Mp=Mp, ML=ML, M=M, nt=nt, NTT=NTT,
        dcache={},
    )


def _make_titer_kernel(Mp: int, ML: int, NTT: int, nt: int, maxdm: int,
                       iters: int, S: int = 1):
    rows = S * NTT
    dup = NTT - nt
    n_dm = 2 * maxdm + 1
    ring_statics = tuple(s for s in _pow2_below(RING_REPEAT) if s < NTT)
    ring_rep = RING_REPEAT
    n_ring = max(0, -(-(NTT - ring_rep) // ring_rep)) if NTT > ring_rep else 0
    chain_all = _chain_spans(Mp)
    chain_statics, chain_rep = chain_all[:-1], chain_all[-1]
    n_chain = max(0, -(-(Mp - chain_rep) // chain_rep))

    def kernel(dist_ref, cen_ref, w_ref, rf_ref, rb_ref,
               cfl_ref, cbl_ref, fan_ref, out_ref, cen_out_ref):
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, ML), 0) % NTT
        inf = jnp.asarray(jnp.inf, out_ref.dtype)
        rf, rb, fan = rf_ref[:], rb_ref[:], fan_ref[:]

        def ring_scan(v):
            # row t improves from row t-s (theta - s) at cost s*rf
            for s in ring_statics:
                cand = pltpu.roll(v, s, axis=0) + (s * rf)
                v = jnp.minimum(v, jnp.where(row < s, inf, cand))
            costF = ring_rep * rf

            def fwd(_, v):
                cand = pltpu.roll(v, ring_rep, axis=0) + costF
                return jnp.minimum(v, jnp.where(row < ring_rep, inf, cand))

            v = jax.lax.fori_loop(0, n_ring, fwd, v)
            for s in ring_statics:
                cand = pltpu.roll(v, rows - s, axis=0) + (s * rb)
                v = jnp.minimum(v, jnp.where(row >= NTT - s, inf, cand))
            costB = ring_rep * rb

            def bwd(_, v):
                cand = pltpu.roll(v, rows - ring_rep, axis=0) + costB
                return jnp.minimum(v, jnp.where(row >= NTT - ring_rep, inf, cand))

            return jax.lax.fori_loop(0, n_ring, bwd, v)

        def chain_scan(v):
            # +inf window-boundary costs make lane-wrap reads self-masking
            for k, s in enumerate(chain_statics):
                v = jnp.minimum(v, pltpu.roll(v, s, axis=1) + cfl_ref[k])
            L = len(chain_statics)

            def fwd(_, v):
                return jnp.minimum(
                    v, pltpu.roll(v, chain_rep, axis=1) + cfl_ref[L])

            v = jax.lax.fori_loop(0, n_chain, fwd, v)
            for k, s in enumerate(chain_statics):
                v = jnp.minimum(v, pltpu.roll(v, ML - s, axis=1) + cbl_ref[k])

            def bwd(_, v):
                return jnp.minimum(
                    v, pltpu.roll(v, ML - chain_rep, axis=1) + cbl_ref[L])

            return jax.lax.fori_loop(0, n_chain, bwd, v)

        def band_sweep(cur):
            # 5 dc pages stacked along rows: page u5 = theta-rolled copy,
            # defect rows (reads crossing the NTT wrap) masked +inf
            pages = []
            for u5, dc in enumerate(range(-_DC_RANGE, _DC_RANGE + 1)):
                if dc == 0:
                    r = cur
                elif dup == 0 and S > 1:
                    # exact wrap must stay in-block: roll each source block
                    # separately (a full-array roll would read across the
                    # block boundary into the neighbouring source)
                    r = jnp.concatenate(
                        [pltpu.roll(cur[b * NTT:(b + 1) * NTT, :],
                                    (-dc) % NTT, axis=0) for b in range(S)],
                        axis=0)
                else:
                    # dup == 0, S == 1: the full-array roll IS the exact
                    # theta wrap; dup > 0: defect rows masked, recovered
                    # by merge_dup
                    r = pltpu.roll(cur, (-dc) % rows, axis=0)
                    if dup:
                        if dc > 0:
                            r = jnp.where(row >= NTT - dc, inf, r)
                        elif dc < 0:
                            r = jnp.where(row < -dc, inf, r)
                pages.append(r)
            stack = jnp.concatenate(pages, axis=0)
            # MOVING-FRAME accumulator: ascending dm via one static lane
            # roll of acc (1/5 the data of rolling the stack) per trip;
            # weight rows are host-shifted into source-slot coordinates,
            # so trip t relaxes dst m = x - dm from src slot x for every
            # lane x at once (pad lanes [Mp,ML) stay +inf -> out-of-range
            # slot reads self-mask)
            macc = pltpu.roll(cur, (ML - maxdm - 1) % ML, axis=1)

            def trip(t, macc):
                macc = pltpu.roll(macc, 1, axis=1)
                for u5 in range(NDC):
                    w = w_ref[pl.ds(t * NDC + u5, 1), :]
                    macc = jnp.minimum(
                        macc, stack[u5 * rows:(u5 + 1) * rows, :] + w)
                return macc

            macc = jax.lax.fori_loop(0, n_dm, trip, macc)
            return pltpu.roll(macc, (ML - maxdm) % ML, axis=1)

        def merge_dup(acc):
            if not dup:
                return acc
            fwd = jnp.where(row < dup, pltpu.roll(acc, (-nt) % rows, axis=0),
                            inf)
            bwd = jnp.where(row >= nt, pltpu.roll(acc, nt, axis=0), inf)
            return jnp.minimum(acc, jnp.minimum(fwd, bwd))

        def iteration(_, carry):
            v, cens = carry
            v = chain_scan(ring_scan(v))
            v = merge_dup(band_sweep(v))
            if S == 1:
                cen = jnp.minimum(cens[0], jnp.min(v + fan))
                return jnp.minimum(v, cen + fan), (cen,)
            blocks, new_cens = [], []
            for b in range(S):
                blk = v[b * NTT:(b + 1) * NTT, :]
                cen = jnp.minimum(cens[b], jnp.min(blk + fan))
                new_cens.append(cen)
                blocks.append(jnp.minimum(blk, cen + fan))
            return jnp.concatenate(blocks, axis=0), tuple(new_cens)

        cens0 = tuple(jnp.min(cen_ref[:, b * LANES:(b + 1) * LANES])
                      for b in range(S))
        v, cens = jax.lax.fori_loop(0, iters, iteration,
                                    (dist_ref[:], cens0))
        out_ref[:] = v
        cen_out_ref[:] = jnp.concatenate(
            [jnp.broadcast_to(c, (SUB, LANES)) for c in cens], axis=1)

    return kernel


def _titer_call(tw_static, dist: jax.Array, cen: jax.Array, wrows, rf, rb,
                cfl, cbl, fan, iters: int, interpret: bool, S: int = 1):
    Mp, ML, NTT, nt, maxdm = tw_static
    rows = S * NTT
    kernel = _make_titer_kernel(Mp, ML, NTT, nt, maxdm, iters, S)

    def vspec(*shape):
        return pl.BlockSpec(shape, lambda *_: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((rows, ML), dist.dtype),
                   jax.ShapeDtypeStruct((SUB, S * LANES), dist.dtype)],
        in_specs=[
            vspec(rows, ML), vspec(SUB, S * LANES), vspec(*wrows.shape),
            vspec(1, ML), vspec(1, ML),
            vspec(*cfl.shape), vspec(*cbl.shape), vspec(1, ML),
        ],
        out_specs=[vspec(rows, ML), vspec(SUB, S * LANES)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(dist, cen, wrows, rf, rb, cfl, cbl, fan)


class TWState(NamedTuple):
    dist: jax.Array
    dcen: jax.Array
    changed: jax.Array
    it: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("Mp", "ML", "NTT", "nt", "maxdm",
                     "max_iters", "sweeps", "interpret", "S"),
)
def _solve_twrapped_jit(src_m, src_c, src_cen, wrows, rf, rb, cfl, cbl,
                        fan, tol,
                        Mp: int, ML: int, NTT: int, nt: int, maxdm: int,
                        max_iters: int, sweeps: int,
                        interpret: bool, S: int = 1) -> TWState:
    """Full solve from (S,) source descriptors.

    The initial state is built ON DEVICE from three S-element arrays
    (slot, column, is-centre) - a single solve's host->device traffic is
    a few dozen bytes, not the (S*NTT, ML) field (the axon tunnel moves
    ~130 MB/s with ~28 ms per synchronised round trip; the field upload
    alone used to cost more than the entire device solve).
    """
    dtype = wrows.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    zero = jnp.zeros((), dtype)
    tw_static = (Mp, ML, NTT, nt, maxdm)

    t_r = (jnp.arange(S * NTT, dtype=jnp.int32) % NTT)[:, None]
    c_r = jnp.repeat(src_c, NTT)[:, None]
    m_r = jnp.repeat(src_m, NTT)[:, None]
    s_r = jnp.repeat(src_cen, NTT)[:, None]
    lane = jnp.arange(ML, dtype=jnp.int32)[None, :]
    # source theta row + its duplicate rows (t % nt == c) within the block
    dist0 = jnp.where((t_r % nt == c_r) & (lane == m_r) & (~s_r), zero, inf)
    cen_mask = jnp.broadcast_to(jnp.repeat(src_cen, LANES)[None, :],
                                (SUB, S * LANES))
    cen0 = jnp.where(cen_mask, zero, inf)

    state = TWState(dist0, cen0, jnp.asarray(True), jnp.zeros((), jnp.int32))

    def cond(s: TWState):
        return s.changed & (s.it < max_iters)

    def body(s: TWState):
        d, cen = _titer_call(tw_static, s.dist, s.dcen, wrows, rf, rb,
                             cfl, cbl, fan, sweeps, interpret, S)
        changed = jnp.any(d < s.dist - tol) | jnp.any(cen < s.dcen - tol)
        return TWState(d, cen, changed, s.it + sweeps)

    return jax.lax.while_loop(cond, body, state)


# node -> (slot, column) extraction indices; shared with the slot-major
# kernel (diag_wrapped)
_extract_arrays = _node_extract_arrays


@functools.partial(jax.jit, static_argnames=("S", "NTT"))
def _textract_jit(dist2d, cen2d, it, m_idx, c_idx, center_mask, valid,
                  S: int, NTT: int):
    """(S, k+1): node-ordered values gathered on device, with the
    iteration count appended as the last column - ONE array, ONE pull,
    ONE ~28 ms tunnel round trip (a separate scalar fetch costs a full
    second round trip)."""
    ML = dist2d.shape[1]
    flat = dist2d.reshape(-1)
    inf = jnp.asarray(jnp.inf, dist2d.dtype)
    rows_out = []
    for b in range(S):
        base = (b * NTT + c_idx) * ML + m_idx
        g = jnp.where(valid, flat[base], inf)
        rows_out.append(jnp.where(center_mask, cen2d[0, b * LANES], g))
    vals = jnp.stack(rows_out)
    itcol = jnp.broadcast_to(it.astype(vals.dtype), (S, 1))
    return jnp.concatenate([vals, itcol], axis=1)


def solve_circulant_twrapped(
    cg: CirculantGraph,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    sweeps_per_call: int = 4,
    interpret: bool = False,
    vertical_closure: int = 0,
    band_closure: int = 0,
    batch: int = 1,
    receivers=None,
    device_out: bool = False,
    _packed: TWStencil = None,
) -> Tuple[np.ndarray, int]:
    """Theta-major full-iteration solve; API mirrors
    solve_circulant_wrapped (sources batched as NTT-row blocks, optional
    on-device receiver extraction).  Check `supports_twrapped(cg)`.
    device_out=True returns the rows as a device-resident jax array
    (see `_pipelined_chunk_solve`)."""
    if not supports_twrapped(cg):
        raise ValueError("theta-major kernel unsupported for this ntheta; "
                         "use solve_circulant_wrapped/diag")
    dtype = jnp.dtype(config.dtype)
    ws = _packed if _packed is not None else pack_twrapped_stencil(
        cg, dtype=dtype, vertical_closure=vertical_closure,
        band_closure=band_closure)
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    cmap = cg.cmap
    nt, Mp, ML, NTT = ws.nt, ws.Mp, ws.ML, ws.NTT
    S = max(1, min(batch, len(sources)))

    if "tables" not in ws.dcache:  # cost tables: uploaded once per stencil
        ws.dcache["tables"] = tuple(
            jnp.asarray(a) for a in (ws.wrows, ws.ring_f, ws.ring_b,
                                     ws.cfl, ws.cbl, ws.fan_w))
    wrows, rf, rb, cfl, cbl, fan = ws.dcache["tables"]
    tol = jnp.asarray(config.tol_value(), dtype)

    n_out, (jm, jc, jcm, jv) = _extract_cached(ws.dcache, cmap, receivers)

    def dispatch(chunk):
        is_cen = chunk == cmap.center
        src_m = np.where(is_cen, 0, cmap.m_of[chunk]).astype(np.int32)
        src_c = np.where(is_cen, 0, cmap.c_of[chunk]).astype(np.int32)
        st = _solve_twrapped_jit(
            src_m, src_c, is_cen, wrows, rf, rb, cfl, cbl, fan, tol,
            Mp, ML, NTT, nt, ws.maxdm,
            config.max_iters, sweeps_per_call, interpret, S,
        )
        return _textract_jit(st.dist, st.dcen, st.it, jm, jc, jcm, jv,
                             S, NTT)

    return _pipelined_chunk_solve(sources, S, n_out, dtype, dispatch,
                                  device_out=device_out)
