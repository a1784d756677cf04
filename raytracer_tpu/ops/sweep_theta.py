"""Directional theta-sweep solver (Gauss-Seidel fast sweeping).

Every solver generation so far (ops/wrapped_t.py, ops/stream_t.py)
relaxes the whole field Jacobi-style: one iteration advances a wavefront
at most +-2 theta columns (the band stencil's physical reach), so the
iteration count scales with the ray paths' theta-column span - 76 at
180x63 but 419 at 2160x600 (PERF_NOTES.md).  The band closure saturates
at ~2 levels because the truncation keeps the per-sweep dc reach at +-2;
the coarse-to-fine warm start only pays in a narrow window.  At >=1M
nodes the solve is genuinely compute-bound (not tunnel-latency-bound),
so the iteration count is the wall.

This module breaks it with the classic fast-sweeping reordering: process
theta columns SEQUENTIALLY (a lax.scan), so column c's update reads the
already-updated columns c-1, c-2 of the same sweep - one forward sweep
propagates arrivals across the entire annulus in a single pass, the way
Bellman-Ford on a DAG converges in one topologically-ordered sweep.  In
a radially symmetric Earth the first-arrival ray paths are monotone in
theta (two branches from any source: clockwise and counter-clockwise),
so a forward plus a backward sweep captures almost every shortest path;
a handful of sweep pairs polish the non-monotone residue (core fan
detours, twin-pair switchbacks).  Measured: 419 Jacobi iterations
collapse to ~4-6 sweep pairs at 2160x600.

Per column step (all ops on (S, ML) vectors, S = source batch):
  1. incoming taps: for each stencil diagonal with dc = -1 (-2), the
     candidate dist[m + dm, c + dc] + w is one static lane roll of the
     carried column + add + min (weights are +inf wherever m + dm falls
     outside the slot range, so rolls self-mask - the same invariant as
     the monolithic kernels);
  2. in-column taps (dc = 0 diagonals), Gauss-Seidel within the column;
  3. chain scan along slots: log-doubling min-plus window costs (shared
     with ops/stream_t.py), full radial reach per column visit.
The backward sweep applies the dc = +1, +2 taps in decreasing-c order.
The centre fan runs between sweeps at XLA level.  Wrap: the carry into
column 0 (resp. nt-1) is the previous sweep's value of column nt-1
(resp. 0) - ordinary Gauss-Seidel staleness, absorbed by the next pair.

Exactness: every candidate is a real path cost (single stencil edges and
min-plus window compositions of them), so iterates decrease monotonically
and are bounded below by the true distances; when a full fwd+bwd pair
(which applies EVERY stencil edge at least once, plus the fan) changes
nothing beyond tol, the field satisfies the same fixpoint condition as
the Jacobi solvers.  Equality vs solve_circulant is pinned by tests.

Replaces the CUDA relaxation of reference src/SSSP/bfm_gpu.jl:487-526
with an ordering no Jacobi GPU kernel can express cheaply - on TPU the
sequential scan is a compiled while loop over resident VMEM/HBM state,
not a kernel-launch-per-column.
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
from .diag_wrapped import (_extract_cached, _pipelined_chunk_solve,
                           _window_costs)
from .stream_t import _pow_spans
from .wrapped_t import TWStencil, _textract_jit, pack_twrapped_stencil


class SweepTables(NamedTuple):
    """Device tables for the directional-sweep solver.

    wg  : 5 arrays (one per dc in -2..+2), each (Dg, ML): weight rows in
          DESTINATION slot coordinates, +inf where the diagonal has no
          edge or m + dm leaves [0, Mp)
    cfp/cbp : (L, ML) chain window costs (pow-2 spans, stream path's)
    fan_w   : (ML,) centre<->slot fan weights, +inf on non-fan slots
    wr_dn/wr_up : (ML, Dr) per-destination-slot scalar weights of the
          dm>0 (down-sweep) / dm<0 (up-sweep) taps, +inf where absent
    ring_f/ring_b : (ML,) per-slot theta ring hop costs (dm=0, dc=-+1)
    ring2_f/ring2_b : (ML,) dm=0, dc=-+2 tap costs
    """

    wg: Tuple[jax.Array, ...]
    cfp: jax.Array
    cbp: jax.Array
    fan_w: jax.Array    # fan-OUT row (destination-masked in stage tables)
    fan_in: jax.Array   # fan-IN row (unmasked; all-+inf when cen is off)
    wr_dn: jax.Array
    wr_up: jax.Array
    ring_f: jax.Array
    ring_b: jax.Array
    ring2_f: jax.Array
    ring2_b: jax.Array
    # hierarchical horizontal closure windows, one (2, 2*h_cap+1, ML)
    # array per power-of-two column span (see _hclosure_tables)
    wh: Tuple[jax.Array, ...]


class SweepStatic(NamedTuple):
    Mp: int
    ML: int
    nt: int
    dms: Tuple[Tuple[int, ...], ...]   # per-dc-group dm offsets (static)
    chain_spans: Tuple[int, ...]
    # static (dm, dc) of the down-sweep (dm>0) / up-sweep (dm<0) taps,
    # in the column order of wr_dn / wr_up
    taps_dn: Tuple[Tuple[int, int], ...]
    taps_up: Tuple[Tuple[int, int], ...]
    h_cap: int                          # |dm| cap of the closure windows
    h_spans: Tuple[int, ...]            # column spans 1, 2, 4, ... of wh


_H_CAP = 8   # slot-drift cap of the horizontal closure windows


def _hclosure_tables(dec, nt: int, ML: int, cap: int = _H_CAP, wmat=None):
    """Hierarchical horizontal min-plus windows.

    wh[k][sign, dm + cap, :] = cost of moving EXACTLY 2**k theta columns
    in direction sign (pull convention: dst column c reads column
    c + sign*2**k) with net slot drift dm (|dm| <= cap), minimised over
    all intermediate paths whose partial drifts stay within the cap.
    Every entry is a real path cost (min-plus composition of native
    taps), so applying the windows preserves the SSSP fixpoint; they
    exist purely to collapse long near-horizontal runs (the bottoming
    legs of the rays, net drift ~0 per column) into log-many taps.
    Composition: W_2s[dm, m] = min_{dm1+dm2=dm} W_s[dm1, m]
    + W_s[dm2, m + dm1] - the same slot-shift algebra as _compose_band.
    """
    n_dm = 2 * cap + 1

    def compose(A, B):
        out = np.full_like(A, np.inf)
        Mp = A.shape[1]
        for i1 in range(n_dm):
            dm1 = i1 - cap
            w1 = A[i1]
            if not np.isfinite(w1).any():
                continue
            sh = np.full_like(B, np.inf)
            if dm1 >= 0:
                sh[:, : Mp - dm1] = B[:, dm1:]
            else:
                sh[:, -dm1:] = B[:, : Mp + dm1]
            i2 = slice(max(0, -dm1), min(n_dm, n_dm - dm1))
            cand = w1[None, :] + sh[i2]
            tgt = out[i2.start + dm1: i2.stop + dm1]
            np.minimum(tgt, cand, out=tgt)
        return out

    wmat = dec.wmat if wmat is None else wmat

    def seed(dc0):
        out = np.full((n_dm, dec.Mp), np.inf)
        for d in np.flatnonzero(dec.dcs == dc0):
            dm = int(dec.dms[d])
            if abs(dm) <= cap:
                out[dm + cap] = np.minimum(out[dm + cap], wmat[d])
        return out

    levels, spans = [], []
    cur = {+1: seed(-1), -1: seed(+1)}   # pull: span +1 reads c-1
    nat2 = {+1: seed(-2), -1: seed(+2)}
    span = 1
    while span <= nt // 2:
        pair = np.full((2, n_dm, ML), np.inf)
        pair[0, :, : dec.Mp] = cur[+1]
        pair[1, :, : dec.Mp] = cur[-1]
        levels.append(pair)
        spans.append(span)
        nxt = {s: compose(cur[s], cur[s]) for s in (+1, -1)}
        if span == 1:
            nxt = {s: np.minimum(nxt[s], nat2[s]) for s in (+1, -1)}
        cur = nxt
        span *= 2
    return levels, tuple(spans)


def pack_sweep_tables(ws: TWStencil, cg: CirculantGraph, dtype,
                      slot_mask=None,
                      cen_on: bool = True) -> Tuple[SweepTables, SweepStatic]:
    """Per-dc grouped diagonal rows (cached in the stencil's dcache).

    `ws` must be packed with band_closure=0: the groups are rebuilt from
    the raw decomposition and must describe the same graph as the chain
    window costs taken from the shared stream tables.

    `slot_mask` ((Mp,) bool, optional) builds DESTINATION-MASKED stage
    tables for the ms/multiphase family: masked slots never improve
    (every cost row is +inf at their lanes) but stay readable - the
    reference's masked-relaxation pull semantics.  All compositions
    (chain windows, ring powers, closure windows) inherit the mask at
    every intermediate hop because each hop's destination row is masked
    at the seed.  `cen_on=False` additionally cuts both fan directions.
    Masked tables are NOT cached (each stage owns its own).
    """
    key = "sweep_tables"
    if slot_mask is None and key in ws.dcache:
        return ws.dcache[key]
    dec = decompose_diagonals(cg)
    assert dec.Mp == ws.Mp
    ML = ws.ML
    if slot_mask is None:
        wmat = dec.wmat
    else:
        wmat = np.where(np.asarray(slot_mask)[None, : dec.Mp],
                        dec.wmat, np.inf)
    wg, dms = [], []
    for dc in range(-_DC_RANGE, _DC_RANGE + 1):
        sel = np.flatnonzero(dec.dcs == dc)
        order = np.argsort(dec.dms[sel])
        sel = sel[order]
        rows = np.full((max(len(sel), 1), ML), np.inf)
        if len(sel):
            rows[: len(sel), : dec.Mp] = wmat[sel]
        wg.append(jnp.asarray(rows.astype(dtype)))
        dms.append(tuple(int(d) for d in dec.dms[sel]) or (0,))

    def _r_taps(sign):
        sel = np.flatnonzero(np.sign(dec.dms) == sign)
        # ascending |dm| so the carry row index is monotone
        order = np.lexsort((dec.dcs[sel], np.abs(dec.dms[sel])))
        sel = sel[order]
        w = np.full((ML, max(len(sel), 1)), np.inf)
        if len(sel):
            w[: dec.Mp, : len(sel)] = wmat[sel].T
        taps = tuple((int(dec.dms[d]), int(dec.dcs[d])) for d in sel) \
            or ((sign, 0),)
        return jnp.asarray(w.astype(dtype)), taps

    wr_dn, taps_dn = _r_taps(+1)
    wr_up, taps_up = _r_taps(-1)

    def _dm0_vec(dc0):
        hit = np.flatnonzero((dec.dms == 0) & (dec.dcs == dc0))
        out = np.full(ML, np.inf)
        if len(hit):
            out[: dec.Mp] = wmat[hit[0]]
        return jnp.asarray(out.astype(dtype))

    # chain window costs from the (possibly masked) dm=+-1, dc=0 hops;
    # window doubling then forbids out-of-level intermediates while the
    # first hop may still read an out-of-level source
    def _chain_vec(dm0):
        hit = np.flatnonzero((dec.dms == dm0) & (dec.dcs == 0))
        out = np.full(ML, np.inf)
        if len(hit):
            out[: dec.Mp] = wmat[hit[0]]
        return out

    chain_f = _chain_vec(-1)
    chain_f[0] = np.inf
    chain_b = _chain_vec(+1)
    chain_b[dec.Mp - 1:] = np.inf
    spans = _pow_spans(dec.Mp)
    cfp = _window_costs(chain_f, spans)
    cbp = _window_costs(chain_b[::-1], spans)[:, ::-1]

    fan_np = np.asarray(ws.fan_w[0], np.float64)
    fan_out = fan_np.copy()
    if slot_mask is not None:
        lane_ok = np.zeros(ML, dtype=bool)
        lane_ok[: dec.Mp] = np.asarray(slot_mask)[: dec.Mp]
        fan_out = np.where(lane_ok, fan_out, np.inf)
    if not cen_on:
        fan_out = np.full_like(fan_out, np.inf)
    fan_in = fan_np if cen_on else np.full_like(fan_np, np.inf)

    wh_np, h_spans = _hclosure_tables(dec, ws.nt, ML, wmat=wmat)
    tables = SweepTables(
        wg=tuple(wg),
        cfp=jnp.asarray(cfp.astype(dtype)),
        cbp=jnp.asarray(cbp.astype(dtype)),
        fan_w=jnp.asarray(fan_out.astype(dtype)),
        fan_in=jnp.asarray(fan_in.astype(dtype)),
        wr_dn=wr_dn, wr_up=wr_up,
        ring_f=_dm0_vec(-1), ring_b=_dm0_vec(+1),
        ring2_f=_dm0_vec(-2), ring2_b=_dm0_vec(+2),
        wh=tuple(jnp.asarray(w.astype(dtype)) for w in wh_np),
    )
    static = SweepStatic(Mp=ws.Mp, ML=ML, nt=ws.nt, dms=tuple(dms),
                         chain_spans=spans,
                         taps_dn=taps_dn, taps_up=taps_up,
                         h_cap=_H_CAP, h_spans=h_spans)
    if slot_mask is None:
        ws.dcache[key] = (tables, static)
    return tables, static


def _col_relax(cur, w0, d0, cfp, cbp, chain_spans):
    """In-column relaxation: dc=0 taps (Gauss-Seidel) + chain scans."""
    for i, dm in enumerate(d0):
        cur = jnp.minimum(cur, jnp.roll(cur, -dm, axis=-1) + w0[i])
    for k, s in enumerate(chain_spans):
        cur = jnp.minimum(cur, jnp.roll(cur, s, axis=-1) + cfp[k])
    for k, s in enumerate(chain_spans):
        cur = jnp.minimum(cur, jnp.roll(cur, -s, axis=-1) + cbp[k])
    return cur


def _sweep(v, tbl: SweepTables, st: SweepStatic, reverse: bool,
           col_relax: bool = True, carry_init=None):
    """One directional Gauss-Seidel sweep over theta columns.

    v: (S, nt, ML).  Forward applies the dc=-1,-2 taps (source column
    already updated this sweep); backward the dc=+1,+2 taps.
    col_relax=False drops the in-column work (the kernel-friendly
    variant: full-field ring/chain scans run between sweeps instead).
    carry_init optionally injects the two predecessor columns the scan
    starts from -- ((S, ML) at distance 1, (S, ML) at distance 2) in
    processing order; default is this field's own wrap columns (plain
    Gauss-Seidel staleness).  The theta-sharded solver passes its
    neighbour block's halo columns here (parallel/theta_shard.py).
    """
    g = _DC_RANGE  # index of dc=0 in the group tuples
    if reverse:
        g1_w, g1_d = tbl.wg[g + 1], st.dms[g + 1]
        g2_w, g2_d = tbl.wg[g + 2], st.dms[g + 2]
    else:
        g1_w, g1_d = tbl.wg[g - 1], st.dms[g - 1]
        g2_w, g2_d = tbl.wg[g - 2], st.dms[g - 2]
    w0, d0 = tbl.wg[g], st.dms[g]

    xs = jnp.swapaxes(v, 0, 1)          # (nt, S, ML)
    if reverse:
        xs = jnp.flip(xs, 0)

    def step(carry, x):
        p1, p2 = carry
        cur = x
        for i, dm in enumerate(g1_d):
            cur = jnp.minimum(cur, jnp.roll(p1, -dm, axis=-1) + g1_w[i])
        for i, dm in enumerate(g2_d):
            cur = jnp.minimum(cur, jnp.roll(p2, -dm, axis=-1) + g2_w[i])
        if col_relax:
            cur = _col_relax(cur, w0, d0, tbl.cfp, tbl.cbp, st.chain_spans)
        return (cur, p1), cur

    # wrap carry: previous sweep's values of the last two columns in
    # processing order (plain Gauss-Seidel staleness)
    if carry_init is None:
        carry_init = (xs[-1], xs[-2])
    (_, _), ys = jax.lax.scan(step, carry_init, xs)
    if reverse:
        ys = jnp.flip(ys, 0)
    return jnp.swapaxes(ys, 0, 1)


def _sweep_r(v, tbl: SweepTables, st: SweepStatic, upward: bool,
             row_relax: bool = True, seam_blind: bool = False):
    """One radial Gauss-Seidel sweep over slot rows.

    v: (S, nt, ML).  Downward (upward=False) processes slots in
    DESCENDING radius order: destination row m reads rows m + dm with
    dm > 0 (shallower, already updated this sweep) - the descent leg of
    a ray resolves in one sweep.  Upward is the mirror (dm < 0 taps,
    ascending order).  Within each row, a full-reach theta ring scan
    (log-doubling with the per-slot ring hop cost) plus the dm=0,
    dc=+-2 taps.

    The field lives in a (ML+K, S, nt) buffer (K = max |dm|, +inf pad
    rows on the reading side); each step does ONE dynamic-slice window
    read + static in-window row indexing + one row write - the
    one-aligned-slab-read pattern that ops/sweep3d.py measured 9x
    faster than per-tap dynamic reads.
    """
    S, nt, ML = v.shape
    taps = st.taps_up if upward else st.taps_dn
    wr = tbl.wr_up if upward else tbl.wr_dn
    K = max(abs(dm) for dm, _ in taps)

    # group taps by |dm| so each window row is read once
    by_dm = {}
    for i, (dm, dc) in enumerate(taps):
        by_dm.setdefault(abs(dm), []).append((dc, i))

    buf = jnp.moveaxis(v, 2, 0)                     # (ML, S, nt)
    inf = jnp.asarray(jnp.inf, v.dtype)
    pad = jnp.full((K, S, nt), inf, v.dtype)
    # reading side: above (higher m) for down, below for up
    buf_p = jnp.concatenate([buf, pad] if not upward else [pad, buf], 0)
    off = 0 if not upward else K                    # row m at buf_p[m + off]

    def body(i, buf_p):
        m = ML - 1 - i if not upward else i
        # window of the K rows at m+1..m+K (down) / m-K..m-1 (up)
        wstart = m + off + 1 if not upward else m + off - K
        win = jax.lax.dynamic_slice(buf_p, (wstart, 0, 0), (K, S, nt))
        cur = jax.lax.dynamic_slice(buf_p, (m + off, 0, 0), (1, S, nt))[0]
        ws_row = jax.lax.dynamic_slice(wr, (m, 0), (1, wr.shape[1]))[0]
        rf = jax.lax.dynamic_slice(tbl.ring_f, (m,), (1,))[0]
        rb = jax.lax.dynamic_slice(tbl.ring_b, (m,), (1,))[0]
        r2f = jax.lax.dynamic_slice(tbl.ring2_f, (m,), (1,))[0]
        r2b = jax.lax.dynamic_slice(tbl.ring2_b, (m,), (1,))[0]
        inf_lane = jnp.full((S, 1), jnp.inf, v.dtype)
        for adm, lst in by_dm.items():
            # window row of slot m+dm: down stores m+1 at win[0]
            row = win[adm - 1] if not upward else win[K - adm]
            for dc, i_w in lst:
                src = jnp.roll(row, -dc, axis=-1)
                if seam_blind and dc:
                    # emulate the Pallas kernel's non-wrapping lane
                    # shift: values rolled across the theta seam are
                    # +inf (the exact-wrap XLA scans repair the seam)
                    if dc > 0:
                        src = jnp.concatenate(
                            [src[:, :-dc], jnp.broadcast_to(
                                inf_lane, (S, dc))], axis=-1)
                    else:
                        src = jnp.concatenate(
                            [jnp.broadcast_to(inf_lane, (S, -dc)),
                             src[:, -dc:]], axis=-1)
                cur = jnp.minimum(cur, src + ws_row[i_w])
        if row_relax:
            # in-row: full-reach theta ring scan + the dm=0, dc=+-2 taps
            s = 1
            while s < nt:
                cur = jnp.minimum(cur, jnp.roll(cur, s, axis=-1) + s * rf)
                s *= 2
            s = 1
            while s < nt:
                cur = jnp.minimum(cur, jnp.roll(cur, -s, axis=-1) + s * rb)
                s *= 2
            cur = jnp.minimum(cur, jnp.roll(cur, 2, axis=-1) + r2f)
            cur = jnp.minimum(cur, jnp.roll(cur, -2, axis=-1) + r2b)
        return jax.lax.dynamic_update_slice(buf_p, cur[None],
                                            (m + off, 0, 0))

    buf_p = jax.lax.fori_loop(0, ML, body, buf_p)
    out = buf_p[:ML] if not upward else buf_p[K:]
    return jnp.moveaxis(out, 0, 2)


def _pow_spans_nt(nt: int):
    spans, s = [], 1
    while s < nt:
        spans.append(s)
        s *= 2
    return spans


# ----------------------------------------------------------------------
# Pallas radial-sweep kernel (the only sequential piece of the round)
# ----------------------------------------------------------------------


class RSweepStatic(NamedTuple):
    """Static geometry of the Pallas radial sweeps.

    MT   : field slot rows (round_up(Mp, 8))
    K8   : slab rows = round_up(maxdm, 8); also the +inf pad row count
    NTL  : theta lanes (round_up(nt, 128), then rounded up to a multiple
           of NTB; pad lanes +inf)
    NTB  : theta lanes per kernel block.  NTB == NTL on grids whose two
           field windows fit the VMEM budget (the original single-block
           kernel); larger grids split the lane axis over NTL // NTB
           grid steps, each block seam-blind at BOTH edges (roll-wrapped
           lanes masked +inf in-kernel) with every boundary's band edges
           re-applied exactly by the generalized seamfix - the wrap-seam
           treatment applied to NB-1 more places.  This removes the
           ~13M-node VMEM ceiling (2 x 80.75 MB windows at 8640x2400).
    taps_dn/up : ((dm, dc, w_col), ...) static tap lists
    Ddn/Dup    : weight-table lane counts (round_up(len(taps), 128))
    """

    MT: int
    K8: int
    NTL: int
    NTB: int
    taps_dn: Tuple[Tuple[int, int, int], ...]
    taps_up: Tuple[Tuple[int, int, int], ...]
    Ddn: int
    Dup: int


# VMEM budgets for the radial-sweep kernel.  in+out field windows are
# both resident (Mosaic does not collapse them under
# input_output_aliases).  A single-block grid is single-buffered, so
# nb=1 holds up to 2 x _RSWEEP_SINGLE_BYTES; a multi-block grid is
# DOUBLE-BUFFERED per window by the block pipeline (measured:
# "2 buffering levels", 2x40.4 MB windows = 163 MB > 128 at 8640x2400),
# so blocked windows budget 4 x _RSWEEP_WINDOW_BYTES.  Measured on
# chip: 5760x1600 (37 MB window) runs 372 ms unblocked vs 487 ms
# blocked - prefer nb=1 whenever it fits.
_RSWEEP_SINGLE_BYTES = 52 * 1024 * 1024
_RSWEEP_WINDOW_BYTES = 24 * 1024 * 1024


def pack_rsweep_tables(ws: TWStencil, cg: CirculantGraph, dtype,
                       slot_mask=None):
    """Weight tables for the Pallas radial sweeps, cached in dcache.

    wtab_dn: (MT + K8, Ddn) - row = BUFFER row of the down sweep (field
    rows first, +inf pad rows above), lane = tap.  wtab_up mirrors with
    the pad rows BELOW (field rows at [K8, K8+MT)).  +inf entries make
    out-of-range taps no-ops.  `slot_mask` destination-masks the weight
    rows for staged solves (masked stage tables are not cached).
    """
    key = "rsweep_tables"
    if slot_mask is None and key in ws.dcache:
        return ws.dcache[key]
    dec = decompose_diagonals(cg)
    Mp = dec.Mp
    MT = _round_up(Mp, SUB)
    maxdm = int(np.max(np.abs(dec.dms)))
    K8 = _round_up(max(maxdm, 1), SUB)
    NTL = _round_up(ws.nt, LANES)
    # lane blocking: split theta only when the (MT+K8, NTL) window
    # exceeds the single-block budget; NTL is re-padded to a block
    # multiple
    itemsize = np.dtype(dtype).itemsize
    full_bytes = (MT + K8) * NTL * itemsize
    if full_bytes <= _RSWEEP_SINGLE_BYTES:
        NTB = NTL
    else:
        nb = max(2, -(-full_bytes // _RSWEEP_WINDOW_BYTES))
        NTB = _round_up(-(-NTL // nb), LANES)
        NTL = NTB * (-(-NTL // NTB))
    if slot_mask is None:
        wmat = dec.wmat
    else:
        wmat = np.where(np.asarray(slot_mask)[None, :Mp], dec.wmat, np.inf)

    def _pack(sign):
        sel = np.flatnonzero(np.sign(dec.dms) == sign)
        order = np.lexsort((dec.dcs[sel], dec.dms[sel]))
        sel = sel[order]
        D = _round_up(max(len(sel), 1), LANES)
        w = np.full((MT + K8, D), np.inf)
        rows = np.full((len(sel), MT), np.inf)
        rows[:, :Mp] = wmat[sel]
        base = 0 if sign > 0 else K8
        w[base: base + MT, : len(sel)] = rows.T
        taps = tuple((int(dec.dms[d]), int(dec.dcs[d]), i)
                     for i, d in enumerate(sel)) or ((sign, 0, 0),)
        return jnp.asarray(w.astype(dtype)), taps, D

    wtab_dn, taps_dn, Ddn = _pack(+1)
    wtab_up, taps_up, Dup = _pack(-1)
    static = RSweepStatic(MT=MT, K8=K8, NTL=NTL, NTB=NTB, taps_dn=taps_dn,
                          taps_up=taps_up, Ddn=Ddn, Dup=Dup)
    out = ((wtab_dn, wtab_up), static)
    if slot_mask is None:
        ws.dcache[key] = out
    return out


def _make_rsweep_kernel(rst: RSweepStatic, upward: bool, dtype):
    """Gauss-Seidel radial sweep over 8-row macro-blocks.

    Buffer layout (in/out aliased, (MT+K8, NTL)): down sweep has the
    field at rows [0, MT) with K8 +inf pad rows ABOVE (the slab read of
    the top block); up sweep at [K8, K8+MT) with the pad BELOW.  Each
    fori trip: ONE aligned dynamic sublane slab read (the K8 rows the
    block's dm taps pull from, all finalised by earlier trips), a
    vectorised (8, NTL) phase for taps crossing the block boundary
    (static in-slab row slices + static lane rolls + per-tap (8,1)
    weight columns), then a sequential 8-row phase for the intra-block
    taps (|dm| < 8) in Gauss-Seidel order.  Theta pad lanes hold +inf
    and every op preserves them; lane rolls that cross the seam read
    +inf (seam edges are re-applied exactly by the XLA seamfix step).
    """
    MT, K8 = rst.MT, rst.K8
    NTL = rst.NTB      # lane width the kernel actually sees (one block)
    blocked = rst.NTB < rst.NTL
    taps = rst.taps_up if upward else rst.taps_dn
    nblocks = MT // SUB
    inf = np.asarray(np.inf, dtype)

    def edge_mask(src, dc):
        """+inf the lanes whose roll source crossed the block edge.
        Single-block kernels keep the original semantics (pad lanes /
        exact wrap handle the seam); blocked kernels are seam-blind at
        BOTH block edges and the generalized seamfix re-applies every
        boundary edge exactly."""
        if not blocked or not dc:
            return src
        lanes = jax.lax.broadcasted_iota(jnp.int32, src.shape, 1)
        bad = (lanes >= NTL - dc) if dc > 0 else (lanes < -dc)
        return jnp.where(bad, inf, src)

    def kernel(w_ref, buf_ref, out_ref):
        # work in out_ref (read-after-write Gauss-Seidel buffer); the
        # field input is donated (input_output_aliases) so the HBM
        # buffer is reused, though Mosaic still allocates both VMEM
        # windows - the lane blocking above is what bounds VMEM
        out_ref[0] = buf_ref[0]

        def body(g, carry):
            if not upward:
                b = (nblocks - 1 - g) * SUB
                slab = out_ref[0, pl.ds(b + SUB, K8), :]
            else:
                b = K8 + g * SUB
                slab = out_ref[0, pl.ds(b - K8, K8), :]
            wb = w_ref[pl.ds(b, SUB), :]
            cur = out_ref[0, pl.ds(b, SUB), :]

            def tap_src(dm):
                """(8, NTL) rows j = slab value of slot row b+j+dm, +inf
                where b+j+dm falls inside the block (phase-2's job)."""
                if not upward:
                    if dm >= SUB:
                        return slab[dm - SUB: dm]
                    return jnp.concatenate(
                        [jnp.full((SUB - dm, NTL), inf, dtype),
                         slab[0:dm]], axis=0)
                adm = -dm
                if adm >= SUB:
                    return slab[K8 + dm: K8 + dm + SUB]
                return jnp.concatenate(
                    [slab[K8 + dm: K8],
                     jnp.full((SUB - adm, NTL), inf, dtype)], axis=0)

            for dm, dc, iw in taps:
                src = tap_src(dm)
                if dc:
                    src = edge_mask(pltpu.roll(src, (-dc) % NTL, axis=1),
                                    dc)
                cur = jnp.minimum(cur, src + wb[:, iw: iw + 1])

            rows = [cur[j: j + 1] for j in range(SUB)]
            order = range(SUB - 1, -1, -1) if not upward else range(SUB)
            for j in order:
                for dm, dc, iw in taps:
                    jj = j + dm
                    if abs(dm) >= SUB or jj < 0 or jj >= SUB:
                        continue
                    src = rows[jj]
                    if dc:
                        src = edge_mask(pltpu.roll(src, (-dc) % NTL,
                                                   axis=1), dc)
                    rows[j] = jnp.minimum(rows[j],
                                          src + wb[j: j + 1, iw: iw + 1])
            out_ref[0, pl.ds(b, SUB), :] = jnp.concatenate(rows, axis=0)
            return carry

        jax.lax.fori_loop(0, nblocks, body, 0)

    return kernel


def _rsweep_call(bufs, wtab, rst: RSweepStatic, upward: bool,
                 interpret: bool):
    """bufs: (S, MT+K8, NTL) padded T-layout field -> swept field.

    Lane-blocked: grid (S, NTL // NTB); each block sweeps its own theta
    slice (radial trips are lane-independent apart from the |dc| <= 2
    rolls, which the kernel edge-masks when blocked)."""
    S = bufs.shape[0]
    kernel = _make_rsweep_kernel(rst, upward, bufs.dtype)
    MTK = rst.MT + rst.K8
    nb = rst.NTL // rst.NTB
    return pl.pallas_call(
        kernel,
        grid=(S, nb),
        out_shape=jax.ShapeDtypeStruct(bufs.shape, bufs.dtype),
        in_specs=[
            pl.BlockSpec(wtab.shape, lambda s, t: (0, 0)),
            pl.BlockSpec((1, MTK, rst.NTB), lambda s, t: (s, 0, t)),
        ],
        out_specs=pl.BlockSpec((1, MTK, rst.NTB), lambda s, t: (s, 0, t)),
        input_output_aliases={1: 0},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(wtab, bufs)


def _hscan(v, tbl: SweepTables, static: SweepStatic):
    """Hierarchical horizontal closure: ascending spans so a run of
    length L composes from its binary digits as the field updates level
    by level (Gauss-Seidel between levels; Jacobi across the dm taps
    within one (level, sign)).

    The 2*cap+1 slot-drift taps read STATIC slices of ONE +inf-padded
    copy of the span-rolled field instead of 2*cap+1 full-field lane
    rolls: identical semantics (a lane roll's wrapped slot reads are
    +inf-masked by the wh rows anyway, and +inf-pad reads stay +inf)
    with ~cap x less memory traffic per level."""
    cap = static.h_cap
    S, nt, ML = v.shape
    inf = jnp.asarray(jnp.inf, v.dtype)
    pad = jnp.full((S, nt, cap), inf, v.dtype)
    for k, span in enumerate(static.h_spans):
        for s_i, sgn in enumerate((+1, -1)):
            vp = jnp.concatenate(
                [pad, jnp.roll(v, sgn * span, axis=1), pad], axis=2)
            cur = v
            for dm in range(-cap, cap + 1):
                w = tbl.wh[k][s_i, dm + cap][None, None, :]
                cur = jnp.minimum(cur, vp[:, :, cap + dm: cap + dm + ML] + w)
            v = cur
    return v


class SweepState(NamedTuple):
    dist: jax.Array    # (S, nt, ML)
    cen: jax.Array     # (S,)
    changed: jax.Array
    it: jax.Array      # sweep-pair count


@functools.partial(jax.jit,
                   static_argnames=("static", "max_iters", "S", "mode"))
def _solve_sweep_jit(src_m, src_c, src_cen, tbl: SweepTables, tol,
                     static: SweepStatic, max_iters: int, S: int,
                     mode: str = "both"):
    """Full solve in one dispatch; each round applies `mode`'s sweep
    sequence (fan first): "theta" = fwd+bwd column sweeps, "r" =
    down+up radial sweeps, "both" = down, fwd, up, bwd."""
    dtype = tbl.wg[0].dtype
    inf = jnp.asarray(jnp.inf, dtype)
    zero = jnp.zeros((), dtype)
    nt, ML = static.nt, static.ML

    t_r = jnp.arange(nt, dtype=jnp.int32)[None, :, None]
    lane = jnp.arange(ML, dtype=jnp.int32)[None, None, :]
    dist0 = jnp.where((t_r == src_c[:, None, None])
                      & (lane == src_m[:, None, None])
                      & (~src_cen[:, None, None]), zero, inf)
    cen0 = jnp.where(src_cen, zero, inf)

    fan = tbl.fan_w[None, None, :]
    fan_in = tbl.fan_in[None, None, :]

    seq = {
        "theta": ("fwd", "bwd"),
        "r": ("down", "up"),
        "both": ("down", "fwd", "up", "bwd"),
        # kernel-friendly structure: sweeps apply raw taps only; the
        # vectorised full-field ring/chain scans (exact jnp.roll wrap)
        # run between sweeps - what the Pallas kernels can express
        "kernel": ("down", "scans", "up", "scans",
                   "fwd", "bwd", "scans"),
        # radial kernels only (no sequential theta sweeps at all),
        # seam-blind lane shifts - the cheapest Pallas structure
        "kernel-r": ("down", "scans", "up", "scans"),
        # production structure: radial Gauss-Seidel sweeps for the
        # descent/ascent legs + vectorised hierarchical horizontal
        # closure for the bottoming runs - no sequential theta scan
        "hclosure": ("down", "scans", "hscan", "up", "scans", "hscan"),
    }[mode]
    bare = mode.startswith("kernel") or mode == "hclosure"
    blind = mode == "kernel-r"

    def ring_chain(v):
        rf = tbl.ring_f[None, None, :]
        rb = tbl.ring_b[None, None, :]
        s = 1
        while s < static.nt:
            v = jnp.minimum(v, jnp.roll(v, s, axis=1) + s * rf)
            s *= 2
        s = 1
        while s < static.nt:
            v = jnp.minimum(v, jnp.roll(v, -s, axis=1) + s * rb)
            s *= 2
        for k, sp in enumerate(static.chain_spans):
            v = jnp.minimum(v, jnp.roll(v, sp, axis=2) + tbl.cfp[k][None, None])
        for k, sp in enumerate(static.chain_spans):
            v = jnp.minimum(v, jnp.roll(v, -sp, axis=2) + tbl.cbp[k][None, None])
        return v

    def hscan(v):
        return _hscan(v, tbl, static)

    def pair(state: SweepState) -> SweepState:
        v, cen = state.dist, state.cen
        cen = jnp.minimum(cen, jnp.min(v + fan_in, axis=(1, 2)))
        v = jnp.minimum(v, cen[:, None, None] + fan)
        for step in seq:
            if step == "fwd":
                v = _sweep(v, tbl, static, reverse=False, col_relax=not bare)
            elif step == "bwd":
                v = _sweep(v, tbl, static, reverse=True, col_relax=not bare)
            elif step == "down":
                v = _sweep_r(v, tbl, static, upward=False,
                             row_relax=not bare, seam_blind=blind)
            elif step == "up":
                v = _sweep_r(v, tbl, static, upward=True,
                             row_relax=not bare, seam_blind=blind)
            elif step == "hscan":
                v = hscan(v)
            else:
                v = ring_chain(v)
        changed = (jnp.any(v < state.dist - tol)
                   | jnp.any(cen < state.cen - tol))
        return SweepState(v, cen, changed, state.it + 1)

    def cond(s: SweepState):
        return s.changed & (s.it < max_iters)

    st = jax.lax.while_loop(
        cond, pair, SweepState(dist0, cen0, jnp.asarray(True),
                               jnp.zeros((), jnp.int32)))
    # settle the fan after the last pair (a no-change pair already
    # applied it first, so this is a no-op there; it matters only when
    # max_iters cut the loop)
    cen = jnp.minimum(st.cen, jnp.min(st.dist + fan_in, axis=(1, 2)))
    v = jnp.minimum(st.dist, cen[:, None, None] + fan)
    return SweepState(v, cen, st.changed, st.it)


@functools.partial(jax.jit,
                   static_argnames=("static", "rst", "max_iters", "S",
                                    "interpret"))
def _solve_sweep_pallas_jit(src_m, src_c, src_cen, tbl: SweepTables,
                            wtab_dn, wtab_up, tol,
                            static: SweepStatic, rst: RSweepStatic,
                            max_iters: int, S: int, interpret: bool):
    """hclosure round with the radial sweeps as Pallas kernels.

    Round: fan -> down kernel -> ring/chain -> hscan -> up kernel ->
    ring/chain -> hscan -> seamfix.  The kernels' theta lane rolls are
    seam-blind when round_up(nt,128) > nt (rolled-in pad lanes are
    +inf); hscan levels 1/2 re-apply all |dm|<=h_cap seam edges with
    exact jnp.roll wrap, and `seamfix` applies the FULL band stencil to
    the four seam-adjacent destination columns, so every graph edge is
    relaxed at least once per round and the tol-fixpoint equals the
    Jacobi solvers'.
    """
    dtype = tbl.wg[0].dtype
    inf = jnp.asarray(jnp.inf, dtype)
    zero = jnp.zeros((), dtype)
    nt, ML = static.nt, static.ML

    t_r = jnp.arange(nt, dtype=jnp.int32)[None, :, None]
    lane = jnp.arange(ML, dtype=jnp.int32)[None, None, :]
    dist0 = jnp.where((t_r == src_c[:, None, None])
                      & (lane == src_m[:, None, None])
                      & (~src_cen[:, None, None]), zero, inf)
    cen0 = jnp.where(src_cen, zero, inf)
    return _run_sweep_rounds(dist0, cen0, jnp.zeros((), jnp.int32), tbl,
                             wtab_dn, wtab_up, tol, static, rst,
                             max_iters, interpret)


def _run_sweep_rounds(dist0, cen0, it0, tbl: SweepTables, wtab_dn, wtab_up,
                      tol, static: SweepStatic, rst: RSweepStatic,
                      max_iters: int, interpret: bool,
                      halo_map=None) -> SweepState:
    """One while_loop of pallas-engine rounds from an explicit initial
    field (trace-time helper shared by the plain and staged solves).

    `halo_map` ((K, ML) int32, optional): the reference's unmasked twin
    min-merge runs once per round, improvement-gated against the
    round-start field (src/SSSP/bfm.jl:54-62's condition), like the
    staged stream solver."""
    nt, ML = static.nt, static.ML
    MT, K8, NTL = rst.MT, rst.K8, rst.NTL

    fan = tbl.fan_w[None, None, :]
    fan_in = tbl.fan_in[None, None, :]

    def to_T(v, upward):
        vt = jnp.swapaxes(v, 1, 2)[:, :MT, :]        # (S, MT, nt)
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, NTL - nt)),
                     constant_values=np.inf)
        pad = ((0, 0), (0, K8), (0, 0)) if not upward \
            else ((0, 0), (K8, 0), (0, 0))
        return jnp.pad(vt, pad, constant_values=np.inf)

    def from_T(vt, upward):
        rows = vt[:, :MT, :nt] if not upward else vt[:, K8:, :nt]
        v = jnp.swapaxes(rows, 1, 2)                 # (S, nt, MT)
        return jnp.pad(v, ((0, 0), (0, 0), (0, ML - MT)),
                       constant_values=np.inf)

    def ring_chain(v):
        rf = tbl.ring_f[None, None, :]
        rb = tbl.ring_b[None, None, :]
        s = 1
        while s < nt:
            v = jnp.minimum(v, jnp.roll(v, s, axis=1) + s * rf)
            s *= 2
        s = 1
        while s < nt:
            v = jnp.minimum(v, jnp.roll(v, -s, axis=1) + s * rb)
            s *= 2
        for k, sp in enumerate(static.chain_spans):
            v = jnp.minimum(v, jnp.roll(v, sp, axis=2) + tbl.cfp[k][None, None])
        for k, sp in enumerate(static.chain_spans):
            v = jnp.minimum(v, jnp.roll(v, -sp, axis=2) + tbl.cbp[k][None, None])
        return v

    def hscan(v):
        return _hscan(v, tbl, static)

    # seam windows: 8 circular columns centred on every kernel-blind
    # boundary - the theta wrap (column 0) plus, when the radial kernel
    # is lane-blocked, each block boundary k*NTB; destinations are
    # window positions 2..5.  Sequential per boundary: windows can
    # overlap near the wrap and min-composition is order-safe.
    nb_lanes = rst.NTL // rst.NTB
    bounds = [0] + [k * rst.NTB for k in range(1, nb_lanes)
                    if k * rst.NTB < nt]
    wd_idx = [(jnp.asarray([(b - 4 + i) % nt for i in range(8)], jnp.int32),
               jnp.asarray([(b - 2 + j) % nt for j in range(4)], jnp.int32))
              for b in bounds]

    def seamfix(v):
        for widx, didx in wd_idx:
            W8 = v[:, widx, :]                       # (S, 8, ML)
            dst = W8[:, 2:6, :]
            for g_i, dc in enumerate(range(-_DC_RANGE, _DC_RANGE + 1)):
                rows = tbl.wg[g_i]
                for i, dm in enumerate(static.dms[g_i]):
                    src = jnp.roll(W8[:, 2 + dc: 6 + dc, :], -dm, axis=2)
                    dst = jnp.minimum(dst, src + rows[i][None, None, :])
            v = v.at[:, didx, :].set(dst)
        return v

    def rnd(state: SweepState) -> SweepState:
        v, cen = state.dist, state.cen
        cen = jnp.minimum(cen, jnp.min(v + fan_in, axis=(1, 2)))
        v = jnp.minimum(v, cen[:, None, None] + fan)
        v = from_T(_rsweep_call(to_T(v, False), wtab_dn, rst, False,
                                interpret), False)
        v = hscan(ring_chain(v))
        v = from_T(_rsweep_call(to_T(v, True), wtab_up, rst, True,
                                interpret), True)
        v = hscan(ring_chain(v))
        v = seamfix(v)
        if halo_map is not None:
            pv = v[:, :, halo_map]
            improved = pv < state.dist[:, :, halo_map]
            pv = jnp.where(improved, pv, jnp.asarray(jnp.inf, v.dtype))
            v = jnp.minimum(v, jnp.min(pv, axis=2))
        changed = (jnp.any(v < state.dist - tol)
                   | jnp.any(cen < state.cen - tol))
        return SweepState(v, cen, changed, state.it + 1)

    def cond(s: SweepState):
        return s.changed & (s.it < max_iters)

    st = jax.lax.while_loop(
        cond, rnd, SweepState(dist0, cen0, jnp.asarray(True), it0))
    cen = jnp.minimum(st.cen, jnp.min(st.dist + fan_in, axis=(1, 2)))
    v = jnp.minimum(st.dist, cen[:, None, None] + fan)
    return SweepState(v, cen, st.changed, st.it)


def solve_circulant_sweep(
    cg: CirculantGraph,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    batch: int = 1,
    receivers=None,
    device_out: bool = False,
    mode: str = "hclosure",
    engine: str = "xla",
    interpret: bool = False,
    _packed: TWStencil = None,
) -> Tuple[np.ndarray, int]:
    """Directional-sweep solve; API mirrors solve_circulant_stream
    (sources chunked, asynchronous dispatch, one sync per call, optional
    on-device receiver extraction / device-resident rows).  `iters`
    counts SWEEP ROUNDS (typically 2-4), not Jacobi iterations.

    engine="pallas" runs the radial sweeps as Mosaic kernels (the
    production TPU path, hclosure structure); "xla" is the pure-jnp
    reference (exact wrap everywhere, any mode).
    """
    dtype = jnp.dtype(config.dtype)
    ws = _packed if _packed is not None else pack_twrapped_stencil(
        cg, dtype=dtype, band_closure=0)
    tbl, static = pack_sweep_tables(ws, cg, dtype)
    if engine == "pallas":
        (wtab_dn, wtab_up), rst = pack_rsweep_tables(ws, cg, dtype)
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    cmap = cg.cmap
    S = max(1, min(batch, len(sources)))
    tol = jnp.asarray(config.tol_value(), dtype)

    n_out, (jm, jc, jcm, jv) = _extract_cached(ws.dcache, cmap, receivers)
    nt, ML = static.nt, static.ML

    def dispatch(chunk):
        is_cen = chunk == cmap.center
        src_m = np.where(is_cen, 0, cmap.m_of[chunk]).astype(np.int32)
        src_c = np.where(is_cen, 0, cmap.c_of[chunk]).astype(np.int32)
        if engine == "pallas":
            st = _solve_sweep_pallas_jit(src_m, src_c, is_cen, tbl,
                                         wtab_dn, wtab_up, tol, static,
                                         rst, config.max_iters, S,
                                         interpret)
        else:
            st = _solve_sweep_jit(src_m, src_c, is_cen, tbl, tol, static,
                                  config.max_iters, S, mode)
        cen2d = jnp.broadcast_to(jnp.repeat(st.cen, LANES)[None, :],
                                 (SUB, S * LANES))
        return _textract_jit(st.dist.reshape(S * nt, ML), cen2d, st.it,
                             jm, jc, jcm, jv, S, nt)

    return _pipelined_chunk_solve(sources, S, n_out, dtype, dispatch,
                                  device_out=device_out)


class SweepStageSpec(NamedTuple):
    """One stage of a staged (multi-level) directional-sweep solve.

    tables/wtab_dn/wtab_up: destination-masked stage tables from
        pack_sweep_tables / pack_rsweep_tables with slot_mask set (may
        also carry stage-specific weights, e.g. multiphase boundary
        velocity swaps)
    reset_keep: None, or (ML,) bool host array: before the stage, slots
        NOT in it reset to +inf (the ms boundary restart)
    cen_keep  : centre value survives the reset
    halo_map  : (K, ML) int32 partner-slot maps for the unmasked twin
        min-merge (identity-padded); None = no halo
    """

    tables: SweepTables
    wtab_dn: jax.Array
    wtab_up: jax.Array
    reset_keep: object = None
    cen_keep: bool = True
    halo_map: object = None


@functools.partial(
    jax.jit,
    static_argnames=("static", "rst", "resets", "cen_keeps", "halos",
                     "max_iters", "interpret", "S"),
)
def _solve_sweep_staged_jit(src_m, src_c, src_cen, stage_tbls, stage_wdn,
                            stage_wup, reset_keeps, halo_maps, tol,
                            static: SweepStatic, rst: RSweepStatic,
                            resets: Tuple[bool, ...],
                            cen_keeps: Tuple[bool, ...],
                            halos: Tuple[bool, ...],
                            max_iters: int, interpret: bool, S: int):
    """Sequential level-masked sweep stages in ONE dispatch (the
    circulant fast path of the reference's bfm_ms / bfm_multiphase layer
    sweeps, on the ~3-round directional-sweep engine)."""
    dtype = stage_tbls[0][0][0].dtype
    inf = jnp.asarray(jnp.inf, dtype)
    zero = jnp.zeros((), dtype)
    nt, ML = static.nt, static.ML

    t_r = jnp.arange(nt, dtype=jnp.int32)[None, :, None]
    lane = jnp.arange(ML, dtype=jnp.int32)[None, None, :]
    dist0 = jnp.where((t_r == src_c[:, None, None])
                      & (lane == src_m[:, None, None])
                      & (~src_cen[:, None, None]), zero, inf)
    cen0 = jnp.where(src_cen, zero, inf)

    st = SweepState(dist0, cen0, jnp.asarray(True),
                    jnp.zeros((), jnp.int32))
    for i in range(len(resets)):
        dist, cen = st.dist, st.cen
        if resets[i]:
            dist = jnp.where(reset_keeps[i][None, None, :], dist, inf)
            if not cen_keeps[i]:
                cen = jnp.full_like(cen, jnp.inf)
        st = _run_sweep_rounds(dist, cen, st.it, stage_tbls[i],
                               stage_wdn[i], stage_wup[i], tol, static,
                               rst, max_iters, interpret,
                               halo_map=halo_maps[i] if halos[i] else None)
    return st


def solve_sweep_staged(
    cg: CirculantGraph,
    ws: TWStencil,
    stages,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    interpret: bool = False,
    batch: int = 1,
    receivers=None,
) -> Tuple[np.ndarray, int]:
    """Run SweepStageSpec stages sequentially.  API mirrors
    ops/stream_t.py::solve_stream_staged; `ws` is the (closure-free)
    stencil whose dcache holds extraction arrays."""
    dtype = jnp.dtype(config.dtype)
    _, static = pack_sweep_tables(ws, cg, dtype)
    _, rst = pack_rsweep_tables(ws, cg, dtype)
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    cmap = cg.cmap
    S = max(1, min(batch, len(sources)))
    tol = jnp.asarray(config.tol_value(), dtype)
    nt, ML = static.nt, static.ML

    stage_tbls = tuple(sp.tables for sp in stages)
    stage_wdn = tuple(sp.wtab_dn for sp in stages)
    stage_wup = tuple(sp.wtab_up for sp in stages)
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

    n_out, (jm, jc, jcm, jv) = _extract_cached(ws.dcache, cmap, receivers)

    def dispatch(chunk):
        is_cen = chunk == cmap.center
        src_m = np.where(is_cen, 0, cmap.m_of[chunk]).astype(np.int32)
        src_c = np.where(is_cen, 0, cmap.c_of[chunk]).astype(np.int32)
        st = _solve_sweep_staged_jit(
            src_m, src_c, is_cen, stage_tbls, stage_wdn, stage_wup,
            reset_keeps, halo_maps, tol, static, rst, resets, cen_keeps,
            halos, config.max_iters, interpret, S,
        )
        cen2d = jnp.broadcast_to(jnp.repeat(st.cen, LANES)[None, :],
                                 (SUB, S * LANES))
        return _textract_jit(st.dist.reshape(S * nt, ML), cen2d, st.it,
                             jm, jc, jcm, jv, S, nt)

    return _pipelined_chunk_solve(sources, S, n_out, dtype, dispatch)
