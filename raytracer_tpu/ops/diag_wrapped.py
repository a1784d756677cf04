"""Wrapped-lane full-iteration Pallas kernel (round-2 PERF_NOTES idea 1).

Third-generation TPU relaxation kernel for the circulant BFM, replacing
the reference's CUDA relaxation (src/SSSP/bfm_gpu.jl:487-526).  Builds on
the diagonal-band decomposition of ops/diag_circulant.py and moves the
ENTIRE solver iteration - ring scan, chain scan, band sweep, duplicate
merge, centre-fan exchange - inside one Pallas kernel, running T full
iterations per kernel call.  The per-iteration XLA glue of the diag
kernel (40-copy source-stack rebuild ~0.9 ms, scans ~0.5 ms, fan +
dispatch) disappears; only the convergence check stays at the XLA level,
once per T iterations.

Structural devices (all measured on a v5e, see PERF_NOTES.md):

1. WRAPPED THETA LANES.  dist is stored (Mp, NTL) with lane l holding
   theta (l mod nt) - every lane is real data; lanes l >= nt duplicate
   thetas 0..NTL-nt-1.  A theta shift by dc then becomes a STATIC
   `pltpu.roll` over the lane axis inside the kernel: lane l reads lane
   (l+dc) mod NTL = theta(l)+dc, correct everywhere except the |dc|
   "defect" lanes whose read crosses the NTL wrap (NTL % nt != 0).
   Defect reads are masked to +inf and recovered by a duplicate-merge
   (two more static lane rolls by +-nt) after each sweep - every defect
   lane's theta has a defect-free twin, so no candidate is lost and the
   fixpoint is exact.

2. PER-DIAGONAL SUBLANE ROLL.  The dm row shift splits as 8q + rho; the
   kernel keeps the 5 dc pages in VMEM scratch (5 MB, not the 38 MB
   40-copy stack) and applies the rho sub-shift per diagonal with a
   STATIC `pltpu.roll` over sublanes - diagonals are grouped by rho, so
   the shift is a compile-time constant inside each of 8 sub-loops.

3. IN-KERNEL MIN-PLUS LINE SCANS.  The exact full-range ring (theta)
   and chain (slot) relaxations run as hybrid scans: static doubling
   steps (spans 1,2,4,..) up to the repeat span, then a `fori_loop` of
   fixed-span steps (temps stay bounded; a fully unrolled log-scan would
   hit Mosaic's statement-temp stacking).  Ring span costs are s*c
   (rotationally uniform per slot); chain span costs are precomputed
   window sums with +inf at the boundary rows, which makes wrap reads
   self-masking.  On the wrapped lane cover, forward+backward line scans
   together reach every ring offset (the cover is >= nt + max offset
   long in at least one direction from every lane).

Correctness invariant shared by every step: a candidate is only ever
`existing-path cost + edge/segment weight`, and wrong-theta reads are
masked to +inf, so iterates remain upper bounds that decrease to the
unique SSSP fixpoint; termination is by tolerance (SolverConfig.tol).
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

RING_REPEAT = 16   # fori span of the ring scan (statics cover 1..15)
CHAIN_REPEAT = 32  # fori span of the chain scan (statics cover 1..31)
UNROLL = 4         # diagonals per band-sweep fori trip (trip overhead
                   # ~1.3 us dominates the 404-trip loop otherwise)


def _pow2_below(n: int):
    out, s = [], 1
    while s < n:
        out.append(s)
        s *= 2
    return tuple(out)


def _chain_spans(Mp: int):
    """Chain-scan spans for a slot axis of Mp rows: doubling statics plus
    a repeat span (the last element), all < Mp."""
    spans = tuple(s for s in _pow2_below(CHAIN_REPEAT) + (CHAIN_REPEAT,)
                  if s < Mp)
    return spans if spans else (1,)


def _window_costs(c1: np.ndarray, need) -> np.ndarray:
    """(len(need), Mp) min-plus window sums of the per-hop chain cost c1,
    built by doubling; +inf boundary entries make wrap reads self-masking.
    `need` must be powers of two in increasing order."""
    cur = c1.astype(np.float64).copy()
    span = 1
    out = []
    while True:
        if span in need:
            out.append(cur.copy())
        if span >= max(need):
            break
        shifted = np.full_like(cur, np.inf)
        shifted[span:] = cur[:-span]
        cur = cur + shifted
        span *= 2
    assert len(out) == len(need)
    return np.stack(out)


class WrappedStencil(NamedTuple):
    """Rho-grouped diagonal stencil + scan tables for the full-iteration
    wrapped-lane kernel.

    offs       : (D,) int32 - 8-aligned flat row offset into the 5-page
                 dc scratch: (dc+2) * rows5 + pad2 + dm - rho
    wp         : (G, Mp, 128) lane-packed weights in GROUPED diagonal
                 order (diagonal j's weights live in wp[j//128, :, j%128])
    wpT        : (Dp8, Mp128) row-major weights, row j = grouped diagonal
                 j (sublane-indexable; the kernel's transpose weight mode
                 reads row j + relayouts instead of select+lane-reduce)
    rho_starts : 9 static ints - group r covers [starts[r], starts[r+1])
    ring_f/b   : (Mp, 1) per-slot ring hop cost (theta -/+ direction)
    cfl/cbl    : (L, Mp, 1) chain window costs, spans 1,2,4,..,CHAIN_REPEAT
    fan_w      : (Mp, 1) centre<->slot weights (+inf off the fan)
    pad2       : row padding (pad + 8; Mp+8-row slices stay in-page)
    """

    offs: np.ndarray
    wp: np.ndarray
    wpT: np.ndarray
    dcache: dict  # device-resident uploads, keyed like wrapped_t's
    rho_starts: Tuple[int, ...]
    ring_f: np.ndarray
    ring_b: np.ndarray
    cfl: np.ndarray
    cbl: np.ndarray
    fan_w: np.ndarray
    pad2: int
    D: int
    Mp: int
    M: int
    nt: int
    NTL: int


def supports_wrapped(cg: CirculantGraph) -> bool:
    """The duplicate-merge needs a defect-free twin for every defect lane:
    either no wrap defects at all (nt divides NTL) or at least _DC_RANGE
    duplicated thetas."""
    nt = cg.ntheta
    NTL = _round_up(nt, LANES)
    dup = NTL - nt
    return nt >= SUB and (dup == 0 or dup >= _DC_RANGE)


def _compose_vertical(dms, dcs, wmat, pad, levels: int):
    """Append min-plus squares of the dc=0 sub-band (truncated to |dm| <=
    pad) as extra diagonals.

    Ray paths spend ~half their hops descending vertically with |dm| in
    the 8..14 range (layer strides) and almost never repeat a hop type,
    so the chain scan (dm=+-1 only) cannot compose them; each vertical
    hop otherwise costs one full band sweep.  A composed diagonal
    (dm1+dm2, 0) with weight w1[m] + w2[m+dm1] is a real 2-hop path cost,
    so relaxing with it preserves the exact fixpoint while collapsing
    vertical runs of up to 2^levels hops into one sweep.
    """
    Mp = wmat.shape[1]
    vert = {}
    for d in np.flatnonzero(dcs == 0):
        vert[int(dms[d])] = wmat[d]
    base_keys = set(zip(dms.tolist(), dcs.tolist()))
    cur = dict(vert)
    cur[0] = np.minimum(cur.get(0, np.inf), np.zeros(Mp))  # identity
    add_dm, add_w = [], []
    for _ in range(levels):
        nxt = {}
        for dm1, w1 in cur.items():
            for dm2, w2 in cur.items():
                dm = dm1 + dm2
                if abs(dm) > pad:
                    continue
                w2s = np.full(Mp, np.inf)
                if dm1 >= 0:
                    w2s[: Mp - dm1] = w2[dm1:]
                else:
                    w2s[-dm1:] = w2[: Mp + dm1]
                cand = w1 + w2s
                nxt[dm] = np.minimum(nxt[dm], cand) if dm in nxt else cand
        cur = nxt
    for dm, w in cur.items():
        if dm == 0 or not np.isfinite(w).any():
            continue
        if (dm, 0) in base_keys:
            d = int(np.flatnonzero((dms == dm) & (dcs == 0))[0])
            wmat[d] = np.minimum(wmat[d], w)
        else:
            add_dm.append(dm)
            add_w.append(w)
    if add_dm:
        dms = np.concatenate([dms, np.asarray(add_dm, dms.dtype)])
        dcs = np.concatenate([dcs, np.zeros(len(add_dm), dcs.dtype)])
        wmat = np.concatenate([wmat, np.stack(add_w)])
    return dms, dcs, wmat


def pack_wrapped_stencil(cg: CirculantGraph, dtype=np.float32,
                         vertical_closure: int = 0) -> WrappedStencil:
    dec = decompose_diagonals(cg)
    dms, dcs, wmat = dec.dms, dec.dcs, dec.wmat.copy()
    D, Mp, nt, NTL = dec.D, dec.Mp, dec.nt, dec.NTL
    if vertical_closure:
        dms, dcs, wmat = _compose_vertical(dms, dcs, wmat, dec.pad,
                                           vertical_closure)
    pad2 = dec.pad + SUB
    rows5 = Mp + 2 * pad2

    rho = np.mod(dms, SUB)
    raw_offs = ((dcs + _DC_RANGE) * rows5 + pad2 + dms - rho).astype(np.int32)

    # group by rho, padding each group to a multiple of UNROLL with dummy
    # diagonals (offset 0, +inf weight column -> exact no-ops)
    offs_g, w_cols, starts = [], [], [0]
    for r in range(SUB):
        sel = np.flatnonzero(rho == r)
        n_pad = _round_up(len(sel), UNROLL)
        o = np.zeros(n_pad, dtype=np.int32)
        o[: len(sel)] = raw_offs[sel]
        offs_g.append(o)
        w_cols.append(sel)
        starts.append(starts[-1] + n_pad)
    offs = np.concatenate(offs_g)
    rho_starts = tuple(starts)
    Dp = rho_starts[-1]
    assert offs.min() >= 0 and np.all(offs % SUB == 0)
    assert np.all(offs + Mp + SUB <= 5 * rows5)

    G = _round_up(Dp, LANES) // LANES
    wp = np.full((G, Mp, LANES), np.inf)
    wpT = np.full((_round_up(Dp, SUB), _round_up(Mp, LANES)), np.inf)
    for r in range(SUB):
        for k, src_idx in enumerate(w_cols[r]):
            j = rho_starts[r] + k
            wp[j // LANES, :, j % LANES] = wmat[src_idx]
            wpT[j, :Mp] = wmat[src_idx]

    def _diag_vec(dm0: int, dc0: int) -> np.ndarray:
        hit = (dms == dm0) & (dcs == dc0)
        out = np.full(Mp, np.inf)
        if hit.any():
            out[:] = wmat[int(np.flatnonzero(hit)[0])]
        return out

    chain_f = _diag_vec(-1, 0)
    chain_f[0] = np.inf
    chain_b = _diag_vec(+1, 0)
    chain_b[-1] = np.inf
    spans = _chain_spans(Mp)
    cfl = _window_costs(chain_f, spans)[:, :, None]
    cbl = _window_costs(chain_b[::-1], spans)[:, ::-1, None]

    fan_w = np.full((Mp, 1), np.inf)
    fan_w[cg.fan_slots, 0] = cg.fan_w

    return WrappedStencil(
        offs=offs, wp=wp.astype(dtype), wpT=wpT.astype(dtype),
        dcache={}, rho_starts=rho_starts,
        ring_f=_diag_vec(0, -1)[:, None].astype(dtype),
        ring_b=_diag_vec(0, +1)[:, None].astype(dtype),
        cfl=cfl.astype(dtype), cbl=cbl.astype(dtype),
        fan_w=fan_w.astype(dtype),
        pad2=pad2, D=Dp, Mp=Mp, M=dec.M, nt=nt, NTL=NTL,
    )


def _make_iter_kernel(rho_starts, Mp: int, NTL: int, pad2: int, nt: int,
                      iters: int, S: int = 1,
                      weight_mode: str = "reduce", pre_roll: bool = False):
    """S >= 2 batches S sources side by side as NTL-lane blocks; every
    lane mask switches from the absolute lane id to lane % NTL, so rolls
    that cross a block boundary are masked exactly like the wrap defects
    (and recovered by the in-block duplicate-merge).

    weight_mode 'transpose' reads diagonal j's weight as a dynamic
    sublane row of wpT + an in-kernel (1,Mp)->(Mp,1) relayout instead of
    the (Mp,128) select + lane-reduce.  pre_roll builds all 8 rho-rolled
    copies of the 5-page scratch once per iteration so the per-diagonal
    sublane roll disappears (8x scratch; S=1/2 only by VMEM).
    """
    rows5 = Mp + 2 * pad2
    dup = NTL - nt
    NTLT = S * NTL
    ring_statics = _pow2_below(RING_REPEAT)
    n_ring = -(-(NTL - RING_REPEAT) // RING_REPEAT)
    chain_all = _chain_spans(Mp)
    chain_statics, chain_rep = chain_all[:-1], chain_all[-1]
    n_chain = max(0, -(-(Mp - chain_rep) // chain_rep))
    live_rhos = tuple(r for r in range(SUB)
                      if rho_starts[r] != rho_starts[r + 1])

    def kernel(o_ref, dist_ref, cen_ref, wp_ref, wpT_ref, rf_ref, rb_ref,
               cfl_ref, cbl_ref, fan_ref, out_ref, cen_out_ref, q_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (Mp, LANES), 1)
        lane_full = jax.lax.broadcasted_iota(jnp.int32, (Mp, NTLT), 1) % NTL
        inf = jnp.asarray(jnp.inf, out_ref.dtype)
        rf, rb, fan = rf_ref[:], rb_ref[:], fan_ref[:]

        # static +inf row padding of the 5 dc pages, written once per call
        padblk = jnp.full((pad2, NTLT), inf, out_ref.dtype)
        for u5 in range(5):
            if pre_roll:
                q_ref[0, pl.ds(u5 * rows5, pad2), :] = padblk
                q_ref[0, pl.ds(u5 * rows5 + pad2 + Mp, pad2), :] = padblk
            else:
                q_ref[pl.ds(u5 * rows5, pad2), :] = padblk
                q_ref[pl.ds(u5 * rows5 + pad2 + Mp, pad2), :] = padblk

        def ring_scan(v):
            # forward: lane l improves from lane l-s (theta - s) at cost s*c
            for s in ring_statics:
                cand = pltpu.roll(v, s, axis=1) + (s * rf)
                v = jnp.minimum(v, jnp.where(lane_full < s, inf, cand))
            costF = RING_REPEAT * rf

            def fwd(_, v):
                cand = pltpu.roll(v, RING_REPEAT, axis=1) + costF
                return jnp.minimum(v, jnp.where(lane_full < RING_REPEAT, inf, cand))

            v = jax.lax.fori_loop(0, n_ring, fwd, v)
            for s in ring_statics:
                cand = pltpu.roll(v, NTLT - s, axis=1) + (s * rb)
                v = jnp.minimum(v, jnp.where(lane_full >= NTL - s, inf, cand))
            costB = RING_REPEAT * rb

            def bwd(_, v):
                cand = pltpu.roll(v, NTLT - RING_REPEAT, axis=1) + costB
                return jnp.minimum(
                    v, jnp.where(lane_full >= NTL - RING_REPEAT, inf, cand))

            return jax.lax.fori_loop(0, n_ring, bwd, v)

        def chain_scan(v):
            # window costs carry +inf at boundary rows -> wrap reads are
            # self-masking, no row masks needed
            for k, s in enumerate(chain_statics):
                v = jnp.minimum(v, pltpu.roll(v, s, axis=0) + cfl_ref[k])
            L = len(chain_statics)

            def fwd(_, v):
                return jnp.minimum(
                    v, pltpu.roll(v, chain_rep, axis=0) + cfl_ref[L])

            v = jax.lax.fori_loop(0, n_chain, fwd, v)
            for k, s in enumerate(chain_statics):
                v = jnp.minimum(v, pltpu.roll(v, Mp - s, axis=0) + cbl_ref[k])

            def bwd(_, v):
                return jnp.minimum(
                    v, pltpu.roll(v, Mp - chain_rep, axis=0) + cbl_ref[L])

            return jax.lax.fori_loop(0, n_chain, bwd, v)

        def band_sweep(cur):
            # 5 theta-rolled dc pages; defect lanes (reads crossing the
            # NTL wrap) masked to +inf
            for u5, dc in enumerate(range(-_DC_RANGE, _DC_RANGE + 1)):
                if dc == 0:
                    r = cur
                elif dup == 0 and S > 1:
                    # exact wrap must stay in-block: a full-array roll would
                    # read across the block boundary into the next source
                    r = jnp.concatenate(
                        [pltpu.roll(cur[:, b * NTL:(b + 1) * NTL],
                                    (-dc) % NTL, axis=1) for b in range(S)],
                        axis=1)
                else:
                    r = pltpu.roll(cur, (-dc) % NTLT, axis=1)
                    if dup:
                        if dc > 0:
                            r = jnp.where(lane_full >= NTL - dc, inf, r)
                        elif dc < 0:
                            r = jnp.where(lane_full < -dc, inf, r)
                if pre_roll:
                    q_ref[0, pl.ds(u5 * rows5 + pad2, Mp), :] = r
                else:
                    q_ref[pl.ds(u5 * rows5 + pad2, Mp), :] = r
            if pre_roll:
                # all rho sub-shifts applied once per iteration: copy rho
                # [x] = page [x + rho]; slices at the grouped offsets then
                # read q[o + m + rho] with no per-diagonal roll
                for rho in live_rhos:
                    if rho:
                        q_ref[rho] = pltpu.roll(q_ref[0], (-rho) % (5 * rows5),
                                                axis=0)

            def weight_col(j):
                if weight_mode == "transpose":
                    wrow = wpT_ref[pl.ds(j, 1), :]
                    return jnp.swapaxes(wrow, 0, 1)[:Mp, :]
                wg = wp_ref[j // LANES]
                return jnp.min(jnp.where(lane == (j % LANES), wg, inf),
                               axis=1, keepdims=True)

            acc = cur
            for rho in range(SUB):
                lo, hi = rho_starts[rho], rho_starts[rho + 1]
                if lo == hi:
                    continue

                def body(t, acc, rho=rho):
                    # UNROLL diagonals per trip (group sizes are padded to
                    # a multiple of UNROLL with +inf-weight no-ops)
                    for i in range(UNROLL):
                        j = t * UNROLL + i
                        o = pl.multiple_of(o_ref[j], SUB)
                        if pre_roll:
                            src = q_ref[rho, pl.ds(o, Mp), :]
                        else:
                            base = q_ref[pl.ds(o, Mp + SUB), :]
                            src = (base if rho == 0
                                   else pltpu.roll(base, (-rho) % (Mp + SUB),
                                                   axis=0))[:Mp, :]
                        acc = jnp.minimum(acc, src + weight_col(j))
                    return acc

                acc = jax.lax.fori_loop(lo // UNROLL, hi // UNROLL, body, acc)
            return acc

        def merge_dup(acc):
            if not dup:
                return acc
            fwd = jnp.where(lane_full < dup,
                            pltpu.roll(acc, (-nt) % NTLT, axis=1), inf)
            bwd = jnp.where(lane_full >= nt,
                            pltpu.roll(acc, nt, axis=1), inf)
            return jnp.minimum(acc, jnp.minimum(fwd, bwd))

        def iteration(_, carry):
            v, cens = carry
            v = chain_scan(ring_scan(v))
            v = merge_dup(band_sweep(v))
            if S == 1:
                cen = jnp.minimum(cens[0], jnp.min(v + fan))
                return jnp.minimum(v, cen + fan), (cen,)
            # per-source-block centre fan (static NTL-lane slices)
            blocks, new_cens = [], []
            for b in range(S):
                blk = v[:, b * NTL:(b + 1) * NTL]
                cen = jnp.minimum(cens[b], jnp.min(blk + fan))
                new_cens.append(cen)
                blocks.append(jnp.minimum(blk, cen + fan))
            return jnp.concatenate(blocks, axis=1), tuple(new_cens)

        cens0 = tuple(jnp.min(cen_ref[:, b * LANES:(b + 1) * LANES])
                      for b in range(S))
        v, cens = jax.lax.fori_loop(0, iters, iteration,
                                    (dist_ref[:], cens0))
        out_ref[:] = v
        cen_out_ref[:] = jnp.concatenate(
            [jnp.broadcast_to(c, (SUB, LANES)) for c in cens], axis=1)

    return kernel


def _iter_call(ws_static, dist: jax.Array, cen: jax.Array, offs: jax.Array,
               wp: jax.Array, wpT: jax.Array, rf, rb, cfl, cbl, fan,
               iters: int, interpret: bool, S: int = 1,
               weight_mode: str = "reduce", pre_roll: bool = False):
    rho_starts, Mp, NTL, pad2, nt = ws_static
    rows5 = Mp + 2 * pad2
    NTLT = S * NTL
    kernel = _make_iter_kernel(rho_starts, Mp, NTL, pad2, nt, iters, S,
                               weight_mode, pre_roll)

    def vspec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, *_: (0,) * nd,
                            memory_space=pltpu.VMEM)

    qshape = ((SUB, 5 * rows5, NTLT) if pre_roll else (5 * rows5, NTLT))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            vspec(Mp, NTLT), vspec(SUB, S * LANES), vspec(*wp.shape),
            vspec(*wpT.shape),
            vspec(Mp, 1), vspec(Mp, 1),
            vspec(*cfl.shape), vspec(*cbl.shape), vspec(Mp, 1),
        ],
        out_specs=[vspec(Mp, NTLT), vspec(SUB, S * LANES)],
        scratch_shapes=[pltpu.VMEM(qshape, dist.dtype)],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((Mp, NTLT), dist.dtype),
                   jax.ShapeDtypeStruct((SUB, S * LANES), dist.dtype)],
        grid_spec=grid_spec,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(offs, dist, cen, wp, wpT, rf, rb, cfl, cbl, fan)


class WrappedState(NamedTuple):
    dist: jax.Array
    dcen: jax.Array
    changed: jax.Array
    it: jax.Array


def _pipelined_chunk_solve(sources, S: int, n_out: int, dtype, dispatch,
                           device_out: bool = False):
    """Shared chunked-solve protocol of the batched kernels: pad the last
    chunk by repeating its final source, dispatch every chunk
    asynchronously via `dispatch(chunk) -> (S, n_out+1)` (iteration count
    in the last column), then materialise results in a second pass - the
    ~28 ms tunnel round trip is paid once per call, not per chunk.

    device_out=True leaves the distance rows on device (one jax array)
    and pulls only the iteration counts - the parity point of the
    reference GPU solver, whose `bfm_gpu` returns CuArrays without a
    device->host copy (src/SSSP/bfm_gpu.jl:207-247).  The iters pull
    synchronises full convergence (it depends on the whole while_loop);
    the field transfer cost (~15 ms/MB over the tunnel) is paid only by
    consumers that materialise it."""
    pending = []
    for lo in range(0, len(sources), S):
        chunk = sources[lo:lo + S]
        n_real = len(chunk)
        if n_real < S:
            chunk = np.concatenate([chunk, np.full(S - n_real, chunk[-1])])
        pending.append((lo, n_real, dispatch(chunk)))
    if device_out:
        rows = [vals_it[:n_real, :-1] for _, n_real, vals_it in pending]
        dist = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
        # one sync for the whole call: every chunk's iteration count in
        # a single small pull (a second blocking fetch would cost a full
        # extra ~28 ms round trip)
        its = np.asarray(jnp.stack([v[0, -1] for _, _, v in pending]))
        return dist, int(its.max())
    out = np.empty((len(sources), n_out), dtype=dtype)
    iters = 0
    for lo, n_real, vals_it in pending:
        arr = np.asarray(vals_it)
        out[lo:lo + n_real] = arr[:n_real, :-1]
        # chunks converge at different counts; report the slowest
        iters = max(iters, int(arr[0, -1]))
    return out, iters


_EXTRACT_CACHE_MAX = 8  # receiver sets kept per stencil (oldest evicted)


def _extract_cached(dcache: dict, cmap, receivers):
    """(n_out, (m, c, center, valid) device arrays), cached per receiver
    set in the stencil's dcache with a bounded number of entries."""
    rkey = (None if receivers is None
            else np.asarray(receivers, dtype=np.int64).tobytes())
    key = ("extract", rkey)
    if key not in dcache:
        ext = [k for k in dcache if isinstance(k, tuple) and k[0] == "extract"]
        if len(ext) >= _EXTRACT_CACHE_MAX:
            del dcache[ext[0]]
        m_idx, c_idx, center_mask, valid = _node_extract_arrays(cmap, receivers)
        dcache[key] = (len(m_idx), tuple(
            jnp.asarray(a) for a in (m_idx, c_idx, center_mask, valid)))
    return dcache[key]


def _node_extract_arrays(cmap, receivers=None):
    """Index arrays mapping nodes (all, or a receiver subset) into the
    wrapped (Mp, S*NTL) layout, for on-device extraction."""
    if receivers is None:
        sel = np.arange(len(cmap.m_of), dtype=np.int64)
    else:
        sel = np.asarray(receivers, dtype=np.int64).ravel()
    m = cmap.m_of[sel]
    c = cmap.c_of[sel]
    valid = m >= 0
    if cmap.center >= 0:
        center_mask = sel == cmap.center
    else:
        center_mask = np.zeros(len(sel), dtype=bool)
    m_idx = np.where(valid, m, 0).astype(np.int32)
    c_idx = np.where(valid, c, 0).astype(np.int32)
    return m_idx, c_idx, center_mask, valid


@functools.partial(jax.jit, static_argnames=("S", "NTL"))
def _extract_jit(dist2d, cen2d, it, m_idx, c_idx, center_mask, valid,
                 S: int, NTL: int):
    """(S, k+1) node-ordered values gathered on device from the wrapped
    layout, iteration count in the last column - one pull, one tunnel
    round trip (the full-field pull cost ~220 ms for the 8-source
    180x63 block; a separate scalar fetch costs a second round trip)."""
    width = dist2d.shape[1]
    flat = dist2d.reshape(-1)
    base = m_idx * width + c_idx
    inf = jnp.asarray(jnp.inf, dist2d.dtype)
    rows = []
    for b in range(S):
        g = jnp.where(valid, flat[base + b * NTL], inf)
        rows.append(jnp.where(center_mask, cen2d[0, b * LANES], g))
    vals = jnp.stack(rows)
    itcol = jnp.broadcast_to(it.astype(vals.dtype), (S, 1))
    return jnp.concatenate([vals, itcol], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("rho_starts", "Mp", "NTL", "pad2", "nt",
                     "max_iters", "sweeps", "interpret", "S",
                     "weight_mode", "pre_roll"),
)
def _solve_wrapped_jit(dist0, cen0, offs, wp, wpT, rf, rb, cfl, cbl, fan,
                       tol,
                       rho_starts, Mp: int, NTL: int, pad2: int, nt: int,
                       max_iters: int, sweeps: int,
                       interpret: bool, S: int = 1,
                       weight_mode: str = "reduce",
                       pre_roll: bool = False) -> WrappedState:
    ws_static = (rho_starts, Mp, NTL, pad2, nt)
    state = WrappedState(dist0, cen0, jnp.asarray(True), jnp.zeros((), jnp.int32))

    def cond(s: WrappedState):
        return s.changed & (s.it < max_iters)

    def body(s: WrappedState):
        d, cen = _iter_call(ws_static, s.dist, s.dcen, offs, wp, wpT,
                            rf, rb, cfl, cbl, fan, sweeps, interpret, S,
                            weight_mode, pre_roll)
        changed = jnp.any(d < s.dist - tol) | jnp.any(cen < s.dcen - tol)
        return WrappedState(d, cen, changed, s.it + sweeps)

    return jax.lax.while_loop(cond, body, state)


def solve_circulant_wrapped(
    cg: CirculantGraph,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    sweeps_per_call: int = 4,
    interpret: bool = False,
    vertical_closure: int = 0,
    batch: int = 1,
    receivers=None,
    weight_mode: str = "reduce",
    pre_roll: bool = False,
    device_out: bool = False,
    _packed: WrappedStencil = None,
) -> Tuple[np.ndarray, int]:
    """Solve source(s) with the full-iteration wrapped-lane kernel.

    Returns (dist (n_sources, n), iterations); each iteration is one
    complete scans+sweep+fan pass, `sweeps_per_call` of them per kernel
    dispatch.  `batch` > 1 solves that many sources per kernel call,
    side by side as NTL-lane blocks (the last chunk repeats its final
    source to fill).  With `receivers` (node ids), only those columns are
    extracted - returns (n_sources, n_receivers) and pulls kilobytes
    instead of the full field per chunk (the tunnel pull dominates the
    table workload otherwise).  Check `supports_wrapped(cg)` before
    calling; fall back to solve_circulant_diag otherwise.
    """
    if not supports_wrapped(cg):
        raise ValueError("wrapped-lane kernel unsupported for this ntheta; "
                         "use solve_circulant_diag")
    dtype = jnp.dtype(config.dtype)
    ws = _packed if _packed is not None else pack_wrapped_stencil(
        cg, dtype=dtype, vertical_closure=vertical_closure)
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    cmap = cg.cmap
    nt, Mp, NTL = ws.nt, ws.Mp, ws.NTL
    S = max(1, min(batch, len(sources)))

    if "tables" not in ws.dcache:  # cost tables: uploaded once per stencil
        ws.dcache["tables"] = tuple(
            jnp.asarray(a) for a in (ws.offs, ws.wp, ws.wpT, ws.ring_f,
                                     ws.ring_b, ws.cfl, ws.cbl, ws.fan_w))
    offs, wp, wpT, rf, rb, cfl, cbl, fan = ws.dcache["tables"]
    tol = jnp.asarray(config.tol_value(), dtype)

    n_out, (jm, jc, jcm, jv) = _extract_cached(ws.dcache, cmap, receivers)

    def dispatch(chunk):
        dist0 = np.full((Mp, S * NTL), np.inf, dtype=dtype)
        cen0 = np.full((SUB, S * LANES), np.inf, dtype=dtype)
        for b, src in enumerate(chunk):
            if src == cmap.center:
                cen0[:, b * LANES:(b + 1) * LANES] = 0.0
            else:
                m, c = int(cmap.m_of[src]), int(cmap.c_of[src])
                # all duplicate lanes of theta c within block b
                dist0[m, b * NTL + c:(b + 1) * NTL:nt] = 0.0
        st = _solve_wrapped_jit(
            jnp.asarray(dist0), jnp.asarray(cen0), offs, wp, wpT,
            rf, rb, cfl, cbl, fan, tol,
            ws.rho_starts, Mp, NTL, ws.pad2, nt,
            config.max_iters, sweeps_per_call, interpret, S,
            weight_mode, pre_roll,
        )
        return _extract_jit(st.dist, st.dcen, st.it, jm, jc, jcm, jv, S, NTL)

    return _pipelined_chunk_solve(sources, S, n_out, dtype, dispatch,
                                  device_out=device_out)
