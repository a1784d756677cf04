"""Pallas TPU kernel for the circulant BFM relaxation.

The replacement for the reference's CUDA relaxation kernel family
(src/SSSP/bfm_gpu.jl:487-526 etc.), built on the circulant stencil of
ops/circulant.py.

Layout: distance state is (T, S*ntheta_pad, 128) - slot tiles x (source
batch x theta rows) x slot lanes.  One kernel invocation performs a full
relaxation sweep:

  for every dst tile t:  acc = min over stencil slots k of
      lane_gather(rolled_src_tile(u), idx[k]) + w[k]

where the per-(dst-tile, src-tile) group structure is *static* (baked into
the kernel at trace time from the verified stencil), the lane-gather is
Mosaic's per-lane `take_along_axis`, and the 5 theta-rolled copies of the
state (dc in -2..2) are prepared at the XLA level per iteration (cheap
dense rolls).  Measured lane-gather cost is flat in rows (~0.9 us/op on
v5e regardless of 8..736 rows), so batching S sources along rows divides
the per-source cost by S.

Two accelerators wrap the kernel at the jnp level:
  * ring scan: an exact circular min-plus `associative_scan` along theta
    for every slot that has a same-slot neighbour in the adjacent column -
    propagates along rings across ALL columns in one step, cutting the
    iteration count from O(ntheta) to O(radial diameter);
  * centre fan: dense masked min exchange with the core-centre scalar.
Both only apply valid graph relaxations, so the fixpoint is unchanged.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig
from ..ops.circulant import CirculantGraph, _DC_RANGE

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class TiledStencil:
    """Static-tile grouped stencil for the Pallas kernel.

    groups[t] = list of (u, offset, count): dst tile t gathers `count`
    k-slots starting at `offset` in idx/w from rolled-source tile u, where
    u = (dc + 2) * T + src_tile.
    idx : (K_tot, 128) int32 lane ids into the source tile
    w   : (K_tot, 128) float32 weights (+inf padding)
    ring_w : (T, 128) float32 same-slot adjacent-column weight (+inf where
             no ring edge exists) for the ring-scan accelerator
    chain_w: (M_pad,) float32 same-column next-slot (m -> m+1) edge weight
             (+inf where absent) for the radial slot-scan accelerator
    fan_w  : (T, 128) float32 centre<->slot weights (+inf off the fan)
    """

    groups: Tuple[Tuple[Tuple[int, int, int], ...], ...]
    idx: np.ndarray
    w: np.ndarray
    offs: np.ndarray    # (T+1,) int32 row range of each dst tile in idx/w
    u_of: np.ndarray    # (K_tot,) int32 rolled-source tile of each row
    ring_w: np.ndarray
    chain_w: np.ndarray
    fan_w: np.ndarray
    T: int
    M: int
    ntheta: int


def pack_tiled_stencil(cg: CirculantGraph, dtype=np.float32) -> TiledStencil:
    """Group the per-slot stencil by (dst tile, rolled-source tile)."""
    M, K = cg.src_flat.shape
    nt = cg.ntheta
    T = _round_up(M, LANES) // LANES

    flat = cg.src_flat.astype(np.int64)
    w = cg.w.astype(np.float64)
    valid = np.isfinite(w)

    dc = flat // M - _DC_RANGE
    m_src = flat % M
    s_tile = m_src // LANES
    s_lane = m_src % LANES
    u = (dc + _DC_RANGE) * T + s_tile

    m_dst = np.repeat(np.arange(M), K).reshape(M, K)
    t_dst = m_dst // LANES
    l_dst = m_dst % LANES

    # ring weights: same-slot neighbour one column over (dc == +1)
    ring_w = np.full((T, LANES), np.inf)
    ring_hit = valid & (dc == 1) & (m_src == m_dst)
    rr, kk = np.nonzero(ring_hit)
    ring_w[rr // LANES, rr % LANES] = w[rr, kk]

    # slot-chain weights: same-column edge to the NEXT slot (m -> m+1);
    # consecutive slots in (r, theta-offset) order snake radially through
    # each column, so a min-plus scan along m propagates radially
    chain_w = np.full(_round_up(M, LANES), np.inf)
    chain_hit = valid & (dc == 0) & (m_src == m_dst + 1)
    rr, kk = np.nonzero(chain_hit)
    chain_w[rr] = w[rr, kk]

    # fan weights per (tile, lane)
    fan_w = np.full((T, LANES), np.inf)
    fan_w[cg.fan_slots // LANES, cg.fan_slots % LANES] = cg.fan_w

    idx_rows: List[np.ndarray] = []
    w_rows: List[np.ndarray] = []
    groups: List[List[Tuple[int, int, int]]] = []
    offset = 0
    for t in range(T):
        tmask = valid & (t_dst == t)
        groups_t: List[Tuple[int, int, int]] = []
        for uu in np.unique(u[tmask]):
            gmask = tmask & (u == uu)
            lanes = l_dst[gmask]
            srcl = s_lane[gmask]
            ww = w[gmask]
            cnt = np.bincount(lanes, minlength=LANES)
            kmax = int(cnt.max())
            gidx = np.zeros((kmax, LANES), dtype=np.int32)
            gw = np.full((kmax, LANES), np.inf)
            order = np.argsort(lanes, kind="stable")
            lanes_s, srcl_s, ww_s = lanes[order], srcl[order], ww[order]
            starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            krow = np.arange(len(lanes_s)) - starts[lanes_s]
            gidx[krow, lanes_s] = srcl_s
            gw[krow, lanes_s] = ww_s
            idx_rows.append(gidx)
            w_rows.append(gw)
            groups_t.append((int(uu), offset, kmax))
            offset += kmax
        groups.append(groups_t)

    idx_all = np.concatenate(idx_rows) if idx_rows else np.zeros((0, LANES), np.int32)
    w_all = np.concatenate(w_rows) if w_rows else np.zeros((0, LANES))
    offs = np.zeros(T + 1, dtype=np.int32)
    u_of = np.zeros(len(idx_all), dtype=np.int32)
    for t, groups_t in enumerate(groups):
        offs[t + 1] = offs[t] + sum(cnt for (_, _, cnt) in groups_t)
        for (uu, off, cnt) in groups_t:
            u_of[off:off + cnt] = uu
    return TiledStencil(
        groups=tuple(tuple(g) for g in groups),
        idx=idx_all.astype(np.int32),
        w=w_all.astype(dtype),
        offs=offs,
        u_of=u_of,
        ring_w=ring_w.astype(dtype),
        chain_w=chain_w.astype(dtype),
        fan_w=fan_w.astype(dtype),
        T=T,
        M=M,
        ntheta=nt,
    )


def _make_relax_kernel(T: int, SR: int):
    """One relaxation sweep, one grid step per dst tile.

    Fully dynamic (group structure arrives as scalar-prefetch arrays), so
    the Mosaic program is tiny and compile time does not scale with the
    stencil: offs[t]..offs[t+1] index the k-rows of this tile, u_of[k]
    selects the rolled-source tile of each row.
    """

    def kernel(offs_ref, u_of_ref, R_ref, idx_ref, w_ref, out_ref):
        t = pl.program_id(0)
        acc0 = R_ref[_DC_RANGE * T + t]  # dc=0 copy of tile t == old dist

        def body(k, acc):
            u = u_of_ref[k]
            idx_row = idx_ref[k]
            w_row = w_ref[k]
            g = jnp.take_along_axis(
                R_ref[u], jnp.broadcast_to(idx_row[None, :], (SR, LANES)), axis=1
            )
            return jnp.minimum(acc, g + w_row[None, :])

        out_ref[0] = jax.lax.fori_loop(offs_ref[t], offs_ref[t + 1], body, acc0)

    return kernel


def _relax_pallas(dist: jax.Array, offs: jax.Array, u_of: jax.Array, T: int, nt: int,
                  idx: jax.Array, w: jax.Array,
                  S: int, ntp: int, interpret: bool = False) -> jax.Array:
    """dist: (T, S, ntp, 128) -> one relaxation sweep (same shape)."""
    SR = S * ntp

    # build the 5 theta-rolled copies; rolls only touch the real nt rows
    body = dist[:, :, :nt]
    rolled = [jnp.roll(body, -d, axis=2) for d in range(-_DC_RANGE, _DC_RANGE + 1)]
    R = jnp.stack(rolled, axis=0)  # (5, T, S, nt, 128)
    if ntp != nt:
        pad = jnp.full((5, T, S, ntp - nt, LANES), jnp.inf, dist.dtype)
        R = jnp.concatenate([R, pad], axis=3)
    R = R.reshape(5 * T, SR, LANES)

    kernel = _make_relax_kernel(T, SR)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,      # offs, u_of
        grid=(T,),
        in_specs=[
            pl.BlockSpec((5 * T, SR, LANES), lambda t, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((idx.shape[0], LANES), lambda t, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w.shape[0], LANES), lambda t, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SR, LANES), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, SR, LANES), dist.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offs, u_of, R, idx, w)
    return out.reshape(T, S, ntp, LANES)


def _ring_scan(dist: jax.Array, ring_w: jax.Array, nt: int) -> jax.Array:
    """Exact circular min-plus relaxation along every ring (both ways).

    dist: (T, S, ntp, 128); ring_w: (T, 128) per-slot adjacent-column hop
    cost (+inf where the ring is broken).  With a UNIFORM per-hop cost c
    along each ring the min-plus scan has a closed form in cumulative
    mins:  fwd_i = min(prefmin_i(d_j - j c) + i c,
                       suffmin_i(d_j - j c) + (nt + i) c)
    (the second term is the seam-crossing path), so the whole scan is four
    cummins + elementwise arithmetic - no associative_scan, no doubling.
    Broken rings (c = +inf) are masked back to the input.
    """
    body = dist[:, :, :nt]                                   # (T,S,nt,128)
    finite = jnp.isfinite(ring_w)
    c = jnp.where(finite, ring_w, 0.0)[:, None, None, :]     # safe arithmetic
    j = jnp.arange(nt, dtype=dist.dtype)[None, None, :, None]
    base = body - j * c

    def one_direction(b):
        pref = jax.lax.cummin(b, axis=2)
        suff = jnp.flip(jax.lax.cummin(jnp.flip(b, axis=2), axis=2), axis=2)
        inner = pref + j * c
        wrap = suff + (nt + 0.0) * c + j * c
        return jnp.minimum(inner, wrap)

    fwd = one_direction(base)
    # backward direction: relabel the ring in reverse
    base_r = jnp.flip(body, axis=2) - j * c
    bwd = jnp.flip(one_direction(base_r), axis=2)

    out = jnp.minimum(body, jnp.minimum(fwd, bwd))
    out = jnp.where(finite[:, None, None, :], out, body)
    if dist.shape[2] != nt:
        out = jnp.concatenate([out, dist[:, :, nt:]], axis=2)
    return out


def _slot_scan(dist: jax.Array, chain_w: jax.Array) -> jax.Array:
    """Min-plus scan along the slot axis (radial snake chains per column).

    dist: (T, S, ntp, 128); chain_w: (M_pad,) cost of the same-column edge
    slot m -> m+1 (+inf where the chain is broken).  Linear (not circular).

    Two-stage formulation that avoids the (slot-major) transpose: an
    associative min-plus scan along the LANE axis inside each tile, then a
    tiny sequential cross-tile carry (T steps) using precomputed in-tile
    prefix costs.  +inf chain breaks propagate exactly through the cost
    sums.
    """
    T, S, ntp, _ = dist.shape
    cw = chain_w.reshape(T, LANES)

    def combine(a, b):
        (sa, ma), (sb, mb) = a, b
        return sa + sb, jnp.minimum(ma + sb, mb)

    def directional(x, cost_in, bridge, cum):
        # x: (T,S,ntp,128) scanned left-to-right along lanes;
        # cost_in[t, l] = cost entering lane l from lane l-1 (inf at l=0);
        # bridge[t] = cost from tile t-1's last lane into tile t's lane 0;
        # cum[t, l] = in-tile cost from lane 0 to lane l (cum[t,0] = 0).
        cb = jnp.broadcast_to(cost_in[:, None, None, :], x.shape)
        _, d1 = jax.lax.associative_scan(combine, (cb, x), axis=3)
        tiles = [d1[0]]
        for t in range(1, T):
            carry = tiles[t - 1][:, :, LANES - 1] + bridge[t]      # (S, ntp)
            tiles.append(jnp.minimum(d1[t], carry[:, :, None] + cum[t][None, None, :]))
        return jnp.stack(tiles, axis=0)

    # forward (downward, increasing m)
    costF = jnp.concatenate([jnp.full((1,), jnp.inf, cw.dtype), chain_w[:-1]]).reshape(T, LANES)
    costF = costF.at[:, 0].set(jnp.inf)
    cumF = jnp.cumsum(costF.at[:, 0].set(0.0), axis=1)
    bridgeF = jnp.concatenate([jnp.full((1,), jnp.inf, cw.dtype), cw[:-1, LANES - 1]])
    fwd = directional(dist, costF, bridgeF, cumF)

    # backward (upward, decreasing m): scan the lane/tile-flipped arrays.
    # Moving from flipped position q-1 (slot M-q) to q (slot M-1-q) crosses
    # edge (M-1-q, M-q), i.e. cost_in_flipped[q] = flip(chain_w)[q].
    xr = jnp.flip(dist, axis=(0, 3))
    flipf = jnp.flip(chain_w).reshape(T, LANES)
    bridgeB = jnp.concatenate([jnp.full((1,), jnp.inf, cw.dtype), flipf[1:, 0]])
    costB = flipf.at[:, 0].set(jnp.inf)
    cumB = jnp.cumsum(flipf.at[:, 0].set(0.0), axis=1)
    bwd = jnp.flip(directional(xr, costB, bridgeB, cumB), axis=(0, 3))

    return jnp.minimum(dist, jnp.minimum(fwd, bwd))


class PallasCircState(NamedTuple):
    dist: jax.Array   # (T, S, ntp, 128)
    dcen: jax.Array   # (S,)
    changed: jax.Array
    it: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=("T", "nt", "S", "ntp", "max_iters", "ring_every", "interpret"),
)
def _solve_pallas_jit(dist0, dcen0, idx, w, offs, u_of, ring_w, chain_w, fan_w, tol,
                      T: int, nt: int, S: int, ntp: int, max_iters: int, ring_every: int,
                      interpret: bool) -> PallasCircState:
    state = PallasCircState(dist0, dcen0, jnp.asarray(True), jnp.zeros((), jnp.int32))

    def cond(s: PallasCircState):
        return s.changed & (s.it < max_iters)

    def scans(x):
        return _slot_scan(_ring_scan(x, ring_w, nt), chain_w)

    def body(s: PallasCircState):
        d = s.dist
        if ring_every == 1:
            d = scans(d)
        elif ring_every > 1:
            d = jax.lax.cond(s.it % ring_every == 0, scans, lambda x: x, d)
        d = _relax_pallas(d, offs, u_of, T, nt, idx, w, S, ntp, interpret)
        # centre fan exchange (masked dense ops; fan_w is +inf off-fan)
        fanned = d + fan_w[:, None, None, :]
        dcen = jnp.minimum(s.dcen, fanned.min(axis=(0, 2, 3)))
        d = jnp.minimum(d, s.dcen[None, :, None, None] + fan_w[:, None, None, :])
        changed = jnp.any(d < s.dist - tol) | jnp.any(dcen < s.dcen - tol)
        return PallasCircState(d, dcen, changed, s.it + 1)

    return jax.lax.while_loop(cond, body, state)


def solve_circulant_pallas(
    cg: CirculantGraph,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    ring_every: int = 1,
    interpret: bool = False,
) -> Tuple[np.ndarray, int]:
    """Solve a batch of sources with the Pallas circulant kernel.

    Returns (dist (S, n), iterations).  Sources batch along the kernel's
    row axis, amortising the flat per-gather cost.
    """
    dtype = jnp.dtype(config.dtype)
    ts = pack_tiled_stencil(cg, dtype=dtype)
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    S = len(sources)
    nt, T, M = ts.ntheta, ts.T, ts.M
    ntp = _round_up(nt, 8)
    cmap = cg.cmap

    dist0 = np.full((T, S, ntp, LANES), np.inf, dtype=dtype)
    dcen0 = np.full((S,), np.inf, dtype=dtype)
    for si, src in enumerate(sources):
        if src == cmap.center:
            dcen0[si] = 0.0
        else:
            c, m = int(cmap.c_of[src]), int(cmap.m_of[src])
            dist0[m // LANES, si, c, m % LANES] = 0.0

    st = _solve_pallas_jit(
        jnp.asarray(dist0), jnp.asarray(dcen0),
        jnp.asarray(ts.idx), jnp.asarray(ts.w),
        jnp.asarray(ts.offs), jnp.asarray(ts.u_of),
        jnp.asarray(ts.ring_w), jnp.asarray(ts.chain_w), jnp.asarray(ts.fan_w),
        jnp.asarray(config.tol_value(), dtype),
        T, nt, S, ntp, config.max_iters, ring_every, interpret,
    )
    dist4 = np.asarray(st.dist)   # (T, S, ntp, 128)
    out = np.empty((S, cg.n), dtype=dist4.dtype)
    valid = cmap.m_of >= 0
    m = cmap.m_of[valid]
    c = cmap.c_of[valid]
    out[:, valid] = dist4[m // LANES, :, c, m % LANES].T
    if cmap.center >= 0:
        out[:, cmap.center] = np.asarray(st.dcen)
    return out, int(st.it)
