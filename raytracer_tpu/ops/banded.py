"""Banded min-plus solver: the fast path for UNSTRUCTURED 2-D meshes.

The general ELL path (solvers/bfm.py) relaxes through `dist0[nbr]`
gathers; on TPU XLA lowers those to serialized scalar gathers
(~0.15 Gelem/s) and no node reordering helps - the Delaunay annulus
(47k nodes) solves in ~4 s (PERF_NOTES.md "Node ordering on TPU").

This module removes the gathers entirely.  After a Reverse Cuthill-McKee
reordering every edge (j -> i) has a small index offset o = j - i
(|o| <= bandwidth; ~630 on the production Delaunay annulus, vs n = 47k),
so the pull-based relaxation

    cand[i] = min over edges (j -> i) of dist[j] + w(j -> i)

becomes a DIAGONAL sweep: for each occupied offset o,

    cand = min(cand, roll(dist, -o) + W[o])

where W[o][i] is the weight of edge (i+o -> i) (+inf where that edge
does not exist).  roll + add + min are native TPU vector ops; the sweep
is a `lax.scan` over offset chunks and the whole solve is one
`lax.while_loop` (convergence on device, exact fixpoint detection).
Wrap-around contamination is impossible: a finite W[o][i] exists only
for a real edge whose endpoint i+o lies in [0, n), which never wraps.

This is where the reference's RCM reordering (src/SSSP/rcm.jl:2-46,
README.md:13 "re-write" TODO) finally pays off on TPU: useless for
gather locality (measured neutral, benchmarks/ordering.py), it is the
enabler here - the diagonal count, i.e. the memory traffic per sweep,
IS the bandwidth RCM minimises.

Predecessors are recovered from the converged field by the existing
host PrevRecovery (ops/circulant.py:381) on the original node order -
the field is the fixpoint, so one argmin pass over the edges yields a
valid shortest-path tree with the same tie-break rule as every other
path.

Replaces: the CUDA relaxation kernel for arbitrary graphs
(src/SSSP/bfm_gpu.jl:487-526) in the regime where no circulant
structure exists (Delaunay meshes, src/SSSP/annulus/mesh.jl).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig

CHUNK = 8  # offsets folded into one scan step (amortises acc read/write)


class BandedGraph(NamedTuple):
    """Frozen banded layout (RCM-permuted node order).

    offs   : (mc, C) int32 diagonal offsets, 0-padded
    W      : (mc, C, n_pad) weights of edge (i+o -> i), +inf where absent
    halo_src/halo_dst : (H,) int32 twin-merge pairs in PERMUTED ids
    perm   : (n,) new -> old node ids;  iperm: old -> new
    n, n_pad : true / padded node counts (static)
    """

    offs: jax.Array
    W: jax.Array
    halo_src: jax.Array
    halo_dst: jax.Array
    perm: np.ndarray
    iperm: np.ndarray
    n: int
    n_pad: int
    offsets_np: np.ndarray = None   # (m,) host copy of the real offsets


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def prepare_banded(
    A: sp.csr_matrix,
    halo: np.ndarray,
    gr,
    U: np.ndarray,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    order: str = "rcm",
) -> BandedGraph:
    """Pack graph + weights into diagonal rows (one-time host step).

    order='rcm' (default) minimises the diagonal count; 'natural' keeps
    the input order (useful to measure what RCM buys).
    """
    from .circulant import csr_edge_weights
    from .graph import rcm_permutation

    dtype = np.dtype(config.dtype)
    n = A.shape[0]
    if order == "rcm":
        perm = rcm_permutation(A)
    elif order == "natural":
        perm = np.arange(n, dtype=np.int64)
    else:
        raise ValueError(f"unknown order {order!r}")
    iperm = np.empty(n, dtype=np.int64)
    iperm[perm] = np.arange(n)

    coo = A.tocoo()
    # weights use ORIGINAL ids (coordinates/velocities are not permuted);
    # csr_edge_weights is pull-form: weight of edge col -> row
    w = csr_edge_weights(gr, coo.row, coo.col, U).astype(dtype)
    rows = iperm[coo.row]
    cols = iperm[coo.col]

    off = cols - rows
    offsets = np.unique(off)
    m = len(offsets)
    mc = _round_up(max(m, 1), CHUNK) // CHUNK
    n_pad = _round_up(n, 512)

    offs = np.zeros((mc * CHUNK,), dtype=np.int32)
    offs[:m] = offsets
    W = np.full((mc * CHUNK, n_pad), np.inf, dtype=dtype)
    oidx = np.searchsorted(offsets, off)
    W[oidx, rows] = w

    halo = np.asarray(halo)
    if halo.size == 0:
        hsrc = np.zeros(8, dtype=np.int32)
        hdst = np.zeros(8, dtype=np.int32)
    else:
        hpad = _round_up(halo.shape[0], 8)
        hsrc = np.zeros(hpad, dtype=np.int32)
        hdst = np.zeros(hpad, dtype=np.int32)
        hsrc[: halo.shape[0]] = iperm[halo[:, 0]]
        hdst[: halo.shape[0]] = iperm[halo[:, 1]]

    return BandedGraph(
        offs=jnp.asarray(offs.reshape(mc, CHUNK)),
        W=jnp.asarray(W.reshape(mc, CHUNK, n_pad)),
        halo_src=jnp.asarray(hsrc),
        halo_dst=jnp.asarray(hdst),
        perm=perm, iperm=iperm, n=n, n_pad=n_pad,
        offsets_np=offsets.astype(np.int64),
    )


def _banded_sweep(dist0: jax.Array, offs: jax.Array, W: jax.Array) -> jax.Array:
    """One full relaxation sweep: min over all diagonals of
    roll(dist0, -o) + W[o].  dist0 may be (n_pad,) or (S, n_pad).

    The roll is realised as one dynamic window slice of a wrap-extended
    copy built ONCE per sweep (a traced-shift `jnp.roll` would rebuild
    its two-slice concat per offset)."""
    n_pad = dist0.shape[-1]
    ext = jnp.concatenate([dist0, dist0], axis=-1)

    def body(acc, xs):
        o_chunk, w_chunk = xs
        for c in range(o_chunk.shape[0]):
            start = jnp.remainder(o_chunk[c], n_pad)
            win = jax.lax.dynamic_slice_in_dim(ext, start, n_pad, axis=-1)
            acc = jnp.minimum(acc, win + w_chunk[c])
        return acc, None

    acc, _ = jax.lax.scan(body, dist0, (offs, W))
    return acc


class BandedState(NamedTuple):
    dist: jax.Array
    changed: jax.Array
    it: jax.Array


@functools.partial(jax.jit, static_argnames=("max_iters", "dtype_name"))
def _solve_banded_jit(offs, W, halo_src, halo_dst, sources, max_iters: int,
                      dtype_name: str):
    """(S,) sources -> (S, n_pad) converged fields + iteration count.

    Exact fixpoint: iterate while any distance strictly improves (the
    monotone label-correcting invariant; no tolerance truncation)."""
    dtype = jnp.dtype(dtype_name)
    n_pad = W.shape[-1]
    S = sources.shape[0]
    inf = jnp.asarray(jnp.inf, dtype)
    dist = jnp.full((S, n_pad), inf, dtype=dtype)
    dist = dist.at[jnp.arange(S), sources].set(0)
    st = BandedState(dist=dist, changed=jnp.asarray(True),
                     it=jnp.zeros((), jnp.int32))

    def cond(s: BandedState):
        return s.changed & (s.it < max_iters)

    def body(s: BandedState):
        acc = _banded_sweep(s.dist, offs, W)
        dist = jnp.minimum(s.dist, acc)
        # twin min-merge (src/SSSP/bfm.jl:54-62); padded rows are (0, 0)
        # self-merges, harmless
        dist = dist.at[:, halo_dst].min(dist[:, halo_src])
        return BandedState(dist=dist,
                           changed=jnp.any(dist < s.dist),
                           it=s.it + 1)

    st = jax.lax.while_loop(cond, body, st)
    # bundle the iteration count into the result: ONE host pull per solve
    return jnp.concatenate(
        [st.dist, jnp.broadcast_to(st.it.astype(dtype), (S, 1))], axis=1)


def solve_banded(
    bg: BandedGraph,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
) -> Tuple[np.ndarray, int]:
    """(S, n) distance fields in ORIGINAL node order + iteration count."""
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    src_p = jnp.asarray(bg.iperm[sources], jnp.int32)
    out = np.asarray(_solve_banded_jit(
        bg.offs, bg.W, bg.halo_src, bg.halo_dst, src_p,
        config.max_iters, config.dtype))
    iters = int(out[0, -1])
    return out[:, :-1][:, bg.iperm], iters


@functools.partial(jax.jit, static_argnames=("offsets", "max_iters",
                                             "dtype_name", "B", "P"))
def _solve_banded_gs_jit(W, halo_src, halo_dst, sources,
                         offsets: Tuple[int, ...], max_iters: int,
                         dtype_name: str, B: int, P: int):
    """Gauss-Seidel block sweeps over the RCM band (directional
    sweeping for unstructured meshes).

    The Jacobi banded solve converges in O(graph diameter in RCM
    levels) iterations (214 on the production Delaunay annulus), each
    reading the full per-offset weight table; here blocks of B rows are
    processed SEQUENTIALLY (ascending = forward sweep, descending =
    backward), so a block's window reads the already-updated
    neighbouring blocks and arrivals cross the whole band in one pass -
    the ops/sweep_theta.py reordering applied to the banded layout.
    Within a block, P passes over all taps re-read the block's own
    updated rows (ext refresh); each tap is one STATIC slice of the
    window + add + min, and the W block is read ONCE per block per
    sweep regardless of P, so a sweep's HBM traffic equals one Jacobi
    sweep.  Fixpoint identical (strict-improvement termination; every
    edge is applied at least once per sweep).  `it` counts fwd+bwd
    ROUNDS."""
    dtype = jnp.dtype(dtype_name)
    m = len(offsets)
    n_pad = W.shape[-1]
    NB = n_pad // B
    K = max(max(abs(o) for o in offsets), 1)
    S = sources.shape[0]
    inf = jnp.asarray(jnp.inf, dtype)
    W2 = W.reshape(-1, n_pad)[:m]

    dist0 = jnp.full((S, n_pad), inf, dtype=dtype)
    dist0 = dist0.at[jnp.arange(S), sources].set(0)

    def sweep(dist, forward: bool):
        buf = jnp.pad(dist, ((0, 0), (K, K)), constant_values=np.inf)

        def body(g, buf):
            b = g * B if forward else (NB - 1 - g) * B
            win = jax.lax.dynamic_slice(buf, (0, b), (S, B + 2 * K))
            wblk = jax.lax.dynamic_slice(W2, (0, b), (m, B))
            cur = win[:, K: K + B]
            for _ in range(P):
                ext = jnp.concatenate(
                    [win[:, :K], cur, win[:, K + B:]], axis=1)
                for t, o in enumerate(offsets):
                    cur = jnp.minimum(cur, ext[:, K + o: K + o + B]
                                      + wblk[t])
            return jax.lax.dynamic_update_slice(buf, cur, (0, b + K))

        buf = jax.lax.fori_loop(0, NB, body, buf)
        return buf[:, K: K + n_pad]

    def merge(d):
        return d.at[:, halo_dst].min(d[:, halo_src])

    def cond(s: BandedState):
        return s.changed & (s.it < max_iters)

    def body(s: BandedState):
        d = merge(sweep(s.dist, True))
        d = merge(sweep(d, False))
        return BandedState(dist=d, changed=jnp.any(d < s.dist),
                           it=s.it + 1)

    st = jax.lax.while_loop(cond, body,
                            BandedState(dist=dist0,
                                        changed=jnp.asarray(True),
                                        it=jnp.zeros((), jnp.int32)))
    return jnp.concatenate(
        [st.dist, jnp.broadcast_to(st.it.astype(dtype), (S, 1))], axis=1)


def solve_banded_gs(
    bg: BandedGraph,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    block: int = 512,
    passes: int = 2,
) -> Tuple[np.ndarray, int]:
    """Directional (Gauss-Seidel) banded solve; same results as
    solve_banded in ~10-50x fewer sweeps.  `iters` counts fwd+bwd
    rounds."""
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    src_p = jnp.asarray(bg.iperm[sources], jnp.int32)
    offsets = tuple(int(o) for o in bg.offsets_np)
    B = block
    while bg.n_pad % B:
        B //= 2
    out = np.asarray(_solve_banded_gs_jit(
        bg.W, bg.halo_src, bg.halo_dst, src_p, offsets,
        config.max_iters, config.dtype, B, passes))
    iters = int(out[0, -1])
    return out[:, :-1][:, bg.iperm], iters
