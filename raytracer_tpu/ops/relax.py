"""Device-side BFM relaxation step (pure jnp reference implementation).

One iteration of the frontier-masked Bellman-Ford-Moore sweep, the TPU
equivalent of the reference's threaded/CUDA kernels:
  relax      <- src/SSSP/bfm.jl:100-210, bfm_gpu.jl:487-526
  halo merge <- src/SSSP/bfm.jl:54-62,  bfm_gpu.jl:281-296
  update_Q   <- src/SSSP/bfm.jl:82-98,  bfm_gpu.jl:390-410

Pull-based: every node takes the min over its ELL neighbour slots of
(neighbour distance + precomputed edge weight); race-free by construction.
The whole step is static-shape and fuses under jit; the Pallas kernel in
pallas_relax.py is a drop-in replacement for the gather+min.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class DeviceGraph(NamedTuple):
    """Frozen device arrays for one solve configuration.

    nbr      : (n_pad, K) int32 ELL neighbour ids (self-pointing padding)
    w        : (n_pad, K) edge weights, +inf on padding
    halo_src : (H,) int32 twin-merge source ids (padded with 0)
    halo_dst : (H,) int32 twin-merge destination ids (padded with 0)
    n        : true node count (static)
    """

    nbr: jax.Array
    w: jax.Array
    halo_src: jax.Array
    halo_dst: jax.Array
    n: int


class BFMState(NamedTuple):
    dist: jax.Array   # (n_pad,) current travel times
    prev: jax.Array   # (n_pad,) int32 predecessor ids
    front: jax.Array  # (n_pad,) bool frontier mask Q
    it: jax.Array     # iteration counter


def relax_dense(dist0: jax.Array, nbr: jax.Array, w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """min over neighbour slots of dist0[nbr] + w -> (best_dist, best_prev)."""
    cand = dist0[nbr] + w                      # (n_pad, K)
    kmin = jnp.argmin(cand, axis=1)
    best = jnp.take_along_axis(cand, kmin[:, None], axis=1)[:, 0]
    pbest = jnp.take_along_axis(nbr, kmin[:, None], axis=1)[:, 0]
    return best, pbest


def halo_merge(dist: jax.Array, prev: jax.Array, dist0: jax.Array,
               halo_src: jax.Array, halo_dst: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Twin-node min-merge (src/SSSP/bfm.jl:54-62), deterministic.

    For each halo row (s, d): if dist[s] improved this iteration and is
    better than dist[d], pull it (and its predecessor) into d.  Multiple
    rows targeting the same d resolve to the min via scatter-min.
    """
    inf = jnp.asarray(jnp.inf, dist.dtype)
    cond = (dist[halo_src] < dist0[halo_src]) & (dist[halo_dst] > dist[halo_src])
    cand = jnp.where(cond, dist[halo_src], inf)
    dist_new = dist.at[halo_dst].min(cand)
    # rows whose candidate won the scatter-min update the predecessor too
    won = cond & (dist_new[halo_dst] == cand)
    n_pad = dist.shape[0]
    dst_or_dummy = jnp.where(won, halo_dst, n_pad - 1)
    prev_new = prev.at[dst_or_dummy].set(jnp.where(won, prev[halo_src], prev[n_pad - 1]))
    return dist_new, prev_new


def bfm_step(state: BFMState, g: DeviceGraph) -> BFMState:
    """One full BFM iteration: relax frontier, halo merge, rebuild frontier."""
    dist0, prev, Q = state.dist, state.prev, state.front

    best, pbest = relax_dense(dist0, g.nbr, g.w)
    upd = Q & (best < dist0)
    dist = jnp.where(upd, best, dist0)
    prev = jnp.where(upd, pbest, prev)

    dist, prev = halo_merge(dist, prev, dist0, g.halo_src, g.halo_dst)

    improved = dist < dist0
    Q_new = improved | improved[g.nbr].any(axis=1)

    return BFMState(dist=dist, prev=prev, front=Q_new, it=state.it + 1)


def init_state(g: DeviceGraph, source: jax.Array, dtype) -> BFMState:
    """Initial distances/frontier/predecessors (src/SSSP/bfm.jl:12-23,64-80).

    Frontier starts as the source's neighbourhood (incl. itself); halo twin
    pairs pre-point at each other as in init_halo_path!.
    """
    n_pad = g.nbr.shape[0]
    inf = jnp.asarray(jnp.inf, dtype)
    dist = jnp.full((n_pad,), inf, dtype=dtype).at[source].set(0)
    prev = jnp.arange(n_pad, dtype=jnp.int32).at[g.halo_dst].set(g.halo_src.astype(jnp.int32))
    front = jnp.zeros((n_pad,), dtype=bool)
    front = front.at[g.nbr[source]].set(True)
    front = front.at[source].set(True)
    return BFMState(dist=dist, prev=prev, front=front, it=jnp.zeros((), jnp.int32))
