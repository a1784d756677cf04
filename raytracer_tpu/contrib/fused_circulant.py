"""Fully-fused circulant BFM solver: the whole while_loop in ONE kernel.

Third-generation TPU kernel.  The per-iteration XLA glue of the grid
kernel (rolled-stack build, scan dispatches, convergence check - ~2 ms of
the ~2.6 ms iteration) disappears: the distance state lives in VMEM
scratch for the entire solve, each iteration

  1. rebuilds the 5 theta-rolled copies in scratch (static row-slice
     concats per source block),
  2. runs truncated Hillis-Steele min-plus scans: circular along theta
     (uniform per-slot hop cost, doubling shifts 1..2^R_STEPS) and linear
     along the slot axis (precomputed jump-cost tables, shifts 1..64 so
     sources stay within the adjacent slot tile),
  3. relaxes every dst tile with the dynamic lane-gather loop,
  4. min-exchanges the core-centre row block with its fan,
  5. sets an SMEM convergence flag by comparing against the previous
     state.

The scans are *accelerators*: they only relax real graph edges, so
truncating their shift range affects iteration count, never the fixpoint.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT_SOLVER_CONFIG, SolverConfig
from ..ops.circulant import CirculantGraph, _DC_RANGE
from .pallas_circulant import TiledStencil, pack_tiled_stencil, LANES  # noqa: F401

RING_STEPS = 8    # theta shifts 1..128 columns per iteration
CHAIN_STEPS = 7   # slot shifts 1..64 (within the adjacent lane tile)


def _chain_jump_tables(chain_w: np.ndarray, T: int) -> Tuple[np.ndarray, np.ndarray]:
    """P_dn[k, m] = cost m-2^k -> m; P_up[k, m] = cost m+2^k -> m."""
    m_pad = T * LANES
    cw = chain_w.astype(np.float64)
    p_dn = np.full((CHAIN_STEPS, m_pad), np.inf)
    p_up = np.full((CHAIN_STEPS, m_pad), np.inf)
    # cumulative with inf-propagation via padded prefix sums on log scale:
    # build iteratively: jump of 2^(k+1) = jump 2^k twice
    d1 = np.full(m_pad, np.inf)
    d1[1:] = cw[:-1]           # cost (m-1 -> m)
    u1 = cw.copy()             # cost (m+1 -> m)
    p_dn[0], p_up[0] = d1, u1
    for k in range(1, CHAIN_STEPS):
        s = 1 << (k - 1)
        prev_d = p_dn[k - 1]
        shifted = np.full(m_pad, np.inf)
        shifted[s:] = prev_d[:-s]
        p_dn[k] = shifted + prev_d          # (m-2s -> m-s) + (m-s -> m)
        prev_u = p_up[k - 1]
        shifted = np.full(m_pad, np.inf)
        shifted[:-s] = prev_u[s:]
        p_up[k] = shifted + prev_u
    return p_dn, p_up


def _make_fused_kernel(groups, T: int, nt: int, ntp: int, S: int, max_iters: int, dtype):
    SR = S * ntp
    nsh = 5 * T

    def kernel(offs_ref, u_of_ref, state_in, cen_in, idx_ref, w_ref,
               ring_ref, pdn_ref, pup_ref, fan_ref,
               out_state, out_cen, R, old, sem_unused_none=None):
        # R: (5T, SR, 128) rolled scratch; old: (T, SR, 128) scratch
        out_state[...] = state_in[...]
        out_cen[...] = cen_in[...]

        def body(carry):
            it, _ = carry

            # ---- snapshot for the convergence check ----
            for t in range(T):
                old[t] = out_state[t]
            old_cen0 = out_cen[0, 0, 0]

            # ---- ring scan (circular, uniform cost, doubling) ----
            for t in range(T):
                rw = ring_ref[t]                      # (128,)
                for s in range(S):
                    blk = out_state[t, s * ntp:s * ntp + nt]
                    cost = rw[None, :].astype(dtype)
                    shift = 1
                    for _k in range(RING_STEPS):
                        sh = shift % nt
                        if sh != 0:  # static skip: whole-ring shifts are no-ops
                            fwd = jnp.concatenate([blk[sh:], blk[:sh]], axis=0)
                            bwd = jnp.concatenate([blk[nt - sh:], blk[:nt - sh]], axis=0)
                            blk = jnp.minimum(blk, jnp.minimum(fwd, bwd) + cost * shift)
                        shift *= 2
                    out_state[t, s * ntp:s * ntp + nt] = blk

            # ---- chain scan (linear along slots, shifts 1..64) ----
            for k in range(CHAIN_STEPS):
                s = 1 << k
                # downward: d[m] = min(d[m], d[m-s] + P_dn[k][m])
                tiles = [out_state[t] for t in range(T)]
                for t in range(T - 1, -1, -1):
                    cur = tiles[t]
                    prev = tiles[t - 1] if t > 0 else jnp.full_like(cur, jnp.inf)
                    shifted = jnp.concatenate([prev[:, LANES - s:], cur[:, :LANES - s]], axis=1)
                    out_state[t] = jnp.minimum(cur, shifted + pdn_ref[k, t][None, :])
                # upward: d[m] = min(d[m], d[m+s] + P_up[k][m])
                tiles = [out_state[t] for t in range(T)]
                for t in range(T):
                    cur = tiles[t]
                    nxt = tiles[t + 1] if t < T - 1 else jnp.full_like(cur, jnp.inf)
                    shifted = jnp.concatenate([cur[:, s:], nxt[:, :s]], axis=1)
                    out_state[t] = jnp.minimum(cur, shifted + pup_ref[k, t][None, :])

            # ---- rebuild rolled copies ----
            for di, d in enumerate(range(-_DC_RANGE, _DC_RANGE + 1)):
                for t in range(T):
                    x = out_state[t]
                    if d == 0:
                        R[di * T + t] = x
                    else:
                        # want rolled[c] = x[c + d] (match jnp.roll(x, -d))
                        sh = d % nt
                        parts = []
                        for s in range(S):
                            blk = x[s * ntp:s * ntp + nt]
                            rolled = jnp.concatenate([blk[sh:], blk[:sh]], axis=0)
                            if ntp != nt:
                                rolled = jnp.concatenate(
                                    [rolled, jnp.full((ntp - nt, LANES), jnp.inf, dtype)], axis=0
                                )
                            parts.append(rolled)
                        R[di * T + t] = jnp.concatenate(parts, axis=0) if S > 1 else parts[0]

            # ---- relaxation sweep ----
            for t in range(T):
                acc0 = R[_DC_RANGE * T + t]

                def gather_body(k, acc):
                    u = u_of_ref[k]
                    g = jnp.take_along_axis(
                        R[u], jnp.broadcast_to(idx_ref[k][None, :], (SR, LANES)), axis=1
                    )
                    return jnp.minimum(acc, g + w_ref[k][None, :])

                out_state[t] = jax.lax.fori_loop(offs_ref[t], offs_ref[t + 1], gather_body, acc0)

            # ---- centre fan exchange ----
            fan_mins = []
            for t in range(T):
                fan_mins.append(jnp.min(out_state[t] + fan_ref[t][None, :], axis=1))  # (SR,)
            cand_cen = functools.reduce(jnp.minimum, fan_mins)                         # (SR,)
            new_cen_rows = []
            for s in range(S):
                mval = jnp.minimum(jnp.min(cand_cen[s * ntp:s * ntp + nt]), out_cen[0, s * ntp, 0])
                new_cen_rows.append(jnp.full((ntp, 1), mval, dtype))
            new_cen = jnp.concatenate(new_cen_rows, axis=0) if S > 1 else new_cen_rows[0]
            out_cen[0] = new_cen
            for t in range(T):
                out_state[t] = jnp.minimum(out_state[t], new_cen + fan_ref[t][None, :])

            # ---- convergence ----
            changed = out_cen[0, 0, 0] < old_cen0
            for t in range(T):
                changed = changed | jnp.any(out_state[t] < old[t])
            return it + 1, changed

        def cond(carry):
            it, changed = carry
            return changed & (it < max_iters)

        jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), jnp.asarray(True)))

    return kernel


@functools.partial(jax.jit, static_argnames=("T", "nt", "ntp", "S", "max_iters", "dtype_name", "interpret"))
def _fused_jit(offs, u_of, state0, cen0, idx, w, ring_w, pdn, pup, fan_w,
               T: int, nt: int, ntp: int, S: int, max_iters: int, dtype_name: str,
               interpret: bool):
    dtype = jnp.dtype(dtype_name)
    SR = S * ntp
    kernel = _make_fused_kernel(None, T, nt, ntp, S, max_iters, dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((5 * T, SR, LANES), dtype),
            pltpu.VMEM((T, SR, LANES), dtype),
        ],
    )
    out_state, out_cen = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, SR, LANES), dtype),
            jax.ShapeDtypeStruct((1, SR, 1), dtype),
        ),
        grid_spec=grid_spec,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(offs, u_of, state0, cen0, idx, w, ring_w, pdn, pup, fan_w)
    return out_state, out_cen


def solve_circulant_fused(
    cg: CirculantGraph,
    sources,
    config: SolverConfig = DEFAULT_SOLVER_CONFIG,
    interpret: bool = False,
) -> Tuple[np.ndarray, int]:
    """Solve via the fused whole-loop kernel -> (dist (S, n), iters=-1).

    The iteration count stays on-device (the convergence flag is internal);
    -1 is returned in its place.
    """
    dtype = jnp.dtype(config.dtype)
    ts = pack_tiled_stencil(cg, dtype=dtype)
    cmap = cg.cmap
    T, nt, M = ts.T, ts.ntheta, ts.M
    ntp = -(-nt // 8) * 8
    sources = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    S = len(sources)
    SR = S * ntp

    state0 = np.full((T, SR, LANES), np.inf, dtype=dtype)
    cen0 = np.full((1, SR, 1), np.inf, dtype=dtype)
    for si, src in enumerate(sources):
        if src == cmap.center:
            cen0[0, si * ntp:(si + 1) * ntp, 0] = 0.0
        else:
            c, m = int(cmap.c_of[src]), int(cmap.m_of[src])
            state0[m // LANES, si * ntp + c, m % LANES] = 0.0

    pdn, pup = _chain_jump_tables(ts.chain_w.astype(np.float64), T)
    out_state, out_cen = _fused_jit(
        jnp.asarray(ts.offs), jnp.asarray(ts.u_of),
        jnp.asarray(state0), jnp.asarray(cen0),
        jnp.asarray(ts.idx), jnp.asarray(ts.w),
        jnp.asarray(ts.ring_w),
        jnp.asarray(pdn.reshape(CHAIN_STEPS, T, LANES).astype(dtype)),
        jnp.asarray(pup.reshape(CHAIN_STEPS, T, LANES).astype(dtype)),
        jnp.asarray(ts.fan_w),
        T, nt, ntp, S, config.max_iters, config.dtype, interpret,
    )
    dist3 = np.asarray(out_state)      # (T, SR, 128)
    cen = np.asarray(out_cen)[0, :, 0]
    out = np.empty((S, cg.n), dtype=dist3.dtype)
    valid = cmap.m_of >= 0
    m = cmap.m_of[valid]
    c = cmap.c_of[valid]
    for si in range(S):
        out[si, valid] = dist3[m // LANES, si * ntp + c, m % LANES]
        if cmap.center >= 0:
            out[si, cmap.center] = cen[si * ntp]
    return out, -1
