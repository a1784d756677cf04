"""Pallas multi-sweep kernel for the 3-D spherical-shell SSSP.

Replaces the XLA 26-roll sweep of solvers/solve3d.py (the legacy CUDA
3-D relaxation's TPU equivalent, reference src/Dijsktra.jl:216-233) on
the hot path.  The (n2, n1, n0) field is flattened to rows = k*n1 + j,
lanes = i; a 26-neighbour tap (dk, dj, di) is then a row shift by
dk*n1 + dj plus a static lane roll by di.  Design:

* T SWEEPS PER DISPATCH over a ping-pong field kept ENTIRELY IN VMEM
  scratch (4 MB at 1M nodes): grid (T+1, NB); round 0 loads the input
  blocks, round t reads page (t-1)%2 and writes page t%2.  The XLA
  while_loop sees one dispatch per T sweeps - no per-sweep glue, no
  per-sweep HBM round trip for the field.
* W STREAMED: the (26, rows, n0) weight array (109 MB at 1M nodes - far
  beyond VMEM) is reshaped host-side to (NB, 26, BR, L0) and
  double-buffered per (round, block) by the BlockSpec pipeline; HBM
  traffic is the floor (~0.16 ms/sweep at 800 GB/s) and overlaps
  compute.
* SELF-MASKING TAPS: W already carries +inf across the non-periodic box
  faces (solve3d._shifted_weights), which is exactly the set of reads
  that would cross a j-row or i-lane boundary under the flat layout's
  rolls - no masks anywhere in the kernel.  Row/lane padding (rows to
  NB*BR, lanes to a 128 multiple) is likewise +inf-weighted, so padded
  positions never produce finite candidates.

Exactness: identical relaxation algebra to solve3d._sweep (each tap is
`existing cost + edge weight`, accumulated by min), so the fixpoint and
the iteration count are unchanged - asserted against the XLA path in
tests/test_sweep3d.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .diag_circulant import LANES, SUB, _round_up

# the 26 taps, same order as solvers/solve3d.SHIFTS
SHIFTS3 = tuple(
    (dk, dj, di)
    for dk in (-1, 0, 1)
    for dj in (-1, 0, 1)
    for di in (-1, 0, 1)
    if (dk, dj, di) != (0, 0, 0)
)


class Sweep3DPlan(NamedTuple):
    """Static layout of the kernel + host-packed streamed weights.

    W4   : (NB, NT, BR, L0) per-block weight slabs (NT=26), +inf padded
    shape: (n2, n1, n0) logical field shape
    """

    W4: np.ndarray
    shape: Tuple[int, int, int]
    n1: int
    BR: int
    NB: int
    L0: int
    H8: int


def plan_sweep3d(W: np.ndarray, block_rows: int = 1024) -> Sweep3DPlan:
    """Pack the (26, n2, n1, n0) weight array for the kernel."""
    NT, n2, n1, n0 = W.shape
    assert NT == len(SHIFTS3)
    rows = n2 * n1
    L0 = _round_up(n0, LANES)
    BR = min(_round_up(rows, SUB), _round_up(block_rows, SUB))
    NB = -(-rows // BR)
    H8 = _round_up(n1 + 1, SUB)
    W4 = np.full((NB, NT, BR, L0), np.inf, dtype=W.dtype)
    Wf = W.reshape(NT, rows, n0)
    for b in range(NB):
        lo = b * BR
        hi = min(rows, lo + BR)
        W4[b, :, : hi - lo, :n0] = Wf[:, lo:hi, :]
    return Sweep3DPlan(W4=W4, shape=(n2, n1, n0), n1=n1, BR=BR, NB=NB,
                       L0=L0, H8=H8)


def _make_sweep3d_kernel(n1: int, BR: int, NB: int, L0: int, H8: int,
                         T: int, S: int = 1):
    """S > 1 batches sources through ONE weight stream: grid gains a
    trailing (fastest-varying) source dimension, so consecutive grid
    steps revisit the same W block and Pallas skips its re-DMA - the
    109 MB/sweep HBM weight traffic is amortised over all S fields
    (each field has its own ping-pong page pair in scratch)."""
    G = H8 + NB * BR + H8  # one ping-pong page: global inf pads + rows

    def kernel(w_ref, din_ref, out_ref, buf_ref):
        t = pl.program_id(0)   # 0 = load round, 1..T = sweep rounds
        b = pl.program_id(1)
        q = pl.program_id(2) if S > 1 else 0   # source slot
        base = q * (2 * G)
        inf = jnp.asarray(jnp.inf, out_ref.dtype)

        @pl.when(t == 0)
        def _load():
            @pl.when(b == 0)
            def _pads():
                pad = jnp.full((H8, L0), inf, out_ref.dtype)
                for page in range(2):
                    buf_ref[pl.ds(base + page * G, H8), :] = pad
                    buf_ref[pl.ds(base + page * G + H8 + NB * BR, H8), :] = pad

            buf_ref[pl.ds(base + H8 + b * BR, BR), :] = din_ref[0, 0]

        @pl.when(t > 0)
        def _sweep():
            # read page (t-1)%2, write page t%2 (fully written last round).
            # ONE aligned dynamic slab read per block; the 26 taps are
            # STATIC (possibly unaligned -> register-level copies) slices
            # of the slab value - dynamic-offset per-tap reads lowered to
            # serialized local DMAs and ran 9x slower.
            src_page = base + ((t - 1) % 2) * G
            dst_page = base + (t % 2) * G
            slab = buf_ref[pl.ds(src_page + b * BR, BR + 2 * H8), :]
            acc = slab[H8:H8 + BR, :]
            for s, (dk, dj, di) in enumerate(SHIFTS3):
                r = dk * n1 + dj
                cand = slab[H8 + r:H8 + r + BR, :]
                if di:
                    cand = pltpu.roll(cand, (-di) % L0, axis=1)
                acc = jnp.minimum(acc, cand + w_ref[0, s])
            buf_ref[pl.ds(dst_page + H8 + b * BR, BR), :] = acc
            out_ref[0, 0] = acc

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n1", "BR", "NB", "L0", "H8", "T",
                                    "interpret"))
def sweep3d_T(dist_flat: jax.Array, W4: jax.Array, n1: int, BR: int,
              NB: int, L0: int, H8: int, T: int,
              interpret: bool = False) -> jax.Array:
    """T relaxation sweeps of the flat (NB*BR, L0) field."""
    out = sweep3d_T_batched(dist_flat[None], W4, n1, BR, NB, L0, H8, T,
                            interpret)
    return out[0]


@functools.partial(jax.jit,
                   static_argnames=("n1", "BR", "NB", "L0", "H8", "T",
                                    "interpret"))
def sweep3d_T_batched(dist_flat: jax.Array, W4: jax.Array, n1: int,
                      BR: int, NB: int, L0: int, H8: int, T: int,
                      interpret: bool = False) -> jax.Array:
    """T relaxation sweeps of S flat fields (S, NB*BR, L0) sharing one
    pass of the streamed weights per sweep (see _make_sweep3d_kernel)."""
    assert T >= 1, "needs at least one sweep round (out is only written in rounds t >= 1)"
    S = dist_flat.shape[0]
    kernel = _make_sweep3d_kernel(n1, BR, NB, L0, H8, T, S)
    G = H8 + NB * BR + H8
    din = dist_flat.reshape(S, NB, BR, L0)

    grid = (T + 1, NB) if S == 1 else (T + 1, NB, S)
    if S == 1:
        w_map = lambda t, b: (b, 0, 0, 0)
        f_map = lambda t, b: (0, b, 0, 0)
    else:
        # source fastest: consecutive steps keep the same W block resident
        w_map = lambda t, b, q: (b, 0, 0, 0)
        f_map = lambda t, b, q: (q, b, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,) + W4.shape[1:], w_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BR, L0), f_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, BR, L0), f_map,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S * 2 * G, L0), dist_flat.dtype)],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, NB, BR, L0), dist_flat.dtype),
        grid_spec=grid_spec,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",) * len(grid),
        ),
        interpret=interpret,
    )(W4, din)
    return out.reshape(S, NB * BR, L0)


def pack_field(dist3: jax.Array, plan: Sweep3DPlan) -> jax.Array:
    """(n2, n1, n0) -> padded flat (NB*BR, L0), +inf in the padding."""
    n2, n1, n0 = plan.shape
    rows = n2 * n1
    flat = dist3.reshape(rows, n0)
    return jnp.pad(flat,
                   ((0, plan.NB * plan.BR - rows), (0, plan.L0 - n0)),
                   constant_values=jnp.inf)


def unpack_field(flat: jax.Array, plan: Sweep3DPlan) -> jax.Array:
    n2, n1, n0 = plan.shape
    return flat[: n2 * n1, :n0].reshape(n2, n1, n0)
