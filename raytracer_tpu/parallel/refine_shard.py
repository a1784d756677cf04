"""Sharded bending refinement: the bias-free table's bend stage over a
device mesh.

The bending optimiser (solvers/refine.py) is the wall-clock-dominant
stage of the refined travel-time table (benchmarks/results_tables_tpu
.csv: ~95% of the 19.3 s/source is Adam steps on the path fan) and is
embarrassingly parallel over paths: every path's carry is independent,
so the fan shards over the mesh's source axis with ZERO collectives -
the same scaling axis (and the same `shard_map` discipline) as the raw
sharded tables in parallel/multisource.py.  Each device runs the
identical chunked scan program on its local path block; the chunked
dispatch structure (solvers/refine.py::_chunked_bend) is preserved, so
per-dispatch device time stays bounded on real chips.

No reference counterpart: the reference has neither bending refinement
nor any distributed runtime (SURVEY.md sections 2, 5).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import R
from ..solvers.refine import (
    _BEND_CHUNK,
    _bend_final_vjit,
    _bend_init_vjit,
    _bend_scan_vjit,
    _uniform_slowness,
    resample_path,
)
from .mesh import SOURCE_AXIS, make_mesh


def refine_paths_sharded(paths: Sequence[np.ndarray], profile_r, profile_v,
                         mesh: Optional[Mesh] = None, m: int = 128,
                         iters: int = 800, lr: float = 3.0, quad: int = 8,
                         chunk: int = _BEND_CHUNK):
    """(points, times) like solvers/refine.refine_paths_batch, with the
    path fan sharded over `mesh`'s source axis (padded to a multiple of
    the mesh size by repeating the last path; padding rows dropped on
    return)."""
    mesh = mesh if mesh is not None else make_mesh()
    nd = int(np.prod(mesh.devices.shape))
    stacked = np.stack([resample_path(np.asarray(p, np.float64), m)
                        for p in paths])
    B0 = stacked.shape[0]
    rem = (-B0) % nd
    if rem:
        stacked = np.concatenate(
            [stacked, np.repeat(stacked[-1:], rem, axis=0)])
    r0, inv_dr, tab = _uniform_slowness(profile_r, profile_v)
    prof = (jnp.asarray(r0), jnp.asarray(inv_dr), tab)
    rmax = jnp.asarray(float(R))
    lrf = float(lr)

    init = jax.jit(jax.shard_map(
        lambda Pq, pr: _bend_init_vjit(Pq, pr, lrf, quad),
        mesh=mesh,
        in_specs=(P(SOURCE_AXIS), P()),
        out_specs=P(SOURCE_AXIS),
        check_vma=False,
    ))

    def make_scan(n):
        return jax.jit(jax.shard_map(
            lambda c, pr, rm: _bend_scan_vjit(c, pr, lrf, rm, n, quad),
            mesh=mesh,
            in_specs=(P(SOURCE_AXIS), P(), P()),
            out_specs=P(SOURCE_AXIS),
            check_vma=False,
        ))

    final = jax.jit(jax.shard_map(
        lambda c, pr: _bend_final_vjit(c, pr, quad),
        mesh=mesh,
        in_specs=(P(SOURCE_AXIS), P()),
        out_specs=P(SOURCE_AXIS),
        check_vma=False,
    ))

    carry = init(jnp.asarray(stacked), prof)
    scans = {}
    done = 0
    while done < iters:
        n = min(chunk, iters - done)
        if n not in scans:
            scans[n] = make_scan(n)
        carry = scans[n](carry, prof, rmax)
        done += n
    Pts, t = final(carry, prof)
    return np.asarray(Pts)[:B0], np.asarray(t)[:B0]
