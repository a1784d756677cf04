"""Tomographic sensitivity kernels: exact d(travel time)/d(velocity).

The reference stops at path recovery (src/SSSP/ssspm.jl:30-40,
main_annulus.jl:80-98) and leaves building inversion kernels to the
user.  Here the derivative is delivered natively: along a recovered
first-arrival path the travel time is t = sum_e 2*L_e/(U_i + U_j)
(the edge weight of ops/weights.py, matching src/SSSP/bfm.jl:137-146),
so

    dt/dU_k = sum over path edges (i,j) incident to k of  -t_e/(U_i+U_j)

exactly - no ray-bending approximation beyond first order (Fermat: the
path itself is stationary, so moving it contributes nothing to first
order).  Scalar-velocity weights are homogeneous of degree -1 in U,
giving the exact identity  sum_k U_k * dt/dU_k = -t  used by the tests.

Host entry points take a single path; the device entry points vmap the
fixed-depth backtrace over receivers and scatter-add per-edge
contributions, returning either a dense (n_rec, n) matrix or padded COO
rows for meshes where dense kernels don't fit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.weights import _coords
from .path import backtrace_paths


def _n_nodes(gr) -> int:
    """Total node count for both grid families (annulus: int nnods;
    Grid3D: tuple nnods + nnods_total)."""
    n = getattr(gr, "nnods_total", None)
    return int(n) if n is not None else int(gr.nnods)


def _twin_partners(n: int, halo) -> np.ndarray:
    """(n, P) padded partner table of the zero-cost twin merge pairs
    (models/annulus.py halo; a node may have several partners).  P=1
    with all -1 when there is no halo, so downstream shapes stay static."""
    halo = np.asarray(halo) if halo is not None else np.empty((0, 2), np.int64)
    if halo.size == 0:
        return np.full((n, 1), -1, np.int32)
    a = np.concatenate([halo[:, 0], halo[:, 1]])
    b = np.concatenate([halo[:, 1], halo[:, 0]])
    counts = np.bincount(a, minlength=n)
    P = max(1, int(counts.max()))
    out = np.full((n, P), -1, np.int32)
    slot = np.zeros(n, np.int64)
    for i, j in zip(a, b):
        out[i, slot[i]] = j
        slot[i] += 1
    return out


def _pair_terms(coords, U, a, b, partners, xp):
    """Per-edge (t_e, 1/(U_a+U_b)) for node-id arrays a, b (same shape);
    zero-length or impassable (usum<=0) pairs contribute 0, and so do
    zero-cost twin-merge hops (the backtrace walks them, but the solver
    charges them nothing - ops/relax.py halo merge)."""
    L2 = None
    for axis in coords:
        axis = xp.asarray(axis)
        d = axis[a] - axis[b]
        L2 = d * d if L2 is None else L2 + d * d
    L = xp.sqrt(L2)
    usum = U[a] + U[b]
    good = usum > 0
    is_twin = (partners[a] == b[..., None]).any(axis=-1)
    inv = xp.where(good & ~is_twin,
                   1.0 / xp.where(good, usum, 1.0), 0.0)
    return 2.0 * L * inv, inv


def path_sensitivity(gr, U: np.ndarray, path: np.ndarray,
                     halo=None) -> np.ndarray:
    """Dense (n,) array dt/dU for one recovered path (node-id sequence
    from `recontruct_path`, receiver..source order).  Scalar U only -
    the README driver convention (src/SSSP/bfm.jl:161-210).  Pass the
    grid's halo so zero-cost twin-merge hops are skipped."""
    U = np.asarray(U, np.float64)
    if U.ndim != 1:
        raise ValueError("path_sensitivity expects scalar velocities (n,); "
                         "use path_sensitivity_dual for (n, 2) duals")
    path = np.asarray(path, np.int64)
    out = np.zeros(U.shape[0])
    if path.size < 2:
        return out
    a, b = path[:-1], path[1:]
    partners = _twin_partners(U.shape[0], halo)
    t_e, inv = _pair_terms(_coords(gr), U, a, b, partners, np)
    np.add.at(out, a, -t_e * inv)
    np.add.at(out, b, -t_e * inv)
    return out


def path_sensitivity_dual(gr, U: np.ndarray, path: np.ndarray,
                          halo=None) -> np.ndarray:
    """Dense (n, 2) array dt/dU for dual (below, above) velocities.

    Edge (tail i, head j=prev[i]) picks head/tail columns by relative
    radius exactly as ops/weights.py::edge_weights_dual
    (src/SSSP/bfm.jl:134-146); the derivative lands only on the two
    picked entries."""
    U = np.asarray(U, np.float64)
    path = np.asarray(path, np.int64)
    out = np.zeros_like(U)
    if path.size < 2:
        return out
    i, j = path[:-1], path[1:]            # dist[i] = dist[j] + w(i<-j)
    head_above = np.asarray(gr.r)[i] > np.asarray(gr.r)[j]
    U_head = np.where(head_above, U[j, 1], U[j, 0])
    U_tail = np.where(head_above, U[i, 0], U[i, 1])
    L2 = None
    for axis in _coords(gr):
        d = np.asarray(axis)[i] - np.asarray(axis)[j]
        L2 = d * d if L2 is None else L2 + d * d
    partners = _twin_partners(U.shape[0], halo)
    is_twin = (partners[i] == j[:, None]).any(axis=1)
    usum = U_head + U_tail
    good = (usum > 0) & ~is_twin
    inv = np.where(good, 1.0 / np.where(good, usum, 1.0), 0.0)
    g = -2.0 * np.sqrt(L2) * inv * inv
    np.add.at(out, (i, np.where(head_above, 0, 1)), g)   # tail column
    np.add.at(out, (j, np.where(head_above, 1, 0)), g)   # head column
    return out


@functools.partial(jax.jit, static_argnames=("max_len",))
def _coo_jit(coords, U, prev, source, receivers, partners, max_len):
    nodes = backtrace_paths(prev, source, receivers, max_len)
    a, b = nodes[:, :-1], nodes[:, 1:]    # padded tail: a==b -> L=0 -> 0
    t_e, inv = _pair_terms(coords, U, a, b, partners, jnp)
    g = -t_e * inv
    ids = jnp.concatenate([a, b], axis=1)
    vals = jnp.concatenate([g, g], axis=1)
    return ids, vals


def sensitivity_coo(gr, U, prev, source, receivers, max_len: int,
                    halo=None):
    """Padded COO kernels on device: (ids, vals) of shape
    (n_rec, 2*(max_len-1)).  Duplicate ids are additive; padding rows
    carry value 0 at the source id.  Scales to meshes where the dense
    (n_rec, n) matrix doesn't fit."""
    coords = tuple(jnp.asarray(c) for c in _coords(gr))
    U = jnp.asarray(U)
    if U.ndim != 1:
        raise ValueError("device sensitivity supports scalar velocities")
    partners = jnp.asarray(_twin_partners(_n_nodes(gr), halo))
    return _coo_jit(coords, U, jnp.asarray(prev), source,
                    jnp.asarray(receivers), partners, max_len)


@functools.partial(jax.jit, static_argnames=("max_len", "n"))
def _dense_jit(coords, U, prev, source, receivers, partners, max_len, n):
    ids, vals = _coo_jit(coords, U, prev, source, receivers, partners,
                         max_len)

    def one(idr, valr):
        return jnp.zeros((n,), vals.dtype).at[idr].add(valr)

    return jax.vmap(one)(ids, vals)


def sensitivity_matrix(gr, U, prev, source, receivers, max_len: int,
                       halo=None):
    """Dense (n_rec, n) tomography matrix G with G[r, k] = dt_r/dU_k,
    built on device (backtrace + scatter-add, one dispatch)."""
    coords = tuple(jnp.asarray(c) for c in _coords(gr))
    U = jnp.asarray(U)
    if U.ndim != 1:
        raise ValueError("device sensitivity supports scalar velocities")
    partners = jnp.asarray(_twin_partners(_n_nodes(gr), halo))
    return _dense_jit(coords, U, jnp.asarray(prev), source,
                      jnp.asarray(receivers), partners, max_len,
                      _n_nodes(gr))
