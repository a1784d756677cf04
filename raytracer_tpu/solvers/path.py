"""Ray-path reconstruction by predecessor backtrace.

Host version matches the reference `recontruct_path` (typo preserved for
API parity, src/SSSP/ssspm.jl:30-40).  The device version is a fixed-depth
`lax.scan` prev-pointer walk that vmaps over receivers, for batched path
extraction without leaving the chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def recontruct_path(prev, source: int, receiver: int) -> np.ndarray:
    """Walk prev from receiver until the source; returns node ids.

    Reference: src/SSSP/ssspm.jl:30-40 (with the same source sentinel
    semantics); guards against cycles from unreachable receivers.  An
    unreachable receiver (its predecessor is itself) yields the length-1
    path [receiver] rather than fabricating a receiver->source hop - e.g.
    S-wave receivers shadowed by the liquid outer core.
    """
    prev = np.asarray(prev)
    if int(prev[receiver]) == int(receiver) and int(receiver) != int(source):
        return np.asarray([int(receiver)], dtype=np.int64)
    path = [int(receiver)]
    ipath = int(prev[receiver])
    while ipath != source and ipath != path[-1] and len(path) <= len(prev):
        path.append(ipath)
        ipath = int(prev[ipath])
    path.append(int(source))
    return np.asarray(path, dtype=np.int64)


# alias with the correct spelling
reconstruct_path = recontruct_path


def ray_parameters(points, profile_r, profile_v) -> np.ndarray:
    """(k-1,) spherical ray parameter p = r sin(theta)/v at the segment
    midpoints of a path polyline (cartesian (k, 2) or (k, 3) points,
    theta the angle between the segment and the local radial).

    In a radially stratified model p is CONSTANT along a true ray
    (Benndorf's relation / spherical Snell's law), and equals dt/dDelta
    of the arrival — so the spread of this array measures how far a
    (graph or bent) path is from ray-theoretic, and its value anchors
    against `models.raytheory.first_arrival(..., return_p=True)`.
    Using |mid x seg| = r |seg| sin(theta), p = |mid x seg|/(|seg| v(r)).
    """
    pts = np.asarray(points, np.float64)
    if pts.shape[0] < 2:
        return np.zeros(0)
    a, b = pts[:-1], pts[1:]
    mid, seg = 0.5 * (a + b), b - a
    if pts.shape[1] == 2:
        cross = np.abs(mid[:, 0] * seg[:, 1] - mid[:, 1] * seg[:, 0])
    else:
        cross = np.linalg.norm(np.cross(mid, seg), axis=1)
    r_mid = np.linalg.norm(mid, axis=1)
    v = np.interp(r_mid, np.asarray(profile_r, np.float64),
                  np.asarray(profile_v, np.float64))
    L = np.linalg.norm(seg, axis=1)
    return cross / np.maximum(L * v, 1e-12)


def takeoff_angle(points) -> float:
    """Angle (degrees) between the path's leaving direction at its FIRST
    point and the local upward radial: 0 = straight up, 90 = horizontal,
    180 = straight down.  Pass the polyline receiver-first for the
    incidence angle, source-first (reversed) for the take-off angle."""
    pts = np.asarray(points, np.float64)
    if pts.shape[0] < 2:
        return float("nan")
    d = pts[1] - pts[0]
    rhat = pts[0] / max(np.linalg.norm(pts[0]), 1e-12)
    c = float(np.dot(d, rhat) / max(np.linalg.norm(d), 1e-12))
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def backtrace_paths(prev: jax.Array, source, receivers: jax.Array, max_len: int) -> jax.Array:
    """Device backtrace: (n_receivers, max_len) node-id matrix.

    Entries after the source are padded with the source id; rows are walked
    in parallel with a fixed-depth scan (static shapes, jit/vmap friendly).
    """
    prev = jnp.asarray(prev, dtype=jnp.int32)
    source = jnp.asarray(source, dtype=jnp.int32)

    def walk(node, _):
        nxt = jnp.where(node == source, source, prev[node])
        return nxt, node

    def one(receiver):
        _, nodes = jax.lax.scan(walk, receiver, None, length=max_len)
        return nodes

    return jax.vmap(one)(jnp.asarray(receivers, dtype=jnp.int32))
