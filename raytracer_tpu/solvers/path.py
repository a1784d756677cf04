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
