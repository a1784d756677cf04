"""Device-mesh helpers.

The reference has no distributed runtime (Threads.@threads + single-GPU
CUDA only, SURVEY.md section 5); the TPU-native scaling axis is the
*source batch*: embarrassingly parallel SSSP solves sharded over a 1-D
device mesh with zero collectives inside the relaxation loop.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


SOURCE_AXIS = "sources"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the given) devices along the source axis."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (SOURCE_AXIS,))


def source_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(SOURCE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_sources(sources: np.ndarray, n_devices: int) -> np.ndarray:
    """Pad the source list to a multiple of the mesh size (repeat last)."""
    sources = np.asarray(sources, dtype=np.int32)
    rem = (-len(sources)) % n_devices
    if rem:
        sources = np.concatenate([sources, np.full(rem, sources[-1], np.int32)])
    return sources
