"""SSSP result containers (reference: src/SSSP/ssspm.jl:1-12).

Each solver returns `prev` (predecessor ids) and `dist` (travel times).
NamedTuples so they are JAX pytrees and can cross jit/vmap boundaries.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class BellmanFordMoore(NamedTuple):
    prev: np.ndarray
    dist: np.ndarray


class Dijkstra(NamedTuple):
    prev: np.ndarray
    dist: np.ndarray


class RadiusStepping(NamedTuple):
    prev: np.ndarray
    dist: np.ndarray
