"""Observability tests: per-iteration stats."""
import numpy as np

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.ops.circulant import build_circulant, solve_circulant
from raytracer_tpu.utils.profiling import iteration_stats


def test_iteration_stats_matches_fused_solve(tiny_annulus, tiny_velocity):
    gr, A, halo = tiny_annulus
    cfg = SolverConfig(dtype="float64")
    cg = build_circulant(gr, A, halo, tiny_velocity, dtype=np.float64)
    src = rt.closest_point(gr, 0.0, R, system="polar")
    stats = iteration_stats(cg, src, cfg)
    _, iters = solve_circulant(cg, src, cfg)
    # host-stepped iteration count equals the fused while_loop count
    assert abs(len(stats) - iters) <= 1
    # improvement counts decay to zero at convergence
    assert stats[-1].improved_nodes == 0
    assert stats[0].improved_nodes > 0
