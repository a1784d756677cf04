"""Does node (re)ordering pay on the TPU ELL path? (VERDICT r1 item 8)

The reference gets ~2x from Cuthill-McKee on CPU and GPU
(BASELINE.md:28: 180x63 1-thread 19.70 -> 9.25 s CPU, 3.94 -> 1.61 s GPU)
because its relaxation is cache-/coalescing-bound.  The TPU ELL path's
gathers are issue-bound (XLA serializes scalar gathers at ~0.15 Gelem/s
regardless of address locality; PERF_NOTES.md platform table), so the
prediction is that reordering is NEUTRAL on TPU.  This script measures
it: same graph, same solve, natural vs tile-blocked vs RCM node order.

The headline annulus solvers don't use the ELL path (the circulant layout
already *is* a global reordering by (slot, theta)); the ELL path serves
the Delaunay mesher and small 3-D fallbacks, so the measurement uses the
Delaunay annulus - the one production ELL consumer.

Result is recorded in PERF_NOTES.md; the ordering helpers stay exported
(`rcm_permutation`, `tile_permutation`, `permute_graph`) as graph
utilities with parity to src/SSSP/rcm.jl.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


class _PermutedCoords:
    """Coordinate view of a grid under a node permutation."""

    def __init__(self, gr, perm):
        self.x = np.asarray(gr.x)[perm]
        self.z = np.asarray(gr.z)[perm]
        y = getattr(gr, "y", None)
        self.y = None if y is None else np.asarray(y)[perm]


def solve_time(A, halo, gr, U, source, reps=3):
    import raytracer_tpu as rt
    from raytracer_tpu.config import SolverConfig
    from raytracer_tpu.solvers.bfm import prepare, solve

    cfg = SolverConfig(dtype="float32")
    g = prepare(A, halo, gr, U, cfg)
    D = solve(g, source, cfg)  # compile
    times = []
    for _ in range(reps):
        t0 = time.time()
        D = solve(g, source, cfg)
        times.append(time.time() - t0)
    return float(np.min(times)), D.dist


def main():
    import raytracer_tpu as rt
    from raytracer_tpu.config import R
    from raytracer_tpu.models.annulus import node_adjacency
    from raytracer_tpu.models.delaunay import add_midpoints, triangle_annulus_2d
    from raytracer_tpu.ops.graph import permute_graph, rcm_permutation, tile_permutation

    gr = add_midpoints(triangle_annulus_2d(nr=60, spacing=120.0))
    A = node_adjacency(gr, star=0)
    halo = np.empty((0, 2), np.int64)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    source = rt.closest_point(gr, 0.0, R, system="polar")
    log(f"delaunay annulus: {gr.nnods} nodes, {A.nnz} edges")

    t_nat, d_nat = solve_time(A, halo, gr, U, source)
    log(f"natural order:    {t_nat*1e3:8.1f} ms")

    for name, permfn in (("tile", lambda: tile_permutation(gr)),
                         ("rcm", lambda: rcm_permutation(A))):
        perm = permfn()
        iperm = np.empty_like(perm)
        iperm[perm] = np.arange(len(perm))
        Ap = permute_graph(A, perm)
        halop = iperm[np.asarray(halo)] if np.asarray(halo).size else halo
        t_p, d_p = solve_time(Ap, halop, _PermutedCoords(gr, perm), U[perm], iperm[source])
        ok = np.allclose(d_p[iperm], d_nat, atol=1e-3)
        log(f"{name:>8} order:   {t_p*1e3:8.1f} ms   (dist match: {ok})  "
            f"{'SPEEDUP' if t_p < 0.9*t_nat else 'neutral' if t_p < 1.1*t_nat else 'SLOWER'}")
        assert ok, f"{name} permutation changed the solution"

    # the round-3 conclusion: reordering cannot help the gathers, but it
    # can ELIMINATE them - the RCM-banded diagonal sweep (ops/banded.py)
    from raytracer_tpu.config import SolverConfig
    from raytracer_tpu.ops.banded import prepare_banded, solve_banded

    cfg = SolverConfig(dtype="float32")
    bg = prepare_banded(A, halo, gr, U, cfg)
    d_b, _ = solve_banded(bg, [source], cfg)  # compile
    times = []
    for _ in range(3):
        t0 = time.time()
        d_b, it_b = solve_banded(bg, [source], cfg)
        times.append(time.time() - t0)
    ok = np.allclose(d_b[0], d_nat, atol=1e-3)
    log(f"  banded (rcm):   {min(times)*1e3:8.1f} ms   (dist match: {ok})  "
        f"{t_nat/min(times):.1f}x vs natural ELL, {it_b} iters, "
        f"{bg.offs.size} diagonals")
    assert ok, "banded sweep changed the solution"
    srcs8 = list(range(0, 8 * 101, 101))
    solve_banded(bg, srcs8, cfg)  # compile batched
    t0 = time.time()
    solve_banded(bg, srcs8, cfg)
    log(f"  banded 8-src:   {(time.time()-t0)/8*1e3:8.1f} ms/source "
        f"(weight stream shared across the batch)")


if __name__ == "__main__":
    main()
