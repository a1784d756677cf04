"""Throughput accounting per solver engine (VERDICT r04 item 6).

For each (grid, engine) pair this measures the MARGINAL per-iteration
device cost (two forced-iteration solves, tol=-1 so nothing converges,
steady-state wall-clocks differenced - the fixed dispatch/tunnel
overhead cancels exactly) and combines it with

  * the directed stencil edge count of the grid (finite circulant
    weights x ntheta + centre-fan edges), giving edge-relaxations/s;
  * a per-iteration HBM byte model counting full-field passes and
    weight streams from the ACTUAL device array shapes each engine
    uses (documented per engine below), giving achieved GB/s, % of the
    v5e HBM roofline (~819 GB/s), and the multiple of the measured XLA
    row-gather rate (~96 GB/s, PERF_NOTES.md) the engine achieves by
    NOT gathering.

Byte models (per round/iteration; each full-field min-plus pass
`v = min(v, roll(v) + c)` is counted as 2 field reads + 1 write - XLA
fuses the roll into the read, so this is the true traffic; the model
ignores O(ML) cost-row reads, < 0.1% of a field pass):

  * sweep (pallas hclosure round, ops/sweep_theta.py:811-839):
    fan (3 passes) + down & up Pallas radial sweeps (field window
    (MT+K8, NTL) read+written + the wtab stream each) + 2x ring/chain
    scans (2*ceil(log2 nt) ring + 2*len(chain_spans) chain passes each)
    + 2x hscan (per level and sign: one padded span-roll copy build +
    (2*h_cap+1) read-add-min taps over one resident copy ~ 5 passes) +
    seamfix (~2 narrow passes, ignored) + changed-reduce (1 read).
  * stream (Jacobi iteration, ops/stream_t.py:306-392): ring scan
    (2*ceil(log2 nt) passes) + chain scan (2*len(chain_spans) passes) +
    band (5 dc-page roll builds = read+write each, then the Pallas
    kernel reads 5 pages + streams wrows + writes the field) + fan/
    gate/changed (~4 passes).
  * twrapped (ops/wrapped_t.py): the whole state lives in VMEM across
    T in-kernel iterations; HBM traffic per iteration ~ 0 - the kernel
    is VPU/VREG-issue bound, so no HBM roofline applies and only
    edge-relaxations/s is reported.

Usage: python benchmarks/roofline.py [config_index ...]  (default all)
Writes benchmarks/roofline.csv and prints a markdown table to stdout.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig

HBM_GBPS = 819.0     # v5e HBM peak
GATHER_GBPS = 96.0   # measured XLA row-gather rate (PERF_NOTES.md)

CONFIGS = [(180, 63, 20.0), (2160, 600, 10.0), (8640, 2400, 5.0)]
# forced round/iteration pairs per engine (static max_iters -> 2 compiles)
FORCED = {"sweep": (6, 12), "stream": (64, 128), "twrapped": (64, 128)}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def edge_count(cg) -> int:
    """Directed stencil edges: finite per-column weights x ntheta + fan."""
    per_col = int(np.isfinite(cg.w).sum())
    fan = int(np.isfinite(np.asarray(cg.fan_w)).sum()) if cg.fan_w is not None else 0
    return per_col * cg.ntheta + 2 * fan


def bytes_per_iter(cg, engine: str, dtype=np.float32) -> tuple:
    """(bytes, note) per-iteration HBM byte model from real shapes."""
    from raytracer_tpu.ops.wrapped_t import pack_twrapped_stencil

    isz = np.dtype(dtype).itemsize
    if engine == "twrapped":
        return 0.0, "VMEM-resident"
    if engine == "sweep":
        from raytracer_tpu.ops.sweep_theta import (pack_rsweep_tables,
                                                   pack_sweep_tables)

        ws = pack_twrapped_stencil(cg, dtype=np.dtype(dtype), band_closure=0)
        tbl, static = pack_sweep_tables(ws, cg, np.dtype(dtype))
        (wtab_dn, wtab_up), rst = pack_rsweep_tables(ws, cg, np.dtype(dtype))
        field = static.nt * static.ML * isz
        window = (rst.MT + rst.K8) * rst.NTL * isz
        ring = 2 * int(np.ceil(np.log2(static.nt)))
        chain = 2 * len(static.chain_spans)
        hlev = len(static.h_spans)
        passes = 3 + 2 * (ring + chain) * 3 + 2 * hlev * 2 * 5 + 1
        b = (passes * field
             + 2 * (2 * window + wtab_dn.nbytes))
        note = (f"{passes} field passes + 2 kernel windows "
                f"({window/2**20:.0f} MB) + wtabs")
        return float(b), note
    if engine == "stream":
        from raytracer_tpu.ops.stream_t import _stream_tables

        ws = pack_twrapped_stencil(cg, dtype=np.dtype(dtype))
        tbl, st = _stream_tables(ws, np.dtype(dtype))
        field = st.nt * st.ML * isz
        ring = 2 * int(np.ceil(np.log2(st.nt)))
        chain = 2 * len(st.chain_spans)
        passes = (ring + chain) * 3 + 5 * 2 + 4
        b = passes * field + 5 * field + tbl.wrows.nbytes + field
        note = (f"{passes}+6 field passes + wrows "
                f"({tbl.wrows.nbytes/2**20:.0f} MB)")
        return float(b), note
    raise ValueError(engine)


def marginal_per_iter(gr, cg, engine, n1, n2, src):
    """seconds/iteration via two forced-iteration solves."""
    times = {}
    for n in (n1, n2):
        cfg = SolverConfig(dtype="float32", tol=-1.0, max_iters=n)
        solver = rt.AnnulusSolver(gr, None, None, None, cfg, method=engine,
                                  circulant=cg)
        t0 = time.time()
        solver.solve(src, want_prev=False, device_dist=True)  # compile
        log(f"    {engine} forced {n}: compile+1st {time.time()-t0:.1f}s "
            f"(iters={solver.last_iterations})")
        assert solver.last_iterations == n, \
            f"forced loop stopped at {solver.last_iterations} != {n}"
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            solver.solve(src, want_prev=False, device_dist=True)
            best = min(best, time.time() - t0)
        times[n] = best
        log(f"    {engine} forced {n}: steady {best*1e3:.1f} ms")
    return (times[n2] - times[n1]) / (n2 - n1)


def main():
    sel = [int(a) for a in sys.argv[1:] if not a.startswith("-")] or list(
        range(len(CONFIGS)))
    rows = []
    for ci in sel:
        ntheta, nr, spacing = CONFIGS[ci]
        t0 = time.time()
        gr, cg, U = rt.init_annulus_circulant(ntheta, nr, spacing=spacing)
        log(f"--- {ntheta}x{nr} sp{spacing:g} nodes={gr.nnods} "
            f"build {time.time()-t0:.1f}s")
        src = rt.closest_point(gr, 0.0, R, system="polar")
        edges = edge_count(cg)
        engines = ["sweep", "stream"] + (["twrapped"] if gr.nnods < 350_000
                                         else [])
        for engine in engines:
            probe = rt.AnnulusSolver(gr, None, None, None,
                                     SolverConfig(dtype="float32"),
                                     method=engine, circulant=cg)
            if probe.method != engine:
                log(f"  {engine}: unavailable (-> {probe.method}); skipped")
                continue
            n1, n2 = FORCED[engine]
            t_it = marginal_per_iter(gr, cg, engine, n1, n2, src)
            b_it, note = bytes_per_iter(cg, engine)
            gbps = b_it / t_it / 1e9 if b_it else float("nan")
            rows.append({
                "ntheta": ntheta, "nr": nr, "nodes": gr.nnods,
                "engine": engine, "edges": edges,
                "ms_per_iter": round(t_it * 1e3, 3),
                "edge_relax_per_s": f"{edges / t_it:.3e}",
                "model_GB_per_iter": round(b_it / 1e9, 4) if b_it else 0,
                "achieved_GBps": (round(gbps, 1) if b_it else ""),
                "pct_hbm_roofline": (round(100 * gbps / HBM_GBPS, 1)
                                     if b_it else ""),
                "x_gather_rate": (round(gbps / GATHER_GBPS, 1) if b_it else ""),
                "byte_model": note,
            })
            log(f"  {engine}: {t_it*1e3:.2f} ms/iter, "
                f"{edges/t_it:.2e} edge-relax/s"
                + (f", {gbps:.0f} GB/s = {100*gbps/HBM_GBPS:.0f}% HBM"
                   if b_it else " (VMEM-resident, no HBM term)"))

    import csv

    if not rows:
        sys.exit("no engine produced a row (all unavailable on this "
                 "platform); leaving roofline.csv untouched")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "roofline.csv")
    with open(out, "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=list(rows[0]))
        wr.writeheader()
        wr.writerows(rows)
        f.write(
            "# achieved_GBps is the BYTE MODEL's traffic divided by the\n"
            "# measured marginal iteration time; values above the 819 GB/s\n"
            "# physical peak mean the modelled passes are actually served\n"
            "# from VMEM between fused ops (the model upper-bounds HBM\n"
            "# traffic) - the engine is pass-count-bound there, not\n"
            "# HBM-bound.  Interpretation per engine: PERF_NOTES.md\n"
            "# 'Round 5: throughput accounting'.\n")
    print(f"wrote {out}")
    print("| grid | nodes | engine | ms/iter | edge-relax/s | GB/s "
          "| % HBM peak |")
    print("|" + "---|" * 7)
    for r in rows:
        print(f"| {r['ntheta']}x{r['nr']} | {r['nodes']:,} | {r['engine']} "
              f"| {r['ms_per_iter']} | {r['edge_relax_per_s']} "
              f"| {r['achieved_GBps']} | {r['pct_hbm_roofline']} |")


if __name__ == "__main__":
    main()
