"""Multi-source travel-time table benchmarks (BASELINE configs #4, #5).

Times the 64-source surface-source table on the 180x63 AK135 annulus
(the reference has no multi-source mode at all - benchmarks/gpu.jl:61-63
reruns single solves serially) and the multi-source 3-D solve, writing
benchmarks/results_tables_tpu.csv.

Usage: python benchmarks/tables.py [--skip-3d] [--out CSV]
"""
import argparse
import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_table_64(rows, root, cache_dir):
    import raytracer_tpu as rt
    from raytracer_tpu.config import R, SolverConfig
    from raytracer_tpu.utils.cache import init_annulus_cached

    gr, A, halo = init_annulus_cached(180, 63, spacing=20.0, cache_dir=cache_dir)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cfg = SolverConfig(dtype="float32")
    degs = np.linspace(0.0, 357.0, 64)
    sources = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    rec_degs = np.arange(2.0, 150.0, 2.0)
    receivers = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
                 for d in rec_degs]

    for method, batch in (("twrapped", 8), ("sweep", 8), ("wrapped", 8)):
        solver = rt.AnnulusSolver(gr, A, halo, U, cfg, method=method,
                                  cache_dir=cache_dir)
        if solver.method != method:
            log(f"{method}: unavailable (fell back to {solver.method}); skipped")
            continue
        solver.travel_time_table(sources[:batch], receivers, batch=batch)  # compile
        dt = float("inf")
        for _ in range(2):
            t0 = time.time()
            table = solver.travel_time_table(sources, receivers, batch=batch)
            dt = min(dt, time.time() - t0)
        assert table.shape == (64, len(receivers)) and np.isfinite(table).all()
        log(f"{method} S={batch}: 64-source table {dt:.2f}s = {dt/64*1e3:.0f} ms/source")
        rows.append({
            "workload": "64-source travel-time table (BASELINE #4)",
            "config": f"180x63 AK135, {len(receivers)} receivers, {method} S={batch} batches",
            "ms_per_source": round(dt / 64 * 1e3),
            "total_s": round(dt, 2),
            "iters": solver.last_iterations,
            "notes": "batched source blocks; includes all host pulls",
        })


def bench_multistage(rows, root, cache_dir):
    """Multi-stage (bfm_ms) and PcP phase solves at the production mesh
    - the solver family that previously ran only on the ~100x-slower
    ELL path (round-2 verdict weak point 2)."""
    import raytracer_tpu as rt
    from raytracer_tpu.config import R, SolverConfig
    from raytracer_tpu.solvers.multiphase import bfm_ms
    from raytracer_tpu.solvers.phases import reflected_travel_times
    from raytracer_tpu.utils.cache import init_annulus_cached

    gr, A, halo = init_annulus_cached(180, 63, spacing=20.0, cache_dir=cache_dir)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cfg = SolverConfig(dtype="float32")
    src = rt.closest_point(gr, 0.0, R, system="polar")

    reuse = {}
    t0 = time.time()
    bfm_ms(A, halo, src, gr, U, cfg, method="stream",
           want_prev=False, _reuse=reuse)  # pack + compile
    t_setup = time.time() - t0
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        D = bfm_ms(A, halo, src, gr, U, cfg, method="stream",
                   want_prev=False, _reuse=reuse)
        dt = min(dt, time.time() - t0)
    assert np.isfinite(D.dist).sum() > 0
    log(f"bfm_ms stream (180x63, down+up stages): {dt*1e3:.0f} ms "
        f"(one-time pack+compile {t_setup:.1f}s)")
    rows.append({
        "workload": "multi-stage BFM (bfm_ms, down+up level sweep)",
        "config": "180x63 AK135, circulant staged fast path, 1 source",
        "ms_per_source": round(dt * 1e3),
        "total_s": round(dt, 3),
        "iters": "",
        "notes": "both stages in one device dispatch (level-masked "
                 "streamed solve); one-time host pack ~3 s amortised "
                 "via _reuse; the ELL path took ~10s+ per solve",
    })

    reuse_p = {}
    t0 = time.time()
    reflected_travel_times(A, halo, src, gr, U, "cmb", cfg,
                           _reuse=reuse_p)  # pack + compile
    t_setup = time.time() - t0
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        pcp = reflected_travel_times(A, halo, src, gr, U, "cmb", cfg,
                                     _reuse=reuse_p)
        dt = min(dt, time.time() - t0)
    surf = gr.r == gr.r.max()
    assert np.isfinite(pcp[surf]).all()
    log(f"PcP phase solve (180x63): {dt*1e3:.0f} ms "
        f"(one-time pack+compile {t_setup:.1f}s)")
    rows.append({
        "workload": "named-phase PcP (mantle leg + CMB reflection leg)",
        "config": "180x63 AK135, solvers/phases.py, 1 source",
        "ms_per_source": round(dt * 1e3),
        "total_s": round(dt, 3),
        "iters": "",
        "notes": "two region-masked stages, one dispatch; one-time host "
                 "pack amortised via _reuse; curve vs reflected-branch "
                 "ray theory in ACCURACY.md",
    })


def bench_3d(rows, root, cache_dir):
    """BASELINE config #5: AK135 multi-source on a 1M-node spherical wedge."""
    import raytracer_tpu as rt
    from raytracer_tpu.config import R
    from raytracer_tpu.models.grid3d import grid3d
    from raytracer_tpu.solvers.solve3d import prepare3d, solve3d
    from raytracer_tpu.utils.coords import spherical2cart
    from raytracer_tpu.config import SolverConfig

    nt, npn, nr = 128, 128, 64
    c0 = (np.deg2rad(60.0), np.deg2rad(60.0), R - 2500.0)
    c1 = (np.deg2rad(120.0), np.deg2rad(120.0), R)
    g = grid3d(c0, c1, (nt, npn, nr))
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = interp(g.r)
    cfg = SolverConfig(dtype="float32")
    packed = prepare3d(g, U, cfg)
    # 64 surface sources spread over the wedge interior
    ss = [(a, b) for a in np.linspace(66.0, 114.0, 8)
          for b in np.linspace(66.0, 114.0, 8)]
    sources = [rt.closest_point3d(g, *spherical2cart(np.deg2rad(a), np.deg2rad(b), R))
               for a, b in ss]
    # receiver grid: every 4th surface node (32 x 32 = 1024 receivers);
    # only these columns ever cross the device->host boundary
    n0, n1, n2 = g.nnods
    ii, jj = np.meshgrid(np.arange(0, n0, 4), np.arange(0, n1, 4))
    receivers = ((n2 - 1) * n1 * n0 + jj.ravel() * n0 + ii.ravel()).astype(np.int64)
    notes = {
        "pallas": "Pallas multi-sweep kernel (ops/sweep3d.py), auto source "
                  "batching (7 fields share each 109 MB weight stream per "
                  "sweep); receiver-only device->host pulls, iteration count "
                  "bundled (one pull per group); no reference numbers exist "
                  "(legacy CUDA 3-D was removed upstream)",
        "sweep": "directional plane sweeps (solve3d engine='sweep', "
                 "source_batch=8): iters counts triaxial GS rounds",
    }
    for engine, kw in (("pallas", {}), ("sweep", {"source_batch": 8})):
        try:
            solve3d(g, U, sources[:8], cfg, _packed=packed, engine=engine,
                    receivers=receivers, **kw)  # compile
            dt = float("inf")
            for _ in range(2):
                t0 = time.time()
                table, iters = solve3d(g, U, sources, cfg, _packed=packed,
                                       engine=engine, receivers=receivers,
                                       **kw)
                dt = min(dt, time.time() - t0)
        except Exception as e:  # noqa: BLE001
            log(f"3-D engine={engine} skipped: {type(e).__name__}: {e}")
            continue
        assert table.shape == (64, len(receivers)) and np.isfinite(table).all()
        log(f"3-D {g.nnods_total} nodes, {len(sources)} sources "
            f"[{engine}]: {dt:.2f}s ({dt/len(sources)*1e3:.0f} ms/source, "
            f"{iters} iters)")
        rows.append({
            "workload": "multi-source 3-D table (BASELINE #5)",
            "config": f"{nt}x{npn}x{nr} spherical wedge ({g.nnods_total:,} nodes), "
                      f"AK135 Vp, 64 sources x {len(receivers)} surface receivers, "
                      f"solve3d engine={engine}",
            "ms_per_source": round(dt / len(sources) * 1e3),
            "total_s": round(dt, 2),
            "iters": iters,
            "notes": notes[engine],
        })




def bench_refined_table(rows, root, cache_dir):
    """Bias-free (bending-refined) travel-time table as a first-class
    chip workload (VERDICT r04 item 5): 64 sources x 74 receivers,
    pipeline = sweep solve + device prev recovery + host backtrace +
    ONE vmapped bending dispatch per source (refine.py).  Also reports
    the accuracy of the full 74-receiver fan of the 0-deg source
    against the flat-earth tau-p anchor (ACCURACY.md 2e extends from 9
    receivers to the whole fan)."""
    import raytracer_tpu as rt
    from raytracer_tpu.config import R, SolverConfig
    from raytracer_tpu.utils.cache import init_annulus_cached

    gr, A, halo = init_annulus_cached(180, 63, spacing=20.0,
                                      cache_dir=cache_dir)
    prof = rt.velocity_profile("ak135")
    interp = rt.LinearInterpolation(prof.r, prof.Vp)
    U = rt.interpolate_velocity(gr.r, interp)
    cfg = SolverConfig(dtype="float32")
    degs = np.linspace(0.0, 357.0, 64)
    sources = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
               for d in degs]
    rec_degs = np.arange(2.0, 150.0, 2.0)
    receivers = [rt.closest_point(gr, np.deg2rad(d), R, system="polar")
                 for d in rec_degs]
    solver = rt.AnnulusSolver(gr, A, halo, U, cfg, method="sweep",
                              cache_dir=cache_dir)

    profile = (prof.r, prof.Vp)
    # accuracy-grade bending density (ACCURACY.md 2e: m=384/quad=16 is
    # where the functional's own quadrature error drops under 0.25 s;
    # the m=128 default undershoots by up to ~0.8 s).  The whole
    # 64x74-path fan bends in ONE batched chunked dispatch series
    # (refined_travel_time_table): per-source bending would pay the
    # full optimisation wall-clock 64 times (~95 s each on chip).
    bend = dict(profile=profile, m=384, iters=1600, quad=16)
    # pass 1 pays every one-time cost (solve/prev/bend compiles at the
    # full 4736-path batch shape); pass 2 is the steady-state number
    t0 = time.time()
    solver.refined_travel_time_table(sources, receivers, **bend)
    log(f"refined table cold pass (incl. compiles): {time.time()-t0:.1f}s")
    t0 = time.time()
    tbl = solver.refined_travel_time_table(sources, receivers, **bend)
    dt = time.time() - t0
    assert tbl.shape == (64, len(receivers)) and np.isfinite(tbl).all()
    log(f"refined 64-source table: {dt:.2f}s = {dt/64*1e3:.0f} ms/source")

    # accuracy of the full fan (0-deg source) vs the tau-p anchor
    from raytracer_tpu.models.raytheory import ak135_first_arrivals as fa

    t_anchor = fa(rec_degs)
    err = tbl[0] - t_anchor
    fin = np.isfinite(t_anchor)
    log(f"refined fan vs anchor: max|err|={np.max(np.abs(err[fin])):.3f}s "
        f"rmse={np.sqrt(np.mean(err[fin]**2)):.3f}s over "
        f"{int(fin.sum())} receivers")
    rows.append({
        "workload": "64-source REFINED travel-time table (bias-free)",
        "config": f"180x63 AK135, {len(receivers)} receivers, sweep solve"
                  " + prev + bending (m=384, quad=16, 1600 Adam iters)",
        "ms_per_source": round(dt / 64 * 1e3),
        "total_s": round(dt, 2),
        "iters": solver.last_iterations,
        "notes": (f"full-fan accuracy vs flat-earth tau-p anchor: "
                  f"max|err| {np.max(np.abs(err[fin])):.2f} s, rmse "
                  f"{np.sqrt(np.mean(err[fin]**2)):.2f} s over "
                  f"{int(fin.sum())} of {len(receivers)} receivers "
                  f"(raw SPM carries +2.5-3.6 s at this spacing, "
                  f"ACCURACY.md 2); pipeline = device solve + device "
                  f"argmin prev + host backtrace + batched chunked "
                  f"bend of the whole 4736-path fan + multi-start "
                  f"refraction candidates under 32 deg"),
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__),
                                                  "results_tables_tpu.csv"))
    ap.add_argument("--skip-3d", action="store_true")
    args = ap.parse_args()

    import jax

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    cache_dir = os.path.join(root, ".cache")

    def attempt(name, fn):
        """Run one workload; on a TPU worker crash wait for recovery
        and retry ONCE (worker restarts take ~2-8 min and otherwise
        cascade into every later workload failing fast).  Rows a failed
        attempt already appended are dropped before the retry so the
        published CSV never carries duplicates."""
        for retry in (False, True):
            n0 = len(rows)
            try:
                fn(rows, root, cache_dir)
                return
            except Exception as e:  # noqa: BLE001
                del rows[n0:]
                crash = "UNAVAILABLE" in str(e) or "crashed" in str(e)
                if crash and not retry:
                    log(f"{name}: TPU worker crash ({type(e).__name__}); "
                        "waiting 300 s for recovery, then retrying once")
                    time.sleep(300)
                    continue
                log(f"{name} skipped: {type(e).__name__}: {e}")
                return

    rows = []
    attempt("64-source tables", bench_table_64)
    attempt("refined-table bench", bench_refined_table)
    attempt("multi-stage bench", bench_multistage)
    if not args.skip_3d:
        attempt("3-D bench", bench_3d)

    if not rows:
        sys.exit("no workload produced a row (all methods unavailable); "
                 f"leaving {args.out} untouched")
    # Crash tolerance: a workload that failed this run (e.g. a TPU worker
    # restart mid-campaign) must not silently erase its previously
    # published rows — carry over any old row whose (workload, config)
    # pair did not produce a fresh row this run.  Keyed per-config, not
    # per-workload: several workloads emit one row per method/engine
    # under a shared workload name, and one failed engine must not drop
    # its sibling's prior row.
    def key(r):
        return (r.get("workload", ""), r.get("config", ""))

    if os.path.exists(args.out):
        fresh = {key(r) for r in rows}
        try:
            with open(args.out, newline="") as f:
                old = [r for r in csv.DictReader(
                    line for line in f if not line.startswith("#"))]
        except Exception:  # noqa: BLE001
            old = []
        for r in old:
            if r.get("workload") and key(r) not in fresh:
                log(f"carrying over prior row: {r['workload']}")
                rows.append(r)
    # atomic replace: DictWriter may reject a carried-over row with a
    # stale schema, and open('w') on the target would have already
    # truncated the previously published file
    fields = list(rows[0])
    tmp = args.out + ".tmp"
    with open(tmp, "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=fields)
        wr.writeheader()
        wr.writerows({k: r.get(k, "") for k in fields} for r in rows)
        f.write(
            "# one TPU v5e chip, f32, steady-state (post-compile).\n"
            "# sharded multi-chip tables: parallel/multisource.py shard_map over\n"
            "# sources (validated on the virtual 8-device CPU mesh in\n"
            "# tests/test_parallel.py and the driver dryrun).\n"
        )
    os.replace(tmp, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
