"""Scaling/speedup figure from benchmarks/results_tpu.csv.

The TPU-native analog of the reference's benchmark renderer
(/root/reference/benchmarks/process_benchmark.jl:1-55, GLMakie): top
panel wall-clock vs grid size for every measured backend, bottom panel
speedup of the TPU engine over the reference's own backends on the
exact tasks the reference published (same ntheta x nr, spacing=20,
star-1; reference CSVs GPU_*_star1_NOreorder(_new).csv).

Usage:  python benchmarks/scaling_figure.py  [out.png]

Series (fixed categorical order; palette = the validated default set
from the dataviz reference, adjacent-pair CVD-safe in light mode):
  1 blue    TPU v5e best engine, device-resident (the bfm_gpu contract)
  2 orange  TPU v5e best engine, incl. full-field host pull
  3 aqua    reference CPU 1 thread (Julia, Threads.@threads)
  4 yellow  reference CPU 4 threads
  5 magenta reference GeForce GTX 1660 Ti (CUDA.jl)
"""
import csv
import sys
from collections import defaultdict
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

HERE = Path(__file__).resolve().parent

SURFACE = "#fcfcfb"
TEXT_1 = "#0b0b0b"
TEXT_2 = "#52514e"
GRID = "#e4e3df"
C_TPU_DEV = "#2a78d6"   # slot 1 blue
C_TPU_MAT = "#eb6834"   # slot 2 orange
C_CPU1 = "#1baf7a"      # slot 3 aqua
C_CPU4 = "#eda100"      # slot 4 yellow
C_GTX = "#e87ba4"       # slot 5 magenta


def load_rows(path):
    rows = []
    with open(path) as f:
        for rec in csv.DictReader(r for r in f if not r.startswith("#")):
            row = {}
            for k, v in rec.items():
                try:
                    row[k] = float(v)
                except (TypeError, ValueError):
                    row[k] = v
            rows.append(row)
    return rows


def best_per_size(rows):
    """One point per grid size: the fastest engine's times + the
    reference columns (identical across engines of one size)."""
    by_n = defaultdict(list)
    for r in rows:
        by_n[int(r["nodes"])].append(r)
    out = []
    for n in sorted(by_n):
        out.append(min(by_n[n], key=lambda r: r["bfm_tpu_dev_s"]))
    return out


def main(out_png=None):
    rows = load_rows(HERE / "results_tpu.csv")
    best = best_per_size(rows)
    nodes = [r["nodes"] for r in best]

    fig, (ax1, ax2) = plt.subplots(
        2, 1, figsize=(8.2, 7.6), sharex=True,
        gridspec_kw={"height_ratios": [2.1, 1.0], "hspace": 0.12})
    fig.patch.set_facecolor(SURFACE)

    for ax in (ax1, ax2):
        ax.set_facecolor(SURFACE)
        ax.grid(True, which="major", color=GRID, linewidth=0.7)
        ax.tick_params(colors=TEXT_2, labelsize=9)
        for s in ax.spines.values():
            s.set_color(GRID)

    def series(ax, xs, ys, color, label):
        pts = [(x, y) for x, y in zip(xs, ys)
               if isinstance(y, float) and y == y]
        if not pts:
            return
        xs2, ys2 = zip(*sorted(pts))
        ax.plot(xs2, ys2, "-o", color=color, linewidth=2,
                markersize=4.5, label=label)

    series(ax1, nodes, [r["bfm_tpu_dev_s"] for r in best], C_TPU_DEV,
           "TPU v5e (device-resident)")
    series(ax1, nodes, [r["bfm_tpu_s"] for r in best], C_TPU_MAT,
           "TPU v5e (incl. host pull)")
    series(ax1, nodes, [r["ref_cpu1t_s"] for r in best], C_CPU1,
           "reference CPU 1 thread")
    series(ax1, nodes, [r["ref_cpu4t_s"] for r in best], C_CPU4,
           "reference CPU 4 threads")
    series(ax1, nodes, [r["ref_gtx1660ti_s"] for r in best], C_GTX,
           "reference GTX 1660 Ti")
    ax1.set_xscale("log")
    ax1.set_yscale("log")
    ax1.set_ylabel("wall-clock per solve [s]", color=TEXT_1, fontsize=10)
    ax1.set_title("Single-source BFM travel-time solve, AK135 annulus",
                  color=TEXT_1, fontsize=12, loc="left", pad=10)
    ax1.legend(loc="upper left", fontsize=8.5, frameon=False,
               labelcolor=TEXT_1)

    # speedup panel: only the tasks the reference itself published
    cmp_rows = [r for r in best if r["ref_cpu4t_s"] == r["ref_cpu4t_s"]]
    xs = [r["nodes"] for r in cmp_rows]
    series(ax2, xs, [r["ref_cpu4t_s"] / r["bfm_tpu_dev_s"]
                     for r in cmp_rows], C_CPU4, "vs reference CPU 4t")
    series(ax2, xs, [r["ref_gtx1660ti_s"] / r["bfm_tpu_dev_s"]
                     if r["ref_gtx1660ti_s"] == r["ref_gtx1660ti_s"]
                     else float("nan") for r in cmp_rows],
           C_GTX, "vs reference GTX 1660 Ti")
    ax2.set_xscale("log")
    ax2.axhline(1.0, color=GRID, linewidth=1)
    ax2.set_ylabel("speedup (x)", color=TEXT_1, fontsize=10)
    ax2.set_xlabel("graph nodes", color=TEXT_1, fontsize=10)
    ax2.legend(loc="upper left", fontsize=8.5, frameon=False,
               labelcolor=TEXT_1)

    out = Path(out_png) if out_png else HERE / "scaling_tpu.png"
    fig.savefig(out, dpi=150, bbox_inches="tight",
                facecolor=fig.get_facecolor())
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
