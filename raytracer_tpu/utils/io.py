"""Result export: travel-time tables and solution archives.

Replaces the reference's CSV/MAT output (src/ShortestPath.jl:40-51,
main_annulus.jl:6-32).  MAT export is replaced by npz (the reference README
already marks MATLAB output for deprecation); a MAT writer is still
provided through scipy for drop-in compatibility.
"""
from __future__ import annotations

import csv
from typing import Optional, Sequence

import numpy as np


def travel_times(D, gr, receivers: Sequence[int], isave: bool = False, flname: str = "") -> np.ndarray:
    """Travel times at receiver nodes; optional CSV `degree,travel_time`.

    Reference: src/ShortestPath.jl:40-51.
    """
    receivers = np.asarray(receivers)
    tt = np.asarray(D.dist)[receivers]
    if isave:
        deg = np.rad2deg(np.asarray(gr.theta)[receivers])
        with open(flname, "w", newline="") as f:
            wr = csv.writer(f)
            wr.writerow(["degree", "travel_time"])
            for d, t in zip(deg, tt):
                wr.writerow([d, t])
    return tt


def save_solution_npz(path: str, D, gr, source: int, paths: Optional[Sequence[np.ndarray]] = None) -> None:
    """Archive grid coords, travel-time field and ray paths as npz.

    Equivalent of save_matfile (main_annulus.jl:6-32) without the MATLAB
    dependency.
    """
    arrays = {
        "x": np.asarray(gr.x),
        "z": np.asarray(gr.z),
        "theta": np.asarray(gr.theta),
        "r": np.asarray(gr.r),
        "dist": np.asarray(D.dist),
        "prev": np.asarray(D.prev),
        "source": np.asarray(source),
    }
    if paths is not None:
        for i, p in enumerate(paths):
            arrays[f"path_{i}"] = np.asarray(p)
    np.savez_compressed(path, **arrays)


def load_solution_npz(path: str):
    """Load an archive written by save_solution_npz.

    Returns (data dict, prev, dist, source, paths list) - the
    checkpoint/resume counterpart the reference lacks entirely
    (SURVEY.md section 5: persistence was final CSV/MAT only).
    """
    with np.load(path) as f:
        data = {k: f[k] for k in f.files}
    keys = sorted(
        (k for k in data if k.startswith("path_")), key=lambda k: int(k.split("_")[1])
    )
    paths = [data[k] for k in keys]
    return data, data["prev"], data["dist"], int(data["source"]), paths


def save_matfile(path: str, D, gr, paths: Optional[Sequence[np.ndarray]] = None) -> None:
    """MATLAB-compatible export via scipy.io (main_annulus.jl:6-32)."""
    from scipy.io import savemat

    data = {
        "x": np.asarray(gr.x),
        "z": np.asarray(gr.z),
        "theta": np.asarray(gr.theta),
        "r": np.asarray(gr.r),
    }
    if paths is not None:
        for i, p in enumerate(paths):
            p = np.asarray(p)
            data[f"x_path{i + 1}"] = np.asarray(gr.x)[p]
            data[f"z_path{i + 1}"] = np.asarray(gr.z)[p]
            data[f"travel_time_path{i + 1}"] = np.asarray(D.dist)[p]
    savemat(path, data)
