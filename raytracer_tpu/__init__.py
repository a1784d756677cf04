"""raytracer_tpu - a TPU-native seismic shortest-path ray tracer.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
RayTracer.jl (reference exports: src/RayTracer.jl:24-34).  The public API
mirrors the reference's names (including the `recontruct_path` typo, which
is part of the reference API surface).
"""
from .config import R, DISCONTINUITY_RADII, SolverConfig, DEFAULT_SOLVER_CONFIG
from .models.annulus import (
    Grid2D,
    circle,
    closest_point,
    init_annulus,
    point_ids,
)
from .models.velocity import (
    LinearInterpolation,
    VelProfile,
    dual_velocity,
    interpolate_velocity,
    velocity_profile,
)
from .ops.relax import DeviceGraph
from .ops.circulant import CirculantError, CirculantGraph, build_circulant, solve_circulant
from .solvers.api import AnnulusSolver
from .solvers.bfm import bfm, bfm_gpu, bfm_tpu, prepare, solve, solve_many
from .solvers.dijkstra import dijkstra
from .solvers.radius_stepping import radius_stepping
from .solvers.path import backtrace_paths, recontruct_path, reconstruct_path
from .solvers.types import BellmanFordMoore, Dijkstra, RadiusStepping
from .utils.io import save_matfile, save_solution_npz, travel_times
from .utils.plotting import layers2plot, plot_paths

__all__ = [
    "R",
    "DISCONTINUITY_RADII",
    "SolverConfig",
    "DEFAULT_SOLVER_CONFIG",
    "Grid2D",
    "circle",
    "closest_point",
    "init_annulus",
    "point_ids",
    "LinearInterpolation",
    "VelProfile",
    "dual_velocity",
    "interpolate_velocity",
    "velocity_profile",
    "DeviceGraph",
    "CirculantError",
    "CirculantGraph",
    "build_circulant",
    "solve_circulant",
    "AnnulusSolver",
    "bfm",
    "bfm_gpu",
    "bfm_tpu",
    "prepare",
    "solve",
    "solve_many",
    "dijkstra",
    "radius_stepping",
    "backtrace_paths",
    "recontruct_path",
    "reconstruct_path",
    "BellmanFordMoore",
    "Dijkstra",
    "RadiusStepping",
    "save_matfile",
    "save_solution_npz",
    "travel_times",
    "layers2plot",
    "plot_paths",
]

__version__ = "0.1.0"
