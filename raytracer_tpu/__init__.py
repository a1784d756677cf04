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
from .models.fast_annulus import init_annulus_circulant, wedge_annulus
from .models.velocity import (
    LinearInterpolation,
    VelProfile,
    dual_velocity,
    interpolate_velocity,
    velocity_profile,
)
from .models.grid3d import (
    Grid3D,
    LazyGrid3D,
    closest_point3d,
    connectivity3d,
    grid3d,
    lazy_grid3d,
    nodal_incidence3d,
    velocity3d,
)
from .models.velocity import table_interface_radii
from .models.partition import GridPartition, find_layer_number, level_mask, partition_grid
from .models.amplitude import (ak135_spreading, amplitude_factor,
                               attenuation_factor, geometrical_spreading,
                               tstar)
from .models.flatearth import RadialModel, cmb_radius
from .models.iasp91 import generate_iasp91_table, iasp91_velocity
from .models.zoeppritz import (Medium, energy_coefficients,
                               free_surface_receiver, interface_media,
                               pcp_p_amplitude_ratio, prem_density,
                               scattering)
from .models.interpolation import bilinear, barycentric_coordinates, interpolate_elementwise
from .ops.relax import DeviceGraph
from .ops.circulant import CirculantError, CirculantGraph, build_circulant, solve_circulant
from .solvers.api import AnnulusSolver
from .solvers.bfm import bfm, bfm3d, bfm_gpu, bfm_tpu, prepare, solve, solve_many
from .solvers.solve3d import (mask_region3d, solve3d,
                              solve3d_converted, solve3d_reflection)
from .solvers.multiphase import bfm_ms, bfm_multiphase, boundary_velocity, directions
from .solvers.phases import (depth_phase_travel_times, phase_travel_times,
                             reflected_travel_times)
from .models.flatearth import (depth_from_depth_phase,
                               depth_phase_first_arrival)
from .solvers.dijkstra import weight_matrix, weights
from .models.delaunay import (add_midpoints, structured_convex_hull,
                              triangle_annulus_2d,
                              unstructured_constrained_domain)
from .solvers.dijkstra import dijkstra
from .solvers.radius_stepping import radius_stepping
from .solvers.path import (backtrace_paths, ray_parameters,
                           recontruct_path, reconstruct_path,
                           takeoff_angle)
from .solvers.refine import (refine_fan, refine_path, refine_paths_batch,
                             refraction_inits, resample_path)
from .solvers.sensitivity import (path_sensitivity, path_sensitivity_dual,
                                  sensitivity_coo, sensitivity_matrix)
from .solvers.locate import (Location, Location3D, locate, locate3d,
                             locate_dd, locate_many, locate_many3d,
                             locate_phases, locate3d_phases,
                             station_fields, station_fields3d)
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
    "init_annulus_circulant",
    "wedge_annulus",
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
    "Grid3D",
    "LazyGrid3D",
    "closest_point3d",
    "connectivity3d",
    "grid3d",
    "lazy_grid3d",
    "nodal_incidence3d",
    "GridPartition",
    "find_layer_number",
    "level_mask",
    "partition_grid",
    "bilinear",
    "barycentric_coordinates",
    "interpolate_elementwise",
    "bfm3d",
    "solve3d",
    "solve3d_converted",
    "solve3d_reflection",
    "mask_region3d",
    "velocity3d",
    "table_interface_radii",
    "bfm_ms",
    "bfm_multiphase",
    "phase_travel_times",
    "depth_phase_travel_times",
    "depth_phase_first_arrival",
    "depth_from_depth_phase",
    "reflected_travel_times",
    "boundary_velocity",
    "directions",
    "weight_matrix",
    "weights",
    "add_midpoints",
    "triangle_annulus_2d",
    "structured_convex_hull",
    "unstructured_constrained_domain",
    "bfm",
    "bfm_gpu",
    "bfm_tpu",
    "prepare",
    "solve",
    "solve_many",
    "dijkstra",
    "radius_stepping",
    "backtrace_paths",
    "ray_parameters",
    "tstar",
    "attenuation_factor",
    "geometrical_spreading",
    "ak135_spreading",
    "amplitude_factor",
    "RadialModel",
    "cmb_radius",
    "iasp91_velocity",
    "generate_iasp91_table",
    "Medium",
    "scattering",
    "energy_coefficients",
    "free_surface_receiver",
    "interface_media",
    "prem_density",
    "pcp_p_amplitude_ratio",
    "recontruct_path",
    "reconstruct_path",
    "takeoff_angle",
    "path_sensitivity",
    "path_sensitivity_dual",
    "sensitivity_coo",
    "sensitivity_matrix",
    "refine_path",
    "refine_fan",
    "refine_paths_batch",
    "refraction_inits",
    "resample_path",
    "Location",
    "Location3D",
    "locate",
    "locate3d",
    "locate_dd",
    "locate_many",
    "locate_many3d",
    "locate_phases",
    "locate3d_phases",
    "station_fields",
    "station_fields3d",
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
