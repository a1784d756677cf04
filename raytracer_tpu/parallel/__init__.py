"""Multi-chip sharding: source-batch AND grid-axis parallelism.

Two orthogonal scaling axes over a 1-D device mesh:
  * source batch (multisource.py) -- embarrassingly parallel tables,
    zero collectives inside the relaxation loops;
  * grid theta axis (theta_shard.py) -- domain decomposition with a
    +-2-column ppermute halo per Gauss-Seidel round, for fields beyond
    one chip's HBM;
  * 3-D grid slabs (shard3d.py) -- the same domain decomposition for the
    structured 3-D box (+-1-plane halo per triaxial sweep round).
"""
from .mesh import SOURCE_AXIS, make_mesh, pad_sources, replicated, source_sharding
from .multisource import (
    solve_sharded,
    travel_time_table,
    travel_time_table_3d,
    travel_time_table_circulant,
    travel_time_table_stream,
    travel_time_table_sweep,
    travel_time_table_twrapped,
)
from .refine_shard import refine_paths_sharded
from .theta_shard import THETA_AXIS, make_theta_mesh, solve_sweep_theta_sharded
from .shard3d import SHARD3D_AXIS, make_shard3d_mesh, solve3d_sharded
