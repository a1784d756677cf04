"""Multi-chip sharding: source-batch parallelism over a device mesh."""
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
