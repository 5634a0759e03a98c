from .sharded import (  # noqa: F401
    ShardedSolver,
    make_sharded_solver,
    pad_blocks,
    place_blocks,
    place_fields,
)
from .spatial import dia_apply_spatial, halo_exchange_s, make_spatial_apply  # noqa: F401
from .sharded2d import make_sharded_solver_2d  # noqa: F401
from .dcn import make_two_level_solver  # noqa: F401
from .partition import (  # noqa: F401
    PartitionResult,
    block_adjacency,
    partition_blocks,
    permute_elements,
)
