from .sharded import (  # noqa: F401
    ShardedSolver,
    make_sharded_solver,
    pad_blocks,
    place_blocks,
    place_fields,
)
from .spatial import (  # noqa: F401
    dia_apply_spatial,
    dia_apply_spatial_sym,
    halo_exchange_s,
    make_spatial_apply,
    make_spatial_apply_sym,
)
from .sharded2d import make_sharded_solver_2d  # noqa: F401
from .dcn import make_two_level_solver  # noqa: F401
from .partition import (  # noqa: F401
    PartitionResult,
    block_adjacency,
    partition_blocks,
    permute_elements,
)
