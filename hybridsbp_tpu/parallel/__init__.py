from .sharded import ShardedSolver, make_sharded_solver, pad_blocks  # noqa: F401
