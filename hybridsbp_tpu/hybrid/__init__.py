from .assemble import (  # noqa: F401
    BlockStore,
    assemble_jump_rhs,
    assemble_lambda_matrix,
    bcstarts,
    block_store,
    glo_lambda_operator,
    local_global_operators,
    local_to_global_rhs,
)
from .builder import (  # noqa: F401
    build_block_operators,
    build_problem,
    build_problem_light,
    corner_edges,
)
from .solve import HybridProblem  # noqa: F401
