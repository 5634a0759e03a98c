from .cg import CGResult, cg, cg_solve  # noqa: F401
from .stencil import (  # noqa: F401
    DiaOperator,
    dia_apply,
    dia_apply_compact,
    dia_diagonal,
    to_dia,
)
from .multiblock import (  # noqa: F401
    BlockedHybrid,
    block_solve,
    build_blocked,
    displacement_matvec,
    displacement_rhs,
    solve_displacements,
    solve_trace,
    with_coef_dtype,
)
from .refine import (  # noqa: F401
    iterative_refinement,
    refined_displacement_solve,
)
