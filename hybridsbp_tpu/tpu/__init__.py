from .cg import CGResult, cg, cg_solve  # noqa: F401
from .stencil import (  # noqa: F401
    DiaOperator,
    dia_apply,
    dia_apply_compact,
    dia_apply_flat,
    dia_apply_flat_sym,
    dia_diagonal,
    dia_sym_half,
    flatten_dia,
    flatten_dia_sym,
    to_dia,
)
from .multiblock import (  # noqa: F401
    BlockedHybrid,
    block_solve,
    bp_arrays,
    bp_with,
    build_blocked,
    build_woodbury,
    build_woodbury_banded,
    displacement_matvec,
    displacement_rhs,
    make_jit_solver,
    solve_displacements,
    solve_displacements_implicit,
    solve_trace,
    with_coef_dtype,
    woodbury_precond,
)
from .refine import (  # noqa: F401
    iterative_refinement,
    make_refined_solver,
    refined_displacement_solve,
)
