from .cg import CGResult, cg, cg_solve  # noqa: F401
from .stencil import DiaOperator, dia_apply, dia_diagonal, to_dia  # noqa: F401
from .multiblock import (  # noqa: F401
    BlockedHybrid,
    build_blocked,
    displacement_matvec,
    displacement_rhs,
    solve_displacements,
)
