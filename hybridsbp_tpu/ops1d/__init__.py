from .tables import (  # noqa: F401
    D1_ORDERS,
    D2_ORDERS,
    VD2_ORDERS,
    build_d1,
    build_d2,
    build_vard2,
    build_vard2_batched,
    d1_tables,
    d2_tables,
    vd2_tables,
)

# Reference-style aliases (diagonal_sbp.jl API names), same signatures
# and return orders — for users coming from the Julia code.
diagonal_sbp_D1 = build_d1
diagonal_sbp_D2 = build_d2
variable_diagonal_sbp_D2 = build_vard2
