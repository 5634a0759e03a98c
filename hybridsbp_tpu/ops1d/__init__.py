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
