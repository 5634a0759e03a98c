from .rateandstate import (  # noqa: F401
    newtbndv,
    newtbndv_fixed,
    rateandstate,
    slip_rate_estimate,
    solve_slip_rates,
)
