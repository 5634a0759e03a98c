from .rateandstate import newtbndv, rateandstate, solve_slip_rates  # noqa: F401
