from .tsit5 import SolveStats, Tsit5Solution, solve_tsit5  # noqa: F401
