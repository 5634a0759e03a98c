"""Configuration layer (SURVEY §5.6 — the reference keeps every setting
as literals inside driver scripts; here they are dataclasses with the
same defaults, overridable from CLI args or dicts)."""
import argparse
import dataclasses
from dataclasses import dataclass, field
 


@dataclass
class SolverConfig:
    """Hybrid elliptic solve settings (square_circle.jl:5-8 defaults)."""
    method: str = "trace"          # trace | monolithic | displacements
    p: int = 6                     # SBP interior order
    tau_scale: float = 2.0         # SAT penalty scale (global_curved.jl:214)
    cg_tol: float = 1e-10          # device CG tolerance
    cg_maxiter: int = 5000
    dtype: str = "float64"         # float64 validation / float32 serving


@dataclass
class MMSConfig:
    """square_circle convergence-study settings (square_circle.jl:40,207)."""
    N0: int = 17
    levels: int = 4
    solver: SolverConfig = field(default_factory=SolverConfig)


def add_dataclass_args(parser: argparse.ArgumentParser, cls, prefix=""):
    """Expose a (nested) dataclass's scalar fields as --flags."""
    for f in dataclasses.fields(cls):
        if dataclasses.is_dataclass(f.type) or dataclasses.is_dataclass(
                getattr(f, "default_factory", None)):
            continue
        if f.type in (int, float, str) or f.type in ("int", "float", "str"):
            default = (f.default if f.default is not dataclasses.MISSING
                       else None)
            typ = {int: int, float: float, str: str,
                   "int": int, "float": float, "str": str}[f.type]
            parser.add_argument(f"--{prefix}{f.name.replace('_', '-')}",
                                type=typ, default=default)
    return parser


def from_args(cls, args, prefix=""):
    """Build a dataclass from parsed args (unset flags keep defaults)."""
    kw = {}
    for f in dataclasses.fields(cls):
        name = f"{prefix}{f.name}"
        if hasattr(args, name) and getattr(args, name) is not None:
            kw[f.name] = getattr(args, name)
    return cls(**kw)
