"""Problem registry — the framework's "model zoo".

Maps problem names to their driver entry points so tools can enumerate
and launch every supported configuration (the reference's five driver
scripts plus the capabilities added here).
"""
from dataclasses import dataclass
from typing import Callable, Dict


@dataclass(frozen=True)
class Problem:
    name: str
    description: str
    run: Callable     # keyword-configurable entry returning results


def _square_circle(**kw):
    from drivers.square_circle import run
    return run(**kw)


def _bp1(**kw):
    from .seas import bp1
    par = bp1.BP1Params(**{k: v for k, v in kw.items()
                           if k in bp1.BP1Params.__dataclass_fields__})
    rest = {k: v for k, v in kw.items()
            if k not in bp1.BP1Params.__dataclass_fields__}
    stations_out = rest.pop("stations_out", None)
    prob, history, stats = bp1.run_chunked(par, **rest)
    if stations_out:
        paths = bp1.write_station_files(prob, history, stations_out)
        print(f"wrote {len(paths)} station files to {stations_out}")
    return prob, history, stats


def _bp1_multiblock(**kw):
    from .seas import bp1_multiblock as mb
    stations_out = kw.pop("stations_out", None)
    mp = mb.setup(N=kw.pop("N", 16), p=kw.pop("p", 2))
    sol = mb.run(mp, **kw)
    if stations_out:
        paths = mb.write_station_files(mp, sol, stations_out)
        print(f"wrote {len(paths)} station files to {stations_out}")
    return mp, sol


def _flower(**kw):
    from drivers.flower import run
    return run(**kw)


def _single_block(**kw):
    from drivers.single_block import main
    return main(**kw)


def _invert_material(**kw):
    from .inverse import (demo_problem, invert_material,
                          make_material_inversion)
    p, N = kw.pop("p", 2), kw.pop("N", 24)
    steps, lr = kw.pop("steps", 400), kw.pop("lr", 0.2)
    mu_true, sources, d_obs = demo_problem(
        p, N, **{k: v for k, v in kw.items() if k in ("K", "nsta",
                                                      "noise", "seed")})
    inv = make_material_inversion(
        p, N, **{k: v for k, v in kw.items() if k in ("nsta", "ctrl",
                                                      "smooth")})
    return mu_true, invert_material(inv, sources, d_obs, steps=steps,
                                    lr=lr)


def _invert_slip(**kw):
    from drivers.invert_slip import build_flower_problem, true_slip

    from .inverse import invert_linear, make_slip_inversion
    prob = build_flower_problem(kw.pop("p", 2), kw.pop("N", 8))
    inv = make_slip_inversion(prob, per=kw.pop("per", 3))
    d_true = true_slip(inv)
    import jax.numpy as jnp
    d_obs = inv.forward(jnp.asarray(d_true))
    res = invert_linear(inv.forward, d_obs, inv.nf,
                        lam=kw.pop("lam", 1e-8), reg_mv=inv.reg_mv,
                        maxiter=kw.pop("maxiter", 300))
    return d_true, res


REGISTRY: Dict[str, Problem] = {
    p.name: p for p in [
        Problem("square_circle",
                "two-material circle-in-square MMS convergence study "
                "(square_circle.jl)", _square_circle),
        Problem("bp1",
                "SEAS BP1 single-block earthquake cycle (seas/BP1/BP1.jl)",
                _bp1),
        Problem("bp1_multiblock",
                "earthquake cycle on the interior-fault BP1_v1 multiblock "
                "mesh (no reference driver exists)", _bp1_multiblock),
        Problem("flower",
                "flower fault-network hybrid solve (meshes/flower_v2.inp)",
                _flower),
        Problem("single_block",
                "constant-solution smoke test (seas/BP1/single_block.jl)",
                _single_block),
        Problem("invert_material",
                "adjoint material-field inversion through the "
                "differentiable solve (beyond reference)",
                _invert_material),
        Problem("invert_slip",
                "fault-slip inversion on the flower network via "
                "linear-transpose Gauss-Newton (beyond reference)",
                _invert_slip),
    ]
}


def get(name: str) -> Problem:
    if name not in REGISTRY:
        raise KeyError(f"unknown problem {name!r}; available: "
                       f"{sorted(REGISTRY)}")
    return REGISTRY[name]
