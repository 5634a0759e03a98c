#!/usr/bin/env python
"""Multiblock BP1 earthquake-cycle driver on the BP1_v1.inp mesh.

The reference ships this 194-block mesh (interior frictional fault +
steady-sliding deep extension + remote loading, BP1_v1.jou) but provides
no driver for it.  This runs the full hybridized multiblock cycle.

Usage: python drivers/bp1_multiblock.py [--years 500] [--N 16] [--out f.npz]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hybridsbp_tpu.seas import bp1_multiblock as mb  # noqa: E402
from hybridsbp_tpu.seas.bp1 import YEAR_SECONDS, BP1Params  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--years", type=float, default=500.0)
    ap.add_argument("--N", type=int, default=16)
    ap.add_argument("--p", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--stations-out", default=None, metavar="DIR",
                    help="write SEAS-format fltst_dp* station files")
    ap.add_argument("--repeat", type=int, default=0,
                    help="re-run the (compiled) integration N more "
                         "times and print warm wall times")
    ap.add_argument("--dtype", default=None,
                    choices=[None, "float64", "float32"],
                    help="integration dtype (float32 = TPU serving "
                         "path; Newton tolerances are dtype-aware)")
    ap.add_argument("--newton-dtype", default=None,
                    choices=[None, "float64", "float32"],
                    help="friction-Newton dtype (float32 = pure-f32 "
                         "compensated path, no f64 emulation on TPU)")
    ap.add_argument("--ensemble", type=int, default=0, metavar="M",
                    help="integrate M cycles at once (vmapped), the "
                         "rate-and-state a profile perturbed per member")
    ap.add_argument("--ensemble-spread", type=float, default=0.08)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-steps", type=int, default=100_000)
    ap.add_argument("--rtol", type=float, default=1e-3,
                    help="integrator relative tolerance (1e-4 for "
                         "converged event series; 1e-3 default)")
    ap.add_argument("--compensated", action="store_true",
                    help="carry the Neumaier state low word (f32 "
                         "serving mode's event-fidelity fix, free on "
                         "chip — docs/DESIGN.md §5)")
    ap.add_argument("--Dc", type=float, default=None,
                    help="rate-and-state Dc (m); 0.008 = canonical "
                         "SEAS BP1-QD (~78-yr recurrence through the "
                         "coupled solve), default 0.016 (reference "
                         "variant)")
    a = ap.parse_args()

    t0 = time.time()
    import jax.numpy as jnp
    dt = {None: None, "float64": jnp.float64,
          "float32": jnp.float32}[a.dtype]
    par_kw = {} if a.Dc is None else {"RSDc": a.Dc}
    par = BP1Params(N=a.N, p=a.p, sim_years=a.years, **par_kw)
    mp = mb.setup(par, N=a.N, p=a.p, dtype=dt, verbose=True)
    print(f"setup ({mp.n_fault} fault dofs, {mp.n_fault + 1} hybrid "
          f"solves): {time.time() - t0:.1f}s")

    ndt = {None: None, "float64": jnp.float64,
           "float32": jnp.float32}[a.newton_dtype]
    if a.ensemble:
        from hybridsbp_tpu.seas.bp1 import perturb_rsa

        M = a.ensemble
        RSa_batch = perturb_rsa(mp.RSa, M, a.ensemble_spread, a.seed)
        t0 = time.time()
        sols = mb.run_ensemble(mp, RSa_batch, sim_years=a.years,
                               rtol=a.rtol,
                               max_steps=a.max_steps, newton_dtype=ndt)
        ok = np.asarray(sols.stats.success)
        wall = time.time() - t0
        n = mp.n_fault
        smax = np.asarray(sols.y_final)[:, n:].max(axis=1)
        print(f"ensemble: {ok.sum()}/{M} members completed "
              f"{a.years:.0f} yr in {wall:.1f}s wall "
              f"({wall / M * 1e3:.0f} ms/cycle); max-slip range "
              f"{smax.min():.2f}-{smax.max():.2f} m")
        return

    # build the cycle closures once: repeated run() calls with fresh
    # closures would recompile the whole while_loop each time
    fns = mb.make_cycle_fns(mp, newton_dtype=ndt)
    t0 = time.time()
    sol = mb.run(mp, sim_years=a.years, max_steps=a.max_steps,
                 rtol=a.rtol, _fns=fns, compensated=a.compensated)
    wall = time.time() - t0
    nacc, nrej = int(sol.stats.naccept), int(sol.stats.nreject)
    print(f"integrated {float(sol.t_final) / YEAR_SECONDS:.1f} years in "
          f"{wall:.1f}s: {nacc} accepted / {nrej} rejected")
    for _ in range(a.repeat):
        t0 = time.time()
        sol = mb.run(mp, sim_years=a.years, max_steps=a.max_steps,
                     rtol=a.rtol, _fns=fns, compensated=a.compensated)
        float(sol.t_final)            # scalar fetch = sync
        wall = time.time() - t0
        print(f"  warm re-run: {wall:.2f}s "
              f"({a.years / wall:.0f} sim-years/s)")

    ts = np.asarray(sol.ts)
    valid = np.isfinite(ts)
    lv = np.asarray(sol.save["log10_vmax"])[valid]
    dmax = np.asarray(sol.save["delta_max"])[valid]
    seismic = lv > -3.0
    events = int(np.sum(seismic[1:] & ~seismic[:-1]))
    print(f"max slip rate 10^{lv.max():.2f} m/s; final max slip "
          f"{dmax[-1]:.3f} m; seismic events: {events}")
    if a.out:
        np.savez(a.out, t=ts[valid], log10_vmax=lv, delta_max=dmax)
        print(f"wrote {a.out}")
    if a.stations_out:
        paths = mb.write_station_files(mp, sol, a.stations_out)
        print(f"wrote {len(paths)} station files to {a.stations_out}")


if __name__ == "__main__":
    main()
