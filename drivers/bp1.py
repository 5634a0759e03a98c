#!/usr/bin/env python
"""SEAS BP1 earthquake-cycle driver.

Runs the full quasi-dynamic cycle simulation (reference parity:
seas/BP1/BP1.jl) with the device-resident reduced hot loop and prints a
summary of the slip-rate history; optionally dumps station time series
and a slip-vs-depth plot.

Usage: python drivers/bp1.py [--years 1000] [--N 200] [--p 2]
                             [--out bp1_history.npz] [--plot bp1.png]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hybridsbp_tpu.seas import bp1  # noqa: E402


def plot_slip_profiles(t, delta_full, log10_vmax, yf, path,
                       inter_dt_yr=10.0, co_dt_s=1.0):
    """Classic SEAS slip-vs-depth figure (the plot_slip analogue,
    BP1.jl:167-185): blue profiles every ``inter_dt_yr`` years during
    interseismic creep, red profiles every ``co_dt_s`` seconds during
    seismic episodes (Vmax > 1e-3 m/s)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    seismic = log10_vmax > -3.0
    fig, ax = plt.subplots(figsize=(7, 8))
    next_inter = 0.0
    next_co = -np.inf
    for i in range(len(t)):
        if seismic[i]:
            if t[i] >= next_co:
                ax.plot(delta_full[i], -yf, "r-", lw=0.5)
                next_co = t[i] + co_dt_s
            next_inter = t[i]  # resume interseismic cadence after event
        elif t[i] >= next_inter:
            ax.plot(delta_full[i], -yf, "b-", lw=0.6)
            next_inter = t[i] + inter_dt_yr * bp1.YEAR_SECONDS
    ax.set(xlabel="slip (m)", ylabel="depth (km)",
           title="cumulative slip profiles (blue: 10 yr, red: 1 s)")
    fig.savefig(path, dpi=130)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--years", type=float, default=1000.0)
    ap.add_argument("--N", type=int, default=200)
    ap.add_argument("--p", type=int, default=2)
    ap.add_argument("--el", type=float, default=1e13)
    ap.add_argument("--max-steps", type=int, default=200_000)
    ap.add_argument("--save-every", type=int, default=1)
    ap.add_argument("--chunk-steps", type=int, default=0,
                    help="bound each device launch to this many steps "
                         "(recommended on remote/tunneled accelerators)")
    ap.add_argument("--dtype", default="float64",
                    choices=["float64", "float32"])
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--plot", default=None)
    ap.add_argument("--slip-plot", default=None,
                    help="write the slip-vs-depth profile figure "
                         "(records full fault profiles)")
    ap.add_argument("--stations-out", default=None, metavar="DIR",
                    help="write SEAS-format fltst_dp* station files")
    ap.add_argument("--ensemble", type=int, default=0, metavar="M",
                    help="integrate M cycles at once (vmapped), the "
                         "rate-and-state a profile perturbed per "
                         "member (spread set by --ensemble-spread)")
    ap.add_argument("--ensemble-spread", type=float, default=0.08)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--Dc", type=float, default=None,
                    help="rate-and-state Dc (m); 0.008 with --Wf 40 = "
                         "canonical SEAS BP1-QD")
    ap.add_argument("--Wf", type=float, default=None,
                    help="imposed-creep depth (km): nodes deeper slide "
                         "at exactly Vp (canonical SEAS loading)")
    ap.add_argument("--compensated", action="store_true",
                    help="carry the Neumaier state low word (f32 "
                         "serving mode's event-fidelity fix, free on "
                         "chip — docs/DESIGN.md §5)")
    a = ap.parse_args()

    import jax.numpy as jnp
    dtype = jnp.float32 if a.dtype == "float32" else jnp.float64
    par_kw = {}
    if a.Dc is not None:
        par_kw["RSDc"] = a.Dc
    if a.Wf is not None:
        par_kw["Wf"] = a.Wf
    par = bp1.BP1Params(N=a.N, p=a.p, sim_years=a.years, el=a.el,
                        **par_kw)
    t0 = time.time()
    prob = bp1.setup(par, dtype=dtype)
    print(f"setup: N={a.N} ({(a.N + 1) ** 2} volume DOF), "
          f"reduced operator K: {prob.K.shape} {a.dtype}, "
          f"{time.time() - t0:.1f}s", flush=True)

    if a.ensemble:
        ignored = [f for f, v in (("--stations-out", a.stations_out),
                                  ("--plot", a.plot),
                                  ("--slip-plot", a.slip_plot),
                                  ("--chunk-steps", a.chunk_steps),
                                  ("--ckpt", a.ckpt)) if v]
        if ignored:
            print(f"note: {', '.join(ignored)} ignored in ensemble mode")
        M = a.ensemble
        RSa_batch = bp1.perturb_rsa(prob.RSa, M, a.ensemble_spread,
                                    a.seed)
        t0 = time.time()
        sols = bp1.run_ensemble(prob, RSa_batch, sim_years=a.years,
                                max_steps=a.max_steps,
                                save_every=a.save_every)
        ok = np.asarray(sols.stats.success)
        wall = time.time() - t0
        lv = np.asarray(sols.save["log10_vmax"])
        events = []
        for m in range(M):
            lm = lv[m][np.isfinite(np.asarray(sols.ts)[m])]
            s = lm > -3.0
            events.append(int(np.sum(s[1:] & ~s[:-1])))
        print(f"ensemble: {ok.sum()}/{M} members completed "
              f"{a.years:.0f} yr in {wall:.1f}s wall "
              f"({wall / M * 1e3:.0f} ms/cycle); event counts "
              f"{sorted(set(events))}")
        if a.out:
            np.savez(a.out, t=np.asarray(sols.ts),
                     log10_vmax=lv, y_final=np.asarray(sols.y_final),
                     RSa_batch=RSa_batch)
            print(f"wrote {a.out}")
        return

    t0 = time.time()
    profiles = bool(a.slip_plot)
    if a.chunk_steps:
        prob, hist, stats = bp1.run_chunked(
            par, prob=prob, chunk_steps=a.chunk_steps, progress=True,
            save_every=a.save_every, checkpoint_path=a.ckpt,
            save_profiles=profiles, compensated=a.compensated)
        wall = time.time() - t0
        nacc, nrej = stats["naccept"], stats["nreject"]
        print(f"integrated {stats['t_final'] / bp1.YEAR_SECONDS:.1f} years "
              f"in {wall:.1f}s wall ({stats['chunks']} chunks): "
              f"{nacc} accepted / {nrej} rejected "
              f"({1e3 * wall / max(nacc + nrej, 1):.2f} ms/step)")
        ts, valid = hist["t"], slice(None)
        saved = hist
    else:
        prob, sol = bp1.run(par, prob=prob, max_steps=a.max_steps,
                            save_every=a.save_every, save_profiles=profiles,
                            compensated=a.compensated)
        wall = time.time() - t0
        nacc, nrej = int(sol.stats.naccept), int(sol.stats.nreject)
        print(f"integrated {float(sol.t_final) / bp1.YEAR_SECONDS:.1f} years "
              f"in {wall:.1f}s wall: {nacc} accepted / {nrej} rejected steps "
              f"({1e3 * wall / max(nacc + nrej, 1):.2f} ms/step)")
        ts = np.asarray(sol.ts)
        valid = np.isfinite(ts)
        saved = {k: np.asarray(v) for k, v in sol.save.items()}

    lv = np.asarray(saved["log10_vmax"])[valid]
    print(f"max slip rate over run: 10^{lv.max():.2f} m/s; "
          f"final max slip {np.asarray(saved['delta'])[valid][-1].max():.3f} m")
    # event count: excursions above 1e-3 m/s (seismic threshold)
    seismic = lv > -3.0
    events = int(np.sum(seismic[1:] & ~seismic[:-1]))
    print(f"seismic events (Vmax > 1e-3 m/s): {events}")

    if a.out:
        np.savez(a.out, t=np.asarray(ts)[valid],
                 **{k: np.asarray(v)[valid] for k, v in saved.items()
                    if k != "t"})
        print(f"wrote {a.out}")
    if a.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(2, 1, figsize=(8, 8))
        tyr = np.asarray(ts)[valid] / bp1.YEAR_SECONDS
        ax[0].plot(tyr, lv)
        ax[0].set(xlabel="t (years)", ylabel="log10 max V (m/s)")
        d = np.asarray(saved["delta"])[valid]
        for i in range(d.shape[1]):
            ax[1].plot(tyr, d[:, i])
        ax[1].set(xlabel="t (years)", ylabel="slip at stations (m)")
        fig.savefig(a.plot, dpi=120)
        print(f"wrote {a.plot}")
    if a.stations_out:
        hist = {"t": np.asarray(ts)[valid],
                **{k: np.asarray(v)[valid] for k, v in saved.items()
                   if k != "t"}}
        paths = bp1.write_station_files(prob, hist, a.stations_out)
        print(f"wrote {len(paths)} station files to {a.stations_out}")
    if a.slip_plot:
        plot_slip_profiles(np.asarray(ts)[valid],
                           np.asarray(saved["delta_full"])[valid],
                           lv, prob.yf, a.slip_plot)
        print(f"wrote {a.slip_plot}")


if __name__ == "__main__":
    main()
