#!/usr/bin/env python
"""Independent convergence-rate oracle for the square_circle MMS
(VERDICT r2 next #7).

Beyond re-printing error rates vs the manufactured solution, this
cross-validates them by Richardson extrapolation: on nested grids the
fine-level fault traction restricted to coarse points satisfies
tau_h = tau* + C h^q + o(h^q); extrapolating tau* from (tau_h,
tau_{h/2}) with the OBSERVED q must land much closer to the analytic
traction than tau_{h/2} itself.  That only happens if (a) the error
really is C h^q with the claimed rate and (b) the analytic exact-
traction formulas agree with the discrete limit — so a wrong exact
formula or a wrong rate cannot pass (reference functional:
square_circle.jl:405-428).

Usage: python tools/mms_oracle.py --p 4 --N0 8 --levels 4
Prints one JSON line.
"""
import argparse
import json
import os
import sys

os.environ.setdefault("HYBRIDSBP_PLATFORM", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "drivers"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402


def level_tractions(p, N, mesh_data):
    """Solve one level; return per-fault-face (tau, tex, w) arrays
    (w = Hf*sJ quadrature weights) plus the energy/traction error."""
    import square_circle as sc
    from hybridsbp_tpu import BC_JUMP_INTERFACE
    from hybridsbp_tpu.ops2d import computetraction

    prob, g, gdelta, delta, FTods, EToDomain, conn = sc.assemble_level(
        p, N, mesh_data)
    FToE, FToLF, EToO, EToS = conn
    lops, vstarts, FToLs = prob.lops, prob.vstarts, prob.FToLstarts
    u, lam = prob.solve(g, gdelta, method="trace")

    err2 = 0.0
    for e in range(len(lops)):
        lop = lops[e]
        x, y = lop.coord
        du = u[vstarts[e]:vstarts[e + 1]] - sc.vex(x.ravel(), y.ravel(),
                                                   EToDomain[e])
        err2 += du @ (lop.JH * du)

    taus, terr2 = {}, 0.0
    for f in range(len(prob.FToB)):
        if prob.FToB[f] != BC_JUMP_INTERFACE:
            continue
        e1, lf1 = FToE[0, f], FToLF[0, f]
        lop = lops[e1]
        xf = lop.facecoord[0][lf1]
        yf = lop.facecoord[1][lf1]
        tex = (lop.nx[lf1] * sc.vex_x(xf, yf, EToDomain[e1])
               + lop.ny[lf1] * sc.vex_y(xf, yf, EToDomain[e1]))
        tau = computetraction(
            lop, lf1, u[vstarts[e1]:vstarts[e1 + 1]],
            lam[FToLs[f]:FToLs[f + 1]], delta[FTods[f]:FTods[f + 1]])
        w = lop.Hf[lf1] * lop.sJ[lf1]
        dt = tau - tex
        terr2 += dt @ (w * dt)
        taus[f] = (np.asarray(tau), np.asarray(tex), np.asarray(w))
    return np.sqrt(err2), np.sqrt(terr2), taus


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=4)
    ap.add_argument("--N0", type=int, default=8)
    ap.add_argument("--levels", type=int, default=4)
    a = ap.parse_args()

    import square_circle as sc
    mesh_data = sc.load_mesh()

    eps, teps, tau_lv = [], [], []
    for lvl in range(a.levels):
        N = a.N0 * 2 ** lvl
        e, t, taus = level_tractions(a.p, N, mesh_data)
        eps.append(e)
        teps.append(t)
        tau_lv.append(taus)
        print(f"# level {lvl + 1} N={N}: energy {e:.4e} traction {t:.4e}",
              file=sys.stderr, flush=True)

    rates = [float(np.log2(eps[i] / eps[i + 1]))
             for i in range(len(eps) - 1)]
    trates = [float(np.log2(teps[i] / teps[i + 1]))
              for i in range(len(teps) - 1)]

    # Oracle: re-measure the traction error against the FINEST
    # DISCRETE solution restricted to common nested points (h-ladder
    # oracle), instead of against the analytic formulas.  If the
    # analytic exact-traction formulas (or the weighted functional)
    # were wrong, the analytic-referenced errors would stagnate at the
    # formula-error level while the discrete-referenced ones kept
    # converging — so agreement of the two rate tables (for levels at
    # least 2 below the finest, where the reference bias 2^-2q is
    # negligible) independently validates the printed rates.
    L = a.levels - 1
    fin = tau_lv[L]
    teps_d = []
    for lvl in range(L):
        stride = 2 ** (L - lvl)
        err2 = 0.0
        for f, (tau_f, _, _) in fin.items():
            tau_l, _, w_l = tau_lv[lvl][f]
            dt = tau_l - tau_f[::stride]
            err2 += dt @ (w_l * dt)
        teps_d.append(np.sqrt(err2))
    trates_d = [float(np.log2(teps_d[i] / teps_d[i + 1]))
                for i in range(len(teps_d) - 1)]
    # usable comparisons: rates whose BOTH levels are >= 2 below finest
    usable = max(0, len(trates_d) - 1)
    dev = [abs(trates_d[i] - trates[i]) for i in range(usable)]

    print(json.dumps({
        "p": a.p, "N0": a.N0, "levels": a.levels,
        "energy_err": [float(f"{e:.6g}") for e in eps],
        "traction_err": [float(f"{t:.6g}") for t in teps],
        "energy_rates": [round(r, 2) for r in rates],
        "traction_rates": [round(r, 2) for r in trates],
        "traction_err_vs_discrete": [float(f"{t:.6g}") for t in teps_d],
        "traction_rates_vs_discrete": [round(r, 2) for r in trates_d],
        "oracle_rate_deviation": [round(d, 2) for d in dev]}))


if __name__ == "__main__":
    main()
