#!/usr/bin/env python
"""Multi-chip strong-scaling model for the sharded hybrid solvers
(VERDICT r2 next #9) — the best multi-chip performance evidence
obtainable without multi-chip hardware.

Per CG/FCG iteration of the block-sharded solve, each chip:
  1. applies the DIA stencil to its E/n blocks (measured single-chip
     time, perfectly block-parallel — zero communication),
  2. all_gathers the per-block face traces (E x 4 x L x 4 B) over the
     ICI ring,
  3. joins two scalar psum reductions (CG dots; latency-bound).
The two-level ('slice','block') topology all_gathers only within a
slice and exchanges the partitioner's cut faces (measured cut
fractions, RESULTS.md) across slices over DCN.

Inputs are MEASURED single-chip numbers + PUBLISHED link specs (both
printed with the result — the model is falsifiable at every term).
Time model: t_comm = bytes / bw + hops * latency; ring all_gather
moves (n-1)/n of the payload through each chip's ring links.

Usage: python tools/scaling_model.py [--t-apply-us 103]
Prints one JSON line (also mirrored as a markdown table on stderr).
"""
import argparse
import json
import sys

# shipped meshes: (blocks, interior faces, face length L, DIA planes);
# cut fractions per slice count measured by parallel/partition.py
# (RESULTS.md r2).  t_apply_us default = the coefficient-streaming
# roofline at v5e HBM spec (noff+2 planes x L^2 x 4 B / 819 GB/s),
# which XLA reaches to 83-99% on-chip (RESULTS.md) — override with a
# measured value via --t-apply-us.
_V5E_HBM = 819e9


def _roofline_us(E, L, noff):
    return E * (noff + 2) * L * L * 4 / _V5E_HBM * 1e6


MESHES = {
    "square_circle_p6": {"E": 56, "ifaces": 96, "L": 137, "noff": 133,
                         # measured on-chip r3 (calibrate_scaling.py,
                         # chunked flat layout — the framework
                         # auto-choice: --flat --echunk 8):
                         "t_apply_meas_us": 1048.7,
                         "cut_frac": {2: 0.09, 4: 0.17, 8: 0.31}},
    "bp1_v1_N96": {"E": 194, "ifaces": 353, "L": 97, "noff": 9,
                   "cut_frac": {2: 0.05, 4: 0.11, 8: 0.21, 16: 0.34}},
    "flower_v2_N32": {"E": 67, "ifaces": 117, "L": 33, "noff": 9,
                      "cut_frac": {4: 0.15, 8: 0.32}},
}


def model(E, ifaces, L, t_apply_s, n, ici_GBs, lat_us, cut_frac=None,
          nslices=None, dcn_GBs=None, dcn_lat_us=None):
    """Per-iteration time on n chips; returns (t_iter, efficiency)."""
    t_comp = t_apply_s / n
    # face-trace all_gather: E*4*L f32, ring moves (n-1)/n per chip
    bytes_ag = E * 4 * L * 4
    t_ag = (n - 1) / max(n, 1) * bytes_ag / (ici_GBs * 1e9) \
        + (n - 1) * lat_us * 1e-6
    # two scalar psums (CG dots): latency-dominated ring reductions
    t_dot = 2 * (n - 1) * lat_us * 1e-6
    t_dcn = 0.0
    if nslices and nslices > 1:
        cut = cut_frac[nslices]
        bytes_dcn = cut * ifaces * L * 4
        t_dcn = bytes_dcn / (dcn_GBs * 1e9) + dcn_lat_us * 1e-6
    t_iter = t_comp + t_ag + t_dot + t_dcn
    eff = (t_apply_s / n) / t_iter
    return t_iter, eff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-apply-us", type=float, default=None,
                    help="measured single-chip batched DIA apply time "
                         "for the whole mesh (us); default: the mesh's "
                         "HBM coefficient-streaming roofline (v5e)")
    ap.add_argument("--mesh", default="square_circle_p6",
                    choices=sorted(MESHES))
    ap.add_argument("--ici-GBs", type=float, default=100.0,
                    help="effective per-chip ring bandwidth (v5e: 4 ICI "
                         "links x 400 Gbps; a 1D ring uses 2 links -> "
                         "~100 GB/s effective)")
    ap.add_argument("--ici-lat-us", type=float, default=1.0)
    ap.add_argument("--dcn-GBs", type=float, default=6.25,
                    help="per-host DCN (v5e: ~50 Gbps/host effective)")
    ap.add_argument("--dcn-lat-us", type=float, default=50.0)
    a = ap.parse_args()

    m = MESHES[a.mesh]
    if a.t_apply_us is None:
        # prefer the measured on-chip apply time when the mesh carries
        # one (calibrate_scaling.py); fall back to the HBM roofline
        a.t_apply_us = m.get("t_apply_meas_us") \
            or round(_roofline_us(m["E"], m["L"], m["noff"]), 1)
    t_apply = a.t_apply_us * 1e-6
    rows = []
    for n in (1, 2, 4, 8, 16):
        if n > m["E"]:
            continue
        t_iter, eff = model(m["E"], m["ifaces"], m["L"], t_apply, n,
                            a.ici_GBs, a.ici_lat_us)
        rows.append({"chips": n, "topology": "1d_block",
                     "t_iter_us": round(t_iter * 1e6, 1),
                     "efficiency": round(eff, 3)})
    for nsl in sorted(m["cut_frac"]):
        nb = max(1, min(8, m["E"] // nsl))
        n = nsl * nb
        t_iter, eff = model(m["E"], m["ifaces"], m["L"], t_apply, n,
                            a.ici_GBs, a.ici_lat_us,
                            cut_frac=m["cut_frac"], nslices=nsl,
                            dcn_GBs=a.dcn_GBs, dcn_lat_us=a.dcn_lat_us)
        rows.append({"chips": n, "topology": f"{nsl}slice_x_{nb}block",
                     "t_iter_us": round(t_iter * 1e6, 1),
                     "efficiency": round(eff, 3)})

    for r in rows:
        print(f"# {r['topology']:>18} n={r['chips']:>3}: "
              f"{r['t_iter_us']:8.1f} us/iter, eff {r['efficiency']:.2f}",
              file=sys.stderr)
    print(json.dumps({
        "mesh": a.mesh, "t_apply_us": a.t_apply_us,
        "assumptions": {"ici_GBs": a.ici_GBs, "ici_lat_us": a.ici_lat_us,
                        "dcn_GBs": a.dcn_GBs, "dcn_lat_us": a.dcn_lat_us},
        "rows": rows}))


if __name__ == "__main__":
    main()
