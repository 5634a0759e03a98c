"""Seismic-event extraction from saved cycle solutions.

The single home of the event-series definition used by every gate and
tool (review r3: three near-identical copies had grown in
tests/test_bp1_multiblock.py, tools/bp1mb_convergence.py and
tools/seas_bp1_domain.py): a seismic event starts where
log10(Vmax) crosses above ``threshold`` (SEAS convention: -3, i.e.
1 mm/s), and onsets closer than ``merge_window_yr`` are one event.
"""
import numpy as np


def merged_events(sol, year_seconds, *, threshold=-3.0,
                  merge_window_yr=1.0):
    """Event onset times (years) + per-event coseismic slip + max level.

    ``sol`` is a cycle solution with ``ts`` (possibly NaN-padded) and
    ``save["log10_vmax"]``; coseismic slip is measured when the save
    stream carries per-station slip (``delta``) or its max
    (``delta_max``): per event, the max over stations of the slip
    change across the seismic window (a deep creeping station's total
    never changes coseismically).

    Returns ``(times, coseis, max_log10_vmax)``; ``times`` and
    ``coseis`` are plain lists (empty when no event).
    """
    ts = np.asarray(sol.ts)
    valid = np.isfinite(ts)
    lv = np.asarray(sol.save["log10_vmax"])[valid]
    if "delta" in sol.save:
        dsta = np.asarray(sol.save["delta"])[valid]      # (steps, nsta)
    elif "delta_max" in sol.save:
        dsta = np.asarray(sol.save["delta_max"])[valid][:, None]
    else:
        dsta = None
    ts = ts[valid] / year_seconds
    seismic = lv > threshold
    up = np.where(seismic[1:] & ~seismic[:-1])[0] + 1
    down = np.where(~seismic[1:] & seismic[:-1])[0] + 1
    # group up-crossings: onsets within merge_window_yr of a group's
    # FIRST onset are bursts of the same event
    groups = []
    for i in up:
        if not groups or ts[i] - ts[groups[-1][0]] > merge_window_yr:
            groups.append([i])
        else:
            groups[-1].append(i)
    merged = [float(ts[g[0]]) for g in groups]
    coseis = []
    if dsta is not None:
        for g in groups:
            # the event's slip window runs from the first burst's onset
            # to the LAST merged burst's down-crossing (a first-down
            # window would silently drop later bursts' slip)
            j = down[down > g[-1]]
            j = int(j[0]) if len(j) else len(ts) - 1
            coseis.append(float(np.max(dsta[j] - dsta[g[0]])))
    return merged, coseis, float(np.max(lv)) if lv.size else float("-inf")
