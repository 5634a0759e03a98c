#!/usr/bin/env python
"""Two-material circle-in-square MMS convergence study.

The canonical end-to-end pipeline of the framework (reference parity:
square_circle.jl): a manufactured solution with a prescribed slip *jump*
across the circle r=1, discretized on the 56-block curved mesh, solved by
one of the three hybrid methods, with energy-norm solution error and
fault-traction error reported over refinement levels (expected rates ~ p).

Usage: python drivers/square_circle.py [--p 6] [--levels 4] [--N0 17]
                                       [--method trace]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hybridsbp_tpu import BC_DIRICHLET, BC_JUMP_INTERFACE, BC_NEUMANN  # noqa: E402
from hybridsbp_tpu.hybrid import build_problem, build_problem_light  # noqa: E402
from hybridsbp_tpu.hybrid.assemble import bcstarts  # noqa: E402
from hybridsbp_tpu.mesh import read_inp_2d  # noqa: E402
from hybridsbp_tpu.hybrid import assemble_jump_rhs  # noqa: E402
from hybridsbp_tpu.ops2d import computetraction, locsourcearray  # noqa: E402

MESH = os.path.join(os.path.dirname(__file__), "..", "meshes",
                    "square_circle.inp")
C = np.e / (1 + np.e)


# ---- manufactured solution (square_circle.jl:100-169) ----------------------
def _polar(x, y):
    return np.sqrt(x**2 + y**2), np.arctan2(y, x)


def vex(x, y, dom):
    r, th = _polar(x, y)
    if dom == 1:  # inside the circle
        return C * (1 - np.exp(-r**2)) * r * np.sin(th)
    return (r - 1) ** 2 * np.cos(th) + (r - 1) * np.sin(th)


def vex_x(x, y, dom):
    r, th = _polar(x, y)
    if dom == 1:
        dv_dr = C * (2 * r**2 * np.exp(-r**2) + 1 - np.exp(-r**2)) * np.sin(th)
        dv_dth = C * (1 - np.exp(-r**2)) * r * np.cos(th)
    else:
        dv_dr = 2 * (r - 1) * np.cos(th) + np.sin(th)
        dv_dth = -((r - 1) ** 2) * np.sin(th) + (r - 1) * np.cos(th)
    return dv_dr * np.cos(th) + dv_dth * (-np.sin(th) / r)


def vex_y(x, y, dom):
    r, th = _polar(x, y)
    if dom == 1:
        dv_dr = C * (2 * r**2 * np.exp(-r**2) + 1 - np.exp(-r**2)) * np.sin(th)
        dv_dth = C * (1 - np.exp(-r**2)) * r * np.cos(th)
    else:
        dv_dr = 2 * (r - 1) * np.cos(th) + np.sin(th)
        dv_dth = -((r - 1) ** 2) * np.sin(th) + (r - 1) * np.cos(th)
    return dv_dr * np.sin(th) + dv_dth * (np.cos(th) / r)


def polar_laplace(x, y, dom):
    r, th = _polar(x, y)
    if dom == 1:
        u_r = C * (2 * r**2 * np.exp(-r**2) + 1 - np.exp(-r**2)) * np.sin(th)
        u_rr = C * np.exp(-r**2) * (6 * r - 4 * r**3) * np.sin(th)
        return u_rr + u_r / r - (C / r**2) * (1 - np.exp(-r**2)) * r * np.sin(th)
    return (2 * np.cos(th)
            + (2 * (r - 1) * np.cos(th) + np.sin(th)) / r
            + (-((r - 1) ** 2) * np.cos(th) - (r - 1) * np.sin(th)) / r**2)


# ---- driver ----------------------------------------------------------------
def load_mesh():
    bc_map = [BC_DIRICHLET, BC_DIRICHLET, BC_NEUMANN, BC_NEUMANN,
              BC_JUMP_INTERFACE]
    verts, EToV, EToF, FToB, EToDomain = read_inp_2d(MESH, bc_map=bc_map)
    # snap near-circle vertices exactly onto the circle (sc:27-33)
    rad = np.hypot(verts[0], verts[1])
    snap = np.abs(rad - 1) < 1e-5
    ang = np.arctan2(verts[1, snap], verts[0, snap])
    verts[0, snap] = np.cos(ang)
    verts[1, snap] = np.sin(ang)
    return verts, EToV, EToF, FToB, EToDomain


def make_edge_override(verts, EToV, EToF, FToB):
    """Install circular-arc parametrizations on jump faces (sc:244-274)."""
    def override(e, ex, exa, ey, eya):
        xs = verts[0, EToV[:, e]]
        ys = verts[1, EToV[:, e]]
        for lf in (0, 1):
            if FToB[EToF[lf, e]] == BC_JUMP_INTERFACE:
                raise NotImplementedError(f"curved face {lf} not supported")
        if FToB[EToF[2, e]] == BC_JUMP_INTERFACE:
            Q1, Q2 = np.arctan2(ys[0], xs[0]), np.arctan2(ys[1], xs[1])
            if not (-np.pi / 2 < Q1 - Q2 < np.pi / 2):
                Q2 -= np.sign(Q2) * 2 * np.pi
            b = (Q2 - Q1) / 2
            ex[2] = lambda a: np.cos(Q1 * (1 - a) / 2 + Q2 * (1 + a) / 2)
            ey[2] = lambda a: np.sin(Q1 * (1 - a) / 2 + Q2 * (1 + a) / 2)
            exa[2] = lambda a: -b * np.sin(Q1 * (1 - a) / 2 + Q2 * (1 + a) / 2)
            eya[2] = lambda a: +b * np.cos(Q1 * (1 - a) / 2 + Q2 * (1 + a) / 2)
        if FToB[EToF[3, e]] == BC_JUMP_INTERFACE:
            Q3, Q4 = np.arctan2(ys[2], xs[2]), np.arctan2(ys[3], xs[3])
            if not (-np.pi / 2 < Q3 - Q4 < np.pi / 2):
                raise NotImplementedError("face-4 angle correction")
            b = (Q4 - Q3) / 2
            ex[3] = lambda a: np.cos(Q3 * (1 - a) / 2 + Q4 * (1 + a) / 2)
            ey[3] = lambda a: np.sin(Q3 * (1 - a) / 2 + Q4 * (1 + a) / 2)
            exa[3] = lambda a: -b * np.sin(Q3 * (1 - a) / 2 + Q4 * (1 + a) / 2)
            eya[3] = lambda a: +b * np.cos(Q3 * (1 - a) / 2 + Q4 * (1 + a) / 2)
    return override


def assemble_level(p, N_per_block, mesh_data=None, light=False):
    """Build the hybrid problem + MMS RHS for one refinement level.

    ``light=True`` uses :func:`hybridsbp_tpu.hybrid.build_problem_light`
    — no per-block factorizations, no assembled trace matrix B — for
    device-only runs at sizes the host pipeline cannot reach.

    Returns (prob, g, gdelta, delta, FTods, EToDomain, conn).
    """
    if mesh_data is None:
        mesh_data = load_mesh()
    verts, EToV, EToF, FToB, EToDomain = mesh_data
    nelems, nfaces = EToV.shape[1], len(FToB)
    override = make_edge_override(verts, EToV, EToF, FToB)
    N = np.full(nelems, N_per_block)
    builder = build_problem_light if light else build_problem
    prob, (FToE, FToLF, EToO, EToS) = builder(
        p, verts, EToV, EToF, FToB, N, N, edge_override=override)
    lops, vstarts, FToLs = prob.lops, prob.vstarts, prob.FToLstarts
    FTods = bcstarts(FToB, FToE, FToLF, [BC_JUMP_INTERFACE], lops)

    # slip jump data on the fault faces (minus-side ordering)
    delta = np.zeros(int(FTods[-1]))
    for f in range(nfaces):
        if FToB[f] == BC_JUMP_INTERFACE:
            e1, e2 = FToE[:, f]
            lf1 = FToLF[0, f]
            xf = lops[e1].facecoord[0][lf1]
            yf = lops[e1].facecoord[1][lf1]
            delta[FTods[f]:FTods[f + 1]] = (
                vex(xf, yf, EToDomain[e2]) - vex(xf, yf, EToDomain[e1]))

    g, gdelta = assemble_jump_rhs(
        prob, delta, FTods,
        bc_Dirichlet=lambda e, lf, x, y: vex(x, y, EToDomain[e]),
        bc_Neumann=lambda e, lf, x, y, nx, ny: (
            nx * vex_x(x, y, EToDomain[e]) + ny * vex_y(x, y, EToDomain[e])),
        extra_g=lambda e: locsourcearray(
            lops[e], lambda x, y: -polar_laplace(x, y, EToDomain[e])))
    return prob, g, gdelta, delta, FTods, EToDomain, (FToE, FToLF, EToO, EToS)


def run_device(p=6, N=136, tol=1e-6, inner_iters=8, verbose=True,
               stencil="auto", repeats=3, binv_dtype=None,
               method="displacements", trace_mode="dense",
               assemble_device=False, flat_sym=False):
    """Single-method wrapper over :func:`run_device_multi` (see there
    for the methodology); returns that method's result dict."""
    return run_device_multi(p=p, N=N, tol=tol, inner_iters=inner_iters,
                            verbose=verbose, stencil=stencil,
                            repeats=repeats, binv_dtype=binv_dtype,
                            methods=(method,), trace_mode=trace_mode,
                            assemble_device=assemble_device,
                            flat_sym=flat_sym)[method]


def run_device_multi(p=6, N=136, tol=1e-6, inner_iters=8, verbose=True,
                     stencil="auto", repeats=3, binv_dtype=None,
                     flat_sym=False,
                     methods=("displacements",), trace_mode="dense",
                     assemble_device=False):
    """Solve ONE refinement level of the square_circle problem on the
    device (the reference's finest level is p=6, N=136/block — ~1.05M
    volume DOF on the 56-block curved mesh, square_circle.jl:22,40,209):
    f32 blocked operator.  ``methods`` is a tuple solved off ONE shared
    assembly + host reference solve + device setup; each entry:

    - 'displacements': CG on the eliminated SPD system with the
      Woodbury two-level preconditioner (fastdiag inner CG + the
      assembled trace inverse as one MXU matmul), flexible CG.
    - 'trace': the reference's DEFAULT hybrid method
      (square_circle.jl:374-388) — flexible CG on the trace Schur
      complement B with batched fastdiag-CG inner block solves and the
      assembled B^{-1} as outer preconditioner.

    Reports warm per-solve wall time and the error against the host
    f64 direct solve; returns ``{method: result_dict}``.
    """
    import time

    import jax
    import jax.numpy as jnp

    from hybridsbp_tpu.tpu import (build_blocked, solve_displacements,
                                   solve_trace)
    from hybridsbp_tpu.tpu.multiblock import (blocked_rhs_from_host,
                                              build_woodbury,
                                              woodbury_precond)

    t0 = time.time()
    prob, g, gdelta, delta, FTods, EToDomain, conn = assemble_level(p, N)
    nvol = int(prob.vstarts[-1])
    if verbose:
        print(f"assembled p={p} N={N}: {nvol} volume DOF, "
              f"{len(prob.lops)} blocks ({time.time() - t0:.1f}s host)")

    t0 = time.time()
    u_host, _ = prob.solve(g, gdelta, method="trace")
    t_host = time.time() - t0
    if verbose:
        print(f"host direct (trace) solve: {t_host:.2f}s")

    t0 = time.time()
    # assemble_device: ship 3 metric planes/block (~13 MB at N=136)
    # and assemble the DIA stack on-chip instead of transferring the
    # ~560 MB host-extracted planes (tpu.assemble_device)
    bp = build_blocked(prob, dtype=jnp.float32,
                       assemble_on_device=assemble_device,
                       flat_sym=flat_sym)
    gb, gd = blocked_rhs_from_host(prob, g, gdelta)
    gb, gd = gb.astype(jnp.float32), gd.astype(jnp.float32)
    # B^{-1} is only a preconditioner under flexible CG — bf16 storage
    # halves its host->device transfer (the dominant setup cost over
    # the tunnel) at no accuracy cost to the solution.  trace_mode
    # 'banded' skips the dense nλ³ host inverse and nλ² transfer
    # entirely (O(nfaces·L²) face-pair blocks + fixed-iteration
    # block-Jacobi CG — VERDICT r2 next #3)
    if trace_mode == "banded":
        from hybridsbp_tpu.tpu.multiblock import build_woodbury_banded
        trace_inv = build_woodbury_banded(bp, prob, dtype=binv_dtype,
                                          iters=32)
    else:
        trace_inv = build_woodbury(bp, prob, dtype=binv_dtype)
    if verbose:
        print(f"device setup (blocked extract + {trace_mode} B^-1): "
              f"{time.time() - t0:.1f}s")

    return _timed_device_solves(
        bp, trace_inv, gb, gd, u_host, nvol=nvol, methods=methods,
        tol=tol, inner_iters=inner_iters, repeats=repeats,
        stencil=stencil, t_host=t_host, verbose=verbose,
        nblocks=len(prob.lops))


def _timed_device_solves(bp, trace_inv, gb, gd, u_host, *, nvol, methods,
                         tol, inner_iters, repeats, stencil, t_host,
                         verbose, nblocks, trace_inner_tol=None):
    """Shared timing core of :func:`run_device_multi` /
    :func:`run_flagship_cached`: one jitted program per method
    (operator arrays as jit arguments — see tpu.multiblock.
    make_jit_solver for the eager-dispatch-RTT and closure-literal-HLO
    tunnel lessons), warm per-call walls, chained RTT-free device
    time, and max error against the host f64 reference solution."""
    import jax

    from hybridsbp_tpu.tpu.multiblock import make_jit_solver

    out = {}
    for method in methods:
        def make_solve(stencil, method=method):
            sj = make_jit_solver(bp, method=method, trace_inv=trace_inv,
                                 tol=tol, maxiter=200,
                                 inner_iters=inner_iters, stencil=stencil,
                                 trace_inner_tol=trace_inner_tol)

            def solve():
                res = sj(gb, gd)
                res.x.block_until_ready()
                float(res.resnorm)   # scalar fetch = real sync (tunnel)
                return res

            solve.sj = sj
            return solve

        mstencil = stencil
        solve = make_solve(mstencil)
        t0 = time.time()
        try:
            res = solve()                      # compile + first run
        except Exception as e:                 # noqa: BLE001
            # the axon remote-compile endpoint rejects very large
            # serialized programs (HTTP 413) — the unrolled high-plane-
            # count stencil at p=6 trips it; the scan-based compact
            # apply is ~10x smaller
            if "413" not in str(e) or mstencil == "compact":
                raise
            if verbose:
                print("remote compile rejected the unrolled-stencil "
                      "program (HTTP 413); retrying with "
                      "stencil='compact'")
            mstencil = "compact"
            solve = make_solve(mstencil)
            t0 = time.time()
            res = solve()
        t_first = time.time() - t0
        # a failed first solve (stalled/diverged) is not worth timing:
        # at N=272 each repeat re-burns minutes re-producing the same
        # failure — report it once and move on (VERDICT r4 next #3)
        failed = not bool(res.converged)
        ts = []
        for _ in range(0 if failed else repeats):
            t0 = time.time()
            res = solve()
            ts.append(time.time() - t0)
        t_warm = float(np.median(ts)) if ts else t_first
        t_warm_min = float(np.min(ts)) if ts else t_first

        # chained (RTT-free) device time: per-call walls carry
        # host-dispatch + tunnel round trips (~50 ms on a 75 ms call);
        # running k back-to-back solves inside ONE program and
        # two-point-fitting removes them (shared harness:
        # utils.profiling.chained_time — median-of-5 per the repo
        # timing policy, serialized chain links).  Chain length is
        # budgeted by the warm per-call wall: the tunneled worker
        # KILLS multi-minute single launches (a k2=3 chain of N=272
        # trace solves crashed it — UNAVAILABLE, r4), and at
        # multi-second solves one RTT is <2% anyway, so past ~20 s
        # per chain the fit stops paying for its risk.
        t_chain = None
        if t_warm <= 8.0:
            try:
                from hybridsbp_tpu.utils.profiling import chained_time
                sj2 = solve.sj
                k2 = int(max(2, min(3, 20.0 // max(t_warm, 1e-3))))
                t_chain = chained_time(
                    lambda g_, a_, gd_: sj2.fn(a_, g_, gd_).x,
                    (gb, sj2.arrs, gd), k2=k2)
            except Exception as e:               # noqa: BLE001
                if verbose:
                    print(f"  chained timing unavailable: "
                          f"{type(e).__name__}: {str(e)[:120]}")
        elif verbose:
            print(f"  chained timing skipped (warm {t_warm:.1f}s/solve: "
                  "chain would exceed the tunneled worker's launch "
                  "budget; per-call wall carries ~1 RTT = <2% here)")

        # fetch results to HOST eagerly: if a later launch crashes the
        # tunneled worker, every live device buffer dies with it — an
        # already-completed method's solution must not be lost (r4:
        # the N=272 trace-chain crash voided the displacements MMS)
        x_host = np.asarray(res.x[:nblocks])
        iters, conv, resnorm = (int(res.iters), bool(res.converged),
                                float(res.resnorm))
        stalled = bool(getattr(res, "stalled", False))
        rel = None
        if u_host is not None:
            err = np.abs(x_host.ravel().astype(np.float64)
                         - u_host).max()
            rel = float(err / np.abs(u_host).max())
        if verbose:
            print(f"device solve [{method}] ({jax.default_backend()}): "
                  f"{iters} outer FCG iters, converged={conv}"
                  + (" STALLED (no residual progress over the guard "
                     "window — broken preconditioner or tol below the "
                     "attainable floor)" if stalled else ""))
            print(f"  first call {t_first:.2f}s (incl. compile), "
                  f"warm {t_warm * 1e3:.0f} ms/solve "
                  + (f"(host direct: {t_host * 1e3:.0f} ms)"
                     if t_host is not None else ""))
            if t_chain is not None:
                print(f"  chained device time {t_chain * 1e3:.0f} "
                      f"ms/solve (per-call wall carries one tunnel RTT)")
            if rel is not None:
                print(f"  max err vs host f64: {err:.3e} (rel {rel:.3e})")
        out[method] = {"nvol": nvol, "iters": iters,
                       "converged": conv, "stalled": stalled,
                       "resnorm": resnorm,
                       "t_warm_s": t_warm, "t_warm_min_s": t_warm_min,
                       "t_chained_s": t_chain,
                       "t_first_s": t_first,
                       "t_host_s": t_host, "rel_err": rel,
                       "_x": x_host}     # host-fetched fields (for
    return out                           # callers that verify further)


FLAGSHIP_CACHE = os.path.join(os.path.dirname(__file__), "..",
                              "artifacts", "flagship_p6_N136.cache")


def build_flagship_cache(path=None, p=6, N=136, verbose=True):
    """One-time builder for the flagship device-problem cache
    (VERDICT r3 next #1): runs the FULL host pipeline once
    (assemble_level + f64 direct solve + device-form extraction —
    ~20-35 min on the 1-vCPU host, dominated by HybridProblem.build's
    trace-matrix probing) and saves everything the device solve needs:

    - the BlockedHybrid *template* (face tensors, fastdiag transforms,
      Dinv, JH, static connectivity) WITHOUT the ~560 MB coefficient
      stack — the load re-assembles it ON the device from the cached
      ~13 MB of metric planes (tpu.assemble_device), exactly the
      recommended fast-setup path;
    - the banded trace preconditioner blocks (build_woodbury_banded);
    - the blocked RHS and the host f64 reference solution (f32-stored;
      the f32 device solve's error floor is ~1e-3 >> the cast error);
    - a numerics fingerprint (utils.fingerprint) so stale caches are
      detected when SBP tables / locoperator numerics change.

    Reference scale: square_circle.jl:22,40,209 — 56 blocks, p=6,
    N=136/block, ~1.05M volume DOF (the reference's finest level).
    """
    import time as _time

    import jax.numpy as jnp

    from hybridsbp_tpu import BC_NEUMANN as _BCN
    from hybridsbp_tpu.tpu import build_blocked
    from hybridsbp_tpu.tpu.assemble_device import extract_assembly_data
    from hybridsbp_tpu.tpu.multiblock import (blocked_rhs_from_host,
                                              build_woodbury_banded)
    from hybridsbp_tpu.utils.fingerprint import op_fingerprint
    from hybridsbp_tpu.utils.serialize import save_pytree

    path = path or FLAGSHIP_CACHE
    t_all = _time.time()
    t0 = _time.time()
    prob, g, gdelta, delta, FTods, EToDomain, conn = assemble_level(p, N)
    nvol = int(prob.vstarts[-1])
    t_asm = _time.time() - t0
    if verbose:
        print(f"assembled p={p} N={N}: {nvol} volume DOF, "
              f"{len(prob.lops)} blocks ({t_asm:.1f}s host)")
    t0 = _time.time()
    u_host, _ = prob.solve(g, gdelta, method="trace")
    t_host = _time.time() - t0
    if verbose:
        print(f"host direct (trace) solve: {t_host:.2f}s")

    t0 = _time.time()
    bp = build_blocked(prob, dtype=jnp.float32, assemble_on_device=True,
                       flat=False)
    ti = build_woodbury_banded(bp, prob, iters=32)
    gb, gd = blocked_rhs_from_host(prob, g, gdelta)
    gb, gd = gb.astype(jnp.float32), gd.astype(jnp.float32)
    lops = prob.lops
    E = len(lops)
    ts = float(getattr(lops[0], "tau_scale", 2.0))
    crr = np.stack([np.asarray(lops[e].metrics.crr)
                    for e in range(E)]).astype(np.float32)
    css = np.stack([np.asarray(lops[e].metrics.css)
                    for e in range(E)]).astype(np.float32)
    crs = np.stack([np.asarray(lops[e].metrics.crs)
                    for e in range(E)]).astype(np.float32)
    masks = np.array([[1.0 if b == _BCN else 0.0 for b in lops[e].bctype]
                      for e in range(E)], dtype=np.float32)
    data = extract_assembly_data(p, N, N, tau_scale=ts)
    if verbose:
        print(f"device-form extraction: {_time.time() - t0:.1f}s")

    payload = {
        "bp_template": bp._replace(coefs=None, coefs_flat=None),
        "assembly_inputs": {"crr": crr, "css": css, "crs": crs,
                            "masks": masks, "tau_scale": ts},
        "assembly_data": data,
        "trace_inv": ti,
        "gb": np.asarray(gb, dtype=np.float32),
        "gd": np.asarray(gd, dtype=np.float32),
        "u_host": np.asarray(u_host, dtype=np.float32),
        "u_host_absmax": float(np.abs(u_host).max()),
    }
    meta = {"p": p, "N": N, "E": E, "nvol": nvol,
            "fingerprint": op_fingerprint(),
            "t_host_assemble_s": t_asm, "t_host_solve_s": t_host,
            "built_wall_s": _time.time() - t_all}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_pytree(path, payload, meta)
    if verbose:
        print(f"wrote {path} "
              f"({os.path.getsize(path) / 1e6:.1f} MB, "
              f"{meta['built_wall_s']:.0f}s total)")
    return path


def load_flagship_problem(path=None, flat="auto", verbose=True):
    """Load the flagship device problem from the prebuilt cache and
    re-assemble the operator ON the device (the shared front half of
    :func:`run_flagship_cached`; also used by tools/flagship_refined).

    Returns ``(bp, trace_inv, gb, gd, u_host64, meta)``."""
    import jax
    import jax.numpy as jnp

    from hybridsbp_tpu.tpu.assemble_device import assemble_planes
    from hybridsbp_tpu.tpu.multiblock import with_flat_layout
    from hybridsbp_tpu.utils.fingerprint import op_fingerprint
    from hybridsbp_tpu.utils.serialize import load_pytree

    path = path or FLAGSHIP_CACHE
    t0 = time.time()
    payload, meta = load_pytree(path)
    fp = op_fingerprint()
    if not np.isclose(fp, meta["fingerprint"], rtol=1e-12, atol=0.0):
        raise RuntimeError(
            f"flagship cache {path} numerics fingerprint mismatch "
            f"(cache {meta['fingerprint']!r} vs current {fp!r}); "
            "rebuild with build_flagship_cache()")
    if verbose:
        print(f"loaded flagship cache (p={meta['p']} N={meta['N']}, "
              f"{meta['nvol']} DOF): {time.time() - t0:.1f}s")

    t0 = time.time()
    ai = payload["assembly_inputs"]
    data = payload["assembly_data"]
    assemble = jax.jit(jax.vmap(
        lambda a, b, c, m: assemble_planes(data, a, b, c, m)))
    coefs = assemble(jnp.asarray(ai["crr"]), jnp.asarray(ai["css"]),
                     jnp.asarray(ai["crs"]), jnp.asarray(ai["masks"]))
    bp = payload["bp_template"]._replace(coefs=coefs)
    if flat == "auto":
        Nsp, Nrp = bp.grid_shape
        waste = (-(Nsp // -8) * 8) * (-(Nrp // -128) * 128) / (Nsp * Nrp)
        flat = jax.default_backend() not in ("cpu",) and waste > 1.10
    if flat:
        bp = with_flat_layout(bp)
    if verbose:
        print(f"on-device assembly + flat layout: {time.time() - t0:.1f}s")
    return (bp, payload["trace_inv"], jnp.asarray(payload["gb"]),
            jnp.asarray(payload["gd"]),
            np.asarray(payload["u_host"], dtype=np.float64), meta)


def run_flagship_cached(path=None, tol=1e-6, inner_iters=8, repeats=3,
                        methods=("displacements", "trace"), verbose=True,
                        flat="auto", stencil="auto"):
    """Flagship 1.05M-DOF solve from the prebuilt cache — NO host
    assembly (VERDICT r3 next #1; the ~20-32 min HybridProblem.build is
    paid once by :func:`build_flagship_cache`).  Loads the device-input
    form, re-assembles the DIA stack ON the device from ~13 MB of
    metric planes (HIGHEST-precision einsums, tpu.assemble_device),
    attaches the flat chunked layout, and times both hybrid methods;
    verification is (a) the solver's own residual norm and (b) max
    error against the CACHED host f64 direct solution."""
    bp, trace_inv, gb, gd, u_host, meta = load_flagship_problem(
        path, flat=flat, verbose=verbose)
    return _timed_device_solves(
        bp, trace_inv, gb, gd, u_host,
        nvol=meta["nvol"], methods=methods, tol=tol,
        inner_iters=inner_iters, repeats=repeats, stencil=stencil,
        t_host=meta["t_host_solve_s"], verbose=verbose,
        nblocks=meta["E"])


def _mem_logger(verbose):
    """HBM-telemetry recorder for the device-only paths: returns
    ``(mem_log, _mem)`` where ``_mem(tag)`` records a best-effort
    device-memory reading (``utils.profiling.device_mem_gb`` — the
    tunneled backend's ``memory_stats()`` is empty, so a live-array
    sum is the honest fallback; VERDICT r4 next #5)."""
    mem_log = {}

    def _mem(tag):
        from hybridsbp_tpu.utils.profiling import device_mem_gb
        gb, src = device_mem_gb()
        mem_log[tag] = (gb, src)
        if verbose:
            if src == "memory_stats":
                print(f"  [{tag}] device bytes_in_use = {gb:.3f} GB",
                      flush=True)
            elif src == "live_arrays":
                print(f"  [{tag}] live-array device bytes = {gb:.3f} GB"
                      " (memory_stats unavailable on this backend; "
                      "excludes XLA scratch)", flush=True)
            else:
                print(f"  [{tag}] device memory telemetry unavailable",
                      flush=True)

    return mem_log, _mem


def _mms_errors(prob, EToDomain, u, lam, delta, FTods, conn):
    """Energy-norm solution error and fault-traction error against the
    manufactured solution (the same measures :func:`run` reports per
    refinement level), from stacked host vectors."""
    FToE, FToLF, EToO, EToS = conn
    lops, vstarts, FToLs = prob.lops, prob.vstarts, prob.FToLstarts
    nelems, nfaces = len(lops), len(prob.FToB)
    err2, umax, uerrmax = 0.0, 0.0, 0.0
    for e in range(nelems):
        lop = lops[e]
        x, y = lop.coord
        ue = vex(x.ravel(), y.ravel(), EToDomain[e])
        du = u[vstarts[e]:vstarts[e + 1]] - ue
        err2 += du @ (lop.JH * du)
        umax = max(umax, np.abs(ue).max())
        uerrmax = max(uerrmax, np.abs(du).max())
    terr2 = 0.0
    if lam is not None:
        for f in range(nfaces):
            if prob.FToB[f] != BC_JUMP_INTERFACE:
                continue
            e1, lf1 = FToE[0, f], FToLF[0, f]
            lop = lops[e1]
            xf = lop.facecoord[0][lf1]
            yf = lop.facecoord[1][lf1]
            tex = (lop.nx[lf1] * vex_x(xf, yf, EToDomain[e1])
                   + lop.ny[lf1] * vex_y(xf, yf, EToDomain[e1]))
            tau = computetraction(
                lop, lf1, u[vstarts[e1]:vstarts[e1 + 1]],
                lam[FToLs[f]:FToLs[f + 1]], delta[FTods[f]:FTods[f + 1]])
            dt = tau - tex
            terr2 += dt @ (lop.Hf[lf1] * lop.sJ[lf1] * dt)
    return (float(np.sqrt(err2)),
            float(np.sqrt(terr2)) if lam is not None else None,
            float(uerrmax / umax))


def run_device_only(p=6, N=272, tol=1e-6, inner_iters=8, repeats=3,
                    probe_iters=24, k_chunk=8, verbose=True,
                    methods=("displacements", "trace"), stencil="auto",
                    refine_sweeps=0, refine_inner_tol=2e-3,
                    refine_inner_maxiter=60, assemble_chunk=8,
                    trace_inner_tol="auto"):
    """Solve one refinement level ENTIRELY without the host direct
    pipeline (VERDICT r3 next #2) — the configuration for problem
    sizes the reference's host path cannot reach (its ladder stops at
    N=136, square_circle.jl:207-210; p=6 N=272 is ~4.2M volume DOF,
    whose HybridProblem.build would take hours on this host):

    - light host assembly only (lops + face metadata; no per-block LU,
      no assembled B — hybrid.build_problem_light),
    - on-device operator assembly from ~L² metric planes
      (build_blocked(assemble_on_device=True) + flat layout),
    - on-device banded trace preconditioner by fastdiag-CG probing
      (tpu.multiblock.banded_from_device — no host B anywhere),
    - verification WITHOUT a host oracle: the solver residual norm +
      energy-norm / max / traction errors against the exact
      manufactured solution (extends the MMS ladder of
      tools/mms_oracle.py one level past the reference's finest).

    ``refine_sweeps > 0`` adds the mixed-precision refined solve
    (tpu.refine.make_refined_solver): at 4.2M DOF the pure-f32 solve
    bottoms out at the kappa*eps_f32 attainable-accuracy floor
    (~1.5e-3 relative residual — BOTH methods stall there, which is
    how the floor was diagnosed); f32 corrections + chunk-assembled
    f64 on-device residuals break it, reaching ~1e-9 in 3-4 sweeps.

    ``trace_inner_tol='auto'`` resolves to the framework default
    (tol*0.2).  A floor-aware loosening to max(tol*0.2, 3e-4) was
    tried while the bf16 face-contraction bug made everything look
    floor-limited — measured FAILURE at N=272 post-fix: inner solves
    at 3e-4 make every outer B application a *different* operator,
    and the flexible outer goes nowhere (200 iters, MMS rel err 1.0),
    while tol*0.2 converges.  Pass an explicit float to experiment.
    """
    import jax
    import jax.numpy as jnp

    from hybridsbp_tpu.tpu import build_blocked
    from hybridsbp_tpu.tpu.multiblock import (banded_from_device,
                                              blocked_rhs_from_host,
                                              recover_lambda)

    t0 = time.time()
    prob, g, gdelta, delta, FTods, EToDomain, conn = assemble_level(
        p, N, light=True)
    nvol = int(prob.vstarts[-1])
    t_light = time.time() - t0
    if verbose:
        print(f"light host assembly p={p} N={N}: {nvol} volume DOF, "
              f"{len(prob.lops)} blocks ({t_light:.1f}s — no LU, no B)")

    mem_log, _mem = _mem_logger(verbose)

    t0 = time.time()
    # flat-ONLY memory mode: at N=272 the padded plane stack is 3.2 GB
    # on top of the 2.2 GB flat stack; assemble, flatten, then release
    # the planes (with_flat_layout drop_planes) so the probing and
    # solve programs fit comfortably in HBM
    from hybridsbp_tpu.tpu.multiblock import with_flat_layout
    bp = build_blocked(prob, dtype=jnp.float32, assemble_on_device=True,
                       flat=False)
    float(jnp.sum(bp.coefs[0, 0]))          # sync the on-device assembly
    _mem("assembled planes")
    bp = with_flat_layout(bp, drop_planes=True)
    float(jnp.sum(bp.coefs_flat[0, 0]))     # sync the relayout
    _mem("flat-only")
    gb64, gd64 = blocked_rhs_from_host(prob, g, gdelta)
    gb, gd = gb64.astype(jnp.float32), gd64.astype(jnp.float32)
    t_bp = time.time() - t0
    if verbose:
        print(f"device setup: blocked + on-device assemble + flat-only "
              f"relayout {t_bp:.1f}s", flush=True)
    t0 = time.time()
    trace_inv = banded_from_device(bp, prob, iters=32,
                                   probe_iters=probe_iters,
                                   k_chunk=k_chunk, stencil=stencil)
    jax.block_until_ready(trace_inv.blocks)
    float(jnp.sum(trace_inv.diag_inv))      # scalar fetch = real sync
    t_binv = time.time() - t0
    _mem("banded B~ done")
    if verbose:
        print(f"on-device banded B~ probing {t_binv:.1f}s", flush=True)

    if trace_inner_tol == "auto":
        trace_inner_tol = None          # framework default: tol*0.2
    out = _timed_device_solves(
        bp, trace_inv, gb, gd, None, nvol=nvol, methods=methods,
        tol=tol, inner_iters=inner_iters, repeats=repeats,
        stencil=stencil, t_host=None, verbose=verbose,
        nblocks=len(prob.lops), trace_inner_tol=trace_inner_tol)
    _mem("post-solves")

    def _mms_from_x(x, bp_, gd_, tag):
        """MMS errors of a device solution (no host oracle)."""
        E = len(prob.lops)
        u = np.asarray(x[:E], dtype=np.float64).reshape(E, -1).ravel()
        lamf = recover_lambda(bp_, x[:E].astype(gd_.dtype), gd_)
        # face-padded -> stacked FToLstarts layout
        lam = np.zeros(int(prob.FToLstarts[-1]))
        lamf = np.asarray(lamf, dtype=np.float64)
        for f in range(len(prob.FToB)):
            s0, s1 = prob.FToLstarts[f], prob.FToLstarts[f + 1]
            lam[s0:s1] = lamf[f, :s1 - s0]
        e_en, e_tau, e_rel = _mms_errors(prob, EToDomain, u, lam, delta,
                                         FTods, conn)
        if verbose:
            print(f"  [{tag}] MMS energy err {e_en:.4e}, traction "
                  f"err {e_tau:.4e}, rel max err {e_rel:.3e}", flush=True)
        return dict(mms_energy_err=e_en, mms_traction_err=e_tau,
                    mms_rel_maxerr=e_rel)

    # MMS verification: reuse the timed solves' final device fields —
    # no extra solve/compile.
    for method in methods:
        out[method].update(_mms_from_x(out[method].pop("_x"), bp, gd,
                                       method))

    if refine_sweeps:
        from hybridsbp_tpu.tpu.refine import make_refined_solver
        t0 = time.time()
        bp64 = build_blocked(prob, dtype=jnp.float64,
                             assemble_on_device=True,
                             assemble_chunk=assemble_chunk,
                             with_fastdiag=False)
        float(jnp.sum(bp64.coefs_flat[0, 0]))   # sync
        t_bp64 = time.time() - t0
        _mem("f64 residual operator")
        if verbose:
            print(f"f64 residual operator (chunked on-device assembly, "
                  f"{assemble_chunk} blocks/chunk): {t_bp64:.1f}s",
                  flush=True)
        refine = make_refined_solver(
            bp, bp64, trace_inv, inner_tol=refine_inner_tol,
            inner_maxiter=refine_inner_maxiter, inner_iters=inner_iters,
            stencil=stencil, fused=not refine_split)
        t0 = time.time()
        x64, rels = refine(gb64, gd64, sweeps=refine_sweeps,
                           verbose=verbose)
        t_ref_cold = time.time() - t0
        t0 = time.time()
        x64, rels = refine(gb64, gd64, sweeps=refine_sweeps)
        t_ref = time.time() - t0
        if verbose:
            print(f"refined solve: true rel residual {rels[-1]:.3e} in "
                  f"{len(rels)} sweeps, {t_ref:.2f}s warm "
                  f"({t_ref_cold:.1f}s incl. compile)", flush=True)
        out["refined"] = dict(rel_residuals=rels, t_warm_s=t_ref,
                              t_first_s=t_ref_cold, t_bp64_s=t_bp64)
        out["refined"].update(_mms_from_x(x64, bp64, gd64, "refined"))

    out["setup"] = {"t_light_host_s": t_light, "t_blocked_s": t_bp,
                    "t_banded_device_s": t_binv, "nvol": nvol,
                    "hbm_gb": mem_log}
    return out


DEVICE_ONLY_CACHE = os.path.join(os.path.dirname(__file__), "..",
                                 "artifacts",
                                 "device_only_p{p}_N{N}.cache")


def build_device_only_cache(p=6, N=272, path=None, verbose=True):
    """One-time HOST phase of the cached device-only pipeline (VERDICT
    r4 next #2 — the flagship-cache pattern applied to
    :func:`run_device_only`): pays the light host assembly ONCE
    (~220-450 s at p=6 N=272 on the 1-vCPU host) and saves everything
    a later device run needs, so retries after tunneled-worker crashes
    cost seconds of host time instead of re-paying the whole setup:

    - operator TEMPLATES (f32 with fastdiag, f64 residual-operator
      without) via ``build_blocked(defer_assembly=True)`` — no
      coefficient stack is built or stored; the run re-assembles it
      on-device from the cached metric planes
      (:func:`tpu.multiblock.assemble_flat_chunked`),
    - the f64 metric planes + 1D assembly data + blocked RHS,
    - static face metadata for the on-device banded-B̃ probing,
    - the MMS verification data as plain arrays (exact solution,
      quadrature, per-fault-face traction extraction operators) — no
      host problem object at load time,
    - a numerics fingerprint (stale-cache guard).

    The on-device banded B̃ (the ~200 s probing phase) is appended to
    this same cache by the FIRST :func:`run_device_only_cached`
    invocation, so later retries skip it too.

    Beyond-reference configuration: p=6 N=272 is ~4.2M volume DOF, one
    level past the reference ladder's finest
    (square_circle.jl:207-210).
    """
    import jax.numpy as jnp

    from hybridsbp_tpu import BC_NEUMANN as _BCN
    from hybridsbp_tpu.tpu import build_blocked
    from hybridsbp_tpu.tpu.assemble_device import extract_assembly_data
    from hybridsbp_tpu.tpu.multiblock import blocked_rhs_from_host
    from hybridsbp_tpu.utils.fingerprint import op_fingerprint
    from hybridsbp_tpu.utils.serialize import save_pytree

    path = path or DEVICE_ONLY_CACHE.format(p=p, N=N)
    t_all = time.time()
    t0 = time.time()
    prob, g, gdelta, delta, FTods, EToDomain, conn = assemble_level(
        p, N, light=True)
    nvol = int(prob.vstarts[-1])
    E = len(prob.lops)
    t_light = time.time() - t0
    if verbose:
        print(f"light host assembly p={p} N={N}: {nvol} volume DOF, "
              f"{E} blocks ({t_light:.1f}s)", flush=True)

    t0 = time.time()
    lops = prob.lops
    ts = float(getattr(lops[0], "tau_scale", 2.0))
    tmpl32 = build_blocked(prob, dtype=jnp.float32,
                           assemble_on_device=True, defer_assembly=True)
    tmpl64 = build_blocked(prob, dtype=jnp.float64,
                           assemble_on_device=True, defer_assembly=True,
                           with_fastdiag=False)
    data = extract_assembly_data(p, N, N, tau_scale=ts)
    crr = np.stack([np.asarray(lops[e].metrics.crr) for e in range(E)])
    css = np.stack([np.asarray(lops[e].metrics.css) for e in range(E)])
    crs = np.stack([np.asarray(lops[e].metrics.crs) for e in range(E)])
    masks = np.array([[1.0 if b == _BCN else 0.0 for b in lops[e].bctype]
                      for e in range(E)])
    gb64, gd64 = blocked_rhs_from_host(prob, g, gdelta)

    # ---- MMS verification data as plain arrays (no lops at load time)
    ue = np.stack([vex(lops[e].coord[0].ravel(), lops[e].coord[1].ravel(),
                       EToDomain[e]) for e in range(E)])
    JH64 = np.stack([np.asarray(lops[e].JH) for e in range(E)])
    FToE, FToLF, EToO, EToS = conn
    faces = []
    for f in range(len(prob.FToB)):
        if prob.FToB[f] != BC_JUMP_INTERFACE:
            continue
        e1, lf1 = int(FToE[0, f]), int(FToLF[0, f])
        lop = lops[e1]
        xf, yf = lop.facecoord[0][lf1], lop.facecoord[1][lf1]
        tex = (lop.nx[lf1] * vex_x(xf, yf, EToDomain[e1])
               + lop.ny[lf1] * vex_y(xf, yf, EToDomain[e1]))
        faces.append(dict(
            f=f, e1=e1,
            HfI_FT=lop.HfI_FT[lf1],              # scipy CSR (picklable)
            tau=np.asarray(lop.tau[lf1]), sJ=np.asarray(lop.sJ[lf1]),
            Hf=np.asarray(lop.Hf[lf1]), tex=np.asarray(tex),
            s0=int(prob.FToLstarts[f]), s1=int(prob.FToLstarts[f + 1]),
            d0=int(FTods[f]), d1=int(FTods[f + 1])))
    if verbose:
        print(f"device-form extraction: {time.time() - t0:.1f}s",
              flush=True)

    payload = {
        "template32": tmpl32, "template64": tmpl64,
        "assembly_inputs": {"crr": crr, "css": css, "crs": crs,
                            "masks": masks, "tau_scale": ts},
        "assembly_data": data,
        "gb64": np.asarray(gb64), "gd64": np.asarray(gd64),
        "face_meta": {"FToLstarts": np.asarray(prob.FToLstarts),
                      "FToB": np.asarray(prob.FToB),
                      "EToF": np.asarray(prob.EToF)},
        "mms": {"ue": ue, "JH": JH64, "faces": faces,
                "delta": np.asarray(delta)},
    }
    meta = {"p": p, "N": N, "E": E, "nvol": nvol,
            "fingerprint": op_fingerprint(),
            "t_light_host_s": t_light,
            "built_wall_s": time.time() - t_all}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_pytree(path, payload, meta)
    if verbose:
        print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB, "
              f"{meta['built_wall_s']:.0f}s total)", flush=True)
    return path


def run_device_only_cached(path=None, p=6, N=272, tol=1e-6,
                           inner_iters=8, repeats=3, probe_iters=24,
                           k_chunk=8, verbose=True,
                           methods=("displacements", "trace"),
                           stencil="auto", refine_sweeps=0,
                           refine_inner_tol=2e-3,
                           refine_inner_maxiter=60, assemble_chunk=8,
                           trace_inner_tol="auto", save_probed=True,
                           refine_sym=False, refine_split=False):
    """Device-only solve from the prebuilt cache (VERDICT r4 next #2):
    same semantics as :func:`run_device_only` — no host direct pipeline
    anywhere — but the host-side setup is a cache LOAD (seconds) instead
    of the full light assembly, and the on-device banded B̃ probing is
    paid once across processes (appended to the cache by the first
    run, ``save_probed``).  The f32 operator is chunk-assembled
    straight to the flat layout (the padded plane transient never
    materializes — better than the uncached path's assemble-then-drop).
    """
    import types

    import jax
    import jax.numpy as jnp

    from hybridsbp_tpu.tpu.multiblock import (_auto_echunk,
                                              assemble_flat_chunked,
                                              banded_from_device,
                                              recover_lambda)
    from hybridsbp_tpu.utils.fingerprint import op_fingerprint
    from hybridsbp_tpu.utils.serialize import load_pytree, save_pytree

    path = path or DEVICE_ONLY_CACHE.format(p=p, N=N)
    t0 = time.time()
    payload, meta = load_pytree(path)
    fp = op_fingerprint()
    if not np.isclose(fp, meta["fingerprint"], rtol=1e-12, atol=0.0):
        raise RuntimeError(
            f"device-only cache {path} numerics fingerprint mismatch "
            f"(cache {meta['fingerprint']!r} vs current {fp!r}); "
            "rebuild with build_device_only_cache()")
    E, nvol = meta["E"], meta["nvol"]
    t_load = time.time() - t0
    if verbose:
        print(f"loaded device-only cache (p={meta['p']} N={meta['N']}, "
              f"{nvol} DOF, banded B~ "
              f"{'cached' if 'trace_inv' in payload else 'not probed yet'}"
              f"): {t_load:.1f}s", flush=True)
    mem_log, _mem = _mem_logger(verbose)

    t0 = time.time()
    ai = payload["assembly_inputs"]
    data = payload["assembly_data"]
    tmpl32 = payload["template32"]
    Nsp, Nrp = tmpl32.grid_shape

    def _build_f64():
        tmpl64 = payload["template64"]
        t64 = time.time()
        echunk64 = _auto_echunk(E, len(tmpl64.offsets), Nsp, Nrp, 8,
                                tmpl64.shared)
        # refine_sym: assemble the f64 residual operator in the
        # SYMMETRIC flat layout (only o >= 0 diagonals) — halves its
        # HBM footprint so it coexists with the f32 operator at sizes
        # where both full stacks would exceed HBM (p=6 N=384: 8.8 GB
        # full vs 4.4 GB sym next to the 4.4 GB f32 stack)
        flat64, offs_flat64 = assemble_flat_chunked(
            data, ai["crr"], ai["css"], ai["crs"], ai["masks"],
            dtype=jnp.float64, Nrp=Nrp, chunk=assemble_chunk,
            sym=refine_sym, verbose=verbose,
            E_pad=E + ((-E) % echunk64 if echunk64 else 0))
        b = tmpl64._replace(
            coefs_flat=flat64,
            offsets_flat=offs_flat64, flat_chunk=echunk64,
            flat_sym=bool(refine_sym))
        float(jnp.sum(b.coefs_flat[0, 0]))      # sync
        dt64 = time.time() - t64
        _mem("f64 residual operator")
        if verbose:
            print(f"f64 residual operator (chunked on-device assembly, "
                  f"{assemble_chunk} blocks/chunk): {dt64:.1f}s",
                  flush=True)
        return b, dt64

    bp64 = t_bp64 = None
    if refine_sweeps and not methods:
        # no baseline solves wanted: build the f64 operator FIRST, so
        # its big allocation lands while only the cache-loaded
        # metadata is resident (the f32-first order put the worker
        # within ~MB of exhaustion right after the f64 assembly at
        # p=6 N=384 — r5f/r5g logs — with ~5 GB of worker-side
        # overhead beyond the live arrays)
        bp64, t_bp64 = _build_f64()
    echunk = _auto_echunk(E, len(tmpl32.offsets), Nsp, Nrp, 4,
                          tmpl32.shared)
    flat32, offs_flat = assemble_flat_chunked(
        data, ai["crr"], ai["css"], ai["crs"], ai["masks"],
        dtype=jnp.float32, Nrp=Nrp, chunk=assemble_chunk,
        E_pad=E + ((-E) % echunk if echunk else 0))
    bp = tmpl32._replace(coefs_flat=flat32,
                         offsets_flat=offs_flat, flat_chunk=echunk,
                         flat_sym=False)
    float(jnp.sum(bp.coefs_flat[0, 0]))     # sync the on-device assembly
    _mem("flat-only f32 operator (chunk-assembled)")
    gb64 = jnp.asarray(payload["gb64"])
    gd64 = jnp.asarray(payload["gd64"])
    gb, gd = gb64.astype(jnp.float32), gd64.astype(jnp.float32)
    t_bp = time.time() - t0
    if verbose:
        print(f"device setup: chunk-assembled flat f32 operator "
              f"{t_bp:.1f}s", flush=True)

    fm = payload["face_meta"]
    prob_meta = types.SimpleNamespace(FToLstarts=fm["FToLstarts"],
                                      FToB=fm["FToB"], EToF=fm["EToF"])
    t0 = time.time()
    trace_inv = payload.get("trace_inv")
    if trace_inv is None:
        trace_inv = banded_from_device(bp, prob_meta, iters=32,
                                       probe_iters=probe_iters,
                                       k_chunk=k_chunk, stencil=stencil)
        jax.block_until_ready(trace_inv.blocks)
        float(jnp.sum(trace_inv.diag_inv))  # scalar fetch = real sync
        if save_probed:
            payload["trace_inv"] = trace_inv
            save_pytree(path, payload, meta)
            if verbose:
                print(f"appended probed banded B~ to {path} "
                      f"({os.path.getsize(path) / 1e6:.1f} MB)",
                      flush=True)
    t_binv = time.time() - t0
    _mem("banded B~ ready")
    if verbose:
        print(f"banded B~ {'(cached)' if t_binv < 5 else 'probing'}: "
              f"{t_binv:.1f}s", flush=True)

    if trace_inner_tol == "auto":
        trace_inner_tol = None          # framework default: tol*0.2
    out = _timed_device_solves(
        bp, trace_inv, gb, gd, None, nvol=nvol, methods=methods,
        tol=tol, inner_iters=inner_iters, repeats=repeats,
        stencil=stencil, t_host=None, verbose=verbose,
        nblocks=E, trace_inner_tol=trace_inner_tol)
    _mem("post-solves")

    mms = payload["mms"]

    def _mms_cached(x, bp_, gd_, tag):
        """MMS errors from the cached verification arrays."""
        u = np.asarray(x[:E], dtype=np.float64).reshape(E, -1)
        lamf = np.asarray(recover_lambda(bp_, x[:E].astype(gd_.dtype),
                                         gd_), dtype=np.float64)
        du = u - mms["ue"]
        err2 = float(np.sum(du * (mms["JH"] * du)))
        umax = float(np.abs(mms["ue"]).max())
        uerrmax = float(np.abs(du).max())
        terr2 = 0.0
        delta = mms["delta"]
        for fc in mms["faces"]:
            lam = lamf[fc["f"], :fc["s1"] - fc["s0"]]
            dl = delta[fc["d0"]:fc["d1"]]
            tau_v = (fc["HfI_FT"] @ u[fc["e1"]]
                     + fc["tau"] * (lam - dl / 2)) / fc["sJ"]
            dt = tau_v - fc["tex"]
            terr2 += float(dt @ (fc["Hf"] * fc["sJ"] * dt))
        e_en, e_tau, e_rel = (float(np.sqrt(err2)), float(np.sqrt(terr2)),
                              uerrmax / umax)
        if verbose:
            print(f"  [{tag}] MMS energy err {e_en:.4e}, traction "
                  f"err {e_tau:.4e}, rel max err {e_rel:.3e}", flush=True)
        return dict(mms_energy_err=e_en, mms_traction_err=e_tau,
                    mms_rel_maxerr=e_rel)

    for method in methods:
        out[method].update(_mms_cached(out[method].pop("_x"), bp, gd,
                                       method))

    if refine_sweeps:
        from hybridsbp_tpu.tpu.refine import make_refined_solver
        if bp64 is None:
            bp64, t_bp64 = _build_f64()
        if refine_split:
            # drop the assembly-phase executables before compiling the
            # refine programs: the r5j sweep OOMed with only 9.7 GB of
            # live arrays — the worker holds several GB beyond them,
            # consistent with per-executable workspace retention
            jax.clear_caches()
        refine = make_refined_solver(
            bp, bp64, trace_inv, inner_tol=refine_inner_tol,
            inner_maxiter=refine_inner_maxiter, inner_iters=inner_iters,
            stencil=stencil, fused=not refine_split)
        t0 = time.time()
        x64, rels = refine(gb64, gd64, sweeps=refine_sweeps,
                           verbose=verbose)
        t_ref_cold = time.time() - t0
        t0 = time.time()
        x64, rels = refine(gb64, gd64, sweeps=refine_sweeps)
        t_ref = time.time() - t0
        _mem("post-refined")
        if verbose:
            print(f"refined solve: true rel residual {rels[-1]:.3e} in "
                  f"{len(rels)} sweeps, {t_ref:.2f}s warm "
                  f"({t_ref_cold:.1f}s incl. compile)", flush=True)
        out["refined"] = dict(rel_residuals=rels, t_warm_s=t_ref,
                              t_first_s=t_ref_cold, t_bp64_s=t_bp64)
        out["refined"].update(_mms_cached(x64, bp64, gd64, "refined"))

    out["setup"] = {"t_cache_load_s": t_load, "t_blocked_s": t_bp,
                    "t_banded_device_s": t_binv, "nvol": nvol,
                    "hbm_gb": mem_log}
    return out


def run(p=6, N0=17, levels=4, method="trace", verbose=True,
        plot_mesh=None):
    mesh_data = load_mesh()
    verts, EToV, EToF, FToB, EToDomain = mesh_data
    nelems, nfaces = EToV.shape[1], len(FToB)

    eps, tau_eps = [], []
    for lvl in range(levels):
        prob, g, gdelta, delta, FTods, EToDomain, conn = assemble_level(
            p, N0 * 2**lvl, mesh_data)
        FToE, FToLF, EToO, EToS = conn
        lops, vstarts, FToLs = prob.lops, prob.vstarts, prob.FToLstarts

        # plot the (curved) mesh on the first level (square_circle.jl:292)
        if lvl == 0 and plot_mesh:
            from hybridsbp_tpu.viz import plot_blocks, plot_connectivity
            plot_connectivity(verts, EToV,
                              file=plot_mesh.replace(".png", "_conn.png"))
            plot_blocks(lops, file=plot_mesh)
            if verbose:
                print(f"wrote {plot_mesh}")

        u, lam = prob.solve(g, gdelta, method=method)

        # energy-norm error
        err2 = 0.0
        for e in range(nelems):
            lop = lops[e]
            x, y = lop.coord
            du = u[vstarts[e]:vstarts[e + 1]] - vex(x.ravel(), y.ravel(),
                                                    EToDomain[e])
            err2 += du @ (lop.JH * du)

        # traction error on the fault
        terr2 = 0.0
        for f in range(nfaces):
            if FToB[f] != BC_JUMP_INTERFACE:
                continue
            e1, lf1 = FToE[0, f], FToLF[0, f]
            lop = lops[e1]
            xf = lop.facecoord[0][lf1]
            yf = lop.facecoord[1][lf1]
            tex = (lop.nx[lf1] * vex_x(xf, yf, EToDomain[e1])
                   + lop.ny[lf1] * vex_y(xf, yf, EToDomain[e1]))
            tau = computetraction(
                lop, lf1, u[vstarts[e1]:vstarts[e1 + 1]],
                lam[FToLs[f]:FToLs[f + 1]], delta[FTods[f]:FTods[f + 1]])
            dt = tau - tex
            terr2 += dt @ (lop.Hf[lf1] * lop.sJ[lf1] * dt)

        eps.append(np.sqrt(err2))
        tau_eps.append(np.sqrt(terr2))
        if verbose:
            print(f"level {lvl + 1}: N={N0 * 2**lvl}  "
                  f"energy err {eps[-1]:.6e}  "
                  f"traction err {tau_eps[-1]:.6e}")

    eps, tau_eps = np.array(eps), np.array(tau_eps)
    rates = np.log2(eps[:-1] / eps[1:])
    trates = np.log2(tau_eps[:-1] / tau_eps[1:])
    if verbose:
        print("energy-norm rates:  ", rates)
        print("traction rates:     ", trates)
    return eps, tau_eps, rates, trates


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=6)
    ap.add_argument("--N0", type=int, default=17)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--method", default="trace",
                    choices=["trace", "monolithic", "displacements"])
    ap.add_argument("--plot-mesh", default=None,
                    help="write mesh/connectivity figures (PNG)")
    ap.add_argument("--device-solve", action="store_true",
                    help="solve ONE level (--N0 as N/block) on the "
                         "device: f32 + Woodbury two-level FCG")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--inner-iters", type=int, default=8)
    ap.add_argument("--assemble-device", action="store_true",
                    help="assemble the DIA operator stack ON the "
                         "device from the metric planes (~13 MB "
                         "transferred instead of ~560 MB at N=136)")
    ap.add_argument("--trace-mode", choices=("dense", "banded"),
                    default="dense",
                    help="B^-1 preconditioner form for --device-solve: "
                         "dense nλ² inverse (exact, heavy setup) or "
                         "banded face-block CG (O(nfaces·L²) setup)")
    ap.add_argument("--stencil", default="auto",
                    choices=["auto", "flat", "flat_pallas", "pallas",
                             "unrolled", "compact"])
    ap.add_argument("--flat-sym", action="store_true",
                    help="symmetric flat coefficient storage (only "
                         "o >= 0 diagonals — halves the dominant HBM "
                         "stream; see stencil.flatten_dia_sym)")
    ap.add_argument("--binv-dtype", default=None,
                    choices=[None, "float32", "bfloat16"],
                    help="storage dtype for the Woodbury B^-1 "
                         "(bfloat16 halves the setup transfer)")
    ap.add_argument("--device-only", action="store_true",
                    help="solve ONE level (--N0 as N/block) with NO "
                         "host direct pipeline: light assembly + "
                         "on-device operator assembly + on-device "
                         "banded B~ probing; verified against the "
                         "exact MMS solution (the beyond-reference "
                         "N=272 configuration)")
    ap.add_argument("--probe-iters", type=int, default=24,
                    help="fastdiag-CG count per probe column in the "
                         "on-device banded B~ assembly")
    ap.add_argument("--assemble-chunk", type=int, default=8,
                    help="blocks per chunked on-device assembly step "
                         "(the per-chunk padded plane transient is "
                         "~chunk * noff * Nsp * Nrp * itemsize; lower "
                         "at large N in f64 to bound the peak)")
    ap.add_argument("--k-chunk", type=int, default=8,
                    help="probe columns batched per device step in the "
                         "banded B~ probing: the probe transient is "
                         "~k_chunk * 4 * E field-size buffers * ~5 CG "
                         "live vectors, so LOWER this at large N "
                         "(measured: k_chunk=8 OOMs at p=6 N=384 with "
                         "the 4.7 GB f32 operator resident; 4 fits)")
    ap.add_argument("--refine-sweeps", type=int, default=0,
                    help="with --device-only: mixed-precision "
                         "refinement sweeps (f32 two-level corrections "
                         "+ chunk-assembled f64 on-device residuals) — "
                         "breaks the f32 kappa*eps attainable-accuracy "
                         "floor at 4.2M DOF; 4 reaches ~1e-9")
    ap.add_argument("--refine-split", action="store_true",
                    help="with --refine-sweeps: compile the inner "
                         "solve and the f64 residual as separate "
                         "programs (the fused one-program sweep "
                         "crashed the remote compile helper at p=6 "
                         "N=384; costs one extra RTT per sweep)")
    ap.add_argument("--refine-sym", action="store_true",
                    help="with --refine-sweeps: assemble the f64 "
                         "residual operator in the SYMMETRIC flat "
                         "layout (halves its HBM footprint; the "
                         "capacity mode for N=384, where full f64 + "
                         "f32 stacks together exceed HBM)")
    ap.add_argument("--trace-inner-tol", default="auto",
                    help="with --device-only: inner block-solve "
                         "tolerance for the trace method ('auto' = "
                         "framework default tol*0.2, or a float)")
    ap.add_argument("--methods", default="displacements,trace",
                    help="with --device-only: comma-separated method "
                         "list — lets a phase re-run in a fresh "
                         "process after a tunneled-worker crash "
                         "(UNAVAILABLE kills every device buffer)")
    ap.add_argument("--device-only-cache-build", action="store_true",
                    help="one-time HOST phase of the cached device-only "
                         "pipeline: light assembly + template/MMS-data "
                         "extraction -> artifacts/device_only_p{p}_N{N}"
                         ".cache (the banded B~ is appended by the "
                         "first --device-only-cached run)")
    ap.add_argument("--device-only-cached", action="store_true",
                    help="run the device-only solve from the prebuilt "
                         "cache (seconds of host setup; retries after "
                         "worker crashes are cheap)")
    ap.add_argument("--cache-path", default=None,
                    help="override the cache file path")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--flagship-cache-build", action="store_true",
                    help="one-time build of the flagship (p=6 N=136) "
                         "device-problem cache (~20-35 min host)")
    ap.add_argument("--flagship-cached", action="store_true",
                    help="run the flagship solve from the prebuilt "
                         "cache (no host assembly)")
    a = ap.parse_args()
    if a.device_only_cache_build:
        build_device_only_cache(p=a.p, N=a.N0 if a.N0 != 17 else 272,
                                path=a.cache_path)
        raise SystemExit(0)
    if a.device_only_cached:
        run_device_only_cached(
            path=a.cache_path, p=a.p, N=a.N0 if a.N0 != 17 else 272,
            tol=a.tol, inner_iters=a.inner_iters, repeats=a.repeats,
            probe_iters=a.probe_iters, k_chunk=a.k_chunk,
            stencil=a.stencil, assemble_chunk=a.assemble_chunk,
            refine_sweeps=a.refine_sweeps, refine_sym=a.refine_sym,
            refine_split=a.refine_split,
            methods=tuple(m for m in a.methods.split(",") if m),
            trace_inner_tol=(a.trace_inner_tol
                             if a.trace_inner_tol == "auto"
                             else float(a.trace_inner_tol)))
        raise SystemExit(0)
    if a.device_only:
        run_device_only(p=a.p, N=a.N0, tol=a.tol,
                        inner_iters=a.inner_iters,
                        probe_iters=a.probe_iters, k_chunk=a.k_chunk,
                        stencil=a.stencil,
                        refine_sweeps=a.refine_sweeps,
                        methods=tuple(m for m in a.methods.split(",")
                                      if m),
                        trace_inner_tol=(a.trace_inner_tol
                                         if a.trace_inner_tol == "auto"
                                         else float(a.trace_inner_tol)))
        raise SystemExit(0)
    if a.flagship_cache_build:
        build_flagship_cache(p=a.p, N=a.N0 if a.N0 != 17 else 136)
        raise SystemExit(0)
    if a.flagship_cached:
        run_flagship_cached(tol=a.tol, inner_iters=a.inner_iters,
                            stencil=a.stencil)
        raise SystemExit(0)
    if a.device_solve:
        import jax.numpy as _jnp
        bd = {None: None, "float32": _jnp.float32,
              "bfloat16": _jnp.bfloat16}[a.binv_dtype]
        if a.method == "monolithic":
            raise SystemExit("--device-solve supports methods "
                             "'displacements' and 'trace'")
        run_device(p=a.p, N=a.N0, tol=a.tol, inner_iters=a.inner_iters,
                   stencil=a.stencil, binv_dtype=bd,
                   method=a.method, trace_mode=a.trace_mode,
                   assemble_device=a.assemble_device,
                   flat_sym=a.flat_sym)
    else:
        run(p=a.p, N0=a.N0, levels=a.levels, method=a.method,
            plot_mesh=a.plot_mesh)
